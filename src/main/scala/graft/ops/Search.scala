package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text ranked retrieval over the corpus: inverted-index postings
  * and BM25-style top-k scoring — the standard relevance layer a
  * web-scale corpus serves (and the dedup/decontamination layers
  * query).
  *
  * Cross-engine exactness: every score is built ONLY from IEEE
  * correctly-rounded +,−,×,÷ over exact integers and dyadic constants
  * (k1 = 1.5, b = 0.75, k1+1 = 2.5, 1−b = 0.25 — all binary-exact), in
  * a fixed documented operation order, and the per-document sum over
  * matched terms is an ORDERED fold (term-lexicographic), so Spark and
  * DuckDB produce bit-identical doubles. The classic log-idf is
  * replaced by the raw Robertson–Spärck-Jones odds ratio
  * (N − df + 0.5)/(df + 0.5) — same monotone ranking signal, no
  * transcendental (ln differs between libm and the JVM in the last
  * ulp, which a hash compare would see).
  */
object Search {

  /** Inverted-index postings: one row per (term, doc_id) with the term
    * frequency. One explode inside codegen + one partial-aggregated
    * shuffle on (term, doc_id). */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** The BM25 per-term partial score, step order shared verbatim with
    * the oracle:
    *   r1 = dl / avgdl;  r2 = 0.25 + 0.75·r1;  r3 = tf + 1.5·r2;
    *   r4 = (tf·2.5) / r3;  idf = ((N − df) + 0.5)/(df + 0.5);
    *   s  = idf · r4 */
  private def termScore(tf: Column, dl: Column, df: Column,
                        n: Long, avgdl: Column): Column = {
    val r1 = dl.cast("double") / avgdl
    val r2 = lit(0.25) + lit(0.75) * r1
    val r3 = tf.cast("double") + lit(1.5) * r2
    val r4 = (tf.cast("double") * lit(2.5)) / r3
    val idf = ((lit(n.toDouble) - df.cast("double")) + lit(0.5)) /
      (df.cast("double") + lit(0.5))
    idf * r4
  }

  /** BM25 top-k documents per query.
    *
    * `docs` = (doc_id, text); `queries` = (query_id, term) — one row
    * per query term (multi-term queries are rows sharing a query_id).
    * Output: (query_id, doc_id, score, n_hits, rank) for rank ≤ k,
    * rank ordered by (score DESC, doc_id ASC) — the doc_id tie-break
    * makes equal-score rows deterministic on both engines.
    *
    * `nDocs` is passed explicitly (the caller usually knows it from
    * the scan statistics); avgdl = Σdl / N is one exact-integer-input
    * IEEE division.
    *
    * Scale shape (10^12 docs): postings and df are partial-aggregated
    * shuffles keyed on term; the query join broadcasts the tiny query
    * table onto the postings (never the reverse); the per-(query, doc)
    * fold shuffles only MATCHED postings; the final top-k is a
    * rank-filtered window that Spark 4 plans as WindowGroupLimit —
    * each map task prunes to its local top-k before the single
    * per-query exchange. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, nDocs: Long,
               k: Int = 10): DataFrame = {
    require(nDocs > 0, "bm25TopK: nDocs must be positive")
    require(k >= 1, "bm25TopK: k must be >= 1")
    val post = postings(docs)
    val dl = docs.select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("dl"))
    val sumDl = dl.agg(sum(col("dl")).as("sdl"))
    val df = post.groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("df"))
    // restrict df to the query vocabulary FIRST (broadcast the tiny
    // query table into the df aggregate), so the full term dictionary
    // never shuffles against the postings
    // distinct guards against duplicate (query_id, term) rows, which
    // would otherwise double-count that term's partial score
    val qdf = df.join(broadcast(queries.select(col("query_id"),
      col("term")).distinct()), Seq("term"))
    val matched = post.join(broadcast(qdf), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(sumDl))
      .select(col("query_id"), col("doc_id"), col("term"),
        termScore(col("tf"), col("dl"), col("df"), nDocs,
          col("sdl").cast("double") / lit(nDocs.toDouble)).as("s"))
    val perDoc = matched
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sort_array(collect_list(struct(col("term"), col("s"))))
        .as("parts"))
      .select(col("query_id"), col("doc_id"),
        aggregate(col("parts"), lit(0.0),
          (acc, x) => acc + x.getField("s")).as("score"),
        size(col("parts")).cast("long").as("n_hits"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    perDoc.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Deterministic query workload derived from the corpus itself: for
    * each doc_id < nQueries, the query is that document's first 4
    * DISTINCT tokens (first-occurrence order, then emitted as rows).
    * Self-retrieval workloads are the standard way to exercise a
    * ranking stack without external data — the source doc should rank
    * highly for its own leading terms. */
  def syntheticQueries(docs: DataFrame, nQueries: Int = 5): DataFrame =
    docs.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"),
        explode(slice(array_distinct(TextAnalysis.tokens(col("text"))),
          1, 4)).as("term"))

  /** First-principles DuckDB replica: same tokenizer, same step order
    * (r1..r4, idf), same ordered fold, same (score DESC, doc_id ASC)
    * rank. Scalar subqueries stand in for the broadcast N/avgdl. */
  def bm25OracleSql(nQueries: Int = 5, k: Int = 10): String =
    s"""WITH toks AS (
       | SELECT doc_id,
       |  list_filter(string_split_regex(lower(text), '[\\s\\x0b]+'),
       |    x -> len(x) > 0) AS ts
       | FROM documents),
       |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |post AS (
       | SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
       | FROM (SELECT doc_id, unnest(ts) AS term FROM toks)
       | GROUP BY term, doc_id),
       |dl AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl FROM toks),
       |ad AS (SELECT CAST(sum(dl) AS DOUBLE)
       |         / (SELECT CAST(n AS DOUBLE) FROM nd) AS avgdl FROM dl),
       |dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       |        FROM post GROUP BY term),
       |q AS (
       | SELECT doc_id AS query_id, unnest(list_slice(list_distinct_ord, 1, 4)) AS term
       | FROM (SELECT doc_id,
       |        list_filter(ts, (x, i) -> list_position(ts, x) = i)
       |          AS list_distinct_ord
       |       FROM toks WHERE doc_id < $nQueries)),
       |m AS (
       | SELECT q.query_id, p.doc_id, q.term,
       |  ((((SELECT CAST(n AS DOUBLE) FROM nd) - CAST(dfr.df AS DOUBLE)) + 0.5)
       |    / (CAST(dfr.df AS DOUBLE) + 0.5))
       |  * ((CAST(p.tf AS DOUBLE) * 2.5)
       |     / (CAST(p.tf AS DOUBLE)
       |        + 1.5 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
       |                                / (SELECT avgdl FROM ad))))) AS s
       | FROM q JOIN post p ON q.term = p.term
       |        JOIN dfr ON q.term = dfr.term
       |        JOIN dl ON p.doc_id = dl.doc_id),
       |agg AS (
       | SELECT query_id, doc_id,
       |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list(s ORDER BY term)), (a, x) -> a + x) AS score,
       |  CAST(count(*) AS BIGINT) AS n_hits
       | FROM m GROUP BY query_id, doc_id)
       |SELECT query_id, doc_id, score, n_hits,
       | CAST(row_number() OVER (PARTITION BY query_id
       |   ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
       |FROM agg
       |QUALIFY rank <= $k""".stripMargin

  // ------------------------------------------------------------------
  // Exact-phrase retrieval (positional inverted index)
  // ------------------------------------------------------------------

  /** Exact-phrase search over a positional inverted index — the
    * second retrieval primitive next to [[bm25TopK]] (and the shape
    * decontamination uses to find verbatim benchmark strings): return
    * every (query, doc) pair where the query's token sequence occurs
    * contiguously, with the OVERLAP-COUNTING occurrence count.
    *
    * Formulation: positional postings (doc_id, term, pos) join the
    * (tiny, broadcast by contract) exploded query terms (query_id,
    * idx, term); each match row votes for the anchor pos − idx; an
    * anchor where all qlen distinct idx values appear is a full
    * contiguous occurrence (idx ∈ [0, qlen) so count(distinct) = qlen
    * ⟺ all present — repeated phrase terms work because the SAME
    * posting row matches every idx of that term separately).
    *
    * Scale shape: the corpus side never moves more than the postings
    * of the QUERY terms (the broadcast join filters map-side before
    * any Exchange); the anchor aggregate shuffles only those match
    * votes on (query_id, doc_id, anchor); countDistinct over the
    * small idx domain is the standard two-level expand. Stopword-heavy
    * phrases inflate the matched postings — the classic positional-
    * index cost — but never the unmatched corpus. */
  def phraseSearch(docs: DataFrame, phrases: DataFrame): DataFrame = {
    val p = docs.select(col("doc_id"),
      posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "term")))
    val q = phrases.select(col("query_id"),
      posexplode(col("terms")).as(Seq("idx", "term")))
    val qLen = phrases.select(col("query_id"),
      size(col("terms")).as("qlen"))
    p.join(broadcast(q), Seq("term"))
      .select(col("query_id"), col("doc_id"),
        (col("pos") - col("idx")).as("anchor"), col("idx"))
      .groupBy(col("query_id"), col("doc_id"), col("anchor"))
      .agg(countDistinct(col("idx")).as("n_idx"))
      .join(broadcast(qLen), Seq("query_id"))
      .filter(col("n_idx") === col("qlen").cast("long"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Deterministic query phrases drawn FROM the corpus so every query
    * has at least its source doc as a hit: query q (q < nQueries) is
    * tokens [4, 4+span) of doc 37q (1-based), skipping docs shorter
    * than 3+span tokens. [[phraseQueriesSql]] states the same set. */
  def syntheticPhrases(docs: DataFrame, nQueries: Int = 5,
                       span: Int = 3): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    docs.filter(col("doc_id") % 37 === 0 &&
        col("doc_id") < 37L * nQueries)
      .select((col("doc_id") / 37).cast("long").as("query_id"),
        slice(toks, 4, span).as("terms"))
      .filter(size(col("terms")) === span)
  }

  /** Closed-form SQL for [[syntheticPhrases]]. */
  def phraseQueriesSql(nQueries: Int = 5, span: Int = 3): String =
    s"""SELECT doc_id // 37 AS query_id,
       |  toks[4 : ${3 + span}] AS ph
       |FROM (SELECT doc_id,
       |   list_filter(string_split_regex(lower(text), '[\\s\\x0b]+'),
       |               x -> len(x) > 0) AS toks
       |  FROM documents
       |  WHERE doc_id % 37 = 0 AND doc_id < ${37L * nQueries})
       |WHERE len(toks) >= ${3 + span}""".stripMargin

  /** DuckDB replica of phraseSearch(docs, syntheticPhrases(docs)) —
    * an INDEPENDENT formulation (cross-check, not an engine replay):
    * brute-force token-window scan with list-slice equality, instead
    * of the engine's postings-join anchor votes. */
  def phraseSearchOracleSql(nQueries: Int = 5, span: Int = 3): String =
    s"""WITH t AS (SELECT doc_id,
       |   list_filter(string_split_regex(lower(text), '[\\s\\x0b]+'),
       |               x -> len(x) > 0) AS toks
       |  FROM documents),
       |q AS (%QUERIES%),
       |j AS (SELECT t.doc_id, q.query_id, t.toks, q.ph
       |  FROM t, q WHERE len(t.toks) >= len(q.ph)),
       |starts AS (SELECT doc_id, query_id, toks, ph,
       |   unnest(generate_series(0, len(toks) - len(ph))) AS s0
       |  FROM j),
       |hits AS (SELECT doc_id, query_id FROM starts
       |         WHERE toks[s0 + 1 : s0 + len(ph)] = ph)
       |SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_hits
       |FROM hits GROUP BY query_id, doc_id""".stripMargin
      .replace("%QUERIES%", phraseQueriesSql(nQueries, span))

  // ------------------------------------------------------------------
  // Per-document keyword extraction (tf-idf top-k)
  // ------------------------------------------------------------------

  /** Top-k keywords per document by tf·idf — the tagging/labeling
    * primitive next to retrieval (and the quick "what is this page
    * about" signal a corpus browser shows). Same transcendental-free
    * RSJ-odds idf as [[bm25TopK]] so scores are bit-identical across
    * engines: idf = ((N − df) + 0.5)/(df + 0.5), s = tf · idf, in
    * exactly that operation order. Rank orders by (score DESC, term
    * ASC) — the term tie-break makes equal scores deterministic.
    *
    * Scale shape: postings and df are partial-aggregated term-keyed
    * shuffles (postings is recomputed rather than materialized — the
    * same deliberate choice as [[bm25TopK]]: a tokens×docs checkpoint
    * costs more storage than one extra codegen'd tokenize pass); the
    * score join is term-co-partitioned; the per-doc top-k plans as
    * WindowGroupLimit, pruning to k rows per doc map-side BEFORE the
    * doc_id exchange. */
  def keywords(docs: DataFrame, nDocs: Long, k: Int = 3): DataFrame = {
    require(nDocs > 0, "keywords: nDocs must be positive")
    require(k >= 1, "keywords: k must be >= 1")
    val post = postings(docs)
    val df = post.groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("df"))
    val idf = ((lit(nDocs.toDouble) - col("df").cast("double")) + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val scored = post.join(df, Seq("term"))
      .select(col("doc_id"), col("term"),
        (col("tf").cast("double") * idf).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** DuckDB replica of [[keywords]] — same step order, so doubles are
    * bit-identical; the window replicates the (score DESC, term ASC)
    * rank. */
  def keywordsOracleSql(k: Int = 3): String =
    s"""WITH t AS (SELECT doc_id,
       |   list_filter(string_split_regex(lower(text), '[\\s\\x0b]+'),
       |               x -> len(x) > 0) AS toks
       |  FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
       |post AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |         FROM tok GROUP BY doc_id, term),
       |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       |       FROM post GROUP BY term),
       |nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
       |sc AS (SELECT doc_id, term,
       |   CAST(tf AS DOUBLE) *
       |     ((((SELECT n FROM nd) - CAST(df AS DOUBLE)) + 0.5)
       |      / (CAST(df AS DOUBLE) + 0.5)) AS score
       |  FROM post JOIN df USING (term)),
       |r AS (SELECT doc_id, term, score,
       |   CAST(row_number() OVER (PARTITION BY doc_id
       |        ORDER BY score DESC, term ASC) AS BIGINT) AS rank
       |  FROM sc)
       |SELECT doc_id, term, score, rank FROM r WHERE rank <= $k""".stripMargin
}
