package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus n-gram statistics for language-model data work: the bigram
  * count-of-counts table (Good–Turing frequency-of-frequencies, the
  * input to GT/Katz smoothing and to Heaps/Zipf corpus diagnostics).
  *
  * Scale shape: token pairing is per-row array arithmetic inside the
  * scan (zip_with over two slices of the SAME tokens array — no
  * self-join, no posexplode+window pass over token rows); then two
  * partial-aggregated shuffles, the first keyed on the gram (map-side
  * combine absorbs the Zipf head — "of the" combines within every
  * partition before the exchange), the second on the tiny count key.
  * Output is O(distinct counts) rows — a corpus of 10^12 documents
  * compresses to a few thousand (r, n_r) rows. Per count bucket we
  * also carry min(gram) as a content witness so the oracle compare is
  * sensitive to WHICH grams land in a bucket, not just how many.
  *
  * Tokenizer is [[TextAnalysis.tokens]] verbatim (lowercase,
  * whitespace split) so the vocabulary agrees with corpus_vocab and
  * the DuckDB side reuses the established `string_split_regex`
  * equivalence.
  */
object Ngram {

  /** Bigram count-of-counts: one row per distinct bigram frequency r
    * with n_r = number of distinct bigrams occurring exactly r times
    * and the lexicographically smallest such bigram as witness. */
  def bigramCountOfCounts(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val grams = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    docs.select(explode(grams).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("r"))
      .groupBy(col("r"))
      .agg(count(lit(1)).as("n_r"), min(col("gram")).as("sample_gram"))
  }

  /** DuckDB oracle for [[bigramCountOfCounts]] — list-slice pairing
    * over the same tokenizer (`[\s\x0b]+` ≡ Java `\s+`, established by
    * the corpus_vocab oracle). */
  def bigramCountOfCountsOracleSql(table: String = "documents"): String =
    s"""WITH t AS (
       |  SELECT list_filter(string_split_regex(lower(text), '[\\s\\x0b]+'),
       |                     x -> len(x) > 0) AS l
       |  FROM $table),
       |b AS (
       |  SELECT l, unnest(generate_series(1, len(l) - 1)) AS i
       |  FROM t WHERE len(l) >= 2),
       |g AS (SELECT l[i] || ' ' || l[i + 1] AS gram FROM b),
       |c AS (SELECT gram, CAST(count(*) AS BIGINT) AS r FROM g GROUP BY gram)
       |SELECT r, CAST(count(*) AS BIGINT) AS n_r,
       |  min(gram) AS sample_gram
       |FROM c GROUP BY r""".stripMargin

  private def bigramsOf(toks: Column): Column = zip_with(
    slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
    slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
    (a, b) => concat(a, lit(" "), b))

  /** Held-out bigram LM coverage — the transcendental-free core of
    * CCNet-style LM quality filtering: train a bigram "model" (the
    * distinct-bigram and distinct-unigram sets) on the train split
    * (doc_id % holdMod ≠ 0) and score every held-out document by how
    * much of it the model has seen: known-bigram occurrences, OOV
    * token occurrences, and coverage = n_known / n_bigrams as ONE
    * IEEE division of exact longs (monotone in the smoothed LM
    * log-probability for fixed doc length, so it ranks documents the
    * way a perplexity filter would — without log/exp, which would
    * break engine-exactness).
    *
    * Scale shape: the model tables are corpus-wide distinct-aggregates
    * (map-side combine absorbs the Zipf head); scoring is two
    * equi-joins keyed on the gram/token — at 10^12 documents the
    * practical variant swaps the exact semi-join for the Bloom
    * broadcast (see corpus_bloom_decontaminate), trading exactness
    * for zero shuffle on the corpus side; this operator keeps the
    * exact join because coverage is the *calibration* query that sizes
    * that Bloom filter's false-positive budget. */
  def lmCoverage(docs: DataFrame, holdMod: Long = 5L): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val train = docs.filter(col("doc_id") % holdMod =!= 0)
    val held = docs.filter(col("doc_id") % holdMod === 0)
    val trainGrams = train.select(explode(bigramsOf(toks)).as("gram")).distinct()
    val trainVocab = train.select(explode(toks).as("tok")).distinct()
    val base = held.select(col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      greatest(size(toks) - 1, lit(0)).cast("long").as("n_bigrams"))
    val known = held.select(col("doc_id"), explode(bigramsOf(toks)).as("gram"))
      .join(trainGrams, Seq("gram"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_known"))
    val oov = held.select(col("doc_id"), explode(toks).as("tok"))
      .join(trainVocab, Seq("tok"), "left_anti")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_oov"))
    base
      .join(known, Seq("doc_id"), "left")
      .join(oov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_bigrams"),
        coalesce(col("n_known"), lit(0L)).as("n_known_bigrams"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov_tokens"),
        when(col("n_bigrams") === 0L, lit(0.0))
          .otherwise(coalesce(col("n_known"), lit(0L)).cast("double") /
            col("n_bigrams").cast("double")).as("bigram_coverage"))
  }

  /** DuckDB oracle for [[lmCoverage]] — same splits, same tokenizer,
    * same single IEEE division. */
  def lmCoverageOracleSql(holdMod: Long = 5L, table: String = "documents"): String =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[\\s\\x0b]+'),
       |                             x -> len(x) > 0) AS l
       |  FROM $table),
       |tr AS (SELECT l FROM t WHERE doc_id % $holdMod <> 0),
       |trg AS (SELECT DISTINCT l[i] || ' ' || l[i + 1] AS gram
       |  FROM (SELECT l, unnest(generate_series(1, len(l) - 1)) AS i
       |        FROM tr WHERE len(l) >= 2)),
       |trv AS (SELECT DISTINCT unnest(l) AS tok FROM tr),
       |he AS (SELECT doc_id, l FROM t WHERE doc_id % $holdMod = 0),
       |heg AS (SELECT doc_id, l[i] || ' ' || l[i + 1] AS gram
       |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
       |        FROM he WHERE len(l) >= 2)),
       |het AS (SELECT doc_id, unnest(l) AS tok FROM he),
       |kn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_known
       |  FROM heg WHERE gram IN (SELECT gram FROM trg) GROUP BY doc_id),
       |oov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_oov
       |  FROM het WHERE tok NOT IN (SELECT tok FROM trv) GROUP BY doc_id),
       |base AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
       |  CAST(greatest(len(l) - 1, 0) AS BIGINT) AS n_bigrams FROM he)
       |SELECT b.doc_id, b.n_tokens, b.n_bigrams,
       |  CAST(COALESCE(kn.n_known, 0) AS BIGINT) AS n_known_bigrams,
       |  CAST(COALESCE(oov.n_oov, 0) AS BIGINT) AS n_oov_tokens,
       |  CASE WHEN b.n_bigrams = 0 THEN 0.0
       |       ELSE CAST(COALESCE(kn.n_known, 0) AS DOUBLE) / CAST(b.n_bigrams AS DOUBLE)
       |  END AS bigram_coverage
       |FROM base b
       |LEFT JOIN kn USING (doc_id)
       |LEFT JOIN oov USING (doc_id)""".stripMargin

  /** Per-document trigram NOVELTY — the memorization-risk /
    * templated-content signal: for each document (≥ 3 tokens), the
    * share of its DISTINCT trigrams that occur in no other document.
    * Low novelty = boilerplate/template/mirrored content the dedup
    * tiers may have missed; high novelty = genuinely unique text.
    * novelty_permille = n_unique·1000 div n_distinct — exact integers
    * only.
    *
    * Scale shape: per-doc DISTINCT grams first (array_distinct inside
    * the row — the within-doc repeat never reaches the shuffle), ONE
    * gram-keyed partial-agg shuffle for document frequency, one join
    * back (the gram side re-partitions on gram — both sides land
    * co-partitioned), one per-doc rollup. The Zipf head is bounded by
    * |docs| per gram, not occurrences. */
  def trigramNovelty(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val tris = zip_with(
      zip_with(
        slice(toks, lit(1), greatest(size(toks) - 2, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 2, lit(0))),
        (a, b) => concat(a, lit(" "), b)),
      slice(toks, lit(3), greatest(size(toks) - 2, lit(0))),
      (ab, c) => concat(ab, lit(" "), c))
    val docGrams = docs.filter(size(TextAnalysis.tokens(col("text"))) >= 3)
      .select(col("doc_id"), explode(array_distinct(tris)).as("gram"))
      .localCheckpoint(false) // two consumers: df rollup + join back
    val df = docGrams.groupBy(col("gram"))
      .agg(count(lit(1)).as("doc_freq"))
    docGrams.join(df, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_distinct"),
        sum(when(col("doc_freq") === 1, 1L).otherwise(0L)).as("n_unique"))
      .select(col("doc_id"), col("n_distinct"), col("n_unique"),
        expr("n_unique * 1000 div n_distinct").as("novelty_permille"))
  }

  /** DuckDB oracle for [[trigramNovelty]] — the same tokenizer, a
    * generate_series slice formulation of the trigrams (vs the
    * engine's double zip_with), DISTINCT, doc-frequency, rollup. */
  def trigramNoveltyOracleSql(table: String = "documents"): String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[\\s\\x0b]+'),
       |                x -> len(x) > 0) AS l
       |  FROM $table),
       |g AS (
       |  SELECT DISTINCT doc_id, gram FROM (
       |    SELECT doc_id, l[i] || ' ' || l[i + 1] || ' ' || l[i + 2] AS gram
       |    FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
       |          FROM t WHERE len(l) >= 3))),
       |df AS (SELECT gram, CAST(count(*) AS BIGINT) AS doc_freq
       |       FROM g GROUP BY gram)
       |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_distinct,
       |  CAST(sum(CASE WHEN df.doc_freq = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_unique,
       |  CAST(sum(CASE WHEN df.doc_freq = 1 THEN 1 ELSE 0 END) * 1000
       |    // count(*) AS BIGINT) AS novelty_permille
       |FROM g JOIN df USING (gram)
       |GROUP BY g.doc_id""".stripMargin
}
