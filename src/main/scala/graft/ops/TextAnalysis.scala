package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token stats,
  * quality signals, language ID, document fingerprints. All hot paths
  * are built-in column expressions (whole-stage codegen); the only
  * closure is the per-row language profile scorer.
  */
object TextAnalysis {

  private[ops] def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Whitespace + BPE-ish regex token counts and length stats.
    * Integer outputs only — engine-independent and hash-stable. */
  def tokenStats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      // BPE-ish pre-tokenizer: alnum runs | single punct (same regex
      // runs under Java regex here and RE2 in the DuckDB oracle)
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("n_bpe_pieces"),
      length(col("text")).cast("long").as("n_chars"),
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("sum_tok_len"))
  }

  /** Per-source tokenizer-compression rollup — the Kaplan-style
    * "chars per piece" signal as a source-quality proxy: gibberish
    * and non-linguistic content compress badly (few chars per BPE
    * piece), over-segmented scripts show high pieces-per-word. Exact
    * integer sums + milli-ratios by integer division (one rollup,
    * scan-local signals — the tokenStats expressions re-used
    * verbatim). */
  def tokenCompression(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(col("source"),
        size(toks).cast("long").as("t"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("p"),
        length(col("text")).cast("long").as("c"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("c")).as("sum_chars"),
        sum(col("t")).as("sum_tokens"), sum(col("p")).as("sum_pieces"))
      .select(col("source"), col("n_docs"), col("sum_chars"),
        col("sum_tokens"), col("sum_pieces"),
        expr("sum_chars * 1000 div sum_pieces").as("chars_per_piece_milli"),
        expr("sum_pieces * 1000 div sum_tokens").as("pieces_per_token_milli"))
  }

  /** DuckDB oracle for [[tokenCompression]] — the token_stats regexes
    * rolled up per source with the same integer ratios. */
  def tokenCompressionOracleSql(): String =
    s"""WITH sig AS (
       |  SELECT source,
       |    CAST(len(list_filter(string_split_regex(lower(text), '[\\s\\x0b]+'),
       |      x -> len(x) > 0)) AS BIGINT) AS t,
       |    CAST(len(regexp_extract_all(text,
       |      '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS p,
       |    CAST(length(text) AS BIGINT) AS c
       |  FROM documents)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(c) AS BIGINT) AS sum_chars,
       |  CAST(sum(t) AS BIGINT) AS sum_tokens,
       |  CAST(sum(p) AS BIGINT) AS sum_pieces,
       |  CAST(sum(c) * 1000 // sum(p) AS BIGINT) AS chars_per_piece_milli,
       |  CAST(sum(p) * 1000 // sum(t) AS BIGINT) AS pieces_per_token_milli
       |FROM sig GROUP BY source""".stripMargin

  private val stopwordList = Seq(
    "the", "a", "an", "of", "to", "in", "and", "or", "is", "are",
    "was", "for", "on", "with", "as", "by", "at", "it", "this", "that")

  /** Quality signals as exact integer counts (ratios are left to the
    * consumer — integers survive engine round-trips bit-exactly). */
  def qualitySignals(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val stopArr = array(stopwordList.map(lit): _*)
    docs.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(filter(toks, t => array_contains(stopArr, t))).cast("long").as("n_stopwords"),
      size(filter(toks, t => length(t) > 15)).cast("long").as("n_long_tokens"),
      length(col("text")).cast("long").as("n_chars"),
      length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast("long").as("n_punct"))
  }

  /** Composite quality score in [0,1] (heuristic, for filtering). */
  def qualityScore(docs: DataFrame): DataFrame =
    withQuality(docs).select(col("doc_id"), col("quality"))

  /** [[qualityScore]] as a column-preserving transform over ANY table
    * with a `text` column (no doc_id requirement) — the form the
    * streaming quality gate composes with. Identical expression tree
    * to the historical qualityScore (signals as longs, the same
    * double formula), so outputs are bit-identical. */
  private[graft] def withQuality(df: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val stopArr = array(stopwordList.map(lit): _*)
    val sig = df.select(df.columns.map(col).toSeq ++ Seq(
      size(toks).cast("long").as("__q_n_tokens"),
      size(filter(toks, t => array_contains(stopArr, t))).cast("long").as("__q_n_stopwords"),
      length(col("text")).cast("long").as("__q_n_chars"),
      length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast("long").as("__q_n_punct")): _*)
    sig.select(df.columns.map(col).toSeq :+
      round(
        greatest(lit(0.0), least(lit(1.0),
          lit(0.4) * least(lit(1.0), col("__q_n_tokens").cast("double") / 100.0) +
          lit(0.3) * least(lit(1.0), col("__q_n_stopwords").cast("double") * 8.0 /
            greatest(col("__q_n_tokens").cast("double"), lit(1.0))) +
          lit(0.3) * (lit(1.0) - least(lit(1.0), col("__q_n_punct").cast("double") * 4.0 /
            greatest(col("__q_n_chars").cast("double"), lit(1.0)))))), 4).as("quality"): _*)
  }

  /** One-vs-rest Mann–Whitney AUC of `score` separating each `group`
    * from the rest — the quality-classifier calibration census (does
    * the score actually rank source A above source B?), computed with
    * EXACT midrank arithmetic: ties get the midrank, carried as
    * 2×midrank so everything stays integer (for a tie run occupying
    * ranks [c+1, c+g], 2·midrank = 2c + g + 1). Then per group
    *
    *   AUC = (R2 − n·(n+1)) / (2 · n · (N − n))
    *
    * with R2 = Σ 2·midrank over the group's rows — ONE IEEE division
    * of exact longs at the very end (hash-matches DuckDB bit-exactly).
    *
    * Scale shape: one partial-agg shuffle collapses the corpus to the
    * DISTINCT-SCORE table (bounded: quality is rounded to 4 dp →
    * ≤ 10⁴ + 1 values, so its single-partition cumulative window is a
    * driver-scale fold, not a data-scale one), a broadcast join maps
    * every row to its 2·midrank, and one partial-agg shuffle on the
    * group key finishes. Long arithmetic holds to N ≈ 2·10⁹ rows
    * (R2 ≤ 2N²); past that, lift rank2_sum to decimal. */
  def rankSumAuc(df: DataFrame, score: String, group: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // materialize the (group, score) projection ONCE: it has three
    // consumers (distinct-score census, midrank join-back, and the
    // grand total's subtree) — without the barrier the upstream
    // scoring pipeline re-runs per consumer (the first plan ran the
    // quality regexes 4x). Two narrow columns, far cheaper than
    // re-scanning text at 100 TB.
    val flat = df.select(col(group), col(score)).localCheckpoint(false)
    val vals = flat.groupBy(col(score)).agg(count(lit(1)).as("g"))
      .withColumn("c", coalesce(
        sum(col("g")).over(Window.orderBy(col(score))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(score), (lit(2L) * col("c") + col("g") + 1L).as("m2"))
    val per = flat.join(broadcast(vals), score)
      .groupBy(col(group))
      .agg(count(lit(1)).as("n_docs"), sum(col("m2")).as("rank2_sum"))
      .localCheckpoint(false) // |groups| rows; feeds the total AND the output
    val tot = per.agg(sum(col("n_docs")).as("n_total"))
    per.crossJoin(broadcast(tot))
      .select(col(group), col("n_docs"), col("rank2_sum"),
        when(col("n_total") === col("n_docs"), lit(null).cast("double"))
          .otherwise(
            (col("rank2_sum") - col("n_docs") * (col("n_docs") + 1L))
              .cast("double") /
            (lit(2L) * col("n_docs") * (col("n_total") - col("n_docs")))
              .cast("double"))
          .as("auc"))
  }

  /** [[rankSumAuc]] over the composite quality score, one-vs-rest per
    * `source` — the driver surface for `corpus_quality_auc`. */
  def qualityAuc(docs: DataFrame): DataFrame =
    rankSumAuc(withQuality(docs).select(col("source"), col("quality")),
      "quality", "source")

  // ------------------------------------------------------------------
  // Language ID: character n-gram profiles (public heuristic — a tiny
  // profile table per language, cosine over trigram frequencies).
  // ------------------------------------------------------------------
  private[graft] val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " is ", " that ", " with ", "ing "),
    "de" -> Seq(" der ", " die ", " das ", " und ", " ist ", " mit ", "sch", " ein "),
    "fr" -> Seq(" le ", " la ", " les ", " et ", " est ", " une ", " dans ", " que "),
    "es" -> Seq(" el ", " la ", " los ", " y ", " es ", " una ", " que ", "ción"),
    "it" -> Seq(" il ", " la ", " di ", " e ", " che ", " per ", "zione"),
    "pt" -> Seq(" o ", " a ", " de ", " e ", " que ", " com ", "ção"),
    "nl" -> Seq(" de ", " het ", " een ", " en ", " van ", " dat ", "ij"))

  /** Fold order for the marker argmax: alphabetical, and a STRICT
    * greater-than replace — ties go to the alphabetically-first
    * language. The DuckDB oracle (`langIdOracleSql`) mirrors this
    * exactly, so both engines are deterministic and identical. */
  private[graft] val langOrder: Seq[String] = langMarkers.keys.toSeq.sorted

  /** Explicit codepoint ranges (NOT \p{script} classes, whose tables
    * differ between Java regex and RE2): Han, kana (hiragana+katakana),
    * hangul. */
  private[graft] val HanRange = "[\\x{4e00}-\\x{9fff}]"
  private[graft] val KanaRange = "[\\x{3040}-\\x{30ff}]"
  private[graft] val HangulRange = "[\\x{ac00}-\\x{d7af}]"

  /** Marker-count language ID, pure column expressions (no UDF — the
    * round-2 closure was the last one standing). Scripts short-circuit
    * first: kana → ja (round 2 conflated ja into zh by counting kana
    * with Han), Han → zh, hangul → ko; otherwise argmax of per-language
    * literal-marker counts (non-overlapping, via replace-length — the
    * same primitive DuckDB has, so the oracle is exact).
    *
    * SCALE WARNING: do not filter directly on `lang_pred` in the same
    * plan — PushDownPredicate substitutes the argmax CASE through this
    * projection, re-inlining `greatest(all scores)` into every branch,
    * where codegen subexpression elimination cannot reach (conditional
    * branches). Measured 35x slowdown at sf0.1 (0.49 s -> 17.3 s).
    * Materialize first (localCheckpoint/persist), as
    * `corpus_training_set` does. */
  def langId(docs: DataFrame): DataFrame =
    withLangPred(docs.select(col("doc_id"), col("lang"), col("text")))
      .select(col("doc_id"), col("lang").as("lang_true"), col("lang_pred"))

  /** [[langId]] as a column-preserving transform over ANY table with a
    * `text` column (no doc_id/lang requirement) — the form the
    * streaming quality gate composes with. Same expression tree as the
    * historical langId (two-step select, named score columns, strict
    * argmax fold), so predictions are identical. The SCALE WARNING
    * above applies here too. */
  private[graft] def withLangPred(df: DataFrame): DataFrame = {
    val t = concat(lit(" "), lower(substring(col("text"), 1, 4000)), lit(" "))
    def occ(m: String): Column =
      ((length(t) - length(replace(t, lit(m), lit("")))) / m.length).cast("int")
    // two-step select: scores become named columns so the argmax below
    // references each once instead of inlining the marker chains
    val scored = df.select(
      (df.columns.map(col).toSeq ++ Seq(
        regexp_count(col("text"), lit(HanRange)).as("__han"),
        regexp_count(col("text"), lit(KanaRange)).as("__kana"),
        regexp_count(col("text"), lit(HangulRange)).as("__hangul"))) ++
      langOrder.map(l => langMarkers(l).map(occ).reduce(_ + _).as(s"__s_$l")): _*)
    val m = greatest(langOrder.map(l => col(s"__s_$l")): _*)
    // earliest lang (alphabetical order) achieving the max
    val argmax = langOrder.foldRight(lit("und")) { (l, els) =>
      when(col(s"__s_$l") === m, lit(l)).otherwise(els)
    }
    val pred =
      when(col("text").isNull || length(col("text")) === 0, "und")
        .when(col("__han") + col("__kana") > 10,
          when(col("__kana") > 2, "ja").otherwise("zh"))
        .when(col("__hangul") > 10, "ko")
        .otherwise(when(m > 0, argmax).otherwise(lit("und")))
    scored.select(df.columns.map(col).toSeq :+ pred.as("lang_pred"): _*)
  }

  /** Language-ID confusion census: metadata lang vs classifier
    * prediction, the standard eval for a routing classifier before it
    * gates a corpus. One (lang_true, lang_pred) cell per row pair with
    * the row-normalized share (cell / row total) as ONE IEEE division
    * of exact longs.
    *
    * Scale shape: the classifier is a per-row projection (no UDF);
    * the corpus collapses in ONE partial-agg shuffle to ≤ |langs|²
    * cells (map-side combine does the heavy lifting), then a
    * broadcast join adds row totals. The langId pushdown trap does
    * not bite here — the derived column is grouped on (evaluated once
    * per row), never filtered on. */
  def langConfusion(docs: DataFrame): DataFrame = {
    val cm = withLangPred(docs.select(col("doc_id"), col("lang"), col("text")))
      .groupBy(col("lang").as("lang_true"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      // ≤ |langs|² rows, two consumers (cells + row totals): barrier,
      // or the marker-count classifier re-runs over the corpus twice
      .localCheckpoint(false)
    val tot = cm.groupBy(col("lang_true"))
      .agg(sum(col("n_docs")).as("n_true"))
    cm.join(broadcast(tot), "lang_true")
      .select(col("lang_true"), col("lang_pred"), col("n_docs"),
        col("n_true"),
        (col("n_docs").cast("double") / col("n_true").cast("double"))
          .as("share"))
  }

  /** DuckDB replica of [[langConfusion]]: [[langIdOracleSql]] as the
    * inner query (same marker table, same fold), grouped to cells. */
  def langConfusionOracleSql(table: String = "documents"): String =
    "WITH pred AS (\n" + langIdOracleSql(table) + "\n),\n" +
      """cm AS (SELECT lang_true, lang_pred,
        |         CAST(count(*) AS BIGINT) AS n_docs
        |       FROM pred GROUP BY lang_true, lang_pred),
        |tot AS (SELECT lang_true, CAST(sum(n_docs) AS BIGINT) AS n_true
        |        FROM cm GROUP BY lang_true)
        |SELECT lang_true, lang_pred, n_docs, n_true,
        |  CAST(n_docs AS DOUBLE) / CAST(n_true AS DOUBLE) AS share
        |FROM cm JOIN tot USING (lang_true)""".stripMargin

  /** DuckDB oracle for `langId`, generated from the SAME marker table
    * and fold order so the two can never drift. Integer marker counts,
    * literal replace, explicit codepoint ranges — engine-exact. */
  def langIdOracleSql(table: String = "documents"): String = {
    def occSql(m: String): String = {
      val lit = "'" + m.replace("'", "''") + "'"
      s"CAST((length(t) - length(replace(t, $lit, ''))) / ${m.length} AS INT)"
    }
    val scoreCols = langOrder.map { l =>
      langMarkers(l).map(occSql).mkString(" + ") + s" AS s_$l"
    }.mkString(",\n   ")
    // strict-greater fold, alphabetical order == earliest lang at max
    val argmax = langOrder.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
    s"""WITH base AS (
       | SELECT doc_id, lang, text, ' ' || lower(substr(text, 1, 4000)) || ' ' AS t
       | FROM $table),
       |scored AS (
       | SELECT doc_id, lang, text,
       |  len(regexp_extract_all(text, '$HanRange')) AS han,
       |  len(regexp_extract_all(text, '$KanaRange')) AS kana,
       |  len(regexp_extract_all(text, '$HangulRange')) AS hangul,
       |  $scoreCols
       | FROM base),
       |m AS (SELECT *, greatest(${langOrder.map("s_" + _).mkString(", ")}) AS m FROM scored)
       |SELECT doc_id, lang AS lang_true,
       | CASE WHEN text IS NULL OR length(text) = 0 THEN 'und'
       |      WHEN han + kana > 10 THEN (CASE WHEN kana > 2 THEN 'ja' ELSE 'zh' END)
       |      WHEN hangul > 10 THEN 'ko'
       |      WHEN m > 0 THEN (CASE $argmax END)
       |      ELSE 'und' END AS lang_pred
       |FROM m""".stripMargin
  }

  /** Repetition quality signals (Gopher-style, Rae et al. 2021):
    * duplicate-token fraction and most-frequent-bigram fraction flag
    * template spam / keyword-stuffed pages. Typed per-row kernel (one
    * hash map pass per doc — the documented mapPartitions case);
    * ratios are integer-derived doubles, so DuckDB reproduces them
    * bit-exactly. */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), lower(col("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = text.split("\\s+").filter(_.nonEmpty)
          val n = toks.length
          val distinct = new java.util.HashSet[String]()
          toks.foreach(distinct.add)
          val bigramCounts = new java.util.HashMap[String, Int]()
          var top = 0
          var i = 0
          while (i + 1 < n) {
            val bg = toks(i) + " " + toks(i + 1)
            val c = bigramCounts.merge(bg, 1, (a, b) => a + b)
            if (c > top) top = c
            i += 1
          }
          val dupFrac =
            if (n == 0) 0.0 else (n - distinct.size).toDouble / n
          val topFrac =
            if (n <= 1) 0.0 else top.toDouble / (n - 1)
          (id, n.toLong, distinct.size.toLong, dupFrac, top.toLong, topFrac)
        }
      }.toDF("doc_id", "n_tokens", "n_distinct", "dup_token_frac",
        "top_bigram_count", "top_bigram_frac")
  }

  /** Benchmark decontamination: corpus docs sharing any w-gram with the
    * benchmark set get flagged with their contaminated-gram count — the
    * asymmetric semi-join every eval-aware training pipeline runs. The
    * benchmark side is distinct-gram-only and small by construction, so
    * the optimizer broadcasts it; the corpus side streams. */
  def contamination(corpus: DataFrame, benchmark: DataFrame, w: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    def grams(df: DataFrame): DataFrame =
      df.select(col("doc_id"), explode(Dedup.shingles(col("text"), w)).as("g"))
    // materialize the benchmark gram set once (it feeds the bloom build
    // AND the verify join); eval suites are small by construction
    val bench = grams(benchmark).select(col("g")).distinct().localCheckpoint(false)
    // Bloom prefilter (round-2 verdict): probe a ~KB-scale filter at
    // the corpus gram source instead of shipping EVERY exploded gram
    // into the join — at corpus scale the non-contaminated grams
    // (~everything) die inside the scan stage. False positives are
    // harmless: the equi-join below still verifies exact membership;
    // the bloom only bounds what reaches it.
    val nBench = bench.count()
    val bloom = bench.stat.bloomFilter("g", math.max(nBench, 1000L), 0.01)
    val bloomB = spark.sparkContext.broadcast(bloom)
    // Corpus side: ONE fused kernel per row — tokenize, slide the
    // w-gram window with a reusable StringBuilder, per-doc dedup, and
    // probe the bloom inline, so only suspected grams are ever
    // materialized as output rows (the column formulation built every
    // gram into an array, deduped it, exploded it, and only then
    // filtered — 3 materializations of ~all-negative data). Same gram
    // semantics as `Dedup.shingles` (distinct w-grams; < w tokens →
    // one gram of all tokens).
    import spark.implicits._
    val suspects = corpus.select(col("doc_id").cast("long"), lower(col("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        val bf = bloomB.value
        it.flatMap { case (id, text) =>
          val toks = text.split("\\s+").filter(_.nonEmpty)
          val seen = new java.util.HashSet[String]()
          val out = List.newBuilder[(Long, String)]
          val sb = new java.lang.StringBuilder
          val n = if (toks.length < w) 1 else toks.length - w + 1
          var i = 0
          while (i < n) {
            sb.setLength(0)
            var j = 0
            while (j < w && i + j < toks.length) {
              if (j > 0) sb.append(' ')
              sb.append(toks(i + j))
              j += 1
            }
            val g = sb.toString
            if (seen.add(g) && bf.mightContainString(g)) out += ((id, g))
            i += 1
          }
          out.result()
        }
      }.toDF("doc_id", "g")
    suspects
      .join(broadcast(bench), "g")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("n_contaminated_grams"))
  }

  private val BloomGold = 0xc2b2ae3d27d4eb4fL

  /** Both bloom bit positions of a gram. Object-level on purpose — a
    * LOCAL def called from a closure lifts into the enclosing frame
    * and drags it (non-serializable) into the lambda. */
  @inline private[ops] def bloomPositions(g: String, m: Long): (Long, Long) = {
    val h = Dedup.hash64(g, 0, g.length)
    (java.lang.Long.remainderUnsigned(Dedup.mix64(h), m),
      java.lang.Long.remainderUnsigned(Dedup.mix64(h + BloomGold), m))
  }

  /** PURE-SKETCH decontamination with a built-in false-positive
    * audit: a hand-rolled 2-hash Bloom filter over the benchmark's
    * w-gram set, probed per corpus gram — plus the exact join, so the
    * output separates true hits from the filter's (deterministic!)
    * false positives. [[contamination]] uses a bloom only as a
    * prefilter before exact verification; this operator is the other
    * production shape — when the benchmark gram set is too large to
    * ship, ONLY the `mBits`-bit bitmap is broadcast and the sketch's
    * answer is the decision. The audit columns quantify what that
    * buys: n_false_pos/n_grams IS the realized FP rate.
    *
    * Everything is deterministic and engine-exact: positions are
    * p_i = unsigned(mix64(FNV1a64(gram) + i·GOLD)) mod mBits, so the
    * DuckDB oracle replays the exact bit set via HUGEINT arithmetic —
    * restated as a position SEMI-JOIN (gram passes iff BOTH its
    * positions are in the set-bit set), no bit arithmetic on the
    * oracle side at all.
    *
    * Scale shape: bitmap build is gram-explode → (word, bit_or) — a
    * ≤ mBits/64-row rollup collected and broadcast (a KB, never
    * data); the corpus pays one fused kernel pass (tokenize + slide +
    * probe inline) and the audit join only carries bloom-positive
    * grams. Docs with < w tokens contribute their single all-token
    * gram (Dedup.shingles semantics; every testdata doc has >= w
    * tokens, which the oracle's generate_series formulation relies
    * on — same caveat as text_decontaminate). */
  def bloomDecontaminate(corpus: DataFrame, benchmark: DataFrame,
                         w: Int = 5, mBits: Int = 8192): DataFrame = {
    require(mBits % 64 == 0, "mBits must pack into longs")
    val spark = corpus.sparkSession
    import spark.implicits._
    val m = mBits.toLong
    val bench = benchmark
      .select(explode(Dedup.shingles(col("text"), w)).as("g"))
      .distinct().localCheckpoint(false)
    val words = bench.as[String]
      .flatMap { g =>
        val (p0, p1) = bloomPositions(g, m)
        Seq(p0, p1)
      }
      .toDF("p")
      .select((col("p") / 64).cast("int").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").as("mask"))
      .groupBy(col("word")).agg(expr("bit_or(mask)").as("m"))
      .collect()
    val bitmap = new Array[Long](mBits / 64)
    words.foreach(r => bitmap(r.getInt(0)) = r.getLong(1))
    val bitsB = spark.sparkContext.broadcast(bitmap)
    val perDoc = corpus
      .select(col("doc_id").cast("long"), lower(col("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        val bits = bitsB.value
        it.map { case (id, text) =>
          val toks = text.split("\\s+").filter(_.nonEmpty)
          val seen = new java.util.HashSet[String]()
          val hits = List.newBuilder[String]
          val sb = new java.lang.StringBuilder
          val n = if (toks.length < w) 1 else toks.length - w + 1
          var i = 0
          while (i < n) {
            sb.setLength(0)
            var j = 0
            while (j < w && i + j < toks.length) {
              if (j > 0) sb.append(' ')
              sb.append(toks(i + j))
              j += 1
            }
            val g = sb.toString
            if (seen.add(g)) {
              val (p0, p1) = bloomPositions(g, m)
              if ((bits((p0 >> 6).toInt) & (1L << (p0 & 63))) != 0 &&
                  (bits((p1 >> 6).toInt) & (1L << (p1 & 63))) != 0)
                hits += g
            }
            i += 1
          }
          (id, seen.size.toLong, hits.result())
        }
      }.toDF("doc_id", "n_grams", "suspects")
    perDoc
      .select(col("doc_id"), col("n_grams"),
        explode_outer(col("suspects")).as("g"))
      .join(broadcast(bench.withColumn("hit", lit(1L))), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(max(col("n_grams")).as("n_grams"),
        count(col("g")).as("n_bloom_hits"),
        count(col("hit")).as("n_true_hits"))
      .select(col("doc_id"), col("n_grams"), col("n_bloom_hits"),
        col("n_true_hits"),
        (col("n_bloom_hits") - col("n_true_hits")).as("n_false_pos"))
  }

  /** DuckDB replica of [[bloomDecontaminate]] over the
    * text_decontaminate split (bench = doc_id < 20): HUGEINT replay
    * of FNV1a + splitmix64, bit membership restated as a position
    * semi-join against the benchmark's set-bit set. */
  def bloomOracleSql(mBits: Int = 8192): String = {
    import SimhashOracle.{mulmod, xor64}
    val M = "18446744073709551616"
    val gold = java.lang.Long.toUnsignedString(BloomGold)
    val sm1 = java.lang.Long.toUnsignedString(0x9e3779b97f4a7c15L)
    val sm2 = java.lang.Long.toUnsignedString(0xbf58476d1ce4e5b9L)
    val sm3 = java.lang.Long.toUnsignedString(0x94d049bb133111ebL)
    val off = java.lang.Long.toUnsignedString(0xcbf29ce484222325L)
    val fnvStep = mulmod(xor64("h", "c"), "1099511628211")
    s"""WITH toks AS (
       | SELECT doc_id, list_filter(string_split_regex(lower(text), '[\\s\\x0b]+'), x -> len(x) > 0) AS t
       | FROM documents),
       |grams AS (
       | SELECT doc_id,
       |  unnest(list_distinct(list_transform(generate_series(1, len(t) - 4),
       |    i -> array_to_string(t[i:i+4], ' ')))) AS g
       | FROM toks),
       |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 20),
       |allg AS (SELECT DISTINCT g FROM grams),
       |gh AS (SELECT g,
       |  list_reduce(list_prepend(CAST('$off' AS HUGEINT),
       |      list_transform(string_split(g, ''),
       |        x -> CAST(unicode(x) AS HUGEINT))),
       |    (h, c) -> $fnvStep) AS h
       | FROM allg),
       |gi AS (SELECT g, unnest([0, 1]) AS i, h FROM gh),
       |z0 AS (SELECT g, i, (h + i * CAST('$gold' AS HUGEINT) + CAST('$sm1' AS HUGEINT)) % $M AS z FROM gi),
       |z1 AS (SELECT g, i, ${mulmod(xor64("z", s"z // ${1L << 30}"), sm2)} AS z FROM z0),
       |z2 AS (SELECT g, i, ${mulmod(xor64("z", s"z // ${1L << 27}"), sm3)} AS z FROM z1),
       |pos AS (SELECT g, i, ${xor64("z", s"z // ${1L << 31}")} % $mBits AS p FROM z2),
       |sbits AS (SELECT DISTINCT p FROM pos JOIN bench USING (g)),
       |gpass AS (SELECT pos.g FROM pos LEFT JOIN sbits USING (p)
       |          GROUP BY pos.g HAVING count(sbits.p) = 2),
       |cg AS (SELECT doc_id, g FROM grams WHERE doc_id >= 20)
       |SELECT cg.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |  CAST(count(bp.g) AS BIGINT) AS n_bloom_hits,
       |  CAST(count(be.g) AS BIGINT) AS n_true_hits,
       |  CAST(count(bp.g) - count(be.g) AS BIGINT) AS n_false_pos
       |FROM cg LEFT JOIN gpass bp ON cg.g = bp.g
       |        LEFT JOIN bench be ON cg.g = be.g
       |GROUP BY cg.doc_id""".stripMargin
  }

  /** Corpus-statistics quality signal (CCNet-style fit-then-score,
    * Wenzek et al. 2019): pass 1 aggregates a global character-trigram
    * frequency table; pass 2 scores each document by how many of its
    * trigrams are globally rare (frequency below a quarter of the mean
    * — the comparison is integer cross-multiplied, c·4·nDistinct <
    * total, so both engines decide it exactly). The global table is
    * vocabulary-sized → broadcast back; the only wide op over the big
    * flow is one count shuffle + one per-doc aggregation. */
  def rareTrigramSignals(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // One counting kernel per doc emitting DISTINCT (tri, count) rows:
    // the column formulation exploded EVERY trigram occurrence twice
    // (global count + per-doc re-join) — on narrow-vocab corpora the
    // distinct-per-doc rows are ~5x fewer, and every downstream agg
    // works on pre-counted integers, same exact results. Docs shorter
    // than 3 chars emit nothing (= DuckDB's empty generate_series).
    // localCheckpoint: the table feeds the global pass AND the final
    // agg; materializing once beats re-tokenizing, and checkpoint
    // (unlike persist) leaves no cache entry for callers to clean up.
    val triCounts = docs.select(col("doc_id").cast("long"), lower(col("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val m = new java.util.HashMap[String, Int]()
          var i = 0
          val n = text.length - 2
          while (i < n) {
            m.merge(text.substring(i, i + 3), 1, (a, b) => a + b)
            i += 1
          }
          val out = new scala.collection.mutable.ArrayBuffer[(Long, String, Int)](m.size)
          m.forEach((tri, c) => out += ((id, tri, c)))
          out
        }
      }.toDF("doc_id", "tri", "c")
      .localCheckpoint(false)
    val global = triCounts.groupBy(col("tri")).agg(sum(col("c")).as("c"))
    val stats = global.agg(sum(col("c")).as("total"), count(lit(1)).as("n_distinct"))
    val rare = global.crossJoin(broadcast(stats))
      .filter(col("c") * 4 * col("n_distinct") < col("total"))
      .select(col("tri"), lit(true).as("is_rare"))
    triCounts.join(broadcast(rare), Seq("tri"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_trigrams"),
        sum(when(col("is_rare"), col("c")).otherwise(0)).cast("long").as("n_rare"))
  }

  /** PII patterns shared by scrub + oracle (RE2-compatible subset so
    * Spark's Java regex and DuckDB's RE2 agree byte-for-byte). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** PII scrub: count + redact emails and IPv4 literals — the standard
    * pre-training privacy pass. Pure codegen'd column expressions
    * (regexp_count / regexp_replace), no UDF. */
  def piiScrub(docs: DataFrame): DataFrame = {
    val redacted = regexp_replace(
      regexp_replace(col("text"), EmailPattern, "[EMAIL]"),
      Ipv4Pattern, "[IP]")
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(Ipv4Pattern)).cast("long").as("n_ips"),
      length(redacted).cast("long").as("redacted_len"))
  }

  /** Rolling-hash (Karp-Rabin) document fingerprint: min-sampled hashes
    * of 16-char windows → single 64-bit fingerprint. Backed by the
    * codegen'd Catalyst expression `DocFingerprint` (round 1 used a
    * Scala UDF; the native expression stays inside whole-stage codegen
    * with no serialization boundary and is SQL-addressable). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.spark.DocFingerprint.of(
        coalesce(col("text"), lit(""))).as("fingerprint"))

  // ------------------------------------------------------------------
  // Unicode normalization (corpus hygiene)
  // ------------------------------------------------------------------

  /** Unicode hygiene pass every crawl corpus needs before dedup or
    * tokenization: the same word arrives both precomposed (é) and
    * decomposed (e + U+0301) from different sites, so exact-dup and
    * shingle hashes silently miss equal text. Semantics, in order:
    *  1. strip C0 controls except \t \n \r, plus DEL (U+007F) —
    *     crawl payloads carry NUL/BEL from broken transcoders;
    *  2. NFC canonical composition (java.text.Normalizer, UAX #15).
    * Strip-then-compose is deliberate: a base letter and its combining
    * mark separated by a stray control must still compose.
    *
    * Output per doc: text_norm, changed (norm ≠ raw), len_raw/len_norm
    * in CODEPOINTS (not UTF-16 units — astral-safe, and the unit
    * DuckDB's length() counts). Per-row kernel, zero shuffle;
    * normalization is idempotent (spec-pinned), so re-running the
    * pass on already-clean shards is a no-op. */
  def normalizeText(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"),
        coalesce(col("text"), lit("")).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, raw) =>
        val norm = normalizeString(raw)
        (id, norm, norm != raw,
          raw.codePointCount(0, raw.length),
          norm.codePointCount(0, norm.length))
      })
      .toDF("doc_id", "text_norm", "changed", "len_raw", "len_norm")
  }

  /** Scalar kernel of [[normalizeText]]: control strip, then NFC. */
  private[ops] def normalizeString(s: String): String = {
    val stripped = stripControls(s)
    if (java.text.Normalizer.isNormalized(stripped,
        java.text.Normalizer.Form.NFC)) stripped // common-case zero-copy
    else java.text.Normalizer.normalize(stripped,
      java.text.Normalizer.Form.NFC)
  }

  private def isStrippedControl(c: Char): Boolean =
    (c < 0x20 && c != '\t' && c != '\n' && c != '\r') || c == 0x7f

  private def stripControls(s: String): String = {
    var i = 0
    while (i < s.length && !isStrippedControl(s.charAt(i))) i += 1
    if (i == s.length) return s // fast path: clean string, zero-copy
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(s, 0, i)
    while (i < s.length) {
      val c = s.charAt(i)
      if (!isStrippedControl(c)) sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Deterministic mixed-normalization corpus over documents: variant
    * v = d%5 appends one hazard to an ASCII base — decomposed accent,
    * ring+diaeresis word, combining-reorder pair (U+1E0B U+0323, whose
    * NFC form swaps to U+1E0D U+0307), or embedded C0 controls.
    * [[normalizeOracleSql]] states each variant's normalized form in
    * CLOSED FORM — hand-derived UAX #15 ground truth, independent of
    * both engines' normalizers. */
  def syntheticMessyText(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    val base = substring(col("text"), 1, 20)
    val frag = when(d % 5 === 1, lit("Café"))
      .when(d % 5 === 2, lit("Ångström"))
      .when(d % 5 === 3, lit("ḍ̇"))
      .when(d % 5 === 4, lit("ab\u0007cd\u0000ef"))
      .otherwise(lit(""))
    docs.select(d.as("doc_id"), concat(base, frag).as("text"))
  }

  /** Closed-form oracle for normalizeText(syntheticMessyText(docs)). */
  def normalizeOracleSql: String =
    """WITH v AS (SELECT doc_id, substr(text, 1, 20) AS b,
      |                  doc_id % 5 AS m FROM documents)
      |SELECT doc_id,
      | CASE m WHEN 1 THEN b || 'Café'
      |        WHEN 2 THEN b || 'Ångström'
      |        WHEN 3 THEN b || 'ḍ̇'
      |        WHEN 4 THEN b || 'abcdef'
      |        ELSE b END AS text_norm,
      | m <> 0 AS changed,
      | CAST(length(b) + CASE m WHEN 1 THEN 5 WHEN 2 THEN 10
      |   WHEN 3 THEN 2 WHEN 4 THEN 8 ELSE 0 END AS INT) AS len_raw,
      | CAST(length(b) + CASE m WHEN 1 THEN 4 WHEN 2 THEN 8
      |   WHEN 3 THEN 2 WHEN 4 THEN 6 ELSE 0 END AS INT) AS len_norm
      |FROM v""".stripMargin

  /** PMI collocation mining: the top-`k` adjacent-token bigrams by
    * pointwise mutual information — the classic phrase/collocation
    * detector (Church & Hanks 1990) a tokenizer pipeline runs to
    * decide multi-word vocabulary entries. PMI = log of the lift
    * c_xy·N / (c_x·c_y); since log is monotone, RANKING by the lift
    * ratio is ranking by PMI, and the ratio of two exactly-
    * representable longs is ONE IEEE division — bit-identical in
    * Spark and DuckDB (no transcendental in the comparator). Ties
    * (identical ratio) break (a asc, b asc). `minCount` floors c_xy:
    * hapax bigrams have degenerate infinite-ish PMI and are noise.
    *
    * Integer-only output: (a, b, c_xy, c_x, c_y, n_tokens); the
    * consumer divides. Overflow bound: c_xy·N must fit a Long AND
    * stay exact in a double (< 2^53) — at 10^12-token corpora count
    * in kilotoken units first (same caveat as crawlBudget).
    *
    * Scale shape: two partial-aggregated hash shuffles (bigram and
    * unigram counts — both collapse map-side), two equi-joins of the
    * bigram table against the vocabulary-sized unigram table (AQE
    * broadcasts the small side), a 1-row N scalar broadcast via
    * crossJoin, and a TakeOrderedAndProject top-k — per-map-task
    * k-row heaps, never a global sort or a partitionless window. */
  def pmiCollocations(docs: DataFrame, minCount: Long = 5L,
                      k: Int = 20): DataFrame = {
    val toks = docs.select(tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .withColumn("l", slice(col("toks"), lit(1), size(col("toks")) - 1))
      .withColumn("r", expr("slice(toks, 2, size(toks) - 1)"))
    val bi = toks
      .select(explode(arrays_zip(col("l"), col("r"))).as("p"))
      .select(col("p.l").as("a"), col("p.r").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    val uni = docs.select(explode(tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val n = uni.agg(sum(col("c")).as("n_tokens"))
    bi.join(uni.select(col("t").as("a"), col("c").as("c_x")), Seq("a"))
      .join(uni.select(col("t").as("b"), col("c").as("c_y")), Seq("b"))
      .crossJoin(broadcast(n))
      .orderBy(((col("c_xy") * col("n_tokens")).cast("double") /
                (col("c_x") * col("c_y")).cast("double")).desc,
        col("a").asc, col("b").asc)
      .limit(k)
      .select(col("a"), col("b"), col("c_xy"), col("c_x"), col("c_y"),
        col("n_tokens"))
  }

  /** DuckDB replica of [[pmiCollocations]] — list_zip pair
    * extraction instead of the engine's slice+arrays_zip, same
    * single-division comparator. */
  def pmiOracleSql(minCount: Long = 5L, k: Int = 20): String =
    s"""WITH t AS (SELECT list_filter(
       |    string_split_regex(lower(text), '[\\s\\x0b]+'),
       |    x -> len(x) > 0) AS toks FROM documents),
       |bi AS (
       | SELECT z[1] AS a, z[2] AS b, CAST(count(*) AS BIGINT) AS c_xy
       | FROM (SELECT unnest(list_zip(toks[1:-2], toks[2:-1])) AS z
       |       FROM t WHERE len(toks) >= 2)
       | GROUP BY a, b HAVING count(*) >= $minCount),
       |uni AS (SELECT unnest(toks) AS tok FROM t),
       |u AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY tok),
       |n AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens FROM u)
       |SELECT bi.a, bi.b, bi.c_xy, ua.c AS c_x, ub.c AS c_y, n.n_tokens
       |FROM bi JOIN u ua ON bi.a = ua.tok JOIN u ub ON bi.b = ub.tok
       |     CROSS JOIN n
       |ORDER BY CAST(bi.c_xy * n.n_tokens AS DOUBLE) /
       |         CAST(ua.c * ub.c AS DOUBLE) DESC, bi.a, bi.b
       |LIMIT $k""".stripMargin

  // ------------------------------------------------------------------
  // Readability (Flesch–Kincaid grade over heuristic syllables)
  // ------------------------------------------------------------------

  /** Flesch–Kincaid grade level per document — the classic education-
    * level quality signal (the published formula: 0.39·W/S +
    * 11.8·Y/W − 15.59). Every input is an exact integer count:
    *
    *  - words: whitespace tokens stripped to [a-z] (punctuation-glued
    *    tokens like "there." must count the same as "there"), empties
    *    dropped;
    *  - sentences: non-empty [.!?]+ splits of the raw text, floored
    *    at 1 (headline-only docs have no terminator);
    *  - syllables: vowel-group count per word ([aeiouy]+ runs), minus
    *    one for a silent trailing 'e' when ≥2 groups, floored at 1 —
    *    the standard dictionary-free heuristic.
    *
    * The grade itself is the only float: a fixed-shape expression of
    * three exact longs (two divisions, two multiplies, one add, one
    * subtract, round 4), identical step order in the DuckDB oracle —
    * the same engine-exactness discipline as qualityScore. */
  def readability(docs: DataFrame): DataFrame = {
    val words = filter(
      transform(tokens(col("text")), w => regexp_replace(w, "[^a-z]", "")),
      w => length(w) > 0)
    val sentences = greatest(lit(1L),
      size(filter(split(col("text"), "[.!?]+"),
        s => length(regexp_replace(s, "\\s", "")) > 0)).cast("long"))
    def syl(w: Column): Column = {
      val groups = size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0)))
      greatest(lit(1),
        groups - when(w.endsWith("e") && groups >= 2, lit(1)).otherwise(lit(0)))
    }
    docs.select(col("doc_id"),
        size(words).cast("long").as("n_words"),
        sentences.as("n_sentences"),
        aggregate(words, lit(0L), (acc, w) => acc + syl(w)).as("n_syllables"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"), col("n_syllables"),
        when(col("n_words") === 0L, lit(0.0)).otherwise(round(
          lit(0.39) * (col("n_words").cast("double") / col("n_sentences").cast("double")) +
            lit(11.8) * (col("n_syllables").cast("double") / col("n_words").cast("double")) -
            lit(15.59), 4)).as("fk_grade"))
  }

  /** DuckDB replica of [[readability]] — same tokenizer, same regex
    * classes (shared Java-regex/RE2 subset), same IEEE step order. */
  def readabilityOracleSql(table: String = "documents"): String =
    s"""WITH base AS (
       |  SELECT doc_id,
       |    list_filter(list_transform(
       |      list_filter(string_split_regex(lower(text), '[\\s\\x0b]+'), x -> len(x) > 0),
       |      w -> regexp_replace(w, '[^a-z]', '', 'g')), w -> len(w) > 0) AS ws,
       |    greatest(1, CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
       |      s -> len(regexp_replace(s, '\\s', '', 'g')) > 0)) AS BIGINT)) AS n_sentences
       |  FROM $table),
       |counts AS (
       |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words, n_sentences,
       |    CAST(list_sum(list_prepend(0, list_transform(ws, w ->
       |      greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))
       |        - CASE WHEN ends_with(w, 'e')
       |                AND len(regexp_extract_all(w, '[aeiouy]+')) >= 2
       |               THEN 1 ELSE 0 END)))) AS BIGINT) AS n_syllables
       |  FROM base)
       |SELECT doc_id, n_words, n_sentences, n_syllables,
       |  CASE WHEN n_words = 0 THEN 0.0
       |       ELSE round(
       |         0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)) +
       |         11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) -
       |         15.59, 4)
       |  END AS fk_grade
       |FROM counts""".stripMargin

  // ------------------------------------------------------------------
  // Mojibake repair (ftfy-style encoding fix-up)
  // ------------------------------------------------------------------

  /** windows-1252 byte -> char table: the JDK's own decoder, with the
    * five undefined cp1252 bytes (81/8D/8F/90/9D — the JDK decodes
    * them to U+FFFD) mapped to the corresponding C1 controls instead —
    * ftfy's "sloppy-windows-1252" convention, which is what real
    * transcoders emit and what keeps the round trip total. */
  private val cp1252FromByte: Array[Char] = {
    val cs = java.nio.charset.Charset.forName("windows-1252")
    Array.tabulate(256) { b =>
      val c = new String(Array(b.toByte), cs).charAt(0)
      if (c == '�') b.toChar else c
    }
  }

  /** char -> cp1252 byte inverse (-1 = not representable). Dense array
    * sized past the highest mapped codepoint (U+2122 TRADE MARK SIGN). */
  private val cp1252ToByte: Array[Int] = {
    val arr = Array.fill(0x2200)(-1)
    var b = 0
    while (b < 256) { arr(cp1252FromByte(b)) = b; b += 1 }
    arr
  }

  /** One mojibake round trip: re-encode `s` as windows-1252 bytes and
    * strictly re-decode them as UTF-8. Returns `s` unchanged unless
    *  - every char maps to a cp1252 byte,
    *  - at least one byte is >= 0x80 (pure ASCII is a fixpoint), and
    *  - the byte string is WELL-FORMED UTF-8 (strict decoder: overlong
    *    forms, surrogates, and truncated sequences all reject).
    * The strictness IS the false-positive guard (the ftfy argument):
    * genuine Latin-1/cp1252 prose almost never forms valid UTF-8,
    * because its accented letters are lone lead bytes. */
  private[ops] def mojibakeRoundtrip(s: String): String = {
    val n = s.length
    var i = 0
    var hasHigh = false
    while (i < n && !hasHigh) { // zero-alloc gate for clean shards
      if (s.charAt(i) >= 0x80) hasHigh = true
      i += 1
    }
    if (!hasHigh) return s
    val bytes = new Array[Byte](n)
    i = 0
    while (i < n) {
      val c = s.charAt(i)
      val b = if (c < 0x2200) cp1252ToByte(c) else -1
      if (b < 0) return s // unmappable char: not cp1252 mojibake
      bytes(i) = b.toByte
      i += 1
    }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (out == s) s else out
    } catch {
      case _: java.nio.charset.CharacterCodingException => s
    }
  }

  /** Repair UTF-8-bytes-mis-decoded-as-cp1252 mojibake ("CafÃ©" ->
    * "Café"), looping the round trip to a fixpoint so double-encoded
    * text ("CafÃƒÂ©") also heals; `maxRounds` bounds pathological
    * inputs. Returns (fixed, rounds applied). */
  private[ops] def repairMojibakeString(s: String,
                                        maxRounds: Int = 4): (String, Int) = {
    var cur = s
    var r = 0
    while (r < maxRounds) {
      val next = mojibakeRoundtrip(cur)
      if (next == cur) return (cur, r)
      cur = next
      r += 1
    }
    (cur, r)
  }

  /** Mojibake repair over documents (the ftfy pass every web-crawl
    * pipeline runs before tokenization): per-row scalar kernel, zero
    * shuffle, zero allocation on already-clean rows. Output: fixed
    * text, changed flag, and the number of decode generations undone
    * (2 = double-encoded). */
  def repairEncoding(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"),
        coalesce(col("text"), lit("")).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, raw) =>
        val (fixed, rounds) = repairMojibakeString(raw)
        (id, fixed, fixed != raw, rounds)
      })
      .toDF("doc_id", "text_fixed", "changed", "rounds")
  }

  /** Deterministic mojibake corpus over documents: variant m = d%6
    * appends one hazard to a 20-char ASCII base —
    *  m=1 "CafÃ©"     single mis-decode of "Café"
    *  m=2 "â€”dashâ€”" em-dashes through the cp1252 specials (0x80/0x94)
    *  m=3 "naÃ¯ve"    single mis-decode of "naïve"
    *  m=4 "Ã "        FAKE mojibake (0xC3 0x20 is malformed UTF-8 — the
    *                  strict-decode gate must leave it alone)
    *  m=5 "CafÃƒÂ©"   DOUBLE-encoded "Café" (two fixpoint rounds)
    * [[mojibakeOracleSql]] states each variant's repaired form in
    * closed form — hand-derived from the UTF-8/cp1252 tables,
    * independent of both engines' codecs. */
  def syntheticMojibakeText(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    val base = substring(col("text"), 1, 20)
    val frag = when(d % 6 === 1, lit("CafÃ©"))
      .when(d % 6 === 2, lit("â€”dashâ€”"))
      .when(d % 6 === 3, lit("naÃ¯ve"))
      .when(d % 6 === 4, lit("Ã "))
      .when(d % 6 === 5, lit("CafÃƒÂ©"))
      .otherwise(lit(""))
    docs.select(d.as("doc_id"), concat(base, frag).as("text"))
  }

  /** Closed-form oracle for repairEncoding(syntheticMojibakeText(_)). */
  def mojibakeOracleSql: String =
    "WITH v AS (SELECT doc_id, substr(text, 1, 20) AS b,\n" +
    "                  doc_id % 6 AS m FROM documents)\n" +
    "SELECT doc_id,\n" +
    " CASE m WHEN 1 THEN b || 'Café'\n" +
    "        WHEN 2 THEN b || '—dash—'\n" +
    "        WHEN 3 THEN b || 'naïve'\n" +
    "        WHEN 4 THEN b || 'Ã '\n" +
    "        WHEN 5 THEN b || 'Café'\n" +
    "        ELSE b END AS text_fixed,\n" +
    " m IN (1, 2, 3, 5) AS changed,\n" +
    " CAST(CASE m WHEN 5 THEN 2 WHEN 4 THEN 0 WHEN 0 THEN 0\n" +
    "             ELSE 1 END AS INT) AS rounds\n" +
    "FROM v"

  /** Cross-snapshot quality-DRIFT census — the pipeline-monitoring
    * table a recurring crawl watches: decile-bucket the shared
    * quality score on two snapshots (prev = doc_id % 5 ≠ 0; cur =
    * doc_id % 7 ≠ 0 with the % 3 docs re-fetched as text+" v2" — the
    * cdc_delta snapshot convention), then the EXACT total-variation
    * distance between the two bucket distributions:
    * tv_permille = Σ_b |n_prev_b·Tc − n_cur_b·Tp| · 500 div (Tp·Tc)
    * — all-integer (PSI would need log; TV is the rational drift
    * metric). Bucket = least(floor(quality·10), 9): quality is the
    * SAME engine-exact double both sides already hash-match on, and
    * ·10/floor are deterministic IEEE.
    *
    * Scale shape: two corpus passes (one per snapshot) collapse to
    * ≤ 10 bucket rows before ANYTHING joins; totals and TV are
    * driver scalars over the 10-row table (localCheckpoint'd once).
    * Long arithmetic safe to 3·10^15 docs per snapshot. */
  def qualityDrift(docs: DataFrame): DataFrame = {
    val prev = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), col("text"))
    val cur = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
    def buckets(df: DataFrame, name: String) =
      withQuality(df)
        .select(least(floor(col("quality") * 10).cast("long"), lit(9L))
          .as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as(name))
    val joined = buckets(prev, "n_prev")
      .join(buckets(cur, "n_cur"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_prev"), lit(0L)).as("n_prev"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .localCheckpoint(false) // <= 10 rows, three consumers
    val tot = joined.agg(sum(col("n_prev")), sum(col("n_cur"))).collect()(0)
    val (tp, tc) = (tot.getLong(0), tot.getLong(1))
    val tvNum = joined
      .agg(sum(abs(col("n_prev") * tc - col("n_cur") * tp))).collect()(0)
      .getLong(0)
    // BigInt: tvNum is bounded by tp*tc, so the Long multiply would
    // overflow once tp*tc > ~1.8e16 (~1.3e8 docs per snapshot); the
    // quotient is <= 500 and exact in BigInt at any corpus size
    val tv = (BigInt(tvNum) * 500 / (BigInt(tp) * BigInt(tc))).toLong
    joined.select(col("bucket"), col("n_prev"), col("n_cur"),
      expr(s"n_prev * 1000 div ${tp}L").as("prev_share_permille"),
      expr(s"n_cur * 1000 div ${tc}L").as("cur_share_permille"),
      lit(tv).as("tv_permille"))
  }

  /** One-row DATASET CARD — the datasheet a corpus release ships
    * (Gebru et al. "Datasheets for Datasets", the quantitative half):
    * exact corpus counts (docs/tokens/chars/langs/sources), the exact
    * duplicate census (docs minus distinct texts — engine dedups by
    * xxhash64(text), equal to distinct-text absent a 64-bit collision,
    * the exactByHash contract), source concentration (top source's
    * token share, permille), and the quality tercile counts over the
    * SHARED score. Integer-only output.
    *
    * Scale shape: ONE corpus scan materializes the narrow per-doc
    * projection (lang, source, toks, chars, quality, text hash) via
    * localCheckpoint; every census arm reads that projection — the
    * corpus is never re-scanned; the source rollup is bounded and its
    * max/total are driver scalars. */
  def datasetCard(docs: DataFrame): DataFrame = {
    val proj = withQuality(docs)
      .select(col("lang"), col("source"),
        size(tokens(col("text"))).cast("long").as("toks"),
        length(col("text")).cast("long").as("chars"),
        col("quality"), xxhash64(col("text")).as("h"))
      .localCheckpoint(false)
    val agg = proj.agg(
      count(lit(1)).as("n_docs"),
      sum(col("toks")).as("n_tokens"),
      sum(col("chars")).as("n_chars"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("h")).as("n_distinct_texts"),
      sum(when(col("quality") >= 0.7, 1L).otherwise(0L)).as("q_hi_docs"),
      sum(when(col("quality") >= 0.4 && col("quality") < 0.7, 1L)
        .otherwise(0L)).as("q_mid_docs"),
      sum(when(col("quality") < 0.4, 1L).otherwise(0L)).as("q_lo_docs"))
    val srcTop = proj.groupBy(col("source"))
      .agg(sum(col("toks")).as("t"))
      .agg(max(col("t"))).collect()(0).getLong(0)
    agg.select(col("n_docs"), col("n_tokens"), col("n_chars"),
      col("n_langs"), col("n_sources"), col("n_distinct_texts"),
      (col("n_docs") - col("n_distinct_texts")).as("n_dup_docs"),
      lit(srcTop).as("top_source_tokens"),
      expr(s"${srcTop}L * 1000 div n_tokens")
        .as("top_source_tokens_permille"),
      col("q_hi_docs"), col("q_mid_docs"), col("q_lo_docs"))
  }

  // ------------------------------------------------------------------
  // Instruction-format detection (corpus_instruction_detect):
  // pretraining corpora must not silently absorb instruct/chat data
  // (it skews the base-model distribution and leaks eval formats) —
  // route documents carrying dialogue/instruction scaffolding.
  // ------------------------------------------------------------------

  /** Deterministic instruct-planted corpus, doc_id % 6 variants:
    * Q:/A: pair, markdown Instruction/Response, User/Assistant chat
    * tail, [INST] tags, a lone System: line, none. */
  private[graft] def syntheticInstructMix(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      when(col("doc_id") % 6 === 0,
        concat(lit("Q: what is x?\nA: it is y.\n"), col("text")))
      .when(col("doc_id") % 6 === 1,
        concat(lit("### Instruction:\nDo the thing\n### Response:\nDone\n"),
          col("text")))
      .when(col("doc_id") % 6 === 2,
        concat(col("text"), lit("\nUser: hello\nAssistant: hi")))
      .when(col("doc_id") % 6 === 3,
        concat(lit("[INST] do [/INST] done "), col("text")))
      .when(col("doc_id") % 6 === 4,
        concat(col("text"), lit("\nSystem: you are helpful")))
      .otherwise(col("text")).as("text"))

  /** Instruction-format router + census: integer marker counts
    * ((?m)-anchored line starts / literal scaffolding, Java∩RE2
    * common subset) and a FIRST-MATCH family ladder — paired
    * markdown scaffolding > [INST] tag pair > Q:/A: pair > any chat
    * line > none. Census per (source, family): docs + total marker
    * hits. Scan-local signals, ONE partial-agg rollup. */
  def instructionDetect(docs: DataFrame): DataFrame = {
    val t = col("text")
    val qa = regexp_count(t, lit("(?m)^(Q|A): ")).cast("long")
    val chat = regexp_count(t,
      lit("(?m)^(User|Assistant|System): ")).cast("long")
    val md = regexp_count(t, lit("### (Instruction|Response):")).cast("long")
    val tag = regexp_count(t, lit("\\[/?INST\\]")).cast("long")
    val family = when(md >= 2, "inst_md")
      .when(tag >= 2, "inst_tag")
      .when(qa >= 2, "qa")
      .when(chat >= 1, "chat")
      .otherwise("none")
    docs.select(col("source"), family.as("family"),
        (qa + chat + md + tag).as("hits"))
      .groupBy(col("source"), col("family"))
      .agg(count(lit(1)).as("n_docs"), sum(col("hits")).as("n_marker_hits"))
  }

  /** DuckDB oracle for
    * instructionDetect(syntheticInstructMix(documents)) — variants
    * AND the ladder both restated; organic text runs the same
    * regex counts so a false positive on either side breaks it. */
  def instructionDetectOracleSql(): String =
    s"""WITH mix AS (
       |  SELECT doc_id, source, 
       |    CASE doc_id % 6
       |      WHEN 0 THEN 'Q: what is x?' || chr(10) || 'A: it is y.'
       |        || chr(10) || text
       |      WHEN 1 THEN '### Instruction:' || chr(10) || 'Do the thing'
       |        || chr(10) || '### Response:' || chr(10) || 'Done'
       |        || chr(10) || text
       |      WHEN 2 THEN text || chr(10) || 'User: hello' || chr(10)
       |        || 'Assistant: hi'
       |      WHEN 3 THEN '[INST] do [/INST] done ' || text
       |      WHEN 4 THEN text || chr(10) || 'System: you are helpful'
       |      ELSE text END AS text
       |  FROM documents),
       |sig AS (
       |  SELECT source,
       |    len(regexp_extract_all(text, '(?m)^(Q|A): ')) AS qa,
       |    len(regexp_extract_all(text, '(?m)^(User|Assistant|System): ')) AS chat,
       |    len(regexp_extract_all(text, '### (Instruction|Response):')) AS md,
       |    len(regexp_extract_all(text, '\\[/?INST\\]')) AS tag
       |  FROM mix),
       |fam AS (
       |  SELECT source,
       |    CASE WHEN md >= 2 THEN 'inst_md'
       |         WHEN tag >= 2 THEN 'inst_tag'
       |         WHEN qa >= 2 THEN 'qa'
       |         WHEN chat >= 1 THEN 'chat'
       |         ELSE 'none' END AS family,
       |    qa + chat + md + tag AS hits
       |  FROM sig)
       |SELECT source, family, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(hits) AS BIGINT) AS n_marker_hits
       |FROM fam GROUP BY source, family""".stripMargin

  // ------------------------------------------------------------------
  // Publication-date extraction (text_date_extract): content dates
  // for freshness weighting when no crawl timestamp exists.
  // ------------------------------------------------------------------

  /** Deterministic date-planted corpus, doc_id % 5 variants: ISO
    * prefix / "Month DD, YYYY" / "DD Month YYYY" suffix / two ISO
    * dates (first wins) / none. Values derive from doc_id so every
    * field is closed-form. */
  private[graft] def syntheticDateMix(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    val yy = (lit(2015) + d % 10).cast("string")
    val mmN = (d % 12 + 1).cast("int")
    val mm = lpad(mmN.cast("string"), 2, "0")
    val dd2 = lpad((d % 28 + 1).cast("string"), 2, "0")
    val dd1 = (d % 28 + 1).cast("string")
    val monthName = element_at(array(
      lit("January"), lit("February"), lit("March"), lit("April"),
      lit("May"), lit("June"), lit("July"), lit("August"),
      lit("September"), lit("October"), lit("November"), lit("December")),
      mmN)
    docs.select(col("doc_id"), col("source"),
      when(d % 5 === 0,
        concat(lit("Published "), yy, lit("-"), mm, lit("-"), dd2,
          lit(". "), col("text")))
      .when(d % 5 === 1,
        concat(lit("Updated on "), monthName, lit(" "), dd1, lit(", "),
          yy, lit(": "), col("text")))
      .when(d % 5 === 2,
        concat(col("text"), lit(" ("), dd1, lit(" "), monthName,
          lit(" "), yy, lit(")")))
      .when(d % 5 === 3,
        concat(yy, lit("-"), mm, lit("-"), dd2, lit(" edited 2026-01-01 "),
          col("text")))
      .otherwise(col("text")).as("text"))
  }

  /** First publication date per document under a FIRST-MATCH kind
    * ladder (iso > "Month DD, YYYY" > "DD Month YYYY" > none), fields
    * as exact ints; regexes live in the Java∩RE2 common subset and
    * regexp_extract's empty-string-on-no-match convention is shared
    * by both engines. Scan-local projection, zero shuffle. */
  def dateExtract(docs: DataFrame): DataFrame = {
    val t = col("text")
    val months = Seq("January", "February", "March", "April", "May",
      "June", "July", "August", "September", "October", "November",
      "December")
    val monthAlt = months.mkString("|")
    def monthNum(c: Column): Column =
      months.zipWithIndex.foldLeft(lit(0)) { case (acc, (m, i)) =>
        when(c === m, lit(i + 1)).otherwise(acc)
      }
    val isoP = "(\\d{4})-(\\d{2})-(\\d{2})"
    val mdyP = s"($monthAlt) (\\d{1,2}), (\\d{4})"
    val dmyP = s"(\\d{1,2}) ($monthAlt) (\\d{4})"
    val iso1 = regexp_extract(t, isoP, 1)
    val mdy1 = regexp_extract(t, mdyP, 1)
    val dmy1 = regexp_extract(t, dmyP, 1)
    val kind = when(iso1 =!= "", "iso")
      .when(mdy1 =!= "", "mdy")
      .when(dmy1 =!= "", "dmy")
      .otherwise("none")
    val year = when(iso1 =!= "", iso1.cast("long"))
      .when(mdy1 =!= "", regexp_extract(t, mdyP, 3).cast("long"))
      .when(dmy1 =!= "", regexp_extract(t, dmyP, 3).cast("long"))
      .otherwise(lit(0L))
    val month = when(iso1 =!= "", regexp_extract(t, isoP, 2).cast("long"))
      .when(mdy1 =!= "", monthNum(mdy1).cast("long"))
      .when(dmy1 =!= "", monthNum(regexp_extract(t, dmyP, 2)).cast("long"))
      .otherwise(lit(0L))
    val day = when(iso1 =!= "", regexp_extract(t, isoP, 3).cast("long"))
      .when(mdy1 =!= "", regexp_extract(t, mdyP, 2).cast("long"))
      .when(dmy1 =!= "", regexp_extract(t, dmyP, 1).cast("long"))
      .otherwise(lit(0L))
    docs.select(col("doc_id"), kind.as("date_kind"), year.as("year"),
      month.as("month"), day.as("day"))
  }

  /** DuckDB oracle for dateExtract(syntheticDateMix(documents)) —
    * fields restated from the GENERATOR arithmetic per variant, never
    * re-parsed (the closed-form pattern): variant 3's first-match ISO
    * must beat the planted second date. */
  def dateExtractOracleSql(): String =
    s"""SELECT doc_id,
       |  CASE doc_id % 5 WHEN 0 THEN 'iso' WHEN 1 THEN 'mdy'
       |    WHEN 2 THEN 'dmy' WHEN 3 THEN 'iso' ELSE 'none' END AS date_kind,
       |  CAST(CASE WHEN doc_id % 5 IN (0, 1, 2, 3)
       |    THEN 2015 + doc_id % 10 ELSE 0 END AS BIGINT) AS year,
       |  CAST(CASE WHEN doc_id % 5 IN (0, 1, 2, 3)
       |    THEN doc_id % 12 + 1 ELSE 0 END AS BIGINT) AS month,
       |  CAST(CASE WHEN doc_id % 5 IN (0, 1, 2, 3)
       |    THEN doc_id % 28 + 1 ELSE 0 END AS BIGINT) AS day
       |FROM documents""".stripMargin

  // ------------------------------------------------------------------
  // License-notice routing (corpus_license_detect): training-data
  // compliance — route docs carrying license/copyright notices to
  // the policy tier before mixing.
  // ------------------------------------------------------------------

  /** Deterministic license-planted corpus: doc_id % 6 selects the
    * appended notice (copyright line / Apache / CC-BY / MIT grant /
    * SPDX tag / none). Replicated closed-form by the oracle. */
  private[graft] def syntheticLicenseMix(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      concat(col("text"),
        when(col("doc_id") % 6 === 0,
          lit("\nCopyright (c) 2024 Example Corp. All rights reserved."))
        .when(col("doc_id") % 6 === 1,
          lit("\nLicensed under the Apache License, Version 2.0"))
        .when(col("doc_id") % 6 === 2,
          lit("\nThis work is licensed under a Creative Commons Attribution 4.0 License."))
        .when(col("doc_id") % 6 === 3,
          lit("\nPermission is hereby granted, free of charge, to any person."))
        .when(col("doc_id") % 6 === 4,
          lit("\nSPDX-License-Identifier: MIT"))
        .otherwise(lit(""))).as("text"))

  /** License-family router + census: FIRST-MATCH priority ladder
    * (spdx > apache > cc > mit > proprietary-copyright > none) over
    * lowercased text — SPDX tags are machine-readable and win;
    * a bare copyright line without a grant routes to `proprietary`.
    * Census per (source, family): docs + copyright-bearing docs.
    * Scan-local signals, ONE partial-agg shuffle to ≤ |sources|·6
    * cells. */
  def licenseDetect(docs: DataFrame): DataFrame = {
    val t = lower(col("text"))
    val hasCopyright = t.contains("copyright (c)") ||
      t.contains("all rights reserved")
    val family = when(t.contains("spdx-license-identifier"), "spdx")
      .when(t.contains("apache license"), "apache")
      .when(t.contains("creative commons"), "cc")
      .when(t.contains("permission is hereby granted"), "mit")
      .when(hasCopyright, "proprietary")
      .otherwise("none")
    docs.select(col("source"), family.as("license_family"),
        when(hasCopyright, 1L).otherwise(0L).as("cp"))
      .groupBy(col("source"), col("license_family"))
      .agg(count(lit(1)).as("n_docs"), sum(col("cp")).as("n_copyright"))
  }

  /** DuckDB oracle for licenseDetect(syntheticLicenseMix(documents)):
    * the planted variants AND the detection ladder both restated —
    * organic text is checked by the same contains() ladder, so a
    * false positive in either engine breaks the match. */
  def licenseDetectOracleSql(): String =
    s"""WITH mix AS (
       |  SELECT doc_id, source, text ||
       |    CASE doc_id % 6
       |      WHEN 0 THEN chr(10) || 'Copyright (c) 2024 Example Corp. All rights reserved.'
       |      WHEN 1 THEN chr(10) || 'Licensed under the Apache License, Version 2.0'
       |      WHEN 2 THEN chr(10) || 'This work is licensed under a Creative Commons Attribution 4.0 License.'
       |      WHEN 3 THEN chr(10) || 'Permission is hereby granted, free of charge, to any person.'
       |      WHEN 4 THEN chr(10) || 'SPDX-License-Identifier: MIT'
       |      ELSE '' END AS text
       |  FROM documents),
       |sig AS (
       |  SELECT source,
       |    CASE WHEN contains(lower(text), 'spdx-license-identifier') THEN 'spdx'
       |         WHEN contains(lower(text), 'apache license') THEN 'apache'
       |         WHEN contains(lower(text), 'creative commons') THEN 'cc'
       |         WHEN contains(lower(text), 'permission is hereby granted') THEN 'mit'
       |         WHEN contains(lower(text), 'copyright (c)')
       |           OR contains(lower(text), 'all rights reserved') THEN 'proprietary'
       |         ELSE 'none' END AS license_family,
       |    CASE WHEN contains(lower(text), 'copyright (c)')
       |           OR contains(lower(text), 'all rights reserved')
       |         THEN 1 ELSE 0 END AS cp
       |  FROM mix)
       |SELECT source, license_family, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(cp) AS BIGINT) AS n_copyright
       |FROM sig GROUP BY source, license_family""".stripMargin

  // ------------------------------------------------------------------
  // Code-vs-prose routing (text_code_detect): training pipelines route
  // code to a separate mixture bucket (different dedup/quality rules,
  // different tokenizer behavior); this is the deterministic routing
  // classifier — integer line/keyword/indent/symbol signals, no model.
  // ------------------------------------------------------------------

  /** Deterministic code-planted variant corpus: `doc_id % 7 == 0` docs
    * become pure pseudo-code (3-6 def/return blocks — variable length,
    * so the census isn't a constant), `% 7 == 1` docs get a code block
    * APPENDED to their prose (the mixed arm), the rest pass through
    * untouched. Pure column expressions (sequence/transform/
    * array_join), replicated in closed form by the oracle. */
  private[graft] def syntheticCodeMix(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      when(col("doc_id") % 7 === 0,
        array_join(transform(
          sequence(lit(0), (col("doc_id") % 4 + 2).cast("int")),
          k => concat(lit("def f"), k, lit("(x):\n    return x + "), k,
            lit(";"))), "\n"))
        .when(col("doc_id") % 7 === 1,
          concat(col("text"), lit("\nif (x) { y(); }\nlet z = 3;")))
        .otherwise(col("text")).as("text"))

  /** Per-doc code-detection signals + routing decision, all exact
    * integers from codegen column expressions (no UDF, no model):
    * line count, `\b`-bounded keyword hits, indent runs (newline +
    * 4 spaces, counted by length delta — leftmost non-overlapping in
    * both engines), code-symbol chars `[{};=()]`; score = 3·kw +
    * 2·indent + sym, routed to code when score ≥ 3·n_lines (prose
    * scores 0, pure code ≥ 5.5·lines, an appended block clears the
    * bar on its own symbols). Zero shuffle — scan-local projection. */
  def codeDetect(docs: DataFrame): DataFrame = {
    val text = col("text")
    val nLines = (length(text) -
      length(regexp_replace(text, "\n", "")) + 1).cast("long")
    val kw = regexp_count(text,
      lit("\\b(def|return|import|const|var|function|class|let)\\b"))
      .cast("long")
    val ind = ((length(text) -
      length(regexp_replace(text, "\n    ", ""))) / 5).cast("long")
    val sym = (length(text) -
      length(regexp_replace(text, "[{};=()]", ""))).cast("long")
    docs.select(col("doc_id"), col("source"),
        nLines.as("n_lines"), kw.as("kw"), ind.as("ind"), sym.as("sym"))
      .withColumn("score", col("kw") * 3 + col("ind") * 2 + col("sym"))
      .withColumn("is_code",
        (col("score") >= col("n_lines") * 3).cast("long"))
  }

  /** DuckDB oracle for [[codeDetect]] over [[syntheticCodeMix]]: the
    * planted arms restated in closed form (list_transform build /
    * literal append), the signals as the same string-length deltas and
    * RE2 regexes (patterns chosen inside the Java∩RE2 common subset),
    * the same integer routing rule. */
  def codeDetectOracleSql(): String =
    s"""WITH mix AS (
       |  SELECT doc_id, source,
       |    CASE WHEN doc_id % 7 = 0 THEN
       |      array_to_string(list_transform(
       |        generate_series(0, CAST(doc_id % 4 + 2 AS INT)),
       |        k -> 'def f' || k || '(x):' || chr(10) || '    return x + ' || k || ';'),
       |        chr(10))
       |    WHEN doc_id % 7 = 1 THEN
       |      text || chr(10) || 'if (x) { y(); }' || chr(10) || 'let z = 3;'
       |    ELSE text END AS text
       |  FROM documents),
       |sig AS (
       |  SELECT doc_id, source,
       |    CAST(length(text) - length(replace(text, chr(10), '')) + 1 AS BIGINT) AS n_lines,
       |    CAST(len(regexp_extract_all(text,
       |      '\\b(def|return|import|const|var|function|class|let)\\b')) AS BIGINT) AS kw,
       |    CAST((length(text) - length(replace(text, chr(10) || '    ', ''))) // 5 AS BIGINT) AS ind,
       |    CAST(length(text) - length(regexp_replace(text, '[{};=()]', '', 'g')) AS BIGINT) AS sym
       |  FROM mix)
       |SELECT doc_id, source, n_lines, kw, ind, sym,
       |  CAST(kw * 3 + ind * 2 + sym AS BIGINT) AS score,
       |  CAST(CASE WHEN kw * 3 + ind * 2 + sym >= n_lines * 3
       |       THEN 1 ELSE 0 END AS BIGINT) AS is_code
       |FROM sig""".stripMargin
}
