package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data selection via hashed n-gram importance weighting — the
  * DSIR-shaped pipeline (Xie et al. 2023, "Data Selection for Language
  * Models via Importance Resampling"): score every raw-crawl document
  * by how much its hashed-unigram profile looks like a curated target
  * corpus, then keep the top-weighted slice.
  *
  * Determinism note (the repo-wide no-transcendentals rule): true DSIR
  * weights are exp(Σ c_f·(log t̂_f − log r̂_f)) — a transcendental per
  * feature, whose float fold order neither engine pins. This op uses
  * the LINEARIZED weight
  *
  *   w(d) = (Σ_f c_f·(t_f+1)) · (R+B)  /  (Σ_f c_f·(r_f+1)) · (T+B)
  *
  * — the ratio of the document's average add-one-smoothed target
  * frequency to its average raw frequency. Both operands are EXACT
  * longs (integer counts only), so the weight is ONE IEEE division —
  * bit-identical in Spark and DuckDB (the text_collocations /
  * corpus_lm_coverage precedent). It rank-agrees with the log-ratio
  * weight on the dominant direction (documents whose mass sits in
  * target-heavy buckets score high) while staying hash-checkable.
  *
  * Scale shape (10^12 docs): one flatMap kernel emits per-doc nonzero
  * bucket counts (≤ B rows/doc, map-side pre-aggregated by
  * construction); bucket totals are two B-row aggregates (map-side
  * combine collapses everything before the exchange); the totals join
  * back BROADCAST (B=256 rows); the final per-doc sum is one hash
  * aggregate; selection is TakeOrderedAndProject (per-map-task k-row
  * heaps, no global sort). The two corpus totals are 1-row driver
  * scalars (the corpus_crawl_budget pattern). Overflow contract: each
  * product must stay < 2^53 for the division to be exact — at
  * trillion-token scale count in kilotoken units first (same caveat
  * as crawlBudget/pmiCollocations).
  */
object Importance {

  // Java regex \s (the tokens() splitter): space \t \n \x0B \f \r.
  private val WsChars = " \t\n\f\r"
  @inline private def isWs(c: Char): Boolean = WsChars.indexOf(c) >= 0

  /** Per-doc nonzero hashed-unigram bucket counts:
    * (doc_id, source, bucket, c). `buckets` must be a power of two
    * (bucket = low bits of the FNV-1a token hash, sign-free on both
    * engines). */
  private[ops] def bucketCounts(docs: DataFrame, buckets: Int): DataFrame = {
    require((buckets & (buckets - 1)) == 0, "buckets must be a power of two")
    val spark = docs.sparkSession
    import spark.implicits._
    val mask = (buckets - 1).toLong
    docs.select(col("doc_id").cast("long"), col("source").cast("string"),
        lower(coalesce(col("text"), lit(""))))
      .as[(Long, String, String)]
      .mapPartitions(_.flatMap { case (id, src, text) =>
        val cnt = new Array[Long](buckets)
        var i = 0
        val n = text.length
        while (i < n) {
          while (i < n && isWs(text.charAt(i))) i += 1
          val st = i
          while (i < n && !isWs(text.charAt(i))) i += 1
          if (i > st) cnt((Dedup.hash64(text, st, i) & mask).toInt) += 1L
        }
        (0 until buckets).iterator.filter(cnt(_) > 0L)
          .map(b => (id, src, b.toLong, cnt(b)))
      })
      .toDF("doc_id", "source", "bucket", "c")
  }

  /** Importance-weighted selection: top `k` documents by linearized
    * DSIR weight against the target slice `targetSources`. Output:
    * (doc_id, source, num, den, weight) with num/den the exact-long
    * operands and weight their one IEEE division — ordered
    * (weight desc, doc_id asc) by TakeOrderedAndProject. */
  def targetAffinity(docs: DataFrame,
                     targetSources: Seq[String] = Seq("src0", "src1"),
                     buckets: Int = 256, k: Int = 30): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // dc feeds three consumers (raw totals, target totals, scoring):
    // materialize once — it is the expensive pass over the text.
    val dc = bucketCounts(docs, buckets).localCheckpoint(false)
    val rf = dc.groupBy("bucket").agg(sum("c").as("r"))
    val tf = dc.filter(col("source").isin(targetSources: _*))
      .groupBy("bucket").agg(sum("c").as("t"))
    // 1-row driver scalars (bounded: B-row inputs).
    val rTot = rf.agg(coalesce(sum("r"), lit(0L))).as[Long].collect()(0)
    val tTot = tf.agg(coalesce(sum("t"), lit(0L))).as[Long].collect()(0)
    dc.join(broadcast(rf), "bucket")
      .join(broadcast(tf), Seq("bucket"), "left")
      .na.fill(0L, Seq("t"))
      .groupBy("doc_id", "source")
      .agg(sum(col("c") * (col("t") + 1L)).as("tn"),
           sum(col("c") * (col("r") + 1L)).as("rn"))
      .select(col("doc_id"), col("source"),
        (col("tn") * lit(rTot + buckets)).as("num"),
        (col("rn") * lit(tTot + buckets)).as("den"))
      .withColumn("weight",
        col("num").cast("double") / col("den").cast("double"))
      .orderBy(col("weight").desc, col("doc_id").asc)
      .limit(k)
  }

  // ------------------------------------------------------------------
  // DuckDB oracle: full integer replay of the pipeline — FNV-1a token
  // hashing in HUGEINT mod-2^64 (the MinhashOracle arithmetic style),
  // identical smoothing/totals algebra, same one IEEE division.
  // ------------------------------------------------------------------

  private val FNV_OFF = java.lang.Long.toUnsignedString(0xcbf29ce484222325L)
  private val FNV_P = "1099511628211"

  private def fnvTok(t: String): String = {
    val step = SimhashOracle.mulmod(SimhashOracle.xor64("h", "c"), FNV_P)
    s"list_reduce(list_prepend(CAST($FNV_OFF AS HUGEINT), " +
      s"list_transform(split($t, ''), x -> CAST(unicode(x) AS HUGEINT))), " +
      s"(h, c) -> $step)"
  }

  def targetAffinityOracleSql(targetSources: Seq[String] = Seq("src0", "src1"),
                              buckets: Int = 256, k: Int = 30): String = {
    val tgt = targetSources.map(s => s"'$s'").mkString(", ")
    s"""WITH tok AS (
       |  SELECT doc_id, source,
       |    unnest(list_filter(string_split_regex(lower(text), '[\\s\\x0b]+'),
       |                       x -> len(x) > 0)) AS tk
       |  FROM documents),
       |hb AS (
       |  SELECT doc_id, source,
       |    CAST(${fnvTok("tk")} % $buckets AS BIGINT) AS bucket
       |  FROM tok),
       |dc AS (
       |  SELECT doc_id, source, bucket, CAST(count(*) AS BIGINT) AS c
       |  FROM hb GROUP BY doc_id, source, bucket),
       |rf AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS r FROM dc GROUP BY bucket),
       |tf AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS t
       |       FROM dc WHERE source IN ($tgt) GROUP BY bucket),
       |tot AS (SELECT (SELECT coalesce(sum(r), 0) FROM rf) AS rtot,
       |               (SELECT coalesce(sum(t), 0) FROM tf) AS ttot),
       |sc AS (
       |  SELECT d.doc_id, d.source,
       |    CAST(sum(d.c * (coalesce(t.t, 0) + 1)) AS BIGINT) AS tn,
       |    CAST(sum(d.c * (r.r + 1)) AS BIGINT) AS rn
       |  FROM dc d JOIN rf r USING (bucket) LEFT JOIN tf t USING (bucket)
       |  GROUP BY d.doc_id, d.source)
       |SELECT doc_id, source,
       |  CAST(tn * (rtot + $buckets) AS BIGINT) AS num,
       |  CAST(rn * (ttot + $buckets) AS BIGINT) AS den,
       |  CAST(tn * (rtot + $buckets) AS DOUBLE) /
       |    CAST(rn * (ttot + $buckets) AS DOUBLE) AS weight
       |FROM sc, tot
       |ORDER BY weight DESC, doc_id ASC LIMIT $k""".stripMargin
  }
}
