package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperLogLog cardinality estimation — the 100 TB answer to "how many
  * distinct urls does this crawl hold": m=2^p fixed-size registers
  * instead of a distinct shuffle whose state grows with the answer.
  *
  * Built bit-exact on BOTH engines from primitives this repo already
  * cross-verifies: hash = splitmix64-finalizer(FNV-1a-64(url))
  * ([[Dedup.hash64]]/[[Dedup.mix64]]; the DuckDB side replays them in
  * HUGEINT mod-2^64 like [[MinhashOracle]]). Top p bits pick the
  * register; the rank is the leading-zero count (+1) of the remaining
  * 64−p bits (57 when they are all zero). The estimate is the RAW HLL
  * formula alpha_m·m²/Σ2^(−M_j): every term is an exact dyadic
  * (1/(1<<M_j)), the fold runs in REGISTER ORDER on both engines, and
  * alpha is the same decimal-literal expression — so the double is
  * bit-identical. Small-range/large-range bias corrections are a
  * DOWNSTREAM POLICY (linear counting needs ln, a transcendental the
  * hash-compare oracle can't share) — the row carries
  * n_zero_registers and the exact count so any correction is
  * computable by the caller.
  *
  * Scale shape: one per-row hash projection, ONE aggregation keyed on
  * the 2^p-value register id (partial max below the Exchange — the
  * shuffle moves AT MOST m rows per map task no matter the input
  * size), then a single bounded m-row fold. Duplicates never inflate
  * state (max is idempotent) — feed the RAW fetch log, no distinct
  * upstream. The exact_distinct column is the audit arm: at corpus
  * scale it is the expensive path (its shuffle grows with the
  * answer), kept here because the test SFs can afford ground truth.
  */
object Cardinality {

  /** (register, rank) for one url at precision p. */
  private[ops] def regRank(url: String, p: Int): (Int, Int) = {
    val h = Dedup.mix64(Dedup.hash64(url, 0, url.length))
    val reg = (h >>> (64 - p)).toInt
    val rest = h << p
    val rank = if (rest == 0L) (64 - p) + 1
               else java.lang.Long.numberOfLeadingZeros(rest) + 1
    (reg, rank)
  }

  /** One-row DataFrame: (m, n_zero_registers, estimate, exact_distinct).
    * `urls` = any (url) table, duplicates welcome. p in [4, 16]. */
  def urlCardinality(urls: DataFrame, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p out of range: $p")
    val m = 1 << p
    val spark = urls.sparkSession
    import spark.implicits._
    val hashed = urls.select(col("url").cast("string")).as[String]
      .mapPartitions(_.map(u => regRank(u, p)))
      .toDF("reg", "rank")
    val regs = hashed.groupBy(col("reg")).agg(max(col("rank")).as("mx"))
      // per-register dyadic weight 2^-mx, exact (shiftleft + one division)
      .select(col("reg"), expr(
        "CAST(1.0 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), mx) AS DOUBLE)")
        .as("w"))
    val folded = regs
      .agg(sort_array(collect_list(struct(col("reg"), col("w"))))
        .as("parts"))
      .select(size(col("parts")).as("nregs"),
        aggregate(col("parts"), lit(0.0), (acc, x) =>
          acc + x.getField("w")).as("s0"))
      .select(col("nregs"),
        (col("s0") + (lit(m) - col("nregs")).cast("double")).as("s2"))
    val alphaNum = (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))) *
      lit((m.toLong * m).toDouble)
    val exact = urls.agg(countDistinct(col("url")).as("exact_distinct"))
    folded
      .select(lit(m.toLong).as("m"),
        (lit(m) - col("nregs")).cast("long").as("n_zero_registers"),
        (alphaNum / col("s2")).as("estimate"))
      .crossJoin(broadcast(exact))
  }

  // ------------------------------------------------------------------
  // DuckDB oracle (HUGEINT mod-2^64 replay of the same pipeline)
  // ------------------------------------------------------------------

  private val M = "18446744073709551616"
  private val FNV_OFF = java.lang.Long.toUnsignedString(0xcbf29ce484222325L)
  private val SM1 = java.lang.Long.toUnsignedString(0x9e3779b97f4a7c15L)
  private val SM2 = java.lang.Long.toUnsignedString(0xbf58476d1ce4e5b9L)
  private val SM3 = java.lang.Long.toUnsignedString(0x94d049bb133111ebL)

  private def fnv(t: String): String =
    s"list_reduce(list_prepend(CAST($FNV_OFF AS HUGEINT), " +
      s"list_transform(split($t, ''), x -> CAST(unicode(x) AS HUGEINT))), " +
      s"(h, c) -> ${SimhashOracle.mulmod(SimhashOracle.xor64("h", "c"), "1099511628211")})"

  /** Leading-zero rank of the top-aligned (64-p)-bit remainder as a
    * flat unsigned-threshold CASE ladder (no log2 — transcendental). */
  private def rankCase(p: Int): String = {
    val w = 64 - p
    val branches = (1 to w).map { k =>
      s"WHEN rest >= ${BigInt(1) << (64 - k)} THEN $k"
    }.mkString(" ")
    s"CASE $branches ELSE ${w + 1} END"
  }

  /** Oracle for [[urlCardinality]] over `urlsSql` (a query yielding a
    * url column). Same hash, same register/rank split, same
    * register-ordered fold, same literal alpha expression. */
  def oracleSql(urlsSql: String, p: Int = 8): String = {
    val m = 1 << p
    val sm = { (z: String, sh: Int, mul: String) =>
      SimhashOracle.mulmod(SimhashOracle.xor64(z, s"$z // ${1L << sh}"), mul) }
    s"""WITH u AS (SELECT CAST(url AS VARCHAR) AS url FROM (%URLS%)),
       |h0 AS (SELECT (${fnv("url")} + $SM1) % $M AS z FROM u),
       |h1 AS (SELECT ${sm("z", 30, SM2)} AS z FROM h0),
       |h2 AS (SELECT ${sm("z", 27, SM3)} AS z FROM h1),
       |h3 AS (SELECT ${SimhashOracle.xor64("z", s"z // ${1L << 31}")} AS h FROM h2),
       |rr AS (SELECT CAST(h // ${BigInt(1) << (64 - p)} AS INT) AS reg,
       |              (h * ${BigInt(1) << p}) % $M AS rest FROM h3),
       |rk AS (SELECT reg, ${rankCase(p)} AS rank FROM rr),
       |regs AS (SELECT reg, max(rank) AS mx FROM rk GROUP BY reg),
       |fold AS (SELECT count(*) AS nregs,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list(CAST(1.0 AS DOUBLE) / CAST(1::BIGINT << mx AS DOUBLE)
       |         ORDER BY reg)),
       |    (a, x) -> a + x) AS s0
       | FROM regs),
       |s AS (SELECT nregs,
       |  s0 + CAST($m - nregs AS DOUBLE) AS s2 FROM fold),
       |ex AS (SELECT CAST(count(DISTINCT url) AS BIGINT) AS exact_distinct
       |       FROM u)
       |SELECT CAST($m AS BIGINT) AS m,
       |  CAST($m - s.nregs AS BIGINT) AS n_zero_registers,
       |  ((CAST(0.7213 AS DOUBLE)
       |    / (CAST(1.0 AS DOUBLE)
       |       + CAST(1.079 AS DOUBLE) / CAST(${m.toDouble} AS DOUBLE)))
       |   * CAST(${(m.toLong * m).toDouble} AS DOUBLE))
       |    / s.s2 AS estimate,
       |  ex.exact_distinct
       |FROM s, ex""".stripMargin
      .replace("%URLS%", urlsSql)
  }
}
