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

  /** GROUPED HLL — one sketch per host, the form a crawl dashboard
    * actually needs ("distinct urls per site"), and the demonstration
    * that the registers are MERGEABLE GROUP STATE: the per-(host,
    * register) max is the partial aggregate, so each map task ships at
    * most m rows per host it saw, and hosts estimate independently
    * with the same bit-exact register-ordered fold as the global
    * sketch. exact_distinct per host rides along as the audit arm.
    * Output: (host, m, n_zero_registers, estimate, exact_distinct). */
  def hostCardinality(urls: DataFrame, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p out of range: $p")
    val m = 1 << p
    val spark = urls.sparkSession
    import spark.implicits._
    val withHost = urls.select(
      regexp_extract(col("url"), "^https?://([^/]+)", 1).as("host"),
      col("url").cast("string").as("url"))
      .localCheckpoint(false) // feeds sketch + audit arms once
    val hashed = withHost.as[(String, String)]
      .mapPartitions(_.map { case (h, u) =>
        val (reg, rank) = regRank(u, p); (h, reg, rank)
      })
      .toDF("host", "reg", "rank")
    val folded = hashed
      .groupBy(col("host"), col("reg")).agg(max(col("rank")).as("mx"))
      .select(col("host"), col("reg"), expr(
        "CAST(1.0 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), mx) AS DOUBLE)")
        .as("w"))
      .groupBy(col("host"))
      .agg(sort_array(collect_list(struct(col("reg"), col("w"))))
        .as("parts"))
      .select(col("host"), size(col("parts")).as("nregs"),
        aggregate(col("parts"), lit(0.0), (acc, x) =>
          acc + x.getField("w")).as("s0"))
      .select(col("host"), col("nregs"),
        (col("s0") + (lit(m) - col("nregs")).cast("double")).as("s2"))
    val alphaNum = (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))) *
      lit((m.toLong * m).toDouble)
    val exact = withHost.groupBy(col("host"))
      .agg(countDistinct(col("url")).as("exact_distinct"))
    folded
      .select(col("host"), lit(m.toLong).as("m"),
        (lit(m) - col("nregs")).cast("long").as("n_zero_registers"),
        (alphaNum / col("s2")).as("estimate"))
      .join(exact, Seq("host"))
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

  /** Oracle for [[hostCardinality]] over `urlsSql` — the global replay
    * with `host` threaded through every stage. */
  def hostOracleSql(urlsSql: String, p: Int = 8): String = {
    val m = 1 << p
    val sm = { (z: String, sh: Int, mul: String) =>
      SimhashOracle.mulmod(SimhashOracle.xor64(z, s"$z // ${1L << sh}"), mul) }
    s"""WITH u AS (SELECT
       |  regexp_extract(url, '^https?://([^/]+)', 1) AS host,
       |  CAST(url AS VARCHAR) AS url FROM (%URLS%)),
       |h0 AS (SELECT host, url, (${fnv("url")} + $SM1) % $M AS z FROM u),
       |h1 AS (SELECT host, ${sm("z", 30, SM2)} AS z FROM h0),
       |h2 AS (SELECT host, ${sm("z", 27, SM3)} AS z FROM h1),
       |h3 AS (SELECT host, ${SimhashOracle.xor64("z", s"z // ${1L << 31}")} AS h FROM h2),
       |rr AS (SELECT host, CAST(h // ${BigInt(1) << (64 - p)} AS INT) AS reg,
       |              (h * ${BigInt(1) << p}) % $M AS rest FROM h3),
       |rk AS (SELECT host, reg, ${rankCase(p)} AS rank FROM rr),
       |regs AS (SELECT host, reg, max(rank) AS mx FROM rk GROUP BY host, reg),
       |fold AS (SELECT host, count(*) AS nregs,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list(CAST(1.0 AS DOUBLE) / CAST(1::BIGINT << mx AS DOUBLE)
       |         ORDER BY reg)),
       |    (a, x) -> a + x) AS s0
       | FROM regs GROUP BY host),
       |s AS (SELECT host, nregs,
       |  s0 + CAST($m - nregs AS DOUBLE) AS s2 FROM fold),
       |ex AS (SELECT host, CAST(count(DISTINCT url) AS BIGINT) AS exact_distinct
       |       FROM u GROUP BY host)
       |SELECT s.host, CAST($m AS BIGINT) AS m,
       |  CAST($m - s.nregs AS BIGINT) AS n_zero_registers,
       |  ((CAST(0.7213 AS DOUBLE)
       |    / (CAST(1.0 AS DOUBLE)
       |       + CAST(1.079 AS DOUBLE) / CAST(${m.toDouble} AS DOUBLE)))
       |   * CAST(${(m.toLong * m).toDouble} AS DOUBLE))
       |    / s.s2 AS estimate,
       |  ex.exact_distinct
       |FROM s JOIN ex ON s.host = ex.host""".stripMargin
      .replace("%URLS%", urlsSql)
  }

  /** Oracle for [[graft.ops.WebGraph.hyperBall]] over `edgesSql` (a
    * query yielding src/dst columns): the same per-node hash replay as
    * [[oracleSql]], then `rounds` MATERIALIZED register-merge stages
    * (each stage references the previous twice — default CTE inlining
    * would double per round), the same register-ordered fold per node,
    * and the exact-ball audit as a staged pair closure. `edgesSql` is
    * interpolated OUTSIDE any stripMargin (it is already stripped; a
    * second pass would eat `||` concats at line starts). */
  def hyperBallOracleSql(edgesSql: String, p: Int = 4, rounds: Int = 3): String = {
    val m = 1 << p
    val sm = { (z: String, sh: Int, mul: String) =>
      SimhashOracle.mulmod(SimhashOracle.xor64(z, s"$z // ${1L << sh}"), mul) }
    val sb = new StringBuilder
    sb.append(s"WITH e0 AS MATERIALIZED ($edgesSql),\n")
    sb.append(
      s"""e AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
         |n0 AS MATERIALIZED (SELECT DISTINCT v FROM
         |  (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |h0 AS (SELECT v, (${fnv("v")} + $SM1) % $M AS z FROM n0),
         |h1 AS (SELECT v, ${sm("z", 30, SM2)} AS z FROM h0),
         |h2 AS (SELECT v, ${sm("z", 27, SM3)} AS z FROM h1),
         |h3 AS (SELECT v, ${SimhashOracle.xor64("z", s"z // ${1L << 31}")} AS h FROM h2),
         |rr AS (SELECT v, CAST(h // ${BigInt(1) << (64 - p)} AS INT) AS reg,
         |              (h * ${BigInt(1) << p}) % $M AS rest FROM h3),
         |s0 AS MATERIALIZED (SELECT v, reg, ${rankCase(p)} AS mx FROM rr),
         |p0 AS MATERIALIZED (SELECT v, v AS u FROM n0)""".stripMargin)
    for (i <- 1 to rounds) {
      sb.append(s""",
         |s$i AS MATERIALIZED (SELECT v, reg, max(mx) AS mx FROM (
         |  SELECT v, reg, mx FROM s${i - 1}
         |  UNION ALL
         |  SELECT e.src AS v, s.reg, s.mx FROM e JOIN s${i - 1} s ON s.v = e.dst)
         |  GROUP BY v, reg),
         |p$i AS MATERIALIZED (SELECT DISTINCT v, u FROM (
         |  SELECT v, u FROM p${i - 1}
         |  UNION ALL
         |  SELECT e.src AS v, q.u FROM e JOIN p${i - 1} q ON q.v = e.dst))""".stripMargin)
    }
    sb.append(s"""
       |, fold AS (SELECT v, count(*) AS nregs,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list(CAST(1.0 AS DOUBLE) / CAST(1::BIGINT << mx AS DOUBLE)
       |         ORDER BY reg)),
       |    (a, x) -> a + x) AS s0f
       | FROM s$rounds GROUP BY v),
       |s AS (SELECT v, nregs,
       |  s0f + CAST($m - nregs AS DOUBLE) AS s2 FROM fold),
       |ex AS (SELECT v, CAST(count(*) AS BIGINT) AS exact_ball
       |       FROM p$rounds GROUP BY v)
       |SELECT s.v, CAST($m AS BIGINT) AS m,
       |  CAST($m - s.nregs AS BIGINT) AS n_zero_registers,
       |  ((CAST(0.7213 AS DOUBLE)
       |    / (CAST(1.0 AS DOUBLE)
       |       + CAST(1.079 AS DOUBLE) / CAST(${m.toDouble} AS DOUBLE)))
       |   * CAST(${(m.toLong * m).toDouble} AS DOUBLE))
       |    / s.s2 AS estimate,
       |  ex.exact_ball
       |FROM s JOIN ex ON s.v = ex.v""".stripMargin)
    sb.toString
  }
}

/** Count-Min frequency sketch — the heavy-hitter complement to
  * [[Cardinality]]: term frequencies estimated from a fixed d×w
  * counter grid instead of the full term dictionary. Every counter is
  * an exact integer sum, so the DuckDB oracle replays the whole
  * pipeline bit for bit (no IEEE subtleties at all here).
  *
  * Hash family: col_j(term) = top-log2(w) bits of
  * splitmix64(FNV-1a(term) + j·GOLD) — the same j·GOLD row-seed
  * derivation the minhash permutations use, already cross-verified in
  * HUGEINT ([[MinhashOracle]]).
  *
  * The driver row reports the exact top-k terms (count DESC, term ASC
  * — deterministic) with their CMS estimates: estimate ≥ exact always
  * (counters only ever over-count collisions), and the gap IS the
  * audit. Scale shape: the sketch build partial-aggregates below one
  * Exchange that moves AT MOST d·w rows per map task regardless of
  * corpus size (the sketch is mergeable state, exactly what a
  * 1000-executor fleet combines); the exact top-k audit arm is the
  * only answer-sized aggregate and plans its top-k as
  * WindowGroupLimit. */
object CountMin {

  private val GOLD = 0xc2b2ae3d27d4eb4fL

  /** (row j, column) cells of one term, p = log2(width). */
  private[ops] def cells(term: String, d: Int, p: Int): Seq[(Int, Int)] = {
    val h = Dedup.hash64(term, 0, term.length)
    (0 until d).map(j => (j, (Dedup.mix64(h + j * GOLD) >>> (64 - p)).toInt))
  }

  /** Exact top-k terms with their Count-Min estimates:
    * (term, exact_count, cms_estimate, overcount). d rows of 2^p
    * counters. */
  def topKWithEstimates(docs: DataFrame, d: Int = 4, p: Int = 8,
                        k: Int = 10): DataFrame = {
    require(d >= 1 && d <= 8 && p >= 4 && p <= 16, s"bad d=$d p=$p")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(
      explode(TextAnalysis.tokens(col("text"))).as("term"))
    val sketch = toks.as[String]
      .mapPartitions(_.flatMap(t => cells(t, d, p).iterator))
      .toDF("row", "col")
      .groupBy(col("row"), col("col"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false) // sketch state: at most d*2^p rows
    val exact = toks.groupBy(col("term"))
      .agg(count(lit(1)).as("exact_count"))
    // global top-k via orderBy+limit → TakeOrderedAndProject (each map
    // task keeps k rows) — NOT a partitionless window, which would drag
    // the whole term dictionary into one reducer at corpus scale
    val top = exact.orderBy(col("exact_count").desc, col("term").asc)
      .limit(k)
      .localCheckpoint(false) // k rows
    val topCells = top.select(col("term")).as[String]
      .mapPartitions(_.flatMap(t =>
        cells(t, d, p).iterator.map { case (j, c) => (t, j, c) }))
      .toDF("term", "row", "col")
    val est = topCells
      .join(sketch, Seq("row", "col"))
      .groupBy(col("term"))
      .agg(min(col("cnt")).as("cms_estimate"))
    top.join(est, Seq("term"))
      .select(col("term"), col("exact_count"), col("cms_estimate"),
        (col("cms_estimate") - col("exact_count")).as("overcount"))
  }

  /** DuckDB oracle for [[topKWithEstimates]] — full integer replay of
    * the FNV + splitmix + top-bits column derivation in HUGEINT,
    * sketch build, exact top-k, and min-over-rows estimate. */
  def oracleSql(d: Int = 4, p: Int = 8, k: Int = 10): String = {
    val M = "18446744073709551616"
    val SM1 = java.lang.Long.toUnsignedString(0x9e3779b97f4a7c15L)
    val SM2 = java.lang.Long.toUnsignedString(0xbf58476d1ce4e5b9L)
    val SM3 = java.lang.Long.toUnsignedString(0x94d049bb133111ebL)
    val FNV_OFF = java.lang.Long.toUnsignedString(0xcbf29ce484222325L)
    val jRows = (0 until d).map { j =>
      s"($j, CAST('${(BigInt(j) * BigInt(java.lang.Long.toUnsignedString(GOLD))) % (BigInt(1) << 64)}' AS HUGEINT))"
    }.mkString(", ")
    def mm(a: String, b: String) = SimhashOracle.mulmod(a, b)
    def xr(a: String, b: String) = SimhashOracle.xor64(a, b)
    s"""WITH t AS (SELECT doc_id,
       |   list_filter(string_split_regex(lower(text), '[\\s\\x0b]+'),
       |               x -> len(x) > 0) AS toks
       |  FROM documents),
       |tok AS (SELECT unnest(toks) AS term FROM t),
       |th AS (SELECT term,
       |  list_reduce(list_prepend(CAST($FNV_OFF AS HUGEINT),
       |    list_transform(split(term, ''), x -> CAST(unicode(x) AS HUGEINT))),
       |    (h, c) -> ${mm(xr("h", "c"), "1099511628211")}) AS h
       | FROM tok),
       |js(j, jadd) AS (VALUES $jRows),
       |m0 AS (SELECT term, j, (h + jadd + $SM1) % $M AS z FROM th, js),
       |m1 AS (SELECT term, j, ${mm(xr("z", s"z // ${1L << 30}"), SM2)} AS z FROM m0),
       |m2 AS (SELECT term, j, ${mm(xr("z", s"z // ${1L << 27}"), SM3)} AS z FROM m1),
       |m3 AS (SELECT term, j AS row,
       |  CAST(${xr("z", s"z // ${1L << 31}")} // ${BigInt(1) << (64 - p)} AS INT) AS col
       | FROM m2),
       |sketch AS (SELECT row, col, CAST(count(*) AS BIGINT) AS cnt
       |           FROM m3 GROUP BY row, col),
       |exact AS (SELECT term, CAST(count(*) AS BIGINT) AS exact_count
       |          FROM tok GROUP BY term),
       |top AS (SELECT term, exact_count FROM (
       |   SELECT term, exact_count,
       |     row_number() OVER (ORDER BY exact_count DESC, term ASC) AS rk
       |   FROM exact) WHERE rk <= $k),
       |est AS (SELECT m3.term, min(sketch.cnt) AS cms_estimate
       |  FROM (SELECT DISTINCT term, row, col FROM m3) m3
       |  JOIN top ON m3.term = top.term
       |  JOIN sketch ON m3.row = sketch.row AND m3.col = sketch.col
       |  GROUP BY m3.term)
       |SELECT top.term, top.exact_count, est.cms_estimate,
       |  est.cms_estimate - top.exact_count AS overcount
       |FROM top JOIN est ON top.term = est.term""".stripMargin
  }
}
