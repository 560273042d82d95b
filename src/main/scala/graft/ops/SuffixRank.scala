package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed suffix ranking by prefix doubling (Manber–Myers), the
  * backbone of exact-substring dedup over a training corpus (the
  * Lee et al. 2022 "Deduplicating Training Data" family): after round
  * k, two corpus positions share a rank iff the first 2^k characters
  * of their suffixes (truncated at the document end — suffixes never
  * cross documents) are string-equal.
  *
  * The at-scale argument is WHAT SHUFFLES: characters shuffle exactly
  * once (round 1 groups single chars); every later round moves only
  * (rank, rank-at-offset) INTEGER pairs — one equi-join on
  * (doc_id, pos+2^(k-1)) to fetch the partner rank and one
  * pair-partitioned window to re-rank, per round, log2(maxWindow)
  * rounds total. No window text is ever materialized or compared
  * again, which is the whole point versus sorting 64-char substrings
  * at 10^12-document scale. Each round ends in localCheckpoint so
  * lineage stays one round deep (the PageRank/kcore discipline).
  *
  * Rank values are EQUALITY keys, not dense ordinals: the rank of a
  * group is the packed (doc_id·2^20 + pos) of its minimum position —
  * computable with a partitioned min (no global dense_rank window,
  * which would single-reducer the corpus) and doubling as the group's
  * canonical WITNESS: unpacking the rank locates a real occurrence of
  * the window. Contract: per-document length < 2^20, doc_id < 2^43
  * (the packing); deterministic and partition-independent because
  * min is. */
object SuffixRank {

  private val PosBits = 20
  private val Pack = 1L << PosBits

  /** (packed, r) after `rounds` doublings: r is the equality key of
    * the 2^rounds-char truncated window at pos; packed = doc_id*2^20
    * + pos carries both coordinates in one long. Round 0 (single
    * chars) is the only round that touches strings.
    *
    * Round-6 plan shape (before: 3 Exchanges + a sort-merge join per
    * round, 4 long columns; round 0 a window partitioned by `chr` —
    * alphabet-sized key over every corpus position, maximal skew):
    *  - round 0 ranks chars with a partial-agg groupBy (alphabet-sized
    *    census) + broadcast join back — the big table is never
    *    shuffled, and no skewed sort exists;
    *  - the partner-rank fetch is lead(r, d) over (doc, pos): every
    *    position 0..len-1 is present, so d ROWS ahead IS pos+d — one
    *    Exchange on the doc id replaces the 2-Exchange self-join;
    *  - rows are 2 longs (packed, r): doc and pos are bit-fields of
    *    packed, never materialized columns crossing an Exchange;
    *  - checkpoints are LAZY: round k+1 still materializes round k
    *    exactly once (the localCheckpoint persist), but all rounds +
    *    the census consumers execute inside one job DAG instead of 7
    *    sequential driver-blocking jobs.
    * Net per round: 2 Exchanges of 16-byte rows instead of 3 of
    * 32-byte rows plus join sorts — the 100 TB shuffle-bytes story
    * improves by the same ratio. */
  def ranks(docs: DataFrame, rounds: Int): Seq[(Int, DataFrame)] = {
    val chars = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        posexplode(split(col("text"), "")))
      .filter(length(col("col")) === 1)
      .select((col("doc_id") * Pack + col("pos")).as("packed"),
        col("col").as("chr"))
      // two consumers (alphabet census + the rank join): checkpoint so
      // the corpus-wide split/posexplode runs ONCE (round 6)
      .localCheckpoint(false)
    val charRanks = chars.groupBy(col("chr")).agg(min(col("packed")).as("r"))
    var p = chars.join(broadcast(charRanks), Seq("chr"))
      .select(col("packed"), col("r"))
      .localCheckpoint(false)
    val out = scala.collection.mutable.ArrayBuffer((1, p))
    // partition by a MATERIALIZED doc column: an expr() key would be
    // aliased to a fresh _w0 attribute per lead, splitting the three
    // leads into three Exchange+Sort+Window stages instead of one
    val docW = Window.partitionBy(col("doc")).orderBy(col("packed"))
    // iteration exchanges get an EXPLICIT cluster-derived partition
    // count: AQE's advisory size coalesces these ~tens-of-MB integer
    // shuffles to 1-2 partitions, serializing every window sort in the
    // doubling chain; defaultParallelism scales with the cluster, and
    // window results are partition-count-invariant (min / per-doc lead)
    val np = docs.sparkSession.sparkContext.defaultParallelism
    // radix-4 doubling: one doc-partitioned pass fetches partner ranks
    // at +w, +2w, +3w (three lead expressions, ONE Window node, one
    // sort); level 2w ≡ (r, r2) and level 4w ≡ (r, r2, r3, r4) — the
    // 2w key is a prefix of the 4w key, so ONE coarse hash(r, r2)
    // exchange clusters BOTH min-windows (subset rule) and the finer
    // 4-col sort serves the 2-col window as a prefix. Two doublings
    // per exchange pair; odd trailing round falls back to one pair.
    var w = 1
    var k = 0
    while (k < rounds) {
      if (rounds - k >= 2) {
        val led = p
          .withColumn("doc", expr(s"packed div $Pack"))
          .repartition(np, col("doc"))
          .withColumn("r2", coalesce(lead(col("r"), w).over(docW), lit(-1L)))
          .withColumn("r3", coalesce(lead(col("r"), 2 * w).over(docW), lit(-1L)))
          .withColumn("r4", coalesce(lead(col("r"), 3 * w).over(docW), lit(-1L)))
          .drop("doc")
          .repartition(np, col("r"), col("r2"))
        val assigned = led
          .withColumn("rB", min(col("packed")).over(
            Window.partitionBy(col("r"), col("r2"), col("r3"), col("r4"))))
          .withColumn("rA", min(col("packed")).over(
            Window.partitionBy(col("r"), col("r2"))))
          .select(col("packed"), col("rA"), col("rB"))
          .localCheckpoint(false)
        out += ((2 * w, assigned.select(col("packed"), col("rA").as("r"))))
        p = assigned.select(col("packed"), col("rB").as("r"))
        out += ((4 * w, p))
        w *= 4; k += 2
      } else {
        p = p
          .withColumn("doc", expr(s"packed div $Pack"))
          .repartition(np, col("doc"))
          .withColumn("r2", coalesce(lead(col("r"), w).over(docW), lit(-1L)))
          .drop("doc")
          .repartition(np, col("r"), col("r2"))
          .withColumn("r",
            min(col("packed")).over(Window.partitionBy(col("r"), col("r2"))))
          .select(col("packed"), col("r"))
          .localCheckpoint(false)
        out += ((2 * w, p))
        w *= 2; k += 1
      }
    }
    out.toSeq
  }

  /** Repeat spectrum: for window lengths 1, 2, 4, …, 2^rounds, how
    * much of the corpus sits in repeated windows — the census that
    * sizes an exact-substring dedup pass (pick the cut length where
    * n_repeated_positions falls off). Per level one rank census
    * (partial-agg groupBy on r) plus an ANSWER-SIZED witness arm:
    * repeated GROUPS (one row each) unpack their rank back to
    * (doc_id, pos), join the docs table, and take the binary-min
    * window string — content-anchoring the integer ranks. */
  def repeatSpectrum(docs: DataFrame, rounds: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // ALL levels go through ONE tagged census aggregation, one stats
    // pass and one witness join, instead of 7 independent
    // census+stats+witness+crossJoin subtrees (round 6: that shape cost
    // ~50 sequential AQE stage materializations — the census arm alone
    // was ~8 of the query's 12 s at sf0.1 with the rank chain hot).
    // Total shuffle bytes are unchanged at any scale: the same 7
    // corpus-sized censuses flow through the single (window_len, r)
    // partial-agg exchange, and the witness arm stays answer-sized
    // (repeated GROUPS only, unpacked to (doc_id, pos) and joined back
    // to the text to take the binary-min window string).
    val all = ranks(docs, rounds).map { case (w, p) =>
      p.select(lit(w.toLong).as("window_len"), col("packed"), col("r"))
    }.reduce(_.union(_))
    // census feeds BOTH the stats agg and the witness arm: persist it
    // (rank-group-sized, far smaller than the position table); caller
    // owns cleanup (Bench/Verify clearCache), the LSH-table discipline.
    val census = all.groupBy(col("window_len"), col("r"))
      .agg(count(lit(1)).as("c")).persist()
    val stats = census.groupBy(col("window_len")).agg(
      sum(col("c")).as("n_positions"),
      count(lit(1)).as("n_distinct"),
      sum(when(col("c") >= 2, 1L).otherwise(0L)).as("n_repeated_groups"),
      sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("n_repeated_positions"),
      max(col("c")).as("max_group"))
    val witness = census.filter(col("c") >= 2)
      .select(col("window_len"), expr(s"r div $Pack").as("doc_id"),
        pmod(col("r"), lit(Pack)).as("pos"))
      .join(docs.select(col("doc_id").cast("long").as("doc_id"), col("text")),
        Seq("doc_id"))
      .groupBy(col("window_len"))
      .agg(min(expr(
        "substring(text, cast(pos + 1 as int), cast(window_len as int))"))
        .as("w_min"))
    // seed frame keeps the one-row-per-level contract on an empty
    // corpus (aggregate-without-groupBy semantics of the per-level
    // shape: n_positions null, n_distinct 0, witness '')
    val seed = (0 to rounds).map(k => (1L << k)).toDF("window_len")
    seed.join(stats, Seq("window_len"), "left")
      .join(witness, Seq("window_len"), "left")
      .select(col("window_len"), col("n_positions"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("n_repeated_groups"), col("n_repeated_positions"),
        col("max_group"),
        coalesce(col("w_min"), lit("")).as("min_repeated_window"))
  }

  /** DuckDB replica of [[repeatSpectrum]] — deliberately the OTHER
    * formulation: group positions directly by the truncated substring
    * (substr stops at the document end, matching the engine's -1
    * sentinel semantics), no ranks anywhere. A counting bug in the
    * doubling recursion cannot reproduce here. */
  def spectrumOracleSql(rounds: Int = 6): String = {
    val levels = (0 to rounds).map(1 << _).map { w =>
      s"""SELECT CAST($w AS BIGINT) AS window_len,
         |  CAST(sum(c) AS BIGINT) AS n_positions,
         |  CAST(count(*) AS BIGINT) AS n_distinct,
         |  CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated_groups,
         |  CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS n_repeated_positions,
         |  CAST(max(c) AS BIGINT) AS max_group,
         |  coalesce(min(CASE WHEN c >= 2 THEN wnd END), '') AS min_repeated_window
         |FROM (SELECT wnd, count(*) AS c FROM
         |  (SELECT substr(text, CAST(i AS INT), $w) AS wnd FROM pos) GROUP BY wnd)""".stripMargin
    }
    s"""WITH pos AS MATERIALIZED (
       |  SELECT text, unnest(generate_series(1, len(text))) AS i
       |  FROM documents WHERE len(text) > 0)
       |${levels.mkString("\nUNION ALL\n")}""".stripMargin
  }
}
