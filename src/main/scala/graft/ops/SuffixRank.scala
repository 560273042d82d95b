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

  /** (doc_id, pos, packed, r) after `rounds` doublings: r is the
    * equality key of the 2^rounds-char truncated window at pos.
    * Round 0 (single chars) is the only round that touches strings. */
  def ranks(docs: DataFrame, rounds: Int): Seq[(Int, DataFrame)] = {
    val chars = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        posexplode(split(col("text"), "")))
      .filter(length(col("col")) === 1)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        (col("doc_id") * Pack + col("pos")).as("packed"), col("col").as("chr"))
    var p = chars
      .withColumn("r", min(col("packed")).over(Window.partitionBy(col("chr"))))
      .drop("chr")
      .localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer((1, p))
    for (k <- 1 to rounds) {
      val d = 1L << (k - 1)
      val shifted = p.select(col("doc_id"),
        (col("pos") - d).as("pos"), col("r").as("r2"))
      p = p.join(shifted, Seq("doc_id", "pos"), "left")
        .withColumn("r2", coalesce(col("r2"), lit(-1L)))
        .withColumn("r",
          min(col("packed")).over(Window.partitionBy(col("r"), col("r2"))))
        .select(col("doc_id"), col("pos"), col("packed"), col("r"))
        .localCheckpoint(true)
      out += ((1 << k, p))
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
    val levels = ranks(docs, rounds).map { case (w, p) =>
      val census = p.groupBy(col("r")).agg(count(lit(1)).as("c"))
      val stats = census.agg(
        sum(col("c")).as("n_positions"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("c") >= 2, 1L).otherwise(0L)).as("n_repeated_groups"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("n_repeated_positions"),
        max(col("c")).as("max_group"))
      val witness = census.filter(col("c") >= 2)
        .select(expr(s"r div $Pack").as("doc_id"),
          pmod(col("r"), lit(Pack)).as("pos"))
        .join(docs.select(col("doc_id").cast("long").as("doc_id"), col("text")),
          Seq("doc_id"))
        .agg(coalesce(min(expr(s"substring(text, pos + 1, $w)")), lit(""))
          .as("min_repeated_window"))
      stats.crossJoin(witness)
        .select(lit(w.toLong).as("window_len"), col("n_positions"),
          col("n_distinct"), col("n_repeated_groups"),
          col("n_repeated_positions"), col("max_group"),
          col("min_repeated_window"))
    }
    levels.reduce(_.union(_))
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
