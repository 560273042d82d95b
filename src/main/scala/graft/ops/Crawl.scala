package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-snapshot operators: the incremental-ingestion primitives a
  * recurring crawl pipeline runs between snapshots. */
object Crawl {

  /** Snapshot delta: classify every url across two crawl snapshots as
    * added / removed / changed / unchanged by comparing content
    * fingerprints. Inputs are (url, fp) tables — the fingerprint
    * column is the CALLER's choice (md5 here in the driver query for
    * DuckDB oracle parity; xxhash64 at production scale — the operator
    * is agnostic).
    *
    * Scale shape: ONE full-outer equi-join on url — with both
    * snapshots bucketed by url-hash (the layout ExtractJob already
    * writes), this is a zero-shuffle sort-merge join per bucket; the
    * incremental re-extraction workload is then `status IN ('added',
    * 'changed')`, typically a few percent of the crawl. No driver
    * state, no window, AQE handles host-skewed url spaces.
    *
    * CONTRACT: each snapshot must be url-unique (one row per url — a
    * snapshot, not a raw re-crawl log). Duplicate urls fan out through
    * the full-outer join; run first-seen dedup (ExtractStreamJob
    * .dedupFirstSeen or Dedup.exact on url) upstream if needed. */
  def delta(prev: DataFrame, cur: DataFrame): DataFrame = {
    // Presence is carried by explicit marker columns, NOT by fp
    // nullness: a snapshot row whose fingerprint is legitimately NULL
    // (e.g. md5 of NULL text) must still count as present, and
    // changed-ness uses null-safe equality — otherwise a prev-only url
    // with NULL fp would misclassify as 'added' and poison the
    // worklist.
    val p = prev.select(col("url"), col("fp").as("__fp_prev"),
      lit(true).as("__in_prev"))
    val c = cur.select(col("url"), col("fp").as("__fp_cur"),
      lit(true).as("__in_cur"))
    p.join(c, Seq("url"), "full_outer")
      .select(col("url"),
        when(col("__in_prev").isNull, "added")
          .when(col("__in_cur").isNull, "removed")
          .when(!(col("__fp_prev") <=> col("__fp_cur")), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Per-status counts of [[delta]] — the snapshot health report. */
  def deltaSummary(prev: DataFrame, cur: DataFrame): DataFrame =
    delta(prev, cur).groupBy(col("status")).agg(count(lit(1)).as("n_urls"))
}
