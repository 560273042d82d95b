package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table (the crawl/telemetry
  * side of a training-data pipeline).
  *
  * Scale shape: everything here is one hash shuffle on `user_id`
  * followed by sorted window passes and a partial-aggregated groupBy —
  * the plan you want at 10^12 events. Per-user state never leaves its
  * partition; there is no collect, no broadcast, no cross join. Skewed
  * "mega-users" stay bounded because window functions stream over the
  * sorted run (no per-user materialization beyond the frame).
  */
object Events {

  /** Gap-based sessionization: a new session starts when a user's
    * inter-event gap exceeds `gapUs` microseconds. Classic two-pass
    * window formulation (lag → boundary flag → running sum = session
    * index) over a single user_id shuffle.
    *
    * Determinism/oracle notes: ordering is (ts, event_id) — event_id
    * breaks timestamp ties; every output column is an integer; only
    * timestamp DIFFERENCES are used (boundary test, duration), so the
    * result is invariant to the engines' epoch/timezone interpretation
    * of the parquet timestamps. Output: one row per session with the
    * minimum event_id as its stable id.
    */
  def sessionize(events: DataFrame, gapUs: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // parquet readers may surface ts as TIMESTAMP or TIMESTAMP_NTZ
    // depending on the writer's isAdjustedToUTC flag; unix_micros only
    // accepts the former. The cast interprets NTZ wall time in the
    // session zone — safe here because only DIFFERENCES are used and
    // the session zone is UTC (DST-free) in every driver entry point.
    val us = unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType))
    val prev = lag(us, 1).over(byUser)
    events
      .withColumn("us", us)
      .withColumn("new_s",
        when(prev.isNull || (col("us") - prev) > gapUs, 1L).otherwise(0L))
      .withColumn("s_idx", sum(col("new_s")).over(running))
      .groupBy(col("user_id"), col("s_idx"))
      .agg(
        min(col("event_id")).as("session_start"),
        count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("duration_us"))
      .select(col("user_id"), col("session_start"), col("n_events"),
        col("duration_us"))
  }

  /** DuckDB oracle for [[sessionize]] — same (ts, event_id) ordering,
    * same lag/flag/running-sum/group pipeline, integer-only output. */
  def sessionizeOracleSql(gapUs: Long): String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $gapUs
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, event_id, us,
       |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_idx
       |  FROM flagged)
       |SELECT user_id, min(event_id) AS session_start,
       |  count(*) AS n_events, max(us) - min(us) AS duration_us
       |FROM sess GROUP BY user_id, s_idx""".stripMargin
}
