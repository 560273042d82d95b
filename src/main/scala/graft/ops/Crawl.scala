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

  /** Snapshot collapse (CDX-style): consolidate a raw re-crawl LOG —
    * many fetches per url over time, columns (url, warc_ts, fp) — into
    * one row per url: fetch count, distinct content versions, first/
    * last fetch time, the fingerprint of the LATEST fetch, and a churn
    * flag (content changed at least once). This is the batch
    * complement of [[delta]]: delta diffs two url-unique snapshots;
    * collapse is what MAKES a url-unique snapshot out of the raw log.
    *
    * Latest-fetch selection is max over (warc_ts, fp) lexicographic
    * order, so ties on warc_ts break deterministically on fp (a raw
    * crawl log CAN carry two fetches of one url in the same second).
    * The pair is packed as zero-padded-19-digit-ts || fp and max'd as
    * ONE string: string order == (ts, fp) order for the non-negative
    * epoch timestamps a crawl log carries (contract: warc_ts >= 0).
    * Plan note (measured, PLANS.md): any non-fixed-width aggregation
    * BUFFER — a struct-max OR this string-max — drops the whole
    * aggregate to SortAggregate; with a NUMERIC fp (the production
    * choice: xxhash64) every buffer is fixed-width and the identical
    * shape plans as HashAggregate with partials below both exchanges.
    * The md5-string fp here is the DuckDB-oracle-parity instance.
    * Either way a window row_number would be worse: a second shuffle
    * and hot urls pinned into one reducer.
    *
    * Scale shape: ONE hash shuffle on url with partial aggregation
    * below it (count/min/max/struct-max all combine map-side); the
    * count(DISTINCT fp) plans as the standard two-level expand — one
    * row per distinct (url, fp) moves, never the raw log. url is the
    * natural bucket key of a crawl corpus, so on a bucketed layout
    * the whole collapse is shuffle-free. */
  def collapse(log: DataFrame): DataFrame =
    log.groupBy(col("url")).agg(
      count(lit(1)).as("n_fetches"),
      countDistinct(col("fp")).as("n_versions"),
      min(col("warc_ts")).as("first_ts"),
      max(col("warc_ts")).as("last_ts"),
      max(concat(lpad(col("warc_ts").cast("string"), 19, "0"),
        col("fp"))).as("_latest_packed"))
      .select(col("url"), col("n_fetches"), col("n_versions"),
        col("first_ts"), col("last_ts"),
        expr("substr(_latest_packed, 20)").as("latest_fp"),
        (col("n_versions") > lit(1L)).as("churn"))

  /** Deterministic synthetic re-crawl log over documents: doc d is
    * fetched 1 + d%3 times at warc_ts = 1700000000 + 97d + 86400k;
    * fetches k>0 of docs d ≡ 0 (mod 4) carry edited content (" v<k>"
    * suffix), so the corpus has urls with 1-3 fetches and 1-3
    * versions in every combination. md5 fingerprints for oracle
    * parity. [[fetchLogOracleSql]] states the same log. */
  def syntheticFetchLog(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    docs.select(
      concat(lit("https://"), col("source"), lit("/doc"),
        d.cast("string")).as("url"),
      col("text"), d.as("doc_id"))
      .select(col("url"), col("text"), col("doc_id"),
        explode(sequence(lit(0), (d % 3).cast("int"))).as("k"))
      .select(col("url"),
        (lit(1700000000L) + col("doc_id") * 97 + col("k") * 86400)
          .as("warc_ts"),
        md5(when(col("k") > 0 && col("doc_id") % 4 === 0,
          concat(col("text"), lit(" v"), col("k").cast("string")))
          .otherwise(col("text"))).as("fp"))
  }

  /** Closed-form SQL for [[syntheticFetchLog]]. */
  def fetchLogOracleSql: String =
    """WITH f AS (SELECT doc_id, text,
      |  'https://' || source || '/doc' || CAST(doc_id AS VARCHAR) AS url,
      |  unnest(generate_series(0, CAST(doc_id % 3 AS INT))) AS k
      | FROM documents)
      |SELECT url,
      |  1700000000 + doc_id * 97 + k * 86400 AS warc_ts,
      |  md5(CASE WHEN k > 0 AND doc_id % 4 = 0
      |      THEN text || ' v' || CAST(k AS VARCHAR) ELSE text END) AS fp
      |FROM f""".stripMargin

  /** DuckDB replica of [[collapse]] over `logSql` — the latest fetch
    * is restated as max(fp) among max-warc_ts rows (join-back
    * formulation) vs the engine's single-pass struct-max: independent
    * wording of the same tie-break. */
  def collapseOracleSql(logSql: String): String =
    """WITH log AS (%LOG%),
      |g AS (SELECT url, CAST(count(*) AS BIGINT) AS n_fetches,
      |  CAST(count(DISTINCT fp) AS BIGINT) AS n_versions,
      |  min(warc_ts) AS first_ts, max(warc_ts) AS last_ts
      | FROM log GROUP BY url),
      |m AS (SELECT url, max(warc_ts) AS mt FROM log GROUP BY url),
      |l AS (SELECT log.url, max(log.fp) AS latest_fp FROM log
      |      JOIN m ON log.url = m.url AND log.warc_ts = m.mt
      |      GROUP BY log.url)
      |SELECT g.url, g.n_fetches, g.n_versions, g.first_ts, g.last_ts,
      |  l.latest_fp, g.n_versions > 1 AS churn
      |FROM g JOIN l ON g.url = l.url""".stripMargin
      .replace("%LOG%", logSql)
}
