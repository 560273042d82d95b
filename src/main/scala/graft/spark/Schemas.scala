package graft.spark

import java.sql.Timestamp

/** Input row — Common-Crawl-style pages table (BASELINE.json input_hint):
  * (url, warc_ts, html BINARY, text, lang). */
final case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Output row (FIXTURES.md §2). `n_bytes` is carried for the checkpoint
  * table and dropped from the extracted output. */
final case class ExtractedDoc(
    url: String,
    text: String,
    markdown: String,
    html: String,
    title: String,
    n_pages: Int,
    n_spans: Int,
    duration_ms: Double,
    status: String, // ok | error | skipped_oversize
    error_msg: String,
    n_bytes: Long,
    partition_id: Int)

/** Per-row lineage + metrics (FIXTURES.md §2 checkpoint schema). */
final case class CheckpointRow(
    run_id: String,
    partition_id: Int,
    url: String,
    status: String,
    duration_ms: Double,
    n_bytes: Long,
    finished_at: Timestamp)
