package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental variant of the extraction job (SURVEY §1.2 / §7 — the
  * optional Structured Streaming path): new page files landing in the
  * input directory are extracted exactly-once via the streaming
  * checkpoint, with the same per-row kernel as the batch job. The
  * stateless transform needs no watermark; resume-after-kill comes from
  * the sink's checkpointLocation instead of the batch checkpoint table.
  */
object ExtractStreamJob {

  /** Start a file-source stream over `pagesDir` (bucketed parquet
    * layout), writing extracted docs to `outDir`. AvailableNow trigger
    * processes the backlog then stops — the batch-equivalent mode; pass
    * `continuous = true` for an always-on micro-batch stream. */
  def start(spark: SparkSession, pagesDir: String, outDir: String,
            checkpointDir: String, cfg: ExtractJob.Config = ExtractJob.Config(salt = false),
            continuous: Boolean = false): StreamingQuery = {
    val schema = spark.read.parquet(pagesDir).schema
    val pages: DataFrame = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "64")
      .parquet(pagesDir)
    val extracted = ExtractJob.extract(pages, cfg.copy(salt = false))
    // (salt routing needs a repartition — legal in streaming too, but the
    // heavy-tier split would start two sinks; the incremental path keeps
    // the scan-local tier and relies on oversizeCap for giants)
    val writer = extracted.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
    (if (continuous) writer.trigger(Trigger.ProcessingTime("10 seconds"))
     else writer.trigger(Trigger.AvailableNow())).start()
  }
}
