package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{ExtractJob, PageRow, PagesGen}

/** Heavy-tail skew evidence at realistic shape (round-4 verdict item
  * 7): a corpus whose heavy tail DOMINATES total work and is CLUSTERED
  * in the input layout (a crawl segment of scanned/long PDFs — the
  * worst case for scan-local execution), run through the SAME
  * ExtractJob with the salt on vs off.
  *
  * What the salt must show (not just in the plan, in the numbers):
  *  - unsalted: the partitions holding the heavy block do all the
  *    heavy CPU while the rest idle → per-partition busy-time spread
  *    is extreme and wall-clock tracks the single hottest partition;
  *  - salted: exactly one exchange spreads the heavy rows over
  *    2×parallelism partitions → spread collapses toward 1 and
  *    wall-clock tracks total-work/cores.
  *
  * Busy time comes from the rows themselves (ExtractedDoc.duration_ms
  * summed per partition_id — the engine's own lineage metrics), so the
  * evidence needs no listener plumbing. Arms are interleaved per round
  * (HOST WARNING discipline); min wall per arm over rounds.
  *
  * Usage: runMain graft.BenchSkew [nDocs] [heavyPct] [rounds]
  */
object BenchSkew {

  private def heavyPdf(id: Long, nLines: Int): Array[Byte] =
    PagesGen.longPdf(id, nLines)

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 20000L
    val heavyPct = if (args.length > 1) args(1).toDouble else 1.0
    val rounds = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // corpus: heavy docs CLUSTERED at the front of the id space (the
    // contiguous ids land in the same scan partitions — a crawl
    // segment of long PDFs), each ~50 pages; the rest standard docs
    val nHeavy = math.max(1L, (nDocs * heavyPct / 100.0).toLong)
    val baseTs = 1735689600000L
    val pages = spark.range(0, nDocs, 1, 64).mapPartitions { ids =>
      ids.map { id =>
        val bytes =
          if (id < nHeavy) heavyPdf(id, 2000)
          else PagesGen.payload(id, 42L)._1
        PageRow(PagesGen.url(id, "pdf"), new java.sql.Timestamp(baseTs + id * 1000L),
          bytes, "", "en")
      }
    }.toDF().cache()
    val heavyBytes = pages.filter(length(col("html")) > 100 * 1024)
      .selectExpr("sum(length(html))").collect()(0).getLong(0)
    val totalBytes = pages.selectExpr("sum(length(html))").collect()(0).getLong(0)

    // threshold chosen so exactly the clustered tail routes heavy
    val cfgSalt = ExtractJob.Config(salt = true, heavyThresholdBytes = 100 * 1024)
    val cfgNone = ExtractJob.Config(salt = false)

    def pass(cfg: ExtractJob.Config): (Double, Double, Double, Long) = {
      val t0 = System.nanoTime()
      val perPart = ExtractJob.extract(pages, cfg)
        .groupBy(col("partition_id"))
        .agg(sum(col("duration_ms")).as("busy_ms"), count(lit(1)).as("n"))
        .collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val busy = perPart.map(_.getDouble(1)) // col 1 = busy_ms (0 = partition_id)
      val maxBusy = busy.max
      val meanBusy = busy.sum / busy.length
      (wall, maxBusy, meanBusy, perPart.length.toLong)
    }

    // JIT warmup, one per arm
    pass(cfgSalt); pass(cfgNone)
    var wSalt = Double.MaxValue; var wNone = Double.MaxValue
    var spreadSalt = 0.0; var spreadNone = 0.0
    var maxSalt = 0.0; var maxNone = 0.0
    var partsSalt = 0L; var partsNone = 0L
    for (r <- 1 to rounds) {
      val (ws, ms, as_, ps) = pass(cfgSalt)
      val (wn, mn, an, pn) = pass(cfgNone)
      System.err.println(f"[skew] round $r: salted wall=$ws%.2f s spread=${ms / as_}%.1f | " +
        f"unsalted wall=$wn%.2f s spread=${mn / an}%.1f")
      if (ws < wSalt) { wSalt = ws; spreadSalt = ms / as_; maxSalt = ms; partsSalt = ps }
      if (wn < wNone) { wNone = wn; spreadNone = mn / an; maxNone = mn; partsNone = pn }
    }
    println(
      f"""{"n_docs":$nDocs,"n_heavy":$nHeavy,"heavy_bytes_pct":${100.0 * heavyBytes / totalBytes}%.1f,""" +
      f""""salted_wall_sec":$wSalt%.2f,"unsalted_wall_sec":$wNone%.2f,"speedup":${wNone / wSalt}%.2f,""" +
      f""""salted_max_partition_busy_ms":$maxSalt%.0f,"unsalted_max_partition_busy_ms":$maxNone%.0f,""" +
      f""""salted_busy_spread":$spreadSalt%.2f,"unsalted_busy_spread":$spreadNone%.2f,""" +
      f""""salted_partitions":$partsSalt,"unsalted_partitions":$partsNone}""")
    spark.stop()
  }
}
