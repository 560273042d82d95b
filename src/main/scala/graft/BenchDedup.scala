package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{ExtractJob, PageRow, PagesGen}

/** A/B for ExtractJob.extractDeduped: a crawl-shaped corpus where each
  * distinct payload is seen under `dupFactor` urls (real crawls carry
  * 30-50% exact-duplicate payloads across mirrors/re-crawls), extracted
  * via plain extract() vs the payload-dedup path.
  *
  * The dedup path trades two payload shuffles (rep-selection window +
  * explicit repartition of the distinct set) for (1 - 1/dupFactor) of
  * the extraction CPU — this main measures both sides of that trade:
  * process-CPU seconds per pass (the host-noise-immune metric, see
  * BenchCpu) and wall clock, arms interleaved per round per the HOST
  * WARNING discipline, min over rounds after a JIT warmup.
  *
  * Usage: runMain graft.BenchDedup [nDistinct] [dupFactor] [rounds]
  */
object BenchDedup {
  def main(args: Array[String]): Unit = {
    val nDistinct = if (args.length > 0) args(0).toLong else 40000L
    val dupFactor = if (args.length > 1) args(1).toInt else 3
    val rounds = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val corpus = sys.env.getOrElse("SPARK_GRAFT_BENCH_CORPUS", "mixed")
    val baseTs = 1735689600000L
    // nDistinct payloads × dupFactor urls, mirror copies interleaved in
    // the id space (mirrors of a doc do NOT sit in the same scan
    // partition — the realistic layout and the worst case for any
    // scan-local shortcut; the window shuffle must really gather them)
    val nTotal = nDistinct * dupFactor
    val pages = spark.range(0, nTotal, 1, 64).mapPartitions { ids =>
      ids.map { id =>
        val payloadId = id % nDistinct // consecutive ids = different payloads
        val mirror = id / nDistinct
        val bytes = PagesGen.benchPayload(payloadId, 42L, corpus)
        PageRow(s"mirror-$mirror/" + PagesGen.url(payloadId, "pdf"),
          new java.sql.Timestamp(baseTs + id * 1000L), bytes, "", "en")
      }
    }.toDF().cache()
    pages.count()

    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def cpuNs(): Long = os.getProcessCpuTime
    val cfg = ExtractJob.Config(salt = false)
    def pass(dedup: Boolean): (Double, Double) = {
      val c0 = cpuNs(); val t0 = System.nanoTime()
      val out = if (dedup) ExtractJob.extractDeduped(pages, cfg)
                else ExtractJob.extract(pages, cfg)
      out.write.mode("overwrite").format("noop").save()
      ((cpuNs() - c0) / 1e9, (System.nanoTime() - t0) / 1e9)
    }

    pass(dedup = true); pass(dedup = false) // JIT warmup
    var cpuD = Double.MaxValue; var cpuP = Double.MaxValue
    var wallD = Double.MaxValue; var wallP = Double.MaxValue
    for (r <- 1 to rounds) {
      val (cd, wd) = pass(dedup = true)
      val (cp, wp) = pass(dedup = false)
      System.err.println(f"[dedup] round $r: deduped cpu=$cd%.2f wall=$wd%.2f | plain cpu=$cp%.2f wall=$wp%.2f")
      if (cd < cpuD) cpuD = cd; if (wd < wallD) wallD = wd
      if (cp < cpuP) cpuP = cp; if (wp < wallP) wallP = wp
    }
    println(
      f"""{"n_distinct":$nDistinct,"dup_factor":$dupFactor,"corpus":"$corpus",""" +
      f""""deduped_cpu_sec":$cpuD%.2f,"plain_cpu_sec":$cpuP%.2f,"cpu_saving":${1 - cpuD / cpuP}%.3f,""" +
      f""""deduped_wall_sec":$wallD%.2f,"plain_wall_sec":$wallP%.2f,"wall_speedup":${wallP / wallD}%.2f}""")
    spark.stop()
  }
}
