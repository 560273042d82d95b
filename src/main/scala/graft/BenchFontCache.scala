package graft

import org.apache.spark.sql.SparkSession
import graft.pdf.font.FontCache
import graft.spark.{ExtractJob, PagesGen}

/** A/B CPU probe for the cross-document FontCache on the font-fidelity
  * corpus (every doc carries two embedded ToUnicode CMap streams that
  * are byte-identical across docs — the crawl-realistic repeat
  * pattern). Arms are INTERLEAVED per pass (adjacent A/B is the only
  * trustworthy comparison on this host — the CPU floor itself drifts
  * between measurement windows), both measured as process-CPU seconds
  * like BenchCpu.
  *
  * Two corpora:
  *  - `fixture`: the driver's fontPdf docs (two small CMaps) — shows
  *    the cache is exercised by the real fixture tier;
  *  - `big`: docs with a 2,000-entry bfchar ToUnicode (the realistic
  *    size for CJK / subset-font crawl PDFs, where ToUnicode streams
  *    run tens of KB) — shows the saving at the size that matters.
  *
  * Usage: runMain graft.BenchFontCache [nDocs] [passes] [fixture|big]
  */
object BenchFontCache {

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 60000
    val passes = if (args.length > 1) args(1).toInt else 3
    val kind = if (args.length > 2) args(2) else "fixture"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val pages = spark.range(0, nDocs, 1, 64)
      .map { id =>
        val payload = if (kind == "big") PagesGen.bigFontPdf(id) else PagesGen.fontPdf(id)
        graft.spark.PageRow(PagesGen.url(id, "pdf"),
          new java.sql.Timestamp(0L), payload, "", "en")
      }.toDF().cache()
    pages.count()
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def pass(): Double = {
      val c0 = os.getProcessCpuTime
      ExtractJob.extract(pages, ExtractJob.Config(salt = false))
        .write.mode("overwrite").format("noop").save()
      (os.getProcessCpuTime - c0) / 1e9
    }
    // JIT warmup, one per arm
    FontCache.enabled = true; FontCache.clear(); pass()
    FontCache.enabled = false; pass()
    val on = Array.newBuilder[Double]
    val off = Array.newBuilder[Double]
    (1 to passes).foreach { _ =>
      FontCache.enabled = true; FontCache.clear()
      on += pass()
      val h = FontCache.hits; val m = FontCache.misses
      FontCache.enabled = false
      off += pass()
      System.err.println(s"[fontcache] hits=$h misses=$m")
    }
    val bOn = on.result().min
    val bOff = off.result().min
    println(f"""{"cached_cpu_sec":$bOn%.3f,"uncached_cpu_sec":$bOff%.3f,"saving_pct":${100.0 * (bOff - bOn) / bOff}%.1f,"n_docs":$nDocs,"hits":${FontCache.hits},"on":[${on.result().map(t => f"$t%.3f").mkString(",")}],"off":[${off.result().map(t => f"$t%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
