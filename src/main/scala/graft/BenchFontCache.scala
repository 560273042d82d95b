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

  /** Bench-only: single page, Type0 Identity-H, 2,000-entry bfchar
    * ToUnicode CMap (~36 KB decoded) — byte-identical across ids. */
  private def bigFontPdf(id: Long): Array[Byte] = {
    import graft.pdf.testgen.PdfBuilder
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val entries = (0 until 2000).map { k =>
      f"<${0x100 + k}%04X> <${0x4E00 + k}%04X>"
    }.mkString("\n")
    val cmap =
      s"""/CIDInit /ProcSet findresource begin
         |12 dict begin
         |begincmap
         |1 begincodespacerange
         |<0000> <FFFF>
         |endcodespacerange
         |2000 beginbfchar
         |$entries
         |endbfchar
         |endcmap
         |end
         |end""".stripMargin
    val tu = b.addStream("", cmap.getBytes("ISO-8859-1"), flate = true)
    val desc = b.addObject("<< /Type /FontDescriptor /FontName /Big-CID /Flags 4 /StemV 80 >>")
    val cid = b.addObject(
      s"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Big-CID " +
        s"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> " +
        s"/FontDescriptor $desc 0 R /DW 1000 >>")
    val f0 = b.addObject(
      s"<< /Type /Font /Subtype /Type0 /BaseFont /Big-CID /Encoding /Identity-H " +
        s"/DescendantFonts [$cid 0 R] /ToUnicode $tu 0 R >>")
    val codes = (0 until 24).map(k => f"${0x100 + ((id + k) % 2000)}%04X").mkString
    val content = s"BT /F0 12 Tf 1 0 0 1 72 700 Tm <$codes> Tj ET"
    val cId = b.addStream("", content.getBytes("ISO-8859-1"), flate = true)
    val pageId = b.addObject(
      s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F0 $f0 0 R >> >> /Contents $cId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    b.build(catId)
  }

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
        val payload = if (kind == "big") bigFontPdf(id) else PagesGen.fontPdf(id)
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
