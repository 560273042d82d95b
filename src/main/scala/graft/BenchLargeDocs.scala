package graft

import org.apache.spark.sql.SparkSession
import graft.spark.{ExtractJob, PagesGen}

/** Large-document throughput probe: the reference's published 46
  * MB/s·core is measured on ~2.4 MB-average REAL PDFs where per-doc
  * fixed costs (xref parse, font setup, object cache) amortize over
  * hundreds of pages; the default bench corpus averages ~7 KB/doc and
  * is dominated by those fixed costs. This probe builds multi-hundred-
  * page PDFs of comparable size and reports MB/s and pages/s at a
  * given width — the like-for-like per-byte comparison.
  *
  * Usage: runMain graft.BenchLargeDocs [nDocs] [pagesPerDoc] [cores]
  */
object BenchLargeDocs {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 64
    val pagesPerDoc = if (args.length > 1) args(1).toInt else 400
    val cores = if (args.length > 2) args(2).toInt else 16
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // generate on executors: one big PDF per row, deterministic
    val pages = spark.range(0, nDocs, 1, cores).map { id =>
      val rnd = new java.util.Random(id * 0x9e3779b97f4a7c15L + 11L)
      val pagesSeq = (0 until pagesPerDoc).map { p =>
        (0 until 40).map { k =>
          graft.pdf.testgen.PdfBuilder.Line(72f, 720f - 14f * (k % 48), 11f, "F1",
            PagesGen.sentence(rnd, 6 + rnd.nextInt(8)))
        }
      }
      (s"https://big.example/doc$id.pdf", graft.pdf.testgen.PdfBuilder.multiPage(pagesSeq, compress = sys.env.get("SPARK_GRAFT_LARGE_COMPRESS").forall(_ == "1")))
    }.toDF("url", "html").cache()
    val nBytes = pages.selectExpr("sum(length(html))").collect()(0).getLong(0)
    pages.count()

    def onePass(): Double = {
      val t0 = System.nanoTime()
      ExtractJob.extract(pages, ExtractJob.Config(maxPages = pagesPerDoc)).write
        .mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    onePass() // JIT warmup
    val t = (1 to 3).map(_ => onePass()).min
    val mb = nBytes / 1e6
    println(f"""{"n_docs":$nDocs,"pages_per_doc":$pagesPerDoc,"cores":$cores,""" +
      f""""total_mb":$mb%.1f,"avg_doc_mb":${mb / nDocs}%.2f,"sec":$t%.2f,""" +
      f""""mb_per_sec":${mb / t}%.1f,"mb_per_sec_core":${mb / t / cores}%.2f,""" +
      f""""pages_per_sec":${nDocs.toLong * pagesPerDoc / t}%.0f}""")
    spark.stop()
  }
}
