package graft
import org.apache.spark.sql.SparkSession
import graft.spark.{ExtractJob, PagesGen}
object ProfileRun {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // default: the mixed corpus; "large" arg: content-VM-dominated
    // multi-hundred-page docs (the BenchLargeDocs shape)
    val pages =
      if (args.headOption.contains("large")) {
        spark.range(0, 128, 1, 16).map { id =>
          val rnd = new java.util.Random(id * 0x9e3779b97f4a7c15L + 11L)
          val pagesSeq = (0 until 400).map { _ =>
            (0 until 40).map { k =>
              graft.pdf.testgen.PdfBuilder.Line(72f, 720f - 14f * (k % 48), 11f, "F1",
                PagesGen.sentence(rnd, 6 + rnd.nextInt(8)))
            }
          }
          (s"https://big.example/doc$id.pdf",
            graft.pdf.testgen.PdfBuilder.multiPage(pagesSeq, compress = true))
        }.toDF("url", "html").cache()
      } else PagesGen.benchCorpus(spark, 150000, 42L, 64,
        sys.env.getOrElse("SPARK_GRAFT_BENCH_CORPUS", "mixed")).toDF().cache()
    pages.count()
    // warmup
    ExtractJob.extract(pages, ExtractJob.Config()).write.mode("overwrite").format("noop").save()
    val jfr = java.nio.file.Paths.get("/tmp/extract.jfr")
    java.nio.file.Files.deleteIfExists(jfr)
    val pid = ProcessHandle.current().pid()
    new ProcessBuilder("jcmd", pid.toString, "JFR.start", "name=prof",
      "settings=profile", s"filename=/tmp/extract.jfr").inheritIO().start().waitFor()
    (1 to 3).foreach { _ =>
      ExtractJob.extract(pages, ExtractJob.Config()).write.mode("overwrite").format("noop").save()
    }
    new ProcessBuilder("jcmd", pid.toString, "JFR.stop", "name=prof").inheritIO().start().waitFor()
    spark.stop()
  }
}
