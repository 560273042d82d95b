package graft
import org.apache.spark.sql.SparkSession
import graft.spark.{ExtractJob, PagesGen}
object ProfileRun {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pages = PagesGen.generate(spark, 150000, 42L, 64).toDF().cache()
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
