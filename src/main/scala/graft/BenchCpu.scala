package graft

import org.apache.spark.sql.SparkSession
import graft.spark.{ExtractJob, PagesGen}

/** Host-noise-immune extraction probe: measures JVM *process CPU time*
  * (not wall clock) across full extraction passes over the mixed
  * corpus. Hypervisor steal/preemption on this box swings wall-clock
  * throughput 2x run-to-run (BENCH.md), but preempted time is not
  * charged to process CPU, so cpu-seconds per pass is stable enough
  * for A/B-ing optimizations. Min over passes after a JIT warmup pass.
  *
  * Usage: runMain graft.BenchCpu [nDocs] [passes]
  */
object BenchCpu {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 150000
    val passes = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = sys.env.getOrElse("SPARK_GRAFT_BENCH_CORPUS", "mixed")
    val pages = PagesGen.benchCorpus(spark, nDocs, 42L, 64, corpus).toDF().cache()
    pages.count()
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def cpuNs(): Long = os.getProcessCpuTime
    // warmup (JIT)
    ExtractJob.extract(pages, ExtractJob.Config()).write.mode("overwrite").format("noop").save()
    val times = (1 to passes).map { _ =>
      val c0 = cpuNs()
      ExtractJob.extract(pages, ExtractJob.Config()).write.mode("overwrite").format("noop").save()
      (cpuNs() - c0) / 1e9
    }
    val best = times.min
    println(f"""{"cpu_sec_per_pass_min":$best%.3f,"all":[${times.map(t => f"$t%.3f").mkString(",")}],"n_docs":$nDocs,"docs_per_cpu_sec":${nDocs / best}%.0f,"corpus":"$corpus"}""")
    spark.stop()
  }
}
