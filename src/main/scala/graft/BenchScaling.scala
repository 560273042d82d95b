package graft

import org.apache.spark.sql.SparkSession
import graft.spark.{ExtractJob, PagesGen}

/** Scaling-efficiency evidence (north rule: ≥0.8 between N and 4N
  * executors; sandbox stand-in: same job at N vs 4N local cores on
  * identical input). Generates one corpus to parquet, runs the same
  * extraction job at both parallelism levels in fresh sessions.
  *
  * N=4 vs 4N=16 by default: a pure-CPU probe (BENCH.md) shows this
  * VM's 32 vCPUs saturate at ~16 physical cores' throughput, so 8→32
  * is hardware-capped at ~0.5 efficiency regardless of the job; 4→16
  * is the honest 4× hardware ratio available here.
  *
  * Usage: runMain graft.BenchScaling [nDocs] [outJson] [nCores]
  */
object BenchScaling {

  private def session(cores: Int): SparkSession = SparkSession.builder()
    .master(s"local[$cores]")
    .config("spark.sql.shuffle.partitions", cores.toString)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 8000L
    val nCores = if (args.length > 2) args(2).toInt else 4
    val corpusDir = "/tmp/graft_bench_corpus"

    // 1. materialize the corpus once + JIT warmup (not timed). Two
    // full-size passes: C2 needs them before the extraction path hits
    // steady state (measured 10x interpreter penalty otherwise).
    locally {
      val s = session(16)
      s.sparkContext.setLogLevel("WARN")
      PagesGen.writeBucketed(
        PagesGen.benchCorpus(s, nDocs, 42L, 64,
          sys.env.getOrElse("SPARK_GRAFT_BENCH_CORPUS", "mixed")),
        corpusDir, nBuckets = 64)
      val pages = s.read.parquet(corpusDir)
      ExtractJob.extract(pages, ExtractJob.Config()).count()
      ExtractJob.extract(pages, ExtractJob.Config()).count()
      s.stop()
    }

    /** One timed run at a given width (fresh session). */
    def once(cores: Int): (Double, Long) = {
      val s = session(cores)
      s.sparkContext.setLogLevel("WARN")
      val pages = s.read.parquet(corpusDir)
      val t0 = System.nanoTime()
      val n = ExtractJob.extract(pages, ExtractJob.Config()).count()
      val dt = (System.nanoTime() - t0) / 1e9
      s.stop()
      System.gc() // settle the heap between sessions
      (dt, n)
    }

    // Alternate N / 4N rounds so ambient host-noise bursts hit both
    // widths; take the min per width (multi-second noise observed).
    var tN = Double.MaxValue
    var t4N = Double.MaxValue
    var nN = 0L
    var n4N = 0L
    for (round <- 1 to 3) {
      val (a, na) = once(nCores)
      val (b, nb) = once(nCores * 4)
      System.err.println(f"[scaling] round $round: t($nCores)=$a%.2f s  t(${nCores * 4})=$b%.2f s")
      tN = math.min(tN, a); t4N = math.min(t4N, b); nN = na; n4N = nb
    }
    require(nN == n4N && nN == nDocs, s"row mismatch: $nN vs $n4N vs $nDocs")
    val thN = nDocs / tN
    val th4N = nDocs / t4N
    val eff = (th4N / thN) / 4.0
    val json =
      f"""{"n_docs":$nDocs,"n_cores":$nCores,"t_localN_sec":$tN%.2f,"t_local4N_sec":$t4N%.2f,""" +
      f""""docs_per_sec_N":$thN%.1f,"docs_per_sec_4N":$th4N%.1f,""" +
      f""""scaling_efficiency":$eff%.3f,"target":0.8,""" +
      s""""corpus":"${sys.env.getOrElse("SPARK_GRAFT_BENCH_CORPUS", "mixed")}"}"""
    println(json)
    if (args.length > 1)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(args(1)), json + "\n")
  }
}
