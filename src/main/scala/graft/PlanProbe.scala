package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
/** Round-6 iteration probe: per-job wall times for one declared query
  * under Bench's session confs. Not part of the measured surface. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val names = args.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stageCount = new java.util.concurrent.atomic.AtomicInteger()
    val jobCount = new java.util.concurrent.atomic.AtomicInteger()
    val jobNanos = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet()
        starts.put(js.jobId, System.nanoTime())
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = starts.getOrDefault(je.jobId, 0L)
        val dt = (System.nanoTime()-t0)/1e9
        jobNanos.addAndGet((dt*1e9).toLong)
        if (dt > 0.15) lines.add(f"job ${je.jobId}%3d ${dt}%6.2f s")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stageCount.incrementAndGet(); ()
      }
    })
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () } // warmup
      spark.catalog.clearCache()
      Thread.sleep(200)
      lines.clear(); stageCount.set(0); jobCount.set(0); jobNanos.set(0L)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime()-t0)/1e9
      Thread.sleep(300)
      lines.forEach(l => println(s"[probe] $name " + l))
      println(f"[probe] $name WALL $wall%.2f s, jobs=${jobCount.get}, stages=${stageCount.get}, inJobs=${jobNanos.get/1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
