package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 scale-stress harness (VERDICT r5 "next round" #3): drive the
  * operators RESTRUCTURED this round on inputs ~10-25x the driver's
  * sf0.1, above every size gate, and check them against independent
  * driver-side references or partitioning invariance. In particular:
  * the bench corpus now sits UNDER stronglyConnected's upfront
  * driver-solve gate, so the distributed FW-BW path no longer runs in
  * graft.Bench — this harness is where it is exercised at a size the
  * gate cannot swallow. Not part of the measured surface; results are
  * cited in OPTIMIZATION_r06.md.
  *
  * Usage: sbt "runMain graft.ScaleStress [nDocs]"   (default 120000)
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(120000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def check(name: String)(ok: => Boolean): Unit = {
      val t0 = System.nanoTime()
      val pass = ok
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[stress] $name%-42s ${if (pass) "PASS" else "FAIL"} ($dt%.1f s)")
      require(pass, s"scale-stress check failed: $name")
    }

    // ---- corpus: the web_scc edge shape at ~24x the sf0.1 edge count
    val docs = spark.range(0L, n, 1L, 32)
      .select(col("id").as("doc_id"),
        concat(lit("stress doc "), col("id").cast("string")).as("text"))
    val edges = graft.ops.WebGraph.extractAnchors(
      graft.ops.WebGraph.syntheticWeb(docs, n))
    val ids = edges.select(
        regexp_extract(col("src"), "doc([0-9]+)$", 1).cast("long").as("src_id"),
        regexp_extract(col("dst"), "doc([0-9]+)$", 1).cast("long").as("dst_id"))
      .where((col("src_id") + col("dst_id")) % 3 =!= 0)
      .localCheckpoint(false)
    val nEdges = ids.count()
    println(s"[stress] nDocs=$n nEdges=$nEdges (gate=200000)")
    require(nEdges > 200000L,
      "stress graph must exceed the SCC driver gate to exercise the distributed path")

    // ---- SCC: distributed FW-BW trim+coloring (gate=0 forbids the
    // driver finish entirely) vs the upfront driver Kosaraju (gate=max)
    // — two INDEPENDENT algorithms must agree exactly at a size the
    // bench never reaches.
    def sccSet(gate: Long) =
      graft.ops.WebGraph.stronglyConnected(ids, driverEdgeGate = gate)
        .as[(Long, Long, Long)].collect().toSet
    var distributed: Set[(Long, Long, Long)] = null
    var driverSide: Set[(Long, Long, Long)] = null
    check("scc distributed == driver Kosaraju") {
      distributed = sccSet(0L)
      driverSide = sccSet(Long.MaxValue)
      distributed == driverSide && distributed.nonEmpty
    }

    // ---- BFS depth: the barrier-free lazy chain vs a driver BFS
    val seeds = docs.filter(col("doc_id") < 10)
      .select(concat(lit("https://host"), (col("doc_id") % 13).cast("string"),
        lit(".example/doc"), col("doc_id").cast("string")).as("url"))
    check("crawlDepth == driver BFS") {
      val got = graft.ops.WebGraph.crawlDepth(
          edges.select(col("src"), col("dst")), seeds, maxDepth = 10)
        .as[(String, Int)].collect().toMap
      val es = edges.select(col("src"), col("dst"))
        .as[(String, String)].collect()
      val adj = es.groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }
      val s0 = seeds.as[String].collect()
      val dist = scala.collection.mutable.Map[String, Int]()
      var frontier = s0.toSet
      frontier.foreach(u => dist(u) = 0)
      var d = 0
      while (d < 10 && frontier.nonEmpty) {
        d += 1
        val next = frontier.iterator
          .flatMap(u => adj.getOrElse(u, Array.empty[String]))
          .filterNot(dist.contains).toSet
        next.foreach(u => dist(u) = d)
        frontier = next
      }
      got == dist.toMap
    }

    // ---- integer fixed points + peeling: bit-exact partitioning
    // invariance at stress size (the sparse-HITS and batched-kCore
    // rewrites must not introduce any order dependence)
    def inv(name: String)(f: DataFrame => DataFrame): Unit =
      check(s"$name partition-invariant") {
        val a = f(ids.repartition(3)).collect().map(_.toString).sorted
        val b = f(ids.repartition(29)).collect().map(_.toString).sorted
        a.sameElements(b) && a.nonEmpty
      }
    val urls = ids.select(col("src_id").cast("string").as("src"),
      col("dst_id").cast("string").as("dst"))
    inv("hitsInt")(e => graft.ops.WebGraph.hitsInt(
      e.select(col("src_id").cast("string").as("src"),
        col("dst_id").cast("string").as("dst")), iterations = 3))
    inv("pageRankInt")(e => graft.ops.WebGraph.pageRankInt(
      e.select(col("src_id").cast("string").as("src"),
        col("dst_id").cast("string").as("dst")), iterations = 3))
    inv("kCore")(e => graft.ops.WebGraph.kCore(
      e.select(col("src_id").cast("string").as("src"),
        col("dst_id").cast("string").as("dst")), k = 3))
    check("kCore core_deg >= k") {
      graft.ops.WebGraph.kCore(urls, k = 3)
        .agg(min(col("core_deg"))).collect()(0).getLong(0) >= 3L
    }

    // ---- suffix ranking at 4x the sf0.1 corpus (the radix-4 chain +
    // round-0 checkpoint): partitioning invariance of the census
    val textDocs = spark.range(0L, 20000L, 1L, 32)
      .select(col("id").as("doc_id"),
        concat(lit("abra cadabra stress "),
          (col("id") % 97).cast("string"), lit(" tail tail tail")).as("text"))
    check("repeatSpectrum partition-invariant") {
      val a = graft.ops.SuffixRank.repeatSpectrum(textDocs.repartition(2), 6)
        .collect().map(_.toString).sorted
      val b = graft.ops.SuffixRank.repeatSpectrum(textDocs.repartition(31), 6)
        .collect().map(_.toString).sorted
      a.sameElements(b) && a.length == 7
    }
    spark.catalog.clearCache()

    // ---- banding dedup at 4x docs: invariance of the capped pipeline.
    // The 97-distinct-text corpus produces ~2M duplicate pairs (a
    // deliberate mega-cluster stress) — compare an order-independent
    // in-Spark fingerprint, never collect the pair set to the driver.
    check("simhashNearDups partition-invariant") {
      def fp(parts: Int): (Long, Long) =
        graft.ops.Dedup.simhashNearDups(textDocs.repartition(parts), maxDist = 8)
          .agg(count(lit(1)),
            coalesce(bit_xor(xxhash64(col("a_id"), col("b_id"), col("hamming"))), lit(0L)))
          .as[(Long, Long)].collect()(0)
      val a = fp(2)
      val b = fp(31)
      a == b && a._1 > 0L
    }
    println("[stress] ALL PASS")
    spark.stop()
  }
}
