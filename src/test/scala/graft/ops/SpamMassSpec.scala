package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Spam mass ([[WebGraph.spamMass]]):
  *  - planted geometry: a link farm unreachable from the seed ring
  *    scores near 1000 permille, seed-ring pages score 0;
  *  - the arithmetic matches an independent JVM composition of the
  *    two collected rank tables (the components carry their own
  *    oracles);
  *  - bounds: 0 ≤ spam_mass_permille ≤ 1000 everywhere.
  */
class SpamMassSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("planted farm vs trusted ring, JVM replication, bounds") {
    val s = spark
    import s.implicits._
    // trusted ring t0->t1->t2->t0 (seeded at t0) + spam farm
    // f0..f3 all linking each other, no path from the ring
    val ring = Seq(("t0", "t1"), ("t1", "t2"), ("t2", "t0"))
    val farm = for {
      i <- 0 until 4; j <- 0 until 4 if i != j
    } yield (s"f$i", s"f$j")
    val edges = (ring ++ farm).toDF("src", "dst")
    val seeds = Seq("t0").toDF("url")
    val rows = WebGraph.spamMass(edges, seeds).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    rows.values.foreach { case (_, _, m) => assert(m >= 0 && m <= 1000) }
    // farm pages: zero trust -> mass ~1000 (integer floor can shave 1)
    (0 until 4).foreach { i =>
      assert(rows(s"f$i")._2 == 0L)
      assert(rows(s"f$i")._3 >= 999L)
    }
    // ring pages carry trust: mass far below farm
    Seq("t0", "t1", "t2").foreach { u => assert(rows(u)._3 <= 500L, u) }
    // independent composition from the collected component outputs
    val pr = WebGraph.pageRankInt(edges, 5).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tr = WebGraph.pageRankSeeded(edges, seeds, 5).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val div = 100000L
    val tp = pr.values.map(_ / div).sum
    val tt = tr.values.map(_ / div).sum
    rows.foreach { case (u, (prV, trV, m)) =>
      assert(prV == pr(u) && trV == tr(u))
      val p = prV / div; val t = trV / div
      val exp =
        if (p == 0 || p * tt <= t * tp) 0L
        else (p * tt - t * tp) * 1000 / (p * tt)
      assert(m == exp, u)
    }
  }
}
