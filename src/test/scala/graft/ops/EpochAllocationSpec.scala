package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Data-constrained epoch allocation ([[Sampling.epochAllocation]]):
  *  - hand-worked allocation incl. the FIRST-FIT-PREFIX stop: the
  *    first overflow ends the allocation even though a later smaller
  *    candidate would still fit (no back-filling — pinned);
  *  - budget exactly one pass → every source gets exactly 1 epoch;
  *  - exact budget accounting: sum(tokens_used) ≤ budget and adding
  *    the first rejected candidate would exceed it;
  *  - partitioning invariance.
  */
class EpochAllocationSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** doc with exactly n single-char tokens */
  private def docs(rows: Seq[(String, Int)], parts: Int = 4) = {
    val s = spark
    import s.implicits._
    rows.zipWithIndex.map { case ((src, n), i) =>
      (i.toLong, src, Seq.fill(n)("x").mkString(" "))
    }.toDF("doc_id", "source", "text").repartition(parts)
  }

  private def run(rows: Seq[(String, Int)], num: Long, den: Long,
                  parts: Int = 4) =
    Sampling.epochAllocation(docs(rows, parts), maxEpochs = 4,
      budgetNum = num, budgetDen = den)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("hand-worked allocation with first-overflow stop") {
    // tokens: a=10, b=6, c=2 (total 18); budget = 29 (num=29, den=18)
    // order: (1,a,10) cum 10 ok; (1,b,6) cum 16 ok; (1,c,2) cum 18 ok;
    // (2,a,10) cum 28 ok; (2,b,6) cum 34 OVERFLOW -> stop.
    // (2,c,2) would fit a remaining 1?? no: budget 29, cum after (2,a)
    // is 28, c costs 2 -> 30 > 29 anyway; use budget 31 to pin the
    // genuine skip: (2,b) cum 34 > 31 stops, though (2,c) cum'd at 30
    // would have fit under back-filling.
    val got = run(Seq(("a", 10), ("b", 6), ("c", 2)), 31L, 18L)
    assert(got("a") == ((10L, 2L, 20L, 10L + 5L)))
    assert(got("b") == ((6L, 1L, 6L, 6L)))
    assert(got("c") == ((2L, 1L, 2L, 2L)))
  }

  test("budget of exactly one pass gives every source one epoch") {
    val got = run(Seq(("a", 7), ("b", 5), ("c", 3)), 1L, 1L)
    assert(got.values.forall(_._2 == 1L))
    assert(got.values.map(_._3).sum == 15L)
  }

  test("a too-small budget zeroes the tail sources") {
    // budget = 15*2/5 = 6: order (1,a,7) cum 7 OVERFLOW immediately
    // -> nothing taken at all (first-fit-prefix, no back-fill)
    val got = run(Seq(("a", 7), ("b", 5), ("c", 3)), 2L, 5L)
    assert(got.values.forall(_._2 == 0L))
    assert(got.values.forall(_._4 == 0L))
  }

  test("partitioning invariance") {
    val rows = (0 until 12).map(i => (s"s$i", 3 + (i * 7) % 11))
    val a = run(rows, 12L, 5L, parts = 1)
    val b = run(rows, 12L, 5L, parts = 7)
    assert(a == b)
  }
}
