package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Training-data ops on controlled inputs: known duplicates, planted
  * near-dups, clustered embeddings. */
class OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src0' AS source",
        "length(text) AS n_chars")
  }

  private val base = "the quick brown fox jumps over the lazy dog and then runs far away into the green forest tonight"

  test("exact dedup keeps min doc_id per text") {
    val d = docs(1L -> "aaa", 2L -> "bbb", 3L -> "aaa", 4L -> "aaa")
    val out = Dedup.exact(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L))
  }

  test("minhash LSH finds planted near-dup, not the unrelated doc") {
    val nearDup = base.replace("tonight", "today") // 1-token change
    val other = "completely different content about spark query engines and columnar storage formats with nothing shared"
    val d = docs(1L -> base, 2L -> nearDup, 3L -> other)
    val pairs = Dedup.minhashLsh(d, threshold = 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"missing planted pair, got $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"false positive with 3: $pairs")
  }

  test("minhashVerified confirms with exact jaccard") {
    val nearDup = base.replace("tonight", "today")
    val d = docs(1L -> base, 2L -> nearDup)
    val rows = Dedup.minhashVerified(d).collect()
    assert(rows.length == 1)
    val j = rows(0).getDouble(2)
    assert(j > 0.8 && j < 1.0, s"jaccard $j")
  }

  test("simhash near-dups: hamming small for near-identical, large for unrelated") {
    val d = docs(1L -> base, 2L -> base.replace("tonight", "today"),
      3L -> "utterly unrelated words describing medieval architecture and gothic cathedrals of europe entirely")
    val sh = Dedup.simhash(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(3L)),
      s"near-dup hamming ${hamming(sh(1L), sh(2L))} !< unrelated ${hamming(sh(1L), sh(3L))}")
  }

  test("brute-force ANN: nearest neighbor of a cluster member is in-cluster") {
    val s = spark
    import s.implicits._
    // two tight clusters around orthogonal axes
    def vec(axis: Int, jitter: Float): Array[Float] = {
      val v = new Array[Float](8)
      v(axis) = 1f
      v((axis + 1) % 8) = jitter
      v
    }
    val emb = Seq(
      (0L, vec(0, 0.01f), 0), (1L, vec(0, 0.02f), 0), (2L, vec(0, 0.03f), 0),
      (10L, vec(4, 0.01f), 1), (11L, vec(4, 0.02f), 1), (12L, vec(4, 0.03f), 1)
    ).toDF("vec_id", "embedding", "label")
    val top1 = Similarity.bruteForceTopK(emb, emb.filter("vec_id = 0"), k = 1).collect()
    assert(top1.length == 1)
    assert(Set(1L, 2L).contains(top1(0).getLong(1)), top1.mkString)
    // LSH variant agrees on this easy case
    val lsh1 = Similarity.lshTopK(emb, emb.filter("vec_id = 0"), k = 1, dim = 8)
      .collect()
    assert(lsh1.length == 1 && Set(1L, 2L).contains(lsh1(0).getLong(1)), lsh1.mkString)
  }

  test("langId identifies obvious English and German") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "the cat is on the mat and the dog is in the house with the family", "en"),
      (2L, "der Hund ist im Haus und die Katze ist auf der Matte mit der Familie", "de"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langId(d).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "en", out.toString)
    assert(out(2L) == "de", out.toString)
  }

  test("fingerprint is deterministic and text-sensitive") {
    // min-sampled rolling hash: stable for identical text (and robust
    // to small appends BY DESIGN); different content → different value
    val d1 = docs(1L -> base, 2L -> base,
      3L -> "entirely different material with no shared sixteen-char windows whatsoever here")
    val fp = TextAnalysis.fingerprint(d1).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("multimodal metadata sniffs pdf magic") {
    val s = spark
    import s.implicits._
    val pdf = graft.pdf.testgen.PdfBuilder.singlePage(
      Seq(graft.pdf.testgen.PdfBuilder.Line(100, 700, 12, "F1", "x")))
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a)
    val d = Seq((1L, pdf), (2L, png), (3L, "plain".getBytes)).toDF("doc_id", "payload")
    val m = Multimodal.metadata(d).collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(m == Map(1L -> "pdf", 2L -> "png", 3L -> "unknown"))
  }
}
