package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.layout.CharMode
import graft.pdf.layout.CharMode.TextChar
import graft.pdf.extract.{ReadingOrder, Rect, TextSpan}

/** Ports of the reference's reading_order.rs, clustering.rs and
  * text_block.rs inline test vectors (same mock geometry, same
  * expected orders). The reference's kahn_sort-on-a-raw-graph tests
  * are exercised behaviorally through graphOrder (our Kahn is private
  * to it); LayoutTree::Leaf/Node traversal is likewise internal to
  * XYCut and covered by XYCutSpec.
  */
class ReferenceReadingOrderVectorsSpec extends AnyFunSuite {

  // reading_order.rs mock_block: chars at x+i*10, bbox 10x12 each →
  // block bbox x0=x, y0=y, x1=x+len*10, y1=y+12
  private def mockBlock(text: String, x: Float, y: Float): TextSpan =
    TextSpan(text, Rect(x, y, x + text.length * 10f, y + 12f), "Times", 12f, false, -1, 0)

  private def order(spans: Vector[TextSpan]): Vector[String] =
    ReadingOrder.graphOrder(spans).map(_.text)

  // ---------------- reading_order.rs ------------------------------

  test("precedes: same line, left before right (reading_order.rs:52-59)") {
    val left = mockBlock("Left", 0f, 0f)
    val right = mockBlock("Right", 100f, 1f)
    assert(order(Vector(left, right)) == Vector("Left", "Right"))
    assert(order(Vector(right, left)) == Vector("Left", "Right"))
  }

  test("precedes: different lines, larger Y (top) first (reading_order.rs:61-70)") {
    val top = mockBlock("Top", 0f, 100f)
    val bottom = mockBlock("Bottom", 0f, 50f)
    assert(order(Vector(bottom, top)) == Vector("Top", "Bottom"))
    assert(order(Vector(top, bottom)) == Vector("Top", "Bottom"))
  }

  test("graph-based simple 2x2 grid reads A B C D (reading_order.rs:72-86)") {
    val blocks = Vector(
      mockBlock("A", 0f, 100f), mockBlock("B", 100f, 100f),
      mockBlock("C", 0f, 50f), mockBlock("D", 100f, 50f))
    assert(order(blocks) == Vector("A", "B", "C", "D"))
  }

  test("graph-based two columns: a top block first, all four kept (reading_order.rs:88-104)") {
    val blocks = Vector(
      mockBlock("Col1-Line1", 0f, 100f), mockBlock("Col1-Line2", 0f, 50f),
      mockBlock("Col2-Line1", 300f, 100f), mockBlock("Col2-Line2", 300f, 50f))
    val o = order(blocks)
    assert(o.length == 4)
    assert(o.head == "Col1-Line1" || o.head == "Col2-Line1")
    assert(o.toSet == blocks.map(_.text).toSet)
  }

  test("graph-based empty + single (reading_order.rs:139-150)") {
    assert(ReadingOrder.graphOrder(Vector.empty).isEmpty)
    assert(order(Vector(mockBlock("Single", 0f, 0f))) == Vector("Single"))
  }

  test("kahn behavioral: chain and diamond resolve in precedence order (reading_order.rs:106-137)") {
    // chain 0->1->2 as three stacked lines
    val chain = Vector(mockBlock("2", 0f, 0f), mockBlock("0", 0f, 60f), mockBlock("1", 0f, 30f))
    assert(order(chain) == Vector("0", "1", "2"))
    // diamond: one top, two middles (same line), one bottom — top
    // first, bottom last, middles keep left-to-right order
    val diamond = Vector(
      mockBlock("End", 0f, 0f), mockBlock("M2", 100f, 30f),
      mockBlock("Start", 0f, 60f), mockBlock("M1", 0f, 31f))
    assert(order(diamond) == Vector("Start", "M1", "M2", "End"))
  }

  // ---------------- clustering.rs ---------------------------------

  // clustering.rs mock_char: bbox 10x12 at (x, y)
  private def cChar(c: Char, x: Float, y: Float): TextChar =
    TextChar(c.toString, x, y, 10f, 12f, 12f, false)

  test("cluster_chars empty + single (clustering.rs:372-389)") {
    assert(CharMode.clusterCharsIntoWords(Vector.empty, 8f).isEmpty)
    val one = CharMode.clusterCharsIntoWords(Vector(cChar('A', 0f, 0f)), 8f)
    assert(one == Vector(Vector(0)))
  }

  test("cluster_chars_into_words: Hello / World gap split (clustering.rs:391-420)") {
    val chars = "Hello".zipWithIndex.map { case (c, i) => cChar(c, i * 11f, 0f) }.toVector ++
      "World".zipWithIndex.map { case (c, i) => cChar(c, 100f + i * 11f, 0f) }.toVector
    val clusters = CharMode.clusterCharsIntoWords(chars, 20f)
    assert(clusters.length == 2)
    assert((0 to 4).forall(clusters(0).contains))
    assert((5 to 9).forall(clusters(1).contains))
  }

  test("cluster_words empty + single (clustering.rs:422-438)") {
    assert(CharMode.clusterWordsIntoLines(Vector.empty).isEmpty)
    val one = CharMode.clusterWordsIntoLines(Vector(CharMode.blockOf(Vector(cChar('A', 0f, 0f)))))
    assert(one == Vector(Vector(0)))
  }

  test("cluster_words_into_lines: two lines of two words (clustering.rs:440-466)") {
    val words = Vector(
      CharMode.blockOf(Vector(cChar('H', 0f, 0f))),
      CharMode.blockOf(Vector(cChar('W', 50f, 1f))),
      CharMode.blockOf(Vector(cChar('F', 0f, 30f))),
      CharMode.blockOf(Vector(cChar('B', 50f, 31f))))
    val lines = CharMode.clusterWordsIntoLines(words)
    assert(lines.length == 2)
    assert(lines(0).contains(0) && lines(0).contains(1))
    assert(lines(1).contains(2) && lines(1).contains(3))
  }

  test("words sorted by x within a line (clustering.rs:468-482)") {
    val words = Vector(
      CharMode.blockOf(Vector(cChar('W', 40f, 0f))),
      CharMode.blockOf(Vector(cChar('H', 0f, 1f))))
    val lines = CharMode.clusterWordsIntoLines(words)
    assert(lines == Vector(Vector(1, 0)))
  }

  // ---------------- text_block.rs ---------------------------------

  test("TextBlock from_chars: text, avg font size, bold flag (text_block.rs:31-74)") {
    val hello = CharMode.blockOf("Hello".zipWithIndex.map { case (c, i) => cChar(c, i * 10f, 0f) }.toVector)
    assert(hello.text == "Hello")
    assert(hello.avgFontSize == 12f)
    assert(!hello.bold)

    val bold = CharMode.blockOf(
      TextChar("B", 0f, 0f, 10f, 12f, 12f, true) +:
        "old".zipWithIndex.map { case (c, i) => cChar(c, 10f + i * 10f, 0f) }.toVector)
    assert(bold.text == "Bold")
    assert(bold.bold) // any bold char marks the block bold
  }

  test("TextBlock center (text_block.rs:76-92)") {
    val b = CharMode.blockOf(Vector(TextChar("A", 0f, 0f, 100f, 50f, 12f, false)))
    assert((b.x + b.right) / 2f == 50f)
    assert((b.y + b.top) / 2f == 25f)
  }

  test("block alignment predicates (text_block.rs:94-126, via block geometry)") {
    val a = CharMode.blockOf(Vector(cChar('A', 0f, 0f)))
    val b = CharMode.blockOf(Vector(cChar('B', 50f, 2f)))
    val c = CharMode.blockOf(Vector(cChar('C', 100f, 20f)))
    def centerY(bl: CharMode.Block) = (bl.y + bl.top) / 2f
    def centerX(bl: CharMode.Block) = (bl.x + bl.right) / 2f
    // horizontally aligned = same row: |center y| within tol
    assert(math.abs(centerY(a) - centerY(b)) <= 5f)
    assert(math.abs(centerY(a) - centerY(c)) > 5f)
    // vertically aligned = same column: |center x| within tol
    val d = CharMode.blockOf(Vector(cChar('B', 2f, 50f)))
    val e = CharMode.blockOf(Vector(cChar('C', 20f, 100f)))
    assert(math.abs(centerX(a) - centerX(d)) <= 5f)
    assert(math.abs(centerX(a) - centerX(e)) > 5f)
  }

  // ---------------- geometry/mod.rs -------------------------------

  test("Rect vectors: from_points, edges, center, union (geometry/mod.rs tests)") {
    // reference Rect::from_points(10,20,110,70) → x=10,y=20,w=100,h=50
    val r = Rect(10f, 20f, 110f, 70f)
    assert(r.width == 100f && r.height == 50f)
    // center of (0,0,100,50)
    val c = Rect(0f, 0f, 100f, 50f)
    assert(c.centerX == 50f && (c.y0 + c.y1) / 2f == 25f)
    // union of (0,0)-(50,50) and (25,25)-(75,75)
    val u = Rect(0f, 0f, 50f, 50f).union(Rect(25f, 25f, 75f, 75f))
    assert(u == Rect(0f, 0f, 75f, 75f))
    // area analog
    assert(c.width * c.height == 5000f)
  }
}
