package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.layout.{CharMode, TableDetector}
import graft.pdf.layout.CharMode.TextChar
import graft.pdf.extract.{Rect, TextSpan}
import graft.pdf.convert.Html

/** Ports of the reference's own layout/converter test vectors
  * (reference: tests/test_layout.rs, tests/test_converters.rs) onto
  * this engine's APIs — same mock geometry, same expected behavior.
  * Reference tests marked #[ignore] there (reading-order/xy-cut tuning
  * TODOs) are not ported; tests that assert only containment are
  * asserted at least as strongly here.
  */
class ReferenceLayoutVectorsSpec extends AnyFunSuite {

  // test_layout.rs mock_char: bbox = (x, y, size*0.6, size)
  private def mockChar(c: Char, x: Float, y: Float, size: Float,
                       bold: Boolean = false): TextChar =
    TextChar(c.toString, x, y, size * 0.6f, size, size, bold)

  // test_converters.rs mock_word: chars at x + i*7.0, bbox w=8.0
  private def mockWord(text: String, x: Float, y: Float, size: Float,
                       bold: Boolean): Vector[TextChar] =
    text.zipWithIndex.map { case (c, i) =>
      TextChar(c.toString, x + i * 7.0f, y, 8.0f, size, size, bold)
    }.toVector

  // test_converters.rs mock_paragraph: words separated by len*7 + 20
  private def mockParagraph(text: String, x: Float, y: Float,
                            size: Float): Vector[TextChar] = {
    var curX = x
    text.split("\\s+").toVector.flatMap { w =>
      val chars = mockWord(w, curX, y, size, bold = false)
      curX += w.length * 7.0f + 20.0f
      chars
    }
  }

  private def span(text: String, x: Float, y: Float, size: Float,
                   bold: Boolean): TextSpan =
    TextSpan(text, Rect(x, y, x + text.length * size * 0.6f, y + size),
      if (bold) "Times-Bold" else "Times", size, bold, -1, 0)

  // -------- test_layout.rs ------------------------------------------

  test("cluster_chars_into_words_simple (test_layout.rs:113)") {
    val chars = Vector(
      mockChar('H', 0f, 0f, 12f), mockChar('i', 8f, 0f, 12f),
      mockChar('B', 50f, 0f, 12f), mockChar('y', 58f, 0f, 12f),
      mockChar('e', 66f, 0f, 12f))
    val clusters = CharMode.clusterCharsIntoWords(chars, 15f)
    assert(clusters.size == 2)
    val hi = clusters.find(_.contains(0)).get
    assert(hi.contains(0) && hi.contains(1))
    val bye = clusters.find(_.contains(2)).get
    assert(bye.contains(2) && bye.contains(3) && bye.contains(4))
  }

  test("cluster_words_into_lines_simple (test_layout.rs:141)") {
    def block(text: String, x: Float, y: Float) =
      CharMode.blockOf(text.zipWithIndex.map { case (c, i) =>
        mockChar(c, x + i * 12f * 0.6f, y, 12f)
      }.toVector)
    val words = Vector(
      block("Hello", 0f, 0f), block("World", 50f, 1f),
      block("Next", 0f, 30f), block("Line", 50f, 31f))
    val lines = CharMode.clusterWordsIntoLines(words, 5f)
    assert(lines.size == 2)
    val l1 = lines.find(_.contains(0)).get
    assert(l1.contains(0) && l1.contains(1))
    val l2 = lines.find(_.contains(2)).get
    assert(l2.contains(2) && l2.contains(3))
  }

  test("heading detection vectors (test_layout.rs:296) — H1/H2/H3/body/small") {
    // detect_headings levels map to the converters' tag table here
    val md = CharMode.convertPage(
      mockWord("Title", 0f, 90f, 24f, bold = true) ++
        mockWord("Subtitle", 0f, 50f, 18f, bold = true) ++
        mockWord("Background", 0f, 20f, 14f, bold = true) ++
        mockWord("Body", 0f, 0f, 12f, bold = false))
    assert(md.contains("# Title"))
    assert(md.contains("## Subtitle"))
    assert(md.contains("### Background"))
    assert(md.linesIterator.exists(_ == "Body")) // untagged
    // the "small" tier (8pt -> <small>) lives in the HTML tag table
    val html = Html.convertPage(Vector(span("Figure 1", 0f, 0f, 8f, bold = false)))
    assert(html.contains("<small>Figure 1</small>"))
  }

  test("table_detection_simple_grid (test_layout.rs:333)") {
    val blocks = for {
      (row, y) <- Vector(("1", 0f), ("2", 20f), ("3", 40f))
      (col, x) <- Vector(("A", 0f), ("B", 50f), ("C", 100f))
    } yield span(col + row, x, y, 12f, bold = false)
    val tables = TableDetector.detect(blocks)
    // reference tolerates empty; ours must find the 3x3
    assert(tables.nonEmpty)
    assert(tables.head.nRows >= 3 && tables.head.nCols >= 3)
  }

  test("table_detection_insufficient_data (test_layout.rs:361)") {
    val blocks = Vector(
      span("A", 0f, 0f, 12f, bold = false),
      span("B", 50f, 0f, 12f, bold = false))
    assert(TableDetector.detect(blocks).isEmpty)
  }

  test("empty inputs across all layout functions (test_layout.rs:423)") {
    assert(CharMode.clusterCharsIntoWords(Vector.empty, 10f).isEmpty)
    assert(CharMode.clusterWordsIntoLines(Vector.empty, 5f).isEmpty)
    assert(TableDetector.detect(Vector.empty).isEmpty)
    assert(CharMode.convertPage(Nil) == "")
    assert(Html.convertPage(Vector.empty) == "")
  }

  test("single-element inputs (test_layout.rs:443)") {
    assert(CharMode.clusterCharsIntoWords(Vector(mockChar('A', 0f, 0f, 12f)), 10f).size == 1)
    assert(CharMode.clusterWordsIntoLines(
      Vector(CharMode.blockOf(Vector(mockChar('S', 0f, 0f, 12f)))), 5f).size == 1)
    assert(TableDetector.detect(Vector(span("Single", 0f, 0f, 12f, bold = false))).isEmpty)
  }

  // -------- test_converters.rs --------------------------------------

  test("markdown_simple_document (test_converters.rs:52)") {
    val md = CharMode.convertPage(
      mockWord("Hello", 0f, 0f, 12f, bold = false) ++
        mockWord("World", 50f, 0f, 12f, bold = false))
    assert(md.contains("Hello") && md.contains("World"))
    assert(!md.contains('#'))
  }

  test("markdown_with_heading_detection (test_converters.rs:71)") {
    val md = CharMode.convertPage(
      mockWord("Title", 0f, 70f, 24f, bold = true) ++
        mockWord("Subtitle", 0f, 30f, 18f, bold = true) ++
        mockWord("Body", 0f, 0f, 12f, bold = false))
    assert(md.contains("Title") && md.contains("Subtitle") && md.contains("Body"))
    assert(md.contains("# Title") && md.contains("## Subtitle"))
  }

  test("markdown_multiline (test_converters.rs:94)") {
    val md = CharMode.convertPage(
      mockWord("Line", 0f, 20f, 12f, bold = false) ++
        mockWord("One", 35f, 20f, 12f, bold = false) ++
        mockWord("Line", 0f, 0f, 12f, bold = false) ++
        mockWord("Two", 35f, 0f, 12f, bold = false))
    // the reference's own assertion is contains("Line One") OR
    // contains("Line"): its TextBlock::from_chars concatenates word
    // chars without spaces ("word spacing is handled at markdown
    // level", text_block.rs:234), so the char-mode line renders as
    // "LineOne" there too — replicated exactly
    assert(md.contains("Line One") || md.contains("Line"))
    assert(md.contains("Line Two") || md.contains("Two"))
    assert(md.contains("LineOne") && md.contains("LineTwo")) // pin the actual shape
    assert(md.split("\n\n").length == 2)
  }

  test("markdown_paragraph + empty + single_character (test_converters.rs:286,321,337)") {
    val md = CharMode.convertPage(
      mockParagraph("This is a test paragraph with multiple words", 0f, 0f, 12f))
    assert(md.contains("This") && md.contains("test") && md.contains("paragraph"))
    assert(CharMode.convertPage(Vector.empty) == "")
    assert(CharMode.convertPage(Vector(mockChar('A', 0f, 0f, 12f))).contains("A"))
  }

  test("html_semantic_simple + single_character (test_converters.rs:167,350)") {
    val html = Html.convertPage(Vector(span("Hello", 0f, 0f, 12f, bold = false)))
    assert(html.contains("<p>Hello</p>"))
    assert(Html.convertPage(Vector(span("B", 0f, 0f, 12f, bold = false))).contains("B"))
  }

  test("html_semantic_with_heading (test_converters.rs:182)") {
    val html = Html.convertPage(Vector(
      span("Title", 0f, 40f, 24f, bold = true),
      span("Text", 0f, 0f, 12f, bold = false)))
    assert(html.contains("<h1>Title</h1>"))
    assert(html.contains("<p>Text</p>"))
  }

  test("html_semantic_escape (test_converters.rs:202)") {
    val html = Html.convertPage(Vector(span("<>&", 0f, 0f, 12f, bold = false)))
    assert(html.contains("&lt;") && html.contains("&gt;") && html.contains("&amp;"))
  }

  test("escape_html direct vectors (html.rs:43-51)") {
    assert(Html.escape("Hello") == "Hello")
    assert(Html.escape("AT&T") == "AT&amp;T")
    assert(Html.escape("<div>") == "&lt;div&gt;")
    assert(Html.escape("\"quoted\"") == "&quot;quoted&quot;")
    assert(Html.escape("'apostrophe'") == "&#x27;apostrophe&#x27;")
    assert(Html.escape("<b>&\"'</b>") == "&lt;b&gt;&amp;&quot;&#x27;&lt;/b&gt;")
  }

  test("html_layout basic/multiple/css_structure (test_converters.rs:226,246,266)") {
    val html = Html.convertPage(Vector(
      span("First", 10f, 20f, 12f, bold = false),
      span("Second", 10f, 50f, 12f, bold = false)), preserveLayout = true)
    assert(html.contains("First") && html.contains("Second"))
    assert(html.contains("top: 20px") && html.contains("top: 50px"))
    assert(html.contains("<style>") && html.contains(".page") && html.contains(".text"))
    assert(html.contains("<div class=\"page\">") && html.contains("</div>"))
  }

  test("comprehensive_document_conversion (test_converters.rs:386)") {
    val chars =
      mockWord("Document", 0f, 90f, 24f, bold = true) ++
        mockWord("Title", 70f, 90f, 24f, bold = true) ++
        mockWord("Section", 0f, 50f, 18f, bold = true) ++
        mockWord("One", 60f, 50f, 18f, bold = true) ++
        mockParagraph("This is the first paragraph of body text", 0f, 20f, 12f) ++
        mockParagraph("This is the second paragraph", 0f, 0f, 12f)
    val md = CharMode.convertPage(chars)
    assert(md.contains("Document") && md.contains("Section"))
    assert(md.contains("first") && md.contains("second"))
    val spans = Vector(
      span("Document Title", 0f, 90f, 24f, bold = true),
      span("Section One", 0f, 50f, 18f, bold = true),
      span("This is the first paragraph of body text", 0f, 20f, 12f, bold = false),
      span("This is the second paragraph", 0f, 0f, 12f, bold = false))
    val html = Html.convertPage(spans)
    assert(html.contains("Document") && html.contains("Section"))
    assert(html.contains("first") && html.contains("second"))
    assert(html.contains("<") && html.contains(">"))
  }

  test("heading classification thresholds (heading_detector.rs:228-290)") {
    import graft.pdf.convert.Markdown
    def md1(text: String, size: Float, bold: Boolean): String =
      Markdown.convertPage(Vector(span(text, 0f, 90f, size, bold))).trim
    assert(md1("Title", 24f, bold = true) == "# Title")          // H1
    assert(md1("Section", 18f, bold = true) == "## Section")     // H2
    assert(md1("Mid", 16f, bold = true) == "## Mid")             // 16-18pt bold is H2 too
    assert(md1("Subsection", 14f, bold = true) == "### Subsection") // H3
    // 14pt NON-bold is body (the "could be H3, default to body" rule)
    assert(md1("Ambiguous", 14f, bold = false) == "Ambiguous")
    assert(md1("Regular text", 12f, bold = false) == "Regular text")
    // small text renders as body (no Small tier in markdown output)
    assert(md1("Footnote", 8f, bold = false) == "Footnote")
    // mixed document keeps every tier distinct
    val mixed = Markdown.convertPage(Vector(
      span("Main Title", 0f, 200f, 24f, bold = true),
      span("Introduction", 0f, 160f, 18f, bold = true),
      span("Background", 0f, 120f, 14f, bold = true),
      span("Lorem ipsum dolor", 0f, 80f, 12f, bold = false)))
    assert(mixed.contains("# Main Title"))
    assert(mixed.contains("## Introduction"))
    assert(mixed.contains("### Background"))
    assert(mixed.linesIterator.exists(_ == "Lorem ipsum dolor"))
  }
}
