package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.extract.{Rect, TextSpan}
import graft.pdf.layout.XYCut

/** XY-Cut segmentation on synthetic grid layouts — the case a single
  * global X-histogram cannot order correctly (reference:
  * src/layout/column_detector.rs). */
class XYCutSpec extends AnyFunSuite {

  private val mediaBox = Array(0.0, 0.0, 612.0, 792.0)

  private def span(tag: String, x: Float, y: Float, w: Float = 150f, seq: Int = 0) =
    TextSpan(tag, Rect(x, y, x + w, y + 12f), "F1", 12f, isBold = false, mcid = -1, sequence = seq)

  test("2x2 grid: top row (L,R) before bottom row (L,R)") {
    // two column-pairs separated by a wide horizontal band
    val spans = Vector(
      span("BR", 400, 200), span("TL", 72, 700), span("BL", 72, 200),
      span("TR", 400, 700),
      span("TL2", 72, 680), span("TR2", 400, 680),
      span("BL2", 72, 180), span("BR2", 400, 180))
    val order = XYCut.sortSpans(spans, mediaBox).map(_.text)
    val idx = order.zipWithIndex.toMap
    // top band fully precedes bottom band
    assert(Seq("TL", "TL2", "TR", "TR2").map(idx).max <
           Seq("BL", "BL2", "BR", "BR2").map(idx).min, order.toString)
    // within the top band, left column precedes right column
    assert(idx("TL2") < idx("TR"), order.toString)
    // within the bottom band, left column precedes right column
    assert(idx("BL2") < idx("BR"), order.toString)
  }

  test("full-width banner above two columns") {
    val spans = Vector(
      span("COL2a", 400, 600), span("BANNER", 72, 740, w = 460f),
      span("COL1a", 72, 600), span("COL1b", 72, 580), span("COL2b", 400, 580))
    val order = XYCut.sortSpans(spans, mediaBox).map(_.text)
    assert(order.head == "BANNER", order.toString)
    val idx = order.zipWithIndex.toMap
    assert(idx("COL1b") < idx("COL2a"), order.toString)
  }

  test("ColumnAware markdown mode drives XY-Cut ordering end-to-end") {
    import graft.pdf.testgen.PdfBuilder
    import graft.pdf.testgen.PdfBuilder.Line
    val left = (0 until 6).map(i => Line(72, 700 - 14 * i, 10, "F1", s"leftcol$i"))
    val right = (0 until 6).map(i => Line(400, 700 - 14 * i, 10, "F1", s"rightcol$i"))
    val pdf = PdfBuilder.singlePage(left.zip(right).flatMap { case (l, r) => Seq(r, l) })
    val md = PdfExtractor.extract(pdf,
      ConversionOptions(markdownMode = ReadingOrderMode.ColumnAware)).markdown
    assert(md.indexOf("leftcol5") < md.indexOf("rightcol0"), md)
  }

  test("adaptive params: dense short-line grids get sharp sigma, sparse pages heavy") {
    import graft.pdf.layout.{AdaptiveLayoutParams, DocumentProperties}
    val page = Rect(0, 0, 612, 792)
    // dense: 20 rows x 3 narrow columns of 4-char words → ~12 chars/line
    val dense = (for (r <- 0 until 20; c <- 0 until 3)
      yield span("word", 60 + c * 178f, 700 - 15f * r, w = 130f)).toVector
    val dp = DocumentProperties.analyze(dense, page)
    assert(dp.avgCharsPerLine < 30f, dp.toString)
    assert(dp.columnCount == 3, dp.toString)
    assert(AdaptiveLayoutParams.fromProperties(dp).gaussianSigma == 0.5)
    // sparse: 5 long single-column lines → heavy smoothing
    val sparse = (0 until 5).map(i =>
      span("x" * 80, 72, 700 - 20f * i, w = 468f)).toVector
    val sp = DocumentProperties.analyze(sparse, page)
    assert(sp.avgCharsPerLine >= 60f, sp.toString)
    assert(AdaptiveLayoutParams.fromProperties(sp).gaussianSigma == 2.5)
  }

  test("adaptive sigma segments a dense narrow-gap grid that fixed sigma=2 misses") {
    // 3 columns (130pt wide) with ~29pt gaps: σ=2 smears the 3-bin
    // valleys above the cut threshold → row-major interleave; the
    // analyzer sees ~12 chars/line → σ=0.5 → clean column-major order
    // (reference behavior: document_analyzer.rs gaussian_sigma fix #2)
    val grid = (for (r <- 0 until 20; c <- 0 until 3)
      yield span(s"c${c}r$r", 60 + c * 178f, 700 - 15f * r, w = 130f, seq = r * 3 + c)).toVector
    val fixed = XYCut.sortSpans(grid, mediaBox).map(_.text)
    val adaptive = XYCut.sortSpansAdaptive(grid, mediaBox).map(_.text)
    val idxA = adaptive.zipWithIndex.toMap
    // adaptive: every column-0 span precedes every column-1 span, etc.
    assert((0 until 20).map(r => idxA(s"c0r$r")).max <
           (0 until 20).map(r => idxA(s"c1r$r")).min, adaptive.toString)
    assert((0 until 20).map(r => idxA(s"c1r$r")).max <
           (0 until 20).map(r => idxA(s"c2r$r")).min, adaptive.toString)
    // fixed σ=2 fails to find the narrow valleys → row-major interleave
    val idxF = fixed.zipWithIndex.toMap
    assert(idxF("c1r0") < idxF("c0r19"),
      s"fixed-sigma unexpectedly segmented the grid: $fixed")
  }

  test("graph-based reading order (Kahn toposort) handles lines and columns") {
    import graft.pdf.extract.ReadingOrder
    // same line: left before right despite input order
    val line = Vector(span("b", 300, 700), span("a", 72, 700))
    assert(ReadingOrder.graphOrder(line).map(_.text) == Vector("a", "b"))
    // different lines: top before bottom
    val mixed = Vector(span("low", 72, 100), span("high", 72, 700),
      span("mid-right", 300, 400), span("mid-left", 72, 400))
    assert(ReadingOrder.graphOrder(mixed).map(_.text) ==
      Vector("high", "mid-left", "mid-right", "low"))
    // single span / empty are identity
    assert(ReadingOrder.graphOrder(Vector(span("x", 0, 0))).map(_.text) == Vector("x"))
    assert(ReadingOrder.graphOrder(Vector.empty).isEmpty)
  }

  test("single dense block falls through to plain spatial sort") {
    val spans = (0 until 10).map(i => span(s"l$i", 72, 700 - 14f * i, seq = i)).toVector
    val order = XYCut.sortSpans(spans, mediaBox).map(_.text)
    assert(order == (0 until 10).map(i => s"l$i").toVector, order.toString)
  }
}
