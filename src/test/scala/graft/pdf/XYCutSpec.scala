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

  test("single dense block falls through to plain spatial sort") {
    val spans = (0 until 10).map(i => span(s"l$i", 72, 700 - 14f * i, seq = i)).toVector
    val order = XYCut.sortSpans(spans, mediaBox).map(_.text)
    assert(order == (0 until 10).map(i => s"l$i").toVector, order.toString)
  }
}
