package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.extract.{Rect, TextSpan}
import graft.pdf.layout.Hybrid
import graft.pdf.testgen.PdfBuilder

/** Hybrid complexity-routed layout dispatch (reference:
  * hybrid/smart_analyzer.rs + complexity_estimator.rs — mirrors the
  * reference's own estimator test expectations). */
class HybridSpec extends AnyFunSuite {

  private def span(x: Float, y: Float, w: Float = 100f, h: Float = 12f,
                   size: Float = 12f, font: String = "F1"): TextSpan =
    TextSpan(text = "t", bbox = Rect(x, y, x + w, y + h), fontName = font,
      fontSize = size, isBold = false, mcid = -1, sequence = 0)

  test("single-column uniform page scores Simple") {
    val blocks = (0 until 10).map(i => span(72f, 700f - 20f * i)).toVector
    assert(Hybrid.estimate(blocks, 612f, 792f) == Hybrid.Simple,
      Hybrid.complexityScore(blocks, 612f, 792f).toString)
  }

  test("multi-column page with font zoo scores at least Moderate") {
    // two wide-separated columns (gap > 20% page width) + 6 fonts +
    // scattered y positions
    val blocks = (0 until 12).map { i =>
      span(if (i % 2 == 0) 40f else 400f, 700f - 57f * (i / 2),
        size = 8f + 3f * (i % 5), font = s"F${i % 6}")
    }.toVector
    assert(Hybrid.estimate(blocks, 612f, 792f) >= Hybrid.Moderate,
      Hybrid.complexityScore(blocks, 612f, 792f).toString)
  }

  test("complexity ordering is total: Simple < Moderate < Complex") {
    assert(Hybrid.Simple < Hybrid.Moderate && Hybrid.Moderate < Hybrid.Complex)
  }

  test("dispatch: simple page takes the classical sort order") {
    val blocks = Vector(span(72f, 600f), span(72f, 700f), span(200f, 700f))
    val mb = Array(0.0, 0.0, 612.0, 792.0)
    val ordered = Hybrid.readingOrder(blocks, mb)
    // top (y=700) lines first, left before right, lower line last
    assert(ordered.map(b => (b.bbox.y0, b.bbox.x0)) ==
      Vector((700f, 72f), (700f, 200f), (600f, 72f)), ordered.map(_.bbox).toString)
  }

  test("dispatch: two-column page routes to the XY-Cut path (column-major order)") {
    // two tight columns, wide gutter — classical sort would interleave
    // rows (L1 R1 L2 R2…); the XY-Cut path reads column-major
    val left = (0 until 8).map(i => span(40f, 700f - 20f * i, w = 150f))
    val right = (0 until 8).map(i => span(420f, 700f - 20f * i, w = 150f))
    val blocks = scala.util.Random.shuffle(left ++ right).toVector
    val mb = Array(0.0, 0.0, 612.0, 792.0)
    assert(Hybrid.estimate(blocks, 612f, 792f) >= Hybrid.Moderate)
    val ordered = Hybrid.readingOrder(blocks, mb)
    val xs = ordered.map(_.bbox.x0)
    // column-major: all lefts before all rights
    assert(xs.take(8).forall(_ == 40f) && xs.drop(8).forall(_ == 420f),
      xs.toString)
  }

  test("end-to-end: Hybrid markdown mode extracts a simple doc identically to default") {
    val pdf = PdfBuilder.singlePage(Seq(
      PdfBuilder.Line(72f, 720f, 18f, "F2", "Heading"),
      PdfBuilder.Line(72f, 680f, 11f, "F1", "plain body line one"),
      PdfBuilder.Line(72f, 660f, 11f, "F1", "plain body line two")))
    val default = PdfExtractor.extract(pdf,
      ConversionOptions(markdownMode = ReadingOrderMode.TopToBottomLeftToRight))
    val hybrid = PdfExtractor.extract(pdf,
      ConversionOptions(markdownMode = ReadingOrderMode.Hybrid))
    assert(hybrid.markdown.nonEmpty)
    assert(hybrid.markdown == default.markdown,
      s"hybrid=${hybrid.markdown}\ndefault=${default.markdown}")
  }
}
