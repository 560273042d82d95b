package graft.pdf

import java.nio.charset.StandardCharsets.ISO_8859_1
import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.doc.PdfDocument
import graft.pdf.extract.TextExtractor
import graft.pdf.testgen.PdfBuilder

/** Per-span fill color from the rg/g/k + cs/sc/scn operator family
  * (reference: src/extractors/text.rs:1396-1604 executes the full set
  * and stamps fill color on every emitted char, text.rs:2522-2558). */
class SpanColorSpec extends AnyFunSuite {

  private def pdfWithContent(content: String): Array[Byte] = {
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val cId = b.addStream("", content.getBytes(ISO_8859_1), flate = false)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 $f 0 R >> >> /Contents $cId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    b.build(catId)
  }

  private def spansOf(content: String) = {
    val doc = new PdfDocument(pdfWithContent(content))
    new TextExtractor(doc).extractRaw(doc.pages.head)
      .map(s => s.text -> s.color).toMap
  }

  test("rg / g / k stamp fill color on spans") {
    val colors = spansOf(
      """BT /F1 12 Tf
        |1 0 0 1 72 700 Tm 1 0 0 rg (red) Tj
        |1 0 0 1 72 680 Tm 0.5 g (gray) Tj
        |1 0 0 1 72 660 Tm 0 0 0 1 k (cmyk-black) Tj
        |ET""".stripMargin)
    assert(colors("red") == ((1f, 0f, 0f)))
    assert(colors("gray") == ((0.5f, 0.5f, 0.5f)))
    assert(colors("cmyk-black") == ((0f, 0f, 0f)))
  }

  test("default color is black; q/Q restores the outer color") {
    val colors = spansOf(
      """BT /F1 12 Tf 1 0 0 1 72 700 Tm (plain) Tj ET
        |q 0 1 0 rg BT /F1 12 Tf 1 0 0 1 72 680 Tm (green) Tj ET Q
        |BT /F1 12 Tf 1 0 0 1 72 660 Tm (after) Tj ET""".stripMargin)
    assert(colors("plain") == ((0f, 0f, 0f)))
    assert(colors("green") == ((0f, 1f, 0f)))
    assert(colors("after") == ((0f, 0f, 0f)))
  }

  test("cs + scn interpret components in the selected space") {
    val colors = spansOf(
      """BT /F1 12 Tf
        |/DeviceRGB cs 0 0 1 scn 1 0 0 1 72 700 Tm (blue) Tj
        |/DeviceGray cs 0.25 scn 1 0 0 1 72 680 Tm (dim) Tj
        |/DeviceCMYK cs 0 1 1 0 scn 1 0 0 1 72 660 Tm (cmyk-red) Tj
        |ET""".stripMargin)
    assert(colors("blue") == ((0f, 0f, 1f)))
    assert(colors("dim") == ((0.25f, 0.25f, 0.25f)))
    assert(colors("cmyk-red") == ((1f, 0f, 0f)))
  }

  test("stroke family RG/G/K is executed without disturbing fill color") {
    val colors = spansOf(
      """BT /F1 12 Tf
        |1 0 0 rg 0 0 1 RG 0.5 G 0 0 0 1 K
        |1 0 0 1 72 700 Tm (still-red) Tj
        |ET""".stripMargin)
    assert(colors("still-red") == ((1f, 0f, 0f)))
  }

  test("cs resets color to black until components arrive") {
    val colors = spansOf(
      """BT /F1 12 Tf
        |1 0 0 rg /DeviceRGB cs
        |1 0 0 1 72 700 Tm (reset) Tj
        |ET""".stripMargin)
    assert(colors("reset") == ((0f, 0f, 0f)))
  }
}
