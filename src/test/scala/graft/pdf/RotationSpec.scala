package graft.pdf

import java.nio.charset.StandardCharsets.ISO_8859_1
import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.testgen.PdfBuilder

/** /Rotate normalization: text written sideways in user space on a
  * rotated page must read top-to-bottom in display orientation. */
class RotationSpec extends AnyFunSuite {

  private def rotatedDoc(rotate: Int, content: String): Array[Byte] = {
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val cId = b.addStream("", content.getBytes(ISO_8859_1), flate = false)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Rotate $rotate /Resources << /Font << /F1 $f 0 R >> >> /Contents $cId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    b.build(catId)
  }

  test("Rotate 90: vertical user-space lines read in display order") {
    // text matrix [0 1 -1 0 x y] writes 90°-ccw-rotated text; on a
    // /Rotate 90 page it displays horizontally. Two 'lines' advance in
    // +x user space (columns) which is downward in display space.
    val content =
      "BT /F1 12 Tf 0 1 -1 0 100 100 Tm (display line one) Tj ET " +
      "BT /F1 12 Tf 0 1 -1 0 120 100 Tm (display line two) Tj ET"
    val r = PdfExtractor.extract(rotatedDoc(90, content))
    assert(r.text == "display line one\ndisplay line two", s"got: '${r.text}'")
  }

  test("Rotate 180: order flips back to logical") {
    // upside-down text: matrix [-1 0 0 -1 x y]; LOWER user-Y displays
    // on top after the 180 flip
    val content =
      "BT /F1 12 Tf -1 0 0 -1 500 120 Tm (second) Tj ET " +
      "BT /F1 12 Tf -1 0 0 -1 500 100 Tm (first) Tj ET"
    val r = PdfExtractor.extract(rotatedDoc(180, content))
    assert(r.text == "first\nsecond", s"got: '${r.text}'")
  }

  test("Rotate 0 unchanged") {
    val content = "BT /F1 12 Tf 100 700 Td (plain) Tj ET"
    assert(PdfExtractor.extract(rotatedDoc(0, content)).text == "plain")
  }
}
