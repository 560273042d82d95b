package graft.pdf

import java.nio.charset.StandardCharsets.ISO_8859_1
import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.testgen.PdfBuilder

/** T6 (FIXTURES.md §3): Tagged-PDF structure tree — MCIDs in
  * non-spatial order must drive plain-text reading order
  * (reference: src/structure modules, document.rs:1793-1892). */
class StructTreeSpec extends AnyFunSuite {

  private def taggedPdf(structOrder: Seq[Int]): Array[Byte] = {
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val pageId = b.reserveId()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val content =
      "BT /F1 12 Tf 100 700 Td /P <</MCID 0>> BDC (Top span) Tj EMC ET\n" +
      "BT /F1 12 Tf 100 680 Td /P <</MCID 1>> BDC (Bottom span) Tj EMC ET"
    val cId = b.addStream("", content.getBytes(ISO_8859_1), flate = false)
    val elems = structOrder.map { m =>
      b.addObject(s"<< /Type /StructElem /S /P /Pg $pageId 0 R /K $m >>")
    }
    val structRoot = b.addObject(
      s"<< /Type /StructTreeRoot /K [${elems.map(e => s"$e 0 R").mkString(" ")}] >>")
    b.addObjectAt(pageId, s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 $f 0 R >> >> /Contents $cId 0 R /StructParents 0 >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R " +
      s"/StructTreeRoot $structRoot 0 R /MarkInfo << /Marked true >> >>")
    b.build(catId)
  }

  test("T6: structure order == spatial order → same text") {
    val r = PdfExtractor.extract(taggedPdf(Seq(0, 1)))
    assert(r.text == "Top span\nBottom span", s"got: '${r.text}'")
  }

  test("T6: structure order reversed overrides spatial order for text") {
    val r = PdfExtractor.extract(taggedPdf(Seq(1, 0)))
    assert(r.text == "Bottom span\nTop span", s"got: '${r.text}'")
  }

  test("T6: untagged doc unaffected (no StructTreeRoot)") {
    val pdf = PdfBuilder.singlePage(Seq(
      PdfBuilder.Line(100, 700, 12, "F1", "Top span"),
      PdfBuilder.Line(100, 680, 12, "F1", "Bottom span")))
    assert(PdfExtractor.extract(pdf).text == "Top span\nBottom span")
  }
}
