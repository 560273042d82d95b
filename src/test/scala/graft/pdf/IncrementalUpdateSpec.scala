package graft.pdf

import java.nio.charset.StandardCharsets.ISO_8859_1
import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.testgen.PdfBuilder
import graft.pdf.testgen.PdfBuilder.Line

/** T3 (FIXTURES.md §3): /Prev-chained incremental update — the newest
  * xref section wins per object; untouched objects resolve through the
  * chain (reference: src/xref.rs /Prev handling). */
class IncrementalUpdateSpec extends AnyFunSuite {

  test("incremental update replaces the content stream") {
    // base doc: object layout from PdfBuilder.multiPage is
    // 1=catalog 2=pages 3,4=fonts 5=content 6=page
    val base = PdfBuilder.singlePage(Seq(Line(100, 700, 12, "F1", "Original text")))
    assert(PdfExtractor.extract(base).text == "Original text")
    val baseStr = new String(base, ISO_8859_1)
    val oldXref = baseStr.substring(baseStr.lastIndexOf("startxref") + 10).trim
      .takeWhile(_.isDigit).toLong

    // appended revision: replace object 5 with new content
    val newContent = "BT /F1 12 Tf 100 700 Td (Updated text) Tj ET"
    val sb = new StringBuilder(baseStr)
    val objOffset = sb.length
    sb.append(s"5 0 obj\n<< /Length ${newContent.length} >>\nstream\n$newContent\nendstream\nendobj\n")
    val xrefOffset = sb.length
    sb.append("xref\n0 1\n")
    sb.append(f"${0}%010d ${65535}%05d f \n")
    sb.append("5 1\n")
    sb.append(f"$objOffset%010d ${0}%05d n \n")
    sb.append(s"trailer\n<< /Size 8 /Root 1 0 R /Prev $oldXref >>\n")
    sb.append(s"startxref\n$xrefOffset\n%%EOF\n")
    val updated = sb.toString.getBytes(ISO_8859_1)

    val r = PdfExtractor.extract(updated)
    assert(r.text == "Updated text", s"got: '${r.text}'")
    assert(r.nPages == 1)
  }
}
