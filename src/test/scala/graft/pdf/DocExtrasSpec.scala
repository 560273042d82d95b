package graft.pdf

import java.nio.charset.StandardCharsets.ISO_8859_1
import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.doc.{DocExtras, PdfDocument}
import graft.pdf.testgen.PdfBuilder

/** Secondary extracts: outlines (PDFDoc + UTF-16BE titles),
  * annotations, AcroForm fields. */
class DocExtrasSpec extends AnyFunSuite {

  test("doc-string decode: UTF-16BE BOM and PDFDocEncoding specials") {
    val utf16 = Array[Byte](0xfe.toByte, 0xff.toByte, 0x00, 'H', 0x00, 'i')
    assert(DocExtras.decodeDocString(utf16) == "Hi")
    val pdfdoc = Array[Byte]('A', 0x85.toByte, 'B') // 0x85 = endash
    assert(DocExtras.decodeDocString(pdfdoc) == "A–B")
  }

  private def docWithExtras(): Array[Byte] = {
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val cId = b.addStream("", "BT /F1 12 Tf 100 700 Td (Body) Tj ET".getBytes(ISO_8859_1), flate = false)
    // annotation
    val annotId = b.addObject("<< /Type /Annot /Subtype /Text /Rect [10 10 50 50] /Contents (A note) >>")
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 $f 0 R >> >> /Contents $cId 0 R /Annots [$annotId 0 R] >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    // outline: root → ch1 (→ ch1a), ch2
    val outlinesId = b.reserveId()
    val ch1 = b.reserveId()
    val ch1a = b.reserveId()
    val ch2 = b.reserveId()
    b.addObjectAt(ch1a, s"<< /Title (Section 1.1) /Parent $ch1 0 R >>")
    b.addObjectAt(ch1, s"<< /Title (Chapter 1) /Parent $outlinesId 0 R /Next $ch2 0 R /First $ch1a 0 R /Last $ch1a 0 R >>")
    b.addObjectAt(ch2, s"<< /Title (Chapter 2) /Parent $outlinesId 0 R /Prev $ch1 0 R >>")
    b.addObjectAt(outlinesId, s"<< /Type /Outlines /First $ch1 0 R /Last $ch2 0 R /Count 3 >>")
    // AcroForm: parent group with two kids
    val f1 = b.reserveId()
    val k1 = b.reserveId()
    val k2 = b.reserveId()
    b.addObjectAt(k1, s"<< /T (first) /FT /Tx /V (Ada) /Parent $f1 0 R >>")
    b.addObjectAt(k2, s"<< /T (last) /FT /Tx /V (Lovelace) /Parent $f1 0 R >>")
    b.addObjectAt(f1, s"<< /T (name) /Kids [$k1 0 R $k2 0 R] >>")
    val acro = b.addObject(s"<< /Fields [$f1 0 R] >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R " +
      s"/Outlines $outlinesId 0 R /AcroForm $acro 0 R >>")
    b.build(catId)
  }

  test("outline tree pre-order with levels") {
    val doc = new PdfDocument(docWithExtras())
    val o = DocExtras.outline(doc)
    assert(o == Vector(
      DocExtras.OutlineItem("Chapter 1", 0),
      DocExtras.OutlineItem("Section 1.1", 1),
      DocExtras.OutlineItem("Chapter 2", 0)), o.toString)
  }

  test("annotations with contents") {
    val doc = new PdfDocument(docWithExtras())
    val a = DocExtras.annotations(doc, doc.pages.head)
    assert(a == Vector(DocExtras.Annot("Text", "A note")))
  }

  test("link annotations: URI action, GoTo destination, named /Dest") {
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val cId = b.addStream("", "BT /F1 12 Tf 100 700 Td (links) Tj ET".getBytes(ISO_8859_1), flate = false)
    val uriA = b.addObject("<< /Type /Annot /Subtype /Link /Rect [0 0 100 20] " +
      "/A << /S /URI /URI (https://example.com/page) >> >>")
    val pageId = b.reserveId()
    val gotoA = b.addObject(s"<< /Type /Annot /Subtype /Link /Rect [0 30 100 50] " +
      s"/A << /S /GoTo /D [$pageId 0 R /XYZ 0 792 0] >> >>")
    val namedA = b.addObject("<< /Type /Annot /Subtype /Link /Rect [0 60 100 80] " +
      "/Dest /Section2 >>")
    b.addObjectAt(pageId, s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 $f 0 R >> >> /Contents $cId 0 R " +
      s"/Annots [$uriA 0 R $gotoA 0 R $namedA 0 R] >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    val doc = new PdfDocument(b.build(catId))
    val a = DocExtras.annotations(doc, doc.pages.head)
    assert(a.length == 3, a.toString)
    assert(a(0).uri == "https://example.com/page" && a(0).actionType == "URI", a(0).toString)
    assert(a(1).dest == s"page:$pageId XYZ" && a(1).actionType == "GoTo", a(1).toString)
    assert(a(2).dest == "named:Section2", a(2).toString)
  }

  test("image XObject inventory (metadata only)") {
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val imgData = Array.fill[Byte](120)(0x55)
    val imgId = b.addStream("/Type /XObject /Subtype /Image /Width 4 /Height 5 " +
      "/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode ", imgData, flate = false)
    val cId = b.addStream("", "BT /F1 12 Tf 100 700 Td (With image) Tj ET q 10 0 0 10 50 50 cm /Im1 Do Q".getBytes(ISO_8859_1), flate = false)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 $f 0 R >> /XObject << /Im1 $imgId 0 R >> >> /Contents $cId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    val doc = new PdfDocument(b.build(catId))
    val imgs = DocExtras.images(doc, doc.pages.head)
    assert(imgs == Vector(DocExtras.ImageInfo("Im1", 4, 5, "DCTDecode", 120)), imgs.toString)
    // text extraction unaffected; image Do is skipped
    assert(PdfExtractor.extract(b.build(catId)).text == "With image")
  }

  test("form fields flattened with dotted names") {
    val doc = new PdfDocument(docWithExtras())
    val ff = DocExtras.formFields(doc)
    assert(ff.toSet == Set(
      DocExtras.FormField("name.first", "Ada", "Tx"),
      DocExtras.FormField("name.last", "Lovelace", "Tx")), ff.toString)
  }
}
