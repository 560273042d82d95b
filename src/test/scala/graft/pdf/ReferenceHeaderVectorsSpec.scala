package graft.pdf.doc

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's header-validation vectors (reference:
  * src/document.rs:2902-2976): version M.m must be single digits,
  * major > 2 and 0.0 are rejected. One documented divergence stays:
  * the repo scans 1 KB for the magic (leading-garbage recovery
  * superset) where the reference requires byte 0. */
class ReferenceHeaderVectorsSpec extends AnyFunSuite {

  private def version(hdr: String): String = {
    // minimal loadable document: real header + one page
    val b = graft.pdf.testgen.PdfBuilder.singlePage(
      Seq(graft.pdf.testgen.PdfBuilder.Line(72, 700, 12, "F1", "x")))
    val body = new String(b, "ISO-8859-1")
    val patched = hdr + body.substring(body.indexOf('\n') + 1)
    // offsets shift with header length: recover via reconstruction is
    // not what we test — keep header length equal to "%PDF-1.4" (8)
    require(hdr.length == 8, "test headers must be 8 bytes")
    new PdfDocument(patched.getBytes("ISO-8859-1")).version
  }

  test("valid versions 1.0 / 1.4 / 1.7 / 2.0 accepted (document.rs:2902-2928)") {
    assert(version("%PDF-1.0") == "1.0")
    assert(version("%PDF-1.4") == "1.4")
    assert(version("%PDF-1.7") == "1.7")
    assert(version("%PDF-2.0") == "2.0")
  }

  test("unsupported 3.0 and 0.0 rejected (document.rs:2938-2951)") {
    intercept[PdfLoadException](version("%PDF-3.0"))
    intercept[PdfLoadException](version("%PDF-0.0"))
  }

  test("malformed versions rejected: no dot, non-digit (document.rs:2953-2976)") {
    intercept[PdfLoadException](version("%PDF-17\n"))
    intercept[PdfLoadException](version("%PDF-X.Y"))
  }

  test("no magic at all rejected (document.rs:2930-2936)") {
    intercept[PdfLoadException](
      new PdfDocument("NotAPDF at all, truly".getBytes("ISO-8859-1")))
  }

  test("circular references resolve to Null, never hang (document.rs:3018-3030 behavioralized)") {
    // 1 0 obj -> 2 0 R, 2 0 obj -> 1 0 R; catalog/pages valid
    val b = new graft.pdf.testgen.PdfBuilder()
    val catId = b.reserveId()  // 1? reserveId order: cat=1, pages=2
    val pagesId = b.reserveId()
    val c1 = b.addObject("4 0 R") // id 3 -> points at id 4
    val c2 = b.addObject("3 0 R") // id 4 -> points back at id 3
    val cId = b.addStream("", "BT /F1 12 Tf 72 700 Td (ok) Tj ET".getBytes("ISO-8859-1"), flate = false)
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 $f 0 R >> /Circular $c1 0 R >> /Contents $cId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    val doc = new PdfDocument(b.build(catId))
    assert(doc.resolve(graft.pdf.cos.PdfObj.Ref(c1, 0)) == graft.pdf.cos.PdfObj.Null)
    assert(doc.resolve(graft.pdf.cos.PdfObj.Ref(c2, 0)) == graft.pdf.cos.PdfObj.Null)
    // extraction still succeeds despite the circular resource entry
    val text = graft.pdf.PdfExtractor.extract(b.build(catId),
      graft.pdf.ConversionOptions()).text
    assert(text.contains("ok"))
  }

  test("leading garbage before the magic is recovered (documented superset)") {
    val b = graft.pdf.testgen.PdfBuilder.singlePage(
      Seq(graft.pdf.testgen.PdfBuilder.Line(72, 700, 12, "F1", "hello")))
    val garbage = "JUNKJUNK\n".getBytes("ISO-8859-1")
    val combined = garbage ++ b
    // xref offsets are now shifted; the corrupt-recovery scan rebuilds
    val doc = new PdfDocument(combined)
    assert(doc.version == "1.4")
  }

  test("bogus %PDF- candidate inside leading garbage does not reject the real header") {
    val b = graft.pdf.testgen.PdfBuilder.singlePage(
      Seq(graft.pdf.testgen.PdfBuilder.Line(72, 700, 12, "F1", "hello")))
    // three garbage flavors ahead of the real header: malformed
    // version, unsupported version, and a dangling magic
    for (junk <- Seq("blah %PDF-junk blah\n", "x %PDF-9.9 y\n", "%PDF-\n%%zz\n")) {
      val doc = new PdfDocument(junk.getBytes("ISO-8859-1") ++ b)
      assert(doc.version == "1.4", s"junk prefix rejected the document: '$junk'")
      assert(graft.pdf.PdfExtractor.extract(junk.getBytes("ISO-8859-1") ++ b,
        graft.pdf.ConversionOptions()).text.contains("hello"))
    }
  }

  test("single bogus candidate still throws the first candidate's failure (parity)") {
    // only candidate malformed → invalid-format error, not "no header"
    val e1 = intercept[PdfLoadException](version("%PDF-X.Y"))
    assert(e1.getMessage.contains("invalid version"))
    // only candidate well-formed but unsupported → unsupported error
    val e2 = intercept[PdfLoadException](version("%PDF-3.0"))
    assert(e2.getMessage.contains("unsupported"))
  }
}
