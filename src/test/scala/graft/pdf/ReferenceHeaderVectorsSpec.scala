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

  test("leading garbage before the magic is recovered (documented superset)") {
    val b = graft.pdf.testgen.PdfBuilder.singlePage(
      Seq(graft.pdf.testgen.PdfBuilder.Line(72, 700, 12, "F1", "hello")))
    val garbage = "JUNKJUNK\n".getBytes("ISO-8859-1")
    val combined = garbage ++ b
    // xref offsets are now shifted; the corrupt-recovery scan rebuilds
    val doc = new PdfDocument(combined)
    assert(doc.version == "1.4")
  }
}
