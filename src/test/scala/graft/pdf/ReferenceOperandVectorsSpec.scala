package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.testgen.PdfBuilder

/** Ports of the reference's operand-handling semantics for content
  * operators (reference: src/content/parser.rs:162-420 build_operator
  * + :551-575 get_number/get_integer/get_name accessors; the Table-A.1
  * validator at operators.rs:494-819 is DEAD CODE — no caller in the
  * crate — so runtime parity means the build_operator defaults):
  * operands are indexed POSITIONALLY from 0 and a missing or
  * wrong-typed slot takes a per-slot default. A malformed operand list
  * never drops the operator wholesale. Porting these found a real
  * divergence: the r4 VM guarded every case on full operand count, so
  * `100 Td` / bare `Tz` / `/F1 Tf` were silently ignored where the
  * reference executes them with defaults. */
class ReferenceOperandVectorsSpec extends AnyFunSuite {

  /** Raw spans (with geometry) for a single-page content stream —
    * plain-text output normalizes horizontal movement away, so the
    * positional assertions below need the span boxes. */
  private def spans(content: String): Vector[(String, Float, Float)] = {
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val cId = b.addStream("", content.getBytes("ISO-8859-1"), flate = false)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 $f 0 R >> >> /Contents $cId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    val d = new graft.pdf.doc.PdfDocument(b.build(catId))
    new graft.pdf.extract.TextExtractor(d).extract(d.pages.head)
      .map(s => (s.text, s.bbox.x0, s.bbox.x1))
  }

  /** Single page with a raw content stream over Helvetica /F1. */
  private def doc(content: String): String = {
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val cId = b.addStream("", content.getBytes("ISO-8859-1"), flate = false)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 $f 0 R >> >> /Contents $cId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    PdfExtractor.extract(b.build(catId), ConversionOptions()).text
  }

  test("Td with one operand: tx taken, ty defaults to 0 (parser.rs:167-171)") {
    val malformed = spans("BT /F1 12 Tf 1 0 0 1 72 700 Tm (A) Tj 100 Td (B) Tj ET")
    val explicit  = spans("BT /F1 12 Tf 1 0 0 1 72 700 Tm (A) Tj 100 0 Td (B) Tj ET")
    assert(malformed == explicit)
    // and it DID move: dropping the Td entirely leaves B right after A
    val dropped = spans("BT /F1 12 Tf 1 0 0 1 72 700 Tm (A) Tj (B) Tj ET")
    assert(malformed != dropped)
    // B's box starts 100pt into the line
    assert(malformed.exists { case (t, x0, _) => t.contains("B") && math.abs(x0 - 172f) < 1f },
      malformed.mkString(";"))
  }

  test("Td with a non-numeric slot 0: tx defaults, ty taken positionally (get_number None)") {
    val malformed = doc("BT /F1 12 Tf 1 0 0 1 72 700 Tm (A) Tj /X -50 Td (B) Tj ET")
    val explicit  = doc("BT /F1 12 Tf 1 0 0 1 72 700 Tm (A) Tj 0 -50 Td (B) Tj ET")
    assert(malformed == explicit)
  }

  test("Tm with three operands: remaining slots take identity defaults (parser.rs:177-185)") {
    val malformed = doc("BT /F1 12 Tf 2 0 0 Tm (Scaled) Tj ET")
    val explicit  = doc("BT /F1 12 Tf 2 0 0 1 0 0 Tm (Scaled) Tj ET")
    assert(malformed == explicit)
  }

  test("Tf without a size: 12pt default (parser.rs:240-244)") {
    val malformed = doc("BT /F1 Tf 1 0 0 1 72 700 Tm (Line one) Tj 0 -14 Td (Line two) Tj ET")
    val explicit  = doc("BT /F1 12 Tf 1 0 0 1 72 700 Tm (Line one) Tj 0 -14 Td (Line two) Tj ET")
    assert(malformed == explicit)
  }

  test("bare Tz resets horizontal scaling to 100 (parser.rs:228-231)") {
    // observable via span geometry: bb's advance doubles after the
    // reset vs staying at 50%
    val malformed = spans("BT /F1 12 Tf 1 0 0 1 72 700 Tm 50 Tz (aa) Tj Tz (bb) Tj ET")
    val explicit  = spans("BT /F1 12 Tf 1 0 0 1 72 700 Tm 50 Tz (aa) Tj 100 Tz (bb) Tj ET")
    assert(malformed == explicit)
    val still50 = spans("BT /F1 12 Tf 1 0 0 1 72 700 Tm 50 Tz (aa) Tj (bb) Tj ET")
    assert(malformed != still50)
  }

  test("quote with no operand still advances the line (Quote{text:\"\"} default)") {
    val malformed = doc("BT /F1 12 Tf 14 TL 1 0 0 1 72 700 Tm (A) Tj ' (B) Tj ET")
    val explicit  = doc("BT /F1 12 Tf 14 TL 1 0 0 1 72 700 Tm (A) Tj T* (B) Tj ET")
    assert(malformed == explicit)
    val noAdvance = doc("BT /F1 12 Tf 14 TL 1 0 0 1 72 700 Tm (A) Tj (B) Tj ET")
    assert(malformed != noAdvance)
  }

  test("double-quote with short operand list: spacings default, advance still happens") {
    val malformed = doc("BT /F1 12 Tf 14 TL 1 0 0 1 72 700 Tm (A) Tj \" (B) Tj ET")
    val explicit  = doc("BT /F1 12 Tf 14 TL 1 0 0 1 72 700 Tm (A) Tj 0 0 \" (B) Tj ET")
    assert(malformed == explicit)
  }

  test("bare Tc/Tw reset spacing to 0 (parser.rs:215-224)") {
    // 40pt char spacing splits the glyph run into separate words; the
    // bare Tc must reset that (equality with explicit 0 Tc)
    val malformed = doc("BT /F1 12 Tf 1 0 0 1 72 700 Tm 40 Tc (ab) Tj Tc (cd) Tj ET")
    val explicit  = doc("BT /F1 12 Tf 1 0 0 1 72 700 Tm 40 Tc (ab) Tj 0 Tc (cd) Tj ET")
    assert(malformed == explicit)
  }

  test("cm with short operand list multiplies the identity-defaulted matrix") {
    val malformed = doc("q 2 cm Q BT /F1 12 Tf 1 0 0 1 72 700 Tm (ok) Tj ET")
    val explicit  = doc("q 2 0 0 1 0 0 cm Q BT /F1 12 Tf 1 0 0 1 72 700 Tm (ok) Tj ET")
    assert(malformed == explicit)
    assert(malformed.contains("ok"))
  }

  test("well-formed streams are unaffected (guard the defaults change)") {
    val t = doc("BT /F1 12 Tf 1 0 0 1 72 700 Tm (Hello world) Tj 0 -14 Td (Second line) Tj ET")
    assert(t.contains("Hello world") && t.contains("Second line"))
  }
}
