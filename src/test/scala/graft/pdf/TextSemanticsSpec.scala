package graft.pdf

import java.nio.charset.StandardCharsets.ISO_8859_1
import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.testgen.PdfBuilder

/** T4 extras: state operators that move positions (Tz/Tc/Tw/TL/T*) and
  * ToUnicode on a simple font (reference: text.rs:1362-1380, 2149-2183;
  * font_dict.rs:624-660). */
class TextSemanticsSpec extends AnyFunSuite {

  private def doc(content: String, fontExtra: String = ""): Array[Byte] = {
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val f = b.addObject(s"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding $fontExtra>>")
    val cId = b.addStream("", content.getBytes(ISO_8859_1), flate = false)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 $f 0 R >> >> /Contents $cId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    b.build(catId)
  }

  test("TL + T* advance lines; TD sets negative leading") {
    val c = "BT /F1 12 Tf 14 TL 100 700 Td (line one) Tj T* (line two) Tj ET"
    assert(PdfExtractor.extract(doc(c)).text == "line one\nline two")
    val c2 = "BT /F1 12 Tf 100 700 Td (first) Tj 0 -14 TD (second) Tj T* (third) Tj ET"
    assert(PdfExtractor.extract(doc(c2)).text == "first\nsecond\nthird")
  }

  test("Tz horizontal scaling stretches advances (gap → space)") {
    // at 100% the runs abut; at 300% the first run's width triples so a
    // second Tj placed at the unscaled end position would overlap —
    // instead place runs by matrix and check the scaled width creates a
    // gap-derived space on the SAME baseline
    val c = "BT /F1 12 Tf 100 700 Td (AB) Tj ET " +
      "BT /F1 12 Tf 130 700 Td (CD) Tj ET" // AB width=12pt → 18pt gap > 0.25em
    assert(PdfExtractor.extract(doc(c)).text == "AB CD")
    val cTight = "BT /F1 12 Tf 300 Tz 100 700 Td (AB) Tj ET " +
      "BT /F1 12 Tf 100 Tz 136 700 Td (CD) Tj ET" // AB stretches to 36pt → abut
    assert(PdfExtractor.extract(doc(cTight)).text == "ABCD")
  }

  test("Tc char spacing widens advances") {
    // 'AB' at 12pt Helvetica default widths 500/1000 → 6pt/char; with
    // Tc=10 each char advances 16pt → end x = 132; next Tj at 133 abuts
    val c = "BT /F1 12 Tf 10 Tc 100 700 Td (AB) Tj ET " +
      "BT /F1 12 Tf 0 Tc 133 700 Td (CD) Tj ET"
    assert(PdfExtractor.extract(doc(c)).text == "ABCD")
  }

  test("Tw word spacing applies to byte-32 spaces") {
    // "A B": widths 6+6+6=18pt + Tw 20 on the space → end = 138
    val c = "BT /F1 12 Tf 20 Tw 100 700 Td (A B) Tj ET " +
      "BT /F1 12 Tf 0 Tw 139 700 Td (C) Tj ET"
    assert(PdfExtractor.extract(doc(c)).text == "A BC")
  }

  // reference: extractors/text.rs:2828-2857 (test_space_threshold_
  // default / _custom / _disabled) — ported behaviorally: the config
  // plumbs through ConversionOptions and changes TJ space insertion.
  test("space-insertion threshold: default -120, custom, NEG_INFINITY disables") {
    assert(graft.pdf.extract.TextExtractor.DefaultSpaceInsertionThreshold == -120f)
    assert(ConversionOptions().spaceInsertionThreshold == -120f)
    // -100 offset: above the default threshold (kerning) → no space;
    // a more sensitive -80 threshold inserts one
    val kern = "BT /F1 12 Tf 100 700 Td [(A) -100 (B)] TJ ET"
    assert(PdfExtractor.extract(doc(kern), ConversionOptions()).text == "AB")
    assert(PdfExtractor.extract(doc(kern),
      ConversionOptions(spaceInsertionThreshold = -80f)).text == "A B")
    // -300 offset: word boundary under the default; NEG_INFINITY
    // disables insertion entirely (offset < -inf is never true)
    val word = "BT /F1 12 Tf 100 700 Td [(A) -300 (B)] TJ ET"
    assert(PdfExtractor.extract(doc(word), ConversionOptions()).text == "A B")
    assert(PdfExtractor.extract(doc(word),
      ConversionOptions(spaceInsertionThreshold = Float.NegativeInfinity)).text == "AB")
    // exactly -120 is NOT below the strict threshold (reference uses <)
    val edge = "BT /F1 12 Tf 100 700 Td [(A) -120 (B)] TJ ET"
    assert(PdfExtractor.extract(doc(edge), ConversionOptions()).text == "AB")
  }

  // reference: extractors/text.rs:116-126 (test_extract_no_font) — a
  // Tf naming a font absent from /Resources still extracts via the
  // identity/default mapping instead of dropping the run.
  test("missing font resource falls back to identity mapping") {
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val cId = b.addStream("", "BT /F9 12 Tf 100 700 Td (ABC) Tj ET".getBytes(ISO_8859_1), flate = false)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Contents $cId 0 R >>") // no /Font resources at all
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    assert(PdfExtractor.extract(b.build(catId)).text == "ABC")
  }

  test("ToUnicode CMap on a simple (1-byte) font overrides encoding") {
    val cmap =
      """1 begincodespacerange <00> <FF> endcodespacerange
        |2 beginbfchar
        |<41> <0394>
        |<42> <00E9>
        |endbfchar""".stripMargin
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val cmapId = b.addStream("", cmap.getBytes(ISO_8859_1), flate = false)
    val f = b.addObject(s"<< /Type /Font /Subtype /TrueType /BaseFont /Custom " +
      s"/Encoding /WinAnsiEncoding /ToUnicode $cmapId 0 R >>")
    val cId = b.addStream("", "BT /F1 12 Tf 100 700 Td (ABC) Tj ET".getBytes(ISO_8859_1), flate = false)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 $f 0 R >> >> /Contents $cId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    // A→Δ via CMap, B→é via CMap, C falls through to WinAnsi
    assert(PdfExtractor.extract(b.build(catId)).text == "ΔéC")
  }
}
