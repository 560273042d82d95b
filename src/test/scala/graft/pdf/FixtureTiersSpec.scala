package graft.pdf

import java.nio.charset.StandardCharsets.ISO_8859_1
import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.testgen.PdfBuilder
import graft.pdf.testgen.PdfBuilder.Line

/** Fixture tiers T1-T7 (FIXTURES.md §3): each exercises one feature
  * axis of the reference (file:line refs in FIXTURES.md). */
class FixtureTiersSpec extends AnyFunSuite {

  // ------------------------------------------------------------------
  // helpers to hand-assemble PDFs beyond PdfBuilder's standard shapes
  // ------------------------------------------------------------------
  private def onePageDoc(b: PdfBuilder, fontObjs: Map[String, Int],
                         content: String, flate: Boolean = false): Array[Byte] = {
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val cId = b.addStream("", content.getBytes(ISO_8859_1), flate)
    val fontRes = fontObjs.map { case (n, id) => s"/$n $id 0 R" }.mkString(" ")
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << $fontRes >> >> /Contents $cId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    b.build(catId)
  }

  // ------------------ T1: encodings ---------------------------------
  test("T1: WinAnsi high bytes (é, emdash, curly quotes)") {
    // 0xE9=é, 0x97=—, 0x93/0x94 curly quotes in CP1252
    val content = "BT /F1 12 Tf 100 700 Td (Café  ok) Tj ET"
    val b = new PdfBuilder()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val pdf = onePageDoc(b, Map("F1" -> f), content)
    assert(PdfExtractor.extract(pdf).text == "Café — “ok”")
  }

  test("T1: MacRomanEncoding differs from WinAnsi") {
    // MacRoman 0xA5 = bullet •; WinAnsi 0xA5 = ¥
    val content = "BT /F1 12 Tf 100 700 Td (\u00a5) Tj ET"
    val b = new PdfBuilder()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /MacRomanEncoding >>")
    val pdf = onePageDoc(b, Map("F1" -> f), content)
    assert(PdfExtractor.extract(pdf).text == "•")
  }

  test("T1: /Differences + glyph names incl. ligatures") {
    val content = "BT /F1 12 Tf 100 700 Td (AB C) Tj ET"
    val b = new PdfBuilder()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding << /BaseEncoding /WinAnsiEncoding /Differences [65 /bullet /emdash 67 /fi] >> >>")
    val pdf = onePageDoc(b, Map("F1" -> f), content)
    assert(PdfExtractor.extract(pdf).text == "•— ﬁ")
  }

  test("T1: Symbol font built-in (Greek)") {
    val content = "BT /F1 12 Tf 100 700 Td (abg) Tj ET"
    val b = new PdfBuilder()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Symbol >>")
    val pdf = onePageDoc(b, Map("F1" -> f), content)
    assert(PdfExtractor.extract(pdf).text == "αβγ")
  }

  test("T1: Type0 Identity-H with ToUnicode bfchar + bfrange + surrogate pair") {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |12 dict begin begincmap
        |1 begincodespacerange <0000> <FFFF> endcodespacerange
        |2 beginbfchar
        |<0041> <0048>
        |<0042> <D835DF0C>
        |endbfchar
        |1 beginbfrange
        |<0050> <0052> <0061>
        |endbfrange
        |endcmap end end""".stripMargin
    val b = new PdfBuilder()
    val cmapId = b.addStream("", cmap.getBytes(ISO_8859_1), flate = false)
    val cidFont = b.addObject("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fake " +
      "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> /DW 600 >>")
    val f = b.addObject(s"<< /Type /Font /Subtype /Type0 /BaseFont /Fake /Encoding /Identity-H " +
      s"/DescendantFonts [$cidFont 0 R] /ToUnicode $cmapId 0 R >>")
    // codes: 0041 0042 0050 0051 0052 → H, 𝜌(surrogate pair U+D835DF0C), a, b, c
    val content = "BT /F1 12 Tf 100 700 Td <00410042005000510052> Tj ET"
    val pdf = onePageDoc(b, Map("F1" -> f), content)
    val txt = PdfExtractor.extract(pdf).text
    assert(txt == "H𝜌abc", s"got codepoints: ${txt.codePoints().toArray.toVector.map(_.toHexString)}")
  }

  test("T1: missing ToUnicode falls back to printable ASCII") {
    val b = new PdfBuilder()
    val f = b.addObject("<< /Type /Font /Subtype /TrueType /BaseFont /NoMap >>")
    val pdf = onePageDoc(b, Map("F1" -> f), "BT /F1 12 Tf 100 700 Td (Plain) Tj ET")
    assert(PdfExtractor.extract(pdf).text == "Plain")
  }

  // ------------------ T2: filters ------------------------------------
  private def hexEncode(s: Array[Byte]): String =
    s.map(b => f"${b & 0xff}%02X").mkString + ">"

  test("T2: ASCIIHexDecode content stream") {
    val content = "BT /F1 12 Tf 100 700 Td (HexWorld) Tj ET"
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val hexData = hexEncode(content.getBytes(ISO_8859_1))
    val cId = b.addObject(s"<< /Length ${hexData.length} /Filter /ASCIIHexDecode >>\nstream\n$hexData\nendstream")
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 $f 0 R >> >> /Contents $cId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    assert(PdfExtractor.extract(b.build(catId)).text == "HexWorld")
  }

  test("T2: filter chain [ASCIIHex, Flate]") {
    val content = "BT /F1 12 Tf 100 700 Td (Chained) Tj ET"
    val deflated = PdfBuilder.deflate(content.getBytes(ISO_8859_1))
    val hexData = hexEncode(deflated)
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val cId = b.addObject(s"<< /Length ${hexData.length} /Filter [/ASCIIHexDecode /FlateDecode] >>\nstream\n$hexData\nendstream")
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 $f 0 R >> >> /Contents $cId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    assert(PdfExtractor.extract(b.build(catId)).text == "Chained")
  }

  test("T2: indirect /Length resolved through xref") {
    val content = "BT /F1 12 Tf 100 700 Td (IndirectLen) Tj ET"
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val lenId = b.reserveId()
    val cId = b.addObject(s"<< /Length $lenId 0 R >>\nstream\n$content\nendstream")
    b.addObjectAt(lenId, content.length.toString)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 $f 0 R >> >> /Contents $cId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    assert(PdfExtractor.extract(b.build(catId)).text == "IndirectLen")
  }

  // ------------------ T3: structure ----------------------------------
  test("T3: multi-stream /Contents array concatenated") {
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val c1 = b.addStream("", "BT /F1 12 Tf 100 700 Td (Part one) Tj".getBytes(ISO_8859_1), flate = false)
    val c2 = b.addStream("", "( and two) Tj ET".getBytes(ISO_8859_1), flate = false)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 $f 0 R >> >> /Contents [$c1 0 R $c2 0 R] >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    assert(PdfExtractor.extract(b.build(catId)).text == "Part one and two")
  }

  test("T3: nested page tree inherits /Resources and /MediaBox") {
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val rootId = b.reserveId()
    val midId = b.reserveId()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val cId = b.addStream("", "BT /F1 12 Tf 100 700 Td (Inherited) Tj ET".getBytes(ISO_8859_1), flate = false)
    // leaf page has NO Resources/MediaBox of its own
    val pageId = b.addObject(s"<< /Type /Page /Parent $midId 0 R /Contents $cId 0 R >>")
    b.addObjectAt(midId, s"<< /Type /Pages /Parent $rootId 0 R /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(rootId, s"<< /Type /Pages /Kids [$midId 0 R] /Count 1 " +
      s"/Resources << /Font << /F1 $f 0 R >> >> /MediaBox [0 0 612 792] >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $rootId 0 R >>")
    assert(PdfExtractor.extract(b.build(catId)).text == "Inherited")
  }

  test("T3: Form XObject executed recursively") {
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val formContent = "BT /F1 12 Tf 0 0 Td (FromForm) Tj ET"
    val formId = b.addStream(s"/Type /XObject /Subtype /Form /BBox [0 0 200 50] " +
      s"/Resources << /Font << /F1 $f 0 R >> >> ", formContent.getBytes(ISO_8859_1), flate = false)
    val cId = b.addStream("", s"q 1 0 0 1 100 700 cm /X1 Do Q".getBytes(ISO_8859_1), flate = false)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /XObject << /X1 $formId 0 R >> >> /Contents $cId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    assert(PdfExtractor.extract(b.build(catId)).text == "FromForm")
  }

  // ------------------ T4: text semantics -----------------------------
  test("T4: TJ kerning, offsets straddling the -120 threshold") {
    val b1 = PdfBuilder.singlePage(Nil)
    val _ = b1
    def tjDoc(off: Int): String = {
      val b = new PdfBuilder()
      val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
      val pdf = onePageDoc(b, Map("F1" -> f),
        s"BT /F1 12 Tf 100 700 Td [(Hel) $off (lo)] TJ ET")
      PdfExtractor.extract(pdf).text
    }
    assert(tjDoc(-50) == "Hello")   // small kern: same word
    assert(tjDoc(-119) == "Hello")  // just above threshold
    assert(tjDoc(-500) == "Hel lo") // below threshold ⇒ synthetic space
  }

  test("T4: multi-render bold double-draw deduplicated") {
    val pdf = PdfBuilder.singlePage(Seq(
      Line(100, 700, 12, "F1", "Shadow"),
      Line(100.5f, 700, 12, "F1", "Shadow"))) // ΔX < 2pt, same text
    val r = PdfExtractor.extract(pdf)
    assert(r.text == "Shadow")
  }

  test("T4: Tm scale doubles effective font size (heading via 12pt Tf)") {
    val b = new PdfBuilder()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold /Encoding /WinAnsiEncoding >>")
    val pdf = onePageDoc(b, Map("F2" -> f),
      "BT /F2 12 Tf 2 0 0 2 100 700 Tm (Scaled Title) Tj ET")
    val md = PdfExtractor.extract(pdf).markdown
    assert(md.startsWith("## Scaled Title") || md.startsWith("# Scaled Title"), s"got: $md")
  }

  test("T4: quote operators advance but drop text from span output (quirk, SURVEY 7.4.9)") {
    val b = new PdfBuilder()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val pdf = onePageDoc(b, Map("F1" -> f),
      "BT /F1 12 Tf 14 TL 100 700 Td (kept) Tj (dropped) ' ET")
    assert(PdfExtractor.extract(pdf).text == "kept")
  }

  test("T4: fragmented word merge without space; wide gap gets space") {
    val b = new PdfBuilder()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    // two Tj runs: second starts exactly where first ends (Helvetica
    // widths default 500/1000 × 12pt = 6pt/char; "Frag" = 24pt)
    val pdf = onePageDoc(b, Map("F1" -> f),
      "BT /F1 12 Tf 100 700 Td (Frag) Tj ET BT /F1 12 Tf 124 700 Td (ment) Tj ET")
    assert(PdfExtractor.extract(pdf).text == "Fragment")
  }

  // ------------------ T5: layout -------------------------------------
  test("T5: two-column page reads left column first") {
    val left = (0 until 8).map(i => Line(72, 700 - 14 * i, 10, "F1", s"left$i"))
    val right = (0 until 8).map(i => Line(400, 700 - 14 * i, 10, "F1", s"right$i"))
    // interleave emission order to prove sort is spatial, not sequential
    val mixed = left.zip(right).flatMap { case (l, r) => Seq(r, l) }
    val pdf = PdfBuilder.singlePage(mixed)
    val txt = PdfExtractor.extract(pdf).text
    val leftPos = txt.indexOf("left7")
    val rightPos = txt.indexOf("right0")
    assert(leftPos >= 0 && rightPos >= 0)
    assert(leftPos < rightPos, s"columns not separated:\n$txt")
  }

  test("T5: heading ladder H1/H2/H3 by size+bold") {
    val pdf = PdfBuilder.singlePage(Seq(
      Line(72, 720, 24, "F2", "Title One"),
      Line(72, 680, 17, "F2", "Sub Title"),
      Line(72, 640, 14.5f, "F2", "Sub Sub"),
      Line(72, 600, 11, "F1", "Plain body text here.")))
    val md = PdfExtractor.extract(pdf).markdown
    assert(md.contains("# Title One"), md)
    assert(md.contains("## Sub Title"), md)
    assert(md.contains("### Sub Sub"), md)
    assert(md.contains("Plain body text here."), md)
  }

  test("T5: page-number artifacts removed from markdown, kept in text") {
    val pdf = PdfBuilder.singlePage(Seq(
      Line(72, 720, 11, "F1", "Real content line."),
      Line(300, 40, 9, "F1", "Page 3")))
    val r = PdfExtractor.extract(pdf)
    assert(r.text.contains("Page 3"))
    assert(!r.markdown.contains("Page 3"), r.markdown)
  }

  // ------------------ T7: malformed ----------------------------------
  test("T7: corrupt startxref offset → reconstruction still extracts") {
    val pdf = PdfBuilder.singlePage(Seq(Line(100, 700, 12, "F1", "Survivor")))
    val s = new String(pdf, ISO_8859_1)
    val idx = s.lastIndexOf("startxref")
    val corrupted = (s.substring(0, idx) + "startxref\n999999999\n%%EOF\n").getBytes(ISO_8859_1)
    assert(PdfExtractor.extract(corrupted).text == "Survivor")
  }

  test("T7: truncated xref table → reconstruction") {
    val pdf = PdfBuilder.singlePage(Seq(Line(100, 700, 12, "F1", "Truncated")))
    val s = new String(pdf, ISO_8859_1)
    val xrefPos = s.lastIndexOf("xref")
    // chop the whole xref/trailer away
    val chopped = (s.substring(0, xrefPos) + "%%EOF\n").getBytes(ISO_8859_1)
    assert(PdfExtractor.extract(chopped).text == "Truncated")
  }

  test("T7: garbage bytes mid content stream → 1-byte-skip recovery") {
    val content = "BT /F1 12 Tf 100 700 Td (Before) Tj þ garbage#$ 100 680 Td (After) Tj ET"
    val b = new PdfBuilder()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val pdf = onePageDoc(b, Map("F1" -> f), content)
    val txt = PdfExtractor.extract(pdf).text
    assert(txt.contains("Before") && txt.contains("After"), s"got: $txt")
  }

  test("T7: empty page → empty text, no failure") {
    val pdf = PdfBuilder.singlePage(Nil)
    val r = PdfExtractor.extract(pdf)
    assert(r.text == "")
    assert(r.nPages == 1)
  }

  test("T7: missing endobj tolerated") {
    val pdf = PdfBuilder.singlePage(Seq(Line(100, 700, 12, "F1", "NoEndobj")))
    val s = new String(pdf, ISO_8859_1).replace("\nendobj", "")
    // removing endobj shifts offsets → xref broken too ⇒ full fallback ladder
    assert(PdfExtractor.extract(s.getBytes(ISO_8859_1)).text == "NoEndobj")
  }
}
