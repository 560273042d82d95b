package graft.pdf.font

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's own font-weight / glyph-name test vectors
  * (reference: src/fonts/font_dict.rs:1608-2130). These pinned the
  * reference's ACTUAL cascade — explicit /FontWeight overrides a bold
  * NAME, ForceBold is read as mask 0x80000, StemV thresholds are
  * >110/≥80 — all three of which diverged from this repo's previous
  * flat `||` heuristic (name-bold OR 1<<18 OR stemV≥120 OR weight≥600).
  */
class ReferenceFontVectorsSpec extends AnyFunSuite {

  private def w(name: String, weight: Option[Double] = None,
                flags: Option[Int] = None, stemV: Option[Double] = None): Int =
    FontInfo.fontWeight(name, weight, flags, stemV)
  private def bold(name: String, weight: Option[Double] = None,
                   flags: Option[Int] = None, stemV: Option[Double] = None): Boolean =
    w(name, weight, flags, stemV) >= 600

  test("explicit FontWeight field (font_dict.rs:1621-1652 test_font_info_is_bold)") {
    assert(bold("Times-Bold", weight = Some(700)))
    assert(!bold("Helvetica", weight = Some(400)))
  }

  test("ForceBold flag is 0x80000; 0x40000 is NOT (font_dict.rs:1901-1947)") {
    assert(w("Helvetica", flags = Some(0x80000)) == 700)
    assert(bold("Helvetica", flags = Some(0x80000)))
    assert(w("Helvetica", flags = Some(0x40000)) == 400)
    assert(!bold("Helvetica", flags = Some(0x40000)))
  }

  test("StemV analysis: >110 bold, 80-110 medium, <80 normal (font_dict.rs:1950-2005)") {
    assert(w("UnknownFont", stemV = Some(120.0)) == 700)
    assert(bold("UnknownFont", stemV = Some(120.0)))
    assert(w("UnknownFont", stemV = Some(95.0)) == 500)
    assert(!bold("UnknownFont", stemV = Some(95.0)))
    assert(w("UnknownFont", stemV = Some(70.0)) == 400)
    assert(!bold("UnknownFont", stemV = Some(70.0)))
    // boundary the old ≥120 heuristic got wrong
    assert(w("UnknownFont", stemV = Some(115.0)) == 700)
  }

  test("priority cascade: FontWeight > ForceBold > name > StemV (font_dict.rs:2008-2062)") {
    // explicit Light beats bold name + ForceBold + heavy stem
    assert(w("Helvetica-Bold", weight = Some(300), flags = Some(0x80000),
      stemV = Some(120.0)) == 300)
    assert(!bold("Helvetica-Bold", weight = Some(300), flags = Some(0x80000),
      stemV = Some(120.0)))
    // ForceBold beats normal name + light stem
    assert(w("Helvetica", flags = Some(0x80000), stemV = Some(70.0)) == 700)
    // bold name beats light stem
    assert(w("Helvetica-Bold", stemV = Some(70.0)) == 700)
  }

  test("name heuristics: black/extrabold/bold/semibold ladder (font_dict.rs:2065-2130)") {
    assert(w("Helvetica-Black") == 900)
    assert(w("Arial-ExtraBold") == 800)
    assert(w("TimesNewRoman-Bold") == 700)
    assert(w("Arial-SemiBold") == 600)
    assert(bold("Arial-SemiBold"))
    assert(w("Sans-Heavy") == 900)
    assert(w("Sans-DemiBold") == 600)
    assert(w("Sans-Medium") == 500)
    assert(w("Sans-Light") == 300)
    assert(w("Sans-ExtraLight") == 200)
    assert(w("Sans-Thin") == 100)
  }

  test("FontWeight snapping to nearest 100-step (text_block.rs:111-123)") {
    assert(w("X", weight = Some(150)) == 100)
    assert(w("X", weight = Some(151)) == 200)
    assert(w("X", weight = Some(450)) == 400)
    assert(w("X", weight = Some(451)) == 500)
    assert(w("X", weight = Some(651)) == 700)
    assert(w("X", weight = Some(851)) == 900)
  }

  test("glyph names: basic/punct/special/quotes/accents/currency/ligatures (font_dict.rs:1788-1860)") {
    assert(Glyphs.lookup("A").contains("A"))
    assert(Glyphs.lookup("zero").contains("0"))
    assert(Glyphs.lookup("nine").contains("9"))
    assert(Glyphs.lookup("space").contains(" "))
    assert(Glyphs.lookup("quotesingle").contains("'"))
    assert(Glyphs.lookup("grave").contains("`"))
    assert(Glyphs.lookup("hyphen").contains("-"))
    assert(Glyphs.lookup("minus").contains("−")) // AGL: MINUS SIGN, not hyphen
    assert(Glyphs.lookup("bullet").contains("•"))
    assert(Glyphs.lookup("dagger").contains("†"))
    assert(Glyphs.lookup("daggerdbl").contains("‡"))
    assert(Glyphs.lookup("ellipsis").contains("…"))
    assert(Glyphs.lookup("emdash").contains("—"))
    assert(Glyphs.lookup("endash").contains("–"))
    assert(Glyphs.lookup("quotesinglbase").contains("‚"))
    assert(Glyphs.lookup("quotedblbase").contains("„"))
    assert(Glyphs.lookup("quotedblleft").contains("“"))
    assert(Glyphs.lookup("quotedblright").contains("”"))
    assert(Glyphs.lookup("quoteleft").contains("‘"))
    assert(Glyphs.lookup("quoteright").contains("’"))
    assert(Glyphs.lookup("Aacute").contains("Á"))
    assert(Glyphs.lookup("aacute").contains("á"))
    assert(Glyphs.lookup("Ntilde").contains("Ñ"))
    assert(Glyphs.lookup("ntilde").contains("ñ"))
    assert(Glyphs.lookup("Euro").contains("€"))
    assert(Glyphs.lookup("sterling").contains("£"))
    assert(Glyphs.lookup("yen").contains("¥"))
    assert(Glyphs.lookup("cent").contains("¢"))
    assert(Glyphs.lookup("fi").contains("ﬁ"))
    assert(Glyphs.lookup("fl").contains("ﬂ"))
    assert(Glyphs.lookup("ffi").contains("ﬃ"))
    assert(Glyphs.lookup("uni0041").contains("A"))
    assert(Glyphs.lookup("uni2022").contains("•"))
    assert(Glyphs.lookup("u0041").contains("A"))
    assert(Glyphs.lookup("u2022").contains("•"))
    assert(Glyphs.lookup("unknownglyph").isEmpty)
    assert(Glyphs.lookup("").isEmpty)
  }

  test("WinAnsi table ascii + space (font_dict.rs:1608-1618)") {
    val t = Encodings.byName("WinAnsiEncoding").get
    assert(t('A') == 'A' && t('Z') == 'Z' && t('0') == '0' && t(' ') == ' ')
  }
}
