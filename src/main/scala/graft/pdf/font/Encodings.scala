package graft.pdf.font

/** Simple-font byte encodings (PDF 32000-1 Appendix D; reference:
  * src/fonts/encodings at font_dict.rs:1123-1606). Tables are built
  * once per JVM and shared across all tasks — the `mapPartitions`
  * amortization called out in SURVEY §1.2.
  * Each table maps byte code (0-255) → Unicode char, 0 = unmapped.
  */
object Encodings {

  /** WinAnsiEncoding ≈ Windows-1252. */
  val winAnsi: Array[Char] = {
    val t = new Array[Char](256)
    var i = 32
    while (i < 127) { t(i) = i.toChar; i += 1 }
    i = 0xa0
    while (i <= 0xff) { t(i) = i.toChar; i += 1 }
    val cp1252 = Map(
      0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
      0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
      0x89 -> '‰', 0x8a -> 'Š', 0x8b -> '‹', 0x8c -> 'Œ',
      0x8e -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
      0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
      0x98 -> '˜', 0x99 -> '™', 0x9a -> 'š', 0x9b -> '›',
      0x9c -> 'œ', 0x9e -> 'ž', 0x9f -> 'Ÿ')
    cp1252.foreach { case (k, v) => t(k) = v }
    t
  }

  /** Adobe StandardEncoding (PDF Appendix D.2). */
  val standard: Array[Char] = {
    val t = new Array[Char](256)
    var i = 32
    while (i < 127) { t(i) = i.toChar; i += 1 }
    t(0x27) = '’' // quoteright
    t(0x60) = '‘' // quoteleft
    val hi = Map(
      0xa1 -> '¡', 0xa2 -> '¢', 0xa3 -> '£', 0xa4 -> '⁄',
      0xa5 -> '¥', 0xa6 -> 'ƒ', 0xa7 -> '§', 0xa8 -> '¤',
      0xa9 -> '\'', 0xaa -> '“', 0xab -> '«', 0xac -> '‹',
      0xad -> '›', 0xae -> 'ﬁ', 0xaf -> 'ﬂ',
      0xb1 -> '–', 0xb2 -> '†', 0xb3 -> '‡', 0xb4 -> '·',
      0xb6 -> '¶', 0xb7 -> '•', 0xb8 -> '‚', 0xb9 -> '„',
      0xba -> '”', 0xbb -> '»', 0xbc -> '…', 0xbd -> '‰',
      0xbf -> '¿',
      0xc1 -> '`', 0xc2 -> '´', 0xc3 -> 'ˆ', 0xc4 -> '˜',
      0xc5 -> '¯', 0xc6 -> '˘', 0xc7 -> '˙', 0xc8 -> '¨',
      0xca -> '˚', 0xcb -> '¸', 0xcd -> '˝', 0xce -> '˛',
      0xcf -> 'ˇ', 0xd0 -> '—',
      0xe1 -> 'Æ', 0xe3 -> 'ª', 0xe8 -> 'Ł', 0xe9 -> 'Ø',
      0xea -> 'Œ', 0xeb -> 'º',
      0xf1 -> 'æ', 0xf5 -> 'ı', 0xf8 -> 'ł', 0xf9 -> 'ø',
      0xfa -> 'œ', 0xfb -> 'ß')
    hi.foreach { case (k, v) => t(k) = v }
    t
  }

  /** MacRomanEncoding. */
  val macRoman: Array[Char] = {
    val t = new Array[Char](256)
    var i = 32
    while (i < 127) { t(i) = i.toChar; i += 1 }
    val hiStr =
      "ÄÅÇÉÑÖÜáàâäãåçéè" +
      "êëíìîïñóòôöõúùûü" +
      "†°¢£§•¶ß®©™´¨≠ÆØ" +
      "∞±≤≥¥µ∂∑∏π∫ªºΩæø" +
      "¿¡¬√ƒ≈∆«»… ÀÃÕŒœ" +
      "–—“”‘’÷◊ÿŸ⁄€‹›ﬁﬂ" +
      "‡·‚„‰ÂÊÁËÈÍÎÏÌÓÔ" +
      "ÒÚÛÙıˆ˜¯˘˙˚¸˝˛ˇ"
    var k = 0
    while (k < 128) { t(0x80 + k) = hiStr.charAt(k); k += 1 }
    t
  }

  /** Symbol font built-in encoding (subset covering Greek + common math;
    * reference analog: symbolic built-ins, font_dict.rs:624-804). */
  val symbol: Array[Char] = {
    val t = new Array[Char](256)
    t(0x20) = ' '
    // ASCII positions that keep their meaning in Symbol
    "!#%&()+,./0123456789:;<=>?[]_{|}".foreach(c => t(c.toInt) = c)
    val caps = "ΑΒΧΔΕΦΓΗΙϑΚΛΜΝΟΠΘΡΣΤΥςΩΞΨΖ"
    val lows = "αβχδεφγηιϕκλμνοπθρστυϖωξψζ"
    var i = 0
    while (i < 26) { t('A' + i) = caps.charAt(i); t('a' + i) = lows.charAt(i); i += 1 }
    val hi = Map(
      0x22 -> '∀', 0x24 -> '∃', 0x27 -> '∋', 0x2a -> '∗',
      0x2d -> '−', 0x40 -> '≅', 0x5c -> '∴', 0x7e -> '∼',
      0xa1 -> 'ϒ', 0xa2 -> '′', 0xa3 -> '≤', 0xa4 -> '⁄',
      0xa5 -> '∞', 0xa6 -> 'ƒ', 0xa7 -> '♣', 0xa8 -> '♦',
      0xa9 -> '♥', 0xaa -> '♠', 0xab -> '↔', 0xac -> '←',
      0xad -> '↑', 0xae -> '→', 0xaf -> '↓',
      0xb0 -> '°', 0xb1 -> '±', 0xb2 -> '″', 0xb3 -> '≥',
      0xb4 -> '×', 0xb5 -> '∝', 0xb6 -> '∂', 0xb7 -> '•',
      0xb8 -> '÷', 0xb9 -> '≠', 0xba -> '≡', 0xbb -> '≈',
      0xbc -> '…', 0xbf -> '↵',
      0xc0 -> 'ℵ', 0xc4 -> '⊗', 0xc5 -> '⊕', 0xc6 -> '∅',
      0xc7 -> '∩', 0xc8 -> '∪', 0xc9 -> '⊃', 0xca -> '⊇',
      0xcb -> '⊄', 0xcc -> '⊂', 0xcd -> '⊆', 0xce -> '∈',
      0xcf -> '∉',
      0xd0 -> '∠', 0xd1 -> '∇', 0xd5 -> '∏', 0xd6 -> '√',
      0xd7 -> '⋅', 0xd8 -> '¬', 0xd9 -> '∧', 0xda -> '∨',
      0xdb -> '⇔', 0xdc -> '⇐', 0xdd -> '⇑', 0xde -> '⇒',
      0xdf -> '⇓',
      0xe5 -> '∑', 0xf2 -> '∫')
    hi.foreach { case (k, v) => t(k) = v }
    t
  }

  /** ZapfDingbats built-in encoding: 0x21-0x7E → U+2701 block (with the
    * standard exceptions folded in where they matter for text). */
  val zapfDingbats: Array[Char] = {
    val t = new Array[Char](256)
    t(0x20) = ' '
    var i = 0x21
    while (i <= 0x7e) { t(i) = (0x2701 + (i - 0x21)).toChar; i += 1 }
    // a few frequently-hit exact glyphs
    t(0x2a) = '✪'; t(0x48) = '❈'; t(0x6c) = '●'
    t(0x6d) = '❍'; t(0x6e) = '■'
    t
  }

  def byName(name: String): Option[Array[Char]] = name match {
    case "WinAnsiEncoding"  => Some(winAnsi)
    case "MacRomanEncoding" => Some(macRoman)
    case "StandardEncoding" => Some(standard)
    case "MacExpertEncoding" => Some(standard) // approximation
    case _                  => None
  }
}
