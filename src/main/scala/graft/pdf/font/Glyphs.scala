package graft.pdf.font

import java.text.Normalizer

/** Adobe Glyph List subset + algorithmic fallbacks.
  *
  * The reference embeds the full 4,292-entry AGL as a phf map
  * (reference: src/fonts/adobe_glyph_list.rs). Here the reachable subset
  * is generated: base Latin, accented Latin via NFC composition, Greek,
  * punctuation/symbols, ligatures — plus the `uniXXXX` / `uXXXX[XX]`
  * algorithmic forms (reference: font_dict.rs:985-1020). One immutable
  * map per JVM.
  */
object Glyphs {

  private val combining = Map(
    "grave" -> '̀', "acute" -> '́', "circumflex" -> '̂',
    "tilde" -> '̃', "macron" -> '̄', "breve" -> '̆',
    "dotaccent" -> '̇', "dieresis" -> '̈', "ring" -> '̊',
    "hungarumlaut" -> '̋', "caron" -> '̌', "cedilla" -> '̧',
    "ogonek" -> '̨')

  val table: Map[String, String] = {
    val b = Map.newBuilder[String, String]
    // letters and digits name themselves / spelled digits
    ('A' to 'Z').foreach(c => b += c.toString -> c.toString)
    ('a' to 'z').foreach(c => b += c.toString -> c.toString)
    val digits = Seq("zero", "one", "two", "three", "four", "five", "six",
      "seven", "eight", "nine")
    digits.zipWithIndex.foreach { case (n, i) => b += n -> i.toString }
    // accented Latin via NFC composition (covers Xacute, xgrave, …)
    for (base <- ('A' to 'Z') ++ ('a' to 'z'); (acc, mark) <- combining) {
      val composed = Normalizer.normalize(s"$base$mark", Normalizer.Form.NFC)
      if (composed.length == 1) b += s"$base$acc" -> composed
    }
    // ASCII punctuation
    b ++= Seq(
      "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"",
      "numbersign" -> "#", "dollar" -> "$", "percent" -> "%",
      "ampersand" -> "&", "quotesingle" -> "'", "parenleft" -> "(",
      "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
      "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
      "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
      "greater" -> ">", "question" -> "?", "at" -> "@",
      "bracketleft" -> "[", "backslash" -> "\\", "bracketright" -> "]",
      "asciicircum" -> "^", "underscore" -> "_", "grave" -> "`",
      "braceleft" -> "{", "bar" -> "|", "braceright" -> "}",
      "asciitilde" -> "~")
    // quotes / dashes / typographic
    b ++= Seq(
      "quoteleft" -> "‘", "quoteright" -> "’",
      "quotedblleft" -> "“", "quotedblright" -> "”",
      "quotesinglbase" -> "‚", "quotedblbase" -> "„",
      "endash" -> "–", "emdash" -> "—",
      "bullet" -> "•", "ellipsis" -> "…",
      "dagger" -> "†", "daggerdbl" -> "‡",
      "perthousand" -> "‰", "minute" -> "′",
      "second" -> "″", "guilsinglleft" -> "‹",
      "guilsinglright" -> "›", "fraction" -> "⁄",
      "nbspace" -> " ", "softhyphen" -> "­",
      "minus" -> "−", "trademark" -> "™",
      "Euro" -> "€", "euro" -> "€")
    // Latin-1 supplement names
    b ++= Seq(
      "exclamdown" -> "¡", "cent" -> "¢", "sterling" -> "£",
      "currency" -> "¤", "yen" -> "¥", "brokenbar" -> "¦",
      "section" -> "§", "dieresis" -> "¨", "copyright" -> "©",
      "ordfeminine" -> "ª", "guillemotleft" -> "«", "logicalnot" -> "¬",
      "registered" -> "®", "macron" -> "¯", "degree" -> "°",
      "plusminus" -> "±", "twosuperior" -> "²", "threesuperior" -> "³",
      "acute" -> "´", "mu" -> "µ", "paragraph" -> "¶",
      "periodcentered" -> "·", "cedilla" -> "¸", "onesuperior" -> "¹",
      "ordmasculine" -> "º", "guillemotright" -> "»",
      "onequarter" -> "¼", "onehalf" -> "½", "threequarters" -> "¾",
      "questiondown" -> "¿", "multiply" -> "×", "divide" -> "÷",
      "AE" -> "Æ", "ae" -> "æ", "OE" -> "Œ", "oe" -> "œ",
      "Oslash" -> "Ø", "oslash" -> "ø", "Thorn" -> "Þ", "thorn" -> "þ",
      "Eth" -> "Ð", "eth" -> "ð", "germandbls" -> "ß",
      "Lslash" -> "Ł", "lslash" -> "ł", "dotlessi" -> "ı",
      "florin" -> "ƒ", "circumflex" -> "ˆ", "tilde" -> "˜",
      "breve" -> "˘", "dotaccent" -> "˙", "ring" -> "˚",
      "hungarumlaut" -> "˝", "ogonek" -> "˛", "caron" -> "ˇ")
    // ligatures
    b ++= Seq("fi" -> "ﬁ", "fl" -> "ﬂ",
      "ff" -> "ﬀ", "ffi" -> "ﬃ", "ffl" -> "ﬄ")
    // Greek (Symbol-font names)
    val greek = Seq(
      "Alpha" -> 'Α', "Beta" -> 'Β', "Gamma" -> 'Γ', "Delta" -> 'Δ',
      "Epsilon" -> 'Ε', "Zeta" -> 'Ζ', "Eta" -> 'Η', "Theta" -> 'Θ',
      "Iota" -> 'Ι', "Kappa" -> 'Κ', "Lambda" -> 'Λ', "Mu" -> 'Μ',
      "Nu" -> 'Ν', "Xi" -> 'Ξ', "Omicron" -> 'Ο', "Pi" -> 'Π',
      "Rho" -> 'Ρ', "Sigma" -> 'Σ', "Tau" -> 'Τ', "Upsilon" -> 'Υ',
      "Phi" -> 'Φ', "Chi" -> 'Χ', "Psi" -> 'Ψ', "Omega" -> 'Ω',
      "alpha" -> 'α', "beta" -> 'β', "gamma" -> 'γ', "delta" -> 'δ',
      "epsilon" -> 'ε', "zeta" -> 'ζ', "eta" -> 'η', "theta" -> 'θ',
      "iota" -> 'ι', "kappa" -> 'κ', "lambda" -> 'λ', "nu" -> 'ν',
      "xi" -> 'ξ', "omicron" -> 'ο', "pi" -> 'π', "rho" -> 'ρ',
      "sigma" -> 'σ', "sigma1" -> 'ς', "tau" -> 'τ', "upsilon" -> 'υ',
      "phi" -> 'φ', "phi1" -> 'ϕ', "chi" -> 'χ', "psi" -> 'ψ',
      "omega" -> 'ω', "theta1" -> 'ϑ', "omega1" -> 'ϖ')
    greek.foreach { case (n, c) => b += n -> c.toString }
    b.result()
  }

  /** Glyph name → Unicode string; handles uniXXXX[XXXX…], uXXXX-XXXXXX,
    * and `name.suffix` variants. None for unknown (gNN, cidNN …). */
  def lookup(name: String): Option[String] = {
    table.get(name).orElse {
      if (name.startsWith("uni") && name.length >= 7) {
        // one or more concatenated 4-hex-digit UTF-16 code units
        val hex = name.substring(3)
        if (hex.length % 4 == 0 && hex.forall(isHex)) Some(rebuildUni(hex))
        else None
      } else if (name.startsWith("u") && name.length >= 5 && name.length <= 7 &&
                 name.substring(1).forall(isHex)) {
        val cp = Integer.parseInt(name.substring(1), 16)
        if (cp >= 0 && cp <= 0x10ffff) Some(new String(Character.toChars(cp))) else None
      } else if (name.contains('.')) {
        lookup(name.substring(0, name.indexOf('.'))) // e.g. "a.sc" → "a"
      } else None
    }
  }

  private def rebuildUni(hex: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < hex.length) {
      sb.append(Integer.parseInt(hex.substring(i, i + 4), 16).toChar)
      i += 4
    }
    sb.toString
  }

  @inline private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')
}
