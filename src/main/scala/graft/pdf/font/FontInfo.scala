package graft.pdf.font

import scala.collection.mutable
import graft.pdf.cos.PdfObj
import graft.pdf.cos.PdfObj._
import graft.pdf.doc.PdfDocument

/** Decoded font: the table that turns Tj byte strings into Unicode and
  * glyph widths (reference: src/fonts/font_dict.rs:19-65, 100-379).
  *
  * Decode cascade (reference: font_dict.rs:624-804):
  *   ToUnicode CMap (skipping U+FFFD entries) → symbolic built-ins
  *   (Symbol / ZapfDingbats) → /Encoding (named table overlaid with
  *   /Differences via the glyph list) → fallback.
  */
final case class FontInfo(
    baseFont: String,
    subtype: String,
    toUnicode: Option[CMap],
    /** Base 256-entry table for simple fonts (None for Type0). */
    encTable: Option[Array[Char]],
    /** /Differences overrides, code → decoded string. */
    diffs: Map[Int, String],
    isType0: Boolean,
    /** simple-font widths: code → glyph width (1000-unit em). */
    widths: Array[Float], // index 0..255; NaN = missing
    /** CID widths for Type0 (sparse). */
    cidWidths: Map[Int, Float],
    defaultWidth: Float,
    flags: Int,
    isBold: Boolean) {

  def codeBytes: Int =
    if (isType0) toUnicode.map(c => math.max(c.codeBytes, 2)).getOrElse(2) else 1

  // plain val, not lazy: the lazy accessor's guard sat on every decode
  // miss; the builder is one toLowerCase of a short name per instance
  private val symbolic: Option[Array[Char]] = {
    val bf = baseFont.toLowerCase
    if (bf.contains("symbol")) Some(Encodings.symbol)
    else if (bf.contains("zapf") || bf.contains("dingbat")) Some(Encodings.zapfDingbats)
    else None
  }

  /** Cascade, evaluated once per code. Null-based, not Option-based:
    * fonts live per document, so the cascade re-runs for every touched
    * code of every font of every document — the flatMap/orElse chain's
    * Option + closure allocations were 12% of mixed-corpus JFR samples. */
  private def decodeUncached(code: Int): String = {
    if (toUnicode.isDefined) {
      val s = toUnicode.get.get(code).orNull
      if (s != null && s.nonEmpty && !s.contains('�')) return s
    }
    val d = diffs.getOrElse(code, null)
    if (d != null) return d
    if (symbolic.isDefined) {
      val t = symbolic.get
      if (code >= 0 && code < t.length && t(code) != 0)
        return FontInfo.charString(t(code))
    }
    if (encTable.isDefined) {
      val t = encTable.get
      if (code >= 0 && code < t.length && t(code) != 0)
        return FontInfo.charString(t(code))
    }
    fallbackOrNull(code)
  }

  /** decodeUncached specialized to code < 256 on a non-Type0 font:
    * identical cascade order. Direct map gets, NOT prebuilt 256-slot
    * tables: simpleLookup memoizes per code, so this runs once per
    * distinct code (~60/font), while the former flattened-table
    * variant zero-filled + populated two 256 arrays per font — on
    * many-small-document corpora that build was the TOP JFR leaf (12%
    * of samples; fonts live per document, docs average well under 256
    * decoded codes). */
  private def decodeSimpleUncached(code: Int): String = {
    if (toUnicode.isDefined) {
      val s = toUnicode.get.map.getOrElse(code, null)
      if (s != null && s.nonEmpty && !s.contains('�')) return s
    }
    val d = diffs.getOrElse(code, null)
    if (d != null) return d
    if (symbolic.isDefined) {
      val t = symbolic.get
      if (code < t.length && t(code) != 0) return FontInfo.charString(t(code))
    }
    if (encTable.isDefined) {
      val t = encTable.get
      if (code < t.length && t(code) != 0) return FontInfo.charString(t(code))
    }
    fallbackOrNull(code)
  }

  /** Per-entry-lazy 256-slot decode table for simple fonts — the
    * cascade allocates Option/closure chains and runs per GLYPH
    * otherwise (profiled as the extraction hot spot). Entries compute
    * on first use: fonts live per document, and a typical document
    * touches ~60-90 codes, so eagerly filling all 256 cost more than
    * the lookups it saved (5.4% of JFR samples were table builds). */
  private val simpleTable: Array[String] = new Array[String](256)
  /** identity sentinel for "computed: unmappable" — one array means one
    * write per entry, so even a cross-thread reader can only ever see
    * null (recompute, idempotent) or the final value; no stale
    * computed-but-null state is representable. */
  private[this] final val NotMapped: String = new String

  @inline private def simpleLookup(code: Int): String = {
    var v = simpleTable(code)
    if (v == null) {
      v = decodeSimpleUncached(code)
      if (v == null) v = NotMapped
      simpleTable(code) = v
    }
    if (v.asInstanceOf[AnyRef] eq NotMapped) null else v
  }

  /** Lazy per-font cache for Type0 code points (2-byte space). */
  private lazy val type0Cache = new java.util.HashMap[Integer, String]()


  /** Decode one character code to a Unicode string; None = unmappable. */
  def decode(code: Int): Option[String] = Option(decodeOrNull(code))

  /** Allocation-free variant for the VM hot loop. */
  /** Single-char decode fast lane: the decoded char when the mapping
    * is exactly one char, else 0 = caller must use decodeOrNull (covers
    * multi-char ligatures, unmappable codes, Type0, and the impossible-
    * in-practice U+0000 mapping — a NUL would be dropped as a
    * control char downstream anyway, so routing it to the slow path is
    * semantics-preserving). Exists because String.charAt(0) on the
    * memoized 1-char Strings paid a UTF16 checkIndex per glyph (8% of
    * mixed-corpus JFR samples). */
  private val simpleCharTable = new Array[Char](256)

  def decodeCharOrZero(code: Int): Char = {
    if (isType0) {
      // dense per-CMap table, shared across documents via FontCache —
      // a per-FontInfo table was tried and REGRESSED: FontInfo is
      // per (font, document), so each instance paid kilobytes of
      // allocation+zeroing amortized over a handful of glyphs. The
      // CMap instance is the cross-doc object, so its table builds
      // once per DISTINCT CMap. 0 = not a 1-char CMap mapping →
      // caller falls back to decodeOrNull (diffs/fallback cascade).
      if (toUnicode.isEmpty) return 0.toChar
      val t = toUnicode.get.singleCharTable
      if (code >= 0 && code < t.length) t(code) else 0.toChar
    } else {
      if (code < 0 || code >= 256) return 0.toChar
      val c = simpleCharTable(code)
      if (c != 0) return c
      val v = simpleLookup(code) // memoized; cheap to re-hit for non-1-char codes
      if (v != null && v.length == 1) {
        val ch = v.charAt(0)
        simpleCharTable(code) = ch
        ch
      } else 0.toChar
    }
  }

  def decodeOrNull(code: Int): String = {
    if (!isType0 && code >= 0 && code < 256) simpleLookup(code)
    else {
      val k = Integer.valueOf(code)
      val hit = type0Cache.get(k)
      if (hit != null) { if (hit.isEmpty) null else hit }
      else {
        val v = decodeUncached(code)
        type0Cache.put(k, if (v == null) "" else v)
        v
      }
    }
  }

  /** Fallback table (reference: src/extractors/text.rs:183-347): direct
    * printable-ASCII interpretation, else a small punct/space map. */
  private def fallbackOrNull(code: Int): String = {
    if (code >= 0x20 && code <= 0x7e) FontInfo.charString(code.toChar)
    else if (code >= 0xa0 && code <= 0xff && !isType0) FontInfo.charString(code.toChar)
    else FontInfo.fallbackMap.getOrElse(code, null)
  }

  /** Glyph width in text-space units/1000 (reference: font_dict.rs:607-617). */
  def width(code: Int): Float = {
    if (isType0) cidWidths.getOrElse(code, defaultWidth)
    else if (code >= 0 && code < 256 && !widths(code).isNaN) widths(code)
    else defaultWidth
  }
}

object FontInfo {

  /** Interned single-char strings for the BMP-latin range: every font
    * instance fills its own decode table, so per-entry String
    * allocation repeats per (font, doc). */
  private val charStrings: Array[String] =
    Array.tabulate(256)(i => String.valueOf(i.toChar))
  @inline private[font] def charString(c: Char): String =
    if (c < 256) charStrings(c) else String.valueOf(c)

  /** Shared all-NaN width table for the common empty case — a FontInfo
    * is built per (font, document), so per-instance 256-slot arrays
    * showed up as allocation stalls in JFR. Read-only by construction. */
  private[font] val noWidths: Array[Float] = Array.fill(256)(Float.NaN)

  /** Sparse fallback for codes outside printable ASCII (reference:
    * text.rs:183-347 fallback_char_to_unicode — punct/space subset). */
  val fallbackMap: Map[Int, String] = Map(
    0x09 -> "\t", 0x0a -> "\n", 0x0d -> "\n",
    0x2018 -> "‘", 0x2019 -> "’", 0x201c -> "“", 0x201d -> "”",
    0x2013 -> "–", 0x2014 -> "—", 0x2022 -> "•", 0x2026 -> "…")

  val default: FontInfo = FontInfo(
    baseFont = "Helvetica", subtype = "Type1", toUnicode = None,
    encTable = Some(Encodings.standard), diffs = Map.empty,
    isType0 = false, widths = noWidths,
    cidWidths = Map.empty, defaultWidth = 500f, flags = 0, isBold = false)

  def fromDict(doc: PdfDocument, fontDict: Dict): FontInfo = {
    def r(o: Option[PdfObj]): PdfObj = doc.resolve(o.getOrElse(Null))
    val subtype = fontDict.name("Subtype").getOrElse("Type1")
    val baseFont = r(fontDict.get("BaseFont")).asName.getOrElse("Unknown")
    val isType0 = subtype == "Type0"

    // descriptor: flags / StemV / weight cascade
    val descDict: Dict =
      if (isType0) {
        r(fontDict.get("DescendantFonts")).asArr.flatMap(_.headOption)
          .map(d => doc.resolveDict(d))
          .map(cid => doc.resolveDict(cid.get("FontDescriptor").getOrElse(Null)))
          .getOrElse(Dict.empty)
      } else doc.resolveDict(fontDict.get("FontDescriptor").getOrElse(Null))
    val flagsOpt = r(descDict.get("Flags")).asLong.map(_.toInt)
    val flags = flagsOpt.getOrElse(0)
    val stemVOpt = r(descDict.get("StemV")).asDouble
    val weightOpt = r(descDict.get("FontWeight")).asDouble
    val isBold = fontWeight(baseFont, weightOpt, flagsOpt, stemVOpt) >= 600

    // ToUnicode
    val toUnicode: Option[CMap] = r(fontDict.get("ToUnicode")) match {
      case s: Stream =>
        try {
          // cross-doc content-addressed cache: identical CMap streams
          // (fonts repeat across a crawl) parse once per JVM
          val cm = FontCache.cmap(doc.streamData(s))
          if (cm.isEmpty) None else Some(cm)
        } catch { case _: Throwable => None }
      case _ => None
    }

    if (isType0) {
      val cidDict = r(fontDict.get("DescendantFonts")).asArr
        .flatMap(_.headOption).map(doc.resolveDict).getOrElse(Dict.empty)
      val dw = r(cidDict.get("DW")).asDouble.getOrElse(1000.0).toFloat
      val cidWidths = parseCidWidths(doc, r(cidDict.get("W")))
      FontInfo(baseFont, subtype, toUnicode, encTable = None,
        diffs = Map.empty, isType0 = true,
        widths = noWidths, cidWidths = cidWidths,
        defaultWidth = dw, flags = flags, isBold = isBold)
    } else {
      // /Encoding: Name | Dict{BaseEncoding, Differences}
      // Default base: StandardEncoding (reference: font_dict.rs:414-534);
      // symbolic flag (bit 3) ⇒ built-in (handled by the cascade).
      var encTable: Option[Array[Char]] = Some(Encodings.standard)
      var diffs = Map.empty[Int, String]
      r(fontDict.get("Encoding")) match {
        case Name(n) => encTable = Encodings.byName(n).orElse(encTable)
        case d: Dict =>
          d.name("BaseEncoding").foreach(n => encTable = Encodings.byName(n).orElse(encTable))
          doc.dictGet(d, "Differences") match {
            case Arr(items) =>
              val m = mutable.HashMap.empty[Int, String]
              var code = 0
              items.foreach { it =>
                doc.resolve(it) match {
                  case Int64(v) => code = v.toInt
                  case Real(v)  => code = v.toInt
                  case Name(g) =>
                    Glyphs.lookup(g).foreach(u => m.update(code, u))
                    code += 1
                  case _ => ()
                }
              }
              diffs = m.toMap
            case _ => ()
          }
        case _ => ()
      }
      val symbolicFlag = (flags & (1 << 2)) != 0
      if (symbolicFlag && fontDict.get("Encoding").isEmpty) encTable = None

      // /Widths + FirstChar (share the all-NaN table when absent — a
      // fresh 256-float array per font per doc is allocation noise)
      val first = r(fontDict.get("FirstChar")).asLong.getOrElse(0L).toInt
      val widths = r(fontDict.get("Widths")) match {
        case Arr(ws) if ws.nonEmpty =>
          val a = Array.fill(256)(Float.NaN)
          var i = 0
          while (i < ws.length && first + i < 256) {
            doc.resolve(ws(i)).asDouble.foreach(w => a(first + i) = w.toFloat)
            i += 1
          }
          a
        case _ => noWidths
      }
      val missingWidth = r(descDict.get("MissingWidth")).asDouble.map(_.toFloat)
      // default width per the reference (font_dict.rs:351-363): fixed-
      // pitch flag → 600, other flagged fonts → 500, NO descriptor
      // flags → 550 middle ground. (/MissingWidth override kept — the
      // reference ignores it; honoring the spec field is a superset.)
      val dflt = missingWidth.getOrElse(flagsOpt match {
        case Some(f) => if ((f & 1) != 0) 600f else 500f
        case None    => 550f
      })
      FontInfo(baseFont, subtype, toUnicode, encTable, diffs,
        isType0 = false, widths = widths, cidWidths = Map.empty,
        defaultWidth = dflt, flags = flags, isBold = isBold)
    }
  }

  /** Numeric font weight (100-900) via the reference's priority
    * cascade (font_dict.rs:823-905): explicit /FontWeight (snapped to
    * the nearest 100-step, text_block.rs:111-123) → ForceBold flag →
    * name heuristics (black/heavy, extrabold, semibold-vs-bold,
    * medium, extralight-vs-light, thin) → StemV analysis (>110 bold,
    * 80-110 medium) → Normal. The explicit field OVERRIDES a bold
    * name — "Helvetica-Bold" with /FontWeight 300 renders light.
    *
    * Parity note: the reference reads ForceBold as mask 0x80000
    * ("bit 19"; font_dict.rs:836-843 + its own vector pinning 0x40000
    * as NOT ForceBold), where ISO 32000 Table 123's 1-based bit 19 is
    * 0x40000 — replicated as-is, byte-parity beats spec pedantry. */
  private[font] def fontWeight(baseFont: String, weightField: Option[Double],
                               flags: Option[Int], stemV: Option[Double]): Int =
    weightField match {
      case Some(w) => snapWeight(w)
      case None =>
        if (flags.exists(f => (f & 0x80000) != 0)) 700
        else {
          val n = baseFont.toLowerCase
          if (n.contains("black") || n.contains("heavy")) 900
          else if (n.contains("extrabold") || n.contains("ultrabold")) 800
          else if (n.contains("bold")) {
            if (n.contains("semibold") || n.contains("demibold")) 600 else 700
          }
          else if (n.contains("medium")) 500
          else if (n.contains("light")) {
            if (n.contains("extralight") || n.contains("ultralight")) 200 else 300
          }
          else if (n.contains("thin")) 100
          else stemV match {
            case Some(s) if s > 110.0  => 700
            case Some(s) if s >= 80.0  => 500
            case _                     => 400
          }
        }
    }

  /** Nearest standard weight (reference: text_block.rs:111-123). */
  private def snapWeight(w: Double): Int =
    if (w <= 150) 100 else if (w <= 250) 200 else if (w <= 350) 300
    else if (w <= 450) 400 else if (w <= 550) 500 else if (w <= 650) 600
    else if (w <= 750) 700 else if (w <= 850) 800 else 900

  /** CID /W array: [ c [w1 w2 …] | cFirst cLast w ]. */
  private def parseCidWidths(doc: PdfDocument, w: PdfObj): Map[Int, Float] = {
    w match {
      case Arr(items) =>
        val m = mutable.HashMap.empty[Int, Float]
        var i = 0
        while (i < items.length) {
          doc.resolve(items(i)) match {
            case Int64(c) =>
              if (i + 1 < items.length) {
                doc.resolve(items(i + 1)) match {
                  case Arr(ws) =>
                    var k = 0
                    ws.foreach { wv =>
                      doc.resolve(wv).asDouble.foreach(v => m.update(c.toInt + k, v.toFloat))
                      k += 1
                    }
                    i += 2
                  case Int64(cLast) =>
                    if (i + 2 < items.length) {
                      doc.resolve(items(i + 2)).asDouble.foreach { v =>
                        var cc = c.toInt
                        while (cc <= cLast.toInt && cc - c.toInt < 65536) { m.update(cc, v.toFloat); cc += 1 }
                      }
                    }
                    i += 3
                  case _ => i += 2
                }
              } else i += 1
            case _ => i += 1
          }
        }
        m.toMap
      case _ => Map.empty
    }
  }
}
