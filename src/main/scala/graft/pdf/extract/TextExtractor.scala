package graft.pdf.extract

import scala.collection.mutable
import graft.pdf.cos.PdfObj
import graft.pdf.cos.PdfObj._
import graft.pdf.content.{ContentParser, GraphicsStack, Matrix, Op}
import graft.pdf.doc.{Page, PdfDocument}
import graft.pdf.font.FontInfo

/** Content-stream VM → positioned `TextSpan`s.
  *
  * Re-implements the reference's span-mode extractor state machine
  * (reference: src/extractors/text.rs:1179-1919 execute_operator,
  * 614-641 extract_text_spans): TjBuffer batching, PDF 9.4.4 width
  * advance, TJ kerning with the −120 space-insertion threshold,
  * graphics/text state, Form-XObject recursion with cycle dedup, and
  * MCID stamping from BDC marked content.
  *
  * Deliberately replicated quirk: `'` and `"` show operators advance
  * position but their text is NOT emitted as spans, exactly like the
  * reference's span path (text.rs:1333-1360 vs 614-641 — their text
  * lands in the never-returned char vec). SURVEY §7.4.9.
  */
final class TextExtractor(
    doc: PdfDocument,
    /** TJ offset below which a synthetic space is inserted; negative
      * infinity disables insertion (reference: text.rs:44-98
      * TextExtractionConfig.space_insertion_threshold /
      * with_space_threshold, default -120). */
    spaceInsertionThreshold: Float = TextExtractor.DefaultSpaceInsertionThreshold) {

  private val gs = new GraphicsStack
  private var fonts = Map.empty[String, FontInfo]
  private var curFont: FontInfo = FontInfo.default
  private val spans = mutable.ArrayBuffer.empty[TextSpan]
  private var seq = 0
  private var curMcid = -1
  private val xobjectStack = mutable.HashSet.empty[Int]
  private var nestingDepth = 0

  // --- TjBuffer (reference: text.rs:96-161) ---
  // Raw char[] cursor, not a StringBuilder: the per-show bulk appends
  // paid ensureCapacity + latin1 canEncode probing per call (10% of
  // JFR samples); plain stores/arraycopy don't, and the final String
  // ctor compresses once at flush.
  private var bufArr = new Array[Char](256)
  private var bufLen = 0
  @inline private def bufEnsure(extra: Int): Unit =
    if (bufLen + extra > bufArr.length) {
      var c = bufArr.length << 1
      while (c < bufLen + extra) c <<= 1
      bufArr = java.util.Arrays.copyOf(bufArr, c)
    }
  private var bufStartX = 0f
  private var bufStartY = 0f
  private var bufFontName = ""
  private var bufFontSize = 0f
  private var bufBold = false
  private var bufMcid = -1
  private var bufColor = (0f, 0f, 0f)

  def extract(page: Page): Vector[TextSpan] = {
    val raw = extractRaw(page)
    val sorted = ReadingOrder.sortSpans(raw, page.mediaBox)
    ReadingOrder.mergeAdjacent(ReadingOrder.dedup(sorted))
  }

  /** Char-mode page extraction (legacy clustering path): every decoded
    * glyph with device position/advance, in emission order — feed to
    * `CharMode.convertPage`. */
  def extractChars(page: Page): Vector[graft.pdf.layout.CharMode.TextChar] = {
    val out = Vector.newBuilder[graft.pdf.layout.CharMode.TextChar]
    charSink = (s, x, y, w, fs, bold) =>
      out += graft.pdf.layout.CharMode.TextChar(s, x, y, w, fs, fs, bold)
    try { extractRaw(page); () } finally charSink = null
    out.result()
  }

  /** Raw spans in emission order (for structure-tree reordering). */
  def extractRaw(page: Page): Vector[TextSpan] = {
    val content = doc.pageContent(page)
    fonts = loadFonts(page.resources)
    ContentParser.parseInto(content)(op => exec(op, page.resources))
    flush()
    spans.toVector
  }

  private def loadFonts(resources: Dict): Map[String, FontInfo] = {
    doc.dictGet(resources, "Font") match {
      case fd: Dict =>
        fd.entries.keys.map { name =>
          // per-document FontInfo cache keyed by the font ref (fonts
          // are shared across pages; reference analog: font caching,
          // docs/ARCHITECTURE.md:255-260)
          val cacheKey: AnyRef = fd.get(name).getOrElse(Null) match {
            case r: PdfObj.Ref => java.lang.Integer.valueOf(r.id)
            case other         => other
          }
          name -> doc.fontInfoCache.getOrElseUpdate(cacheKey, {
            val fdict = doc.resolveDict(fd.get(name).getOrElse(Null))
            try FontInfo.fromDict(doc, fdict)
            catch { case _: Throwable => FontInfo.default }
          })
        }.toMap
      case _ => Map.empty
    }
  }

  private def num(o: PdfObj): Float = o match {
    case Int64(v) => v.toFloat
    case Real(v)  => v.toFloat
    case _        => 0f
  }

  /** Positional slot access with the reference's per-slot defaults
    * (parser.rs:162-420 build_operator + :551-575 get_number family):
    * a MISSING or NON-NUMERIC slot takes the default — malformed
    * operand lists never drop the operator wholesale. `100 Td` moves
    * (tx=100, ty=0); bare `Tz` resets scaling to 100. */
  private def numAt(o: scala.collection.IndexedSeq[PdfObj], i: Int, dflt: Float): Float =
    if (i < o.size) o(i) match {
      case Int64(v) => v.toFloat
      case Real(v)  => v.toFloat
      case _        => dflt
    } else dflt

  /** get_integer analog: only an Integer slot counts (parser.rs:559). */
  private def intAt(o: scala.collection.IndexedSeq[PdfObj], i: Int, dflt: Int): Int =
    if (i < o.size) o(i) match {
      case Int64(v) => v.toInt
      case _        => dflt
    } else dflt

  private def exec(op: Op, resources: Dict): Unit = {
    val o = op.operands
    op.name match {
      case "BT" =>
        gs.state = gs.state.copy(textMatrix = Matrix.identity, textLineMatrix = Matrix.identity)
      case "ET" => flush()
      case "Tf" =>
        flush()
        val name = if (o.nonEmpty) o(0).asName.getOrElse("") else ""
        gs.state = gs.state.copy(fontName = name, fontSize = numAt(o, 1, 12f))
        curFont = fonts.getOrElse(name, FontInfo.default)
      case "Tm" =>
        flush()
        val m = Matrix(numAt(o, 0, 1f), numAt(o, 1, 0f), numAt(o, 2, 0f),
          numAt(o, 3, 1f), numAt(o, 4, 0f), numAt(o, 5, 0f))
        gs.state = gs.state.copy(textMatrix = m, textLineMatrix = m)
      case "Td" => td(numAt(o, 0, 0f), numAt(o, 1, 0f))
      case "TD" =>
        gs.state = gs.state.copy(leading = -numAt(o, 1, 0f))
        td(numAt(o, 0, 0f), numAt(o, 1, 0f))
      case "T*" => td(0f, -gs.state.leading)
      case "Tj" if o.nonEmpty =>
        o(0) match { case Str(b) => showText(b, emit = true); case _ => () }
      case "TJ" if o.nonEmpty =>
        o(0) match { case Arr(items) => processTJ(items); case _ => () }
      case "'" =>
        // quirk: advances but never emits spans (see class doc); the
        // advance happens even with NO operand (Quote{text:""} default)
        td(0f, -gs.state.leading)
        if (o.nonEmpty) o(0) match { case Str(b) => showText(b, emit = false); case _ => () }
      case "\"" =>
        gs.state = gs.state.copy(wordSpacing = numAt(o, 0, 0f), charSpacing = numAt(o, 1, 0f))
        td(0f, -gs.state.leading)
        if (o.size >= 3) o(2) match { case Str(b) => showText(b, emit = false); case _ => () }
      case "Tc" => gs.state = gs.state.copy(charSpacing = numAt(o, 0, 0f))
      case "Tw" => gs.state = gs.state.copy(wordSpacing = numAt(o, 0, 0f))
      case "Tz" => gs.state = gs.state.copy(horizScaling = numAt(o, 0, 100f) / 100f)
      case "TL" => gs.state = gs.state.copy(leading = numAt(o, 0, 0f))
      case "Ts" => gs.state = gs.state.copy(rise = numAt(o, 0, 0f))
      case "Tr" => gs.state = gs.state.copy(renderMode = intAt(o, 0, 0))
      case "q" => gs.push()
      case "Q" => flush(); gs.pop(); curFont = fonts.getOrElse(gs.state.fontName, curFont)
      case "cm" =>
        val m = Matrix(numAt(o, 0, 1f), numAt(o, 1, 0f), numAt(o, 2, 0f),
          numAt(o, 3, 1f), numAt(o, 4, 0f), numAt(o, 5, 0f))
        gs.state = gs.state.copy(ctm = m.multiply(gs.state.ctm))
      case "rg" =>
        gs.state = gs.state.copy(fillColor = (numAt(o, 0, 0f), numAt(o, 1, 0f), numAt(o, 2, 0f)))
      case "g" =>
        val v = numAt(o, 0, 0f); gs.state = gs.state.copy(fillColor = (v, v, v))
      case "k" =>
        gs.state = gs.state.copy(fillColor =
          cmykToRgb(numAt(o, 0, 0f), numAt(o, 1, 0f), numAt(o, 2, 0f), numAt(o, 3, 0f)))
      // stroke-color family (reference: text.rs:1399-1421)
      case "RG" =>
        gs.state = gs.state.copy(strokeColor = (numAt(o, 0, 0f), numAt(o, 1, 0f), numAt(o, 2, 0f)))
      case "G" =>
        val v = numAt(o, 0, 0f); gs.state = gs.state.copy(strokeColor = (v, v, v))
      case "K" =>
        gs.state = gs.state.copy(strokeColor =
          cmykToRgb(numAt(o, 0, 0f), numAt(o, 1, 0f), numAt(o, 2, 0f), numAt(o, 3, 0f)))
      // color-space selection resets the color (text.rs:1423-1441);
      // missing operand defaults to /DeviceGray (parser.rs:308-316)
      case "cs" =>
        gs.state = gs.state.copy(
          fillColorSpace = colorSpaceFamily(
            if (o.nonEmpty) o(0) else Name("DeviceGray"), resources),
          fillColor = (0f, 0f, 0f))
      case "CS" =>
        gs.state = gs.state.copy(
          strokeColorSpace = colorSpaceFamily(
            if (o.nonEmpty) o(0) else Name("DeviceGray"), resources),
          strokeColor = (0f, 0f, 0f))
      // component color in the current space (text.rs:1443-1604)
      case "sc" | "scn" =>
        gs.state = gs.state.copy(fillColor =
          componentColor(gs.state.fillColorSpace, o, gs.state.fillColor))
      case "SC" | "SCN" =>
        gs.state = gs.state.copy(strokeColor =
          componentColor(gs.state.strokeColorSpace, o, gs.state.strokeColor))
      case "BDC" if o.size >= 2 =>
        flush()
        o(1) match {
          case d: Dict => curMcid = d.long("MCID").map(_.toInt).getOrElse(-1)
          case _       => ()
        }
      case "BMC" => flush()
      case "EMC" => flush(); curMcid = -1
      case "Do" if o.nonEmpty =>
        o(0).asName.foreach(name => doXObject(name, resources))
      case _ => () // path/painting/color-space/line-state ops: no text effect
    }
  }

  private def td(tx: Float, ty: Float): Unit = {
    flush()
    val nlm = Matrix.translation(tx, ty).multiply(gs.state.textLineMatrix)
    gs.state = gs.state.copy(textMatrix = nlm, textLineMatrix = nlm)
  }

  /** Form XObject recursion with ObjectRef dedup
    * (reference: text.rs:1901-1910, 1924-2081). */
  private def doXObject(name: String, resources: Dict): Unit = {
    if (nestingDepth > 12) return
    val xobjs = doc.dictGet(resources, "XObject") match {
      case d: Dict => d
      case _       => return
    }
    val refId = xobjs.get(name) match { case Some(Ref(id, _)) => id; case _ => -1 }
    if (refId >= 0 && !xobjectStack.add(refId)) return // cycle
    try {
      doc.resolve(xobjs.get(name).getOrElse(Null)) match {
        case s @ Stream(d, _) if d.name("Subtype").contains("Form") =>
          flush()
          gs.push()
          d.get("Matrix").flatMap(m => doc.resolve(m).asArr) match {
            case Some(xs) if xs.size >= 6 =>
              val v = xs.map(x => doc.resolve(x).asDouble.getOrElse(0.0).toFloat)
              gs.state = gs.state.copy(ctm =
                Matrix(v(0), v(1), v(2), v(3), v(4), v(5)).multiply(gs.state.ctm))
            case _ => ()
          }
          val formRes = doc.dictGet(d, "Resources") match {
            case rd: Dict => rd
            case _        => resources
          }
          val savedFonts = fonts
          val savedFont = curFont
          fonts = loadFonts(formRes)
          nestingDepth += 1
          try {
            val content = try doc.streamData(s) catch { case _: Throwable => Array.emptyByteArray }
            ContentParser.parseInto(content)(op => exec(op, formRes))
          } finally {
            nestingDepth -= 1
            flush()
            fonts = savedFonts
            curFont = savedFont
            gs.pop()
          }
        case _ => () // Image XObjects skipped
      }
    } finally { if (refId >= 0) xobjectStack.remove(refId) }
  }

  /** TJ array: strings buffer, offsets advance; offset < −120 ⇒ flush +
    * synthetic word break (reference: text.rs:2194-2282). */
  private def processTJ(items: Vector[PdfObj]): Unit = {
    items.foreach {
      case Str(b) => showText(b, emit = true)
      case n @ (Int64(_) | Real(_)) =>
        val off = num(n)
        if (off < spaceInsertionThreshold) {
          // (the former buf.toString.endsWith(" ") materialized the
          // whole buffered run per TJ offset)
          if (bufLen > 0 && bufArr(bufLen - 1) != ' ') {
            bufEnsure(1); bufArr(bufLen) = ' '; bufLen += 1
          }
        }
        val st = gs.state
        val tx = (-off / 1000f) * st.fontSize * st.horizScaling
        gs.state = st.copy(textMatrix = Matrix.translation(tx, 0f).multiply(st.textMatrix))
      case _ => ()
    }
  }

  /** Decode + advance; emit=false replicates the `'`/`"` char-mode quirk.
    * Per-glyph advances are pure x-translations in text space, which
    * compose additively — so the width sum is accumulated in a local and
    * the text matrix updated ONCE per string (a per-glyph
    * GraphicsState/Matrix allocation here dominated the whole job's
    * profile). */
  /** Optional char-mode sink (legacy clustering path): receives every
    * decoded glyph as (text, x, y, width, effFontSize, bold) in device
    * space — INCLUDING `'`/`"` show-operator text that the span path
    * deliberately drops (reference parity: the char vec gets it,
    * text.rs:1333-1360). Null (the default) costs nothing. */
  var charSink: (String, Float, Float, Float, Float, Boolean) => Unit = null

  /** Reusable per-Tj glyph staging buffer: single-char decodes (the
    * overwhelming case) batch here and reach `buf` as ONE bulk range
    * append per show operator — per-glyph StringBuilder.append(char)
    * paid ensureCapacity + coder checks per character (10% of
    * mixed-corpus JFR samples). Capacity: single-char glyph count ≤
    * code count ≤ bytes.length. */
  private var glyphScratch: Array[Char] = new Array[Char](256)

  private def showText(bytes: Array[Byte], emit: Boolean): Unit = {
    if (emit && bufLen == 0) startBuffer()
    val st = gs.state
    val nBytes = curFont.codeBytes
    val wantChars = charSink != null
    // device-space frame for char positions (computed only in char mode)
    val trm0 = if (wantChars) st.textMatrix.multiply(st.ctm) else null
    if (emit && glyphScratch.length < bytes.length)
      glyphScratch = new Array[Char](bytes.length)
    val stage = glyphScratch
    var staged = 0
    var totalTx = 0f
    var i = 0
    while (i < bytes.length) {
      val code: Int =
        if (nBytes == 2 && i + 1 < bytes.length) {
          val c = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff); i += 2; c
        } else { val c = bytes(i) & 0xff; i += 1; c }
      // PDF 9.4.4 advance: tx = (w0/1000·Tfs + Tc + Tw[space]) · Th
      val w0 = curFont.width(code)
      val isSpaceCode = nBytes == 1 && code == 32
      val adv = ((w0 / 1000f) * st.fontSize + st.charSpacing +
        (if (isSpaceCode) st.wordSpacing else 0f)) * st.horizScaling
      if (emit && !wantChars) {
        // single-char fast lane: no String materialization, no charAt
        val c1 = curFont.decodeCharOrZero(code)
        if (c1 != 0) {
          if (c1 >= ' ' || c1 == '\t' || c1 == '\n' || c1 == '\r') {
            stage(staged) = c1; staged += 1
          }
        } else {
          val s = curFont.decodeOrNull(code)
          if (s != null) {
            if (staged > 0) {
              bufEnsure(staged)
              System.arraycopy(stage, 0, bufArr, bufLen, staged)
              bufLen += staged
              staged = 0
            }
            appendClean(s)
          }
        }
      } else if (emit || wantChars) {
        val s = curFont.decodeOrNull(code)
        if (s != null) {
          if (emit) {
            if (s.length == 1) {
              val c = s.charAt(0)
              if (c >= ' ' || c == '\t' || c == '\n' || c == '\r') {
                stage(staged) = c; staged += 1
              }
            } else {
              // rare multi-char (ligature) decode: keep order — drain
              // the staged run first, then the general cleaned append
              if (staged > 0) {
                bufEnsure(staged)
                System.arraycopy(stage, 0, bufArr, bufLen, staged)
                bufLen += staged
                staged = 0
              }
              appendClean(s)
            }
          }
          // unmappable: dropped (reference skips, no U+FFFD)
          if (wantChars)
            charSink(s, trm0.e + totalTx * trm0.scaleX, trm0.f + st.rise,
              adv * trm0.scaleX, st.fontSize * trm0.scaleY, curFont.isBold)
        }
      }
      totalTx += adv
    }
    if (staged > 0) {
      bufEnsure(staged)
      System.arraycopy(stage, 0, bufArr, bufLen, staged)
      bufLen += staged
    }
    if (totalTx != 0f)
      gs.state = st.copy(textMatrix = Matrix.translation(totalTx, 0f).multiply(st.textMatrix))
  }

  /** Control chars except \t\n\r are dropped (reference: text.rs:2536-2545). */
  private def appendClean(s: String): Unit = {
    val n = s.length
    bufEnsure(n) // worst case: every char survives the filter
    if (n == 1) {
      val c = s.charAt(0)
      if (c >= ' ' || c == '\t' || c == '\n' || c == '\r') {
        bufArr(bufLen) = c; bufLen += 1
      }
      return
    }
    // multi-char (ligature) path: verify once, bulk-copy
    var i = 0
    while (i < n && {
      val c = s.charAt(i); c >= ' ' || c == '\t' || c == '\n' || c == '\r'
    }) i += 1
    s.getChars(0, i, bufArr, bufLen)
    bufLen += i
    while (i < n) {
      val c = s.charAt(i)
      if (c >= ' ' || c == '\t' || c == '\n' || c == '\r') {
        bufArr(bufLen) = c; bufLen += 1
      }
      i += 1
    }
  }

  private def startBuffer(): Unit = {
    val st = gs.state
    val trm = st.textMatrix.multiply(st.ctm)
    bufStartX = trm.e
    bufStartY = trm.f + st.rise
    bufFontName = st.fontName
    bufFontSize = st.fontSize * trm.scaleY
    bufBold = curFont.isBold
    bufMcid = curMcid
    bufColor = st.fillColor
  }

  /** CMYK → RGB: R = 1 − min(1, C·(1−K) + K) (reference: text.rs:2603-2608). */
  @inline private def cmykToRgb(c: Float, m: Float, y: Float, k: Float): (Float, Float, Float) =
    (1f - math.min(1f, c * (1f - k) + k),
     1f - math.min(1f, m * (1f - k) + k),
     1f - math.min(1f, y * (1f - k) + k))

  private val KnownFamilies = Set("DeviceGray", "DeviceRGB", "DeviceCMYK",
    "CalGray", "CalRGB", "Lab", "ICCBased", "Separation", "DeviceN",
    "Indexed", "Pattern")

  /** cs/CS operand → color-space family: device names pass through;
    * resource keys resolve via /ColorSpace to the array head name. */
  private def colorSpaceFamily(operand: PdfObj, resources: Dict): String =
    operand.asName match {
      case Some(n) if KnownFamilies.contains(n) => n
      case Some(n) =>
        doc.dictGet(resources, "ColorSpace") match {
          case csDict: Dict =>
            csDict.get(n).map(doc.resolve) match {
              case Some(Arr(items)) if items.nonEmpty =>
                items.head.asName.getOrElse(n)
              case Some(other) => other.asName.getOrElse(n)
              case None        => n
            }
          case _ => n
        }
      case None => "DeviceRGB"
    }

  /** sc/scn components → RGB in the active space (reference:
    * text.rs:1443-1604 — Lab/Separation/DeviceN use the same
    * simplified conversions). Non-numeric operands (pattern names)
    * are ignored; unknown spaces keep the current color. */
  private def componentColor(family: String, o: scala.collection.IndexedSeq[PdfObj],
                             cur: (Float, Float, Float)): (Float, Float, Float) = {
    val comps = o.flatMap(_.asDouble).map(_.toFloat)
    family match {
      case "DeviceGray" | "CalGray" if comps.length >= 1 =>
        val v = comps(0); (v, v, v)
      case "DeviceRGB" | "CalRGB" if comps.length >= 3 =>
        (comps(0), comps(1), comps(2))
      case "Lab" if comps.length >= 3 =>
        val l = comps(0) / 100f; (l, l, l)
      case "DeviceCMYK" if comps.length >= 4 =>
        cmykToRgb(comps(0), comps(1), comps(2), comps(3))
      case "ICCBased" =>
        if (comps.length >= 4) cmykToRgb(comps(0), comps(1), comps(2), comps(3))
        else if (comps.length == 3) (comps(0), comps(1), comps(2))
        else if (comps.length == 1) { val v = comps(0); (v, v, v) }
        else cur
      case "Separation" if comps.length >= 1 =>
        val g = 1f - comps(0); (g, g, g) // tint 0 = white, 1 = full ink
      case "DeviceN" if comps.nonEmpty =>
        if (comps.length >= 4) cmykToRgb(comps(0), comps(1), comps(2), comps(3))
        else { val g = 1f - comps(0); (g, g, g) }
      case _ => cur
    }
  }

  /** Emit the buffered run as one TextSpan (reference: TjBuffer flush). */
  private def flush(): Unit = {
    if (bufLen > 0) {
      val text = new String(bufArr, 0, bufLen)
      bufLen = 0
      if (text.nonEmpty) {
        val st = gs.state
        val trm = st.textMatrix.multiply(st.ctm)
        val endX = trm.e
        val size = if (bufFontSize > 0) bufFontSize else 12f
        val x0 = math.min(bufStartX, endX)
        val x1 = math.max(bufStartX, endX)
        spans += TextSpan(text, Rect(x0, bufStartY, x1, bufStartY + size),
          bufFontName, size, bufBold, bufMcid, seq, bufColor)
        seq += 1
      }
    }
  }
}

object TextExtractor {
  /** reference: text.rs:44-55 — TextExtractionConfig default. */
  final val DefaultSpaceInsertionThreshold: Float = -120f
}
