package graft.pdf.font

import scala.collection.mutable
import graft.pdf.cos.{ObjParser, PdfObj}

/** ToUnicode CMap: code → Unicode string (ligatures expand to multiple
  * chars). Parsed from bfchar/bfrange sections; destination hex strings
  * are UTF-16BE (surrogate pairs supported).
  * (reference: src/fonts/cmap.rs:17-122)
  */
final class CMap(
    val map: Map[Int, String],
    /** max code length in bytes seen in codespacerange (1 or 2). */
    val codeBytes: Int) {
  def get(code: Int): Option[String] = map.get(code)
  def isEmpty: Boolean = map.isEmpty

  /** Dense lookup for low codes that map to EXACTLY one char the
    * decode cascade would accept (non-NUL, non-U+FFFD — FontInfo
    * skips replacement-char mappings): the Type0 glyph hot loop reads
    * this instead of a boxed `Map[Int,String]` probe per glyph.
    * Built at most once per CMap INSTANCE — FontCache shares instances
    * across documents, so the cost amortizes over the whole corpus
    * (a per-FontInfo table measurably regressed: per-(font,doc)
    * allocation+zeroing outweighed the per-glyph win). 0 = no 1-char
    * mapping here, caller takes the slow cascade. @volatile for safe
    * publication across executor threads; the build is deterministic,
    * so a lost race just rebuilds the identical array. */
  @volatile private var charTab: Array[Char] = null
  private[font] def singleCharTable: Array[Char] = {
    var t = charTab
    if (t == null) {
      var maxCode = -1
      map.foreach { case (c, s) =>
        if (c >= 0 && c < CMap.DenseCap && s.length == 1) {
          val ch = s.charAt(0)
          if (ch != 0 && ch != '�' && c > maxCode) maxCode = c
        }
      }
      t = new Array[Char](maxCode + 1)
      map.foreach { case (c, s) =>
        if (c >= 0 && c <= maxCode && s.length == 1) {
          val ch = s.charAt(0)
          if (ch != 0 && ch != '�') t(c) = ch
        }
      }
      charTab = t
    }
    t
  }
}

object CMap {
  val empty = new CMap(Map.empty, 1)
  /** Dense-table code bound: CID fonts assign glyph ids from 0 upward,
    * so real 2-byte codes cluster far below this. */
  private[font] final val DenseCap = 4096

  def parse(data: Array[Byte]): CMap = {
    val p = new ObjParser(data, 0)
    val out = mutable.HashMap.empty[Int, String]
    var codeBytes = 1
    // pending operand stack (hex strings / numbers / arrays)
    val stack = mutable.ArrayBuffer.empty[PdfObj]
    while (!p.atEnd) {
      p.skipWs()
      if (!p.atEnd) {
        val c = p.data(p.pos) & 0xff
        if (c == '<' && (p.pos + 1 >= p.data.length || (p.data(p.pos + 1) & 0xff) != '<') ||
            c == '[' || c == '(' || c == '/' ||
            (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.') {
          try stack += p.parseObject()
          catch { case _: Throwable => p.pos += 1 }
        } else if (c == '<') { // << dict (CIDSystemInfo etc.) — parse & drop
          try { p.parseObject(); () } catch { case _: Throwable => p.pos += 1 }
        } else {
          val start = p.pos
          while (!p.atEnd && p.isRegular(p.data(p.pos) & 0xff)) p.pos += 1
          if (p.pos == start) p.pos += 1
          else {
            val kw = new String(p.data, start, p.pos - start, "ISO-8859-1")
            kw match {
              case "begincodespacerange" =>
                val section = readSection(p, "endcodespacerange")
                section.foreach {
                  case PdfObj.Str(b) => codeBytes = math.max(codeBytes, b.length)
                  case _             => ()
                }
              case "beginbfchar" =>
                val sec = readSection(p, "endbfchar")
                var i = 0
                while (i + 1 < sec.length) {
                  (sec(i), sec(i + 1)) match {
                    case (PdfObj.Str(src), PdfObj.Str(dst)) =>
                      out.update(beInt(src), utf16be(dst))
                    case _ => ()
                  }
                  i += 2
                }
              case "beginbfrange" =>
                val sec = readSection(p, "endbfrange")
                var i = 0
                while (i + 2 < sec.length) {
                  (sec(i), sec(i + 1), sec(i + 2)) match {
                    case (PdfObj.Str(lo), PdfObj.Str(hi), PdfObj.Str(dst)) =>
                      val l = beInt(lo); val h = beInt(hi)
                      val base = utf16be(dst)
                      var code = l
                      while (code <= h && code - l < 65536) {
                        // increment the LAST code unit of the base string
                        out.update(code, incrementLast(base, code - l))
                        code += 1
                      }
                    case (PdfObj.Str(lo), PdfObj.Str(hi), PdfObj.Arr(items)) =>
                      val l = beInt(lo); val h = beInt(hi)
                      var k = 0
                      while (k < items.length && l + k <= h) {
                        items(k) match {
                          case PdfObj.Str(dst) => out.update(l + k, utf16be(dst))
                          case _               => ()
                        }
                        k += 1
                      }
                    case _ => ()
                  }
                  i += 3
                }
              case _ => stack.clear() // usecmap, endcmap, def, … reset operands
            }
            if (kw.startsWith("begin")) stack.clear()
          }
        }
      }
    }
    new CMap(out.toMap, codeBytes)
  }

  private def readSection(p: ObjParser, endKw: String): Vector[PdfObj] = {
    val items = Vector.newBuilder[PdfObj]
    var done = false
    while (!done && !p.atEnd) {
      p.skipWs()
      if (p.peekKeyword(endKw)) { p.pos += endKw.length; done = true }
      else if (p.atEnd) done = true
      else {
        try items += p.parseObject()
        catch { case _: Throwable => p.pos += 1 }
      }
    }
    items.result()
  }

  @inline private def beInt(b: Array[Byte]): Int = {
    var v = 0
    var i = 0
    while (i < b.length && i < 4) { v = (v << 8) | (b(i) & 0xff); i += 1 }
    v
  }

  /** Destination bytes are UTF-16BE code units. */
  def utf16be(b: Array[Byte]): String = {
    if (b.length % 2 != 0) {
      // odd-length: treat as single byte codes (lenient)
      return new String(b.map(x => (x & 0xff).toChar))
    }
    val sb = new java.lang.StringBuilder(b.length / 2)
    var i = 0
    while (i + 1 < b.length) {
      sb.append((((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)).toChar)
      i += 2
    }
    sb.toString
  }

  private def incrementLast(base: String, delta: Int): String = {
    if (base.isEmpty) return base
    if (delta == 0) return base
    val last = base.charAt(base.length - 1)
    base.substring(0, base.length - 1) + (last + delta).toChar
  }
}
