package graft.pdf.content

import scala.collection.mutable
import graft.pdf.cos.{ObjParser, PdfObj}

/** One content-stream operator: postfix operands + operator name.
  * The reference models 50+ typed enum variants
  * (reference: src/content/operators.rs:13-457); here a single generic
  * node + name dispatch in the executor is the idiomatic Scala shape —
  * validation happens at execution where operand counts matter.
  */
final case class Op(name: String, operands: Vector[PdfObj])

/** Content-stream tokenizer/parser
  * (reference: src/content/parser.rs:56-133): collect operands until an
  * operator keyword, emit, recover from garbage with a 1-byte skip.
  * Inline images `BI … ID <binary> EI` are consumed without corrupting
  * the stream (reference: src/content/parser.rs:597-681).
  */
object ContentParser {

  /** Names that are content operators (superset is harmless — any
    * regular-char run that is not a number/bool/null is treated as an
    * operator; this set only gates multi-char lookups where needed). */
  private val knownOps: Set[String] = Set(
    "BT", "ET", "Tf", "Tm", "Td", "TD", "T*", "Tj", "TJ", "'", "\"",
    "Tc", "Tw", "Tz", "TL", "Ts", "Tr",
    "q", "Q", "cm", "rg", "RG", "g", "G", "k", "K",
    "cs", "CS", "sc", "SC", "scn", "SCN",
    "w", "d", "J", "j", "M", "ri", "i", "gs", "sh",
    "m", "l", "c", "v", "y", "h", "re",
    "S", "s", "f", "F", "f*", "B", "B*", "b", "b*", "n",
    "W", "W*", "Do", "BMC", "BDC", "EMC", "MP", "DP",
    "BI", "ID", "EI", "BX", "EX", "d0", "d1", "Tk")

  def parse(data: Array[Byte]): Vector[Op] = {
    val ops = Vector.newBuilder[Op]
    parseInto(data)(op => ops += op)
    ops.result()
  }

  /** Streaming variant: ops are dispatched to `sink` as they complete,
    * with no materialized op list — the VM fuses parse+exec this way
    * (one fewer Vector per page on the hot path). */
  def parseInto(data: Array[Byte])(sink: Op => Unit): Unit = {
    val operands = mutable.ArrayBuffer.empty[PdfObj]
    val p = new ObjParser(data, 0)
    while (!p.atEnd) {
      p.skipWs()
      if (!p.atEnd) {
        val c = p.data(p.pos) & 0xff
        if (c == '/' || c == '(' || c == '[' || c == '<' ||
            (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.') {
          try operands += p.parseObject()
          catch { case _: Throwable => p.pos += 1 } // 1-byte-skip recovery
        } else if (c == ')' || c == ']' || c == '>' || c == '}' || c == '{') {
          p.pos += 1 // stray delimiter: skip
        } else {
          // operator keyword: run of regular chars, or ' / "
          val start = p.pos
          if (c == '\'' || c == '"') p.pos += 1
          else {
            while (!p.atEnd && p.isRegular(p.data(p.pos) & 0xff)) p.pos += 1
          }
          if (p.pos == start) p.pos += 1 // safety: always advance
          else {
            val name = new String(p.data, start, p.pos - start, "ISO-8859-1")
            name match {
              case "true"  => operands += PdfObj.Bool(true)
              case "false" => operands += PdfObj.Bool(false)
              case "null"  => operands += PdfObj.Null
              case "BI" =>
                consumeInlineImage(p)
                sink(Op("BI", Vector.empty))
                operands.clear()
              case _ =>
                sink(Op(name, operands.toVector))
                operands.clear()
            }
          }
        }
      }
    }
  }

  /** Consume `…ID <binary> EI`; the dict keys were already consumed by
    * the operand loop would be wrong — so BI triggers parsing key/value
    * pairs here until ID, then scans for a whitespace-delimited EI. */
  private def consumeInlineImage(p: ObjParser): Unit = {
    // parse key/value pairs until ID
    var done = false
    while (!done && !p.atEnd) {
      p.skipWs()
      if (p.peekKeyword("ID")) { p.pos += 2; done = true }
      else {
        try { p.parseObject(); () }
        catch { case _: Throwable => p.pos += 1 }
      }
    }
    // single whitespace byte after ID, then binary data until EI
    if (!p.atEnd && p.isWs(p.data(p.pos) & 0xff)) p.pos += 1
    var found = false
    while (!found && p.pos < p.data.length - 1) {
      if (p.data(p.pos) == 'E' && p.data(p.pos + 1) == 'I' &&
          (p.pos == 0 || p.isWs(p.data(p.pos - 1) & 0xff)) &&
          (p.pos + 2 >= p.data.length || !p.isRegular(p.data(p.pos + 2) & 0xff))) {
        p.pos += 2
        found = true
      } else p.pos += 1
    }
    if (!found) p.pos = p.data.length
  }
}
