package graft.pdf.convert

import graft.pdf.extract.TextSpan

/** Structured element export (reference: src/extractors/structured.rs:
  * 47-115 — StructuredDocument / DocumentElement + JSON serialization):
  * the span stream classified into heading/paragraph/list-item elements
  * with page + level metadata, serialized as deterministic JSON.
  */
object Structured {

  final case class DocumentElement(
      elemType: String, // heading | paragraph | list_item
      level: Int,       // heading level (0 for non-headings)
      page: Int,
      text: String)

  private def headingLevel(size: Float, bold: Boolean): Int =
    if (bold && size >= 22f) 1
    else if (bold && size >= 16f) 2
    else if (bold && size >= 14f) 3
    else 0

  private val bulletChars = Set('•', '-', '*', '·', '○', '▪')

  /** Sorted spans of one page → element stream. Lines group at ΔY<2pt;
    * consecutive body lines with small leading merge into paragraphs. */
  def elements(spans: Vector[TextSpan], page: Int): Vector[DocumentElement] = {
    if (spans.isEmpty) return Vector.empty
    // Y-proximity line groups, order-independent
    val lines = graft.pdf.extract.ReadingOrder.groupLines(spans)

    val out = Vector.newBuilder[DocumentElement]
    val para = new StringBuilder
    var prevLine: Vector[TextSpan] = Vector.empty
    def flushPara(): Unit = {
      if (para.nonEmpty) {
        out += DocumentElement("paragraph", 0, page, para.toString)
        para.clear()
      }
    }
    lines.foreach { line =>
      val text = line.map(_.text).mkString(" ").trim
      if (text.nonEmpty) {
        val maxSize = line.iterator.map(_.fontSize).max
        val bold = line.forall(_.isBold)
        val level = headingLevel(maxSize, bold)
        val isBullet = text.length > 2 && bulletChars.contains(text.charAt(0)) &&
          text.charAt(1) == ' '
        if (level > 0) {
          flushPara()
          out += DocumentElement("heading", level, page, text)
        } else if (isBullet) {
          flushPara()
          out += DocumentElement("list_item", 0, page, text.substring(2).trim)
        } else {
          val gap = if (prevLine.nonEmpty)
            prevLine.head.bbox.y0 - line.head.bbox.y0 else 0f
          val lh = math.max(1f, maxSize * 1.2f)
          if (para.nonEmpty && gap > 1.8f * lh) flushPara()
          if (para.nonEmpty) para.append(' ')
          para.append(text)
        }
        prevLine = line
      }
    }
    flushPara()
    out.result()
  }

  /** Deterministic JSON (no library dependency; escape per RFC 8259). */
  def toJson(elems: Vector[DocumentElement]): String = {
    def esc(s: String): String = {
      val sb = new StringBuilder(s.length + 8)
      s.foreach {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.toString
    }
    elems.map { e =>
      s"""{"type":"${e.elemType}","level":${e.level},"page":${e.page},"text":"${esc(e.text)}"}"""
    }.mkString("[", ",", "]")
  }
}
