package graft.pdf.convert

import graft.pdf.extract.TextSpan

/** Sorted spans → plain text: newline count from vertical gaps, spaces
  * from horizontal gaps (reference: src/document.rs:1683-1760).
  *
  * Assembles straight into a char[] handed to `Whitespace.cleanArray`
  * (zero-copy): the former java.lang.StringBuilder paid a latin1
  * byte←char compression check on every append AND a byte→char
  * expansion in the cleaner's bulk copy — cleanPlainText was 21% of
  * large-doc leaf samples with those conversions inside (r5 JFR).
  * Capacity proof: per span, at most 3 separator chars (the 1–3
  * newline run; the space path emits 1) + the span text.
  */
object TextAssembler {

  def assemble(spans: Vector[TextSpan]): String = {
    if (spans.isEmpty) return ""
    // manual length tally: iterator.map(...).sum reduces over boxed
    // Ints per span (JFR-visible on the per-page path)
    var cap = spans.size * 3
    spans.foreach(s => cap += s.text.length)
    val buf = new Array[Char](cap)
    var pos = 0
    var prev: TextSpan = null
    spans.foreach { s =>
      val t = s.text
      if (prev == null) {
        t.getChars(0, t.length, buf, pos); pos += t.length
      } else {
        val yDiff = prev.bbox.y0 - s.bbox.y0 // positive going down the page
        if (yDiff > 2f) {
          // 1–3 newlines by yDiff / line height (reference: document.rs:1686-1717)
          val lineHeight = math.max(1f, prev.fontSize * 1.2f)
          val n = math.max(1, math.min(3, math.round(yDiff / lineHeight)))
          var k = 0
          while (k < n) { buf(pos) = '\n'; pos += 1; k += 1 }
          t.getChars(0, t.length, buf, pos); pos += t.length
        } else if (yDiff < -2f) {
          // upward jump (new column start already handled by sort): newline
          buf(pos) = '\n'; pos += 1
          t.getChars(0, t.length, buf, pos); pos += t.length
        } else {
          // same line: space iff 0.25×font < gap < 5×font
          // (reference: document.rs:1738-1760 should_insert_space)
          val gap = s.bbox.x0 - prev.bbox.x1
          val fs = math.max(1f, prev.fontSize)
          if (gap > 0.25f * fs && gap < 5f * fs &&
              !(pos > 0 && buf(pos - 1) == ' ') && !t.startsWith(" ")) {
            buf(pos) = ' '; pos += 1
          }
          t.getChars(0, t.length, buf, pos); pos += t.length
        }
      }
      prev = s
    }
    Whitespace.cleanArray(buf, pos, markdown = false)
  }
}
