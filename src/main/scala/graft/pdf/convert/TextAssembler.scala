package graft.pdf.convert

import graft.pdf.extract.TextSpan

/** Sorted spans → plain text: newline count from vertical gaps, spaces
  * from horizontal gaps (reference: src/document.rs:1683-1760).
  */
object TextAssembler {

  def assemble(spans: Vector[TextSpan]): String = {
    if (spans.isEmpty) return ""
    // manual length tally: iterator.map(...).sum reduces over boxed
    // Ints per span (JFR-visible on the per-page path)
    var cap = spans.size * 2
    spans.foreach(s => cap += s.text.length)
    val sb = new java.lang.StringBuilder(cap)
    var prev: TextSpan = null
    spans.foreach { s =>
      if (prev == null) sb.append(s.text)
      else {
        val yDiff = prev.bbox.y0 - s.bbox.y0 // positive going down the page
        if (yDiff > 2f) {
          // 1–3 newlines by yDiff / line height (reference: document.rs:1686-1717)
          val lineHeight = math.max(1f, prev.fontSize * 1.2f)
          val n = math.max(1, math.min(3, math.round(yDiff / lineHeight)))
          var k = 0
          while (k < n) { sb.append('\n'); k += 1 }
          sb.append(s.text)
        } else if (yDiff < -2f) {
          // upward jump (new column start already handled by sort): newline
          sb.append('\n').append(s.text)
        } else {
          // same line: space iff 0.25×font < gap < 5×font
          // (reference: document.rs:1738-1760 should_insert_space)
          val gap = s.bbox.x0 - prev.bbox.x1
          val fs = math.max(1f, prev.fontSize)
          if (gap > 0.25f * fs && gap < 5f * fs &&
              !endsWithSpace(sb) && !s.text.startsWith(" ")) sb.append(' ')
          sb.append(s.text)
        }
      }
      prev = s
    }
    Whitespace.cleanPlainText(sb) // CharSequence: no intermediate copy
  }

  @inline private def endsWithSpace(sb: java.lang.StringBuilder): Boolean =
    sb.length() > 0 && sb.charAt(sb.length() - 1) == ' '
}
