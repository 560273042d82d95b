package graft.pdf.convert

import java.util.regex.Pattern
import scala.collection.mutable
import graft.pdf.extract.TextSpan

/** Spans → markdown: heading detection by font-size clusters, line
  * grouping, balanced `**bold**`, URL/email autolinks, artifact cleanup
  * (reference: src/converters/markdown.rs:191-376 +
  * src/layout/heading_detector.rs:74-156).
  */
object Markdown {

  private val urlRe = Pattern.compile("(?<![(<\\[])\\bhttps?://[^\\s)\\]>]+")
  private val emailRe = Pattern.compile("(?<![<\\w])[\\w.+-]+@[\\w-]+\\.[\\w.]+\\b(?!>)")

  /** Heading level for a line: 0 = body.
    * Thresholds (reference: heading_detector.rs:122-156):
    * ≥22pt bold → H1, ≥16pt bold → H2, ≥14pt bold → H3. */
  private def headingLevel(size: Float, bold: Boolean): Int = {
    if (bold && size >= 22f) 1
    else if (bold && size >= 16f) 2
    else if (bold && size >= 14f) 3
    else 0
  }

  def convertPage(spans: Vector[TextSpan]): String = {
    if (spans.isEmpty) return ""
    // group into lines: ΔY < 2pt (reference: markdown.rs:246-252)
    val lines = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[TextSpan]]
    spans.foreach { s =>
      if (lines.nonEmpty && math.abs(lines.last.head.bbox.y0 - s.bbox.y0) < 2f)
        lines.last += s
      else lines += mutable.ArrayBuffer(s)
    }
    val sb = new java.lang.StringBuilder
    var prevY = Float.NaN
    var prevSize = 12f
    lines.foreach { line =>
      val sorted = line.sortBy(_.bbox.x0)
      val maxSize = sorted.iterator.map(_.fontSize).max
      val allBold = sorted.forall(_.isBold)
      val level = headingLevel(maxSize, allBold)
      val y = sorted.head.bbox.y0
      // paragraph break when the vertical gap exceeds ~1.8 line heights
      if (!prevY.isNaN) {
        val gap = prevY - y
        val lh = math.max(1f, prevSize * 1.2f)
        if (level > 0 || gap > 1.8f * lh) sb.append("\n\n")
        else sb.append('\n')
      }
      if (level > 0) sb.append("#" * level).append(' ')
      // render spans: balanced ** around bold runs (not inside headings)
      var i = 0
      while (i < sorted.length) {
        val s = sorted(i)
        if (i > 0) {
          val gap = s.bbox.x0 - sorted(i - 1).bbox.x1
          if (gap > 0.25f * sorted(i - 1).fontSize) sb.append(' ')
        }
        val txt = s.text
        if (s.isBold && level == 0 && txt.trim.nonEmpty) {
          // word-boundary-balanced bold (reference: markdown.rs:310-349)
          val lead = txt.takeWhile(_ == ' ')
          val trail = txt.reverse.takeWhile(_ == ' ').reverse
          sb.append(lead).append("**").append(txt.trim).append("**").append(trail)
        } else sb.append(txt)
        i += 1
      }
      prevY = y
      prevSize = maxSize
    }
    // common case (no URL/email candidates): hand the builder straight
    // to the cleaner — skips materializing an intermediate String
    if (sb.indexOf("http") < 0 && sb.indexOf("@") < 0) Whitespace.cleanMarkdown(sb)
    else Whitespace.cleanMarkdown(linkify(sb.toString))
  }

  /** Bare URLs/emails → autolinks (reference: markdown.rs:758-801). */
  def linkify(s: String): String = {
    // cheap guard: skip both regex passes unless candidates exist
    if (s.indexOf("http") < 0 && s.indexOf('@') < 0) return s
    // function-variant replaceAll treats the returned string literally
    val withUrls = if (s.indexOf("http") < 0) s
      else urlRe.matcher(s).replaceAll(m => "[" + m.group() + "](" + m.group() + ")")
    if (withUrls.indexOf('@') < 0) withUrls
    else emailRe.matcher(withUrls).replaceAll(m => "<" + m.group() + ">")
  }
}
