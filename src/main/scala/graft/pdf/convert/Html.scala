package graft.pdf.convert

import java.util.regex.Pattern
import scala.collection.mutable
import graft.pdf.extract.TextSpan

/** Spans → HTML, the reference's third export surface (reference:
  * src/converters/html.rs:94-321). Two modes:
  *
  *  - SEMANTIC (default): same-line/similar-font spans merge into
  *    blocks (html.rs:157-204), each block classified into
  *    h1/h2/h3/p/small by the font-size + boldness rules of
  *    src/layout/heading_detector.rs:116-155, text escaped and
  *    URL/email-linkified (html.rs:628-679).
  *  - PRESERVE-LAYOUT: absolute-positioned `div.text` per span inside
  *    a `div.page`, with the inline CSS block the reference emits
  *    (html.rs:277-321).
  */
object Html {

  private val urlRe = Pattern.compile("\\bhttps?://[^\\s<>\"]+")
  private val emailRe = Pattern.compile("(?<![\\w.])[\\w.+-]+@[\\w-]+\\.[\\w.]+\\b")

  /** HTML-escape the five specials (reference html.rs:628-634). */
  def escape(s: String): String = {
    // intrinsified indexOf scans (vectorized), not a charAt loop
    // (UTF16 checkIndex per char) and not String.exists (boxes every
    // char — Function1 is not @specialized on Char); together these
    // were 5-8% of render-path JFR samples
    if (s.indexOf('&') < 0 && s.indexOf('<') < 0 && s.indexOf('>') < 0 &&
        s.indexOf('"') < 0 && s.indexOf('\'') < 0) return s
    val sb = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&'  => sb.append("&amp;")
        case '<'  => sb.append("&lt;")
        case '>'  => sb.append("&gt;")
        case '"'  => sb.append("&quot;")
        case '\'' => sb.append("&#x27;")
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Escape, then wrap bare URLs/emails in anchors (html.rs:660-679). */
  def linkify(raw: String): String = {
    val s = escape(raw)
    if (s.indexOf("http") < 0 && s.indexOf('@') < 0) return s
    val withUrls = if (s.indexOf("http") < 0) s
      else urlRe.matcher(s).replaceAll(m =>
        "<a href=\"" + m.group() + "\">" + m.group() + "</a>")
    if (withUrls.indexOf('@') < 0) withUrls
    else {
      // Skip email matches inside anchors the URL pass just inserted —
      // a URL with userinfo (http://user@host.com) would otherwise get
      // a nested mailto anchor inside its own href. The raw text was
      // escaped ('<' → &lt;), so every "<a " here is ours.
      val m = emailRe.matcher(withUrls)
      val sb = new java.lang.StringBuilder
      while (m.find()) {
        val open = withUrls.lastIndexOf("<a ", m.start)
        val inAnchor = open >= 0 && {
          val close = withUrls.indexOf("</a>", open)
          close < 0 || m.start < close
        }
        val g = m.group()
        val repl = if (inAnchor) g
          else "<a href=\"mailto:" + g + "\">" + g + "</a>"
        m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(repl))
      }
      m.appendTail(sb)
      sb.toString
    }
  }

  /** Block after same-line merging. */
  private final case class Block(text: String, x0: Float, x1: Float,
                                 y0: Float, size: Float, bold: Boolean)

  /** Heading classification (heading_detector.rs:116-155). */
  private def tag(b: Block): String = {
    if (b.size >= 22f && b.bold) "h1"
    else if (b.size >= 16f && b.bold) "h2"
    else if (b.size >= 14f && b.bold) "h3"
    else if (b.size < 9f) "small"
    else "p"
  }

  def convertPage(spans: Vector[TextSpan], preserveLayout: Boolean = false): String = {
    if (spans.isEmpty) return ""
    if (preserveLayout) convertLayout(spans) else convertSemantic(spans)
  }

  private def convertSemantic(spans: Vector[TextSpan]): String = {
    // Merge same-line (|Δy| < 5) + similar-font (<2pt) spans into
    // blocks, inserting a space across x-gaps > 1 (html.rs:157-204).
    // Input arrives in reading order from the extractor, so block
    // order is already correct (the reference re-sorts by y/x; our
    // span pipeline sorted upstream).
    val blocks = mutable.ArrayBuffer.empty[Block]
    var cur: Block = null
    spans.foreach { s =>
      if (cur == null) {
        cur = Block(s.text, s.bbox.x0, s.bbox.x1, s.bbox.y0, s.fontSize, s.isBold)
      } else {
        val sameLine = math.abs(s.bbox.y0 - cur.y0) < 5f
        val similarFont = math.abs(s.fontSize - cur.size) < 2f
        if (sameLine && similarFont) {
          val gap = s.bbox.x0 - cur.x1
          val sep = if (gap > 1f && !cur.text.endsWith(" ") && !s.text.startsWith(" ")) " " else ""
          cur = cur.copy(text = cur.text + sep + s.text,
            x1 = math.max(cur.x1, s.bbox.x1),
            bold = cur.bold && s.isBold)
        } else {
          blocks += cur
          cur = Block(s.text, s.bbox.x0, s.bbox.x1, s.bbox.y0, s.fontSize, s.isBold)
        }
      }
    }
    if (cur != null) blocks += cur
    val sb = new java.lang.StringBuilder
    blocks.foreach { b =>
      if (b.text.trim.nonEmpty) {
        val t = tag(b)
        sb.append('<').append(t).append('>')
          .append(linkify(b.text.trim))
          .append("</").append(t).append(">\n")
      }
    }
    sb.toString
  }

  private def convertLayout(spans: Vector[TextSpan]): String = {
    val sb = new java.lang.StringBuilder
    sb.append("<style>\n")
      .append(".page {\n  position: relative;\n  width: 100%;\n  height: 100%;\n}\n")
      .append(".text {\n  position: absolute;\n  white-space: nowrap;\n}\n")
      .append("</style>\n")
      .append("<div class=\"page\">\n")
    spans.foreach { s =>
      sb.append("  <div class=\"text\" style=\"left: ")
        .append(fmt(s.bbox.x0)).append("px; top: ")
        .append(fmt(s.bbox.y0)).append("px; font-size: ")
        .append(fmt(s.fontSize)).append("px;\">")
        .append(escape(s.text)).append("</div>\n")
    }
    sb.append("</div>\n")
    sb.toString
  }

  /** Trim trailing .0 like Rust's {} float Display. */
  private def fmt(f: Float): String = {
    val s = f.toString
    if (s.endsWith(".0")) s.substring(0, s.length - 2) else s
  }
}
