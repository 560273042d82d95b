package graft.pdf

import java.nio.charset.StandardCharsets.ISO_8859_1
import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.convert.Html
import graft.pdf.extract.{Rect, TextSpan}
import graft.pdf.testgen.PdfBuilder

/** PDF→HTML export (reference: src/converters/html.rs — semantic tags,
  * heading classification, escaping/linkify, layout-preserve mode). */
class HtmlSpec extends AnyFunSuite {

  private def span(text: String, x: Float, y: Float, size: Float,
                   bold: Boolean = false): TextSpan =
    TextSpan(text, Rect(x, y, x + text.length * size * 0.5f, y + size),
      if (bold) "F1-Bold" else "F1", size, bold, -1, 0)

  test("escape handles the five specials") {
    assert(Html.escape("<div> & \"q\" 'a'") ==
      "&lt;div&gt; &amp; &quot;q&quot; &#x27;a&#x27;")
  }

  test("linkify wraps URLs and emails after escaping") {
    val out = Html.linkify("Visit https://example.com or mail bob@example.com")
    assert(out.contains("<a href=\"https://example.com\">https://example.com</a>"))
    assert(out.contains("<a href=\"mailto:bob@example.com\">bob@example.com</a>"))
  }

  test("linkify skips emails inside a just-inserted URL anchor (userinfo URLs)") {
    val out = Html.linkify("see http://user@host.com for details, or mail joe@other.org")
    // the userinfo URL must stay ONE anchor — no nested mailto inside
    // its href or link text
    assert(out.contains("<a href=\"http://user@host.com\">http://user@host.com</a>"), out)
    assert(!out.contains("href=\"<a"), out)
    assert(!out.contains("mailto:user@host.com"), out)
    // emails outside anchors still linkify
    assert(out.contains("<a href=\"mailto:joe@other.org\">joe@other.org</a>"), out)
  }

  test("semantic mode emits h1/h2/h3/p/small by font rules") {
    val spans = Vector(
      span("Title", 100, 700, 24f, bold = true),
      span("Section", 100, 650, 17f, bold = true),
      span("Subsection", 100, 600, 14f, bold = true),
      span("Body text here", 100, 550, 12f),
      span("footnote", 100, 500, 8f))
    val html = Html.convertPage(spans)
    assert(html ==
      "<h1>Title</h1>\n<h2>Section</h2>\n<h3>Subsection</h3>\n" +
      "<p>Body text here</p>\n<small>footnote</small>\n")
  }

  test("same-line similar-font spans merge into one block with gap space") {
    val spans = Vector(
      span("Hello", 100, 700, 12f),
      span("world", 140, 700, 12f))
    assert(Html.convertPage(spans) == "<p>Hello world</p>\n")
  }

  test("layout-preserve mode emits positioned divs + style block") {
    val spans = Vector(span("X <mark>", 72, 700, 12f))
    val html = Html.convertPage(spans, preserveLayout = true)
    assert(html.contains("<style>"))
    assert(html.contains("position: absolute"))
    assert(html.contains(
      "<div class=\"text\" style=\"left: 72px; top: 700px; font-size: 12px;\">X &lt;mark&gt;</div>"))
  }

  test("end-to-end: PDF bytes → semantic html") {
    val pdf = PdfBuilder.singlePage(Seq(
      PdfBuilder.Line(100, 700, 24, "F2", "Big Title"), // F2 = Helvetica-Bold
      PdfBuilder.Line(100, 650, 12, "F1", "Paragraph content.")))
    val r = PdfExtractor.extract(pdf)
    assert(r.html.contains("<h1>Big Title</h1>"))
    assert(r.html.contains("<p>Paragraph content.</p>"))
  }

  test("end-to-end: preserve-layout option routes to positioned divs") {
    val pdf = PdfBuilder.singlePage(Seq(
      PdfBuilder.Line(100, 700, 12, "F1", "anchored")))
    val r = PdfExtractor.extract(pdf, ConversionOptions(preserveLayout = true))
    assert(r.html.contains("class=\"page\""))
    assert(r.html.contains("anchored</div>"))
  }
}
