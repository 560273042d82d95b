package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.convert.Structured
import graft.pdf.doc.PdfDocument
import graft.pdf.extract.TextExtractor
import graft.pdf.testgen.PdfBuilder
import graft.pdf.testgen.PdfBuilder.Line

/** Structured export (reference: src/extractors/structured.rs). */
class StructuredSpec extends AnyFunSuite {

  test("headings, paragraphs, list items classified; JSON deterministic") {
    val pdf = PdfBuilder.singlePage(Seq(
      Line(72, 740, 24, "F2", "Doc Title"),
      Line(72, 700, 11, "F1", "First paragraph line one,"),
      Line(72, 686, 11, "F1", "continuing on line two."),
      Line(72, 640, 17, "F2", "Section"),
      Line(72, 610, 11, "F1", "\u0095 bullet alpha"),
      Line(72, 596, 11, "F1", "\u0095 bullet beta")))
    val doc = new PdfDocument(pdf)
    val spans = new TextExtractor(doc).extract(doc.pages.head)
    val elems = Structured.elements(spans, page = 1)
    val types = elems.map(e => (e.elemType, e.level, e.text))
    assert(types == Vector(
      ("heading", 1, "Doc Title"),
      ("paragraph", 0, "First paragraph line one, continuing on line two."),
      ("heading", 2, "Section"),
      ("list_item", 0, "bullet alpha"),
      ("list_item", 0, "bullet beta")), types.toString)

    val json = Structured.toJson(elems)
    assert(json.startsWith("""[{"type":"heading","level":1,"page":1,"text":"Doc Title"}"""))
    // deterministic
    assert(json == Structured.toJson(Structured.elements(spans, page = 1)))
  }

  test("json escaping") {
    val e = Vector(Structured.DocumentElement("paragraph", 0, 1, "a\"b\\c\nd"))
    assert(Structured.toJson(e) ==
      """[{"type":"paragraph","level":0,"page":1,"text":"a\"b\\c\nd"}]""")
  }
}
