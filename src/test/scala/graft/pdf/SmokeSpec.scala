package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.testgen.PdfBuilder
import graft.pdf.testgen.PdfBuilder.Line
import graft.pdf.doc.PdfDocument

/** T0 smoke tier (FIXTURES.md §3): open/version/page_count/extract on a
  * simple.pdf clone (reference analog: tests/test_foundation.rs:10-30). */
class SmokeSpec extends AnyFunSuite {

  private val hello = PdfBuilder.singlePage(Seq(Line(100, 700, 12, "F1", "Hello World")))

  test("header + version") {
    val doc = new PdfDocument(hello)
    assert(doc.version == "1.4")
  }

  test("page count") {
    assert(new PdfDocument(hello).pageCount == 1)
  }

  test("extract text: Hello World") {
    val r = PdfExtractor.extract(hello)
    assert(r.text == "Hello World", s"got: '${r.text}'")
    assert(r.nPages == 1)
    assert(r.nSpans == 1)
  }

  test("two lines → newline separated") {
    val pdf = PdfBuilder.singlePage(Seq(
      Line(100, 700, 12, "F1", "First line"),
      Line(100, 680, 12, "F1", "Second line")))
    val r = PdfExtractor.extract(pdf)
    assert(r.text == "First line\nSecond line", s"got: '${r.text}'")
  }

  test("flate-compressed content stream") {
    val pdf = PdfBuilder.singlePage(Seq(Line(100, 700, 12, "F1", "Compressed text")),
      compress = true)
    assert(PdfExtractor.extract(pdf).text == "Compressed text")
  }

  test("xref stream (PDF 1.5)") {
    val pdf = PdfBuilder.singlePage(Seq(Line(100, 700, 12, "F1", "XRef stream")),
      xrefStream = true)
    val r = PdfExtractor.extract(pdf)
    assert(r.text == "XRef stream", s"got: '${r.text}'")
  }

  test("xref stream + ObjStm") {
    val pdf = PdfBuilder.singlePage(Seq(Line(100, 700, 12, "F1", "ObjStm text")),
      xrefStream = true, objStm = true)
    val r = PdfExtractor.extract(pdf)
    assert(r.text == "ObjStm text", s"got: '${r.text}'")
  }

  test("multi-page join") {
    val pdf = PdfBuilder.multiPage(Seq(
      Seq(Line(100, 700, 12, "F1", "Page one")),
      Seq(Line(100, 700, 12, "F1", "Page two"))))
    val r = PdfExtractor.extract(pdf)
    assert(r.nPages == 2)
    assert(r.text == "Page one\n\nPage two", s"got: '${r.text}'")
  }

  test("markdown heading from bold large font") {
    val pdf = PdfBuilder.singlePage(Seq(
      Line(100, 700, 24, "F2", "Big Title"),
      Line(100, 650, 12, "F1", "Body text here.")))
    val r = PdfExtractor.extract(pdf)
    assert(r.markdown.startsWith("# Big Title"), s"got: '${r.markdown}'")
    assert(r.markdown.contains("Body text here."))
  }

  test("not a pdf → sniff false") {
    assert(!PdfExtractor.isPdf("<html><body>hi</body></html>".getBytes))
    assert(PdfExtractor.isPdf(hello))
  }
}
