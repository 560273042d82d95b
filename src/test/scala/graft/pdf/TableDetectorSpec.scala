package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.doc.PdfDocument
import graft.pdf.extract.TextExtractor
import graft.pdf.layout.TableDetector
import graft.pdf.testgen.PdfBuilder
import graft.pdf.testgen.PdfBuilder.Line

/** Column-alignment table detection (reference: table_detector.rs;
  * default-off, like the reference's extract_tables:false). */
class TableDetectorSpec extends AnyFunSuite {

  test("3x3 aligned grid detected as one table") {
    val rows = Seq("Name Qty Price", "Widget 4 1.50", "Gadget 12 0.75")
    val lines = rows.zipWithIndex.flatMap { case (r, i) =>
      r.split(" ").zip(Seq(72f, 250f, 400f)).map { case (cell, x) =>
        Line(x, 700 - 16f * i, 11, "F1", cell)
      }
    }
    val extra = Seq(Line(72, 600, 11, "F1", "A normal sentence afterwards."))
    val pdf = PdfBuilder.singlePage(lines ++ extra)
    val doc = new PdfDocument(pdf)
    val spans = new TextExtractor(doc).extract(doc.pages.head)
    val tables = TableDetector.detect(spans)
    assert(tables.size == 1, tables.toString)
    assert(tables.head.rows == Vector(
      Vector("Name", "Qty", "Price"),
      Vector("Widget", "4", "1.50"),
      Vector("Gadget", "12", "0.75")), tables.head.rows.toString)
    val md = TableDetector.toMarkdown(tables.head)
    assert(md.startsWith("| Name | Qty | Price |\n| --- | --- | --- |"), md)
  }

  test("prose paragraphs yield no tables") {
    val pdf = PdfBuilder.singlePage((0 until 6).map(i =>
      Line(72, 700 - 14f * i, 11, "F1", s"just a plain running sentence number $i here")))
    val doc = new PdfDocument(pdf)
    val spans = new TextExtractor(doc).extract(doc.pages.head)
    assert(TableDetector.detect(spans).isEmpty)
  }
}
