package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.doc.{DocExtras, PdfDocument}

/** Hand-computed expectations for the round-5 forms/outline fixtures
  * (PagesGen.formPdf / outlinePdf), the inputs behind the
  * `extract_forms` / `extract_outline` driver pins. Everything here is
  * derived from ISO 32000 §12.7 (interactive forms) / §12.3.3
  * (document outline) by hand, NOT from running the engine — so these
  * assertions are independent ground truth for the fixture surfaces
  * (reference: src/extractors/forms.rs:12-58, src/outline.rs:12). */
class FixtureFormsOutlineSpec extends AnyFunSuite {

  test("formPdf: flat, nested-inherited, overriding, UTF-16BE, integer and widget-kid fields") {
    val doc = new PdfDocument(PagesGen.formPdf(0))
    val fields = DocExtras.formFields(doc)
    val asTuples = fields.map(f => (f.name, f.value, f.fieldType))
    assert(asTuples == Vector(
      ("name0", "value of doc 0", "Tx"),
      ("person0.first", "Ada", "Tx"),  // dotted name, /FT inherited
      ("person0.last", "optB", "Ch"),  // dotted name, /FT overridden
      ("agree", "Yes", "Btn"),         // Name value
      ("uni", "Aé", "Tx"),        // UTF-16BE BOM'd hex string
      ("count", "0", "Tx"),            // integer value
      ("multi", "Option1, Option2", "Ch"), // array /V → flattened (forms.rs:428-441)
      ("grp", "", "Btn"),              // widget kid: parent's name kept
      ("grp", "", "Btn")), asTuples.mkString("\n"))
  }

  test("formPdf varies deterministically with id") {
    val d3 = DocExtras.formFields(new PdfDocument(PagesGen.formPdf(3)))
      .map(f => (f.name, f.value, f.fieldType))
    assert(d3.contains(("name3", "value of doc 3", "Tx")))
    assert(d3.contains(("agree", "Off", "Btn"))) // odd id
    assert(d3.contains(("count", "3", "Tx")))
    assert(d3.contains(("person0.first", "Ada", "Tx"))) // 3 % 3 == 0
  }

  test("outlinePdf: pre-order walk with levels, dest flavors, UTF-16BE title") {
    val doc = new PdfDocument(PagesGen.outlinePdf(0))
    val items = DocExtras.outline(doc)
    assert(items.map(o => (o.title, o.level)) == Vector(
      ("Chapter 1 doc 0", 0),
      ("Section 1.1 of 0", 1),
      ("Section 1.2", 1),
      ("Ch 2 é", 0)), items.mkString("\n"))
    // dest encodings: explicit array (Fit), GoTo action (XYZ), named
    assert(items(0).dest.startsWith("page:") && items(0).dest.endsWith(" Fit"))
    assert(items(1).dest.startsWith("page:") && items(1).dest.endsWith(" XYZ"))
    assert(items(2).dest == "named:sec-0")
    assert(items(3).dest.startsWith("page:") && items(3).dest.endsWith(" Fit"))
    // chapter 1 and chapter 2 point at DIFFERENT pages
    assert(items(0).dest != items(3).dest)
    // the GoTo child and chapter 2 target the SAME page (page 2)
    assert(items(1).dest.split(' ').head == items(3).dest.split(' ').head)
  }

  test("outlinePdf text extraction still works (pages intact)") {
    val r = graft.pdf.PdfExtractor.extract(PagesGen.outlinePdf(5),
      graft.pdf.ConversionOptions())
    assert(r.nPages == 2)
    assert(r.text.contains("Outline doc 5 page 1"))
    assert(r.text.contains("Outline doc 5 page 2"))
  }

  test("formPdf text extraction still works") {
    val r = graft.pdf.PdfExtractor.extract(PagesGen.formPdf(7),
      graft.pdf.ConversionOptions())
    assert(r.text.contains("Form doc 7"))
  }
}
