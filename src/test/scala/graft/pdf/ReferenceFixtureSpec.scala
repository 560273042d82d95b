package graft.pdf

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.doc.PdfDocument

/** Cross-validation against the reference's only shipped fixture
  * (read in place from /root/reference — bytes studied, not copied).
  * Mirrors the reference's own assertions (tests/test_foundation.rs:
  * 11-114): version 1.4, one page, catalog type, /MediaBox present,
  * and graceful empty extraction (the page has no content stream). */
class ReferenceFixtureSpec extends AnyFunSuite {

  private val path = Paths.get("/root/reference/tests/fixtures/simple.pdf")

  test("reference simple.pdf: version / page count / catalog / graceful empty text") {
    assume(Files.exists(path), "reference fixture not present in this environment")
    val bytes = Files.readAllBytes(path)
    val doc = new PdfDocument(bytes)
    assert(doc.version == "1.4")                        // test_foundation.rs:21-22
    assert(doc.pageCount == 1)                          // :29
    assert(doc.catalog.name("Type").contains("Catalog")) // :42
    assert(doc.catalog.get("Pages").isDefined)           // :46
    val page = doc.pages.head
    assert(page.mediaBox.toVector == Vector(0.0, 0.0, 612.0, 792.0)) // :93
    val r = PdfExtractor.extract(bytes)
    assert(r.text == "")   // no /Contents — empty, not an error
    assert(r.nPages == 1)
  }
}
