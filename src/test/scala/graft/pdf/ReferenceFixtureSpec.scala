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

  test("reference simple.pdf: object graph vectors (test_foundation.rs:50-201)") {
    assume(Files.exists(path), "reference fixture not present in this environment")
    import graft.pdf.cos.PdfObj._
    val doc = new PdfDocument(Files.readAllBytes(path))
    // object caching: repeated loads return the same (cached) value (:97)
    val first = doc.loadObject(Ref(1, 0))
    assert(first ne Null)
    assert(doc.loadObject(Ref(1, 0)) eq first.asInstanceOf[AnyRef])
    // nonexistent object: reference errors; this engine degrades to
    // Null without throwing (:113)
    assert(doc.loadObject(Ref(999, 0)) == Null)
    // catalog -> /Pages ref -> /Count flow (:122)
    val pagesRef = doc.catalog.get("Pages").get
    assert(pagesRef.isInstanceOf[Ref])
    val pagesDict = doc.resolve(pagesRef).asDict.get
    assert(doc.resolve(pagesDict.get("Count").get).asLong.contains(1L))
    // /MediaBox array of object 3 is [0 0 612 792] (:149)
    val pageDict = doc.loadObject(Ref(3, 0)).asDict.get
    doc.resolve(pageDict.get("MediaBox").get) match {
      case Arr(items) =>
        assert(items.size == 4)
        assert(items.map(i => doc.resolve(i).asLong.get) == Vector(0L, 0L, 612L, 792L))
      case other => fail(s"expected Arr, got $other")
    }
    // all referenced objects load (:173)
    Seq(1, 2, 3).foreach(id => assert(doc.loadObject(Ref(id, 0)) ne Null))
  }
}
