package graft.pdf.layout

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.extract.{Rect, TextSpan}

/** Ports of the reference's document-analyzer and table-detector
  * inline vectors (reference: src/layout/document_analyzer.rs:445-510,
  * src/layout/table_detector.rs:327-425). The reference's alignment
  * helpers (find_vertical_alignments / find_horizontal_alignments) are
  * private intermediates of its detector; here their semantics are
  * pinned through `TableDetector.detect`, the public surface that uses
  * them (≥3 aligned rows of ≥2 cells = our detection floor, the
  * reference's "may or may not detect" 2×2 case is pinned to OUR
  * stricter documented behavior).
  */
class ReferenceAnalyzerVectorsSpec extends AnyFunSuite {

  private val page = Rect(0, 0, 612, 792)

  private def span(text: String, x: Float, y: Float, size: Float = 12f): TextSpan =
    TextSpan(text, Rect(x, y, x + text.length * size / 2f, y + size),
      "Times", size, isBold = false, mcid = -1, sequence = 0)

  // ------------------------------------------------------------------
  // document_analyzer.rs
  // ------------------------------------------------------------------

  test("median font size of {10,12,12,14,16} is 12 (document_analyzer.rs:445-457)") {
    val spans = Vector(10f, 12f, 12f, 14f, 16f).zipWithIndex.map {
      case (s, i) => span("x", i * 10f, 100f, s)
    }
    assert(DocumentProperties.analyze(spans, page).medianFontSize == 12f)
  }

  test("single column: evenly distributed text (document_analyzer.rs:459-469)") {
    val spans = (0 until 100).map { i =>
      span("x", 100f + (i % 10) * 10f, 700f - (i / 10) * 14f)
    }.toVector
    assert(DocumentProperties.analyze(spans, page).columnCount == 1)
  }

  test("double column: two x-bands with a wide gap (document_analyzer.rs:471-488)") {
    val left = (0 until 50).map(i => span("x", 50f + (i % 15) * 10f, 700f - (i / 15) * 14f))
    val right = (0 until 50).map(i => span("x", 350f + (i % 15) * 10f, 700f - (i / 15) * 14f))
    val spans = (left ++ right).toVector
    assert(DocumentProperties.analyze(spans, page).columnCount == 2)
  }

  test("adaptive params: thresholds positive, column gap scales with font (document_analyzer.rs:490-510)") {
    val spans = Vector(span("xx", 0, 100), span("xx", 10, 100),
      span("xx", 20, 85), span("xx", 30, 85))
    val p = DocumentProperties.analyze(spans, page)
    val params = AdaptiveLayoutParams.fromProperties(p)
    assert(params.minRegionSize > 0f)
    assert(params.columnGapThreshold > 0f)
    assert(params.gaussianSigma > 0.0)
    // the repo's analog of word_gap < column_gap: the column threshold
    // is 2 em — always wider than an intra-line word gap (≤ 0.5 em)
    assert(params.columnGapThreshold == p.medianFontSize * 2f)
  }

  // ------------------------------------------------------------------
  // table_detector.rs
  // ------------------------------------------------------------------

  private def cell(text: String, x: Float, y: Float): TextSpan =
    TextSpan(text, Rect(x, y, x + text.length * 5f, y + 10f),
      "Times", 12f, isBold = false, mcid = -1, sequence = 0)

  test("insufficient blocks yield no tables (table_detector.rs:384-391)") {
    assert(TableDetector.detect(Vector(cell("A", 0, 0), cell("B", 50, 0))).isEmpty)
  }

  test("irregular layout yields no tables (table_detector.rs:393-406)") {
    val spans = Vector(cell("A", 0, 0), cell("B", 30, 15), cell("C", 60, 5), cell("D", 90, 25))
    assert(TableDetector.detect(spans).isEmpty)
  }

  test("aligned grid detected with rows and cols ≥2 (table_detector.rs:360-382)") {
    // the reference's 2×2 vector allows "may or may not detect"; the
    // repo's documented floor is 3 aligned rows — pin a 3×2 grid the
    // reference's assertions (rows ≥2, cols ≥2) also accept
    val spans = Vector(
      cell("A1", 0, 40), cell("B1", 50, 40),
      cell("A2", 0, 20), cell("B2", 50, 20),
      cell("A3", 0, 0), cell("B3", 50, 0))
    val tables = TableDetector.detect(spans)
    assert(tables.size == 1)
    assert(tables.head.nRows >= 2 && tables.head.nCols >= 2)
  }

  test("slight offsets within tolerance still align (table_detector.rs:327-358)") {
    // reference vertical-alignment vector: x offsets 0.0 / 1.0 / 0.5
    // are one aligned column under a 3-5pt tolerance
    val spans = Vector(
      cell("A", 0.0f, 40), cell("B", 50.0f, 40),
      cell("C", 1.0f, 20), cell("D", 50.5f, 20),
      cell("E", 0.5f, 0), cell("F", 49.5f, 0))
    val tables = TableDetector.detect(spans)
    assert(tables.size == 1, "within-tolerance x jitter must not break column alignment")
    assert(tables.head.nCols == 2)
  }
}
