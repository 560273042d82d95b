package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.layout.Hybrid
import graft.pdf.extract.{Rect, TextSpan}

/** Ports of the reference's hybrid/complexity_estimator.rs inline test
  * vectors. estimate_columns / count_unique_fonts / calculate_density
  * are private factor computations here, so their vectors are
  * asserted through the exact score contributions they produce
  * (columns +0.15/extra, fonts +0.05/extra past 2, extreme density
  * +0.15) on inputs where all other factors are held at zero.
  *
  * smart_analyzer.rs's classical_reading_order sorts ASCENDING y
  * (screen convention, smart_analyzer.rs:222-239) — the opposite of
  * the markdown/html converters' PDF-coords descending sort that the
  * reference's real extraction path uses. SmartLayoutAnalyzer is
  * exported but never wired into that path (grep: no non-test caller),
  * so our Hybrid.readingOrder keeps the converters' descending
  * convention; the ascending vector is deliberately NOT ported.
  */
class ReferenceHybridVectorsSpec extends AnyFunSuite {

  private def block(x: Float, y: Float, w: Float, h: Float,
                    size: Float, font: String): TextSpan =
    TextSpan("Test", Rect(x, y, x + w, y + h), font, size, false, -1, 0)

  private val W = 612f
  private val H = 792f

  test("simple layout: single column, uniform font (complexity_estimator.rs:196-208)") {
    val blocks = Vector(
      block(50f, 100f, 500f, 20f, 12f, "Arial"),
      block(50f, 130f, 500f, 20f, 12f, "Arial"),
      block(50f, 160f, 500f, 20f, 12f, "Arial"))
    assert(Hybrid.estimate(blocks, W, H) == Hybrid.Simple)
  }

  test("multi-column layout is at least Moderate (complexity_estimator.rs:210-223)") {
    val blocks = Vector(
      block(50f, 100f, 200f, 20f, 12f, "Arial"),
      block(350f, 100f, 200f, 20f, 12f, "Arial"),
      block(50f, 130f, 200f, 20f, 12f, "Arial"),
      block(350f, 130f, 200f, 20f, 12f, "Arial"))
    assert(Hybrid.estimate(blocks, W, H) >= Hybrid.Moderate)
  }

  test("mixed fonts are at least Moderate (complexity_estimator.rs:225-238)") {
    val blocks = Vector(
      block(50f, 100f, 500f, 20f, 12f, "Arial"),
      block(50f, 130f, 500f, 20f, 14f, "Times"),
      block(50f, 160f, 500f, 20f, 10f, "Courier"),
      block(50f, 190f, 500f, 20f, 16f, "Helvetica"))
    assert(Hybrid.estimate(blocks, W, H) >= Hybrid.Moderate)
  }

  test("irregular layout is at least Moderate (complexity_estimator.rs:240-252)") {
    val blocks = Vector(
      block(50f, 100f, 500f, 20f, 24f, "Arial"),
      block(100f, 300f, 400f, 15f, 12f, "Times"),
      block(50f, 600f, 300f, 10f, 8f, "Courier"))
    assert(Hybrid.estimate(blocks, W, H) >= Hybrid.Moderate)
  }

  test("empty page is Simple (complexity_estimator.rs:254-258)") {
    assert(Hybrid.estimate(Vector.empty, W, H) == Hybrid.Simple)
  }

  test("column factor: two columns add exactly +0.15 over one (estimate_columns vector)") {
    // same y, same font, same size, density extreme in both → only
    // the column factor differs
    val single = Vector(
      block(50f, 100f, 200f, 20f, 12f, "Arial"),
      block(60f, 100f, 200f, 20f, 12f, "Arial"))
    val twoCol = Vector(
      block(50f, 100f, 200f, 20f, 12f, "Arial"),
      block(350f, 100f, 200f, 20f, 12f, "Arial")) // gap 300 > 20% * 612
    val d = Hybrid.complexityScore(twoCol, W, H) - Hybrid.complexityScore(single, W, H)
    assert(math.abs(d - 0.15f) < 1e-6)
  }

  test("font factor: 3 unique fonts add +0.05 over 1 (count_unique_fonts vector)") {
    def mk(fonts: Vector[String]) = fonts.map(f => block(0f, 0f, 100f, 20f, 12f, f))
    val one = mk(Vector("Arial", "Arial", "Arial", "Arial"))
    val three = mk(Vector("Arial", "Arial", "Times", "Courier"))
    val d = Hybrid.complexityScore(three, W, H) - Hybrid.complexityScore(one, W, H)
    assert(math.abs(d - 0.05f) < 1e-6)
  }

  test("density factor: extreme (sparse/dense) +0.15, mid-density 0 (calculate_density vector)") {
    val sparse = Vector(block(0f, 0f, 50f, 20f, 12f, "Arial"))   // density ≈ 0.002
    val dense = Vector(block(0f, 0f, 600f, 700f, 12f, "Arial"))  // density ≈ 0.87
    val mid = Vector(block(0f, 0f, 600f, 400f, 12f, "Arial"))    // density ≈ 0.50
    assert(Hybrid.complexityScore(sparse, W, H) == 0.15f)
    assert(Hybrid.complexityScore(dense, W, H) == 0.15f)
    assert(Hybrid.complexityScore(mid, W, H) == 0f)
  }

  test("complexity ordering (complexity_estimator.rs:150-155)") {
    assert(Hybrid.Simple < Hybrid.Moderate)
    assert(Hybrid.Moderate < Hybrid.Complex)
    assert(Hybrid.Simple < Hybrid.Complex)
  }

  test("score is always in [0,1] (complexity_estimator.rs:157-169)") {
    val blocks = Vector(
      block(0f, 0f, 100f, 20f, 12f, "Arial"),
      block(0f, 30f, 100f, 20f, 12f, "Arial"))
    val s = Hybrid.complexityScore(blocks, W, H)
    assert(s >= 0f && s <= 1f)
  }

  test("smart_analyzer behavioral: simple page takes classical descending-y order") {
    // smart_analyzer.rs:50-64's three stacked blocks; our classical
    // path emits PDF reading order (top of page = larger y first)
    val blocks = Vector(
      block(100f, 200f, 100f, 20f, 12f, "Arial").copy(text = "third"),
      block(100f, 100f, 100f, 20f, 12f, "Arial").copy(text = "first"),
      block(100f, 150f, 100f, 20f, 12f, "Arial").copy(text = "second"))
    val o = Hybrid.readingOrder(blocks, Array(0d, 0d, 612d, 792d)).map(_.text)
    assert(o == Vector("third", "second", "first"))
    assert(Hybrid.readingOrder(Vector.empty, Array(0d, 0d, 612d, 792d)).isEmpty)
  }
}
