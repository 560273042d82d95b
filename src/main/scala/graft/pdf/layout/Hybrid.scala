package graft.pdf.layout

import graft.pdf.extract.TextSpan

/** Hybrid smart layout dispatch (reference: src/hybrid/
  * smart_analyzer.rs:34-247 + complexity_estimator.rs:83-238).
  *
  * The reference scores each page's layout complexity from five
  * factors and routes ≥-threshold pages to its advanced analyzer (the
  * `ml` branch — feature-gated OFF by default, so its shipped behavior
  * is the classical fallback). This port keeps the estimator's exact
  * factor weights and routes "complex" pages to the adaptive XY-Cut
  * spatial analyzer (our advanced path) instead of a learned model;
  * simple pages take the cheap classical top-to-bottom sort — the
  * speed/accuracy trade the hybrid exists for.
  */
object Hybrid {

  sealed abstract class Complexity(val rank: Int) extends Ordered[Complexity] {
    def compare(o: Complexity): Int = rank.compare(o.rank)
  }
  case object Simple extends Complexity(0)
  case object Moderate extends Complexity(1)
  case object Complex extends Complexity(2)

  /** Five-factor score in [0,1] (complexity_estimator.rs:111-148):
    * columns 30%, font diversity 20%, y-variance 20%, size variance
    * 15%, extreme density 15%. */
  def complexityScore(blocks: Vector[TextSpan], pageWidth: Float,
                      pageHeight: Float): Float = {
    if (blocks.isEmpty) return 0f
    var score = 0f
    // Factor 1: columns — gaps in sorted x > 20% page width (cap 4)
    val xs = blocks.map(_.bbox.x0).sorted
    var columns = 1
    val colThreshold = pageWidth * 0.2f
    var i = 1
    while (i < xs.length) {
      if (xs(i) - xs(i - 1) > colThreshold) columns += 1
      i += 1
    }
    columns = math.min(columns, 4)
    score += math.min((columns - 1) * 0.15f, 0.3f)
    // Factor 2: font diversity
    val uniqueFonts = blocks.map(_.fontName).distinct.length
    score += math.min(math.max(uniqueFonts - 2, 0) * 0.05f, 0.2f)
    // Factor 3: y-position variance (normalized by page height)
    val meanY = blocks.map(_.bbox.y0).sum / blocks.length
    val yVar = blocks.map(b => (b.bbox.y0 - meanY) * (b.bbox.y0 - meanY)).sum / blocks.length
    score += math.min(math.sqrt(yVar).toFloat / pageHeight, 0.2f)
    // Factor 4: font-size variance (coefficient of variation)
    val meanSz = blocks.map(_.fontSize).sum / blocks.length
    if (meanSz != 0f) {
      val szVar = blocks.map(b => (b.fontSize - meanSz) * (b.fontSize - meanSz)).sum / blocks.length
      score += math.min(math.sqrt(szVar).toFloat / meanSz, 0.15f)
    }
    // Factor 5: extreme text density (coverage outside [0.2, 0.8])
    if (pageWidth != 0f && pageHeight != 0f) {
      val area = blocks.map(b => b.bbox.width * b.bbox.height).sum
      val density = math.min(area / (pageWidth * pageHeight), 1f)
      if (density < 0.2f || density > 0.8f) score += 0.15f
    }
    math.min(score, 1f)
  }

  /** Score → class (Simple < 0.3 ≤ Moderate < 0.6 ≤ Complex). */
  def estimate(blocks: Vector[TextSpan], pageWidth: Float,
               pageHeight: Float): Complexity = {
    val s = complexityScore(blocks, pageWidth, pageHeight)
    if (s < 0.3f) Simple else if (s < 0.6f) Moderate else Complex
  }

  /** Smart reading order (smart_analyzer.rs:117-160): pages at or
    * above `threshold` complexity take the adaptive XY-Cut spatial
    * analyzer; simpler pages take the classical top-to-bottom,
    * left-to-right sort (PDF coords: y DESC then x ASC). */
  def readingOrder(spans: Vector[TextSpan], mediaBox: Array[Double],
                   threshold: Complexity = Moderate): Vector[TextSpan] = {
    if (spans.isEmpty) return spans
    val w = (mediaBox(2) - mediaBox(0)).toFloat
    val h = (mediaBox(3) - mediaBox(1)).toFloat
    if (estimate(spans, w, h) >= threshold)
      XYCut.sortSpansAdaptive(spans, mediaBox)
    else
      spans.sortBy(s => (-math.round(s.bbox.y1), s.bbox.x0))
  }
}
