package graft.pdf.layout

import graft.pdf.extract.{Rect, TextSpan}

/** Per-document typography statistics driving adaptive layout
  * parameters (reference: src/layout/document_analyzer.rs:118-283,
  * DocumentProperties::analyze — char-based there; span-based here,
  * with per-char width estimated as span width / char count).
  */
final case class DocumentProperties(
    medianFontSize: Float,
    medianCharWidth: Float,
    medianLineSpacing: Float,
    pageWidth: Float,
    pageHeight: Float,
    columnCount: Int,
    avgCharsPerLine: Float)

object DocumentProperties {

  private def median(xs: Array[Float], fallback: Float): Float =
    if (xs.isEmpty) fallback
    else { java.util.Arrays.sort(xs); xs(xs.length / 2) }

  def analyze(spans: Vector[TextSpan], page: Rect): DocumentProperties = {
    if (spans.isEmpty)
      return DocumentProperties(12f, 6f, 12f, page.width, page.height, 1, 50f)
    val medianFont = median(spans.map(_.fontSize).toArray, 12f)
    val charWidths = spans.filter(_.text.nonEmpty)
      .map(s => s.bbox.width / s.text.length).toArray
    val medianCharW = median(charWidths, 6f)

    // line clustering: 5pt Y bins (document_analyzer.rs:181-201)
    val byLine = spans.groupBy(s => math.round(s.bbox.y0 / 5f))
    val lineYs = byLine.keys.toArray.map(_ * 5f).sortBy(-_)
    val spacings = lineYs.sliding(2).collect {
      case Array(a, b) if math.abs(a - b) > 0.1f => math.abs(a - b)
    }.toArray
    val medianSpacing = median(spacings, 12f)
    val totalChars = {
      var t = 0; spans.foreach(s => t += s.text.length); t.toFloat
    }
    val avgCharsPerLine =
      if (byLine.nonEmpty) totalChars / byLine.size else 50f

    DocumentProperties(medianFont, medianCharW, medianSpacing,
      page.width, page.height, columnCount(spans, page), avgCharsPerLine)
  }

  /** Column count from a 10pt horizontal projection profile: interior
    * gaps (≥3 bins below 10% of max density) + 1, capped at 4
    * (document_analyzer.rs:232-283). */
  private def columnCount(spans: Vector[TextSpan], page: Rect): Int = {
    val binW = 10f
    val nBins = math.max(1, math.ceil(page.width / binW).toInt)
    val bins = new Array[Int](nBins)
    spans.foreach { s =>
      var b = math.max(0, ((s.bbox.x0 - page.x0) / binW).toInt)
      val b1 = math.min(nBins - 1, ((s.bbox.x1 - page.x0) / binW).toInt)
      while (b <= b1) { if (b >= 0 && b < nBins) bins(b) += 1; b += 1 }
    }
    val maxDensity = bins.max
    val gapThreshold = (maxDensity * 0.1f).toInt
    var gaps = 0
    var inGap = false
    var gapWidth = 0
    var hasContent = false
    bins.foreach { d =>
      if (d <= gapThreshold) {
        if (!inGap) { inGap = true; gapWidth = 1 } else gapWidth += 1
      } else {
        if (inGap && gapWidth >= 3 && hasContent) gaps += 1
        inGap = false; gapWidth = 0
        hasContent = true
      }
    }
    math.min(gaps + 1, 4)
  }
}

/** Adaptive XY-Cut tuning derived from measured document properties
  * instead of fixed constants (reference: AdaptiveLayoutParams::
  * from_properties, document_analyzer.rs:360-414). The headline knob
  * is the Gaussian σ for the projection-profile smoothing: dense
  * layouts (short lines, e.g. author grids) need sharp peaks (σ 0.5),
  * sparse single-column pages need heavy smoothing (σ 2.5); Meunier
  * (ICDAR 2005) σ=2.0 is the baseline between. */
final case class AdaptiveLayoutParams(
    gaussianSigma: Double,
    minRegionSize: Float,
    maxDepth: Int,
    columnGapThreshold: Float)

object AdaptiveLayoutParams {

  /** Fixed defaults for Letter-sized 10-12pt documents — the round-1
    * constants, used when analysis is unavailable. */
  val Default: AdaptiveLayoutParams =
    AdaptiveLayoutParams(gaussianSigma = 2.0, minRegionSize = 50f,
      maxDepth = 10, columnGapThreshold = 24f)

  def fromProperties(p: DocumentProperties): AdaptiveLayoutParams = {
    val sigma =
      if (p.avgCharsPerLine < 30f) 0.5
      else if (p.avgCharsPerLine < 60f) 1.5
      else 2.5
    AdaptiveLayoutParams(
      gaussianSigma = sigma,
      minRegionSize = math.sqrt(p.pageWidth * p.pageHeight * 0.05).toFloat,
      maxDepth = 10,
      columnGapThreshold = p.medianFontSize * 2f)
  }

  def analyze(spans: Vector[TextSpan], page: Rect): AdaptiveLayoutParams =
    if (spans.isEmpty) Default
    else fromProperties(DocumentProperties.analyze(spans, page))
}
