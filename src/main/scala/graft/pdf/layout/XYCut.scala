package graft.pdf.layout

import graft.pdf.extract.{Rect, TextSpan}

/** Recursive XY-Cut page segmentation (reference:
  * src/layout/column_detector.rs:79-457): project span coverage onto
  * each axis, Gaussian-smooth the density histogram (σ=2), cut at the
  * best valley, recurse. Depth ≤ 10, regions below 50pt are leaves.
  * Leaf order: Y-cuts top→bottom, X-cuts left→right — handles grid
  * layouts (2×2 blocks) that a single global X-histogram cannot.
  */
object XYCut {

  private val Bins = 64

  /** Spans in XY-Cut reading order with fixed default parameters. */
  def sortSpans(spans: Vector[TextSpan], mediaBox: Array[Double]): Vector[TextSpan] =
    sortSpans(spans, mediaBox, AdaptiveLayoutParams.Default)

  /** Spans in XY-Cut reading order, σ/region thresholds supplied by the
    * per-document analyzer (reference: document_analyzer.rs:360-414). */
  def sortSpans(spans: Vector[TextSpan], mediaBox: Array[Double],
                params: AdaptiveLayoutParams): Vector[TextSpan] = {
    if (spans.size <= 1) return spans
    val page = Rect(mediaBox(0).toFloat, mediaBox(1).toFloat,
      mediaBox(2).toFloat, mediaBox(3).toFloat)
    segment(spans, page, 0, params)
  }

  /** Adaptive variant: analyze the page's typography first. */
  def sortSpansAdaptive(spans: Vector[TextSpan], mediaBox: Array[Double]): Vector[TextSpan] = {
    if (spans.size <= 1) return spans
    val page = Rect(mediaBox(0).toFloat, mediaBox(1).toFloat,
      mediaBox(2).toFloat, mediaBox(3).toFloat)
    sortSpans(spans, mediaBox, AdaptiveLayoutParams.analyze(spans, page))
  }

  private def segment(spans: Vector[TextSpan], region: Rect, depth: Int,
                      params: AdaptiveLayoutParams): Vector[TextSpan] = {
    if (spans.size <= 1 || depth >= params.maxDepth ||
        region.width < params.minRegionSize || region.height < params.minRegionSize)
      return leafSort(spans)

    // candidate cuts on both axes; pick the deeper/wider valley
    val xCut = bestValley(spans, region, horizontal = false, params.gaussianSigma)
    val yCut = bestValley(spans, region, horizontal = true, params.gaussianSigma)
    (xCut, yCut) match {
      case (None, None) => leafSort(spans)
      case _ =>
        val useY = (yCut, xCut) match {
          case (Some((_, yw)), Some((_, xw))) => yw >= xw
          case (Some(_), None)                => true
          case _                              => false
        }
        if (useY) {
          val cut = yCut.get._1
          // top region first (PDF Y grows upward)
          val (top, bottom) = spans.partition(_.bbox.y0 >= cut)
          if (top.isEmpty || bottom.isEmpty) leafSort(spans)
          else segment(top, Rect(region.x0, cut, region.x1, region.y1), depth + 1, params) ++
            segment(bottom, Rect(region.x0, region.y0, region.x1, cut), depth + 1, params)
        } else {
          val cut = xCut.get._1
          val (left, right) = spans.partition(_.bbox.centerX < cut)
          if (left.isEmpty || right.isEmpty) leafSort(spans)
          else segment(left, Rect(region.x0, region.y0, cut, region.y1), depth + 1, params) ++
            segment(right, Rect(cut, region.y0, region.x1, region.y1), depth + 1, params)
        }
    }
  }

  private def leafSort(spans: Vector[TextSpan]): Vector[TextSpan] =
    spans.sortBy(s => (-math.round(s.bbox.y0).toFloat, s.bbox.x0, s.sequence))

  /** Best empty valley along one axis: (cut position, valley width in
    * axis units); None if no qualifying gap. */
  private def bestValley(spans: Vector[TextSpan], region: Rect,
                         horizontal: Boolean, sigma: Double): Option[(Float, Float)] = {
    val lo = if (horizontal) region.y0 else region.x0
    val hi = if (horizontal) region.y1 else region.x1
    val extent = hi - lo
    if (extent <= 0) return None
    val hist = new Array[Double](Bins)
    spans.foreach { s =>
      val (a, b) =
        if (horizontal) (s.bbox.y0, s.bbox.y1) else (s.bbox.x0, s.bbox.x1)
      val b0 = math.max(0, math.min(Bins - 1, ((a - lo) / extent * Bins).toInt))
      val b1 = math.max(0, math.min(Bins - 1, ((b - lo) / extent * Bins).toInt))
      var k = b0
      while (k <= b1) { hist(k) += 1; k += 1 }
    }
    val smoothed = gaussianSmooth(hist, sigma)
    // content extent: trim empty margins
    val thresh = 0.1 * smoothed.max
    val first = smoothed.indexWhere(_ > thresh)
    val last = smoothed.lastIndexWhere(_ > thresh)
    if (first < 0 || last - first < 4) return None
    // widest interior valley of near-zero density
    var best: Option[(Float, Float)] = None
    var i = first + 1
    while (i < last) {
      if (smoothed(i) <= thresh) {
        var j = i
        while (j < last && smoothed(j) <= thresh) j += 1
        val widthBins = j - i
        val widthUnits = widthBins.toFloat / Bins * extent
        // a meaningful cut: gap ≥ ~1.5% of the axis and ≥ 6pt
        if (widthUnits >= math.max(6f, 0.015f * extent) &&
            best.forall(_._2 < widthUnits)) {
          val mid = lo + (i + j) / 2f / Bins * extent
          best = Some((mid, widthUnits))
        }
        i = j
      } else i += 1
    }
    best
  }

  private def gaussianSmooth(h: Array[Double], sigma: Double): Array[Double] = {
    val radius = math.ceil(3 * sigma).toInt
    val kernel = (-radius to radius).map(d => math.exp(-d * d / (2 * sigma * sigma)))
    val ksum = kernel.sum
    Array.tabulate(h.length) { i =>
      var acc = 0.0
      var d = -radius
      while (d <= radius) {
        val j = i + d
        if (j >= 0 && j < h.length) acc += h(j) * kernel(d + radius)
        d += 1
      }
      acc / ksum
    }
  }
}
