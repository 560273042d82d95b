package graft.pdf.extract

import scala.collection.mutable

/** Reading-order sort, overlap dedup, and adjacent-span merge.
  * (reference: src/extractors/text.rs:732-1124)
  * All operations are per-document collection ops — ≤ a few thousand
  * spans inside one `mapPartitions` row, never Spark shuffles.
  */
object ReadingOrder {

  /** Column-aware reading-order sort (reference: text.rs:732-907):
    * X-histogram over 100 bins; a run of low-density bins wider than 5%
    * of the page ⇒ column boundary (density < 20% of the per-bin avg).
    * Single column ⇒ sort by (round(Y) desc, X asc); multi ⇒ assign by
    * center-X, sort within, concatenate columns left→right.
    */
  def sortSpans(spans: Vector[TextSpan], mediaBox: Array[Double]): Vector[TextSpan] = {
    if (spans.size <= 1) return spans
    val pageX0 = mediaBox(0).toFloat
    val pageW = math.max(1f, (mediaBox(2) - mediaBox(0)).toFloat)
    val boundaries = detectColumnBoundaries(spans, pageX0, pageW)
    if (boundaries.isEmpty) simpleSort(spans)
    else {
      val cuts = boundaries.sorted
      def colOf(s: TextSpan): Int = {
        val cx = s.bbox.centerX
        var i = 0
        while (i < cuts.length && cx >= cuts(i)) i += 1
        i
      }
      spans.groupBy(colOf).toVector.sortBy(_._1)
        .flatMap { case (_, col) => simpleSort(col) }
    }
  }

  private def simpleSort(spans: Vector[TextSpan]): Vector[TextSpan] =
    spans.sortBy(s => (-roundY(s.bbox.y0), s.bbox.x0, s.sequence))

  @inline private def roundY(y: Float): Float =
    if (y.isNaN) 0f else math.round(y).toFloat

  private def detectColumnBoundaries(spans: Vector[TextSpan], pageX0: Float,
                                     pageW: Float): Vector[Float] = {
    val Bins = 100
    val hist = new Array[Float](Bins)
    spans.foreach { s =>
      val b0 = math.max(0, math.min(Bins - 1, ((s.bbox.x0 - pageX0) / pageW * Bins).toInt))
      val b1 = math.max(0, math.min(Bins - 1, ((s.bbox.x1 - pageX0) / pageW * Bins).toInt))
      var b = b0
      while (b <= b1) { hist(b) += 1f; b += 1 }
    }
    val nonzero = hist.count(_ > 0)
    if (nonzero == 0) return Vector.empty
    val avg = hist.sum / nonzero
    val thresh = avg * 0.2f // 20%-of-avg density threshold
    val minGapBins = 5      // 5% of page width
    val out = Vector.newBuilder[Float]
    // only gaps strictly inside the text extent count
    val first = hist.indexWhere(_ > thresh)
    val last = hist.lastIndexWhere(_ > thresh)
    if (first < 0 || last <= first) return Vector.empty
    var i = first
    while (i < last) {
      if (hist(i) <= thresh) {
        var j = i
        while (j < last && hist(j) <= thresh) j += 1
        if (j - i >= minGapBins) {
          val mid = (i + j) / 2f
          out += pageX0 + mid / Bins * pageW
        }
        i = j
      } else i += 1
    }
    out.result()
  }

  /** Drop re-rendered overlaps: same rounded Y, |ΔX| < 2pt, same text ⇒
    * keep the first (reference: text.rs:912-955 — bold/shadow double
    * draws). */
  def dedup(sorted: Vector[TextSpan]): Vector[TextSpan] = {
    if (sorted.size <= 1) return sorted
    val out = mutable.ArrayBuffer.empty[TextSpan]
    sorted.foreach { s =>
      val dup = out.reverseIterator.takeWhile(p => roundY(p.bbox.y0) == roundY(s.bbox.y0))
        .exists(p => math.abs(p.bbox.x0 - s.bbox.x0) < 2f && p.text == s.text)
      if (!dup) out += s
    }
    out.toVector
  }

  /** Merge fragments of one visual run: same line (|ΔY| < 1), gap in
    * [−0.5, 3) pt (reference: text.rs:966-1124). A space joins the two
    * texts iff the gap exceeds 0.25 em or a camelCase/digit-letter
    * boundary suggests distinct words (reference: text.rs:2643-2666).
    */
  def mergeAdjacent(sorted: Vector[TextSpan]): Vector[TextSpan] = {
    if (sorted.size <= 1) return sorted
    val out = mutable.ArrayBuffer.empty[TextSpan]
    var cur = sorted.head
    var i = 1
    while (i < sorted.length) {
      val next = sorted(i)
      val sameLine = math.abs(next.bbox.y0 - cur.bbox.y0) < 1f
      val gap = next.bbox.x0 - cur.bbox.x1
      if (sameLine && gap >= -0.5f && gap < 3f && next.fontName == cur.fontName) {
        val needSpace = gap > 0.25f * cur.fontSize ||
          wordBoundaryHeuristic(cur.text, next.text)
        val joined = if (needSpace && !cur.text.endsWith(" ") && !next.text.startsWith(" "))
          cur.text + " " + next.text
        else cur.text + next.text
        cur = cur.copy(text = joined, bbox = cur.bbox.union(next.bbox))
      } else {
        out += cur
        cur = next
      }
      i += 1
    }
    out += cur
    out.toVector
  }

  /** Group spans into visual lines by Y proximity, independent of the
    * input order (column-aware sorts emit column-by-column): sort by
    * -Y, cluster at `tol`, order each line left→right. */
  def groupLines(spans: Vector[TextSpan], tol: Float = 2f): Vector[Vector[TextSpan]] = {
    if (spans.isEmpty) return Vector.empty
    val byY = spans.sortBy(s => (-s.bbox.y0, s.bbox.x0, s.sequence))
    val out = Vector.newBuilder[Vector[TextSpan]]
    var cur = Vector.newBuilder[TextSpan]
    var curY = byY.head.bbox.y0
    byY.foreach { s =>
      if (math.abs(s.bbox.y0 - curY) < tol) cur += s
      else {
        out += cur.result().sortBy(_.bbox.x0)
        cur = Vector.newBuilder[TextSpan]
        cur += s
        curY = s.bbox.y0
      }
    }
    out += cur.result().sortBy(_.bbox.x0)
    out.result()
  }

  /** Graph-based reading order via precedence DAG + Kahn toposort
    * (reference: src/layout/reading_order.rs:105-199
    * graph_based_reading_order). Precedence rules: same line (|Δtop| <
    * 5) ⇒ left before right; otherwise higher top first (PDF Y grows
    * upward). O(n²) edges per page — n is small per page; the
    * alternative to tree pre-order for layouts that don't nest. */
  def graphOrder(spans: Vector[TextSpan]): Vector[TextSpan] = {
    val n = spans.length
    if (n <= 1) return spans
    def precedes(a: TextSpan, b: TextSpan): Boolean = {
      val yTol = 5f
      if (math.abs(a.bbox.y1 - b.bbox.y1) < yTol) a.bbox.x0 < b.bbox.x0
      else a.bbox.y1 > b.bbox.y1
    }
    val edges = Array.fill(n)(List.empty[Int])
    val inDeg = new Array[Int](n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        if (i != j && precedes(spans(i), spans(j))) {
          edges(i) = j :: edges(i)
          inDeg(j) += 1
        }
        j += 1
      }
      i += 1
    }
    val queue = scala.collection.mutable.Queue.empty[Int]
    (0 until n).foreach(k => if (inDeg(k) == 0) queue.enqueue(k))
    val order = Vector.newBuilder[Int]
    var taken = 0
    while (queue.nonEmpty) {
      val v = queue.dequeue()
      order += v
      taken += 1
      edges(v).reverse.foreach { w =>
        inDeg(w) -= 1
        if (inDeg(w) == 0) queue.enqueue(w)
      }
    }
    // cycle (possible: precedes isn't transitive across the y-tolerance
    // boundary) ⇒ fall back to input order, like the reference
    if (taken != n) spans else order.result().map(spans)
  }

  /** lower→UPPER or digit↔letter boundary ⇒ separate words
    * (reference: text.rs:2643-2666). */
  private def wordBoundaryHeuristic(a: String, b: String): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    val last = a.charAt(a.length - 1)
    val first = b.charAt(0)
    (last.isLower && first.isUpper) ||
      (last.isDigit && first.isLetter) ||
      (last.isLetter && first.isDigit)
  }
}
