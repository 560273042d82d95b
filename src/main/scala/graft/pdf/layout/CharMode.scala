package graft.pdf.layout

import scala.collection.mutable

/** Legacy char-mode layout pipeline: positioned characters → spatial
  * word clusters → line clusters → heading-tagged markdown/HTML lines.
  *
  * Re-implements the reference's non-ml fallback path
  * (reference: src/layout/clustering.rs:233-353
  * cluster_chars_into_words / cluster_words_into_lines;
  * src/converters/markdown.rs:418-520 convert_page char mode;
  * src/extractors/text.rs:1130-1174 sort_by_reading_order). The span
  * pipeline (TextExtractor → XY-Cut) is the primary path — this one
  * exists for parity with the reference's deprecated char-clustering
  * mode, including its documented quirks:
  *  - line text is the raw concatenation of clustered word chars
  *    (reference TextBlock::from_chars — "word spacing is handled at
  *    markdown level", i.e. only space GLYPHS separate words);
  *  - `'`/`"` show-operator text IS visible here (it lands in the char
  *    vec) although the span path drops it — the differential quirk
  *    the span extractor documents.
  */
object CharMode {

  /** One positioned glyph (reference: src/layout/text_block.rs TextChar). */
  final case class TextChar(
      text: String, // decoded glyph (usually one char)
      x: Float, y: Float,
      width: Float, height: Float,
      fontSize: Float,
      bold: Boolean)

  private def centerX(c: TextChar): Float = c.x + c.width / 2f
  private def centerY(c: TextChar): Float = c.y + c.height / 2f

  /** Spatial BFS word clustering (reference: clustering.rs:233-343):
    * two chars connect when their centers are on the same line
    * (|dy| < fontSize·0.5) AND horizontally within epsilon. Checks ALL
    * chars, not just consecutive — chars may arrive out of order.
    * Clusters come back sorted by left edge. */
  def clusterCharsIntoWords(chars: IndexedSeq[TextChar], epsilon: Float): Vector[Vector[Int]] = {
    if (chars.isEmpty) return Vector.empty
    if (chars.length == 1) return Vector(Vector(0))
    val visited = new Array[Boolean](chars.length)
    val clusters = Vector.newBuilder[Vector[Int]]
    var i = 0
    while (i < chars.length) {
      if (!visited(i)) {
        val cluster = mutable.ArrayBuffer(i)
        visited(i) = true
        var j = 0
        while (j < cluster.length) {
          val cur = chars(cluster(j))
          var k = 0
          while (k < chars.length) {
            if (!visited(k)) {
              val other = chars(k)
              val dx = math.abs(centerX(cur) - centerX(other))
              val dy = math.abs(centerY(cur) - centerY(other))
              if (dy < cur.fontSize * 0.5f && dx <= epsilon) {
                cluster += k
                visited(k) = true
              }
            }
            k += 1
          }
          j += 1
        }
        clusters += cluster.sortBy(idx => chars(idx).x).toVector
      }
      i += 1
    }
    clusters.result()
  }

  /** A clustered word/line block (reference TextBlock subset). */
  final case class Block(
      text: String,
      x: Float, y: Float, right: Float, top: Float,
      avgFontSize: Float,
      bold: Boolean,
      chars: Vector[TextChar])

  def blockOf(chars: Vector[TextChar]): Block = {
    require(chars.nonEmpty, "empty block")
    val x0 = chars.map(_.x).min
    val y0 = chars.map(_.y).min
    val x1 = chars.map(c => c.x + c.width).max
    val y1 = chars.map(c => c.y + c.height).max
    Block(chars.map(_.text).mkString, x0, y0, x1, y1,
      chars.map(_.fontSize).sum / chars.length,
      chars.exists(_.bold), chars)
  }

  /** Column-aware line clustering (reference: clustering.rs:353-420):
    * words join a line when |dy| ≤ epsilonY AND the horizontal gap is
    * under the 50pt column-gap threshold (keeps columns apart). */
  def clusterWordsIntoLines(words: IndexedSeq[Block], epsilonY: Float = 5f,
                            columnGap: Float = 50f): Vector[Vector[Int]] = {
    if (words.isEmpty) return Vector.empty
    val assigned = new Array[Boolean](words.length)
    val clusters = Vector.newBuilder[Vector[Int]]
    var i = 0
    while (i < words.length) {
      if (!assigned(i)) {
        val cluster = mutable.ArrayBuffer(i)
        assigned(i) = true
        var j = 0
        while (j < cluster.length) {
          val cur = words(cluster(j))
          var k = 0
          while (k < words.length) {
            if (!assigned(k)) {
              val other = words(k)
              if (math.abs(cur.y - other.y) <= epsilonY) {
                val xDist = math.min(
                  math.abs(cur.right - other.x), math.abs(other.right - cur.x))
                if (xDist < columnGap) {
                  cluster += k
                  assigned(k) = true
                }
              }
            }
            k += 1
          }
          j += 1
        }
        clusters += cluster.sortBy(idx => words(idx).x).toVector
      }
      i += 1
    }
    clusters.result()
  }

  /** Heading level by size/weight (reference: heading_detector.rs
    * thresholds, same table the HTML converter uses). */
  private def headingPrefix(b: Block): String =
    if (b.avgFontSize >= 22f && b.bold) "# "
    else if (b.avgFontSize >= 16f && b.bold) "## "
    else if (b.avgFontSize >= 14f && b.bold) "### "
    else ""

  /** Char-mode page → markdown (reference: markdown.rs:418-520):
    * sort (y desc, x asc) → words at ε = 0.8·median font → lines at
    * ε_y = 5 → heading-tagged lines in sorted order. */
  def convertPage(charsIn: Seq[TextChar]): String = {
    if (charsIn.isEmpty) return ""
    val chars = charsIn.toVector.sortBy(c => (-c.y, c.x))
    val sizes = chars.map(_.fontSize).sorted
    val median = sizes(sizes.length / 2)
    val words = clusterCharsIntoWords(chars, median * 0.8f)
      .map(cl => blockOf(cl.map(chars)))
    if (words.isEmpty) return ""
    val lines = clusterWordsIntoLines(words)
      .map(cl => blockOf(cl.flatMap(idx => words(idx).chars)))
    val sb = new java.lang.StringBuilder
    lines.foreach { line =>
      val t = line.text.trim
      if (t.nonEmpty) {
        sb.append(headingPrefix(line)).append(t).append("\n\n")
      }
    }
    sb.toString.stripTrailing()
  }
}
