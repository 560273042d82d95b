package graft.pdf.layout

import scala.collection.mutable
import graft.pdf.extract.TextSpan

/** Column-alignment table detection (reference:
  * src/layout/table_detector.rs:61-425 — heuristic, and like the
  * reference it is OFF by default: `extract_tables:false`).
  *
  * A table = ≥2 consecutive lines, each with ≥2 cells, whose cell
  * start-x positions align across lines within a 3pt tolerance on ≥2
  * columns.
  */
object TableDetector {

  final case class Table(rows: Vector[Vector[String]]) {
    def nRows: Int = rows.size
    def nCols: Int = rows.map(_.size).max
  }

  private val AlignTolerancePt = 3f

  def detect(spans: Vector[TextSpan]): Vector[Table] = {
    if (spans.size < 4) return Vector.empty
    // Y-proximity line groups, order-independent (column-aware sorts
    // emit column-by-column)
    val lines = graft.pdf.extract.ReadingOrder.groupLines(spans)

    val out = Vector.newBuilder[Table]
    var i = 0
    while (i < lines.length) {
      if (lines(i).size >= 2) {
        // grow a run of aligned multi-cell lines
        var j = i + 1
        while (j < lines.length && lines(j).size >= 2 &&
               aligned(lines(i), lines(j))) j += 1
        if (j - i >= 2) {
          val block = lines.slice(i, j).toVector
          val cols = columnPositions(block)
          if (cols.size >= 2) {
            out += Table(block.map(row => rowCells(row, cols)))
            i = j - 1
          }
        }
      }
      i += 1
    }
    out.result()
  }

  /** ≥2 of b's cell starts align with a's cell starts. */
  private def aligned(a: Vector[TextSpan], b: Vector[TextSpan]): Boolean = {
    val hits = b.count(sb => a.exists(sa => math.abs(sa.bbox.x0 - sb.bbox.x0) <= AlignTolerancePt))
    hits >= 2
  }

  /** Cluster distinct cell start-x positions across the block. */
  private def columnPositions(block: Vector[Vector[TextSpan]]): Vector[Float] = {
    val xs = block.flatten.map(_.bbox.x0).sorted
    val cols = mutable.ArrayBuffer.empty[Float]
    xs.foreach { x =>
      if (cols.isEmpty || x - cols.last > AlignTolerancePt) cols += x
    }
    cols.toVector
  }

  private def rowCells(row: Vector[TextSpan], cols: Vector[Float]): Vector[String] = {
    val cells = Array.fill(cols.size)(new StringBuilder)
    row.foreach { s =>
      var best = 0
      var bestDist = Float.MaxValue
      cols.zipWithIndex.foreach { case (c, k) =>
        val d = math.abs(s.bbox.x0 - c)
        if (d < bestDist) { bestDist = d; best = k }
      }
      if (cells(best).nonEmpty) cells(best).append(' ')
      cells(best).append(s.text.trim)
    }
    cells.map(_.toString).toVector
  }

  /** GitHub-style pipe table rendering. */
  def toMarkdown(t: Table): String = {
    val width = t.nCols
    def row(cells: Vector[String]): String =
      cells.padTo(width, "").mkString("| ", " | ", " |")
    val sb = new StringBuilder
    sb.append(row(t.rows.head)).append('\n')
    sb.append(Vector.fill(width)("---").mkString("| ", " | ", " |")).append('\n')
    t.rows.tail.foreach(r => sb.append(row(r)).append('\n'))
    sb.toString
  }
}
