package graft.pdf.extract

import graft.pdf.doc.Page

/** Page /Rotate normalization: map user-space spans into display
  * orientation before reading-order sorting, so rotated pages read in
  * the orientation a viewer shows (reference: page attribute /Rotate,
  * document.rs:1290-1425 inheritance).
  *
  * Display mapping for a mediaBox [0,0,W,H]:
  *   90°  cw: (x,y) → (y, W−x), display box W′=H, H′=W
  *   180°   : (x,y) → (W−x, H−y)
  *   270° cw: (x,y) → (H−y, x), display box W′=H, H′=W
  */
object Rotation {

  def normalize(spans: Vector[TextSpan], page: Page): (Vector[TextSpan], Array[Double]) = {
    val mb = page.mediaBox
    val w = (mb(2) - mb(0)).toFloat
    val h = (mb(3) - mb(1)).toFloat
    val rot = ((page.rotate % 360) + 360) % 360
    if (rot == 0 || spans.isEmpty) return (spans, mb)
    def tx(x: Float, y: Float): (Float, Float) = {
      val ux = x - mb(0).toFloat
      val uy = y - mb(1).toFloat
      rot match {
        case 90  => (uy, w - ux)
        case 180 => (w - ux, h - uy)
        case 270 => (h - uy, ux)
        case _   => (ux, uy)
      }
    }
    val out = spans.map { s =>
      val (ax, ay) = tx(s.bbox.x0, s.bbox.y0)
      val (bx, by) = tx(s.bbox.x1, s.bbox.y1)
      s.copy(bbox = Rect(math.min(ax, bx), math.min(ay, by),
        math.max(ax, bx), math.max(ay, by)))
    }
    val box: Array[Double] =
      if (rot == 90 || rot == 270) Array(0.0, 0.0, h.toDouble, w.toDouble)
      else Array(0.0, 0.0, w.toDouble, h.toDouble)
    (out, box)
  }
}
