package graft.pdf.extract

/** Geometry in PDF user space: origin bottom-left, Y increases upward
  * (reference: src/geometry/mod.rs:8-219). Float on purpose (f32 parity).
  */
final case class Rect(x0: Float, y0: Float, x1: Float, y1: Float) {
  def width: Float = x1 - x0
  def height: Float = y1 - y0
  def union(o: Rect): Rect =
    Rect(math.min(x0, o.x0), math.min(y0, o.y0), math.max(x1, o.x1), math.max(y1, o.y1))
  def centerX: Float = (x0 + x1) / 2f
}

/** The central IR: one positioned text run per Tj/TJ logical run
  * (reference: src/layout/text_block.rs:21-43).
  */
final case class TextSpan(
    text: String,
    bbox: Rect,
    fontName: String,
    fontSize: Float, // effective (Tm/cm-scaled) size
    isBold: Boolean,
    mcid: Int,       // -1 = none
    sequence: Int,
    /** fill color (RGB 0-1) active at span start — reference stamps it
      * on every TextChar (src/extractors/text.rs:2522-2558). */
    color: (Float, Float, Float) = (0f, 0f, 0f))
