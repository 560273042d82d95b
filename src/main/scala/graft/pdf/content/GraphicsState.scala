package graft.pdf.content

/** 2×3 affine matrix [a b 0; c d 0; e f 1]
  * (reference: src/content/graphics_state.rs:21-152).
  * Float (f32) arithmetic on purpose — byte-identical output depends on
  * matching the reference's f32 rounding (SURVEY §7.4.1).
  */
final case class Matrix(a: Float, b: Float, c: Float, d: Float, e: Float, f: Float) {
  /** this × other (row-vector convention, as PDF: p' = p · M). */
  def multiply(o: Matrix): Matrix = Matrix(
    a * o.a + b * o.c,
    a * o.b + b * o.d,
    c * o.a + d * o.c,
    c * o.b + d * o.d,
    e * o.a + f * o.c + o.e,
    e * o.b + f * o.d + o.f)
  def transform(x: Float, y: Float): (Float, Float) =
    (a * x + c * y + e, b * x + d * y + f)
  /** Effective vertical scale ≈ how font size maps to device space. */
  def scaleY: Float = math.sqrt((b * b + d * d).toDouble).toFloat
  def scaleX: Float = math.sqrt((a * a + c * c).toDouble).toFloat
  def determinant: Float = a * d - b * c
  def isInvertible: Boolean = math.abs(determinant) > 1e-6f
}
object Matrix {
  val identity: Matrix = Matrix(1f, 0f, 0f, 1f, 0f, 0f)
  def translation(tx: Float, ty: Float): Matrix = Matrix(1f, 0f, 0f, 1f, tx, ty)
  def scaling(sx: Float, sy: Float): Matrix = Matrix(sx, 0f, 0f, sy, 0f, 0f)
}

/** Text + graphics state carried by the content-stream VM
  * (reference: src/content/graphics_state.rs:181-245).
  */
final case class GraphicsState(
    ctm: Matrix = Matrix.identity,
    textMatrix: Matrix = Matrix.identity,
    textLineMatrix: Matrix = Matrix.identity,
    charSpacing: Float = 0f,    // Tc
    wordSpacing: Float = 0f,    // Tw
    horizScaling: Float = 1f,   // Tz (stored /100)
    leading: Float = 0f,        // TL
    fontName: String = "",
    fontSize: Float = 12f,      // Tf size; 12 pt before any Tf, like the
                                // reference (graphics_state.rs new())
    renderMode: Int = 0,        // Tr
    rise: Float = 0f,           // Ts
    fillColor: (Float, Float, Float) = (0f, 0f, 0f),
    strokeColor: (Float, Float, Float) = (0f, 0f, 0f),
    fillColorSpace: String = "DeviceRGB",
    strokeColorSpace: String = "DeviceRGB")

/** q/Q stack (reference: src/content/graphics_state.rs:325-426).
  * Q on an empty stack is a no-op (lenient, like the reference).
  */
final class GraphicsStack {
  private var stack = List.empty[GraphicsState]
  var state: GraphicsState = GraphicsState()
  def push(): Unit = stack = state :: stack
  def pop(): Unit = stack match {
    case h :: t => state = h; stack = t
    case Nil    => ()
  }
}
