package graft.pdf.content

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's graphics-state/matrix test vectors
  * (reference: src/content/graphics_state.rs:434-633). Pins the
  * row-vector multiply order (self applies FIRST: translation
  * .multiply(scaling) = translate-then-scale), transform_point,
  * determinant/invertibility, the 12 pt pre-Tf default font size, and
  * the lenient q/Q stack (restore past the bottom is a no-op). */
class ReferenceGraphicsVectorsSpec extends AnyFunSuite {

  test("identity / default (graphics_state.rs:439-448, 625-632)") {
    val m = Matrix.identity
    assert(m.a == 1f && m.b == 0f && m.c == 0f && m.d == 1f && m.e == 0f && m.f == 0f)
    assert(m.transform(0f, 0f) == ((0f, 0f)))
  }

  test("translation (graphics_state.rs:450-459)") {
    val m = Matrix.translation(10f, 20f)
    assert(m.e == 10f && m.f == 20f)
    assert(m.transform(5f, 10f) == ((15f, 30f)))
  }

  test("scaling (graphics_state.rs:461-470)") {
    val m = Matrix.scaling(2f, 3f)
    assert(m.a == 2f && m.d == 3f)
    assert(m.transform(10f, 10f) == ((20f, 30f)))
  }

  test("multiply applies self first, then other (graphics_state.rs:472-484)") {
    val r = Matrix.translation(10f, 20f).multiply(Matrix.scaling(2f, 2f))
    // (5,5) → translate (15,25) → scale (30,50)
    assert(r.transform(5f, 5f) == ((30f, 50f)))
  }

  test("multiply is not commutative (graphics_state.rs:486-500)") {
    val m1 = Matrix.translation(10f, 0f)
    val m2 = Matrix.scaling(2f, 1f)
    val p1 = m1.multiply(m2).transform(5f, 0f)
    val p2 = m2.multiply(m1).transform(5f, 0f)
    assert(p1._1 != p2._1)
  }

  test("determinant / invertibility (graphics_state.rs:502-526)") {
    assert(Matrix.scaling(2f, 3f).determinant == 6f)
    assert(Matrix.identity.determinant == 1f)
    assert(Matrix.scaling(2f, 3f).isInvertible)
    assert(!Matrix(1f, 2f, 2f, 4f, 0f, 0f).isInvertible)
  }

  test("fresh state defaults: 12pt, no spacing, black (graphics_state.rs:528-541, 590-601)") {
    val s = GraphicsState()
    assert(s.fontSize == 12f)
    assert(s.horizScaling == 1f) // reference stores 100.0 percent; /100 here
    assert(s.charSpacing == 0f && s.wordSpacing == 0f && s.leading == 0f)
    assert(s.fontName == "")
    assert(s.fillColor == ((0f, 0f, 0f)) && s.strokeColor == ((0f, 0f, 0f)))
  }

  test("q/Q save-restore + restore past bottom is a no-op (graphics_state.rs:550-588)") {
    val st = new GraphicsStack
    st.state = st.state.copy(fontSize = 14f)
    st.push()
    st.state = st.state.copy(fontSize = 16f)
    assert(st.state.fontSize == 16f)
    st.pop()
    assert(st.state.fontSize == 14f)
    // restore past the bottom: state survives
    st.pop(); st.pop()
    assert(st.state.fontSize == 14f)
    st.push(); st.push(); st.push()
    st.pop(); st.pop(); st.pop()
    assert(st.state.fontSize == 14f)
  }
}
