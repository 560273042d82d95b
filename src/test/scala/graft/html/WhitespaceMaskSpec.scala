package graft.html

import org.scalatest.funsuite.AnyFunSuite

/** Exhaustive proof that the segmenter's ASCII-masked whitespace test
  * equals Character.isWhitespace for EVERY char value (all 65,536 —
  * the mask claims bit-identity, so test bit-identity, not samples). */
class WhitespaceMaskSpec extends AnyFunSuite {
  test("isWs == Character.isWhitespace over the full char range") {
    var c = 0
    while (c <= 0xFFFF) {
      val ch = c.toChar
      assert(BoilerplateStripper.isWs(ch) == Character.isWhitespace(ch),
        f"divergence at U+$c%04X")
      c += 1
    }
  }
}
