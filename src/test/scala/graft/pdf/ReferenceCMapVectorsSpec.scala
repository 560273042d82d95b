package graft.pdf.font

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's inline ToUnicode-CMap test vectors
  * (reference: src/fonts/cmap.rs:361-544) against `CMap.parse`. The
  * reference parses line-oriented; this repo parses token-oriented —
  * these vectors pin that both accept the same surface and produce the
  * same mappings (incl. the PDF-spec bfrange array form). */
class ReferenceCMapVectorsSpec extends AnyFunSuite {

  private def parse(s: String): CMap = CMap.parse(s.getBytes("ISO-8859-1"))

  test("bfchar single / multiple / non-ascii (cmap.rs:361-382)") {
    assert(parse("beginbfchar\n<0041> <0041>\nendbfchar").get(0x41).contains("A"))
    val m = parse("beginbfchar\n<0041> <0041>\n<0042> <0042>\n<0043> <0043>\nendbfchar")
    assert(m.get(0x41).contains("A") && m.get(0x42).contains("B") && m.get(0x43).contains("C"))
    assert(parse("beginbfchar\n<00E9> <00E9>\nendbfchar").get(0xE9).contains("é"))
  }

  test("bfrange simple / printable span / single-code range (cmap.rs:384-408, 452-457)") {
    val r = parse("beginbfrange\n<0041> <0043> <0041>\nendbfrange")
    assert(r.get(0x41).contains("A") && r.get(0x42).contains("B") && r.get(0x43).contains("C"))
    val p = parse("beginbfrange\n<0020> <007E> <0020>\nendbfrange")
    assert(p.get(0x20).contains(" ") && p.get(0x30).contains("0") &&
      p.get(0x41).contains("A") && p.get(0x7A).contains("z") && p.get(0x7E).contains("~"))
    val s = parse("beginbfrange\n<0041> <0041> <0041>\nendbfrange")
    assert(s.get(0x41).contains("A") && s.map.size == 1)
  }

  test("mixed bfchar+bfrange, multiple sections (cmap.rs:410-419, 495-502)") {
    val m = parse("beginbfchar\n<0041> <0058>\nendbfchar\nbeginbfrange\n<0042> <0044> <0042>\nendbfrange")
    assert(m.get(0x41).contains("X") && m.get(0x42).contains("B") &&
      m.get(0x43).contains("C") && m.get(0x44).contains("D"))
    val two = parse("beginbfchar\n<0041> <0041>\nendbfchar\nbeginbfchar\n<0042> <0042>\nendbfchar")
    assert(two.map.size == 2 && two.get(0x41).contains("A") && two.get(0x42).contains("B"))
  }

  test("empty data, extra whitespace, hex case-insensitive (cmap.rs:421-434, 488-493)") {
    assert(parse("").isEmpty)
    val w = parse("beginbfchar\n  <0041>    <0041>  \n  <0042>  <0042>\nendbfchar")
    assert(w.get(0x41).contains("A") && w.get(0x42).contains("B"))
    assert(parse("beginbfchar\n<00aB> <00Ab>\nendbfchar").get(0xAB).contains("«"))
  }

  test("ligature expansions: bfchar + bfrange ARRAY form (cmap.rs:504-543)") {
    assert(parse("beginbfchar\n<000C> <00660069>\nendbfchar").get(0x0C).contains("fi"))
    val ml = parse("beginbfchar\n<000B> <00660066>\n<000C> <00660069>\n<000D> <0066006C>\nendbfchar")
    assert(ml.get(0x0B).contains("ff") && ml.get(0x0C).contains("fi") && ml.get(0x0D).contains("fl"))
    val arr = parse("beginbfrange\n<005F> <0061> [<00660066> <00660069> <00660066006C>]\nendbfrange")
    assert(arr.get(0x5F).contains("ff") && arr.get(0x60).contains("fi") && arr.get(0x61).contains("ffl"))
    val mixed = parse("beginbfrange\n<0010> <0012> [<0041> <00660069> <0043>]\nendbfrange")
    assert(mixed.get(0x10).contains("A") && mixed.get(0x11).contains("fi") && mixed.get(0x12).contains("C"))
  }
}
