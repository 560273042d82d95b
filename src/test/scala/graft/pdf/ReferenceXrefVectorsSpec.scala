package graft.pdf.doc

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.cos.ObjParser

/** Ports of the reference's classic-xref test vectors (reference:
  * src/xref.rs:898-1101): comment lines inside the table, malformed
  * entries becoming placeholder FREE entries (numbering stays
  * aligned), invalid flag chars, a hostile excessive subsection count,
  * and CR-only (Mac) line endings. Before this round the repo's
  * token-based parser dropped the whole table on a comment line and
  * would have allocated 2M placeholder entries on the hostile count. */
class ReferenceXrefVectorsSpec extends AnyFunSuite {

  private def parse(s: String): (XRefTable, graft.pdf.cos.PdfObj.Dict) = {
    val t = new XRefTable
    val d = PdfDocument.parseClassicSection(t, new ObjParser(s.getBytes("ISO-8859-1")))
    (t, d)
  }

  test("single + multiple subsections (xref.rs:898-966)") {
    val (t, _) = parse(
      "xref\n0 2\n0000000000 65535 f \n0000000018 00000 n \ntrailer\n<< >>")
    assert(t.size == 2)
    assert(t.get(0).contains(XRefEntry.Free(0, 65535)))
    assert(t.get(1).contains(XRefEntry.Uncompressed(18, 0)))
    val (m, _) = parse(
      "xref\n0 1\n0000000000 65535 f \n10 2\n0000000100 00000 n \n0000000200 00000 n \ntrailer\n<< >>")
    assert(m.size == 3)
    assert(m.get(10).contains(XRefEntry.Uncompressed(100, 0)))
    assert(m.get(11).contains(XRefEntry.Uncompressed(200, 0)))
    assert(m.get(5).isEmpty)
  }

  test("comment lines inside the table are skipped (xref.rs:1040-1053)") {
    val (t, _) = parse(
      "xref\n% This is a comment\n0 2\n0000000000 65535 f \n0000000018 00000 n \n% Another comment\ntrailer\n<< >>")
    assert(t.size == 2)
    assert(t.get(1).contains(XRefEntry.Uncompressed(18, 0)))
  }

  test("malformed entry becomes a placeholder free entry (xref.rs:980-1002)") {
    val (t, _) = parse(
      "xref\n0 2\n0000000000 65535 f \ninvalid entry here\ntrailer\n<< /Size 2 >>")
    assert(t.size == 2)
    assert(t.get(0).exists { case XRefEntry.Free(_, _) => true; case _ => false })
    assert(t.get(1).exists { case XRefEntry.Free(_, _) => true; case _ => false })
  }

  test("invalid flag char treated as free (xref.rs:1004-1022)") {
    val (t, _) = parse("xref\n0 1\n0000000000 65535 x \ntrailer\n<< >>")
    assert(t.size == 1)
    assert(t.get(0).exists { case XRefEntry.Free(_, _) => true; case _ => false })
  }

  test("empty table, trailer returned (xref.rs:1024-1032, 2980-2989)") {
    val (t, d) = parse("xref\ntrailer\n<< /Size 5 /Root 1 0 R >>")
    assert(t.size == 0)
    assert(d.long("Size").contains(5L))
  }

  test("hostile excessive count does not allocate entries (xref.rs:1055-1065)") {
    val (t, _) = parse("xref\n0 2000000\n0000000000 65535 f \ntrailer\n<< >>")
    assert(t.size == 0, "section must abort, not allocate 2M placeholders")
  }

  test("CR-only (Mac) line endings (xref.rs:1080-1099)") {
    val (t, _) = parse(
      "xref\r0 2\r0000000000 65535 f\r0000000018 00000 n\rtrailer\r<< >>")
    assert(t.size == 2)
    assert(t.get(0).exists { case XRefEntry.Free(_, 65535) => true; case _ => false })
    assert(t.get(1).contains(XRefEntry.Uncompressed(18, 0)))
  }
}
