package graft.pdf.content

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.cos.PdfObj._

/** Ports of the reference's content-stream parser vectors (reference:
  * src/content/parser.rs:698-868) against `ContentParser.parse`. The
  * reference emits 50+ typed enum variants; here operators are generic
  * (name, operands) nodes, so the vectors pin name + operand shape. */
class ReferenceContentVectorsSpec extends AnyFunSuite {

  private def parse(s: String): Vector[Op] =
    ContentParser.parse(s.getBytes("ISO-8859-1"))

  test("simple text program BT/Tf/Td/Tj/ET (parser.rs:698-708)") {
    val ops = parse("BT /F1 12 Tf 100 700 Td (Hello) Tj ET")
    assert(ops.map(_.name) == Vector("BT", "Tf", "Td", "Tj", "ET"))
    assert(ops(1).operands.toVector == Vector(Name("F1"), Int64(12)))
    assert(ops(2).operands.toVector == Vector(Int64(100), Int64(700)))
    assert(new String(ops(3).operands.head.asStr.get, "ISO-8859-1") == "Hello")
  }

  test("Tm six operands (parser.rs:711-727)") {
    val ops = parse("1 0 0 1 100 200 Tm")
    assert(ops.length == 1 && ops.head.name == "Tm")
    assert(ops.head.operands.toVector ==
      Vector(Int64(1), Int64(0), Int64(0), Int64(1), Int64(100), Int64(200)))
  }

  test("TJ array: strings + offsets (parser.rs:730-744)") {
    val ops = parse("[(Hello) -100 (World)] TJ")
    assert(ops.length == 1 && ops.head.name == "TJ")
    val arr = ops.head.operands.head.asArr.get
    assert(arr.length == 3)
    assert(new String(arr(0).asStr.get, "ISO-8859-1") == "Hello")
    assert(arr(1) == Int64(-100))
    assert(new String(arr(2).asStr.get, "ISO-8859-1") == "World")
  }

  test("color operators rg/RG (parser.rs:748-770)") {
    val ops = parse("1 0 0 rg\n0 1 0 RG")
    assert(ops.map(_.name) == Vector("rg", "RG"))
    assert(ops(0).operands.toVector == Vector(Int64(1), Int64(0), Int64(0)))
  }

  test("graphics state q/cm/Q (parser.rs:774-782)") {
    assert(parse("q 1 0 0 1 50 50 cm Q").map(_.name) == Vector("q", "cm", "Q"))
  }

  test("T* and text state Tc/Tw/Tz/TL (parser.rs:785-802)") {
    assert(parse("T*").map(_.name) == Vector("T*"))
    val ops = parse("2 Tc 3 Tw 50 Tz 14 TL")
    assert(ops.map(_.name) == Vector("Tc", "Tw", "Tz", "TL"))
    assert(ops(2).operands.head == Int64(50))
  }

  test("quote operators ' and \" (parser.rs:805-812)") {
    val ops = parse("(Text1) ' 1 0.5 (Text2) \"")
    assert(ops.map(_.name) == Vector("'", "\""))
    assert(ops(1).operands.length == 3)
  }

  test("path operators m/l/re/S (parser.rs:815-824)") {
    val ops = parse("100 200 m 150 250 l 10 10 50 50 re S")
    assert(ops.map(_.name) == Vector("m", "l", "re", "S"))
    assert(ops(2).operands.length == 4)
  }

  test("Do operator with XObject name (parser.rs:827-838)") {
    val ops = parse("/Im1 Do")
    assert(ops.length == 1 && ops.head.name == "Do")
    assert(ops.head.operands.head == Name("Im1"))
  }

  test("empty / whitespace-only streams (parser.rs:841-853)") {
    assert(parse("").isEmpty)
    assert(parse("   \n  \t  ").isEmpty)
  }

  test("real-number operands (parser.rs:856-868)") {
    val ops = parse("1.5 2.7 Td")
    assert(ops.length == 1 && ops.head.name == "Td")
    assert(ops.head.operands.toVector == Vector(Real(1.5), Real(2.7)))
  }
}
