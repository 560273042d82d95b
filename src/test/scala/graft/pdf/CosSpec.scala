package graft.pdf

import java.nio.charset.StandardCharsets.ISO_8859_1
import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.cos._
import graft.pdf.cos.PdfObj._

/** COS lexer/parser unit tests (reference analogs: src/object.rs:352-544
  * and src/lexer.rs inline tests). */
class CosSpec extends AnyFunSuite {

  private def parse(s: String): PdfObj =
    new ObjParser(s.getBytes(ISO_8859_1)).parseObject()

  test("numbers: int, real, signs, bare fraction") {
    assert(parse("42") == Int64(42))
    assert(parse("-17") == Int64(-17))
    assert(parse("+5") == Int64(5))
    assert(parse("34.5") == Real(34.5))
    assert(parse("-.002") == Real(-0.002))
    assert(parse("4.") == Real(4.0))
  }

  test("literal strings: escapes, octal, nesting, line continuation") {
    assert(new String(parse("(hello)").asStr.get, ISO_8859_1) == "hello")
    assert(new String(parse("(a\\nb\\tc)").asStr.get, ISO_8859_1) == "a\nb\tc")
    assert(new String(parse("(\\101\\102)").asStr.get, ISO_8859_1) == "AB")
    assert(new String(parse("(outer (inner) after)").asStr.get, ISO_8859_1) == "outer (inner) after")
    assert(new String(parse("(esc\\(paren\\))").asStr.get, ISO_8859_1) == "esc(paren)")
    assert(new String(parse("(cont\\\ninued)").asStr.get, ISO_8859_1) == "continued")
    // raw EOL inside string normalizes to \n (spec 7.3.4.2)
    assert(new String(parse("(a\r\nb)").asStr.get, ISO_8859_1) == "a\nb")
  }

  test("hex strings: whitespace, odd length pad") {
    assert(parse("<48656C6C6F>").asStr.get.sameElements("Hello".getBytes))
    assert(parse("<48 65 6C>").asStr.get.sameElements(Array[Byte](0x48, 0x65, 0x6c)))
    assert(parse("<484>").asStr.get.sameElements(Array[Byte](0x48, 0x40)))
  }

  test("names with #xx escapes") {
    assert(parse("/Name") == Name("Name"))
    assert(parse("/A#20B") == Name("A B"))
    assert(parse("/Lime#20Green") == Name("Lime Green"))
    assert(parse("/paired#28#29parentheses") == Name("paired()parentheses"))
  }

  test("dict, array, nested, refs") {
    val d = parse("<< /Type /Page /Count 3 /Kids [1 0 R 2 0 R] /Nested << /A true >> >>").asDict.get
    assert(d.name("Type").contains("Page"))
    assert(d.long("Count").contains(3L))
    assert(d.get("Kids").get.asArr.get == Vector(Ref(1, 0), Ref(2, 0)))
    assert(d.get("Nested").get.asDict.get.get("A").contains(Bool(true)))
  }

  test("number vs ref disambiguation") {
    // `1 0 R` is a ref; `1 0 5` is three numbers — first parse gets Int64(1)
    assert(parse("1 0 R") == Ref(1, 0))
    assert(parse("1 0 5") == Int64(1))
    assert(parse("[1 0 R 2]").asArr.get == Vector(Ref(1, 0), Int64(2)))
    assert(parse("[1 0 2]").asArr.get == Vector(Int64(1), Int64(0), Int64(2)))
  }

  test("comments skipped as whitespace") {
    assert(parse("% a comment\n42") == Int64(42))
    assert(parse("[1 % inline\n 2]").asArr.get == Vector(Int64(1), Int64(2)))
  }

  test("stream with explicit /Length") {
    val raw = "<< /Length 5 >>\nstream\nHello\nendstream"
    parse(raw) match {
      case Stream(d, data) =>
        assert(d.long("Length").contains(5L))
        assert(new String(data, ISO_8859_1) == "Hello")
      case other => fail(s"expected stream, got $other")
    }
  }

  test("stream with WRONG /Length falls back to endstream scan") {
    val raw = "<< /Length 999 >>\nstream\nHello\nendstream"
    parse(raw) match {
      case Stream(_, data) => assert(new String(data, ISO_8859_1) == "Hello")
      case other           => fail(s"expected stream, got $other")
    }
  }

  test("keywords: true/false/null") {
    assert(parse("true") == Bool(true))
    assert(parse("false") == Bool(false))
    assert(parse("null") == Null)
  }
}
