package graft.pdf

import java.nio.charset.StandardCharsets.ISO_8859_1
import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.cos._
import graft.pdf.cos.PdfObj._

/** Ports of the reference's inline parser/lexer edge vectors not yet
  * covered by CosSpec (reference: src/parser.rs:716-1110,
  * src/lexer.rs:610-647) — octal-escape boundary behavior, invalid
  * name #-escapes kept literal, empty names, and LENIENT unclosed
  * array/dict parsing (real crawl PDFs truncate mid-object). */
class ReferenceParserVectorsSpec extends AnyFunSuite {

  private def parse(s: String): PdfObj =
    new ObjParser(s.getBytes(ISO_8859_1)).parseObject()
  private def str(s: String): String = new String(parse(s).asStr.get, ISO_8859_1)

  test("octal escapes: 1/2/3 digits + stop at non-octal (parser.rs:716-751)") {
    assert(str("(Section \\247)") == "Section §")
    assert(str("(Plus \\53)") == "Plus +")
    assert(str("(Bell \\7)") == "Bell \u0007")
    // \128 = \12 (= \n) then literal '8'
    assert(str("(Value \\128)") == "Value \n8")
  }

  test("octal escapes: the real-crawl certificate case (parser.rs:753-762)") {
    assert(str("(\\247 71.01\\26115 Temporary certificate.)") ==
      "§ 71.01±15 Temporary certificate.")
  }

  test("mixed escapes in one string (parser.rs:773-779)") {
    assert(str("(Tab:\\tNewline:\\nOctal:\\53)") == "Tab:\tNewline:\nOctal:+")
  }

  test("invalid name #-escapes stay literal (lexer.rs:631-647)") {
    assert(parse("/A#ZZ") == Name("A#ZZ"))   // invalid hex
    assert(parse("/A#") == Name("A#"))       // # at end
    assert(parse("/A#2") == Name("A#2"))     // one digit only
    assert(parse("/A#20B#23C") == Name("A B#C"))
  }

  test("empty name accepted leniently (lexer.rs:610-615)") {
    assert(parse("/ ") == Name(""))
  }

  test("unclosed array returns the elements parsed so far (parser.rs:1044-1056)") {
    val arr = parse("[ 1 2 3").asArr.get
    assert(arr == Vector(Int64(1), Int64(2), Int64(3)))
  }

  test("unclosed dictionary returns the entries parsed so far (parser.rs:1058-1067)") {
    val d = parse("<< /Type /Page").asDict.get
    assert(d.name("Type").contains("Page"))
  }

  test("every byte-truncation of a complex object parses or throws cleanly") {
    // the lenient-truncation paths must hold at EVERY cut point, not
    // just the two vectors above: partial parse or PdfParseException,
    // never a foreign exception and never an infinite loop
    val full = "<< /Type /Page /Kids [1 0 R 2 0 R <</N (str\\( esc)>> <AB CD>] " +
      "/A << /B [ 1 2.5 -.7 (nested (p)) /N#20m true null ] >> >>"
    (1 until full.length).foreach { cut =>
      val s = full.substring(0, cut)
      try { parse(s); () }
      catch {
        case _: PdfParseException => ()
        case e: Throwable => fail(s"cut=$cut leaked ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("number edge forms: bare-dot reals + real/integer distinction (lexer.rs:516-535, 841-853)") {
    assert(parse(".5") == Real(0.5))
    assert(parse("5.") == Real(5.0))
    assert(parse("-.002") == Real(-0.002))
    // integral-valued reals stay Real (the type distinction survives)
    assert(parse("0.0") == Real(0.0))
    assert(parse("3.14") == Real(3.14))
    assert(parse("0") == Int64(0))
    assert(parse("42") == Int64(42))
    assert(parse("-123") == Int64(-123))
  }

  test("pooled parseName matches per-char decode semantics on random names") {
    // oracle: the pre-pool per-char StringBuilder decode (lexer.rs name
    // path) — pooled/sliced construction must be byte-identical for
    // every name shape, including #xx escapes, invalid escapes, and
    // high (0x80+) bytes
    def oracle(bytes: Array[Byte]): String = {
      val sb = new java.lang.StringBuilder
      var i = 0
      def hex(c: Int) = Character.digit(c, 16) >= 0
      while (i < bytes.length) {
        val c = bytes(i) & 0xff
        if (c == '#' && i + 2 < bytes.length &&
            hex(bytes(i + 1) & 0xff) && hex(bytes(i + 2) & 0xff)) {
          sb.append(((Character.digit(bytes(i + 1) & 0xff, 16) << 4) |
            Character.digit(bytes(i + 2) & 0xff, 16)).toChar)
          i += 3
        } else { sb.append(c.toChar); i += 1 }
      }
      sb.toString
    }
    val regular = (0 until 256).filter { c =>
      !Set(0x00, 0x09, 0x0a, 0x0c, 0x0d, 0x20).contains(c) &&
        !"()<>[]{}/%".contains(c.toChar)
    }.toArray
    val rnd = new java.util.Random(7L)
    (0 until 2000).foreach { _ =>
      val len = rnd.nextInt(12)
      val raw = Array.fill(len) {
        val r = rnd.nextInt(10)
        if (r < 3) '#'.toByte
        else if (r < 6) ('a' + rnd.nextInt(26)).toByte
        else regular(rnd.nextInt(regular.length)).toByte
      }
      val parsed = new ObjParser(("/" + new String(raw, ISO_8859_1) + " ")
        .getBytes(ISO_8859_1)).parseObject()
      assert(parsed == Name(oracle(raw)), s"name bytes: ${raw.mkString(",")}")
    }
    // pool hits return the canonical instance (reference equality)
    val n1 = new ObjParser("/Type ".getBytes(ISO_8859_1)).parseObject()
    assert(n1.asInstanceOf[Name].v eq "Type")
  }

  test("extra whitespace everywhere (parser.rs:1087-1110)") {
    assert(parse("  \n\t  42") == Int64(42))
    assert(parse("[  1   2    3  ]").asArr.get.length == 3)
    assert(parse("<<  /Type   /Page  >>").asDict.get.name("Type").contains("Page"))
  }
}
