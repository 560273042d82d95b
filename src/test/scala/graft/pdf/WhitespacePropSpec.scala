package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.convert.Whitespace

/** Property guards for the hand-rolled cleaner (rewritten to char[]
  * cursors for speed): structural invariants + idempotence over
  * whitespace-heavy random inputs. Reference parity itself is pinned
  * separately by the byte-equality goldens. */
class WhitespacePropSpec extends AnyFunSuite {

  // whitespace-dense alphabet incl. CRLF, tabs, artifact-ish lines,
  // and a non-latin1 char to exercise the UTF16 coder paths
  private val pieces = Vector(
    " ", "  ", "\t", "\n", "\r", "\r\n", "\n\n\n\n\n",
    "word", "a", "Page 3", "- 12 -", "[7]", "42", "----", "====",
    "x y", "¢", "doc 9000", "z1 ", " 1z", "\t\t", "…")

  private def randomDoc(rnd: java.util.Random): String = {
    val n = rnd.nextInt(40)
    val sb = new StringBuilder
    var i = 0
    while (i < n) { sb.append(pieces(rnd.nextInt(pieces.size))); i += 1 }
    sb.toString.take(400)
  }

  private def checkInvariants(out: String, markdown: Boolean = false): Unit = {
    if (out.nonEmpty) {
      // markdown quirk (pinned by goldens): blanking an artifact FIRST
      // line can leave the next line's preserved indentation as the
      // output head, so only plain mode guarantees a visible first char
      if (markdown) assert(out.head != '\n', s"leading newline in [${out.take(20)}]")
      else assert(!out.head.isWhitespace, s"leading ws in [${out.take(20)}]")
      assert(out.last != ' ' && out.last != '\n', s"trailing ws/nl in [${out.takeRight(20)}]")
    }
    assert(!out.contains(" \n"), s"trailing space before newline in [$out]")
    assert(!out.contains("\n\n\n\n"), s"newline run > 3 in [$out]")
    // interior 2+ space runs collapse; only line-leading indentation
    // may keep multiple spaces
    for (line <- out.split("\n", -1)) {
      val body = line.dropWhile(_ == ' ')
      assert(!body.contains("  "), s"interior double space in [$line]")
    }
  }

  test("plain-text clean: invariants + idempotence over 2000 random docs") {
    val rnd = new java.util.Random(4242L)
    for (_ <- 1 to 2000) {
      val s = randomDoc(rnd)
      val once = Whitespace.cleanPlainText(s)
      checkInvariants(once)
      assert(Whitespace.cleanPlainText(once) == once, s"not idempotent for [$s]")
    }
  }

  test("oracle tokenizer class matches Java \\s exactly (incl. vertical tab)") {
    // the DuckDB oracles split on '[\s\x0b]+' because RE2's \s lacks
    // VT while Java's has it; pin the Java side of that contract and
    // the presence of the widened class in the generated SQL
    val vt = 0x0b.toChar
    assert(s"a${vt}b c".split("\\s+").toSeq == Seq("a", "b", "c"))
    for (c <- Seq('\t', '\n', vt, '\f', '\r', ' '))
      assert(s"x${c}y".split("\\s+").toSeq == Seq("x", "y"), s"char ${c.toInt}")
    val sqls = graft.SparkEntry.oracleSql.values.mkString("\n")
    assert(!sqls.contains("string_split_regex(lower(text), '\\s+')"),
      "an oracle still tokenizes with bare RE2 \\s (no VT)")
  }

  test("markdown clean: invariants + second-pass fixpoint over 2000 random docs") {
    val rnd = new java.util.Random(2424L)
    for (_ <- 1 to 2000) {
      val s = randomDoc(rnd)
      val once = Whitespace.cleanMarkdown(s)
      checkInvariants(once, markdown = true)
      // artifact-blanking can expose the next line's indentation as a
      // new head, which one more pass trims — the fixpoint is reached
      // by the second application
      val twice = Whitespace.cleanMarkdown(once)
      assert(Whitespace.cleanMarkdown(twice) == twice, s"no 2-pass fixpoint for [$s]")
    }
  }
}
