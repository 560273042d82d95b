package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.convert.Whitespace

/** Cleanup semantics (reference: whitespace.rs:347-455 analog tests),
  * asserted against the documented regex behavior. */
class WhitespaceSpec extends AnyFunSuite {

  test("collapse interior 2+ spaces, keep indentation") {
    assert(Whitespace.cleanPlainText("a    b") == "a b")
    assert(Whitespace.cleanPlainText("a b") == "a b")
    assert(Whitespace.cleanPlainText("line one\n   indented  word") ==
      "line one\n   indented word")
  }

  test("trailing whitespace stripped per line") {
    assert(Whitespace.cleanPlainText("abc   \ndef\t\nghi") == "abc\ndef\nghi")
  }

  test("newlines capped at 3; result trimmed") {
    assert(Whitespace.cleanPlainText("a\n\n\n\n\n\nb") == "a\n\n\nb")
    assert(Whitespace.cleanPlainText("\n\n  a  \n\n") == "a")
  }

  test("CRLF normalized") {
    assert(Whitespace.cleanPlainText("a\r\nb\rc") == "a\nb\nc")
  }

  test("markdown artifacts removed: Page N / - N - / [N] / bare digits / separators") {
    val in = "Title\nPage 3\nreal content\n- 4 -\nmore text\n[12]\n7\n---\n====\nend"
    assert(Whitespace.cleanMarkdown(in) == "Title\n\nreal content\n\nmore text\n\n\nend")
  }

  test("markdown keeps 4-digit numbers and prose with digits") {
    assert(Whitespace.cleanMarkdown("1234\nyear 2020 was") == "1234\nyear 2020 was")
    assert(Whitespace.cleanMarkdown("123") == "")
  }

  test("full-pipeline vector (reference whitespace.rs:426-441)") {
    val out = Whitespace.cleanMarkdown(
      "Content\n\n\n\n\n\nPage 1\n\n\n\n\n\nMore content\n\n-----------\n\n\n\n\nEnd")
    assert(!out.contains("Page 1") && !out.contains("-----------"))
    assert(!out.contains("\n\n\n\n"), s"newline runs must cap at 3: ${out.replace("\n", "\\n")}")
    assert(out.contains("Content") && out.contains("More content") && out.contains("End"))
  }

  test("empty + already-clean inputs are fixed points (whitespace.rs:443-455)") {
    assert(Whitespace.cleanMarkdown("") == "")
    val in = "Line 1\n\nLine 2\n\nLine 3"
    assert(Whitespace.cleanMarkdown(in) == in)
  }

  test("quirk preserved: legitimate bare 1-3 digit line removed (SURVEY 7.4.9)") {
    assert(Whitespace.cleanMarkdown("The answer is\n42\nindeed") == "The answer is\n\nindeed")
  }
}
