package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.html.BoilerplateStripper
import graft.spark.PagesGen

/** Corpus-wide output invariants, ported from the reference's
  * regression axes (reference: docs/REGRESSION_TEST_SUITE.md:29-88):
  * no U+FFFD, no control chars except \t\n, whitespace discipline,
  * no split-word artifacts, sane word lengths. Runs over 300 synthetic
  * docs (PDF + HTML mix). */
class InvariantsSpec extends AnyFunSuite {

  private lazy val outputs: Seq[(Long, String, String)] =
    (0 until 300).map { i =>
      val (bytes, kind) = PagesGen.payload(i.toLong, 42L)
      val text =
        if (kind == "pdf") PdfExtractor.extract(bytes).text
        else BoilerplateStripper.strip(bytes)
      (i.toLong, kind, text)
    }

  test("all docs extract non-empty") {
    val empty = outputs.filter(_._3.isEmpty)
    assert(empty.isEmpty, s"empty extractions: ${empty.map(_._1)}")
  }

  test("no U+FFFD replacement chars (REGRESSION_TEST_SUITE.md:29-33)") {
    val bad = outputs.filter(_._3.contains('�'))
    assert(bad.isEmpty, s"U+FFFD in docs: ${bad.map(_._1)}")
  }

  test("no control chars except tab/newline (:65-69)") {
    val bad = outputs.filter { case (_, _, t) =>
      t.exists(c => c < ' ' && c != '\n' && c != '\t')
    }
    assert(bad.isEmpty, s"control chars in docs: ${bad.map(_._1)}")
  }

  test("no 3+ consecutive spaces; newlines capped at 3 (:75-78)") {
    val badSp = outputs.filter(_._3.contains("   "))
    // leading indentation is legal; our synthetic corpus has none, so a
    // flat check is valid here
    assert(badSp.isEmpty, s"3+ spaces in docs: ${badSp.map(_._1)}")
    val badNl = outputs.filter(_._3.contains("\n\n\n\n"))
    assert(badNl.isEmpty, s"4+ newlines in docs: ${badNl.map(_._1)}")
  }

  test("healthy mean word length, 3-12 chars (:50)") {
    outputs.foreach { case (id, _, t) =>
      val words = t.split("\\s+").filter(_.nonEmpty)
      if (words.length > 10) {
        val mean = words.map(_.length).sum.toDouble / words.length
        assert(mean >= 3 && mean <= 12, s"doc $id mean word len $mean")
      }
    }
  }

  test("no mid-word splits: every output word is from the generator vocabulary") {
    // PagesGen draws words from a fixed bank; a split like "var ious"
    // would surface as a non-vocabulary token (:51)
    val vocab = Set("analysis", "baseline", "corpus", "document", "engine",
      "feature", "graph", "heading", "index", "journal", "kernel", "layout",
      "model", "network", "output", "pipeline", "query", "result", "system",
      "theory", "update", "vector", "workflow", "extraction", "content",
      "partition", "schema", "stream", "buffer", "matrix")
    outputs.filter(_._2 == "pdf").foreach { case (id, _, t) =>
      t.split("[\\s\\n]+").filter(_.nonEmpty).foreach { w =>
        val clean = w.toLowerCase.stripSuffix(".")
        assert(vocab.contains(clean), s"doc $id: unexpected token '$w'")
      }
    }
  }
}
