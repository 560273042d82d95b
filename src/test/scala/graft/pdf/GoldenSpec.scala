package graft.pdf

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.html.BoilerplateStripper
import graft.pdf.testgen.GoldenGen
import graft.spark.PagesGen

/** Golden gate (FIXTURES.md §4, north rule "byte-identical extracted
  * text per url"): extraction output must be byte-identical to the
  * frozen goldens in src/test/resources/golden. Regenerate consciously
  * with `runMain graft.pdf.testgen.GoldenGen` after a reviewed
  * semantic change. */
class GoldenSpec extends AnyFunSuite {

  private val dir = Paths.get("src/test/resources/golden")

  test("golden corpus exists") {
    assert(Files.exists(dir.resolve("doc0.txt")),
      "goldens missing — run `sbt \"runMain graft.pdf.testgen.GoldenGen\"` once and commit")
  }

  (0 until GoldenGen.NumDocs).foreach { i =>
    test(s"doc$i byte-identical to golden") {
      val (bytes, kind) = PagesGen.payload(i.toLong, GoldenGen.Seed)
      if (kind == "pdf") {
        val r = PdfExtractor.extract(bytes)
        val goldenTxt = Files.readAllBytes(dir.resolve(s"doc$i.txt"))
        assert(java.util.Arrays.equals(r.text.getBytes(UTF_8), goldenTxt),
          s"text drifted for pdf doc$i")
        val goldenMd = Files.readAllBytes(dir.resolve(s"doc$i.md"))
        assert(java.util.Arrays.equals(r.markdown.getBytes(UTF_8), goldenMd),
          s"markdown drifted for pdf doc$i")
        val goldenHtml = Files.readAllBytes(dir.resolve(s"doc$i.html"))
        assert(java.util.Arrays.equals(r.html.getBytes(UTF_8), goldenHtml),
          s"html drifted for pdf doc$i")
      } else {
        val txt = BoilerplateStripper.strip(bytes)
        val goldenTxt = Files.readAllBytes(dir.resolve(s"doc$i.txt"))
        assert(java.util.Arrays.equals(txt.getBytes(UTF_8), goldenTxt),
          s"text drifted for html doc$i")
      }
    }
  }

  // structured-HTML fixtures: stripMarkdown's list/table/blockquote
  // rendering frozen end-to-end (round-2 gap: the doc0-39 html docs
  // carry no <ul>/<table>, so structure rendering was unit-tested only)
  (0 until GoldenGen.NumStructDocs).foreach { i =>
    test(s"struct$i (lists/tables) byte-identical to golden") {
      val bytes = PagesGen.structuredHtml(i.toLong)
      val (text, md, title) = BoilerplateStripper.extractAll(bytes)
      assert(title == s"Structured $i")
      val goldenTxt = Files.readAllBytes(dir.resolve(s"struct$i.txt"))
      assert(java.util.Arrays.equals(text.getBytes(UTF_8), goldenTxt),
        s"text drifted for struct$i")
      val goldenMd = Files.readAllBytes(dir.resolve(s"struct$i.md"))
      assert(java.util.Arrays.equals(md.getBytes(UTF_8), goldenMd),
        s"markdown drifted for struct$i")
      // the structure actually rendered (guards against a silently
      // empty fixture making the byte-equality vacuous)
      val mdStr = new String(goldenMd, UTF_8)
      assert(mdStr.contains("- ") && mdStr.contains("|"),
        s"struct$i golden lacks list/table markers:\n$mdStr")
    }
  }
}
