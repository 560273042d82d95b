package graft.pdf.testgen

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import graft.pdf.PdfExtractor
import graft.html.BoilerplateStripper
import graft.spark.PagesGen

/** One-shot generator for the frozen golden corpus (FIXTURES.md §4):
  * extracts PagesGen docs 0..39 and writes text/markdown goldens under
  * src/test/resources/golden. Run ONCE, outputs committed and frozen;
  * GoldenSpec then enforces byte-identical extraction forever. Any
  * semantic change must consciously regenerate (and re-review) these.
  */
object GoldenGen {
  val NumDocs = 40
  val Seed = 42L
  /** structured-HTML fixture goldens (lists/tables/blockquotes through
    * stripMarkdown — PagesGen.structuredHtml, separate id space). */
  val NumStructDocs = 8

  def main(args: Array[String]): Unit = {
    val dir = Paths.get("src/test/resources/golden")
    Files.createDirectories(dir)
    (0 until NumDocs).foreach { i =>
      val (bytes, kind) = PagesGen.payload(i.toLong, Seed)
      if (kind == "pdf") {
        val r = PdfExtractor.extract(bytes)
        Files.write(dir.resolve(s"doc$i.txt"), r.text.getBytes(UTF_8))
        Files.write(dir.resolve(s"doc$i.md"), r.markdown.getBytes(UTF_8))
        Files.write(dir.resolve(s"doc$i.html"), r.html.getBytes(UTF_8))
      } else {
        Files.write(dir.resolve(s"doc$i.txt"),
          BoilerplateStripper.strip(bytes).getBytes(UTF_8))
      }
    }
    (0 until NumStructDocs).foreach { i =>
      val bytes = PagesGen.structuredHtml(i.toLong)
      val (text, md, _) = BoilerplateStripper.extractAll(bytes)
      Files.write(dir.resolve(s"struct$i.txt"), text.getBytes(UTF_8))
      Files.write(dir.resolve(s"struct$i.md"), md.getBytes(UTF_8))
    }
    println(s"wrote goldens for $NumDocs docs + $NumStructDocs structured to $dir")
  }
}
