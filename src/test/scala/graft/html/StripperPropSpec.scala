package graft.html

import org.scalatest.funsuite.AnyFunSuite

/** Property guards for the segmenter's char[]-cursor accumulation
  * (capacity proof: collapse shrinks, entities never expand) and the
  * classification pipeline: never throws, deterministic, and block
  * text is whitespace-collapsed. */
class StripperPropSpec extends AnyFunSuite {

  private val pieces = Vector(
    "<p>", "</p>", "<div>", "</div>", "<script>", "</script>", "<br/>",
    "<a href=\"x\">", "</a>", "<table>", "<tr>", "<td>", "</td>", "</tr>", "</table>",
    "&amp;", "&lt;", "&#65;", "&#x1F600;", "&bogus;", "&", "&#xZZ;", "&#55296;",
    "word ", "  two  spaces ", "\t\n", "text&amp;more", "<P CLASS=x>", "</P>",
    "<!-- comment -->", "<!doctype html>", "<nav>", "</nav>", "¢", "<ul><li>item</li></ul>")

  private def randomHtml(rnd: java.util.Random): String = {
    val n = rnd.nextInt(60)
    val sb = new StringBuilder("<html><body>")
    var i = 0
    while (i < n) { sb.append(pieces(rnd.nextInt(pieces.size))); i += 1 }
    sb.append("</body></html>")
    sb.toString
  }

  test("extractAll: no throw, deterministic, collapsed block text (3000 random docs)") {
    val rnd = new java.util.Random(777L)
    for (_ <- 1 to 3000) {
      val html = randomHtml(rnd)
      val bytes = html.getBytes("UTF-8")
      val (text, md, title) = BoilerplateStripper.extractAll(bytes)
      val (text2, md2, title2) = BoilerplateStripper.extractAll(bytes)
      assert(text == text2 && md == md2 && title == title2, "nondeterministic")
      // block text is space-collapsed with no edge whitespace
      for (block <- text.split("\n\n", -1) if block.nonEmpty) {
        assert(!block.startsWith(" ") && !block.endsWith(" "), s"edge ws in [$block]")
        assert(!block.contains("  "), s"double space in [$block]")
        assert(!block.exists(c => c == '\n' || c == '\t'), s"uncollapsed ws in [$block]")
      }
    }
  }

  test("capacity stress: entity-dense and pathological inputs never overflow") {
    // worst cases for the char[] capacity proof: max-expansion numeric
    // entities, malformed entities that fall back 1:1, giant single
    // block, nothing but whitespace
    val cases = Seq(
      "<p>" + "&#x1F600;" * 5000 + "</p>",          // 9 bytes -> 2 chars each
      "<p>" + "&" * 8000 + "</p>",                  // bare ampersands, 1:1
      "<p>" + "&#xZZZZ;" * 4000 + "</p>",           // malformed, 1:1 fallback
      "<p>" + "a" * 60000 + "</p>",                 // one giant block
      " \t\n" * 20000,                               // all whitespace
      "<p>" + ("x " * 30000) + "</p>",              // alternating word/space
      "&amp;" * 10000)                               // entities outside any tag
    for (html <- cases) {
      val (text, md, _) = BoilerplateStripper.extractAll(html.getBytes("UTF-8"))
      assert(text != null && md != null)
    }
  }
}
