package graft.html

import org.scalatest.funsuite.AnyFunSuite

/** The switch-based classifyTag must stay exactly equivalent to the
  * declarative tag sets it replaced for speed. */
class TagTableSpec extends AnyFunSuite {
  private val FlagSkip = 1
  private val FlagBlock = 2
  private val FlagBoiler = 4
  private val FlagA = 8

  private def expected(t: String): Int = {
    var f = 0
    if (BoilerplateStripper.skipContentTags.contains(t)) f |= FlagSkip
    if (BoilerplateStripper.blockTags.contains(t)) f |= FlagBlock
    if (BoilerplateStripper.boilerplateContext.contains(t)) f |= FlagBoiler
    if (t == "a") f |= FlagA
    f
  }

  test("classifyTag matches the tag sets for every known tag") {
    val all = BoilerplateStripper.blockTags ++
      BoilerplateStripper.skipContentTags ++
      BoilerplateStripper.boilerplateContext + "a"
    for (t <- all)
      assert(BoilerplateStripper.classifyTag(t) == expected(t), s"tag <$t>")
  }

  test("classifyTag returns 0 for unknown and near-miss names") {
    val misses = Seq("", "b", "i", "em", "h7", "h0", "ht", "lr", "span",
      "tt", "ux", "dx", "bx", "abbr", "font", "video", "strong", "navbar",
      "scripts", "stylex", "articles", "blockquot", "figcaption2", "xmp")
    for (t <- misses)
      assert(BoilerplateStripper.classifyTag(t) == expected(t), s"tag <$t>")
  }
}
