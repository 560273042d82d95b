package graft.pdf.convert

import java.util.regex.Pattern

/** Whitespace + page-artifact cleanup (reference:
  * src/converters/whitespace.rs). Precompiled Pattern singletons per JVM
  * (reference uses lazy_static, whitespace.rs:9-30); Java MULTILINE ≡
  * Rust `(?m)` anchors for these patterns (SURVEY §7.4.2).
  */
object Whitespace {

  // 2+ spaces not at line start (indentation preserved) → single space
  private val multiSpace = Pattern.compile("(?<=\\S) {2,}")
  private val manyNewlines = Pattern.compile("\n{4,}")
  private val trailingWs = Pattern.compile("(?m)[ \\t]+$")

  // page artifacts (reference: whitespace.rs:9-30, 91-114):
  //   "Page N", "- N -", "[N]", bare 1-3 digit lines, ---/=== separators
  private val pageN = Pattern.compile("(?m)^\\s*Page \\d+\\s*$")
  private val dashN = Pattern.compile("(?m)^\\s*- \\d+ -\\s*$")
  private val brackN = Pattern.compile("(?m)^\\s*\\[\\d+\\]\\s*$")
  private val bareN = Pattern.compile("(?m)^\\s*\\d{1,3}\\s*$")
  private val seps = Pattern.compile("(?m)^\\s*(-{3,}|={3,})\\s*$")

  /** Plain-text cleanup (reference: whitespace.rs:284-345): collapse
    * 2+ interior spaces, strip trailing ws, cap newlines at 3. */
  def cleanPlainText(s: String): String = {
    var t = multiSpace.matcher(s).replaceAll(" ")
    t = trailingWs.matcher(t).replaceAll("")
    t = manyNewlines.matcher(t).replaceAll("\n\n\n")
    t.trim
  }

  /** Markdown cleanup (reference: whitespace.rs:91-114, 247-255):
    * remove page artifacts then cap newlines. Deliberately faithful
    * quirk: bare 1-3-digit lines are removed even when they are
    * legitimate numeric content (SURVEY §7.4.9). */
  def cleanMarkdown(s: String): String = {
    var t = s
    t = pageN.matcher(t).replaceAll("")
    t = dashN.matcher(t).replaceAll("")
    t = brackN.matcher(t).replaceAll("")
    t = bareN.matcher(t).replaceAll("")
    t = seps.matcher(t).replaceAll("")
    t = trailingWs.matcher(t).replaceAll("")
    t = manyNewlines.matcher(t).replaceAll("\n\n\n")
    t.trim
  }
}
