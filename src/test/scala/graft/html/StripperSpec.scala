package graft.html

import org.scalatest.funsuite.AnyFunSuite

/** T8 HTML tier (FIXTURES.md §3): boilerplate axes beyond the basic
  * nav/footer case — link farms, empty body, charsets, entities,
  * title metadata. */
class StripperSpec extends AnyFunSuite {

  private val goodPara =
    "<p>This paragraph is long enough and wordy enough that the density " +
    "classifier keeps it as the main content of the page without doubt.</p>"

  test("link farm yields no main content") {
    val farm = (1 to 40).map(i => s"""<a href="/p$i">partner site number $i</a>""")
      .mkString("<div>", " ", "</div>")
    val html = s"<html><body>$farm</body></html>"
    assert(BoilerplateStripper.strip(html) == "")
  }

  test("empty body yields empty text, no failure") {
    assert(BoilerplateStripper.strip("<html><head><title>t</title></head><body></body></html>") == "")
    assert(BoilerplateStripper.strip("") == "")
  }

  test("meta charset iso-8859-1 decodes high bytes") {
    val body = s"<html><head><meta charset=iso-8859-1></head><body><article>$goodPara</article>".replace("paragraph", "café paragraph")
    val bytes = (body + "</body></html>").getBytes("ISO-8859-1")
    val out = BoilerplateStripper.strip(bytes)
    assert(out.contains("café"), out)
  }

  test("numeric + named entities decoded") {
    val html = s"<html><body><article><p>Entity check: &amp; &#8212; &#x2014; &nbsp;and " +
      "this sentence pads the block long enough for the classifier to keep it.</p></article></body></html>"
    val out = BoilerplateStripper.strip(html)
    assert(out.contains("& — —"), out)
  }

  test("script/style/comment content never leaks") {
    val html = "<html><body><script>var x = 'leak me not';</script>" +
      "<style>.c { color: red }</style><!-- secret comment -->" +
      s"<article>$goodPara</article></body></html>"
    val out = BoilerplateStripper.strip(html)
    assert(!out.contains("leak"), out)
    assert(!out.contains("color"), out)
    assert(!out.contains("secret"), out)
    assert(out.contains("main content"))
  }

  test("title extraction") {
    val html = "<html><head><title> The &amp; Title </title></head><body></body></html>"
    assert(BoilerplateStripper.title(html) == "The & Title")
    assert(BoilerplateStripper.title("<html><body>no title</body></html>") == "")
  }

  test("stripMarkdown renders headings, bullets and tables; drops nav") {
    val html = "<html><body><nav><a href='/'>Home</a> <a href='/x'>X</a></nav>" +
      "<article><h2>Results of the study</h2>" +
      s"<p>$goodPara</p>" +
      "<ul><li>first item of the list</li><li>second item of the list</li></ul>" +
      "<table><tr><th>name</th><th>value of the metric</th></tr>" +
      "<tr><td>alpha</td><td>comparison across the corpus</td></tr></table>" +
      "</article><footer><a href='/terms'>Terms</a></footer></body></html>"
    val md = BoilerplateStripper.stripMarkdown(html)
    assert(md.contains("## Results of the study"), md)
    assert(md.contains("- first item of the list\n- second item of the list"), md)
    assert(md.contains("| name | value of the metric |"), md)
    assert(md.contains("| --- | --- |"), md)
    assert(md.contains("| alpha | comparison across the corpus |"), md)
    assert(!md.contains("Home"), md)
    assert(!md.contains("Terms"), md)
  }

  test("stripMarkdown drops link-farm tables but keeps content prose") {
    val html = "<html><body>" +
      "<table><tr><td><a href='/1'>l1</a></td><td><a href='/2'>l2</a></td></tr></table>" +
      s"<p>$goodPara</p></body></html>"
    val md = BoilerplateStripper.stripMarkdown(html)
    assert(!md.contains("l1"), md)
    assert(md.contains("main content"), md)
  }
}
