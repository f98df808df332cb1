package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.HtmlExtractor
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** Pins the html_text visible-text extraction semantics (the WET
  * step): script/style raw-text drop, comment/declaration drop,
  * attribute scanning with quoted '>', block-vs-inline line model,
  * entity decode incl. numeric and malformed forms, ASCII-only
  * whitespace collapse, and HTML5 stray-'<'/'&' literalness. The
  * DataFrame path exercises the codegen route (the kernel ships as
  * a reference object inside whole-stage codegen) and is asserted
  * identical to the scalar kernel.
  */
class HtmlTextSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val kernel = new HtmlExtractor

  private def viaDf(html: String): String =
    Seq(html).toDF("h")
      .select(GraftFunctions.html_text(col("h")).as("v"))
      .collect().head.getString(0)

  test("tags strip; block elements break lines; inline elements don't") {
    val html = "<html><body><h1>Title</h1><p>one <b>bold</b> two</p>" +
      "<p>alpha</p><div>beta</div><span>same</span> line</body></html>"
    assert(kernel.extract(html) ==
      "Title\none bold two\nalpha\nbeta\nsame line")
  }

  test("script and style are raw-text elements: payload markup is dropped whole") {
    val html = "<p>before</p>" +
      "<script type=\"text/javascript\">if (1 < 2) document.write(\"<p>sneak</p>\");</script>" +
      "<style>.nav > li { color: red } /* <p>sneak</p> */</style>" +
      "<p>after</p>"
    assert(kernel.extract(html) == "before\nafter")
    // case-insensitive close, attributes on the open tag
    assert(kernel.extract("<SCRIPT a='1'>x</ScRiPt><p>ok</p>") == "ok")
    // a '</script' not followed by '>' or whitespace is NOT the close tag
    assert(kernel.extract("<script>var s = '</scriptx';</script><p>ok</p>") == "ok")
    // unterminated raw text swallows to EOF (fail-closed: scripts never leak)
    assert(kernel.extract("<p>a</p><script>orphan") == "a")
  }

  test("comments, doctype and processing instructions are dropped") {
    assert(kernel.extract(
      "<!doctype html><?xml version=\"1.0\"?><!-- c <p>sneak</p> --><p>x</p>") == "x")
    assert(kernel.extract("<p>a</p><!-- unterminated <p>b</p>") == "a")
  }

  test("a quoted '>' inside an attribute value does not close the tag") {
    val html = "<p><a href=\"/q?x=1&amp;y>2\" title='a>b'>LINK</a> rest</p>"
    assert(kernel.extract(html) == "LINK rest")
  }

  test("entities: named, numeric, hex; malformed/unknown stay literal") {
    assert(kernel.extract("<p>Q &amp; A &lt;tag&gt; &quot;q&quot; &apos;a&apos;</p>") ==
      "Q & A <tag> \"q\" 'a'")
    assert(kernel.extract("<p>&#65;&#x42;&#x63;</p>") == "ABc")
    assert(kernel.extract("<p>a&nbsp;b</p>") == "a b")
    // unknown named, missing semicolon, bare '&', bad numeric: literal
    assert(kernel.extract("<p>&bogus; x &amp y &&& &#zz; &#x;</p>") ==
      "&bogus; x &amp y &&& &#zz; &#x;")
    // double-encoded round trip: &amp;amp; -> &amp;
    assert(kernel.extract("<p>&amp;amp;</p>") == "&amp;")
  }

  test("ASCII whitespace collapses; lines trim; empty lines drop; unicode spaces pass") {
    val html = "<div>\n   a\t\tb\fc\r\nd   </div>\n  \n<p>   </p><p>e</p>"
    assert(kernel.extract(html) == "a b c d\ne")
    // NBSP (raw), zero-width space, U+2028 are NOT HTML whitespace
    assert(kernel.extract("<p>a b</p><p>x​y</p><p>p q</p>") ==
      "a b\nx​y\np q")
  }

  test("stray '<' not opening markup is literal text (HTML5 tokenizer rule)") {
    assert(kernel.extract("<p>1 < 2 and 2 <3</p>") == "1 < 2 and 2 <3")
    // '<' at EOF is literal; an unterminated tag at EOF is dropped
    assert(kernel.extract("<p>x<") == "x<")
    assert(kernel.extract("<p>x</p><div attr=\"v") == "x")
  }

  test("br/hr break lines; surrogate pairs and combining marks survive") {
    assert(kernel.extract("<p>lineA<br/>lineB<br>lineC</p><hr>tail") ==
      "lineA\nlineB\nlineC\ntail")
    val uni = "<p>𝕏 café é</p>"
    assert(kernel.extract(uni) == "𝕏 café é")
  }

  test("empty and degenerate inputs") {
    assert(kernel.extract("") == "")
    assert(kernel.extract("   \n\t ") == "")
    assert(kernel.extract("plain text no markup") == "plain text no markup")
    assert(kernel.extract("<html></html>") == "")
  }

  test("DataFrame codegen path equals the scalar kernel") {
    val samples = Seq(
      "<html><head><title>T</title><script>1<2</script></head>" +
        "<body><nav>N | M</nav><p>a &amp; b</p><p>c<br/>d</p><footer>F</footer></body></html>",
      "<p>1 < 2 &bogus; &#65;</p>",
      "", "no markup at all", "<script>only</script>")
    samples.foreach { h => assert(viaDf(h) == kernel.extract(h), s"input: $h") }
    // SQL registration route
    val viaSql = spark.sql(
      "SELECT html_text('<p>a &amp; b</p><div>c</div>')").collect().head.getString(0)
    assert(viaSql == "a & b\nc")
  }
}
