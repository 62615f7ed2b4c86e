package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Construct-by-construct pins of the HTML extraction rules — each
  * case is one documented behavior of [[HtmlTextExpr]] (the same
  * constructs q167's oracle VALUES pin end-to-end).
  */
class HtmlTextSpec extends AnyFunSuite {

  private def run(html: String): (String, Option[String], Int, Int) = {
    val r: InternalRow =
      HtmlTextExpr.compute(UTF8String.fromString(html))
    (r.getUTF8String(0).toString,
      if (r.isNullAt(1)) None else Some(r.getUTF8String(1).toString),
      r.getInt(2), r.getInt(3))
  }

  test("plain paragraph: tags strip, text survives") {
    assert(run("<html><body><p>Hello world</p></body></html>") ===
      (("Hello world", None, 0, 1)))
  }

  test("title is RCDATA and entities decode in both streams") {
    assert(run("<html><head><title>Lab &amp; Co</title></head>" +
      "<body><p>A &lt;b&gt; tag</p></body></html>") ===
      (("A <b> tag", Some("Lab & Co"), 0, 1)))
  }

  test("script content drops wholesale — markup inside never counts") {
    assert(run("<body><script>var x = \"<p>no</p>\";</script>" +
      "<p>Real</p></body>") === (("Real", None, 0, 1)))
  }

  test("style content drops wholesale") {
    assert(run("<body><style>p > a { color: red }</style>" +
      "<p>Styled</p></body>") === (("Styled", None, 0, 1)))
  }

  test("links count; attribute entities are not text") {
    assert(run("<p>See <a href=\"http://x.example/a?b=1&amp;c=2\">" +
      "one</a> and <a href='/two'>two</a></p>") ===
      (("See one and two", None, 2, 1)))
  }

  test("comments drop, including markup inside them") {
    assert(run("<body><!-- hidden <p>no</p> --><p>Shown</p></body>")
      === (("Shown", None, 0, 1)))
  }

  test("decimal and hex numeric entities decode") {
    assert(run("<p>caf&#233; &#x2603; &#65;B</p>") ===
      (("café ☃ AB", None, 0, 1)))
  }

  test("a bare < before a non-letter is literal text") {
    assert(run("1 < 2 and <p>fine</p>") ===
      (("1 < 2 and fine", None, 0, 1)))
  }

  test("quoted attribute values may contain >") {
    assert(run("<p><a href=\"/x?q=a>b\" title='1>2'>q</a></p>") ===
      (("q", None, 1, 1)))
  }

  test("doctype drops; paragraphs count per open tag") {
    assert(run("<!DOCTYPE html><div><p>One</p><p>Two</p></div>") ===
      (("One Two", None, 0, 2)))
  }

  test("tag names are case-insensitive; nbsp collapses as space") {
    assert(run("<P>UP&nbsp;CASE</P><A HREF=\"#\">L</A>") ===
      (("UP CASE L", None, 1, 1)))
  }

  test("broken markup never throws: an unquoted < inside a tag " +
      "ends at the next >") {
    assert(run("<p>trail <b unclosed <i>deep</i>") ===
      (("trail deep", None, 0, 1)))
  }

  test("malformed entities stay literal") {
    assert(run("<p>a&b; &unknown; &#; &#x; 5&amp6</p>") ===
      (("a&b; &unknown; &#; &#x; 5&amp6", None, 0, 1)))
  }

  test("out-of-range and surrogate code points become U+FFFD") {
    assert(run("<p>&#x110000; &#xD800; &#0;</p>") ===
      (("� � �", None, 0, 1)))
  }

  test("whitespace runs collapse; leading/trailing trim") {
    assert(run("  <p>\n  a\t\tb  </p>  ") === (("a b", None, 0, 1)))
  }

  test("no title element reports NULL; multiple titles concatenate") {
    assert(run("<p>x</p>")._2 === None)
    assert(run("<title>A</title><title>B</title>")._2 === Some("AB"))
    assert(run("<title>A </title><title>B</title>")._2 === Some("A B"))
  }

  test("unterminated script/comment/tag end silently at EOF") {
    assert(run("<p>keep</p><script>lost forever") ===
      (("keep", None, 0, 1)))
    assert(run("<p>keep</p><!-- lost") === (("keep", None, 0, 1)))
    assert(run("<p>keep</p><a href=\"x") === (("keep", None, 1, 1)))
  }

  test("RCDATA title: tags inside the title are literal text") {
    assert(run("<title>a <p> b</title><p>t</p>") ===
      (("t", Some("a <p> b"), 0, 1)))
  }

  test("close-tag lookalikes inside raw text do not end the element") {
    assert(run("<script>a </scriptx> b</script><p>y</p>") ===
      (("y", None, 0, 1)))
  }

  test("processing instructions drop") {
    assert(run("<?xml version=\"1.0\"?><p>pi</p>") ===
      (("pi", None, 0, 1)))
  }
}
