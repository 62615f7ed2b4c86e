package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.analyzer.TreeAnalyzer

/** Ports of the reference XML-surface spec (structa tests/test_xml.py
  * merge_siblings cases) plus element-form checks of [[Xml.of]]
  * against the reference's per-type `__xml__` shapes.
  */
class XmlSpec extends AnyFunSuite {
  import Xml._

  private def el(tag: String, kids: XNode*): XElem =
    XElem(tag, Vector.empty, kids.toVector)
  private def tx(s: String): XText = XText(s)

  test("merge_siblings consolidates adjacent same-tag children " +
      "(test_xml.py:29-35)") {
    // <doc><a>a</a><a>b</a><a>c</a><b>d</b><a>e</a></doc>
    val doc = el("doc", el("a", tx("a")), el("a", tx("b")),
      el("a", tx("c")), el("b", tx("d")), el("a", tx("e")))
    assert(mergeSiblings(doc).serialize ==
      "<doc><a>abc</a><b>d</b><a>e</a></doc>")
    // only DIRECT children merge, not descendants
    val nested = el("doc", el("a", tx("a"), el("a", tx("b"))),
      el("a", tx("c")), el("b", tx("d")), el("a", tx("e")))
    assert(mergeSiblings(nested).serialize ==
      "<doc><a>a<a>b</a>c</a><b>d</b><a>e</a></doc>")
  }

  test("serializer escaping and attribute forms") {
    assert(el("foo").serialize == "<foo/>")
    assert(el("foo", tx("a"), tx("b")).serialize == "<foo>ab</foo>")
    assert(XElem("a", Vector("k" -> "v"), Vector(tx("x<y")))
      .serialize == """<a k="v">x&lt;y</a>""")
  }

  test("scalar xml: int wraps values/summary with stats attributes") {
    val t = new TreeAnalyzer().analyze(
      (0 until 10).map(_.toLong: Any).toVector)
    val x = of(t)
    assert(x.tag == "list")
    val s = x.serialize
    // <int><values><summary …>…</summary></values></int> with the
    // reference's quartile graph and attribute forms
    assert(s.contains("<int><values><summary"), s)
    assert(s.contains("values=\"10\""), s)
    assert(s.contains("count=\"10\""), s)
    assert(s.contains("unique=\"unique\""), s)
    assert(s.contains("<min>0</min>"), s)
    assert(s.contains("<q2>5</q2>"), s)
    assert(s.contains("<max>9</max>"), s)
    assert(s.contains("<graph>"), s)
    // unique → no <sample>
    assert(!s.contains("<sample>"), s)
  }

  test("dict xml: fields with keys; str-of-int representation") {
    val data: Map[Any, Any] = Map("a" -> 1L, "b" -> 2L)
    val x = of(new TreeAnalyzer().analyze(data))
    val s = x.serialize
    assert(x.tag == "dict")
    assert(s.contains("<content><field><key>'a'</key>"), s)
    assert(s.contains("<lengths><stats>"), s)
  }

  test("strof/pattern xml for numeric strings; sample for non-unique") {
    val data: Vector[Any] =
      Vector.fill(3)("7") ++ Vector("8", "9", "7")
    val x = of(new TreeAnalyzer().analyze(data))
    val s = x.serialize
    assert(s.contains("<strof>"), s)
    assert(s.contains("<pattern><pat>d</pat></pattern>"), s)
    assert(s.contains("<sample><value count="), s)
  }

  test("value/empty/url forms") {
    assert(of(SValue()).serialize == "<value/>")
    assert(of(SEmpty).serialize == "<empty/>")
    val urls: Vector[Any] = Vector(
      "http://a.example/", "https://b.example/x")
    val lx = of(new TreeAnalyzer().analyze(urls))
    assert(lx.serialize.contains("<url"), lx.serialize)
  }

  test("styled terminal view: cli.xsl layout with ANSI roles") {
    val t = new TreeAnalyzer().analyze(
      (0 until 10).map(_.toLong: Any).toVector)
    val ansi = Render.styled(t, RenderOptions())
    assert(ansi.contains("\u001b[36mint\u001b[0m"), ansi)
    assert(ansi.contains("\u001b[32m range=\u001b[0m"), ansi)
    // unique scalars carry the underline role before the type color
    // (print_structure's unique-style, ui/cli.py:272)
    assert(ansi.contains("\u001b[4m\u001b[36mint"), ansi)
    // XSL layout: simple containers pad their brackets (cli.xsl
    // inline list template)
    val stripped = ansi.replaceAll("\u001b\\[[0-9]+m", "")
    assert(stripped == "[ int range=0..9 ]", stripped)
  }
}
