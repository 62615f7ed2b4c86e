package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Block segmentation pins + the cross-expression law: block texts
  * joined with single spaces ALWAYS equal HtmlTextExpr's text (the
  * two walkers cannot drift), fuzzed over >10^4 adversarial cases.
  */
class HtmlBlocksSpec extends AnyFunSuite {

  private def blocks(html: String): Seq[(String, Int, Int)] = {
    val arr = HtmlBlocksExpr.compute(UTF8String.fromString(html))
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2))
    }
  }

  private def extractText(html: String): String = {
    val r: InternalRow =
      HtmlTextExpr.compute(UTF8String.fromString(html))
    r.getUTF8String(0).toString
  }

  test("blocks split at block tags; inline tags only separate words") {
    assert(blocks("<p>one two</p><p>three</p>") ===
      Seq(("one two", 7, 0), ("three", 5, 0)))
    assert(blocks("<p>a <b>bold</b> c</p>") === Seq(("a bold c", 8, 0)))
    assert(blocks("x<br>y") === Seq(("x", 1, 0), ("y", 1, 0)))
  }

  test("link chars count inside <a>, including collapse spaces") {
    // "nav one nav two" — all appended inside the two anchors except
    // the block has: 'nav one' (7 link chars) + ' ' (separator
    // appended outside any pend? the space between </a> and <a> is
    // pushed when 'n' of 'nav two' arrives, with aDepth back > 0)
    val b = blocks("<li><a href='/'>nav one</a> <a href='/x'>nav " +
      "two</a></li>")
    assert(b.length === 1)
    val (text, nc, lc) = b.head
    assert(text === "nav one nav two")
    assert(nc === 15)
    // every char including the inter-anchor collapse space was
    // appended while aDepth > 0 except... the separator space is
    // appended lazily when 'n' arrives (aDepth 1 again) -> all 15
    assert(lc === 15)
  }

  test("prose with one inline link: partial link density") {
    val b = blocks("<p>a long sentence with a <a href='/r'>ref</a> " +
      "inside it</p>")
    assert(b.length === 1)
    val (text, nc, lc) = b.head
    assert(text === "a long sentence with a ref inside it")
    assert(nc === text.length)
    // "ref" plus the lazily-appended separator space that lands
    // while aDepth > 0 (the documented attribution rule)
    assert(lc === 4)
  }

  test("title/script/style content never reaches any block") {
    assert(blocks("<title>t</title><script>s</script><p>x</p>") ===
      Seq(("x", 1, 0)))
  }

  test("unclosed anchors saturate, stray closes floor at zero") {
    // stray </a> at depth 0 is a no-op; the unclosed <a> makes
    // "linked" (and its lazy separator space) link chars
    val b = blocks("<p></a>free <a>linked")
    assert(b === Seq(("free linked", 11, 7)))
  }

  test("the jusText-style integer gate separates nav from prose") {
    val page = "<nav><li><a href='/a'>home</a></li><li>" +
      "<a href='/b'>about us</a></li></nav>" +
      "<p>this is a long paragraph of real article prose with " +
      "plenty of characters and <a href='/r'>one link</a> only</p>" +
      "<footer><a href='/c'>contact</a></footer>"
    val bs = blocks(page)
    def isContent(b: (String, Int, Int)): Boolean =
      b._2 >= 20 && 2 * b._3 < b._2
    val content = bs.filter(isContent)
    assert(content.length === 1)
    assert(content.head._1.startsWith("this is a long paragraph"))
    assert(bs.count(!isContent(_)) === bs.length - 1)
  }

  test("LAW: block texts joined with spaces equal HtmlTextExpr " +
      "text — fuzzed over >10^4 adversarial cases") {
    val seeds: Seq[String] = Seq(
      "<html><head><title>T &amp; t</title><style>p>a{x:1}</style>" +
        "</head><body><!-- c --><p>One <a href=\"/a?x=1&amp;y=2\">l" +
        "</a></p><script>if (1<2) { emit(\"<p>\") }</script>" +
        "<p>caf&#233; &#x2603;</p></body></html>",
      "<!DOCTYPE html><?pi v?><P CLASS='x>y'>A&nbsp;B</P>" +
        "<a href=\"#\">z</a><ul><li>i<li>j</ul>",
      "1 < 2 &amp; 3 > 2 <p>trail <b unclosed <i>deep</i>",
      "<div><nav><a href='/'>x</a></nav><td>y</td></div>")
    val fragments = Seq("<p>", "</p>", "<a href=\"", "\">", "'",
      "\"", ">", "<", "&", "&amp;", "&#233;", "&#x", ";",
      "<script>", "</script>", "<style>", "</style>", "<title>",
      "</title>", "<!--", "-->", "<!", "<?", "text", " ", "\n",
      "é☃", "</", "=", "<div>", "</div>", "<br>", "<li>", "</a>",
      "a", "p")
    val alphabet =
      "<>/&#;\"'=!-? aptilescrybdvnx0123456789\n\té".toCharArray
    val rnd = new scala.util.Random(2027)
    def law(s: String): Unit = {
      val joined = blocks(s).map(_._1).mkString(" ")
      assert(joined === extractText(s), s"LAW broken on: $s")
      blocks(s).foreach { case (t, nc, lc) =>
        assert(t.nonEmpty && nc == t.length && lc >= 0 && lc <= nc)
      }
    }
    var count = 0
    Iterator.tabulate(4000) { i =>
      String.valueOf(Array.fill(rnd.nextInt(
        if (i % 4 == 0) 600 else 80))(
        alphabet(rnd.nextInt(alphabet.length))))
    }.foreach { s => law(s); count += 1 }
    Iterator.tabulate(3000) { _ =>
      Seq.fill(2 + rnd.nextInt(20))(
        fragments(rnd.nextInt(fragments.size))).mkString
    }.foreach { s => law(s); count += 1 }
    seeds.foreach(sd => (0 to sd.length).foreach { k =>
      law(sd.take(k)); count += 1
    })
    Iterator.tabulate(3000) { _ =>
      val sd = seeds(rnd.nextInt(seeds.size)).toCharArray
      (0 until 1 + rnd.nextInt(3)).foreach { _ =>
        sd(rnd.nextInt(sd.length)) =
          alphabet(rnd.nextInt(alphabet.length))
      }
      String.valueOf(sd)
    }.foreach { s => law(s); count += 1 }
    assert(count >= 10000, s"only $count cases ran")
  }
}
