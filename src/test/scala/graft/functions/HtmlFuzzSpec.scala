package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Random-input fuzz over the HTML extractor (the MediaFuzzSpec
  * discipline): it walks UNTRUSTED markup in one codegen'd pass, so
  * beyond the construct pins in HtmlTextSpec it must survive
  * arbitrary input — never throw, finish in bounded time, stay
  * deterministic — across four generator families: pure random
  * markup-alphabet soup, grammar-ish tag soup assembled from
  * fragments, truncations of valid documents at every prefix, and
  * random single-char mutations of valid documents.
  */
class HtmlFuzzSpec extends AnyFunSuite {

  private val seeds: Seq[String] = Seq(
    "<html><head><title>T &amp; t</title><style>p>a{x:1}</style>" +
      "</head><body><!-- c --><p>One <a href=\"/a?x=1&amp;y=2\">l" +
      "</a></p><script>if (1<2) { emit(\"<p>\") }</script>" +
      "<p>caf&#233; &#x2603;</p></body></html>",
    "<!DOCTYPE html><?pi v?><P CLASS='x>y'>A&nbsp;B</P>" +
      "<a href=\"#\">z</a><ul><li>i<li>j</ul>",
    "1 < 2 &amp; 3 > 2 <p>trail <b unclosed <i>deep</i>")

  private val fragments: Seq[String] = Seq(
    "<p>", "</p>", "<a href=\"", "\">", "'", "\"", ">", "<", "&",
    "&amp;", "&#233;", "&#x", ";", "<script>", "</script>",
    "<style>", "</style>", "<title>", "</title>", "<!--", "-->",
    "<!", "<?", "text", " ", "\n", "é☃", "</", "=",
    "&#xD800;", "&#99999999;", "a", "p", "script")

  private val alphabet: Array[Char] =
    "<>/&#;\"'=!-? aptilescrybx0123456789\n\té".toCharArray

  private def extract(s: String): (String, String, Int, Int) = {
    val r = HtmlTextExpr.compute(UTF8String.fromString(s))
    (r.getUTF8String(0).toString,
      if (r.isNullAt(1)) null else r.getUTF8String(1).toString,
      r.getInt(2), r.getInt(3))
  }

  test("never throws, bounded, deterministic over >= 10^4 cases") {
    val rnd = new scala.util.Random(2026)
    val pureRandom = Iterator.tabulate(4000) { i =>
      val len = rnd.nextInt(if (i % 4 == 0) 800 else 80)
      String.valueOf(Array.fill(len)(
        alphabet(rnd.nextInt(alphabet.length))))
    }
    val tagSoup = Iterator.tabulate(3000) { _ =>
      Seq.fill(2 + rnd.nextInt(20))(
        fragments(rnd.nextInt(fragments.size))).mkString
    }
    val truncations = seeds.iterator.flatMap(sd =>
      (0 to sd.length).iterator.map(sd.take))
    val mutations = Iterator.tabulate(3000) { _ =>
      val sd = seeds(rnd.nextInt(seeds.size)).toCharArray
      (0 until 1 + rnd.nextInt(3)).foreach { _ =>
        sd(rnd.nextInt(sd.length)) =
          alphabet(rnd.nextInt(alphabet.length))
      }
      String.valueOf(sd)
    }
    var count = 0
    (pureRandom ++ tagSoup ++ truncations ++ mutations).foreach { s =>
      val a = extract(s)
      val b = extract(s)
      assert(a === b, s"nondeterministic on: $s")
      assert(a._3 >= 0 && a._4 >= 0)
      assert(a._1 != null)
      // the collapsed text never carries a whitespace run, never
      // leads/trails with whitespace
      assert(!a._1.contains("  ") && a._1 == a._1.trim,
        s"bad whitespace in ${a._1} from: $s")
      count += 1
    }
    assert(count >= 10000, s"only $count cases ran")
  }

  test("plain text (no markup, no entities) passes through " +
      "whitespace-collapsed") {
    val rnd = new scala.util.Random(7)
    val plain = "abc def ghié☃ 0123".toCharArray
    (1 to 500).foreach { _ =>
      val s = String.valueOf(Array.fill(rnd.nextInt(60))(
        plain(rnd.nextInt(plain.length))))
      val expected = s.split("\\s+").filter(_.nonEmpty).mkString(" ")
      val (text, title, links, paras) = extract(s)
      assert(text === expected)
      assert(title === null && links === 0 && paras === 0)
    }
  }
}
