package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's Stats behavior
  * (structa tests/test_types.py:36-50).
  */
class StatsSpec extends AnyFunSuite {

  test("positional quartiles over range(10)") {
    val s = Stats.fromValues((0 until 10).map(_.toLong))
    assert(s.card == 10)
    assert(s.min == 0L)
    assert(s.q1 == 2L) // x[10/4] = x[2]
    assert(s.q2 == 5L) // high median x[5]
    assert(s.q3 == 7L) // x[7]
    assert(s.max == 9L)
    assert(s.unique)
  }

  test("positional quartiles over range(1000)") {
    val s = Stats.fromValues((0 until 1000).map(_.toLong))
    assert(s.q1 == 250L && s.q2 == 500L && s.q3 == 750L)
    assert(s.min == 0L && s.max == 999L)
  }

  test("quartiles with repeated values (weighted multiset)") {
    // multiset {0×5, 1×5}: sorted expansion x[0..9]; q2 = x[5] = 1
    val s = Stats.fromCounter(ValueCounter(Map[Any, Long](0L -> 5, 1L -> 5)))
    assert(s.card == 10 && s.q2 == 1L && !s.unique)
  }

  test("merge re-derives from summed counters") {
    val a = Stats.fromValues((0 until 5).map(_.toLong))
    val b = Stats.fromValues((5 until 10).map(_.toLong))
    val m = a.merge(b)
    assert(m == Stats.fromValues((0 until 10).map(_.toLong)))
  }

  test("merge is associative and commutative") {
    val xs = Seq(
      Stats.fromValues(Seq(1L, 2L, 2L)),
      Stats.fromValues(Seq(3L)),
      Stats.fromValues(Seq(0L, 9L, 9L, 9L)))
    val l = xs(0).merge(xs(1)).merge(xs(2))
    val r = xs(0).merge(xs(1).merge(xs(2)))
    assert(l == r)
    assert(xs(0).merge(xs(1)) == xs(1).merge(xs(0)))
  }

  test("string quartiles sort lexicographically") {
    val s = Stats.fromValues(Seq("b", "a", "d", "c"))
    assert(s.min == "a" && s.max == "d" && s.q2 == "c")
  }

  test("fromLengths") {
    val s = Stats.fromLengths(Seq("a", "bb", "ccc", "dddd").map(_.length))
    assert(s.min == 1L && s.max == 4L)
  }
}

class FormatSpec extends AnyFunSuite {
  test("formatInt SI suffixes (format.py:64-86)") {
    assert(Format.formatInt(0) == "0")
    assert(Format.formatInt(10) == "10")
    assert(Format.formatInt(1000) == "1.0K")
    assert(Format.formatInt(1600) == "1.6K")
    assert(Format.formatInt(4294967296L) == "4.3G")
  }

  test("formatSample (format.py:113-152)") {
    assert(Format.formatSample(1.0) == "1")
    assert(Format.formatSample(1.5) == "1.5")
    assert(Format.formatSample(null) == "null")
    assert(Format.formatSample(false) == "false")
    assert(Format.formatSample("foo") == "\"foo\"")
    assert(Format.formatSample(200000000000L) == "200.0G")
  }

  test("formatChars range compression (format.py:21-61)") {
    assert(Format.formatChars(Set('a', 'b')) == "ab")
    assert(Format.formatChars(Set('a', 'b', 'c')) == "a-c")
    assert(Format.formatChars(Set('a', 'b', 'c', 'd', 'h')) == "a-dh")
    assert(Format.formatChars(Set('a', 'b', 'c', 'd', 'h', 'i')) == "a-dh-i")
  }

  test("timestamp numrepr description (format.py:155-178)") {
    assert(Format.formatTimestampNumRepr(0, 1.0) ==
      "seconds since 1970-01-01")
    assert(Format.formatTimestampNumRepr(0, 86400.0) ==
      "days since 1970-01-01")
  }
}

class CharClassSpec extends AnyFunSuite {
  import CharClass._

  test("named class rendering (chars.py:80-95)") {
    assert(octDigit.render == "o")
    assert(decDigit.render == "d")
    assert(hexDigit.render == "x")
    assert(identFirst.render == "I")
    assert(identChar.render == "i")
    assert(AnyChar.render == ".")
    assert(CharClass("a").render == "a")
    assert(CharClass("").render == "∅")
  }

  test("subset algebra") {
    assert(octDigit.subsetOf(decDigit))
    assert(decDigit.subsetOf(hexDigit))
    assert(!hexDigit.subsetOf(decDigit))
    assert(decDigit.subsetOf(AnyChar))
    assert(CharClass("ab").union(CharClass("bc")) == CharClass("abc"))
    assert(CharClass("ab").union(AnyChar) == AnyChar)
  }
}
