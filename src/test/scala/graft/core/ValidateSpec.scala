package graft.core

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's per-type validate() cases
  * (structa tests/test_types.py; validate raises TypeError/ValueError
  * there — our validates() returns false for both, which is what the
  * extraction warning path consumes).
  */
class ValidateSpec extends AnyFunSuite {

  private def stats(vs: Any*): Stats =
    Stats.fromCounter(ValueCounter.from(vs))

  test("int: range and type (test_types.py:690-700)") {
    val p = SInt(stats(1L, 10L, 1000L))
    assert(p.validates(5L))
    assert(!p.validates("1")) // TypeError in the reference
    assert(!p.validates(2000L)) // ValueError
  }

  test("float accepts ints in range; rejects strings " +
      "(test_types.py:727-737)") {
    val p = SFloat(stats(0.0, 1.0, 1000.0))
    assert(p.validates(1.0))
    assert(p.validates(1L))
    assert(!p.validates("1.0"))
    assert(!p.validates(2000.0))
  }

  test("bool: only 0/1 ints or booleans") {
    val p = SBool(stats(true, false))
    assert(p.validates(true))
    assert(p.validates(1L))
    assert(!p.validates(2L))
    assert(!p.validates("true"))
  }

  test("datetime: range and type (test_types.py:765-777)") {
    val lo = Instant.parse("1970-01-01T00:00:00Z")
    val hi = Instant.parse("1970-02-01T00:00:00Z")
    val p = SDateTime(stats(lo, hi))
    assert(p.validates(Instant.parse("1970-01-01T00:30:00Z")))
    assert(!p.validates(86400L)) // TypeError
    assert(!p.validates(Instant.parse("1980-01-01T00:00:00Z")))
  }

  test("str: value range; empty out of range (test_types.py:618-628)") {
    val p = SStr.fromCounter(ValueCounter.from(Seq("aaa", "blah", "zzz")))
    assert(p.validates("blah"))
    assert(!p.validates("")) // below min → ValueError analog
    assert(!p.validates(123L))
  }

  test("fixed str: per-position pattern (test_types.py:632-645)") {
    import CharClass._
    val values = (0 until 1000).map(n => f"0x$n%04x")
    val p = SStr.fromCounter(ValueCounter.from(values),
      Some(Vector(CharClass("0"), CharClass("x"), CharClass("0"),
        CharClass("0"), hexDigit, hexDigit)))
    assert(p.validates("0x0012"))
    assert(!p.validates("foobar")) // chars outside classes
    assert(!p.validates("0x00fg")) // 'g' not a hex digit
  }

  test("str-of-int: parses then range-checks " +
      "(test_types.py:704-720)") {
    val p = SStrRepr(SInt(stats(1L, 2L, 3L, 1000L)), "d")
    assert(p.validates("5"))
    assert(!p.validates(1L)) // TypeError: not a string
    assert(!p.validates("2000")) // parses but out of range
    assert(!p.validates("a")) // unparseable
  }

  test("str-of-float and str-of-datetime (test_types.py:746-756, 780+)") {
    val pf = SStrRepr(SFloat(stats(0.0, 1.0, 1000.0)), "f")
    assert(pf.validates("1.0"))
    assert(!pf.validates(1.0))
    assert(!pf.validates("2000.0"))
    val lo = Instant.parse("1970-01-01T00:00:00Z")
    val hi = Instant.parse("1970-02-01T00:00:00Z")
    val pd = SStrRepr(SDateTime(stats(lo, hi)), "%Y-%m-%d %H:%M:%S")
    assert(pd.validates("1970-01-01 00:30:00"))
    assert(!pd.validates("1980-01-01 00:00:00"))
    assert(!pd.validates("nope"))
  }

  test("num-repr: epoch-encoded datetimes") {
    val lo = Instant.parse("1970-01-01T00:00:00Z")
    val hi = Instant.parse("1970-02-01T00:00:00Z")
    val p = SNumRepr(SDateTime(stats(lo, hi)), isFloat = false,
      scale = 1.0, offset = 0.0)
    assert(p.validates(3600L)) // 1970-01-01 01:00:00
    assert(!p.validates(Instant.parse("1970-01-10T00:00:00Z")))
    assert(!p.validates(10000000L)) // past the max
  }

  test("url: scheme prefix on top of str rules " +
      "(types.py:1274-1283)") {
    val p = SURL.fromCounter(ValueCounter.from(Seq(
      "http://a.example/", "https://z.example/")))
    assert(p.validates("https://b.example/"))
    assert(!p.validates("ftp://a.example/"))
    assert(!p.validates(42L))
  }

  test("tuple: length limits (test_types.py:370-380)") {
    val p = STuple(stats(0L, 3L), Vector.empty)
    assert(p.validates(VTuple(Vector(1L, 2L))))
    assert(!p.validates("foo")) // TypeError
    assert(!p.validates(VTuple(Vector(1L, 2L, 3L, 4L)))) // too long
  }

  test("list and dict: type checks (test_types.py:95-103, 535-544)") {
    val l = SList(stats(0L, 2L), SValue())
    assert(l.validates(Vector.empty))
    assert(!l.validates("foo"))
    val d = SDict(stats(0L, 2L), Vector.empty)
    assert(d.validates(Map.empty[Any, Any]))
    assert(!d.validates("foo"))
  }

  test("field: literal key equality; value/empty accept everything") {
    val f = SField("a", 1L)
    assert(f.validates("a"))
    assert(!f.validates("b"))
    assert(SValue().validates("anything"))
    assert(SValue().validates(null))
    assert(SEmpty.validates("anything")) // types.py:1560-1569
  }
}
