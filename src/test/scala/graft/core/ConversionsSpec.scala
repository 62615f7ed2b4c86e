package graft.core

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

/** Pins the strptime-table behavior (structa analyzer.py:64-82,
  * conversions.py:16-69) — subtle across Java/Python differences.
  */
class ConversionsSpec extends AnyFunSuite {
  import Conversions._

  test("fixed datetime formats parse") {
    assert(parseDateTime("2020-05-06 07:08:09", "%Y-%m-%d %H:%M:%S")
      .contains(Instant.parse("2020-05-06T07:08:09Z")))
    assert(parseDateTime("2020-05-06T07:08", "%Y-%m-%dT%H:%M")
      .contains(Instant.parse("2020-05-06T07:08:00Z")))
    assert(parseDateTime("2020-05-06", "%Y-%m-%d")
      .contains(Instant.parse("2020-05-06T00:00:00Z")))
    assert(parseDateTime("Wed, 06 May 2020 07:08:09",
      "%a, %d %b %Y %H:%M:%S")
      .contains(Instant.parse("2020-05-06T07:08:09Z")))
  }

  test("variable formats: fractions and zone offsets") {
    assert(parseDateTime("2020-05-06T07:08:09.5",
      "%Y-%m-%dT%H:%M:%S.%f")
      .contains(Instant.parse("2020-05-06T07:08:09.500Z")))
    assert(parseDateTime("2020-05-06T07:08:09+0200",
      "%Y-%m-%dT%H:%M:%S%z")
      .contains(Instant.parse("2020-05-06T05:08:09Z")))
    assert(parseDateTime("2020-05-06T07:08:09Z",
      "%Y-%m-%dT%H:%M:%S%z")
      .contains(Instant.parse("2020-05-06T07:08:09Z")))
  }

  test("invalid dates rejected (strict resolver)") {
    assert(parseDateTime("2020-02-31 00:00:00",
      "%Y-%m-%d %H:%M:%S").isEmpty)
    assert(parseDateTime("not a date", "%Y-%m-%d").isEmpty)
    assert(parseDateTime("2020-13-01", "%Y-%m-%d").isEmpty)
  }

  test("int parsing with bases and prefixes (Python int(s, base))") {
    assert(parseInt("42", 10).contains(42L))
    assert(parseInt("-17", 10).contains(-17L))
    assert(parseInt("0x1a", 16).contains(26L))
    assert(parseInt("1A", 16).contains(26L))
    assert(parseInt("0o17", 8).contains(15L))
    assert(parseInt("19", 8).isEmpty)
    assert(parseInt("", 10).isEmpty)
  }

  test("out-of-Long-range ints stay exact (Python unbounded ints)") {
    val big = "12345678901234567890123"
    assert(parseInt(big, 10).contains(BigInt(big)))
    // adjacent huge values must not collapse (a Double would merge them)
    val a = parseInt("12345678901234567890123", 10).get
    val b = parseInt("12345678901234567890124", 10).get
    assert(a != b)
    assert(ValueOrdering.compare(a, b) < 0)
    // mixed Long/BigInt ordering is exact
    assert(ValueOrdering.compare(Long.MaxValue, BigInt(big)) < 0)
    assert(ValueOrdering.compare(BigInt(big), 5L) > 0)
    // stats over huge ints render without precision-driven surprises
    val st = Stats.fromCounter(ValueCounter(Map[Any, Long](
      BigInt("12345678901234567890123") -> 1,
      BigInt("12345678901234567890124") -> 1)))
    assert(SInt(st).render.startsWith("int range="))
    assert(st.unique)
  }

  test("float parsing rejects Java-isms Python rejects") {
    assert(parseFloat("1.5e3").contains(1500.0))
    assert(parseFloat("1d").isEmpty)
    assert(parseFloat("0x1p3").isEmpty)
    assert(parseFloat("1f").isEmpty)
  }

  test("bool token pairs incl. the empty-false '|x' pattern") {
    assert(parseBool(" Yes ", "no", "yes").contains(true))
    assert(parseBool("NO", "no", "yes").contains(false))
    assert(parseBool("x", "", "x").contains(true))
    assert(parseBool("", "", "x").contains(false))
    assert(parseBool("maybe", "no", "yes").isEmpty)
  }

  test("tryConversion threshold semantics (conversions.py:16-54)") {
    val sample = ValueCounter(Map[Any, Long](
      "1" -> 5, "2" -> 5, "oops" -> 1))
    // threshold 0: any failure aborts
    assert(tryConversion(sample, s => parseInt(s, 10), 0).isEmpty)
    // threshold >= weight of bad values: succeeds without them
    val ok = tryConversion(sample, s => parseInt(s, 10), 1)
    assert(ok.exists(_.total == 10))
    // all-bad within threshold is still failure (zero successes)
    val allBad = ValueCounter(Map[Any, Long]("x" -> 1))
    assert(tryConversion(allBad, s => parseInt(s, 10), 5).isEmpty)
  }
}
