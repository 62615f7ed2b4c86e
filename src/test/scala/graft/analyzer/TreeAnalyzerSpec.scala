package graft.analyzer

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Ports of the reference's behavioral spec
  * (structa tests/test_analyzer.py; fixtures catalogued in FIXTURES.md).
  */
class TreeAnalyzerSpec extends AnyFunSuite {

  private def analyzer = new TreeAnalyzer()

  test("scalar int (test_analyzer.py:104-108)") {
    assert(analyzer.analyze(10L).isInstanceOf[SInt])
  }

  test("list of ints (test_analyzer.py:111-114)") {
    val t = analyzer.analyze((0L until 100L).toVector)
    assert(t.isInstanceOf[SList])
    val l = t.asInstanceOf[SList]
    assert(l.content.isInstanceOf[SInt])
    val i = l.content.asInstanceOf[SInt]
    assert(i.values.min == 0L && i.values.max == 99L)
  }

  test("record list with optional field (test_analyzer.py:150-160)") {
    val rows: Vector[Any] =
      Vector.fill(999)(Map[Any, Any]("foo" -> 1L, "bar" -> 2L)) :+
        Map[Any, Any]("foo" -> 1L)
    val t = analyzer.analyze(rows).asInstanceOf[SList]
    val d = t.content.asInstanceOf[SDict]
    assert(d.isRecord)
    val byName = d.content.map(f =>
      f.key.asInstanceOf[SField].value -> f.key.asInstanceOf[SField]).toMap
    assert(!byName("foo").optional)
    assert(byName("bar").optional)
  }

  test("table dict: >= field_threshold distinct keys " +
      "(test_analyzer.py:138-147)") {
    val data = (0 until 50).map(i =>
      (s"key$i": Any) -> (i.toLong: Any)).toMap
    val t = analyzer.analyze(data).asInstanceOf[SDict]
    assert(!t.isRecord)
    assert(t.content.length == 1)
    assert(t.content.head.key.isInstanceOf[SStr])
    assert(t.content.head.value.isInstanceOf[SInt])
  }

  test("dict of records keyed by int (test_analyzer.py:211-224)") {
    val data = (0 until 99).map(i => (i.toLong: Any) ->
      (Map[Any, Any]("foo" -> i.toLong, "bar" -> (-i).toLong): Any)).toMap
    val t = analyzer.analyze(data).asInstanceOf[SDict]
    assert(!t.isRecord)
    assert(t.content.head.key.isInstanceOf[SInt])
    val inner = t.content.head.value.asInstanceOf[SDict]
    assert(inner.isRecord)
    assert(inner.content.map(_.key.asInstanceOf[SField].value) ==
      Vector("bar", "foo")) // sorted
  }

  test("tuple keys (test_analyzer.py:228-244)") {
    val data = (0 until 99).map(i =>
      (VTuple(Vector(i.toLong, i.toLong + 1)): Any) ->
        (i.toLong: Any)).toMap
    val t = analyzer.analyze(data).asInstanceOf[SDict]
    val keyT = t.content.head.key
    assert(keyT.isInstanceOf[STuple], s"got $keyT")
    val tup = keyT.asInstanceOf[STuple]
    assert(tup.content.length == 2) // per-index columns, both Int
    assert(tup.content.forall(_.value.isInstanceOf[SInt]))
    assert(t.content.head.value.isInstanceOf[SInt])
  }

  test("lists-as-tuples table heuristic (test_analyzer.py:284-298)") {
    val rows: Vector[Any] = (0 until 100).map(n =>
      Vector[Any](n.toLong, n.toLong + 1, n.toLong + 2): Any).toVector
    val t = analyzer.analyze(rows).asInstanceOf[SList]
    assert(t.content.isInstanceOf[STuple], s"got ${t.content}")
    val tup = t.content.asInstanceOf[STuple]
    assert(tup.content.length == 3)
    assert(tup.content.forall(_.value.isInstanceOf[SInt]))
  }

  test("ragged tuples: short row → optional column " +
      "(test_analyzer.py:247-261)") {
    val rows: Vector[Any] =
      (0 until 100).map(n => VTuple(Vector[Any](n.toLong,
        n.toLong + 1)): Any).toVector :+ VTuple(Vector[Any](100L))
    val t = analyzer.analyze(rows).asInstanceOf[SList]
    val tup = t.content.asInstanceOf[STuple]
    assert(tup.content.length == 2)
    val col1 = tup.content(1).index.asInstanceOf[SField]
    assert(col1.optional)
  }

  test("decimal int strings (test_analyzer.py:301-306)") {
    val data: Vector[Any] = (0 until 100).map(n =>
      n.toString: Any).toVector
    val t = analyzer.analyze(data).asInstanceOf[SList]
    val sr = t.content.asInstanceOf[SStrRepr]
    assert(sr.pattern == "d")
    assert(sr.content.isInstanceOf[SInt])
  }

  test("hex int strings (test_analyzer.py:308-313)") {
    // 0x0..0x63 plus hex letters ensure non-decimal
    val data: Vector[Any] = (0 until 100).map(n =>
      ("0x%x".format(n + 0xa0)): Any).toVector
    val t = analyzer.analyze(data).asInstanceOf[SList]
    val sr = t.content.asInstanceOf[SStrRepr]
    assert(sr.pattern == "x", s"got $sr")
    assert(sr.content.isInstanceOf[SInt])
  }

  test("datetime native values (test_analyzer.py:349-357)") {
    val base = Instant.parse("2020-01-01T00:00:00Z")
    val data: Vector[Any] = (0 until 100).map(n =>
      base.plusSeconds(n * 86400L): Any).toVector
    val t = analyzer.analyze(data).asInstanceOf[SList]
    assert(t.content.isInstanceOf[SDateTime])
  }

  test("datetime strings (test_analyzer.py:359-370)") {
    val data: Vector[Any] = (0 until 100).map(n =>
      f"2020-01-${n % 28 + 1}%02d 12:30:00": Any).toVector
    val t = analyzer.analyze(data).asInstanceOf[SList]
    val sr = t.content.asInstanceOf[SStrRepr]
    assert(sr.pattern == "%Y-%m-%d %H:%M:%S")
    assert(sr.content.isInstanceOf[SDateTime])
  }

  test("epoch floats promote to NumRepr(DateTime) " +
      "(test_analyzer.py:372-390)") {
    val now = Instant.now.getEpochSecond.toDouble
    val data: Vector[Any] = (0 until 100).map(n =>
      now + n * 86400.0: Any).toVector
    val t = analyzer.analyze(data).asInstanceOf[SList]
    val nr = t.content.asInstanceOf[SNumRepr]
    assert(nr.isFloat)
    assert(nr.content.isInstanceOf[SDateTime])
  }

  test("epoch float strings → StrRepr(NumRepr(DateTime)) " +
      "(test_analyzer.py:392-419)") {
    val now = Instant.now.getEpochSecond.toDouble
    val data: Vector[Any] = (0 until 100).map(n =>
      (now + n * 86400.0).toString: Any).toVector
    val t = analyzer.analyze(data).asInstanceOf[SList]
    val sr = t.content.asInstanceOf[SStrRepr]
    assert(sr.content.isInstanceOf[SNumRepr], s"got $sr")
  }

  test("out-of-range floats stay Float (test_analyzer.py:422-435)") {
    val data: Vector[Any] = (0 until 100).map(n =>
      n * 1000.0: Any).toVector
    val t = analyzer.analyze(data).asInstanceOf[SList]
    assert(t.content.isInstanceOf[SFloat], s"got ${t.content}")
  }

  test("mixed types → Value (test_analyzer.py:438-445)") {
    val data: Vector[Any] = Vector(1L, "two", 3.0, 4L, "five")
    val t = analyzer.analyze(data).asInstanceOf[SList]
    assert(t.content.isInstanceOf[SValue])
  }

  test("bool-pattern strings (test_analyzer.py int/bool ladder)") {
    val data: Vector[Any] = (0 until 100).map(n =>
      (n % 2).toString: Any).toVector
    val t = analyzer.analyze(data).asInstanceOf[SList]
    val sr = t.content.asInstanceOf[SStrRepr]
    assert(sr.pattern == "0|1")
    assert(sr.content.isInstanceOf[SBool])
  }

  test("blank strings within threshold are discounted " +
      "(test_analyzer.py:448-481)") {
    val dates: Vector[Any] = (0 until 90).map(n =>
      f"2020-01-${n % 28 + 1}%02d 12:30:00": Any).toVector
    val blanks: Vector[Any] = Vector.fill(10)("")
    val t = analyzer.analyze(dates ++ blanks).asInstanceOf[SList]
    val sr = t.content.asInstanceOf[SStrRepr]
    assert(sr.content.isInstanceOf[SDateTime])
  }

  test("bad data within 2% threshold tolerated " +
      "(test_analyzer.py:484-532)") {
    val good: Vector[Any] = (0 until 1000).map(n =>
      f"2020-01-${n % 28 + 1}%02d 00:00:00": Any).toVector
    val bad: Vector[Any] = Vector("2020-02-31 00:00:00")
    val t = analyzer.analyze(good ++ bad).asInstanceOf[SList]
    val sr = t.content.asInstanceOf[SStrRepr]
    assert(sr.content.isInstanceOf[SDateTime], s"got $sr")
  }

  test("pathological nesting degrades to ⊤ at the depth cap " +
      "(SURVEY §7.6)") {
    var v: Any = 1L
    (0 until 300).foreach(_ => v = Map[Any, Any]("k" -> v))
    // must neither stack-overflow nor loop: deep levels collapse
    val t = new TreeAnalyzer(AnalyzerConfig(maxDepth = 20)).analyze(v)
    assert(t.render.contains("value"), t.render.takeRight(80))
  }

  test("extraction mismatches surface as ValidationWarnings " +
      "(analyzer.py:515-523, test_analyzer.py:181-190 bad-data dict)") {
    // {"0".."99" -> int} + one bad key "a": keys infer as
    // str-of-int(d) within the 1% bad threshold; extracting values
    // through that key type must warn about "a", not silently drop it
    val data: Map[Any, Any] =
      ((0 until 100).map(i => (i.toString: Any) -> (i.toLong: Any)) :+
        (("a": Any) -> (0L: Any))).toMap
    val a = new TreeAnalyzer(AnalyzerConfig(badThreshold = 0.01))
    val t = a.analyze(data).asInstanceOf[SDict]
    assert(t.content.head.key.isInstanceOf[SStrRepr])
    assert(a.warnings.length == 1, a.warnings)
    assert(a.warnings.head.message.contains("a"))
    a.clearWarnings()
    assert(a.warnings.isEmpty)
  }

  test("URLs (test_analyzer.py:535-551)") {
    val data: Vector[Any] = Vector(
      "http://example.com/", "https://example.org/index.html",
      "http://foo.bar/baz", "https://a.b/c?d=e",
      "http://x.y/z#frag", "https://w.v/",
      "http://long.example.com/path/to/resource",
      "https://another.example.net/q", "http://8.8.8.8/",
      "https://sub.domain.example/", "http://last.one/")
    val t = analyzer.analyze(data).asInstanceOf[SList]
    assert(t.content.isInstanceOf[SURL], s"got ${t.content}")
  }

  test("sha1 hex digests → fixed-length hex pattern " +
      "(test_analyzer.py:554-562)") {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val data: Vector[Any] = (0 until 100).map { n =>
      md.reset()
      md.update(n.toString.getBytes)
      md.digest().map("%02x".format(_)).mkString: Any
    }.toVector
    val t = analyzer.analyze(data).asInstanceOf[SList]
    val s = t.content.asInstanceOf[SStr]
    assert(s.pattern.isDefined)
    assert(s.pattern.get.length == 40)
    assert(s.pattern.get.forall(c => c.subsetOf(CharClass.hexDigit)))
  }

  test("fixed-length mode strings with digit-base promotion " +
      "(test_analyzer.py:316-346)") {
    val data: Vector[Any] = (0 until 2560).map(n =>
      "mode %03o".format(n % 512): Any).toVector
    val t = analyzer.analyze(data).asInstanceOf[SList]
    val s = t.content.asInstanceOf[SStr]
    assert(s.pattern.isDefined, s"got ${t.content}")
    val p = s.pattern.get
    assert(p.length == 8)
    // last three positions are octal digits
    assert(p.drop(5).forall(_ == CharClass.octDigit), s"got $p")
  }

  test("merge collapses similar record dicts " +
      "(test_analyzer.py:662-725)") {
    val data = (0 until 10).map { i =>
      (s"release$i": Any) -> (Map[Any, Any](
        "date" -> s"2020-0${i % 9 + 1}-01 00:00:00",
        "count" -> i.toLong,
        "name" -> s"Release $i"): Any)
    }.toMap
    val a = analyzer
    val t = a.analyze(data)
    val d0 = t.asInstanceOf[SDict]
    assert(d0.isRecord) // 10 keys < 20 → record of dicts
    val merged = a.mergeToFixpoint(t).asInstanceOf[SDict]
    assert(merged.content.length == 1, s"got ${merged.render}")
    assert(merged.content.head.key.isInstanceOf[SStr])
    val inner = merged.content.head.value.asInstanceOf[SDict]
    assert(inner.isRecord)
    assert(inner.content.map(_.key.asInstanceOf[SField].value).toSet ==
      Set("date", "count", "name"))
  }

  test("sources list wrapper (types.py:674-679)") {
    val file1: Vector[Any] = (0L until 10L).toVector
    val file2: Vector[Any] = (10L until 20L).toVector
    val t = analyzer.analyze(VSources(Vector(file1, file2)))
    assert(t.isInstanceOf[SSourcesList])
  }

  test("null discount under threshold") {
    val data: Vector[Any] = (0 until 95).map(n =>
      n.toLong: Any).toVector ++ Vector.fill[Any](5)(null)
    val t = analyzer.analyze(data).asInstanceOf[SList]
    assert(t.content.isInstanceOf[SInt] ||
      t.content.isInstanceOf[SNumRepr])
  }

  test("all nulls → Value") {
    val data: Vector[Any] = Vector.fill[Any](10)(null)
    val t = analyzer.analyze(data).asInstanceOf[SList]
    assert(t.content.isInstanceOf[SValue])
  }

  test("empty list → Empty content") {
    val t = analyzer.analyze(Vector.empty[Any])
    assert(t.asInstanceOf[SList].content == SEmpty)
  }
}

/** Additional reference-behavior ports — expected values taken from
  * RUNNING the reference (its own test assertions use the loose
  * compatibility __eq__, so the literals in test_analyzer.py are not
  * structural ground truth; these are).
  */
class TreeAnalyzerMergeSpec extends AnyFunSuite {

  private def analyzer = new TreeAnalyzer()

  test("merge_redo: record-of-dicts collapses to table keyed by " +
      "pattern str (test_analyzer.py:728-768, verified vs reference)") {
    val data = (0 until 10).map { i =>
      (s"id$i": Any) -> (Map[Any, Any](
        "count" -> i.toLong,
        "values" -> ('a' until ('a' + i).toChar).map(c =>
          (c.toString: Any) -> (1500L: Any)).toMap): Any)
    }.toMap
    val a = analyzer
    val merged = a.merge(a.analyze(data)).asInstanceOf[SDict]
    assert(merged.content.length == 1)
    val key = merged.content.head.key.asInstanceOf[SStr]
    // reference ground truth: pattern ['i', 'd', dec_digit]
    assert(key.pattern.contains(Vector(
      CharClass("i"), CharClass("d"), CharClass.decDigit)))
    val inner = merged.content.head.value.asInstanceOf[SDict]
    assert(inner.isRecord)
    val names = inner.content.map(_.key.asInstanceOf[SField].value)
    assert(names == Vector("count", "values"))
    assert(inner.content(0).value.isInstanceOf[SInt])
    val valuesDict = inner.content(1).value.asInstanceOf[SDict]
    assert(valuesDict.isRecord) // 9 distinct keys < 20 → fields
  }

  test("50% blanks with low empty_threshold demote to plain Str " +
      "(test_analyzer.py:635-660)") {
    val a = new TreeAnalyzer(AnalyzerConfig(
      badThreshold = 0, emptyThreshold = 0.4))
    val dates: Vector[Any] = (0 until 50).map(n =>
      f"2020-01-${n % 28 + 1}%02d 00:00:00": Any).toVector
    val blanks: Vector[Any] = Vector.fill(50)("")
    val t = a.analyze(dates ++ blanks).asInstanceOf[SList]
    assert(t.content.getClass == classOf[SStr], s"got ${t.content}")
    assert(t.content.asInstanceOf[SStr].pattern.isEmpty)
  }

  test("bool pattern '|x' (empty-string false token)") {
    val data: Vector[Any] = (0 until 100).map(n =>
      if (n % 2 == 0) "x" else "": Any).toVector
    // '' dominates half the sample; under empty_threshold it is NOT
    // removed before bool probing only when... the ladder removes ''
    // first, so '|x' matches when blanks are below the threshold but
    // still present in the remainder — reference probes after
    // deletion, so all-'x' matches the '|x' pattern trivially via
    // the 0|1 ladder order; assert a StrRepr(Bool) outcome
    val t = analyzer.analyze(data).asInstanceOf[SList]
    assert(t.content.isInstanceOf[SStrRepr], s"got ${t.content}")
    assert(t.content.asInstanceOf[SStrRepr].content
      .isInstanceOf[SBool])
  }

  test("strip_whitespace option") {
    val a = new TreeAnalyzer(AnalyzerConfig(stripWhitespace = true))
    val data: Vector[Any] = (0 until 50).map(n =>
      s"  ${n % 10}  ": Any).toVector
    val t = a.analyze(data).asInstanceOf[SList]
    val sr = t.content.asInstanceOf[SStrRepr]
    assert(sr.content.isInstanceOf[SBool] ||
      sr.content.isInstanceOf[SInt])
  }

  test("merge of tuples keyed dict (test_analyzer.py:625-660)") {
    val data = (0 until 25).map { i =>
      (VTuple(Vector(i.toLong, i.toLong + 1)): Any) ->
        (VTuple(Vector(('a' + i).toChar.toString,
          ('a' + i + 1).toChar.toString)): Any)
    }.toMap
    val a = analyzer
    val m = a.merge(a.analyze(data)).asInstanceOf[SDict]
    assert(m.content.length == 1)
    assert(m.content.head.key.isInstanceOf[STuple])
    assert(m.content.head.value.isInstanceOf[STuple])
  }
}
