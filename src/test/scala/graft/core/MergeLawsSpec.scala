package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Monoid-law property tests for the merge algebra.
  *
  * The reference only implies these laws (its merges run in
  * deterministic recursion order); they are load-bearing here because
  * Spark merges partial aggregation buffers in arbitrary order
  * (SURVEY.md §7.6). ScalaCheck generators are driven manually (the
  * scalatest-scalacheck bridge is not on the offline classpath).
  */
class MergeLawsSpec extends AnyFunSuite {

  /** Deterministic manual forAll over seeded generator samples. */
  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach(f)
    }

  private def intType(vs: Seq[Long]): SType =
    SInt(Stats.fromValues(vs))
  private def floatType(vs: Seq[Double]): SType =
    SFloat(Stats.fromValues(vs))
  private def boolType(vs: Seq[Boolean]): SType =
    SBool(Stats.fromValues(vs))
  private def strType(vs: Seq[String]): SType =
    SStr.fromCounter(ValueCounter.from(vs))

  private val genNumeric: Gen[SType] = for {
    kind <- Gen.choose(0, 2)
    vs <- Gen.nonEmptyListOf(Gen.choose(-100L, 100L))
  } yield kind match {
    case 0 => boolType(vs.map(_ % 2 == 0))
    case 1 => intType(vs)
    case 2 => floatType(vs.map(_.toDouble / 4))
  }

  private val genStr: Gen[SType] =
    Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
      .map(strType)

  private val genScalar: Gen[SType] =
    Gen.oneOf(genNumeric, genStr, Gen.const(SEmpty),
      Gen.const(SValue(Vector(1L))))

  private val genPair: Gen[(SType, SType)] =
    Gen.zip(genScalar, genScalar)
  private val genTriple: Gen[(SType, SType, SType)] =
    Gen.zip(genScalar, genScalar, genScalar)

  test("merge commutes (up to canonical class) when compatible") {
    forAll(genPair) { case (a, b) =>
      if (SType.matches(a, b)) {
        val ab = SType.merge(a, b)
        val ba = SType.merge(b, a)
        assert(ab == ba, s"\n a=$a\n b=$b\n ab=$ab\n ba=$ba")
      }
    }
  }

  test("merge is associative when all pairs compatible") {
    forAll(genTriple) { case (a, b, c) =>
      if (SType.matches(a, b) && SType.matches(b, c) &&
          SType.matches(a, c)) {
        val l = SType.merge(SType.merge(a, b), c)
        val r = SType.merge(a, SType.merge(b, c))
        assert(l == r, s"\n a=$a\n b=$b\n c=$c\n l=$l\n r=$r")
      }
    }
  }

  test("SEmpty is identity") {
    forAll(genScalar) { a =>
      assert(SType.merge(a, SEmpty) == a)
      assert(SType.merge(SEmpty, a) == a)
    }
  }

  test("SValue absorbs") {
    forAll(genScalar) { a =>
      if (a != SEmpty)
        assert(SType.merge(a, SValue(Vector.empty)).isInstanceOf[SValue])
    }
  }

  test("numeric widening: Int + Float = Float, Bool + Int = Int") {
    val i = intType(Seq(1L, 2L))
    val f = floatType(Seq(0.5, 1.5))
    val b = boolType(Seq(true, false))
    assert(SType.merge(i, f).isInstanceOf[SFloat])
    assert(SType.merge(f, i).isInstanceOf[SFloat])
    assert(SType.merge(b, i).isInstanceOf[SInt])
    assert(SType.merge(b, f).isInstanceOf[SFloat])
    assert(SType.merge(b, boolType(Seq(true))).isInstanceOf[SBool])
  }

  test("StrRepr int base widening o < d < x (types.py:1132-1147)") {
    val o = SStrRepr(intType(Seq(7L)), "o")
    val d = SStrRepr(intType(Seq(9L)), "d")
    val x = SStrRepr(intType(Seq(15L)), "x")
    assert(SType.merge(o, d).asInstanceOf[SStrRepr].pattern == "d")
    assert(SType.merge(d, o).asInstanceOf[SStrRepr].pattern == "d")
    assert(SType.merge(d, x).asInstanceOf[SStrRepr].pattern == "x")
  }

  test("StrRepr equality matrix (types.py:1162-1171)") {
    val bool01 = SStrRepr(boolType(Seq(true)), "0|1")
    val boolFT = SStrRepr(boolType(Seq(true)), "f|t")
    val intD = SStrRepr(intType(Seq(5L)), "d")
    val intX = SStrRepr(intType(Seq(5L)), "x")
    val fltF = SStrRepr(floatType(Seq(5.0)), "f")
    assert(SType.matches(bool01, intD))  // '0|1' merges with ints
    assert(!SType.matches(boolFT, intD)) // 'f|t' does not
    assert(SType.matches(intD, fltF))    // decimal int merges w/ float
    assert(!SType.matches(intX, fltF))   // hex int does not
  }

  test("record-Dict similarity threshold (types.py:1592-1624)") {
    def rec(keys: String*): SDict = SDict(
      Stats.fromLengths(Seq(keys.length)),
      keys.toVector.map(k =>
        SDictField(SField(k, 1), intType(Seq(1L)))))
    val a = rec("a", "b", "c", "d")
    val b = rec("a", "b", "c", "e")
    val c = rec("x", "y", "z", "w")
    assert(SType.matches(a, b))  // 3/4 common ≥ ceil(0.5×4)
    assert(!SType.matches(a, c)) // 0 common
    // merge marks disjoint keys optional
    val m = SType.merge(a, b).asInstanceOf[SDict]
    val fields = m.content.map(_.key.asInstanceOf[SField])
    assert(fields.filter(f => f.value == "d" || f.value == "e")
      .forall(_.optional))
    assert(fields.filter(f => f.value == "a").forall(!_.optional))
  }

  test("record + table Dict merge produces SRedo (types.py:428-462)") {
    val record = SDict(
      Stats.fromLengths(Seq(2)),
      Vector(
        SDictField(SField("a", 1), intType(Seq(1L))),
        SDictField(SField("b", 1), intType(Seq(2L)))))
    val table = SDict(
      Stats.fromLengths(Seq(30)),
      Vector(SDictField(strType(Seq("k1", "k2")), intType(Seq(3L)))))
    val m = SType.merge(record, table).asInstanceOf[SDict]
    assert(m.content.length == 1)
    assert(m.content.head.key.isInstanceOf[SStr])
    assert(m.content.head.value.isInstanceOf[SRedo])
  }

  test("size is the fix-point metric") {
    val d = SDict(Stats.fromLengths(Seq(2)), Vector(
      SDictField(SField("a", 1), intType(Seq(1L))),
      SDictField(SField("b", 1), strType(Seq("x")))))
    assert(d.size == 5) // dict(1) + 2×(field 1 + scalar 1)
    assert(SEmpty.size == 0)
  }
}

/** Further algebra ports from the reference's test_types.py. */
class TypeAlgebraSpec extends AnyFunSuite {

  private def ints(vs: Long*): SType = SInt(Stats.fromValues(vs))
  private def strs(vs: String*): SStr =
    SStr.fromCounter(ValueCounter.from(vs))

  test("Str merge drops pattern on length mismatch " +
      "(types.py:1011-1031)") {
    val a = SStr.fromCounter(ValueCounter.from(Seq("ab", "cd")),
      Some(Vector(CharClass("ac"), CharClass("bd"))))
    val b = SStr.fromCounter(ValueCounter.from(Seq("xyz")),
      Some(Vector(CharClass("x"), CharClass("y"), CharClass("z"))))
    val m = SType.merge(a, b).asInstanceOf[SStr]
    assert(m.pattern.isEmpty)
    // equal lengths union positionwise
    val c = SStr.fromCounter(ValueCounter.from(Seq("ef")),
      Some(Vector(CharClass("e"), CharClass("f"))))
    val m2 = SType.merge(a, c).asInstanceOf[SStr]
    assert(m2.pattern.contains(Vector(
      CharClass("ace"), CharClass("bdf"))))
  }

  test("URL + Str demotes to Str; URL + URL stays URL " +
      "(types.py:704-713 parent-class rule)") {
    val u1 = SURL.fromCounter(ValueCounter.from(Seq(
      "http://a/", "https://b/x")))
    val u2 = SURL.fromCounter(ValueCounter.from(Seq("http://c/yy")))
    val s = strs("plain", "text!")
    assert(SType.merge(u1, u2).isInstanceOf[SURL])
    val demoted = SType.merge(u1, s)
    assert(demoted.isInstanceOf[SStr] && !demoted.isInstanceOf[SURL])
  }

  test("NumRepr equality requires equal scale and offset " +
      "(types.py:1223-1243)") {
    def nr(scale: Double, offset: Double) = SNumRepr(
      SDateTime(Stats.fromValues(Seq(
        java.time.Instant.ofEpochSecond(1600000000L)))),
      isFloat = false, scale, offset)
    assert(SType.matches(nr(1, 0), nr(1, 0)))
    assert(!SType.matches(nr(1, 0), nr(86400, 0)))
    assert(!SType.matches(nr(1, 0), nr(1, -2209161600.0)))
    val m = SType.merge(nr(1, 0),
      SNumRepr(SDateTime(Stats.fromValues(Seq(
        java.time.Instant.ofEpochSecond(1700000000L)))),
        isFloat = true, 1, 0)).asInstanceOf[SNumRepr]
    assert(m.isFloat) // int→float widening
  }

  test("Field + Tuple folds key length into tuple lengths " +
      "(types.py:1404-1410)") {
    val tup = STuple(Stats.fromLengths(Seq(2, 2)), Vector(
      STupleField(SField(0L, 2), ints(1, 2)),
      STupleField(SField(1L, 2), ints(3, 4))))
    val f = SField(VTuple(Vector(9L, 9L)), 3)
    val m = SType.merge(f, tup).asInstanceOf[STuple]
    assert(m.lengths.card == 5) // 2 + 3 more length-2 observations
  }

  test("Empty + Field → optional field; Field stays optional " +
      "(types.py:1535-1543)") {
    val f = SField("k", 5, optional = false)
    val m = SType.merge(SEmpty, f).asInstanceOf[SField]
    assert(m.optional && m.count == 5)
    val m2 = SType.merge(m, SField("k", 2)).asInstanceOf[SField]
    assert(m2.optional && m2.count == 7) // optional is sticky
  }

  test("Field vs scalar type matches via validation " +
      "(types.py:1378-1390)") {
    val f = SField("abc", 1)
    assert(SType.matches(f, strs("aaa", "zzz"))) // in range
    assert(!SType.matches(f, ints(1, 10)))       // not an int
    val folded = SType.merge(f, strs("aaa", "zzz"))
    assert(folded.isInstanceOf[SStr])
    assert(folded.asInstanceOf[SStr].values.card == 3)
  }

  test("tuple zip pads missing indices with Empty → optional " +
      "(types.py:1580-1589)") {
    val t2 = STuple(Stats.fromLengths(Seq(2)), Vector(
      STupleField(SField(0L, 1), ints(1)),
      STupleField(SField(1L, 1), ints(2))))
    val t1 = STuple(Stats.fromLengths(Seq(1)), Vector(
      STupleField(SField(0L, 1), ints(9))))
    assert(SType.matches(t1, t2))
    val m = SType.merge(t1, t2).asInstanceOf[STuple]
    assert(m.content.length == 2)
    val col1 = m.content.find(f =>
      f.index.asInstanceOf[SField].value == 1L).get
    assert(col1.index.asInstanceOf[SField].optional)
  }
}
