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
