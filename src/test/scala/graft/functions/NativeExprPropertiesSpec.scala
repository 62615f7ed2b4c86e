package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests pinning the hand-optimized native expressions
  * against straightforward reimplementations of their declared
  * semantics — the tight loops (byte-level hex, slice mins, signed
  * sums) must match the obvious-but-slow forms on arbitrary input.
  */
class NativeExprPropertiesSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def md5Hex(s: String): String = {
    val md = MessageDigest.getInstance("MD5")
    md.digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
  }

  private val tokenGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.oneOf("a", "bb", "ccc", "δδ", "測試"))
  private val textGen: Gen[String] =
    Gen.listOf(tokenGen).map(_.mkString(" "))

  test("MinHashExpr matches the naive shingle/md5/min form") {
    forAll(textGen) { text =>
      val got = MinHashExpr.compute(UTF8String.fromString(text),
        k = 3, salts = 4)
      val toks = text.trim.split("\\s+")
      val shingles =
        if (toks.length < 3 || (toks.length == 1 && toks(0).isEmpty))
          Set.empty[String]
        else (0 to toks.length - 3)
          .map(i => toks.slice(i, i + 3).mkString(" ")).toSet
      if (shingles.isEmpty) assert(got == null)
      else {
        val expect = (0 until 16).map { idx =>
          val salt = idx / 4
          val slice = idx % 4
          shingles.map(s =>
            md5Hex(s + "#" + salt).substring(slice * 8, slice * 8 + 8))
            .min
        }
        val gotSeq = got.toObjectArray(
          org.apache.spark.sql.types.StringType)
          .map(_.asInstanceOf[UTF8String].toString).toSeq
        assert(gotSeq == expect)
      }
    }
  }

  test("SimHashExpr matches the naive per-bit sign-sum form") {
    forAll(textGen) { text =>
      val got = SimHashExpr.compute(UTF8String.fromString(text))
      val toks = text.trim.split("\\s+")
      val expect = {
        val sums = new Array[Int](32)
        toks.foreach { t =>
          val h = java.lang.Long.parseLong(md5Hex(t).take(8), 16)
          (0 until 32).foreach { b =>
            sums(b) += (if (((h >> b) & 1) == 1) 1 else -1)
          }
        }
        (0 until 32).map(b =>
          if (sums(b) > 0) 1L << b else 0L).sum
      }
      assert(got == expect, s"text=[$text]")
    }
  }

  private val vecGen: Gen[List[Float]] =
    Gen.chooseNum(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-2.0f, 2.0f)))

  private def q(x: Double): Long =
    (if (x >= 0) math.floor(x * 33554432.0 + 0.5)
     else math.ceil(x * 33554432.0 - 0.5)).toLong

  test("LshSignExpr matches the naive hyperplane sign form") {
    forAll(vecGen) { vec =>
      val arr: ArrayData = new GenericArrayData(
        vec.map(v => v: Any).toArray)
      val got = LshSignExpr.compute(arr, isDouble = false)
      val expect = (0 until LshSignExpr.MaxBits).map { j =>
        val sum = vec.zipWithIndex.map { case (x, i0) =>
          val i = i0 + 1
          val sign =
            if (md5Hex(s"$i:$j").charAt(0) <= '7') 1L else -1L
          sign * q(x.toDouble)
        }.sum
        if (sum > 0) 1 << j else 0
      }.sum
      assert(got == expect, s"vec=$vec")
    }
  }

  test("PosShingleDigestsExpr matches the naive positional " +
      "md5-of-kgram form over a token array") {
    forAll(Gen.listOf(tokenGen)) { toks =>
      val arr = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t)).toArray[Any])
      val got = PosShingleDigestsExpr.compute(arr, k = 3)
      val expect: Seq[String] =
        if (toks.length < 3) Seq.empty
        else (0 to toks.length - 3)
          .map(i => md5Hex(toks.slice(i, i + 3).mkString(" ")))
      val gotSeq = (0 until got.numElements())
        .map(i => got.getUTF8String(i).toString)
      assert(gotSeq === expect, s"toks=$toks")
    }
  }

  test("PosShingleDigestsExpr skips null tokens like concat_ws") {
    val arr = new GenericArrayData(
      Array[Any](UTF8String.fromString("a"), null,
        UTF8String.fromString("b")))
    val got = PosShingleDigestsExpr.compute(arr, k = 3)
    assert(got.numElements() === 1)
    assert(got.getUTF8String(0).toString === md5Hex("a b"))
  }

  test("DotQExpr matches the naive quantized dot product") {
    forAll(Gen.zip(vecGen, vecGen)) { case (a, b) =>
      val n = math.min(a.length, b.length)
      val aArr: ArrayData = new GenericArrayData(
        a.map(v => v: Any).toArray)
      val bArr: ArrayData = new GenericArrayData(
        b.map(v => v: Any).toArray)
      val got = DotQExpr.compute(aArr, bArr,
        aDouble = false, bDouble = false)
      val expect = (0 until n).map(i =>
        q(a(i).toDouble) * q(b(i).toDouble)).sum
      assert(got == expect)
    }
  }
}
