package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Random-byte fuzz over the media header decoders. They walk
  * UNTRUSTED bytes in codegen'd loops (JPEG segment walk, RIFF/FLAC
  * chunk walks, ISO-BMFF box walk, EBML vints), so beyond the
  * crafted-corrupt fixtures in the per-format specs they must
  * survive arbitrary input: never throw, finish in bounded time
  * (zero/negative length fields must not loop), and stay
  * deterministic. >= 10^4 cases per decoder across four generator
  * families: pure random bytes, magic-prefixed random tails,
  * truncations of valid files at every prefix, and random
  * single-byte mutations of valid files (which corrupt length
  * fields in every position).
  */
class MediaFuzzSpec extends AnyFunSuite {

  private def render(r: InternalRow, schema: StructType): String =
    if (r == null) "null"
    else schema.fields.zipWithIndex.map { case (f, i) =>
      if (r.isNullAt(i)) "∅"
      else f.dataType match {
        case StringType => r.getUTF8String(i).toString
        case IntegerType => r.getInt(i).toString
        case LongType => r.getLong(i).toString
        case dt => fail(s"unhandled field type $dt")
      }
    }.mkString("[", ",", "]")

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // valid seeds per decoder (mirrors the per-format specs) --------
  private val imageSeeds: Seq[Array[Byte]] = Seq(
    b(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R', 0, 0, 0x01, 0x40,
      0, 0, 0x00, 0xf0, 8, 6, 0, 0, 0),
    b(0xff, 0xd8, 0xff, 0xe0, 0, 16, 'J', 'F', 'I', 'F', 0,
      1, 1, 0, 0, 1, 0, 1, 0, 0,
      0xff, 0xfe, 0, 5, 'c', 'm', 't',
      0xff, 0xc0, 0, 17, 8, 0, 48, 0, 64,
      3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1),
    b('G', 'I', 'F', '8', '9', 'a', 0x0c, 0, 0x07, 0, 0, 0, 0),
    b('B', 'M', 70, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0,
      40, 0, 0, 0, 0x15, 0, 0, 0, 0xef, 0xff, 0xff, 0xff))

  private val audioSeeds: Seq[Array[Byte]] = Seq(
    b('R', 'I', 'F', 'F', 0, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 16, 0, 0, 0, 1, 0, 2, 0,
      0x44, 0xAC, 0, 0, 0x10, 0xB1, 0x02, 0, 4, 0, 16, 0,
      'd', 'a', 't', 'a', 0x88, 0x58, 0x01, 0x00),
    b('f', 'L', 'a', 'C', 0x00, 0x00, 0x00, 0x22,
      0x10, 0x00, 0x10, 0x00, 0, 0, 0, 0, 0, 0,
      0x0A, 0xC4, 0x42, 0xF0, 0x00, 0x00, 0x56, 0x22,
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
    b('I', 'D', '3', 3, 0, 0, 0, 0, 0, 4, 1, 2, 3, 4,
      0xff, 0xfb, 0x90, 0x00),
    b('O', 'g', 'g', 'S', 0, 2, 0, 0, 0, 0))

  private val videoSeeds: Seq[Array[Byte]] = {
    def u32(v: Long): Seq[Int] = Seq((v >> 24).toInt & 0xff,
      (v >> 16).toInt & 0xff, (v >> 8).toInt & 0xff, v.toInt & 0xff)
    def cc(s: String): Seq[Int] = s.map(_.toInt)
    val ftyp = u32(16) ++ cc("ftyp") ++ cc("isom") ++ u32(0x200)
    val mvhd = u32(108) ++ cc("mvhd") ++ Seq(0, 0, 0, 0) ++
      u32(0) ++ u32(0) ++ u32(1000) ++ u32(5000) ++ Seq.fill(80)(0)
    val tkhd = u32(92) ++ cc("tkhd") ++ Seq(0, 0, 0, 0) ++
      u32(0) ++ u32(0) ++ u32(1) ++ u32(0) ++ u32(0) ++
      Seq.fill(16)(0) ++ Seq.fill(36)(0) ++
      u32(640L << 16) ++ u32(360L << 16)
    val trak = u32(100) ++ cc("trak") ++ tkhd
    val moov = u32(216) ++ cc("moov") ++ mvhd ++ trak
    Seq((ftyp ++ moov).map(_.toByte).toArray,
      b(0x1a, 0x45, 0xdf, 0xa3, 0x01, 0, 0, 0))
  }

  private val magics: Seq[Array[Byte]] = Seq(
    b(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
    b(0xff, 0xd8), b('G', 'I', 'F', '8', '9', 'a'), b('B', 'M'),
    b('R', 'I', 'F', 'F'), b('f', 'L', 'a', 'C'), b('I', 'D', '3'),
    b(0xff, 0xfb), b('O', 'g', 'g', 'S'),
    b(0, 0, 0, 16, 'f', 't', 'y', 'p'),
    b(0x1a, 0x45, 0xdf, 0xa3))

  // adversarial length fields: zero-length JPEG segment, zero/1-size
  // ISO-BMFF boxes, EBML zero vint, RIFF chunk len 0 and 0xffffffff
  private val adversarial: Seq[Array[Byte]] = Seq(
    b(0xff, 0xd8, 0xff, 0xe0, 0, 0, 0xff, 0xe0, 0, 0, 0xff, 0xe0),
    b(0xff, 0xd8, 0xff, 0xe0, 0, 1, 0xff, 0xc0, 0, 17),
    b(0, 0, 0, 16, 'f', 't', 'y', 'p', 'i', 's', 'o', 'm',
      0, 0, 0, 0, 0, 0, 0, 0, 'm', 'o', 'o', 'v'),
    b(0, 0, 0, 16, 'f', 't', 'y', 'p', 'i', 's', 'o', 'm',
      0, 0, 0, 1, 'm', 'o', 'o', 'v', 0, 0, 0, 0),
    b(0, 0, 0, 16, 'f', 't', 'y', 'p', 'i', 's', 'o', 'm',
      0xff, 0xff, 0xff, 0xff, 'm', 'o', 'o', 'v'),
    b(0x1a, 0x45, 0xdf, 0xa3, 0x00, 0x00, 0x00, 0x00),
    b(0x1a, 0x45, 0xdf, 0xa3, 0x80, 0xff, 0xff, 0xff),
    b('R', 'I', 'F', 'F', 0xff, 0xff, 0xff, 0xff, 'W', 'A', 'V', 'E',
      'j', 'u', 'n', 'k', 0, 0, 0, 0, 'j', 'u', 'n', 'k',
      0, 0, 0, 0, 'j', 'u', 'n', 'k', 0, 0, 0, 0),
    b('R', 'I', 'F', 'F', 0, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 0xff, 0xff, 0xff, 0xff, 1, 0),
    b('f', 'L', 'a', 'C', 0x00, 0xff, 0xff, 0xff),
    b('f', 'L', 'a', 'C', 0x00, 0x00, 0x00, 0x00,
      0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00))

  private def cases(seeds: Seq[Array[Byte]]): Iterator[Array[Byte]] = {
    val rnd = new scala.util.Random(2026)
    def rndBytes(n: Int): Array[Byte] = {
      val a = new Array[Byte](n); rnd.nextBytes(a); a
    }
    val pureRandom = Iterator.tabulate(4000) { i =>
      rndBytes(rnd.nextInt(if (i % 4 == 0) 600 else 64))
    }
    val magicPrefixed = Iterator.tabulate(3000) { _ =>
      val m = magics(rnd.nextInt(magics.size))
      m ++ rndBytes(rnd.nextInt(120))
    }
    val truncations = seeds.iterator.flatMap(sd =>
      (0 to sd.length).iterator.map(sd.take))
    val mutations = Iterator.tabulate(3000) { _ =>
      val sd = seeds(rnd.nextInt(seeds.size)).clone()
      val flips = 1 + rnd.nextInt(3)
      (0 until flips).foreach { _ =>
        sd(rnd.nextInt(sd.length)) = rnd.nextInt(256).toByte
      }
      sd
    }
    pureRandom ++ magicPrefixed ++ truncations ++ mutations ++
      adversarial.iterator ++ Iterator(Array.emptyByteArray)
  }

  private def fuzz(name: String, seeds: Seq[Array[Byte]],
                   schema: StructType,
                   compute: Array[Byte] => InternalRow): Unit = {
    var n = 0
    cases(seeds).foreach { payload =>
      n += 1
      val t0 = System.nanoTime()
      val first =
        try render(compute(payload), schema)
        catch { case e: Throwable =>
          fail(s"$name threw on ${payload.length}-byte input " +
            s"(case $n): $e\n  bytes=" +
            payload.take(64).map(x => f"${x & 0xff}%02x").mkString)
        }
      val elapsed = System.nanoTime() - t0
      // bounded work: O(header) decoders finish a sub-KB input in
      // microseconds; 200 ms flags a length-field loop without
      // flaking on GC pauses
      assert(elapsed < 200000000L,
        s"$name took ${elapsed / 1000000} ms on case $n")
      assert(render(compute(payload), schema) === first,
        s"$name nondeterministic on case $n")
    }
    assert(n >= 10000, s"only $n cases generated")
  }

  test("ImageMetaExpr survives 10^4 fuzz cases") {
    fuzz("image_meta", imageSeeds, ImageMetaExpr.schema,
      ImageMetaExpr.compute)
  }

  test("AudioMetaExpr survives 10^4 fuzz cases") {
    fuzz("audio_meta", audioSeeds, AudioMetaExpr.schema,
      AudioMetaExpr.compute)
  }

  test("VideoMetaExpr survives 10^4 fuzz cases") {
    fuzz("video_meta", videoSeeds, VideoMetaExpr.schema,
      VideoMetaExpr.compute)
  }
}
