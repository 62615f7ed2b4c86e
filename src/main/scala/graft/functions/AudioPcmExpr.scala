package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, LongType,
  StructField, StructType}

/** Audio CONTENT analysis over decoded PCM samples — the audio
  * sibling of [[ImageHash]], one step past [[AudioMetaExpr]]'s
  * header sniff. Pure-Scala decode of 16-bit PCM WAV (the one
  * mainstream audio format decodable without codec libraries;
  * the reference's analysis is likewise byte-gated,
  * `structa/source.py`), then exact integer features a SQL oracle
  * can replay step for step:
  *
  *  - samples: channel 0 of the interleaved stream (LE signed
  *    16-bit) — channel choice, not mixing, so no rounding
  *    convention leaks into the oracle;
  *  - 65 energy windows: window k covers samples
  *    [k·n/65, (k+1)·n/65) (integer floors — the [[ImageHash]]
  *    downsample convention) and holds E_k = Σ|s_i|;
  *  - fingerprint (64-bit): bit k set iff E_{k+1} > E_k — the
  *    energy-envelope gradient signs, invariant to volume scaling
  *    exactly (c·a > c·b ⇔ a > b for c > 0), so re-encoded /
  *    re-amplified clips land within a few Hamming bits and the
  *    banded join in
  *    [[graft.operators.Dedup.hammingNearDups]] finds them with no
  *    pairwise scan;
  *  - stats: n_samples, peak = max|s_i|, and silent_windows =
  *    #{k : E_k · 65 < n · 328} — windows whose mean |sample| is
  *    under ~1% of full scale (328/32768), counted without a
  *    division so the oracle needs no floor convention at all.
  *
  * Null (never a throw) for anything that is not PCM 16-bit WAV
  * with at least 65 channel-0 samples; a decode cap bounds the work
  * a hostile header can demand.
  */
private[graft] object AudioPcm {

  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)

  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length &&
      s.indices.forall(j => (b(i + j) & 0xff) == s.charAt(j))

  private val Windows = 65
  private val MaxSamples = 8000000

  /** Channel-0 samples of a PCM 16-bit WAV, or null when the bytes
    * are anything else (wrong container, compressed/float/8-bit
    * encoding, truncated data chunk, over the decode cap).
    */
  private[functions] def decodeSamples(b: Array[Byte]): Array[Int] = {
    val n = b.length
    if (n < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var i = 12
    var ch = -1
    var bits = -1
    var fmtCode = -1
    var dataOff = -1
    var dataLen = -1L
    while (i + 8 <= n && (ch < 0 || dataOff < 0)) {
      val len = le32(b, i + 4)
      if (len < 0 || len > Int.MaxValue) return null
      if (tag(b, i, "fmt ") && len >= 16 && i + 8 + 16 <= n) {
        fmtCode = le16(b, i + 8)
        ch = le16(b, i + 10)
        bits = le16(b, i + 22)
      } else if (tag(b, i, "data")) {
        dataOff = i + 8
        dataLen = len
      }
      i += 8 + len.toInt + (len.toInt & 1)
    }
    if (fmtCode != 1 || ch <= 0 || bits != 16) return null
    if (dataOff < 0 || dataOff + dataLen > n) return null
    val frameBytes = 2L * ch
    val frames = dataLen / frameBytes
    if (frames > MaxSamples) return null
    val out = new Array[Int](frames.toInt)
    var f = 0
    while (f < out.length) {
      val o = dataOff + f * frameBytes.toInt
      out(f) = (le16(b, o) << 16) >> 16 // sign-extend
      f += 1
    }
    out
  }

  /** The 65 window energies E_k = Σ|s_i| (see object doc), or null
    * when there are fewer samples than windows.
    */
  private def energies(s: Array[Int]): Array[Long] = {
    val n = s.length
    if (n < Windows) return null
    val e = new Array[Long](Windows)
    var k = 0
    while (k < Windows) {
      val i0 = k * n / Windows
      val i1 = (k + 1) * n / Windows
      var sum = 0L
      var i = i0
      while (i < i1) {
        sum += math.abs(s(i).toLong)
        i += 1
      }
      e(k) = sum
      k += 1
    }
    e
  }

  /** 64-bit energy-gradient fingerprint, boxed (null =
    * undecodable / too short).
    */
  def fingerprintBoxed(bytes: Array[Byte]): java.lang.Long = {
    val s = decodeSamples(bytes)
    if (s == null) return null
    val e = energies(s)
    if (e == null) return null
    var hash = 0L
    var k = 0
    while (k < 64) {
      if (e(k + 1) > e(k)) hash |= 1L << k
      k += 1
    }
    java.lang.Long.valueOf(hash)
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("silent_windows", IntegerType, nullable = false)))

  /** `struct<n_samples, peak, silent_windows>`, or null when the
    * payload is not decodable to >= 65 samples.
    */
  def statsRow(bytes: Array[Byte]): InternalRow = {
    val s = decodeSamples(bytes)
    if (s == null) return null
    val e = energies(s)
    if (e == null) return null
    var peak = 0
    var i = 0
    while (i < s.length) {
      val a = math.abs(s(i))
      if (a > peak) peak = a
      i += 1
    }
    var silent = 0
    var k = 0
    while (k < Windows) {
      // mean |s| < 328/32768 of full scale, division-free:
      // E_k / n_k < 328  ⇔  E_k * Windows < n * 328 only when the
      // windows are equal-sized — they differ by one sample, so
      // compare against the window's OWN size instead
      val nk = ((k + 1) * s.length / Windows) - (k * s.length / Windows)
      if (e(k) < 328L * nk) silent += 1
      k += 1
    }
    new GenericInternalRow(Array[Any](
      s.length.toLong, peak, silent))
  }

  def audioFingerprint(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      AudioFingerprintExpr(
        org.apache.spark.sql.GraftShims.expression(c)))

  def audioStats(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      AudioStatsExpr(org.apache.spark.sql.GraftShims.expression(c)))
}

case class AudioFingerprintExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_fingerprint"

  override def nullSafeEval(input: Any): Any = {
    val r = AudioPcm.fingerprintBoxed(input.asInstanceOf[Array[Byte]])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("fp")
      s"""
         |java.lang.Long $r =
         |  graft.functions.AudioPcm.fingerprintBoxed($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): AudioFingerprintExpr =
    copy(child = newChild)
}

case class AudioStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AudioPcm.statsSchema
  override def nullable: Boolean = true
  override def prettyName: String = "audio_stats"

  override def nullSafeEval(input: Any): Any =
    AudioPcm.statsRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("st")
      s"""
         |InternalRow $r = graft.functions.AudioPcm.statsRow($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): AudioStatsExpr = copy(child = newChild)
}
