package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, LongType,
  StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Audio-header decode as a native codegen'd expression — the audio
  * sibling of [[ImageMetaExpr]]: sniff the container magic and read
  * stream parameters straight from the header bytes per the public
  * format specs, no audio library:
  *
  *  - WAV (RIFF, Microsoft/IBM spec): "RIFF…WAVE", then a chunk walk
  *    to "fmt " (channels LE u16 @+2, sample rate LE u32 @+4, bits
  *    per sample LE u16 @+14) and "data" (payload size → duration =
  *    size · 1000 / byte-rate). The walk skips chunks by their
  *    length fields — O(header), not O(payload).
  *  - FLAC (xiph spec): "fLaC" + the mandatory first STREAMINFO
  *    block: sample rate (20 bits), channels (3 bits, +1), bits per
  *    sample (5 bits, +1), total samples (36 bits) from the packed
  *    8 bytes at STREAMINFO offset 10.
  *  - MP3 (ISO 11172-3): an ID3v2 tag (skipped via its syncsafe
  *    length) or a raw FF-Ex/FF-Fx frame sync; sample rate from the
  *    MPEG-version table, channels from the mode field. Duration
  *    needs the full frame chain — left null.
  *  - OGG (RFC 3533): "OggS" capture pattern — container identified,
  *    codec parameters live in codec-specific packets → nulls.
  *
  * Returns `struct<format, channels, sample_rate, bits_per_sample,
  * duration_ms>`; "unknown"/nulls for unrecognized or truncated
  * payloads, never a throw — a 100 TB media scan must not die on one
  * corrupt blob. One JVM call per payload, O(header).
  */
case class AudioMetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AudioMetaExpr.schema

  override def prettyName: String = "audio_meta"

  override def nullSafeEval(input: Any): Any =
    AudioMetaExpr.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AudioMetaExpr.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): AudioMetaExpr = copy(child = newChild)
}

object AudioMetaExpr {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bits_per_sample", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  private def row(format: String, ch: Any, sr: Any, bits: Any,
                  durMs: Any): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(format), ch, sr, bits, durMs))

  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)

  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length &&
      s.indices.forall(j => (b(i + j) & 0xff) == s.charAt(j))

  /** MPEG audio sample rates by (version-id, rate-index). */
  private val MpegRates: Array[Array[Int]] = Array(
    Array(11025, 12000, 8000),  // 00 = MPEG 2.5
    Array(0, 0, 0),             // 01 = reserved
    Array(22050, 24000, 16000), // 10 = MPEG 2
    Array(44100, 48000, 32000)) // 11 = MPEG 1

  def compute(b: Array[Byte]): InternalRow = {
    val n = b.length

    // ---- WAV: RIFF chunk walk ----------------------------------
    if (n >= 12 && tag(b, 0, "RIFF") && tag(b, 8, "WAVE")) {
      var i = 12
      var ch, sr, bits = -1
      var byteRate = -1L
      var dataLen = -1L
      // chunk = 4-byte id + LE u32 length + payload (padded to even)
      while (i + 8 <= n && (ch < 0 || dataLen < 0)) {
        val len = le32(b, i + 4)
        if (len < 0 || len > Int.MaxValue) return row("wav",
          null, null, null, null)
        if (tag(b, i, "fmt ") && len >= 16 && i + 8 + 16 <= n) {
          ch = le16(b, i + 10)
          sr = le32(b, i + 12).toInt
          byteRate = le32(b, i + 16)
          bits = le16(b, i + 22)
        } else if (tag(b, i, "data")) {
          dataLen = len
        }
        i += 8 + len.toInt + (len.toInt & 1)
      }
      if (ch <= 0 || sr <= 0 || bits <= 0)
        return row("wav", null, null, null, null)
      val dur: Any =
        if (dataLen >= 0 && byteRate > 0)
          java.lang.Long.valueOf(dataLen * 1000L / byteRate)
        else null
      return row("wav", ch, sr, bits, dur)
    }

    // ---- FLAC: STREAMINFO (mandatory first metadata block) ------
    if (n >= 4 && tag(b, 0, "fLaC")) {
      // block header at 4: 1 byte (last-flag | type), 3 bytes length;
      // STREAMINFO is type 0 with length 34
      if (n >= 8 + 34 && (b(4) & 0x7f) == 0) {
        // packed 8 bytes at streaminfo offset 10 = file offset 18:
        // 20 bits sample rate, 3 bits (channels-1), 5 bits (bps-1),
        // 36 bits total samples
        val off = 18
        val sr = ((b(off) & 0xff) << 12) | ((b(off + 1) & 0xff) << 4) |
          ((b(off + 2) & 0xff) >> 4)
        val ch = (((b(off + 2) & 0xff) >> 1) & 0x7) + 1
        val bits = ((((b(off + 2) & 0xff) & 0x1) << 4) |
          ((b(off + 3) & 0xff) >> 4)) + 1
        val samples = (((b(off + 3) & 0xfL) << 32) |
          ((b(off + 4) & 0xffL) << 24) | ((b(off + 5) & 0xffL) << 16) |
          ((b(off + 6) & 0xffL) << 8) | (b(off + 7) & 0xffL))
        if (sr > 0) {
          val dur: Any =
            if (samples > 0) java.lang.Long.valueOf(
              samples * 1000L / sr)
            else null
          return row("flac", ch, sr, bits, dur)
        }
      }
      return row("flac", null, null, null, null)
    }

    // ---- OGG: container only ------------------------------------
    if (tag(b, 0, "OggS"))
      return row("ogg", null, null, null, null)

    // ---- MP3: ID3v2 tag or raw frame sync -----------------------
    // An ID3v2 prefix marks the container even when the first frame
    // is truncated away; a bare frame sync at offset 0 must also
    // carry VALID version/layer/rate fields to count (0xFF cannot
    // occur in UTF-8 text, so text corpora never false-positive).
    val hasId3 = tag(b, 0, "ID3") && n >= 10
    val off =
      if (hasId3) {
        // syncsafe u28 tag length at 6..9 (7 bits per byte)
        10 + (((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
          ((b(8) & 0x7f) << 7) | (b(9) & 0x7f))
      } else 0
    if (hasId3 || (n >= 4 && (b(0) & 0xff) == 0xff &&
        (b(1) & 0xe0) == 0xe0)) {
      if (off >= 0 && off + 4 <= n && (b(off) & 0xff) == 0xff &&
          (b(off + 1) & 0xe0) == 0xe0) {
        val versionId = (b(off + 1) >> 3) & 0x3
        val layer = (b(off + 1) >> 1) & 0x3
        val rateIdx = (b(off + 2) >> 2) & 0x3
        if (versionId != 1 && layer != 0 && rateIdx != 3) {
          val sr = MpegRates(versionId)(rateIdx)
          val mode = (b(off + 3) >> 6) & 0x3
          val ch = if (mode == 3) 1 else 2
          // sample depth is not an MP3 header concept -> null bits;
          // duration needs the frame chain -> null
          return row("mp3", ch, sr, null, null)
        }
      }
      // tagged but unreadable first frame: still an mp3 container
      // if ID3 said so; a bad bare sync is just unknown bytes
      return if (hasId3) row("mp3", null, null, null, null)
      else row("unknown", null, null, null, null)
    }

    row("unknown", null, null, null, null)
  }

  def audioMetaNative(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      AudioMetaExpr(org.apache.spark.sql.GraftShims.expression(c)))
}
