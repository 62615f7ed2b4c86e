package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData,
  GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType,
  LongType, StructField, StructType}

/** Per-frame perceptual hashes over DECODED video frames — the video
  * sibling of [[ImageHash]], one step past [[VideoMetaExpr]]'s
  * container sniff. Pure-Scala decode of uncompressed AVI
  * (RIFF 'AVI ', the one mainstream video container whose BI_RGB
  * frames are decodable without codec libraries):
  *
  *  - LIST `hdrl` → LIST `strl` → `strh` of the first `vids` stream
  *    → its `strf` BITMAPINFOHEADER (width, height, 24/32 bpp,
  *    biCompression = 0 i.e. BI_RGB);
  *  - LIST `movi` → each `00db`/`00dc` chunk is one raw DIB frame:
  *    bottom-up rows, stride padded to 4 bytes — decoded with the
  *    same integer-luma convention as [[ImageHash.decodeLuma]];
  *  - each frame's 64-bit dHash via the shared
  *    [[ImageHash.dhashFromLuma]] (exact-integer area downsample to
  *    the 9×8 grid).
  *
  * Returns `array<struct<idx int, dhash bigint>>` in stream order —
  * the raw material for shot-boundary detection (Hamming distance
  * between consecutive frames) and sequence-level near-dup joins.
  * Null (never a throw) for anything that is not an uncompressed
  * 24/32bpp AVI; dimension and frame-count caps bound the work a
  * hostile header can demand. At 100 TB this is one codegen'd JVM
  * call per payload — the frame loop is O(pixels actually stored),
  * and the chunk walk skips by length fields.
  */
private[graft] object VideoFrames {

  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  private def le32(b: Array[Byte], i: Int): Int =
    ((b(i + 3) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length &&
      s.indices.forall(j => (b(i + j) & 0xff) == s.charAt(j))

  private val MaxFrames = 100000
  private val MaxPixels = 4000000L

  val frameSchema: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("dhash", LongType, nullable = false)))

  /** (idx, dhash) pairs for every decodable frame, or null when the
    * container/stream is not uncompressed-RGB AVI. Frames whose
    * chunk is shorter than one full image (or smaller than the hash
    * grid) are skipped, not fatal — stream order and `idx` stay
    * aligned with the chunk sequence.
    */
  def frameHashes(b: Array[Byte]): ArrayData = {
    val n = b.length
    if (n < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "AVI "))
      return null
    // pass 1: find the first vids stream's BITMAPINFOHEADER inside
    // LIST hdrl -> LIST strl (strh declares the type, strf carries
    // the format); pass 2: hash the movi frame chunks
    var w = -1
    var h = -1
    var bpp = -1
    var topDown = false
    var moviOff = -1
    var moviEnd = -1
    def walk(from: Int, to: Int, inStrl: Boolean): Unit = {
      var i = from
      var strlIsVids = false
      while (i + 8 <= to) {
        val len = le32(b, i + 4)
        if (len < 0 || i + 8 + len > to) return
        if (tag(b, i, "LIST") && len >= 4) {
          if (tag(b, i + 8, "hdrl") || tag(b, i + 8, "strl"))
            walk(i + 12, i + 8 + len, tag(b, i + 8, "strl"))
          else if (tag(b, i + 8, "movi") && moviOff < 0) {
            moviOff = i + 12
            moviEnd = i + 8 + len
          }
        } else if (inStrl && tag(b, i, "strh") && len >= 4) {
          strlIsVids = tag(b, i + 8, "vids")
        } else if (inStrl && strlIsVids && tag(b, i, "strf") &&
            len >= 20 && w < 0) {
          val bw = le32(b, i + 8 + 4)
          val bh = le32(b, i + 8 + 8)
          bpp = le16(b, i + 8 + 14)
          if (le32(b, i + 8 + 16) != 0) return // compressed
          w = bw
          topDown = bh < 0
          h = math.abs(bh)
        }
        i += 8 + len + (len & 1)
      }
    }
    walk(12, n, inStrl = false)
    if (w <= 0 || h <= 0 || (bpp != 24 && bpp != 32)) return null
    if (w > 16384 || h > 16384 || w.toLong * h > MaxPixels)
      return null
    if (moviOff < 0) return null
    val px = bpp / 8
    val stride = ((bpp * w + 31) / 32) * 4
    val frameBytes = stride.toLong * h
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    val luma = new Array[Int](w * h)
    var i = moviOff
    var idx = 0
    var truncated = false
    while (!truncated && i + 8 <= moviEnd && idx < MaxFrames) {
      val len = le32(b, i + 4)
      if (len < 0 || i + 8 + len > moviEnd) truncated = true
      else {
      val isFrame = tag(b, i + 2, "db") || tag(b, i + 2, "dc")
      if (isFrame) {
        if (len >= frameBytes) {
          val off = i + 8
          var y = 0
          while (y < h) {
            val srcRow = if (topDown) y else h - 1 - y
            val rowOff = off + srcRow * stride
            var x = 0
            while (x < w) {
              val o = rowOff + x * px
              val bl = b(o) & 0xff
              val g = b(o + 1) & 0xff
              val r = b(o + 2) & 0xff
              luma(y * w + x) = (299 * r + 587 * g + 114 * bl) / 1000
              x += 1
            }
            y += 1
          }
          val hash = ImageHash.dhashFromLuma(luma, w, h)
          if (hash != null)
            out += new GenericInternalRow(
              Array[Any](idx, hash.longValue()))
        }
        idx += 1
      }
      i += 8 + len + (len & 1)
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  def videoFrameHashes(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      VideoFrameHashesExpr(
        org.apache.spark.sql.GraftShims.expression(c)))
}

case class VideoFrameHashesExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(VideoFrames.frameSchema, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "video_frame_hashes"

  override def nullSafeEval(input: Any): Any =
    VideoFrames.frameHashes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("vf")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.VideoFrames.frameHashes($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): VideoFrameHashesExpr =
    copy(child = newChild)
}
