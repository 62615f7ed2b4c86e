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

/** Video-container decode as a native codegen'd expression — the
  * video sibling of [[ImageMetaExpr]] / [[AudioMetaExpr]]:
  *
  *  - MP4 / ISO BMFF (ISO 14496-12): a box walk — `[u32 size][4cc]`
  *    headers, 64-bit large-size escape — to `ftyp` (major brand),
  *    then into `moov` for `mvhd` (timescale + duration → exact
  *    duration_ms; version 0 and 1 layouts) and the first `tkhd`
  *    with nonzero dimensions (width/height as 16.16 fixed-point).
  *    Boxes are skipped by their size fields: O(header boxes), the
  *    `mdat` payload is never touched.
  *  - Matroska / WebM (EBML, RFC 8794): the `1A 45 DF A3` EBML
  *    magic identifies the container; dimensions live in
  *    variable-length EBML elements → nulls (format only, like OGG
  *    on the audio side).
  *
  * Returns `struct<format, major_brand, duration_ms, width,
  * height>`; "unknown"/nulls for unrecognized or truncated payloads,
  * never a throw. One JVM call per payload.
  */
case class VideoMetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = VideoMetaExpr.schema

  override def prettyName: String = "video_meta"

  override def nullSafeEval(input: Any): Any =
    VideoMetaExpr.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VideoMetaExpr.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): VideoMetaExpr = copy(child = newChild)
}

object VideoMetaExpr {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("major_brand", StringType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  private def row(format: String, brand: Any, durMs: Any, w: Any,
                  h: Any): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(format),
      brand, durMs, w, h))

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def fourcc(b: Array[Byte], i: Int, s: String): Boolean =
    s.indices.forall(j => (b(i + j) & 0xff) == s.charAt(j))

  /** Result accumulator for the moov walk. */
  private final class Acc {
    var durMs: Any = null
    var w: Any = null
    var h: Any = null
  }

  /** Walk sibling boxes in [from, until); descend into moov/trak. */
  private def walk(b: Array[Byte], from: Int, until: Int,
                   acc: Acc, depth: Int): Unit = {
    var i = from
    while (i + 8 <= until) {
      var size = be32(b, i)
      var hdr = 8
      if (size == 1) {
        if (i + 16 > until) return
        val big = be64(b, i + 8)
        if (big < 16 || big > Int.MaxValue) return
        size = big
        hdr = 16
      } else if (size == 0) {
        size = until - i // box extends to the end
      }
      if (size < hdr || i + size > until) return
      val payload = i + hdr
      if (fourcc(b, i + 4, "moov") ||
          (depth > 0 && fourcc(b, i + 4, "trak"))) {
        walk(b, payload, i + size.toInt, acc, depth + 1)
      } else if (depth > 0 && fourcc(b, i + 4, "mvhd") &&
          acc.durMs == null) {
        val v = if (payload < until) b(payload) & 0xff else -1
        if (v == 0 && payload + 20 + 4 <= until) {
          val timescale = be32(b, payload + 12)
          val duration = be32(b, payload + 16)
          if (timescale > 0)
            acc.durMs = java.lang.Long.valueOf(
              duration * 1000L / timescale)
        } else if (v == 1 && payload + 28 + 8 <= until) {
          val timescale = be32(b, payload + 20)
          val duration = be64(b, payload + 24)
          if (timescale > 0 && duration >= 0)
            acc.durMs = java.lang.Long.valueOf(
              duration * 1000L / timescale)
        }
      } else if (depth > 0 && fourcc(b, i + 4, "tkhd") &&
          acc.w == null) {
        val v = if (payload < until) b(payload) & 0xff else -1
        // v0: 16.16 width/height at payload+76/+80; v1 (8-byte
        // times): +88/+92
        val wOff = if (v == 0) payload + 76
          else if (v == 1) payload + 88 else -1
        if (wOff > 0 && wOff + 8 <= until) {
          val w = (be32(b, wOff) >> 16).toInt
          val h = (be32(b, wOff + 4) >> 16).toInt
          if (w > 0 && h > 0) {
            acc.w = Integer.valueOf(w)
            acc.h = Integer.valueOf(h)
          }
        }
      }
      i += size.toInt
    }
  }

  def compute(b: Array[Byte]): InternalRow = {
    val n = b.length
    // Matroska / WebM: EBML magic
    if (n >= 4 && (b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
        (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3)
      return row("matroska", null, null, null, null)
    // ISO BMFF: first box must be ftyp (size >= 16 covers
    // brand + minor version)
    if (n >= 16 && fourcc(b, 4, "ftyp")) {
      val ftypSize = be32(b, 0)
      if (ftypSize < 16 || ftypSize > n)
        return row("mp4", null, null, null, null)
      val brand = new String(b, 8, 4, "ISO-8859-1").trim
      val acc = new Acc
      walk(b, ftypSize.toInt, n, acc, 0)
      return row("mp4",
        if (brand.nonEmpty) UTF8String.fromString(brand) else null,
        acc.durMs, acc.w, acc.h)
    }
    row("unknown", null, null, null, null)
  }

  def videoMetaNative(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      VideoMetaExpr(org.apache.spark.sql.GraftShims.expression(c)))
}
