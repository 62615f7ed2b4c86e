package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType,
  StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Real image-header decode as a native codegen'd expression: sniff
  * the container magic and read the pixel dimensions straight from the
  * header bytes — no image library, just the public format specs:
  *
  *  - PNG (RFC 2083 / W3C spec): 8-byte signature, IHDR width/height
  *    as big-endian u32 at offsets 16/20.
  *  - JPEG (ITU T.81): walk the FF-marker segments from SOI to the
  *    first SOFn (C0–CF minus C4/C8/CC); height/width are big-endian
  *    u16 at segment offsets 5/7.
  *  - GIF (87a/89a spec): logical screen width/height as
  *    little-endian u16 at offsets 6/8.
  *  - BMP (BITMAPINFOHEADER): width/height as little-endian i32 at
  *    offsets 18/22 (height may be negative = top-down; reported
  *    absolute).
  *
  * Returns `struct<format, width, height>` — format "unknown" with
  * null dimensions for unrecognized or truncated payloads, never a
  * throw: a 100 TB media scan must not die on one corrupt blob. One
  * JVM call per payload, O(header) not O(payload) (the JPEG walk
  * skips segments by their length fields).
  *
  * This replaces the "decode is stubbed" seam for header-level
  * metadata; [[graft.operators.Multimodal.fakeDecodeFeatures]] stays
  * as the deterministic stand-in for pixel-level feature extraction.
  */
case class ImageMetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageMetaExpr.schema

  override def prettyName: String = "image_meta"

  override def nullSafeEval(input: Any): Any =
    ImageMetaExpr.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ImageMetaExpr.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): ImageMetaExpr = copy(child = newChild)
}

object ImageMetaExpr {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  private val pngSig =
    Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private def row(format: String, w: Any, h: Any): InternalRow =
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(format), w, h))

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def le32(b: Array[Byte], i: Int): Int =
    ((b(i + 3) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  def compute(b: Array[Byte]): InternalRow = {
    val n = b.length
    // PNG: signature + "IHDR" at 12, dims at 16/20
    if (n >= 24 && (0 until 8).forall(i => b(i) == pngSig(i))) {
      val ihdr = b(12) == 'I' && b(13) == 'H' && b(14) == 'D' &&
        b(15) == 'R'
      val w = be32(b, 16)
      val h = be32(b, 20)
      return if (ihdr && w > 0 && h > 0) row("png", w, h)
      else row("png", null, null)
    }
    // GIF: "GIF87a" / "GIF89a", LE u16 dims at 6/8
    if (n >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      val w = le16(b, 6)
      val h = le16(b, 8)
      return if (w > 0 && h > 0) row("gif", w, h)
      else row("gif", null, null)
    }
    // BMP: "BM", BITMAPINFOHEADER i32 dims at 18/22
    if (n >= 26 && b(0) == 'B' && b(1) == 'M') {
      val w = le32(b, 18)
      val h = le32(b, 22)
      return if (w > 0 && h != 0 && h != Int.MinValue)
        row("bmp", w, math.abs(h))
      else row("bmp", null, null)
    }
    // JPEG: SOI, then walk marker segments to the first SOFn. The
    // walk is strictly O(header): SOS (start of entropy data, which
    // always follows the SOF in a well-formed stream) terminates it,
    // and a resync budget bounds corrupt inputs — without the cap, a
    // blob that merely STARTS with FF D8 would be scanned byte-by-
    // byte to its end (and a stray FF Cx inside garbage read as a
    // confident fake SOF)
    if (n >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      var resyncBudget = 4096
      while (i + 3 < n) {
        if ((b(i) & 0xff) != 0xff) {
          // not marker-aligned (corrupt segment data): resync,
          // bounded
          resyncBudget -= 1
          if (resyncBudget < 0) return row("jpeg", null, null)
          i += 1
        } else {
          val marker = b(i + 1) & 0xff
          if (marker == 0xff) i += 1 // fill byte
          else if (marker == 0xd9 || marker == 0xda)
            return row("jpeg", null, null) // EOI / SOS: no SOF seen
          else if (marker == 0x01 ||
              (marker >= 0xd0 && marker <= 0xd8)) i += 2 // standalone
          else {
            val segLen = be16(b, i + 2)
            val isSof = marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc
            if (isSof) {
              return if (i + 8 < n && segLen >= 7)
                row("jpeg", be16(b, i + 7), be16(b, i + 5))
              else row("jpeg", null, null)
            }
            if (segLen < 2) return row("jpeg", null, null)
            i += 2 + segLen
          }
        }
      }
      return row("jpeg", null, null)
    }
    row("unknown", null, null)
  }

  def imageMetaNative(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      ImageMetaExpr(org.apache.spark.sql.GraftShims.expression(c)))
}
