package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** EXIF metadata extraction and redaction for JPEG payloads — the
  * PII face of a multimodal corpus (camera GPS fixes, device
  * serial-bearing Make/Model strings, capture timestamps). Pure
  * byte-walk, no codec: locate the APP1 "Exif\0\0" segment on the
  * marker walk (same O(header) discipline and resync budget as
  * [[ImageMetaExpr]]'s SOF hunt), then parse the TIFF header
  * (II/MM endianness) and IFD0's 12-byte entries for the tags a
  * release scan cares about:
  *
  *   - 0x010F Make / 0x0110 Model (ASCII, inline or offset),
  *   - 0x0132 DateTime (ASCII),
  *   - 0x0112 Orientation (SHORT),
  *   - 0x8825 GPS-IFD pointer — PRESENCE is the PII signal
  *     (a GPS IFD means a location fix rode along with the pixels).
  *
  * [[ExifMetaExpr]] returns a struct (null for non-JPEG bytes;
  * `has_exif = false` with null fields for a JPEG without a
  * parseable Exif APP1). [[ExifStripExpr]] is the redaction side:
  * the same JPEG bytes with every Exif APP1 segment removed and
  * all other segments byte-identical (non-JPEG inputs pass through
  * unchanged, so the strip is safe to run over a mixed corpus).
  * Every read is bounds-checked; malformed TIFF structures yield
  * `has_exif = false`, never a throw.
  */
object Exif {

  val schema: StructType = StructType(Seq(
    StructField("has_exif", BooleanType, nullable = false),
    StructField("has_gps", BooleanType, nullable = false),
    StructField("make", StringType, nullable = true),
    StructField("model", StringType, nullable = true),
    StructField("datetime", StringType, nullable = true),
    StructField("orientation", IntegerType, nullable = true)))

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def row(hasExif: Boolean, hasGps: Boolean, make: String,
                  model: String, datetime: String,
                  orientation: Any): InternalRow =
    new GenericInternalRow(Array[Any](hasExif, hasGps,
      if (make == null) null else UTF8String.fromString(make),
      if (model == null) null else UTF8String.fromString(model),
      if (datetime == null) null else UTF8String.fromString(datetime),
      orientation))

  private val NoExif = row(hasExif = false, hasGps = false,
    null, null, null, null)

  /** Offset and length of the first APP1-Exif segment's PAYLOAD
    * (past the 4 marker+length bytes), or null. Shared by meta and
    * strip so both agree on what "the Exif segment" is.
    */
  private def findExifApp1(b: Array[Byte]): (Int, Int) = {
    val n = b.length
    if (n < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return null
    var i = 2
    var resyncBudget = 4096
    while (i + 3 < n) {
      if ((b(i) & 0xff) != 0xff) {
        resyncBudget -= 1
        if (resyncBudget < 0) return null
        i += 1
      } else {
        val marker = b(i + 1) & 0xff
        if (marker == 0xff) i += 1
        else if (marker == 0xd9 || marker == 0xda) return null
        else if (marker == 0x01 ||
            (marker >= 0xd0 && marker <= 0xd8)) i += 2
        else {
          val segLen = be16(b, i + 2)
          if (segLen < 2) return null
          if (marker == 0xe1 && segLen >= 8 && i + 2 + segLen <= n &&
              b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
              b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0)
            return (i + 10, segLen - 8)
          i += 2 + segLen
        }
      }
    }
    null
  }

  def compute(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return null // not a JPEG at all
    val app1 = findExifApp1(b)
    if (app1 == null) return NoExif
    val (t0, tLen) = app1 // TIFF header start, bytes available
    if (tLen < 8) return NoExif
    // endianness + magic 42
    val le =
      if (b(t0) == 'I' && b(t0 + 1) == 'I') true
      else if (b(t0) == 'M' && b(t0 + 1) == 'M') false
      else return NoExif
    def u16(i: Int): Int = {
      if (i < 0 || i + 1 >= t0 + tLen) return -1
      if (le) ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
      else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    }
    def u32(i: Int): Long = {
      if (i < 0 || i + 3 >= t0 + tLen) return -1L
      if (le)
        ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
          ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
      else
        ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
          ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    }
    if (u16(t0 + 2) != 42) return NoExif
    val ifd0 = u32(t0 + 4)
    if (ifd0 < 0 || t0 + ifd0 + 2 > t0 + tLen) return NoExif
    val e0 = t0 + ifd0.toInt
    val nEntries = u16(e0)
    if (nEntries < 0 || nEntries > 512) return NoExif
    var make: String = null
    var model: String = null
    var datetime: String = null
    var orientation: Any = null
    var hasGps = false
    // ASCII value: count bytes inline (<= 4) or at the u32 offset
    // from the TIFF header; trailing NULs trimmed
    def ascii(entry: Int): String = {
      val count = u32(entry + 4)
      if (count <= 0 || count > 4096) return null
      val off =
        if (count <= 4) entry + 8
        else {
          val o = u32(entry + 8)
          if (o < 0) return null
          t0 + o.toInt
        }
      if (off < 0 || off + count > t0 + tLen) return null
      var end = off + count.toInt
      while (end > off && (b(end - 1) == 0 ||
          b(end - 1) == ' ')) end -= 1
      new String(b, off, end - off,
        java.nio.charset.StandardCharsets.US_ASCII)
    }
    var k = 0
    while (k < nEntries) {
      val entry = e0 + 2 + 12 * k
      if (entry + 12 > t0 + tLen) return NoExif
      val tag = u16(entry)
      val typ = u16(entry + 2)
      tag match {
        case 0x010f if typ == 2 => make = ascii(entry)
        case 0x0110 if typ == 2 => model = ascii(entry)
        case 0x0132 if typ == 2 => datetime = ascii(entry)
        case 0x0112 if typ == 3 =>
          val v = u16(entry + 8)
          if (v >= 0) orientation = v
        case 0x8825 => hasGps = true
        case _ =>
      }
      k += 1
    }
    row(hasExif = true, hasGps = hasGps, make, model, datetime,
      orientation)
  }

  /** The input with every APP1-Exif segment removed (see object
    * doc). Non-JPEG inputs return unchanged.
    */
  def strip(b: Array[Byte]): Array[Byte] = {
    val n = b.length
    if (n < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return b
    val out = new java.io.ByteArrayOutputStream(n)
    out.write(b, 0, 2)
    var i = 2
    var resyncBudget = 4096
    while (i < n) {
      if (i + 3 >= n || (b(i) & 0xff) != 0xff) {
        // entropy data / trailing bytes / resync: copy verbatim
        if ((b(i) & 0xff) != 0xff) {
          resyncBudget -= 1
          if (resyncBudget < 0) {
            out.write(b, i, n - i)
            return out.toByteArray
          }
        }
        out.write(b(i))
        i += 1
      } else {
        val marker = b(i + 1) & 0xff
        if (marker == 0xff) { out.write(b(i)); i += 1 }
        else if (marker == 0xda || marker == 0xd9) {
          // SOS/EOI: everything from here is copied verbatim
          out.write(b, i, n - i)
          return out.toByteArray
        } else if (marker == 0x01 ||
            (marker >= 0xd0 && marker <= 0xd8)) {
          out.write(b, i, 2); i += 2
        } else {
          val segLen = be16(b, i + 2)
          if (segLen < 2 || i + 2 + segLen > n) {
            out.write(b, i, n - i)
            return out.toByteArray
          }
          val isExif = marker == 0xe1 && segLen >= 8 &&
            b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
            b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0
          if (!isExif) out.write(b, i, 2 + segLen)
          i += 2 + segLen
        }
      }
    }
    out.toByteArray
  }

  def exifMeta(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      ExifMetaExpr(org.apache.spark.sql.GraftShims.expression(c)))

  def exifStrip(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      ExifStripExpr(org.apache.spark.sql.GraftShims.expression(c)))
}

case class ExifMetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Exif.schema
  override def nullable: Boolean = true
  override def prettyName: String = "exif_meta"

  override def nullSafeEval(input: Any): Any =
    Exif.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("exif")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $r =
         |  graft.functions.Exif.compute($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ExifMetaExpr = copy(child = newChild)
}

case class ExifStripExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "exif_strip"

  override def nullSafeEval(input: Any): Any =
    Exif.strip(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Exif.strip($c)")

  override protected def withNewChildInternal(
      newChild: Expression): ExifStripExpr = copy(child = newChild)
}
