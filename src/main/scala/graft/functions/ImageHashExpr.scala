package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Perceptual image hashes over DECODED pixels — the content-level
  * step past [[ImageMetaExpr]]'s header sniff. Pure-Scala decode of
  * uncompressed BMP (24/32bpp, BITMAPINFOHEADER, bottom-up or
  * top-down — the one mainstream format decodable without codec
  * libraries), then the classic perceptual grids in EXACT integer
  * arithmetic so a SQL oracle can replay every step:
  *
  *  - luma = (299·R + 587·G + 114·B) / 1000, floor division;
  *  - area downsample to a W×H grid: cell (cx,cy) covers source
  *    pixels [cx·w/W, (cx+1)·w/W) × [cy·h/H, (cy+1)·h/H) (integer
  *    floors) and holds floor(sum/count) of their lumas;
  *  - dHash (9×8 grid): bit (y·8+x) set iff g(x+1,y) > g(x,y) —
  *    horizontal gradient signs, robust to brightness/contrast;
  *  - aHash (8×8 grid): bit (y·8+x) set iff g(x,y) > floor(Σg/64).
  *
  * Near-duplicate frames/thumbnails land within a few bits of
  * Hamming distance, which the banded join in
  * [[graft.operators.Dedup.imageNearDups]] finds without any
  * pairwise scan. Returns null for anything that is not a decodable
  * BMP at least as large as the grid — including every other image
  * format, whose pixel decode needs codec libraries this container
  * does not ship (the reference's content analysis is likewise
  * format-gated; structa reads bytes only, `source.py`).
  */
private[graft] object ImageHash {

  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  private def le32(b: Array[Byte], i: Int): Int =
    ((b(i + 3) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  /** Decoded luma plane, row-major top-down, or null when the bytes
    * are not an uncompressed 24/32bpp BMP. Dimension caps bound the
    * work a hostile header can demand (the decode allocates w·h
    * ints).
    */
  private[functions] def decodeLuma(b: Array[Byte])
      : (Int, Int, Array[Int]) = {
    val n = b.length
    if (n < 54 || b(0) != 'B' || b(1) != 'M') return null
    val dataOffset = le32(b, 10)
    val dibSize = le32(b, 14)
    if (dibSize < 40) return null
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    if (w <= 0 || hRaw == 0 || hRaw == Int.MinValue) return null
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    val bpp = le16(b, 28)
    if (bpp != 24 && bpp != 32) return null
    if (le32(b, 30) != 0) return null // compressed: undecodable here
    if (w > 16384 || h > 16384 || w.toLong * h > 4000000L) return null
    val stride = ((bpp * w + 31) / 32) * 4
    if (dataOffset < 54 ||
        dataOffset.toLong + stride.toLong * h > n) return null
    val px = bpp / 8
    val luma = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val rowOff = dataOffset + srcRow * stride
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
    (w, h, luma)
  }

  /** Exact-integer area downsample (see object doc), or null when
    * the source is smaller than the grid (upscaling would need an
    * interpolation convention no oracle shares).
    */
  private[functions] def downsample(luma: Array[Int], w: Int, h: Int,
                                    gw: Int, gh: Int): Array[Int] = {
    if (w < gw || h < gh) return null
    val g = new Array[Int](gw * gh)
    var cy = 0
    while (cy < gh) {
      val y0 = cy * h / gh
      val y1 = (cy + 1) * h / gh
      var cx = 0
      while (cx < gw) {
        val x0 = cx * w / gw
        val x1 = (cx + 1) * w / gw
        var sum = 0L
        var cnt = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            sum += luma(y * w + x)
            cnt += 1
            x += 1
          }
          y += 1
        }
        g(cy * gw + cx) = (sum / cnt).toInt
        cx += 1
      }
      cy += 1
    }
    g
  }

  /** dHash of an already-decoded luma plane (shared with the video
    * frame hasher, which decodes AVI DIB frames instead of BMP
    * files): null when the plane is smaller than the 9×8 grid.
    */
  private[functions] def dhashFromLuma(luma: Array[Int], w: Int,
                                       h: Int): java.lang.Long = {
    val g = downsample(luma, w, h, 9, 8)
    if (g == null) return null
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x + 1) > g(y * 9 + x))
          hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** 64-bit dHash, boxed (null = undecodable / too small). */
  def dhashBoxed(bytes: Array[Byte]): java.lang.Long = {
    val dec = decodeLuma(bytes)
    if (dec == null) return null
    val (w, h, luma) = dec
    dhashFromLuma(luma, w, h)
  }

  /** 64-bit aHash, boxed (null = undecodable / too small). */
  def ahashBoxed(bytes: Array[Byte]): java.lang.Long = {
    val dec = decodeLuma(bytes)
    if (dec == null) return null
    val (w, h, luma) = dec
    val g = downsample(luma, w, h, 8, 8)
    if (g == null) return null
    var sum = 0L
    var i = 0
    while (i < 64) { sum += g(i); i += 1 }
    val avg = sum / 64
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 8 + x) > avg) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    java.lang.Long.valueOf(hash)
  }

  def imageDHash(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      ImageDHashExpr(org.apache.spark.sql.GraftShims.expression(c)))

  def imageAHash(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      ImageAHashExpr(org.apache.spark.sql.GraftShims.expression(c)))
}

case class ImageDHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "image_dhash"

  override def nullSafeEval(input: Any): Any = {
    val r = ImageHash.dhashBoxed(input.asInstanceOf[Array[Byte]])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("dh")
      s"""
         |java.lang.Long $r = graft.functions.ImageHash.dhashBoxed($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ImageDHashExpr = copy(child = newChild)
}

case class ImageAHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "image_ahash"

  override def nullSafeEval(input: Any): Any = {
    val r = ImageHash.ahashBoxed(input.asInstanceOf[Array[Byte]])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("ah")
      s"""
         |java.lang.Long $r = graft.functions.ImageHash.ahashBoxed($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ImageAHashExpr = copy(child = newChild)
}
