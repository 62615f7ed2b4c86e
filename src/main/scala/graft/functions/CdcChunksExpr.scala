package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (gear-hash CDC — the rolling-hash
  * boundary rule behind FastCDC / restic / data-dedup storage,
  * public algorithm): split a byte payload at positions where the
  * gear hash's low `avgBits` bits are zero, bounded by
  * [minLen, maxLen]. Boundaries depend on CONTENT, not offsets, so
  * inserting bytes early in a document only perturbs the chunks
  * around the edit — every later chunk keeps its identity — which is
  * exactly what makes chunk-digest dedup robust where fixed frames
  * (q101's 64-byte grid) shift and miss.
  *
  * One JVM call per row; returns `array<struct<off int, len int,
  * digest string>>` with md5 chunk digests, covering the payload
  * exactly (Σ len = payload length, offsets contiguous). The gear
  * table derives from md5(index) — deterministic, engine-portable,
  * no RNG.
  */
case class CdcChunksExpr(child: Expression, minLen: Int,
                         avgBits: Int, maxLen: Int)
    extends UnaryExpression {

  require(minLen >= 1 && maxLen >= minLen && avgBits >= 1 &&
    avgBits <= 30,
    s"need 1 <= minLen <= maxLen and avgBits in [1,30]: " +
      s"$minLen/$avgBits/$maxLen")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("off", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("digest", StringType, nullable = false))))

  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunksExpr.compute(input.asInstanceOf[Array[Byte]],
      minLen, avgBits, maxLen)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcChunksExpr.compute($c, $minLen, " +
        s"$avgBits, $maxLen)")

  override protected def withNewChildInternal(
      newChild: Expression): CdcChunksExpr = copy(child = newChild)
}

object CdcChunksExpr {

  /** Deterministic 64-bit gear table: entry i = the first 8 bytes of
    * md5("gear<i>") — reproducible everywhere, no RNG state.
    */
  private val gear: Array[Long] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(256) { i =>
      md.reset()
      val d = md.digest(s"gear$i".getBytes("UTF-8"))
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      v
    }
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  def compute(payload: Array[Byte], minLen: Int, avgBits: Int,
              maxLen: Int): GenericArrayData = {
    val n = payload.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mask = (1L << avgBits) - 1L
    val md = MessageDigest.getInstance("MD5")
    val out = new java.util.ArrayList[Any]()
    var start = 0
    while (start < n) {
      var h = 0L
      var i = start
      var cut = -1
      val hardEnd = math.min(n, start + maxLen)
      while (i < hardEnd && cut < 0) {
        h = (h << 1) + gear(payload(i) & 0xff)
        val len = i - start + 1
        if (len >= minLen && (h & mask) == 0L) cut = i + 1
        i += 1
      }
      val end = if (cut > 0) cut else hardEnd
      md.reset()
      md.update(payload, start, end - start)
      val digest = md.digest()
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = hexDigits((digest(b) >> 4) & 0xf)
        hex(2 * b + 1) = hexDigits(digest(b) & 0xf)
        b += 1
      }
      out.add(new GenericInternalRow(Array[Any](start, end - start,
        UTF8String.fromString(new String(hex)))))
      start = end
    }
    new GenericArrayData(out.toArray)
  }

  def cdcChunks(payload: Column, minLen: Int = 32, avgBits: Int = 6,
                maxLen: Int = 256): Column =
    org.apache.spark.sql.GraftShims.column(
      CdcChunksExpr(org.apache.spark.sql.GraftShims
        .expression(payload), minLen, avgBits, maxLen))
}
