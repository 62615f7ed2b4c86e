package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D point — the layout curve with
  * strictly better locality than Z-order (Morton): every unit step
  * along the curve moves exactly one cell, so a contiguous index
  * range covers a compact blob (Morton's "seams" jump across the
  * plane at power-of-two boundaries, inflating row-group min/max
  * envelopes on one dimension).
  *
  * The classic xy2d walk (Hamilton's convention; the Wikipedia
  * reference loop): for s from 2^(bits-1) down to 1, accumulate the
  * quadrant `s²·((3·rx) XOR ry)` and rotate the frame. The rotation
  * carries SEQUENTIAL state across bit levels, so unlike Morton it
  * cannot unroll into independent per-bit column arithmetic without
  * exponential expression growth — a native expression with a tight
  * integer loop is the right Spark form (codegen'd, one JVM call
  * per row). The SQL oracle replays the identical unrolled levels
  * as MATERIALIZED per-level CTEs.
  *
  * Inputs must already be masked to `bits` bits (same contract as
  * `Layout.zValue2`); values outside [0, 2^bits) throw rather than
  * silently truncating the curve.
  */
case class HilbertExpr(left: Expression, right: Expression,
                       bits: Int) extends BinaryExpression {

  override def prettyName: String = "hilbert2"

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType &&
        bits >= 1 && bits <= 31)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"hilbert2 expects two longs and bits in [1, 31], got " +
            s"${left.dataType}, ${right.dataType}, bits=$bits")

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertExpr.compute(a.asInstanceOf[Long], b.asInstanceOf[Long],
      bits)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HilbertExpr.compute($a, $b, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertExpr =
    copy(left = newLeft, right = newRight)
}

object HilbertExpr {

  /** xy2d for an order-2^bits curve. */
  def compute(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    if (x0 < 0 || y0 < 0 || x0 >= n || y0 >= n)
      throw new IllegalArgumentException(
        s"hilbert2: point ($x0, $y0) outside [0, $n) - mask inputs " +
          "to the declared bits first")
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant frame (reflection is about the FULL
      // order n-1 — the canonical xy2d; an s-1 reflection goes
      // negative and breaks the walk)
      if (ry == 0L) {
        if (rx == 1L) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbert2(a: Column, b: Column, bits: Int): Column =
    org.apache.spark.sql.GraftShims.column(HilbertExpr(
      org.apache.spark.sql.GraftShims.expression(a.cast("long")),
      org.apache.spark.sql.GraftShims.expression(b.cast("long")),
      bits))
}
