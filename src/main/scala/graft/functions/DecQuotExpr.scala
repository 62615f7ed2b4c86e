package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType}

/** Exact floor division of two NON-NEGATIVE decimal(38,0) values in
  * ONE BigDecimal `divideToIntegralValue` — the graph family's
  * per-row workhorse. The previous spelling
  * `(a - pmod(a, b)) / b` costs three heavyweight BigDecimal
  * operations per call (remainder is itself an integral divide plus
  * multiply/subtract, then another subtract and a scale-matching
  * divide); profiled under the rank fold it was the single hottest
  * executor frame (`BigDecimal.remainder` via `Decimal.$percent`).
  *
  * Semantics: truncated division, which EQUALS floor division for
  * a >= 0, b > 0 — the only regime the rank/HITS updates produce
  * (scores, weights, degrees and masses are all non-negative; edge
  * weights are `require`d positive upstream). A negative operand
  * raises rather than silently truncating toward zero.
  */
case class DecQuotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "dec_quot"

  override def dataType: DataType = DecimalType(38, 0)

  private def isDec(dt: DataType): Boolean =
    dt.isInstanceOf[DecimalType]

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (isDec(left.dataType) && isDec(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"dec_quot expects two decimals, got " +
            s"${left.dataType} and ${right.dataType}")

  // always nullable: a zero divisor yields null regardless of the
  // children's nullability (the non-ANSI division contract)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    DecQuotExpr.compute(a.asInstanceOf[Decimal],
      b.asInstanceOf[Decimal])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    // nullSafeCodeGen (not defineCodeGen): compute returns null for a
    // zero divisor, so isNull must be re-derived from the result
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = graft.functions.DecQuotExpr.compute($a, $b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecQuotExpr =
    copy(left = newLeft, right = newRight)
}

object DecQuotExpr {

  def compute(a: Decimal, b: Decimal): Decimal = {
    val ja = a.toJavaBigDecimal
    val jb = b.toJavaBigDecimal
    // zero divisor yields null — exactly what the previous
    // `(a - pmod(a, b)) / b` spelling produced under non-ANSI SQL
    if (jb.signum == 0) return null
    if (ja.signum < 0 || jb.signum < 0)
      throw new ArithmeticException(
        s"dec_quot is floor division only for a >= 0, b > 0: $a / $b")
    // fast path: both operands fit a long (≤ 18 digits at scale 0) —
    // at bench scale every score does, so the BigDecimal machinery
    // is skipped entirely; at 100 TB scores can outgrow the fast
    // path and take the single divideToIntegralValue below
    val out =
      if (ja.precision <= 18 && jb.precision <= 18 &&
          ja.scale == 0 && jb.scale == 0)
        Decimal(ja.longValueExact / jb.longValueExact)
      else Decimal(ja.divideToIntegralValue(jb))
    if (out.changePrecision(38, 0)) out else null
  }

  def decQuot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftShims.column(DecQuotExpr(
      org.apache.spark.sql.GraftShims.expression(a),
      org.apache.spark.sql.GraftShims.expression(b)))
}
