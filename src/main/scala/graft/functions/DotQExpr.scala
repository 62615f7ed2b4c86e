package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native quantized dot product of two float/double arrays.
  *
  * Semantics identical to `Similarity.dotQ`'s array-lambda form: each
  * element is quantized to `round(x·2^25)` with ties away from zero
  * (matching both Spark's `round` (BigDecimal HALF_UP) and DuckDB's
  * `round` — Java's `Math.round` differs on negative ties and must NOT
  * be used), products accumulate in a long. One JVM call per row
  * replaces two interpreted higher-order folds.
  */
case class DotQExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "dot_q"

  override def dataType: DataType = LongType

  private def isFloatArr(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (isFloatArr(left.dataType) && isFloatArr(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"dot_q expects two array<float|double>, got " +
            s"${left.dataType} and ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    DotQExpr.compute(
      a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData],
      left.dataType.asInstanceOf[ArrayType]
        .elementType == DoubleType,
      right.dataType.asInstanceOf[ArrayType]
        .elementType == DoubleType)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ld = left.dataType.asInstanceOf[ArrayType]
      .elementType == DoubleType
    val rd = right.dataType.asInstanceOf[ArrayType]
      .elementType == DoubleType
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotQExpr.compute($a, $b, $ld, $rd)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotQExpr =
    copy(left = newLeft, right = newRight)
}

object DotQExpr {

  private final val Scale = 33554432.0 // 2^25

  /** round-half-away-from-zero (Spark round / DuckDB round). */
  private def q(x: Double): Long =
    (if (x >= 0) math.floor(x * Scale + 0.5)
     else math.ceil(x * Scale - 0.5)).toLong

  def compute(a: ArrayData, b: ArrayData,
              aDouble: Boolean, bDouble: Boolean): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      acc += q(x) * q(y)
      i += 1
    }
    acc
  }

  def dotQNative(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftShims.column(DotQExpr(
      org.apache.spark.sql.GraftShims.expression(a),
      org.apache.spark.sql.GraftShims.expression(b)))
}
