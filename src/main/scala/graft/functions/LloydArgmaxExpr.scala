package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** In-row Lloyd/PQ assignment against a COLLECTED centroid table —
  * the argmax step of `Similarity.kmeansLabels` / `pqAssign` /
  * `pqAssignResidual` as one expression per row.
  *
  * Why: the join formulation of one scoring round is
  * posexplode → join(broadcast centroids) → partial-agg the per-
  * (id, sub, label) dots → join(broadcast norms) → window argmax —
  * TWO exchanges and a sort per Lloyd iteration, and (with the
  * per-iteration centroid collect) the only cluster inputs are
  * broadcast LOCAL tables anyway. Evaluating the argmax in-row
  * collapses each iteration to ONE aggregation (the next round's
  * centroid sums, grouped by the in-row label) and the final
  * assignment to a pure projection. Same O(n·k·d) arithmetic, no
  * per-iteration shuffle of scored candidate rows at any scale.
  *
  * Exactness (the whole point — the DuckDB oracle replays the join
  * formulation bit-for-bit):
  *  - components quantize on the shared grid: qx = round(x·2^25),
  *    ties away from zero (the [[DotQExpr]] rule);
  *  - dots accumulate EXACTLY (long fast path, BigInteger on
  *    overflow) — order-free, so any summation order matches the
  *    plan's decimal(38,0) sum;
  *  - score = dot.toDouble / sqrt(s2.toDouble), both conversions
  *    correctly rounded exactly like decimal → double casts;
  *  - comparisons use Spark's double ordering (`x == y` first, then
  *    java.lang.Double.compare — NaN greatest), ties label-asc;
  *  - a label is a CANDIDATE for a row only if at least one of its
  *    table dims is present in the row's array (the inner join
  *    produced no group otherwise);
  *  - residual variant: y = qx − mu over the probed cell, score
  *    NULL when s2 = 0 (ranked below every non-null; an all-null
  *    subspace falls back to its smallest candidate label — the
  *    window's desc_nulls_last, label-asc order).
  */
object LloydArgmaxExpr {

  /** One subspace's candidate labels: per label its table dims and
    * integer component sums (cs), plus the exact squared norm as a
    * double (Σ cs², converted once — the plan's
    * `cast(sum(...) as double)`).
    */
  final case class SubTable(labels: Array[Long],
                            dims: Array[Array[Int]],
                            cs: Array[Array[Long]],
                            s2: Array[Double])

  /** The per-(sub) tables of one trained level; `dsub` maps a dim to
    * its subspace (kmeans is the m = 1 special case).
    */
  final case class CentroidTable(m: Int, dsub: Int,
                                 subs: Array[SubTable])

  /** Residual tables: per CELL, the rounded centroid (mu) and the
    * per-sub candidate tables over residual sums (zs).
    */
  final case class ResidualTable(
      m: Int, dsub: Int,
      cells: Map[Long, (Array[Long], Array[SubTable])])
      // cells(cell) = (mu by dim — dense up to max dim, Long.MinValue
      //                marks an absent dim; per-sub tables)

  private final val Scale = 33554432.0 // 2^25

  /** round-half-away-from-zero on the 2^25 grid (Spark round /
    * DuckDB round — NOT Math.round, which differs on negative ties).
    */
  def q(x: Double): Long =
    (if (x >= 0) math.floor(x * Scale + 0.5)
     else math.ceil(x * Scale - 0.5)).toLong

  /** Quantize a float/double array once per row. */
  def quantize(arr: ArrayData, isDouble: Boolean): Array[Long] = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = q(if (isDouble) arr.getDouble(i)
                 else arr.getFloat(i).toDouble)
      i += 1
    }
    out
  }

  def column(vec: Column, table: CentroidTable): Column =
    org.apache.spark.sql.GraftShims.column(PqArgmaxExpr(
      org.apache.spark.sql.GraftShims.expression(vec), table))

  def residualColumn(vec: Column, cell: Column,
                     table: ResidualTable): Column =
    org.apache.spark.sql.GraftShims.column(ResidualPqArgmaxExpr(
      org.apache.spark.sql.GraftShims.expression(vec),
      org.apache.spark.sql.GraftShims.expression(cell), table))
}

/** array<long> of `m` subspace labels for one vector (m = 1 for flat
  * kmeans). Null when the row has NO candidate in some subspace —
  * mirroring the join formulation, where such (id, sub) pairs simply
  * vanish from the assignment (callers treat a null array as
  * "unassigned", exactly like the missing join rows).
  */
case class PqArgmaxExpr(child: Expression,
                        table: LloydArgmaxExpr.CentroidTable)
    extends UnaryExpression {
  import LloydArgmaxExpr._

  override def prettyName: String = "lloyd_argmax"
  override def dataType: DataType = ArrayType(LongType, false)
  // can be null even for a non-null vector (no candidate label —
  // the join formulation's missing rows)
  override def nullable: Boolean = true

  private lazy val isDouble = child.dataType
    .asInstanceOf[ArrayType].elementType == DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(t, _)
          if t == DoubleType ||
            t == org.apache.spark.sql.types.FloatType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"lloyd_argmax expects array<float|" +
            s"double>, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    PqArgmaxExpr.assignOf(v.asInstanceOf[ArrayData], isDouble, table)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lloydTable", table,
      classOf[CentroidTable].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("lbl")
      s"""
      org.apache.spark.sql.catalyst.util.ArrayData $tmp =
        graft.functions.PqArgmaxExpr.assignOf($c, $isDouble, $ref);
      if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
      """
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqArgmaxExpr = copy(child = newChild)
}

object PqArgmaxExpr {
  import LloydArgmaxExpr._

  // NOT named `eval`: the case class inherits eval(InternalRow), and
  // a same-named companion method loses its static forwarder — the
  // generated code's static call then fails to compile and every row
  // falls back to interpreted evaluation
  def assignOf(arr: ArrayData, isDouble: Boolean,
           table: CentroidTable): ArrayData = {
    val qx = quantize(arr, isDouble)
    val out = new Array[Any](table.m)
    var s = 0
    while (s < table.m) {
      val t = table.subs(s)
      var bestLabel = Long.MinValue
      var bestScore = 0.0
      var any = false
      var l = 0
      while (l < t.labels.length) {
        val dot = dotOfPublic(qx, t.dims(l), t.cs(l))
        if (dot != null) {
          // score = dot/sqrt(s2): IEEE division, Inf/NaN on s2 = 0 —
          // identical to the plan's double arithmetic
          val sc = dot.doubleValue() / math.sqrt(t.s2(l))
          val better =
            if (!any) true
            else {
              val c = if (sc == bestScore) 0
                      else java.lang.Double.compare(sc, bestScore)
              c > 0 || (c == 0 && t.labels(l) < bestLabel)
            }
          if (better) { bestLabel = t.labels(l); bestScore = sc }
          any = true
        }
        l += 1
      }
      if (!any) return null // no candidate in this subspace
      out(s) = bestLabel
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Exact dot (long fast path, BigInteger fallback); null when no
    * table dim overlaps the row — the non-candidate marker.
    */
  def dotOfPublic(qx: Array[Long], dims: Array[Int],
                  cs: Array[Long]): java.math.BigInteger = {
    var acc = 0L
    var big: java.math.BigInteger = null
    var matched = false
    var i = 0
    while (i < dims.length) {
      val d = dims(i)
      if (d < qx.length) {
        matched = true
        val a = qx(d)
        val b = cs(i)
        if (big == null) {
          try acc = Math.addExact(acc, Math.multiplyExact(a, b))
          catch { case _: ArithmeticException =>
            big = java.math.BigInteger.valueOf(acc).add(
              java.math.BigInteger.valueOf(a).multiply(
                java.math.BigInteger.valueOf(b)))
          }
        } else
          big = big.add(java.math.BigInteger.valueOf(a).multiply(
            java.math.BigInteger.valueOf(b)))
      }
      i += 1
    }
    if (!matched) null
    else if (big != null) big
    else java.math.BigInteger.valueOf(acc)
  }
}

/** Residual-PQ in-row assignment: per subspace the argmax label over
  * the row's CELL's residual candidates, scoring
  * y = qx − mu(cell, dim) against zs with NULL score on s2 = 0
  * (desc_nulls_last, label-asc — an all-null subspace yields its
  * smallest candidate label). Null array when the cell is unknown or
  * some subspace has no candidate (mirrors missing join rows).
  */
case class ResidualPqArgmaxExpr(left: Expression, right: Expression,
                                table: LloydArgmaxExpr.ResidualTable)
    extends BinaryExpression {
  import LloydArgmaxExpr._

  override def prettyName: String = "lloyd_argmax_residual"
  override def dataType: DataType = ArrayType(LongType, false)
  // null on unknown cell / no candidate (the missing join rows)
  override def nullable: Boolean = true

  private lazy val isDouble = left.dataType
    .asInstanceOf[ArrayType].elementType == DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(t, _), LongType)
          if t == DoubleType ||
            t == org.apache.spark.sql.types.FloatType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure("lloyd_argmax_residual expects " +
            s"(array<float|double>, bigint), got ($l, $r)")
    }

  override def nullSafeEval(v: Any, c: Any): Any =
    ResidualPqArgmaxExpr.assignOf(v.asInstanceOf[ArrayData], isDouble,
      c.asInstanceOf[Long], table)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lloydResTable", table,
      classOf[ResidualTable].getName)
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val tmp = ctx.freshName("lbl")
      s"""
      org.apache.spark.sql.catalyst.util.ArrayData $tmp =
        graft.functions.ResidualPqArgmaxExpr.assignOf($v, $isDouble, $c, $ref);
      if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression)
      : ResidualPqArgmaxExpr = copy(left = newLeft, right = newRight)
}

object ResidualPqArgmaxExpr {
  import LloydArgmaxExpr._

  // see PqArgmaxExpr.assignOf on the naming
  def assignOf(arr: ArrayData, isDouble: Boolean, cell: Long,
           table: ResidualTable): ArrayData =
    table.cells.get(cell) match {
      case None => null
      case Some((mu, subs)) =>
        val qx = quantize(arr, isDouble)
        val out = new Array[Any](table.m)
        var s = 0
        while (s < table.m) {
          val t = subs(s)
          var bestLabel = Long.MinValue
          // bestNull tracks whether the current best has NULL score
          var bestNull = true
          var bestScore = 0.0
          var any = false
          var l = 0
          while (l < t.labels.length) {
            val dims = t.dims(l)
            val cs = t.cs(l)
            // y·zs with y = qx − mu, exact (long fast path)
            var acc = 0L
            var big: java.math.BigInteger = null
            var matched = false
            var i = 0
            while (i < dims.length) {
              val d = dims(i)
              if (d < qx.length && d < mu.length &&
                  mu(d) != Long.MinValue) {
                matched = true
                val y = qx(d) - mu(d)
                val b = cs(i)
                if (big == null) {
                  try acc = Math.addExact(acc,
                    Math.multiplyExact(y, b))
                  catch { case _: ArithmeticException =>
                    big = java.math.BigInteger.valueOf(acc).add(
                      java.math.BigInteger.valueOf(y).multiply(
                        java.math.BigInteger.valueOf(b)))
                  }
                } else
                  big = big.add(
                    java.math.BigInteger.valueOf(y).multiply(
                      java.math.BigInteger.valueOf(b)))
              }
              i += 1
            }
            if (matched) {
              val isNull = t.s2(l) == 0.0
              val sc =
                if (isNull) 0.0
                else {
                  val dot = if (big != null) big.doubleValue()
                            else acc.toDouble
                  dot / math.sqrt(t.s2(l))
                }
              val better =
                if (!any) true
                else if (bestNull) !isNull ||
                  t.labels(l) < bestLabel
                else if (isNull) false
                else {
                  val c = if (sc == bestScore) 0
                          else java.lang.Double.compare(sc, bestScore)
                  c > 0 || (c == 0 && t.labels(l) < bestLabel)
                }
              if (better) {
                bestLabel = t.labels(l); bestNull = isNull
                bestScore = sc
              }
              any = true
            }
            l += 1
          }
          if (!any) return null
          out(s) = bestLabel
          s += 1
        }
        new GenericArrayData(out)
    }
}
