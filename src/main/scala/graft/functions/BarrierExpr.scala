package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.DataType

/** A predicate-pushdown barrier: the identity function on its child,
  * REPORTED as non-deterministic.
  *
  * Why it exists (guide §7.2 "duplicated subtrees"): the optimizer
  * pushes a filter through a Project by re-inlining the projected
  * expression into the filter condition. When the projected column is
  * EXPENSIVE (a multi-pass regex redaction, a tokenize feeding a
  * higher-order lambda whose references each re-evaluate their
  * subtree), the pushed-down filter re-computes the whole expression
  * per row — and the projection above then computes it AGAIN for every
  * surviving row. Measured on q105: the `ntok >= 20` filter inlined
  * the full 4-pattern redaction + tokenization below the projection,
  * doubling the hottest per-row work; on q119 the pushed filter
  * re-inlined the document `split` into every lambda reference.
  *
  * `PushPredicateThroughNonJoin` only pushes a filter through a
  * Project whose fields are ALL deterministic, so wrapping the one
  * expensive column in this no-op keeps the filter ABOVE the
  * projection — each row pays the expression exactly once. The child
  * IS deterministic in reality (the report is conservative, merely
  * disabling reorder/duplication), so retried tasks recompute
  * identical values and no correctness property is affected.
  *
  * Use it ONLY on a projection consumed by a filter on that column;
  * non-deterministic expressions are rejected by the analyzer in
  * aggregates/joins/sorts.
  */
case class PushdownBarrierExpr(child: Expression)
    extends UnaryExpression {

  override def prettyName: String = "pushdown_barrier"

  override def dataType: DataType = child.dataType

  // the entire point: report non-determinism so no filter is pushed
  // below (and no optimizer rule duplicates) this expression
  override lazy val deterministic: Boolean = false

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(
      newChild: Expression): PushdownBarrierExpr =
    copy(child = newChild)
}

object PushdownBarrierExpr {
  def barrier(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(PushdownBarrierExpr(
      org.apache.spark.sql.GraftShims.expression(c)))
}
