package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for distinct word-k-gram shingles.
  *
  * The array-lambda formulation (`transform`/`sequence` higher-order
  * functions) is interpreted per element — NamedLambdaVariable updates
  * and boxing per token; this expression does the whole computation in
  * one JVM call per row (whitespace-split, sliding join, hash-set
  * dedup), generated inline via a static helper call. Map-side, no
  * shuffle — the cluster-scale counterpart of the window-lead
  * formulation in [[graft.operators.Dedup.shingleRows]].
  */
case class WordShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType)

  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShinglesExpr.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShinglesExpr.compute($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): WordShinglesExpr = copy(child = newChild)
}

object WordShinglesExpr {

  /** Distinct k-gram shingles of a whitespace-tokenized string. */
  def compute(s: UTF8String, k: Int): GenericArrayData = {
    val toks = s.toString.trim.split("\\s+")
    if (toks.length < k || (toks.length == 1 && toks(0).isEmpty))
      return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](
      math.max(16, toks.length - k + 1))
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) {
      out(n) = UTF8String.fromString(it.next()); n += 1
    }
    new GenericArrayData(out)
  }

  def wordShinglesNative(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftShims.column(
      WordShinglesExpr(org.apache.spark.sql.GraftShims.expression(c), k))
}
