package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document word n-gram repetition summary — the building block
  * of Gopher/C4-style repetition quality filters ("fraction of
  * characters/tokens in the most common n-gram"): returns
  * struct(n, top) where `n` is the number of word k-grams in the
  * document and `top` the occurrence count of the most frequent one.
  *
  * Per-document repetition is inherently row-local, so the whole
  * computation is ONE JVM call per row (tokenize, count grams in a
  * hash map, take the max) — a pure map-side projection with no
  * explode, no shuffle, and nothing corpus-wide. A filter like
  * `top·5 > n` (top-2-gram fraction > 20%) stays in integers and is
  * exactly portable to a SQL oracle.
  */
case class TopNGramExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def prettyName: String = "top_ngram"

  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("top", IntegerType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    TopNGramExpr.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TopNGramExpr.compute($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): TopNGramExpr = copy(child = newChild)
}

object TopNGramExpr {

  def compute(s: UTF8String, k: Int): InternalRow = {
    val toks = s.toString.trim.split("\\s+")
    if (toks.length < k || (toks.length == 1 && toks(0).isEmpty))
      return InternalRow(0, 0)
    val n = toks.length - k + 1
    val counts = new java.util.HashMap[String, Int](math.max(16, n))
    val sb = new java.lang.StringBuilder
    var top = 0
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val c = counts.merge(sb.toString, 1, Integer.sum)
      if (c > top) top = c
      i += 1
    }
    InternalRow(n, top)
  }

  def topNGramNative(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftShims.column(
      TopNGramExpr(org.apache.spark.sql.GraftShims.expression(c), k))
}
