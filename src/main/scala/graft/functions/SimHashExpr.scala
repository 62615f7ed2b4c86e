package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 32-bit SimHash over whitespace tokens: the whole signature
  * in ONE JVM call per document — tokenize, hash each token, accumulate
  * the per-bit ±1 sums, take signs. A pure map-side projection
  * replacing the previous explode → groupBy(id) shape, which shuffled
  * every token row through 32 sum aggregates.
  *
  * The token hash is the first 4 bytes of md5 read big-endian — the
  * same 32-bit value as `CAST('0x' || substr(md5(tok), 1, 8) AS
  * BIGINT)` in the DuckDB oracle, so q27's SQL oracle is unchanged.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashExpr.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): SimHashExpr = copy(child = newChild)
}

object SimHashExpr {

  private val md5Local =
    ThreadLocal.withInitial[MessageDigest](() =>
      MessageDigest.getInstance("MD5"))

  def compute(s: UTF8String): Long = {
    // split(trim, "\s+") of an empty string yields one empty token,
    // matching both the previous explode form and the oracle's
    // regexp_split_to_array
    val toks = s.toString.trim.split("\\s+")
    val md = md5Local.get()
    val sums = new Array[Int](32)
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(toks(i).getBytes(StandardCharsets.UTF_8))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var b = 0
      while (b < 32) {
        sums(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 32) {
      if (sums(b) > 0) sim |= 1L << b
      b += 1
    }
    sim
  }

  def simHashNative(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      SimHashExpr(org.apache.spark.sql.GraftShims.expression(c)))
}
