package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for POSITIONAL word-k-gram digests:
  * element i is the md5 hex of tokens i..i+k−1 joined by single
  * spaces — exactly `transform(sequence(0, size(l)−k), i ->
  * md5(concat_ws(' ', slice(l, i+1, k))))`, but ONE JVM call per row
  * instead of an interpreted lambda per position (NamedLambdaVariable
  * update + array slice + string concat + digest per element). The
  * repeated-substring family ([[graft.operators.Dedup.repeatedRuns]])
  * posexplodes this array, so the position IS the array index.
  *
  * The digest matches `md5(concat_ws(' ', …))` byte-for-byte (same
  * UTF-8 bytes in, same hex out), so the DuckDB oracle's
  * `md5(array_to_string(l[i:i+k-1], ' '))` stays bit-identical.
  */
case class PosShingleDigestsExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType)

  override def prettyName: String = "pos_shingle_digests"

  override def nullSafeEval(input: Any): Any =
    PosShingleDigestsExpr.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PosShingleDigestsExpr.compute($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): PosShingleDigestsExpr =
    copy(child = newChild)
}

object PosShingleDigestsExpr {

  private val hexDigits = "0123456789abcdef".toCharArray

  /** md5 hex digests of every k-gram window, by start position.
    * Empty array when the string has fewer than k tokens.
    */
  def compute(s: UTF8String, k: Int): GenericArrayData = {
    val toks = s.toString.trim.split("\\s+")
    if (toks.length < k || (toks.length == 1 && toks(0).isEmpty))
      return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder
    val out = new Array[Any](toks.length - k + 1)
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val digest = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = hexDigits((digest(b) >> 4) & 0xf)
        hex(2 * b + 1) = hexDigits(digest(b) & 0xf)
        b += 1
      }
      out(i) = UTF8String.fromString(new String(hex))
      i += 1
    }
    new GenericArrayData(out)
  }

  def posShingleDigests(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftShims.column(
      PosShingleDigestsExpr(
        org.apache.spark.sql.GraftShims.expression(c), k))
}
