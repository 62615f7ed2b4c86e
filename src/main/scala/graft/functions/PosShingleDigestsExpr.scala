package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for POSITIONAL word-k-gram digests over
  * a TOKEN ARRAY: element i is the md5 hex of tokens i..i+k−1 joined
  * by single spaces — exactly `transform(sequence(0, size(l)−k),
  * i -> md5(concat_ws(' ', slice(l, i+1, k))))`, but ONE JVM call per
  * row instead of an interpreted lambda per position
  * (NamedLambdaVariable update + array slice + string concat +
  * digest per element).
  *
  * Taking the ARRAY (not raw text) matters for correctness, not just
  * API shape: the repeated-substring family pairs these digests with
  * token POSITIONS from the same `TextFunctions.tokens` array
  * ([[graft.operators.Dedup.removeRepeatedRuns]]), so both views
  * must share ONE tokenization. A raw-text variant re-tokenizing
  * with Java `String.trim` would disagree with Spark's space-only
  * `trim` on text edged with tabs/newlines and shift every position.
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
    PosShingleDigestsExpr.compute(input.asInstanceOf[ArrayData], k)

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
  private val space = Array[Byte](' ')

  /** md5 hex digests of every k-gram window of the token array, by
    * start position. Empty array when there are fewer than k tokens;
    * null tokens are skipped along with their separator — exactly
    * `concat_ws`'s convention (token arrays from `split` never carry
    * nulls, but the expression must match the documented lambda on
    * any input).
    */
  def compute(arr: ArrayData, k: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val bytes = new Array[Array[Byte]](n)
    var t = 0
    while (t < n) {
      bytes(t) =
        if (arr.isNullAt(t)) null else arr.getUTF8String(t).getBytes
      t += 1
    }
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      md.reset()
      var j = 0
      var wrote = false
      while (j < k) {
        val b = bytes(i + j)
        if (b != null) {
          if (wrote) md.update(space)
          md.update(b)
          wrote = true
        }
        j += 1
      }
      val digest = md.digest()
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

  def posShingleDigests(tokens: Column, k: Int): Column =
    org.apache.spark.sql.GraftShims.column(
      PosShingleDigestsExpr(
        org.apache.spark.sql.GraftShims.expression(tokens), k))
}
