package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature over word-k-gram shingles: the whole
  * `4·salts`-hash signature computed in ONE JVM call per document —
  * shingle, hash, and min-fold all map-side with zero explode and zero
  * shuffle. Replaces the previous explode → md5 → groupBy(id) shape
  * (one shuffle of every shingle row) AND widens the family from 4
  * hashes (far too flat a collision curve to separate 0.8-Jaccard
  * near-dups from noise) to 64+.
  *
  * Hash family: salted digests — `md5(shingle + "#" + j)` for salt
  * j ∈ [0, salts); each digest's four 8-hex-char slices are
  * independent uniform 32-bit values, so hash i = slice (i mod 4) of
  * salt (i div 4). The exact same strings are computable in ANSI SQL
  * (`substr(md5(s || '#j'), 1+8·slice, 8)`), which is what makes the
  * DuckDB oracle byte-identical.
  *
  * Returns `array<string>` of length `4·salts`, or null when the
  * document has fewer than k tokens (no shingles) — the null
  * propagates into LSH band keys and is filtered there, keeping short
  * docs out of candidate generation exactly like the previous
  * left-join-null design.
  */
case class MinHashExpr(child: Expression, k: Int, salts: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = true
  override def prettyName: String = "min_hash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashExpr.compute(input.asInstanceOf[UTF8String], k, salts)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.MinHashExpr.compute($c, $k, $salts);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): MinHashExpr = copy(child = newChild)
}

object MinHashExpr {

  private val md5Local =
    ThreadLocal.withInitial[MessageDigest](() =>
      MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".toCharArray

  private def md5Hex(md: MessageDigest, s: String): Array[Char] = {
    md.reset()
    val bytes = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val hex = new Array[Char](32)
    var i = 0
    while (i < 16) {
      hex(2 * i) = HexChars((bytes(i) >> 4) & 0xf)
      hex(2 * i + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    hex
  }

  /** Full signature: min of each hash slice across distinct shingles;
    * null when the text yields no shingles.
    */
  def compute(s: UTF8String, k: Int, salts: Int): GenericArrayData = {
    val toks = s.toString.trim.split("\\s+")
    if (toks.length < k || (toks.length == 1 && toks(0).isEmpty))
      return null
    val md = md5Local.get()
    val mins = new Array[String](salts * 4)
    // min over a multiset equals min over the set, but dedup skips
    // redundant hashing for repeated shingles
    val seen = new java.util.HashSet[String](
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
      val shingle = sb.toString
      if (seen.add(shingle)) {
        var salt = 0
        while (salt < salts) {
          val hex = md5Hex(md, shingle + "#" + salt)
          var slice = 0
          while (slice < 4) {
            val cand = new String(hex, slice * 8, 8)
            val idx = salt * 4 + slice
            if (mins(idx) == null || cand.compareTo(mins(idx)) < 0)
              mins(idx) = cand
            slice += 1
          }
          salt += 1
        }
      }
      i += 1
    }
    new GenericArrayData(
      mins.map(UTF8String.fromString(_): Any))
  }

  def minHashNative(c: Column, k: Int, salts: Int): Column =
    org.apache.spark.sql.GraftShims.column(
      MinHashExpr(org.apache.spark.sql.GraftShims.expression(c), k,
        salts))
}
