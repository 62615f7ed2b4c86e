package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints (Schleimer, Wilkerson, Aiken,
  * SIGMOD'03 — the MOSS algorithm): ASCII-fold canon, Rabin–Karp
  * rolling hash of every char k-gram, monotonic-deque window minimum,
  * distinct+sort — the whole document in ONE O(n) JVM call, zero
  * explode, zero shuffle, inside whole-stage codegen.
  *
  * Exactly the arithmetic of the SQL oracle's Horner recurrence
  * (`h = (h·257 + ord(c)) mod (2^31-1)` per char): the rolling update
  * `h' = (h − c_out·257^{k-1})·257 + c_in` is congruent mod M and
  * reduced into [0, M) at every step, so the values are identical,
  * engine to engine, bit for bit.
  *
  * Canon = trim → lower → collapse `\s+` to one space → every char
  * outside `[a-z0-9 ]` becomes `_`, with the ORACLE ENGINE'S exact
  * semantics, not Java's: trim strips spaces ONLY (Java `trim` eats
  * every char ≤ U+0020), lowercase is the per-codepoint SIMPLE
  * Unicode mapping (`Character.toLowerCase(int)` — locale-free, 1:1,
  * matching utf8proc; Java `String.toLowerCase` is locale-sensitive
  * and 1:many, e.g. Turkish U+0130), and `\s` is RE2's
  * `[\t\n\f\r ]` (Java's adds \x0B). A text with a leading tab, a
  * vertical tab, or a non-ASCII uppercase char canons identically in
  * both engines — the single-byte output alphabet then keeps
  * `substr`/`ord` identical too. Documents with fewer than k+w-1
  * canon chars (no complete window) return an empty array.
  */
case class WinnowFpExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowFpExpr.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.WinnowFpExpr.compute($c, $k, $w);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFpExpr = copy(child = newChild)
}

object WinnowFpExpr {

  private val M = 2147483647L // 2^31-1, Mersenne prime
  private val B = 257L

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** The oracle-exact canon (see class doc): one pass over code
    * points — space-only trim, simple per-codepoint lowercase, RE2
    * whitespace collapse, `_` for everything outside `[a-z0-9 ]`.
    */
  def canon(s0: String): String = {
    var lo = 0
    var hi = s0.length
    while (lo < hi && s0.charAt(lo) == ' ') lo += 1
    while (hi > lo && s0.charAt(hi - 1) == ' ') hi -= 1
    val sb = new java.lang.StringBuilder(hi - lo)
    var pendingWs = false
    var i = lo
    while (i < hi) {
      val cp0 = s0.codePointAt(i)
      i += Character.charCount(cp0)
      val cp = Character.toLowerCase(cp0)
      if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\f' ||
          cp == '\r') {
        pendingWs = true
      } else {
        if (pendingWs) { sb.append(' '); pendingWs = false }
        if ((cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9'))
          sb.append(cp.toChar)
        else sb.append('_')
      }
    }
    if (pendingWs) sb.append(' ')
    sb.toString
  }

  def compute(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val t = canon(s.toString)
    val n = t.length
    if (n < k + w - 1) return Empty

    // B^{k-1} mod M, for rolling out the leading char
    var bk1 = 1L
    var e = 0
    while (e < k - 1) { bk1 = bk1 * B % M; e += 1 }

    val nh = n - k + 1
    val hs = new Array[Long](nh)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + t.charAt(i)) % M; i += 1 }
    hs(0) = h
    i = 1
    while (i < nh) {
      // subtract the outgoing char's term, shift, add the incoming;
      // floorMod keeps the intermediate in [0, M) despite the minus
      h = Math.floorMod(h - t.charAt(i - 1) * bk1 % M, M)
      h = (h * B + t.charAt(i + k - 1)) % M
      hs(i) = h
      i += 1
    }

    // window minima via monotonic deque of indices: O(nh) total
    val mins = new Array[Long](nh - w + 1)
    val deque = new Array[Int](nh)
    var head = 0
    var tail = 0 // [head, tail) holds indices with increasing hs
    i = 0
    while (i < nh) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) mins(i - w + 1) = hs(deque(head))
      i += 1
    }

    java.util.Arrays.sort(mins)
    var out = 0
    i = 0
    while (i < mins.length) { // in-place dedup of the sorted minima
      if (out == 0 || mins(out - 1) != mins(i)) {
        mins(out) = mins(i)
        out += 1
      }
      i += 1
    }
    val vals = new Array[Any](out)
    i = 0
    while (i < out) { vals(i) = mins(i); i += 1 }
    new GenericArrayData(vals)
  }

  def winnowNative(c: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.GraftShims.column(
      WinnowFpExpr(org.apache.spark.sql.GraftShims.expression(c), k, w))
}
