package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native random-hyperplane LSH sign pattern: the full
  * [[LshSignExpr.MaxBits]]-bit signature in one JVM call per row.
  *
  * Hyperplane family: w(i,j) ∈ {+1,−1} is the top bit of
  * `md5("i:j")` (1-based position i, bit j) — a deterministic,
  * engine-portable stand-in for a seeded Gaussian matrix. Bit j of the
  * pattern is the sign of `Σ_i w(i,j)·round(x_i·2^25)` — exact integer
  * sums of the same 2^25 quantization as [[DotQExpr]], so the DuckDB
  * oracle reproduces the pattern bit-for-bit via
  * `CASE WHEN substr(md5(i || ':j'), 1, 1) BETWEEN '0' AND '7'
  * THEN x ELSE -x END` sums.
  *
  * Callers mask the pattern down to the bucket width they need
  * (`pattern & (2^bits − 1)`), which is how the bucket count scales
  * with n instead of being a constant: deriving `bits` is a driver-side
  * integer computation ([[graft.operators.Similarity.bitsForCount]]).
  */
case class LshSignExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"lsh_sign expects array<float|double>, got $other")
    }

  override def prettyName: String = "lsh_sign"

  private def isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(input: Any): Any =
    LshSignExpr.compute(input.asInstanceOf[ArrayData], isDouble)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshSignExpr.compute($c, $isDouble)")

  override protected def withNewChildInternal(
      newChild: Expression): LshSignExpr = copy(child = newChild)
}

object LshSignExpr {

  /** Width of the precomputed sign family; buckets use a ≤-wide mask.
    * 32 bits → up to 4.3G buckets, enough for the n ≤ 128·2^32 ≈
    * 5.5×10^11-row ladder before the width caps — true 100 TB doc
    * counts (~10^10-10^11 docs) stay inside the ladder. Bit 31 uses
    * the Int sign bit; consumers mask via a LONG (unsigned-32 view),
    * see [[graft.operators.Similarity.lshBucket]].
    */
  final val MaxBits = 32

  private final val Scale = 33554432.0 // 2^25

  /** round-half-away-from-zero (Spark round / DuckDB round). */
  private def q(x: Double): Long =
    (if (x >= 0) math.floor(x * Scale + 0.5)
     else math.ceil(x * Scale - 0.5)).toLong

  // dim → flattened (i,j) sign matrix; tiny (dim × 16 bytes), computed
  // once per executor per dimension
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Byte]]()

  private[graft] def signs(dim: Int): Array[Byte] =
    signCache.computeIfAbsent(dim, d => {
      val md = MessageDigest.getInstance("MD5")
      val arr = new Array[Byte](d * MaxBits)
      var i = 1
      while (i <= d) {
        var j = 0
        while (j < MaxBits) {
          md.reset()
          val h = md.digest(s"$i:$j".getBytes(StandardCharsets.UTF_8))
          // first hex digit in 0-7  ⟺  top bit of first byte is 0
          arr((i - 1) * MaxBits + j) =
            if ((h(0) & 0x80) == 0) 1 else -1
          j += 1
        }
        i += 1
      }
      arr
    })

  def compute(a: ArrayData, isDouble: Boolean): Int = {
    val n = a.numElements()
    val w = signs(n)
    val sums = new Array[Long](MaxBits)
    var i = 0
    while (i < n) {
      val x = if (isDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val qx = q(x)
      val off = i * MaxBits
      var j = 0
      while (j < MaxBits) {
        sums(j) += w(off + j) * qx
        j += 1
      }
      i += 1
    }
    var pattern = 0
    var j = 0
    while (j < MaxBits) {
      if (sums(j) > 0) pattern |= 1 << j
      j += 1
    }
    pattern
  }

  def lshSignNative(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      LshSignExpr(org.apache.spark.sql.GraftShims.expression(c)))
}
