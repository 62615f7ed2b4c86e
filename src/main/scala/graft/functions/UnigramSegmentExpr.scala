package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM word segmentation (the SentencePiece/Kudo-2018 family's
  * inference step, ACL 2018): Viterbi-optimal split of a word into
  * vocabulary pieces minimizing the total integer code length. The
  * DP carries sequential state per position (best cost + back
  * pointer), so it is a native expression — unrolling it as column
  * arithmetic would re-embed the word once per position (the
  * Bpe.encode round-9 lesson).
  *
  * Exactness: piece costs are precomputed INTEGERS (whole-bit code
  * lengths packed as `bits·64 + 1`, see graft.operators.Unigram), so
  * the minimal objective is a pure integer min-plus fold a second
  * engine replays exactly; the objective encodes the piece count in
  * its low 6 bits (a word never splits into ≥ 64 pieces because
  * `maxWordLen ≤ 60`), making `(bits, pieces)` of the optimum unique
  * even when multiple splits achieve it.
  *
  * Tie-break (affects only the returned SPLIT, never the objective):
  * at each position the shortest winning piece is kept (`k`
  * ascending, strict improvement) — canonical and spec-pinned.
  *
  * Returns `struct<obj bigint, pieces array<string>>`; NULL for the
  * empty word, a word longer than `maxWordLen` code points, or a
  * word no vocabulary path covers. Operates on CODE POINTS (UTF-16
  * `charAt` would halve supplementary-plane characters — the q107
  * surrogate-pair rule).
  */
case class UnigramSegmentExpr(child: Expression,
                              vocab: Map[String, Long],
                              maxPieceLen: Int,
                              maxWordLen: Int)
    extends UnaryExpression {

  require(maxPieceLen >= 1 && maxPieceLen <= 16,
    s"maxPieceLen in [1,16]: $maxPieceLen")
  require(maxWordLen >= 1 && maxWordLen <= 60,
    s"maxWordLen in [1,60] (the objective packs the piece count " +
      s"into 6 bits): $maxWordLen")

  override def dataType: DataType = StructType(Seq(
    StructField("obj", LongType, nullable = false),
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false)))

  override def nullable: Boolean = true

  override def prettyName: String = "unigram_segment"

  @transient private lazy val table
      : java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](
      vocab.size * 2)
    vocab.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    UnigramSegmentExpr.compute(input.asInstanceOf[UTF8String],
      table, maxPieceLen, maxWordLen)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("unigramVocab", table,
      "java.util.HashMap<String, java.lang.Long>")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.UnigramSegmentExpr.compute(
         |  $c, $tableRef, $maxPieceLen, $maxWordLen);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramSegmentExpr = copy(child = newChild)
}

object UnigramSegmentExpr {

  /** Viterbi over code-point positions: `best(i)` = minimal packed
    * objective covering the first `i` code points; O(n · maxPieceLen)
    * map probes per word.
    */
  def compute(word: UTF8String,
              vocab: java.util.HashMap[String, java.lang.Long],
              maxPieceLen: Int, maxWordLen: Int): InternalRow = {
    val cps = word.toString.codePoints().toArray
    val n = cps.length
    if (n == 0 || n > maxWordLen) return null
    val INF = Long.MaxValue
    val best = Array.fill(n + 1)(INF)
    val back = new Array[Int](n + 1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      val kMax = math.min(maxPieceLen, i)
      var k = 1
      while (k <= kMax) {
        val prev = best(i - k)
        if (prev != INF) {
          val cost = vocab.get(new String(cps, i - k, k))
          if (cost != null && prev + cost < best(i)) {
            best(i) = prev + cost
            back(i) = k
          }
        }
        k += 1
      }
      i += 1
    }
    if (best(n) == INF) return null
    var nPieces = 0
    var j = n
    while (j > 0) { nPieces += 1; j -= back(j) }
    val pieces = new Array[Any](nPieces)
    j = n
    var p = nPieces - 1
    while (j > 0) {
      val k = back(j)
      pieces(p) = UTF8String.fromString(new String(cps, j - k, k))
      p -= 1
      j -= k
    }
    new GenericInternalRow(Array[Any](best(n),
      new GenericArrayData(pieces)))
  }
}
