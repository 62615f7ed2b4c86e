package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The [[TextFunctions.redactPii]] fold as ONE expression: the four
  * category patterns applied sequentially (emails → SSNs → IPv4 →
  * phones, the most-specific-first order the oracle nests), each
  * replacing ALL non-overlapping matches with its tag — exactly the
  * nested `regexp_replace` spelling, same java.util.regex engine,
  * same pass order, byte-identical output (RedactPiiSpec pins the
  * equivalence on adversarial overlap fixtures).
  *
  * Why native instead of four stacked `regexp_replace` nodes: the
  * stack pays a UTF8String→String→UTF8String round trip plus a
  * StringBuilder copy PER PASS even when a pass matches nothing (the
  * overwhelmingly common case), and as a 4-node subtree it is what
  * the optimizer re-inlines into pushed-down filters (see q105 —
  * every row paid the whole chain twice). Here the string converts
  * once, each pass first runs a cheap `find()` and SKIPS the copy
  * when nothing matched, and the single node is cheap to reference.
  * Patterns compile once per expression instance (executor-side,
  * at first use).
  */
case class RedactPiiExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "redact_pii"

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"redact_pii expects string, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(
      RedactPiiExpr.redact(s.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(" +
        s"graft.functions.RedactPiiExpr.redact($c.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): RedactPiiExpr = copy(child = newChild)
}

object RedactPiiExpr {

  /** (compiled pattern, replacement tag) in application order —
    * compiled from the SAME literals as [[TextFunctions.PiiPatterns]]
    * / [[TextFunctions.PiiRedactOrder]], so the two spellings cannot
    * drift.
    */
  private lazy val passes: Array[(Pattern, String)] = {
    val pats = TextFunctions.PiiPatterns.toMap
    TextFunctions.PiiRedactOrder.map(name =>
      (Pattern.compile(pats(name)), TextFunctions.PiiTags(name)))
      .toArray
  }

  /** The sequential fold. Each pass replicates
    * `regexp_replace(s, pat, tag)` exactly: leftmost non-overlapping
    * matches, continue from each match end (java.util.regex Matcher
    * semantics — the very engine Spark's RegExpReplace runs). The
    * tags contain no `\` or `$`, so literal appends are identical to
    * appendReplacement's template expansion.
    */
  def redact(s0: String): String = {
    var s = s0
    var i = 0
    while (i < passes.length) {
      val (p, tag) = passes(i)
      val m = p.matcher(s)
      if (m.find()) {
        val sb = new java.lang.StringBuilder(s.length)
        var last = 0
        do {
          sb.append(s, last, m.start()).append(tag)
          last = m.end()
        } while (m.find())
        sb.append(s, last, s.length)
        s = sb.toString
      }
      i += 1
    }
    s
  }

  def redactNative(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(RedactPiiExpr(
      org.apache.spark.sql.GraftShims.expression(c)))
}
