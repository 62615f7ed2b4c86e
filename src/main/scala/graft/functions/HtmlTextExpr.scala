package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML/markup text extraction — step zero of every web-corpus
  * pipeline (C4 and RefinedWeb both start from crawled markup, not
  * clean text; the reference never parses markup — it only detects
  * and rejects XML, `/root/reference/structa/source.py:147-203` —
  * so this is a beyond-reference pipeline operator). One native
  * codegen'd pass over the string (the ImageMetaExpr discipline:
  * NEVER throws, O(n) bounded work) that strips
  * tags/scripts/styles/comments, decodes entities, and emits
  * `struct<text string, title string, n_links int,
  * n_paragraphs int>`. All structural rules live in the shared
  * [[HtmlWalker]] (one tokenizer for this and [[HtmlBlocksExpr]]);
  * this expression is just the flat-text accumulation sink.
  *
  * Extraction rules (deterministic, spec- and oracle-pinned):
  *   - every markup construct (tag, comment, doctype/PI, a whole
  *     script/style element) acts as ONE whitespace separator in the
  *     text; whitespace runs collapse to single spaces; leading and
  *     trailing whitespace is trimmed. U+00A0 (from `&nbsp;`)
  *     collapses like ASCII whitespace.
  *   - `<script>`/`<style>` elements are raw text: their content is
  *     dropped wholesale up to the matching case-insensitive close
  *     tag (markup inside them is NOT parsed, so a `<p>` in
  *     JavaScript never counts).
  *   - `<title>` is RCDATA: its content (entities decoded, tags not
  *     parsed) accumulates into `title`, never into `text`; a
  *     document with no title element reports NULL. Multiple title
  *     elements concatenate.
  *   - `n_links` counts `<a` open tags, `n_paragraphs` counts `<p`
  *     open tags (exact tag-name match, ASCII case-insensitive) —
  *     including inside attributes-broken markup, excluding inside
  *     comments and raw-text elements.
  *   - entities in text/title decode: the named set
  *     amp/lt/gt/quot/apos/nbsp, decimal `&#NNN;` (≤ 7 digits) and
  *     hex `&#xHHHH;` (≤ 6 digits); out-of-range/surrogate code
  *     points become U+FFFD; anything else stays literal. Entities
  *     inside attribute values are skipped with the attribute.
  *   - `<` not followed by an ASCII letter, `/`, `!` or `?` is
  *     literal text (the HTML5 tokenizer rule); attribute values in
  *     quotes may contain `>` without closing the tag.
  *   - unterminated constructs (no closing `>`, no `-->`, no close
  *     tag for script/style) silently end at end-of-input — never
  *     an error, matching the never-throw contract.
  */
case class HtmlTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("title", StringType, nullable = true),
    StructField("n_links", IntegerType, nullable = false),
    StructField("n_paragraphs", IntegerType, nullable = false)))

  override def prettyName: String = "html_extract"

  override def nullSafeEval(input: Any): Any =
    HtmlTextExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HtmlTextExpr.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): HtmlTextExpr = copy(child = newChild)
}

object HtmlTextExpr {

  def htmlExtract(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      HtmlTextExpr(org.apache.spark.sql.GraftShims.expression(c)))

  /** The flat-text sink over the shared walker; always returns a
    * row (null only via the null-input short-circuit in the
    * expression wrapper).
    */
  def compute(html: UTF8String): InternalRow = {
    val sink = new HtmlWalker.Sink {
      val text = new java.lang.StringBuilder
      val title = new java.lang.StringBuilder
      var textPend = false
      var titlePend = false
      var hasTitle = false
      var nLinks = 0
      var nParas = 0

      override def push(cp: Int, inTitle: Boolean,
                        aDepth: Int): Unit =
        if (inTitle) {
          if (HtmlWalker.isWs(cp)) titlePend = title.length > 0
          else {
            if (titlePend) { title.append(' '); titlePend = false }
            title.appendCodePoint(cp)
          }
        } else {
          if (HtmlWalker.isWs(cp)) textPend = text.length > 0
          else {
            if (textPend) { text.append(' '); textPend = false }
            text.appendCodePoint(cp)
          }
        }

      // a consumed markup construct separates words in the TEXT
      // stream (never the title's — RCDATA has no parsed tags)
      override def boundary(name: String, closing: Boolean,
                            isTag: Boolean,
                            inTitle: Boolean): Unit = {
        if (isTag && !closing) {
          if (name == "a") nLinks += 1
          else if (name == "p") nParas += 1
        }
        if (!inTitle) textPend = text.length > 0
      }

      override def titleOpened(): Unit = hasTitle = true
    }
    HtmlWalker.walk(html.toString, sink)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sink.text.toString),
      if (sink.hasTitle) UTF8String.fromString(sink.title.toString)
      else null,
      sink.nLinks, sink.nParas))
  }
}
