package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Block-level HTML segmentation — the input to boilerplate removal
  * (the jusText/trafilatura family: navigation, footers and link
  * farms are short and link-dense; article prose is long and
  * link-sparse). The same shared [[HtmlWalker]] tokenizer as
  * [[HtmlTextExpr]] — this expression is just the block-accumulation
  * sink: text accumulates into BLOCKS split at block-level tag
  * boundaries (p/div/li/h1-h6/td/section/..., open or close);
  * inline tags (a/b/span/...) separate words without flushing.
  * Emits `array<struct<text string, n_chars int,
  * n_link_chars int>>` — one row per non-empty block, `n_chars` the
  * collapsed block length in CODE POINTS (== SQL `length(text)`,
  * including non-BMP), `n_link_chars` the code points appended while
  * inside one or more `<a>` elements (collapse spaces count toward
  * the stream they were appended in).
  *
  * Cross-expression law (fuzz-pinned, >10^4 cases): the block texts
  * joined with single spaces equal [[HtmlTextExpr]]'s `text` — and
  * since round 11's refactor both expressions share ONE walker, so
  * the law is structural, not just tested.
  *
  * The downstream content rule is the caller's; q172 uses the
  * integer jusText-style gate `n_chars >= 20 AND 2·n_link_chars <
  * n_chars`.
  */
case class HtmlBlocksExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_link_chars", IntegerType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "html_blocks"

  override def nullSafeEval(input: Any): Any =
    HtmlBlocksExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HtmlBlocksExpr.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): HtmlBlocksExpr = copy(child = newChild)
}

object HtmlBlocksExpr {

  def htmlBlocks(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      HtmlBlocksExpr(org.apache.spark.sql.GraftShims.expression(c)))

  private val BlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("p", "div", "br", "hr", "h1", "h2", "h3", "h4", "h5", "h6",
      "li", "ul", "ol", "dl", "dt", "dd", "td", "th", "tr", "table",
      "thead", "tbody", "tfoot", "section", "article", "header",
      "footer", "nav", "aside", "main", "blockquote", "pre", "form",
      "body", "html", "head", "center").foreach(s.add)
    s
  }

  /** The block sink over the shared walker. `n_chars` /
    * `n_link_chars` count CODE POINTS (tracked incrementally in
    * `push` — one per appended code point or collapse space), not
    * UTF-16 units, so they match SQL `length(text)` on non-BMP
    * input (an astral emoji is 1, not 2).
    */
  def compute(html: UTF8String): GenericArrayData = {
    val out = collection.mutable.ArrayBuffer.empty[InternalRow]
    val sink = new HtmlWalker.Sink {
      val block = new java.lang.StringBuilder
      var pend = false
      var chars = 0
      var linkChars = 0

      def flush(): Unit = {
        if (block.length > 0) {
          out += new GenericInternalRow(Array[Any](
            UTF8String.fromString(block.toString), chars,
            linkChars))
        }
        block.setLength(0)
        pend = false
        chars = 0
        linkChars = 0
      }

      override def push(cp: Int, inTitle: Boolean,
                        aDepth: Int): Unit =
        if (inTitle) () // title is not body content
        else if (HtmlWalker.isWs(cp)) pend = block.length > 0
        else {
          if (pend) {
            block.append(' ')
            chars += 1
            if (aDepth > 0) linkChars += 1
            pend = false
          }
          block.appendCodePoint(cp)
          chars += 1
          if (aDepth > 0) linkChars += 1
        }

      override def boundary(name: String, closing: Boolean,
                            isTag: Boolean,
                            inTitle: Boolean): Unit =
        if (isTag && BlockTags.contains(name)) flush()
        else if (!inTitle) pend = block.length > 0

      override def titleOpened(): Unit = ()
    }
    HtmlWalker.walk(html.toString, sink)
    sink.flush()
    new GenericArrayData(out.toArray[Any])
  }
}
