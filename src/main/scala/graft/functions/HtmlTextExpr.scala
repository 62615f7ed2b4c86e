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
  * NEVER throws, O(n) bounded work, no allocation beyond the output
  * builders) that strips tags/scripts/styles/comments, decodes
  * entities, and emits `struct<text string, title string,
  * n_links int, n_paragraphs int>`.
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

  private def isLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def isNameChar(c: Char): Boolean =
    isLetter(c) || (c >= '0' && c <= '9')

  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' ||
      cp == '\f' || cp == 0x0b || cp == 0xa0

  /** One bounded pass; always returns a row (null only via the null
    * input short-circuit in the expression wrapper).
    */
  def compute(html: UTF8String): InternalRow = {
    val s = html.toString
    val n = s.length
    val text = new java.lang.StringBuilder
    val title = new java.lang.StringBuilder
    var textPend = false
    var titlePend = false
    var hasTitle = false
    var inTitle = false
    var rawEnd: String = null // "script" | "style" while inside one
    var nLinks = 0
    var nParas = 0
    var i = 0

    def pushCp(cp: Int): Unit =
      if (inTitle) {
        if (isWs(cp)) titlePend = title.length > 0
        else {
          if (titlePend) { title.append(' '); titlePend = false }
          title.appendCodePoint(cp)
        }
      } else {
        if (isWs(cp)) textPend = text.length > 0
        else {
          if (textPend) { text.append(' '); textPend = false }
          text.appendCodePoint(cp)
        }
      }

    // a consumed markup construct separates words in the TEXT stream
    def sep(): Unit = if (!inTitle) textPend = text.length > 0

    // case-insensitive ASCII region match of `what` at s[at..)
    def matches(at: Int, what: String): Boolean = {
      if (at + what.length > n) return false
      var k = 0
      while (k < what.length) {
        val a = s.charAt(at + k)
        val lo = if (a >= 'A' && a <= 'Z') (a + 32).toChar else a
        if (lo != what.charAt(k)) return false
        k += 1
      }
      true
    }

    // decode the entity at s(i)=='&'; push its value (or the literal
    // '&' when malformed) and return the next index
    def entity(at: Int): Int = {
      var j = at + 1
      if (j < n && s.charAt(j) == '#') {
        j += 1
        val hex = j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')
        if (hex) j += 1
        val start = j
        val maxDigits = if (hex) 6 else 7
        var cp = 0L
        while (j < n && j - start < maxDigits && {
          val c = s.charAt(j)
          if (hex)
            (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
              (c >= 'A' && c <= 'F')
          else c >= '0' && c <= '9'
        }) {
          val c = s.charAt(j)
          val d =
            if (c <= '9') c - '0'
            else if (c <= 'F') c - 'A' + 10
            else c - 'a' + 10
          cp = cp * (if (hex) 16 else 10) + d
          j += 1
        }
        if (j > start && j < n && s.charAt(j) == ';') {
          val v =
            if (cp >= 1 && cp <= 0x10ffff &&
                !(cp >= 0xd800 && cp <= 0xdfff)) cp.toInt
            else 0xfffd
          pushCp(v)
          j + 1
        } else { pushCp('&'); at + 1 }
      } else {
        val start = j
        while (j < n && j - start < 8 && isLetter(s.charAt(j))) j += 1
        if (j < n && s.charAt(j) == ';') {
          val name = s.substring(start, j)
          val cp = name match {
            case "amp" => '&'.toInt
            case "lt" => '<'.toInt
            case "gt" => '>'.toInt
            case "quot" => '"'.toInt
            case "apos" => '\''.toInt
            case "nbsp" => 0xa0
            case _ => -1
          }
          if (cp >= 0) { pushCp(cp); j + 1 }
          else { pushCp('&'); at + 1 }
        } else { pushCp('&'); at + 1 }
      }
    }

    while (i < n) {
      val c = s.charAt(i)
      if (rawEnd != null) {
        // raw text: only the matching close tag gets us out
        if (c == '<' && i + 1 < n && s.charAt(i + 1) == '/' &&
            matches(i + 2, rawEnd) &&
            (i + 2 + rawEnd.length >= n ||
              !isNameChar(s.charAt(i + 2 + rawEnd.length)))) {
          var j = i + 2 + rawEnd.length
          while (j < n && s.charAt(j) != '>') j += 1
          i = if (j < n) j + 1 else n
          rawEnd = null
          sep()
        } else i += 1
      } else if (inTitle) {
        // RCDATA: entities decode, only </title ends the element
        if (c == '<' && i + 1 < n && s.charAt(i + 1) == '/' &&
            matches(i + 2, "title") &&
            (i + 7 >= n || !isNameChar(s.charAt(i + 7)))) {
          var j = i + 7
          while (j < n && s.charAt(j) != '>') j += 1
          i = if (j < n) j + 1 else n
          inTitle = false
          sep()
        } else if (c == '&') i = entity(i)
        else { pushCp(c); i += 1 }
      } else if (c == '<') {
        if (i + 1 >= n) { pushCp('<'); i += 1 }
        else {
          val d = s.charAt(i + 1)
          if (d == '!') {
            if (i + 3 < n && s.charAt(i + 2) == '-' &&
                s.charAt(i + 3) == '-') {
              val e = s.indexOf("-->", i + 4)
              i = if (e < 0) n else e + 3
            } else {
              val e = s.indexOf('>', i + 2)
              i = if (e < 0) n else e + 1
            }
            sep()
          } else if (d == '?') {
            val e = s.indexOf('>', i + 2)
            i = if (e < 0) n else e + 1
            sep()
          } else if (d == '/' || isLetter(d)) {
            val closing = d == '/'
            var j = if (closing) i + 2 else i + 1
            val nameStart = j
            while (j < n && isNameChar(s.charAt(j))) j += 1
            val nameLen = j - nameStart
            def tagIs(t: String): Boolean =
              nameLen == t.length && matches(nameStart, t)
            // attribute scan: quoted values may contain '>'
            var q: Char = 0
            while (j < n && (q != 0 || s.charAt(j) != '>')) {
              val cj = s.charAt(j)
              if (q != 0) { if (cj == q) q = 0 }
              else if (cj == '"' || cj == '\'') q = cj
              j += 1
            }
            i = if (j < n) j + 1 else n
            if (!closing) {
              if (tagIs("script")) rawEnd = "script"
              else if (tagIs("style")) rawEnd = "style"
              else if (tagIs("title")) { inTitle = true; hasTitle = true }
              else if (tagIs("a")) nLinks += 1
              else if (tagIs("p")) nParas += 1
            }
            sep()
          } else { pushCp('<'); i += 1 }
        }
      } else if (c == '&') i = entity(i)
      else { pushCp(c); i += 1 }
    }

    new GenericInternalRow(Array[Any](
      UTF8String.fromString(text.toString),
      if (hasTitle) UTF8String.fromString(title.toString) else null,
      nLinks, nParas))
  }
}
