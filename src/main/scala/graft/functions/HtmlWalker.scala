package graft.functions

/** The ONE HTML tokenizer behind [[HtmlTextExpr]] and
  * [[HtmlBlocksExpr]] — a single bounded never-throwing pass that
  * owns every structural rule (tag/attr parsing with quote-aware
  * `>`, script/style raw text, RCDATA title, comments/doctype/PI,
  * entity decoding, literal `<`, anchor depth), and feeds a
  * [[HtmlWalker.Sink]] that owns only ACCUMULATION (which stream a
  * character lands in, what a tag boundary does). The two
  * expressions previously carried twin state machines; the walker
  * makes drift structurally impossible (and the cross-expression
  * law in HtmlBlocksSpec keeps fuzzing the composition anyway).
  */
object HtmlWalker {

  /** Accumulation callbacks. `push` receives every decoded text
    * code point with the structural context (title membership,
    * anchor depth); `boundary` fires once per consumed markup
    * construct (tag, comment, doctype/PI, raw-text element close)
    * with the lowercase tag name for open/close tags ("" for
    * non-tag constructs) — sinks use it for word separation, block
    * flushes and link/paragraph counting.
    */
  trait Sink {
    def push(cp: Int, inTitle: Boolean, aDepth: Int): Unit
    def boundary(name: String, closing: Boolean, isTag: Boolean,
                 inTitle: Boolean): Unit
    def titleOpened(): Unit
  }

  private def isLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def isNameChar(c: Char): Boolean =
    isLetter(c) || (c >= '0' && c <= '9')

  def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' ||
      cp == '\f' || cp == 0x0b || cp == 0xa0

  /** One pass over `s`, never throws, O(n). */
  def walk(s: String, sink: Sink): Unit = {
    val n = s.length
    var inTitle = false
    var rawEnd: String = null
    var aDepth = 0
    var i = 0

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
          sink.push(v, inTitle, aDepth)
          j + 1
        } else { sink.push('&', inTitle, aDepth); at + 1 }
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
          if (cp >= 0) { sink.push(cp, inTitle, aDepth); j + 1 }
          else { sink.push('&', inTitle, aDepth); at + 1 }
        } else { sink.push('&', inTitle, aDepth); at + 1 }
      }
    }

    while (i < n) {
      val c = s.charAt(i)
      if (rawEnd != null) {
        if (c == '<' && i + 1 < n && s.charAt(i + 1) == '/' &&
            matches(i + 2, rawEnd) &&
            (i + 2 + rawEnd.length >= n ||
              !isNameChar(s.charAt(i + 2 + rawEnd.length)))) {
          var j = i + 2 + rawEnd.length
          while (j < n && s.charAt(j) != '>') j += 1
          i = if (j < n) j + 1 else n
          rawEnd = null
          sink.boundary("", closing = true, isTag = false,
            inTitle = inTitle)
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
          sink.boundary("title", closing = true, isTag = true,
            inTitle = false)
        } else if (c == '&') i = entity(i)
        else { sink.push(c, inTitle = true, aDepth); i += 1 }
      } else if (c == '<') {
        if (i + 1 >= n) { sink.push('<', inTitle, aDepth); i += 1 }
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
            sink.boundary("", closing = false, isTag = false,
              inTitle = inTitle)
          } else if (d == '?') {
            val e = s.indexOf('>', i + 2)
            i = if (e < 0) n else e + 1
            sink.boundary("", closing = false, isTag = false,
              inTitle = inTitle)
          } else if (d == '/' || isLetter(d)) {
            val closing = d == '/'
            var j = if (closing) i + 2 else i + 1
            val nameStart = j
            while (j < n && isNameChar(s.charAt(j))) j += 1
            val nameLower = {
              val sb = new java.lang.StringBuilder(j - nameStart)
              var k = nameStart
              while (k < j) {
                val a = s.charAt(k)
                sb.append(
                  if (a >= 'A' && a <= 'Z') (a + 32).toChar else a)
                k += 1
              }
              sb.toString
            }
            var q: Char = 0
            while (j < n && (q != 0 || s.charAt(j) != '>')) {
              val cj = s.charAt(j)
              if (q != 0) { if (cj == q) q = 0 }
              else if (cj == '"' || cj == '\'') q = cj
              j += 1
            }
            i = if (j < n) j + 1 else n
            if (!closing) {
              nameLower match {
                case "script" => rawEnd = "script"
                case "style" => rawEnd = "style"
                case "title" => inTitle = true; sink.titleOpened()
                case "a" => aDepth += 1
                case _ =>
              }
            } else if (nameLower == "a" && aDepth > 0) aDepth -= 1
            sink.boundary(nameLower, closing, isTag = true,
              inTitle = inTitle)
          } else { sink.push('<', inTitle, aDepth); i += 1 }
        }
      } else if (c == '&') i = entity(i)
      else { sink.push(c, inTitle, aDepth); i += 1 }
    }
  }
}
