package graft.tools

import graft.analyzer.{AnalyzerConfig, TreeAnalyzer}

/** structa-equivalent CLI: analyze files and print the inferred
  * structure (reference ui/cli.py:36-56 lifecycle: detect encoding/
  * format/dialect → load → analyze → merge fix-point → render).
  *
  * Usage: Analyze <file.{json,csv,yaml}> [more files...]
  * Multiple files are wrapped as a sources list (ui/cli.py:240-249).
  */
object Analyze {
  def main(args: Array[String]): Unit = {
    val opts = Cli.parse(args.toSeq)
    if (opts.files.isEmpty) { System.err.println(Cli.usage); sys.exit(2) }
    // the reference's progress descriptions (get_structure,
    // ui/cli.py:236-264), TTY-gated / flag-forced like AnalyzeDist
    val progress = Cli.progressEnabled(opts)
    def phase(msg: String): Unit =
      if (progress) System.err.println(s"[structa] $msg")
    opts.files.foreach(f => phase(s"Reading file $f"))
    phase("Parsing data")
    val data = graft.sources.Source.loadAll(opts.files, opts.source)
    val analyzer = new TreeAnalyzer(opts.config)
    phase("Analyzing data")
    val structure = analyzer.analyze(data)
    phase("Merging common structures")
    val merged = analyzer.mergeToFixpoint(structure)
    // default toggles → the golden types.py-str grammar; any explicit
    // show/hide flag switches to the configurable CLI view; --xml and
    // --ansi select the other two reference output surfaces
    println(opts.outputMode match {
      case "xml" => graft.core.Xml.toStringOf(merged)
      case "ansi" => graft.core.Render.styled(merged, opts.render)
      case _ =>
        if (opts.render == graft.core.RenderOptions.default)
          merged.render
        else graft.core.Render.configured(merged, opts.render)
    })
  }
}

/** Minimal recursive-descent JSON parser producing the dynamic value
  * model (Map/Vector/Long/Double/Boolean/String/null). No external
  * dependency (zero-egress build); driver-side only — the distributed
  * path uses spark.read.json.
  */
object Json {
  /** `strict` mirrors Python json's default: control characters inside
    * strings are rejected unless strict is disabled (--no-json-strict).
    */
  def parse(s: String, strict: Boolean = true): Any = {
    val p = new Parser(s, strict)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"trailing content at ${p.pos}")
    v
  }

  private final class Parser(s: String, strict: Boolean = true) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!eof && Character.isWhitespace(s.charAt(pos))) pos += 1

    def value(): Any = {
      skipWs()
      require(!eof, "unexpected end of input")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => num()
      }
    }

    private def lit(text: String, v: Any): Any = {
      require(s.regionMatches(pos, text, 0, text.length),
        s"bad literal at $pos")
      pos += text.length
      v
    }

    private def obj(): Map[Any, Any] = {
      pos += 1 // {
      val b = Map.newBuilder[Any, Any]
      skipWs()
      if (!eof && s.charAt(pos) == '}') { pos += 1; return b.result() }
      while (true) {
        skipWs()
        val k = str()
        skipWs()
        require(s.charAt(pos) == ':', s"expected : at $pos")
        pos += 1
        b += (k -> value())
        skipWs()
        s.charAt(pos) match {
          case ',' => pos += 1
          case '}' => pos += 1; return b.result()
          case c => throw new IllegalArgumentException(
            s"expected , or }} at $pos, got $c")
        }
      }
      b.result()
    }

    private def arr(): Vector[Any] = {
      pos += 1 // [
      val b = Vector.newBuilder[Any]
      skipWs()
      if (!eof && s.charAt(pos) == ']') { pos += 1; return b.result() }
      while (true) {
        b += value()
        skipWs()
        s.charAt(pos) match {
          case ',' => pos += 1
          case ']' => pos += 1; return b.result()
          case c => throw new IllegalArgumentException(
            s"expected , or ] at $pos, got $c")
        }
      }
      b.result()
    }

    private def str(): String = {
      require(s.charAt(pos) == '"', s"expected string at $pos")
      pos += 1
      val b = new StringBuilder
      while (s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        require(!strict || c >= ' ',
          s"invalid control character at $pos")
        if (c == '\\') {
          pos += 1
          s.charAt(pos) match {
            case '"' => b += '"'
            case '\\' => b += '\\'
            case '/' => b += '/'
            case 'b' => b += '\b'
            case 'f' => b += '\f'
            case 'n' => b += '\n'
            case 'r' => b += '\r'
            case 't' => b += '\t'
            case 'u' =>
              b += Integer.parseInt(s.substring(pos + 1, pos + 5), 16)
                .toChar
              pos += 4
            case e => throw new IllegalArgumentException(
              s"bad escape \\$e at $pos")
          }
        } else b += c
        pos += 1
      }
      pos += 1
      b.result()
    }

    private def num(): Any = {
      val start = pos
      if (s.charAt(pos) == '-' || s.charAt(pos) == '+') pos += 1
      var isFloat = false
      while (!eof && (s.charAt(pos).isDigit || "eE.+-".contains(
          s.charAt(pos)))) {
        if ("eE.".contains(s.charAt(pos))) isFloat = true
        pos += 1
      }
      val text = s.substring(start, pos)
      if (isFloat) text.toDouble
      else try text.toLong
      catch { case _: NumberFormatException => text.toDouble }
    }
  }
}
