package graft.tools

import graft.analyzer.AnalyzerConfig

/** CLI option parsing mirroring the reference's argparse surface
  * (structa ui/cli.py:68-234 + value parsers 345-407): numbers accept
  * plain/percent/fraction forms, timestamps accept the named epochs.
  */
object Cli {

  final case class Options(
      files: Vector[String] = Vector.empty,
      format: String = "auto",
      encoding: String = "auto",
      showSamples: Boolean = false,
      config: AnalyzerConfig = AnalyzerConfig(
        badThreshold = 0.01, // CLI default 1% (API default is 2%)
        emptyThreshold = 0.99, // CLI default 99%
        nullThreshold = 0.99))

  /** "%"/fraction/decimal number parser (conversions.py:160-179). */
  def parseNum(s: String): Double = {
    val t = s.trim
    if (t.endsWith("%")) t.dropRight(1).trim.toDouble / 100.0
    else if (t.contains("/")) {
      val Array(n, d) = t.split("/", 2)
      n.trim.toDouble / d.trim.toDouble
    } else t.toDouble
  }

  /** Named epoch encodings (ui/cli.py:361-383): unix seconds or the
    * Excel serial-day epoch (1899-12-30, 86400 s/day).
    */
  def parseTimestamps(s: String): (Double, Double) = s.trim match {
    case "unix" => (0.0, 1.0)
    case "excel" => (-2209161600.0, 86400.0)
    case other =>
      throw new IllegalArgumentException(
        s"unknown timestamps encoding: $other (unix|excel)")
  }

  def parse(args: Seq[String]): Options = {
    var o = Options()
    var cfg = o.config
    var i = 0
    def next(): String = { i += 1; require(i < args.length,
      s"${args(i - 1)} requires a value"); args(i) }
    while (i < args.length) {
      args(i) match {
        case "-f" | "--format" => o = o.copy(format = next())
        case "-e" | "--encoding" => o = o.copy(encoding = next())
        case "-F" | "--field-threshold" =>
          cfg = cfg.copy(fieldThreshold = next().toInt)
        case "-M" | "--merge-threshold" =>
          cfg = cfg.copy(mergeThreshold = parseNum(next()))
        case "-B" | "--bad-threshold" =>
          cfg = cfg.copy(badThreshold = parseNum(next()))
        case "-E" | "--empty-threshold" =>
          cfg = cfg.copy(emptyThreshold = parseNum(next()))
        case "-N" | "--null-threshold" =>
          cfg = cfg.copy(nullThreshold = parseNum(next()))
        case "--max-numeric-len" =>
          cfg = cfg.copy(maxNumericLen = next().toInt)
        case "--strip-whitespace" =>
          cfg = cfg.copy(stripWhitespace = true)
        case "--show-samples" =>
          o = o.copy(showSamples = true)
        case "--timestamps" =>
          val (off, scale) = parseTimestamps(next())
          cfg = cfg.copy(timestampOffset = off, timestampScale = scale)
        case "-h" | "--help" =>
          println(usage); sys.exit(0)
        case flag if flag.startsWith("-") && flag != "-" =>
          throw new IllegalArgumentException(s"unknown option: $flag")
        case file => o = o.copy(files = o.files :+ file)
      }
      i += 1
    }
    o.copy(config = cfg)
  }

  val usage: String =
    """usage: structa-spark [options] file [file ...]
      |
      |Analyze data files and print their inferred structure.
      |
      |  -f, --format {auto,csv,json,yaml}  input format (default: auto)
      |  -e, --encoding ENC       character encoding (default: auto)
      |  -F, --field-threshold N  distinct keys below which a mapping is
      |                           a record of fields (default: 20)
      |  -M, --merge-threshold N  similarity needed to merge mappings
      |                           (default: 50%)
      |  -B, --bad-threshold N    tolerated conversion failures
      |                           (default: 1%)
      |  -E, --empty-threshold N  tolerated empty strings (default: 99%)
      |  -N, --null-threshold N   tolerated nulls (default: 99%)
      |  --max-numeric-len N      longest string probed as a number
      |                           (default: 30)
      |  --strip-whitespace       strip strings before analysis
      |  --show-samples           annotate output with stats and samples
      |  --timestamps {unix,excel} numeric datetime epoch (default: unix)
      |""".stripMargin
}
