package graft.tools

import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

import graft.analyzer.AnalyzerConfig
import graft.core.RenderOptions
import graft.sources.Source.SourceOptions

/** CLI option parsing mirroring the reference's argparse surface
  * (structa ui/cli.py:68-234 + value parsers 345-407 +
  * conversions.py:88-179): numbers accept plain/percent/fraction
  * forms; sizes accept k/m/g suffixes; timestamps accept named epochs,
  * ISO timestamps, and "UNIT since EPOCH"; min/max timestamps accept
  * ISO timestamps or durations relative to startup.
  */
object Cli {

  val Version = "structa-spark 0.2.0"

  /** Fixed at load, like the reference's `_start` (ui/cli.py:345) —
    * duration-relative timestamps resolve against one instant.
    */
  val start: Instant = Instant.now()

  final case class Options(
      files: Vector[String] = Vector.empty,
      source: SourceOptions = SourceOptions(),
      render: RenderOptions = RenderOptions(),
      /** text (default grammar), ansi (styled terminal), xml. */
      outputMode: String = "text",
      /** None = auto (TTY only, like the reference's tqdm:
        * ui/cli.py:237-266); Some overrides via --[no-]progress. */
      progress: Option[Boolean] = None,
      config: AnalyzerConfig = AnalyzerConfig(
        badThreshold = 0.01, // CLI default 1% (API default is 2%)
        emptyThreshold = 0.99, // CLI default 99%
        nullThreshold = 0.99,
        // the reference CLI strips whitespace by default (cli.py:198);
        // the API default (analyzer.py) does not
        stripWhitespace = true))

  /** "%"/fraction/decimal number parser (conversions.py:160-179). */
  def parseNum(s: String): Double = {
    val t = s.trim
    if (t.endsWith("%")) t.dropRight(1).trim.toDouble / 100.0
    else if (t.contains("/")) {
      val Array(n, d) = t.split("/", 2)
      n.trim.toDouble / d.trim.toDouble
    } else t.toDouble
  }

  /** Byte-size parser with binary k/m/g/t/e suffixes (cli.py:395-401). */
  def parseSize(s: String): Long = {
    val t = s.trim.toLowerCase
    val suffixes = "kmgte"
    if (t.nonEmpty && !t.last.isDigit) {
      val idx = suffixes.indexOf(t.last)
      require(idx >= 0, s"unknown size suffix in: $s")
      t.dropRight(1).trim.toLong * math.pow(1024, idx + 1).toLong
    } else t.toLong
  }

  // ------------------------------------------------ duration parsing

  /** The reference's span table (conversions.py:72-85): suffix regexes
    * per unit, matched anywhere and removed, iterated in order.
    */
  private val spanDefs: Seq[(String, String)] = Seq(
    "microseconds" -> "(micro|u|µ)s(ec(ond)?s?)?",
    "milliseconds" -> "(milli|m)s(ec(ond)?s?)?",
    "seconds" -> "s(ec(ond)?s?)?",
    "minutes" -> "mi(n(ute)?s?)?",
    "hours" -> "h((ou)?rs?)?",
    "days" -> "d(ays?)?",
    "weeks" -> "w((ee)?ks?)?",
    "months" -> "m((on)?ths?)?",
    "years" -> "y((ea)?rs?)?")

  private val spanRes: Seq[(String, scala.util.matching.Regex)] =
    spanDefs.map { case (n, suf) =>
      n -> ("([+-]?\\d+)\\s*" + suf + "\\b").r
    }

  /** Parsed duration spans; calendar units (months/years) are applied
    * calendar-aware like dateutil's relativedelta.
    */
  final case class DurationSpans(spans: Map[String, Long]) {
    def isEmpty: Boolean = spans.isEmpty
    private def n(k: String): Long = spans.getOrElse(k, 0L)
    def addTo(t: Instant, sign: Int): Instant = {
      var d = LocalDateTime.ofInstant(t, ZoneOffset.UTC)
      d = d.plusYears(sign * n("years"))
        .plusMonths(sign * n("months"))
        .plusWeeks(sign * n("weeks"))
        .plusDays(sign * n("days"))
        .plusHours(sign * n("hours"))
        .plusMinutes(sign * n("minutes"))
        .plusSeconds(sign * n("seconds"))
        .plusNanos(sign * (n("milliseconds") * 1000000L +
          n("microseconds") * 1000L))
      d.toInstant(ZoneOffset.UTC)
    }
    /** Total seconds — only valid without calendar units. */
    def totalSeconds: Double =
      n("weeks") * 604800.0 + n("days") * 86400.0 + n("hours") * 3600.0 +
        n("minutes") * 60.0 + n("seconds") +
        n("milliseconds") / 1e3 + n("microseconds") / 1e6
  }

  /** conversions.py:88-157 — comma/space separated "<num> <suffix>"
    * spans; unknown remainder raises. `allowCalendar=false` mirrors
    * delta_type=timedelta (months/years rejected).
    */
  def parseDuration(s: String,
                    allowCalendar: Boolean = true): DurationSpans = {
    var t = s.trim
    var acc = Map.empty[String, Long]
    val it = spanRes.iterator
    var done = false
    while (it.hasNext && !done) {
      val (name, re) = it.next()
      if (allowCalendar || (name != "months" && name != "years")) {
        re.findFirstMatchIn(t).foreach { m =>
          acc = acc.updated(name,
            acc.getOrElse(name, 0L) + m.group(1).toLong)
          t = (t.substring(0, m.start) + t.substring(m.end))
            .replaceAll("^[ \t\n,]+|[ \t\n,]+$", "")
          if (t.isEmpty) done = true
        }
      }
    }
    if (t.nonEmpty)
      throw new IllegalArgumentException(s"invalid duration $s")
    DurationSpans(acc)
  }

  /** dateutil.parse stand-in for the formats the reference tests use:
    * ISO dates, ISO datetimes with space or 'T'.
    */
  def parseTimestamp(s: String): Instant = {
    val t = s.trim
    val tries: Seq[() => Instant] = Seq(
      () => LocalDate.parse(t).atStartOfDay.toInstant(ZoneOffset.UTC),
      () => LocalDateTime.parse(t).toInstant(ZoneOffset.UTC),
      () => LocalDateTime.parse(t, DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")).toInstant(ZoneOffset.UTC),
      () => LocalDateTime.parse(t, DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm")).toInstant(ZoneOffset.UTC),
      () => Instant.parse(t))
    tries.foreach { f =>
      try return f()
      catch { case _: java.time.format.DateTimeParseException => () }
    }
    throw new IllegalArgumentException(s"invalid timestamp $s")
  }

  /** cli.py:347-359 — ISO timestamp, or a duration relative to
    * startup: subtracted for the minimum, added for the maximum.
    */
  def parseMinTimestamp(s: String, now: Instant = start): Instant =
    parseDurationOrTimestamp(s) match {
      case Left(d) => d.addTo(now, -1)
      case Right(t) => t
    }

  def parseMaxTimestamp(s: String, now: Instant = start): Instant =
    parseDurationOrTimestamp(s) match {
      case Left(d) => d.addTo(now, 1)
      case Right(t) => t
    }

  private def parseDurationOrTimestamp(s: String)
      : Either[DurationSpans, Instant] =
    try Left(parseDuration(s))
    catch {
      case _: IllegalArgumentException => Right(parseTimestamp(s))
    }

  /** cli.py:361-383 — named epochs, a standalone timestamp, or
    * "UNIT since EPOCH" (unit parsed as a non-calendar duration, so
    * "years since ..." is rejected like the reference's timedelta
    * mode). Returns (offsetSeconds from UNIX epoch, secondsPerUnit).
    */
  def parseTimestamps(s: String): (Double, Double) = s.trim match {
    case "unix" => (0.0, 1.0)
    case "excel" => (-2209161600.0, 86400.0)
    case other =>
      require(other.nonEmpty, "invalid timestamp representation")
      val (unitSecs, epochText) = other.indexOf(" since ") match {
        case -1 => (1.0, other.takeWhile(_ != ' '))
        case i =>
          val unit = other.take(i).trim
          val d = parseDuration("1" + unit, allowCalendar = false)
          (d.totalSeconds, other.drop(i + 7).trim.takeWhile(_ != ' '))
      }
      val epoch = parseTimestamp(epochText)
      (epoch.getEpochSecond.toDouble + epoch.getNano / 1e9, unitSecs)
  }

  // ------------------------------------------------------- arg parsing

  def parse(args: Seq[String]): Options = {
    var o = Options()
    var cfg = o.config
    var src = o.source
    var r = o.render
    var i = 0
    def next(): String = { i += 1; require(i < args.length,
      s"${args(i - 1)} requires a value"); args(i) }
    while (i < args.length) {
      args(i) match {
        case "--version" => println(Version); sys.exit(0)
        case "-f" | "--format" => src = src.copy(format = next())
        case "-e" | "--encoding" => src = src.copy(encoding = next())
        case "--encoding-strict" => src = src.copy(encodingStrict = true)
        case "--no-encoding-strict" =>
          src = src.copy(encodingStrict = false)
        case "--sample-bytes" =>
          src = src.copy(sampleBytes =
            math.min(parseSize(next()), Int.MaxValue.toLong).toInt)
        case "--csv-format" =>
          val v = next()
          if (v != "auto") {
            require(v.nonEmpty && v.length <= 2,
              "--csv-format takes FIELD[QUOTE]")
            src = src.copy(csvDelimiter = Some(v.charAt(0)),
              csvQuote = v.lift(1))
          }
        case "--json-strict" => src = src.copy(jsonStrict = true)
        case "--no-json-strict" => src = src.copy(jsonStrict = false)
        case "--yaml-safe" => src = src.copy(yamlSafe = true)
        case "--no-yaml-safe" => src = src.copy(yamlSafe = false)
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
        case "--no-strip-whitespace" =>
          cfg = cfg.copy(stripWhitespace = false)
        case "--min-timestamp" =>
          val t = parseMinTimestamp(next())
          cfg = cfg.copy(minTimestampOpt =
            Some(t.getEpochSecond.toDouble + t.getNano / 1e9))
        case "--max-timestamp" =>
          val t = parseMaxTimestamp(next())
          cfg = cfg.copy(maxTimestampOpt =
            Some(t.getEpochSecond.toDouble + t.getNano / 1e9))
        case "--timestamps" =>
          val (off, scale) = parseTimestamps(next())
          cfg = cfg.copy(timestampOffset = off, timestampScale = scale)
        case "--str-limit" =>
          r = r.copy(strLimit = parseNum(next()).toInt)
        case "--show-count" => r = r.copy(showCount = true)
        case "--hide-count" => r = r.copy(showCount = false)
        case "--show-lengths" => r = r.copy(showLengths = true)
        case "--hide-lengths" => r = r.copy(showLengths = false)
        case "--show-pattern" => r = r.copy(showPattern = true)
        case "--hide-pattern" => r = r.copy(showPattern = false)
        case "--show-range" =>
          r = r.copy(showRange = RenderOptions.rangeMode(next()))
        case "--hide-range" => r = r.copy(showRange = 0)
        case "--show-samples" => r = r.copy(showSamples = true)
        case "--hide-samples" => r = r.copy(showSamples = false)
        case "--xml" => o = o.copy(outputMode = "xml")
        case "--ansi" => o = o.copy(outputMode = "ansi")
        case "--progress" => o = o.copy(progress = Some(true))
        case "--no-progress" => o = o.copy(progress = Some(false))
        case "-h" | "--help" =>
          println(usage); sys.exit(0)
        case flag if flag.startsWith("-") && flag != "-" =>
          throw new IllegalArgumentException(s"unknown option: $flag")
        case file => o = o.copy(files = o.files :+ file)
      }
      i += 1
    }
    o.copy(config = cfg, source = src, render = r)
  }

  val usage: String =
    """usage: structa-spark [options] file [file ...]
      |
      |Analyze data files and print their inferred structure.
      |
      |  --version                print the version and exit
      |  -f, --format {auto,csv,json,jsonl,yaml}  input format
      |                           (default: auto)
      |  -e, --encoding ENC       character encoding (default: auto)
      |  --[no-]encoding-strict   error on invalid characters (default on)
      |  --sample-bytes SIZE      detection sample size, k/m/g suffixes
      |                           (default: 1m)
      |  --csv-format FIELD[QUOTE] CSV delimiter and quote chars, or auto
      |  --[no-]json-strict       reject control chars in JSON strings
      |                           (default on)
      |  --[no-]yaml-safe         safe YAML loading (default on; the
      |                           subset parser is structurally safe)
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
      |  --[no-]strip-whitespace  strip strings before analysis
      |                           (default on)
      |  --min-timestamp WHEN     ISO timestamp or duration before now
      |                           bounding the epoch heuristic
      |                           (default: 20 years)
      |  --max-timestamp WHEN     ISO timestamp or duration after now
      |                           (default: 10 years)
      |  --timestamps SPEC        unix, excel, an ISO timestamp, or
      |                           'UNIT since EPOCH' (default: unix)
      |  --str-limit N            show string values up to this length,
      |                           lengths beyond it (default: 20)
      |  --show/hide-count        value counts (default hidden)
      |  --show/hide-lengths      string length ranges (default hidden)
      |  --show/hide-pattern      fixed-length patterns (default shown)
      |  --show-range {hidden,limits,median,quartiles,graph}
      |                           numeric range detail (default limits)
      |  --hide-range             same as --show-range hidden
      |  --show/hide-samples      value samples (default hidden)
      |  --xml                    emit the structure as XML
      |  --ansi                   styled terminal output
      |  --[no-]progress          stderr progress line while analyzing
      |                           (default: only on a terminal)
      |""".stripMargin

  /** Effective progress switch: explicit flag, else TTY detection
    * (the reference shows its tqdm bar only on a TTY). Note the JVM
    * limitation: `System.console()` is null whenever stdin OR stdout
    * is redirected, so `analyze > out.txt` from a terminal defaults
    * progress OFF even though stderr is interactive — pass
    * `--progress` to force it (Java 17 has no per-stream isatty).
    */
  def progressEnabled(o: Options): Boolean =
    o.progress.getOrElse(System.console() != null)
}
