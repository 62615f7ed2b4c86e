package graft.tools

import java.nio.file.Files
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference CLI spec (structa tests/test_cli.py) against
  * the expanded option surface.
  */
class CliSpec extends AnyFunSuite {
  import Cli._

  test("num parser (test_cli.py:56-68)") {
    assert(parseNum("1") == 1.0)
    assert(parseNum("1/2") == 0.5)
    assert(parseNum("1%") == 0.01)
    assert(parseNum("1.0") == 1.0)
    assert(parseNum("1e0") == 1.0)
  }

  test("size parser (test_cli.py:71-75)") {
    assert(parseSize("1") == 1L)
    assert(parseSize(" 100 ") == 100L)
    assert(parseSize("2K") == 2048L)
    assert(parseSize("1M") == 1048576L)
  }

  test("min/max timestamp: ISO or duration vs start " +
      "(test_cli.py:29-37)") {
    assert(parseMinTimestamp("2000-01-01") ==
      Instant.parse("2000-01-01T00:00:00Z"))
    assert(parseMaxTimestamp("2050-01-01") ==
      Instant.parse("2050-01-01T00:00:00Z"))
    val now = Instant.parse("2020-06-15T12:00:00Z")
    assert(parseMinTimestamp("10 years", now) ==
      Instant.parse("2010-06-15T12:00:00Z"))
    assert(parseMaxTimestamp("10 years", now) ==
      Instant.parse("2030-06-15T12:00:00Z"))
    assert(parseMinTimestamp("5 minutes, 30 seconds", now) ==
      Instant.parse("2020-06-15T11:54:30Z"))
    assert(parseMinTimestamp("1 week, 1 day", now) ==
      Instant.parse("2020-06-07T12:00:00Z"))
  }

  test("timestamps parser (test_cli.py:40-52)") {
    assert(parseTimestamps("unix") == (0.0, 1.0))
    assert(parseTimestamps("excel") == (-2209161600.0, 86400.0))
    // standalone timestamp → 1-second unit since that epoch; like the
    // reference's regex, only the first space-delimited token parses
    val (off, scale) = parseTimestamps("2015-03-31 00:00:00")
    assert(scale == 1.0)
    assert(off == Instant.parse("2015-03-31T00:00:00Z")
      .getEpochSecond.toDouble)
    val (off2, scale2) = parseTimestamps("milliseconds since 1900-01-01")
    assert(scale2 == 0.001)
    assert(off2 == Instant.parse("1900-01-01T00:00:00Z")
      .getEpochSecond.toDouble)
    val (off3, scale3) = parseTimestamps("days since 1970-01-01")
    assert(scale3 == 86400.0)
    assert(off3 == 0.0)
    intercept[IllegalArgumentException](parseTimestamps(""))
    // calendar units are invalid for fixed-size epochs (timedelta mode)
    intercept[IllegalArgumentException](
      parseTimestamps("years since 1970-01-01"))
  }

  test("duration parser ambiguity rules (conversions.py doctest)") {
    assert(parseDuration("1 m").spans == Map("months" -> 1L))
    assert(parseDuration("1 min").spans == Map("minutes" -> 1L))
    assert(parseDuration("1 mth").spans == Map("months" -> 1L))
    assert(parseDuration("1s").spans == Map("seconds" -> 1L))
    intercept[IllegalArgumentException](parseDuration("1 blorp"))
    intercept[IllegalArgumentException](
      parseDuration("1 year", allowCalendar = false))
  }

  test("option parsing: reference surface round-trips") {
    val o = parse(Seq(
      "--format", "csv", "--encoding", "utf-8", "--no-encoding-strict",
      "--sample-bytes", "2k", "--csv-format", ";'",
      "--no-json-strict", "--no-yaml-safe",
      "-F", "30", "-M", "60%", "-B", "2%", "-E", "98%", "-N", "97%",
      "--max-numeric-len", "40", "--no-strip-whitespace",
      "--min-timestamp", "2000-01-01", "--max-timestamp", "2050-01-01",
      "--timestamps", "excel", "--str-limit", "10",
      "--show-count", "--show-lengths", "--hide-pattern",
      "--show-range", "quartiles", "--show-samples",
      "data.csv"))
    assert(o.files == Vector("data.csv"))
    assert(o.source.format == "csv")
    assert(o.source.encoding == "utf-8")
    assert(!o.source.encodingStrict)
    assert(o.source.sampleBytes == 2048)
    assert(o.source.csvDelimiter.contains(';'))
    assert(o.source.csvQuote.contains('\''))
    assert(!o.source.jsonStrict)
    assert(!o.source.yamlSafe)
    assert(o.config.fieldThreshold == 30)
    assert(o.config.mergeThreshold == 0.6)
    assert(o.config.badThreshold == 0.02)
    assert(o.config.emptyThreshold == 0.98)
    assert(o.config.nullThreshold == 0.97)
    assert(o.config.maxNumericLen == 40)
    assert(!o.config.stripWhitespace)
    assert(o.config.minTimestampOpt.contains(
      Instant.parse("2000-01-01T00:00:00Z").getEpochSecond.toDouble))
    assert(o.config.timestampOffset == -2209161600.0)
    assert(o.config.timestampScale == 86400.0)
    assert(o.render.strLimit == 10)
    assert(o.render.showCount && o.render.showLengths)
    assert(!o.render.showPattern)
    assert(o.render.showRange == 3)
    assert(o.render.showSamples)
  }

  test("CLI defaults: reference CLI values incl. strip-whitespace on " +
      "(cli.py:96-226, 198)") {
    val o = parse(Seq("data.json"))
    assert(o.config.badThreshold == 0.01)
    assert(o.config.emptyThreshold == 0.99)
    assert(o.config.nullThreshold == 0.99)
    assert(o.config.stripWhitespace) // cli.py:198 default=True
    assert(o.source.encodingStrict && o.source.jsonStrict &&
      o.source.yamlSafe)
    assert(o.render == graft.core.RenderOptions.default)
  }

  test("main end-to-end: range(100) json renders like the reference " +
      "(test_cli.py:87-94; str(structure) grammar — the XSL view's " +
      "bracket padding is scoped out)") {
    val f = Files.createTempFile("range", ".json")
    Files.write(f, (0 until 100).mkString("[", ", ", "]").getBytes)
    val data = graft.sources.Source.load(f.toString)
    val a = new graft.analyzer.TreeAnalyzer(
      parse(Seq(f.toString)).config)
    val rendered = a.mergeToFixpoint(a.analyze(data)).render
    assert(rendered == "[int range=0..99]")
    Files.delete(f)
  }

  test("unknown option raises") {
    intercept[IllegalArgumentException](parse(Seq("--wat")))
  }

  test("output modes: --xml and --ansi") {
    assert(parse(Seq("f.json")).outputMode == "text")
    assert(parse(Seq("--xml", "f.json")).outputMode == "xml")
    assert(parse(Seq("--ansi", "f.json")).outputMode == "ansi")
  }

  test("Analyze and AnalyzeDist agree end-to-end on the same file") {
    // the README's claimed invariant: the driver-side reference
    // analyzer and the distributed analyzer print identical
    // structure for identical input
    val f = Files.createTempFile("agree", ".json")
    Files.write(f, (0 until 60).map(i =>
      s"""{"n": $i, "s": "v${i % 7}", "f": ${i % 3}.5}""")
      .mkString("[", ", ", "]").getBytes)
    def runMain(m: Array[String] => Unit, args: Seq[String]): String = {
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf, true)) {
        m(args.toArray)
      }
      buf.toString
    }
    val local = runMain(Analyze.main, Seq(f.toString))
    val dist = runMain(AnalyzeDist.main, Seq(f.toString))
    assert(local.nonEmpty)
    assert(local == dist, s"\nanalyze=$local\ndist=$dist")
    Files.delete(f)
  }

  test("progress: stderr line under --progress, absent by default " +
      "(analyzer.py:209-236 UX; TTY-gated like ui/cli.py:237-266)") {
    assert(parse(Seq("f.json")).progress.isEmpty)
    assert(parse(Seq("--progress", "f.json")).progress.contains(true))
    assert(parse(Seq("--no-progress", "f.json")).progress
      .contains(false))
    // no TTY under sbt → auto mode stays off, like the reference
    assert(!progressEnabled(parse(Seq("f.json"))))
    assert(progressEnabled(parse(Seq("--progress", "f.json"))))

    val f = Files.createTempFile("prog", ".json")
    Files.write(f, (0 until 50).map(i =>
      s"""{"a": $i, "b": "x$i"}""").mkString("[", ", ", "]").getBytes)
    def runCapturingErr(args: Seq[String]): String = {
      val buf = new java.io.ByteArrayOutputStream()
      val prevErr = System.err
      System.setErr(new java.io.PrintStream(buf, true))
      try AnalyzeDist.main(args.toArray)
      finally System.setErr(prevErr)
      buf.toString
    }
    val withProgress = runCapturingErr(Seq("--progress", f.toString))
    assert(withProgress.contains("analyzing:"),
      withProgress.takeRight(400))
    assert(withProgress.contains("graft:"), withProgress.takeRight(400))
    val without = runCapturingErr(Seq(f.toString))
    assert(!without.contains("analyzing:"), without.takeRight(400))
    Files.delete(f)
  }
}
