package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.VTuple

/** Ports of the reference's source-detection spec
  * (structa tests/test_source.py:76-236).
  */
class SourceSpec extends AnyFunSuite {
  import Source._

  test("format detection: json by leading bracket/brace") {
    assert(detectFormat("[1, 2, 3]") == JsonFormat)
    assert(detectFormat("""  {"a": 1}""") == JsonFormat)
  }

  test("format detection: xml detected (then rejected at load)") {
    assert(detectFormat("<?xml version=\"1.0\"?><r/>") == XmlFormat)
    assert(detectFormat("<root>...</root>") == XmlFormat)
  }

  test("format detection: csv vs yaml line scoring") {
    val csv = "name,age,city\n\"Smith, J\",40,London\n\"Jones, B\",35,Leeds\ntrailing,1,2\n"
    assert(detectFormat(csv) == CsvFormat)
    val yaml = "config:\n  host: example.com\n  port: 8080\nitems:\n  - one\n  - two\n"
    assert(detectFormat(yaml) == YamlFormat)
    assert(detectFormat("plainword\nanotherword\n") == UnknownFormat)
  }

  test("encoding detection: UTF-8 BOM, UTF-16 BOMs, latin-1 fallback") {
    assert(detectEncoding(Array(0xEF, 0xBB, 0xBF, 'h', 'i')
      .map(_.toByte)) == StandardCharsets.UTF_8)
    assert(detectEncoding(Array(0xFF, 0xFE, 'h', 0)
      .map(_.toByte)) == StandardCharsets.UTF_16LE)
    assert(detectEncoding("héllo wörld".getBytes("UTF-8")) ==
      StandardCharsets.UTF_8)
    assert(detectEncoding("héllo".getBytes("ISO-8859-1")) ==
      StandardCharsets.ISO_8859_1)
  }

  test("csv dialect sniffing: semicolons and quotes") {
    val sample = "h1;h2;h3\na;b;c\n\"d;d\";e;f\n1;2;3\n"
    val d = sniffCsvDialect(sample)
    assert(d.delimiter == ';')
    assert(d.quote == '"')
  }

  test("csv parse: header ALWAYS skipped, values stay strings " +
      "(source.py:237-241)") {
    val rows = parseCsv("a,b\n1,2\n\"x,y\",3\n", CsvDialect(',', '"'))
    assert(rows == Vector(
      VTuple(Vector("1", "2")), VTuple(Vector("x,y", "3"))))
  }

  test("csv parse: quoted fields with embedded quotes and newlines") {
    val rows = parseCsv(
      "h\n\"say \"\"hi\"\"\"\n\"line1\nline2\"\n", CsvDialect(',', '"'))
    assert(rows == Vector(
      VTuple(Vector("say \"hi\"")), VTuple(Vector("line1\nline2"))))
  }

  test("yaml subset: nested maps, lists, scalars") {
    val y =
      """# comment
        |name: test
        |count: 42
        |ratio: 0.5
        |flag: true
        |nothing: null
        |nested:
        |  inner: value
        |  deep:
        |    x: 1
        |items:
        |  - 10
        |  - 20
        |records:
        |  - id: 1
        |    label: a
        |  - id: 2
        |    label: b
        |""".stripMargin
    val v = parseYaml(y).asInstanceOf[Map[Any, Any]]
    assert(v("name") == "test")
    assert(v("count") == 42L)
    assert(v("ratio") == 0.5)
    assert(v("flag") == true)
    assert(v("nothing") == null)
    assert(v("nested").asInstanceOf[Map[Any, Any]]("deep")
      .asInstanceOf[Map[Any, Any]]("x") == 1L)
    assert(v("items") == Vector(10L, 20L))
    val recs = v("records").asInstanceOf[Vector[Any]]
    assert(recs.length == 2)
    assert(recs(0).asInstanceOf[Map[Any, Any]]("label") == "a")
  }

  test("unicode CSV end-to-end (test_source.py:22-38)") {
    val f = Files.createTempFile("names", ".csv")
    val content = "Name,Nationality\n" +
      "José,España\nFrançois,France\nMüller,Deutschland\n" +
      "Σωκράτης,Ελλάδα\n"
    Files.write(f, content.getBytes("UTF-8"))
    val d = detect(f.toString)
    assert(d.format == CsvFormat)
    assert(d.encoding == StandardCharsets.UTF_8)
    val data = load(f.toString).asInstanceOf[Vector[Any]]
    assert(data.length == 4)
    assert(data.head == VTuple(Vector("José", "España")))
    Files.delete(f)
  }

  test("unknown format raises") {
    val f = Files.createTempFile("mystery", ".bin")
    Files.write(f, "wat\nwat\nwat\n".getBytes)
    intercept[IllegalArgumentException](load(f.toString))
    Files.delete(f)
  }
}
