package graft

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.analyzer.{AnalyzerConfig, TreeAnalyzer}

/** Golden end-to-end snapshot: the rendered output must be
  * byte-identical to the REFERENCE's own `str(structure)` on the same
  * input (src/test/resources/golden/astros.expected.txt was produced
  * by running waveform80/structa on astros.json with
  * bad_threshold=0.02 and the CLI's merge fix-point loop).
  */
class GoldenSpec extends AnyFunSuite {

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    require(in != null, s"missing resource $name")
    try Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  test("astros.json renders byte-identical to the reference") {
    val data = graft.tools.Json.parse(resource("astros.json"))
    val a = new TreeAnalyzer(AnalyzerConfig(badThreshold = 0.02))
    val rendered = a.mergeToFixpoint(a.analyze(data)).render
    assert(rendered == resource("astros.expected.txt").trim)
  }

  test("astros.json styled views pin the cli.xsl layout") {
    // the XSL terminal layout (ui/cli.xsl semantics re-implemented in
    // XslRender: timestamp naming, quoted patterns, unique markers,
    // padded / indented brackets) — one golden with the stylesheet's
    // own default params, one with print_structure's ANSI palette
    val data = graft.tools.Json.parse(resource("astros.json"))
    val a = new TreeAnalyzer(AnalyzerConfig(badThreshold = 0.02))
    val tree = a.mergeToFixpoint(a.analyze(data))
    val o = graft.core.RenderOptions.default
    assert(graft.core.XslRender.render(tree, o) ==
      resource("astros.xsl.expected.txt"))
    assert(graft.core.Render.styled(tree, o) ==
      resource("astros.styled.expected.txt"))
  }
}
