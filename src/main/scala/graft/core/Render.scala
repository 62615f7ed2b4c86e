package graft.core

/** Verbose rendering: the compact reference grammar annotated with
  * per-node statistics and value samples — the text equivalent of the
  * reference's `--show-count` / `--show-samples` XML output
  * (structa types.py:95-160 `_xml_summary`/`_xml_sample`,
  * ui/cli.py options at 96-143).
  */
object Render {

  def verbose(t: SType): String = walk(t)

  private def statsSuffix(s: Stats): String = {
    val base = s" {card=${Format.formatInt(s.card)}" +
      (if (s.unique) ", unique" else "")
    val sample = s.sample match {
      case Some(c) if !s.unique =>
        // top-3 + bottom-3 most common, reference display rule
        // (types.py:146-160)
        val common = c.mostCommon
        val shown =
          if (common.length > 6) common.take(3) ++ common.takeRight(3)
          else common
        ", sample: " + shown.map { case (v, n) =>
          s"${Format.formatSample(v)}×${Format.formatInt(n)}"
        }.mkString(" ")
      case _ => ""
    }
    base + sample + "}"
  }

  private def quartiles(s: Stats): String =
    if (s.card > 4)
      s" q1=${Format.formatSample(s.q1)} q2=${Format.formatSample(s.q2)}" +
        s" q3=${Format.formatSample(s.q3)}"
    else ""

  private def walk(t: SType): String = t match {
    case sc: SScalar =>
      sc.render + quartiles(sc.values) + statsSuffix(sc.values)
    case r: SStrRepr =>
      s"str of ${walk(r.content)} pattern=${r.pattern}"
    case n: SNumRepr =>
      val kind = if (n.isFloat) "float" else "int"
      s"$kind ${Format.formatTimestampNumRepr(n.offset, n.scale)} of " +
        walk(n.content)
    case d: SDict =>
      SType.renderContainer(d.content.map(f =>
        s"${f.key.render}: ${walk(f.value)}"), "{", "}")
    case tp: STuple =>
      SType.renderContainer(tp.content.map(f => walk(f.value)),
        "(", ")")
    case l: SList =>
      SType.renderContainer(Vector(walk(l.content)), "[", "]")
    case other => other.render
  }
}
