package graft.core

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

/** Human-readable formatting of values, counts, and char ranges.
  *
  * Same behavior as the reference's formatting helpers (structa
  * format.py:21-178): SI-suffixed ints (`1.6K`), 7-significant-digit
  * floats, double-quote-escaped strings, compressed char ranges
  * (`a-dh-i`), and epoch descriptions (`days since 1970-01-01`).
  */
object Format {

  private val tsFmt = DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)

  /** format.py:64-86 — reduce by powers of 1000 with a Greek suffix. */
  def formatInt(i: Long): String = {
    val suffixes = Array("", "K", "M", "G", "T", "P")
    if (i == 0) return "0"
    val index = math.min(
      suffixes.length - 1,
      (math.log(math.abs(i.toDouble)) / math.log(1000)).toInt)
    if (index == 0) i.toString
    else f"${i / math.pow(1000, index)}%.1f${suffixes(index)}"
  }

  /** Same SI reduction for unbounded ints (Python-int parity). */
  def formatBigInt(i: BigInt): String =
    if (i.isValidLong) formatInt(i.longValue)
    else {
      val suffixes = Array("", "K", "M", "G", "T", "P")
      val index = math.min(
        suffixes.length - 1,
        (math.log(i.abs.doubleValue) / math.log(1000)).toInt)
      f"${i.doubleValue / math.pow(1000, index)}%.1f${suffixes(index)}"
    }

  /** Python's `%.7g` formatting for doubles (format.py:145). */
  def formatFloat(d: Double): String = {
    if (d == d.toLong && math.abs(d) < 1e15) return d.toLong.toString
    val s = f"$d%.7g"
    // %.7g in Java keeps trailing zeros; python strips them
    if (s.contains('e') || s.contains('E')) {
      val Array(mant, exp) = s.split("[eE]")
      val m = if (mant.contains('.'))
        mant.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
      else mant
      s"${m}e$exp"
    } else if (s.contains('.'))
      s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
    else s
  }

  /** format.py:113-152 — scalar sample value rendering. */
  def formatSample(value: Any): String = value match {
    case null            => "null"
    case b: Boolean      => if (b) "true" else "false"
    case i: Int          => formatInt(i.toLong)
    case l: Long         => formatInt(l)
    case b: BigInt       => formatBigInt(b)
    case d: Double       => formatFloat(d)
    case f: Float        => formatFloat(f.toDouble)
    case s: String       => "\"" + s.replace("\"", "\"\"") + "\""
    case t: Instant      => tsFmt.format(t)
    case other           =>
      throw new IllegalArgumentException(
        s"invalid type for value $other")
  }

  /** format.py:21-61 — compressed string of a char set (`a-dh-i`). */
  def formatChars(chars: Set[Char], rangeSep: String = "-",
                  listSep: String = ""): String = {
    if (chars.isEmpty) return ""
    if (chars.size == 1) return chars.head.toString
    if (chars.size == 2) return chars.toSeq.sorted.mkString(listSep)
    val sorted = chars.toSeq.sorted
    val ranges = scala.collection.mutable.ListBuffer.empty[(Char, Char)]
    var start = sorted.head
    var prev = sorted.head
    for (c <- sorted.tail) {
      if (c > (prev + 1).toChar) {
        ranges += ((start, prev))
        start = c
      }
      prev = c
    }
    ranges += ((start, prev))
    ranges.map { case (a, b) =>
      if (b > a) s"$a$rangeSep$b" else s"$a"
    }.mkString(listSep)
  }

  /** format.py:155-178 — describe a numeric-timestamp encoding. */
  def formatTimestampNumRepr(offset: Double, scale: Double): String = {
    val simple = Map(
      1e-9 -> "nanoseconds", 1e-6 -> "microseconds",
      1e-3 -> "milliseconds", 1.0 -> "seconds",
      60.0 -> "minutes", 3600.0 -> "hours", 86400.0 -> "days",
      604800.0 -> "weeks")
    val epochInstant = Instant.ofEpochMilli((offset * 1000).toLong)
    val epoch =
      if (offset % 86400 != 0)
        epochInstant.atOffset(ZoneOffset.UTC).toLocalDateTime.toString
      else
        epochInstant.atOffset(ZoneOffset.UTC).toLocalDate.toString
    simple.get(scale) match {
      case Some(name) => s"$name since $epoch"
      case None =>
        val op = if (scale >= 1) "/" else "*"
        val sc = if (scale >= 1) scale else 1 / scale
        f"seconds since $epoch $op $sc%.6g".replace(".00000", "")
    }
  }
}
