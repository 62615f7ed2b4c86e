package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Buffer-level spec for the fixed-length pattern miner aggregate —
  * exercises update/merge/serialize/deserialize/eval directly, the
  * exact call sequence a distributed partial→final aggregation makes.
  */
class CharClassAggSpec extends AnyFunSuite {

  private def agg = CharClassAgg(
    BoundReference(0, StringType, nullable = true), maxWidth = 8)

  private def row(s: String): InternalRow =
    InternalRow(if (s == null) null else UTF8String.fromString(s))

  private def strings(a: Any): Seq[String] =
    a.asInstanceOf[ArrayData].toObjectArray(StringType)
      .map(_.asInstanceOf[UTF8String].toString).toSeq

  test("per-position sets union across update and merge") {
    val a = agg
    val b1 = a.createAggregationBuffer()
    a.update(b1, row("ab"))
    a.update(b1, row("cb"))
    val b2 = a.createAggregationBuffer()
    a.update(b2, row("ad"))
    a.merge(b1, b2)
    assert(strings(a.eval(b1)) == Seq("ac", "bd"))
  }

  test("varying lengths latch invalid -> null") {
    val a = agg
    val b = a.createAggregationBuffer()
    a.update(b, row("ab"))
    a.update(b, row("abc"))
    assert(a.eval(b) == null)
    // and survives ser/de
    assert(a.eval(a.deserialize(a.serialize(b))) == null)
  }

  test("all-empty-string column: eval agrees before/after ser/de") {
    val a = agg
    val b = a.createAggregationBuffer()
    a.update(b, row(""))
    a.update(b, row(""))
    val direct = a.eval(b)
    assert(direct != null && strings(direct).isEmpty)
    // the distributed final-aggregation path round-trips the buffer;
    // width==0 must NOT deserialize to a null sets array (NPE) or a
    // different result than the unserialized buffer
    val roundTripped = a.deserialize(a.serialize(b))
    val after = a.eval(roundTripped)
    assert(after != null && strings(after).isEmpty)
    // merging a round-tripped empty-width buffer also works
    val b2 = a.createAggregationBuffer()
    a.update(b2, row(""))
    a.merge(roundTripped, b2)
    assert(strings(a.eval(roundTripped)).isEmpty)
  }

  test("empty-width merged with real width latches invalid") {
    // "" (width 0) vs "ab" (width 2) is a length mismatch, same as any
    // other varying-length column
    val a = agg
    val b1 = a.createAggregationBuffer()
    a.update(b1, row(""))
    val b2 = a.createAggregationBuffer()
    a.update(b2, row("ab"))
    a.merge(b1, b2)
    assert(a.eval(b1) == null)
  }

  test("ser/de round-trip of a live buffer preserves sets") {
    val a = agg
    val b = a.createAggregationBuffer()
    a.update(b, row("xy"))
    a.update(b, row("zy"))
    val rt = a.deserialize(a.serialize(b))
    assert(strings(a.eval(rt)) == Seq("xz", "y"))
  }
}
