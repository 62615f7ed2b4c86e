package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, StructField, StructType}

/** Aggregation buffer: bounded value→count map (the same counter
  * monoid as batch [[graft.core.Stats]]); `over` latches once the
  * distinct-value cap is exceeded and the map is dropped — state per
  * group stays bounded no matter how many values stream in.
  */
final class QuartilesBuffer(var counts: mutable.HashMap[Double, Long],
                            var over: Boolean)

/** Positional quartiles as a bounded streaming-safe aggregate (the
  * §1.3 rule: over the sorted expanded multiset x[0..card−1],
  * q1 = x[card/4], q2 = x[card/2], q3 = x[3·card/4], integer division
  * — structa types.py:182-207, the same rule Stats.fromCounter applies
  * in batch).
  *
  * Returns struct(q1, q2, q3, exact). Past `maxDistinct` the buffer
  * spills to summary: quartiles null, `exact` false — the honest
  * degradation for an unbounded stream (a second ranking pass, the
  * batch over-cap strategy, does not exist in a watermarked window).
  */
case class QuartilesAgg(
    child: Expression,
    maxDistinct: Int = 4096,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuartilesBuffer]
  with UnaryLike[Expression] {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"quartiles expects a double column (cast first), " +
              s"got $other")
    }

  override def createAggregationBuffer(): QuartilesBuffer =
    new QuartilesBuffer(mutable.HashMap.empty, false)

  private def spill(b: QuartilesBuffer): Unit = {
    b.over = true
    b.counts = null
  }

  override def update(b: QuartilesBuffer,
                      input: InternalRow): QuartilesBuffer = {
    val v = child.eval(input)
    if (v != null && !b.over) {
      val d = v.asInstanceOf[Double]
      b.counts.updateWith(d) {
        case Some(n) => Some(n + 1L)
        case None => Some(1L)
      }
      if (b.counts.size > maxDistinct) spill(b)
    }
    b
  }

  override def merge(b: QuartilesBuffer,
                     o: QuartilesBuffer): QuartilesBuffer = {
    if (b.over || o.over) spill(b)
    else {
      o.counts.foreach { case (k, n) =>
        b.counts.updateWith(k) {
          case Some(m) => Some(m + n)
          case None => Some(n)
        }
      }
      if (b.counts.size > maxDistinct) spill(b)
    }
    b
  }

  override def eval(b: QuartilesBuffer): Any = {
    if (b.over)
      return new GenericInternalRow(Array[Any](null, null, null, false))
    if (b.counts.isEmpty) return null
    val keys = b.counts.keys.toArray
    java.util.Arrays.sort(keys)
    val card = b.counts.valuesIterator.sum
    // the reference walk verbatim (types.py:193-207 / batch
    // Stats.fromCounter): slot k assigned the first key whose
    // cumulative count so far has reached indexes(k)
    val indexes = Array(0L, card / 4, card / 2, 3 * card / 4)
    val summary = new Array[Any](4)
    var slot = 0
    var index = 0L
    var i = 0
    while (i < keys.length && slot < 4) {
      val key = keys(i)
      while (slot < 4 && index >= indexes(slot)) {
        summary(slot) = key
        slot += 1
      }
      index += b.counts(key)
      i += 1
    }
    while (slot < 4) {
      summary(slot) = keys(keys.length - 1)
      slot += 1
    }
    // summary(0) is the min (tracked by the window's built-in agg);
    // the struct carries the three quartiles
    new GenericInternalRow(
      Array[Any](summary(1), summary(2), summary(3), true))
  }

  override def serialize(b: QuartilesBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(b.over)
    if (!b.over) {
      out.writeInt(b.counts.size)
      b.counts.foreach { case (k, n) =>
        out.writeDouble(k)
        out.writeLong(n)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): QuartilesBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val over = in.readBoolean()
    if (over) new QuartilesBuffer(null, true)
    else {
      val n = in.readInt()
      val m = mutable.HashMap.empty[Double, Long]
      var i = 0
      while (i < n) {
        val k = in.readDouble()
        m.put(k, in.readLong())
        i += 1
      }
      new QuartilesBuffer(m, false)
    }
  }

  override def dataType: DataType = StructType(Seq(
    StructField("q1", DoubleType, nullable = true),
    StructField("q2", DoubleType, nullable = true),
    StructField("q3", DoubleType, nullable = true),
    StructField("exact", BooleanType, nullable = false)))
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(o: Int): QuartilesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuartilesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): QuartilesAgg = copy(child = newChild)
}

object QuartilesAgg {
  /** Column API: positional quartiles of a double column with a
    * bounded counter buffer.
    */
  def quartiles(c: Column, maxDistinct: Int = 4096): Column =
    org.apache.spark.sql.GraftShims.column(
      QuartilesAgg(org.apache.spark.sql.GraftShims.expression(c),
        maxDistinct).toAggregateExpression())
}
