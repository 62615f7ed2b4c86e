package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aggregation buffer: per-position character sets of equal-length
  * strings; `width == -1` means "no rows yet"; `invalid` latches when
  * lengths vary or exceed the cap.
  */
final class CharSetsBuffer(var width: Int,
                           var sets: Array[mutable.Set[Char]],
                           var invalid: Boolean)

/** Custom Catalyst aggregate for the fixed-length pattern miner
  * (structa analyzer.py:671-720, SURVEY §4.2 "per-position CharClass
  * mining"): one pass, one buffer of ≤ `maxWidth` char sets per
  * partition, positionwise union on merge — replacing `maxWidth`
  * separate `collect_set(substring(c, i, 1))` aggregate buffers.
  *
  * Returns `array<string>` — position i's observed characters, sorted
  * — or null when the column is not fixed-length (or exceeds the
  * width cap), which is exactly the miner's precondition.
  */
case class CharClassAgg(
    child: Expression,
    maxWidth: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CharSetsBuffer]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): CharSetsBuffer =
    new CharSetsBuffer(-1, null, false)

  override def update(b: CharSetsBuffer,
                      input: InternalRow): CharSetsBuffer = {
    val v = child.eval(input)
    if (v != null && !b.invalid) {
      val s = v.asInstanceOf[UTF8String].toString
      if (s.length > maxWidth) { b.invalid = true; b.sets = null }
      else if (b.width == -1) {
        b.width = s.length
        b.sets = Array.fill(s.length)(mutable.Set.empty[Char])
        var i = 0
        while (i < s.length) { b.sets(i) += s.charAt(i); i += 1 }
      } else if (b.width != s.length) {
        b.invalid = true; b.sets = null
      } else {
        var i = 0
        while (i < s.length) { b.sets(i) += s.charAt(i); i += 1 }
      }
    }
    b
  }

  override def merge(b: CharSetsBuffer,
                     o: CharSetsBuffer): CharSetsBuffer = {
    if (b.invalid || o.invalid) {
      b.invalid = true; b.sets = null
    } else if (o.width != -1) {
      if (b.width == -1) { b.width = o.width; b.sets = o.sets }
      else if (b.width != o.width) { b.invalid = true; b.sets = null }
      else {
        var i = 0
        while (i < b.width) { b.sets(i) ++= o.sets(i); i += 1 }
      }
    }
    b
  }

  override def eval(b: CharSetsBuffer): Any =
    if (b.invalid || b.width == -1) null
    else new GenericArrayData(b.sets.map(s =>
      UTF8String.fromString(s.toSeq.sorted.mkString)): Array[Any])

  override def serialize(b: CharSetsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(b.invalid)
    out.writeInt(b.width)
    if (!b.invalid && b.width > 0)
      b.sets.foreach(s => out.writeUTF(s.mkString))
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CharSetsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val invalid = in.readBoolean()
    val width = in.readInt()
    // width == 0 (all-empty-string column) round-trips to an EMPTY
    // sets array, not null — eval on a deserialized buffer must agree
    // with eval on a live one (distributed final aggregation)
    val sets =
      if (invalid || width < 0) null
      else Array.fill(width)(
        mutable.Set.from(in.readUTF().iterator))
    new CharSetsBuffer(width, sets, invalid)
  }

  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(o: Int): CharClassAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CharClassAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): CharClassAgg = copy(child = newChild)
}

object CharClassAgg {
  /** Column API: per-position char sets of a string column.
    * (Spark 4 hides Column.expr; the classic bridge is
    * ExpressionUtils.)
    */
  def charClasses(c: Column, maxWidth: Int = 64): Column =
    org.apache.spark.sql.GraftShims.column(
      CharClassAgg(org.apache.spark.sql.GraftShims.expression(c),
        maxWidth).toAggregateExpression())
}
