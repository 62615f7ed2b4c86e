package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aggregation buffer for SpaceSaving: at most `k` tracked items with
  * their (over-)estimated counts and per-item error allowance, plus
  * the total stream length seen so far.
  */
final class SpaceSavingBuffer(val counts: mutable.HashMap[String, Long],
                              val errs: mutable.HashMap[String, Long],
                              var n: Long)

/** SpaceSaving heavy-hitters sketch (Metwally, Agrawal, El Abbadi,
  * "Efficient computation of frequent and top-k elements in data
  * streams", ICDT 2005) as a Catalyst `TypedImperativeAggregate` —
  * the fixed-memory, MERGEABLE frequency summary that replaces an
  * exact `GROUP BY item` when the item domain is unbounded (tokens,
  * URLs, n-grams at corpus scale).
  *
  * State is at most `k` counters per group regardless of stream
  * length, and partial states combine map-side like any other
  * aggregate, so the shuffle carries O(k) per group instead of one
  * row per distinct item. Guarantees (single summary): every item
  * with true frequency > n/k is tracked, and every tracked estimate
  * overestimates the truth by at most its recorded error ≤ n/k.
  * Merging (Agarwal et al., "Mergeable summaries", PODS 2012) sums
  * counts pointwise, then truncates to the k largest; the combined
  * summary keeps |estimate − truth| ≤ n/k for the merged n. When a
  * group's distinct-item count never exceeds `k`, no eviction ever
  * happens and the sketch is EXACT — the regime the DuckDB oracle
  * gate pins; the eviction/merge guarantees are spec-pinned
  * (SpaceSavingSpec) where Scala can compute the true counts.
  *
  * Determinism: eviction replaces THE minimum-count item with the
  * smallest item string (total order), and merge-truncation keeps
  * the k largest under (count desc, item asc), so the summary is a
  * pure function of the multiset of per-partition inputs and the
  * merge tree — and in the exact regime, of the input multiset alone.
  *
  * Returns `map<string,long>` of tracked item → estimated count.
  */
case class SpaceSavingAgg(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer]
  with UnaryLike[Expression] {

  require(k > 0, s"SpaceSaving needs k > 0, got $k")

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(mutable.HashMap.empty, mutable.HashMap.empty, 0L)

  override def update(b: SpaceSavingBuffer,
                      input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      b.n += 1
      b.counts.get(item) match {
        case Some(c) => b.counts(item) = c + 1
        case None if b.counts.size < k =>
          b.counts(item) = 1L
          b.errs(item) = 0L
        case None =>
          // evict the min-count counter (ties: smallest item string)
          var minItem: String = null
          var minCount = Long.MaxValue
          val it = b.counts.iterator
          while (it.hasNext) {
            val (i, c) = it.next()
            if (c < minCount || (c == minCount &&
                (minItem == null || i < minItem))) {
              minItem = i; minCount = c
            }
          }
          b.counts.remove(minItem)
          b.errs.remove(minItem)
          b.counts(item) = minCount + 1
          b.errs(item) = minCount
      }
    }
    b
  }

  override def merge(b: SpaceSavingBuffer,
                     o: SpaceSavingBuffer): SpaceSavingBuffer = {
    if (o.n > 0) {
      b.n += o.n
      o.counts.foreach { case (item, c) =>
        b.counts.get(item) match {
          case Some(c0) =>
            b.counts(item) = c0 + c
            b.errs(item) = b.errs(item) + o.errs(item)
          case None =>
            b.counts(item) = c
            b.errs(item) = o.errs(item)
        }
      }
      if (b.counts.size > k) {
        val keep = b.counts.toSeq
          .sortBy { case (item, c) => (-c, item) }
          .take(k).map(_._1).toSet
        val drop = b.counts.keysIterator.filterNot(keep).toSeq
        drop.foreach { i => b.counts.remove(i); b.errs.remove(i) }
      }
    }
    b
  }

  override def eval(b: SpaceSavingBuffer): Any = {
    val items = b.counts.toSeq.sortBy { case (item, c) => (-c, item) }
    ArrayBasedMapData(
      items.map(p => UTF8String.fromString(p._1)).toArray[Any],
      items.map(_._2).toArray[Any])
  }

  override def serialize(b: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.n)
    out.writeInt(b.counts.size)
    b.counts.foreach { case (item, c) =>
      // length-prefixed raw UTF-8, NOT writeUTF: tracked items are
      // arbitrary tokens and writeUTF throws past 64 KB (a single
      // base64 blob or minified-JS "token" would kill the shuffle)
      val ib = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(ib.length)
      out.write(ib)
      out.writeLong(c)
      out.writeLong(b.errs.getOrElse(item, 0L))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val sz = in.readInt()
    val counts = mutable.HashMap.empty[String, Long]
    val errs = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < sz) {
      val len = in.readInt()
      val ib = new Array[Byte](len)
      in.readFully(ib)
      val item =
        new String(ib, java.nio.charset.StandardCharsets.UTF_8)
      counts(item) = in.readLong()
      errs(item) = in.readLong()
      i += 1
    }
    new SpaceSavingBuffer(counts, errs, n)
  }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): SpaceSavingAgg = copy(child = newChild)
}

object SpaceSavingAgg {
  /** Column API: SpaceSaving top-k frequency sketch of a string
    * column → `map<string,long>` of item → estimated count.
    */
  def spaceSaving(c: Column, k: Int = 64): Column =
    org.apache.spark.sql.GraftShims.column(
      SpaceSavingAgg(org.apache.spark.sql.GraftShims.expression(c),
        k).toAggregateExpression())
}
