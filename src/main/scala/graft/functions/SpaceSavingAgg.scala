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
                              var n: Long,
                              // deficit offset: an upper bound BOTH
                              // on any ABSENT item's true count in
                              // this summary's stream and on every
                              // tracked estimate's overestimate.
                              // 0 until the first eviction /
                              // truncation (the exact regime); the
                              // merge's Misra-Gries residuals are
                              // taken against it, which is what
                              // keeps error accumulation linear
                              // (<= 2n/k) instead of compounding
                              // with merge depth
                              var off: Long = 0L)

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
  * Merging uses the Misra-Gries subtract-combine (Agarwal et al.,
  * "Mergeable summaries", PODS 2012 — see [[merge]]), which keeps
  * the one-sided guarantee truth ≤ estimate ≤ truth + error with
  * error O(n/k) for the merged n under ANY merge tree — including
  * Spark's sequential one-partial-per-partition fold. When a
  * group's distinct-item count never exceeds `k`, no eviction ever
  * happens and the sketch is EXACT — the regime the DuckDB oracle
  * gate pins; the eviction/merge guarantees are spec-pinned
  * (SpaceSavingSpec) where Scala can compute the true counts.
  *
  * Determinism: eviction replaces THE minimum-count item with the
  * smallest item string (total order), and merge-truncation is a
  * uniform subtraction (no tie-break needed — residuals tied at the
  * threshold all drop), so the summary is a pure function of the
  * multiset of per-partition inputs and the merge tree — and in the
  * exact regime, of the input multiset alone.
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
          // the evicted item's true count is <= minCount, and every
          // other absent item was already bounded by a previous min
          // (monotone), so the global min IS the absent bound
          b.off = math.max(b.off, minCount)
      }
    }
    b
  }

  /** Mergeable-summaries combine (Agarwal et al., PODS 2012), done
    * through the SpaceSaving ↔ Misra-Gries isomorphism so the error
    * bound stays ≤ 2n/k under ARBITRARY merge trees — a naive
    * pointwise-sum-then-truncate compounds error exponentially in
    * merge depth, which matters because Spark folds one partial per
    * upstream partition into the final buffer sequentially.
    *
    * Steps: (1) take each side's residuals g = count − off (its
    * deficit offset — 0 for a side that never evicted, so the exact
    * regime merges exactly); (2) sum the residuals pointwise; (3) if
    * more than k remain, subtract the (k+1)-th largest residual s
    * from all and drop the non-positive — that removes ≥ (k+1)·s
    * residual mass, and since total residual mass ever added is ≤ n,
    * the s-contributions across the whole merge tree telescope to
    * ≤ n/(k+1); (4) new offset = off_b + off_o + s, added back onto
    * the surviving residuals to return to SpaceSaving (overestimate)
    * form. Per-item error = that item's recorded error where
    * tracked, the side's offset where absent — the truncation
    * subtraction cancels out of the overestimate algebra — capped
    * at the combined offset, which for Spark's update-only partials
    * folded into a merge-only final buffer is ≤ Σ n_i/k + n/(k+1)
    * < 2n/k.
    */
  override def merge(b: SpaceSavingBuffer,
                     o: SpaceSavingBuffer): SpaceSavingBuffer = {
    if (o.n > 0) {
      // Misra-Gries residuals g = count − side offset, summed; the
      // per-item error is carried alongside (absent side → its
      // offset). All counts are ≥ their side's offset, so residuals
      // of tracked items are ≥ 0.
      val g = mutable.HashMap.empty[String, Long]
      val e = mutable.HashMap.empty[String, Long]
      b.counts.foreach { case (item, c) =>
        g(item) = c - b.off
        e(item) = b.errs.getOrElse(item, 0L) +
          (if (o.counts.contains(item)) 0L else o.off)
      }
      o.counts.foreach { case (item, c) =>
        g(item) = g.getOrElse(item, 0L) + (c - o.off)
        e(item) = e.getOrElse(item, b.off) + o.errs.getOrElse(item, 0L)
      }
      val positive = g.iterator.filter(_._2 > 0L).toArray
      // s = (k+1)-th largest residual when over capacity, else 0
      val s: Long =
        if (positive.length <= k) 0L
        else {
          val vals = positive.map(_._2).sorted(Ordering[Long].reverse)
          vals(k)
        }
      val off = b.off + o.off + s
      val errCap = b.off + o.off
      b.counts.clear(); b.errs.clear()
      positive.foreach { case (item, gv) =>
        if (gv > s) {
          b.counts(item) = gv - s + off
          // both bounds are sound (the truncation subtraction
          // cancels out of count' − truth); keep the tighter
          b.errs(item) = math.min(e(item), errCap)
        }
      }
      b.n += o.n
      b.off = off
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
    out.writeLong(b.off)
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
    val off = in.readLong()
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
    new SpaceSavingBuffer(counts, errs, n, off)
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
