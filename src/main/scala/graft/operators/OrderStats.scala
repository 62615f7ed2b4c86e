package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed EXACT order statistics.
  *
  * The reference computes positional quartiles by sorting the whole
  * sample in memory (structa types.py:182-207). The scalable
  * re-expression, with no driver histogram and no global sort:
  *
  *  1. `groupBy(value).count()` — one shuffle, map-side combined, so
  *     the working set is the distinct values, not the rows;
  *  2. `repartitionByRange` + partition-local sort of the distinct
  *     values — a range shuffle of the (already reduced) counts;
  *  3. per-partition count sums to the driver (one long per
  *     partition), which locate each requested rank's partition;
  *  4. one partition-local cumulative walk emits the rank holders —
  *     at most `ranks.length` values cross back to the driver.
  *
  * Both jobs share the shuffle files, so the scan and the groupBy run
  * once. Results are exact value copies — no floating-point
  * interpolation anywhere (built-in `percentile` at p = k/(n−1) can
  * land one ulp off an integer position and interpolate, which breaks
  * bit-exact cross-engine comparison).
  */
object OrderStats {

  /** x[k] for each 0-based rank k over the column's non-null values
    * (ranks need not be distinct; result is in input-rank order).
    */
  def exactRanks(df: DataFrame, valueCol: String, ranks: Seq[Long],
                 numPartitions: Int = 32): Seq[Double] = {
    if (ranks.isEmpty) return Seq.empty
    val counts = df.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .repartitionByRange(numPartitions, col("v").asc)
      .sortWithinPartitions(col("v").asc)
    val rdd = counts.rdd.map(r => (r.getDouble(0), r.getLong(1)))
    val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(s += _._2)
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val total = offsets.last
    require(ranks.forall(k => k >= 0 && k < total),
      s"ranks $ranks out of range for $total values")
    // rank index → (partition, local rank)
    val located = ranks.zipWithIndex.map { case (k, idx) =>
      val p = offsets.lastIndexWhere(_ <= k, offsets.length - 2)
      (p, (k - offsets(p), idx))
    }
    val byPart = located.groupBy(_._1).map { case (p, xs) =>
      p -> xs.map(_._2).sortBy(_._1)
    }
    val found = rdd.mapPartitionsWithIndex { (i, it) =>
      byPart.get(i) match {
        case None => Iterator.empty
        case Some(local) =>
          val out = Vector.newBuilder[(Int, Double)]
          var cum = 0L
          var ti = 0
          while (ti < local.length && it.hasNext) {
            val (v, c) = it.next()
            val hi = cum + c
            while (ti < local.length && local(ti)._1 < hi) {
              out += ((local(ti)._2, v))
              ti += 1
            }
            cum = hi
          }
          out.result().iterator
      }
    }.collect()
    found.sortBy(_._1).map(_._2).toSeq
  }

  /** The reference's positional quartile rule (§1.3: min = x[0],
    * q1 = x[n/4], q2 = x[n/2], q3 = x[3n/4], max = x[n−1], 0-based
    * integer division) as exact distributed rank lookups.
    */
  def positionalQuartiles(df: DataFrame, valueCol: String,
                          numPartitions: Int = 32): Seq[Double] = {
    val n = df.select(col(valueCol)).where(col(valueCol).isNotNull)
      .count()
    if (n == 0) return Seq.empty
    exactRanks(df, valueCol,
      Seq(0L, n / 4, n / 2, 3 * n / 4, n - 1), numPartitions)
  }
}
