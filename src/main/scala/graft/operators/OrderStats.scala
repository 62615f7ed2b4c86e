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

  /** Exact 1-based global rank by `order` WITHOUT a single-task
    * global window: range-repartition on the ordering, per-partition
    * `row_number`, then add each partition's broadcast cumulative
    * offset — one range shuffle plus a partition-count-sized collect.
    * (The r12 audit found zipfFit and skewCensus ranking whole
    * vocabulary/key spaces in ONE unpartitioned window — a straggler
    * and an OOM at web scale; this is the shared replacement, the
    * same two-stage scheme as [[exactRanks]] and
    * `Sampling.globalOffsets`.) The ranked frame is eagerly
    * localCheckpointed so the offsets collect and the downstream
    * consumer cannot see drifted range bounds.
    */
  def withGlobalRank(df: DataFrame,
                     order: Seq[org.apache.spark.sql.Column],
                     rankCol: String,
                     numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val n =
      if (numPartitions > 0) numPartitions
      else
        try spark.conf.get("spark.sql.shuffle.partitions").toInt
        catch { case _: Throwable => 200 }
    val local = df
      .repartitionByRange(n, order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(order: _*)))
      .localCheckpoint(true)
    // one row per partition — bounded by the partition count
    val counts = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var acc = 0L
    val bases = counts.keys.toSeq.sorted.map { p =>
      val b = acc; acc += counts(p); (p, b)
    }
    local.join(broadcast(bases.toDF("__pid", "__base")),
        Seq("__pid"))
      .withColumn(rankCol, col("__base") + col("__rn"))
      .drop("__pid", "__rn", "__base")
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

  /** Per-key winsorization census — the outlier-clipping prep of a
    * feature pipeline: EXACT positional percentile bounds (the §1.3
    * rank rule, `rn = n·p DIV 100 + 1`) and how many rows each side
    * would clip. The bounds are exact VALUE COPIES (no
    * interpolation — the [[exactRanks]] contract), so a second
    * engine matches them bit-for-bit.
    *
    * Scale shape: rows reduce FIRST to per-(key, value) counts (one
    * map-side-combined shuffle — the working set is distinct values
    * per key, not rows); the cumulative window and the census run
    * over that reduced frame. Rank location happens through the
    * cumulative count, never a row sort: a value block holds rank r
    * iff `cum − c < r ≤ cum`, rows strictly below the low bound are
    * exactly the blocks with `cum < lo_rn`, rows strictly above the
    * high bound the blocks with `cum − c ≥ hi_rn`.
    */
  def winsorCensus(df: DataFrame, key: org.apache.spark.sql.Column,
                   value: org.apache.spark.sql.Column,
                   loPct: Int = 1, hiPct: Int = 99): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(0 < loPct && loPct < hiPct && hiPct < 100,
      s"need 0 < loPct < hiPct < 100: $loPct/$hiPct")
    val vc = df.where(value.isNotNull)
      .groupBy(key.as("k"), value.as("v"))
      .agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy(col("k")).orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("k"))
    vc.withColumn("cum", sum(col("c")).over(wOrd))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("lo_rn", expr(s"n * $loPct DIV 100 + 1"))
      .withColumn("hi_rn", expr(s"n * $hiPct DIV 100 + 1"))
      .groupBy(col("k"))
      .agg(max(col("n")).cast("long").as("n_rows"),
        count(lit(1)).as("n_distinct"),
        max(when(col("cum") - col("c") < col("lo_rn") &&
          col("cum") >= col("lo_rn"), col("v"))).as("lo"),
        max(when(col("cum") - col("c") < col("hi_rn") &&
          col("cum") >= col("hi_rn"), col("v"))).as("hi"),
        sum(when(col("cum") < col("lo_rn"), col("c"))
          .otherwise(0L)).cast("long").as("n_clip_low"),
        sum(when(col("cum") - col("c") >= col("hi_rn"), col("c"))
          .otherwise(0L)).cast("long").as("n_clip_high"))
  }
}
