package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for multidimensional scan pruning.
  *
  * Parquet pruning (row-group min/max, partition ranges) is
  * one-dimensional: laying data out by `user_id` makes time filters
  * scan everything, and vice versa. Z-ORDER (Morton) interleaving
  * maps two dimensions onto one curve that preserves locality in
  * BOTH: rows close in (a, b) land close in z, so clustering the
  * write by z gives every row group a tight min/max envelope on each
  * raw dimension — filters on either column prune most row groups.
  * The same layout trick Delta/Iceberg `OPTIMIZE ZORDER BY` applies,
  * built here from plain codegen'd bit arithmetic.
  *
  * At 100 TB this is a WRITE-SIDE operator: one range shuffle on the
  * z-value (`repartitionByRange` samples the distribution — no
  * driver-side histogram) plus an in-partition sort, both linear;
  * read-side benefit needs no runtime support at all, because
  * pruning acts on ordinary parquet stats.
  */
object Layout {

  /** Z-order (Morton) value of two non-negative integer columns:
    * the low `bits` bits of `a` and `b` interleaved (a → even
    * positions, b → odd), yielding a `2·bits`-bit value. Pure bit
    * arithmetic on built-in expressions — codegen'd, no UDF; the
    * identical formula runs in the SQL oracle. Inputs must already
    * be bucketed to `bits` bits (mask or modulo upstream — this
    * function does not truncate silently).
    */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
    val la = a.cast("long")
    val lb = b.cast("long")
    // disjoint bit positions: + and | are the same operation here
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(la, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(lb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)
  }

  /** Persist a frame BUCKETED by a join/aggregation key: rows are
    * hash-partitioned into `numBuckets` files per partition and
    * sorted by the key within each bucket, and the bucketing spec is
    * recorded in the catalog. Readers joining or aggregating two
    * tables bucketed the SAME way (same key, same bucket count) get
    * the exchange ELIDED — the join happens bucket-to-bucket with
    * zero shuffle, which is THE repeated-join win at 100 TB: pay the
    * shuffle once at write time, then every nightly join of the two
    * corpora is shuffle-free (and sort-free when `sorted`). The
    * BucketedJoinSpec pins the no-Exchange plan.
    *
    * Spark's bucketing lives in the catalog, so this writes a TABLE
    * (`saveAsTable` with an explicit `path`), not a bare directory.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, numBuckets: Int,
                    sorted: Boolean = true): Unit = {
    require(numBuckets > 0, s"numBuckets must be > 0: $numBuckets")
    val w = df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Cluster a frame by the z-value of two dimensions: range
    * partitions over z (each output file covers a contiguous z
    * range → a tight rectangle in (a, b) space) and z-sorted rows
    * within each partition (row groups inherit the envelope).
    * Write the result with any parquet sink; no custom reader is
    * needed to benefit.
    */
  def zOrderLayout(df: DataFrame, a: Column, b: Column,
                   bits: Int = 16,
                   numPartitions: Int = 0): DataFrame = {
    val z = zValue2(a, b, bits).as("__z")
    val withZ = df.withColumn("__z", z)
    val parted =
      if (numPartitions > 0)
        withZ.repartitionByRange(numPartitions, col("__z"))
      else withZ.repartitionByRange(col("__z"))
    parted.sortWithinPartitions(col("__z")).drop("__z")
  }

  /** Salted shuffle join for a SKEWED key distribution when the
    * build side is too big to broadcast: a handful of hot keys
    * (power-law users, empty-string defaults) would otherwise pin a
    * whole join on a few straggler tasks.
    *
    * The fact side gets a deterministic salt in [0, salt) hashed
    * from its row identity; the dim side is replicated `salt` ways
    * (explode of a literal range — `salt`× the DIM side only, which
    * is the cheap side by assumption). Joining on (key, salt) splits
    * every hot key's rows across `salt` reducers. Result is exactly
    * the plain inner join — the salt column never escapes.
    *
    * AQE's runtime skew-join handles sort-merge skew automatically
    * when statistics surface it; this operator is the explicit form
    * for when the skew is KNOWN up front (so the plan never builds
    * the skewed exchange at all) and for aggregations downstream
    * that inherit the salted partitioning. `saltFrom` must be a
    * deterministic per-row expression (e.g. a primary-key column) —
    * it only spreads rows, it never affects the join result.
    */
  def skewJoin(fact: DataFrame, dim: DataFrame, key: String,
               salt: Int, saltFrom: Column): DataFrame = {
    require(salt >= 1, s"salt must be >= 1: $salt")
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(saltFrom), lit(salt)))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }
}
