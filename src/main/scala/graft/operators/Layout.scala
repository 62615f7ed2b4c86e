package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** What [[Layout.compactFiles]] did: input/output file counts and
  * byte totals (post-rewrite bytes re-listed, since parquet
  * re-encoding changes compressed size).
  */
final case class CompactionReport(filesBefore: Int, bytesBefore: Long,
                                  filesAfter: Int, bytesAfter: Long,
                                  targetBytes: Long)

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

  /** Hilbert-curve index of two non-negative integer columns — the
    * strictly-better-locality alternative to [[zValue2]]: every unit
    * step along the curve moves one cell, so contiguous index
    * ranges are compact blobs with no Morton seam jumps. Native
    * codegen'd expression ([[graft.functions.HilbertExpr]]) because
    * the per-level rotation carries sequential state that cannot
    * unroll into independent bit arithmetic. Same masked-input
    * contract as [[zValue2]].
    */
  def hilbertValue2(a: Column, b: Column, bits: Int = 16): Column =
    graft.functions.HilbertExpr.hilbert2(a, b, bits)

  /** [[zOrderLayout]] on the Hilbert curve: range partitions over
    * the Hilbert index, index-sorted rows within each.
    */
  def hilbertLayout(df: DataFrame, a: Column, b: Column,
                    bits: Int = 16,
                    numPartitions: Int = 0): DataFrame = {
    val h = hilbertValue2(a, b, bits).as("__h")
    val withH = df.withColumn("__h", h)
    val parted =
      if (numPartitions > 0)
        withH.repartitionByRange(numPartitions, col("__h"))
      else withH.repartitionByRange(col("__h"))
    parted.sortWithinPartitions(col("__h")).drop("__h")
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

  /** Small-file compaction: bin-pack a flat parquet directory into
    * files of ~`targetBytes` — the most common lakehouse maintenance
    * operation (streaming sinks, per-task writers, and incremental
    * appends all fragment tables into thousands of sub-MB files,
    * and at 100 TB each tiny file costs a scan task plus a
    * footer/name-node round trip).
    *
    * The output file count derives from the INPUT's listed bytes
    * (one driver-side metadata listing, no data read), so the
    * rewrite is a single round-robin exchange — or, when `sortBy`
    * is given, a range exchange plus in-partition sort that
    * RE-ESTABLISHES the clustering contract ([[zOrderLayout]]'s
    * envelope survives compaction instead of being shredded by
    * round-robin). Rewrite goes to a staging directory first and
    * swaps in with two metadata operations; a manifest-committing
    * table format would make the swap atomic — plain parquet
    * directories get the smallest practical exposure window.
    */
  def compactFiles(spark: SparkSession, path: String,
                   targetBytes: Long,
                   sortBy: Seq[String] = Nil): CompactionReport = {
    require(targetBytes > 0, s"targetBytes must be > 0: $targetBytes")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(
      spark.sessionState.newHadoopConf())
    def listParquet() = fs.listStatus(hPath)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val before = listParquet()
    require(before.nonEmpty, s"no parquet files under $path")
    val bytesBefore = before.map(_.getLen).sum
    val nOut = math.max(1L,
      (bytesBefore + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(path)
    val out =
      if (sortBy.nonEmpty)
        df.repartitionByRange(nOut, sortBy.map(col): _*)
          .sortWithinPartitions(sortBy.map(col): _*)
      else df.repartition(nOut)
    val tmp = new org.apache.hadoop.fs.Path(
      path.stripSuffix("/") + ".__compact_tmp")
    out.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(hPath, true)
    require(fs.rename(tmp, hPath),
      s"compaction swap failed: could not rename $tmp to $hPath")
    val after = listParquet()
    CompactionReport(before.length, bytesBefore,
      after.length, after.map(_.getLen).sum, targetBytes)
  }

  /** What [[pruningCensus]] found in the footers: how many files /
    * row groups a `[lo, hi]` range predicate on `column` must
    * actually read, against the totals — the metadata-only answer to
    * "is this layout worth it" BEFORE any scan runs. `needed` uses
    * the same overlap rule parquet readers apply (skip iff
    * `max < lo || min > hi`); row groups without statistics count as
    * needed (a reader cannot skip what it cannot bound).
    */
  final case class PruningReport(filesTotal: Int, filesNeeded: Int,
                                 rowGroupsTotal: Int,
                                 rowGroupsNeeded: Int,
                                 rowsTotal: Long, rowsNeeded: Long)

  /** Footer-statistics pruning census — the layout ADVISOR that
    * quantifies what [[zOrderLayout]] / [[hilbertLayout]] /
    * sort-on-write buys: driver-side parquet-footer reads (KBs per
    * file, zero Spark jobs — the [[ScanStats.fastRowCount]]
    * discipline) count the files and row groups a long-range
    * predicate can skip. Run it on two candidate layouts of the same
    * data and keep the one with fewer `rowGroupsNeeded`.
    */
  def pruningCensus(spark: SparkSession, path: String,
                    column: String, lo: Long, hi: Long)
      : PruningReport = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val hPath = new Path(path)
    val conf = spark.sessionState.newHadoopConf()
    val fs = hPath.getFileSystem(conf)
    val files = fs.listStatus(hPath)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    require(files.nonEmpty, s"no parquet files under $path")
    import scala.collection.parallel.CollectionConverters._
    val perFile = files.par.map { f =>
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(f.getPath, conf))
      try {
        val md = r.getFooter.getBlocks
        import scala.jdk.CollectionConverters._
        val groups = md.asScala.map { block =>
          val cc = block.getColumns.asScala.find(
            _.getPath.toDotString == column)
          val needed = cc match {
            case Some(c)
                if c.getStatistics != null &&
                  !c.getStatistics.isEmpty =>
              val st = c.getStatistics
              val mn = st.genericGetMin match {
                case n: Number => n.longValue()
                case other => other.toString.toLong
              }
              val mx = st.genericGetMax match {
                case n: Number => n.longValue()
                case other => other.toString.toLong
              }
              !(mx < lo || mn > hi)
            case _ => true // no stats → the reader cannot skip
          }
          (needed, block.getRowCount)
        }.toSeq
        (groups.length, groups.count(_._1),
          groups.map(_._2).sum, groups.filter(_._1).map(_._2).sum,
          groups.exists(_._1))
      } finally r.close()
    }.toList
    PruningReport(
      filesTotal = perFile.length,
      filesNeeded = perFile.count(_._5),
      rowGroupsTotal = perFile.map(_._1).sum,
      rowGroupsNeeded = perFile.map(_._2).sum,
      rowsTotal = perFile.map(_._3).sum,
      rowsNeeded = perFile.map(_._4).sum)
  }

  /** Compact a BUCKETED table's per-bucket file fragments into a new
    * table carrying the identical bucketing contract: repartitioning
    * on the bucket key with exactly `numBuckets` partitions aligns
    * Spark's exchange hash (murmur3 pmod n) with the bucket-file
    * hash, so the writer emits ONE file per bucket instead of one
    * per (task, bucket) fragment — and every zero-exchange join the
    * original table participated in works unchanged against the
    * compacted one (BucketedJoinSpec pins the no-Exchange plan).
    * A new table/path is required because Spark refuses to overwrite
    * a table that is also the read source.
    */
  def compactBucketed(spark: SparkSession, fromTable: String,
                      toTable: String, toPath: String): Unit = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(fromTable))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"$fromTable is not bucketed; use compactFiles for plain dirs"))
    val key = spec.bucketColumnNames.head
    // read the table's FILES as plain parquet, not via the catalog:
    // a bucketed scan advertises HashPartitioning(key, n), which
    // makes the planner elide the alignment repartition — and then
    // DisableUnnecessaryBucketedScan can downgrade the scan to
    // arbitrary file splits, leaving the write with one file per
    // (task, bucket) again. A plain scan keeps the exchange in the
    // plan, so tasks align 1:1 with buckets.
    val df = spark.read.parquet(meta.location.toString)
      .repartition(spec.numBuckets, col(key))
    writeBucketed(df, toTable, toPath, key, spec.numBuckets,
      sorted = spec.sortColumnNames.nonEmpty)
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

  /** Key-skew census — the "should this join be salted" advisor
    * pairing with [[skewJoin]]: per-key row counts summarized as an
    * EXACT-RATIONAL Gini concentration index. With counts x_1 ≤ …
    * ≤ x_n (rank-ordered, key tie-break),
    *
    *   gini = Σ (2i − n − 1)·x_i / (n · Σ x)   =  gini_num / gini_den
    *
    * — 0 for perfectly uniform keys, → 1 for one dominant key; no
    * division is performed (both engines carry the integers), and
    * `salt_advised` applies the caller's threshold num/den by
    * cross-multiplication. The rank window runs over the KEYS-sized
    * count frame, never the raw rows — sized for JOIN-KEY spaces
    * (dimension/partner keys, ≲10^7 distinct); a web-scale key
    * space (URLs, users) should read the sketch profiles (q76/q85)
    * instead of an exact global rank.
    */
  def skewCensus(df: DataFrame, key: Column,
                 thresholdNum: Long = 2L,
                 thresholdDen: Long = 5L): DataFrame = {
    require(thresholdNum >= 0 && thresholdDen > 0,
      s"threshold must be a non-negative rational: " +
        s"$thresholdNum/$thresholdDen")
    val dec = "decimal(38,0)"
    val kc = df.groupBy(key.as("k"))
      .agg(count(lit(1)).cast(dec).as("x"))
    // TWO-STAGE exact global rank (range partitions + broadcast
    // offsets) — an unpartitioned rank window would sort every key
    // in one task; and the former global `n`/`sx` windows fold into
    // the final aggregate algebraically:
    //   Σ(2i − n − 1)·x  =  2·Σ(i·x) − (n + 1)·Σx
    val ranked = graft.operators.OrderStats.withGlobalRank(kc,
      Seq(col("x").asc, col("k").asc_nulls_first), "__i")
    ranked.agg(
        count(lit(1)).cast(dec).as("n"),
        sum(col("x")).cast(dec).as("sx"),
        sum(col("__i").cast(dec) * col("x")).cast(dec).as("six"),
        max(col("x")).cast("long").as("mx"))
      .select(
        col("n").cast("long").as("n_keys"),
        col("sx").cast("long").as("n_rows"),
        (lit(2).cast(dec) * col("six") -
          (col("n") + lit(1).cast(dec)) * col("sx"))
          .cast("long").as("gini_num"),
        (col("n") * col("sx")).cast("long").as("gini_den"),
        col("mx").as("max_key_rows"))
      .withColumn("salt_advised",
        col("gini_num") * thresholdDen >
          col("gini_den") * thresholdNum)
  }
}
