package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `Dataset.sample` draws from a seeded RNG whose selection depends on
  * partitioning — re-running on a repartitioned corpus picks different
  * rows. Corpus curation needs the opposite: the SAME rows selected on
  * every run, every engine, any partitioning, so ablations and
  * decontamination reruns stay comparable. Hash sampling gives exactly
  * that: a row is kept iff the integer value of the first 8 hex chars
  * of `md5(key)` falls under `num/den` of the 32-bit space — a pure
  * per-row projection (no shuffle, no state) with an identical DuckDB
  * form (`CAST('0x' || substr(md5(k), 1, 8) AS BIGINT)`).
  */
object Sampling {

  /** The 32-bit hash bucket of a key (0 ≤ h < 2^32). */
  def hash32(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long")

  /** Keep rows whose key hashes under num/den of the hash space.
    * Integer cross-multiplication — no float thresholds, no
    * engine-specific rounding.
    */
  def hashSample(df: DataFrame, key: Column, num: Long,
                 den: Long): DataFrame = {
    require(den > 0 && num >= 0 && num <= den,
      s"rate must be a fraction in [0, 1]: $num/$den")
    // hash32 < 2^32 and den ≤ 2^30 keep hash·den < 2^62 — no silent
    // Long overflow flipping the predicate
    require(den <= (1L << 30),
      s"denominator above 2^30 would overflow the comparison: $den")
    df.where(hash32(key) * den < lit(num) * lit(4294967296L))
  }

  /** Importance (weighted) sampling: keep each row with probability
    * `num/den` where `num` is a PER-ROW integer weight (capped at
    * `den` — weight ≥ 1 keeps the row always). Same deterministic
    * hash down-set as [[hashSample]]: membership is a pure function
    * of (key, weight), so re-runs, engines, and partitionings agree,
    * and raising a row's weight can only ADD it (nested samples).
    * `den ≤ 2^30` keeps both comparison sides under 2^62 — no silent
    * Long overflow flipping the predicate.
    */
  def weightedSample(df: DataFrame, key: Column, num: Column,
                     den: Long): DataFrame = {
    require(den > 0 && den <= (1L << 30),
      s"denominator must be in (0, 2^30]: $den")
    // a NULL weight means missing data → weight 0 (drop), NOT full
    // weight (Spark's least() skips nulls, which would silently
    // always-keep such rows)
    df.where(hash32(key) * den <
      least(coalesce(num.cast("long"), lit(0L)), lit(den)) *
        lit(4294967296L))
  }

  /** Disjoint deterministic split (train/heldout): bucket b of n by
    * the same hash, so splits are stable and non-overlapping across
    * runs and engines.
    */
  def hashSplit(df: DataFrame, key: Column, bucket: Int,
                of: Int): DataFrame = {
    require(of > 0 && bucket >= 0 && bucket < of,
      s"bucket must be in [0, $of): $bucket")
    df.where(pmod(hash32(key), lit(of.toLong)) === bucket.toLong)
  }

  /** Leakage-free train/test split: assign every row a split by key
    * hash (test = residue `testBucket` of `of`, the [[hashSplit]]
    * convention), then MOVE to train every test document with a
    * cross-split MinHash band collision — a near-duplicate of a
    * training document sitting in the eval split silently inflates
    * every benchmark built from it, which is the leakage direction
    * that matters.
    *
    * The guard is candidate-level (band collision, not verified
    * Jaccard) ON PURPOSE: eval integrity wants the conservative
    * side, and the move direction only ever grows train. Scale
    * shape: [[graft.operators.Dedup.lshPairsAgainst]] keys the join
    * on band signatures with per-side hot-bucket caps, and the test
    * side is a 1/`of` slice — the 100 TB cost is the linear
    * signature pass plus a test-sized band join, never pairwise.
    *
    * Returns `df` plus a `split` column (`train` | `test`).
    */
  def leakageFreeSplit(df: DataFrame, idCol: Column, textCol: Column,
                       of: Int = 5, testBucket: Int = 0,
                       numHashes: Int = 64, bandSize: Int = 4,
                       shingleK: Int = 5,
                       maxBucketSize: Long = 10000L): DataFrame = {
    require(of > 0 && testBucket >= 0 && testBucket < of,
      s"testBucket must be in [0, $of): $testBucket")
    val isTest = pmod(hash32(idCol), lit(of.toLong)) ===
      testBucket.toLong
    val leaked = graft.operators.Dedup.lshPairsAgainst(
        df.where(!isTest), idCol, textCol,
        df.where(isTest), idCol, textCol,
        numHashes, bandSize, shingleK, maxBucketSize)
      .select(col("new_id").as("__leak_id")).distinct()
    df.join(leaked, idCol === col("__leak_id"), "left")
      .withColumn("split",
        when(isTest && col("__leak_id").isNull, lit("test"))
          .otherwise(lit("train")))
      .drop("__leak_id")
  }

  /** Deterministic shard id in [0, numShards): the 32-bit hash space
    * cut into `numShards` equal ranges, `shard = h·S >> 32` — exact
    * integer arithmetic (h < 2^32 and S ≤ 2^20 keep the product
    * under 2^52), the same range-of-hash-space idiom as
    * [[hashSample]], so a row's shard is a pure function of its key:
    * stable across runs, engines, partitionings, and CLUSTER SIZES
    * (re-running the export on 10 or 1000 executors moves no row).
    * Because shards are hash RANGES, shard s of an S-shard export is
    * the union of shards 2s and 2s+1 of a 2S-shard export — resharding
    * refines, never reshuffles. Null keys get a null shard (surface
    * them, don't hide them in shard 0). Shards are balanced in
    * expectation for distinct keys; duplicate keys land together by
    * design (a key's rows belong in one shard).
    */
  def shardAssign(key: Column, numShards: Int): Column = {
    require(numShards > 0 && numShards <= (1 << 20),
      s"numShards must be in [1, 2^20]: $numShards")
    shiftright(hash32(key) * lit(numShards.toLong), 32)
  }

  /** Reproducible training-data export: write `df` as `numShards`
    * hash-range shards (`<path>/shard=N/`), each shard one sorted
    * parquet file — the "shuffle once, globally, deterministically"
    * step before sequence packing / epoch streaming, without any
    * global sort: rows route to their [[shardAssign]] range (one
    * shuffle on the shard id), and each shard sorts locally by
    * (hash, key) — a deterministic pseudo-random order WITHIN the
    * shard too, so readers consuming shards round-robin see a stable
    * global permutation. At 100 TB / 10k shards that is 10 GB per
    * sort task, spill-friendly, with no single-task bottleneck
    * anywhere.
    */
  def writeShards(df: DataFrame, key: Column, numShards: Int,
                  path: String): Unit = {
    require(!df.columns.contains("shard"),
      "input already has a 'shard' column")
    // range-partition on the shard id (not hash): hashing the shard
    // id collides shards into the same task balls-in-bins style
    // (several full shards in one task, others empty); ranging gives
    // ~one shard per task. Shard CONTENT is unaffected either way —
    // each shard still lands wholly in one task and one file.
    df.withColumn("shard", shardAssign(key, numShards))
      .repartitionByRange(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), hash32(key), key)
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** Per-group hash sampling rates — the data-mixing step of corpus
    * curation: each domain/source is kept at its own rate (e.g.
    * temperature-scaled mixing weights computed offline), groups not
    * named fall back to `default`, and membership is the same
    * deterministic hash down-set as [[hashSample]], so a row kept at
    * rate 1/4 is also kept at every rate above 1/4 — nested samples,
    * ablation-stable across runs, engines, and partitionings.
    *
    * Scale shape: the rate lookup is a map literal
    * (`element_at(typedLit(...))`), so even thousands of groups stay a
    * pure codegen'd projection + filter — no join, no shuffle, no
    * broadcast; the filter sits directly on the scan. Rates are exact
    * integer fractions compared by cross-multiplication (hash·den <
    * num·2^32): no float thresholds, no engine-specific rounding —
    * the same predicate is expressible verbatim in the SQL oracle.
    */
  def mixtureSample(df: DataFrame, group: Column, key: Column,
                    rates: Map[String, (Long, Long)],
                    default: (Long, Long) = (1L, 1L)): DataFrame = {
    // validate the group rates and the default SEPARATELY (merging
    // them into one name-keyed map would let a group literally named
    // like the sentinel shadow its own rate past validation)
    (rates.toSeq.map { case (g, r) => (s"group $g", r) } :+
        (("default", default)))
      .foreach { case (what, (num, den)) =>
        require(den > 0 && num >= 0 && num <= den,
          s"rate for $what must be a fraction in [0, 1]: $num/$den")
        // hash32 < 2^32 and den ≤ 2^30 keep hash·den < 2^62 — no
        // silent Long overflow flipping the predicate
        require(den <= (1L << 30),
          s"denominator for $what above 2^30 would overflow: $den")
      }
    val numMap = typedLit(rates.map { case (g, (n, _)) => g -> n })
    val denMap = typedLit(rates.map { case (g, (_, d)) => g -> d })
    val g = group.cast("string")
    val num = coalesce(element_at(numMap, g), lit(default._1))
    val den = coalesce(element_at(denMap, g), lit(default._2))
    df.where(hash32(key) * den < num * lit(4294967296L))
  }

  /** Down-sample each group to an expected TOKEN budget (not a row
    * count): a row is kept iff `hash32(key) · total_tokens(group) <
    * budget · 2^32`, i.e. at rate `budget / total_tokens` — so the
    * kept rows carry ≈`budget` tokens per group in expectation.
    * Mixture weighting by token mass is how training mixes are
    * actually specified ("200 B tokens of web, 30 B of code"), and
    * row-rate sampling gets it wrong whenever document lengths differ
    * across groups.
    *
    * Two passes: (1) one partial-aggregating groupBy for per-group
    * token totals (G rows — broadcast back, never shuffled into the
    * corpus); (2) a pure filter on the scan. Membership is the same
    * hash down-set as [[hashSample]]: raising the budget only ADDS
    * rows (nested samples), and selection is stable across runs,
    * engines, and partitionings for a fixed corpus. The cutoff
    * compare runs in DECIMAL(38,0) — `total` can exceed the 2^30
    * cross-multiplication cap of [[hashSample]] by orders of
    * magnitude (100 TB ≈ 2^44 tokens) without overflow, and DuckDB's
    * HUGEINT arithmetic reproduces it exactly.
    *
    * Groups whose total is at or under budget keep every row. The
    * budget is an EXPECTATION (hash uniformity), not an exact cut —
    * use [[packBins]] downstream for exact sequence budgets.
    */
  def tokenBudgetSample(df: DataFrame, group: Column, key: Column,
                        tokens: Column, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    val totals = df.groupBy(group.as("__g"))
      .agg(sum(tokens.cast("long")).as("__total"))
    val dec = "decimal(38,0)"
    df.join(broadcast(totals), group === col("__g"), "left")
      .where(hash32(key).cast(dec) * col("__total").cast(dec) <
        lit(budget).cast(dec) * lit(4294967296L).cast(dec))
      .drop("__g", "__total")
  }

  /** Keep at most `quota` rows per group, chosen deterministically:
    * the quota hash-smallest keys (ties broken by the key itself), so
    * every run, engine, and partitioning selects the same rows — the
    * per-domain cap step of corpus curation ("at most N documents per
    * source") with ablation-stable membership.
    *
    * Scale shape — the naive form is `row_number() OVER (PARTITION BY
    * group ORDER BY hash)` then `rn <= quota`, which sorts EVERY group
    * in full; one web-scale domain means one task sorting billions of
    * rows. Instead:
    *
    *   1. per-group counts (map-side partial agg; output is
    *      #groups rows, tiny);
    *   2. a per-group hash cutoff from the uniformity of `hash32`:
    *      keeping `h < ceil(2^32·target/cnt)` with
    *      `target = quota + 8·sqrt(quota) + 32` leaves ~target
    *      expected survivors, and the +8σ margin makes fewer-than-
    *      quota survivors vanishingly unlikely;
    *   3. one verification action: per-group survivor counts vs
    *      `min(quota, cnt)` — on the (never-observed) shortfall the
    *      margin widens 8× and re-verifies, degrading to "keep all"
    *      (the exact naive form) after three attempts;
    *   4. the row_number window runs only over survivors — every
    *      group's window input is ~target rows regardless of corpus
    *      size.
    *
    * Correctness is exact, not approximate: survivors are a down-set
    * in hash order (strict `<`, so hash-ties never split), hence the
    * global quota-smallest rows per group are all survivors once the
    * verified count reaches `min(quota, cnt)`. Three column-pruned
    * corpus scans (counts, verify, final) replace the giant-group
    * sort; the cutoff join broadcasts #groups rows.
    */
  def quotaSample(df: DataFrame, group: Column, key: Column,
                  quota: Int): DataFrame = {
    require(quota >= 0, s"quota must be non-negative: $quota")
    if (quota == 0) return df.limit(0)
    import org.apache.spark.sql.expressions.Window
    val full = 4294967296L // 2^32: above every hash32 value
    val tagged = df.withColumn("__h", hash32(key))
      .withColumn("__g", group)
    val cnts = tagged.groupBy(col("__g")).agg(count(lit(1)).as("__cnt"))
    val target = quota.toDouble + 8.0 * math.sqrt(quota.toDouble) + 32.0

    def survivors(widen: Double): DataFrame = {
      val cutoffs = cnts.select(col("__g").as("__g2"),
        when(col("__cnt") <= quota || lit(widen) >= lit(512.0), lit(full))
          .otherwise(least(lit(full),
            ceil(lit(target * widen) / col("__cnt") * lit(full.toDouble))
              .cast("long"))).as("__cutoff"))
      tagged.join(broadcast(cutoffs), col("__g") <=> col("__g2"))
        .where(col("__h") < col("__cutoff"))
        .drop("__g2", "__cutoff")
    }

    // widen 1 -> 8 -> 64 -> 512 (the last forces cutoff = 2^32, the
    // exact keep-all fallback, so the loop always terminates green)
    val widen = Iterator(1.0, 8.0, 64.0, 512.0).find { w =>
      w >= 512.0 || {
        val scnts = survivors(w).groupBy(col("__g").as("__g3"))
          .agg(count(lit(1)).as("__scnt"))
        quotaShortfall(cnts, scnts, quota).isEmpty
      }
    }.get

    val w = Window.partitionBy(col("__g"))
      .orderBy(col("__h").asc, key.asc_nulls_first)
    survivors(widen)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= quota)
      .drop("__h", "__g", "__rn")
  }

  /** The [[quotaSample]] verification predicate: groups whose
    * survivor count fell short of `min(quota, cnt)`. Driven from the
    * FULL group-count side (`cnts`) with a null-safe left join, so a
    * null-keyed group and a group with ZERO survivors are both
    * visible as shortfalls — a survivor-side inner join would let
    * either escape detection and silently under-fill its quota.
    * `cnts` carries (__g, __cnt); `scnts` carries (__g3, __scnt).
    */
  private[operators] def quotaShortfall(cnts: DataFrame,
                                        scnts: DataFrame,
                                        quota: Int): DataFrame =
    cnts.join(scnts, col("__g") <=> col("__g3"), "left")
      .where(coalesce(col("__scnt"), lit(0L)) <
        least(lit(quota.toLong), col("__cnt")))

  /** Deterministic sequence packing — the shard-and-pack step before
    * training: rows shard by key hash (a reproducible global
    * shuffle), order within each shard by (hash, key), and fill
    * fixed-token-budget bins by cumulative offset — a row whose
    * running START offset falls in [k·budget, (k+1)·budget) packs
    * into bin k. Returns the input plus (shard, bin) columns.
    *
    * Scale shape: one shuffle on shard, one window per shard (the
    * cumulative sum — each shard's rows stream through one sort,
    * shard count chosen to bound shard size), nothing corpus-global.
    * Every assignment is a pure function of the key set, so re-runs,
    * engines, and partitionings agree — ablations can cite
    * (shard, bin) coordinates.
    */
  /** Temperature-smoothed group sampling at α = 1/2 — the
    * multilingual-LM rebalancing rule (sample share ∝ n^α flattens
    * head groups without drowning the tail; α = 1/2 is the classic
    * smoothing exponent). Keep probability per group:
    * `min(1, (num/den) · isqrt(n_g) / n_g)` — so a group keeps
    * ~(num/den)·sqrt(n_g) rows — decided per row by the
    * deterministic md5 hash threshold in EXACT integers: isqrt is
    * the exact integer square root (double sqrt + a ±1 correction,
    * engine-portable), and the comparison cross-multiplies in
    * decimal(38,0) (hash · n_g can pass 2^63 at corpus scale).
    *
    * Shape: one keyed count, the G-row frame broadcast back, then a
    * pure codegen'd filter over the scan — the mixtureSample /
    * rebalancedSample family.
    */
  def temperatureSample(df: DataFrame, group: Column, key: Column,
                        num: Long = 1L, den: Long = 1L): DataFrame = {
    require(num > 0 && den > 0, s"need num/den > 0: $num/$den")
    val counts = df.groupBy(group.as("__g"))
      .agg(count(lit(1)).as("__n"))
    val r0 = floor(sqrt(col("__n").cast("double"))).cast("long")
    val isqrt = when(r0 * r0 > col("__n"), r0 - 1L)
      .when((r0 + 1L) * (r0 + 1L) <= col("__n"), r0 + 1L)
      .otherwise(r0)
    val withR = counts.withColumn("__r", isqrt)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    df.join(broadcast(withR), group === col("__g"))
      .where(dec(hash32(key)) * dec(col("__n")) * lit(den) <
        dec(lit(4294967296L)) * lit(num) * dec(col("__r")))
      .drop("__g", "__n", "__r")
  }

  /** Global EXCLUSIVE prefix sum of `len` in ascending `key` order —
    * the "lay the corpus out as one contiguous token stream"
    * position assigner: every document learns the exact offset its
    * tokens start at in the packed corpus (pairs with
    * [[packBins]]/[[writeShards]] for the physical layout; keys must
    * be unique for the order to be total). Returns (id, len,
    * tok_offset).
    *
    * The classic two-pass distributed scan, NOT a single-partition
    * global window: range-repartition by key, running sums inside
    * each range-disjoint partition, then ONE bounded collect of
    * per-partition totals whose exclusive scan broadcasts back as
    * each partition's base. Partition boundaries cancel out — the
    * result is a pure function of (key, len), which is what lets the
    * SQL oracle replay it with a single SUM OVER window while the
    * engine never sorts the corpus on one executor. The locally
    * checkpointed scan is shared by both passes, so the sampled
    * range bounds cannot drift between them.
    */
  def globalOffsets(df: DataFrame, key: Column, len: Column,
                    partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val n = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val w = Window.partitionBy(col("__pid"))
      .orderBy(col("id").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = df.select(key.as("id"), len.cast("long").as("len"))
      .repartitionByRange(n, col("id"))
      .sortWithinPartitions(col("id"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__cum", sum(col("len")).over(w))
      .localCheckpoint(true)
    // one row per partition — bounded by the partition count
    val totals = local.groupBy(col("__pid"))
      .agg(sum(col("len")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var acc = 0L
    val bases = totals.keys.toSeq.sorted.map { p =>
      val b = acc; acc += totals(p); (p, b)
    }
    local.join(broadcast(bases.toDF("__pid", "__base")),
        Seq("__pid"))
      .select(col("id"), col("len"),
        (col("__base") + col("__cum") - col("len"))
          .as("tok_offset"))
  }

  def packBins(df: DataFrame, key: Column, tokens: Column,
               numShards: Int, tokenBudget: Long): DataFrame = {
    require(numShards > 0 && tokenBudget > 0,
      s"need positive shards/budget: $numShards/$tokenBudget")
    import org.apache.spark.sql.expressions.Window
    val h = hash32(key)
    val w = Window.partitionBy(col("__shard"))
      .orderBy(col("__h").asc, key.asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__h", h)
      .withColumn("__shard", pmod(col("__h"), lit(numShards.toLong)))
      .withColumn("__start",
        sum(tokens.cast("long")).over(w) - tokens.cast("long"))
      // floor division in exact Long arithmetic: `/` would go through
      // a double (ulp loss past 2^53 cumulative tokens), and `div`
      // alone truncates toward zero where DuckDB's `//` floors.
      // Subtracting pmod first makes the operand an exact multiple,
      // where truncation and floor agree — exact for any sign.
      .withColumn("bin",
        expr(s"(__start - pmod(__start, ${tokenBudget}L)) " +
          s"div ${tokenBudget}L"))
      .withColumn("shard", col("__shard"))
      .drop("__h", "__shard", "__start")
  }
}
