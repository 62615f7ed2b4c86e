package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{SpaceSavingAgg, TextFunctions}

/** Sketch-based corpus profiling — the statistics a 100 TB pipeline
  * can actually afford.
  *
  * Exact `COUNT(DISTINCT …)` holds every distinct key in the shuffle;
  * exact percentiles sort the column. Both are fine at survey scale
  * and fatal at corpus scale. The sketch versions are ONE-PASS,
  * FIXED-MEMORY, and MERGEABLE (partial states combine map-side, so
  * partial aggregation and AQE work exactly like any other agg):
  *
  *  - distinct counts: HyperLogLog++ via `approx_count_distinct`
  *    (relative standard deviation `rsd`, default 2% → ~4 KB of
  *    registers per group regardless of cardinality);
  *  - quantiles: Greenwald–Khanna via `approx_percentile` (rank error
  *    ≤ n/accuracy — with accuracy 10⁴, the p50 estimate's rank is
  *    within 0.01% of true).
  *
  * Both sketches are deterministic for a given dataset (no seeded
  * RNG: HLL hashes values, GK compresses ranks), so profiles are
  * reproducible across runs, partitionings, and cluster sizes.
  *
  * [[profileWithGates]] additionally computes the EXACT statistics
  * next to the sketches and emits within-tolerance booleans — the
  * self-auditing form used by the oracle gate (the exact columns are
  * for the audit; production runs use [[corpusProfile]] and skip
  * them).
  */
object Sketches {

  /** One-pass sketch profile per group over a text corpus: document
    * count, total whitespace tokens, HLL++ distinct-fingerprint
    * estimate, GK token-count quartile estimates. Single aggregate —
    * one shuffle by `group`, all sketch states merge map-side.
    */
  def corpusProfile(df: DataFrame, group: Column, text: Column,
                    rsd: Double = 0.02,
                    accuracy: Int = 10000): DataFrame = {
    val ntok = TextFunctions.tokenCount(text).cast("long")
    df.select(group.as("group"),
        TextFunctions.fingerprint(text).as("fp"), ntok.as("ntok"))
      .groupBy(col("group"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ntok")).cast("long").as("n_tokens"),
        approx_count_distinct(col("fp"), rsd).as("approx_unique"),
        percentile_approx(col("ntok"), lit(0.25), lit(accuracy))
          .as("approx_tok_p25"),
        percentile_approx(col("ntok"), lit(0.5), lit(accuracy))
          .as("approx_tok_p50"),
        percentile_approx(col("ntok"), lit(0.75), lit(accuracy))
          .as("approx_tok_p75"))
  }

  /** [[corpusProfile]] plus the exact statistics and within-`tolPct`
    * booleans: `unique_fp_ok` gates the HLL++ estimate against exact
    * `COUNT(DISTINCT fingerprint)`, `median_tok_ok` gates the GK p50
    * against the exact interpolated percentile. Integer
    * cross-multiplication for the tolerance compare (no float
    * thresholds): `|approx − exact| · 100 ≤ tolPct · exact`.
    *
    * This is the AUDIT form — it pays the exact computation to prove
    * the sketch's error bound holds, which is what the correctness
    * gate pins; at corpus scale run [[corpusProfile]] alone.
    */
  def profileWithGates(df: DataFrame, group: Column, text: Column,
                       rsd: Double = 0.02, accuracy: Int = 10000,
                       tolPct: Int = 5): DataFrame = {
    val ntok = TextFunctions.tokenCount(text).cast("long")
    df.select(group.as("group"),
        TextFunctions.fingerprint(text).as("fp"), ntok.as("ntok"))
      .groupBy(col("group"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ntok")).cast("long").as("n_tokens"),
        approx_count_distinct(col("fp"), rsd).as("approx_unique"),
        countDistinct(col("fp")).as("exact_unique"),
        percentile_approx(col("ntok"), lit(0.5), lit(accuracy))
          .cast("double").as("approx_p50"),
        expr("percentile(ntok, 0.5)").as("exact_p50"))
      .select(col("group"), col("n_docs"), col("n_tokens"),
        (abs(col("approx_unique") - col("exact_unique")) * 100 <=
          col("exact_unique") * tolPct).as("unique_fp_ok"),
        (abs(col("approx_p50") - col("exact_p50")) * 100 <=
          col("exact_p50") * tolPct).as("median_tok_ok"))
  }

  /** Equi-depth binning WITHOUT a global sort: bucket boundaries are
    * the GK quantile sketch's (1/b … (b−1)/b) estimates (one pass,
    * fixed memory), broadcast back as a 1-row frame, and assignment
    * is a codegen'd "count of boundaries ≤ v" over the broadcast
    * array — the feature-binning shape that scales, where `ntile()`
    * is a single-task global sort. Returns the input plus a `bucket`
    * column in [0, b).
    *
    * Bucket populations are n/b ± (ties + 2·rankError·n); the
    * boundaries themselves are partitioning-dependent within the GK
    * rank-error bound, so downstream oracles pin the equi-depth
    * PROPERTY ([[equiDepthCensus]]'s gate), not the raw boundaries.
    */
  def equiDepthBins(df: DataFrame, value: Column, b: Int,
                    accuracy: Int = 10000): DataFrame = {
    require(b >= 2, s"need at least 2 buckets: $b")
    val bnds = df.agg(percentile_approx(value,
      array((1 until b).map(i => lit(i.toDouble / b)): _*),
      lit(accuracy)).as("__bnds"))
    df.crossJoin(broadcast(bnds))
      .withColumn("bucket",
        // null values get a NULL bucket, not a silent slot-0 (the
        // filter lambda's null comparison drops every boundary, and
        // size()=0 would masquerade as the lowest bucket)
        when(value.isNull, lit(null))
          .otherwise(size(filter(col("__bnds"),
            x => x <= value.cast("double"))).cast("long")))
      .drop("__bnds")
  }

  /** Audit form of [[equiDepthBins]]: one row with the exact total,
    * the observed bucket count, and `depth_ok` — every bucket within
    * `tolPct`% of the ideal depth n/b, compared by integer
    * cross-multiplication (|cnt·b − n|·100 ≤ tolPct·n). The oracle
    * pins the gate TRUE; a sketch whose boundaries drift past the
    * rank-error bound fails the hash compare.
    */
  def equiDepthCensus(df: DataFrame, value: Column, b: Int,
                      accuracy: Int = 10000,
                      tolPct: Int = 5): DataFrame = {
    // nulls are excluded from the depth audit (they carry a NULL
    // bucket in equiDepthBins and would fail the gate vacuously)
    val counts = equiDepthBins(
        df.select(value.as("__v")).where(col("__v").isNotNull),
        col("__v"), b, accuracy)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).cast("long").as("__n"))
    // coalesce the empty-input case: over zero bucket rows the
    // aggregates come back null (sum over nothing, bool_and over
    // nothing) and downstream boolean gates would see null instead
    // of a clean verdict. An empty census is vacuously in-depth.
    counts.crossJoin(broadcast(tot))
      .agg(coalesce(max(col("__n")), lit(0L)).as("n_total"),
        count(lit(1)).cast("int").as("n_buckets"),
        coalesce(
          expr(s"bool_and(abs(cnt * $b - __n) * 100 <= $tolPct * __n)"),
          lit(true)).as("depth_ok"))
  }

  /** Count-Min sketch counter table (Cormode, Muthukrishnan, "An
    * improved data stream summary: the count-min sketch and its
    * applications", J. Algorithms 2005): per group, `d` hash rows ×
    * `w` buckets of summed occurrence counts — point-frequency
    * estimates over an UNBOUNDED item domain in `d·w` counters per
    * group, where the exact `GROUP BY item` table is unbounded.
    * Estimates (see [[countMinEstimate]]) never undercount, and
    * overcount by ≤ 2n/w with probability 1 − 2^−d each.
    *
    * Deterministic by construction: rows draw their buckets from
    * md5 digests of the salted item — digest j = `md5(j ":" item)`
    * carves into four disjoint 8-hex-char windows, and row i reads
    * window i mod 4 of digest i/4 (the one-digest-many-hashes
    * construction, Kirsch & Mitzenmacher, "Less hashing, same
    * performance", ESA 2006 — with d ≤ 4 every row's bucket costs
    * ONE md5 per input row instead of d). The table — and every
    * estimate — is a pure function of the data, replayed EXACTLY by
    * the DuckDB oracle (no probabilistic gate needed). Mergeability
    * is free: counters are plain sums, so shards/days combine by
    * adding tables. Scale shape: one digest projection, one explode
    * to (group, row, bucket) and one keyed count with map-side
    * partials; aggregation state is d·w per group regardless of
    * item cardinality.
    */
  def countMinTable(df: DataFrame, group: Column, item: Column,
                    w: Int = 64, d: Int = 4): DataFrame = {
    require(w > 0 && d > 0, s"need w > 0, d > 0: $w/$d")
    val nDig = (d + 3) / 4
    // digests land in their own projection so each is provably
    // computed ONCE per row (subexpression sharing inside a
    // Generate's array argument is not guaranteed)
    val withDigs = df.select(group.as("group"), item.as("__it"))
      .where(col("__it").isNotNull)
      .select(col("group") +: (0 until nDig).map(j =>
        md5(concat_ws(":", lit(j.toString),
          col("__it").cast("string"))).as(s"__dig$j")): _*)
    val rows = (0 until d).map { i =>
      struct(lit(i).as("row"),
        pmod(conv(substring(col(s"__dig${i / 4}"),
            (i % 4) * 8 + 1, 8), 16, 10).cast("long"),
          lit(w.toLong)).as("bucket"))
    }
    withDigs.select(col("group"), explode(array(rows: _*)).as("rb"))
      .groupBy(col("group"), col("rb.row").as("row"),
        col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates from a [[countMinTable]]: for each
    * probe term, the MIN over the `d` rows of that term's bucket
    * counter (a missing counter row is 0). Probes are literals, so
    * their buckets are compile-time constants — the lookup is a
    * `d × probes`-row broadcast join against the counter table,
    * never a scan of anything item-sized.
    */
  def countMinEstimate(cm: DataFrame, probes: Seq[String],
                       w: Int = 64, d: Int = 4): DataFrame = {
    require(probes.nonEmpty, "need at least one probe term")
    val spark = cm.sparkSession
    import spark.implicits._
    // probe buckets computed on the DRIVER (probes are literals) by
    // the same windowed-digest rule as [[countMinTable]]
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(row: Int, term: String): Long = {
      md.reset()
      val hex = md.digest(s"${row / 4}:$term".getBytes("UTF-8"))
        .map(x => f"${x & 0xff}%02x").mkString
      java.lang.Long.parseLong(
        hex.substring((row % 4) * 8, (row % 4) * 8 + 8), 16) % w
    }
    val probeRows = for {
      t <- probes
      i <- 0 until d
    } yield (t, i, bucket(i, t))
    val pdf = probeRows.toDF("term", "row", "bucket")
    // left join so an EMPTY bucket contributes 0 to the min — a
    // probe absent from the data must estimate 0, not the min of
    // whatever buckets happen to be non-empty
    cm.select(col("group")).distinct()
      .crossJoin(broadcast(pdf))
      .join(cm, Seq("group", "row", "bucket"), "left")
      .groupBy(col("group"), col("term"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Equi-join cardinality estimate from two Count-Min tables — the
    * classic sketch inner product (Cormode & Muthukrishnan, J.
    * Algorithms 2005; the AMS lineage): for each of the `d` salted
    * rows, Σ_buckets cA·cB NEVER undercounts the true join size
    * (colliding keys only add), and the MIN over rows is the
    * tightest such bound. The pre-flight join-sizing primitive —
    * the same "price it before running it" discipline as the LSH
    * pair budgets, for joins: two key-column scans + two
    * sketch-sized frames, no data join at all.
    *
    * Both tables must come from [[countMinTable]] with the SAME
    * (w, d). The group column PARTICIPATES in the join — a
    * multi-group pair estimates each group's join independently
    * (groups absent from either side estimate 0), never mixing one
    * group's counters into another's inner product. Returns
    * `(group, est_join_rows)`.
    *
    * Contract validation (fail-fast, in-plan): every sketch row
    * index must lie in [0, d) and every bucket be non-negative — a
    * table built with a different `d` raises instead of silently
    * min-ing over rows the other side never populated. A `w`
    * mismatch is NOT detectable from the tables alone (bucket ids
    * are data-dependent); the caller owns that half of the contract.
    */
  def cmJoinSizeEstimate(cmA: DataFrame, cmB: DataFrame,
                         d: Int = 4): DataFrame = {
    require(d > 0, s"need d > 0: $d")
    val dec = "decimal(38,0)"
    def checked(cm: DataFrame, side: String): DataFrame =
      cm.select(col("group"),
        when(col("row") >= 0 && col("row") < d, col("row"))
          .otherwise(raise_error(lit(s"cmJoinSizeEstimate: $side " +
            s"sketch has a row index outside [0, $d) — built with " +
            "a different d")).cast("int")).as("row"),
        when(col("bucket") >= 0, col("bucket"))
          .otherwise(raise_error(lit(s"cmJoinSizeEstimate: $side " +
            "sketch has a negative bucket id")).cast("long"))
          .as("bucket"),
        col("cnt"))
    val a = checked(cmA, "left")
    val b = checked(cmB, "right")
    // FULL OUTER on the bucket key: the group list, the zero-overlap
    // proof, and the inner products all come out of ONE pass over
    // each sketch subtree. A bucket present on one side only
    // contributes 0 to its row's product (the coalesce), and a
    // group present on one side only still carries all d row
    // indices ([[countMinTable]] hashes every item into every row,
    // so a sketched group populates each row with ≥ 1 bucket) —
    // its min is an exact 0, never a row the other side left
    // unpopulated. (The previous shape re-derived the group list
    // from a second scan of both sketch subtrees; when the inputs
    // are unpersisted countMinTable plans — q166's — ReuseExchange
    // missed and every sketch aggregation evaluated TWICE.)
    a.select(col("group"), col("row"), col("bucket"),
        col("cnt").cast(dec).as("ca"))
      .join(b.select(col("group"), col("row"), col("bucket"),
          col("cnt").cast(dec).as("cb")),
        Seq("group", "row", "bucket"), "full_outer")
      .groupBy(col("group"), col("row"))
      .agg(sum(coalesce(col("ca"), lit(0).cast(dec)) *
        coalesce(col("cb"), lit(0).cast(dec))).cast(dec).as("ip"))
      .groupBy(col("group"))
      .agg(min(col("ip")).cast("long").as("est_join_rows"))
  }

  /** Data-quality drift monitor: compare two slices of a corpus
    * (A/B split, yesterday/today, crawl v1/v2 — any binary `split`
    * expression) per group in ONE pass — conditional aggregation,
    * no join, single scan. Emits the slice counts plus
    * within-`tolPct` gates: `balance_ok` (doc counts agree) and
    * `mean_tok_ok` (mean tokens agree, compared as
    * |sumA·nB − sumB·nA| ≤ tol·sumB·nA — cross-multiplied in
    * DECIMAL(38,0) so corpus-scale token sums cannot overflow the
    * predicate).
    */
  def profileDrift(df: DataFrame, group: Column, text: Column,
                   split: Column, tolPct: Int = 10): DataFrame = {
    val ntok = TextFunctions.tokenCount(text).cast("long")
    val d = (c: Column) => c.cast("decimal(38,0)")
    df.select(group.as("group"), split.as("h"), ntok.as("ntok"))
      .groupBy(col("group"))
      .agg(
        count(when(col("h") === 0L, 1)).as("n_a"),
        count(when(col("h") =!= 0L, 1)).as("n_b"),
        sum(when(col("h") === 0L, col("ntok")).otherwise(0L))
          .cast("long").as("sum_a"),
        sum(when(col("h") =!= 0L, col("ntok")).otherwise(0L))
          .cast("long").as("sum_b"))
      .select(col("group"), col("n_a"), col("n_b"),
        (abs(col("n_a") - col("n_b")) * 100 <=
          col("n_b") * tolPct).as("balance_ok"),
        (abs(d(col("sum_a")) * d(col("n_b")) -
          d(col("sum_b")) * d(col("n_a"))) * 100 <=
          d(col("sum_b")) * d(col("n_a")) * tolPct)
          .as("mean_tok_ok"))
  }

  /** Per-group heavy hitters via the SpaceSaving sketch
    * ([[graft.functions.SpaceSavingAgg]]): at most `k` counters per
    * group — fixed memory and map-side mergeable, where an exact
    * `GROUP BY (group, item)` shuffles one row per distinct item.
    * Emits the `topN` tracked items per group as
    * `(group, item, est)` rows, ranked (est desc, item asc).
    *
    * Estimates are exact whenever a group's distinct-item count stays
    * ≤ k (no eviction — the regime the q85 oracle pins); beyond that
    * they carry the SpaceSaving guarantee |est − truth| ≤ n/k
    * (spec-pinned, SpaceSavingSpec).
    */
  def heavyHitters(df: DataFrame, group: Column, item: Column,
                   k: Int = 64, topN: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sk = df.select(group.as("group"), item.as("item"))
      .where(col("item").isNotNull)
      .groupBy(col("group"))
      .agg(SpaceSavingAgg.spaceSaving(col("item"), k).as("hh"))
      .select(col("group"), explode(col("hh")).as(Seq("item", "est")))
    val w = Window.partitionBy(col("group"))
      .orderBy(col("est").desc, col("item").asc)
    sk.withColumn("rn", row_number().over(w))
      .where(col("rn") <= topN)
      .drop("rn")
  }
}
