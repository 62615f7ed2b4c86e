package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-mixture weight solving — the "rebalance the corpus so the
  * training mix hits target proportions" primitive (the published
  * data-mixing recipes all reduce to reweighting cells of a
  * domain × attribute contingency table; DoReMi, raking/IPF in the
  * survey-statistics literature since Deming & Stephan 1940).
  *
  * This is classic two-margin iterative proportional fitting (IPF),
  * but run in EXACT INTEGER arithmetic so a second engine replays it
  * bit-for-bit (the q44 rule: no transcendentals, and here not even
  * IEEE division): weights are scaled by `scale` and every
  * multiplicative update is an exact floor division
  * `(a - a mod b) div b` on DECIMAL(38,0). Floor rounding loses at
  * most 1 scaled unit per cell per update — with `scale = 10^6`
  * that is noise against any real marginal, and both engines lose
  * the IDENTICAL unit. DECIMAL(38,0) headroom: a weight is ≤
  * N·scale, an update product ≤ (N·scale)², so N up to ~10^13
  * documents fits — comfortably past 100 TB corpora.
  *
  * Shape at 100 TB: ONE corpus scan aggregates the contingency
  * cells `(rowKey, colKey, n)`; every IPF round is two keyed
  * aggregations + broadcast joins over that cell frame, whose size
  * is the number of DISTINCT (row, col) combinations — independent
  * of corpus size. The driver loop never touches data, only the
  * plan.
  */
object Mixing {

  private val Dec = "decimal(38,0)"

  /** Exact floor division of non-negative DECIMAL(38,0) columns:
    * `(a - a mod b) / b` — the subtraction makes the numerator
    * exactly divisible, so the decimal division is exact and
    * rounding-mode-free in any engine.
    */
  // one-op exact floor division on non-negative decimals (IPF
  // targets/weights/sums are all >= 0) — see DecQuotExpr
  private def floorDiv(a: Column, b: Column): Column =
    graft.functions.DecQuotExpr.decQuot(a.cast(Dec), b.cast(Dec))

  /** Contingency cells of the corpus: one row per distinct
    * (rowKey, colKey) with its document count `n` — the only
    * corpus-sized job in the solve.
    */
  def contingencyCells(df: DataFrame, rowKey: Column,
                       colKey: Column): DataFrame =
    df.groupBy(rowKey.as("row_key"), colKey.as("col_key"))
      .agg(count(lit(1)).cast(Dec).as("n"))

  /** `rounds` rounds of two-margin IPF over the cells, in exact
    * scaled-integer arithmetic. Row targets: uniform over the
    * distinct row keys (the "balance the languages" ask). Column
    * targets: the observed column marginals (held fixed). Returns
    * `(row_key, col_key, n, w)` — `w` is the cell's final scaled
    * weight; a document in that cell carries sampling weight
    * `w / (n · scale)`.
    */
  def rakeMixtureWeights(df: DataFrame, rowKey: Column,
                         colKey: Column, rounds: Int = 3,
                         scale: Long = 1000000L): DataFrame =
    // one eager materialization of the (tiny, corpus-size-
    // independent) cell frame: every downstream reference — targets,
    // marginals, all rounds — reads it instead of re-scanning the
    // corpus, so the corpus is scanned exactly once
    rakeFromCells(contingencyCells(df, rowKey, colKey)
      .localCheckpoint(), rounds, scale)

  /** The IPF solve over an already-aggregated cell frame
    * `(row_key, col_key, n)` — the entry point the STREAMING twin
    * uses (its cells come from incremental aggregation state, not a
    * corpus scan). `cells` must be materialized (checkpointed /
    * collected-from-state): the rounds reference it repeatedly.
    */
  def rakeFromCells(cells: DataFrame, rounds: Int = 3,
                    scale: Long = 1000000L): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"driver-looped plan growth is specified for 1..16 rounds: " +
        s"$rounds")
    val sc = lit(scale).cast(Dec)
    // uniform row target: floor(total·scale / L) — exact integers
    val tot = cells.agg(sum(col("n")).cast(Dec).as("t"),
      countDistinct(col("row_key")).cast(Dec).as("l"))
    val rowTargets = cells.select(col("row_key")).distinct()
      .crossJoin(broadcast(tot))
      .select(col("row_key"),
        floorDiv(col("t") * sc, col("l")).as("row_target"))
    val colTargets = cells.groupBy(col("col_key"))
      .agg((sum(col("n")).cast(Dec) * sc).as("col_target"))
    var w = cells.select(col("row_key"), col("col_key"), col("n"),
      (col("n") * sc).as("w"))
    for (_ <- 1 to rounds) {
      val rs = w.groupBy(col("row_key"))
        .agg(sum(col("w")).cast(Dec).as("row_sum"))
      w = w.join(broadcast(rs), "row_key")
        .join(broadcast(rowTargets), "row_key")
        .select(col("row_key"), col("col_key"), col("n"),
          floorDiv(col("w") * col("row_target"), col("row_sum"))
            .as("w"))
      val cs = w.groupBy(col("col_key"))
        .agg(sum(col("w")).cast(Dec).as("col_sum"))
      w = w.join(broadcast(cs), "col_key")
        .join(broadcast(colTargets), "col_key")
        .select(col("row_key"), col("col_key"), col("n"),
          floorDiv(col("w") * col("col_target"), col("col_sum"))
            .as("w"))
        // each marginal references w twice (the sum and the join),
        // so an uncut lineage doubles per half-round; one eager cut
        // per round keeps the plan flat (one bounded driver action
        // per round, the CC-loop contract)
        .localCheckpoint()
    }
    w
  }

  /** Materialize the rebalanced corpus: every document joins its
    * cell's solved weight (a broadcast join — the cell frame is
    * corpus-size-independent) and survives iff
    * `hash32(id) · n · scale < w · 2^32`, i.e. with probability
    * `w / (n·scale)` under the deterministic md5 hash — all in
    * exact DECIMAL(38,0) integer arithmetic, so a second engine
    * replays the exact membership. Cells the solve UP-weights
    * (`w >= n·scale`) keep every document — sampling cannot
    * up-sample; the census shows the honest under-achievement.
    * Shape at 100 TB: one corpus scan + one broadcast hash filter.
    */
  def rebalancedSample(df: DataFrame, rowKey: Column, colKey: Column,
                       idCol: Column, rounds: Int = 3,
                       scale: Long = 1000000L): DataFrame = {
    val w = rakeMixtureWeights(df, rowKey, colKey, rounds, scale)
    val sc = lit(scale).cast(Dec)
    val h = Sampling.hash32(idCol).cast(Dec)
    df.join(broadcast(w),
        rowKey === col("row_key") && colKey === col("col_key"))
      .where(h * col("n") * sc <
        col("w") * lit(4294967296L).cast(Dec))
      .drop("row_key", "col_key", "n", "w")
  }

  /** Row-marginal census of the solved weights — the verdict frame
    * a curation run reads: per row key, the document count, the
    * scaled uniform target, and the achieved scaled marginal.
    */
  def rakeRowCensus(df: DataFrame, rowKey: Column, colKey: Column,
                    rounds: Int = 3,
                    scale: Long = 1000000L): DataFrame =
    censusFromWeights(
      rakeMixtureWeights(df, rowKey, colKey, rounds, scale), scale)

  /** The row-marginal census over already-solved weights — shared
    * by the batch census (q120) and the streaming twin.
    */
  def censusFromWeights(w: DataFrame,
                        scale: Long = 1000000L): DataFrame = {
    val cells = w.groupBy(col("row_key"))
      .agg(sum(col("n")).cast(Dec).as("n_docs"),
        sum(col("w")).cast(Dec).as("achieved"))
    val sc = lit(scale).cast(Dec)
    val tot = w.agg(sum(col("n")).cast(Dec).as("t"),
      countDistinct(col("row_key")).cast(Dec).as("l"))
    cells.crossJoin(broadcast(tot))
      .select(col("row_key"), col("n_docs").cast("long").as("n_docs"),
        floorDiv(col("t") * sc, col("l")).cast("long")
          .as("target"),
        col("achieved").cast("long").as("achieved"))
  }
}
