package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract validation — the Deequ/dbt-tests shape: declared
  * row-level rules checked in ONE corpus pass, referential integrity
  * checked as an anti-join, and a quarantine split that routes
  * violating rows (with their reasons) out of the pipeline instead
  * of failing it.
  *
  * Shape at 100 TB: `ruleCensus` is a single scan folding every rule
  * into one partial aggregation (adding a rule adds a column, not a
  * pass); `fkViolationCount` is one equi-anti-join on the key (AQE
  * broadcasts a small parent); `quarantine` is a pure projection +
  * filter pair over one shared scan — no rule ever triggers its own
  * job.
  */
object Contracts {

  /** Per-rule violation census over ONE scan: for each (name, pred)
    * a row `(rule, n_violations, n_rows)` — `pred` is the PASS
    * condition; null predicates count as violations (a contract a
    * row cannot prove, it fails).
    */
  def ruleCensus(df: DataFrame,
                 rules: Seq[(String, Column)]): DataFrame = {
    val agg = ruleAgg(df, rules)
    val pairs = rules.flatMap { case (name, _) =>
      Seq(lit(name), col(s"__v_$name")) }
    agg.select(explode(map(pairs: _*)).as(Seq("rule",
        "n_violations")), col("__n").as("n_rows"))
      .select(col("rule"), col("n_violations").cast("long"),
        col("n_rows").cast("long"))
  }

  /** The census's single-pass WIDE aggregate — one row, one column
    * per rule (`__v_<name>`) plus `__n`. The streaming twin folds
    * this incrementally (explode-after-aggregate is not a streaming
    * plan; the wide row is); the batch census explodes it to rows.
    */
  def ruleAgg(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    df.agg(
      count(lit(1)).as("__n"),
      rules.map { case (name, pred) =>
        sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))
          .as(s"__v_$name")
      }: _*)
  }

  /** Referential-integrity violation count: child keys (non-null)
    * with no matching parent key — one anti-join, counted.
    */
  def fkViolationCount(child: DataFrame, childKey: Column,
                       parent: DataFrame,
                       parentKey: Column): DataFrame = {
    val c = child.select(childKey.as("__k"))
      .where(col("__k").isNotNull)
    val p = parent.select(parentKey.as("__k")).distinct()
    c.join(p, Seq("__k"), "left_anti")
      .agg(count(lit(1)).cast("long").as("n_violations"))
  }

  /** Quarantine split: (clean rows, violating rows + a `reasons`
    * array naming every failed rule). Both sides derive from one
    * shared projection — a writer caches/persists the parent once.
    */
  def quarantine(df: DataFrame, rules: Seq[(String, Column)])
      : (DataFrame, DataFrame) = {
    val t = tagged(df, rules)
    (t.where(size(col("reasons")) === 0).drop("reasons"),
      t.where(size(col("reasons")) > 0))
  }

  /** Every row tagged with its `reasons` array (empty = clean) — a
    * PURE projection, so it runs identically over a batch frame and
    * an unbounded stream (the streaming screen twin uses it
    * verbatim; zero state, zero shuffle).
    */
  def tagged(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val reasons = array_compact(array(rules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }: _*))
    df.withColumn("reasons", reasons)
  }
}
