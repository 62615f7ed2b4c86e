package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators over event streams: as-of joins (latest-state
  * lookup) and gap-based sessionization — the feature-engineering
  * steps an events table feeds at training-pipeline scale.
  *
  * Both are single-shuffle window shapes: one hash exchange on the
  * key, one per-key time sort, no range explosion and no per-row
  * probing. A pathologically hot key serializes into one task's sort
  * (the same bound as any keyed window); pre-splitting such keys by a
  * coarse time bucket restores parallelism at the cost of boundary
  * stitching, and is deliberately left to the caller — the operators
  * themselves never materialize more than the unioned input.
  */
object Temporal {

  /** As-of join: for each left row, the single most recent right row
    * with the same key and `rightTs` ≤ `leftTs` (inclusive). The
    * classic "state at event time" lookup — last price at trade time,
    * last purchase before a page view — that Spark has no built-in
    * operator for and a naive inequality join turns into a per-key
    * cross product.
    *
    * Implementation is the union-window form: tag rows by side, union
    * into one frame, and take `last(right_payload, ignoreNulls)` over
    * a (key, ts, side) window with right rows sorting before left
    * rows at equal timestamps (inclusive match). One shuffle, one
    * sort, output width = left + right payload; the right side is
    * never re-scanned per left row. Equivalent to SQL ASOF JOIN
    * (DuckDB/QuestDB semantics: `l.key = r.key AND l.ts >= r.ts`,
    * latest match wins, unmatched left rows keep nulls).
    *
    * Right rows with a null timestamp never match (as in the SQL
    * predicate); left rows with a null timestamp match nothing. If
    * several right rows share (key, ts), which one wins is
    * tie-broken only by the window order — pre-aggregate the right
    * side to unique (key, ts) for deterministic output (SQL ASOF has
    * the same caveat).
    *
    * @param tolerance max allowed `leftTs - rightTs` (same units as
    *   the timestamp columns); matches older than this null out.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val payload = right.columns
      .filterNot(keys.contains).filterNot(_ == rightTs).toSeq
    require(payload.nonEmpty, "right side has no payload columns")
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right payload collides with left columns: $collisions")

    val leftCols = left.columns.toSeq
    val lStruct = struct(leftCols.map(left(_)): _*)
    val rStruct = struct(
      (right(rightTs).as("__rts") +: payload.map(right(_))): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType

    val leftU = left.select(
      keys.map(left(_)) ++ Seq(left(leftTs).as("__ts"),
        lit(1).as("__side"), lStruct.as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    val rightU = right
      .where(right(rightTs).isNotNull)
      .select(
        keys.map(right(_)) ++ Seq(right(rightTs).as("__ts"),
          lit(0).as("__side"), lit(null).cast(lType).as("__l"),
          rStruct.as("__r")): _*)

    // right (__side 0) sorts before left (__side 1) at equal ts, so
    // the running last() makes the match inclusive; null left ts
    // sorts first (nulls-first asc) and therefore sees no right rows
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = leftU.unionByName(rightU)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val matched = tolerance match {
      case Some(tol) => matchedRaw.withColumn("__m",
        when(col("__m.__rts") >= col("__ts") - lit(tol), col("__m")))
      case None => matchedRaw
    }
    matched.select(
      leftCols.map(c => col(s"__l.`$c`").as(c)) ++
        payload.map(c => col(s"__m.`$c`").as(c)): _*)
  }

  /** Gap-based sessionization: per key, a new session starts at the
    * first event and whenever the gap since the previous event
    * exceeds `gap` (same units as `ts` — nanos for the events table).
    * Adds a 0-based `session` index per key; every input column
    * passes through. Deterministic given unique (key, ts) pairs.
    *
    * Single-shuffle window shape: `lag` and the running sum share one
    * (key, ts) sort — Catalyst collapses both window functions into
    * one Window exec, so sessionizing a trillion-event table costs
    * exactly one exchange + one per-key sort.
    */
  def sessionize(df: DataFrame, key: String, ts: String,
                 gap: Long): DataFrame = {
    require(gap >= 0, s"gap must be non-negative: $gap")
    val w = Window.partitionBy(col(key)).orderBy(col(ts).asc)
    val prev = lag(col(ts), 1).over(w)
    val isNew = when(prev.isNull ||
      col(ts) - prev > lit(gap), 1L).otherwise(0L)
    df.withColumn("session",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)) - lit(1L))
  }
}
