package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured-streaming form of the structure summary: the same
  * per-column statistics the batch analyzer computes, maintained
  * incrementally over an unbounded stream.
  *
  * Two shapes:
  *
  *  - [[windowedStats]] — event-time windowed aggregation with a
  *    watermark: per (window, key) counts/min/max/null counts. Pure
  *    built-in aggregates → Spark keeps partial state in the state
  *    store and emits on watermark advance; scales with keys × open
  *    windows, not with data.
  *  - [[runningStats]] — per-key running summary via
  *    `mapGroupsWithState`: the [[RunningStats]] buffer is the same
  *    monoid shape as the batch Stats summary (count/nulls/min/max),
  *    merged incrementally — custom state for consumers that need
  *    continuous totals rather than windows.
  */
object StreamingStructure {

  /** Event-time windowed per-key value stats. `tsCol` must be a
    * TimestampType column; late data beyond `watermark` is dropped.
    *
    * `quartiles` carries the positional quartiles that define the
    * batch Stats (§1.3), via a bounded per-window counter buffer —
    * the same counter monoid the batch analyzer aggregates, so a
    * replayed stream reproduces the batch quartiles exactly. Past
    * `quartileCap` distinct values the buffer spills to summary
    * (null quartiles, `exact` false), keeping per-(key, window) state
    * bounded on unbounded value domains.
    */
  def windowedStats(df: DataFrame, tsCol: String, keyCol: String,
                    valueCol: String, windowLen: String = "1 minute",
                    watermark: String = "5 minutes",
                    quartileCap: Int = 4096): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol).as("key"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col(valueCol)).as("n_present"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"),
        sum(col(valueCol).cast("decimal(28,6)")).as("sum_value"),
        graft.functions.QuartilesAgg.quartiles(
          col(valueCol).cast("double"), quartileCap).as("quartiles"))

  /** Running per-key summary state. */
  final case class RunningStats(key: String, count: Long, nulls: Long,
                                min: Double, max: Double) {
    def merge(v: Option[Double]): RunningStats = v match {
      case None => copy(count = count + 1, nulls = nulls + 1)
      case Some(d) => RunningStats(key, count + 1, nulls,
        math.min(min, d), math.max(max, d))
    }
  }

  object RunningStats {
    def zero(key: String): RunningStats =
      RunningStats(key, 0L, 0L, Double.PositiveInfinity,
        Double.NegativeInfinity)
  }

  /** Custom keyed state: continuous (key → running stats), updated per
    * micro-batch via mapGroupsWithState.
    *
    * `idleTimeout` bounds state size on unbounded key spaces (the
    * 100 TB concern: without it, state grows with the total number of
    * keys ever seen): a key idle longer than the timeout is evicted
    * and restarts from zero if it reappears. `None` keeps lifetime
    * state for genuinely bounded key domains.
    */
  def runningStats(spark: SparkSession,
                   ds: Dataset[(String, Option[Double])],
                   idleTimeout: Option[String] = Some("1 hour"))
      : Dataset[RunningStats] = {
    import spark.implicits._
    val timeoutConf = idleTimeout match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout
      case None => GroupStateTimeout.NoTimeout
    }
    ds.groupByKey(_._1)
      .mapGroupsWithState[RunningStats, RunningStats](timeoutConf) {
        (key: String, rows: Iterator[(String, Option[Double])],
         state: GroupState[RunningStats]) =>
          if (state.hasTimedOut) {
            // evicted: emit the final summary and drop the state
            val last = state.get
            state.remove()
            last
          } else {
            val prior = state.getOption.getOrElse(RunningStats.zero(key))
            val updated = rows.foldLeft(prior)((acc, r) =>
              acc.merge(r._2))
            state.update(updated)
            idleTimeout.foreach(state.setTimeoutDuration)
            updated
          }
      }
  }
}
