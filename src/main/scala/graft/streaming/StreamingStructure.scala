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
    */
  def windowedStats(df: DataFrame, tsCol: String, keyCol: String,
                    valueCol: String, windowLen: String = "1 minute",
                    watermark: String = "5 minutes"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol).as("key"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col(valueCol)).as("n_present"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"),
        sum(col(valueCol).cast("decimal(28,6)")).as("sum_value"))

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
    * micro-batch via mapGroupsWithState (processing-time timeout left
    * off: state lives for the stream's lifetime, sized by key count).
    */
  def runningStats(spark: SparkSession,
                   ds: Dataset[(String, Option[Double])])
      : Dataset[RunningStats] = {
    import spark.implicits._
    ds.groupByKey(_._1)
      .mapGroupsWithState[RunningStats, RunningStats](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Option[Double])],
         state: GroupState[RunningStats]) =>
          val prior = state.getOption.getOrElse(RunningStats.zero(key))
          val updated = rows.foldLeft(prior)((acc, r) => acc.merge(r._2))
          state.update(updated)
          updated
      }
  }
}
