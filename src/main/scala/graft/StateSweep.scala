package graft
import org.apache.spark.sql.SparkSession

/** Drops ALL cached state in the session: CacheManager entries first
  * (so later identical persists re-register cleanly — no "already
  * cached" warnings), then any remaining raw persistent RDDs
  * (localCheckpoint blocks).
  *
  * INVARIANT (the contract every caller relies on): nothing held
  * in-memory may span a query boundary. Every cross-query artifact —
  * the purchase/cycle graphs, the rank/HITS traces, the serving
  * index, the multi-source fixture — is parquet on disk and is
  * re-read by the queries that consume it. An in-memory artifact
  * backed only by a localCheckpoint would fail hard with "cannot be
  * recomputed after unpersisting" the first time a sweep ran between
  * its producer and its consumer, instead of silently recomputing.
  * If you are adding a cross-query artifact: write it to parquet
  * (see PipelineQueries.ensurePurchaseGraph for the marker scheme),
  * never hand a persisted plan across queries.
  *
  * Callers: Bench (between measured queries), Verify (between
  * dumped queries), PipelineQueries.prebuild (between artifact
  * builds).
  */
object StateSweep {
  def apply(spark: SparkSession): Unit =
    try {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(r => try r.unpersist(blocking = false)
          catch { case _: Throwable => () })
    } catch { case _: Throwable => () }
}
