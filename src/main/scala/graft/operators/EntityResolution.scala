package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage — the classic entity-resolution
  * shape (Fellegi & Sunter 1969; the blocking survey in Christen,
  * "Data Matching", 2012): candidate pairs come ONLY from records
  * sharing a blocking key, and each block prices its own quadratic
  * cost before any pair materializes. Edit distance is Spark's
  * builtin `levenshtein` — an exact integer both engines agree on,
  * unlike float string-similarity scores.
  *
  * Shape at 100 TB: one keyed agg counts each block; blocks over
  * `maxBlock` are EXCLUDED from pairing (reported, never silently
  * paired — the same hot-bucket discipline as the LSH family), so
  * the self-join's per-key fanout is bounded by maxBlock and the
  * total pair volume by Σ n·(n−1)/2 over surviving blocks. No
  * all-pairs path exists.
  */
object EntityResolution {

  /** Near-duplicate id pairs (`id1 < id2`, edit distance ≤ maxDist)
    * within blocks of ≤ maxBlock records. Output carries the block
    * key and both names for downstream adjudication.
    */
  def blockedEditPairs(df: DataFrame, id: Column, name: Column,
                       block: Column, maxDist: Int,
                       maxBlock: Long): DataFrame = {
    val recs = df.select(block.as("blk"), id.as("id"),
      name.as("nm"))
    val ok = recs.groupBy(col("blk"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") <= maxBlock)
      .select(col("blk"))
    val inBlk = recs.join(ok, Seq("blk"))
    // evaluate the edit distance ONCE per candidate pair (a where +
    // select pair would run the O(len²) DP twice)
    inBlk.as("a").join(inBlk.as("b"),
        col("a.blk") === col("b.blk") &&
          col("a.id") < col("b.id"))
      .select(col("a.blk").as("blk"), col("a.id").as("id1"),
        col("b.id").as("id2"), col("a.nm").as("name1"),
        col("b.nm").as("name2"),
        levenshtein(col("a.nm"), col("b.nm")).cast("long")
          .as("dist"))
      .where(col("dist") <= maxDist)
  }

  /** Per-block census alongside the pairing: how many blocks, how
    * many records, how many blocks the cap excluded — the pre-flight
    * a linkage run reports before anyone reads pair counts.
    */
  def blockCensus(df: DataFrame, block: Column,
                  maxBlock: Long): DataFrame =
    df.groupBy(block.as("blk"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("n")).cast("long").as("n_records"),
        count(when(col("n") > maxBlock, 1)).as("n_over_cap"),
        coalesce(sum(when(col("n") <= maxBlock,
          col("n") * (col("n") - 1) / 2)), lit(0L)).cast("long")
          .as("candidate_pairs"))
}
