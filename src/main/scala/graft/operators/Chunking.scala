package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Fixed token-window chunking with overlap — the standard
  * split-for-embedding / split-for-training primitive (every RAG
  * index and most pretraining tokenization pipelines window long
  * documents this way; the content-defined complement is
  * [[graft.functions.CdcChunksExpr]] / q106).
  *
  * Chunk starts are `0, step, 2·step, …` with
  * `step = chunkSize − overlap`, the last start being the largest
  * multiple of `step` ≤ max(n − overlap − 1, 0) — which provably
  * covers the document: consecutive starts differ by
  * `step < chunkSize` (no gaps), and the final chunk reaches the
  * last token because `n − lastStart ≤ step + overlap = chunkSize`.
  * The census gates pin that identity as integers.
  *
  * Shape at 100 TB: one corpus scan, a bounded per-document explode
  * (`⌈n/step⌉` rows — the output IS the product), no shuffle until
  * the caller aggregates. Chunk text is sliced from the token
  * array in-plan; nothing re-tokenizes.
  */
object Chunking {

  /** One row per (document, chunk): `(id, chunk_idx, start,
    * n_tok, chunk_text)`. `start` is the 0-based token offset;
    * `n_tok = min(chunkSize, n − start)` (only the final chunk may
    * be short).
    */
  def tokenChunks(df: DataFrame, idCol: Column, textCol: Column,
                  chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be positive: $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): $overlap of $chunkSize")
    val step = chunkSize - overlap
    val ts = TextFunctions.tokens(textCol)
    df.select(idCol.as("id"), ts.as("__ts"))
      .select(col("id"), col("__ts"),
        posexplode(sequence(lit(0),
          greatest(size(col("__ts")) - overlap - 1, lit(0)),
          lit(step))).as(Seq("chunk_idx", "start")))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("start").cast("long").as("start"),
        least(lit(chunkSize),
          size(col("__ts")) - col("start")).cast("long").as("n_tok"),
        array_join(slice(col("__ts"), col("start") + 1,
          lit(chunkSize)), " ").as("chunk_text"))
  }

  /** Per-group chunking census with the coverage invariant gates —
    * the verdict frame: document/chunk counts, exact token sums,
    * `covered_ok` (every final chunk reaches its document's last
    * token) and `stitch_ok` (token accounting: chunk tokens =
    * document tokens + overlap·(chunks − 1) per document).
    */
  def chunkCensus(df: DataFrame, groupCol: Column, idCol: Column,
                  textCol: Column, chunkSize: Int,
                  overlap: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be positive: $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): $overlap of $chunkSize")
    // single corpus scan: the group key and token count ride the
    // explode instead of re-scanning + joining the corpus back
    val step = chunkSize - overlap
    val ts = TextFunctions.tokens(textCol)
    df.select(groupCol.as("grp"), idCol.as("id"), ts.as("__ts"))
      .select(col("grp"), col("id"),
        size(col("__ts")).cast("long").as("n"),
        posexplode(sequence(lit(0),
          greatest(size(col("__ts")) - overlap - 1, lit(0)),
          lit(step))).as(Seq("__ci", "start")))
      .select(col("grp"), col("id"), col("n"),
        col("start").cast("long").as("start"),
        least(lit(chunkSize.toLong), col("n") - col("start"))
          .as("n_tok"))
      .groupBy(col("id"))
      .agg(first(col("grp")).as("grp"), first(col("n")).as("n"),
        count(lit(1)).as("c"), sum(col("n_tok")).as("sum_tok"),
        max(col("start")).as("max_start"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("c")).cast("long").as("n_chunks"),
        sum(col("sum_tok")).cast("long").as("sum_chunk_tokens"),
        expr(s"bool_and(n - max_start <= $chunkSize)")
          .as("covered_ok"),
        expr(s"bool_and(sum_tok = n + $overlap * (c - 1))")
          .as("stitch_ok"))
      .orderBy(col("grp").asc_nulls_first)
  }
}
