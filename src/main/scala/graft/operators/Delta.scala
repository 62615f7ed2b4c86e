package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset versioning: what changed between two corpus snapshots.
  *
  * A 100 TB training corpus is re-crawled / re-filtered continuously;
  * the nightly question is "what did this revision add, drop, or
  * rewrite" — both for audit and because downstream consumers
  * (dedup indexes, tokenized shards, eval decontamination screens)
  * want to process the DELTA, not re-run over everything.
  *
  * The diff is a single full-outer equi-join on the snapshot key
  * comparing content fingerprints — one shuffle on the key (or zero,
  * if both snapshots are written through
  * [[Layout.writeBucketed]] on the key), no content ever moves: the
  * fingerprint (md5 of the canonicalized text, the q24 exact-dedup
  * digest) travels instead of the document bytes.
  */
object Delta {

  /** Row-level diff of two snapshots keyed by `key`: returns
    * `(key, status)` with status ∈ added | removed | changed |
    * unchanged. `fp` is evaluated against each side's columns, so
    * pass a content digest (e.g.
    * `TextFunctions.fingerprint(col("text"))`), not raw content.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String,
                   fp: Column): DataFrame = {
    // explicit presence markers, NOT fp nullness: a null fingerprint
    // (e.g. md5 of a null payload) is a legitimate value on a
    // present row and must not masquerade as an absent side
    val o = oldDf.select(col(key).as("key"), fp.as("old_fp"),
      lit(1).as("__old"))
    val n = newDf.select(col(key).as("key"), fp.as("new_fp"),
      lit(1).as("__new"))
    o.join(n, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(col("old_fp") <=> col("new_fp"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Census form of [[snapshotDiff]]: status → row count. The shape
    * the audit dashboard wants, and cheap: the partial count combines
    * map-side, so the second shuffle carries ≤ 4 rows per partition.
    */
  def snapshotDiffCensus(oldDf: DataFrame, newDf: DataFrame,
                         key: String, fp: Column): DataFrame =
    snapshotDiff(oldDf, newDf, key, fp)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"))

  /** MERGE INTO: apply a changelog to a snapshot — the lakehouse
    * upsert/delete compaction every incrementally-maintained table
    * runs nightly.
    *
    * `changes` carries the snapshot's payload columns plus `opCol`
    * (`"upsert"` | `"delete"`), `ts`, and `tiebreak`. Per key, the
    * LATEST change wins ([[Temporal.compactLatest]] — one map-side-
    * partial aggregation, so a key changed a million times still
    * ships one candidate per scan partition); the merge itself is a
    * single full-outer equi-join on the key:
    * latest op = delete → row dropped; upsert → the change's
    * payload; no change → the snapshot row. Two keyed exchanges
    * total (or zero for the join side, if snapshot and changelog are
    * both written through [[Layout.writeBucketed]] on the key).
    */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
                     key: String, ts: String, tiebreak: String,
                     opCol: String): DataFrame = {
    val payload = snapshot.columns.filter(_ != key)
    require(payload.forall(changes.columns.contains),
      "changes must carry every snapshot payload column")
    // reject unknown ops in-plan: a changelog row whose latest op is
    // neither upsert nor delete would otherwise slip past the delete
    // filter and, for a key absent from the snapshot, materialize a
    // phantom all-null row. raise_error keeps the check distributed
    // and fail-fast instead of silently corrupting the merge.
    val validOp = when(col(opCol).isin("upsert", "delete"), col(opCol))
      .otherwise(raise_error(concat(
        lit(s"applyChangelog: invalid $opCol value: "),
        coalesce(col(opCol).cast("string"), lit("NULL")))))
    val latest = graft.operators.Temporal
      .compactLatest(changes, key, ts, tiebreak)
      .select(col(key) +: validOp.as("__op") +:
        payload.toIndexedSeq.map(c => col(c).as(s"__n_$c")): _*)
    snapshot.join(latest, Seq(key), "full_outer")
      .where(col("__op").isNull || col("__op") =!= "delete")
      .select(col(key) +: payload.toIndexedSeq.map { c =>
        when(col("__op") === "upsert", col(s"__n_$c"))
          .otherwise(col(c)).as(c)
      }: _*)
  }

  /** SCD type-2 history: turn a changelog into validity intervals —
    * the audit/time-travel view next to [[applyChangelog]]'s
    * latest-wins table. Per key ordered by (ts, tiebreak), each
    * upsert opens an interval `[valid_from, valid_to)` closed by the
    * NEXT change of that key (upsert or delete alike — a delete
    * closes its predecessor and opens nothing); the last open
    * interval has `valid_to` null and `is_current` true.
    *
    * Shape at 100 TB: one keyed window (a single hash exchange on
    * the key + per-key sort); no self-joins, no driver state. The
    * unknown-op guard matches [[applyChangelog]] — fail fast, never
    * corrupt history.
    */
  def scd2History(changes: DataFrame, key: String, ts: String,
                  tiebreak: String, opCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val validOp = when(col(opCol).isin("upsert", "delete"),
      col(opCol))
      .otherwise(raise_error(concat(
        lit(s"scd2History: invalid $opCol value: "),
        coalesce(col(opCol).cast("string"), lit("NULL")))))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col(tiebreak).asc)
    changes
      .withColumn("__op", validOp)
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .where(col("__op") === "upsert")
      .withColumn("valid_from", col(ts))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__op")
  }
}
