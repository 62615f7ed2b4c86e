package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

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

  /** Durable sink for a windowed-stats stream: append-mode parquet —
    * only watermark-FINALIZED windows are written, so each (window,
    * key) row lands exactly once, and the checkpoint makes file
    * output exactly-once across restarts (Spark's file sink commits
    * per-batch manifests; readers see only committed files). The
    * natural layout for a structure-monitoring pipeline: a downstream
    * batch job reads the same parquet with no dedup step.
    */
  def statsParquetSink(stats: DataFrame, path: String,
                       checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stats.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()

  /** Streaming corpus profile — the ingest-side twin of
    * [[graft.operators.Sketches.corpusProfile]], and literally the
    * same code: the sketch states (HLL++ registers, GK summaries)
    * are mergeable monoids, so the identical aggregation runs over a
    * `readStream` frame with the state store carrying the partial
    * sketches across micro-batches. Fixed memory per group forever —
    * the profile of an unbounded ingest never grows state. HLL++ is
    * order-insensitive (register maxima), so the streamed distinct
    * estimate equals the batch one EXACTLY on any replay split; GK
    * compression is merge-order-sensitive, so quantile estimates
    * stay within the rank-error bound rather than bit-equal
    * (StreamingProfileSpec pins both properties). Use with
    * `complete`/`update` output mode.
    */
  def profileStream(df: DataFrame, groupCol: String, textCol: String,
                    rsd: Double = 0.02,
                    accuracy: Int = 10000): DataFrame =
    graft.operators.Sketches.corpusProfile(df, col(groupCol),
      col(textCol), rsd, accuracy)

  /** Gopher/C4 quality census (q108's aggregation, batch or
    * streaming): per-group document counts plus per-rule pass counts
    * from [[graft.functions.TextFunctions.qualityFlags]]'s single
    * projection. On a stream this is an ordinary incremental
    * grouped aggregation — the per-document flags are a stateless
    * map, the counts fold in the state store, so the census over an
    * unbounded ingest carries O(groups × rules) state total.
    */
  def qualityCensus(df: DataFrame, groupCol: String,
                    textCol: String): DataFrame = {
    import graft.functions.TextFunctions
    df.select(col(groupCol).as("group"),
        TextFunctions.qualityFlags(col(textCol)).as("qf"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n_docs"),
        TextFunctions.QualityRuleNames.map(r =>
          count(when(col(s"qf.$r"), 1)).as(s"n_$r")): _*)
  }

  /** Streaming BOILERPLATE-LINE SCREEN — the ingest-side twin of
    * [[graft.operators.Dedup.removeFrequentLines]]'s removal half.
    * The frequent-line digest set comes from the BATCH frequency
    * pass over the existing corpus
    * ([[graft.operators.Dedup.frequentLineDigests]] — boilerplate-
    * sized, persisted beside the corpus like the decontamination
    * screen), and each arriving document is cleaned STATELESSLY: its
    * line array is filtered against the digest literal in a pure
    * projection — no streaming state, no shuffle, survives any
    * ingest rate. Adds `clean_text`, `n_lines`, `n_removed`.
    *
    * The digest set is collected to a single in-plan literal (the
    * broadcast-LUT pattern); `maxDigests` prices the collect and
    * REFUSES a set that would not be boilerplate-sized — at that
    * point the corpus needs the batch path, not a screen.
    */
  def lineScreenStream(stream: DataFrame, textCol: String,
                       freqLines: DataFrame,
                       maxDigests: Int = 100000): DataFrame = {
    val digests = freqLines.select(col("lh"))
      .collect().map(_.getString(0)).toSeq.sorted
    require(digests.length <= maxDigests,
      s"frequent-line set has ${digests.length} digests > " +
        s"$maxDigests — not boilerplate-sized; run the batch " +
        "removeFrequentLines instead")
    val arr = typedLit(digests)
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l => !array_contains(arr, md5(l)))
    stream
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_removed",
        (size(lines) - size(kept)).cast("long"))
      .withColumn("clean_text", array_join(kept, "\n"))
  }

  /** Streaming LM QUALITY SCREEN — the ingest-side twin of
    * [[graft.operators.LangModel.crossEntropyBits]] (q141). The
    * bigram model comes from the BATCH training pass over the
    * trusted corpus ([[graft.operators.LangModel.trainBigram]]) and
    * freezes into two in-plan map literals; each arriving document
    * is scored STATELESSLY — tokens → per-bigram whole-bit code
    * lengths → sum — in a pure projection with no streaming state
    * and no shuffle. Adds `n_bigrams`, `n_unseen`, `lm_bits`,
    * `lm_decibits` (null when the doc has no bigram), and the
    * `lm_flagged` verdict at `flagDecibits`.
    *
    * `maxModelEntries` prices the collect and REFUSES a model that
    * is not trusted-slice-sized — a web-scale model belongs in the
    * batch join path, not a literal.
    */
  def lmScreenStream(stream: DataFrame, textCol: String,
                     bi: DataFrame, uni: DataFrame, vocab: DataFrame,
                     flagDecibits: Long = 50L,
                     maxModelEntries: Int = 500000): DataFrame = {
    val biM = bi.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val uniM = uni.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(biM.size + uniM.size <= maxModelEntries,
      s"bigram model has ${biM.size + uniM.size} entries > " +
        s"$maxModelEntries — not trusted-slice-sized; score with " +
        "the batch LangModel.crossEntropyBits join instead")
    val v = vocab.collect().head.getLong(0)
    val biLit = typedLit(biM)
    val uniLit = typedLit(uniM)
    def fl2(c: org.apache.spark.sql.Column) =
      (length(bin(c)) - 1).cast("long")
    val toks = split(trim(col(textCol)), "\\s+")
    val bgs = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1), i =>
        struct(element_at(toks, i).as("w1"),
          concat_ws(" ", element_at(toks, i),
            element_at(toks, i + 1)).as("bg"))))
      .otherwise(expr("CAST(array() AS " +
        "array<struct<w1: string, bg: string>>)"))
    val bitsArr = transform(bgs, x =>
      fl2(coalesce(element_at(uniLit, x.getField("w1")), lit(0L)) +
        lit(v)) -
      fl2(coalesce(element_at(biLit, x.getField("bg")), lit(0L)) +
        lit(1L)))
    val nb = size(bgs).cast("long")
    val bits = aggregate(bitsArr, lit(0L), (acc, b) => acc + b)
    stream
      .withColumn("n_bigrams", nb)
      .withColumn("n_unseen", size(filter(bgs, x =>
        element_at(biLit, x.getField("bg")).isNull)).cast("long"))
      .withColumn("lm_bits", when(nb > 0, bits))
      .withColumn("lm_decibits",
        when(nb > 0, floor(bits * 10 / nb).cast("long")))
      .withColumn("lm_flagged",
        when(nb > 0, col("lm_decibits") >= flagDecibits))
  }

  /** Streaming PHRASE WATCH — continuous exact phrase search
    * ("alert when this exact string starts appearing in the
    * ingest"): per-document match positions are the same stateless
    * zero-shuffle projection batch phrase search uses
    * ([[graft.operators.Retrieval.phrasePositions]]), and the
    * census is exact incremental aggregation state — one row per
    * group, bounded regardless of stream length.
    */
  def phraseWatch(df: DataFrame, groupCol: String, textCol: String,
                  phrase: Seq[String]): DataFrame =
    df.select(col(groupCol).as("group"),
        graft.functions.TextFunctions.tokens(col(textCol))
          .as("__ts"))
      .select(col("group"),
        graft.operators.Retrieval.phrasePositionsOf(col("__ts"),
          phrase).as("__ps"))
      .groupBy(col("group"))
      .agg(count(when(size(col("__ps")) > 0, 1)).as("n_docs"),
        coalesce(sum(size(col("__ps")).cast("long")), lit(0L))
          .as("n_occ"))

  /** Streaming MIXTURE MONITOR — the ingest-side twin of the IPF
    * mixture solve (q120): the contingency cells are exact
    * incremental aggregation state (one count per distinct
    * (row, col) cell — bounded by the attribute space, not the
    * stream length), and each micro-batch re-solves the
    * exact-integer raking over that tiny snapshot in foreachBatch,
    * handing the solved row census to `onUpdate`. A curation ingest
    * watches its language balance drift — and the weights it would
    * need to fix it — continuously. Returns the query; the caller
    * owns its lifecycle.
    */
  def mixtureCensusStream(df: DataFrame, rowKeyCol: String,
                          colKeyCol: String, rounds: Int = 3,
                          scale: Long = 1000000L,
                          onUpdate: Array[org.apache.spark.sql.Row]
                            => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.select(col(rowKeyCol).as("row_key"),
        col(colKeyCol).as("col_key"))
      .groupBy(col("row_key"), col("col_key"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"))
      .writeStream
      .foreachBatch { (cells: DataFrame, _: Long) =>
        if (!cells.isEmpty) {
          val census = graft.operators.Mixing.censusFromWeights(
            graft.operators.Mixing.rakeFromCells(
              cells.localCheckpoint(), rounds, scale), scale)
            .orderBy(col("row_key").asc_nulls_first)
            .collect()
          onUpdate(census)
        }
      }
      .outputMode("complete")
      .start()

  /** Streaming STRUCTURE INFERENCE — the flagship analyzer over an
    * unbounded ingest: each micro-batch is analyzed distributedly
    * ([[graft.analyzer.SparkAnalyzer.analyzeTable]]) and folded into
    * the running structure via the merge monoid
    * (`analyzeIncremental` — the q70 contract: exact-counter columns
    * merge EXACTLY, over-cap columns merge with the reference's own
    * summary convention). The running [[graft.core.SType]] is
    * driver-side state handed to `onUpdate` after every batch —
    * render it, diff it against yesterday's, or alert on drift.
    * Returns the query; the caller owns its lifecycle.
    *
    * foreachBatch is the right harness here because the analysis is
    * a FULL multi-pass distributed computation per batch (witness
    * agg, counters, summaries), not a single aggregation the state
    * store could carry.
    */
  def analyzeStream(df: DataFrame,
                    analyzer: graft.analyzer.SparkAnalyzer =
                      new graft.analyzer.SparkAnalyzer(),
                    prior: Option[graft.core.SType] = None,
                    onUpdate: graft.core.SType => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    @volatile var running: Option[graft.core.SType] = prior
    // foreachBatch is at-least-once: a batch can be re-invoked with
    // the SAME id after a downstream failure, and folding it twice
    // would double-count exact counters. Track the last folded id;
    // assign it only AFTER the fold, so a retry that failed inside
    // onUpdate does not re-fold either. The running SType is
    // driver-side state — on checkpoint restart pass the persisted
    // value back via `prior` (or re-analyze from scratch).
    @volatile var lastFolded = Long.MinValue
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId != lastFolded && !batch.isEmpty) {
          running = Some(running match {
            case None => analyzer.analyzeTable(batch)
            case Some(p) => analyzer.analyzeIncremental(p, batch)
          })
          lastFolded = batchId
          running.foreach(onUpdate)
        }
      }
      .outputMode("append")
      .start()
  }

  /** Streaming heavy hitters — the ingest-side twin of
    * [[graft.operators.Sketches.heavyHitters]]'s aggregation: the
    * SpaceSaving state is a bounded mergeable monoid (≤ k counters
    * per group FOREVER, independent of stream length), so the
    * streaming aggregate's state store holds exactly one sketch
    * buffer per group — the only affordable "top tokens so far"
    * shape on an unbounded ingest. Complete-mode output; exact while
    * a group's distinct-item count stays ≤ k (the regime
    * StreamingHeavyHittersSpec pins against the batch sketch).
    */
  def heavyHittersStream(df: DataFrame, groupCol: String,
                         itemCol: String, k: Int = 64): DataFrame =
    df.select(col(groupCol).as("group"), col(itemCol).as("item"))
      .where(col("item").isNotNull)
      .groupBy(col("group"))
      .agg(graft.functions.SpaceSavingAgg.spaceSaving(col("item"), k)
        .as("hh"))

  /** Streaming CDC compaction — the ingest-side twin of
    * [[graft.operators.Temporal.compactLatest]]: the same
    * `max(struct(ts, tiebreak, row))` aggregate over a readStream
    * frame maintains the LATEST row per key as it arrives. The state
    * store holds exactly one struct per key (bounded by the key
    * space, not the changelog length), partial states merge
    * map-side, and the winner is the identical total order the
    * batch operator picks — StreamingCompactSpec pins streamed ==
    * batch across uneven replay splits, ties included. Complete or
    * update output mode.
    */
  def latestSnapshotStream(df: DataFrame, key: String, ts: String,
                           tiebreak: String): DataFrame = {
    val payload = df.columns.filter(_ != key).toIndexedSeq
    df.groupBy(col(key))
      .agg(max(struct(col(ts).as("__ts"),
        col(tiebreak).as("__tb"),
        struct(payload.map(c => col(c).as(c)): _*).as("__row")))
        .as("__m"))
      .select(col(key) +: payload.map(c =>
        col(s"__m.__row.$c").as(c)): _*)
  }

  /** Streaming exact deduplication — the ingest-side twin of
    * [[graft.operators.Dedup.exactDupStats]]: keep the FIRST arrival
    * of each canonical text fingerprint
    * ([[graft.functions.TextFunctions.fingerprint]] — md5 of the
    * lowercased, whitespace-collapsed form, the same digest the batch
    * dedup and the DuckDB oracle use) and drop later copies.
    *
    * State is bounded by the watermark: `dropDuplicatesWithinWatermark`
    * keeps a fingerprint only until the event-time watermark passes
    * it, so a corpus-sized ingest never accumulates corpus-sized
    * state — duplicates arriving within the watermark horizon (the
    * crawler-recrawl / mirror-burst case) dedup exactly, older
    * re-arrivals are the batch pipeline's job
    * ([[graft.operators.Dedup.deduplicate]] downstream).
    */
  def dedupStream(df: DataFrame, tsCol: String, textCol: String,
                  watermark: String = "10 minutes"): DataFrame =
    df.withColumn("__fp",
        graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Stream-stream interval enrichment join — the ingest-side twin
    * of the batch "events joined to the state rows that precede them
    * within a horizon" shape ([[graft.operators.Temporal.rangeJoin]]
    * family): left and right streams are both WATERMARKED, the join
    * key is an equi-key, and the time predicate
    * `r.ts ≤ l.ts ≤ r.ts + horizon` bounds how long either side's
    * state must be retained — Spark evicts right rows once the left
    * watermark passes `r.ts + horizon` and vice versa, so state is
    * horizon-sized forever, not stream-sized. Matches emit as they
    * arrive (append mode). Column names on the right are suffixed
    * `_r` to keep the join unambiguous.
    *
    * StreamingIntervalJoinSpec pins streamed == the batch equi+theta
    * join on replayed splits.
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
                         key: String, tsCol: String,
                         horizon: String,
                         watermark: String = "10 minutes")
      : DataFrame = {
    val r = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, s"${c}_r")
    }
    val l = left.withWatermark(tsCol, watermark)
    val rw = r.withWatermark(s"${tsCol}_r", watermark)
    l.join(rw,
      expr(s"`$key` = `${key}_r` AND `$tsCol` >= `${tsCol}_r` " +
        s"AND `$tsCol` <= `${tsCol}_r` + interval $horizon"),
      "inner")
  }

  /** Streaming gap sessionization — the ingest-side twin of
    * [[graft.operators.Temporal.sessionize]], via Spark's NATIVE
    * `session_window` (merging event-time session state in the state
    * store, bounded by the watermark): one row per closed (key,
    * session) with the session bounds and event count. State scales
    * with OPEN sessions per key, not with history; sessions emit in
    * append mode once the watermark passes their close — exactly the
    * "user activity sessions at ingest" shape.
    *
    * Boundary convention matches the batch operator exactly:
    * `session_window` merges sessions whose windows TOUCH (an event
    * at `last + gap` still merges), the same inclusive rule as the
    * batch SQL `lag` convention (`diff > gap` starts a new session) —
    * so a replayed stream reproduces the batch session partition 1:1,
    * exact-boundary gaps included (both spec-pinned).
    */
  def sessionStats(df: DataFrame, tsCol: String, keyCol: String,
                   gap: String = "30 minutes",
                   watermark: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(col(keyCol).as("key"),
        session_window(col(tsCol), gap).as("session"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("first_event"),
        max(col(tsCol)).as("last_event"))

  /** One (doc, band) row of the streaming near-dup filter: `collided`
    * is true when the band bucket was already claimed by an
    * earlier-arriving document.
    */
  final case class NearDupVerdict(id: Long, band: Int,
                                  collided: Boolean)

  /** Streaming NEAR-duplicate filtering — the ingest-side twin of
    * [[graft.operators.Dedup.lshDedupClusters]], reusing the same
    * native MinHash signature and band derivation
    * ([[graft.functions.MinHashExpr]], the
    * [[graft.operators.Dedup.lshBands]] key layout), so a replayed
    * stream sees bit-identical band keys to the batch pipeline.
    *
    * Shape: signature + band explode are pure projections (stream-
    * safe); the only state is one claimer id per OCCUPIED band
    * bucket, sharded by (band, key) — the natural 100 TB partition,
    * since bucket claims need no cross-bucket coordination. Within a
    * micro-batch, ties resolve to the smallest id (deterministic
    * replay). A document drops when ANY of its bands was claimed by
    * another document — candidate = duplicate, the standard
    * ingest-time approximation (a bloom-filter-grade filter): batch
    * dedup verifies candidates by exact Jaccard before dropping,
    * so the stream is strictly more aggressive on LSH false
    * positives; run [[graft.operators.Dedup.deduplicate]] downstream
    * for the verified decision. On fixtures where candidates are
    * true near-dups the two agree exactly (spec-pinned), because
    * band claims chain arrivals the same way connected components
    * chain edges.
    *
    * `idleTimeout` bounds state like [[runningStats]]: a bucket
    * unclaimed-against for that long is evicted (re-arrivals beyond
    * the horizon are the batch pipeline's job, as with
    * [[dedupStream]]).
    */
  def nearDupBandVerdicts(spark: SparkSession, df: DataFrame,
                          idCol: String, textCol: String,
                          numHashes: Int = 64, bandSize: Int = 4,
                          shingleK: Int = 5,
                          idleTimeout: Option[String] =
                            Some("1 hour"))
      : Dataset[NearDupVerdict] = {
    import spark.implicits._
    require(numHashes % 4 == 0 && numHashes % bandSize == 0,
      s"need 4 | numHashes and bandSize | numHashes: " +
        s"$numHashes/$bandSize")
    val b = numHashes / bandSize
    val sigs = df.select(col(idCol).cast("long").as("id"),
      graft.functions.MinHashExpr.minHashNative(col(textCol),
        shingleK, numHashes / 4).as("sig"))
    // the lshBands key layout verbatim: band key = concatenated
    // 8-hex-char hashes of the band's rows
    val keys = transform(sequence(lit(0), lit(b - 1)), i =>
      concat((0 until bandSize).map(r =>
        element_at(col("sig"), i * bandSize + r + 1)): _*))
    val bands = sigs
      .select(col("id"), posexplode(keys).as(Seq("band", "key")))
      .where(col("key").isNotNull)
    claimVerdicts(spark, bands, idleTimeout)
  }

  /** The SimHash twin of [[nearDupBandVerdicts]]: band keys are the
    * 32/bands-bit slices of the native 32-bit SimHash
    * ([[graft.functions.SimHashExpr]], the
    * [[graft.operators.Dedup.simHashCandidatePairs]] layout) — a
    * document within Hamming distance < bands of an earlier one
    * shares at least one slice (pigeonhole) and drops. Same claim
    * state, same caveats as the MinHash form.
    */
  def simHashNearDupBandVerdicts(spark: SparkSession, df: DataFrame,
                                 idCol: String, textCol: String,
                                 bands: Int = 4,
                                 idleTimeout: Option[String] =
                                   Some("1 hour"))
      : Dataset[NearDupVerdict] = {
    require(bands > 0 && 32 % bands == 0, s"bands must divide 32: $bands")
    val bits = 32 / bands
    val mask = (1L << bits) - 1
    val sims = df.where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        graft.functions.SimHashExpr.simHashNative(col(textCol))
          .as("simhash"))
    val keys = array((0 until bands).map(b =>
      shiftright(col("simhash"), b * bits).bitwiseAND(mask)
        .cast("string")): _*)
    val banded = sims.select(col("id"),
      posexplode(keys).as(Seq("band", "key")))
    claimVerdicts(spark, banded, idleTimeout)
  }

  /** The shared band-bucket claim state: one claimer id per occupied
    * (band, key) bucket, smallest id wins within a micro-batch.
    */
  private def claimVerdicts(spark: SparkSession, bands: DataFrame,
                            idleTimeout: Option[String])
      : Dataset[NearDupVerdict] = {
    import spark.implicits._
    val typed = bands
      .select(col("band").cast("int"), col("key"), col("id"))
      .as[(Int, String, Long)]
    val timeoutConf = idleTimeout match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout
      case None => GroupStateTimeout.NoTimeout
    }
    typed.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Long, NearDupVerdict](
        OutputMode.Append, timeoutConf) {
        (key: (Int, String), rows: Iterator[(Int, String, Long)],
         state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // smallest id claims an unclaimed bucket (deterministic
            // within a micro-batch); a re-arrival of the claimer
            // itself is not a collision (exact-replay idempotence)
            val sorted = rows.map(_._3).toArray.sorted
            val claimer = state.getOption.getOrElse(sorted.head)
            if (!state.exists) state.update(claimer)
            idleTimeout.foreach(state.setTimeoutDuration)
            sorted.iterator.map(id =>
              NearDupVerdict(id, key._1, id != claimer))
          }
      }
  }

  /** Per-document verdict over [[nearDupBandVerdicts]]: `is_dup` is
    * true when any band collided. All of a document's bands arrive in
    * its own micro-batch, so the Update-mode output is final as of
    * that batch. Documents too short to shingle produce no bands and
    * no verdict — they are trivially unique; union them back as kept.
    */
  def nearDupStream(spark: SparkSession, df: DataFrame,
                    idCol: String, textCol: String,
                    numHashes: Int = 64, bandSize: Int = 4,
                    shingleK: Int = 5,
                    idleTimeout: Option[String] = Some("1 hour"))
      : DataFrame =
    nearDupBandVerdicts(spark, df, idCol, textCol, numHashes,
        bandSize, shingleK, idleTimeout)
      .groupBy(col("id"))
      .agg(max(col("collided")).as("is_dup"))

  /** Running per-key state: count/nulls/min/max plus the bounded
    * value counter backing exact positional quartiles (the same
    * monoid as batch Stats); `over` latches once `cap` distinct
    * values are seen and the counter is dropped — state per key stays
    * bounded on unbounded value domains.
    */
  final case class RunningState(count: Long, nulls: Long,
                                min: Double, max: Double,
                                counts: Map[Double, Long],
                                over: Boolean) {
    def merge(v: Option[Double], cap: Int): RunningState = v match {
      case None => copy(count = count + 1, nulls = nulls + 1)
      case Some(d) =>
        val c =
          if (over) counts
          else counts.updated(d, counts.getOrElse(d, 0L) + 1L)
        val spilled = over || c.size > cap
        RunningState(count + 1, nulls, math.min(min, d),
          math.max(max, d),
          if (spilled) Map.empty else c, spilled)
    }
  }

  object RunningState {
    val zero: RunningState = RunningState(0L, 0L,
      Double.PositiveInfinity, Double.NegativeInfinity, Map.empty,
      over = false)
  }

  /** Emitted per-key summary: totals plus positional quartiles
    * (§1.3, identical to the batch analyzer — `exact` is false once
    * the per-key counter spilled past the cap).
    */
  final case class RunningStats(key: String, count: Long, nulls: Long,
                                min: Double, max: Double,
                                q1: Option[Double], q2: Option[Double],
                                q3: Option[Double], exact: Boolean)

  private def emit(key: String, s: RunningState): RunningStats = {
    if (s.over || s.counts.isEmpty)
      RunningStats(key, s.count, s.nulls, s.min, s.max, None, None,
        None, exact = false)
    else {
      // the batch rule verbatim: quartiles from the counter monoid
      val stats = graft.core.Stats.fromCounter(
        graft.core.ValueCounter(s.counts.map { case (k, n) =>
          (k: Any) -> n }))
      RunningStats(key, s.count, s.nulls, s.min, s.max,
        Some(stats.q1.asInstanceOf[Double]),
        Some(stats.q2.asInstanceOf[Double]),
        Some(stats.q3.asInstanceOf[Double]), exact = true)
    }
  }

  /** Custom keyed state: continuous (key → running stats), updated per
    * micro-batch via mapGroupsWithState.
    *
    * `idleTimeout` bounds state size on unbounded key spaces (the
    * 100 TB concern: without it, state grows with the total number of
    * keys ever seen): a key idle longer than the timeout is evicted
    * and restarts from zero if it reappears. `None` keeps lifetime
    * state for genuinely bounded key domains. `quartileCap` bounds
    * the per-key counter behind the quartiles the same way.
    */
  def runningStats(spark: SparkSession,
                   ds: Dataset[(String, Option[Double])],
                   idleTimeout: Option[String] = Some("1 hour"),
                   quartileCap: Int = 4096)
      : Dataset[RunningStats] = {
    import spark.implicits._
    val timeoutConf = idleTimeout match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout
      case None => GroupStateTimeout.NoTimeout
    }
    ds.groupByKey(_._1)
      .mapGroupsWithState[RunningState, RunningStats](timeoutConf) {
        (key: String, rows: Iterator[(String, Option[Double])],
         state: GroupState[RunningState]) =>
          if (state.hasTimedOut) {
            // evicted: emit the final summary and drop the state
            val last = state.get
            state.remove()
            emit(key, last)
          } else {
            val prior = state.getOption.getOrElse(RunningState.zero)
            val updated = rows.foldLeft(prior)((acc, r) =>
              acc.merge(r._2, quartileCap))
            state.update(updated)
            idleTimeout.foreach(state.setTimeoutDuration)
            emit(key, updated)
          }
      }
  }

  /** Per-key burst-watch state: the trailing window of the last
    * `windowDays` OBSERVED (day, count) entries, ordered by day —
    * bounded at `windowDays` entries per key regardless of stream
    * length, the 100 TB state-size concern.
    */
  final case class BurstState(trail: Seq[(Long, Long)])

  /** Emitted per arriving (key, day, n): the batch
    * [[graft.operators.Temporal.burstDays]] verdict — exact
    * cross-multiplied alarm over the trailing observed days.
    */
  final case class BurstVerdict(key: String, day: Long, n: Long,
                                wSum: Long, wCnt: Long,
                                burst: Boolean)

  /** Streaming BURST WATCH — the ingest-side twin of
    * [[graft.operators.Temporal.burstDays]] (q149): continuous
    * per-key anomaly verdicts over DAILY COUNT rows (pre-aggregated
    * upstream, e.g. by a windowed count), with the trailing window
    * held in keyed state via mapGroupsWithState — at most
    * `windowDays` (day, count) entries per key, ever. Late or
    * replayed days are folded in day order within each batch;
    * days at-or-before the newest state entry are scored against
    * the state AS OF arrival (streaming can't rewrite history —
    * the batch operator is the retrospective truth).
    */
  def burstWatch(spark: SparkSession,
                 ds: Dataset[(String, Long, Long)],
                 windowDays: Int = 7, num: Long = 2L, den: Long = 1L,
                 minHistory: Int = 3): Dataset[BurstVerdict] = {
    import spark.implicits._
    require(windowDays >= 1 && num > 0 && den > 0 && minHistory >= 1)
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[BurstState, BurstVerdict](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[BurstState]) =>
          var trail = state.getOption.getOrElse(
            BurstState(Seq.empty)).trail
          val out = rows.toSeq.sortBy(r => (r._2, r._3)).map {
            case (_, day, n) =>
              val wSum = trail.map(_._2).sum
              val wCnt = trail.length.toLong
              val burst = wCnt >= minHistory &&
                n * wCnt * den > wSum * num
              trail = (trail :+ (day, n)).sortBy(_._1)
                .takeRight(windowDays)
              BurstVerdict(key, day, n, wSum, wCnt, burst)
          }
          state.update(BurstState(trail))
          out.iterator
      }
  }

  // ---- continuous delta dedup against a persisted corpus ----------

  /** The corpus parquet a [[deltaDedupToCorpus]] pipeline maintains,
    * as (id, text) — empty-schema-safe before the first batch lands,
    * so day zero needs no priming write.
    */
  def readDedupCorpus(spark: SparkSession, path: String)
      : DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Continuous-ingest deduplication: each micro-batch is screened
    * against the persisted corpus with the FULL batch composition
    * ([[graft.operators.Dedup.deduplicateAgainst]]: exact-fingerprint
    * pass, new-vs-old + new-vs-new LSH candidates, verified Jaccard,
    * corpus-cluster verdicts) and the survivors are APPENDED to the
    * corpus — so every later batch deduplicates against everything
    * admitted before it. `foreachBatch` because the per-batch job is
    * a batch dedup DAG (bucket joins + connected components) that
    * incremental streaming operators cannot express; the corpus
    * parquet is the state store — arbitrarily large, never held in
    * the streaming state — while per-batch work stays delta-sized
    * ([[graft.operators.Dedup.lshPairsAgainst]]'s new-vs-old shape).
    *
    * Failure/replay semantics: re-processing a batch whose survivors
    * already landed is a no-op — the exact-fingerprint pass drops
    * every row of the replayed batch as a corpus duplicate — so the
    * corpus converges under Structured Streaming's at-least-once
    * `foreachBatch` replay (a crash INSIDE the parquet append can
    * still leave a torn write, the usual non-transactional-sink
    * caveat).
    *
    * Requires globally unique ids across the stream's lifetime.
    * Returns the started query; the corpus at `corpusPath` is the
    * output.
    */
  /** Continuous decontamination screen: every micro-batch of
    * incoming documents is checked against a FIXED benchmark set
    * (the screen — distinct bench shingle digests + their Bloom bits
    * — is built ONCE before the stream starts; see
    * [[graft.operators.Dedup.buildContaminationScreen]]), and the
    * per-doc verdicts (id, n_shingles, n_hits) are appended to a
    * parquet. `foreachBatch` because the per-batch job is a bounded
    * batch aggregation (per-doc hit counts) that an unbounded
    * streaming agg would hold in state forever; the static bench
    * side never re-computes — each batch pays only its own shingle
    * projection + Bloom filter + survivor-confirm join
    * ([[graft.operators.Dedup.screenAgainst]]).
    *
    * Replay semantics: `foreachBatch` is at-least-once, so a
    * replayed batch appends its verdict rows AGAIN. Verdicts are
    * pure functions of (doc, bench), so duplicates are identical
    * rows — readers dedupe with `dropDuplicates("id")` and lose
    * nothing (same caveat family as the delta-dedup corpus's torn
    * write).
    */
  def decontamScreenToParquet(stream: DataFrame, idCol: String,
                              textCol: String,
                              screen:
                                graft.operators.Dedup
                                  .ContaminationScreen,
                              verdictPath: String,
                              checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row],
                       _: Long) =>
        graft.operators.Dedup.screenAgainst(screen, batch.toDF(),
            col(idCol), col(textCol))
          .write.mode("append").parquet(verdictPath)
      }
      .start()

  /** Continuous ANN index ingestion — the streaming twin of
    * [[graft.operators.Similarity.appendToIvfPq]]: every micro-batch
    * of vectors is coarse-assigned and PQ-encoded against FROZEN
    * centroids/codebooks (built once before the stream starts —
    * retraining is a batch decision, not a per-batch one) and its
    * (id, label) + (id, codes) rows are appended beside the
    * persisted index tables. `foreachBatch` because encoding is a
    * bounded batch DAG over broadcast frames; no streaming state at
    * all — the parquet index IS the state, delta-sized work per
    * batch.
    *
    * Replay semantics: at-least-once `foreachBatch` can append a
    * batch's rows twice; placements are pure functions of (vector,
    * frozen index), so duplicates are identical rows — serving
    * readers dedupe with `dropDuplicates("id")` (same caveat family
    * as the delta-dedup corpus).
    */
  def indexAppendStream(stream: DataFrame, idCol: String,
                        vecCol: String, dims: Int, m: Int,
                        ivfCentroids: DataFrame,
                        codebooks: DataFrame, indexPath: String,
                        checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row],
                       _: Long) =>
        val (labels, codes) =
          graft.operators.Similarity.appendToIvfPq(batch.toDF(),
            idCol, vecCol, dims, m, ivfCentroids, codebooks)
        labels.write.mode("append")
          .parquet(s"$indexPath/delta_labels")
        codes.write.mode("append")
          .parquet(s"$indexPath/delta_codes")
      }
      .start()

  def deltaDedupToCorpus(stream: DataFrame, idCol: String,
                         textCol: String, corpusPath: String,
                         checkpointDir: String,
                         numHashes: Int = 64, bandSize: Int = 4,
                         shingleK: Int = 5, thresholdNum: Int = 1,
                         thresholdDen: Int = 5,
                         maxBucketSize: Long = 10000L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row],
                       _: Long) =>
        val kept = graft.operators.Dedup.deduplicateAgainst(
          readDedupCorpus(batch.sparkSession, corpusPath),
          col("id"), col("text"),
          batch.toDF(), col(idCol), col(textCol),
          numHashes, bandSize, shingleK, thresholdNum, thresholdDen,
          maxBucketSize)
        kept.select(col(idCol).cast("long").as("id"),
            col(textCol).cast("string").as("text"))
          .write.mode("append").parquet(corpusPath)
      }
      .start()

  /** Streaming INCREMENTAL PAGERANK — the ingest twin of
    * [[graft.operators.Graph.pagerankDelta]], composing the
    * persisted-trace discipline with micro-batch edge arrival: the
    * base edge frame and its completed
    * [[graft.operators.Graph.pagerankTrace]] run live as parquet
    * (`baseEdgesPath`, `traceDir/t0..tK` — the artifacts, built
    * once); each arriving batch of `(src, dst)` edges lands in its
    * OWN batch-id-keyed delta partition and the CUMULATIVE delta
    * folds against the frozen trace, overwriting the serving scores
    * table with `pagerank(base ∪ all deltas so far)` — exact, per
    * the fold's oracle-pinned equivalence.
    *
    * `foreachBatch` because the fold is a bounded batch DAG over
    * persisted frames — no streaming state at all; the parquet
    * trio IS the state. Replay semantics: at-least-once re-runs
    * OVERWRITE the same `batch=<id>` partition with identical rows
    * and re-fold the same cumulative delta, so a crash anywhere
    * lands back in the exact state — effectively-once without a
    * transaction log. Per-batch cost is the fold's:
    * frontier-proportional in the cumulative delta, not the graph;
    * when the accumulated delta stops being "small", rebuilding the
    * base + trace artifacts is a batch decision (the
    * indexAppendStream retraining rule).
    */
  def rankFoldStream(stream: DataFrame, baseEdgesPath: String,
                     traceDir: String, iterations: Int,
                     deltaPath: String, scoresPath: String,
                     checkpointDir: String,
                     rebuildRatioNum: Long = 1L,
                     rebuildRatioDen: Long = 5L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        val s = batch.sparkSession
        batch.toDF().select(col("src"), col("dst"))
          .write.mode("overwrite")
          .parquet(s"$deltaPath/batch=$batchId")
        val base = s.read.parquet(baseEdgesPath)
          .select(col("src"), col("dst"))
        val delta = s.read.parquet(deltaPath)
          .select(col("src"), col("dst"))
        warnPastRebuildRatio("rankFoldStream", batchId, base, delta,
          rebuildRatioNum, rebuildRatioDen)
        val trace = (0 to iterations).map(i =>
          s.read.parquet(s"$traceDir/t$i"))
        graft.operators.Graph.pagerankDelta(base, delta, trace)
          .write.mode("overwrite").parquet(scoresPath)
      }
      .start()

  /** The fold streams re-fold the CUMULATIVE delta every batch, so
    * per-batch cost grows with stream lifetime; the documented rule
    * is "rebuild the base + trace artifacts once the delta stops
    * being small". This makes the rule MEASURABLE: every batch logs
    * the delta/base edge ratio (two metadata-cheap parquet counts)
    * and warns once it passes `num/den` — the operator's signal to
    * schedule the rebuild.
    */
  private def warnPastRebuildRatio(who: String, batchId: Long,
                                   base: DataFrame, delta: DataFrame,
                                   num: Long, den: Long): Unit = {
    val nBase = base.count()
    val nDelta = delta.count()
    System.err.println(s"$who: batch $batchId cumulative delta = " +
      s"$nDelta edges over $nBase base edges")
    if (nDelta * den > nBase * num)
      System.err.println(s"warning: $who: cumulative delta " +
        s"($nDelta) exceeds $num/$den of the base ($nBase) — " +
        "per-batch fold cost now rivals a full re-rank; rebuild " +
        "the base edges + trace artifacts and reset the delta " +
        "directory")
  }

  /** Streaming INCREMENTAL HITS — [[rankFoldStream]]'s twin for the
    * hub/authority family: base edges + a completed
    * [[graft.operators.Graph.hitsTrace]] raw trace live as parquet;
    * each micro-batch lands in its own batch-id-keyed delta
    * partition (idempotent overwrite) and the cumulative delta
    * folds via [[graft.operators.Graph.hitsDelta]], overwriting the
    * serving scores with `hitsDeferred(base ∪ all deltas)` exactly.
    * Same replay semantics and retraining rule as the rank twin.
    */
  def hitsFoldStream(stream: DataFrame, baseEdgesPath: String,
                     traceDir: String, iterations: Int,
                     deltaPath: String, scoresPath: String,
                     checkpointDir: String,
                     rebuildRatioNum: Long = 1L,
                     rebuildRatioDen: Long = 5L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        val s = batch.sparkSession
        batch.toDF().select(col("src"), col("dst"))
          .write.mode("overwrite")
          .parquet(s"$deltaPath/batch=$batchId")
        val base = s.read.parquet(baseEdgesPath)
          .select(col("src"), col("dst"))
        val delta = s.read.parquet(deltaPath)
          .select(col("src"), col("dst"))
        warnPastRebuildRatio("hitsFoldStream", batchId, base, delta,
          rebuildRatioNum, rebuildRatioDen)
        val trace = (0 to iterations).map(i =>
          s.read.parquet(s"$traceDir/t$i"))
        graft.operators.Graph.hitsDelta(base, delta, trace)
          .write.mode("overwrite").parquet(scoresPath)
      }
      .start()

  /** Streaming DECREMENTAL CLUSTERING — the takedown twin of the
    * fold streams, composing [[graft.operators.Dedup.ClusterState]]
    * retraction with micro-batch arrival: the base artifact (the
    * labeling + the label-tagged verified pair store) lives as
    * parquet, built once by `Dedup.clusterState`; each arriving
    * batch of removed ids lands in its OWN batch-id-keyed partition
    * and the CUMULATIVE removal set retracts against the FROZEN base
    * state, overwriting the serving labels + pairs with
    * `retractFromComponents(base, all removals so far)` — exact per
    * the retraction's oracle-pinned equivalence to a full re-cluster
    * of the surviving pairs.
    *
    * Same replay semantics as [[rankFoldStream]]: at-least-once
    * re-runs overwrite the same `batch=<id>` partition with
    * identical ids and re-retract the same cumulative set, so a
    * crash lands back in the exact state. The retraction's OWN share
    * budget is the rebuild signal here: once the cumulative
    * removals' affected pairs pass `maxShareNum/maxShareDen`, the
    * batch fails loudly with the rebuild instruction (re-run
    * `clusterState` over the surviving pairs, reset the removals
    * directory).
    */
  def retractFoldStream(stream: DataFrame, baseLabelsPath: String,
                        basePairsPath: String, removalsPath: String,
                        servingPath: String, checkpointDir: String,
                        maxShareNum: Long = 1L,
                        maxShareDen: Long = 2L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        val s = batch.sparkSession
        batch.toDF().select(col("id"))
          .write.mode("overwrite")
          .parquet(s"$removalsPath/batch=$batchId")
        val state = graft.operators.Dedup.ClusterState(
          s.read.parquet(baseLabelsPath),
          s.read.parquet(basePairsPath))
        val removed = s.read.parquet(removalsPath).select(col("id"))
        val after = graft.operators.Dedup.retractFromComponents(
          state, removed, maxShareNum, maxShareDen)
        after.labels.write.mode("overwrite")
          .parquet(s"$servingPath/labels")
        after.pairs.write.mode("overwrite")
          .parquet(s"$servingPath/pairs")
      }
      .start()

  final case class TransitionState(lastEvent: String, lastTs: Long,
                                   lastId: Long)
  final case class TransitionRow(entity: Long, prev: String,
                                 next: String, ts: Long)

  /** Streaming TRANSITION WATCH — the ingest twin of
    * [[graft.operators.Temporal.transitionCensus]]: per-entity
    * consecutive event pairs emitted AS THEY ARRIVE. State per
    * entity = the single last (event, ts, id) — constant regardless
    * of stream length; micro-batch rows sort in memory per entity
    * (bounded by the entity's batch volume) and stitch across the
    * batch boundary through the state. Contract: per-entity
    * in-order arrival ACROSS batches (the event-log norm — the
    * batch operator's total-order requirement, split-adjusted);
    * within a batch any order is fine. The contract is ENFORCED:
    * a row arriving strictly before the state's (ts, id) watermark
    * is a violation and is dropped — it neither emits a
    * time-reversed transition nor regresses the state.
    *
    * Input: `(entity, event, ts, id)`; output one row per
    * transition, append mode — a downstream count(prev, next)
    * equals the batch census.
    */
  def transitionWatch(spark: SparkSession,
                      ds: Dataset[(Long, String, Long, Long)])
      : Dataset[TransitionRow] = {
    import spark.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[TransitionState, TransitionRow](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (entity: Long, rows: Iterator[(Long, String, Long, Long)],
         state: GroupState[TransitionState]) =>
          val ordered = rows.toSeq.sortBy(r => (r._3, r._4))
          var last = state.getOption
          val out = ordered.flatMap { case (_, ev, ts, id) =>
            // cross-batch ordering contract: a row at or before the
            // carried (lastTs, lastId) watermark arrived late — drop
            // it (emitting would fabricate a time-reversed
            // transition; updating state would regress the
            // watermark). `<=` on the id so an at-least-once
            // redelivery of the LAST event is rejected too, not
            // re-processed into a fabricated self-transition.
            if (last.exists(s => ts < s.lastTs ||
                (ts == s.lastTs && id <= s.lastId))) None
            else {
              val o = last.map(s =>
                TransitionRow(entity, s.lastEvent, ev, ts))
              last = Some(TransitionState(ev, ts, id))
              o
            }
          }
          last.foreach(state.update)
          out.iterator
      }
  }

  /** Streaming DATA-CONTRACT WATCH — the ingest twin of
    * [[graft.operators.Contracts.ruleCensus]]: the same single-pass
    * wide rule aggregate ([[graft.operators.Contracts.ruleAgg]],
    * shared verbatim so the two cannot drift), folded incrementally
    * — state is ONE row of counters regardless of stream length.
    * (The batch census's explode-to-rows runs after a streaming
    * aggregate, which Spark's planner rejects; the wide row IS the
    * streaming-shaped census.)
    */
  def contractWatch(stream: DataFrame,
                    rules: Seq[(String, org.apache.spark.sql.Column)])
      : DataFrame =
    graft.operators.Contracts.ruleAgg(stream, rules)

  /** Streaming QUARANTINE SCREEN — the ingest twin of
    * [[graft.operators.Contracts.quarantine]]: every arriving row
    * tagged with its violated-rule `reasons` array by the SAME pure
    * projection the batch split uses ([[graft.operators.Contracts
    * .tagged]]) — zero state, zero shuffle, so a router downstream
    * sends `size(reasons) > 0` rows to the quarantine sink at any
    * ingest rate.
    */
  def contractScreenStream(stream: DataFrame,
                           rules: Seq[(String,
                             org.apache.spark.sql.Column)])
      : DataFrame =
    graft.operators.Contracts.tagged(stream, rules)

  /** Streaming LANGUAGE SCREEN — the ingest twin of
    * [[graft.operators.LangModel.langIdStruct]]: every arriving
    * document classified by the SAME stateless codegen'd projection
    * the batch census uses (the broadcast literal model rides the
    * expression — zero state, zero shuffle, any ingest rate). The
    * model is trained OFFLINE on a labeled batch slice; a router
    * downstream keeps/drops by `lang.pred` / `lang.bits`.
    */
  def langIdScreenStream(stream: DataFrame,
                         model: graft.operators.LangModel.LangIdModel,
                         textCol: String): DataFrame =
    stream.withColumn("lang",
      graft.operators.LangModel.langIdStruct(model, col(textCol)))

  /** Streaming MARKUP EXTRACT — the ingest twin of q167's
    * [[graft.functions.HtmlTextExpr]]: arriving crawl records get
    * `struct<text, title, n_links, n_paragraphs>` from one
    * codegen'd never-throwing pass — the step-zero projection of a
    * streaming web-corpus pipeline, stateless at any rate.
    */
  def htmlExtractStream(stream: DataFrame,
                        htmlCol: String): DataFrame =
    stream.withColumn("doc",
      graft.functions.HtmlTextExpr.htmlExtract(col(htmlCol)))
}
