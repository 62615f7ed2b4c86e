package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines, designed for
  * the 100 TB shape:
  *
  *  - **Exact**: hash-groupBy on a canonical fingerprint — one shuffle
  *    on the digest, map-side partial aggregation.
  *  - **MinHash + LSH**: native shingle expression → one md5 per
  *    shingle → per-slice minimums combined map-side by partial
  *    aggregation (one signature row per id crosses the shuffle) →
  *    band keys → bucket-join. Candidate pairs only ever materialize
  *    within a band bucket, never the O(n²) cross product.
  *  - **SimHash**: 32-bit md5-slice per-token sign-sum — one pass,
  *    Hamming-ball lookups via band substrings.
  *  - **N-gram Jaccard**: shingle-explode + equi-join on shingle; the
  *    integer threshold form `k·inter ≥ m·union` avoids float
  *    comparisons entirely (exactly portable to the DuckDB oracle).
  *
  * Every hash is md5-derived — identical digests in DuckDB, so every
  * operator has an exact SQL oracle.
  */
object Dedup {

  /** Exact-duplicate statistics over a text column: total, distinct
    * fingerprints, duplicate count.
    */
  def exactDupStats(df: DataFrame, text: Column): DataFrame =
    df.select(TextFunctions.fingerprint(text).as("fp"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_unique"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_dups"))

  /** Distinct word-k-gram shingle rows (id, s) via the native
    * [[graft.functions.WordShinglesExpr]] Catalyst expression: one JVM
    * call per row (already-deduplicated output), map-side with zero
    * shuffle — measured 2.5x faster than a window-lead formulation and
    * ~15x faster than interpreted array lambdas at sf0.1.
    */
  def shingleRows(df: DataFrame, idCol: Column, text: Column,
                  k: Int): DataFrame =
    // widen a narrow scan first: the shingle explode is the CPU-heavy
    // per-row step, and a single small parquet file otherwise runs it
    // on a handful of tasks (ScanStats.widen is a no-op at/above the
    // session width)
    ScanStats.widen(df).select(idCol.as("id"), explode(
      graft.functions.WordShinglesExpr.wordShinglesNative(text, k))
      .as("s"))

  /** MinHash signature columns `mh1..mhN` over word-k-gram shingles,
    * computed by the native [[graft.functions.MinHashExpr]]: the whole
    * signature is one JVM call per document — a pure projection with
    * NO explode, NO groupBy, NO shuffle (the previous formulation
    * shuffled every shingle row through a partial aggregation).
    *
    * The family is salted md5 (`md5(s || '#' || salt)`, four
    * 8-hex-char slices per salt), so `numHashes` must be a multiple of
    * 4; the default 64 gives a b=16, r=4 banding whose collision curve
    * actually separates 0.8-Jaccard near-dups from noise (a 4-hash
    * family cannot). Docs with fewer than k tokens get null
    * signatures.
    */
  def minHashSignatures(df: DataFrame, idCol: Column, text: Column,
                        numHashes: Int = 64, shingleK: Int = 5)
      : DataFrame = {
    require(numHashes % 4 == 0 && numHashes > 0,
      "salted md5 slices come in fours")
    // widen a narrow scan first (the shingleRows rationale): the
    // whole-signature projection is the most md5-intensive per-row
    // step in the module
    ScanStats.widen(df).select(idCol.as("id"),
      graft.functions.MinHashExpr.minHashNative(text, shingleK,
        numHashes / 4).as("sig"))
  }

  /** LSH band keys from a signature frame (id, sig array): rows
    * (id, band, key) where key concatenates the band's 8-hex-char
    * hashes (b bands of r rows; collision probability 1-(1-J^r)^b).
    * Near-duplicates collide on at least one band with high
    * probability; the bucket-join replaces the O(n²) scan.
    *
    * The signature array is referenced exactly ONCE (a single
    * `transform` + `posexplode`), which matters: splaying it into
    * per-hash columns would inline the expensive MinHash expression
    * into every band branch and re-evaluate it b× per row (measured
    * 7× slower at sf0.1). Null signatures (short docs) vanish in the
    * explode, keeping them out of candidate generation.
    */
  def lshBands(sigs: DataFrame, numHashes: Int = 64,
               bandSize: Int = 4): DataFrame = {
    val b = numHashes / bandSize
    val keys = transform(sequence(lit(0), lit(b - 1)), i =>
      concat((0 until bandSize).map(r =>
        element_at(col("sig"), i * bandSize + r + 1)): _*))
    sigs.select(col("id"), posexplode(keys).as(Seq("band", "key")))
  }

  /** Candidate near-duplicate pairs: ids sharing an LSH band bucket.
    * Buckets above `maxBucketSize` (mass-duplicate clusters: a band
    * key shared by k docs contributes k² join rows) are dropped via
    * broadcast anti-join; dedup them with [[exactDupStats]]-style
    * fingerprinting first instead of pairwise.
    */
  def lshCandidatePairs(bands: DataFrame,
                        maxBucketSize: Long = 10000L): DataFrame = {
    val kept = dropHotBuckets(bands, maxBucketSize)
    val a = kept.as("a")
    val b = kept.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
  }

  /** 32-bit SimHash over whitespace tokens via the native
    * [[graft.functions.SimHashExpr]]: the whole signature is one JVM
    * call per document — a pure projection with NO explode and NO
    * shuffle (the previous formulation shuffled every token row
    * through 32 sum aggregates). The token hash (first 4 md5 bytes)
    * is what DuckDB computes via
    * `CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT)`, so the SQL
    * oracle is unchanged.
    */
  def simHash32(df: DataFrame, idCol: Column, text: Column): DataFrame =
    // null-text docs are absent, matching both the previous
    // explode-based shape and the oracle's unnest (which drop them)
    df.where(text.isNotNull)
      .select(idCol.as("id"),
        graft.functions.SimHashExpr.simHashNative(text).as("simhash"))

  /** SimHash near-duplicate candidates: split each 32-bit hash into
    * `bands` bit-slices and bucket-join — two hashes within Hamming
    * distance < bands share at least one identical slice (pigeonhole),
    * so the equi-join is a complete candidate generator for that
    * radius without any pairwise scan. Slices shared by more than
    * `maxBucketSize` docs (mass-duplicate clusters that would
    * re-create the quadratic join) are dropped via broadcast
    * anti-join, like every other bucket join in this module.
    */
  def simHashCandidatePairs(sims: DataFrame, bands: Int = 4,
                            maxBucketSize: Long = 10000L): DataFrame = {
    val bits = 32 / bands
    val mask = (1L << bits) - 1
    // All band slices derive from ONE projection over the signature
    // (array of shifted slices + posexplode), mirroring lshBands:
    // `simhash` is referenced by every slice expression in the same
    // Project, so CollapseProject cannot inline an upstream
    // simHash32(...) into the branches (it only inlines
    // single-reference or cheap producers) — the tokenize+md5
    // signature is computed once per document. The previous
    // unionAll-of-selects shape re-scanned the corpus and re-evaluated
    // the signature once per band (the splay anti-pattern measured 7×
    // for MinHash bands).
    val keys = array((0 until bands).map(b =>
      shiftright(col("simhash"), b * bits).bitwiseAND(mask)): _*)
    val sliced = sims.select(col("id"),
      posexplode(keys).as(Seq("band", "key")))
    val kept = dropHotBuckets(sliced, maxBucketSize)
    val a = kept.as("a")
    val b = kept.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
  }

  /** Perceptual hashes for an image-bytes column: (id, dhash, ahash)
    * via the native [[graft.functions.ImageHash]] expressions — one
    * decode+hash JVM call per image, a pure projection. Rows whose
    * bytes do not decode (non-BMP, truncated, smaller than the hash
    * grid) are dropped, exactly like null-text docs in [[simHash32]].
    */
  def imageHashes(df: DataFrame, idCol: Column,
                  bytesCol: Column): DataFrame =
    df.select(idCol.as("id"),
        graft.functions.ImageHash.imageDHash(bytesCol).as("dhash"),
        graft.functions.ImageHash.imageAHash(bytesCol).as("ahash"))
      .where(col("dhash").isNotNull && col("ahash").isNotNull)

  /** Perceptual near-duplicate image pairs within `maxHamming` bits
    * of dHash distance: the [[simHashCandidatePairs]] discipline on
    * the 64-bit hash — slice into the fewest bands that make the
    * pigeonhole complete (bands > maxHamming, rounded up to a
    * divisor of 64), bucket-join the slices with the shared hot-
    * bucket guard, then verify candidates EXACTLY with one codegen'd
    * `bit_count(xor)` per pair. Never a pairwise scan: at 100 TB the
    * candidate volume is the banded-collision count, and
    * mass-duplicate hash buckets (solid-color thumbnails) fall to
    * the anti-join guard instead of re-creating the quadratic join.
    */
  def imageNearDups(hashes: DataFrame, maxHamming: Int = 4,
                    maxBucketSize: Long = 10000L): DataFrame =
    hammingNearDups(hashes, "dhash", maxHamming, maxBucketSize)

  /** The medium-agnostic core of [[imageNearDups]]: near-duplicate
    * `(id1, id2, hamming)` pairs over ANY 64-bit perceptual hash
    * column (image dHash, audio energy fingerprint, …) within
    * `maxHamming` bits, banded + hot-bucket-capped + exact-verified
    * as described there.
    */
  def hammingNearDups(hashes: DataFrame, hashCol: String,
                      maxHamming: Int = 4,
                      maxBucketSize: Long = 10000L): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must lie in [0, 64): $maxHamming")
    val bands = Seq(1, 2, 4, 8, 16, 32, 64)
      .find(_ > maxHamming).get
    val bits = 64 / bands
    val mask = lit(if (bits == 64) -1L else (1L << bits) - 1)
    val keys = array((0 until bands).map(b =>
      shiftright(col(hashCol), b * bits).bitwiseAND(mask)): _*)
    val sliced = hashes.select(col("id"),
      posexplode(keys).as(Seq("band", "key")))
    val kept = dropHotBuckets(sliced, maxBucketSize)
    val a = kept.as("a")
    val b = kept.as("b")
    val cands = a.join(b, col("a.band") === col("b.band") &&
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    val h1 = hashes.select(col("id").as("id1"),
      col(hashCol).as("__h1"))
    val h2 = hashes.select(col("id").as("id2"),
      col(hashCol).as("__h2"))
    cands.join(h1, "id1").join(h2, "id2")
      .select(col("id1"), col("id2"),
        bit_count(col("__h1").bitwiseXOR(col("__h2")))
          .cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Sequence-level near-duplicate CLIP pairs: `(id1, id2,
    * shared_frames)` for clips sharing at least `minShared` distinct
    * frame dHashes — re-encoded / re-cut copies of a video share
    * most of their per-frame perceptual hashes even when trimmed or
    * re-ordered (the winnowing-overlap discipline on
    * [[graft.operators.Multimodal.videoFrameHashes]] output). The
    * join key is the exact 64-bit frame hash, so candidates are
    * hash-collision-sized, never clip×clip; mass-duplicate frames
    * (black frames, title cards — the video corpus's stop-words)
    * fall to the shared hot-bucket guard instead of exploding the
    * join, exactly like hot MinHash bands in [[lshDedupClusters]].
    *
    * `frames`: one row per (clip, frame) with columns `id` and
    * `dhash`. Distinct-per-clip first, so a clip looping one frame
    * contributes it once.
    */
  def videoNearDups(frames: DataFrame, minShared: Int = 3,
                    maxBucketSize: Long = 10000L): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    val fp = frames.select(col("id"), col("dhash")).distinct()
    val kept = dropHotBuckets(
      fp.select(col("id"), lit(0).as("band"),
        col("dhash").as("key")), maxBucketSize)
    val a = kept.as("a")
    val b = kept.as("b")
    a.join(b, col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("shared_frames"))
      .where(col("shared_frames") >= minShared)
  }

  /** Winnowing fingerprint rows: (id, fps) with `fps` the sorted
    * distinct [[graft.functions.TextFunctions.winnowFingerprints]] of
    * each document — the persistable fingerprint index (store next to
    * the corpus; overlap queries then never re-hash the text).
    */
  def winnowDocFps(df: DataFrame, idCol: Column, text: Column,
                   k: Int = 16, w: Int = 8): DataFrame =
    df.select(idCol.as("id"),
      TextFunctions.winnowFingerprints(text, k, w).as("fps"))

  /** Verbatim-overlap near-duplicate pairs by shared winnowing
    * fingerprints: doc pairs sharing at least `minShared` fingerprint
    * values, with the shared count as the overlap strength. By the
    * winnowing guarantee every pair sharing a substring of length
    * >= w+k-1 surfaces here — quote/mirror/boilerplate detection that
    * MinHash (bag-of-shingles resemblance) is blind to at low overall
    * Jaccard.
    *
    * Scale shape: identical to the LSH band joins — explode to slim
    * (id, fp) rows, drop fingerprints shared by more than
    * `maxBucketSize` docs (ubiquitous boilerplate would re-create the
    * quadratic join; a fingerprint in k docs contributes k² rows) via
    * the shared broadcast anti-join guard, then one equi-join on the
    * fingerprint reusing the guard's (band, key) partitioning, and a
    * partial-agg count per pair. Never queries corpus × corpus.
    */
  def winnowPairs(df: DataFrame, idCol: Column, text: Column,
                  k: Int = 16, w: Int = 8, minShared: Int = 3,
                  maxBucketSize: Long = 10000L,
                  maxPairRows: Long = 2000000000L): DataFrame =
    winnowPairsFromFps(winnowDocFps(df, idCol, text, k, w),
      minShared, maxBucketSize, maxPairRows)

  /** [[winnowPairs]] over a PERSISTED (id, fps) fingerprint index
    * ([[winnowDocFps]] output, e.g. read back from parquet): the
    * overlap scan without re-paying the O(n) text hashing of the
    * corpus — on repeated overlap queries the index is the only
    * input that moves.
    */
  def winnowPairsFromFps(fps: DataFrame, minShared: Int = 3,
                         maxBucketSize: Long = 10000L,
                         maxPairRows: Long = 2000000000L): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    val rows = fps.select(col("id"), lit(0).as("band"),
      explode(col("fps")).as("key"))
    // the shared-count join materializes Σ df·(df−1)/2 rows over the
    // surviving fingerprints — exact for overlap strength, quadratic
    // in boilerplate document frequency. Price it pre-flight (the
    // same DECIMAL pricing as [[jaccardPairs]]; the df aggregate is
    // one pass over the slim (id, fp) rows) and REFUSE past budget:
    // a corpus-wide boilerplate fingerprint under a too-generous
    // `maxBucketSize` multiplies the join silently otherwise. The sf1
    // soak measured the real shape: max df ≈ 2 754 from replicated
    // boilerplate → 1.1×10⁸ pair rows from 3×10⁶ fingerprint rows.
    val priced = rows.groupBy(col("key"))
      .agg(count(lit(1)).as("df"))
      .agg(sum(when(col("df") <= maxBucketSize,
        expr("CAST(df * (df - 1) DIV 2 AS DECIMAL(38,0))")))
        .as("pair_rows"))
      .first().getDecimal(0)
    if (priced != null &&
        priced.compareTo(java.math.BigDecimal.valueOf(maxPairRows)) > 0)
      throw new IllegalStateException(
        s"winnowPairs: fingerprint self-join would materialize " +
        s"$priced pair rows (> budget $maxPairRows). Lower " +
        "maxBucketSize to drop corpus-wide boilerplate fingerprints " +
        "(they dominate the quadratic term and carry no pair-specific " +
        "signal), or raise maxPairRows explicitly.")
    val kept = dropHotBuckets(rows, maxBucketSize)
    val a = kept.as("a")
    val b = kept.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
  }

  /** Incremental verbatim-overlap scan: shared-fingerprint counts of
    * a NEW batch's fingerprint index against an EXISTING corpus index
    * — the winnowing twin of [[lshPairsAgainst]]. Both inputs are
    * [[winnowDocFps]] frames (the corpus side typically read back
    * from parquet), so a daily delta never re-hashes corpus text; the
    * join is new-vs-old ONLY (the corpus never self-pairs), with the
    * Σ dfNew·dfOld join fan-out priced pre-flight on the slim
    * exploded rows and REFUSED past `maxPairRows`, then each side
    * hot-bucket capped. Requires ids disjoint across the two sides.
    * Returns (new_id, old_id, shared) with shared >= `minShared`.
    */
  def winnowPairsAgainstFps(corpusFps: DataFrame, newFps: DataFrame,
                            minShared: Int = 3,
                            maxBucketSize: Long = 10000L,
                            maxPairRows: Long = 2000000000L)
      : DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    def rowsOf(fps: DataFrame): DataFrame =
      fps.select(col("id"), lit(0).as("band"),
        explode(col("fps")).as("key"))
    val oldRows = rowsOf(corpusFps)
    val newRows = rowsOf(newFps)
    val priced = newRows.groupBy(col("key"))
      .agg(count(lit(1)).as("dfn"))
      .join(oldRows.groupBy(col("key"))
        .agg(count(lit(1)).as("dfo")), Seq("key"))
      .agg(sum(when(col("dfn") <= maxBucketSize &&
        col("dfo") <= maxBucketSize,
        col("dfn").cast("decimal(38,0)") * col("dfo")))
        .as("pair_rows"))
      .first().getDecimal(0)
    if (priced != null &&
        priced.compareTo(java.math.BigDecimal.valueOf(maxPairRows)) > 0)
      throw new IllegalStateException(
        s"winnowPairsAgainstFps: new-vs-old fingerprint join would " +
        s"materialize $priced pair rows (> budget $maxPairRows). " +
        "Lower maxBucketSize to drop boilerplate fingerprints, or " +
        "raise maxPairRows explicitly.")
    val keptO = dropHotBuckets(oldRows, maxBucketSize)
    val keptN = dropHotBuckets(newRows, maxBucketSize)
    keptN.as("n")
      .join(keptO.as("o"), col("n.band") === col("o.band") &&
        col("n.key") === col("o.key"))
      .groupBy(col("n.id").as("new_id"), col("o.id").as("old_id"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
  }

  /** The drop list a dedup pipeline applies after clustering: every
    * non-representative member (label ≠ id; the representative is the
    * cluster's smallest id, deterministic across runs). Anti-join the
    * corpus against this to materialize the deduplicated output.
    */
  def dedupDropList(labels: DataFrame): DataFrame =
    labels.where(col("id") =!= col("label")).select(col("id"))

  /** Cross-corpus contamination (decontamination check): for each
    * document of the `bench` eval set, how many of its word k-gram
    * shingles appear ANYWHERE in the (huge) training corpus.
    * Returns (id, n_shingles, n_hits) per bench doc with ≥ k tokens.
    *
    * 100 TB shape: when the bench side fits `maxBroadcastBytes` —
    * real benchmark suites are MBs — its shingles broadcast, so the
    * corpus is ONE streaming scan (shingle projection + broadcast
    * hash join) with no corpus-side shuffle except the tiny
    * per-bench-doc aggregate. The budget is checked against the
    * actual bench shingle count (one action over the BENCH side
    * only, reused via cache — the corpus is never touched by the
    * estimate); past it the join degrades to a logged shuffle join
    * instead of exceeding Spark's broadcast limits and OOMing —
    * callers who feed a corpus-sized "bench" (e.g. a hash split) get
    * a correct slow path, not a dead executor. `countDistinct` per
    * bench doc makes pre-distincting the corpus shingles
    * unnecessary.
    */
  def contamination(corpus: DataFrame, corpusId: Column,
                    corpusText: Column, bench: DataFrame,
                    benchId: Column, benchText: Column,
                    shingleK: Int = 5,
                    maxBroadcastBytes: Long = 256L << 20): DataFrame = {
    val benchShingles = shingleRows(bench, benchId, benchText, shingleK)
      .select(col("id"), substring(md5(col("s")), 1, 16).as("s"))
    val benchSizes = benchShingles.groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"))
    // ~64 bytes per (id, 16-hex digest) row in a broadcast hash
    // relation; one bench-side count action (re-scanning the bench
    // in the main query is cheaper than holding a cache reference
    // open for the caller's lifetime)
    val estBytes = 64L * benchShingles.count()
    val corpusShingles =
      shingleRows(corpus, corpusId, corpusText, shingleK)
        .select(substring(md5(col("s")), 1, 16).as("s"))
    val benchSide =
      if (estBytes <= maxBroadcastBytes) broadcast(benchShingles)
      else {
        System.err.println("contamination: bench shingles ~" +
          s"$estBytes bytes exceed the $maxBroadcastBytes broadcast " +
          "budget; joining via shuffle instead")
        benchShingles
      }
    val hits = corpusShingles
      .join(benchSide, Seq("s"))
      .groupBy(col("id"))
      .agg(countDistinct(col("s")).as("n_hits"))
    benchSizes.as("b")
      .join(hits.as("h"), col("b.id") === col("h.id"), "left")
      .select(col("b.id").as("id"), col("b.n_shingles"),
        coalesce(col("h.n_hits"), lit(0L)).as("n_hits"))
  }

  /** Bloom-prescreened decontamination — the same exact result as
    * [[contamination]] (a Bloom filter has NO false negatives, and
    * every prescreen survivor is re-confirmed by the exact join), but
    * the 100 TB shape for a bench side too big to broadcast exactly:
    *
    *  1. ONE pass over the bench shingles builds a Bloom filter of
    *     their xxhash64 values (Spark's own `BloomFilterAggregate`,
    *     the machinery behind runtime bloom join filters — distributed
    *     partial aggregation, only the filter bits reach the driver:
    *     `-n·ln(fpp)/ln²2` bits ≈ 1.2 MB per million shingles at 1%).
    *  2. The corpus scan applies `BloomFilterMightContain` as a pure
    *     codegen'd FILTER — no corpus-side shuffle, no broadcast hash
    *     relation, just the filter bits riding the task binary.
    *  3. Only survivors (true hits + ~fpp of the corpus shingles)
    *     enter the exact confirm join, so the join's shuffle volume
    *     drops by ~1/fpp versus shuffling every corpus shingle.
    *
    * Versus [[contamination]]'s broadcast path: the exact broadcast
    * needs ~64 B per bench shingle; the Bloom bits need ~1.2 bytes —
    * a 50× bigger bench side fits the same memory budget, and past
    * THAT the prescreen still pays for itself by shrinking the
    * confirm join's shuffle.
    */
  def contaminationBloom(corpus: DataFrame, corpusId: Column,
                         corpusText: Column, bench: DataFrame,
                         benchId: Column, benchText: Column,
                         shingleK: Int = 5,
                         fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1): $fpp")
    import org.apache.spark.sql.GraftShims.{column => exprCol}
    import org.apache.spark.sql.catalyst.expressions.{Literal,
      BloomFilterMightContain}
    import org.apache.spark.sql.types.BinaryType

    // bench shingles are consumed three times (count, bloom build,
    // exact confirm): checkpoint once, bench-side-bounded
    val benchShingles =
      shingleRows(bench, benchId, benchText, shingleK)
        .select(col("id"), substring(md5(col("s")), 1, 16).as("s"))
        .localCheckpoint(true)
    val benchSizes = benchShingles.groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"))
    val n = benchShingles.count()
    if (n == 0)
      return benchSizes.select(col("id"), col("n_shingles"),
        lit(0L).as("n_hits"))
    val bloomBytes = bloomBitsOf(benchShingles, n, fpp)

    val corpusShingles =
      shingleRows(corpus, corpusId, corpusText, shingleK)
        .select(substring(md5(col("s")), 1, 16).as("s"))
    val prescreened = corpusShingles.where(exprCol(
      BloomFilterMightContain(Literal(bloomBytes, BinaryType),
        xxHash64Expr(col("s")))))
    val hits = prescreened
      .join(benchShingles, Seq("s"))
      .groupBy(col("id"))
      .agg(countDistinct(col("s")).as("n_hits"))
    benchSizes.as("b")
      .join(hits.as("h"), col("b.id") === col("h.id"), "left")
      .select(col("b.id").as("id"), col("b.n_shingles"),
        coalesce(col("h.n_hits"), lit(0L)).as("n_hits"))
  }

  /** A reusable decontamination screen: the benchmark set's shingle
    * digests (distinct, checkpointed) plus their Bloom bits, built
    * ONCE and applied to any number of corpora / micro-batches via
    * [[screenAgainst]]. `bloomBytes` is null for an empty bench.
    */
  final class ContaminationScreen private[operators] (
      private[operators] val benchShingleSet: DataFrame,
      private[operators] val bloomBytes: Array[Byte],
      val shingleK: Int)

  /** Build a [[ContaminationScreen]] from a benchmark set: one pass
    * shingles the bench, distincts the digests, checkpoints them
    * (bench-side-bounded), and aggregates their Bloom bits — the
    * static side of a continuous decontamination screen.
    */
  def buildContaminationScreen(bench: DataFrame, benchId: Column,
                               benchText: Column, shingleK: Int = 5,
                               fpp: Double = 0.01)
      : ContaminationScreen = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1): $fpp")
    val shingleSet = shingleRows(bench, benchId, benchText, shingleK)
      .select(substring(md5(col("s")), 1, 16).as("s"))
      .distinct()
      .localCheckpoint(true)
    val n = shingleSet.count()
    val bloomBytes =
      if (n == 0) null else bloomBitsOf(shingleSet, n, fpp)
    new ContaminationScreen(shingleSet, bloomBytes, shingleK)
  }

  /** Persist a [[ContaminationScreen]]: the distinct bench digests
    * as parquet plus the Bloom bits as a raw file — so a long-lived
    * screening pipeline (or a fleet of them) builds the bench side
    * ONCE and serves it from disk, the [[graft.operators.Similarity]]
    * PqIndex pattern. Empty-bench screens persist too (no bits
    * file).
    */
  def writeContaminationScreen(screen: ContaminationScreen,
                               path: String): Unit = {
    screen.benchShingleSet.write.mode("overwrite")
      .parquet(s"$path/shingles")
    val meta = java.nio.file.Paths.get(path, "shingle_k")
    java.nio.file.Files.createDirectories(meta.getParent)
    java.nio.file.Files.write(meta,
      screen.shingleK.toString.getBytes("UTF-8"))
    val bits = java.nio.file.Paths.get(path, "bloom_bits")
    if (screen.bloomBytes == null)
      java.nio.file.Files.deleteIfExists(bits)
    else java.nio.file.Files.write(bits, screen.bloomBytes)
  }

  /** Reload a persisted [[ContaminationScreen]] for serving. */
  def readContaminationScreen(
      spark: org.apache.spark.sql.SparkSession, path: String)
      : ContaminationScreen = {
    val k = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "shingle_k")), "UTF-8").trim.toInt
    val bits = java.nio.file.Paths.get(path, "bloom_bits")
    val bloomBytes =
      if (java.nio.file.Files.exists(bits))
        java.nio.file.Files.readAllBytes(bits)
      else null
    new ContaminationScreen(
      spark.read.parquet(s"$path/shingles"), bloomBytes, k)
  }

  /** Screen a corpus (or a micro-batch) against a prebuilt
    * [[ContaminationScreen]]: per INCOMING document, how many of its
    * shingles appear anywhere in the benchmark set — the "does this
    * new training document contain eval content" direction, the
    * per-bench-doc mirror of [[contamination]]. Returns
    * (id, n_shingles, n_hits) for docs with ≥ k tokens.
    *
    * Scale shape: the corpus scan is prescreened by the static Bloom
    * bits (pure codegen'd filter, no corpus-side shuffle), survivors
    * confirm against the distinct bench digests, and the per-doc
    * aggregate shuffles only (id, shingle) survivor rows. Nothing
    * here re-touches the bench: one screen serves every batch.
    */
  def screenAgainst(screen: ContaminationScreen, corpus: DataFrame,
                    corpusId: Column, corpusText: Column)
      : DataFrame = {
    import org.apache.spark.sql.GraftShims.{column => exprCol}
    import org.apache.spark.sql.catalyst.expressions.{
      BloomFilterMightContain, Literal}
    import org.apache.spark.sql.types.BinaryType
    val corpusShingles =
      shingleRows(corpus, corpusId, corpusText, screen.shingleK)
        .select(col("id"), substring(md5(col("s")), 1, 16).as("s"))
    val sizes = corpusShingles.groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"))
    if (screen.bloomBytes == null)
      return sizes.select(col("id"), col("n_shingles"),
        lit(0L).as("n_hits"))
    val prescreened = corpusShingles.where(exprCol(
      BloomFilterMightContain(
        Literal(screen.bloomBytes, BinaryType),
        xxHash64Expr(col("s")))))
    val hits = prescreened
      .join(screen.benchShingleSet, Seq("s"), "left_semi")
      .groupBy(col("id"))
      .agg(countDistinct(col("s")).as("n_hits"))
    sizes.as("b")
      .join(hits.as("h"), col("b.id") === col("h.id"), "left")
      .select(col("b.id").as("id"), col("b.n_shingles"),
        coalesce(col("h.n_hits"), lit(0L)).as("n_hits"))
  }

  private def xxHash64Expr(c: Column) = {
    import org.apache.spark.sql.GraftShims.{expression => colExpr}
    org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(colExpr(c)), 42L)
  }

  /** Aggregate the Bloom bits of `shingles.s` (n distinct values) at
    * the requested fpp: `-n·ln(fpp)/ln²2` bits. BloomFilterAggregate
    * SILENTLY CLAMPS numBits to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default
    * 2²⁶ bits = 8 MB — ~55M shingles at 1%), which would degrade the
    * effective fpp without warning past that size; the conf is raised
    * to the requested bits for the aggregation and restored after.
    */
  private def bloomBitsOf(shingles: DataFrame, n: Long,
                          fpp: Double): Array[Byte] = {
    import org.apache.spark.sql.GraftShims.{column => exprCol}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.
      BloomFilterAggregate
    val numBits = math.max(64L,
      math.ceil(-n * math.log(fpp) /
        (math.log(2) * math.log(2))).toLong)
    val conf = shingles.sparkSession.conf
    val key = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val saved = conf.getOption(key)
    try {
      if (saved.forall(_.toLong < numBits))
        conf.set(key, numBits.toString)
      shingles.select(exprCol(
          BloomFilterAggregate(xxHash64Expr(col("s")), Literal(n),
            Literal(numBits), 0, 0).toAggregateExpression())
          .as("bf"))
        .head().getAs[Array[Byte]](0)
    } finally saved match {
      case Some(v) => conf.set(key, v)
      case None => conf.unset(key)
    }
  }

  /** Drop (band, key) buckets holding more than `cap` rows — the
    * candidate-join guard shared by the LSH family: the over-cap list
    * is tiny by construction and applies as a broadcast anti-join.
    */
  private def dropHotBuckets(bands: DataFrame, cap: Long): DataFrame = {
    // One explicit shuffle on (band, key), shared via ReuseExchange by
    // every consumer — the hot-bucket aggregation, the anti-join probe
    // side, and both downstream self-join sides (which also need this
    // exact partitioning for the pair equi-join, so no further shuffle
    // follows). Without it each consuming subtree re-scans the corpus
    // and re-evaluates the signature projection (min_hash_sig /
    // simhash32), i.e. 4 corpus scans; with it the scan + signature
    // run once and only the slim (id, band, key) rows shuffle.
    val parts = bands.repartition(col("band"), col("key"))
    val hot = parts.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("c"))
      .where(col("c") > cap)
      .select(col("band"), col("key"))
    parts.join(broadcast(hot), Seq("band", "key"), "left_anti")
  }

  /** Connected components over a candidate-pair graph — the step
    * after pair generation in every near-dup dedup pipeline: pairs →
    * duplicate CLUSTERS → keep one representative per cluster.
    * Returns (id, label) with label = the smallest id in the
    * component (deterministic, engine-portable — the DuckDB oracle's
    * recursive closure derives the identical labels). Ids may be any
    * orderable type (long, string, …): min-label propagation only
    * compares ids, and convergence counts changed rows, so nothing
    * here is numeric-specific (and nothing can overflow — a raw
    * label SUM would silently wrap at the 10^10-id scale).
    *
    * Iterative min-label propagation with pointer jumping: each round
    * (a) pulls the minimum neighbour label over the directed edge
    * list, then (b) jumps each label through the previous round's
    * label table — the doubling step that keeps rounds O(log
    * diameter), so even a pathological million-long version-chain
    * converges in ~30 rounds (star/clique near-dup clusters take
    * 2-3). The loop stops the first round no label changes — and
    * warns loudly if `maxIter` ever cut it off early.
    *
    * ONE driver action per round: the round's plan ends in a LAZY
    * `localCheckpoint` (truncating the logical plan immediately — the
    * two label self-references would otherwise double the lineage
    * every round) and the convergence aggregate is the action that
    * materializes it, so the changed-row count rides the same job
    * that computes and caches the round's labels. Each round shuffles
    * only (id, label) rows, never the corpus; old checkpoint blocks
    * are released by the context cleaner once unreferenced.
    */
  def connectedComponents(pairs: DataFrame,
                          maxIter: Int = 25,
                          checkpointDir: Option[String] = None)
      : DataFrame = {
    // the same durability knob as graft.operators.Graph.cut: None =
    // localCheckpoint (cheapest, not executor-loss-safe); Some(dir)
    // = reliable checkpoint per round, identical results
    val edges = pairs
      .select(col("id1").as("src"), col("id2").as("dst"))
      .unionAll(pairs.select(col("id2").as("src"),
        col("id1").as("dst")))
      .distinct()
      .persist()
    var (labels, labelPins) = graft.operators.Graph.cutTracked(
      edges.select(col("src").as("id"))
        .distinct()
        .select(col("id"), col("id").as("label")),
      checkpointDir)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // min neighbour label per node, merged into the node's own
      // label by a left join (a union with the checkpointed frame
      // would re-trip Spark's union constraint rewriting)
      val nmin = edges.as("e")
        .join(labels.as("l"), col("e.dst") === col("l.id"))
        .groupBy(col("e.src").as("nid"))
        .agg(min(col("l.label")).as("nlabel"))
      val pulled = labels.as("l0")
        .join(nmin, col("l0.id") === col("nid"), "left")
        .select(col("l0.id").as("id"), col("l0.label").as("old"),
          least(col("l0.label"),
            coalesce(col("nlabel"), col("l0.label"))).as("label"))
      // pointer jump through the PREVIOUS round's (cached) table:
      // label := min(label, prevLabel(label)). Jumping through
      // `pulled` itself would need a second self-join on fresh state
      // (either a second materializing action or a double evaluation
      // of the pull); the previous table still compounds reach
      // round-over-round, keeping convergence logarithmic. Round 1
      // skips the jump join entirely — the table is still the
      // identity, so the lookup is a no-op shuffle.
      val jumped =
        if (i == 0)
          pulled.select(col("id"), col("label"),
            (col("label") =!= col("old")).as("changed"))
        else pulled.as("a")
          .join(labels.as("j"), col("a.label") === col("j.id"), "left")
          .select(col("a.id").as("id"),
            least(col("a.label"),
              coalesce(col("j.label"), col("a.label"))).as("label"),
            (least(col("a.label"),
              coalesce(col("j.label"), col("a.label")))
              =!= col("a.old")).as("changed"))
      val (next, nextPins) = graft.operators.Graph.cutTracked(
        jumped, checkpointDir, eager = false)
      // the one action: materializes + caches the round's labels AND
      // returns the changed-row count (exact — no accumulator
      // retry-double-count caveats, no Long-sum wraparound)
      val nChanged = next.agg(count(when(col("changed"), 1)))
        .head().getLong(0)
      // round t−1's blocks are dead the moment this round's count
      // materialized round t — release them instead of waiting for
      // driver GC (the shared-session degradation fix)
      graft.operators.Graph.release(labelPins)
      labels = next.select(col("id"), col("label"))
      labelPins = nextPins
      converged = nChanged == 0L
      i += 1
    }
    if (!converged)
      System.err.println("warning: connectedComponents hit " +
        s"maxIter=$maxIter before convergence; a component wider " +
        "than the budget may carry split labels")
    edges.unpersist()
    labels
  }

  /** Fold NEW pairs into an existing component labeling WITHOUT
    * re-reading the old pair set — the q63/q128/q169 delta
    * discipline applied to clustering (a daily dedup run folds
    * today's near-dup pairs into yesterday's cluster labels). The
    * labeling (id, label) is connectivity-equivalent to the full
    * old edge set: every old component collapses to a star around
    * its label, so
    *
    *   CC(E_old ∪ E_new) == CC(star(labels_old) ∪ E_new)
    *
    * EXACTLY (min-id labels both sides; spec- and oracle-pinned).
    * Work scales with |labels| + |E_new| — at 100 TB the labeling
    * is the persisted artifact and the raw pair history never
    * re-materializes.
    */
  def foldComponents(labels: DataFrame, newPairs: DataFrame,
                     maxIter: Int = 25,
                     checkpointDir: Option[String] = None)
      : DataFrame =
    connectedComponents(
      labels.select(col("id").as("id1"), col("label").as("id2"))
        .unionAll(newPairs.select(col("id1"), col("id2"))),
      maxIter, checkpointDir)

  /** The persisted clustering artifact: the labeling `(id, label)`
    * plus the verified PAIR STORE `(id1, id2, label)` that produced
    * it — every pair tagged with its component label, so a
    * retraction can pull exactly the affected components' pairs off
    * disk with a broadcast filter (never a pair-store × labels
    * join at retraction time). [[foldComponents]] covers the
    * addition direction without the store; retraction
    * ([[retractFromComponents]]) is what the store exists for — a
    * removed pair can SPLIT a component, and only the component's
    * own pairs can prove how.
    */
  final case class ClusterState(labels: DataFrame, pairs: DataFrame)

  /** Build the [[ClusterState]] artifact from verified pairs: one
    * connected-components run plus ONE pair-sized join tagging each
    * stored pair with its component label (both endpoints share
    * one, so id1's suffices). Build-time cost — retractions then
    * never re-derive it.
    */
  def clusterState(pairs: DataFrame, maxIter: Int = 25,
                   checkpointDir: Option[String] = None)
      : ClusterState = {
    val p = pairs.select(col("id1"), col("id2")).persist()
    val labels = connectedComponents(p, maxIter, checkpointDir)
    val store = p
      .join(labels.select(col("id").as("id1"), col("label")),
        Seq("id1"))
      .select(col("id1"), col("id2"), col("label"))
    ClusterState(labels, store)
  }

  /** DECREMENTAL clustering — retract documents (PII takedowns,
    * licence removals: routine corpus maintenance) from a
    * [[ClusterState]] WITHOUT re-clustering from raw pairs. A
    * retraction can split a component, so the affected components
    * re-close from their OWN stored pairs:
    *
    *  1. affected labels = labels of the removed ids (broadcast
    *     probe of the labeling — removal-sized);
    *  2. PRICED pre-flight: one pass over the pair store counts
    *     total vs affected pairs; past `maxShareNum/maxShareDen`
    *     (default 1/2) the retraction refuses — at that share a
    *     full [[clusterState]] rebuild is the honest plan, and the
    *     refusal names it;
    *  3. the affected components' surviving pairs (label-filtered
    *     scan, minus pairs touching a removed id) re-close via
    *     [[connectedComponents]]; docs stranded with no surviving
    *     pair keep SINGLETON self-labels (they were near-dups once,
    *     they are clusters of one now);
    *  4. unaffected labels and pairs pass through untouched
    *     (broadcast anti-filters), and re-closed pairs re-tag with
    *     their new labels.
    *
    * Result is spec-pinned EXACTLY equal to the full re-cluster of
    * the surviving pairs (min-id labels both ways: unaffected
    * components are untouched by the removal, and the sub-closure
    * of an affected component's surviving pairs is its full
    * closure) plus the stranded singletons, with removed ids gone.
    * Work ∝ scans + affected-component volume — the 100 TB shape.
    *
    * Returned frames are lazy — persist/write them as the next
    * artifact version.
    *
    * The share budget bounds affected PAIRS; the removed-id and
    * affected-label sets are sized separately against
    * `maxBroadcastIds` — a mass takedown across many small
    * components can pass the pair budget yet be too large to ship
    * to every executor, and past the cap each probe degrades to a
    * shuffle join (identical results).
    */
  def retractFromComponents(state: ClusterState, removed: DataFrame,
                            maxShareNum: Long = 1L,
                            maxShareDen: Long = 2L,
                            maxIter: Int = 25,
                            checkpointDir: Option[String] = None,
                            maxBroadcastIds: Long = 2000000L)
      : ClusterState = {
    require(maxShareNum >= 0 && maxShareDen > 0,
      s"need a valid share budget: $maxShareNum/$maxShareDen")
    def bq(df: DataFrame, small: Boolean): DataFrame =
      if (small) broadcast(df) else df
    val rm = graft.operators.Graph.cut(
      removed.select(col("id")).distinct(), checkpointDir)
    val rmSmall = rm.count() <= maxBroadcastIds
    val affected = graft.operators.Graph.cut(
      state.labels.join(bq(rm, rmSmall), Seq("id"))
        .select(col("label")).distinct(), checkpointDir)
    val affSmall = affected.count() <= maxBroadcastIds
    // priced pre-flight: ONE pair-store pass
    val pr = state.pairs
      .join(bq(affected.withColumn("__a", lit(true)), affSmall),
        Seq("label"), "left")
      .agg(count(lit(1)).as("total"),
        count(col("__a")).as("aff"))
      .head()
    val (total, aff) = (pr.getLong(0), pr.getLong(1))
    require(aff * maxShareDen <= total * maxShareNum,
      s"retractFromComponents: $aff of $total stored pairs sit in " +
        "affected components — past the " +
        s"$maxShareNum/$maxShareDen budget; rebuild with " +
        "clusterState over the surviving pairs instead")
    val affectedPairs = graft.operators.Graph.cut(
      state.pairs
        .join(bq(affected, affSmall), Seq("label"), "left_semi")
        .join(bq(rm.withColumnRenamed("id", "id1"), rmSmall),
          Seq("id1"), "left_anti")
        .join(bq(rm.withColumnRenamed("id", "id2"), rmSmall),
          Seq("id2"), "left_anti")
        .select(col("id1"), col("id2")), checkpointDir)
    val sub = connectedComponents(affectedPairs, maxIter,
      checkpointDir)
    // previously-clustered nodes of affected components, minus the
    // removed: those without a surviving pair become singletons
    val affectedNodes = state.labels
      .join(bq(affected, affSmall), Seq("label"), "left_semi")
      .join(bq(rm, rmSmall), Seq("id"), "left_anti")
      .select(col("id"))
    val newAffectedLabels = sub
      .unionAll(affectedNodes
        .join(sub.select(col("id")), Seq("id"), "left_anti")
        .select(col("id"), col("id").as("label")))
    val labels2 = state.labels
      .join(bq(affected, affSmall), Seq("label"), "left_anti")
      .select(col("id"), col("label"))
      .unionAll(newAffectedLabels)
    val pairs2 = state.pairs
      .join(bq(affected, affSmall), Seq("label"), "left_anti")
      .select(col("id1"), col("id2"), col("label"))
      .unionAll(affectedPairs
        .join(newAffectedLabels
          .select(col("id").as("id1"), col("label")), Seq("id1"))
        .select(col("id1"), col("id2"), col("label")))
    ClusterState(labels2, pairs2)
  }

  /** Exact-Jaccard verification restricted to a CANDIDATE pair list —
    * the scale-safe alternative to [[jaccardPairs]]' corpus-wide
    * shingle self-join: the shingle equi-join only ever touches ids
    * that appear in `pairs`, so the work is O(|candidates| · shingles
    * per doc), never O(df²) per shingle. Keeps every pair that clears
    * the integer threshold `den·inter ≥ num·union`, with its exact
    * `inter`/`union_n` shingle counts.
    *
    * Shape: one corpus scan projects (id, shingle-digest) rows,
    * semi-joined down to candidate ids (at 100 TB the candidate id
    * set is a small fraction of the corpus — AQE picks broadcast vs
    * shuffle by its actual size); the pair-intersection join then
    * fans each pair out by its left side's shingles and probes
    * (id2, s) — both joins keyed on digests, never raw text.
    */
  def verifiedJaccardPairs(df: DataFrame, idCol: Column, text: Column,
                           pairs: DataFrame, shingleK: Int = 5,
                           thresholdNum: Int = 1,
                           thresholdDen: Int = 5,
                           maxBroadcastBytes: Long = 256L << 20)
      : DataFrame = {
    // the pair frame feeds FOUR consumers (two candidate-id
    // projections, the intersection join, the final left join); an
    // eager localCheckpoint caches the slim (id1, id2) rows once
    // instead of re-running the candidate generator's whole upstream
    // chain per consumer (pairs are O(near-dups), tiny next to the
    // corpus — MEMORY_AND_DISK absorbs even billion-pair runs), and
    // its row count prices the candidate-id broadcast below
    val cand = pairs.select(col("id1"), col("id2"))
      .localCheckpoint(eager = true)
    val candIdsRaw = cand.select(col("id1").as("id"))
      .unionAll(cand.select(col("id2").as("id")))
      .distinct()
    // broadcast the candidate-id set when it fits: the corpus-side
    // semi-join then never shuffles the corpus (scan → map-side
    // probe), which is THE cost that matters at 100 TB. Past the
    // budget the semi-join degrades to a shuffle join — correct, one
    // corpus-text shuffle, logged.
    val estBytes = 64L * 2 * cand.count()
    val candIds =
      if (estBytes <= maxBroadcastBytes) broadcast(candIdsRaw)
      else {
        System.err.println("verifiedJaccardPairs: candidate ids ~" +
          s"$estBytes bytes exceed the $maxBroadcastBytes broadcast " +
          "budget; semi-joining via shuffle instead")
        candIdsRaw
      }
    // semi-join the DOCUMENTS before shingling — only candidate docs
    // are ever shingled/hashed (shingling first and semi-joining the
    // shingle rows would md5 the whole corpus). The one explicit
    // repartition after the explode is shared by ReuseExchange across
    // the size aggregation and both intersection-join sides: one
    // corpus scan, one shingle pass, three slim consumers.
    // the explicit no-op isnotnull filter and the count(s) in `sizes`
    // keep every consumer's subtree BELOW the repartition identical
    // (the intersection sides get an inferred isnotnull(s) from their
    // join keys, and a count(1) would let column pruning drop `s`
    // from the sizes branch) — without them the exchange is not
    // canonical-equal across consumers and ReuseExchange splits
    val kept = ScanStats.widen(df.select(idCol.as("id"),
        text.as("__text"))
      .join(candIds, Seq("id"), "left_semi"))
      .select(col("id"), explode(graft.functions.WordShinglesExpr
        .wordShinglesNative(col("__text"), shingleK)).as("s0"))
      .select(col("id"), substring(md5(col("s0")), 1, 16).as("s"))
      .where(col("s").isNotNull)
      .repartition(col("id"))
    val sizes = kept.groupBy(col("id")).agg(count(col("s")).as("n"))
    val inter = cand
      .join(kept.as("a"), col("id1") === col("a.id"))
      .join(kept.as("b"),
        col("id2") === col("b.id") && col("a.s") === col("b.s"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("inter"))
    // pairs with an empty intersection vanish from `inter`; pull them
    // back via a left join so a zero threshold still emits them
    cand
      .join(inter, Seq("id1", "id2"), "left")
      .join(sizes.as("sa"), col("id1") === col("sa.id"))
      .join(sizes.as("sb"), col("id2") === col("sb.id"))
      .select(col("id1"), col("id2"),
        coalesce(col("inter"), lit(0L)).as("inter"),
        (col("sa.n") + col("sb.n") -
          coalesce(col("inter"), lit(0L))).as("union_n"))
      .where(col("inter") * thresholdDen >=
        col("union_n") * thresholdNum)
  }

  /** Scale-safe fuzzy dedup, end to end — the canonical 100 TB
    * pipeline shape: MinHash signatures → LSH band candidate pairs →
    * exact-Jaccard verification ON CANDIDATES ONLY →
    * [[connectedComponents]] cluster labels. Returns (id, label).
    *
    * Unlike clustering over [[jaccardPairs]] (whose corpus-wide
    * shingle self-join costs df² rows per under-cap shingle), no step
    * here is quadratic in the corpus: signatures are a map-side
    * projection, band buckets are capped, verification touches only
    * candidate ids, and clustering shuffles slim (id, label) rows.
    * LSH recall is probabilistic (b=16, r=4 collides a 0.8-Jaccard
    * pair with p ≈ 0.9996); the verify step makes precision exact.
    */
  def lshDedupClusters(df: DataFrame, idCol: Column, text: Column,
                       numHashes: Int = 64, bandSize: Int = 4,
                       shingleK: Int = 5, thresholdNum: Int = 1,
                       thresholdDen: Int = 5,
                       maxBucketSize: Long = 10000L,
                       maxIter: Int = 25): DataFrame = {
    val sigs = minHashSignatures(df, idCol, text, numHashes, shingleK)
    val cands = lshCandidatePairs(
      lshBands(sigs, numHashes, bandSize), maxBucketSize)
    val verified = verifiedJaccardPairs(df, idCol, text, cands,
      shingleK, thresholdNum, thresholdDen)
    connectedComponents(verified.select(col("id1"), col("id2")),
      maxIter)
  }

  /** One-call fuzzy deduplication — the whole pipeline a corpus
    * consumer wants: [[lshDedupClusters]] labels near-duplicate
    * clusters, [[dedupDropList]] keeps the smallest id per cluster,
    * and the corpus anti-joins the (slim, broadcastable-after-AQE)
    * drop list. Returns the deduplicated corpus with its original
    * schema; unclustered documents pass through untouched.
    */
  def deduplicate(df: DataFrame, idCol: Column, text: Column,
                  shingleK: Int = 5, thresholdNum: Int = 1,
                  thresholdDen: Int = 5): DataFrame = {
    val drops = dedupDropList(lshDedupClusters(df, idCol, text,
        shingleK = shingleK, thresholdNum = thresholdNum,
        thresholdDen = thresholdDen))
      .withColumnRenamed("id", "__drop_id")
    df.join(drops, idCol === col("__drop_id"), "left_anti")
  }

  /** LSH candidate pairs of a NEW batch against an EXISTING corpus —
    * the incremental-crawl screen: band buckets join new-vs-old ONLY,
    * so the already-deduplicated corpus never self-pairs, and the
    * per-bucket fan-out is new·old (each side hot-bucket capped,
    * ≤ cap²) instead of (old+new)². At a 100 TB corpus with a
    * daily-batch delta that is the difference between a delta-sized
    * job and a full re-dedup. Returns distinct (new_id, old_id).
    */
  def lshPairsAgainst(corpus: DataFrame, corpusId: Column,
                      corpusText: Column, newDf: DataFrame,
                      newId: Column, newText: Column,
                      numHashes: Int = 64, bandSize: Int = 4,
                      shingleK: Int = 5,
                      maxBucketSize: Long = 10000L): DataFrame =
    lshPairsFromBands(
      lshBands(minHashSignatures(corpus, corpusId, corpusText,
        numHashes, shingleK), numHashes, bandSize),
      lshBands(minHashSignatures(newDf, newId, newText,
        numHashes, shingleK), numHashes, bandSize),
      maxBucketSize)

  /** The band-join half of [[lshPairsAgainst]], for callers that
    * already hold `(id, band, key)` frames — e.g. a serving path
    * that computes the corpus bands ONCE and probes them with many
    * predicates (q118 runs probe selection and the probe lookup off
    * one materialized band frame instead of re-signing the corpus
    * per chain). Each side is hot-bucket capped independently, the
    * same guard the one-call form applies.
    */
  def lshPairsFromBands(oldBands: DataFrame, newBands: DataFrame,
                        maxBucketSize: Long = 10000L): DataFrame =
    dropHotBuckets(newBands, maxBucketSize).as("n")
      .join(dropHotBuckets(oldBands, maxBucketSize).as("o"),
        col("n.band") === col("o.band") &&
          col("n.key") === col("o.key"))
      .select(col("n.id").as("new_id"), col("o.id").as("old_id"))
      .distinct()

  /** Incremental one-call deduplication: the NEW batch minus exact
    * and near-duplicates of the corpus AND of itself — the
    * continuous-ingest twin of [[deduplicate]].
    *
    * Semantics: an exact md5-fingerprint pass drops batch rows whose
    * text already exists in the corpus and keeps the smallest id per
    * batch-internal fingerprint (this also catches sub-shingle short
    * documents that LSH cannot see). Then the verified near-dup
    * graph is built ONLY from pairs touching the batch
    * ([[lshPairsAgainst]] for new-vs-old, [[lshCandidatePairs]] for
    * new-vs-new): a cluster containing ANY corpus document drops all
    * its batch members (the corpus already represents it); a
    * batch-only cluster keeps its smallest id, exactly like
    * [[deduplicate]]. With an empty corpus this IS [[deduplicate]]
    * plus the exact-fingerprint pass.
    *
    * Requires globally unique ids across corpus and batch. Scale
    * shape: the corpus is touched by exactly one signature projection
    * + one fingerprint projection (both map-side) and the
    * candidate-restricted verify scan — never shuffled in full,
    * never self-joined.
    */
  def deduplicateAgainst(corpus: DataFrame, corpusId: Column,
                         corpusText: Column, newDf: DataFrame,
                         newId: Column, newText: Column,
                         numHashes: Int = 64, bandSize: Int = 4,
                         shingleK: Int = 5, thresholdNum: Int = 1,
                         thresholdDen: Int = 5,
                         maxBucketSize: Long = 10000L,
                         maxIter: Int = 25): DataFrame = {
    // exact pass: corpus fingerprints are slim distinct digests; the
    // within-batch keep is an aggregation, not a window (no giant
    // group sorts when a batch carries mass duplicates)
    val oldFps = corpus.select(md5(corpusText).as("__fp")).distinct()
    val minPerFp = newDf
      .select(newId.as("__mid"), md5(newText).as("__fp"))
      .groupBy(col("__fp")).agg(min(col("__mid")).as("__keep"))
    val exactKept = newDf
      .join(minPerFp, md5(newText) === col("__fp") &&
        newId === col("__keep"), "left_semi")
      .join(oldFps, md5(newText) === col("__fp"), "left_anti")
    // near-dup pass: candidates touching the batch only
    val candOld = lshPairsAgainst(corpus, corpusId, corpusText,
        exactKept, newId, newText, numHashes, bandSize, shingleK,
        maxBucketSize)
      .select(col("new_id").as("id1"), col("old_id").as("id2"))
    val candNew = lshCandidatePairs(lshBands(minHashSignatures(
      exactKept, newId, newText, numHashes, shingleK), numHashes,
      bandSize), maxBucketSize)
    val cands = candNew.unionByName(candOld).distinct()
    val unionDf = corpus
      .select(corpusId.as("id"), corpusText.as("text"))
      .unionByName(exactKept.select(newId.as("id"),
        newText.as("text")))
    val verified = verifiedJaccardPairs(unionDf, col("id"),
      col("text"), cands, shingleK, thresholdNum, thresholdDen)
    val labels = connectedComponents(
      verified.select(col("id1"), col("id2")), maxIter)
    // cluster verdicts: any corpus member -> drop every batch member;
    // batch-only -> keep the smallest id (the label)
    val withOld = labels.join(corpus.select(corpusId.as("id"),
      lit(true).as("__is_old")), Seq("id"), "left")
    val labHasOld = withOld.groupBy(col("label"))
      .agg(max(coalesce(col("__is_old"), lit(false)))
        .as("__has_old"))
    val dropNew = withOld.where(col("__is_old").isNull)
      .join(labHasOld, Seq("label"))
      .where(col("__has_old") || col("id") =!= col("label"))
      .select(col("id").as("__drop_id"))
    exactKept.join(dropNew, newId === col("__drop_id"), "left_anti")
  }

  /** N-gram Jaccard near-duplicate pairs via shingle equi-join.
    * Threshold num/den (e.g. 1/5 for 0.2) applied in integer form:
    * den·inter ≥ num·union — no floating point.
    *
    * `maxShingleDf` is the document-frequency cap: a shingle shared by
    * k documents contributes k² rows to the self-join, so one
    * stop-shingle with k in the millions is quadratic death at corpus
    * scale. Shingles with df > cap are removed from the shingle space
    * entirely (both intersection AND sizes — standard stop-shingle
    * removal, so the Jaccard stays internally consistent). The
    * over-cap list is tiny by construction and is applied as a
    * broadcast anti-join, never a shuffle.
    *
    * No caching: the shingle frame is ~k× the corpus, far too large to
    * persist at scale. The two self-join sides are identical subplans,
    * so Spark's ReuseExchange evaluates their shuffle once; the size
    * aggregation re-scans — two scans total, no cached state to leak.
    *
    * **Pair-volume guard**: the self-join materializes exactly
    * Σ df·(df−1)/2 candidate rows over under-cap shingles — the df cap
    * bounds each term but not the sum, so a corpus of many mid-df
    * shingles is still quadratic death. Before launching the join,
    * that sum is priced exactly (integer arithmetic, DECIMAL
    * accumulation — no overflow) from the df aggregate in one
    * pre-flight job; past `maxPairRows` the call REFUSES with a
    * pointer to [[lshDedupClusters]] — the candidate-bounded scale
    * path — rather than silently routing there (LSH is probabilistic;
    * an exact baseline must not change semantics under load). Same
    * pricing pattern as the broadcast budgets in [[contamination]].
    */
  def jaccardPairs(df: DataFrame, idCol: Column, text: Column,
                   shingleK: Int = 5, thresholdNum: Int = 1,
                   thresholdDen: Int = 5,
                   maxShingleDf: Long = 10000L,
                   maxPairRows: Long = 2000000000L): DataFrame = {
    // join/aggregate on a 16-hex-char digest of the shingle
    // (identical md5 in the oracle): far smaller shuffle keys than raw
    // shingle strings.
    // localCheckpoint: the digest rows feed FIVE consumers (the
    // pricing aggregate, the hot-shingle broadcast build, the size
    // aggregate and both sides of the intersection self-join) — each
    // would otherwise re-shingle and re-md5 the whole corpus. One
    // pass over the text instead of five; the pricing action below
    // materializes it (lazy here so no extra job is scheduled).
    val exploded = shingleRows(df, idCol, text, shingleK)
      .select(col("id"), substring(md5(col("s")), 1, 16).as("s"))
      .localCheckpoint(eager = false)
    val dfAgg = exploded.groupBy(col("s"))
      .agg(count(lit(1)).as("df"))
    val priced = dfAgg
      .agg(sum(when(col("df") <= maxShingleDf,
        expr("CAST(df * (df - 1) DIV 2 AS DECIMAL(38,0))")))
        .as("pair_rows"))
      .first().getDecimal(0)
    if (priced != null &&
        priced.compareTo(java.math.BigDecimal.valueOf(maxPairRows)) > 0)
      throw new IllegalStateException(
        s"jaccardPairs: shingle self-join would materialize $priced " +
        s"candidate pair rows (> budget $maxPairRows). This exact " +
        "all-pairs baseline is quadratic in shingle document " +
        "frequency; use Dedup.lshDedupClusters / " +
        "verifiedJaccardPairs (candidate-bounded, same threshold " +
        "semantics) at this scale, or raise maxPairRows explicitly.")
    val hot = dfAgg
      .where(col("df") > maxShingleDf)
      .select(col("s"))
    val kept = exploded.join(broadcast(hot), Seq("s"), "left_anti")
    val sizes = kept.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = kept.as("a")
      .join(kept.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("id1") === col("sa.id"))
      .join(sizes.as("sb"), col("id2") === col("sb.id"))
      .select(col("id1"), col("id2"), col("inter"),
        (col("sa.n") + col("sb.n") - col("inter")).as("union_n"))
      .where(col("inter") * thresholdDen >=
        col("union_n") * thresholdNum)
  }

  /** Corpus-overlap matrix between document GROUPS (sources, dumps,
    * snapshots): for every group pair, a MinHash ESTIMATE of the
    * Jaccard similarity between the groups' shingle-set unions, plus
    * (optionally) the exact intersection/union sizes.
    *
    * The estimate rides on the identity `min over a union = min of
    * per-element mins`: each document's native MinHash signature
    * ([[minHashSignatures]] — one JVM call per doc, no shuffle)
    * aggregates to its group's signature by an ELEMENTWISE MIN — a
    * partial-aggregating groupBy over (group, position) whose state
    * is `numHashes` values per group, independent of corpus size.
    * Matching positions / numHashes is then an unbiased Jaccard
    * estimator between the union shingle sets (standard MinHash
    * property). That is the 100 TB path: one linear pass, fixed
    * state, no shingle materialization across the shuffle.
    *
    * `withExact = true` adds the exact inter/union per pair from
    * distinct (group, shingle-digest) rows — one linear
    * shingle-dedup shuffle plus a join keyed by digest whose
    * fan-out is bounded by the number of GROUPS a shingle appears
    * in (≤ G, not document frequency. The estimate column lets a
    * spec and the oracle gate quantify estimator error exactly.)
    *
    * Output: one row per unordered group pair (g1 < g2):
    * `g1, g2, n_match_sig, n_sig[, inter, union_n]`.
    */
  def corpusOverlapMatrix(df: DataFrame, group: Column, text: Column,
                          numHashes: Int = 64, shingleK: Int = 5,
                          withExact: Boolean = true,
                          maxPairRows: Long = 2000000000L): DataFrame = {
    val sigs = minHashSignatures(df, group, text, numHashes, shingleK)
      .where(col("sig").isNotNull)
    // group signature = elementwise min (8-hex-char strings: lexical
    // min == numeric min at fixed width)
    val perGroup = sigs
      .select(col("id").as("g"), posexplode(col("sig"))
        .as(Seq("pos", "h")))
      .groupBy(col("g"), col("pos")).agg(min(col("h")).as("h"))
    val est = perGroup.as("a")
      .join(perGroup.as("b"),
        col("a.pos") === col("b.pos") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("g1"), col("b.g").as("g2"))
      .agg(count(when(col("a.h") === col("b.h"), 1))
          .as("n_match_sig"),
        count(lit(1)).as("n_sig"))
    if (!withExact) est
    else {
      val shd = shingleRows(df, group, text, shingleK)
        .select(col("id").as("g"),
          substring(md5(col("s")), 1, 16).as("s"))
        .distinct()
      // the exact self-join materializes Σ_s G_s·(G_s−1)/2 rows
      // (G_s = number of groups sharing digest s, bounded by the
      // group count, NOT document frequency — but a boilerplate
      // digest present in every one of many groups still multiplies
      // the join). Price it pre-flight on the slim distinct rows
      // and REFUSE past budget, the same contract as every other
      // candidate join in this module.
      val priced = shd.groupBy(col("s"))
        .agg(count(lit(1)).as("gs"))
        .agg(sum(expr("CAST(gs * (gs - 1) DIV 2 AS DECIMAL(38,0))"))
          .as("pair_rows"))
        .first().getDecimal(0)
      if (priced != null && priced.compareTo(
          java.math.BigDecimal.valueOf(maxPairRows)) > 0)
        throw new IllegalStateException(
          s"corpusOverlapMatrix: exact digest self-join would " +
          s"materialize $priced pair rows (> budget $maxPairRows). " +
          "Run with withExact = false (the MinHash estimate needs " +
          "no pair materialization), reduce the group count, or " +
          "raise maxPairRows explicitly.")
      val sizes = shd.groupBy(col("g")).agg(count(lit(1)).as("n"))
      val inter = shd.as("x")
        .join(shd.as("y"),
          col("x.s") === col("y.s") && col("x.g") < col("y.g"))
        .groupBy(col("x.g").as("g1"), col("y.g").as("g2"))
        .agg(count(lit(1)).as("inter"))
      est
        .join(inter, Seq("g1", "g2"), "left")
        .join(sizes.as("sa"), col("g1") === col("sa.g"))
        .join(sizes.as("sb"), col("g2") === col("sb.g"))
        .select(col("g1"), col("g2"), col("n_match_sig"),
          col("n_sig"), coalesce(col("inter"), lit(0L)).as("inter"),
          (col("sa.n") + col("sb.n") -
            coalesce(col("inter"), lit(0L))).as("union_n"))
    }
  }

  /** Exact token-set Jaccard similarity join via PREFIX FILTERING —
    * the AllPairs / PPJoin family (Bayardo, Ma, Srikant, "Scaling Up
    * All Pairs Similarity Search", WWW'07; Xiao, Wang, Lin, Yu,
    * "Efficient Similarity Joins for Near Duplicate Detection",
    * WWW'08). Same exact-result contract as [[jaccardPairs]] (pairs
    * with `inter·den ≥ union·num`, integer arithmetic throughout) but
    * over whitespace TOKEN sets, and the candidate join touches only
    * each document's PREFIX: its globally-rarest
    * `|x| − ⌈t·|x|⌉ + 1` tokens, ordered by ascending document
    * frequency with ties broken by token. Two sets with Jaccard ≥ t
    * need overlap ≥ ⌈t·max(|x|,|y|)⌉ ≥ ⌈t·|x|⌉, so by pigeonhole they
    * MUST share at least one prefix token — the equi-join on prefix
    * tokens is a COMPLETE candidate generator: exactness without the
    * all-occurrence self-join. A size filter
    * (`min(|x|,|y|)·den ≥ max(|x|,|y|)·num`, from J ≤ min/max) prunes
    * length-incompatible candidates before verification, and the
    * verify join is candidate-bounded like [[verifiedJaccardPairs]].
    *
    * 100 TB shape: the self-join keys shrink from every
    * token-occurrence (what [[jaccardPairs]] shuffles) to the few
    * RAREST tokens per document — high-df tokens sort last and fall
    * outside every prefix, so the frequent-token join explosion never
    * happens by construction; at threshold 0.8 the prefix is ~20% of
    * each document. The same Σc·(c−1)/2 pre-flight pricing as
    * [[jaccardPairs]] (over PREFIX occurrences, which is the join's
    * true pair volume) refuses a degenerate distribution instead of
    * materializing it. Tokens with document frequency above
    * `maxTokenDf` are dropped from the token universe on both inter
    * and union (stopword-mass tokens carry no dedup signal and would
    * otherwise put every document in one candidate bucket); the
    * DuckDB oracle applies the identical drop.
    *
    * `shingleK` picks the SET ELEMENTS: 1 = whitespace unigram
    * tokens (bag-of-words similarity — right for topical overlap,
    * but a small shared vocabulary keeps element frequencies high
    * and with them the candidate volume); k > 1 = word-k-gram
    * shingle DIGESTS, the [[jaccardPairs]] elements — near-unique
    * per document, so prefixes almost never collide and the
    * candidate join stays tiny even on a repetitive corpus. For
    * near-duplicate detection at scale use shingles; unigrams are
    * the classic PPJoin setting for set-similarity workloads.
    */
  def prefixJaccardPairs(df: DataFrame, idCol: Column, text: Column,
                         thresholdNum: Int, thresholdDen: Int,
                         maxTokenDf: Long = 10000L,
                         maxPairRows: Long = 2000000000L,
                         shingleK: Int = 1): DataFrame = {
    require(thresholdNum > 0 && thresholdDen >= thresholdNum,
      s"threshold must be in (0, 1]: $thresholdNum/$thresholdDen")
    require(shingleK >= 1, s"shingleK must be >= 1: $shingleK")
    val toks =
      if (shingleK == 1)
        df.select(idCol.as("id"), explode(array_distinct(
            TextFunctions.tokens(text))).as("tok"))
          .where(col("tok") =!= "")
      else
        shingleRows(df, idCol, text, shingleK)
          .select(col("id"), substring(md5(col("s")), 1, 16).as("tok"))
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val kept = toks
      .join(dfreq.where(col("df") <= maxTokenDf), Seq("tok"))
    // one shuffle by id serves both windows (same partition spec)
    val byId = Window.partitionBy(col("id"))
    val ranked = kept
      .withColumn("n", count(lit(1)).over(byId))
      .withColumn("rn", row_number().over(
        byId.orderBy(col("df").asc, col("tok").asc)))
    val tn = thresholdNum.toLong
    val td = thresholdDen.toLong
    // prefix length p = n − ⌈t·n⌉ + 1, exact integer ceil — the same
    // `(a + b − 1) DIV b` the oracle runs
    val prefix = ranked
      .where(col("rn") <=
        expr(s"n - ((${tn}L * n + ${td - 1}L) DIV ${td}L) + 1L"))
      .select(col("id"), col("tok"), col("n"))
    val priced = prefix.groupBy(col("tok"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(expr("CAST(c * (c - 1) DIV 2 AS DECIMAL(38,0))"))
        .as("pair_rows"))
      .first().getDecimal(0)
    if (priced != null &&
        priced.compareTo(java.math.BigDecimal.valueOf(maxPairRows)) > 0)
      throw new IllegalStateException(
        s"prefixJaccardPairs: the prefix-token join would materialize " +
        s"$priced candidate rows (> budget $maxPairRows). The prefix " +
        "distribution is degenerate (many documents sharing rare " +
        "tokens); raise the threshold, lower maxTokenDf, or use " +
        "Dedup.lshDedupClusters at this scale.")
    val cands = prefix.as("a")
      .join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
        col("a.n") * td >= col("b.n") * tn &&
        col("b.n") * td >= col("a.n") * tn)
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    val tr = kept.select(col("id"), col("tok"))
    val sizes = tr.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = cands
      .join(tr.as("ta"), col("id1") === col("ta.id"))
      .join(tr.as("tb"),
        col("id2") === col("tb.id") && col("ta.tok") === col("tb.tok"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("id1") === col("sa.id"))
      .join(sizes.as("sb"), col("id2") === col("sb.id"))
      .select(col("id1"), col("id2"), col("inter"),
        (col("sa.n") + col("sb.n") - col("inter")).as("union_n"))
      .where(col("inter") * td >= col("union_n") * tn)
  }

  // ---- exact repeated-substring dedup (Lee et al. '22, the -------
  // ---- suffix-array signal, re-expressed relationally) -----------

  /** MAXIMAL runs of corpus-repeated token-k-grams per document:
    * `(id, start, len_tokens)` where every k-gram starting in
    * [start, start+len−k] appears in ≥ `minDocs` DISTINCT documents
    * (cross-doc verbatim reuse — intra-doc repetition is the q44
    * filter's job). Positions of repeated k-grams chain into runs
    * via the lag/running-sum window over REPEATED positions only
    * (one keyed sort over the repeated subset, not the corpus);
    * only md5 digests ever shuffle.
    */
  def repeatedRuns(df: DataFrame, id: Column, text: Column,
                   k: Int = 8, minDocs: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"k-gram size must be >= 2: $k")
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    // native positional digest ladder (one JVM call per doc) over
    // the SAME TextFunctions.tokens array the removal transform
    // indexes into — one tokenization feeds both the digests and
    // the positions, so they cannot disagree on whitespace edge
    // cases. Digests are byte-identical to
    // md5(concat_ws(' ', slice(l, i+1, k)))
    val grams = df
      .select(id.as("id"),
        graft.functions.PosShingleDigestsExpr
          .posShingleDigests(TextFunctions.tokens(text), k).as("gs"))
      .where(size(col("gs")) > 0)
      .select(col("id"), posexplode(col("gs"))
        .as(Seq("pos", "gram")))
    val rep = grams.groupBy(col("gram"))
      .agg(countDistinct(col("id")).as("df"))
      .where(col("df") >= minDocs)
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    grams.join(rep.select("gram"), Seq("gram"))
      .withColumn("nw", when(col("pos") -
        lag(col("pos"), 1).over(w) === 1, 0L).otherwise(1L))
      .withColumn("run", sum(col("nw")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("id"), col("run"))
      .agg(min(col("pos")).as("start"),
        (max(col("pos")) - min(col("pos")) + lit(k))
          .as("len_tokens"))
      .drop("run")
  }

  /** The removal transform over [[repeatedRuns]]: every token
    * covered by a repeated run is dropped and the survivors are
    * reassembled in position order — the "deduplicate the training
    * data, not just the documents" cleanup. Total: documents that
    * were entirely repeated come back with empty `clean_text`.
    * Adjacent runs can overlap in covered TOKENS (a run's cover
    * extends k−1 past its last start), hence the distinct on the
    * exploded cover.
    */
  def removeRepeatedRuns(df: DataFrame, id: Column, text: Column,
                         k: Int = 8, minDocs: Int = 2): DataFrame = {
    val covered = repeatedRuns(df, id, text, k, minDocs)
      .select(col("id"), explode(sequence(col("start"),
        col("start") + col("len_tokens") - 1)).as("pos"))
      .distinct()
    val toks = df.select(id.as("id"),
      posexplode(TextFunctions.tokens(text)).as(Seq("pos", "tok")))
    val clean = toks.join(covered, Seq("id", "pos"), "left_anti")
      .groupBy(col("id"))
      .agg(concat_ws(" ", expr(
        "transform(sort_array(collect_list(struct(pos, tok))), " +
          "s -> s.tok)")).as("clean_text"))
    df.select(id.as("id")).distinct()
      .join(clean, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  // ---- shared-span forensics (the "explain WHY these are ---------
  // ---- duplicates" evidence a takedown / provenance review needs)

  /** Maximal VERBATIM shared token spans between two documents of
    * the corpus: `(id1, id2, start1, start2, len_tokens)` — every
    * run of k-grams the pair shares at a constant positional offset
    * (the diagonal-run formulation of plagiarism span extraction;
    * same digest ladder as [[repeatedRuns]], so only md5 digests
    * ever move). `pair` must be a 1-row (id1, id2) frame — e.g.
    * [[topRepeatedPair]] or any candidate pair from the LSH /
    * winnowing screens; the span extraction joins the two BOUNDED
    * per-document gram sets, never the corpus.
    */
  def sharedSpans(df: DataFrame, id: Column, text: Column,
                  pair: DataFrame, k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"k-gram size must be >= 2: $k")
    val grams = df
      .select(id.as("id"),
        graft.functions.PosShingleDigestsExpr
          .posShingleDigests(TextFunctions.tokens(text), k).as("gs"))
      .where(size(col("gs")) > 0)
      .select(col("id"),
        posexplode(col("gs")).as(Seq("pos", "gram")))
    val ga = grams.join(broadcast(pair), col("id") === col("id1"))
      .select(col("gram"), col("pos").as("p1"))
    val gb = grams.join(broadcast(pair), col("id") === col("id2"))
      .select(col("gram"), col("pos").as("p2"))
    val w = Window.partitionBy(col("diag")).orderBy(col("p1"))
    ga.join(gb, Seq("gram"))
      .select(col("p1"), col("p2"), (col("p1") - col("p2"))
        .as("diag"))
      .withColumn("nw", when(col("p1") -
        lag(col("p1"), 1).over(w) === 1, 0L).otherwise(1L))
      .withColumn("run", sum(col("nw")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("diag"), col("run"))
      .agg(min(col("p1")).cast("long").as("start1"),
        min(col("p2")).cast("long").as("start2"),
        (max(col("p1")) - min(col("p1")) + lit(k)).cast("long")
          .as("len_tokens"))
      .crossJoin(broadcast(pair))
      .select(col("id1"), col("id2"), col("start1"), col("start2"),
        col("len_tokens"))
      .orderBy(col("start1").asc_nulls_first,
        col("start2").asc_nulls_first)
  }

  /** The deterministic "first" cross-document repeated pair:
    * smallest (id1, id2), id1 < id2, among documents sharing at
    * least one k-gram. Candidates come only from k-grams with
    * df >= 2 (the repeated slice, boilerplate-sized), and the min
    * is taken as an aggregate — no pair materialization beyond the
    * repeated-gram join.
    */
  def topRepeatedPair(df: DataFrame, id: Column, text: Column,
                      k: Int = 8): DataFrame = {
    val grams = df
      .select(id.as("id"),
        graft.functions.PosShingleDigestsExpr
          .posShingleDigests(TextFunctions.tokens(text), k).as("gs"))
      .where(size(col("gs")) > 0)
      .select(col("id"), explode(col("gs")).as("gram"))
      .distinct()
    // df <= 1000: an ultra-hot boilerplate gram would square its df
    // in the pair join; evidence-pair SELECTION doesn't need it (the
    // span extraction still sees every gram of the chosen pair)
    val rep = grams.groupBy(col("gram"))
      .agg(countDistinct(col("id")).as("df"))
      .where(col("df") >= 2 && col("df") <= 1000)
      .select(col("gram"))
    val rg = grams.join(rep, Seq("gram"))
    rg.as("a").join(rg.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id"))
      .agg(min(struct(col("a.id").as("id1"), col("b.id").as("id2")))
        .as("p"))
      .select(col("p.id1").as("id1"), col("p.id2").as("id2"))
  }

  // ---- exact line-level dedup (CCNet/RefinedWeb boilerplate) -----

  /** Remove every LINE that appears verbatim in >= `minDocs`
    * DISTINCT documents — the web-corpus boilerplate filter
    * (navbars, cookie banners, license headers repeat across pages;
    * prose lines don't). Returns one row per document:
    * `(id, n_lines, n_removed, clean_md5, clean_nchars)` with the
    * survivors rejoined in original order by '\n'.
    *
    * All-whitespace lines are never counted frequent (removing them
    * would reflow every document's formatting for no dedup gain).
    *
    * Shape at 100 TB: the frequency pass shuffles md5 LINE DIGESTS
    * only, with map-side partial counts; the frequent set is
    * boilerplate-sized (df >= minDocs prunes the prose long tail),
    * so AQE turns the removal join into a broadcast against the
    * line scan. Reassembly is one per-document aggregation whose
    * state is bounded by document size — the removeRepeatedRuns
    * pattern.
    */
  /** The frequency half of [[removeFrequentLines]], exposed so the
    * streaming screen ([[graft.streaming.StreamingStructure
    * .lineScreenStream]]) can reuse the batch-built digest set: md5
    * digests of every line appearing in >= `minDocs` DISTINCT
    * documents (all-whitespace lines excluded). One column `lh`;
    * boilerplate-sized — persist it beside the corpus like any other
    * screen artifact.
    */
  def frequentLineDigests(df: DataFrame, id: Column, text: Column,
                          minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    df.select(id.as("id"), explode(split(text, "\n")).as("line"))
      .where(trim(col("line")) =!= "")
      .select(col("id"), md5(col("line")).as("lh"))
      .groupBy(col("lh"))
      .agg(countDistinct(col("id")).as("df"))
      .where(col("df") >= minDocs)
      .select(col("lh"))
  }

  def removeFrequentLines(df: DataFrame, id: Column, text: Column,
                          minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    val lines = df
      .select(id.as("id"), posexplode(split(text, "\n"))
        .as(Seq("pos", "line")))
      .withColumn("lh", md5(col("line")))
    val freq = frequentLineDigests(df, id, text, minDocs)
      .withColumn("dup", lit(true))
    val flagged = lines
      .join(freq, Seq("lh"), "left")
      .withColumn("keep", col("dup").isNull)
    flagged.groupBy(col("id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"),
        sort_array(collect_list(struct(col("pos"), col("line"),
          col("keep")))).as("arr"))
      .withColumn("clean_text",
        array_join(transform(filter(col("arr"),
          s => s.getField("keep")), s => s.getField("line")), "\n"))
      .select(col("id"), col("n_lines"), col("n_removed"),
        md5(col("clean_text")).as("clean_md5"),
        length(col("clean_text")).cast("long").as("clean_nchars"))
  }
}
