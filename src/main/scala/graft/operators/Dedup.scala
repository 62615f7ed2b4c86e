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
  *  - **SimHash**: 32-bit crc32-based per-token sign-sum — one pass,
  *    Hamming-ball lookups via band substrings.
  *  - **N-gram Jaccard**: shingle-explode + equi-join on shingle; the
  *    integer threshold form `k·inter ≥ m·union` avoids float
  *    comparisons entirely (exactly portable to the DuckDB oracle).
  *
  * Hash functions are md5/crc32 — identical digests in DuckDB, so every
  * operator except SimHash has an exact SQL oracle.
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
    df.select(idCol.as("id"), explode(
      graft.functions.WordShinglesExpr.wordShinglesNative(text, k))
      .as("s"))

  /** MinHash signature columns `mh1..mhN` over word-5-gram shingles.
    * ONE md5 per shingle; hash family j = the j-th 8-hex-char slice of
    * the digest (each slice is an independent uniform 32-bit value).
    * The signature is the lexicographic minimum — associative, and the
    * mins combine map-side through the partial aggregation.
    */
  def minHashSignatures(df: DataFrame, idCol: Column, text: Column,
                        numHashes: Int = 4, shingleK: Int = 5)
      : DataFrame = {
    require(numHashes <= 4, "md5 yields four 8-hex-char slices")
    val hashed = shingleRows(df, idCol, text, shingleK)
      .select(col("id"), md5(col("s")).as("h"))
    val aggs = (1 to numHashes).map(j =>
      min(substring(col("h"), (j - 1) * 8 + 1, 8)).as(s"mh$j"))
    // docs shorter than k tokens have no shingles: keep them with
    // null signatures via a left join on the id universe
    val ids = df.select(idCol.as("id")).distinct()
    ids.join(hashed.groupBy(col("id")).agg(aggs.head, aggs.tail: _*),
      Seq("id"), "left")
  }

  /** LSH band keys from a signature frame: rows (id, band, key) where
    * key concatenates 8-hex-char prefixes of the band's hashes.
    * Near-duplicates collide on at least one band with high
    * probability; the bucket-join replaces the O(n²) scan.
    */
  def lshBands(sigs: DataFrame, numHashes: Int = 4,
               bandSize: Int = 2): DataFrame = {
    val bands = (0 until numHashes / bandSize).map { b =>
      val key = concat((1 to bandSize).map(i =>
        col(s"mh${b * bandSize + i}")): _*)
      sigs.select(col("id"), lit(b).as("band"), key.as("key"))
    }
    bands.reduce(_ unionAll _)
  }

  /** Candidate near-duplicate pairs: ids sharing an LSH band bucket. */
  def lshCandidatePairs(bands: DataFrame): DataFrame = {
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
  }

  /** 32-bit SimHash over whitespace tokens: for each bit position, sum
    * +1/−1 according to crc32(token) bit, then take the sign. All
    * built-ins, one pass, no UDF.
    */
  def simHash32(df: DataFrame, idCol: Column, text: Column): DataFrame = {
    val toks = df.select(idCol.as("id"),
      explode(TextFunctions.tokens(text)).as("tok"))
      .select(col("id"), crc32(col("tok").cast("binary")).as("h"))
    val bitSums = (0 until 32).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"s$b"))
    val sums = toks.groupBy(col("id")).agg(bitSums.head,
      bitSums.tail: _*)
    val sim = (0 until 32).map(b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    sums.select(col("id"), sim.as("simhash"))
  }

  /** SimHash near-duplicate candidates: split each 32-bit hash into
    * `bands` bit-slices and bucket-join — two hashes within Hamming
    * distance < bands share at least one identical slice (pigeonhole),
    * so the equi-join is a complete candidate generator for that
    * radius without any pairwise scan.
    */
  def simHashCandidatePairs(sims: DataFrame,
                            bands: Int = 4): DataFrame = {
    val bits = 32 / bands
    val mask = (1L << bits) - 1
    val sliced = (0 until bands).map(b =>
      sims.select(col("id"), lit(b).as("band"),
        shiftright(col("simhash"), b * bits).bitwiseAND(mask)
          .as("key")))
      .reduce(_ unionAll _)
    val a = sliced.as("a")
    val b = sliced.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
  }

  /** N-gram Jaccard near-duplicate pairs via shingle equi-join.
    * Threshold num/den (e.g. 1/5 for 0.2) applied in integer form:
    * den·inter ≥ num·union — no floating point.
    */
  def jaccardPairs(df: DataFrame, idCol: Column, text: Column,
                   shingleK: Int = 5, thresholdNum: Int = 1,
                   thresholdDen: Int = 5): DataFrame = {
    // join/aggregate on a 16-hex-char digest of the shingle
    // (identical md5 in the oracle): far smaller shuffle keys than raw
    // shingle strings; persisted because both the size agg and both
    // join sides re-derive it (spills to disk at scale)
    val exploded = shingleRows(df, idCol, text, shingleK)
      .select(col("id"), substring(md5(col("s")), 1, 16).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = exploded.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = exploded.as("a")
      .join(exploded.as("b"),
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
}
