package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Numeric determinism: floats are quantized to integers
  * (round(x·2^25), ties round away from zero in both Spark and DuckDB)
  * and dot products accumulate as exact 64-bit integers — order-free,
  * partitioning-free, and bit-identical in the DuckDB oracle. (Decimal
  * casts of doubles are NOT portable: a double×10^s can land exactly
  * on .5 and the engines break ties differently.) The ~1e-7 relative
  * quantization error is irrelevant for ranking/thresholding.
  *
  * Scale shape: the brute-force path broadcasts the (tiny) query side
  * and computes dot products map-side with array built-ins — no
  * shuffle, one scan, candidates never materialize. The bucketed path
  * assigns every vector to a deterministic LSH bucket (sign pattern of
  * positional partial sums) so ANN lookups and near-dup joins touch
  * only same-bucket rows.
  */
object Similarity {

  /** Quantize a float element to a 2^25-scaled integer. Product pairs
    * stay ≤ 2^50, so a 64-dim dot sum (≤ 2^56) fits a long exactly.
    */
  def quantize(x: Column): Column =
    round(x.cast("double") * lit(33554432.0)).cast("long")

  /** Exact integer dot product of two equal-length float arrays. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => quantize(x) * quantize(y)),
      lit(0L), (acc, x) => acc + x)

  /** Brute-force cosine top-k against the vector with id `queryId`.
    * The query side is a single broadcast row; ranking is by the
    * deterministic decimal dot product scaled by rsqrt norms.
    */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
                 queryId: Long, k: Int): DataFrame = {
    // pre-quantize and pre-norm both sides so the per-row work after
    // the broadcast is ONE zip_with fold (the interpreted higher-order
    // fold is the hot path; the query norm especially must not be
    // recomputed per candidate row)
    def q2(v: Column): Column = aggregate(
      transform(v, x => {
        val qx = quantize(x); qx * qx
      }), lit(0L), (a, x) => a + x)
    val q = df.where(col(idCol) === queryId)
      .select(transform(col(vecCol), x => quantize(x)).as("__qv"),
        sqrt(q2(col(vecCol)).cast("double")).as("__qn"))
    val prepped = df.where(col(idCol) =!= queryId)
      .select(col(idCol), transform(col(vecCol), x => quantize(x)).as("__v"),
        sqrt(q2(col(vecCol)).cast("double")).as("__n"))
    val dot = aggregate(
      zip_with(col("__v"), col("__qv"), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    // rank by cosine; OUTPUT the exact integer dot (hash-compared)
    prepped.crossJoin(broadcast(q))
      .select(col(idCol), dot.as("dot"),
        (dot.cast("double") / (col("__n") * col("__qn")))
          .as("__cosine"))
      .orderBy(col("__cosine").desc, col(idCol).asc_nulls_first)
      .limit(k)
      .select(col(idCol), col("dot"))
  }

  /** Deterministic LSH bucket id (0..2^bits-1): bit j is the sign of
    * the decimal-exact sum of elements at positions ≡ j (mod bits).
    * A stand-in for random-hyperplane LSH with a seedless, both-engine-
    * computable hyperplane family.
    */
  def lshBucket(vec: Column, bits: Int = 4): Column = {
    val terms = (0 until bits).map { j =>
      val s = aggregate(
        zip_with(vec,
          sequence(lit(0), size(vec) - 1),
          (x, i) => when(i % bits === j, quantize(x)).otherwise(0L)),
        lit(0L), (acc, x) => acc + x)
      when(s > 0, lit(1 << j)).otherwise(0)
    }
    terms.reduce(_ + _)
  }

  /** Bucketed ANN: per-bucket membership counts (the partition shape
    * an IVF/LSH index would use for candidate pruning).
    */
  def lshBucketCounts(df: DataFrame, vecCol: String,
                      bits: Int = 4): DataFrame =
    df.select(lshBucket(col(vecCol), bits).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"))
      .orderBy(col("bucket").asc_nulls_first)

  /** Embedding near-duplicate pairs: same-bucket candidates filtered
    * by cosine ≥ threshold. The bucket equi-join bounds the pair space
    * (scale path); cosine is decimal-deterministic.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, bits: Int = 4): DataFrame = {
    // quantize each vector and compute its norm ONCE before the join:
    // the per-pair work is a single zip_with multiply-sum instead of
    // three quantization passes
    val prepped = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => quantize(x)).as("qv"),
      lshBucket(col(vecCol), bits).as("bucket"))
      .withColumn("n2", aggregate(
        expr("transform(qv, x -> x * x)"), lit(0L), (a, x) => a + x))
    val a = prepped.as("a")
    val b = prepped.as("b")
    val dot = aggregate(
      zip_with(col("a.qv"), col("b.qv"), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    a.join(b, col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (dot.cast("double") /
          (sqrt(col("a.n2").cast("double")) *
           sqrt(col("b.n2").cast("double")))).as("cosine"))
      .where(col("cosine") >= threshold)
  }
}
