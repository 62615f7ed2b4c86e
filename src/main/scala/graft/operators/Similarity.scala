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

  /** Exact integer dot product of two equal-length float arrays —
    * the native expression (one JVM call per row; identical
    * quantization semantics to the lambda form).
    */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.DotQExpr.dotQNative(a, b)

  /** Brute-force cosine top-k against the vector with id `queryId`.
    * The query side is a single broadcast row; ranking is by the
    * deterministic decimal dot product scaled by rsqrt norms.
    */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
                 queryId: Long, k: Int): DataFrame = {
    // norms precomputed per side; per-candidate work is one native
    // dot-product call
    val q = df.where(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"),
        sqrt(dotQ(col(vecCol), col(vecCol)).cast("double")).as("__qn"))
    val prepped = df.where(col(idCol) =!= queryId)
      .select(col(idCol), col(vecCol).as("__v"),
        sqrt(dotQ(col(vecCol), col(vecCol)).cast("double")).as("__n"))
    val dot = dotQ(col("__v"), col("__qv"))
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
    // norms computed once per vector before the join; per-pair work
    // is one native dot-product call
    val prepped = df.select(col(idCol).as("id"),
      col(vecCol).as("v"),
      lshBucket(col(vecCol), bits).as("bucket"),
      dotQ(col(vecCol), col(vecCol)).as("n2"))
    val a = prepped.as("a")
    val b = prepped.as("b")
    val dot = dotQ(col("a.v"), col("b.v"))
    a.join(b, col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (dot.cast("double") /
          (sqrt(col("a.n2").cast("double")) *
           sqrt(col("b.n2").cast("double")))).as("cosine"))
      .where(col("cosine") >= threshold)
  }
}
