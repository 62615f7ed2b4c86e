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
  * assigns every vector to a deterministic random-hyperplane LSH
  * bucket (md5-derived ±1 hyperplanes, native expression) whose bucket
  * count scales with n, so ANN lookups and near-dup joins touch only
  * same-bucket rows and no join side ever degenerates to a constant
  * fan-out.
  */
object Similarity {

  /** The shared 2^25 quantization grid: round(x*2^25) as an exact
    * long. ONE definition so the codebook and encoder sides of
    * every exact-integer contract (PQ, IVF, SQ) cannot drift.
    */
  private def quant25(x: Column): Column =
    round(x.cast("double") * 33554432.0).cast("long")

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

  /** Full random-hyperplane sign pattern (LshSignExpr.MaxBits wide)
    * via the native [[graft.functions.LshSignExpr]] — one JVM call per
    * row, replacing the interpreted `zip_with`+`aggregate` lambda
    * chain.
    */
  def signPattern(vec: Column): Column =
    graft.functions.LshSignExpr.lshSignNative(vec)

  /** Bucket-width derivation: the smallest b in [4, MaxBits] with
    * n ≤ targetPerBucket·2^b — so the bucket count 2^b GROWS with the
    * corpus instead of being a constant (a fixed 16-bucket space makes
    * every bucket join O(n²/16)); the 32-bit family holds the ladder
    * to ~5.5×10^11 rows (true 100 TB doc counts). Pure integer
    * arithmetic so the DuckDB oracle's CASE ladder derives the
    * identical width (a float log2 could round differently across
    * engines at exact powers of two).
    */
  def bitsForCount(n: Long, targetPerBucket: Long = 128L): Int = {
    var b = 4
    while (b < graft.functions.LshSignExpr.MaxBits &&
        n > (targetPerBucket << b)) b += 1
    b
  }

  /** [[bitsForCount]] as a Column over a row-count column — the same
    * integer ladder evaluated INSIDE the plan, so the width can derive
    * from an aggregate of the one corpus pass instead of a separate
    * `count()` scan.
    */
  def bitsForCountCol(n: Column,
                      targetPerBucket: Long = 128L): Column = {
    val maxBits = graft.functions.LshSignExpr.MaxBits
    (5 until maxBits).foldLeft(
        when(n <= lit(targetPerBucket << 4), lit(4)))((acc, b) =>
      acc.when(n <= lit(targetPerBucket << b), lit(b)))
      .otherwise(lit(maxBits))
  }

  /** Deterministic LSH bucket id (0..2^bits−1): the low `bits` of the
    * native sign pattern, viewed unsigned through a LONG so the full
    * 32-bit family works (bit 31 is the Int sign bit; sign-extension
    * then `& (2^bits − 1)` yields the unsigned low bits — identical
    * BIGINT arithmetic in the DuckDB oracle).
    */
  def lshBucket(vec: Column, bits: Int): Column =
    signPattern(vec).cast("long").bitwiseAND(lit((1L << bits) - 1))

  /** Bucketed ANN: per-bucket membership counts (the partition shape
    * an IVF/LSH index would use for candidate pruning). Bucket width
    * scales with the row count via the [[bitsForCountCol]] ladder.
    *
    * ONE corpus scan, one plan: rows aggregate by their FULL sign
    * pattern first (slim (pattern, count) rows — at most min(n, 2^32)
    * groups — with map-side partial aggregation); the total row count,
    * the bucket width, and the final masked-bucket counts all derive
    * from that aggregate, so no separate `count()` pass ever touches
    * the corpus (the previous formulation scanned it once just to
    * size the buckets).
    */
  def lshBucketCounts(df: DataFrame, vecCol: String,
                      targetPerBucket: Long = 128L): DataFrame = {
    val byPattern = df.select(
        signPattern(col(vecCol)).cast("long").as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("c"))
    val bitsFrame = byPattern.agg(sum(col("c")).as("n"))
      .select(bitsForCountCol(col("n"), targetPerBucket).as("bits"))
    byPattern.crossJoin(broadcast(bitsFrame))
      .groupBy(expr(
        "p & (shiftleft(CAST(1 AS BIGINT), bits) - 1)").as("bucket"))
      .agg(sum(col("c")).cast("long").as("n_vectors"))
      .orderBy(col("bucket").asc_nulls_first)
  }

  /** Per-label centroid partial sums — the IVF / cluster-summary
    * building block: vectors NEVER collect anywhere. Each dimension's
    * quantized component sum aggregates map-side (one shuffle on
    * (label, dim), one tiny one on label); exact centroid means
    * derive as sum/count downstream. Output keeps exact integers for
    * engine-portable verification: per label the vector count,
    * dimension count, and the L1 norm of the quantized component
    * sums.
    */
  def centroidStats(df: DataFrame, labelCol: Column,
                    vecCol: Column): DataFrame = {
    val comps = df.select(labelCol.as("label"),
        posexplode(vecCol).as(Seq("dim", "x")))
      .select(col("label"), col("dim"),
        quant25(col("x")).as("qx"))
    val dimSums = comps.groupBy(col("label"), col("dim"))
      .agg(sum(col("qx")).as("s"))
    val n = df.groupBy(labelCol.as("label"))
      .agg(count(lit(1)).as("n_vectors"))
    dimSums.groupBy(col("label"))
      .agg(count(lit(1)).as("dims"),
        sum(abs(col("s"))).cast("long").as("l1_q"))
      .join(n, Seq("label"))
      .select(col("label"), col("n_vectors"), col("dims"),
        col("l1_q"))
  }

  /** IVF-style ANN search — the query path over the
    * [[centroidStats]] index shape: score every per-label centroid
    * against the query, probe the nearest `nprobe` labels, and
    * re-rank ONLY their members by exact quantized cosine. Returns
    * the top-k (id, dot) like [[cosineTopK]], but the corpus pass
    * touches just the probed partitions — with label-partitioned
    * storage the scan prunes to nprobe/n_labels of the data, which is
    * the whole point of IVF at 100 TB.
    *
    * Determinism: centroid scoring needs no division by the member
    * count — cosine(q, Σv/n) ≡ cosine(q, Σv) — so scores derive from
    * the exact quantized component sums; products accumulate in
    * DECIMAL(38,0) (s·qy can pass 2^63 at corpus scale) and convert
    * to double only for ranking, with the label as tie-break —
    * the [[cosineTopK]] pattern that already hash-matches DuckDB.
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              labelCol: String, queryId: Long, k: Int,
              nprobe: Int,
              centroids: Option[DataFrame] = None): DataFrame = {
    val quant = quant25 _
    val q = df.where(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"))
    val qComps = q.select(posexplode(col("__qv")).as(Seq("dim", "x")))
      .select(col("dim"), quant(col("x")).as("qy"))
    // per-(label, dim) quantized sums aggregate map-side; the score
    // join is against the (tiny, broadcast) query components. A
    // persisted [[IvfIndex]] centroid table replaces this corpus
    // aggregation entirely — the serving path then touches only the
    // k·d index rows plus the probed partitions.
    val dimSums = centroids.getOrElse(df
      .select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("label"), col("dim"), quant(col("x")).as("qx"))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("qx")).as("s")))
    val probes = dimSums.join(broadcast(qComps), Seq("dim"))
      .groupBy(col("label"))
      .agg(sum(col("s").cast("decimal(38,0)") * col("qy"))
          .as("dot_c"),
        sum(col("s").cast("decimal(38,0)") * col("s")).as("s2"))
      .select(col("label"), (col("dot_c").cast("double") /
        sqrt(col("s2").cast("double"))).as("__score"))
      .orderBy(col("__score").desc, col("label").asc_nulls_first)
      .limit(nprobe)
      .select(col("label"))
    // candidate scan: semi-join against the broadcast probe list
    // (label-partitioned storage turns this into partition pruning),
    // then the exact [[cosineTopK]] re-rank
    val prepped = df.where(col(idCol) =!= queryId)
      .select(col(idCol), col(labelCol).as("label"),
        col(vecCol).as("__v"),
        sqrt(dotQ(col(vecCol), col(vecCol)).cast("double")).as("__n"))
      .join(broadcast(probes), Seq("label"), "left_semi")
    val qn = q.select(col("__qv"),
      sqrt(dotQ(col("__qv"), col("__qv")).cast("double")).as("__qn"))
    val dot = dotQ(col("__v"), col("__qv"))
    prepped.crossJoin(broadcast(qn))
      .select(col(idCol), dot.as("dot"),
        (dot.cast("double") / (col("__n") * col("__qn")))
          .as("__cosine"))
      .orderBy(col("__cosine").desc, col(idCol).asc_nulls_first)
      .limit(k)
      .select(col(idCol), col("dot"))
  }

  /** Batch IVF ANN — [[ivfTopK]] for a SET of query vectors, the
    * shape a pipeline actually runs (dedup-against-index, retrieval
    * for a training batch): every query probes its own nearest
    * `nprobe` centroids (one window over the tiny (query, label)
    * score frame), the corpus joins the broadcast probe list once —
    * fan-out is Σ probed-partition sizes, the standard IVF batch
    * cost, never |queries| × corpus — and per-query top-k comes from
    * a bounded window. Returns (qid, vec_id, dot, rank).
    */
  def ivfTopKBatch(df: DataFrame, idCol: String, vecCol: String,
                   labelCol: String, queries: DataFrame,
                   qidCol: String, qvecCol: String,
                   k: Int, nprobe: Int,
                   centroids: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quant = quant25 _
    val q = queries.select(col(qidCol).as("qid"),
      col(qvecCol).as("__qv"),
      dotQ(col(qvecCol), col(qvecCol)).as("__qn2"))
    val qComps = q.select(col("qid"),
        posexplode(col("__qv")).as(Seq("dim", "x")))
      .select(col("qid"), col("dim"), quant(col("x")).as("qy"))
    val dimSums = centroids.getOrElse(df
      .select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("label"), col("dim"), quant(col("x")).as("qx"))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("qx")).as("s")))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("__sc").desc, col("label").asc_nulls_first)
    val probes = dimSums.join(broadcast(qComps), Seq("dim"))
      .groupBy(col("qid"), col("label"))
      .agg(sum(col("s").cast("decimal(38,0)") * col("qy"))
          .as("dot_c"),
        sum(col("s").cast("decimal(38,0)") * col("s")).as("s2"))
      .select(col("qid"), col("label"),
        (col("dot_c").cast("double") /
          sqrt(col("s2").cast("double"))).as("__sc"))
      .withColumn("rn", row_number().over(wq))
      .where(col("rn") <= nprobe)
      .select(col("qid"), col("label"))
    val cands = df.select(col(idCol).as("vec_id"),
        col(labelCol).as("label"), col(vecCol).as("__v"),
        dotQ(col(vecCol), col(vecCol)).as("__n2"))
      .join(broadcast(probes), Seq("label"))
      .where(col("vec_id") =!= col("qid"))
    val dot = dotQ(col("__v"), col("__qv"))
    val wk = Window.partitionBy(col("qid"))
      .orderBy(col("__cos").desc, col("vec_id").asc_nulls_first)
    cands.join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("vec_id"), dot.as("dot"),
        (dot.cast("double") /
          (sqrt(col("__n2").cast("double")) *
           sqrt(col("__qn2").cast("double")))).as("__cos"))
      // long rank: row_number() is int32, but every engine's
      // ROW_NUMBER (and the oracle's) is 64-bit — keep the output
      // schema exactly typed for hash comparison
      .withColumn("rank", row_number().over(wk).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("dot"), col("rank"))
      .orderBy(col("qid").asc_nulls_first, col("rank").asc_nulls_first)
  }

  /** Deterministic spherical k-means — the self-contained IVF index
    * build: learns a (id, label) partition assignment so [[ivfTopK]]
    * / [[ivfTopKBatch]] need no pre-existing label column.
    *
    * Engine-portable by construction (an unrolled DuckDB oracle
    * reproduces it bit-for-bit):
    *  - seeds = the `k` hash-smallest ids (md5, the [[graft.operators.Sampling.hash32]]
    *    idiom), labeled 0..k-1 in hash order — no RNG anywhere;
    *  - assignment maximizes cosine(v, centroid). Cosine needs NO
    *    division by member count (cos(v, Σw/n) ≡ cos(v, Σw)), so
    *    centroids stay EXACT quantized integer component sums; the
    *    score converts to double only for ranking, ties broken by
    *    label — the [[ivfTopK]] probe pattern that already
    *    hash-matches DuckDB;
    *  - Lloyd iterations are fixed-count (no data-dependent stop, so
    *    the unrolled oracle stays in lockstep).
    *
    * Scale shape: per iteration, ONE corpus-component scan joined to
    * the BROADCAST centroid table (k·dims slim rows), partial-agg
    * reduced to n·k (id, label) score rows, then a per-id window
    * argmax; new centroid sums aggregate map-side on (label, dim).
    * O(n·k·d) arithmetic per round — the standard Lloyd cost — with
    * nothing corpus-sized ever collected or broadcast. Labels
    * checkpoint each round (slim n-row frame) so lineage stays flat.
    * A cluster that loses every member vanishes (standard Lloyd
    * degeneracy; harmless for IVF bucketing).
    *
    * The broadcast centroid table is k·dims rows (~16 bytes each):
    * IVF-typical k ≈ √n with d ≤ 4096 stays well inside broadcast
    * budgets (k=65536·d=1024 ≈ 1 GB is the practical ceiling). For
    * larger index fan-outs build hierarchically — a coarse k here,
    * then one refinement per coarse cell over its members — which
    * also cuts the Lloyd cost from n·k to n·(k₁+k/k₁).
    */
  /** The k (or ksub) hash-smallest seed ids with their labels,
    * COLLECTED (k rows — one bounded action; the labeler windows
    * over only the limit-ed rows, with the non-foldable partition
    * key that keeps Spark 4's EliminateWindowPartitions from folding
    * it into a warning-spamming empty-key window).
    */
  private def collectSeeds(df: DataFrame, idCol: String,
      k: Int): Array[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.expressions.Window
    val hashOrder = Seq(Sampling.hash32(col("id")).asc,
      col("id").asc_nulls_first)
    df.select(col(idCol).as("id"))
      .orderBy(hashOrder: _*)
      .limit(k)
      .select(col("id"), (row_number().over(Window
        .partitionBy(pmod(Sampling.hash32(col("id")), lit(1)))
        .orderBy(hashOrder: _*)) - 1)
        .cast("long").as("label"))
      .collect()
  }

  /** Seed assignment as an in-row CASE over the collected seed ids:
    * NULL for non-seeds (= absent from the seed assignment, exactly
    * the inner join's semantics).
    */
  private def seedLabelCase(
      seedRows: Array[org.apache.spark.sql.Row],
      id: Column): Column =
    seedRows.foldLeft(lit(null).cast("long")) { (acc, r) =>
      when(id === lit(r.get(0)), lit(r.getLong(1))).otherwise(acc)
    }

  /** Build the in-row argmax table from one iteration's collected
    * (sub, label, dim, cs) rows — norms Σ cs² in exact BigInt, then
    * ONE correctly-rounded double conversion (the plan's
    * decimal(38,0) → double cast).
    */
  private def centroidTableOf(
      rows: Array[org.apache.spark.sql.Row], m: Int, dsub: Int,
      hasSub: Boolean): graft.functions.LloydArgmaxExpr.CentroidTable = {
    import graft.functions.LloydArgmaxExpr.{CentroidTable, SubTable}
    val bySub = rows.groupBy(r =>
      if (hasSub) r.getLong(0) else 0L)
    val subs = (0 until m).map { s =>
      val off = if (hasSub) 1 else 0
      val byLabel = bySub.getOrElse(s.toLong,
          Array.empty[org.apache.spark.sql.Row])
        .groupBy(_.getLong(off))
      val labels = byLabel.keys.toArray.sorted
      val dims = labels.map(l => byLabel(l)
        .map(r => r.getInt(off + 1)).toArray)
      val cs = labels.map(l => byLabel(l)
        .map(r => r.getLong(off + 2)).toArray)
      val s2 = labels.map { l =>
        val v = byLabel(l).iterator
          .map(r => BigInt(r.getLong(off + 2)))
          .map(x => x * x).sum
        new java.math.BigDecimal(v.bigInteger).doubleValue
      }
      SubTable(labels, dims, cs, s2)
    }.toArray
    CentroidTable(m, dsub, subs)
  }

  /** [[kmeansLabels]] plus its final collected centroid table — so
    * [[buildIvfIndex]] can aggregate the index's centroid sums with
    * the label computed IN-ROW (no corpus-sized join).
    */
  private def kmeansLabelsWithTable(df: DataFrame, idCol: String,
      vecCol: String, k: Int, iters: Int)
      : (DataFrame,
         Option[graft.functions.LloydArgmaxExpr.CentroidTable]) = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0: $k/$iters")
    import graft.functions.LloydArgmaxExpr
    val quant = quant25 _
    val spark = df.sparkSession
    // seeds collected once (k rows)
    val seedRows = collectSeeds(df, idCol, k)
    if (iters == 0) {
      import scala.jdk.CollectionConverters._
      val idType = df.schema(idCol).dataType
      return (spark.createDataFrame(seedRows.toSeq.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", idType),
          org.apache.spark.sql.types.StructField("label",
            org.apache.spark.sql.types.LongType, nullable = false)))),
        None)
    }
    // ONE aggregation action per Lloyd iteration: the previous
    // round's assignment is computed IN-ROW against the collected
    // centroid table (lloyd_argmax — exact integer dots, the same
    // double score and tie-breaks as the join+window formulation),
    // so each round is a single groupBy(label, dim) over the
    // components with zero joins, zero windows, zero per-round
    // checkpoints. The old shape paid two exchanges, a sort and two
    // actions per round for identical values.
    var table: LloydArgmaxExpr.CentroidTable = null
    for (i <- 0 until iters) {
      // the barrier keeps the isNotNull filter from being pushed
      // below the projection and re-inlining the argmax (it would
      // otherwise evaluate twice per row — measured in the verify
      // plans)
      val labelCol =
        if (i == 0) seedLabelCase(seedRows, col(idCol))
        else graft.functions.PushdownBarrierExpr.barrier(element_at(
          LloydArgmaxExpr.column(col(vecCol), table), 1))
      val rows = df
        .select(labelCol.as("label"),
          posexplode(col(vecCol)).as(Seq("dim", "x")))
        .where(col("label").isNotNull)
        .select(col("label"), col("dim"), quant(col("x")).as("qx"))
        .groupBy(col("label"), col("dim"))
        .agg(sum(col("qx")).as("s"))
        .collect()
      table = centroidTableOf(rows, m = 1, dsub = Int.MaxValue,
        hasSub = false)
    }
    // final assignment: a pure projection, EAGERLY checkpointed —
    // the assignment is consumed several times by every caller
    // (centroid tables, code tables, probe joins), often more than
    // once within one action; one dedicated materialization and
    // every consumer reads the cache
    val labels = df
      .select(col(idCol).as("id"), graft.functions.PushdownBarrierExpr.barrier(element_at(
        LloydArgmaxExpr.column(col(vecCol), table), 1)).as("label"))
      .where(col("label").isNotNull)
      .localCheckpoint(true)
    (labels, Some(table))
  }

  def kmeansLabels(df: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int = 2): DataFrame =
    kmeansLabelsWithTable(df, idCol, vecCol, k, iters)._1

  /** Hierarchical (coarse-then-refine) k-means — the scale path past
    * [[kmeansLabels]]'s broadcast-centroid ceiling: a coarse pass
    * learns `kCoarse` cells, then ONE grouped Lloyd refinement
    * sub-clusters every cell into `kPerCell` clusters simultaneously
    * (all cells refine in the same distributed job — never a
    * per-cell loop). Final label = cell · kPerCell + sub, giving
    * k = kCoarse · kPerCell total clusters.
    *
    * Why this breaks the ceiling:
    *  - Lloyd arithmetic drops from n·k to n·(kCoarse + kPerCell)
    *    score terms per round — at k = 65536 via 256×256, that is
    *    ~128× less work;
    *  - the refinement joins centroids on (cell, dim), so Catalyst
    *    is free to plan a SHUFFLE hash join when the k·d centroid
    *    table outgrows broadcast budgets (nothing here forces a
    *    broadcast of the full centroid table) — each comp row meets
    *    only its own cell's kPerCell centroids either way.
    *
    * Determinism is inherited wholesale: hash-smallest seeds PER
    * CELL, exact integer centroid sums, label tie-breaks, fixed
    * rounds. With kCoarse = 1 the coarse pass puts everything in one
    * cell and the refinement IS the flat algorithm — spec-pinned
    * equal to [[kmeansLabels]] (and therefore to q48's DuckDB
    * oracle) at the same k.
    */
  def kmeansLabelsHierarchical(df: DataFrame, idCol: String,
                               vecCol: String, kCoarse: Int,
                               kPerCell: Int,
                               iters: Int = 2): DataFrame = {
    require(kCoarse > 0 && kPerCell > 0 && iters >= 0,
      s"need positive k, iters >= 0: $kCoarse/$kPerCell/$iters")
    import org.apache.spark.sql.expressions.Window
    val quant = quant25 _
    val cells =
      if (kCoarse == 1)
        df.select(col(idCol).as("id"), lit(0L).as("__cell"))
      else
        kmeansLabels(df, idCol, vecCol, kCoarse, iters)
          .select(col("id"), col("label").as("__cell"))
    val comps = df.select(col(idCol).as("id"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("id"), col("dim"), quant(col("x")).as("qx"))
    val hashOrder = Seq(Sampling.hash32(col("id")).asc,
      col("id").asc_nulls_first)
    // per-cell seeds: the kPerCell hash-smallest ids of each cell.
    // kCoarse == 1 would make __cell a FOLDABLE literal, which
    // EliminateWindowPartitions strips — the keyed window then
    // degenerates to a single task sorting EVERY id; route that case
    // through TakeOrdered (distributed top-k) instead, ranking only
    // the kPerCell survivors
    val wseed = Window.partitionBy(col("__cell"))
      .orderBy(hashOrder: _*)
    var labels = (
      if (kCoarse == 1)
        df.select(col(idCol).as("id"))
          .orderBy(hashOrder: _*)
          .limit(kPerCell)
          .select(col("id"), lit(0L).as("__cell"),
            (row_number().over(Window
              .partitionBy(pmod(Sampling.hash32(col("id")), lit(1)))
              .orderBy(hashOrder: _*)) - 1)
              .cast("long").as("__sub"))
      else
        cells
          .withColumn("__rn", row_number().over(wseed))
          .where(col("__rn") <= kPerCell)
          .select(col("id"), col("__cell"),
            (col("__rn") - 1).cast("long").as("__sub"))
      ).localCheckpoint(true)
    for (_ <- 0 until iters) {
      val centroids = comps.join(labels, Seq("id"))
        .groupBy(col("__cell"), col("__sub"), col("dim"))
        .agg(sum(col("qx")).as("s"))
      val norms = centroids.groupBy(col("__cell"), col("__sub"))
        .agg(sum(col("s").cast("decimal(38,0)") * col("s"))
          .as("s2"))
      val wid = Window.partitionBy(col("id"))
        .orderBy(col("__sc").desc, col("__sub").asc_nulls_first)
      labels = comps
        .join(cells, Seq("id"))
        .join(centroids, Seq("__cell", "dim"))
        .groupBy(col("id"), col("__cell"), col("__sub"))
        .agg(sum(col("qx").cast("decimal(38,0)") * col("s"))
          .as("dot"))
        .join(norms, Seq("__cell", "__sub"))
        .select(col("id"), col("__cell"), col("__sub"),
          (col("dot").cast("double") /
            sqrt(col("s2").cast("double"))).as("__sc"))
        .withColumn("__rn", row_number().over(wid))
        .where(col("__rn") === 1)
        .select(col("id"), col("__cell"), col("__sub"))
        .localCheckpoint(true)
    }
    labels.select(col("id"),
      (col("__cell") * kPerCell + col("__sub")).as("label"))
  }

  /** A persisted IVF index: the (id, label) assignment and the
    * per-(label, dim) exact quantized centroid sums — the two slim
    * tables [[ivfTopK]]/[[ivfTopKBatch]] need, so serving never
    * re-runs Lloyd or re-aggregates the corpus. Stored as parquet
    * (`<path>/labels`, `<path>/centroids`); the centroid table is
    * k·d rows regardless of corpus size.
    */
  final case class IvfIndex(labels: DataFrame, centroids: DataFrame)

  /** Build the index: deterministic k-means assignment + centroid
    * sums in one pass over the labeled components (use
    * [[kmeansLabelsHierarchical]] upstream and pass its labels via
    * `precomputedLabels` for index sizes past the flat ceiling).
    */
  def buildIvfIndex(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int = 2,
                    precomputedLabels: Option[DataFrame] = None)
      : IvfIndex = {
    import scala.jdk.CollectionConverters._
    val quant = quant25 _
    val (labels, tableOpt) = precomputedLabels match {
      case Some(l) => (l, None)
      case None =>
        val (l, t) = kmeansLabelsWithTable(df, idCol, vecCol, k,
          iters)
        (l, t)
    }
    // the index's centroid sums: with the final argmax table in
    // hand the label computes IN-ROW and the aggregation needs no
    // join with the assignment at all; otherwise (precomputed
    // labels, or the 0-iteration degenerate) join the label frame
    val centsAgg = tableOpt match {
      case Some(table) => df
        .select(graft.functions.PushdownBarrierExpr.barrier(element_at(graft.functions.LloydArgmaxExpr
            .column(col(vecCol), table), 1)).as("label"),
          posexplode(col(vecCol)).as(Seq("dim", "x")))
        .where(col("label").isNotNull)
        .select(col("label"), col("dim"), quant(col("x")).as("qx"))
        .groupBy(col("label"), col("dim"))
        .agg(sum(col("qx")).as("s"))
      case None => df.select(col(idCol).as("id"),
          posexplode(col(vecCol)).as(Seq("dim", "x")))
        .select(col("id"), col("dim"), quant(col("x")).as("qx"))
        .join(labels, Seq("id"))
        .groupBy(col("label"), col("dim"))
        .agg(sum(col("qx")).as("s"))
    }
    // collect the k·d centroid table ONCE (it is exactly what every
    // consumer broadcasts): as a local relation it broadcasts with
    // zero cluster jobs, so the rounded-centroid / probe-scoring /
    // residual-training subtrees that each used to re-run this
    // corpus-sized aggregation inside their broadcast builds now
    // read k·d local rows.
    val centroids = df.sparkSession.createDataFrame(
      centsAgg.collect().toSeq.asJava, centsAgg.schema)
    IvfIndex(labels, centroids)
  }

  /** Persist both index tables (overwrite). */
  def writeIvfIndex(index: IvfIndex, path: String): Unit = {
    index.labels.write.mode("overwrite").parquet(s"$path/labels")
    index.centroids.write.mode("overwrite")
      .parquet(s"$path/centroids")
  }

  /** Reload a persisted index for serving. */
  def readIvfIndex(spark: org.apache.spark.sql.SparkSession,
                   path: String): IvfIndex =
    IvfIndex(spark.read.parquet(s"$path/labels"),
      spark.read.parquet(s"$path/centroids"))

  /** Embedding near-duplicate pairs: same-bucket candidates filtered
    * by cosine ≥ threshold. The bucket equi-join bounds the pair
    * space; the bucket count scales with n ([[bitsForCount]]), and
    * buckets larger than `maxBucketSize` — a degenerate hyperplane
    * region that would re-create the quadratic join — are dropped
    * entirely via a broadcast anti-join against the (tiny) over-cap
    * bucket list, mirroring the stop-shingle df-cap in
    * [[Dedup.jaccardPairs]].
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double,
                         targetPerBucket: Long = 128L,
                         maxBucketSize: Long = 10000L): DataFrame = {
    // bucket width from parquet footers when the frame is a bare
    // scan (exact, metadata-only, zero jobs) — the corpus is never
    // scanned just to size the bucket space
    val bits = bitsForCount(ScanStats.fastRowCount(df),
      targetPerBucket)
    // norms computed once per vector before the join; per-pair work
    // is one native dot-product call. The explicit bucket repartition
    // is the one shuffle, shared by ReuseExchange across the
    // hot-bucket aggregation, the anti-join probe side, and both
    // self-join sides (which need exactly this partitioning) — so the
    // scan + signature projection run once.
    val prepped = df.select(col(idCol).as("id"),
      col(vecCol).as("v"),
      lshBucket(col(vecCol), bits).as("bucket"),
      dotQ(col(vecCol), col(vecCol)).as("n2"))
      .repartition(col("bucket"))
    val hot = prepped.groupBy(col("bucket"))
      .agg(count(lit(1)).as("c"))
      .where(col("c") > maxBucketSize)
      .select(col("bucket"))
    val kept = prepped.join(broadcast(hot), Seq("bucket"), "left_anti")
    val a = kept.as("a")
    val b = kept.as("b")
    val dot = dotQ(col("a.v"), col("b.v"))
    a.join(b, col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (dot.cast("double") /
          (sqrt(col("a.n2").cast("double")) *
           sqrt(col("b.n2").cast("double")))).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  // ==== Product quantization ======================================

  /** Per-subspace codebook training — the learning step of product
    * quantization (Jégou, Douze, Schmid, "Product Quantization for
    * Nearest Neighbor Search", IEEE TPAMI 2011): the `dims`
    * components split into `m` contiguous subspaces of dims/m each,
    * and every subspace learns its own `ksub`-way spherical-k-means
    * codebook over the sub-vectors. Returns one (id, sub, label)
    * assignment row per vector per subspace.
    *
    * All `m` Lloyd recurrences run inside the SAME distributed jobs
    * — `sub` rides the existing grouping keys, so training cost is
    * one [[kmeansLabels]] pass regardless of `m` (scoring compares
    * each component against its own subspace's ksub centroids:
    * n·d·ksub terms per round, identical to flat k-means at k=ksub).
    * Determinism is inherited wholesale: the ksub hash-smallest ids
    * seed EVERY subspace (labels 0..ksub-1 in hash order), centroid
    * sums stay exact quantized integers, cosine argmax breaks ties
    * label-asc, iterations are fixed-count — so an unrolled SQL
    * oracle reproduces every code bit-for-bit.
    */
  def pqAssign(df: DataFrame, idCol: String, vecCol: String,
               dims: Int, m: Int, ksub: Int,
               iters: Int = 2): DataFrame = {
    require(m > 0 && dims % m == 0,
      s"dims must split evenly into m subspaces: dims=$dims m=$m")
    require(ksub > 0 && iters >= 0,
      s"need ksub > 0, iters >= 0: $ksub/$iters")
    val dsub = dims / m
    import graft.functions.LloydArgmaxExpr
    val quant = quant25 _
    val spark = df.sparkSession
    // the same ksub seed vectors label every subspace (their
    // sub-vector slices differ per subspace, which is all the
    // diversity Lloyd needs; one seed list keeps the oracle small)
    val seedRows = collectSeeds(df, idCol, ksub)
    if (iters == 0) {
      import scala.jdk.CollectionConverters._
      val idType = df.schema(idCol).dataType
      return spark.createDataFrame(
        seedRows.toSeq.flatMap(r => (0 until m).map(s =>
          org.apache.spark.sql.Row(r.get(0), s.toLong,
            r.getLong(1)))).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", idType),
          org.apache.spark.sql.types.StructField("sub",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("label",
            org.apache.spark.sql.types.LongType, nullable = false))))
    }
    // ONE aggregation action per Lloyd iteration, all m subspaces in
    // the same job: the previous round's per-subspace assignment is
    // computed IN-ROW (lloyd_argmax over the collected codebook —
    // exact integer dots, same double scores and label-asc
    // tie-breaks as the join+window formulation), so each round is a
    // single groupBy(sub, label, dim) with zero joins, windows or
    // per-round checkpoints
    val subCol = expr(s"CAST(dim div $dsub AS BIGINT)")
    var table: LloydArgmaxExpr.CentroidTable = null
    for (i <- 0 until iters) {
      val labCol: Column =
        if (i == 0) seedLabelCase(seedRows, col(idCol))
        else graft.functions.PushdownBarrierExpr.barrier(LloydArgmaxExpr.column(col(vecCol), table))
      val rows = df
        .select(labCol.as("__lab"),
          posexplode(col(vecCol)).as(Seq("dim", "x")))
        .where(col("__lab").isNotNull)
        .select(subCol.as("sub"),
          (if (i == 0) col("__lab")
           else element_at(col("__lab"),
             (subCol + 1).cast("int"))).as("label"),
          col("dim"), quant(col("x")).as("qx"))
        .groupBy(col("sub"), col("label"), col("dim"))
        .agg(sum(col("qx")).as("cs"))
        .collect()
      table = centroidTableOf(rows, m, dsub, hasSub = true)
    }
    // final assignment: a pure projection exploded to the
    // (id, sub, label) contract rows, EAGERLY checkpointed (the
    // kmeansLabels multi-consumer rationale)
    df.select(col(idCol).as("id"),
        graft.functions.PushdownBarrierExpr.barrier(LloydArgmaxExpr.column(col(vecCol), table)).as("__lab"))
      .where(col("__lab").isNotNull)
      .select(col("id"), posexplode(col("__lab"))
        .as(Seq("sub", "label")))
      .select(col("id"), col("sub").cast("long").as("sub"),
        col("label"))
      .localCheckpoint(true)
  }

  /** Collapse a [[pqAssign]] assignment to one compact code word per
    * vector: (id, codes) with `codes(s)` = the subspace-s label. THIS
    * is the stored representation — m small integers (one byte each
    * at the standard ksub=256) instead of d floats, a 4·d/m-fold
    * compression (64× at d=1024, m=64) that turns a 100 TB float
    * corpus into a scan-friendly ~1.6 TB code table.
    */
  def pqCodes(assign: DataFrame): DataFrame =
    assign.groupBy(col("id"))
      .agg(transform(sort_array(collect_list(
          struct(col("sub"), col("label")))),
        s => s.getField("label")).as("codes"))

  /** Final codebook table for a trained assignment: per (sub, label)
    * the exact integer centroid component sums and the member count
    * — (sub, label, dim, cs, n), m·ksub·(d/m) slim rows total,
    * independent of corpus size (the PQ analogue of [[IvfIndex]]'s
    * centroid table; persist alongside the codes).
    */
  def pqCodebooks(df: DataFrame, idCol: String, vecCol: String,
                  dims: Int, m: Int, assign: DataFrame): DataFrame = {
    require(m > 0 && dims % m == 0,
      s"dims must split evenly into m subspaces: dims=$dims m=$m")
    val dsub = dims / m
    val quant = quant25 _
    val comps = df.select(col(idCol).as("id"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("id"), expr(s"CAST(dim div $dsub AS BIGINT)")
        .as("sub"), col("dim"), quant(col("x")).as("qx"))
    val counts = assign.groupBy(col("sub"), col("label"))
      .agg(count(lit(1)).as("n"))
    comps.join(assign, Seq("id", "sub"))
      .groupBy(col("sub"), col("label"), col("dim"))
      .agg(sum(col("qx")).as("cs"))
      .join(broadcast(counts), Seq("sub", "label"))
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: rank the corpus
    * by approximate cosine between each query and the RECONSTRUCTED
    * vector x̂ (per subspace, the centroid its code names), reading
    * ONLY the code table. Returns (qid, vec_id, rank), rank ≤ k per
    * query, self excluded.
    *
    * Scale shape — the whole point of PQ: the scan is a pure
    * codegen'd PROJECTION over the codes table against two broadcast
    * lookup literals (per-query numerator terms q·ĉ and the
    * query-independent ĉ·ĉ norm terms — |queries|·m·ksub doubles,
    * built from one tiny codebook×query aggregation). No join, no
    * shuffle, no float arrays touched: each row costs 2m map lookups
    * + a fixed-order double sum, then a per-query top-k window over
    * scored rows. Compose with IVF labels to prune the scan to
    * probed partitions.
    *
    * Engine-portable determinism: every LUT double is produced by
    * the exact-integer → double pipeline (decimal sums, one
    * division), the per-row score sums its m terms in FIXED subspace
    * order (left fold, matching the oracle's unrolled t0+t1+…), and
    * ties break by vec_id — so rankings hash-match the SQL oracle.
    */
  def pqTopKAdc(codes: DataFrame, codebooks: DataFrame,
                queries: DataFrame, qidCol: String, qvecCol: String,
                dims: Int, m: Int, k: Int,
                maxScanRows: Long = 2000000000L): DataFrame = {
    require(m > 0 && dims % m == 0,
      s"dims must split evenly into m subspaces: dims=$dims m=$m")
    // the exhaustive scan materializes |codes| × |queries| scored
    // rows — linear per query, but a fat query batch multiplies the
    // whole code table silently. Price it with two cheap counts (the
    // query side is LUT-collected anyway) and REFUSE past budget,
    // pointing at the sublinear path. Both counts ride ONE action
    // (two sequential count() calls paid a scheduler round-trip
    // each).
    val cntRow = codes.agg(count(lit(1)).as("nc"))
      .crossJoin(queries.agg(count(lit(1)).as("nq"))).head()
    val scanRows = BigInt(cntRow.getLong(0)) *
      BigInt(cntRow.getLong(1))
    if (scanRows > BigInt(maxScanRows))
      throw new IllegalStateException(
        s"pqTopKAdc: exhaustive ADC scan would materialize " +
        s"$scanRows scored rows (> budget $maxScanRows). Batch the " +
        "queries, raise maxScanRows explicitly, or use ivfPqTopK — " +
        "the IVF-pruned serving path scans only probed cells.")
    val score = adcScore(codebooks, queries, qidCol, qvecCol, m)
    val qids = queries.select(col(qidCol).as("qid"))
    adcRank(codes.crossJoin(broadcast(qids)), score, k)
  }

  /** The ADC score column for a (qid, codes) frame: two broadcast
    * LUT literals built from one tiny codebook×query aggregation,
    * then 2m lookups + FIXED-ORDER double sums per row (left fold ==
    * the oracle's unrolled t0+t1+…). Every LUT double comes from the
    * exact-integer decimal-sum → double cast path, so scores are
    * bit-identical to the SQL oracle's.
    */
  private def adcScore(codebooks: DataFrame, queries: DataFrame,
                       qidCol: String, qvecCol: String,
                       m: Int): Column = {
    val quant = quant25 _
    // the numerator and norm LUT collects below both consume the
    // codebook frame, whose plan usually contains the whole
    // codebook-training aggregation — checkpoint it lazily so the
    // first collect materializes it once and the second reads the
    // cached m·ksub·(d/m) rows instead of re-running the training
    // chain
    val cb = codebooks.localCheckpoint(false)
    val qComps = queries.select(col(qidCol).as("qid"),
        posexplode(col(qvecCol)).as(Seq("dim", "x")))
      .select(col("qid"), col("dim"), quant(col("x")).as("qy"))
    // numerator LUT: t(qid, sub, label) = (Σ_dim qy·cs) / n — the
    // decimal-sum → double cast path the oracle mirrors in HUGEINT
    val numRows = cb.join(qComps, Seq("dim"))
      .groupBy(col("qid"), col("sub"), col("label"), col("n"))
      .agg(sum(col("qy").cast("decimal(38,0)") * col("cs"))
        .as("dot"))
      .select(col("qid"), col("sub"), col("label"),
        (col("dot").cast("double") / col("n").cast("double"))
          .as("t"))
      .collect()
    // norm LUT: w(sub, label) = (Σ_dim cs²) / n² = |ĉ_sub|²
    val normRows = cb
      .groupBy(col("sub"), col("label"), col("n"))
      .agg(sum(col("cs").cast("decimal(38,0)") * col("cs"))
        .as("ss"))
      .select(col("sub"), col("label"),
        (col("ss").cast("double") /
          (col("n").cast("double") * col("n").cast("double")))
          .as("w"))
      .collect()
    // integer LUT keys — the per-row lookup is pure long arithmetic
    // (no string allocation in the serving hot loop): inner key
    // sub·ksubN + label < K = m·ksubN, outer key qid·K + inner.
    // ksubN is taken from the codebooks actually present, and the
    // collected qids are bounds-checked so qid·K can never overflow
    // (fails loudly at LUT-build time, not wrongly per row).
    val ksubN = (normRows.map(_.getLong(1)) :+ 0L).max + 1L
    val kSpan = m.toLong * ksubN
    numRows.foreach { r =>
      val qid = r.getLong(0)
      require(math.abs(qid) < (Long.MaxValue - kSpan) / kSpan,
        s"qid $qid too large for integer LUT keys (m=$m ksub=$ksubN)")
    }
    val numLit = typedLit(numRows.map(r =>
      (r.getLong(0) * kSpan + r.getLong(1) * ksubN + r.getLong(2)) ->
        r.getDouble(3)).toMap)
    val normLit = typedLit(normRows.map(r =>
      (r.getLong(0) * ksubN + r.getLong(1)) -> r.getDouble(2)).toMap)
    def code(s: Int): Column =
      element_at(col("codes"), s + 1).cast("long")
    val numTerms = (0 until m).map(s => element_at(numLit,
      col("qid").cast("long") * lit(kSpan) +
        (lit(s.toLong * ksubN) + code(s))))
    val normTerms = (0 until m).map(s => element_at(normLit,
      lit(s.toLong * ksubN) + code(s)))
    numTerms.reduceLeft(_ + _) / sqrt(normTerms.reduceLeft(_ + _))
  }

  /** Per-query ADC top-k over a scored (qid, id, codes) frame:
    * self excluded, ties by vec_id, rank ≤ k.
    *
    * Two-stage SALTED top-k — the corpus-sized window is partitioned
    * by (qid, hash(id) mod [[AdcRankSalts]]), so no single task ever
    * sorts a query's full candidate set (for the exhaustive ADC scan
    * that set is the whole code table; for IVF+PQ a hot probed cell).
    * Stage 1 keeps ≤ k rows per salt in parallel; stage 2 ranks the
    * surviving ≤ k·salts rows per query. Output is IDENTICAL to the
    * single-window formulation: the order (score desc, id asc) is
    * total, so any row in the global top-k has fewer than k rows
    * above it overall — hence fewer than k in its own salt group —
    * and survives stage 1 (spec-pinned salted == unsalted).
    */
  private[graft] val AdcRankSalts = 32
  private[graft] def adcRank(cands: DataFrame, score: Column,
                             k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Seq(col("__adc").desc, col("id").asc_nulls_first)
    val wSalt = Window.partitionBy(col("qid"), col("__salt"))
      .orderBy(ord: _*)
    val wk = Window.partitionBy(col("qid")).orderBy(ord: _*)
    cands
      .where(col("id") =!= col("qid"))
      .withColumn("__adc", score)
      .withColumn("__salt",
        pmod(Sampling.hash32(col("id")), lit(AdcRankSalts.toLong)))
      .withColumn("__prank", row_number().over(wSalt))
      .where(col("__prank") <= k)
      .withColumn("rank", row_number().over(wk).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid"), col("id").as("vec_id"), col("rank"))
      .orderBy(col("qid").asc_nulls_first, col("rank").asc_nulls_first)
  }

  /** One-call embedding-level deduplication — the cosine twin of
    * [[graft.operators.Dedup.deduplicate]]: LSH-bucketed near-dup
    * pairs at `threshold` ([[cosineNearDupPairs]] — bucket count
    * scales with n, hot buckets dropped), connected components over
    * the pair graph, keep the smallest id per cluster, anti-join the
    * drop list. Returns the deduplicated frame with its original
    * schema; singletons pass through untouched. Completes the
    * one-call family: exact (`Dedup.deduplicate`'s fingerprint
    * pass), text near-dup (LSH+verify), and embedding near-dup all
    * share the same clusters→representative→anti-join tail.
    */
  def deduplicateEmbeddings(df: DataFrame, idCol: String,
                            vecCol: String, threshold: Double = 0.8,
                            targetPerBucket: Long = 128L,
                            maxBucketSize: Long = 10000L,
                            maxIter: Int = 25): DataFrame = {
    val pairs = cosineNearDupPairs(df, idCol, vecCol, threshold,
      targetPerBucket, maxBucketSize)
    val labels = graft.operators.Dedup.connectedComponents(
      pairs.select(col("id1"), col("id2")), maxIter)
    val drops = graft.operators.Dedup.dedupDropList(labels)
      .withColumnRenamed("id", "__drop_id")
    df.join(drops, col(idCol) === col("__drop_id"), "left_anti")
  }

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", 2023): k-means
    * cluster the embedding space, then find near-duplicates ONLY
    * within each cluster — the cluster assignment replaces LSH
    * bucketing as the candidate generator, cutting the pair space by
    * ~k while targeting SEMANTIC duplicates (paraphrases, templated
    * rewrites) that exact/minhash dedup cannot see. Cross-cluster
    * near-dups are the algorithm's accepted miss, exactly as
    * published.
    *
    * 100 TB shape: clustering is [[kmeansLabels]] (exact integer
    * centroid sums, broadcast joins, deterministic); the candidate
    * join keys on the cluster label after ONE repartition; pair
    * volume Σ c·(c−1)/2 over cluster sizes is priced pre-flight and
    * REFUSED past `maxPairRows` (at real scale k scales with corpus
    * size to keep clusters at ~10³–10⁴ vectors, and the refusal
    * names exactly that knob); components collapse via the bounded
    * [[graft.operators.Dedup.connectedComponents]] and every
    * component keeps its minimum id.
    *
    * Returns the KEPT rows of `df` (same schema), like
    * [[deduplicateEmbeddings]].
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               k: Int, iters: Int = 2, threshold: Double = 0.8,
               maxPairRows: Long = 2000000000L,
               maxIter: Int = 25): DataFrame = {
    // iters = 0 would label only the k seed rows, silently exempting
    // everything else from dedup consideration
    require(iters >= 1, s"semDedup needs iters >= 1: $iters")
    val labels = kmeansLabels(df, idCol, vecCol, k, iters)
      .select(col("id"), col("label"))
    val prepped = df.select(col(idCol).as("id"),
        col(vecCol).as("v"),
        dotQ(col(vecCol), col(vecCol)).as("n2"))
      .join(labels, Seq("id"))
      .repartition(col("label"))
    val priced = prepped.groupBy(col("label"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(expr("CAST(c * (c - 1) DIV 2 AS DECIMAL(38,0))"))
        .as("pair_rows"))
      .first().getDecimal(0)
    if (priced != null && priced.compareTo(
        java.math.BigDecimal.valueOf(maxPairRows)) > 0)
      throw new IllegalStateException(
        s"semDedup: within-cluster self-join would materialize " +
        s"$priced pair rows (> budget $maxPairRows). Raise k so " +
        "clusters shrink (SemDeDup scales k with corpus size), or " +
        "raise maxPairRows explicitly.")
    val a = prepped.as("a")
    val b = prepped.as("b")
    val dot = dotQ(col("a.v"), col("b.v"))
    val pairs = a.join(b, col("a.label") === col("b.label") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (dot.cast("double") /
          (sqrt(col("a.n2").cast("double")) *
           sqrt(col("b.n2").cast("double")))).as("cosine"))
      .where(col("cosine") >= threshold)
    val comps = graft.operators.Dedup.connectedComponents(
      pairs.select(col("id1"), col("id2")), maxIter)
    val drops = graft.operators.Dedup.dedupDropList(comps)
      .withColumnRenamed("id", "__drop_id")
    df.join(drops, col(idCol) === col("__drop_id"), "left_anti")
  }

  /** A persisted PQ index: the (id, codes) word table and the
    * (sub, label, dim, cs, n) codebooks — everything [[pqTopKAdc]] /
    * [[ivfPqTopK]] need, so serving never re-trains or re-reads
    * float arrays. The codes table is m small ints per vector (the
    * compressed corpus); the codebook table is m·ksub·(d/m) slim
    * rows regardless of corpus size.
    */
  final case class PqIndex(codes: DataFrame, codebooks: DataFrame)

  /** Train and assemble the PQ index in one call. */
  def buildPqIndex(df: DataFrame, idCol: String, vecCol: String,
                   dims: Int, m: Int, ksub: Int,
                   iters: Int = 2): PqIndex = {
    val assign = pqAssign(df, idCol, vecCol, dims, m, ksub, iters)
    PqIndex(pqCodes(assign),
      pqCodebooks(df, idCol, vecCol, dims, m, assign))
  }

  /** Persist both PQ tables (overwrite). */
  def writePqIndex(index: PqIndex, path: String): Unit = {
    index.codes.write.mode("overwrite").parquet(s"$path/codes")
    index.codebooks.write.mode("overwrite")
      .parquet(s"$path/codebooks")
  }

  /** Reload a persisted PQ index for serving. */
  def readPqIndex(spark: org.apache.spark.sql.SparkSession,
                  path: String): PqIndex =
    PqIndex(spark.read.parquet(s"$path/codes"),
      spark.read.parquet(s"$path/codebooks"))

  /** PQ-encode a batch against FROZEN codebooks (no training): per
    * subspace, the code is the argmax-cosine codebook centroid —
    * the same exact-integer scoring as [[pqAssign]]'s Lloyd step,
    * against the persisted (sub, label, dim, cs) sums (cosine is
    * scale-invariant, so the sums serve as centroids directly).
    * Returns assignment rows (id, sub, label); collapse with
    * [[pqCodes]].
    *
    * Shape: the codebook frame is m·ksub·(d/m) rows independent of
    * corpus size — both joins broadcast, so encoding N vectors is a
    * map-side O(N·ksub·d) scoring pass and one per-(id, sub)
    * argmax. This is the serving-time encoder AND the incremental
    * append path's workhorse.
    */
  def pqEncodeWith(delta: DataFrame, idCol: String, vecCol: String,
                   dims: Int, m: Int,
                   codebooks: DataFrame): DataFrame = {
    require(m > 0 && dims % m == 0,
      s"dims must split evenly into m subspaces: dims=$dims m=$m")
    val dsub = dims / m
    // the codebook is m·ksub·(d/m) slim rows by contract — collect
    // it once and encode as ONE in-row argmax projection
    // (lloyd_argmax: exact integer dots, same double scores and
    // label-asc tie-breaks as the join+window spelling it replaces;
    // the old shape paid a posexplode, two broadcast joins, a
    // corpus-sized partial aggregation and a keyed window per batch)
    val rows = codebooks.select(col("sub"), col("label"),
      col("dim"), col("cs")).collect()
    val table = centroidTableOf(rows, m, dsub, hasSub = true)
    delta.select(col(idCol).as("id"),
        graft.functions.PushdownBarrierExpr.barrier(graft.functions.LloydArgmaxExpr
          .column(col(vecCol), table)).as("__lab"))
      .where(col("__lab").isNotNull)
      .select(col("id"), posexplode(col("__lab"))
        .as(Seq("sub", "label")))
      .select(col("id"), col("sub").cast("long").as("sub"),
        col("label"))
  }

  /** Per-dimension embedding census — the normalization-prep /
    * feature-QA pass every embedding pipeline runs before indexing:
    * for each dimension, the count, the non-finite count (NaN/±Inf
    * — encoder bugs surface here), and the exact quantized L1 mass
    * + min/max (the scaling envelope). One posexplode + one keyed
    * aggregation with map-side partials; nothing else shuffles.
    */
  def dimStats(df: DataFrame, vecCol: String): DataFrame = {
    val bad = isnan(col("x").cast("double")) ||
      abs(col("x").cast("double")) > 1e30
    df.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"),
        quant25(col("x")).as("qx"), bad.as("bad"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("bad"), 1L).otherwise(0L)).as("n_bad"),
        sum(when(col("bad"), 0L).otherwise(abs(col("qx"))))
          .cast("long").as("l1_q"),
        min(when(!col("bad"), col("qx"))).as("min_q"),
        max(when(!col("bad"), col("qx"))).as("max_q"))
      .orderBy(col("dim").asc_nulls_first)
  }

  /** Matryoshka-truncation retrieval evaluation (Kusupati et al.,
    * "Matryoshka Representation Learning", NeurIPS 2022): for a
    * sampled probe set, the top-k neighbor overlap between FULL-dim
    * cosine ranking and PREFIX-dim ranking — the recall@k a team
    * measures before deploying truncated embeddings (the modern
    * cheap-serving trick). Dots are the exact quantized integers of
    * [[dotQ]]; ranking is cosine with id tie-break (the q28
    * discipline), so both engines rank identically.
    *
    * Shape at 100 TB: this is an EVAL harness, run over a sampled
    * probe set — probes broadcast, the corpus streams ONCE computing
    * both dot products in one projection, and the two rankings share
    * one hash exchange on the probe key (two sorts over it). Never
    * run un-probed: the candidate volume is n · |probes| by design.
    */
  def matryoshkaOverlap(df: DataFrame, idCol: String, vecCol: String,
                        prefixDims: Int, k: Int,
                        probeEvery: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(prefixDims >= 1 && k >= 1 && probeEvery >= 1)
    val probes = df.where(col(idCol) % probeEvery === 0)
      .select(col(idCol).as("pid"), col(vecCol).as("__qv"))
    val pPre = slice(col("__qv"), 1, prefixDims)
    val cPre = slice(col("__cv"), 1, prefixDims)
    val scored = df
      .select(col(idCol).as("cid"), col(vecCol).as("__cv"))
      .crossJoin(broadcast(probes))
      .where(col("cid") =!= col("pid"))
      .select(col("pid"), col("cid"),
        dotQ(col("__cv"), col("__qv")).as("dot_full"),
        dotQ(cPre, pPre).as("dot_pre"),
        (dotQ(col("__cv"), col("__qv")).cast("double") /
          (sqrt(dotQ(col("__cv"), col("__cv")).cast("double")) *
            sqrt(dotQ(col("__qv"), col("__qv")).cast("double"))))
          .as("__cosf"),
        (dotQ(cPre, pPre).cast("double") /
          (sqrt(dotQ(cPre, cPre).cast("double")) *
            sqrt(dotQ(pPre, pPre).cast("double")))).as("__cosp"))
    val wf = Window.partitionBy(col("pid"))
      .orderBy(col("__cosf").desc, col("cid").asc_nulls_first)
    val wp = Window.partitionBy(col("pid"))
      .orderBy(col("__cosp").desc, col("cid").asc_nulls_first)
    scored
      .withColumn("rf", row_number().over(wf))
      .withColumn("rp", row_number().over(wp))
      .where(col("rf") <= k || col("rp") <= k)
      .groupBy(col("pid"))
      .agg(count(when(col("rf") <= k && col("rp") <= k, 1))
          .as("overlap"),
        min(when(col("rf") === 1, col("cid"))).as("top1_full"),
        min(when(col("rp") === 1, col("cid"))).as("top1_prefix"))
      .orderBy(col("pid").asc_nulls_first)
  }

  /** Embedding-space outlier census — the "find the garbage in the
    * corpus" pass (mojibake, binary-in-text, wrong-domain vectors
    * sit far from every cluster): k-means cells, each vector's
    * squared distance to its cell's ROUNDED integer centroid
    * ([[ivfRoundedCentroids]]' grid — residual-range discipline),
    * and a per-cell flag `d2 · n > (num/den) · Σd2` (distance² over
    * num/den × the cell mean, exact integer cross-multiplication in
    * decimal(38,0) — no float thresholds). Returns per cell:
    * (cell, n_vectors, n_outliers, max_d2).
    *
    * Shape: one components pass joined to broadcast labels+centroids
    * frames, one per-cell aggregate, one broadcast-back flag pass —
    * nothing shuffles beyond the k-means training itself.
    */
  def outlierCensus(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int = 2, num: Long = 4L,
                    den: Long = 1L): DataFrame = {
    require(num > 0 && den > 0, s"threshold num/den > 0: $num/$den")
    val ivf = buildIvfIndex(df, idCol, vecCol, k, iters)
    val mu = ivfRoundedCentroids(ivf.labels, ivf.centroids)
    val comps = df.select(col(idCol).as("id"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("id"), col("dim"), quant25(col("x")).as("qx"))
    val diff = (col("qx") - col("mu")).cast("decimal(38,0)")
    val d2 = comps
      .join(ivf.labels.select(col("id"), col("label").as("cell")),
        Seq("id"))
      .join(broadcast(mu), Seq("cell", "dim"))
      .groupBy(col("id"), col("cell"))
      .agg(sum(diff * diff).as("d2"))
    val stats = d2.groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("d2")).as("sum_d2"),
        max(col("d2")).as("max_d2"))
    d2.join(broadcast(stats), Seq("cell"))
      .withColumn("is_out",
        col("d2") * col("n") * lit(den) > col("sum_d2") * lit(num))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"),
        max(col("d2")).cast("long").as("max_d2"))
      .orderBy(col("cell").asc_nulls_first)
  }

  /** Index staleness census — the "when do we retrain" monitor that
    * pairs with [[appendToIvfPq]]: per IVF cell, the exact quantized
    * distance² of the INDEXED vectors to the cell's rounded centroid
    * versus the same for an incoming DELTA batch (coarse-assigned
    * with the frozen centroids, like the append path). A cell
    * drifts when the delta's mean d2 exceeds `num/den` × the indexed
    * mean d2 — integer cross-multiplication over decimal sums, no
    * float thresholds. Returns per cell:
    * (cell, n_old, n_delta, max_d2_delta, drift).
    *
    * Shape: the index side is scored once against broadcast
    * centroid frames; the delta side is delta-sized. Empty cells on
    * either side report drift = false (nothing to compare).
    */
  def indexDriftCensus(old: DataFrame, delta: DataFrame,
                       idCol: String, vecCol: String, k: Int,
                       iters: Int = 2, num: Long = 2L,
                       den: Long = 1L): DataFrame = {
    require(num > 0 && den > 0, s"threshold num/den > 0: $num/$den")
    val ivf = buildIvfIndex(old, idCol, vecCol, k, iters)
    val mu = ivfRoundedCentroids(ivf.labels, ivf.centroids)
    def comps(df: DataFrame) = df
      .select(col(idCol).as("id"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("id"), col("dim"), quant25(col("x")).as("qx"))
    val diff = (col("qx") - col("mu")).cast("decimal(38,0)")
    def d2Of(assigned: DataFrame, df: DataFrame) = comps(df)
      .join(assigned, Seq("id"))
      .join(broadcast(mu), Seq("cell", "dim"))
      .groupBy(col("id"), col("cell"))
      .agg(sum(diff * diff).as("d2"))
    val oldAssign = ivf.labels
      .select(col("id"), col("label").as("cell"))
    val deltaAssign = ivfProbes(ivf.centroids, delta, idCol, vecCol,
        nprobe = 1)
      .select(col("qid").as("id"), col("label").as("cell"))
    val oldStats = d2Of(oldAssign, old).groupBy(col("cell"))
      .agg(count(lit(1)).as("n_old"), sum(col("d2")).as("s_old"))
    // report max d2 clamped to the BIGINT range: an adversarial
    // vector (quantized components past ~2^31) can push a single
    // d2 beyond 2^63, and a census must never throw on bad data —
    // the drift comparison itself stays in unclamped decimals
    val deltaStats = d2Of(deltaAssign, delta).groupBy(col("cell"))
      .agg(count(lit(1)).as("n_delta"),
        sum(col("d2")).as("s_delta"),
        least(max(col("d2")),
          lit(Long.MaxValue).cast("decimal(38,0)"))
          .cast("long").as("max_d2_delta"))
    oldStats.join(deltaStats, Seq("cell"), "full_outer")
      .select(col("cell"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_delta"), lit(0L)).as("n_delta"),
        coalesce(col("max_d2_delta"), lit(0L)).as("max_d2_delta"),
        coalesce(
          col("s_delta") * col("n_old") * lit(den) >
            col("s_old") * col("n_delta") * lit(num),
          lit(false)).as("drift"))
      .orderBy(col("cell").asc_nulls_first)
  }

  /** Maximal-marginal-relevance top-k (Carbonell & Goldstein, SIGIR
    * '98) at λ = 1/2, in exact integers end to end: relevance is the
    * quantized inner product with the single query row, and each
    * greedy step selects argmax of `rel − max sim-to-selected` (at
    * λ = 1/2 the MMR objective is that integer difference scaled by
    * 2 — no floats anywhere), ties id-asc. Returns one row per
    * selection: (step, id, rel, penalty, score).
    *
    * Shape at 100 TB: ONE distributed scoring pass + TakeOrdered
    * bounds the candidates to a constant-size frame (candN rows);
    * the candN² pairwise sims and the k-step greedy then run over
    * that constant — the broadcast-LUT pattern (bounded driver math
    * over a corpus-size-independent frame), never a corpus×corpus
    * join. The greedy is inherently sequential, which is exactly why
    * it must only ever see a bounded candidate set.
    */
  def mmrTopK(df: DataFrame, idCol: String, vecCol: String,
              query: DataFrame, qidCol: String, qvecCol: String,
              candN: Int = 20, k: Int = 6): DataFrame = {
    require(candN > 0 && candN <= 10000,
      s"candN bounds the driver-side frame; got $candN")
    require(k > 0 && k <= candN, s"need 0 < k <= candN: $k/$candN")
    val spark = df.sparkSession
    val qq = query
      .select(col(qidCol).as("qid"),
        posexplode(col(qvecCol)).as(Seq("dim", "x")))
      .select(col("qid"), col("dim"), quant25(col("x")).as("qy"))
    val comps = df.select(col(idCol).as("id"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("id"), col("dim"), quant25(col("x")).as("qx"))
    val candRows = comps.join(broadcast(qq), Seq("dim"))
      .where(col("id") =!= col("qid"))
      .groupBy(col("id"))
      .agg(sum(col("qx").cast("decimal(38,0)") * col("qy"))
        .as("relD"))
      .select(col("id"), col("relD").cast("long").as("rel"))
      .orderBy(col("rel").desc, col("id").asc_nulls_first)
      .limit(candN)
      .collect()
    val candIds = candRows.map(_.getLong(0)).toSeq
    val relMap = candRows.map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val cc = comps.where(col("id").isin(candIds: _*))
    val simMap = cc.as("a").join(broadcast(cc.as("b")),
        col("a.dim") === col("b.dim") && col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(sum(col("a.qx").cast("decimal(38,0)") * col("b.qx"))
        .cast("long").as("sim"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long)]
    for (step <- 1 to math.min(k, candIds.length)) {
      val scored = candIds.filterNot(selected.contains).map { c =>
        val pen =
          if (selected.isEmpty) 0L
          else selected.map(s => simMap.getOrElse((c, s), 0L)).max
        (c, relMap(c), pen, relMap(c) - pen)
      }
      val (id, rel, pen, score) =
        scored.minBy { case (c, _, _, sc) => (-sc, c) }
      selected += id
      out += ((step.toLong, id, rel, pen, score))
    }
    import spark.implicits._
    out.toSeq.toDF("step", "id", "rel", "penalty", "score")
  }

  /** Incremental index maintenance: place a DELTA batch into an
    * EXISTING IVF+PQ index without retraining and without touching
    * the stored corpus — coarse-assign each new vector to its
    * nearest frozen IVF centroid (exact-integer cosine, label-asc
    * ties) and PQ-encode it with [[pqEncodeWith]]. Returns the
    * delta's (id, label) IVF rows and (id, codes) words, union-ready
    * with the persisted tables ([[writeIvfIndex]]/[[writePqIndex]]
    * in append mode at the storage layer). Cost is delta-sized ×
    * broadcast centroid frames — a 100 TB index absorbs a daily
    * batch at the batch's scan cost, with periodic retrains only
    * when drift census (q100-style) says the centroids went stale.
    */
  def appendToIvfPq(delta: DataFrame, idCol: String, vecCol: String,
                    dims: Int, m: Int, ivfCentroids: DataFrame,
                    codebooks: DataFrame): (DataFrame, DataFrame) = {
    val labels = ivfProbes(ivfCentroids, delta, idCol, vecCol,
        nprobe = 1)
      .select(col("qid").as("id"), col("label"))
    val codes = pqCodes(
      pqEncodeWith(delta, idCol, vecCol, dims, m, codebooks))
    (labels, codes)
  }

  /** IVF + PQ — the production ANN serving composition at 100 TB:
    * the corpus lives as PQ code words partitioned by IVF cell, a
    * query scores the (slim, prebuilt) centroid table to pick its
    * `nprobe` cells, and the ADC projection scans ONLY the probed
    * cells' codes — sublinear candidates × 2m-lookup scoring, no
    * float array ever read at query time. (Codes here encode the raw
    * vectors, not centroid residuals — the residual-free IVFPQ
    * variant; with label-partitioned storage the probe join becomes
    * partition pruning.)
    *
    * Determinism composes from the pieces: probes use the exact
    * integer centroid sums and label tie-breaks of [[ivfTopKBatch]];
    * scoring uses [[pqTopKAdc]]'s fixed-order LUT doubles — so
    * results hash-match the SQL oracle, and with nprobe ≥ the cell
    * count this is EXACTLY [[pqTopKAdc]] (spec-pinned).
    */
  def ivfPqTopK(codes: DataFrame, codebooks: DataFrame,
                ivfLabels: DataFrame, ivfCentroids: DataFrame,
                queries: DataFrame, qidCol: String, qvecCol: String,
                dims: Int, m: Int, k: Int, nprobe: Int): DataFrame = {
    require(m > 0 && dims % m == 0,
      s"dims must split evenly into m subspaces: dims=$dims m=$m")
    require(nprobe > 0, s"nprobe must be > 0: $nprobe")
    val probes = ivfProbes(ivfCentroids, queries, qidCol, qvecCol,
      nprobe)
    val score = adcScore(codebooks, queries, qidCol, qvecCol, m)
    val cands = codes.join(ivfLabels, Seq("id"))
      .join(broadcast(probes), Seq("label"))
    adcRank(cands, score, k)
  }

  /** The (qid, label) probe list: each query's `nprobe` best IVF
    * cells by exact-integer centroid cosine, label-asc tie-breaks —
    * [[ivfTopKBatch]]'s probe scoring, shared by both IVF+PQ serving
    * paths.
    */
  private def ivfProbes(ivfCentroids: DataFrame, queries: DataFrame,
                        qidCol: String, qvecCol: String,
                        nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quant = quant25 _
    // nprobe = 1 IS the Lloyd argmax (same scoring, same label-asc
    // tie-break): collect the k·d centroid table once and probe as a
    // pure projection — the coarse-assignment shape the append and
    // drift paths run per delta batch
    if (nprobe == 1) {
      val rows = ivfCentroids
        .select(col("label"), col("dim"), col("s")).collect()
      val table = centroidTableOf(rows, m = 1, dsub = Int.MaxValue,
        hasSub = false)
      return queries.select(col(qidCol).as("qid"),
          graft.functions.PushdownBarrierExpr.barrier(element_at(graft.functions.LloydArgmaxExpr
            .column(col(qvecCol), table), 1)).as("label"))
        .where(col("label").isNotNull)
    }
    val qComps = queries.select(col(qidCol).as("qid"),
        posexplode(col(qvecCol)).as(Seq("dim", "x")))
      .select(col("qid"), col("dim"), quant(col("x")).as("qy"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("__sc").desc, col("label").asc_nulls_first)
    ivfCentroids.join(broadcast(qComps), Seq("dim"))
      .groupBy(col("qid"), col("label"))
      .agg(sum(col("s").cast("decimal(38,0)") * col("qy"))
          .as("dot_c"),
        sum(col("s").cast("decimal(38,0)") * col("s")).as("s2"))
      .select(col("qid"), col("label"),
        (col("dot_c").cast("double") /
          sqrt(col("s2").cast("double"))).as("__sc"))
      .withColumn("rn", row_number().over(wq))
      .where(col("rn") <= nprobe)
      .select(col("qid"), col("label"))
  }

  // ---- residual IVFPQ (Jégou et al., TPAMI'11 §IV: encode the
  // ---- residual x − c(x) against the coarse centroid, not x) ------

  /** Per-cell ROUNDED integer centroids: mu(cell, dim) =
    * round-half-away-from-zero(s / n) on the same 2^25 quantization
    * grid as the vectors. Rounding to the grid keeps residuals
    * y = qx − mu in the SAME ~2^26 integer range as the raw
    * components — so every downstream product fits the existing
    * decimal(38,0) discipline at any corpus size (an unrounded
    * rational centroid would scale products by the cell count), and
    * the formula is pure integer arithmetic ((2|s| + n) div (2n),
    * sign restored), reproducible verbatim in the SQL oracle.
    */
  private[graft] def ivfRoundedCentroids(ivfLabels: DataFrame,
      ivfCentroids: DataFrame): DataFrame = {
    val counts = ivfLabels.groupBy(col("label").as("cell"))
      .agg(count(lit(1)).as("n"))
    ivfCentroids.select(col("label").as("cell"), col("dim"),
        col("s"))
      .join(broadcast(counts), Seq("cell"))
      .select(col("cell"), col("dim"),
        expr("CASE WHEN s >= 0 THEN (2*s + n) div (2*n) " +
          "ELSE -((-2*s + n) div (2*n)) END").as("mu"))
  }

  /** Residual components (id, cell, sub, dim, y): y = qx − mu, the
    * integer residual of each component against its cell's rounded
    * centroid.
    */
  private def residualComps(df: DataFrame, idCol: String,
      vecCol: String, dims: Int, m: Int, ivfLabels: DataFrame,
      ivfCentroids: DataFrame): DataFrame = {
    val dsub = dims / m
    val quant = quant25 _
    val mu = ivfRoundedCentroids(ivfLabels, ivfCentroids)
    df.select(col(idCol).as("id"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("id"), expr(s"CAST(dim div $dsub AS BIGINT)")
        .as("sub"), col("dim"), quant(col("x")).as("qx"))
      .join(ivfLabels.select(col("id"), col("label").as("cell")),
        Seq("id"))
      .join(broadcast(mu), Seq("cell", "dim"))
      .select(col("id"), col("cell"), col("sub"), col("dim"),
        (col("qx") - col("mu")).as("y"))
  }

  /** Residual PQ training — [[pqAssign]] run on residuals with
    * PER-CELL codebooks (the "local codebook" IVFPQ variant): each
    * IVF cell trains its own ksub residual clusters per subspace, all
    * cells and subspaces in the SAME distributed jobs (cell and sub
    * ride the grouping keys — never a per-cell loop, exactly like
    * [[kmeansLabelsHierarchical]]'s refinement). Seeds are the ksub
    * hash-smallest ids PER CELL; centroid sums are exact integers;
    * argmax ties break label-asc; iterations are fixed-count — the
    * whole recurrence unrolls into the SQL oracle.
    *
    * Why residuals: a raw-vector codebook spends its ksub codes
    * spanning the whole space; after IVF, every vector in a cell
    * shares the cell centroid, so coding x − c(x) spends the same
    * bits on the (much smaller) within-cell spread — the recall gap
    * RecallSpec measures. Returns (id, sub, label); compose with
    * [[pqCodes]] for the stored words.
    */
  def pqAssignResidual(df: DataFrame, idCol: String, vecCol: String,
                       dims: Int, m: Int, ksub: Int,
                       ivfLabels: DataFrame, ivfCentroids: DataFrame,
                       iters: Int = 2): DataFrame = {
    require(m > 0 && dims % m == 0,
      s"dims must split evenly into m subspaces: dims=$dims m=$m")
    require(ksub > 0 && iters >= 0,
      s"need ksub > 0, iters >= 0: $ksub/$iters")
    import org.apache.spark.sql.expressions.Window
    import graft.functions.LloydArgmaxExpr
    import scala.jdk.CollectionConverters._
    val dsub = dims / m
    val quant = quant25 _
    val spark = df.sparkSession
    val idType = df.schema(idCol).dataType
    val cells = ivfLabels.select(col("id"), col("label").as("cell"))
    val hashOrder = Seq(Sampling.hash32(col("id")).asc,
      col("id").asc_nulls_first)
    // per-cell seeds: the ksub hash-smallest ids of each cell,
    // COLLECTED (k·ksub slim rows, one action)
    val wseed = Window.partitionBy(col("cell")).orderBy(hashOrder: _*)
    val seedRows = cells
      .withColumn("__rn", row_number().over(wseed))
      .where(col("__rn") <= ksub)
      .select(col("id"), col("cell"),
        (col("__rn") - 1).cast("long").as("label"))
      .collect()
    if (iters == 0)
      return spark.createDataFrame(
        seedRows.toSeq.flatMap(r => (0 until m).map(s =>
          org.apache.spark.sql.Row(r.get(0), s.toLong,
            r.getLong(2)))).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", idType),
          org.apache.spark.sql.types.StructField("sub",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("label",
            org.apache.spark.sql.types.LongType, nullable = false))))
    // rounded cell centroids, driver-side: the ivfRoundedCentroids
    // arithmetic ((2s + n) div (2n), sign restored — exact integers)
    // over the collected coarse sums and one tiny per-cell count
    // aggregate. `mu` feeds the per-iteration aggregation as a local
    // broadcast frame AND the in-row argmax as a lookup table.
    val centRows = ivfCentroids
      .select(col("label").as("cell"), col("dim"), col("s"))
      .collect()
    val countMap = ivfLabels.groupBy(col("label").as("cell"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val muTriples = centRows.flatMap { r =>
      val cell = r.getLong(0)
      countMap.get(cell).map { n =>
        val s = BigInt(r.getLong(2))
        val nB = BigInt(n)
        val mu =
          if (s >= 0) (2 * s + nB) / (2 * nB)
          else -((-2 * s + nB) / (2 * nB))
        (cell, r.getInt(1), mu.toLong)
      }
    }
    val muMap: Map[Long, Array[Long]] = muTriples
      .groupBy(_._1).map { case (cell, ts) =>
        val arr = Array.fill(ts.map(_._2).max + 1)(Long.MinValue)
        ts.foreach { case (_, d, v) => arr(d) = v }
        cell -> arr
      }
    val muF = spark.createDataFrame(
      muTriples.toSeq.map(t =>
        org.apache.spark.sql.Row(t._1, t._2, t._3)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("dim",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("mu",
          org.apache.spark.sql.types.LongType, nullable = false))))
    def residualTableOf(rows: Array[org.apache.spark.sql.Row])
        : LloydArgmaxExpr.ResidualTable = {
      import LloydArgmaxExpr.{ResidualTable, SubTable}
      val byCell = rows.groupBy(_.getLong(0))
      ResidualTable(m, dsub, byCell.map { case (cell, cr) =>
        val bySub = cr.groupBy(_.getLong(1))
        val subs = (0 until m).map { s =>
          val byLabel = bySub.getOrElse(s.toLong,
              Array.empty[org.apache.spark.sql.Row])
            .groupBy(_.getLong(2))
          val labels = byLabel.keys.toArray.sorted
          val dimsA = labels.map(l => byLabel(l)
            .map(_.getInt(3)).toArray)
          val zs = labels.map(l => byLabel(l)
            .map(_.getLong(4)).toArray)
          // s2 = 0 marks the NULL-score (zero-norm) candidate; any
          // non-zero Σ zs² converts exactly like decimal → double
          val s2 = labels.map { l =>
            val v = byLabel(l).iterator
              .map(r => BigInt(r.getLong(4))).map(x => x * x).sum
            new java.math.BigDecimal(v.bigInteger).doubleValue
          }
          SubTable(labels, dimsA, zs, s2)
        }.toArray
        cell -> ((muMap.getOrElse(cell, Array.empty[Long]), subs))
      })
    }
    // ONE aggregation action per iteration (the pqAssign shape, with
    // the cell joined from the checkpointed coarse assignment and
    // y = qx − mu via the local mu frame). A zero-norm residual
    // cluster (every member exactly on the rounded cell centroid —
    // routine for near-duplicate cells) has no cosine direction:
    // its score is NULL and ranks below every defined score (NULLS
    // LAST, then label-asc — in a fully-pure cell all scores are
    // NULL and label 0 wins, whose centroid is the exact shared
    // residual, so reconstruction stays exact). The oracle mirrors
    // the CASE; the in-row argmax replicates it bit-for-bit.
    val subCol = expr(s"CAST(dim div $dsub AS BIGINT)")
    var table: LloydArgmaxExpr.ResidualTable = null
    for (i <- 0 until iters) {
      val base = df.select(col(idCol).as("id"),
          col(vecCol).as("__v"))
        .join(cells, Seq("id"))
      val labCol: Column =
        if (i == 0)
          seedRows.foldLeft(lit(null).cast("long")) { (acc, r) =>
            when(col("id") === lit(r.get(0)), lit(r.getLong(2)))
              .otherwise(acc)
          }
        else graft.functions.PushdownBarrierExpr.barrier(LloydArgmaxExpr.residualColumn(col("__v"),
          col("cell"), table))
      val rows = base
        .select(col("cell"), labCol.as("__lab"),
          posexplode(col("__v")).as(Seq("dim", "x")))
        .where(col("__lab").isNotNull)
        .select(col("cell"), subCol.as("sub"),
          (if (i == 0) col("__lab")
           else element_at(col("__lab"),
             (subCol + 1).cast("int"))).as("label"),
          col("dim"), quant(col("x")).as("qx"))
        .join(broadcast(muF), Seq("cell", "dim"))
        .select(col("cell"), col("sub"), col("label"), col("dim"),
          (col("qx") - col("mu")).as("y"))
        .groupBy(col("cell"), col("sub"), col("label"), col("dim"))
        .agg(sum(col("y")).as("zs"))
        .collect()
      table = residualTableOf(rows)
    }
    // final assignment: one projection over the cell-joined scan,
    // eagerly checkpointed (the kmeansLabels multi-consumer
    // rationale)
    df.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .join(cells, Seq("id"))
      .select(col("id"),
        graft.functions.PushdownBarrierExpr.barrier(LloydArgmaxExpr.residualColumn(col("__v"), col("cell"),
          table)).as("__lab"))
      .where(col("__lab").isNotNull)
      .select(col("id"), posexplode(col("__lab"))
        .as(Seq("sub", "label")))
      .select(col("id"), col("sub").cast("long").as("sub"),
        col("label"))
      .localCheckpoint(true)
  }

  /** Residual codebook table for a trained assignment: per
    * (cell, sub, label, dim) the exact integer residual-centroid sum
    * `zs` and the member count `nm` — k·m·ksub·(d/m) slim rows, the
    * residual analogue of [[pqCodebooks]] (reconstruction is
    * x̂ = mu + ẑ/nm per component; persist alongside the codes and
    * the IVF index).
    */
  def pqCodebooksResidual(df: DataFrame, idCol: String,
      vecCol: String, dims: Int, m: Int, ivfLabels: DataFrame,
      ivfCentroids: DataFrame, assign: DataFrame): DataFrame = {
    require(m > 0 && dims % m == 0,
      s"dims must split evenly into m subspaces: dims=$dims m=$m")
    val comps = residualComps(df, idCol, vecCol, dims, m, ivfLabels,
      ivfCentroids)
    val withCells = comps.join(assign, Seq("id", "sub"))
    val counts = withCells.where(col("dim") % lit(dims / m) === 0)
      .groupBy(col("cell"), col("sub"), col("label"))
      .agg(count(lit(1)).as("nm"))
    withCells
      .groupBy(col("cell"), col("sub"), col("label"), col("dim"))
      .agg(sum(col("y")).as("zs"))
      .join(broadcast(counts), Seq("cell", "sub", "label"))
  }

  /** The residual-ADC score for a (qid, label=cell, codes) candidate
    * frame: per probed (query, cell, subspace, code) the numerator
    * term q·x̂ = (Σ qy·mu) + (Σ qy·zs)/nm and the norm term
    * |x̂|² = (Σ mu²) + 2(Σ mu·zs)/nm + (Σ zs²)/nm² — every sum an
    * exact integer aggregate, one double conversion per term in
    * FIXED order, then the same 2m-lookup broadcast-LUT projection as
    * [[adcScore]] with the cell folded into the integer key.
    */
  private def adcScoreResidual(resBooks: DataFrame, mu: DataFrame,
      probes: DataFrame, queries: DataFrame, qidCol: String,
      qvecCol: String, dims: Int, m: Int): Column = {
    val dsub = dims / m
    val quant = quant25 _
    val qComps = queries.select(col(qidCol).as("qid"),
        posexplode(col(qvecCol)).as(Seq("dim", "x")))
      .select(col("qid"), col("dim"), quant(col("x")).as("qy"))
    // only probed (query, cell) pairs reach the LUTs — the collect
    // is |probes|·m(·ksub) rows, not |queries|·k·m(·ksub)
    val probedQC = broadcast(probes
      .select(col("qid"), col("label").as("cell")))
    val probedCells = broadcast(probes
      .select(col("label").as("cell")).distinct())
    val muSub = mu.join(probedCells, Seq("cell"))
      .select(col("cell"), col("dim"),
        expr(s"CAST(dim div $dsub AS BIGINT)").as("sub"), col("mu"))
    // A(qid, cell, sub) = Σ qy·mu ; C(cell, sub) = Σ mu²
    val aRows = muSub.join(broadcast(qComps), Seq("dim"))
      .join(probedQC, Seq("qid", "cell"))
      .groupBy(col("qid"), col("cell"), col("sub"))
      .agg(sum(col("qy").cast("decimal(38,0)") * col("mu"))
        .as("a"))
      .collect()
    val cRows = muSub.groupBy(col("cell"), col("sub"))
      .agg(sum(col("mu").cast("decimal(38,0)") * col("mu"))
        .as("c"))
      .collect()
    // B(qid, cell, sub, label) = Σ qy·zs ; D = Σ mu·zs ; E = Σ zs²
    val bRows = resBooks.join(probedCells, Seq("cell"))
      .join(broadcast(qComps), Seq("dim"))
      .join(probedQC, Seq("qid", "cell"))
      .groupBy(col("qid"), col("cell"), col("sub"), col("label"),
        col("nm"))
      .agg(sum(col("qy").cast("decimal(38,0)") * col("zs"))
        .as("b"))
      .collect()
    val deRows = resBooks.join(probedCells, Seq("cell"))
      .join(muSub.select(col("cell"), col("dim"), col("mu")),
        Seq("cell", "dim"))
      .groupBy(col("cell"), col("sub"), col("label"), col("nm"))
      .agg(sum(col("mu").cast("decimal(38,0)") * col("zs")).as("d"),
        sum(col("zs").cast("decimal(38,0)") * col("zs")).as("e"))
      .collect()
    val aMap = aRows.map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2)) -> r.getDecimal(3).doubleValue).toMap
    val cMap = cRows.map(r => (r.getLong(0), r.getLong(1)) ->
      r.getDecimal(2).doubleValue).toMap
    // integer LUT keys: inner (cell·m + sub)·ksubN + label, outer
    // qid·kSpan + inner; bounds-checked so the key can never collide
    // or overflow (fails loudly at LUT-build time)
    val ksubN = (bRows.map(_.getLong(3)) :+ 0L).max + 1L
    val cellN = (bRows.map(_.getLong(1)) :+ 0L).max + 1L
    val kSpan = cellN * m.toLong * ksubN
    bRows.foreach { r =>
      val qid = r.getLong(0)
      require(math.abs(qid) < (Long.MaxValue - kSpan) / kSpan,
        s"qid $qid too large for integer LUT keys " +
        s"(cells=$cellN m=$m ksub=$ksubN)")
    }
    def inner(cell: Long, sub: Long, label: Long): Long =
      (cell * m + sub) * ksubN + label
    // t = A + B/nm ; w = C + 2D/nm + E/nm² — fixed operation order,
    // each exact sum converted to double exactly once
    val tLit = typedLit(bRows.map { r =>
      val (qid, cell, sub, label, nm) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      (qid * kSpan + inner(cell, sub, label)) ->
        (aMap((qid, cell, sub)) +
          r.getDecimal(5).doubleValue / nm.toDouble)
    }.toMap)
    val wLit = typedLit(deRows.map { r =>
      val (cell, sub, label, nm) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))
      inner(cell, sub, label) ->
        (cMap((cell, sub)) +
          2.0 * r.getDecimal(4).doubleValue / nm.toDouble +
          r.getDecimal(5).doubleValue / (nm.toDouble * nm.toDouble))
    }.toMap)
    def code(s: Int): Column =
      element_at(col("codes"), s + 1).cast("long")
    def innerCol(s: Int): Column =
      (col("label").cast("long") * lit(m.toLong) + lit(s.toLong)) *
        lit(ksubN) + code(s)
    val numTerms = (0 until m).map(s => element_at(tLit,
      col("qid").cast("long") * lit(kSpan) + innerCol(s)))
    val normTerms = (0 until m).map(s => element_at(wLit,
      innerCol(s)))
    // an all-zero reconstruction (|x̂|² = 0) has no cosine — NULL
    // ranks it below every scored candidate (ANSI-safe: double
    // division by zero raises in Spark 4)
    val den = normTerms.reduceLeft(_ + _)
    when(den === 0, lit(null).cast("double"))
      .otherwise(numTerms.reduceLeft(_ + _) / sqrt(den))
  }

  /** IVF + residual-PQ serving — [[ivfPqTopK]] with the codes
    * produced by [[pqAssignResidual]]: probe `nprobe` cells, score
    * ONLY their code words via the residual reconstruction
    * x̂ = mu + ẑ/nm. Same scale shape as the raw-vector path (pure
    * broadcast-LUT projection over probed codes, no float reads, no
    * join in the scan, salted two-stage rank); the LUT build is
    * restricted to the probed (query, cell) pairs' aggregates —
    * |queries|·k·m·ksub slim rows before the collect, k·m·ksub·(d/m)
    * codebook rows total.
    */
  def ivfPqTopKResidual(codes: DataFrame, resBooks: DataFrame,
      ivfLabels: DataFrame, ivfCentroids: DataFrame,
      queries: DataFrame, qidCol: String, qvecCol: String,
      dims: Int, m: Int, k: Int, nprobe: Int): DataFrame = {
    require(m > 0 && dims % m == 0,
      s"dims must split evenly into m subspaces: dims=$dims m=$m")
    require(nprobe > 0, s"nprobe must be > 0: $nprobe")
    val probes = ivfProbes(ivfCentroids, queries, qidCol, qvecCol,
      nprobe).localCheckpoint(true)
    val mu = ivfRoundedCentroids(ivfLabels, ivfCentroids)
    val score = adcScoreResidual(resBooks, mu, probes, queries,
      qidCol, qvecCol, dims, m)
    val cands = codes
      .join(ivfLabels.select(col("id"), col("label")), Seq("id"))
      .join(broadcast(probes), Seq("label"))
    adcRank(cands, score, k)
  }

  // ---- int8 scalar quantization (per-dimension affine map) --------

  /** Per-dimension quantized min/max over an embedding column — the
    * scalar-quantization "codebook": `(dim, qmn, qmx)` where qmn/qmx
    * are exact round(x·2^25) integers. One pass, one partial-agg
    * shuffle of `dims` rows; the result is codebook-sized (dims ≤ a
    * few thousand) and broadcast to the encode join.
    */
  def sqStats(df: DataFrame, vecCol: String): DataFrame = {
    val quant = quant25 _
    df.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"),
        quant(col("x")).as("qx"))
      .groupBy(col("dim"))
      .agg(min(col("qx")).as("qmn"), max(col("qx")).as("qmx"))
  }

  /** Encode every vector component to an 8-bit code on its
    * dimension's [qmn, qmx] range — 4× smaller than float32 (the
    * memory-bound ANN scan's cheapest win; PQ's 64× sits beyond it
    * on the same axis). All arithmetic is exact BIGINT: with
    * s = qmx − qmn, `code = ⌊(510·(qx−qmn) + s) / (2s)⌋` is
    * round-half-up of 255·(qx−qmn)/s — no float division, so the
    * DuckDB oracle reproduces every code exactly. `bound_ok` pins
    * the quantization error guarantee |255·(qx−qmn) − code·s| ≤ s/2
    * in the same exact integers (×2 to stay integral); constant
    * dimensions (s = 0) encode to 0 with the gate trivially true.
    *
    * Scale shape: one scan of the vectors, `stats` broadcast — no
    * shuffle of vector data at all.
    */
  def sqCodes(df: DataFrame, idCol: String, vecCol: String,
              stats: DataFrame): DataFrame = {
    val quant = quant25 _
    val comps = df.select(col(idCol).as("id"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("id"), col("dim").cast("long").as("dim"),
        quant(col("x")).as("qx"))
    comps.join(broadcast(stats), Seq("dim"))
      .withColumn("span", col("qmx") - col("qmn"))
      .withColumn("code", when(col("span") === 0L, lit(0L))
        .otherwise(expr(
          "((qx - qmn) * 510 + span) div (span * 2)")))
      .select(col("id"), col("dim"), col("code"),
        (abs((col("qx") - col("qmn")) * 510L -
          col("code") * col("span") * 2L) <= col("span"))
          .as("bound_ok"))
  }

  /** Deterministic ±1 Johnson-Lindenstrauss sign for (input dim
    * `i`, output dim `j`): +1 iff the first hex nibble of
    * `md5("jl_<i>_<j>")` is even — reproducible in any engine with
    * an md5 function, which is what lets a second engine replay the
    * projection bit-for-bit.
    */
  def jlSign(i: Int, j: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val b = md.digest(s"jl_${i}_$j".getBytes("UTF-8"))
    if (((b(0) >> 4) & 1) == 0) 1 else -1
  }

  /** Johnson-Lindenstrauss ±1 random projection (Achlioptas 2003)
    * of a float-vector column down to `outDims` EXACT BIGINT
    * coordinates: inputs quantize on the shared 2^25 grid, signs
    * come from [[jlSign]], so every projected coordinate is an
    * exact integer sum — no IEEE ordering hazard anywhere.
    *
    * Shape at 100 TB: a map-only projection (no shuffle, no join;
    * the sign matrix is a plan literal) that shrinks every vector
    * `inDim/outDims`-fold before any distance work — the standard
    * prefilter that makes downstream ANN move 4-8x less data.
    * Vectors shorter than `inDim` project to null via an explicit
    * size guard (ANSI `element_at` would otherwise throw) — the
    * caller's schema contract, surfaced rather than silently
    * zero-padded.
    */
  def jlProject(df: DataFrame, idCol: String, vecCol: String,
                inDim: Int, outDims: Int): DataFrame = {
    require(inDim >= 1 && inDim <= 4096,
      s"sign-literal plan size is specified for inDim 1..4096: $inDim")
    require(outDims >= 1 && outDims <= 64,
      s"one fold per output dim is specified for 1..64: $outDims")
    val v = col(vecCol)
    val projCols = (0 until outDims).map { j =>
      val signs = array(
        (0 until inDim).map(i => lit(jlSign(i, j).toLong)): _*)
      when(size(v) >= inDim,
        aggregate(sequence(lit(1), lit(inDim)), lit(0L),
          (acc, i) => acc +
            quant25(element_at(v, i)) * element_at(signs, i)))
        .otherwise(lit(null).cast("long"))
        .as(s"__p$j")
    }
    df.select(col(idCol).as("id") +: projCols: _*)
      .select(col("id"),
        array((0 until outDims).map(j => col(s"__p$j")): _*)
          .as("pv"))
  }

  /** Top-`k` nearest neighbours of the vector with id `queryId` in
    * the JL-projected space — exact integer squared L2 over the
    * `outDims` projected coordinates. The probe is one broadcast
    * row; ranking is TakeOrdered(k). The candidate list this
    * returns is the cheap prefilter stage; a caller wanting exact
    * ranks re-scores just these k in the original space.
    */
  def jlTopK(df: DataFrame, idCol: String, vecCol: String,
             inDim: Int, outDims: Int, queryId: Long,
             k: Int): DataFrame = {
    val pv = jlProject(df, idCol, vecCol, inDim, outDims)
    val probe = pv.where(col("id") === queryId)
      .select(col("pv").as("__qpv"))
    val dist = aggregate(sequence(lit(1), lit(outDims)), lit(0L),
      (acc, j) => {
        val dj = element_at(col("pv"), j) -
          element_at(col("__qpv"), j)
        acc + dj * dj
      })
    pv.where(col("id") =!= queryId)
      .crossJoin(broadcast(probe))
      .select(col("id").as("vec_id"), dist.as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc_nulls_first)
      .limit(k)
  }
}
