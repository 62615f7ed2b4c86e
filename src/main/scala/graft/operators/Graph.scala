package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph centrality over edge tables — the link-quality signals a
  * web-scale curation pipeline computes before filtering (PageRank as
  * the canonical corpus-quality prior, Page et al. 1999; seeded trust
  * propagation over a link graph, Gyöngyi et al. VLDB 2004). The
  * reference engine has no graph surface (it infers structure,
  * `/root/reference/structa/analyzer.py`); these are beyond-reference
  * pipeline operators in the q120/q48 exact-iteration family.
  *
  * Determinism contract (the q44 rule): every update is exact integer
  * arithmetic on DECIMAL(38,0) — scores are scaled by `scale`, the
  * damping factor is the rational `num/den`, and each multiplicative
  * step is the floor division `(a - a mod b) / b`, which a second
  * engine computes bit-for-bit in HUGEINT. Floor loss is ≤ 1 scaled
  * unit per node per step, identical in both engines.
  *
  * Shape at 100 TB: the edge frame persists once; each iteration is
  * ONE shuffle join (edges ⋈ ranks on `src` — the canonical PageRank
  * exchange, keyed identically every round so AQE reuses the layout)
  * + one keyed aggregation on `dst` + two scalar aggregates that ride
  * a 1-row broadcast. The driver loop never touches data — one
  * lineage-cutting localCheckpoint per round (the CC-loop contract),
  * and every SUPERSEDED round's blocks are released the moment the
  * next round lands (the [[cutTracked]]/[[release]] pair), so an
  * N-round run holds at most two rounds of state, never N.
  */
object Graph {

  private val Dec = "decimal(38,0)"

  /** The iterative family's lineage cut. Default (None) is
    * `localCheckpoint` — executor-local blocks, cheapest, but NOT
    * fault-tolerant: on a real cluster an executor loss
    * mid-iteration aborts the job with no recompute path (the
    * truncated lineage cannot rebuild the lost blocks). Passing a
    * reliable `checkpointDir` (HDFS/object-store path on a cluster)
    * switches every cut to a reliable checkpoint: each round's state
    * is written to fault-tolerant storage, so lost executors
    * re-read instead of aborting. Results are IDENTICAL either way
    * (spec-pinned) — the knob trades write cost for durability.
    */
  private[operators] def cut(df: DataFrame,
                             checkpointDir: Option[String],
                             eager: Boolean = true): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        sc.getCheckpointDir match {
          case None => sc.setCheckpointDir(dir)
          // setCheckpointDir stores a RESOLVED URI (scheme + a
          // per-context UUID subdir). Compare path COMPONENTS — the
          // current dir must be `dir` itself or a descendant
          // (`dir/...`); a bare string-prefix test would both
          // false-match '/tmp/ck-other' against '/tmp/ck' and
          // false-warn on an exact sibling. A context already
          // pointed elsewhere wins (resetting mid-application would
          // strand earlier checkpoints), but silently ignoring the
          // caller's argument hides where state actually lands: say
          // so.
          case Some(cur) =>
            val curPath =
              try {
                val p = new java.net.URI(cur).getPath
                if (p == null) cur else p
              } catch { case _: Exception => cur }
            val want =
              if (dir.length > 1 && dir.endsWith("/")) dir.dropRight(1)
              else dir
            val under = curPath == want ||
              curPath.startsWith(
                if (want.endsWith("/")) want else want + "/")
            if (!under)
              System.err.println(s"warning: checkpointDir '$dir' " +
                s"ignored — this SparkContext already checkpoints " +
                s"to '$cur'; state is written there")
        }
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }

  /** [[cut]] plus the RDD blocks it pinned, so iterative loops can
    * release round t−1 DETERMINISTICALLY after round t materializes
    * (waiting for driver GC to reclaim superseded localCheckpoint
    * blocks let one heavy query family degrade every co-resident
    * query in a shared session). Reliable checkpoints pin nothing —
    * the tracked set is empty and release is a no-op.
    */
  private[graft] def cutTracked(df: DataFrame,
                                checkpointDir: Option[String],
                                eager: Boolean = true)
      : (DataFrame, Seq[RDD[_]]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = cut(df, checkpointDir, eager)
    // track the pinned RDD DIRECTLY where possible: a checkpointed
    // Dataset's plan is a LogicalRDD holding exactly the RDD that
    // localCheckpoint persisted, so no concurrent registration in
    // the shared SparkContext can leak into the pin set (the
    // registry-diff fallback below would capture — and release()
    // would later unpersist — state owned by a different query)
    val direct = out.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.filter(_.getStorageLevel !=
      org.apache.spark.storage.StorageLevel.NONE)
    val pinned = direct match {
      case Some(r) => Seq(r)
      case None =>
        // reliable checkpoints pin nothing (storage level NONE) —
        // the diff is empty; anything else falls back to the
        // registry diff, which assumes a single-threaded session
        sc.getPersistentRDDs
          .collect { case (id, r) if !before.contains(id) => r }.toSeq
    }
    (out, pinned)
  }

  // releasing a localCheckpoint intentionally abandons its truncated
  // lineage — that is the whole point of deterministic release — so
  // the per-release "… truncated and cannot be recomputed after
  // unpersisting" WARN is pure noise (hundreds of lines per bench
  // run). Suppress ONLY that message: a DENY filter keyed on the
  // message text, installed once per JVM on a dedicated LoggerConfig
  // for the emitting logger. Demoting the logger's LEVEL instead
  // (the first cut) silenced every other WARN from MapPartitionsRDD
  // for the whole JVM — too broad for a shared session.
  private lazy val quietTruncatedUnpersist: Unit =
    try {
      import org.apache.logging.log4j.LogManager
      import org.apache.logging.log4j.core.{Filter, LogEvent, LoggerContext}
      import org.apache.logging.log4j.core.config.LoggerConfig
      import org.apache.logging.log4j.core.filter.AbstractFilter
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val conf = ctx.getConfiguration
      val name = "org.apache.spark.rdd.MapPartitionsRDD"
      val target = {
        val closest = conf.getLoggerConfig(name)
        if (closest.getName == name) closest
        else {
          // additive child config: events still flow to the parent's
          // appenders at the parent's level; only the filter is new
          val lc = new LoggerConfig(name, closest.getLevel, true)
          conf.addLogger(name, lc)
          lc
        }
      }
      target.addFilter(new AbstractFilter(
        Filter.Result.DENY, Filter.Result.NEUTRAL) {
        override def filter(event: LogEvent): Filter.Result = {
          val msg = if (event.getMessage == null) null
                    else event.getMessage.getFormattedMessage
          if (msg != null &&
              msg.contains("cannot be recomputed after unpersisting"))
            Filter.Result.DENY
          else Filter.Result.NEUTRAL
        }
      })
      ctx.updateLoggers()
    } catch { case _: Throwable => () }

  /** Free blocks pinned by [[cutTracked]]. Only call once nothing
    * will read the frame again — an unpersisted localCheckpoint has
    * no lineage to recompute from.
    */
  private[graft] def release(pins: Seq[RDD[_]]): Unit = {
    quietTruncatedUnpersist
    pins.foreach(r =>
      try r.unpersist(blocking = false)
      catch { case _: Throwable => () })
  }

  /** The session's shuffle width — what iterative caches normalize
    * to. A persisted edge frame otherwise inherits the SCAN's split
    * count (with small-file split tuning that can be thousands of
    * sub-MB partitions), and every one of N iterations then pays
    * thousands of no-op tasks to read it.
    */
  private def shuffleWidth(df: DataFrame): Int =
    try df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    catch { case _: Throwable => 200 }

  /** Cached size in bytes of a [[cutTracked]] pin set — the
    * job-free smallness test for broadcast decisions (a `count()`
    * would schedule one extra job per decision; the block manager
    * already knows the bytes). None when nothing is pinned (the
    * reliable-checkpoint mode writes files instead).
    */
  private def cachedBytes(pins: Seq[RDD[_]]): Option[Long] =
    if (pins.isEmpty) None
    else {
      val sc = pins.head.sparkContext
      val ids = pins.map(_.id).toSet
      val infos = sc.getRDDStorageInfo
        .filter(i => ids.contains(i.id))
      if (infos.isEmpty) None
      else Some(infos.map(i => i.memSize + i.diskSize).sum)
    }

  /** Does a cut frame fit the broadcast budget? Storage-size test
    * when blocks are pinned; under reliable checkpointing (no
    * pinned blocks) falls back to one count at ~32 bytes/row.
    */
  private def fitsBroadcast(df: DataFrame, pins: Seq[RDD[_]],
                            maxBytes: Long): Boolean =
    cachedBytes(pins) match {
      case Some(b) => b <= maxBytes
      case None => df.count() <= maxBytes / 32
    }

  /** Exact floor division of non-negative DECIMAL(38,0) columns:
    * `(a - a mod b) / b` — the subtraction makes the numerator
    * exactly divisible, so the decimal division is exact and
    * rounding-mode-free in any engine.
    */
  // exact floor division of non-negative decimal(38,0) operands in
  // one BigDecimal op (see DecQuotExpr — the former
  // `(a - pmod(a, b)) / b` spelling cost three per call and was the
  // hottest executor frame in the rank-fold profile)
  private def floorDiv(a: Column, b: Column): Column =
    graft.functions.DecQuotExpr.decQuot(a.cast(Dec), b.cast(Dec))

  /** `iterations` rounds of exact scaled-integer PageRank over a
    * directed edge frame with columns `src`/`dst` (any key type;
    * multi-edges count — `.distinct()` upstream for simple graphs).
    *
    * Update (damping d = num/den, total mass T = N·scale; with
    * `weight` the mass splits proportionally — w ≡ 1 gives the
    * classic equal split):
    * {{{
    *   share(u→v) = floor(pr(u)·w(u→v) / Σ_out w(u))
    *   inflow(v)  = Σ_{u→v} share(u→v)
    *   D          = Σ_{no out-edges} pr(u)          dangling mass
    *   pr'(v)     = floor((den−num)·T / (den·N))
    *              + floor(num·(inflow(v) + floor(D/N)) / den)
    * }}}
    *
    * With `seeds` (personalized / TrustRank), the teleport and the
    * dangling redistribution both target ONLY the seed set S:
    * {{{
    *   pr'(v) = [v∈S]·floor((den−num)·T / (den·|S|))
    *          + floor(num·(inflow(v) + [v∈S]·floor(D/|S|)) / den)
    * }}}
    * so score mass provably originates from the seeds and reaches
    * other nodes through links alone.
    *
    * `inflowSalt` > 1 splits the per-round inflow aggregation into a
    * two-stage sum on (dst, salt) — the opt-in hot-key spreader
    * [[skewPreflight]]'s warning names. Scores are IDENTICAL for any
    * salt (integer sums are associative; spec-pinned): the knob only
    * spreads one star-center's reduce work across `inflowSalt`
    * partial sums.
    *
    * Returns `(node, pr)` — `pr` is the final scaled score; a node's
    * rank share is `pr / T`. Intermediate rounds are released as the
    * run advances (use [[pagerankTrace]] to keep them).
    */
  def pagerank(edges: DataFrame, iterations: Int = 3,
               num: Long = 17L, den: Long = 20L,
               scale: Long = 1000000L,
               seeds: Option[DataFrame] = None,
               weight: Option[Column] = None,
               checkpointDir: Option[String] = None,
               inflowSalt: Int = 1): DataFrame =
    pagerankTraceImpl(edges, iterations, num, den, scale, seeds,
      weight, checkpointDir, inflowSalt, keepTrace = false).last

  /** [[pagerank]] with the full per-iteration score trace: element t
    * holds `(node, pr)` AFTER t iterations (element 0 = the initial
    * mass placement), each one materialized and lineage-cut. The
    * trace is what [[pagerankDelta]] folds an edge batch against —
    * a delta fold must know the OLD run's score at every round, not
    * just its end state. Every element stays pinned (the caller owns
    * the artifact — persist it and release the blocks, e.g. via the
    * sweep in `ensureRankTrace`).
    */
  def pagerankTrace(edges: DataFrame, iterations: Int = 3,
                    num: Long = 17L, den: Long = 20L,
                    scale: Long = 1000000L,
                    seeds: Option[DataFrame] = None,
                    weight: Option[Column] = None,
                    checkpointDir: Option[String] = None,
                    inflowSalt: Int = 1)
      : Seq[DataFrame] =
    pagerankTraceImpl(edges, iterations, num, den, scale, seeds,
      weight, checkpointDir, inflowSalt, keepTrace = true)

  private def pagerankTraceImpl(edges: DataFrame, iterations: Int,
                                num: Long, den: Long, scale: Long,
                                seeds: Option[DataFrame],
                                weight: Option[Column],
                                checkpointDir: Option[String],
                                inflowSalt: Int,
                                keepTrace: Boolean)
      : Seq[DataFrame] = {
    require(iterations >= 1 && iterations <= 16,
      s"driver-looped plan growth is specified for 1..16 " +
        s"iterations: $iterations")
    require(num > 0 && den > num,
      s"damping num/den must lie in (0, 1): $num/$den")
    require(inflowSalt >= 1, s"inflowSalt must be >= 1: $inflowSalt")
    // edge weight (w = 1 unweighted): a node's mass splits across
    // its out-edges proportionally to w — share(u→v) =
    // floor(pr(u)·w / Σ_out w), which for w ≡ 1 is exactly the
    // classic floor(pr/outdeg). Non-positive weights raise in-plan.
    // The UNWEIGHTED path carries no w column at all: pr·1 ≡ pr, so
    // the per-edge decimal multiply disappears from every round, the
    // cached/shuffled edge rows are one DECIMAL(38,0) narrower
    // (guide §2.3), and the degree aggregate is a long count instead
    // of a decimal sum — identical values either way.
    val weighted = weight.isDefined
    val wCol = weight.getOrElse(lit(1L)).cast(Dec)
    // hash-repartition the persisted frame by the per-round join key
    // ONCE: the cache then (a) holds shuffle-width partitions instead
    // of inheriting the scan's split count (under small-file split
    // tuning that can be hundreds of sub-MB partitions re-scheduled
    // every round), and (b) reports src-hash partitioning, so each
    // round's edges⋈ranks join exchanges only the node-sized rank
    // side — the edge side never re-shuffles
    val e0 = (if (weighted)
        edges.select(col("src"), col("dst"),
          when(wCol > 0, wCol)
            .otherwise(raise_error(lit("pagerank: edge weights must " +
              "be positive")).cast(Dec)).as("w"))
      else edges.select(col("src"), col("dst")))
      .repartition(shuffleWidth(edges), col("src"))
      .persist()
    // degree-skew pre-flight (the price-it-first discipline): the
    // inflow aggregation's reduce key is `dst`, and the per-round
    // join's shuffle key is `src` — a key holding a large share of
    // the edges makes one reducer the round clock. The check is one
    // aggregate over the edge frame (which doubles as the persist
    // materializer); it WARNS rather than salts — partial
    // aggregation absorbs most hot-key sums, AQE's skew-join
    // handles the join side, and `inflowSalt` is the opt-in
    // two-stage spreader when neither suffices.
    skewPreflight(e0).foreach(w =>
      System.err.println(s"warning: $w"))
    val (nodes, nodesPins) = cutTracked(
      e0.select(col("src").as("node"))
        .unionAll(e0.select(col("dst").as("node")))
        .distinct(), checkpointDir)
    val (deg, degPins) = cutTracked(
      e0.groupBy(col("src").as("node"))
        .agg((if (weighted) sum(col("w")) else count(lit(1)))
          .cast(Dec).as("deg")), checkpointDir)
    // out-degree PRE-JOINED into the edge frame once: every
    // iteration's share computation then needs only the pr join —
    // one shuffle per round instead of two (at 100 TB the saved
    // exchange is the difference between 2N and 3N shuffled bytes
    // per iteration)
    val e = e0.join(deg.select(col("node").as("__dn"), col("deg")),
        col("__dn") === e0("src"))
      .select(Seq(e0("src").as("src"), e0("dst").as("dst")) ++
        (if (weighted) Seq(e0("w")) else Nil) :+ col("deg"): _*)
      .persist()
    // seed membership rides the node frame as one boolean column —
    // the teleport base is then a branch-free projection each round
    val (seeded, seededPins) = seeds match {
      case Some(sf) =>
        val sn = sf.select(col("node")).distinct()
        cutTracked(nodes.join(sn.withColumn("__s", lit(true)),
            Seq("node"), "left")
          .select(col("node"),
            coalesce(col("__s"), lit(false)).as("is_seed")),
          checkpointDir)
      case None =>
        (nodes.select(col("node"), lit(true).as("is_seed")),
          Seq.empty[RDD[_]])
    }
    // N (nodes) and S (teleport targets) are ROUND-INVARIANT scalars:
    // read them ONCE driver-side instead of re-aggregating and
    // re-broadcasting a `tot` frame into every round's projection
    // (the per-round crossJoin(broadcast(tot)) build was one full
    // scheduler job per iteration for two constants). A seed set
    // that never intersects the edge frame's nodes would divide by
    // zero; fail fast here with the same message the in-plan guard
    // raised.
    val totRow = seeded.agg(count(lit(1)).as("n0"),
      count(when(col("is_seed"), 1)).as("s0")).head()
    val nCnt = totRow.getLong(0)
    val sCnt = totRow.getLong(1)
    if (sCnt <= 0)
      throw new IllegalStateException("pagerank: no seed appears " +
        "among the edge frame's nodes (empty teleport set)")
    def decLit(v: BigInt): Column =
      lit(new java.math.BigDecimal(v.bigInteger)).cast(Dec)
    // the three per-node constants, exact BigInt floors — identical
    // values to the in-plan floorDiv spellings they replace:
    //   init     = floor(N·scale / S)            (round-0 seed mass)
    //   teleBase = floor((den−num)·N·scale / (den·S))
    val initLit = decLit(BigInt(nCnt) * BigInt(scale) / BigInt(sCnt))
    val teleLit = decLit(BigInt(den - num) * BigInt(nCnt) *
      BigInt(scale) / (BigInt(den) * BigInt(sCnt)))
    val sB = BigInt(sCnt)
    // dangling-free detection, ONE cheap count over the checkpointed
    // degree frame: deg holds one row per SOURCE node, and sources
    // are never dangling, so |dangling| = N − |deg|. A dangling-free
    // graph (every symmetrized graph, every cycle graph) then skips
    // the whole per-round dangling machinery — an anti-join, a
    // global aggregate and a broadcast build per iteration — because
    // D ≡ 0 makes its term floor(0/S) = 0 exactly.
    val hasDangling = deg.count() < nCnt
    // initial mass lives ON the teleport set: floor(T/|S|) per seed,
    // 0 elsewhere — for seeds=None that is exactly `scale` per node,
    // and for TrustRank every unit of final score provably originated
    // at a seed and travelled only links
    var (pr, prPins) = cutTracked(seeded
      .select(col("node"), col("is_seed"),
        when(col("is_seed"), initLit)
          .otherwise(lit(0).cast(Dec)).as("pr")), checkpointDir)
    val trace = Seq.newBuilder[DataFrame]
    trace += pr.select(col("node"), col("pr"))
    for (_ <- 1 to iterations) {
      val shares = e.join(pr.select(col("node"), col("pr")),
          e("src") === col("node"))
      // unweighted: share = floor(pr·1 / deg) = floor(pr / deg) —
      // no per-edge decimal multiply
      val shareCol =
        if (weighted) floorDiv(col("pr") * col("w"), col("deg"))
        else floorDiv(col("pr"), col("deg"))
      val inflow =
        if (inflowSalt <= 1)
          shares.select(e("dst").as("node"), shareCol.as("share"))
            .groupBy(col("node"))
            .agg(sum(col("share")).cast(Dec).as("inflow"))
        else
          // two-stage hot-key spread: partial sums keyed by
          // (dst, hash(src) mod salt) — a star center's inflow
          // arrives as `inflowSalt` partials instead of one reducer
          // absorbing every edge; the final sum is over ≤ salt rows
          // per node. Integer addition is associative, so scores are
          // bit-identical to the unsalted plan.
          shares.select(e("dst").as("node"), shareCol.as("share"),
              pmod(hash(e("src")), lit(inflowSalt)).as("__salt"))
            .groupBy(col("node"), col("__salt"))
            .agg(sum(col("share")).cast(Dec).as("__partial"))
            .groupBy(col("node"))
            .agg(sum(col("__partial")).cast(Dec).as("inflow"))
      // per-seed dangling share floor(D/S) is a per-round SCALAR:
      // when the graph has dangling nodes, read it with one small
      // aggregate job (the round is materialized eagerly anyway)
      // and fold the floor on the driver — the old plan built the
      // same aggregate and shipped it through a broadcast join.
      val dangLit =
        if (!hasDangling) lit(0).cast(Dec)
        else {
          val d = pr.join(deg.select(col("node")), Seq("node"),
              "left_anti")
            .agg(coalesce(sum(col("pr")),
              lit(0).cast(Dec)).cast(Dec).as("d"))
            .head().getDecimal(0)
          decLit(BigInt(d.toBigInteger) / sB)
        }
      val (next, nextPins) = cutTracked(
        pr.select(col("node"), col("is_seed"))
        .join(inflow, Seq("node"), "left")
        .select(col("node"), col("is_seed"),
          (when(col("is_seed"), teleLit)
            .otherwise(lit(0).cast(Dec)) +
          floorDiv(lit(num).cast(Dec) *
            (coalesce(col("inflow"), lit(0).cast(Dec)) +
              when(col("is_seed"), dangLit)
                .otherwise(lit(0).cast(Dec))),
            lit(den).cast(Dec))).as("pr"))
        // pr is referenced three times next round (shares, dangling,
        // the rebase join) — one eager cut per round keeps the plan
        // flat and is the round's only driver action
        , checkpointDir)
      // round t−1 is dead the moment round t lands — release unless
      // the caller asked for the full trace
      if (!keepTrace) release(prPins)
      pr = next
      prPins = nextPins
      trace += pr.select(col("node"), col("pr"))
    }
    e.unpersist()
    e0.unpersist()
    // loop-internal state: the node/seed frames fed `tot` (read by
    // every round — now all materialized) and `deg` fed the dangling
    // anti-join; none outlives the loop
    release(nodesPins)
    release(seededPins)
    release(degPins)
    trace.result()
  }

  /** Fold a batch of NEW edges into a completed [[pagerankTrace]]
    * run WITHOUT re-iterating the full graph — the q63/q128 delta
    * discipline applied to the iterative family. The result is
    * defined as, and spec- and oracle-pinned EXACTLY equal to,
    * `pagerank(edges ∪ delta, iterations)`: per round, only the
    * AFFECTED FRONTIER recomputes and every other node copies the
    * prior trace.
    *
    * Why the frontier is sound: with the preconditions below, round
    * t's score changes at v only if (a) an in-neighbor's round-(t−1)
    * score changed, (b) an in-neighbor's out-degree changed (it is a
    * delta source), or (c) v gained an in-edge. So
    * `dirty₁ = outNbr_{E∪Δ}(srcs(Δ)) ∪ added` and
    * `dirty_{t+1} = outNbr_{E∪Δ}(dirty_t) ∪ dirty₁` cover every
    * changed node — recomputing a covered-but-unchanged node is
    * harmless (its inflow over the patched frame reproduces the old
    * value bit-for-bit).
    *
    * NODE-ADDING deltas are supported (the crawl-batch case: new
    * pages arrive with every delta) by an analytic rebase: with both
    * frames dangling-free and the trace unseeded, NO score depends
    * on N — round 0 is `floor(N·scale/N) = scale` per node for any
    * N, the dangling term is 0, and the teleport base
    * `floor((den−num)·N·scale/(den·N)) = floor((den−num)·scale/den)`
    * (floor is invariant under scaling numerator and denominator by
    * the same N). So the N→N′ change folds into the trace as a
    * NO-OP, and added nodes simply join the recursion: they seed at
    * `scale` in round 0 and stay in the dirty frontier every round
    * (they have no trace entry to copy).
    *
    * Preconditions (priced pre-flight, `require`d):
    *   - `edges` has no dangling node, and no delta endpoint is
    *     dangling in E∪Δ (dangling mass is a GLOBAL broadcast — a
    *     nonzero D makes every score N-dependent and kills both the
    *     frontier argument and the rebase);
    *   - the trace is unseeded (seeded teleport shifts with |S|;
    *     detected from round 0 itself — unseeded round 0 is `scale`
    *     everywhere).
    *
    * Shape: the pre-flight is ONE job — one distinct over the base
    * frame's endpoints plus delta-sized anti-joins (NOT the
    * edited-frame multiset diff, which [[pagerankRefresh]] alone
    * pays: two keyed aggregates over both full frames; for pure
    * additions the changed sources are exactly `srcs(Δ)`, known for
    * free). The fold itself sizes the frontier and picks its join
    * strategy (see [[foldCore]]): a frontier inside
    * `maxBroadcastBytes` runs the ENTIRE fold broadcast-side —
    * zero shuffles of the edge frame, one trace-element scan per
    * round — and past the budget it degrades to frontier semi-joins
    * over the shuffled edge frame. A delta touching f% of sources
    * costs ~f% of a full round, the win this operator exists for at
    * 100 TB.
    */
  def pagerankDelta(edges: DataFrame, delta: DataFrame,
                    trace: Seq[DataFrame],
                    num: Long = 17L, den: Long = 20L,
                    scale: Long = 1000000L,
                    weight: Option[Column] = None,
                    checkpointDir: Option[String] = None,
                    maxBroadcastBytes: Long = 128L << 20,
                    srcBuckets: Option[Int] = None,
                    byDst: Option[(DataFrame, DataFrame)] = None)
      : DataFrame = {
    // >= 2: round 0 plus at least one iteration. A real
    // pagerankTrace always has both; a degenerate 1-element trace
    // has ZERO rounds to fold, and the driver/shuffle paths disagree
    // on its added-node filler (0 vs scale) — refuse it rather than
    // let the answer depend on maxBroadcastBytes
    require(trace.length >= 2,
      "need a pagerankTrace run (round 0 + >=1 iteration) to fold into")
    require(num > 0 && den > num,
      s"damping num/den must lie in (0, 1): $num/$den")
    // unweighted folds carry NO w column: pr·1 ≡ pr drops the
    // per-edge decimal multiply, and the cached / collected /
    // shuffled edge rows lose a 16-byte DECIMAL(38,0) constant each
    // (the pagerankTraceImpl narrowing, applied to the fold paths)
    val weighted = weight.isDefined
    val wCol = weight.getOrElse(lit(1L)).cast(Dec)
    def withW(df: DataFrame, who: String): DataFrame =
      if (weighted)
        df.select(col("src"), col("dst"),
          when(wCol > 0, wCol)
            .otherwise(raise_error(lit(s"$who: edge weights must " +
              "be positive")).cast(Dec)).as("w"))
      else df.select(col("src"), col("dst"))
    // layout hint: both frames carry the artifact's physical
    // partition column sb = pmod(xxhash64(src), srcBuckets); the
    // fold's src-keyed probes then read ONLY the probing frontier's
    // partition directories (see [[EdgeLayout]])
    val layout = srcBuckets.map { n =>
      require(n > 0, s"srcBuckets must be > 0: $n")
      require(edges.columns.contains("sb") &&
          delta.columns.contains("sb"),
        "pagerankDelta: srcBuckets is set but the frames carry no " +
          "'sb' partition column — write the artifact partitioned " +
          "by sb = pmod(xxhash64(src), buckets) cast to int and " +
          "select sb through")
      // the dst-partitioned companion (db = pmod(xxhash64(dst),
      // buckets)), when the caller maintains one, makes the
      // frontier IN-EDGE extract — the only dst-keyed fold probe —
      // frontier-proportional too (2× artifact storage, disclosed)
      val scanDst = byDst.map { case (eD, dD) =>
        require(eD.columns.contains("db") &&
            dD.columns.contains("db"),
          "pagerankDelta: byDst frames carry no 'db' partition " +
            "column — write the companion partitioned by " +
            "db = pmod(xxhash64(dst), buckets) cast to int")
        (ids: Seq[Int]) =>
          withW(eD.where(col("db").isin(ids: _*)), "pagerankDelta")
            .unionAll(withW(dD.where(col("db").isin(ids: _*)),
              "pagerankDelta"))
      }
      EdgeLayout(n, ids =>
        withW(edges.where(col("sb").isin(ids: _*)), "pagerankDelta")
          .unionAll(withW(delta.where(col("sb").isin(ids: _*)),
            "pagerankDelta")),
        scanDst)
    }
    // width-normalized caches (see pagerankTrace's e0 note): the
    // fold scans these a handful of times — hops, frontier-edge and
    // degree probes — and each scan should cost shuffle-width tasks,
    // not the raw scan's split count. COALESCE, not repartition: the
    // fold's probes all broadcast the frontier side (and the shuffle
    // fallback extracts frontier in-edges once), so nothing here
    // ever exploits src-hash partitioning — the old repartition paid
    // a full edge shuffle up front (measured as the single heaviest
    // stage of the q174 fold: a 1 % delta shuffled 100 % of the
    // edges before folding anything) for a property no consumer
    // used. Coalesce materializes the same width-normalized cache by
    // merging scan splits map-side, zero shuffle.
    val eOldP = Some(withW(edges, "pagerankDelta")
      .coalesce(shuffleWidth(edges)).persist())
    val eOld = eOldP.getOrElse(withW(edges, "pagerankDelta"))
    val eDelta = withW(delta, "pagerankDelta")
      .coalesce(shuffleWidth(delta)).persist()
    val eNew = eOld.unionAll(eDelta)
    // ALL pre-flights in ONE SHUFFLE: tag every edge endpoint with
    // its role (old-src / old-dst / delta-src / delta-dst), reduce
    // to one flag row per node, and read every violation off the
    // flags —
    //  - dangling_old: a node the base frame only ever names as a
    //    dst (a SOURCE trivially has an out-edge);
    //  - dangling_new: a delta endpoint that is a source in NEITHER
    //    frame (an old node keeps its base out-edges in E∪Δ, so
    //    only delta endpoints can be newly dangling);
    //  - added: a delta endpoint the base frame never names (not a
    //    violation — counted to decide whether the added-node frame
    //    is worth materializing at all: a pure reinforcement delta
    //    has none, and an empty LOCAL frame lets Catalyst prune
    //    every added-row union downstream).
    // The seeded-trace probe (a node-frame scan, no shuffle) rides
    // the same collect as a 1-row broadcast.
    // ONE SCAN per frame (not one per endpoint role): each edge row
    // explodes into its (src, roleBit) and (dst, roleBit) pairs
    // in-task, so the pre-flight reads the base artifact once and
    // the delta once instead of twice each — at 100 TB that halves
    // the pre-flight's file bytes, and partial aggregation reduces
    // the exploded pairs map-side exactly as before.
    val flags = endpointRoles(eOld, 1, 2)
      .unionAll(endpointRoles(eDelta, 4, 8))
      .groupBy(col("node"))
      .agg(max(when(col("r") === 1, 1).otherwise(0)).as("os"),
        max(when(col("r") === 2, 1).otherwise(0)).as("od"),
        max(when(col("r") === 4, 1).otherwise(0)).as("ds"),
        max(when(col("r") === 8, 1).otherwise(0)).as("dd"))
    val inD = col("ds") === 1 || col("dd") === 1
    val pre = flags.agg(
        count(when(col("os") === 0 && col("od") === 1, 1))
          .as("dangling_old"),
        count(when(inD && col("os") === 0 && col("ds") === 0, 1))
          .as("dangling_new"),
        count(when(inD && col("os") === 0 && col("od") === 0, 1))
          .as("added_node"))
      .crossJoin(broadcast(trace.head
        .where(col("pr") =!= lit(scale).cast(Dec))
        .agg(count(lit(1)).as("seeded_trace"))))
      .head()
    val counts = Seq("dangling_old", "dangling_new", "added_node",
        "seeded_trace")
      .map(k => k -> pre.getLong(pre.fieldIndex(k)))
      .filter(_._2 > 0).toMap
    val violations = counts - "added_node"
    require(violations.isEmpty,
      "pagerankDelta: unsound fold — " +
        violationText(violations) + "; run the full pagerank " +
        "instead")
    val (added, addedPins) =
      if (counts.getOrElse("added_node", 0L) == 0L)
        // provably no new node: a filter-false frame folds to an
        // empty LocalRelation and every downstream union/join of
        // added rows optimizes away
        (eDelta.select(col("src").as("node")).where(lit(false)),
          Seq.empty[RDD[_]])
      else cutTracked(eDelta.select(col("src").as("node"))
        .unionAll(eDelta.select(col("dst").as("node")))
        .distinct()
        .join(eOld.select(col("src").as("node"))
          .unionAll(eOld.select(col("dst").as("node"))),
          Seq("node"), "left_anti"), checkpointDir)
    // changed sources for a pure-addition batch are exactly the
    // delta's sources — no diff needed; and outNbr_old(srcs(Δ)) ⊆
    // outNbr_{E∪Δ}(srcs(Δ)), so the frontier seeds from the new
    // frame alone
    val srcsD = eDelta.select(col("src").as("node")).distinct()
    val out = foldCore(eNew, Seq(eNew), srcsD, added, trace, num,
      den, scale, checkpointDir, maxBroadcastBytes, layout, weighted)
    // foldCore's result is eagerly materialized — every input frame
    // below is dead
    release(addedPins)
    eOldP.foreach(_.unpersist())
    eDelta.unpersist()
    out
  }

  /** The GENERAL incremental form: refresh a completed
    * [[pagerankTrace]] run against an arbitrarily EDITED edge frame
    * — additions, removals, weight changes and NEW NODES alike
    * ([[pagerankDelta]] is the additions-only special case, which
    * skips this form's multiset diff). The changed-source set is
    * computed by DIFFING the two frames' per-(src,dst) out-edge
    * multisets (one full-outer join of two keyed aggregates — a
    * source whose multiset is unchanged contributes identical shares
    * given identical scores); the dirty frontier then seeds from the
    * changed sources' out-neighbors in BOTH frames (a removal can
    * dirty a node the new graph no longer reaches from its source)
    * plus every added node, and expands through the NEW frame only.
    * Result == the full `pagerank(newEdges, iterations)` EXACTLY
    * (spec- and oracle-pinned).
    *
    * Added nodes fold by the analytic rebase documented on
    * [[pagerankDelta]]: dangling-free + unseeded makes every score
    * N-invariant, so the trace stays valid verbatim and added nodes
    * enter at round-0 mass `scale`, permanently dirty. REMOVED
    * nodes stay rejected — a departed node's mass withdrawal has no
    * local footprint in the new frame to seed a frontier from.
    *
    * Preconditions (priced pre-flight, `require`d): no node removed,
    * no dangling node in either frame, unseeded trace (detected
    * from round 0 — unseeded round 0 is `scale` everywhere).
    */
  def pagerankRefresh(oldEdges: DataFrame, newEdges: DataFrame,
                      trace: Seq[DataFrame],
                      num: Long = 17L, den: Long = 20L,
                      scale: Long = 1000000L,
                      weight: Option[Column] = None,
                      checkpointDir: Option[String] = None,
                      maxBroadcastBytes: Long = 128L << 20)
      : DataFrame = {
    // >= 2 for the same reason as pagerankDelta: zero-round folds
    // have path-dependent added-node filler — refuse
    require(trace.length >= 2,
      "need a pagerankTrace run (round 0 + >=1 iteration) to fold into")
    require(num > 0 && den > num,
      s"damping num/den must lie in (0, 1): $num/$den")
    // no w column on unweighted frames — the pagerankDelta narrowing
    val weighted = weight.isDefined
    val wCol = weight.getOrElse(lit(1L)).cast(Dec)
    def withW(df: DataFrame): DataFrame =
      if (weighted)
        df.select(col("src"), col("dst"),
          when(wCol > 0, wCol)
            .otherwise(raise_error(lit("pagerankRefresh: edge " +
              "weights must be positive")).cast(Dec)).as("w"))
      else df.select(col("src"), col("dst"))
    // coalesce, not repartition — same reasoning as pagerankDelta:
    // every consumer (node scans, the multiset-diff aggregates keyed
    // (src, dst), the fold's frontier probes) either aggregates on a
    // different key or broadcasts the frontier side, so src-hash
    // partitioning buys nothing and the up-front edge shuffle is
    // pure cost.
    val eOld = withW(oldEdges)
      .coalesce(shuffleWidth(oldEdges)).persist()
    val eNew = withW(newEdges)
      .coalesce(shuffleWidth(newEdges)).persist()
    def nodesOf(e: DataFrame): DataFrame =
      e.select(col("src").as("node"))
        .unionAll(e.select(col("dst").as("node")))
        .distinct()
    val (oldNodes, onPins) = cutTracked(nodesOf(eOld), checkpointDir)
    val (newNodes, nnPins) = cutTracked(nodesOf(eNew), checkpointDir)
    val (added, addedPins) = cutTracked(
      newNodes.join(oldNodes, Seq("node"), "left_anti"),
      checkpointDir)
    // ALL pre-flights in ONE job (tagged union of the violation
    // frames): no removed node, no dangling node in EITHER frame
    // (dangling mass is a global broadcast term in both runs, so a
    // local fold would be unsound), unseeded trace.
    val violations = oldNodes
      .join(newNodes, Seq("node"), "left_anti")
      .select(lit("node_removed").as("kind"))
      .unionAll(oldNodes
        .join(eOld.select(col("src").as("node")).distinct(),
          Seq("node"), "left_anti")
        .select(lit("dangling_old").as("kind")))
      .unionAll(newNodes
        .join(eNew.select(col("src").as("node")).distinct(),
          Seq("node"), "left_anti")
        .select(lit("dangling_new").as("kind")))
      .unionAll(trace.head
        .where(col("pr") =!= lit(scale).cast(Dec))
        .select(lit("seeded_trace").as("kind")))
      .groupBy(col("kind")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(violations.isEmpty,
      "pagerankRefresh: unsound edit — " +
        violationText(violations) + "; run the full pagerank " +
        "instead")
    // changed sources = sources whose out-edge MULTISET differs
    // between the frames (count + total weight per (src,dst) group;
    // a source with an identical multiset emits identical shares
    // given identical scores). One full-outer join of two keyed
    // aggregates — edit-sized output, edge-sized input. A source
    // that only exists in one frame (an added node) diffs too.
    // unweighted: w ≡ 1 makes the weight sum IDENTICAL to the count,
    // so comparing it would be comparing the count twice — the diff
    // reduces to per-(src, dst) multiplicities alone.
    def grouped(e: DataFrame, cn: String, sn: String): DataFrame = {
      val g = e.groupBy(col("src"), col("dst"))
      if (weighted)
        g.agg(count(lit(1)).as(cn), sum(col("w")).cast(Dec).as(sn))
      else g.agg(count(lit(1)).as(cn))
    }
    val changed =
      if (weighted)
        !(col("__oc") <=> col("__nc") && col("__ow") <=> col("__nw"))
      else !(col("__oc") <=> col("__nc"))
    val srcsD = grouped(eOld, "__oc", "__ow")
      .join(grouped(eNew, "__nc", "__nw"), Seq("src", "dst"),
        "full_outer")
      .where(changed)
      .select(col("src").as("node")).distinct()
    // the frontier seeds from the changed sources' out-neighbors
    // in BOTH frames — a removal dirties a node the new frame may
    // no longer reach from that source — plus every added node,
    // and expands through the NEW frame only.
    val out = foldCore(eNew, Seq(eNew, eOld), srcsD, added, trace,
      num, den, scale, checkpointDir, maxBroadcastBytes,
      weighted = weighted)
    release(addedPins)
    release(nnPins)
    release(onPins)
    eOld.unpersist()
    eNew.unpersist()
    out
  }

  /** One edge scan → (node, roleBit) pairs: each edge row explodes
    * into its (src, sBit) and (dst, dBit) pairs in-task, so a
    * pre-flight reads each frame ONCE instead of once per endpoint
    * role (shared by the pagerankDelta and hitsDelta flag passes).
    */
  private def endpointRoles(f: DataFrame, sBit: Int,
                            dBit: Int): DataFrame =
    f.select(explode(array(
        struct(col("src").as("node"), lit(sBit).as("r")),
        struct(col("dst").as("node"), lit(dBit).as("r"))))
      .as("__e"))
      .select(col("__e.node").as("node"), col("__e.r").as("r"))

  private def violationText(violations: Map[String, Long]): String =
    violations.map {
      case ("node_removed", n) => s"$n nodes appear only in the " +
        "old frame (a departed node's mass withdrawal has no " +
        "local footprint to seed a frontier from)"
      case ("dangling_old", n) => s"$n dangling nodes in the " +
        "old frame (its dangling mass was a global term)"
      case ("dangling_new", n) => s"$n dangling nodes in the " +
        "new frame (dangling mass is a global term)"
      case ("seeded_trace", n) => s"$n round-0 scores differ " +
        "from `scale` — the trace is seeded (or was built with a " +
        "different scale), and seeded teleport shifts with |S|"
      case (k, n) => s"$n × $k"
    }.mkString("; ")

  /** Partition-layout hint for a fold's edge artifact: the frame was
    * written with a physical partition column
    * `sb = pmod(xxhash64(src), buckets)` (int), and `scan(ids)`
    * returns the weight-normalized `(src, dst, w)` slice reading
    * ONLY those partition directories — literal partition pruning,
    * visible in the plan as `PartitionFilters: [sb IN (…)]`. Every
    * src-keyed fold probe — hop expansion, degree extraction, the
    * driver path's BFS — then reads frontier-proportional FILE
    * bytes instead of the full artifact WHEN the frontier is
    * selective ([[pruneOrWhole]] — a dense frontier keeps the warm
    * cache); only the one dst-keyed in-edge extract always scans
    * everything. At 100 TB the edge frame cannot live in cache, so
    * pruned parquet reads are the difference between a fold hop
    * costing O(frontier) and O(graph) I/O.
    *
    * `scanDst`, when present, is the same contract for a SECOND copy
    * of the artifact partitioned by `db = pmod(xxhash64(dst),
    * buckets)` — it makes the one dst-keyed probe (the frontier
    * IN-EDGE extract, the only fold scan `scan` cannot prune)
    * frontier-proportional too, at the disclosed cost of 2× artifact
    * storage.
    */
  private[graft] final case class EdgeLayout(
      buckets: Int, scan: Seq[Int] => DataFrame,
      scanDst: Option[Seq[Int] => DataFrame] = None)

  /** Frame capture for ExplainAudit's fold-layout pin: when the
    * `graft.fold.audit` system property is `true`, the distributed
    * fold records its pruned hop probe ("hop") and its final
    * trace-patch compose ("compose") here, pre-cut. The fold's
    * intermediate frames are consumed by eager cuts, so their plans
    * are invisible on the returned frame — this is the only window
    * the audit has. Debug-only: never read (and never populated) in
    * production paths.
    */
  private[graft] val foldAuditFrames =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def foldAudit(key: String, df: DataFrame): Unit =
    if (sys.props.get("graft.fold.audit").contains("true"))
      foldAuditFrames.put(key, df)

  /** The partition-bucket ids a node frame's values hash into — at
    * most `buckets` ints from one tiny distinct-aggregate (over a
    * LOCAL relation when the frontier is driver-resident, which
    * never touches the cluster). Must mirror the writer's
    * `pmod(xxhash64(src), buckets)` exactly.
    */
  private def bucketIds(nodes: DataFrame, buckets: Int): Seq[Int] =
    nodes.select(pmod(xxhash64(col(nodes.columns.head)),
        lit(buckets.toLong)).cast("int").as("__b"))
      .distinct().collect().map(_.getInt(0)).toSeq

  /** [[bucketIds]] for a DRIVER-RESIDENT node set: the same
    * `pmod(xxhash64(v), buckets)` evaluated through the catalyst
    * expressions themselves (same hash seed, same modulo semantics —
    * bit-identical to the writer's partition column) with zero
    * cluster jobs. The driver fold probes a handful of frontiers per
    * run; each used to pay a scheduler round-trip just to learn
    * which buckets its LOCAL node set hashes into.
    */
  private def bucketIdsDriver(
      nodes: Iterable[Any],
      dt: org.apache.spark.sql.types.DataType,
      buckets: Int): Seq[Int] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Pmod, XxHash64}
    nodes.iterator.map { v =>
      // seed 42L == the SQL xxhash64 function's default seed (what
      // the writer's pmod(xxhash64(src), buckets) used)
      Pmod(XxHash64(Seq(Literal.create(v, dt)), 42L),
          Literal(buckets.toLong))
        .eval(null).asInstanceOf[Long].toInt
    }.toSet.toSeq.sorted(Ordering.Int)
  }

  /** The per-probe prune-vs-cache call: a pruned parquet scan reads
    * `ids.size / buckets` of the artifact from DISK, a whole-frame
    * probe reads the warm CACHE — the slice only wins when the
    * frontier is genuinely selective (≤ 1/4 of the buckets; a dense
    * small-scale frontier populates every bucket and pruning would
    * just bypass the cache). At 100 TB a 1 %-delta frontier of a
    * well-bucketed artifact hashes into few buckets, so the big-data
    * regime prunes by construction. `graft.fold.forcePrune` (set by
    * ExplainAudit) forces the pruned plan so its SHAPE can be pinned
    * at any scale — the threshold decides when, the pin verifies
    * what.
    */
  private def pruneOrWhole(layout: Option[EdgeLayout],
                           frontier: DataFrame,
                           whole: DataFrame): DataFrame =
    layout match {
      case Some(l) =>
        val ids = bucketIds(frontier, l.buckets)
        val force = sys.props.get("graft.fold.forcePrune")
          .contains("true")
        if (force || ids.size * 4 <= l.buckets) l.scan(ids)
        else whole
      case None => whole
    }

  /** [[pruneOrWhole]] for the DST-keyed in-edge extract: prunes the
    * dst-partitioned companion artifact to the frontier's buckets
    * when the layout carries one (same selectivity threshold / force
    * pin). Without a companion the extract scans `whole` — the one
    * fold probe the src layout can never prune.
    */
  private def pruneDstOrWhole(layout: Option[EdgeLayout],
                              frontier: DataFrame,
                              whole: DataFrame): DataFrame =
    layout.flatMap(l => l.scanDst.map((l.buckets, _))) match {
      case Some((buckets, scanDst)) =>
        val ids = bucketIds(frontier, buckets)
        val force = sys.props.get("graft.fold.forcePrune")
          .contains("true")
        if (force || ids.size * 4 <= buckets) scanDst(ids)
        else whole
      case None => whole
    }

  /** The shared frontier fold: re-iterate ONLY the dirty frontier
    * over the new frame `e` (plain `src, dst, w` — degrees are
    * joined per-path below), copying every other node's score from
    * the trace. `added` nodes (absent from the trace) enter at
    * round-0 mass `scale` and MUST be contained in `dirty1` (both
    * callers guarantee it) — being permanently dirty, their scores
    * are recomputed fresh every round and the filler they ride into
    * the patched view never survives the coalesce.
    *
    * ONE over-approximated frontier serves EVERY round:
    * `dirtyAll = ∪_{i<k} outNbr^i(dirty1)` (a short eager-cut
    * expansion pre-pass). Soundness is the existing containment
    * argument — the exact round-t dirty set is a subset of
    * `dirtyAll`, and recomputing a covered-but-unchanged node is
    * harmless (its inflow over the patched frame reproduces the
    * trace value bit-for-bit).
    *
    * The fold then SIZES the frontier and picks one of two
    * physically different (numerically identical) round strategies:
    *
    *  - BROADCAST (frontier ≤ `bcLimit`, the production small-delta
    *    profile): every hop, the frontier's in-edge extraction, the
    *    frontier sources' degree lookup, the per-round inflow and
    *    the trace patch are all broadcast-hash probes of scans —
    *    ZERO shuffles of the edge frame, and each round's one
    *    node-sized cost is the scan of the trace element it
    *    patches. Per-round state (the fresh scores) is eagerly cut
    *    and the superseded round released immediately.
    *  - SHUFFLE (a delta so large its frontier rivals the graph):
    *    the original semi-join rounds over the degree-pre-joined
    *    edge frame, composed into ONE lazy plan executed by the
    *    final cut — at that frontier size a broadcast would OOM the
    *    executors, and the full re-rank's economics apply anyway.
    *
    * Either way the final compose is ONE eager node-sized cut, so
    * every internal frame is released before returning — callers
    * can free their inputs the moment this returns.
    */
  private def foldCore(e: DataFrame, firstHop: Seq[DataFrame],
                       seeds: DataFrame, added: DataFrame,
                       trace: Seq[DataFrame],
                       num: Long, den: Long, scale: Long,
                       checkpointDir: Option[String],
                       maxBroadcastBytes: Long,
                       layout: Option[EdgeLayout] = None,
                       weighted: Boolean = true): DataFrame = {
    val addedRows = added.select(col("node"))
    foldDriver(e, firstHop, seeds, addedRows, trace, num, den,
      scale, checkpointDir, maxBroadcastBytes, layout, weighted)
      .getOrElse {
        // budget blown somewhere — the honest distributed plan:
        // cut-based frontier seeding, then shuffle rounds. With a
        // layout hint the seed hop probes only the seeds' partition
        // buckets (the hint implies the pure-addition form, where
        // the single first-hop frame IS `e`).
        val (srcs, sp) = cutTracked(seeds, checkpointDir)
        val hopFrames = layout match {
          case Some(_) => Seq(pruneOrWhole(layout, srcs, e))
          case None => firstHop
        }
        val hop1 = hopFrames.map(f =>
            f.join(srcs.withColumnRenamed("node", "__f"),
              f("src") === col("__f"))
            .select(f("dst").as("node")))
          .reduce(_ unionAll _)
        val (dirty1, dp) = cutTracked(
          hop1.unionAll(addedRows).distinct(), checkpointDir)
        val out = foldShuffle(e, trace, dirty1, addedRows, num, den,
          scale, checkpointDir, layout, weighted)
        release(dp)
        release(sp)
        out
      }
  }

  /** Rows admissible under a BYTE budget for a schema: budget
    * divided by the estimated row width (field defaultSizes + 16
    * bytes of per-row object overhead). A row cap alone (the first
    * cut's budget/32) under-priced wide frames: a hub source puts
    * one node in millions of collected in-edge ROWS whose
    * (src, dst, DECIMAL(38) w) width is several times 32 bytes, so
    * the driver materialized far past the budget while the node
    * COUNT stayed small — the skewed frontier must fall back to the
    * distributed rounds BEFORE collecting, not after.
    */
  private def byteRowLimit(
      schema: org.apache.spark.sql.types.StructType,
      maxBytes: Long): Long = {
    val width = schema.fields.map(_.dataType.defaultSize).sum + 16
    (maxBytes / width.max(1)).max(1L)
  }

  /** Collect one frame's rows within the byte budget (row cap =
    * [[byteRowLimit]] of the frame's own schema): `None` when it
    * holds more. The `limit(n+1)` bounds the collect ITSELF — an
    * over-budget frame costs one row past the limit, never a driver
    * OOM.
    */
  private def collectBounded(df: DataFrame, maxBytes: Long)
      : Option[Array[org.apache.spark.sql.Row]] = {
    val rowLimit = byteRowLimit(df.schema, maxBytes)
    val rows = df.limit((rowLimit + 1).min(Int.MaxValue).toInt)
      .collect()
    if (rows.length > rowLimit) None else Some(rows)
  }

  /** Run `body` with limit-collects executing as ONE single-wave job
    * — the default CollectLimit escalation (1 partition, then 4×…)
    * turns every bounded probe into up to five scheduler
    * round-trips. Restores the previous setting on exit.
    *
    * CONCURRENCY: this toggles a session-wide SQL conf
    * (`spark.sql.limit.initialNumPartitions`) for the duration of
    * the driver fold's bounded probes — a concurrent query on the
    * SAME SparkSession would observe the temporary value, and a
    * concurrent setter would be clobbered by the finally-restore.
    * The bounded probes cannot move to a cloned session (a DataFrame
    * is bound to the session that planned it), so the delta folds
    * carry the same precondition as the release machinery above:
    * one query at a time per session. The only effect of a violation
    * is a limit executing in one wave instead of escalating — a
    * scheduling detail, never a different answer.
    */
  private def withSingleWaveLimit[A](
      spark: org.apache.spark.sql.SparkSession)(body: => A): A = {
    val key = "spark.sql.limit.initialNumPartitions"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "1000000")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** A driver-resident node set as a one-column local frame — the
    * build side every bounded edge probe broadcasts.
    */
  private def localNodeFrame(
      spark: org.apache.spark.sql.SparkSession,
      nodes: Iterable[Any], name: String,
      dt: org.apache.spark.sql.types.DataType): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      nodes.map(n => org.apache.spark.sql.Row(n)).toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(name, dt))))
  }

  /** Driver-resident fold rounds — the small-delta production
    * profile. The broadcast budget is the admission test: a
    * frontier (plus its in-edges and their degree totals) inside
    * `maxBroadcastBytes` is BY DEFINITION driver-collectable — it is
    * exactly what every broadcast join would ship to the driver
    * anyway, so collect it ONCE and run the k rounds as exact BigInt
    * arithmetic with zero cluster round-trips (the distributed
    * variant paid a broadcast exchange and a checkpoint per round —
    * ~10 scheduler round-trips per iteration that dominate the fold
    * at small scale). Every collect is `limit`-bounded (see
    * [[collectBounded]]): past the budget the fold returns None and
    * the caller falls back to the distributed rounds.
    *
    * Cluster work that remains: one bounded probe of the edge scan
    * per BFS hop (expanding only the hop's NEW nodes — the closure
    * stops early when the frontier closes, e.g. cycles), one
    * in-edge extract, one degree aggregate, one scan of the
    * off-frontier sources' trace scores (all rounds in one tagged
    * union), and the ONE node-sized compose that patches the final
    * trace element — each a single job over the persisted frames.
    * Arithmetic is BigInt floor division — identical values to the
    * DECIMAL(38,0) plan (both are exact integer floors; spec- and
    * oracle-pinned).
    */
  private def foldDriver(e: DataFrame, firstHop: Seq[DataFrame],
                         seeds: DataFrame, addedRows: DataFrame,
                         trace: Seq[DataFrame],
                         num: Long, den: Long, scale: Long,
                         checkpointDir: Option[String],
                         maxBroadcastBytes: Long,
                         layout: Option[EdgeLayout] = None,
                         weighted: Boolean = true)
      : Option[DataFrame] = {
    val iterations = trace.length - 1
    val spark = e.sparkSession
    val nodeType = seeds.schema("node").dataType
    // with a layout hint, every src-keyed probe frame is the PRUNED
    // slice of the artifact for the probing frontier's buckets — the
    // bucket ids of a DRIVER-RESIDENT frontier evaluate through the
    // catalyst expressions with no cluster job ([[bucketIdsDriver]]);
    // without a hint, the probe scans `f` whole
    def srcProbe(f: DataFrame, frontier: Iterable[Any]): DataFrame =
      layout match {
        case Some(l) =>
          val ids = bucketIdsDriver(frontier, nodeType, l.buckets)
          val force = sys.props.get("graft.fold.forcePrune")
            .contains("true")
          if (force || ids.size * 4 <= l.buckets) l.scan(ids)
          else f
        case None => f
      }
    // the dst-keyed twin for the frontier in-edge extract — pruned
    // against the dst-partitioned companion artifact when the layout
    // carries one (see [[EdgeLayout.scanDst]])
    def dstProbe(f: DataFrame, frontier: Iterable[Any]): DataFrame =
      layout.flatMap(l => l.scanDst.map((l.buckets, _))) match {
        case Some((buckets, scanDst)) =>
          val ids = bucketIdsDriver(frontier, nodeType, buckets)
          val force = sys.props.get("graft.fold.forcePrune")
            .contains("true")
          if (force || ids.size * 4 <= buckets) scanDst(ids)
          else f
        case None => f
      }
    // cap for driver-resident NODE SETS (collected frames are capped
    // per-frame by collectBounded's own byte-derived row limit)
    val nodeLimit = (maxBroadcastBytes /
      (nodeType.defaultSize + 16)).max(1L)
    def localFrame(nodes: Iterable[Any], name: String): DataFrame =
      localNodeFrame(spark, nodes, name, nodeType)
    def big(d: java.math.BigDecimal): BigInt = BigInt(d.toBigInteger)
    withSingleWaveLimit(spark) { for {
      seedArr <- collectBounded(seeds.select(col("node")),
        maxBroadcastBytes)
      addedArr <- collectBounded(addedRows, maxBroadcastBytes)
      // dirty₁ = the seeds' out-neighbors in every first-hop frame
      // (the refresh form probes BOTH the old and new frames — a
      // removal dirties nodes the new frame no longer reaches from
      // that source), plus every added node
      d1 <- {
        val seedSet = seedArr.map(_.get(0)).toSet
        val sf = localFrame(seedSet, "__f")
        // the layout hint implies the pure-addition form, whose one
        // first-hop frame IS `e` — probe its pruned slice instead
        val hopFrames = layout match {
          case Some(_) => Seq(srcProbe(e, seedSet))
          case None => firstHop
        }
        hopFrames.foldLeft(
            Option(addedArr.map(_.get(0)).toSet)) { (acc, f) =>
          acc.flatMap(s =>
            collectBounded(
              f.join(broadcast(sf), f("src") === col("__f"))
                .select(f("dst").as("node")), maxBroadcastBytes)
              .map(rows => s ++ rows.iterator.map(_.get(0))))
        }.filter(_.size <= nodeLimit)
      }
      // depth-bounded BFS union, expanding each node ONCE (a node
      // first reached at depth d contributes its out-neighbors at
      // depth d+1 — fresh-only expansion IS the layered union) and
      // stopping early when the frontier closes. (A fused all-hops
      // plan was tried and reverted: chained joins either shuffle
      // the whole edge frame per level — measured 5 × 13.6 MB edge
      // exchanges where this loop has zero — or, broadcast-hinted,
      // pay one broadcast-build job per level, the same scheduler
      // round-trips this loop already pays.)
      all <- {
        var acc = d1
        var frontier = acc
        var hop = 2
        var blown = false
        while (hop <= iterations && frontier.nonEmpty && !blown) {
          val fr = localFrame(frontier, "__f")
          val pe = srcProbe(e, frontier)
          collectBounded(
            pe.join(broadcast(fr), pe("src") === col("__f"))
              .select(pe("dst").as("node")), maxBroadcastBytes) match {
            case Some(rows) =>
              val next = rows.map(_.get(0)).toSet -- acc
              acc ++= next
              frontier = next
              if (acc.size > nodeLimit) blown = true
            case None => blown = true
          }
          hop += 1
        }
        if (blown) None else Some(acc)
      }
      // the frontier's in-edges (src, dst[, w]) — the only edges
      // whose shares can change a frontier score; with a dst-
      // partitioned companion artifact this probe reads only the
      // frontier's dst buckets instead of the artifact whole
      fE <- {
        val ie = dstProbe(e, all)
        collectBounded(
          ie.join(broadcast(localFrame(all, "__t")),
            ie("dst") === col("__t"))
          .select(Seq(ie("src").as("src"), ie("dst").as("dst")) ++
            (if (weighted) Seq(ie("w")) else Nil): _*),
          maxBroadcastBytes)
      }
      // out-degree TOTALS for frontier-in-edge sources only (each
      // source's full out-edge sum — aggregated cluster-side, so the
      // collect is source-set-sized even for hub sources; unweighted
      // degrees are long counts, w ≡ 1 sums exactly)
      srcsF = fE.map(_.get(0)).toSet
      degRows <- {
        val sFrame = localFrame(srcsF, "__s")
        val de = srcProbe(e, srcsF)
        collectBounded(
          de.join(broadcast(sFrame), de("src") === col("__s"))
          .groupBy(de("src").as("src"))
          .agg((if (weighted) sum(col("w")) else count(lit(1)))
            .cast(Dec).as("deg")), maxBroadcastBytes)
      }
      // prior-round trace scores for sources OUTSIDE the frontier
      // (frontier scores are recomputed; round 0 is `scale`
      // everywhere by the unseeded precondition) — all rounds in ONE
      // tagged-union scan
      addedSet = addedArr.map(_.get(0)).toSet
      outside = srcsF -- all -- addedSet
      traceScores <- {
        if (iterations < 2 || outside.isEmpty)
          Some(Map.empty[(Int, Any), BigInt])
        else {
          val tagged = (1 until iterations).map(t =>
              trace(t).select(lit(t).as("__rt"), col("node"),
                col("pr")))
            .reduce(_ unionAll _)
          collectBounded(
            tagged.join(broadcast(localFrame(outside, "node")),
              Seq("node"))
            .select(col("__rt"), col("node"), col("pr")),
            maxBroadcastBytes)
            .map(_.map(r => (r.getInt(0), r.get(1)) ->
              big(r.getDecimal(2))).toMap)
        }
      }
    } yield {
      val edges =
        if (weighted)
          fE.map(r => (r.get(0), r.get(1), big(r.getDecimal(2))))
        else fE.map(r => (r.get(0), r.get(1), BigInt(1)))
      val deg = degRows.map(r => r.get(0) -> big(r.getDecimal(1)))
        .toMap
      val baseB = BigInt(den - num) * BigInt(scale) / BigInt(den)
      val numB = BigInt(num)
      val denB = BigInt(den)
      val scaleB = BigInt(scale)
      // k rounds of exact BigInt floor arithmetic over the collected
      // frontier — identical recurrence to the distributed plan
      var fresh: Map[Any, BigInt] = null
      for (t <- 1 to iterations) {
        def prevScore(n: Any): BigInt =
          if (t == 1) scaleB // round 0: `scale` everywhere (added too)
          else if (all.contains(n) || addedSet.contains(n)) fresh(n)
          else traceScores((t - 1, n))
        val inflow = new scala.collection.mutable.HashMap[Any, BigInt]()
        edges.foreach { case (s, d, w) =>
          val share = prevScore(s) * w / deg(s)
          inflow.update(d, inflow.getOrElse(d, BigInt(0)) + share)
        }
        fresh = (all ++ addedSet).iterator.map(n =>
          n -> (baseB + numB * inflow.getOrElse(n, BigInt(0)) / denB))
          .toMap
      }
      // the ONE node-sized compose: patch the final trace element
      // (plus added-node filler rows, always overwritten — added ⊆
      // fresh) with the driver-computed frontier scores
      if (fresh == null) fresh = Map.empty // 1-element trace: no rounds
      val freshRows = fresh.iterator.map { case (n, v) =>
        org.apache.spark.sql.Row(n,
          new java.math.BigDecimal(v.bigInteger))
      }.toSeq
      import scala.jdk.CollectionConverters._
      val freshFrame = spark.createDataFrame(freshRows.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node", nodeType),
          org.apache.spark.sql.types.StructField("__npr",
            org.apache.spark.sql.types.DataTypes
              .createDecimalType(38, 0)))))
      val full = trace(iterations).select(col("node"), col("pr"))
        .unionAll(addedRows.select(col("node"),
          lit(0L).cast(Dec).as("pr")))
      val (out, _) = cutTracked(
        full.join(broadcast(freshFrame), Seq("node"), "left")
          .select(col("node"),
            coalesce(col("__npr"), col("pr")).as("pr")),
        checkpointDir)
      out
    } }
  }

  /** Distributed fold rounds — the large-frontier fallback: cut-based
    * frontier expansion (AQE sizes each join off the checkpointed
    * frames' real stats, broadcasting what fits) followed by
    * semi-join rounds over the degree-pre-joined edge frame.
    */
  private def foldShuffle(e: DataFrame, trace: Seq[DataFrame],
                          dirty1: DataFrame, addedRows: DataFrame,
                          num: Long, den: Long, scale: Long,
                          checkpointDir: Option[String],
                          layout: Option[EdgeLayout] = None,
                          weighted: Boolean = true)
      : DataFrame = {
    val iterations = trace.length - 1
    val base = lit((BigInt(den - num) * BigInt(scale) / BigInt(den))
      .toString).cast(Dec)
    val pins = Seq.newBuilder[RDD[_]]
    var hop = dirty1
    var frontierUnion = dirty1
    for (_ <- 2 to iterations) {
      // with a layout hint each hop reads ONLY the frontier's
      // partition buckets — frontier-proportional file I/O per hop
      // instead of a full artifact scan (the bucket-id aggregate is
      // one tiny job over the checkpointed hop frame)
      val he = pruneOrWhole(layout, hop, e)
      val hopFrame = he.join(hop.withColumnRenamed("node", "__f"),
          he("src") === col("__f"))
        .select(he("dst").as("node")).distinct()
      foldAudit("hop", hopFrame)
      val (h2, hp) = cutTracked(hopFrame, checkpointDir)
      pins ++= hp
      hop = h2
      frontierUnion = frontierUnion.unionAll(hop)
    }
    val dirtyAll =
      if (iterations <= 1) dirty1
      else {
        val (da, dap) = cutTracked(frontierUnion.distinct(),
          checkpointDir)
        pins ++= dap
        da
      }
    val out = foldRoundsShuffle(e, trace, dirtyAll, addedRows, num,
      den, scale, base, checkpointDir, layout, weighted)
    release(pins.result())
    out
  }

  /** Shuffle-side fold rounds (see [[foldCore]]) — the
    * large-frontier fallback. The frontier's in-edges are extracted
    * ONCE, with each source's FULL out-degree total pre-joined, and
    * eagerly cut: the k rounds then scan that frontier-proportional
    * frame and never the full edge frame (the earlier shape
    * persisted the ENTIRE degree-joined edge frame and re-scanned
    * it every round — O(graph) × k bytes instead of O(frontier) × k;
    * with a layout hint even the one-off degree extract prunes to
    * the frontier sources' partition buckets). What the single
    * frontier BUYS is linear lineage: each round's `fresh` frame is
    * referenced exactly once (by the next round's source scores), so
    * no per-round checkpoint is needed at all — the whole k-round
    * fold composes into ONE lazy plan (k frontier-sized joins +
    * aggregations over scans of the cut frames) executed by the
    * final frontier cut as a single cluster action.
    *
    * NO node-sized shuffle anywhere: each round reads the trace
    * element only to look up the scores of NEVER-DIRTY frontier
    * in-edge sources (`srcsOut`, frontier-sized) — the trace scan
    * joins that set directly, so when the trace is a node-BUCKETED
    * table the scan reaches its join without an Exchange over it
    * (the frontier-sized side shuffles into the trace's bucketing
    * instead; the earlier shape unioned the full trace with added
    * rows first, which erased the bucketing and re-shuffled the
    * node-sized union every round). The one node-sized pass left is
    * the closing patch of trace(k) — same no-trace-shuffle shape —
    * against the ONE frontier-sized cut of the final fresh scores.
    * A full re-rank pays an edge-sized shuffle join and a node-sized
    * checkpoint EVERY round; the fold pays frontier-sized shuffles
    * and ONE node-sized (shuffle-free) compose.
    */
  private def foldRoundsShuffle(e: DataFrame, trace: Seq[DataFrame],
                                dirtyAll: DataFrame,
                                addedRows: DataFrame,
                                num: Long, den: Long, scale: Long,
                                base: Column,
                                checkpointDir: Option[String],
                                layout: Option[EdgeLayout] = None,
                                weighted: Boolean = true)
      : DataFrame = {
    val iterations = trace.length - 1
    // frontier in-edges, extracted once — the only edges whose
    // shares can move a dirty score (unweighted frames carry no w).
    // With a dst-partitioned companion artifact the extract prunes
    // to the frontier's dst buckets — the last fold scan that used
    // to read the artifact whole
    val ie = pruneDstOrWhole(layout, dirtyAll, e)
    val inEdgeFrame = ie.join(
        dirtyAll.withColumnRenamed("node", "__t"),
        ie("dst") === col("__t"))
      .select(Seq(ie("src").as("src"), ie("dst").as("dst")) ++
        (if (weighted) Seq(ie("w")) else Nil): _*)
    foldAudit("inedge", inEdgeFrame)
    val (eF, eFPins) = cutTracked(inEdgeFrame, checkpointDir)
    val (srcsF, sFPins) = cutTracked(
      eF.select(col("src").as("node")).distinct(), checkpointDir)
    // out-degree TOTALS for frontier-in-edge sources only — summed
    // over each source's full out-edge set (a function of src, so a
    // layout hint prunes this scan to those sources' buckets);
    // unweighted degrees are long counts (w ≡ 1 sums exactly)
    val degE = pruneOrWhole(layout, srcsF, e)
    val degF = degE.join(srcsF.withColumnRenamed("node", "__s"),
        degE("src") === col("__s"))
      .groupBy(degE("src").as("__dn"))
      .agg((if (weighted) sum(degE("w")) else count(lit(1)))
        .cast(Dec).as("deg"))
    val (eFD, eFDPins) = cutTracked(
      eF.join(degF, col("__dn") === eF("src"))
        .select(Seq(eF("src").as("src"), eF("dst").as("dst")) ++
          (if (weighted) Seq(eF("w")) else Nil) :+ col("deg"): _*),
      checkpointDir)
    release(eFPins)
    // frontier-source split, cut once and read every round: sources
    // whose score the trace supplies verbatim (never dirty) vs
    // sources recomputed each round
    val (srcsOut, oPins) = cutTracked(
      srcsF.join(dirtyAll, Seq("node"), "left_anti"), checkpointDir)
    val (srcsIn, iPins) = cutTracked(
      srcsF.join(dirtyAll, Seq("node"), "left_semi"), checkpointDir)
    // per-round source scores, RESTRICTED to frontier in-edge
    // sources (the inflow join reads nothing else — the earlier
    // shape built the full patched node view per round): trace
    // scores for never-dirty sources, the previous round's fresh
    // scores for dirty ones. Round 0 is the unseeded precondition —
    // trace(0) for old nodes, `scale` for added ones (added nodes
    // are absent from every trace element).
    def srcScores(t: Int, fresh: Option[DataFrame]): DataFrame =
      fresh match {
        case None =>
          trace(0).select(col("node"), col("pr"))
            .join(srcsF, Seq("node"))
            .unionAll(addedRows.join(srcsF, Seq("node"))
              .select(col("node"), lit(scale).cast(Dec).as("pr")))
        case Some(f) =>
          trace(t).select(col("node"), col("pr"))
            .join(srcsOut, Seq("node"))
            .unionAll(f.join(srcsIn, Seq("node"))
              .select(col("node"), col("__npr").as("pr")))
      }
    var fresh: Option[DataFrame] = None
    for (t <- 1 to iterations) {
      val prev = srcScores(t - 1, fresh)
      val inflow = eFD
        .join(prev.select(col("node").as("__sn"), col("pr")),
          col("__sn") === eFD("src"))
        .select(eFD("dst").as("node"),
          (if (weighted) floorDiv(col("pr") * eFD("w"), eFD("deg"))
           else floorDiv(col("pr"), eFD("deg"))).as("share"))
        .groupBy(col("node"))
        .agg(sum(col("share")).cast(Dec).as("inflow"))
      // NOT cut: single-reference linear chain (see scaladoc)
      fresh = Some(dirtyAll.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (base + floorDiv(lit(num).cast(Dec) *
            coalesce(col("inflow"), lit(0).cast(Dec)),
            lit(den).cast(Dec))).as("__npr")))
    }
    // cut the final fresh scores ONCE (frontier-sized — the fold's
    // one cluster action over the k-round lazy chain) so the closing
    // node-sized patch can reference them twice without duplicating
    // the chain
    val (freshCut, fcPins) = cutTracked(fresh.get, checkpointDir)
    // the closing patch: trace(k) coalesced against the fresh
    // scores (dirty nodes win), plus the added nodes — present only
    // in the fresh frame — appended from it directly. No union sits
    // below the join, so a bucketed trace scan reaches the join
    // unshuffled.
    val compose = trace(iterations).select(col("node"), col("pr"))
      .join(freshCut, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("__npr"), col("pr")).as("pr"))
      .unionAll(freshCut.join(addedRows, Seq("node"), "left_semi")
        .select(col("node"), col("__npr").as("pr")))
    foldAudit("compose", compose)
    val (out, _) = cutTracked(compose, checkpointDir)
    release(eFDPins ++ fcPins ++ oPins ++ iPins ++ sFPins)
    out
  }

  /** How hot is the hottest reduce key? `Some(warning)` when one
    * `dst` holds more than `num/den` of all edges (default 1/8) in a
    * graph of at least `minEdges` edges (tiny graphs never warn) —
    * the pre-flight a rank run reads before committing a cluster to
    * N iterations over a star-shaped frame. One aggregate, two
    * numbers; compared by exact cross-multiplication.
    */
  def skewPreflight(edges: DataFrame, num: Long = 1L, den: Long = 8L,
                    minEdges: Long = 10000L): Option[String] = {
    require(num > 0 && den > 0, s"need a positive ratio: $num/$den")
    val r = edges.groupBy(col("dst"))
      .agg(count(lit(1)).as("c"))
      .agg(coalesce(max(col("c")), lit(0L)).as("mx"),
        coalesce(sum(col("c")), lit(0L)).cast("long").as("tot"))
      .head()
    val (mx, tot) = (r.getLong(0), r.getLong(1))
    if (tot >= minEdges && mx * den >= tot * num)
      Some(s"pagerank degree skew: hottest in-degree key holds " +
        s"$mx of $tot edges (>= $num/$den) — one reducer clocks " +
        "every round; consider AQE skew handling, or pass " +
        "inflowSalt > 1 to pagerank/pagerankTrace for a two-stage " +
        "(dst, salt) inflow sum (identical scores, spec-pinned)")
    else None
  }

  /** `iterations` rounds of HITS (Kleinberg, JACM 1999) in exact
    * scaled integers: authority = inflow of hub mass, hub = outflow
    * of authority mass, each half-step renormalized to total mass
    * `scale` by exact floor division (sum-normalization — L1, not
    * the classic L2, which would need a square root; rankings are
    * unaffected and the arithmetic stays engine-exact):
    * {{{
    *   a_raw(v) = Σ_{u→v} h(u);  a(v) = floor(a_raw(v)·scale / Σ a_raw)
    *   h_raw(u) = Σ_{u→v} a(v);  h(u) = floor(h_raw(u)·scale / Σ h_raw)
    * }}}
    * Nodes outside the edge frame's src (resp. dst) side hold hub
    * (resp. authority) 0. Returns `(node, hub, auth)`.
    *
    * Shape: per iteration TWO edges⋈scores joins + two keyed sums +
    * two 1-row total broadcasts; one localCheckpoint per iteration,
    * the superseded round released as the next lands. An edge frame
    * with no edges is rejected up front (both totals would be zero).
    */
  def hits(edges: DataFrame, iterations: Int = 2,
           scale: Long = 1000000L,
           checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1 && iterations <= 16,
      s"driver-looped plan growth is specified for 1..16 " +
        s"iterations: $iterations")
    val e = edges.select(col("src"), col("dst"))
      .repartition(shuffleWidth(edges), col("src")).persist()
    val (nodes, nodesPins) = cutTracked(
      e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct(), checkpointDir)
    val sc = lit(scale).cast(Dec)
    var (scores, scoresPins) = cutTracked(
      nodes.select(col("node"), sc.as("hub"), sc.as("auth")),
      checkpointDir)
    for (_ <- 1 to iterations) {
      val aRaw = e.join(scores.select(col("node"), col("hub")),
          e("src") === col("node"))
        .groupBy(e("dst").as("node"))
        .agg(sum(col("hub")).cast(Dec).as("a_raw"))
      val aTot = aRaw.agg(
        coalesce(sum(col("a_raw")), lit(0)).cast(Dec).as("at"))
      val (withA, withAPins) = cutTracked(nodes
        .join(aRaw, Seq("node"), "left")
        .crossJoin(broadcast(aTot))
        .select(col("node"),
          when(col("a_raw").isNull || col("at") <= 0,
            lit(0).cast(Dec))
            .otherwise(floorDiv(col("a_raw") * sc, col("at")))
            .as("auth")), checkpointDir)
      val hRaw = e.join(withA.select(col("node"), col("auth")),
          e("dst") === col("node"))
        .groupBy(e("src").as("node"))
        .agg(sum(col("auth")).cast(Dec).as("h_raw"))
      val hTot = hRaw.agg(
        coalesce(sum(col("h_raw")), lit(0)).cast(Dec).as("ht"))
      val (next, nextPins) = cutTracked(withA
        .join(hRaw, Seq("node"), "left")
        .crossJoin(broadcast(hTot))
        .select(col("node"),
          when(col("h_raw").isNull || col("ht") <= 0,
            lit(0).cast(Dec))
            .otherwise(floorDiv(col("h_raw") * sc, col("ht")))
            .as("hub"),
          col("auth")), checkpointDir)
      // both the half-step and the superseded round are dead now
      release(withAPins)
      release(scoresPins)
      scores = next
      scoresPins = nextPins
    }
    e.unpersist()
    release(nodesPins)
    scores.select(col("node"), col("hub"), col("auth"))
  }

  /** HITS with DEFERRED normalization: raw power iteration
    * (Kleinberg's original formulation — per-round normalization
    * exists only for float stability, which exact integers don't
    * need), L1-normalized to total mass `scale` ONCE at the end:
    * {{{
    *   h_0(u)  = 1
    *   a_t(v)  = Σ_{u→v} h_{t−1}(u)
    *   h_t(u)  = Σ_{u→v} a_t(v)
    *   auth(v) = floor(a_k(v)·scale / Σ a_k);  hub likewise
    * }}}
    * Same ranking family as [[hits]] (each round's raw frame is a
    * positive scalar multiple of the renormalized one in real
    * arithmetic); the raw linear recurrences are what make an
    * incremental fold possible — [[hitsDelta]] folds an edge batch
    * against a [[hitsTrace]] run, which the per-round floor
    * renormalization forbids (every round's divisor is global, so
    * no change stays local).
    *
    * Growth is PRICED up front: raw scores grow like Din^t·Dout^t,
    * so the one-aggregate pre-flight bounds a_k ≤ N·Din^k·Dout^(k−1)
    * (and h_k ≤ N·Din^k·Dout^k) in BigInt and refuses iterations
    * DECIMAL(38,0) cannot hold, naming the knobs (fewer iterations,
    * or the per-round-normalized [[hits]]).
    */
  def hitsDeferred(edges: DataFrame, iterations: Int = 2,
                   scale: Long = 1000000L,
                   checkpointDir: Option[String] = None): DataFrame =
    normalizeHits(hitsTraceImpl(edges, iterations, checkpointDir,
      keepTrace = false).last, scale)

  /** [[hitsDeferred]]'s full per-round raw trace: element t holds
    * `(node, a_raw, h_raw)` AFTER t rounds (element 0 = the initial
    * placement: h_raw = 1, a_raw = 0), each materialized and
    * lineage-cut — the artifact [[hitsDelta]] folds edge batches
    * against. Every element stays pinned (the caller owns the
    * artifact).
    */
  def hitsTrace(edges: DataFrame, iterations: Int = 2,
                checkpointDir: Option[String] = None)
      : Seq[DataFrame] =
    hitsTraceImpl(edges, iterations, checkpointDir, keepTrace = true)

  private def hitsTraceImpl(edges: DataFrame, iterations: Int,
                            checkpointDir: Option[String],
                            keepTrace: Boolean)
      : Seq[DataFrame] = {
    require(iterations >= 1 && iterations <= 16,
      s"driver-looped plan growth is specified for 1..16 " +
        s"iterations: $iterations")
    val e = edges.select(col("src"), col("dst"))
      .repartition(shuffleWidth(edges), col("src")).persist()
    hitsGrowthPreflight(e, iterations)
    val (nodes, nodesPins) = cutTracked(
      e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct(), checkpointDir)
    var (state, statePins) = cutTracked(nodes.select(col("node"),
      lit(0).cast(Dec).as("a_raw"),
      lit(1).cast(Dec).as("h_raw")), checkpointDir)
    val trace = Seq.newBuilder[DataFrame]
    trace += state
    for (_ <- 1 to iterations) {
      val aRaw = e.join(state.select(col("node"), col("h_raw")),
          e("src") === col("node"))
        .groupBy(e("dst").as("node"))
        .agg(sum(col("h_raw")).cast(Dec).as("__a"))
      val (withA, withAPins) = cutTracked(
        nodes.join(aRaw, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__a"), lit(0).cast(Dec)).as("a_raw")),
        checkpointDir)
      val hRaw = e.join(withA.select(col("node"), col("a_raw")),
          e("dst") === col("node"))
        .groupBy(e("src").as("node"))
        .agg(sum(col("a_raw")).cast(Dec).as("__h"))
      val (next, nextPins) = cutTracked(
        withA.join(hRaw, Seq("node"), "left")
        .select(col("node"), col("a_raw"),
          coalesce(col("__h"), lit(0).cast(Dec)).as("h_raw")),
        checkpointDir)
      release(withAPins)
      if (!keepTrace) release(statePins)
      state = next
      statePins = nextPins
      trace += state
    }
    e.unpersist()
    release(nodesPins)
    trace.result()
  }

  /** Fold a batch of NEW edges into a completed [[hitsTrace]] run —
    * the q169 delta discipline applied to HITS. Result is spec- and
    * oracle-pinned EXACTLY equal to
    * `hitsDeferred(edges ∪ delta, iterations)`.
    *
    * Why this folds where [[hits]] cannot: the raw recurrences are
    * LINEAR with no global term, so round t's a_raw changes only at
    * nodes whose in-multiset changed (dsts(Δ)) or with an
    * in-neighbor whose h_raw changed, and h_raw likewise through
    * out-edges — two alternating frontiers, expanded through E∪Δ.
    * New nodes are allowed (they enter at h_0 = 1, permanently
    * dirty — no global base to rebase, unlike PageRank's teleport).
    * The final L1 normalization is global but O(nodes): two scalar
    * aggregates over the composed final frame.
    *
    * Trace-consistency pre-flight (`require`d): round 0 must be the
    * canonical placement (a_raw = 0, h_raw = 1 everywhere) and must
    * COVER the base frame's node set — a trace built from a
    * different edge frame would otherwise fold silently into wrong
    * scores.
    *
    * Per-round work is frontier-proportional TWICE over: the
    * frontiers' in/out edge sets are extracted by broadcast probes
    * of the persisted edge scan when they fit `maxBroadcastBytes`
    * (zero edge shuffles — each half-round's node-sized cost is one
    * streamed trace-element scan), degrading per-join to shuffles
    * past the budget; and per-round state (fresh a/h scores, the
    * next frontiers) is eagerly cut with the superseded round
    * released immediately. The full raw frames stay lazy trace-join
    * views, composed once at the end.
    */
  def hitsDelta(edges: DataFrame, delta: DataFrame,
                trace: Seq[DataFrame],
                scale: Long = 1000000L,
                checkpointDir: Option[String] = None,
                maxBroadcastBytes: Long = 128L << 20): DataFrame = {
    // >= 2 for the same reason as pagerankDelta: zero-round folds
    // have path-dependent added-node filler — refuse
    require(trace.length >= 2,
      "need a hitsTrace run (round 0 + >=1 iteration) to fold into")
    val iterations = trace.length - 1
    // width-normalized caches (the pagerankTrace e0 note); the
    // combined frame stays a lazy union of the two — persisting it
    // separately would double the cached bytes for zero scans saved.
    // Coalesce, not repartition: every fold probe broadcasts the
    // frontier side, so src-hash partitioning buys nothing here and
    // the up-front edge shuffle was pure cost (the pagerankDelta
    // finding).
    val eOld = edges.select(col("src"), col("dst"))
      .coalesce(shuffleWidth(edges)).persist()
    val eDelta = delta.select(col("src"), col("dst"))
      .coalesce(shuffleWidth(delta)).persist()
    val e = eOld.unionAll(eDelta)
    // ALL pre-flights from ONE shuffle (the pagerankDelta flag-pass
    // discipline, ported): endpoint-role flags per node PLUS the
    // out-degree count — the old shape paid FOUR eager cuts (base
    // nodes, added, delta srcs, delta dsts, each a distinct +
    // checkpoint over an edge scan) plus a growth-preflight
    // aggregate plus a trace-probe collect, six corpus-touching
    // actions before folding anything. Now: one exploded scan of
    // each frame → one node-keyed aggregate, cut ONCE; every node
    // set below is a filter over the cached flags, and the growth
    // bound + trace-consistency probe ride one combined collect.
    val (flags, flagPins) = cutTracked(
      endpointRoles(eOld, 1, 2)
        .unionAll(endpointRoles(eDelta, 4, 8))
        .groupBy(col("node"))
        .agg(max(when(col("r") === 1, 1).otherwise(0)).as("os"),
          max(when(col("r") === 2, 1).otherwise(0)).as("od"),
          max(when(col("r") === 4, 1).otherwise(0)).as("ds"),
          max(when(col("r") === 8, 1).otherwise(0)).as("dd"),
          sum(when(col("r") === 1 || col("r") === 4, 1L)
            .otherwise(0L)).as("outc")), checkpointDir)
    val inOld = col("os") === 1 || col("od") === 1
    val isAdded = (col("ds") === 1 || col("dd") === 1) && !inOld
    // growth bound (a_k ≤ N·Din^k·Dout^(k−1) in DECIMAL(38,0) —
    // the hitsGrowthPreflight arithmetic, stats read off the flags)
    // and trace-consistency (canonical round 0 covering the base
    // node set) in ONE action
    val pre = flags
      .join(trace.head.select(col("node"), lit(1).as("__cov")),
        Seq("node"), "left")
      .agg(coalesce(max(col("outc")), lit(0L)).as("dout"),
        coalesce(sum(col("outc")), lit(0L)).cast("long").as("m"),
        count(when(inOld && col("__cov").isNull, 1))
          .as("uncovered_base_node"))
      .crossJoin(broadcast(trace.head
        .where(!(col("a_raw") === lit(0).cast(Dec) &&
          col("h_raw") === lit(1).cast(Dec)))
        .agg(count(lit(1)).as("noncanonical_round0"))))
      .head()
    hitsGrowthCheck(pre.getLong(0), pre.getLong(1), iterations,
      () => e.groupBy(col("dst")).agg(count(lit(1)).as("c"))
        .agg(coalesce(max(col("c")), lit(0L)).as("din"))
        .head().getLong(0))
    val probe = Seq("noncanonical_round0", "uncovered_base_node")
      .map(k => k -> pre.getLong(pre.fieldIndex(k)))
      .filter(_._2 > 0).toMap
    require(probe.isEmpty,
      "hitsDelta: trace mismatch — " + probe.map {
        case ("noncanonical_round0", n) => s"$n round-0 rows " +
          "differ from the canonical placement (a_raw = 0, " +
          "h_raw = 1) — not a hitsTrace round 0"
        case ("uncovered_base_node", n) => s"$n base-frame nodes " +
          "missing from trace round 0 — the trace was built from " +
          "a different edge frame"
        case (k, n) => s"$n × $k"
      }.mkString("; ") + "; rebuild the trace with hitsTrace")
    val added = flags.where(isAdded).select(col("node"))
    val addedRows = added
    val dSrcs = flags.where(col("ds") === 1 || isAdded)
      .select(col("node"))
    val dDsts = flags.where(col("dd") === 1 || isAdded)
      .select(col("node"))
    val pins = Seq.newBuilder[RDD[_]]
    pins ++= flagPins
    // driver-resident fold (the foldDriver rationale: a
    // budget-bounded frontier is what every broadcast would ship to
    // the driver anyway — collect it once, run the alternating
    // rounds as BigInt arithmetic, pay one compose + normalize)
    hitsDeltaDriver(e, dSrcs, dDsts, addedRows, trace, scale,
      checkpointDir, maxBroadcastBytes) match {
      case Some(out) =>
        release(pins.result())
        eOld.unpersist()
        eDelta.unpersist()
        return out
      case None => ()
    }
    def small(df: DataFrame, p: Seq[RDD[_]]): Boolean =
      fitsBroadcast(df, p, maxBroadcastBytes)
    def mb(df: DataFrame, isSmall: Boolean): DataFrame =
      if (isSmall) broadcast(df) else df
    // lazy raw-frame views: trace round t plus added-node filler
    // (h_0 = 1 like every node; later rounds' filler is never
    // visible — added nodes sit in every frontier). Fresh patches
    // are frontier-sized cuts, broadcast when they fit.
    def view(t: Int, freshA: Option[(DataFrame, Boolean)],
             freshH: Option[(DataFrame, Boolean)]): DataFrame = {
      val hFill = lit(if (t == 0) 1L else 0L).cast(Dec)
      val full = trace(t)
        .select(col("node"), col("a_raw"), col("h_raw"))
        .unionAll(addedRows.select(col("node"),
          lit(0).cast(Dec).as("a_raw"), hFill.as("h_raw")))
      val withA = freshA match {
        case Some((f, s)) => full.join(mb(f, s), Seq("node"), "left")
          .select(col("node"),
            coalesce(col("__na"), col("a_raw")).as("a_raw"),
            col("h_raw"))
        case None => full
      }
      freshH match {
        case Some((f, s)) => withA.join(mb(f, s), Seq("node"), "left")
          .select(col("node"), col("a_raw"),
            coalesce(col("__nh"), col("h_raw")).as("h_raw"))
        case None => withA
      }
    }
    var dirtyA = dDsts
    var dirtyASmall = small(dirtyA, flagPins)
    var freshA: Option[(DataFrame, Boolean)] = None
    var freshH: Option[(DataFrame, Boolean)] = None
    var roundPins: Seq[RDD[_]] = Nil
    for (t <- 1 to iterations) {
      val prev = view(t - 1, freshA, freshH)
      val nextPins = Seq.newBuilder[RDD[_]]
      // the a-frontier's IN-edges, extracted once: feeds both the
      // fresh a_t aggregation and the h-frontier derivation
      val (fEa, feaP) = cutTracked(
        e.join(mb(dirtyA.withColumnRenamed("node", "__t"),
            dirtyASmall), e("dst") === col("__t"))
        .select(e("src").as("src"), e("dst").as("dst")),
        checkpointDir)
      nextPins ++= feaP
      val feaSmall = small(fEa, feaP)
      // fresh a_t over the a-frontier: sum of in-neighbors' patched
      // h_{t−1} (no in-edges → 0). Small in-edge set → stream the
      // node-sized view once through a broadcast probe.
      val aIn =
        if (feaSmall)
          prev.select(col("node").as("__sn"), col("h_raw"))
            .join(broadcast(fEa), col("__sn") === fEa("src"))
            .groupBy(fEa("dst").as("node"))
            .agg(sum(col("h_raw")).cast(Dec).as("__s"))
        else
          fEa.join(prev.select(col("node").as("__sn"),
              col("h_raw")), col("__sn") === fEa("src"))
            .groupBy(fEa("dst").as("node"))
            .agg(sum(col("h_raw")).cast(Dec).as("__s"))
      val (fa2, faP) = cutTracked(
        dirtyA.join(mb(aIn, dirtyASmall), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__s"), lit(0).cast(Dec)).as("__na")),
        checkpointDir)
      nextPins ++= faP
      val fa2Small = dirtyASmall
      // h-frontier at t: delta sources ∪ in-neighbors (via src) of
      // the a-frontier ∪ added — read off the extracted in-edge set
      val (dirtyH, dhP) = cutTracked(
        fEa.select(col("src").as("node"))
        .unionAll(dSrcs.select(col("node")))
        .distinct(), checkpointDir)
      nextPins ++= dhP
      val dirtyHSmall = small(dirtyH, dhP)
      val cur = view(t, Some((fa2, fa2Small)), None)
      // the h-frontier's OUT-edges, extracted once: feeds the fresh
      // h_t aggregation and (inside the loop) the next a-frontier
      val (fEh, fehP) = cutTracked(
        e.join(mb(dirtyH.withColumnRenamed("node", "__f"),
            dirtyHSmall), e("src") === col("__f"))
        .select(e("src").as("src"), e("dst").as("dst")),
        checkpointDir)
      nextPins ++= fehP
      val fehSmall = small(fEh, fehP)
      val hOut =
        if (fehSmall)
          cur.select(col("node").as("__dn"), col("a_raw"))
            .join(broadcast(fEh), col("__dn") === fEh("dst"))
            .groupBy(fEh("src").as("node"))
            .agg(sum(col("a_raw")).cast(Dec).as("__s"))
        else
          fEh.join(cur.select(col("node").as("__dn"),
              col("a_raw")), col("__dn") === fEh("dst"))
            .groupBy(fEh("src").as("node"))
            .agg(sum(col("a_raw")).cast(Dec).as("__s"))
      val (fh2, fhP) = cutTracked(
        dirtyH.join(mb(hOut, dirtyHSmall), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__s"), lit(0).cast(Dec)).as("__nh")),
        checkpointDir)
      nextPins ++= fhP
      if (t < iterations) {
        // a-frontier at t+1: delta dsts ∪ out-neighbors of the
        // h-frontier ∪ added — read off the extracted out-edge set
        val (da2, daP) = cutTracked(
          fEh.select(col("dst").as("node"))
          .unionAll(dDsts.select(col("node")))
          .distinct(), checkpointDir)
        nextPins ++= daP
        dirtyA = da2
        dirtyASmall = small(dirtyA, daP)
      }
      // everything from round t−1 is dead once round t's cuts landed
      release(roundPins)
      roundPins = nextPins.result()
      freshA = Some((fa2, fa2Small))
      freshH = Some((fh2, dirtyHSmall))
    }
    val (composed, _) = cutTracked(view(iterations, freshA, freshH),
      checkpointDir)
    val out = normalizeHits(composed, scale)
    release(roundPins)
    release(pins.result())
    eOld.unpersist()
    eDelta.unpersist()
    out
  }

  /** [[hitsDelta]]'s driver-resident rounds (see [[foldDriver]] for
    * the admission rationale). Phases:
    *
    *  1. expand the MONOTONE alternating frontiers (dirtyA_{t+1} ⊇
    *     dirtyA_t and likewise for H — both recurrences only add
    *     seeds and neighbors), gathering each frontier node's in-
    *     resp. out-edges by bounded broadcast probes of the edge
    *     scan, each node probed ONCE;
    *  2. ONE tagged-union scan extracts off-frontier trace scores
    *     for every edge endpoint at rounds 1..k;
    *  3. the alternating a/h rounds run as BigInt sums on the
    *     driver;
    *  4. one node-sized compose patches the final trace element with
    *     the round-k frontier scores, then the global L1
    *     normalization runs distributed as always.
    *
    * Any budget breach returns None and [[hitsDelta]] runs its
    * distributed rounds instead.
    */
  private def hitsDeltaDriver(e: DataFrame, dSrcs: DataFrame,
                              dDsts: DataFrame, addedRows: DataFrame,
                              trace: Seq[DataFrame], scale: Long,
                              checkpointDir: Option[String],
                              maxBroadcastBytes: Long)
      : Option[DataFrame] = {
    val iterations = trace.length - 1
    val spark = e.sparkSession
    val nodeType = dSrcs.schema("node").dataType
    // total-edge cap in EDGE-ROW units: 2x the per-collect byte
    // budget's worth of (src, dst) rows — the incremental probes
    // accumulate across half-rounds, so the sum needs its own bound
    val edgeRowCap = 2L * (maxBroadcastBytes /
      (2 * nodeType.defaultSize + 16)).max(1L)
    def lf(nodes: Iterable[Any], name: String): DataFrame =
      localNodeFrame(spark, nodes, name, nodeType)
    def big(d: java.math.BigDecimal): BigInt = BigInt(d.toBigInteger)
    withSingleWaveLimit(spark) {
      val seedsOpt = for {
        ds <- collectBounded(dSrcs.select(col("node")),
          maxBroadcastBytes)
        dd <- collectBounded(dDsts.select(col("node")),
          maxBroadcastBytes)
      } yield (ds.map(_.get(0)).toSet, dd.map(_.get(0)).toSet)
      seedsOpt.flatMap { case (dS, dD) =>
        // phase 1: frontier expansion + incremental edge gathering
        val inEdges =
          new scala.collection.mutable.HashMap[Any, List[Any]]()
        val outEdges =
          new scala.collection.mutable.HashMap[Any, List[Any]]()
        var probedIn = Set.empty[Any]
        var probedOut = Set.empty[Any]
        var edgeRows = 0L
        var ok = true
        def probe(newNodes: Set[Any], bySrc: Boolean): Unit =
          if (ok && newNodes.nonEmpty) {
            val fr = lf(newNodes, "__f")
            val keyCol = if (bySrc) e("src") else e("dst")
            collectBounded(
              e.join(broadcast(fr), keyCol === col("__f"))
                .select(e("src"), e("dst")),
              maxBroadcastBytes) match {
              case Some(rows) =>
                edgeRows += rows.length
                if (edgeRows > edgeRowCap) ok = false
                else rows.foreach { r =>
                  val s = r.get(0); val d = r.get(1)
                  if (bySrc)
                    outEdges.update(s, d :: outEdges.getOrElse(s, Nil))
                  else
                    inEdges.update(d, s :: inEdges.getOrElse(d, Nil))
                }
              case None => ok = false
            }
          }
        val dirtyA = Seq.newBuilder[Set[Any]]
        val dirtyH = Seq.newBuilder[Set[Any]]
        var curA = dD
        var curH = Set.empty[Any]
        for (t <- 1 to iterations if ok) {
          probe(curA -- probedIn, bySrc = false)
          probedIn ++= curA
          dirtyA += curA
          if (ok) {
            val inSrcs = curA.iterator
              .flatMap(n => inEdges.getOrElse(n, Nil)).toSet
            curH = dS ++ inSrcs
            probe(curH -- probedOut, bySrc = true)
            probedOut ++= curH
            dirtyH += curH
            if (t < iterations && ok) {
              val outDsts = curH.iterator
                .flatMap(n => outEdges.getOrElse(n, Nil)).toSet
              curA = dD ++ outDsts
            }
          }
        }
        if (!ok) None
        else {
          val dA = dirtyA.result()
          val dH = dirtyH.result()
          // phase 2: off-frontier trace scores for every edge
          // endpoint, rounds 1..k, one tagged scan
          val lookupNodes =
            inEdges.valuesIterator.flatten.toSet ++
              outEdges.valuesIterator.flatten.toSet
          val traceValsOpt =
            if (lookupNodes.isEmpty)
              Some(Map.empty[(Int, Any), (BigInt, BigInt)])
            else {
              val tagged = (1 to iterations).map(t =>
                  trace(t).select(lit(t).as("__rt"), col("node"),
                    col("a_raw"), col("h_raw")))
                .reduce(_ unionAll _)
              collectBounded(
                tagged.join(broadcast(lf(lookupNodes, "node")),
                  Seq("node"))
                .select(col("__rt"), col("node"), col("a_raw"),
                  col("h_raw")), maxBroadcastBytes)
                .map(_.map(r => (r.getInt(0), r.get(1)) ->
                  ((big(r.getDecimal(2)), big(r.getDecimal(3)))))
                  .toMap)
            }
          traceValsOpt.map { traceVals =>
            // phase 3: alternating BigInt rounds
            var freshA = Map.empty[Any, BigInt]
            var freshH = Map.empty[Any, BigInt]
            for (t <- 1 to iterations) {
              val aT = dA(t - 1).iterator.map { n =>
                n -> inEdges.getOrElse(n, Nil).iterator.map { s =>
                  if (t == 1) BigInt(1) // h_0 = 1 everywhere
                  else if (dH(t - 2).contains(s)) freshH(s)
                  else traceVals((t - 1, s))._2
                }.sum
              }.toMap
              val hT = dH(t - 1).iterator.map { n =>
                n -> outEdges.getOrElse(n, Nil).iterator.map { d =>
                  if (dA(t - 1).contains(d)) aT(d)
                  else traceVals((t, d))._1
                }.sum
              }.toMap
              freshA = aT
              freshH = hT
            }
            // phase 4: compose + distributed L1 normalization
            import scala.jdk.CollectionConverters._
            def decFrame(m: Map[Any, BigInt], cn: String)
                : DataFrame =
              spark.createDataFrame(
                m.iterator.map { case (n, v) =>
                  org.apache.spark.sql.Row(n,
                    new java.math.BigDecimal(v.bigInteger))
                }.toSeq.asJava,
                org.apache.spark.sql.types.StructType(Seq(
                  org.apache.spark.sql.types.StructField("node",
                    nodeType),
                  org.apache.spark.sql.types.StructField(cn,
                    org.apache.spark.sql.types.DataTypes
                      .createDecimalType(38, 0)))))
            val full = trace(iterations)
              .select(col("node"), col("a_raw"), col("h_raw"))
              .unionAll(addedRows.select(col("node"),
                lit(0).cast(Dec).as("a_raw"),
                lit(0).cast(Dec).as("h_raw")))
            val (composed, _) = cutTracked(
              full.join(broadcast(decFrame(freshA, "__na")),
                  Seq("node"), "left")
                .join(broadcast(decFrame(freshH, "__nh")),
                  Seq("node"), "left")
                .select(col("node"),
                  coalesce(col("__na"), col("a_raw")).as("a_raw"),
                  coalesce(col("__nh"), col("h_raw")).as("h_raw")),
              checkpointDir)
            normalizeHits(composed, scale)
          }
        }
      }
    }
  }

  /** The one global step of deferred HITS: L1-normalize the final
    * raw frame to total mass `scale` (two scalar aggregates riding
    * a 1-row broadcast — O(nodes), no shuffle beyond them).
    */
  private def normalizeHits(raw: DataFrame, scale: Long)
      : DataFrame = {
    val sc = lit(scale).cast(Dec)
    val tot = raw.agg(
      coalesce(sum(col("a_raw")), lit(0)).cast(Dec).as("at"),
      coalesce(sum(col("h_raw")), lit(0)).cast(Dec).as("ht"))
    raw.crossJoin(broadcast(tot))
      .select(col("node"),
        when(col("ht") <= 0, lit(0).cast(Dec))
          .otherwise(floorDiv(col("h_raw") * sc, col("ht")))
          .as("hub"),
        when(col("at") <= 0, lit(0).cast(Dec))
          .otherwise(floorDiv(col("a_raw") * sc, col("at")))
          .as("auth"))
  }

  /** Priced growth pre-flight for the deferred family: ONE
    * aggregate bounds the raw scores (a_k ≤ N·Din^k·Dout^(k−1),
    * h_k ≤ N·(Din·Dout)^k) in BigInt and refuses what DECIMAL(38,0)
    * cannot hold.
    */
  private def hitsGrowthPreflight(e: DataFrame,
                                  iterations: Int): Unit = {
    val r = e.select(col("src"), col("dst"))
      .groupBy(col("src")).agg(count(lit(1)).as("c"))
      .agg(coalesce(max(col("c")), lit(0L)).as("dout"),
        coalesce(sum(col("c")), lit(0L)).cast("long").as("m"))
      .head()
    hitsGrowthCheck(r.getLong(0), r.getLong(1), iterations,
      () => e.groupBy(col("dst")).agg(count(lit(1)).as("c"))
        .agg(coalesce(max(col("c")), lit(0L)).as("din"))
        .head().getLong(0))
  }

  /** The growth-bound arithmetic of [[hitsGrowthPreflight]] with the
    * (max out-degree, edge count) stats supplied by the caller —
    * hitsDelta reads them off its flag pass instead of paying a
    * dedicated aggregate. `dinOf` is only invoked when the cheap
    * Din ≤ m bound already fails.
    */
  private def hitsGrowthCheck(dout: Long, m: Long, iterations: Int,
                              dinOf: () => Long): Unit = {
    // Din ≤ total edges in the worst case; a second groupBy(dst)
    // would cost another shuffle, so bound it by the max in-degree
    // aggregate only when the cheap bound already fails
    val nBound = BigInt(2) * m.max(1L)
    def pow(b: BigInt, k: Int): BigInt = Iterator.fill(k)(b)
      .foldLeft(BigInt(1))(_ * _)
    val cap = BigInt(10).pow(38) - 1
    val cheap = nBound * pow(BigInt(dout.max(1L)) * nBound,
      iterations)
    if (cheap > cap) {
      val din = dinOf()
      val bound = nBound *
        pow(BigInt(din.max(1L)), iterations) *
        pow(BigInt(dout.max(1L)), iterations)
      require(bound <= cap,
        s"hitsDeferred: $iterations raw iterations can reach " +
          s"~$bound (> DECIMAL(38,0)) on this degree profile " +
          s"(max in $din, max out $dout, $m edges) — use fewer " +
          "iterations or the per-round-normalized hits()")
    }
  }

  /** Exact BFS hop census from a seed set — the reach diagnostic
    * pairing with seeded [[pagerank]]: how many nodes sit at each
    * minimum hop distance from ANY seed (contamination blast
    * radius, trust coverage, crawl frontier depth). Returns
    * `(hop, n_nodes)` with `hop = NULL` collecting the unreachable
    * tail; hops beyond `maxHops` count as unreachable (documented —
    * the census is the bounded-radius question).
    *
    * Shape: `maxHops` rounds of frontier expansion — each ONE
    * edges⋈frontier join + distinct + a node-keyed left join, with
    * the per-round localCheckpoint (the CC-loop contract; superseded
    * rounds released as the walk advances). The frontier only ever
    * shrinks relative to the node frame; no global structures, no
    * driver data.
    */
  def hopCensus(edges: DataFrame, seeds: DataFrame,
                maxHops: Int = 4,
                checkpointDir: Option[String] = None): DataFrame = {
    require(maxHops >= 1 && maxHops <= 16,
      s"driver-looped plan growth is specified for 1..16 hops: " +
        s"$maxHops")
    val e = edges.select(col("src"), col("dst"))
      .repartition(shuffleWidth(edges), col("src")).persist()
    val (nodes, nodesPins) = cutTracked(
      e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct(), checkpointDir)
    val sn = seeds.select(col("node")).distinct()
    var (depth, depthPins) = cutTracked(nodes
      .join(sn.withColumn("__s", lit(true)), Seq("node"), "left")
      .select(col("node"),
        when(col("__s"), lit(0)).otherwise(lit(null).cast("int"))
          .as("hop")), checkpointDir)
    for (d <- 1 to maxHops) {
      val frontier = depth.where(col("hop") === d - 1)
        .select(col("node").as("__f"))
      val reached = e.join(frontier, e("src") === col("__f"))
        .select(e("dst").as("node")).distinct()
        .withColumn("__r", lit(true))
      val (next, nextPins) = cutTracked(
        depth.join(reached, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("hop"),
            when(col("__r"), lit(d))).as("hop")), checkpointDir)
      release(depthPins)
      depth = next
      depthPins = nextPins
    }
    e.unpersist()
    release(nodesPins)
    depth.groupBy(col("hop"))
      .agg(count(lit(1)).as("n_nodes"))
  }

  /** Degree census of an edge frame: per-node out/in degree and the
    * distribution head — the graph-shape numbers read before a rank
    * run (skew → hot-key handling). One pass per direction.
    */
  def degreeCensus(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
