package graft.operators

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
  * lineage-cutting localCheckpoint per round (the CC-loop contract).
  * Headroom: a score is ≤ N·scale and an update product ≤ d·N·scale,
  * so DECIMAL(38,0) holds N up to ~10^30/scale nodes.
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
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }

  /** Exact floor division of non-negative DECIMAL(38,0) columns:
    * `(a - a mod b) / b` — the subtraction makes the numerator
    * exactly divisible, so the decimal division is exact and
    * rounding-mode-free in any engine.
    */
  private def floorDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast(Dec)

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
    * Returns `(node, pr)` — `pr` is the final scaled score; a node's
    * rank share is `pr / T`.
    */
  def pagerank(edges: DataFrame, iterations: Int = 3,
               num: Long = 17L, den: Long = 20L,
               scale: Long = 1000000L,
               seeds: Option[DataFrame] = None,
               weight: Option[Column] = None,
               checkpointDir: Option[String] = None): DataFrame =
    pagerankTrace(edges, iterations, num, den, scale, seeds, weight,
      checkpointDir).last

  /** [[pagerank]] with the full per-iteration score trace: element t
    * holds `(node, pr)` AFTER t iterations (element 0 = the initial
    * mass placement), each one materialized and lineage-cut. The
    * trace is what [[pagerankDelta]] folds an edge batch against —
    * a delta fold must know the OLD run's score at every round, not
    * just its end state.
    */
  def pagerankTrace(edges: DataFrame, iterations: Int = 3,
                    num: Long = 17L, den: Long = 20L,
                    scale: Long = 1000000L,
                    seeds: Option[DataFrame] = None,
                    weight: Option[Column] = None,
                    checkpointDir: Option[String] = None)
      : Seq[DataFrame] = {
    require(iterations >= 1 && iterations <= 16,
      s"driver-looped plan growth is specified for 1..16 " +
        s"iterations: $iterations")
    require(num > 0 && den > num,
      s"damping num/den must lie in (0, 1): $num/$den")
    // edge weight (w = 1 unweighted): a node's mass splits across
    // its out-edges proportionally to w — share(u→v) =
    // floor(pr(u)·w / Σ_out w), which for w ≡ 1 is exactly the
    // classic floor(pr/outdeg). Non-positive weights raise in-plan.
    val wCol = weight.getOrElse(lit(1L)).cast(Dec)
    val e0 = edges.select(col("src"), col("dst"),
      when(wCol > 0, wCol)
        .otherwise(raise_error(lit("pagerank: edge weights must " +
          "be positive")).cast(Dec)).as("w")).persist()
    // degree-skew pre-flight (the price-it-first discipline): the
    // inflow aggregation's reduce key is `dst`, and the per-round
    // join's shuffle key is `src` — a key holding a large share of
    // the edges makes one reducer the round clock. The check is one
    // aggregate over the edge frame (which doubles as the persist
    // materializer); it WARNS rather than salts — partial
    // aggregation absorbs most hot-key sums and AQE's skew-join
    // handles the join side, so the right response is usually a
    // config, not a rewrite.
    skewPreflight(e0).foreach(w =>
      System.err.println(s"warning: $w"))
    val nodes = cut(e0.select(col("src").as("node"))
      .unionAll(e0.select(col("dst").as("node")))
      .distinct(), checkpointDir)
    val deg = cut(e0.groupBy(col("src").as("node"))
      .agg(sum(col("w")).cast(Dec).as("deg")), checkpointDir)
    // out-degree PRE-JOINED into the edge frame once: every
    // iteration's share computation then needs only the pr join —
    // one shuffle per round instead of two (at 100 TB the saved
    // exchange is the difference between 2N and 3N shuffled bytes
    // per iteration)
    val e = e0.join(deg.select(col("node").as("__dn"), col("deg")),
        col("__dn") === e0("src"))
      .select(e0("src").as("src"), e0("dst").as("dst"), e0("w"),
        col("deg"))
      .persist()
    // seed membership rides the node frame as one boolean column —
    // the teleport base is then a branch-free projection each round
    val seeded = seeds match {
      case Some(sf) =>
        val sn = sf.select(col("node")).distinct()
        cut(nodes.join(sn.withColumn("__s", lit(true)), Seq("node"),
            "left")
          .select(col("node"),
            coalesce(col("__s"), lit(false)).as("is_seed")),
          checkpointDir)
      case None => nodes.select(col("node"), lit(true).as("is_seed"))
    }
    // N (nodes), S (teleport targets), T = N·scale — one tiny frame
    // every round's projection crossJoin-broadcasts. A seed set that
    // never intersects the edge frame's nodes would divide by zero;
    // raise in-plan (fail-fast, the applyChangelog discipline)
    // rather than emit an all-null ranking.
    val tot = seeded.agg(
        count(lit(1)).cast(Dec).as("n"),
        count(when(col("is_seed"), 1)).cast(Dec).as("s0"))
      .select(col("n"),
        when(col("s0") > 0, col("s0"))
          .otherwise(raise_error(lit("pagerank: no seed appears " +
            "among the edge frame's nodes (empty teleport set)"))
            .cast(Dec))
          .as("s"))
    val sc = lit(scale).cast(Dec)
    // initial mass lives ON the teleport set: floor(T/|S|) per seed,
    // 0 elsewhere — for seeds=None that is exactly `scale` per node,
    // and for TrustRank every unit of final score provably originated
    // at a seed and travelled only links
    var pr = cut(seeded.crossJoin(broadcast(tot))
      .select(col("node"), col("is_seed"),
        when(col("is_seed"), floorDiv(col("n") * sc, col("s")))
          .otherwise(lit(0).cast(Dec)).as("pr")), checkpointDir)
    val trace = Seq.newBuilder[DataFrame]
    trace += pr.select(col("node"), col("pr"))
    for (_ <- 1 to iterations) {
      val inflow = e.join(pr.select(col("node"), col("pr")),
          e("src") === col("node"))
        .select(e("dst").as("node"),
          floorDiv(col("pr") * col("w"), col("deg")).as("share"))
        .groupBy(col("node"))
        .agg(sum(col("share")).cast(Dec).as("inflow"))
      val dang = pr.join(deg.select(col("node")), Seq("node"),
          "left_anti")
        .agg(coalesce(sum(col("pr")), lit(0)).cast(Dec).as("d"))
      pr = cut(pr.select(col("node"), col("is_seed"), col("pr"))
        .join(inflow, Seq("node"), "left")
        .crossJoin(broadcast(tot))
        .crossJoin(broadcast(dang))
        .select(col("node"), col("is_seed"),
          (when(col("is_seed"),
            floorDiv(lit(den - num).cast(Dec) * col("n") * sc,
              lit(den).cast(Dec) * col("s")))
            .otherwise(lit(0).cast(Dec)) +
          floorDiv(lit(num).cast(Dec) *
            (coalesce(col("inflow"), lit(0).cast(Dec)) +
              when(col("is_seed"), floorDiv(col("d"), col("s")))
                .otherwise(lit(0).cast(Dec))),
            lit(den).cast(Dec))).as("pr"))
        // pr is referenced three times next round (shares, dangling,
        // the rebase join) — one eager cut per round keeps the plan
        // flat and is the round's only driver action
        , checkpointDir)
      trace += pr.select(col("node"), col("pr"))
    }
    e.unpersist()
    e0.unpersist()
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
    * `dirty₁ = outNbr_{E∪Δ}(srcs(Δ))` and
    * `dirty_{t+1} = outNbr_{E∪Δ}(dirty_t) ∪ dirty₁` cover every
    * changed node — recomputing a covered-but-unchanged node is
    * harmless (its inflow over the patched frame reproduces the old
    * value bit-for-bit).
    *
    * Preconditions (priced pre-flight, `require`d):
    *   - every delta endpoint already appears in `edges` (N — and
    *     with it the teleport base — is unchanged; a batch with new
    *     nodes changes EVERY node's base, so run the full rank);
    *   - `edges` has no dangling node (dangling mass is a GLOBAL
    *     broadcast — any local change would touch every score; with
    *     no dangling nodes and no new nodes, E∪Δ stays
    *     dangling-free);
    *   - the trace is unseeded (seeded teleport shifts with |S|).
    *
    * Shape: each round joins the edge frame only against the
    * frontier (a dst-side semi-join) and the patched score frame —
    * work proportional to the frontier's in-edge volume, not the
    * graph. A delta touching f% of sources costs ~f% of a full
    * round, the win this operator exists for at 100 TB.
    *
    * Delegates to [[pagerankRefresh]] (the general edited-frame
    * form) with `newEdges = edges ∪ delta` — the multiset diff then
    * finds exactly the delta's sources.
    */
  def pagerankDelta(edges: DataFrame, delta: DataFrame,
                    trace: Seq[DataFrame],
                    num: Long = 17L, den: Long = 20L,
                    scale: Long = 1000000L,
                    weight: Option[Column] = None,
                    checkpointDir: Option[String] = None)
      : DataFrame =
    pagerankRefresh(edges, edges.unionAll(delta), trace, num, den,
      scale, weight, checkpointDir)

  /** The GENERAL incremental form: refresh a completed
    * [[pagerankTrace]] run against an arbitrarily EDITED edge frame
    * — additions, removals, and weight changes alike
    * ([[pagerankDelta]] is the additions-only special case and
    * delegates here). The changed-source set is computed by
    * DIFFING the two frames' per-(src,dst) out-edge multisets (one
    * full-outer join of two keyed aggregates — a source whose
    * multiset is unchanged contributes identical shares given
    * identical scores); the dirty frontier then seeds from the
    * changed sources' out-neighbors in BOTH frames (a removal can
    * dirty a node the new graph no longer reaches from its source)
    * and expands through the NEW frame only. Result == the full
    * `pagerank(newEdges, iterations)` EXACTLY (spec- and
    * oracle-pinned).
    *
    * Preconditions (priced pre-flight, `require`d): identical node
    * sets (N fixes every teleport base), no dangling node in the
    * new frame (dangling mass is global), unseeded trace.
    */
  def pagerankRefresh(oldEdges: DataFrame, newEdges: DataFrame,
                      trace: Seq[DataFrame],
                      num: Long = 17L, den: Long = 20L,
                      scale: Long = 1000000L,
                      weight: Option[Column] = None,
                      checkpointDir: Option[String] = None)
      : DataFrame = {
    require(trace.nonEmpty, "need a pagerankTrace run to fold into")
    require(num > 0 && den > num,
      s"damping num/den must lie in (0, 1): $num/$den")
    val iterations = trace.length - 1
    val wCol = weight.getOrElse(lit(1L)).cast(Dec)
    def withW(df: DataFrame): DataFrame =
      df.select(col("src"), col("dst"),
        when(wCol > 0, wCol)
          .otherwise(raise_error(lit("pagerankRefresh: edge " +
            "weights must be positive")).cast(Dec)).as("w"))
    val eOld = withW(oldEdges).persist()
    val eNew = withW(newEdges).persist()
    def nodesOf(e: DataFrame): DataFrame =
      e.select(col("src").as("node"))
        .unionAll(e.select(col("dst").as("node")))
        .distinct()
    val oldNodes = cut(nodesOf(eOld), checkpointDir)
    val newNodes = nodesOf(eNew)
    // ALL pre-flights in ONE job (tagged union of the violation
    // frames): identical node sets (N — and with it every teleport
    // base — must not move), and no dangling node in EITHER frame
    // (dangling mass is a global broadcast term in both runs, so a
    // local fold would be unsound)
    val violations = newNodes
      .join(oldNodes, Seq("node"), "left_anti")
      .select(lit("node_added").as("kind"))
      .unionAll(oldNodes.join(newNodes, Seq("node"), "left_anti")
        .select(lit("node_removed").as("kind")))
      .unionAll(oldNodes
        .join(eOld.select(col("src").as("node")).distinct(),
          Seq("node"), "left_anti")
        .select(lit("dangling_old").as("kind")))
      .unionAll(oldNodes
        .join(eNew.select(col("src").as("node")).distinct(),
          Seq("node"), "left_anti")
        .select(lit("dangling_new").as("kind")))
      .groupBy(col("kind")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(violations.isEmpty,
      "pagerankRefresh: unsound edit — " + violations.map {
        case ("node_added", n) => s"$n nodes appear only in the " +
          "new frame (N and every teleport base would change)"
        case ("node_removed", n) => s"$n nodes appear only in the " +
          "old frame (N and every teleport base would change)"
        case ("dangling_old", n) => s"$n dangling nodes in the " +
          "old frame (its dangling mass was a global term)"
        case ("dangling_new", n) => s"$n dangling nodes in the " +
          "new frame (dangling mass is a global term)"
        case (k, n) => s"$n × $k"
      }.mkString("; ") + "; run the full pagerank instead")
    val degNew = cut(eNew.groupBy(col("src").as("node"))
      .agg(sum(col("w")).cast(Dec).as("deg")), checkpointDir)
    val eD = eNew.join(degNew.select(col("node").as("__dn"),
        col("deg")), col("__dn") === eNew("src"))
      .select(eNew("src").as("src"), eNew("dst").as("dst"),
        eNew("w"), col("deg"))
      .persist()
    // the per-node teleport base: floor((den−num)·N·scale/(den·N))
    // = floor((den−num)·scale/den), a driver literal
    val base = lit((BigInt(den - num) * BigInt(scale) / BigInt(den))
      .toString).cast(Dec)
    // changed sources = sources whose out-edge MULTISET differs
    // between the frames (count + total weight per (src,dst) group;
    // a source with an identical multiset emits identical shares
    // given identical scores). One full-outer join of two keyed
    // aggregates — edit-sized output, edge-sized input.
    def grouped(e: DataFrame, cn: String, sn: String): DataFrame =
      e.groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as(cn), sum(col("w")).cast(Dec).as(sn))
    val srcsD = grouped(eOld, "__oc", "__ow")
      .join(grouped(eNew, "__nc", "__nw"), Seq("src", "dst"),
        "full_outer")
      .where(!(col("__oc") <=> col("__nc") &&
        col("__ow") <=> col("__nw")))
      .select(col("src").as("node")).distinct()
    // the frontier seeds from the changed sources' out-neighbors
    // in BOTH frames — a removal dirties a node the new frame may
    // no longer reach from that source — and expands through the
    // NEW frame only. Dirty frames cut EAGERLY: each is referenced
    // three times per round (inflow semi-join, the fresh rebase,
    // the next expansion — the pagerank pr rule), so a lazy cut
    // would re-evaluate its subtree multiplicatively. The patched
    // frame is a single-reference chain and cuts lazily.
    val dirty1 = cut(eD.join(srcsD.withColumnRenamed("node", "__f"),
        eD("src") === col("__f"))
      .select(eD("dst").as("node"))
      .unionAll(eOld.join(srcsD.withColumnRenamed("node", "__g"),
          eOld("src") === col("__g"))
        .select(eOld("dst").as("node")))
      .distinct(), checkpointDir)
    var dirty = dirty1
    var patched = trace.head
    for (t <- 1 to iterations) {
      val inflow = eD
        .join(dirty.withColumnRenamed("node", "__t"),
          eD("dst") === col("__t"))
        .join(patched.select(col("node").as("__sn"), col("pr")),
          col("__sn") === eD("src"))
        .select(eD("dst").as("node"),
          floorDiv(col("pr") * eD("w"), col("deg")).as("share"))
        .groupBy(col("node"))
        .agg(sum(col("share")).cast(Dec).as("inflow"))
      val fresh = dirty.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (base + floorDiv(lit(num).cast(Dec) *
            coalesce(col("inflow"), lit(0).cast(Dec)),
            lit(den).cast(Dec))).as("__npr"))
      patched = cut(trace(t)
        .join(fresh, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__npr"), col("pr")).as("pr")), checkpointDir,
        eager = t == iterations)
      if (t < iterations)
        dirty = cut(eD.join(dirty.withColumnRenamed("node", "__f"),
            eD("src") === col("__f"))
          .select(eD("dst").as("node"))
          .unionAll(dirty1.select(col("node")))
          .distinct(), checkpointDir)
    }
    eD.unpersist()
    eOld.unpersist()
    eNew.unpersist()
    patched
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
        "every round; consider AQE skew handling or salting the " +
        "aggregation")
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
    * two 1-row total broadcasts; one localCheckpoint per iteration.
    * An edge frame with no edges is rejected up front (both totals
    * would be zero).
    */
  def hits(edges: DataFrame, iterations: Int = 2,
           scale: Long = 1000000L,
           checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1 && iterations <= 16,
      s"driver-looped plan growth is specified for 1..16 " +
        s"iterations: $iterations")
    val e = edges.select(col("src"), col("dst")).persist()
    val nodes = cut(e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct(), checkpointDir)
    val sc = lit(scale).cast(Dec)
    var scores = cut(nodes.select(col("node"), sc.as("hub"),
      sc.as("auth")), checkpointDir)
    for (_ <- 1 to iterations) {
      val aRaw = e.join(scores.select(col("node"), col("hub")),
          e("src") === col("node"))
        .groupBy(e("dst").as("node"))
        .agg(sum(col("hub")).cast(Dec).as("a_raw"))
      val aTot = aRaw.agg(
        coalesce(sum(col("a_raw")), lit(0)).cast(Dec).as("at"))
      val withA = cut(nodes
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
      scores = cut(withA
        .join(hRaw, Seq("node"), "left")
        .crossJoin(broadcast(hTot))
        .select(col("node"),
          when(col("h_raw").isNull || col("ht") <= 0,
            lit(0).cast(Dec))
            .otherwise(floorDiv(col("h_raw") * sc, col("ht")))
            .as("hub"),
          col("auth")), checkpointDir)
    }
    e.unpersist()
    scores.select(col("node"), col("hub"), col("auth"))
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
    * the per-round localCheckpoint (the CC-loop contract). The
    * frontier only ever shrinks relative to the node frame; no
    * global structures, no driver data.
    */
  def hopCensus(edges: DataFrame, seeds: DataFrame,
                maxHops: Int = 4,
                checkpointDir: Option[String] = None): DataFrame = {
    require(maxHops >= 1 && maxHops <= 16,
      s"driver-looped plan growth is specified for 1..16 hops: " +
        s"$maxHops")
    val e = edges.select(col("src"), col("dst")).persist()
    val nodes = cut(e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct(), checkpointDir)
    val sn = seeds.select(col("node")).distinct()
    var depth = cut(nodes
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
      depth = cut(depth.join(reached, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("hop"),
            when(col("__r"), lit(d))).as("hop")), checkpointDir)
    }
    e.unpersist()
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
