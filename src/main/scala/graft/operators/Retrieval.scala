package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Ranked retrieval over the corpus — the "mine training data
  * relevant to X" primitive (targeted curation, eval-set
  * construction, contamination triage all start with a ranked
  * keyword query against the corpus).
  *
  * Scoring is BM25 (Robertson-Spärck Jones) with two deliberate,
  * documented determinism substitutions, because this repo's
  * correctness gate hash-compares against a second engine and
  * transcendental libm calls (`ln`) are NOT bit-identical across
  * engines (the q44 rule):
  *
  *  - `k1 = 6/5`, `b = 3/4` — the standard defaults, as exact
  *    rationals;
  *  - idf surrogate `(N − df + 1) / (df + 1)` instead of
  *    `ln((N − df + 0.5) / (df + 0.5))` — the same monotone
  *    rare-term ordering, exactly representable.
  *
  * With those, each term's score is a ratio of two EXACT BIGINT
  * products: `22·tf·(N−df+1)·T` over `(df+1)·(10·tf·T + 3·T +
  * 9·dl·N)` (T = total corpus tokens, so `avgdl = T/N` never
  * materializes as a rounded double). The ONLY floating-point
  * operations are one IEEE division per term and a fixed-order sum
  * over the ≤ handful of query terms — both bit-deterministic and
  * replayed identically by the SQL oracle.
  *
  * Shape at 100 TB: query terms are literals, so per-document term
  * frequencies come from `size(filter(tokens, == term))` — a pure
  * projection, no token explode, no join; corpus statistics are ONE
  * 1-row aggregate broadcast back over the scan; ranking is
  * TakeOrdered(K). Two corpus scans total (stats, then scoring) —
  * the irreducible BM25 structure — and nothing shuffles more than
  * the 1-row stats frame.
  */
object Retrieval {

  /** Top-`k` documents for `terms` by the deterministic BM25 above.
    * Output: `(id, score, dl)` ordered by (score desc, id asc).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    require(terms.size <= 16,
      s"fixed-order float summation is specified for <= 16 terms: " +
        s"${terms.size}")
    val toks = TextFunctions.tokens(col(textCol))
    val base = docs.select(
      col(idCol).as("id") +:
        size(toks).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).cast("long")
            .as(s"tf$i")
        }: _*)
    val statCols = sum(col("dl")).cast("long").as("T") +:
      terms.indices.map(i =>
        count(when(col(s"tf$i") > 0L, 1)).as(s"df$i"))
    val stats = base.agg(count(lit(1)).as("N"), statCols: _*)
    val perTerm = terms.indices.map { i =>
      val tf = col(s"tf$i")
      val a = lit(22L) * tf * (col("N") - col(s"df$i") + lit(1L)) *
        col("T")
      val bDen = (col(s"df$i") + lit(1L)) *
        (lit(10L) * tf * col("T") + lit(3L) * col("T") +
          lit(9L) * col("dl") * col("N"))
      when(tf > 0L, a.cast("double") / bDen.cast("double"))
        .otherwise(lit(0.0))
    }
    base.crossJoin(broadcast(stats))
      .select(col("id"),
        perTerm.reduceLeft(_ + _).as("score"), col("dl"))
      .orderBy(col("score").desc, col("id").asc_nulls_first)
      .limit(k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR '09):
    * merge two ranked lists by `Σ 1/(c + rank)` — the standard way a
    * RAG stack combines BM25 and vector retrieval without score
    * calibration. Inputs are `(id, rank)` frames (rank 1-based;
    * absence contributes 0); output is the fused top-`k` as
    * `(id, rank_a, rank_b, rrf)` with 0 marking absence.
    *
    * Determinism: each contribution is ONE IEEE division and the two
    * terms add in fixed (a, b) order, ties id-asc — the q44/BM25
    * float rule, replayed verbatim by the SQL oracle. Both inputs are
    * top-k lists (constant frames), so the full-outer join and sort
    * are driver-trivial regardless of corpus size — the expensive
    * part of hybrid retrieval is producing the lists, not fusing
    * them.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int,
              c: Int = 60): DataFrame = {
    require(k > 0, s"k must be > 0: $k")
    require(c >= 0, s"c must be >= 0: $c")
    val fa = a.select(col("id"), col("rank").as("rank_a"))
    val fb = b.select(col("id"), col("rank").as("rank_b"))
    def term(r: Column) = when(r > 0L,
      lit(1.0) / (lit(c.toLong) + r).cast("double"))
      .otherwise(lit(0.0))
    fa.join(fb, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("rank_a"), lit(0L)).as("rank_a"),
        coalesce(col("rank_b"), lit(0L)).as("rank_b"))
      .withColumn("rrf", term(col("rank_a")) + term(col("rank_b")))
      .orderBy(col("rrf").desc, col("id").asc_nulls_first)
      .limit(k)
  }

  /** 0-based start positions of the exact token phrase inside the
    * whitespace token stream of `textCol`, as a pure column
    * expression over the token array — no explode, no join, no
    * shuffle: `filter(sequence(0, n-k), p -> ∧_i tokens[p+i] =
    * phrase(i))`. The array is referenced k times per candidate
    * position (k = phrase length, a small constant), never
    * recursively, so the expression stays flat. Guarded for
    * documents shorter than the phrase (`sequence` with a negative
    * upper bound would otherwise fabricate a negative-step range).
    */
  def phrasePositions(textCol: Column, phrase: Seq[String]): Column =
    phrasePositionsOf(TextFunctions.tokens(textCol), phrase)

  /** [[phrasePositions]] over an ALREADY-TOKENIZED array column.
    * Callers should tokenize in a separate upstream projection: the
    * lambda below references the token array once per (position,
    * phrase token) pair, and an inline `tokens(text)` subtree is
    * re-evaluated at every reference (codegen subexpression
    * elimination does not reach inside higher-order-function
    * lambdas) — measured as a whole-document regex re-split per
    * compared position, the dominant cost of the q119 scan.
    */
  def phrasePositionsOf(ts: Column, phrase: Seq[String]): Column = {
    require(phrase.nonEmpty, "phrasePositions needs a non-empty phrase")
    require(phrase.size <= 16,
      s"flat per-position conjunction is specified for <= 16 " +
        s"tokens: ${phrase.size}")
    val k = phrase.size
    val starts = filter(
      sequence(lit(0), size(ts) - k),
      p => phrase.zipWithIndex.map { case (w, i) =>
        element_at(ts, p + lit(i + 1)) === lit(w)
      }.reduceLeft(_ && _))
    when(size(ts) >= k, starts)
      .otherwise(array().cast("array<int>"))
  }

  /** Exact phrase search — "grep at corpus scale": every document
    * containing the exact whitespace-token phrase, with its
    * occurrence count and first 0-based match position. One
    * zero-shuffle projection over the corpus scan (the positional
    * inverted-index answer without building the index): at 100 TB
    * this is a map-only job whose output is bounded by the matching
    * documents, and the text column is the only one read beyond the
    * id.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame =
    docs
      // tokenize ONCE per row in its own projection (multiple
      // non-cheap references keep CollapseProject from re-inlining
      // the split into every lambda reference — see
      // [[phrasePositionsOf]]), and the position array sits behind a
      // pushdown barrier: without it the emptiness filter below is
      // pushed under BOTH projections and re-inlines the whole
      // split-per-lambda-reference subtree into the scan Filter (the
      // r14 after-plan's one remaining re-split) — with it the
      // Filter references `__ps` and every row tokenizes exactly
      // once
      .select(col(idCol).as("id"),
        TextFunctions.tokens(col(textCol)).as("__ts"))
      .select(col("id"),
        graft.functions.PushdownBarrierExpr.barrier(
          phrasePositionsOf(col("__ts"), phrase)).as("__ps"))
      .where(size(col("__ps")) > 0)
      .select(col("id"),
        size(col("__ps")).cast("long").as("n_occ"),
        element_at(col("__ps"), 1).cast("long").as("first_pos"))

  /** Exact phrase search by POSITIONAL POSTING JOIN — the
    * index-accelerated twin of [[phraseSearch]] and the second
    * physical strategy a serving stack wants: instead of scanning
    * every document's token array, explode positional postings
    * FILTERED TO THE PHRASE'S TERMS ONLY (the predicate reaches the
    * explode, so the joined frames are document-frequency-sized,
    * not corpus-sized) and equi-join term i's postings at
    * `pos - i` against the anchor term. At 100 TB with a rare
    * phrase this is orders of magnitude less work than the scan;
    * the two strategies return IDENTICAL rows (cross-validated by
    * the q119/q124 oracle pair and PhraseIndexSpec).
    */
  def phraseSearchIndexed(docs: DataFrame, idCol: String,
                          textCol: String,
                          phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty,
      "phraseSearchIndexed needs a non-empty phrase")
    require(phrase.size <= 16,
      s"the join chain is specified for <= 16 tokens: ${phrase.size}")
    val ts = TextFunctions.tokens(col(textCol))
    val posts = docs
      .select(col(idCol).as("id"),
        posexplode(ts).as(Seq("pos", "tok")))
      .where(col("tok").isin(phrase.distinct: _*))
    val anchor = posts.where(col("tok") === phrase.head)
      .select(col("id"), col("pos"))
    val matches = phrase.zipWithIndex.tail
      .foldLeft(anchor) { case (acc, (w, i)) =>
        acc.join(posts.where(col("tok") === lit(w))
            .select(col("id").as("__id2"),
              (col("pos") - i).as("__p2")),
          col("id") === col("__id2") && col("pos") === col("__p2"))
          .select(col("id"), col("pos"))
      }
    matches.groupBy(col("id"))
      .agg(count(lit(1)).cast("long").as("n_occ"),
        min(col("pos")).cast("long").as("first_pos"))
  }

  /** The most frequent token bigram of a deterministic 1-in-
    * `sampleDen` hash sample of the corpus, ties broken by the
    * lexicographically smallest bigram — the "give me a phrase that
    * actually occurs" picker for [[phraseSearch]] demos and gates.
    * The picker's answer only seeds a probe, so it does not need
    * the full corpus: sampling cuts the bigram explode+shuffle by
    * `sampleDen`x while staying bit-reproducible (md5 hash sample,
    * exact counts within the sample). `sampleDen = 1` scans
    * everything. One token-explode + keyed count + global top-1
    * (TakeOrdered over the aggregated counts, never a full sort).
    */
  def topBigram(docs: DataFrame, idCol: String, textCol: String,
                sampleDen: Long = 1L): DataFrame = {
    require(sampleDen >= 1, s"sampleDen must be >= 1: $sampleDen")
    // tokenize once per row in its own projection (the
    // phrasePositionsOf lambda-reference rationale)
    val ts = col("__ts")
    val bigrams = when(size(ts) >= 2,
        transform(sequence(lit(0), size(ts) - 2),
          p => concat_ws(" ", element_at(ts, p + 1),
            element_at(ts, p + 2))))
      .otherwise(array().cast("array<string>"))
    docs
      .where(pmod(Sampling.hash32(col(idCol)), lit(sampleDen))
        === 0L)
      .select(TextFunctions.tokens(col(textCol)).as("__ts"))
      .select(explode(bigrams).as("bg"))
      .groupBy(col("bg"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bg").asc_nulls_first)
      .limit(1)
  }
}
