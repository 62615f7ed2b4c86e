package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich, Haddow, Birch,
  * "Neural machine translation of rare words with subword units",
  * ACL 2016) — the canonical LLM-pipeline operator: learn a merge
  * table from a corpus, then encode text with it.
  *
  * Scale shape: the ONLY corpus-wide pass is the initial
  * word-frequency aggregation (one keyed shuffle with map-side
  * partials — 100 TB of text collapses to a vocabulary-sized table).
  * Every merge round after that runs on the word table alone: a
  * pair-count aggregation (distributed, map-side combined) whose
  * single argmax row is the round's only driver action, then a
  * narrow per-word merge application. Nothing quadratic, nothing
  * proportional to corpus size inside the loop, and the loop state
  * is re-materialized per round with an eager localCheckpoint so the
  * logical plan stays flat across rounds (iterative-loop rule from
  * the k-means/connected-components operators).
  *
  * Characters are code POINTS on both sides of the oracle
  * (`regexp_extract_all(word, '(?s).')` here, RE2 `.` in DuckDB), so
  * supplementary-plane text can't split into surrogate halves.
  *
  * Reference behavior note: structa has no tokenizer trainer; this is
  * beyond-reference pipeline surface (SURVEY §2 pipeline extensions).
  */
object Bpe {

  /** Initial symbol decomposition of a word: one symbol per Unicode
    * code point (NOT `split(w, "")`, which walks UTF-16 code units
    * and would halve surrogate pairs).
    */
  def chars(word: Column): Column =
    regexp_extract_all(word, lit("(?s)."), lit(0))

  /** One canonical left-to-right BPE merge pass over a symbol array:
    * scan positions ascending; wherever `(l(i), l(i+1)) == (lhs,
    * rhs)` and position i was not consumed by the previous merge,
    * emit the merged symbol and skip i+1. Built-in higher-order fold
    * — no UDF — evaluated over the vocabulary-sized word table (or
    * inside [[encode]]'s per-token lambda), never joined.
    */
  def applyMerge(l: Column, lhs: String, rhs: String): Column = {
    val merged = lhs + rhs
    // state machine over the symbols themselves — (emitted, pending
    // previous symbol) — so the input array is referenced exactly
    // ONCE. A lookahead formulation (get(l, i), get(l, i+1), size(l))
    // embeds `l` ~5x per level, which compounds exponentially when
    // [[encode]] stacks one pass per trained rule.
    aggregate(
      l,
      struct(
        array().cast("array<string>").as("acc"),
        lit(null).cast("string").as("prev")),
      (st, s) => {
        val acc = st.getField("acc")
        val prev = st.getField("prev")
        val isMatch =
          coalesce(prev === lit(lhs) && s === lit(rhs), lit(false))
        struct(
          when(isMatch, concat(acc, array(lit(merged))))
            .when(prev.isNotNull, concat(acc, array(prev)))
            .otherwise(acc).as("acc"),
          // a just-merged symbol is not reconsidered as the left
          // side within the same pass (canonical L2R semantics)
          when(isMatch, lit(null).cast("string")).otherwise(s)
            .as("prev"))
      },
      st => when(st.getField("prev").isNotNull,
          concat(st.getField("acc"), array(st.getField("prev"))))
        .otherwise(st.getField("acc")))
  }

  /** Train `numMerges` BPE merge rules over `text`. Returns the merge
    * table `(merge_rank, lhs, rhs, merged, cnt)` ordered by rank —
    * rank r's pair is the most frequent adjacent symbol pair after
    * applying rules 1..r-1, counted over corpus word frequencies
    * (overlapping occurrences counted, the classic convention);
    * ties break (cnt desc, lhs asc, rhs asc) so training is
    * deterministic. Stops early when no pair remains.
    *
    * `minFreq` prunes hapax-legomena words before the loop (the
    * standard trainer knob — at corpus scale the word table's long
    * tail is crawl junk that cannot influence early merges);
    * `maxWords` hard-caps the word table by (freq desc, word asc)
    * for a bounded-state guarantee regardless of corpus entropy.
    */
  /** The trained-word table (word, f, l) a merge loop starts from:
    * corpus word frequencies pruned/capped, symbols = code points
    * with `priorRules` already replayed in rank order.
    */
  private def initVocab(df: DataFrame, text: Column, minFreq: Long,
                        maxWords: Int,
                        priorRules: Seq[(String, String)])
      : DataFrame = {
    var words = df
      .select(explode(graft.functions.TextFunctions.tokens(text))
        .as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).cast("long").as("f"))
      .where(col("f") >= minFreq)
    if (maxWords != Int.MaxValue)
      words = words.orderBy(col("f").desc, col("word").asc)
        .limit(maxWords)
    val symbols = priorRules.foldLeft(chars(col("word"))) {
      case (acc, (lhs, rhs)) => applyMerge(acc, lhs, rhs)
    }
    words.select(col("word"), col("f"), symbols.as("l"))
  }

  /** Continue training from an existing merge table — extend the
    * tokenizer (new domain, bigger vocabulary) WITHOUT retraining
    * from scratch: the existing rules replay over the word table in
    * rank order, then pair counting resumes at rank |rules|+1.
    * `trainContinue(df, text, rulesOf(train(df, text, k)), m)`
    * appends exactly the rules `train(df, text, k+m)` would have
    * learned (BpeContinueSpec pins the equivalence) — returns ONLY
    * the new rules, ranks k+1..k+m.
    */
  def trainContinue(df: DataFrame, text: Column,
                    rules: Seq[(String, String)], moreMerges: Int,
                    minFreq: Long = 1L,
                    maxWords: Int = Int.MaxValue): DataFrame = {
    require(moreMerges >= 1, s"moreMerges must be >= 1: $moreMerges")
    mergeLoop(df.sparkSession,
      initVocab(df, text, minFreq, maxWords, rules)
        .localCheckpoint(true),
      startRank = rules.size + 1, numMerges = moreMerges)
  }

  def train(df: DataFrame, text: Column, numMerges: Int,
            minFreq: Long = 1L,
            maxWords: Int = Int.MaxValue): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    mergeLoop(df.sparkSession,
      initVocab(df, text, minFreq, maxWords, Nil)
        .localCheckpoint(true),
      startRank = 1, numMerges = numMerges)
  }

  /** The shared merge loop: `numMerges` rounds from `vocabInit`,
    * ranks `startRank..`. One distributed pair-count + 1-row argmax
    * per round; vocab re-checkpointed per round to keep the plan
    * flat.
    */
  private def mergeLoop(spark: org.apache.spark.sql.SparkSession,
                        vocabInit: DataFrame, startRank: Int,
                        numMerges: Int): DataFrame = {
    import spark.implicits._
    var vocab = vocabInit
    val rules = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var r = startRank
    val endRank = startRank + numMerges - 1
    var done = false
    while (r <= endRank && !done) {
      // distributed pair count with map-side partials; ONE argmax
      // row crosses to the driver per round
      val top = vocab.where(size(col("l")) >= 2)
        .select(col("f"), explode(expr(
          "transform(sequence(1, size(l) - 1), " +
            "i -> struct(l[i-1] AS lhs, l[i] AS rhs))")).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("f")).cast("long").as("cnt"))
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val lhs = top(0).getString(0)
        val rhs = top(0).getString(1)
        val cnt = top(0).getLong(2)
        rules += ((r, lhs, rhs, lhs + rhs, cnt))
        vocab = vocab
          .select(col("word"), col("f"),
            applyMerge(col("l"), lhs, rhs).as("l"))
          .localCheckpoint(true)
        r += 1
      }
    }
    rules.toSeq.toDF("merge_rank", "lhs", "rhs", "merged", "cnt")
  }

  /** Encode text with a trained merge table: whitespace pre-tokenize,
    * decompose each token to code points, apply every rule in rank
    * order (each an in-lambda [[applyMerge]] pass), flatten back to
    * one subword array. Pure column expression — encoding a 100 TB
    * corpus with a trained tokenizer is a narrow map, no joins, no
    * shuffle.
    */
  def encode(text: Column, rules: Seq[(String, String)]): Column =
    flatten(transform(
      graft.functions.TextFunctions.tokens(text),
      w => rules.foldLeft(chars(w)) { case (acc, (lhs, rhs)) =>
        applyMerge(acc, lhs, rhs)
      }))
}
