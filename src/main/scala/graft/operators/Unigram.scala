package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, UnigramSegmentExpr}

/** Unigram-LM tokenization (Kudo, "Subword regularization", ACL 2018
  * — the SentencePiece counterpart to q107's BPE): build a substring
  * vocabulary with integer code lengths from corpus counts, then
  * Viterbi-segment words into the minimum-code-length piece
  * sequence. Complements BPE structurally: BPE *grows* merges
  * bottom-up, unigram *selects* a best split top-down against a
  * scored vocabulary.
  *
  * Exactness: a piece's code length is the whole-bit surprisal
  * `bits(p) = ⌊log2 T⌋ − ⌊log2 c(p)⌋ + 1` (T = total kept-piece
  * mass, c = the piece's corpus count; the +1 is the per-piece
  * marker bit making fewer-pieces win at equal bits). The Viterbi
  * objective packs `(total bits, piece count)` into ONE integer —
  * `Σ (bits(p)·64 + 1)` — so the optimum's bit total AND piece count
  * are unique even when several splits achieve them, and a second
  * engine replays the min-plus fold exactly (whole bits via binary
  * string length, the q141 rule; no transcendentals, no floats).
  *
  * Shape at 100 TB: piece counting is word-table work — the corpus
  * collapses ONCE into (word, freq) (one keyed shuffle, the q107
  * contract), substring enumeration runs over DISTINCT words only,
  * and each word's count rides its frequency. The vocabulary is
  * bounded by the substring space (≤ maxPieceLen-gram alphabet), so
  * it collects to the driver under a PRICED cap (the codebook/LUT
  * discipline) and ships back inside a codegen'd expression —
  * segmentation itself is a narrow map over words or documents, no
  * joins, no shuffles.
  */
object Unigram {

  /** Distinct-word frequencies — q107's word table: whitespace
    * tokens, empties dropped (split of an empty trim yields [""]).
    */
  def wordFreqs(df: DataFrame, text: Column): DataFrame =
    df.select(explode(TextFunctions.tokens(text)).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("f"))

  /** Corpus counts of every substring piece of length 1..maxPieceLen
    * over the word table: a piece occurring twice in one word counts
    * twice per occurrence of the word (overlapping occurrences
    * counted — the q103 k-gram convention). Work is
    * O(distinct words · avg len · maxPieceLen), corpus-independent.
    */
  def pieceCounts(words: DataFrame, maxPieceLen: Int = 4): DataFrame =
    words
      .select(col("f"), explode(expr(
        s"""flatten(transform(sequence(0, length(w) - 1),
           |  i -> filter(transform(sequence(1, $maxPieceLen),
           |    k -> CASE WHEN i + k <= length(w)
           |         THEN substring(w, i + 1, k) END),
           |    x -> x IS NOT NULL)))""".stripMargin)).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("f")).cast("long").as("cnt"))

  private def bits(n: Long): Long =
    63L - java.lang.Long.numberOfLeadingZeros(n)

  /** Build the scored vocabulary: pieces with corpus count ≥
    * `minCount`, cost = `(bits(T) − bits(cnt) + 1)·64 + 1` (the
    * packed objective unit of [[UnigramSegmentExpr]]), optionally
    * refined by `emRounds` rounds of EM (the SentencePiece trainer's
    * missing half, Kudo ACL 2018 — the raw-substring counts
    * OVERCOUNT overlapping pieces; re-estimating from the actual
    * segmentation prunes pieces the model never uses):
    *
    *   E-step: Viterbi-segment the distinct-word table under the
    *     current vocabulary (a distributed narrow map — the same
    *     codegen'd expression as inference) and count each piece's
    *     frequency-weighted usage `mass(p) = Σ_w f(w)·uses_w(p)`
    *     (one keyed sum).
    *   M-step: drop pieces with `mass < emMinMass` — EXCEPT
    *     single-code-point pieces, the coverage floor that keeps
    *     every v0-segmentable word segmentable — and re-score the
    *     survivors from their add-one-smoothed masses:
    *     `cost'(p) = (bits(T') − bits(mass(p)+1) + 1)·64 + 1` with
    *     `T' = Σ_kept (mass+1)`.
    *
    * Collected to the driver under a priced cap (the vocabulary is
    * alphabet-bounded, not corpus-bounded, and EM only SHRINKS it);
    * the refusal names the knobs.
    */
  def vocabulary(words: DataFrame, maxPieceLen: Int = 4,
                 minCount: Long = 5L,
                 maxVocab: Int = 200000,
                 emRounds: Int = 0,
                 emMinMass: Long = 5L,
                 maxWordLen: Int = 60): Map[String, Long] = {
    val kept = pieceCounts(words, maxPieceLen)
      .where(col("cnt") >= minCount)
    val rows = kept.limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"unigram vocabulary exceeds maxVocab=$maxVocab pieces; " +
        s"raise minCount (=$minCount) or lower maxPieceLen " +
        s"(=$maxPieceLen), or raise maxVocab")
    val cnts = rows.map(r => r.getString(0) -> r.getLong(1))
    val total = cnts.map(_._2).sum
    var vocab = cnts.map { case (p, c) =>
      p -> ((bits(total) - bits(c) + 1L) * 64L + 1L)
    }.toMap
    for (_ <- 1 to emRounds) {
      // E-step: usage masses from the Viterbi segmentation (the
      // usage frame is at most vocabulary-sized — collect is priced
      // by the same cap)
      val usage = segmented(words, col("w"), vocab, maxPieceLen,
          maxWordLen)
        .where(col("seg").isNotNull)
        .select(col("f"), explode(col("seg.pieces")).as("piece"))
        .groupBy(col("piece"))
        .agg(sum(col("f")).cast("long").as("mass"))
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
      // M-step: prune by mass (singles always survive), re-score
      val keptP = vocab.keysIterator.filter { p =>
        usage.getOrElse(p, 0L) >= emMinMass ||
          p.codePointCount(0, p.length) == 1
      }.toSeq
      val masses = keptP.map(p => p -> (usage.getOrElse(p, 0L) + 1L))
      val t1 = masses.map(_._2).sum
      vocab = masses.map { case (p, m) =>
        p -> ((bits(t1) - bits(m) + 1L) * 64L + 1L)
      }.toMap
    }
    vocab
  }

  /** Segment a word column against a built vocabulary: appends
    * `struct<obj bigint, pieces array<string>>` (NULL = empty /
    * longer than `maxWordLen` code points / no covering path). A
    * pure codegen'd projection — narrow at any scale.
    */
  def segmented(words: DataFrame, word: Column,
                vocab: Map[String, Long], maxPieceLen: Int = 4,
                maxWordLen: Int = 60): DataFrame =
    words.withColumn("seg",
      org.apache.spark.sql.GraftShims.column(UnigramSegmentExpr(
        org.apache.spark.sql.GraftShims.expression(word), vocab,
        maxPieceLen, maxWordLen)))

  /** Corpus ENCODE census per group: every token occurrence joined
    * to its word's Viterbi split — `(grp, n_tokens, n_unseg,
    * n_pieces, sum_wbits)`, the fertility/compression numbers a
    * tokenizer evaluation reads at document level. The token→split
    * join is keyed on the word (the q141 model-join shape — AQE
    * broadcasts the word table when it fits); unsegmentable tokens
    * count in `n_unseg` and contribute no pieces/bits.
    */
  def encodeCensus(df: DataFrame, group: Column, text: Column,
                   maxPieceLen: Int = 4, minCount: Long = 5L,
                   maxWordLen: Int = 60,
                   maxVocab: Int = 200000,
                   emRounds: Int = 1): DataFrame = {
    val words = wordFreqs(df, text).localCheckpoint()
    val vocab = vocabulary(words, maxPieceLen, minCount, maxVocab,
      emRounds, minCount, maxWordLen)
    val seg = segmented(words, col("w"), vocab, maxPieceLen,
        maxWordLen)
      .select(col("w"), col("seg.obj").as("obj"))
    df.select(group.as("grp"),
        explode(TextFunctions.tokens(text)).as("w"))
      .where(col("w") =!= "")
      .join(seg, Seq("w"), "left")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("obj").isNull, 1)).as("n_unseg"),
        sum(pmod(col("obj"), lit(64L))).cast("long").as("n_pieces"),
        sum(expr("obj DIV 64")).cast("long").as("sum_wbits"))
  }

  /** The corpus segmentation census: distinct words Viterbi-split,
    * grouped by optimal piece count — `(n_pieces, n_words, n_tokens,
    * sum_wbits)` with NULL n_pieces collecting the unsegmentable
    * tail. `sum_wbits` is the frequency-weighted packed-bits total
    * `Σ f·(obj div 64)` — the corpus-level compression number a
    * tokenizer evaluation reads.
    */
  def segmentCensus(df: DataFrame, text: Column,
                    maxPieceLen: Int = 4, minCount: Long = 5L,
                    maxWordLen: Int = 60,
                    maxVocab: Int = 200000,
                    emRounds: Int = 1): DataFrame = {
    val words = wordFreqs(df, text).localCheckpoint()
    val vocab = vocabulary(words, maxPieceLen, minCount, maxVocab,
      emRounds, minCount, maxWordLen)
    segmented(words, col("w"), vocab, maxPieceLen, maxWordLen)
      .select(col("f"), col("seg.obj").as("obj"),
        when(col("seg").isNotNull, pmod(col("seg.obj"), lit(64L)))
          .as("n_pieces"))
      .groupBy(col("n_pieces"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("f")).cast("long").as("n_tokens"),
        // integral DIV keeps the weighted bits exact (a / would go
        // through doubles); the NULL group sums all-NULL → NULL
        sum(expr("f * (obj DIV 64)")).cast("long").as("sum_wbits"))
      .orderBy(col("n_pieces").asc_nulls_first)
  }
}
