package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  *
  * All are composed from built-in codegen'd Spark functions (no UDFs):
  * they stay inside whole-stage codegen and push down through Catalyst.
  * Each has an exact ANSI-SQL equivalent runnable by DuckDB, used by
  * the oracle queries in [[graft.queries.PipelineQueries]].
  */
object TextFunctions {

  /** Whitespace tokenization (the baseline tokenizer). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Token count: whitespace tokens. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-unit count: runs of letters, digits, or single
    * punctuation — a cheap proxy for subword token counts.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"),
      lit(0)))

  /** Canonical text form for fingerprinting: lowercase, collapsed
    * whitespace, trimmed.
    */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Document fingerprint: md5 of the canonical form (same digest
    * function exists in DuckDB → oracle-comparable).
    */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** ASCII-folded canonical form for substring fingerprinting:
    * [[normalized]] with every char outside `[a-z0-9 ]` replaced by
    * `_`. Two reasons: (1) MOSS-style fingerprint matching is
    * deliberately punctuation/markup-insensitive, so folding is a
    * feature, not a loss; (2) it pins the alphabet to single-byte
    * ASCII, making `substr`/`ord` position-and-value identical across
    * engines (multi-byte code points are where Spark's UTF8String and
    * other engines' grapheme/byte indexing could quietly disagree).
    */
  def asciiCanon(text: Column): Column =
    regexp_replace(normalized(text), "[^a-z0-9 ]", "_")

  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    * SIGMOD'03 — the MOSS algorithm): Rabin–Karp rolling hashes of all
    * character k-grams of [[asciiCanon]], then the minimum hash of
    * each w-wide window of consecutive k-gram hashes; the distinct
    * minima (sorted) are the document's fingerprint set. Guarantee:
    * any shared substring of length >= w+k-1 between two documents
    * yields at least one shared fingerprint, so fingerprint-set
    * overlap is a complete detector for long verbatim overlap
    * (quotes, mirrors, boilerplate) at ~1/w the storage of full
    * k-gram shingles.
    *
    * One O(n) JVM call per document via the native
    * [[WinnowFpExpr]] (rolling hash + monotonic-deque window minima)
    * — a pure codegen'd projection, no explode, no shuffle, no UDF.
    * The hash is the Horner recurrence `h = (h·257 + ord(c)) mod
    * (2^31-1)` with a mod at every step, so the SQL oracle runs the
    * textually identical exact-long arithmetic.
    *
    * Documents shorter than k+w-1 canon chars (no complete window,
    * including null text) get an empty fingerprint array.
    */
  def winnowFingerprints(text: Column, k: Int = 16,
                         w: Int = 8): Column = {
    require(k >= 2 && w >= 1, s"need k >= 2, w >= 1: k=$k, w=$w")
    coalesce(WinnowFpExpr.winnowNative(text.cast("string"), k, w),
      typedLit(Array.empty[Long]))
  }

  /** Feature-hashing linear classifier score — model inference as a
    * map-only projection (the fastText-style quality/topic classifier
    * shape; hashing trick per Weinberger et al., ICML 2009). Each
    * whitespace token hashes into one of `numBuckets` md5 buckets,
    * and the model weight for bucket b is a deterministic integer in
    * [-1000, 1000] via a Knuth multiplicative mix — the documented
    * stand-in for a trained weight vector shipped as a formula (swap
    * a broadcast bucket->weight lookup in for real weights; the plan
    * shape is identical). The score folds over the token array IN
    * PLACE as an exact BIGINT: no explode, no join, no shuffle — at
    * 100 TB this runs at scan speed next to the parquet reader.
    */
  def hashClassifierScore(text: Column, numBuckets: Int = 64): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => {
      val b = pmod(conv(substring(md5(t), 1, 8), 16, 10).cast("long"),
        lit(numBuckets.toLong))
      acc + pmod(b * lit(2654435761L), lit(2001L)) - lit(1000L)
    })

  /** Punctuation character count (sentence-level quality signal). */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.!?,;:]", ""))

  /** Stopword occurrences among whitespace tokens. */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), x => x.isInCollection(stopwords)))

  /** Quality score in [0,1]-ish: rewards mid-length docs with low
    * punctuation density and a sane stopword ratio. Deterministic
    * decimal arithmetic (cast before ratio) for oracle parity.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nPunct = punctCount(text).cast("double")
    val nChar = length(text).cast("double")
    val meanWordLen = nChar / greatest(nTok, lit(1.0))
    ((lit(1.0) - least(nPunct / greatest(nChar, lit(1.0)) * 10, lit(1.0)))
      * least(nTok / lit(100.0), lit(1.0))
      * least(meanWordLen / lit(8.0), lit(1.0)))
      .cast("decimal(18,6)")
  }

  /** PII-pattern occurrence counts — the scan a corpus runs before
    * release (emails, IPv4 literals, phone-shaped digit runs,
    * SSN-shaped triples). Non-overlapping match counts via
    * `regexp_count`; the character classes are shared Java-regex /
    * RE2 syntax so DuckDB's `regexp_extract_all` counts identically.
    * Detection only — redaction composes as a `regexp_replace` over
    * the same patterns.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "emails" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4" -> "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}",
    "phones" -> "\\+?[0-9][0-9 -]{7,}[0-9]",
    "ssns" -> "[0-9]{3}-[0-9]{2}-[0-9]{4}")

  /** Struct of per-pattern PII counts for one document. */
  def piiStats(text: Column): Column =
    struct(PiiPatterns.map { case (name, pat) =>
      regexp_count(text, lit(pat)).cast("long").as(s"n_$name")
    }: _*)

  /** Redaction tag per PII category. */
  val PiiTags: Map[String, String] = Map(
    "emails" -> "[EMAIL]", "ipv4" -> "[IPV4]",
    "phones" -> "[PHONE]", "ssns" -> "[SSN]")

  /** Order of application for [[redactPii]]: most-specific first —
    * SSNs before phones (an SSN is also a phone-shaped digit run) and
    * IPv4 before phones. The oracle must nest its `regexp_replace`
    * calls in exactly this order.
    */
  val PiiRedactOrder: Seq[String] =
    Seq("emails", "ssns", "ipv4", "phones")

  /** Redact every PII match with its category tag — the release-time
    * counterpart of [[piiStats]]. ONE native expression running the
    * sequential most-specific-first fold internally
    * ([[graft.functions.RedactPiiExpr]] — same java.util.regex
    * engine, same pass order, byte-identical to the nested
    * `regexp_replace` spelling below, RedactPiiSpec-pinned): a pure
    * projection, no UDF, no shuffle, scales as a map over the corpus.
    * Same character classes as the scan, so scan-flagged spans are
    * exactly the redacted spans. The single node converts the string
    * once and skips whole passes that match nothing, where the
    * 4-node `regexp_replace` stack paid a conversion + copy per pass
    * — and was what the optimizer re-inlined wholesale into
    * pushed-down filters (q105 paid the chain twice per row).
    */
  def redactPii(text: Column): Column =
    graft.functions.RedactPiiExpr.redactNative(text)

  /** The legacy nested-`regexp_replace` spelling — the reference the
    * oracle mirrors and RedactPiiSpec compares the native expression
    * against. Not used in query paths.
    */
  def redactPiiFold(text: Column): Column = {
    val pats = PiiPatterns.toMap
    PiiRedactOrder.foldLeft(text) { (c, name) =>
      regexp_replace(c, pats(name), PiiTags(name))
    }
  }

  /** Gopher's "must contain 2 of these" stopword set (Rae et al.,
    * "Scaling Language Models: ... Gopher", 2021, quality-filter
    * appendix).
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** C4-style boilerplate policy phrases (Raffel et al., JMLR 2020):
    * a page mentioning these is navigation/legal chrome, not prose.
    */
  val C4PolicyPhrases: Seq[String] =
    Seq("terms of use", "privacy policy", "cookie policy",
      "uses cookies")

  /** Composite Gopher/C4 quality filter: every rule as a boolean
    * field plus the `keep` verdict, computed in ONE projection over
    * the text (a single corpus scan — a real curation pipeline
    * applies these as a unit, not as N passes). All thresholds are
    * integer cross-multiplications, no float ratios, so the DuckDB
    * oracle agrees exactly.
    *
    * Rules (Gopher quality appendix + C4):
    *  - `wc_ok`      50 <= word count <= 100000
    *  - `mwl_ok`     mean word length in [3, 10]
    *  - `sym_ok`     '#'/'...' symbol-to-word ratio <= 0.1
    *  - `bullet_ok`  <= 90% of lines start with a bullet
    *  - `ell_ok`     <= 30% of lines end with an ellipsis
    *  - `alpha_ok`   >= 80% of words contain an alphabetic char
    *  - `stop_ok`    >= 2 of [[GopherStopwords]] appear as tokens
    *  - `rep_ok`     top 2-gram <= 20% of 2-grams AND top 3-gram
    *                 <= 10% of 3-grams (the q42 thresholds)
    *  - `curly_ok`   no curly brace (C4's code-page heuristic)
    *  - `policy_ok`  none of [[C4PolicyPhrases]] (C4 boilerplate)
    *  - `keep`       AND of all of the above
    */
  /** Field order of [[qualityFlags]]'s struct — shared by the batch
    * census (q108) and its streaming twin so the two aggregations
    * cannot drift.
    */
  val QualityRuleNames: Seq[String] = Seq("wc_ok", "mwl_ok",
    "sym_ok", "bullet_ok", "ell_ok", "alpha_ok", "stop_ok",
    "rep_ok", "curly_ok", "policy_ok", "keep")

  def qualityFlags(text: Column): Column = {
    import graft.functions.TopNGramExpr.topNGramNative
    val toks = tokens(text)
    val ntok = size(toks).cast("long")
    val nonspace = length(regexp_replace(text, "\\s", "")).cast("long")
    val nSym = (regexp_count(text, lit("#")) +
      regexp_count(text, lit("\\.\\.\\."))).cast("long")
    val nLines = size(split(text, "\n")).cast("long")
    val nBullet =
      regexp_count(text, lit("(?m)^ *[-*•]")).cast("long")
    val nEllEnd =
      regexp_count(text, lit("(?m)\\.\\.\\.$")).cast("long")
    val nAlpha =
      size(filter(toks, x => x.rlike("[A-Za-z]"))).cast("long")
    val stopHits = GopherStopwords
      .map(w => array_contains(toks, w).cast("int"))
      .reduce(_ + _)
    val g2 = topNGramNative(text, 2)
    val g3 = topNGramNative(text, 3)
    val lt = lower(text)
    val wcOk = ntok >= 50L && ntok <= 100000L
    val mwlOk = nonspace >= ntok * 3L && nonspace <= ntok * 10L
    val symOk = nSym * 10L <= ntok
    val bulletOk = nBullet * 10L <= nLines * 9L
    val ellOk = nEllEnd * 10L <= nLines * 3L
    val alphaOk = nAlpha * 5L >= ntok * 4L
    val stopOk = stopHits >= 2
    val repOk = g2.getField("top") * 5L <= g2.getField("n") &&
      g3.getField("top") * 10L <= g3.getField("n")
    val curlyOk = !lt.contains("{")
    val policyOk = C4PolicyPhrases
      .map(p => !lt.like(s"%$p%"))
      .reduce(_ && _)
    val fields = Seq(
      "wc_ok" -> wcOk, "mwl_ok" -> mwlOk, "sym_ok" -> symOk,
      "bullet_ok" -> bulletOk, "ell_ok" -> ellOk,
      "alpha_ok" -> alphaOk, "stop_ok" -> stopOk, "rep_ok" -> repOk,
      "curly_ok" -> curlyOk, "policy_ok" -> policyOk)
    struct(fields.map { case (n, c) => c.as(n) } :+
      fields.map(_._2).reduce(_ && _).as("keep"): _*)
  }

  /** Marker-word language guess (n-gram heuristic, LIKE-based so the
    * DuckDB oracle is byte-identical). Ordered first-match ladder.
    */
  def langGuess(text: Column): Column = {
    val t = lower(text)
    when(t.like("% the %").or(t.like("% and %")), "en")
      .when(t.like("% der %").or(t.like("% und %")), "de")
      .when(t.like("% el %").or(t.like("% la %")), "es")
      .when(t.like("% le %").or(t.like("% et %")), "fr")
      .otherwise("und")
  }

}
