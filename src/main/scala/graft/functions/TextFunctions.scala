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
    * counterpart of [[piiStats]]. A sequential fold of codegen'd
    * `regexp_replace` calls (each replaces ALL non-overlapping
    * matches), so it is a pure projection: no UDF, no shuffle, scales
    * as a map over the corpus. Same character classes as the scan, so
    * scan-flagged spans are exactly the redacted spans.
    */
  def redactPii(text: Column): Column = {
    val pats = PiiPatterns.toMap
    PiiRedactOrder.foldLeft(text) { (c, name) =>
      regexp_replace(c, pats(name), PiiTags(name))
    }
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
