package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SQL surface for the engine's native expressions — `spark.sql(
  * "SELECT simhash32(text) …")` instead of the Scala Column API —
  * injected the idiomatic Spark way:
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * (or `.withExtensions(new GraftExtensions)`). Every function is
  * the SAME codegen'd Catalyst expression the Column API uses; the
  * registry only adds name resolution, so SQL-authored pipelines
  * keep whole-stage codegen. Integer parameters (shingle k, band
  * counts, CDC bounds) must be literals — they size generated code
  * and native buffers, exactly like the built-ins' `approx_count_
  * distinct(x, 0.01)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit =
    all.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
}

object GraftExtensions {

  /** A scalar parameter that sizes codegen/buffers: must fold to an
    * integer literal at analysis time.
    */
  private def litInt(e: Expression, fn: String, arg: String): Int =
    e match {
      case Literal(v: Int, _) => v
      case Literal(v: Long, _) => v.toInt
      case Literal(v: Short, _) => v.toInt
      case Literal(v: Byte, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be an integer literal, " +
          s"got $other")
    }

  private def arity(fn: String, args: Seq[Expression],
                    ns: Int*): Unit =
    if (!ns.contains(args.length))
      throw new IllegalArgumentException(
        s"$fn expects ${ns.mkString(" or ")} arguments, " +
          s"got ${args.length}")

  /** (name, usage, builder) for every registered function. */
  val all: Seq[(String, String, FunctionBuilder)] = Seq(
    ("simhash32",
      "simhash32(text) - 32-bit SimHash over whitespace tokens",
      args => { arity("simhash32", args, 1)
        SimHashExpr(args.head) }),
    ("nfc_normalize",
      "nfc_normalize(text) - Unicode NFC canonical composition",
      args => { arity("nfc_normalize", args, 1)
        NfcNormalizeExpr(args.head) }),
    ("html_blocks",
      "html_blocks(html) - array<(text, n_chars, n_link_chars)> " +
        "block segmentation for boilerplate removal",
      args => { arity("html_blocks", args, 1)
        HtmlBlocksExpr(args.head) }),
    ("html_extract",
      "html_extract(html) - (text, title, n_links, n_paragraphs) " +
        "from markup: tags/scripts/styles/comments stripped, " +
        "entities decoded",
      args => { arity("html_extract", args, 1)
        HtmlTextExpr(args.head) }),
    ("lsh_sign",
      "lsh_sign(vec) - sign-random-projection LSH bits",
      args => { arity("lsh_sign", args, 1)
        LshSignExpr(args.head) }),
    ("image_meta",
      "image_meta(bytes) - (format, width, height) from the header",
      args => { arity("image_meta", args, 1)
        ImageMetaExpr(args.head) }),
    ("audio_meta",
      "audio_meta(bytes) - (format, channels, rate, ms) header scan",
      args => { arity("audio_meta", args, 1)
        AudioMetaExpr(args.head) }),
    ("video_meta",
      "video_meta(bytes) - container/codec header scan",
      args => { arity("video_meta", args, 1)
        VideoMetaExpr(args.head) }),
    ("dot_q",
      "dot_q(vec, vec) - exact quantized dot product",
      args => { arity("dot_q", args, 2)
        DotQExpr(args(0), args(1)) }),
    ("hilbert2",
      "hilbert2(x, y, bits) - 2-D Hilbert curve position",
      args => { arity("hilbert2", args, 3)
        HilbertExpr(args(0), args(1),
          litInt(args(2), "hilbert2", "bits")) }),
    ("min_hash_sig",
      "min_hash_sig(text, k, salts) - MinHash signature over " +
        "k-token shingles",
      args => { arity("min_hash_sig", args, 3)
        MinHashExpr(args.head, litInt(args(1), "min_hash_sig", "k"),
          litInt(args(2), "min_hash_sig", "salts")) }),
    ("winnow_fingerprints",
      "winnow_fingerprints(text, k, w) - winnowed k-gram digests",
      args => { arity("winnow_fingerprints", args, 3)
        WinnowFpExpr(args.head,
          litInt(args(1), "winnow_fingerprints", "k"),
          litInt(args(2), "winnow_fingerprints", "w")) }),
    ("word_shingles",
      "word_shingles(text, k) - k-token shingle array",
      args => { arity("word_shingles", args, 2)
        WordShinglesExpr(args.head,
          litInt(args(1), "word_shingles", "k")) }),
    ("pos_shingle_digests",
      "pos_shingle_digests(tokens_array, k) - positional k-gram " +
        "digests over an ALREADY-tokenized array (positions must " +
        "share one tokenization with the caller)",
      args => { arity("pos_shingle_digests", args, 2)
        PosShingleDigestsExpr(args.head,
          litInt(args(1), "pos_shingle_digests", "k")) }),
    ("top_ngram",
      "top_ngram(text, k) - most frequent k-gram and its count",
      args => { arity("top_ngram", args, 2)
        TopNGramExpr(args.head, litInt(args(1), "top_ngram", "k")) }),
    ("cdc_chunks",
      "cdc_chunks(bytes, minLen, avgBits, maxLen) - " +
        "content-defined chunk boundaries",
      args => { arity("cdc_chunks", args, 4)
        CdcChunksExpr(args.head,
          litInt(args(1), "cdc_chunks", "minLen"),
          litInt(args(2), "cdc_chunks", "avgBits"),
          litInt(args(3), "cdc_chunks", "maxLen")) }),
    ("quartiles_agg",
      "quartiles_agg(x[, maxDistinct]) - exact positional quartiles",
      args => { arity("quartiles_agg", args, 1, 2)
        if (args.length == 1) QuartilesAgg(args.head)
        else QuartilesAgg(args.head,
          litInt(args(1), "quartiles_agg", "maxDistinct")) }),
    ("char_class_agg",
      "char_class_agg(s[, maxWidth]) - per-position character " +
        "class sets",
      args => { arity("char_class_agg", args, 1, 2)
        if (args.length == 1) CharClassAgg(args.head)
        else CharClassAgg(args.head,
          litInt(args(1), "char_class_agg", "maxWidth")) }),
    ("space_saving",
      "space_saving(x[, k]) - SpaceSaving heavy hitters",
      args => { arity("space_saving", args, 1, 2)
        if (args.length == 1) SpaceSavingAgg(args.head)
        else SpaceSavingAgg(args.head,
          litInt(args(1), "space_saving", "k")) }))
}
