package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `BinaryType` columns with a typed metadata struct.
  *
  * The Spark-side machinery — schema, per-item metadata, partition-
  * friendly batch transforms, frame sampling — is real and tested.
  * Header-level decode is REAL ([[imageMeta]]: PNG/JPEG/GIF/BMP magic
  * + pixel dimensions read from the payload bytes per the public
  * format specs, no image library). Pixel-level decode is STUBBED
  * with a deterministic fake ([[fakeDecodeFeatures]]): the execution
  * container has no image/audio libraries, so that stage is the only
  * seam a production deploy replaces (e.g. with a JNI decoder inside
  * `mapPartitions`, keeping the same columnar contract).
  */
object Multimodal {

  /** Container sniff + pixel dimensions from the payload HEADER bytes
    * (see [[graft.functions.ImageMetaExpr]]): one native codegen'd
    * call per payload returning `struct<format, width, height>`,
    * "unknown"/null for unrecognized bytes — never a throw, so a
    * 100 TB scan survives corrupt blobs.
    */
  def imageMeta(payload: Column): Column =
    graft.functions.ImageMetaExpr.imageMetaNative(payload)

  /** Audio-container sniff + stream parameters from the payload
    * HEADER bytes (see [[graft.functions.AudioMetaExpr]]): one native
    * codegen'd call per payload returning `struct<format, channels,
    * sample_rate, bits_per_sample, duration_ms>` — WAV and FLAC fully
    * parsed, MP3 frame parameters, OGG container-identified;
    * "unknown"/null for unrecognized bytes, never a throw.
    */
  def audioMeta(payload: Column): Column =
    graft.functions.AudioMetaExpr.audioMetaNative(payload)

  /** Perceptual 64-bit dHash over DECODED pixels (uncompressed BMP;
    * see [[graft.functions.ImageHash]]): one native codegen'd call
    * per payload, null for undecodable bytes. Pair with
    * [[graft.operators.Dedup.imageNearDups]] for banded near-dup
    * joins.
    */
  def imageDHash(payload: Column): Column =
    graft.functions.ImageHash.imageDHash(payload)

  /** Perceptual 64-bit average-hash sibling of [[imageDHash]]. */
  def imageAHash(payload: Column): Column =
    graft.functions.ImageHash.imageAHash(payload)

  /** 64-bit energy-envelope fingerprint over DECODED PCM samples
    * (16-bit WAV; see [[graft.functions.AudioPcm]]): one native
    * codegen'd call per payload, null for undecodable bytes. Volume-
    * scaling-invariant by construction — pair with
    * [[graft.operators.Dedup.hammingNearDups]] for banded near-dup
    * joins over re-amplified/re-encoded clips.
    */
  def audioFingerprint(payload: Column): Column =
    graft.functions.AudioPcm.audioFingerprint(payload)

  /** Exact content stats for a PCM 16-bit WAV payload:
    * `struct<n_samples, peak, silent_windows>` (see
    * [[graft.functions.AudioPcm]]) — the silence/clipping face of an
    * audio corpus scan. Null for undecodable bytes.
    */
  def audioStats(payload: Column): Column =
    graft.functions.AudioPcm.audioStats(payload)

  /** EXIF metadata from a JPEG payload's APP1 segment (see
    * [[graft.functions.Exif]]): `struct<has_exif, has_gps, make,
    * model, datetime, orientation>`, null for non-JPEG bytes — the
    * PII scan face of a multimodal corpus.
    */
  def exifMeta(payload: Column): Column =
    graft.functions.Exif.exifMeta(payload)

  /** The redaction side of [[exifMeta]]: the same JPEG with every
    * Exif APP1 segment removed, all other bytes identical (non-JPEG
    * inputs pass through unchanged).
    */
  def exifStrip(payload: Column): Column =
    graft.functions.Exif.exifStrip(payload)

  /** Per-frame 64-bit dHashes over DECODED video frames
    * (uncompressed-RGB AVI; see [[graft.functions.VideoFrames]]):
    * `array<struct<idx, dhash>>` in stream order, null for
    * undecodable bytes — the raw material for shot-boundary
    * detection (Hamming distance between consecutive frames) and
    * sequence-level near-dup joins.
    */
  def videoFrameHashes(payload: Column): Column =
    graft.functions.VideoFrames.videoFrameHashes(payload)

  /** Video-container sniff + stream parameters from the payload
    * HEADER bytes (see [[graft.functions.VideoMetaExpr]]): one native
    * codegen'd call per payload returning `struct<format,
    * major_brand, duration_ms, width, height>` — MP4/ISO-BMFF box
    * walk (mvhd duration, tkhd dimensions), Matroska/WebM
    * container-identified; "unknown"/null for unrecognized bytes,
    * never a throw.
    */
  def videoMeta(payload: Column): Column =
    graft.functions.VideoMetaExpr.videoMetaNative(payload)

  /** Content-type sniff over a MIXED binary column — the router a
    * multimodal ingest runs before dispatching payloads to their
    * decode paths: all three header decoders evaluate in ONE
    * codegen'd projection (each is O(header) on the payload bytes,
    * never a throw), and the first recognizing family wins. Returns
    * `struct<kind, format>` — kind ∈ image/audio/video/unknown —
    * NULL for a NULL payload.
    */
  def sniffMedia(payload: Column): Column = {
    val i = imageMeta(payload).getField("format")
    val a = audioMeta(payload).getField("format")
    val v = videoMeta(payload).getField("format")
    when(payload.isNull,
        lit(null).cast("struct<kind:string,format:string>"))
      .when(i =!= "unknown",
        struct(lit("image").as("kind"), i.as("format")))
      .when(a =!= "unknown",
        struct(lit("audio").as("kind"), a.as("format")))
      .when(v =!= "unknown",
        struct(lit("video").as("kind"), v.as("format")))
      .otherwise(struct(lit("unknown").as("kind"),
        lit("unknown").as("format")))
  }

  /** Metadata schema carried alongside every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)))

  /** Wrap a source column as an opaque binary payload + metadata
    * struct — the ingestion shape for media columns.
    */
  def asMedia(df: DataFrame, src: Column, format: String): DataFrame = {
    val blob = src.cast(BinaryType)
    df.withColumn("payload", blob)
      .withColumn("meta", struct(
        lit(format).as("format"),
        length(blob).cast(LongType).as("n_bytes"),
        md5(blob).as("checksum")))
  }

  /** STUB decode: deterministic fake feature extraction — a 16-bin
    * byte histogram computed with array built-ins (stands in for an
    * image-embedding / audio-fingerprint stage; same columnar contract:
    * binary in, fixed-width float vector out).
    */
  def fakeDecodeFeatures(payload: Column, bins: Int = 16): Column = {
    // deterministic projection of the checksum — the STUB contract is
    // "fixed-width numeric features per payload", not real pixels
    val h = md5(payload)
    array((0 until bins).map(i =>
      (conv(substring(h, i * 2 + 1, 2), 16, 10).cast(DoubleType)
        / 255.0)): _*)
  }

  /** "Frame sampling": fixed-stride byte slices of the payload (the
    * shape of video frame extraction: one row per sampled frame).
    */
  def sampleFrames(df: DataFrame, payloadCol: String,
                   frameBytes: Int, stride: Int): DataFrame = {
    val p = col(payloadCol)
    df.withColumn("frame_offset", explode(sequence(lit(1),
        greatest(length(p) - frameBytes + 1, lit(1)), lit(stride))))
      .withColumn("frame",
        expr(s"substring($payloadCol, frame_offset, $frameBytes)"))
  }

  /** Per-source media statistics over the payloads (the oracle-checked
    * plumbing query).
    */
  def mediaStats(df: DataFrame, groupCol: Column): DataFrame =
    df.groupBy(groupCol.as("grp"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        min(col("meta.n_bytes")).as("min_bytes"),
        max(col("meta.n_bytes")).as("max_bytes"))
      .orderBy(col("grp").asc_nulls_first)
}
