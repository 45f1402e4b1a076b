package graft.datatools

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata. The decode step is a clearly-marked
  * deterministic STUB (no image/audio libs in this container — builder
  * prompt instruction); everything Spark-side — schema, partitioning,
  * batch shape, codec dispatch — is real and tested, and the stub swaps
  * for a JNI/FFM decoder without touching the plumbing.
  */
object Multimodal {

  final case class MediaMeta(
      media_ref: String,
      codec: String,       // "png" | "jpeg" | "wav" | "mp4" — from magic bytes
      width: Int,          // images/video
      height: Int,
      duration_ms: Long,   // audio/video
      n_frames: Int,
      bytes_len: Long)

  /** Synthesize a deterministic binary payload for a media_ref (the
    * sandbox stand-in for object-store fetch). First 4 bytes select the
    * codec; the rest is a splitmix byte stream.
    */
  def syntheticBytes(mediaRef: String, len: Int = 256): Array[Byte] = {
    val h0 = graft.functions.UrlFunctions.murmur3(mediaRef).toLong
    val out = new Array[Byte](len)
    // codec pick hashes with md5Lower64 (= DuckDB md5_number_lower) so
    // the codec distribution has an exact SQL oracle twin (q33)
    val magic = (TextAnalysis.md5Lower64(mediaRef) & 3L).toInt match {
      case 0 => Array[Byte](0x89.toByte, 'P', 'N', 'G')
      case 1 => Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte) // jpeg
      case 2 => Array[Byte]('R', 'I', 'F', 'F')                                  // wav
      case _ => Array[Byte](0, 0, 0, 0x18)                                       // mp4 ftyp-ish
    }
    System.arraycopy(magic, 0, out, 0, 4)
    var s = h0
    var i = 4
    while (i < len) {
      s = graft.frontier.CuckooFilter.mix(s)
      out(i) = (s & 0xff).toByte
      i += 1
    }
    out
  }

  def codecOf(bytes: Array[Byte]): String =
    if (bytes.length < 4) "unknown"
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') "png"
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
    else if (bytes(0) == 'R' && bytes(1) == 'I') "wav"
    else if (bytes(3) == 0x18) "mp4"
    else "unknown"

  /** ??? DECODE STUB ??? — deterministic fake of the real decoder: a
    * production build replaces this body with an actual codec call; the
    * signature, schema and batch shape stay identical.
    */
  def decodeStub(mediaRef: String, bytes: Array[Byte]): MediaMeta = {
    val h = graft.frontier.CuckooFilter.mix(
      graft.functions.UrlFunctions.murmur3(mediaRef).toLong)
    val codec = codecOf(bytes)
    val isImage = codec == "png" || codec == "jpeg"
    MediaMeta(
      media_ref = mediaRef,
      codec = codec,
      width = if (isImage || codec == "mp4") (64 + Math.floorMod(h, 1920L)).toInt else 0,
      height = if (isImage || codec == "mp4") (64 + Math.floorMod(h >> 16, 1080L)).toInt else 0,
      duration_ms = if (codec == "wav" || codec == "mp4") 500 + Math.floorMod(h >> 24, 60000L) else 0L,
      n_frames = if (codec == "mp4") (1 + Math.floorMod(h >> 32, 300L)).toInt else if (isImage) 1 else 0,
      bytes_len = bytes.length.toLong)
  }

  /** Attach synthetic media payloads to a docs frame that carries a
    * media_ref column. Real plumbing: binary column, per-partition
    * batch decode via mapPartitions (the Scala analog of mapInPandas —
    * one decoder instance per partition, vectorized batch shape).
    */
  def withMediaMeta(spark: SparkSession, refs: DataFrame, refCol: String = "media_ref"): Dataset[MediaMeta] = {
    import spark.implicits._
    refs.select(col(refCol)).distinct().as[String].mapPartitions { it =>
      // per-partition decoder init happens HERE in a real build
      it.map { ref => decodeStub(ref, syntheticBytes(ref)) }
    }
  }

  /** Frame sampling for video refs: every `stride`-th frame index —
    * generator-shaped (UDTF analog, T4-style explode).
    */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int): DataFrame =
    meta.toDF().filter(col("codec") === "mp4" && col("n_frames") > 0)
      .select(col("media_ref"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Resize plumbing: new dims preserved-aspect-ratio — pure arithmetic
    * on metadata (the real byte transform is the decoder's job).
    */
  def resizeMeta(meta: Dataset[MediaMeta], maxDim: Int): DataFrame =
    meta.toDF().withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxDim, lit(1.0))
          .otherwise(lit(maxDim).cast("double") / greatest(col("width"), col("height"))))
      .withColumn("new_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("new_height", floor(col("height") * col("scale")).cast("int"))

  // -----------------------------------------------------------------
  // Image perceptual-hash (average-hash) near-dup
  // -----------------------------------------------------------------

  /** Decoded image feature row: the 64-bit average-hash computed at
    * decode time (bit j = cell j of the 8×8 downscaled luma grid above
    * the mid-level) — the standard aHash perceptual fingerprint.
    */
  final case class ImageFeat(media_ref: String, ahash: Long)

  private val LumaMask = 0xffffffffffffL        // 48-bit luma values
  private val LumaMid = 1L << 47                // grid mid-level

  /** ??? DECODE STUB ??? — a real build decodes `bytes`, downscales to
    * an 8×8 luma grid and thresholds at the grid mean. The stub derives
    * the grid deterministically from the ref's CONTENT KEY (the part
    * before the variant suffix, `img://<key>/v<n>`), with each variant
    * inverting the ~1/16 of cells its salt selects — the re-encode /
    * recompress artifact that makes variants of one image NEAR
    * duplicates (small hamming) while distinct images stay ~32 apart.
    * md5-only arithmetic, so the q116 oracle replays every bit.
    */
  def imageFeatStub(mediaRef: String, bytes: Array[Byte]): ImageFeat = {
    val body = mediaRef.stripPrefix("img://")
    val slash = body.lastIndexOf("/v")
    val (key, variant) =
      if (slash < 0) (body, 0)
      else (body.substring(0, slash), body.substring(slash + 2).toInt)
    var sig = 0L
    var j = 0
    while (j < 64) {
      val base = TextAnalysis.md5Lower64(s"$key:$j") & LumaMask
      val flip = variant > 0 &&
        (TextAnalysis.md5Lower64(s"$key:$variant:$j") & 15L) == 0L
      val luma = if (flip) LumaMask - base else base
      if (luma > LumaMid) sig |= (1L << j)
      j += 1
    }
    ImageFeat(mediaRef, sig)
  }

  /** Decode-time feature extraction over a refs frame — same plumbing
    * as [[withMediaMeta]] (distinct refs, per-partition batch decode via
    * mapPartitions; the decoder instance and its scratch buffers
    * initialize once per partition in a real build).
    */
  def withImageFeatures(spark: SparkSession, refs: DataFrame,
                        refCol: String = "media_ref"): Dataset[ImageFeat] = {
    import spark.implicits._
    refs.select(col(refCol)).distinct().as[String].mapPartitions { it =>
      it.map { ref => imageFeatStub(ref, syntheticBytes(ref)) }
    }
  }

  /** Image near-dup pairs: hamming ≤ `maxDist` over the decode-time
    * aHash, candidates generated by the SAME (band, bucket) machinery
    * as the text SimHash path ([[Dedup.sigBandPairs]]) — the sketch is
    * per-modality, the banded candidate join is not. 8×8 banding
    * guarantees hamming ≤ 7 with no probing; output is
    * (ref_a, ref_b, hamming).
    */
  /** Banding-parameter audit for the image aHash layer — the q110/q114/
    * q117/q118 treatment for the LAST approximate family, so every
    * sketch the pipeline banks on has its tuning operator: recall and
    * precision of candidate (bands, bitsPerBand) splits of the 64-bit
    * perceptual hash against exact hamming ground truth, over one
    * persisted all-pairs frame of a SAMPLE of decoded signatures
    * (8 B/image — with a real decoder the sample decode dominates, the
    * audit itself is signature-only). Delegates to the shared
    * [[Dedup.sigBandingAudit]] core — the same machinery that audits
    * the text SimHash banding, because the banded candidate join they
    * parameterize ([[Dedup.sigBandPairs]]) is itself shared.
    */
  def imageBandingAudit(feats: Dataset[ImageFeat], maxDist: Int = 7,
                        configs: Seq[(Int, Int)] = Seq((2, 32), (4, 16), (8, 8))): DataFrame =
    Dedup.sigBandingAudit(
      feats.toDF().select(col("media_ref").as("id"), col("ahash").as("sig")),
      maxDist, configs)

  def imageNearDup(feats: Dataset[ImageFeat], maxDist: Int = 7,
                   bands: Int = 8, bitsPerBand: Int = 8): DataFrame = {
    // persist the decoded signatures: both sides of the band-bucket
    // self-join read this frame, and with a REAL decoder the decode is
    // by far the most expensive stage — it must run once, not twice
    // (8 bytes/image cached, not the pixels). Callers release it after
    // consuming the result (clearCache, the containmentPairs contract).
    val sigs = feats.toDF()
      .select(col("media_ref").as("id"), col("ahash").as("sig")).persist()
    Dedup.sigBandPairs(sigs, maxDist, bands, bitsPerBand)
      .select(col("id_a").as("ref_a"), col("id_b").as("ref_b"), col("hamming"))
  }
}
