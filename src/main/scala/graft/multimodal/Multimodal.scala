package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media asset: opaque binary payload + typed metadata. The payload is
  * NEVER interpreted by Spark itself — all engine-side operations (schema,
  * partitioning, shuffle, batching) treat it as `BINARY`, which is exactly
  * how a 100 TB image/audio corpus should flow: metadata columns are
  * pruned/pushed down independently of the payload, and payload bytes only
  * stream through the executors that actually decode. */
case class MediaItem(
    media_id: Long,
    kind: String,          // "image" | "audio" | "video"
    mime: String,
    width: Int,            // images/video
    height: Int,
    n_frames: Int,         // video: frame count; audio: samples
    sample_rate: Int,      // audio
    content: Array[Byte])

case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])

case class FrameSample(media_id: Long, frame_index: Int, content: Array[Byte])

/** Multimodal-column plumbing with a STUBBED codec layer.
  *
  * The container has no image/audio libraries, so the byte-level
  * decode/resize/extract kernels are deterministic fakes (clearly marked);
  * everything Spark-side — schemas, lazy per-partition batching, metadata
  * pushdown, payload-free projections — is real and tested. Swapping in a
  * real codec means replacing the bodies of [[Codec.decodeImage]] /
  * [[Codec.decodeAudio]] only.
  */
object Multimodal {

  /** STUB boundary. Real implementations would call an image/audio codec
    * (e.g. libjpeg/ffmpeg via JNI); these fakes derive deterministic
    * pseudo-features from the payload bytes so pipelines are testable
    * end-to-end (same bytes ⇒ same features). */
  object Codec {
    /** STUB: pretend-decode an image payload to a `dim`-float embedding. */
    def decodeImage(content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < content.length) { h = h * 31 + content(i); i += 1 }
      i = 0
      while (i < dim) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17 // xorshift
        out(i) = (h % 1000L) / 1000.0f
        i += 1
      }
      out
    }

    /** STUB: pretend-decode audio to a fixed-size spectrogram-ish vector. */
    def decodeAudio(content: Array[Byte], dim: Int): Array[Float] =
      decodeImage(content, dim) // same deterministic fake

    /** STUB: pretend-resize; real impl re-encodes pixels. Metadata math is
      * real; payload is passed through truncated (marker of the stub). */
    def resizePayload(content: Array[Byte], w: Int, h: Int): Array[Byte] =
      content.take(math.max(16, math.min(content.length, w * h / 64)))

    /** STUB perceptual hash. A real implementation decodes the image,
      * downsamples to 32×32 grayscale, takes the 2D DCT, and emits one
      * bit per low-frequency coefficient (above/below the coefficient
      * median) — 60 bits here to match the text SimHash banding width.
      * The fake preserves the one property the dedup operators rely on:
      * LOCALIZED payload changes flip FEW bits while unrelated payloads
      * differ in ~30 of 60. Bit b thresholds an FNV hash of the byte
      * STRIPE `p ≡ b (mod min(len, 60))` seeded by b, so EVERY bit is
      * informative for any payload length — with the earlier contiguous
      * 60-way blocking, a payload shorter than 60 bytes (e.g. a 16-byte
      * sampled video frame) left most blocks empty and therefore
      * constant, collapsing unrelated payloads to an expected Hamming
      * distance of len/2 and flooding the banding join with false
      * near-matches. Striped, k changed bytes flip at most k·⌈60/len⌉
      * bits (3-byte perturbations of the 64-byte fixture payloads still
      * flip ≤ 3) and unrelated payloads stay ~30 apart regardless of
      * length. */
    def phash(content: Array[Byte]): Long = {
      val bits = 60
      if (content.isEmpty) return 0L
      val m = math.min(content.length, bits)
      var out = 0L
      var b = 0
      while (b < bits) {
        var h = 0xcbf29ce484222325L ^ b // FNV-1a offset basis, per-block seed
        var i = b % m
        while (i < content.length) { h ^= content(i) & 0xff; h *= 0x100000001b3L; i += m }
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33 // avalanche
        if ((h & 1L) == 1L) out |= 1L << b
        b += 1
      }
      out
    }
  }

  /** Deterministic synthetic media table derived from the documents
    * fixture (the container ships no real media): payload = md5-derived
    * bytes, metadata = deterministic functions of doc_id. Same doc_id ⇒
    * identical row, any engine. */
  def syntheticMedia(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      element_at(typedLit(Seq("image/png", "audio/wav", "video/mp4")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("mime"),
      (pmod(col("doc_id") * 37, lit(1024)) + 64).cast("int").as("width"),
      (pmod(col("doc_id") * 53, lit(768)) + 64).cast("int").as("height"),
      (pmod(col("doc_id") * 17, lit(240)) + 1).cast("int").as("n_frames"),
      lit(16000).as("sample_rate"),
      // payload: 64 deterministic bytes from the doc text hash
      unhex(concat(md5(col("text")), md5(concat(col("text"), lit("x"))),
        md5(concat(col("text"), lit("y"))), md5(concat(col("text"), lit("z")))))
        .as("content"))
  }

  /** Feature extraction: lazy per-partition batch over the typed Dataset —
    * the payload bytes stream through the iterator one partition at a
    * time (never collected), which is the Scala analog of a Pandas-batch
    * UDF. Metadata-only columns stay prunable upstream. */
  def extractFeatures(media: Dataset[MediaItem], dim: Int = 32): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val f = m.kind match {
          case "audio" => Codec.decodeAudio(m.content, dim)
          case _       => Codec.decodeImage(m.content, dim)
        }
        MediaFeatures(m.media_id, m.kind, f)
      }
    }
  }

  /** Resize: REAL metadata arithmetic (aspect-preserving fit into a
    * bounding box) + stub payload transform. */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("width"), lit(maxH.toDouble) / col("height"), lit(1.0))
    val resizeUdf = udf { (content: Array[Byte], w: Int, h: Int) =>
      Codec.resizePayload(content, w, h)
    }
    media
      .withColumn("new_width", floor(col("width") * scale).cast("int"))
      .withColumn("new_height", floor(col("height") * scale).cast("int"))
      .withColumn("content", resizeUdf(col("content"), col("new_width"), col("new_height")))
      .drop("width", "height")
      .withColumnRenamed("new_width", "width")
      .withColumnRenamed("new_height", "height")
  }

  /** Perceptual near-duplicate pairs over media payloads: pHash each
    * asset at the codec boundary, then find all pairs within `maxHamming`
    * bits via the pigeonhole banding join shared with the text SimHash
    * family ([[graft.ops.Dedup.hammingPairs]]) — candidacy is an
    * equi-join on (chunk_id, chunk_val), never an all-pairs compare, and
    * the final `bit_count` over the full 60-bit signatures is the exact
    * verify. At 100 TB the payload bytes never shuffle: only the
    * (media_id, 60-bit hash) projection enters the join. */
  def phashPairs(media: DataFrame, maxHamming: Int = 6): DataFrame = {
    val ph = udf { (c: Array[Byte]) => Codec.phash(c) }
    val sigs = media.select(col("media_id").as("id"), ph(col("content")).as("sim"))
    graft.ops.Dedup.hammingPairs(sigs, maxHamming)
      .select(col("id_a").as("media_a"), col("id_b").as("media_b"), col("hamming"))
  }

  /** Video-level near-duplicate pairs: per-frame perceptual hashes,
    * aggregated to a per-video signature-set overlap.
    *
    * Pipeline (every stage shuffle-on-key, never all-pairs):
    *
    *  1. [[sampleFrames]] explodes each video into its sampled frames;
    *     each frame pHashes at the codec boundary ([[Codec.phash]]).
    *  2. Frame signatures collapse to DISTINCT (media_id, hash) — a long
    *     static shot contributes ONE signature, so a 2-hour fixed-camera
    *     video doesn't get 170k identical rows into the join (and two
    *     videos sharing a static shot don't blow up quadratically in
    *     matched frame pairs).
    *  3. Candidate frame matches come from the same pigeonhole banding
    *     equi-join as the SimHash/pHash families (split 60 bits into
    *     maxFrameHamming+1 chunks; a pair within the budget must agree on
    *     ≥1 chunk), verified exactly with `bit_count` over the full
    *     signatures. Temporal offsets are free: matching is on signature
    *     content, not frame index, so a re-encode with a trimmed intro
    *     still matches.
    *  4. Pairs aggregate to `n_matched` distinct a-side signatures;
    *     `match_frac = n_matched / n_sigs(a)` and pairs at or above
    *     `minMatchFrac` are near-dups.
    *
    * At 100 TB the only frame payload movement is scan→hash inside one
    * narrow stage; the banding join carries (media_id, 60-bit hash)
    * projections only. */
  def videoNearDupPairs(media: DataFrame, stride: Int = 24,
      maxFrameHamming: Int = 6, minMatchFrac: Double = 0.8): DataFrame = {
    val ph = udf { (c: Array[Byte]) => Codec.phash(c) }
    sigOverlapPairs(
      sampleFrames(media, stride)
        .select(col("media_id"), ph(col("content")).as("sim")),
      maxFrameHamming, minMatchFrac)
  }

  /** Audio-level near-duplicate pairs: the acoustic analog of
    * [[videoNearDupPairs]] — fixed-size windows over the sample stream
    * fingerprinted at the codec boundary (a real implementation hashes
    * spectrogram peaks, Shazam-style; the stub hashes the window bytes),
    * then the same distinct-signature overlap machinery: banding
    * equi-join candidacy, exact Hamming verify, per-pair matched-window
    * fraction. Trims/re-encodes that preserve window content still
    * match because matching is on signature content, not position. */
  def audioNearDupPairs(media: DataFrame, windowBytes: Int = 16,
      stride: Int = 16, maxWindowHamming: Int = 6,
      minMatchFrac: Double = 0.9): DataFrame = {
    val ph = udf { (c: Array[Byte]) => Codec.phash(c) }
    sigOverlapPairs(
      sampleAudioWindows(media, windowBytes, stride)
        .select(col("media_id"), ph(col("content")).as("sim")),
      maxWindowHamming, minMatchFrac)
  }

  /** Signature-set overlap core shared by the video and audio near-dup
    * paths (steps 2–4 of the pipeline documented on
    * [[videoNearDupPairs]]): distinct per-media signatures, pigeonhole
    * banding candidacy, exact bit_count verify, match-fraction
    * aggregation. `match_frac` divides the matched a-side signature
    * count by `least(n_sigs_a, n_sigs_b)` — CONTAINMENT semantics, so a
    * trim of a longer original scores 1.0 regardless of which side has
    * the smaller id (the previous a-side denominator made the result
    * depend on id ordering: the pair is canonicalized media_a < media_b,
    * so a long original with the smaller id diluted the trim's perfect
    * overlap by its own extra signatures). Input: one row per
    * (media_id, sim) occurrence; multiplicity is collapsed here. */
  private def sigOverlapPairs(rawSigs: DataFrame, maxHamming: Int,
      minMatchFrac: Double): DataFrame = {
    require(maxHamming >= 1 && maxHamming < 30,
      s"maxHamming in [1,30), got $maxHamming")
    // NOT cached: the banding self-join and both n_sigs joins consume
    // this frame, but all consumers sit above the distinct's shuffle
    // exchange, and the self-join/nsigs subtrees are identical plans —
    // Spark's ReuseExchange computes that shuffle ONCE and reads it from
    // every consumer (pinned in MultimodalSpec), so the earlier
    // `.cache()` bought nothing except a frame pinned in executor
    // storage for the session (two sweeps × video+audio queries
    // accumulated four such pins before this was removed).
    val sigs = rawSigs.distinct()
    val nsigs = sigs.groupBy("media_id").agg(count(lit(1)).as("n_sigs"))
    val chunks = maxHamming + 1
    val bitsPer = 60 / chunks
    val withChunks = sigs.select(col("media_id"), col("sim"),
        explode(sequence(lit(0), lit(chunks - 1))).as("chunk_id"))
      .withColumn("chunk_val",
        expr(s"pmod(shiftright(sim, chunk_id * $bitsPer), ${1L << bitsPer})"))
    val sigMatches = withChunks.as("a")
      .join(withChunks.as("b"), Seq("chunk_id", "chunk_val"))
      .where(col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        col("a.sim").as("sim_a"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      .distinct() // a pair agreeing on several chunks surfaces once
      .where(col("hamming") <= maxHamming)
    sigMatches
      .groupBy(col("media_a"), col("media_b"))
      .agg(countDistinct(col("sim_a")).as("n_matched"))
      .join(nsigs.select(col("media_id").as("media_a"),
        col("n_sigs").as("n_sigs_a")), "media_a")
      .join(nsigs.select(col("media_id").as("media_b"),
        col("n_sigs").as("n_sigs_b")), "media_b")
      .withColumn("match_frac",
        col("n_matched").cast("double") / least(col("n_sigs_a"), col("n_sigs_b")))
      .where(col("match_frac") >= minMatchFrac)
      .select(col("media_a"), col("media_b"), col("n_matched"),
        col("n_sigs_a"), col("n_sigs_b"), col("match_frac"))
  }

  /** Frame sampling for video rows: emit every `stride`-th frame index
    * with a deterministic per-frame payload slice. Real explode shape —
    * one output row per sampled frame, payload-bounded. */
  def sampleFrames(media: DataFrame, stride: Int = 24): DataFrame =
    media
      // n_frames <= 0 (corrupt/empty asset) yields no rows rather than an
      // illegal sequence(0, -1) boundary error
      .where(col("kind") === "video" && col("n_frames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_index"),
        col("content"))
      .withColumn("content",
        // STUB: a real impl decodes the frame; we slice bytes deterministically
        expr("substring(content, cast(pmod(frame_index * 7, 32) as int) + 1, 16)"))

  /** Window sampling for audio rows: fixed `windowBytes` slices at
    * `stride` over the payload (1-based substring offsets). Assets
    * shorter than one window yield no rows. Real explode shape — one
    * row per window, payload-bounded, same as [[sampleFrames]]. */
  def sampleAudioWindows(media: DataFrame, windowBytes: Int = 16,
      stride: Int = 16): DataFrame = {
    require(windowBytes >= 1 && stride >= 1,
      s"window parameters must be positive, got ($windowBytes, $stride)")
    media
      .where(col("kind") === "audio" && length(col("content")) >= windowBytes)
      .select(col("media_id"),
        explode(sequence(lit(1),
          length(col("content")) - lit(windowBytes) + 1, lit(stride))).as("off"),
        col("content"))
      .withColumn("content", expr(s"substring(content, off, $windowBytes)"))
  }
}
