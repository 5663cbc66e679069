package graft.multimodal

import graft.{Gate, Q}
import org.apache.spark.sql.functions._

object MultimodalQueries {

  /** Feature extraction over the synthetic media table: binary payloads →
    * fixed-dim float vectors via the (stubbed) codec, streamed lazily per
    * partition. Deterministic but byte-level → rows-only check. Exploded
    * to scalar (media_id, kind, pos, feature) rows — the driver's
    * rows-only comparator sorts with pandas, which cannot sort array
    * cells. */
  val features: Q = Q.gated("multimodal_features") { (s, d) =>
    import s.implicits._
    Multimodal.extractFeatures(
        Multimodal.syntheticMedia(s, d).as[MediaItem], dim = 32)
      .toDF()
      .select(col("media_id"), col("kind"),
        posexplode(col("features")).as(Seq("pos", "feature")))
  } { (_, _, res) =>
    // batch-shape contract: every asset yields exactly dim=32 features,
    // each in the codec's output range (-1, 1)
    val dims = res.groupBy("media_id").agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("mn"), max(col("n")).as("mx")).head
    val fr = res.agg(
      avg(when(abs(col("feature")) < 1.0, 1.0).otherwise(0.0)).as("fr"))
      .head.getDouble(0)
    Seq(
      Gate("min_dims_per_asset", dims.getLong(0).toDouble, dims.getLong(0) == 32),
      Gate("max_dims_per_asset", dims.getLong(1).toDouble, dims.getLong(1) == 32),
      Gate("frac_feature_in_range", fr, fr == 1.0))
  }

  /** Frame-sampling metadata path: one row per sampled video frame,
    * counted per asset. The count is pure metadata arithmetic
    * (⌊(n_frames−1)/stride⌋+1 for video rows), so DuckDB can oracle it
    * from the synthesis formula — the payload stub is not involved. */
  val frameCounts: Q = Q(
    "multimodal_frame_counts",
    """SELECT doc_id AS media_id,
      |  CAST(floor((((doc_id * 17) % 240 + 1) - 1) / 24) + 1 AS BIGINT) AS n_sampled
      |FROM documents WHERE doc_id % 3 = 2""".stripMargin
  ) { (s, d) =>
    Multimodal.sampleFrames(Multimodal.syntheticMedia(s, d), stride = 24)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_sampled"))
  }

  /** Aspect-preserving resize metadata (real arithmetic, stub payload):
    * every output fits 256×256 with aspect ratio preserved. */
  val resized: Q = Q(
    "multimodal_resize_meta",
    """SELECT doc_id AS media_id,
      |  CAST(floor(w * s) AS INTEGER) AS width,
      |  CAST(floor(h * s) AS INTEGER) AS height
      |FROM (
      |  SELECT doc_id, w, h,
      |    least(256.0 / w, 256.0 / h, 1.0) AS s
      |  FROM (SELECT doc_id,
      |          (doc_id * 37) % 1024 + 64 AS w,
      |          (doc_id * 53) % 768 + 64 AS h
      |        FROM documents))""".stripMargin
  ) { (s, d) =>
    Multimodal.resize(Multimodal.syntheticMedia(s, d), 256, 256)
      .select(col("media_id"), col("width"), col("height"))
  }

  /** The planting offset for pHash twins — far above any fixture
    * media_id so twins never collide with base assets. */
  private val TwinOffset = 10000000L

  /** Base media plus planted perceptual near-dups: every asset with
    * media_id % 7 == 3 gets a twin whose payload differs in exactly 3
    * bytes (a re-encode/recompress stand-in). Deterministic — same
    * fixture ⇒ same planted set, so the gate can enumerate the truth. */
  private val perturb = udf { (c: Array[Byte]) =>
    val out = c.clone()
    Seq(5, 23, 41).foreach { p =>
      if (p < out.length) out(p) = (out(p) ^ 0xff).toByte
    }
    out
  }

  def mediaWithPlantedNearDups(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val base = Multimodal.syntheticMedia(s, d)
    val twins = base.where(pmod(col("media_id"), lit(7)) === 3)
      .withColumn("media_id", col("media_id") + lit(TwinOffset))
      .withColumn("content", perturb(col("content")))
    base.unionByName(twins)
  }

  /** Count of differing byte positions (plus any length difference) —
    * the gate's exact ground truth for "perceptually near" payloads. */
  private val byteDiff = udf { (a: Array[Byte], b: Array[Byte]) =>
    val n = math.min(a.length, b.length)
    var diff = math.abs(a.length - b.length)
    var i = 0
    while (i < n) { if (a(i) != b(i)) diff += 1; i += 1 }
    diff
  }

  /** Perceptual-hash near-dup dedup over media payloads, gated on the
    * planted twins: recall must be ≥ 0.95 (a planted 3-byte perturbation
    * flips at most 3 of 60 pHash bits — always within the Hamming-6
    * budget, so missing one means the banding join dropped a true pair)
    * and every reported pair must verify as a TRUE near-dup at the byte
    * level (≤ 4 differing bytes: planted twins differ in exactly 3,
    * identical-text assets in 0; random payloads differ in ~63 of 64) —
    * zero false positives. */
  val phashDedup: Q = Q.gated("multimodal_phash_dedup") { (s, d) =>
    Multimodal.phashPairs(mediaWithPlantedNearDups(s, d), maxHamming = 6)
  } { (s, d, res) =>
    val media = mediaWithPlantedNearDups(s, d)
      .select(col("media_id"), col("content"))
    val planted = media.where(col("media_id") >= TwinOffset)
      .select((col("media_id") - TwinOffset).as("media_a"),
        col("media_id").as("media_b"))
    val nPlanted = planted.count()
    val hit = res.join(planted, Seq("media_a", "media_b"), "left_semi").count()
    val recall = if (nPlanted == 0) 1.0 else hit.toDouble / nPlanted
    val falsePos = res
      .join(media.select(col("media_id").as("media_a"), col("content").as("_ca")), "media_a")
      .join(media.select(col("media_id").as("media_b"), col("content").as("_cb")), "media_b")
      .where(byteDiff(col("_ca"), col("_cb")) > 4)
      .count()
    Seq(
      Gate("recall_vs_planted_neardups", recall, recall >= 0.95),
      Gate("false_positive_pairs", falsePos.toDouble, falsePos == 0))
  }

  /** Video-level near-dup over sampled frame pHash signatures, gated on
    * the planted twins that are videos (media_id % 3 == 2 in the
    * synthesis; ∩ the % 7 == 3 planting ⇒ doc_id ≡ 17 mod 21).
    *
    * Why the planted twin is ALWAYS found: a sampled frame's payload is a
    * 16-byte slice starting at pmod(frame_index·7, 32) ∈ [0, 32), and the
    * 3 perturbed byte positions (5, 23, 41) are ≥ 16 apart pairwise, so
    * any frame slice contains at most ONE perturbed byte — at most ~4 of
    * the 60 per-frame pHash bits flip, inside the Hamming-6 frame budget;
    * every base signature finds its twin signature and match_frac = 1.
    * False-positive control is byte-exact, as in the pHash image gate. */
  val videoNearDup: Q = Q.gated("multimodal_video_neardup") { (s, d) =>
    Multimodal.videoNearDupPairs(mediaWithPlantedNearDups(s, d))
  } { (s, d, res) =>
    val media = mediaWithPlantedNearDups(s, d)
      .select(col("media_id"), col("content"))
    val planted = mediaWithPlantedNearDups(s, d)
      .where(col("media_id") >= TwinOffset && col("kind") === "video" &&
        col("n_frames") > 0)
      .select((col("media_id") - TwinOffset).as("media_a"),
        col("media_id").as("media_b"))
    val nPlanted = planted.count()
    val hit = res.join(planted, Seq("media_a", "media_b"), "left_semi").count()
    val recall = if (nPlanted == 0) 1.0 else hit.toDouble / nPlanted
    val falsePos = res
      .join(media.select(col("media_id").as("media_a"), col("content").as("_ca")), "media_a")
      .join(media.select(col("media_id").as("media_b"), col("content").as("_cb")), "media_b")
      .where(byteDiff(col("_ca"), col("_cb")) > 4)
      .count()
    Seq(
      Gate("planted_video_twins", nPlanted.toDouble, nPlanted > 0),
      Gate("recall_vs_planted_neardups", recall, recall >= 0.95),
      Gate("false_positive_pairs", falsePos.toDouble, falsePos == 0))
  }

  /** Audio-level near-dup over windowed fingerprints, gated on the
    * planted twins that are audio (media_id % 3 == 1 in the synthesis,
    * ∩ the % 7 == 3 planting). Same always-found argument as the video
    * gate: 16-byte windows at stride 16 are disjoint, so each of the 3
    * perturbed bytes lands in exactly one window and flips at most ~4
    * of its 60 striped bits — inside the Hamming-6 window budget;
    * every base window finds its twin window and match_frac = 1.
    * False-positive control is byte-exact as in the image/video gates. */
  val audioNearDup: Q = Q.gated("multimodal_audio_neardup") { (s, d) =>
    Multimodal.audioNearDupPairs(mediaWithPlantedNearDups(s, d))
  } { (s, d, res) =>
    val media = mediaWithPlantedNearDups(s, d)
      .select(col("media_id"), col("content"))
    val planted = mediaWithPlantedNearDups(s, d)
      .where(col("media_id") >= TwinOffset && col("kind") === "audio" &&
        length(col("content")) >= 16)
      .select((col("media_id") - TwinOffset).as("media_a"),
        col("media_id").as("media_b"))
    val nPlanted = planted.count()
    val hit = res.join(planted, Seq("media_a", "media_b"), "left_semi").count()
    val recall = if (nPlanted == 0) 1.0 else hit.toDouble / nPlanted
    val falsePos = res
      .join(media.select(col("media_id").as("media_a"), col("content").as("_ca")), "media_a")
      .join(media.select(col("media_id").as("media_b"), col("content").as("_cb")), "media_b")
      .where(byteDiff(col("_ca"), col("_cb")) > 4)
      .count()
    Seq(
      Gate("planted_audio_twins", nPlanted.toDouble, nPlanted > 0),
      Gate("recall_vs_planted_neardups", recall, recall >= 0.95),
      Gate("false_positive_pairs", falsePos.toDouble, falsePos == 0))
  }

  def all: Seq[Q] = Seq(features, frameCounts, resized, phashDedup, videoNearDup,
    audioNearDup)
}
