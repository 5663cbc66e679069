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

  def all: Seq[Q] = Seq(features, frameCounts, resized)
}
