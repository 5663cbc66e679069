package graft.ops

import graft.TestSpark
import graft.examples.MediaPipeline
import graft.multimodal.{Multimodal, MultimodalQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-stage invariants of the end-to-end media ingest example —
  * the multimodal twin of CorpusPipelineSpec. */
class MediaPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("media pipeline: conservation, dedup, novelty and packing invariants hold") {
    // incoming batch carries planted near-dups AND planted blanks so
    // every stage has real work: blanks exercise the quality gate,
    // twins the dedup stage, and history overlaps the novelty stage
    val all = MultimodalQueries.mediaWithPlantedNearDups(spark, dir)
      .unionByName(MultimodalQueries.mediaWithPlantedBlanks(spark, dir)
        .where(col("media_id") >= 40000000L))
    val history = Multimodal.syntheticMedia(spark, dir)
      .where(pmod(col("media_id"), lit(10)) < 2)
    val r = MediaPipeline.run(spark, all, history)
    val c = r.counts

    // stage conservation
    assert(c.assets == all.count())
    assert(c.lowInfoDropped + c.afterQuality == c.assets)
    assert(c.lowInfoDropped > 0, "planted blanks must be dropped by the quality gate")
    assert(c.imagePairs > 0 && c.videoPairs > 0 && c.audioPairs > 0,
      "every detector must fire on the planted twins")
    assert(c.dupDropped > 0 && c.afterNovelty <= c.afterQuality - c.dupDropped)

    // packed output: every surviving asset exactly once, shards filled
    // within the straddle bound, and no blank leaked through
    val packed = r.packed.cache()
    try {
      assert(packed.count() == c.afterNovelty)
      assert(packed.groupBy("media_id").count().where(col("count") > 1).count() == 0)
      val over = packed.groupBy("kind", "shard")
        .agg(sum("nbytes").as("fill"), max("nbytes").as("mx"))
        .where(col("fill") > lit(64L * 1024) + col("mx")).count()
      assert(over == 0, "a shard exceeded budget + max-asset")
      assert(packed.where(col("media_id") >= 40000000L).count() == 0,
        "a planted blank survived to packing")
      // novelty: any packed image whose base asset sits in history must
      // be a fresh id, not a history re-encode — the planted re-encode
      // twins of history assets (media_id % 10 < 2, % 7 == 3) are shed
      val historyTwinSurvivors = packed
        .where(col("media_id") >= 10000000L && col("media_id") < 30000000L &&
          pmod(pmod(col("media_id"), lit(10000000L)), lit(10)) < 2)
        .count()
      assert(historyTwinSurvivors == 0,
        s"$historyTwinSurvivors re-encodes of history assets re-entered the corpus")
    } finally packed.unpersist()
  }
}
