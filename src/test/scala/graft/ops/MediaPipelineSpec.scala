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
    val packed = r.packed // cached by run(); caller owns the unpersist
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

  test("quality pre-filter drops degenerates BEFORE candidacy: zero signature decodes for flagged assets") {
    import graft.multimodal.{Codec, SignatureStore}
    // parquet-stage first: synthesis UDF decodes and LocalRelation
    // constant folding both poison decode budgets (SCALING.md)
    val staged = java.nio.file.Files.createTempDirectory("prefilter-budget").toString
    MultimodalQueries.mediaWithPlantedBlanks(spark, dir)
      .write.mode("overwrite").parquet(staged)
    val media = spark.read.parquet(staged)
    // flag set materialized to a literal filter so the signature passes
    // below carry NO quality-stat UDFs in their plans — we are billing
    // the signature stage alone
    val flagged = Multimodal.lowInformationIds(media)
      .collect().map(_.getLong(0)).toSeq
    assert(flagged.nonEmpty, "fixture must contain planted degenerates")
    def sigBill(df: org.apache.spark.sql.DataFrame): Long = {
      Codec.decodeCalls.reset()
      SignatureStore.signatures(df).count()
      Codec.decodeCalls.sum()
    }
    val billAll = sigBill(media)
    val billFlagged = sigBill(media.where(col("media_id").isin(flagged: _*)))
    val billPost = sigBill(media.where(!col("media_id").isin(flagged: _*)))
    assert(billFlagged > 0,
      "planted degenerates are decodable — their signature cost is real")
    // the stop-sim cap merely bounds degenerate content INSIDE
    // candidacy; the pre-filter removes its entire signature-stage cost
    // — a flagged asset is dropped before any signature decode, not
    // capped after one
    assert(billPost + billFlagged == billAll,
      s"filtered signature bill $billPost must be the full bill $billAll minus " +
        s"the flagged assets' own cost $billFlagged")
  }

  test("store-path pipeline: zero history decodes; A/V history twins shed too") {
    import graft.multimodal.{Codec, SignatureStore}
    val all = MultimodalQueries.mediaWithPlantedNearDups(spark, dir)
    val history = Multimodal.syntheticMedia(spark, dir)
      .where(pmod(col("media_id"), lit(10)) < 2)
    val storeDir = java.nio.file.Files.createTempDirectory("pipe-store").toString + "/store"
    SignatureStore.build(history, storeDir) // pre-built, as a daily loop would have it
    // zero-history-decode: once the incoming side's signature bill is
    // known, the whole store-path NOVELTY stage adds nothing on top —
    // history enters only as (sig, thumb) rows. (The full-pipeline
    // decode budget is the sibling test's job; this pins the novelty
    // stage the store path replaces. The store path deliberately
    // decodes MORE of the incoming batch than the image-scoped decode
    // form — audio/video signatures are the added coverage.)
    val store = SignatureStore.load(spark, storeDir)
    Codec.decodeCalls.reset()
    SignatureStore.signatures(all).count()
    val incomingBill = Codec.decodeCalls.sum()
    Codec.decodeCalls.reset()
    SignatureStore.noveltyAgainstStore(all, store).count()
    val noveltyBill = Codec.decodeCalls.sum()
    assert(noveltyBill == incomingBill,
      s"store novelty decoded $noveltyBill vs incoming-only bill $incomingBill — history payloads were touched")
    val r = MediaPipeline.run(spark, all, history, signatureStoreDir = Some(storeDir))
    val rDecode = MediaPipeline.run(spark, all, history)
    try {
      // image novelty parity: the two pipeline forms agree asset-for-
      // asset on images (same thresholds, same verify function)
      val imgStore = r.packed.where(col("kind") === "image")
        .select("media_id").collect().map(_.getLong(0)).toSet
      val imgDecode = rDecode.packed.where(col("kind") === "image")
        .select("media_id").collect().map(_.getLong(0)).toSet
      assert(imgStore == imgDecode,
        s"store/decode image divergence: ${(imgStore diff imgDecode) ++ (imgDecode diff imgStore)}")
      // A/V twins of HISTORY assets are shed by the store path (the
      // image-scoped decode form cannot do this)
      val avHistoryTwins = r.packed
        .where(col("kind") =!= "image" &&
          col("media_id") >= 10000000L && col("media_id") < 30000000L &&
          pmod(pmod(col("media_id"), lit(10000000L)), lit(10)) < 2)
        .count()
      assert(avHistoryTwins == 0,
        s"$avHistoryTwins audio/video re-encodes of history assets re-entered via the store path")
    } finally { r.packed.unpersist(); rDecode.packed.unpersist() }
  }

  test("pipeline computes each detector stage once (decode-count budget)") {
    import graft.multimodal.Codec
    import graft.ops.{Corpus, Dedup}
    // payload decode dominates every perceptual stage, so "a detector
    // ran twice" is directly observable as a near-doubled decode count.
    // Budget = running each pipeline stage independently, exactly once,
    // on the same inputs; the pipeline must land within a small slack of
    // it (the pre-fix pipeline, which re-evaluated all three detector
    // plans inside canonicalize, measured ~1.5x this budget).
    val media = MultimodalQueries.mediaWithPlantedNearDups(spark, dir)
    val history = Multimodal.syntheticMedia(spark, dir)
      .where(pmod(col("media_id"), lit(10)) < 2)
    def stageBudget(): Long = {
      Codec.decodeCalls.reset()
      val lowInfo = Multimodal.lowInformationIds(media)
      val q = media.join(lowInfo, Seq("media_id"), "left_anti").cache()
      q.count()
      val pairs = Multimodal.phashPairs(q)
        .select(col("media_a").as("id_a"), col("media_b").as("id_b"))
        .unionByName(Multimodal.videoNearDupPairs(q)
          .select(col("media_a").as("id_a"), col("media_b").as("id_b")))
        .unionByName(Multimodal.audioNearDupPairs(q)
          .select(col("media_a").as("id_a"), col("media_b").as("id_b")))
        .cache()
      pairs.count()
      val dupMembers = Dedup.canonicalize(pairs.distinct())
        .where(col("id") =!= col("canonical_id")).select(col("id").as("media_id"))
      val deduped = q.join(dupMembers, Seq("media_id"), "left_anti")
      Multimodal.perceptualNoveltyBatch(deduped, history).count()
      pairs.unpersist(); q.unpersist()
      Codec.decodeCalls.sum()
    }
    val budget = stageBudget()
    Codec.decodeCalls.reset()
    val r = MediaPipeline.run(spark, media, history)
    r.packed.count()
    val pipelineDecodes = Codec.decodeCalls.sum()
    r.packed.unpersist()
    assert(budget > 0, "decode counter must observe the stages")
    assert(pipelineDecodes <= (budget * 1.15).toLong,
      s"pipeline decoded $pipelineDecodes payloads vs single-pass budget $budget — a stage is computed more than once")
  }
}
