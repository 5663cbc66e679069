package graft.examples

import graft.multimodal.Multimodal
import graft.ops.{Corpus, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end multimodal ingest, composed entirely from library calls —
  * the media twin of [[CorpusPipeline]]:
  *
  *   media assets (binary payload + typed metadata)
  *     → Multimodal.imageQualityStats  (blank/low-information image
  *     + Multimodal.audioQualityStats   filter + silent/clipped audio
  *     + Multimodal.videoQualityStats   + black/static video — FIRST:
  *                                      narrow no-shuffle scans, and
  *                                      everything downstream decodes
  *                                      or joins)
  *     → Multimodal.phashPairs         (image perceptual near-dups)
  *     + Multimodal.videoNearDupPairs  (frame-signature overlap)
  *     + Multimodal.audioNearDupPairs  (sub-band fingerprint overlap)
  *     → Dedup.canonicalize            (connected components over the
  *                                      UNION of all three detectors;
  *                                      min-id survivor per cluster)
  *     → Multimodal.perceptualNoveltyBatch (frozen-history filter: an
  *                                      asset already in yesterday's
  *                                      corpus never re-enters), or —
  *                                      the steady-state form —
  *       SignatureStore.noveltyAgainstStore (same filter against the
  *                                      persisted signature store:
  *                                      zero history decodes, and
  *                                      audio/video twins shed too)
  *     → Corpus.packShards             (payload-byte-budget shards per
  *                                      kind — the WebDataset layout)
  *
  * Every stage is a deterministic DataFrame transform: banding
  * equi-joins with pixel-level verifies, shuffle-on-key plans, payload
  * bytes never shuffled by any near-dup join — the same code is the
  * 100 TB shape, only the input path changes. MediaPipelineSpec asserts
  * the cross-stage invariants. */
object MediaPipeline {

  case class Counts(
      assets: Long, lowInfoDropped: Long, afterQuality: Long,
      imagePairs: Long, videoPairs: Long, audioPairs: Long,
      dupDropped: Long, afterNovelty: Long, shards: Long)

  case class Result(packed: DataFrame, counts: Counts)

  /** `history`: the already-ingested corpus (novelty reference);
    * `media`: the incoming batch; `signatureStoreDir`: when set, the
    * novelty stage consumes the PERSISTED perceptual-signature store at
    * that path ([[graft.multimodal.SignatureStore]]) instead of
    * decoding `history` — the steady-state daily shape (history
    * payloads untouched, and audio/video twins of history shed too,
    * not just images). The store is built from `history` on first use
    * if absent; a production loop appends each kept batch's signatures
    * after ingest. Default None keeps the one-shot decode form. */
  def run(spark: SparkSession, media: DataFrame, history: DataFrame,
      shardBudgetBytes: Long = 64L * 1024,
      signatureStoreDir: Option[String] = None): Result = {
    val assets = media.count()

    // 0. quality gate for ALL kinds — blank/low-contrast images,
    //    silent/clipped audio, black/static video. Runs FIRST: each is
    //    a narrow no-shuffle scan, and the near-dup banding downstream
    //    assumes low-information content was pre-filtered (degenerate
    //    assets collapse into hot buckets and cost its recall there)
    val lowInfo = Multimodal.lowInformationIds(media)
    // barrier: a union-shaped media frame would otherwise pull the
    // quality-stats subtree into every union branch via anti-join
    // pushdown (see Multimodal.survivorsBarrier)
    val qualityMedia = Multimodal.survivorsBarrier(media, "quality_in")
      .join(lowInfo, Seq("media_id"), "left_anti").cache()
    val afterQuality = qualityMedia.count()

    // 1. three perceptual detectors over the SAME cleaned batch, tagged
    //    by detector and CACHED: one action (the per-detector counts
    //    below) materializes every detector's pair set exactly once, and
    //    the connected components read the cache — previously each
    //    detector ran twice (counted, then re-evaluated inside
    //    canonicalize), doubling the pipeline's dominant decode cost
    //    (pinned by MediaPipelineSpec's decode-count test)
    val pairs = Multimodal.phashPairs(qualityMedia)
        .select(col("media_a").as("id_a"), col("media_b").as("id_b"),
          lit("image").as("det"))
      .unionByName(Multimodal.videoNearDupPairs(qualityMedia)
        .select(col("media_a").as("id_a"), col("media_b").as("id_b"),
          lit("video").as("det")))
      .unionByName(Multimodal.audioNearDupPairs(qualityMedia)
        .select(col("media_a").as("id_a"), col("media_b").as("id_b"),
          lit("audio").as("det")))
      .cache()
    val detCounts = pairs.groupBy("det").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nImg = detCounts.getOrElse("image", 0L)
    val nVid = detCounts.getOrElse("video", 0L)
    val nAud = detCounts.getOrElse("audio", 0L)

    // 2. one survivor per perceptual cluster (min-id canonical)
    val clusters = Dedup.canonicalize(pairs.select("id_a", "id_b").distinct())
    val dupMembers = clusters.where(col("id") =!= col("canonical_id"))
      .select(col("id").as("media_id"))
    val deduped = qualityMedia.join(dupMembers, Seq("media_id"), "left_anti")
    val dupDropped = dupMembers.count()

    // 3. frozen-history novelty: assets perceptually present in the
    //    existing corpus never re-enter. Store path = steady state
    //    (zero history decodes, all kinds); decode path = one-shot.
    val novel = signatureStoreDir match {
      case Some(storeDir) =>
        import graft.multimodal.SignatureStore
        val fs = new org.apache.hadoop.fs.Path(storeDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(new org.apache.hadoop.fs.Path(storeDir)))
          SignatureStore.build(history, storeDir)
        SignatureStore.noveltyAgainstStore(deduped, SignatureStore.load(spark, storeDir))
      case None => Multimodal.perceptualNoveltyBatch(deduped, history)
    }

    // 4. payload-byte shard packing per kind. `packed` is cached and
    //    MATERIALIZED here (the shards count computes through it), so
    //    unpersisting the upstream frames below cannot trigger a silent
    //    recompute of the full quality/dedup/novelty chain when the
    //    caller consumes it; the caller owns packed.unpersist().
    val packed = Corpus.packShards(
      novel.withColumn("nbytes", length(col("content")).cast("long")),
      col("kind"), col("media_id"), col("nbytes"), shardBudgetBytes).cache()
    val shards = packed.select("kind", "shard").distinct().count()
    val afterNovelty = packed.count()

    pairs.unpersist()
    qualityMedia.unpersist()
    Result(packed,
      Counts(assets, assets - afterQuality, afterQuality,
        nImg, nVid, nAud, dupDropped, afterNovelty, shards))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-media-pipeline")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // stand-in feed: an existing corpus (2/10 of the base assets) and an
    // incoming batch that carries the rest PLUS planted lossy twins
    // (JPEG re-encodes, upscales, trim+gain) — so the dedup stage sees
    // real near-dups and twins of HISTORY assets exercise the novelty
    // filter, as a crawler re-encountering yesterday's content would
    val planted = graft.multimodal.MultimodalQueries
      .mediaWithPlantedNearDups(spark, dir)
    val isHistoryBase = col("media_id") < 10000000L &&
      pmod(col("media_id"), lit(10)) < 2
    val history = planted.where(isHistoryBase)
    val incoming = planted.where(!isHistoryBase)
    val r = run(spark, incoming, history)
    val c = r.counts
    println(s"""{"assets":${c.assets},"lowInfoDropped":${c.lowInfoDropped},""" +
      s""""afterQuality":${c.afterQuality},"imagePairs":${c.imagePairs},""" +
      s""""videoPairs":${c.videoPairs},"audioPairs":${c.audioPairs},""" +
      s""""dupDropped":${c.dupDropped},"afterNovelty":${c.afterNovelty},""" +
      s""""shards":${c.shards}}""")
    spark.stop()
  }
}
