package graft.streaming

import graft.multimodal.Codec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

/** Streaming ingest for media assets: the perceptual (pHash) novelty
  * filter as a STATELESS stream stage — the multimodal member of the
  * frozen-history family ([[DocsStream.startNoveltyQuery]] is the text
  * member). The history's (64-bit signature, 8×8 luma thumbnail) entries
  * are collected once into a banded in-memory index (bounded: ~72
  * bytes/asset plus bucket overhead — a 10⁷-image history well under a
  * GB, the same budget class as the text bloom; beyond that the
  * banding-JOIN batch form
  * [[graft.multimodal.Multimodal.perceptualNoveltyBatch]] against the
  * history TABLE is the scale path, run as a periodic batch pass), then
  * every micro-batch filters by a pure per-row probe — zero streaming
  * state, so the stream is append-mode with no watermark obligations and
  * restarts replay identically. MultimodalSpec gates the index form ≡
  * the banding-join form on the fixture, and stream ≡ batch through a
  * file-stream run. */
object MediaStream {

  /** File-source schema matching the synthetic media table. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("content", BinaryType)))

  /** Banded signature index for frozen-history perceptual lookup: the
    * driver-side twin of the pigeonhole banding join — (signature, 8×8
    * luma thumbnail) entries are bucketed by each signature's
    * maxHamming+1 chunks, and a probe only examines entries sharing ≥1
    * chunk (a near pair MUST share one), so lookup cost is candidates,
    * not history size. A hit requires BOTH the Hamming budget and the
    * thumbnail exact verify ([[Codec.thumbMae]] ≤ maxThumbMae) — the
    * same two-stage contract as the batch banding join, with the same
    * verify function, so the forms cannot diverge. ~72 bytes/asset. */
  final class PhashBandIndex private[MediaStream] (
      buckets: java.util.HashMap[java.lang.Long, (Array[Long], Array[Array[Byte]])],
      val maxHamming: Int, val maxThumbMae: Double, val size: Int)
      extends Serializable {
    private val chunks = maxHamming + 1
    private val bitsPer = 64 / chunks

    def nearAny(sig: Long, thumb: Array[Byte]): Boolean = {
      var c = 0
      while (c < chunks) {
        val cand = buckets.get(PhashBandIndex.key(sig, c, chunks, bitsPer))
        if (cand != null) {
          val (sigs, thumbs) = cand
          var i = 0
          while (i < sigs.length) {
            if (java.lang.Long.bitCount(sigs(i) ^ sig) <= maxHamming &&
                Codec.thumbMae(thumbs(i), thumb) <= maxThumbMae) return true
            i += 1
          }
        }
        c += 1
      }
      false
    }
  }

  object PhashBandIndex {
    private[MediaStream] def key(sig: Long, chunk: Int, chunks: Int,
        bitsPer: Int): java.lang.Long = {
      val v =
        if (chunk == chunks - 1) sig >>> ((chunks - 1) * bitsPer)
        else (sig >>> (chunk * bitsPer)) & ((1L << bitsPer) - 1)
      // chunk values are < 2^32 even at maxHamming=1 (chunks >= 2 ⇒
      // bitsPer <= 32) — the chunk-id tag at bit 48 can never overlap
      java.lang.Long.valueOf((chunk.toLong << 48) | v)
    }

    def apply(entries: Array[(Long, Array[Byte])], maxHamming: Int,
        maxThumbMae: Double): PhashBandIndex = {
      require(maxHamming >= 1 && maxHamming < 30,
        s"maxHamming in [1,30), got $maxHamming")
      val chunks = maxHamming + 1
      val bitsPer = 64 / chunks
      val tmp = new java.util.HashMap[java.lang.Long,
        scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]]()
      entries.foreach { e =>
        var c = 0
        while (c < chunks) {
          tmp.computeIfAbsent(key(e._1, c, chunks, bitsPer),
            _ => scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]) += e
          c += 1
        }
      }
      val buckets = new java.util.HashMap[java.lang.Long, (Array[Long], Array[Array[Byte]])](tmp.size())
      tmp.forEach { (k, v) => buckets.put(k, (v.map(_._1).toArray, v.map(_._2).toArray)) }
      new PhashBandIndex(buckets, maxHamming, maxThumbMae, entries.length)
    }
  }

  /** Build the frozen-history index from a media frame: every decodable
    * image pHashes + thumbnails once (distributed), then the (8-byte
    * signature, 64-byte thumbnail) entries collect — the documented
    * bounded step (~72 bytes/asset; a 10⁷-image history is well under a
    * GB, the same budget class as the text bloom). */
  def buildHistoryIndex(history: DataFrame, maxHamming: Int = 7,
      maxThumbMae: Double = 6.0): PhashBandIndex = {
    val entries = graft.multimodal.SignatureStore.imageSigRows(history)
      .select(col("sig"), col("thumb"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]]("thumb")))
    PhashBandIndex(entries, maxHamming, maxThumbMae)
  }

  /** Build the same banded index from a PERSISTED signature store
    * ([[graft.multimodal.SignatureStore]]) — the steady-state path: no
    * history payload is opened, let alone decoded; the collect reads
    * the store's (sig, thumb) projection for the image partition only
    * (partition-pruned scan). [[buildHistoryIndex]] above is the
    * one-shot/bootstrap form; a daily stream should build the store
    * once, append per batch, and construct its index from here.
    * ExtSpec gates the two constructions identical on the fixture. */
  def buildHistoryIndexFromStore(store: DataFrame, maxHamming: Int = 7,
      maxThumbMae: Double = 6.0): PhashBandIndex = {
    val entries = store.where(col("kind") === "image")
      .select(col("sig"), col("thumb"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]]("thumb")))
    PhashBandIndex(entries, maxHamming, maxThumbMae)
  }

  /** Stateless perceptual novelty filter: keep every row whose payload
    * is NOT a pHash near-dup of the frozen history. Non-image and
    * undecodable rows pass through (novelty is image-scoped; an
    * unprovable dup must not be dropped) — the same contract as the
    * batch form. Works identically on batch and streaming frames (pure
    * projection + filter; the broadcast-size index rides the closure). */
  def perceptualNovelty(media: DataFrame, index: PhashBandIndex): DataFrame = {
    val novel = udf { (kind: String, c: Array[Byte]) =>
      kind != "image" || Codec.decodeImage(c).forall(img =>
        !index.nearAny(Codec.phash64(img), Codec.lumaThumb8(img)))
    }
    media.where(novel(col("kind"), col("content")))
  }

  /** Start the perceptual novelty filter over a parquet file stream of
    * media rows; survivors land in the in-memory sink `name`. */
  def startPerceptualNoveltyQuery(spark: SparkSession, dir: String,
      name: String, index: PhashBandIndex): StreamingQuery =
    perceptualNovelty(
        spark.readStream.schema(mediaSchema).parquet(dir), index)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()

  /** Streaming frozen-history novelty for ALL media kinds against the
    * PERSISTED signature store — the steady-state ingest stage: each
    * micro-batch runs [[graft.multimodal.SignatureStore
    * .noveltyAgainstStore]] via `foreachBatch` (audio/video novelty is
    * a per-ASSET containment over many frame/window signatures, which
    * a stateless per-row probe cannot express — the batch operator per
    * micro-batch gives exactly the batch semantics, so stream ≡ batch
    * by construction and is gated in StreamingSpec), and survivors
    * append to `outDir` as parquet. History payloads are never opened:
    * the store frame carries only (media_id, kind, sig, thumb). A
    * production loop would ALSO [[graft.multimodal.SignatureStore
    * .append]] each surviving batch to the store so the frozen history
    * advances per ingest day. */
  def startStoreNoveltyQuery(spark: SparkSession, dir: String,
      outDir: String, checkpoint: String, store: DataFrame): StreamingQuery =
    spark.readStream.schema(mediaSchema).parquet(dir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.multimodal.SignatureStore.noveltyAgainstStore(batch, store)
          .write.mode("append").parquet(outDir)
      }
      .start()

  /** Ingestion-time image quality scoring — the multimodal twin of
    * [[DocsStream.startQualityScoreQuery]]: the SAME stateless
    * projection [[graft.multimodal.Multimodal.imageQualityStats]]
    * applies in batch runs over a parquet file stream, so blank /
    * low-information assets are flagged the moment they arrive instead
    * of in a later corpus pass. Zero streaming state; append mode. */
  def startImageQualityQuery(spark: SparkSession, dir: String,
      name: String): StreamingQuery =
    graft.multimodal.Multimodal.imageQualityStats(
        spark.readStream.schema(mediaSchema).parquet(dir))
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()

  /** The MEDIA side of the daily-ingest keystone as ONE streaming query
    * — the composed, ledgered counterpart of the per-stage twins above
    * and the media mirror of [[DocsStream.startDailyIngestQuery]]: each
    * arriving file batch is one "day" whose assets flow quality
    * pre-filters → within-day store-parity near-dup pairs → perceptual
    * store novelty → per-day survivor outputs AND packed byte shards,
    * with the signature store appended with what the day SAW. The
    * batch's `batchId` IS the ledger day, so foreachBatch replay + the
    * two-phase ledger compose into exactly-once appends — the identical
    * construction, and in fact the identical CODE: each micro-batch
    * runs [[graft.examples.DailyIngest.ingestDay]] with an empty doc
    * frame, so the media branch executes the very composition the
    * batch keystone gates bit-level (stream ≡ batch needs no separate
    * proof of the decision functions, only of the day routing — which
    * the spec pins by store/output byte equality against a batch-built
    * root). Text stages run empty and the text blooms accumulate only
    * empty-day appends.
    *
    * The per-batch benchmark bloom is built and destroyed inside
    * ingestDay — an unbounded micro-batch loop must not accumulate
    * broadcasts. */
  def startDailyIngestQuery(spark: SparkSession, dir: String,
      checkpoint: String, root: String, benchDocs: DataFrame,
      cfg: graft.examples.DailyIngest.IngestConfig =
        graft.examples.DailyIngest.IngestConfig()): StreamingQuery = {
    val emptyDocs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      DocsStream.crawlDocSchema)
    val emptyEmb = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("embedding", ArrayType(DoubleType)))))
    spark.readStream.schema(mediaSchema)
      .option("maxFilesPerTrigger", 1) // one staged file = one day
      .parquet(dir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.examples.DailyIngest.ingestDay(spark, emptyDocs, batch,
          benchDocs, root, batchId.toInt, cfg,
          dayEmb = Some(emptyEmb)): Unit
      }
      .start()
  }
}
