package graft.streaming

import graft.text.{TextFunctions, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

/** Streaming document-ingestion hygiene: the Gopher rule filter plus the
  * PII scrub as ONE stateless projection+filter — no watermark, no
  * state store, no shuffle — so a crawler feed is cleaned at ingestion
  * time by exactly the code the batch pipeline runs. This is the
  * streaming-side complement of [[graft.examples.CorpusPipeline]]'s
  * front half: stateless text ops compose into Structured Streaming for
  * free, while the stateful stages (dedup, canonicalize) stay batch
  * (their cross-document evidence is unbounded by design).
  *
  * StreamingSpec asserts the stream output equals the batch twin on the
  * same fixture — the incremental-execution guarantee Structured
  * Streaming makes for stateless plans.
  */
object DocsStream {

  /** File-source schema of the documents fixture parquet. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** The hygiene transform (source-agnostic: batch or streaming frame in,
    * same semantics out): Gopher prose-band filter, then PII redaction on
    * the survivors. Returns the scrubbed text plus the rule metrics. */
  def hygiene(docs: DataFrame,
      minStopHits: Int = 2): DataFrame =
    TextQueries.gopherMetrics(docs)
      .where(TextQueries.gopherPass(minStopHits = minStopHits))
      .select(col("doc_id"),
        TextFunctions.scrubPii(col("text")).as("clean_text"),
        col("lang"), col("source"),
        col("n_tokens"), col("repetition"))

  /** Start the hygiene pass over a parquet directory as a file stream
    * into an in-memory sink (local smoke; swap source/sink for
    * Kafka/Delta in production — the transform is source-agnostic). */
  def startHygieneQuery(spark: SparkSession, dir: String,
      name: String): StreamingQuery =
    hygiene(spark.readStream.schema(docSchema).parquet(dir))
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()

  /** Stateless streaming quality scoring: apply a TRAINED classifier to
    * each arriving document. The model fits OFFLINE on the frozen corpus
    * (the full-batch gradient needs every row, and a drifting threshold
    * would silently re-label history); the apply pass is
    * [[graft.text.QualityClassifier.score]]'s narrow map — weights in
    * the closure, no watermark, no state, no shuffle — so it drops into
    * a crawler feed unchanged. Model refresh = restart the query with
    * the re-fit weights (the standard online/offline split for corpus
    * quality models). */
  def scoreQuality(docs: DataFrame,
      model: graft.text.QualityClassifier.Model): DataFrame =
    graft.text.QualityClassifier.score(docs, model)

  /** Start the quality-scoring pass over a parquet directory file stream
    * into an in-memory sink (local smoke; swap source/sink in prod). */
  def startQualityScoreQuery(spark: SparkSession, dir: String, name: String,
      model: graft.text.QualityClassifier.Model): StreamingQuery =
    scoreQuality(spark.readStream.schema(docSchema).parquet(dir), model)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()

  /** Driver-built benchmark-shingle bloom for streaming decontamination —
    * the stream-shippable form of [[TextQueries.contaminationBloomVs]]'s
    * sketch: built ONCE from the (batch) benchmark side, broadcast, and
    * valid for the stream's lifetime (eval suites change by release, not
    * by micro-batch). Sentinel row and expectedItems semantics as in the
    * batch operator: over-sizing only lowers the realized fpp. */
  def benchBloom(bench: DataFrame, fpp: Double = 1e-4,
      expectedItems: Option[Long] = None)
      : org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter] =
    graft.functions.Sketches.stringBloom(
      bench.where(col("text").isNotNull)
        .select(explode(
          TextFunctions.shinglesFast(3)(TextFunctions.tokens(col("text")))).as("shingle")),
      "shingle", fpp, expectedItems)

  /** Stateless streaming decontamination: per-document trigram
    * contamination fraction against the broadcast benchmark bloom,
    * computed inside ONE UDF over the doc's shingle array — no explode +
    * groupBy, because an aggregation would make the stream stateful; as
    * a pure projection+filter this runs append-mode with zero state,
    * same code batch and stream. Docs at or above `threshold` are
    * dropped. Bloom membership has no false negatives, so a doc the
    * exact check would drop is ALWAYS dropped here; false positives can
    * only inflate a fraction by ≈ fpp, wrongly dropping a borderline
    * clean doc with probability the caller bounds via fpp — both
    * directions gated against the exact twin per round. */
  def decontaminate(docs: DataFrame,
      bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter],
      threshold: Double = 0.05): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    val frac = udf { (sh: Seq[String]) =>
      if (sh == null || sh.isEmpty) 0.0
      else sh.count(bloom.value.mightContainString).toDouble / sh.size
    }
    docs.where(col("text").isNotNull)
      .withColumn("contamination",
        frac(TextFunctions.shinglesFast(3)(TextFunctions.tokens(col("text")))))
      .where(col("contamination") < threshold)
  }

  /** Start the decontamination pass over a parquet directory file stream
    * into a memory sink (local smoke; the transform is source-agnostic). */
  def startDecontaminateQuery(spark: SparkSession, dir: String, name: String,
      bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter],
      threshold: Double = 0.05): StreamingQuery =
    decontaminate(spark.readStream.schema(docSchema).parquet(dir), bloom, threshold)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()

  /** Start the frozen-history novelty filter over a parquet file stream —
    * the cross-day complement of [[dedupByContent]]: the history bloom is
    * built ONCE from the (batch) history corpus, then every micro-batch
    * is filtered by the same stateless projection
    * [[graft.ops.Dedup.novelAgainst]] applies in batch (zero streaming
    * state; the sketch outlives the stream, rebuilt only when the
    * history corpus is re-frozen). */
  def startNoveltyQuery(spark: SparkSession, dir: String, name: String,
      history: DataFrame, fpp: Double = 1e-4,
      expectedItems: Option[Long] = None): StreamingQuery =
    graft.ops.Dedup.novelAgainst(history,
        spark.readStream.schema(docSchema).parquet(dir),
        fpp = fpp, expectedItems = expectedItems)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()

  /** Novelty stream fed by the PERSISTED bloom store
    * ([[graft.ops.NoveltyBloomStore]]) — the steady-state form of
    * [[startNoveltyQuery]]: the history side is the store's bloom
    * bytes, read once at stream start; history text is never scanned.
    * A daily loop appends each ingest day's keys to the store between
    * stream restarts (the bloom is frozen for the lifetime of one
    * stream, exactly like the broadcast form). */
  def startNoveltyQueryFromStore(spark: SparkSession, dir: String,
      name: String, storeDir: String): StreamingQuery =
    graft.ops.NoveltyBloomStore.novelAgainst(
        spark.readStream.schema(docSchema).parquet(dir), storeDir)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()

  /** Crawl-frontier feed schema: discovered URLs awaiting a fetch
    * decision. */
  val urlSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("url", StringType)))

  /** Streaming crawl-frontier filter — the at-ingest form of the
    * `dedup_url_novel_store` batch query: RAW discovered URLs
    * canonicalize in-flight ([[graft.text.TextFunctions
    * .canonicalizeUrl]], a codegen'd projection) and pass a stateless
    * membership test against the persisted seen-URL bloom
    * ([[graft.ops.NoveltyBloomStore]] raw-key store, broadcast once at
    * stream start) — never-seen URLs flow on to the fetcher, re-crawl
    * variants (tracking params, fragments, port/case noise) drop the
    * moment they arrive. Zero streaming state; a daily loop appends
    * each fetched batch's canonical URLs to the store between stream
    * restarts. */
  def startUrlFrontierQuery(spark: SparkSession, dir: String, name: String,
      storeDir: String): StreamingQuery =
    graft.ops.NoveltyBloomStore.novelAgainst(
        spark.readStream.schema(urlSchema).parquet(dir)
          .withColumn("url",
            graft.text.TextFunctions.canonicalizeUrl(col("url"))),
        storeDir, textCol = "url")
      .select("doc_id", "url")
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()

  /** Streaming NEAR-dup novelty fed by the persisted MinHash band
    * store ([[graft.ops.MinHashBandStore]]) — the near-dup complement
    * of [[startNoveltyQueryFromStore]]'s exact-hash filter: each
    * micro-batch runs the batch store probe via `foreachBatch` (the
    * probe caches its one-pass signature projection, which a pure
    * stream-static plan cannot, so the batch operator per micro-batch
    * is the construction that makes stream ≡ batch exact — the
    * [[MediaStream.startStoreNoveltyQuery]] discipline), and survivors
    * append to `outDir` as parquet. History text is never read; the
    * store frame carries only band keys and signatures. */
  def startMinhashNoveltyQueryFromStore(spark: SparkSession, dir: String,
      outDir: String, checkpoint: String, storeDir: String,
      threshold: Double = 0.5): StreamingQuery =
    spark.readStream.schema(docSchema).parquet(dir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // managed form: the probe's cached projection is released when
        // the write returns — an unbounded micro-batch loop must not
        // pin one cache entry per batch
        graft.ops.MinHashBandStore.noveltyAgainstStoreEach(batch, storeDir,
          threshold) { survivors =>
          survivors.write.mode("append").parquet(outDir)
        }
      }
      .start()

  /** Crawl-document schema: the documents fixture plus the fetch URL —
    * what the daily-ingest stream consumes. */
  val crawlDocSchema: StructType = StructType(
    StructField("url", StringType) +: docSchema.fields)

  /** The text side of the DAILY-INGEST keystone as ONE streaming query
    * — the micro-batch form of [[graft.examples.DailyIngest]]: each
    * arriving file batch is one "day" whose docs flow URL frontier →
    * exact novelty → hygiene + benchmark decontam → near-dup novelty,
    * every store appended with what the batch SAW. The micro-batch's
    * `batchId` IS the ledger day, which makes foreachBatch's replay
    * semantics and the two-phase ledger COMPOSE into exactly-once:
    * Structured Streaming re-delivers a crashed batch under the SAME
    * batchId, and the ledger either short-circuits (final marker
    * present), resumes phase 2 from the staged inputs (.computed
    * present), or recomputes against still-unmutated stores — the
    * identical crash-retry contract DailyIngestSpec drives in batch,
    * with no sink transactionality required. Survivors land under
    * `DailyIngest.textOut(root, batchId)`; the media branch runs empty
    * (this is the text-path twin; the media stream twins live in
    * [[MediaStream]]).
    *
    * `embLookup` streams the EMBEDDING (fifth-store) branch: a static
    * `(doc_id, embedding)` frame — the feature-store pattern, vectors
    * keyed by document id — that each micro-batch semi-joins to its
    * arriving ids to form the day's vector frame. Because the daily
    * fixture (and any real crawl) assigns a document and its vector to
    * the same day and doc ids are globally unique (the
    * [[graft.examples.DailyIngest]] precondition), the id-keyed lookup
    * slice EQUALS the batch path's per-day `dayEmb` frame, so the
    * frozen-quantizer semantic stage probes, appends, and drift-logs
    * exactly as `ingestDay` does in batch — ExtSpec pins postings and
    * drift-log equality per day. Without `embLookup` the branch runs
    * on an empty frame: probes nothing, appends nothing, drift logs
    * the empty batch (still valid against a root that HAS an embedding
    * store — text-only mode (dayEmb = None) would be rejected there,
    * since a vector-less day would silently break batch equivalence).
    *
    * `mediaLookup` composes the MEDIA branch into the same ledgered
    * stream: a day-partitioned asset manifest (the media fixture's
    * columns plus `day`) sliced by `day === batchId` per micro-batch —
    * media ids are unrelated to doc ids, so the slice is day-keyed
    * where the embedding lookup is id-keyed. With both lookups one
    * stream drives ALL FIVE stores through the one `ingestDay` call a
    * batch run makes, under the one per-root ledger (two separate
    * family streams on one root would collide on the day markers: the
    * second family's `ingestDay` for an already-completed day
    * short-circuits). Omitted, the media branch runs empty — the
    * text-path twin, with the media stream twins in [[MediaStream]].
    *
    * The per-batch benchmark bloom is built and destroyed inside
    * [[graft.examples.DailyIngest.ingestDay]] — an unbounded
    * micro-batch loop must not accumulate broadcasts. */
  def startDailyIngestQuery(spark: SparkSession, dir: String,
      checkpoint: String, root: String, benchDocs: DataFrame,
      cfg: graft.examples.DailyIngest.IngestConfig =
        graft.examples.DailyIngest.IngestConfig(),
      embLookup: Option[DataFrame] = None,
      mediaLookup: Option[DataFrame] = None): StreamingQuery = {
    // the media fixture's full shape — the pipeline's image-quality
    // stage reads width/height metadata even from an empty frame
    val mediaSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("content", BinaryType)))
    spark.readStream.schema(crawlDocSchema)
      .option("maxFilesPerTrigger", 1) // one staged file = one day
      .parquet(dir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dayMedia = mediaLookup match {
          case Some(ml) =>
            // the day's assets = the manifest sliced by the ledger day
            // (day-keyed where the embedding lookup is id-keyed)
            ml.where(col("day") === batchId.toInt).drop("day")
          case None => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], mediaSchema)
        }
        val dayEmb = embLookup match {
          case Some(lk) =>
            // the day's vectors = the lookup sliced by the ARRIVING ids
            // (≡ the batch path's per-day frame; see scaladoc)
            lk.join(batch.select("doc_id"), Seq("doc_id"), "left_semi")
          case None =>
            // an EMPTY frame, not None: probes nothing, appends
            // nothing, drift logs the empty batch (see scaladoc)
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              StructType(Seq(StructField("doc_id", LongType),
                StructField("embedding",
                  org.apache.spark.sql.types.ArrayType(
                    org.apache.spark.sql.types.DoubleType)))))
        }
        graft.examples.DailyIngest.ingestDay(spark, batch, dayMedia,
          benchDocs, root, batchId.toInt, cfg,
          dayEmb = Some(dayEmb)): Unit
      }
      .start()
  }

  /** Crawler-feed schema: the documents fixture plus the crawl/ingestion
    * event time the dedup horizon is measured against. */
  val crawlSchema: StructType = StructType(
    docSchema.fields :+ StructField("crawl_ts", TimestampType))

  /** Ingestion-time exact dedup — the streaming stage of
    * [[graft.ops.Dedup.exactGroups]]: the same normalized content hash
    * (lowercase + first `prefixChars` chars), deduped in-flight with
    * `dropDuplicatesWithinWatermark` so a crawler feed sheds its re-crawls
    * and mirror copies BEFORE they are ever written to the corpus store.
    *
    * Semantics, deliberately horizon-bounded: the first arrival of each
    * content hash inside the watermark horizon is emitted with its full
    * row; further arrivals within the horizon are dropped; rows whose
    * event time has already fallen behind the watermark are dropped as
    * late (never re-emitted out of order); and a re-crawl arriving AFTER
    * the horizon passed is emitted again — at-least-once beyond the
    * horizon by design, because unbounded exact dedup needs unbounded
    * state, which is exactly what the batch `exactGroups`/`retain` pass
    * downstream is for. State is therefore bounded by the horizon's key
    * arrival rate, not corpus size — the property that holds at a
    * 10⁹-docs/day crawl. StreamingSpec pins each branch of this contract
    * with controlled micro-batches. */
  def dedupByContent(docs: DataFrame, tsCol: String = "crawl_ts",
      horizon: String = "10 minutes", prefixChars: Int = 80): DataFrame =
    docs
      .withColumn("h", md5(substring(lower(col("text")), 1, prefixChars)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("h")

  /** Batch twin of [[dedupByContent]]'s survivor KEY set: one row per
    * normalized content hash (what any arrival order of the stream must
    * also produce, horizon effects aside). */
  def dedupByContentBatchKeys(docs: DataFrame, prefixChars: Int = 80): DataFrame =
    docs
      .select(md5(substring(lower(col("text")), 1, prefixChars)).as("h"))
      .distinct()

  /** Start the ingestion dedup over a parquet directory file stream into
    * a memory sink (local smoke; the transform is source-agnostic). */
  def startContentDedupQuery(spark: SparkSession, dir: String,
      name: String): StreamingQuery =
    dedupByContent(spark.readStream.schema(crawlSchema).parquet(dir))
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()
}
