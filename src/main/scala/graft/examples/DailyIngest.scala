package graft.examples

import graft.multimodal.{Codec, Multimodal, SignatureStore}
import graft.ops.{Dedup, MinHashBandStore, NoveltyBloomStore}
import graft.text.{TextFunctions, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DAILY-INCREMENTAL ingest — the keystone composition of the four
  * frozen-history stores into the north-star 100 TB workload: day N's
  * crawl flows
  *
  *   URL frontier        (canonicalizeUrl + raw-key [[NoveltyBloomStore]]
  *                        — fetch only URLs never seen on any prior day)
  *     → exact novelty   (content-prefix [[NoveltyBloomStore]] — a
  *                        verbatim re-crawl of any prior day's content
  *                        never re-enters)
  *     → hygiene         ([[TextQueries.gopherRules]]) + benchmark
  *       decontamination ([[TextQueries.contaminationAgainstBloom]] vs
  *                        a fixed eval suite's bloom, built ONCE per
  *                        run — not re-sketched per day)
  *     → near-dup novelty([[MinHashBandStore]] — a lightly-edited
  *                        re-crawl of any prior day's clean content is
  *                        shed, the exact store's provable blind spot)
  *     → media branch    (A/V/image quality pre-filters →
  *                        [[SignatureStore]] perceptual novelty — a
  *                        re-encode of any prior day's asset is shed
  *                        with ZERO history decodes)
  *     → shard packing   ([[graft.ops.Corpus.packShards]])
  *
  * and every store is APPENDED with what the day SAW, so tomorrow's
  * probe runs against today's history. Per-day cost is O(day): history
  * enters each stage only as bloom bytes, band keys, or signature rows
  * — never as text or payloads (the `pipeline_daily_ingest` gates pin
  * the decode budget to incoming-only and the survivor sets to the
  * one-shot batch twin).
  *
  * SEEN-vs-KEPT discipline (what each store records):
  *  - URL bloom: every DISTINCT canonical URL the day presented — the
  *    frontier records fetches, not survivors.
  *  - content bloom: the content keys of stage-0 survivors (a fetched
  *    page's content is seen even if hygiene later drops the page).
  *  - MinHash bands: the day's CLEAN docs (post hygiene/decontam) —
  *    kept or shed by near-dup, the content was seen; recording shed
  *    near-dups too is what makes the incremental decisions EQUAL the
  *    order-free batch rule "drop iff ANY earlier-ordered clean doc is
  *    a near-dup" (recording only survivors would make day N's outcome
  *    depend recursively on day M's near-dup verdicts — greedy
  *    independent-set semantics no batch plan can replicate).
  *  - signature store: the day's post-quality media — same reasoning.
  *
  * IDEMPOTENCE is ledger-based, the production mechanism, and the
  * ledger is TWO-PHASE because the day's computation must never re-run
  * against stores its own appends already mutated (the probes would see
  * the day's content as history and shed everything — silent data
  * loss on a crash-retry):
  *
  *  - phase 1 (pure): compute the day, write the survivor outputs AND
  *    stage every append INPUT to parquet, then write
  *    `_ledger/day_N.computed` with the counts. A crash before the
  *    marker re-runs phase 1 against UNMUTATED stores — safe.
  *  - phase 2 (mutating): run every append from the STAGED inputs,
  *    then write `_ledger/day_N`. A crash mid-phase-2 retries the
  *    appends from the same staged bytes: blooms are byte-idempotent
  *    under re-insertion, and the band/signature tables gain duplicate
  *    rows that probes tolerate and compact() repairs — the documented
  *    append-retry state, never recomputation against mutated stores.
  *
  * A day whose final marker exists short-circuits entirely — zero rows
  * reach any store, zero bytes change, the recorded counts return.
  *
  * Batch-equivalence contract (gated): because every stage's candidate
  * set is ORDER-FREE (URL keep-first and content keep-first are global
  * minima over (day, doc_id); hygiene/decontam are per-doc; near-dup
  * and perceptual drops test "∃ earlier-ordered SEEN partner" where the
  * seen set never depends on same-stage verdicts), the day-by-day run
  * equals a one-shot batch pipeline over the concatenated days, and the
  * near-dup stages use the store probes' own decision functions
  * ([[MinHashBandStore.estPairs]]; store-parity media pairs below) so
  * the equality is bit-level, not approximate. */
object DailyIngest {

  final case class DayCounts(day: Int, incoming: Long, urlKept: Long,
      exactKept: Long, cleanKept: Long, textKept: Long, mediaIncoming: Long,
      mediaQualityKept: Long, mediaKept: Long, textShards: Long)

  def urlStore(root: String): String = s"$root/stores/url_bloom"
  def textStore(root: String): String = s"$root/stores/text_bloom"
  def mhStore(root: String): String = s"$root/stores/mh_bands"
  def sigStore(root: String): String = s"$root/stores/sig_store"
  def textOut(root: String, day: Int): String = s"$root/corpus/text/day=$day"
  def mediaOut(root: String, day: Int): String = s"$root/corpus/media/day=$day"
  private def marker(root: String, day: Int): String = s"$root/_ledger/day_$day"

  private def fs(spark: SparkSession, p: String) = {
    val path = new org.apache.hadoop.fs.Path(p)
    (path, path.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  private def exists(spark: SparkSession, p: String): Boolean = {
    val (path, f) = fs(spark, p)
    f.exists(path)
  }

  /** All intermediate day frames a completed day must materialize and
    * append, plus every internal CACHE the day created (`caches`) so the
    * daily loop can release them once the day's consumers are
    * materialized — without the release, each day pins fresh day-sized
    * entries (shingle signatures, image signatures, exploded
    * decontamination shingles) for the session lifetime. */
  private final case class DayFrames(canon: DataFrame, urlKept: DataFrame,
      exactKept: DataFrame, clean: DataFrame, textSurvivors: DataFrame,
      postQuality: DataFrame, mediaSurvivors: DataFrame,
      caches: Seq[DataFrame])

  /** One day's pure computation (no writes, no appends): the store
    * probes run against whatever the stores currently hold — i.e. all
    * PRIOR days, because appends happen only in [[ingestDay]] after
    * this day's survivors are materialized. */
  private def processDay(spark: SparkSession, dayDocs: DataFrame,
      dayMedia: DataFrame,
      benchBloom: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter],
      root: String): DayFrames = {
    // ---- stage 0: URL frontier ------------------------------------
    val canon = dayDocs.withColumn("curl",
      TextFunctions.canonicalizeUrl(col("url")))
    // within-day keep-first on the canonical URL, then the frontier
    // bloom sheds every URL any PRIOR day saw
    val urlFirst = canon
      .withColumn("_rn",
        row_number().over(Window.partitionBy("curl").orderBy("doc_id")))
      .where(col("_rn") === 1).drop("_rn")
    val urlKept =
      if (exists(spark, urlStore(root)))
        NoveltyBloomStore.novelAgainst(urlFirst, urlStore(root),
          textCol = "curl").drop("h")
      else urlFirst
    // ---- stage 1: exact-content novelty ---------------------------
    // a page with no text has no content to dedup on — production
    // drops empty fetches here
    val exactCand = urlKept.where(col("text").isNotNull)
    val exactFirst = exactCand
      .withColumn("_k", md5(substring(lower(col("text")), 1, 80)))
      .withColumn("_rn",
        row_number().over(Window.partitionBy("_k").orderBy("doc_id")))
      .where(col("_rn") === 1).drop("_rn", "_k")
    val exactKept =
      if (exists(spark, textStore(root)))
        NoveltyBloomStore.novelAgainst(exactFirst, textStore(root)).drop("h")
      else exactFirst
    // ---- stage 2: hygiene + benchmark decontamination -------------
    // both are per-doc decisions against fixed references (day-free),
    // which is what keeps the batch twin order-free
    val qualityIds = TextQueries.gopherRules(exactKept, minStopHits = 1)
      .select("doc_id")
    // the benchmark bloom is built ONCE per run (the eval suite is
    // frozen) and probed with a single-pass conditional-sum aggregate —
    // no per-day bench re-shingling, no per-day shingle cache
    val contaminated = TextQueries
      .contaminationAgainstBloom(exactKept, benchBloom, threshold = 0.05)
      .select("doc_id")
    val clean = exactKept.join(qualityIds, Seq("doc_id"))
      .join(contaminated, Seq("doc_id"), "left_anti")
      .cache() // consumers: within-day pairs, store probe, append, survivors join
    // ---- stage 3: near-dup novelty ---------------------------------
    // within-day: drop a doc with an earlier-id near-dup partner TODAY;
    // cross-day: the band store sheds near-dups of any prior day's
    // clean docs. Both use the store's own est-Jaccard decision
    // function, so the union equals the batch rule exactly.
    val (withinPairs, estCache) = MinHashBandStore.estPairsTracked(clean)
    val withinDrops = withinPairs
      .select(col("id_b").as("doc_id")).distinct()
    val crossKept =
      if (exists(spark, mhStore(root)))
        MinHashBandStore.noveltyAgainstStore(clean, mhStore(root))
      else clean
    val textSurvivors = crossKept.join(withinDrops, Seq("doc_id"), "left_anti")
    // ---- stage 4: media branch -------------------------------------
    // quality pre-filters (per-asset, day-free) → within-day
    // store-parity pairs → perceptual store probe
    val lowInfo = Multimodal.lowInformationIds(dayMedia)
    // cached: the within-day pairs, the store probe, and the survivor
    // join each consume this frame's six signature/quality builders —
    // uncached, every consumer would re-run the quality DECODES (the
    // budget gate pins one quality pass per asset). Day-sized, spills
    // to disk under the default storage level.
    val postQuality = Multimodal.survivorsBarrier(dayMedia, "daily_quality_in")
      .join(lowInfo, Seq("media_id"), "left_anti")
      .cache()
    val (mediaPairs, imgSigCache) = storeParityMediaPairsTracked(postQuality)
    val mediaWithinDrops = mediaPairs
      .select(col("id_b").as("media_id")).distinct()
    val mediaCrossKept =
      if (exists(spark, sigStore(root)))
        SignatureStore.noveltyAgainstStore(postQuality,
          SignatureStore.load(spark, sigStore(root)))
      else postQuality
    val mediaSurvivors = mediaCrossKept
      .join(mediaWithinDrops, Seq("media_id"), "left_anti")
    DayFrames(canon, urlKept, exactKept, clean, textSurvivors,
      postQuality, mediaSurvivors,
      caches = Seq(clean, postQuality, estCache, imgSigCache))
  }

  /** Pairwise media near-dup pairs under the SIGNATURE-STORE path's
    * exact thresholds and verify functions — images by pHash Hamming ≤7
    * + 8×8 thumbnail MAE ≤6 (NOT [[Multimodal.phashPairs]]' full-luma
    * verify, which would break decision parity with
    * [[SignatureStore.matchedIds]]), video/audio by the containment
    * operators whose defaults the store path shares (video thumb budget
    * tightened to the store's 3.0). Ordered (id_a < id_b). */
  private[graft] def storeParityMediaPairs(media: DataFrame): DataFrame =
    storeParityMediaPairsTracked(media)._1

  /** [[storeParityMediaPairs]] exposing its cached image-signature
    * frame for the daily loop to release. Returns (pairs, imgSigCache).
    */
  private def storeParityMediaPairsTracked(media: DataFrame)
      : (DataFrame, DataFrame) = {
    // cached: sims + thumbs consumers would otherwise decode twice.
    // DELIBERATE sharing beyond this function: imageSigRows' lambda is
    // capture-free (a singleton), so the store probe's identical
    // imageSigRows(media) plan resolves to THIS cache entry and both
    // consumers share one decode pass — the probe decode-budget gate
    // bills images at one signature pass, not two (SCALING.md round-16,
    // cache-identity mechanics). Unmanaged callers inherit the
    // Dedup.jaccardPairs cache-lifetime contract.
    val imgSigs = SignatureStore.imageSigRows(media).cache()
    val mae = udf { (a: Array[Byte], b: Array[Byte]) => Codec.thumbMae(a, b) }
    val thumbs = imgSigs.select(col("media_id"), col("thumb"))
    val img = Dedup.hammingPairs(
        imgSigs.select(col("media_id").as("id"), col("sig").as("sim")),
        maxHamming = 7, bits = 64)
      .join(thumbs.select(col("media_id").as("id_a"), col("thumb").as("_ta")), Seq("id_a"))
      .join(thumbs.select(col("media_id").as("id_b"), col("thumb").as("_tb")), Seq("id_b"))
      .where(mae(col("_ta"), col("_tb")) <= 6.0)
      .select(col("id_a"), col("id_b"))
    val vid = Multimodal.videoNearDupPairs(media, stride = 2,
        maxFrameHamming = 7, minMatchFrac = 0.8, maxThumbMae = 3.0)
      .select(col("media_a").as("id_a"), col("media_b").as("id_b"))
    val aud = Multimodal.audioNearDupPairs(media)
      .select(col("media_a").as("id_a"), col("media_b").as("id_b"))
    img.unionByName(vid).unionByName(aud).distinct() -> imgSigs
  }

  /** Ingest one day end-to-end with the TWO-PHASE ledger documented on
    * the object: phase 1 computes the day, writes survivors + staged
    * append inputs + the `.computed` marker; phase 2 appends every
    * store from the STAGED inputs and writes the final marker. Retry at
    * any crash point is safe — phase 1 re-runs against unmutated
    * stores, phase 2 re-appends byte-identical staged inputs (blooms
    * idempotent; band/signature duplicates repaired by compact()).
    * A day whose final marker exists short-circuits to its counts.
    *
    * `bloomCapacity` sizes the URL and content blooms ONCE, at day-0
    * build — size it to the expected TOTAL history (distinct URLs /
    * content keys across all days), not to a day: past capacity the
    * realized fpp degrades and the frontier starts shedding genuinely
    * novel URLs (a bloom false positive is a dropped fetch by design —
    * and the batch-equivalence gate, whose exact twin has no false
    * positives, will fail loudly on an undersized store). */
  def ingestDay(spark: SparkSession, dayDocs: DataFrame, dayMedia: DataFrame,
      benchDocs: DataFrame, root: String, day: Int,
      shardBudgetBpe: Long = 2000L, bloomCapacity: Long = 1000000L,
      benchBloom: Option[org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter]] = None): DayCounts = {
    val (donePath, mFs) = fs(spark, marker(root, day))
    if (mFs.exists(donePath)) return readCounts(spark, marker(root, day))
    val bloom = benchBloom.getOrElse(
      TextQueries.benchContaminationBloom(benchDocs, fpp = 1e-4))
    val counts = ingestDayCompute(spark, dayDocs, dayMedia, bloom, root,
      day, shardBudgetBpe)
    ingestDayAppend(spark, root, day, counts, bloomCapacity)
  }

  /** Phase 1 of [[ingestDay]] — exposed for the crash-retry spec. */
  private[graft] def ingestDayCompute(spark: SparkSession, dayDocs: DataFrame,
      dayMedia: DataFrame,
      benchBloom: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter],
      root: String, day: Int,
      shardBudgetBpe: Long = 2000L): DayCounts = {
    val computedMarker = marker(root, day) + ".computed"
    val stage = s"$root/_stage/day_$day"
    // ---- phase 1: pure compute + survivor/staging writes ------------
    val counts: DayCounts =
      if (exists(spark, computedMarker)) readCounts(spark, computedMarker)
      else {
        val f = processDay(spark, dayDocs, dayMedia, benchBloom, root)
        // survivors (with the packing metadata a shard writer needs),
        // materialized strictly BEFORE any append mutates the stores
        // the probe plans read
        f.textSurvivors
          .select(col("doc_id"), col("source"),
            TextFunctions.bpeTokenCount(col("text")).as("n_bpe"))
          .write.mode("overwrite").parquet(textOut(root, day))
        f.mediaSurvivors.select(col("media_id"), col("kind"))
          .write.mode("overwrite").parquet(mediaOut(root, day))
        // staged append INPUTS — what the day SAW (see object scaladoc)
        f.canon.select("doc_id", "curl").distinct()
          .write.mode("overwrite").parquet(s"$stage/seen_urls")
        f.urlKept.select("doc_id", "text")
          .write.mode("overwrite").parquet(s"$stage/exact_seen")
        f.clean.select("doc_id", "text")
          .write.mode("overwrite").parquet(s"$stage/clean")
        f.postQuality.write.mode("overwrite").parquet(s"$stage/postq")
        val textKept = spark.read.parquet(textOut(root, day))
        val shards = graft.ops.Corpus.packShards(textKept,
            partitionKey = col("source"), order = col("doc_id"),
            weight = col("n_bpe"), budget = shardBudgetBpe)
          .select("source", "shard").distinct().count()
        val c = DayCounts(day,
          incoming = dayDocs.count(), urlKept = f.urlKept.count(),
          exactKept = f.exactKept.count(), cleanKept = f.clean.count(),
          textKept = textKept.count(), mediaIncoming = dayMedia.count(),
          mediaQualityKept = f.postQuality.count(),
          mediaKept = spark.read.parquet(mediaOut(root, day)).count(),
          textShards = shards)
        writeCounts(spark, computedMarker, c)
        f.caches.foreach(_.unpersist())
        c
      }
    counts
  }

  /** Phase 2 of [[ingestDay]] — exposed for the crash-retry spec. */
  private[graft] def ingestDayAppend(spark: SparkSession, root: String,
      day: Int, counts: DayCounts, bloomCapacity: Long = 1000000L): DayCounts = {
    val stage = s"$root/_stage/day_$day"
    // ---- phase 2: appends, from the staged inputs only ---------------
    val seenUrls = spark.read.parquet(s"$stage/seen_urls")
    if (exists(spark, urlStore(root)))
      NoveltyBloomStore.append(seenUrls, urlStore(root), textCol = "curl")
    else NoveltyBloomStore.build(seenUrls, urlStore(root), textCol = "curl",
      prefixChars = 0, capacity = bloomCapacity)
    val exactSeen = spark.read.parquet(s"$stage/exact_seen")
    if (exists(spark, textStore(root)))
      NoveltyBloomStore.append(exactSeen, textStore(root))
    else NoveltyBloomStore.build(exactSeen, textStore(root),
      capacity = bloomCapacity)
    val cleanStaged = spark.read.parquet(s"$stage/clean")
    if (exists(spark, mhStore(root)))
      MinHashBandStore.append(cleanStaged, mhStore(root))
    else MinHashBandStore.build(cleanStaged, mhStore(root))
    val postqStaged = spark.read.parquet(s"$stage/postq")
    if (exists(spark, sigStore(root)))
      SignatureStore.append(postqStaged, sigStore(root))
    else SignatureStore.build(postqStaged, sigStore(root))
    writeCounts(spark, marker(root, day), counts)
    // staging cleanup only after the final marker: a crash between the
    // two leaves harmless leftovers, never a marker without its inputs
    val (sPath, sFs) = fs(spark, stage)
    sFs.delete(sPath, true)
    counts
  }

  /** PROBE-ONLY day ("today"): the full per-day computation against the
    * current stores with NO writes, NO appends, NO ledger — what a
    * dry-run or a bench rep measures, and what the decode-budget gate
    * drives twice. Returns (text survivors, media survivors). */
  def probeDay(spark: SparkSession, dayDocs: DataFrame, dayMedia: DataFrame,
      benchDocs: DataFrame, root: String,
      benchBloom: Option[org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter]] = None): (DataFrame, DataFrame) = {
    val bloom = benchBloom.getOrElse(
      TextQueries.benchContaminationBloom(benchDocs, fpp = 1e-4))
    val f = processDay(spark, dayDocs, dayMedia, bloom, root)
    // the returned frames still reference the internal caches (clean,
    // postQuality) — an eager unpersist here would force every later
    // consumer to re-run the shingling and quality DECODES. Entries are
    // per-call (fresh closures), day-sized, and left to storage LRU.
    (f.textSurvivors, f.mediaSurvivors)
  }

  /** Ingest days `0 until nDays` (ledger-idempotent; see [[ingestDay]]
    * for the `bloomCapacity` sizing contract). */
  def run(spark: SparkSession, docs: DataFrame, media: DataFrame,
      benchDocs: DataFrame, root: String, nDays: Int,
      bloomCapacity: Long = 1000000L): Seq[DayCounts] = {
    // ONE bench bloom for the whole run — the eval suite is frozen, so
    // re-shingling it per day would be O(bench) wasted work per day
    val benchBloom = TextQueries.benchContaminationBloom(benchDocs, fpp = 1e-4)
    try (0 until nDays).map { i =>
      ingestDay(spark, docs.where(col("day") === i),
        media.where(col("day") === i), benchDocs, root, i,
        bloomCapacity = bloomCapacity, benchBloom = Some(benchBloom))
    } finally benchBloom.destroy()
  }

  private def writeCounts(spark: SparkSession, markerPath: String,
      c: DayCounts): Unit = {
    val (p, f) = fs(spark, markerPath)
    val out = f.create(p, true)
    try out.write(Seq(c.day, c.incoming, c.urlKept, c.exactKept, c.cleanKept,
      c.textKept, c.mediaIncoming, c.mediaQualityKept, c.mediaKept,
      c.textShards).mkString(",").getBytes("UTF-8"))
    finally out.close()
  }

  private def readCounts(spark: SparkSession, markerPath: String): DayCounts = {
    val (p, f) = fs(spark, markerPath)
    val in = f.open(p)
    val line = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val v = line.trim.split(",").map(_.toLong)
    DayCounts(v(0).toInt, v(1), v(2), v(3), v(4), v(5), v(6), v(7), v(8), v(9))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nDays = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("daily-ingest").toString
    val docs = graft.ops.OpsQueries.dailyDocs(spark, dir, nDays)
    val media = graft.ops.OpsQueries.dailyMedia(spark, dir, nDays)
    val bench = graft.ops.OpsQueries.dailyBench(spark, dir)
    val t0 = System.nanoTime()
    val days = run(spark, docs, media, bench, root, nDays)
    val secs = (System.nanoTime() - t0) / 1e9
    val perDay = days.map(c =>
      s"""{"day":${c.day},"in":${c.incoming},"url":${c.urlKept},"exact":${c.exactKept},"clean":${c.cleanKept},"text":${c.textKept},"mediaIn":${c.mediaIncoming},"mediaQ":${c.mediaQualityKept},"media":${c.mediaKept},"shards":${c.textShards}}""")
      .mkString("[", ",", "]")
    println(f"""{"workload":"daily_ingest","dir":"$dir","days":$perDay,"sec":$secs%.1f}""")
    spark.stop()
  }
}
