package graft.examples

import graft.multimodal.{Codec, Multimodal, SignatureStore}
import graft.ops.{Dedup, IvfIndex, MinHashBandStore, NoveltyBloomStore}
import graft.text.{TextFunctions, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DAILY-INCREMENTAL ingest — the keystone composition of the FIVE
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
  *     → semantic novelty([[IvfIndex]] — a PARAPHRASE of any prior
  *                        day's clean content, lexically fresh but
  *                        embedding-near, is shed; the day's vectors
  *                        append to the served index, SemDeDup against
  *                        frozen history)
  *     → media branch    (A/V/image quality pre-filters →
  *                        [[SignatureStore]] perceptual novelty — a
  *                        re-encode of any prior day's asset is shed
  *                        with ZERO history decodes)
  *     → shard packing   (text: [[graft.ops.Corpus.packShards]];
  *                        media: [[Multimodal.assembleShards]] +
  *                        [[Multimodal.shardIndex]] — per-day packed
  *                        byte shards with per-asset (offset, nbytes)
  *                        coordinates, training-ready, gated by md5
  *                        slice roundtrip)
  *
  * and every store is APPENDED with what the day SAW, so tomorrow's
  * probe runs against today's history. Per-day cost is O(day): history
  * enters each stage only as bloom bytes, band keys, signature rows, or
  * probed index cells — never as text or payloads (the
  * `pipeline_daily_ingest` gates pin the decode budget to incoming-only
  * and the survivor sets to the one-shot batch twin).
  *
  * SEEN-vs-KEPT discipline (what each store records):
  *  - URL bloom: every DISTINCT canonical URL the day presented — the
  *    frontier records fetches, not survivors.
  *  - content bloom: the content keys of stage-0 survivors (a fetched
  *    page's content is seen even if hygiene later drops the page).
  *  - MinHash bands AND the embedding index: the day's CLEAN docs
  *    (post hygiene/decontam) — kept or shed by their own stage, the
  *    content was seen; recording shed docs too is what makes the
  *    incremental decisions EQUAL the order-free batch rule "drop iff
  *    ANY earlier-ordered clean doc is a near-dup" (recording only
  *    survivors would make day N's outcome depend recursively on day
  *    M's verdicts — greedy independent-set semantics no batch plan
  *    can replicate). The two text near-dup stages are PARALLEL drop
  *    rules over the same clean set, not chained, for the same reason.
  *  - signature store: the day's post-quality media — same reasoning.
  *
  * SEMANTIC decision function (must match the batch twin bit-level):
  * under the index's FROZEN quantizer (trained once, on day 0's clean
  * vectors, then staged and persisted — never retrained), doc b is
  * shed iff some earlier-ordered clean doc a (prior day, or same day
  * with a smaller id) has its HOME cell among b's `semNprobe` nearest
  * cells and exact cosine(a, b) ≥ `semThreshold`. The rule is
  * one-sided (history stores home cells only — see
  * [[IvfIndex.matchedAgainstIndex]]) and order-free in the candidate
  * set, and both the within-day and batch-twin forms route through
  * [[semanticOrderedDrops]] / the index probe so the equality is exact.
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
  *    under re-insertion, and the band/signature/postings tables gain
  *    duplicate rows that probes tolerate (distinct-aggregating) and
  *    each store's compact() repairs; the drift LOG may gain a
  *    duplicate row for the retried day (a monitoring artifact — the
  *    batch numbering shifts by one — never a decision input) — the
  *    documented append-retry state, never recomputation against
  *    mutated stores. Markers are written via tmp+rename, so a
  *    marker's existence implies a complete record; a crashed bloom
  *    appender's stale `append.lock` is cleared by the retry under the
  *    ledger's single-writer guarantee (see [[clearStaleAppendLock]]).
  *
  * A day whose final marker exists short-circuits entirely — zero rows
  * reach any store, zero bytes change, the recorded counts return.
  *
  * Batch-equivalence contract (gated): because every stage's candidate
  * set is ORDER-FREE (URL keep-first and content keep-first are global
  * minima over (day, doc_id); hygiene/decontam are per-doc; near-dup,
  * semantic, and perceptual drops test "∃ earlier-ordered SEEN partner"
  * where the seen set never depends on same-stage verdicts), the
  * day-by-day run equals a one-shot batch pipeline over the
  * concatenated days, and the near-dup/semantic stages use the store
  * probes' own decision functions ([[MinHashBandStore.estPairs]];
  * store-parity media pairs below; [[semanticOrderedDrops]] under the
  * store's frozen centers) so the equality is bit-level, not
  * approximate.
  *
  * PRECONDITION: `doc_id` / `media_id` are globally unique across ALL
  * days — every store keys on the id, the probes exclude same-id
  * candidates as self-matches, and the batch twins order by
  * (day, doc_id). A crawl that re-issues an id on a later day would
  * make the incremental probes keep the re-fetch (same-id exclusion)
  * while the batch twin drops it (strictly earlier order) — the
  * equivalence contract silently assumes what this line makes
  * explicit. */
object DailyIngest {

  final case class DayCounts(day: Int, incoming: Long, urlKept: Long,
      exactKept: Long, cleanKept: Long, textKept: Long, mediaIncoming: Long,
      mediaQualityKept: Long, mediaKept: Long, textShards: Long,
      mediaShards: Long)

  /** Caller-owned ingest parameters, bundled so every entry point takes
    * one value instead of a drifting parameter list.
    *
    *  - `prefixChars`: the exact-novelty content key length — md5 of
    *    the lowercased first-N-chars prefix (the retyped-copy
    *    heuristic: two documents sharing that prefix DEDUPLICATE, a
    *    deliberate trade the caller now owns; 0 keys on the verbatim
    *    full text). Recorded in the content bloom's header at build,
    *    so later days cannot silently mix key forms.
    *  - `bloomCapacity` sizes the URL and content blooms ONCE, at
    *    day-0 build — size it to the expected TOTAL history (distinct
    *    URLs / content keys across all days), not to a day: past
    *    capacity the realized fpp degrades and the frontier starts
    *    shedding genuinely novel URLs (a bloom false positive is a
    *    dropped fetch by design — and the batch-equivalence gate,
    *    whose exact twin has no false positives, fails loudly on an
    *    undersized store).
    *  - `shardBudgetBpe` / `mediaShardBudgetBytes`: text-shard BPE
    *    budget and media-shard byte budget.
    *  - `semThreshold`/`semNprobe`/`semNlist`/`semIters`: the semantic
    *    stage's cosine bar and the frozen quantizer's geometry (nlist
    *    bounds within-cell candidate mass — raise it as the corpus
    *    grows; nprobe buys boundary recall at probed-mass cost).
    *  - `auditLog`: write the per-day DROP LOG (one (id, reason) row
    *    per dropped doc/asset — see [[dropLogOut]]) in phase 1. The
    *    log is the pipeline's audit trail ("why did my page
    *    disappear?") and its reconciliation invariant — every incoming
    *    id is EITHER a survivor or logged with exactly one reason — is
    *    gated in `pipeline_ingest_audit`. The drop frames are computed
    *    lazily either way; `false` skips only the writes.
    *  - `dailyBpeBudget`: per-day ADMISSION CAP — when set, each day's
    *    deduplicated survivors are ranked by
    *    [[TextFunctions.qualityScore]] (doc_id tie-break) and admitted
    *    best-first until their cumulative BPE count fills the budget
    *    ([[graft.ops.Corpus.admitByBudget]], a distributed prefix-sum
    *    — never a single-partition window). A crawl routinely yields
    *    more clean text than a training run wants per day; the cap
    *    keeps the best of it. Rejected docs log as reason `budget`;
    *    the STORES still record them (their content was seen — a
    *    budget rejection must not make tomorrow's duplicate of it
    *    novel), only the outputs/shards shrink. */
  final case class IngestConfig(prefixChars: Int = 80,
      bloomCapacity: Long = 1000000L, shardBudgetBpe: Long = 2000L,
      mediaShardBudgetBytes: Long = 1L << 20, semThreshold: Double = 0.9,
      semNprobe: Int = 4, semNlist: Int = 16, semIters: Int = 10,
      auditLog: Boolean = true, dailyBpeBudget: Option[Long] = None)

  def urlStore(root: String): String = s"$root/stores/url_bloom"
  def textStore(root: String): String = s"$root/stores/text_bloom"
  def mhStore(root: String): String = s"$root/stores/mh_bands"
  def sigStore(root: String): String = s"$root/stores/sig_store"
  def embStore(root: String): String = s"$root/stores/ivf_index"
  /** The persisted (content_key, doc_id) store beside the content
    * bloom: the bloom answers "seen?" in O(1) but cannot be asked "WHO
    * shares this key" — which is exactly the question takedown's exact
    * expansion asks, and without this store it re-derived keys over the
    * whole lake per takedown batch (O(lake) text reads + hashes).
    * Appended in phase 2 beside the bloom (same ledger, same key
    * derivation — ONE docKey definition), rebuilt minus victims at
    * takedown under the bloom's recorded key mode. Retried phase-2
    * appends leave duplicate rows (the MinHashBandStore contract);
    * every reader collapses with distinct. */
  def keyStore(root: String): String = s"$root/stores/content_keys"
  def textOut(root: String, day: Int): String = s"$root/corpus/text/day=$day"
  def textShardOut(root: String, day: Int): String =
    s"$root/corpus/text_shards/day=$day"
  def textIndexOut(root: String, day: Int): String =
    s"$root/corpus/text_index/day=$day"
  def mediaOut(root: String, day: Int): String = s"$root/corpus/media/day=$day"
  def mediaShardOut(root: String, day: Int): String =
    s"$root/corpus/media_shards/day=$day"
  def mediaIndexOut(root: String, day: Int): String =
    s"$root/corpus/media_index/day=$day"
  def dropLogOut(root: String, day: Int): String =
    s"$root/corpus/drop_log/day=$day"
  def mediaDropLogOut(root: String, day: Int): String =
    s"$root/corpus/media_drop_log/day=$day"
  private def marker(root: String, day: Int): String = s"$root/_ledger/day_$day"

  private def fs(spark: SparkSession, p: String) = {
    val path = new org.apache.hadoop.fs.Path(p)
    (path, path.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  private def exists(spark: SparkSession, p: String): Boolean = {
    val (path, f) = fs(spark, p)
    f.exists(path)
  }

  /** Bloom-store READINESS is keyed on `bloom.bin`, not the directory: a
    * first-day build that crashed after mkdirs but before the bloom file
    * landed leaves a directory whose existence would route the retry to
    * append() — which throws on the missing file. bloom.bin is written
    * via tmp+rename, so its existence implies a complete store. */
  private def bloomReady(spark: SparkSession, dir: String): Boolean =
    exists(spark, s"$dir/bloom.bin")

  /** True iff ANY day other than `exceptDay` has completed (final
    * ledger marker present). This is the guard that keeps a missing
    * `bloom.bin` from being misread as "first build": completed days
    * imply the bloom existed, so its absence is the writeStore
    * delete→rename crash window — rebuilding from one day's staged
    * keys there would SILENTLY discard every prior day's history
    * (known duplicates re-admitted with no error, the worst failure
    * class). [[requireBloomOrFirstBuild]] throws instead, with the
    * recovery path (the replacement bloom survives as a complete
    * `bloom.bin.tmp_*` — rename it back). */
  private def anyCompletedDay(spark: SparkSession, root: String,
      exceptDay: Int): Boolean = {
    val (ledger, f) = fs(spark, s"$root/_ledger")
    f.exists(ledger) && f.listStatus(ledger).exists { st =>
      val n = st.getPath.getName
      n.matches("day_\\d+") && n != s"day_$exceptDay"
    }
  }

  /** Routing guard for the two bloom stores: ready → fine; not ready
    * with NO completed history → first build; not ready WITH completed
    * history → the mid-replace crash state — fail loudly. */
  private def requireBloomOrFirstBuild(spark: SparkSession, root: String,
      dir: String, exceptDay: Int): Unit =
    if (!bloomReady(spark, dir) && anyCompletedDay(spark, root, exceptDay))
      throw new java.io.IOException(
        s"DailyIngest: $dir/bloom.bin is MISSING but completed day markers " +
          "exist — a bloom replacement crashed between delete and rename. " +
          "Recover by renaming the completed bloom.bin.tmp_* back to " +
          "bloom.bin (the replacement was fully written before the delete), " +
          "or rebuild the store from the full corpus. Rebuilding from one " +
          "day's staged keys would silently discard all prior history.")

  /** Throws while a [[takedown]]'s mutation window is open: a staged
    * victim set (`_ledger/takedown_<id>.victims`) without its completion
    * marker means the takedown crashed mid-phase-2 and the stores may be
    * HALF-forgotten. An ingest or probe composed there is silently wrong
    * twice over — probes judge novelty against stores that still
    * recognize some shed twins, and worse, a day appended inside the
    * window is erased by the takedown retry's bloom rebuilds (they
    * rebuild from the lake frame the takedown CALLER passes, which
    * predates the interleaved day — the new day's commitments would be
    * silently forgotten, re-admitting its duplicates forever). The
    * quantizer-lifecycle mutator fences ([[graft.ops.IvfIndex]]) are the
    * same discipline; recovery is identical: re-run takedown with the
    * same id/arguments (the staged set is reused; phase 2 converges),
    * then ingest. ExtSpec's mid-stream drill pins the streaming form:
    * the next micro-batch fails loudly, and after the takedown completes
    * a checkpoint restart replays it under the same batchId, green. */
  private def requireNoPendingTakedown(spark: SparkSession, root: String): Unit = {
    val (ledger, f) = fs(spark, s"$root/_ledger")
    if (!f.exists(ledger)) return
    val names = f.listStatus(ledger).map(_.getPath.getName)
    val pending = names.filter(_.endsWith(".victims"))
      .map(_.stripSuffix(".victims"))
      .filterNot(names.contains)
    if (pending.nonEmpty)
      throw new java.io.IOException(
        s"DailyIngest: $root has a pending takedown " +
          s"(${pending.mkString(", ")} staged without a completion marker) " +
          "— a takedown crashed mid-mutation and the stores may be " +
          "half-forgotten. Re-run DailyIngest.takedown with the same " +
          "id/arguments to complete it (the staged victim set is reused; " +
          "recovery converges), then retry this ingest/probe.")
  }

  /** Embedding-store readiness: the quantizer file. Centers exist only
    * after a completed (or at worst postings-writing) build, and the
    * ledger retries a crashed day before any later day runs, so a
    * centers-without-postings window is never probed. */
  private def embReady(spark: SparkSession, dir: String): Boolean =
    exists(spark, s"$dir/centers.parquet")

  /** Clear a stale `append.lock` left by a crashed appender. SAFE here
    * and ONLY here because the two-phase ledger is the single writer:
    * one driver retries one day at a time, phase 2 is the only code
    * that appends to this run's stores, and re-merging the staged keys
    * is idempotent (bloom merge is bit-or) — exactly the manual
    * recovery the lock's contract prescribes, automated under the
    * ledger's serialization guarantee. */
  private def clearStaleAppendLock(spark: SparkSession, dir: String): Unit = {
    val (lock, f) = fs(spark, s"$dir/append.lock")
    if (f.exists(lock)) {
      System.err.println(s"[daily] clearing stale $lock (crashed appender; " +
        "ledger single-writer guarantees no concurrent append)")
      f.delete(lock, false)
    }
  }

  /** The exact-novelty content key — [[NoveltyBloomStore]]'s own key
    * definition (ONE definition, not a mirrored copy), so the
    * within-day keep-first and the store probe cannot drift apart. */
  private def contentKey(textCol: String, prefixChars: Int) =
    NoveltyBloomStore.docKey(textCol, prefixChars)

  /** Persistent-RDD ids right now — capture BEFORE a day's compute or
    * probe, hand to [[sweepCaches]] once its consumers materialized. */
  private[graft] def rddIds(spark: SparkSession): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Release a day's caches: the TRACKED frames (unpersisted through
    * the Dataset API, which also drops their plan-cache entries), then
    * any persistent RDD the day materialized beyond them — the probe
    * paths pin operator-internal caches that surface no reference to
    * release (video/audio pair post-select frames, store-probe
    * internals), and without the sweep a long-running daily driver
    * accumulates one set per day under storage LRU. RDD-level
    * unpersist frees the storage; a plan-cache entry whose RDD was
    * swept simply re-materializes if ever re-used (none of the day's
    * plans are — the next day's frames differ). */
  private[graft] def sweepCaches(spark: SparkSession, before: Set[Int],
      caches: Seq[DataFrame]): Unit = {
    caches.foreach(_.unpersist(true))
    spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before(id) }
      .values.foreach(_.unpersist(true))
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
      semSeen: Option[DataFrame], trainedCenters: Option[Array[Array[Double]]],
      textDrops: DataFrame, mediaDrops: DataFrame,
      caches: Seq[DataFrame])

  /** The drop-log REASON vocabulary, in attribution-priority order.
    * Sequential stages partition drops by construction (a doc reaches
    * stage k only by surviving k−1); the PARALLEL rules (hygiene vs
    * decontamination over the same stage-1 survivors; the four
    * near-dup/semantic rules over the same clean set) can each claim a
    * doc, so attribution takes the FIRST reason in this order — fixed
    * and documented, which is what makes the log a partition of the
    * incoming ids (the `pipeline_ingest_audit` reconciliation gate)
    * rather than a multiset of verdicts. Cross-day ("_seen") reasons
    * outrank within-day ones, lexical outranks semantic.
    *
    * PRECONDITION: `doc_id` is unique within each day. The drop frames
    * are exceptAll differences between adjacent stage frames, and a
    * duplicated incoming id leaves residual exceptAll rows that log a
    * SURVIVING copy's id as dropped — breaking the survivor/log
    * disjointness the audit gate asserts. Audit-enabled ingest checks
    * this per day and fails with the cause named instead of leaving an
    * overlap mystery in the reconciliation gate. */
  private[graft] val DropReasons: Seq[String] = Seq(
    "url_dup_within_day", "url_seen", "empty_text",
    "exact_dup_within_day", "exact_seen", "quality", "contaminated",
    "neardup_seen", "neardup_dup_within_day",
    "semantic_seen", "semantic_dup_within_day",
    "budget") // applied AFTER all dedup stages, over survivors — disjoint by construction
  private[graft] val MediaDropReasons: Seq[String] = Seq(
    "media_low_information", "media_neardup_seen",
    "media_neardup_dup_within_day")

  /** Union drop-candidate id frames into one (id, reason) log row per
    * id, first-listed reason wins (see [[DropReasons]]). */
  private def reasonPartition(idCol: String,
      cands: Seq[(DataFrame, String)]): DataFrame = {
    val prioOf = cands.map(_._2).zipWithIndex.toMap
    cands.map { case (df, reason) =>
      df.select(col(idCol), lit(reason).as("reason"),
        lit(prioOf(reason)).as("_prio"))
    }.reduce(_ unionByName _)
      .withColumn("_rn", row_number().over(
        Window.partitionBy(idCol).orderBy(col("_prio"))))
      .where(col("_rn") === 1).drop("_rn", "_prio")
  }

  /** The one-sided semantic drop rule over an ORDERED vector
    * population, under FROZEN centers: doc b is dropped iff some doc a
    * with `ord_a < ord_b` has its home cell among b's `nprobe` nearest
    * cells and exact cosine(a, b) ≥ `threshold` — the within-day form
    * (ord = doc_id) and the batch twin (ord = struct(day, doc_id)) are
    * THE SAME function, which is what makes the equivalence gate
    * bit-level. `vecs` is (doc_id, embedding); `ord` is (doc_id, ord)
    * with any sortable ord. Cosine argument order is incoming-first,
    * matching [[IvfIndex.matchedAgainstIndex]] (bitwise immaterial —
    * products commute, summation index order is fixed — but uniform).
    *
    * Cost shape: one assignment pass over the population, then a cell
    * equi-join bounded by Σ_cell probes(cell)·|cell| — the
    * [[graft.ops.SimilaritySearch.semanticDupPairs]] inverted-file
    * shape, never all-pairs. */
  private[graft] def semanticOrderedDrops(vecs: DataFrame, ord: DataFrame,
      centers: Array[Array[Double]], nprobe: Int,
      threshold: Double): DataFrame =
    semanticOrderedDropsFromAssigned(
      IvfIndex.assignCells(vecs, centers, "doc_id", "embedding", nprobe)
        .join(ord.select(col(ord.columns.head).as("id"), col("ord")), Seq("id")),
      threshold)

  /** [[semanticOrderedDrops]] over a caller-owned (ideally cached)
    * assigned frame carrying an `ord` column — the self-join's two
    * sides then share one assignment materialization instead of
    * re-running the quantizer UDF per side (the [[IvfIndex]]
    * one-assign-pass discipline). */
  private[graft] def semanticOrderedDropsFromAssigned(assigned: DataFrame,
      threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions.arrayDot
    val probeSide = assigned.select(col("id"), col("v"), col("nrm"),
      col("ord"), explode(col("probes")).as("cell"))
    val homeSide = assigned.select(col("id").as("id_h"), col("v").as("v_h"),
      col("nrm").as("nrm_h"), col("ord").as("ord_h"),
      col("probes").getItem(0).as("cell"))
    probeSide.join(homeSide, Seq("cell"))
      .where(col("ord_h") < col("ord"))
      .where(arrayDot(col("v"), col("v_h")) /
        (col("nrm") * col("nrm_h")) >= threshold)
      .select(col("id").as("doc_id")).distinct()
  }

  /** One day's pure computation (no writes, no appends): the store
    * probes run against whatever the stores currently hold — i.e. all
    * PRIOR days, because appends happen only in [[ingestDay]] after
    * this day's survivors are materialized. */
  private def processDay(spark: SparkSession, dayDocs: DataFrame,
      dayMedia: DataFrame, dayEmb: Option[DataFrame],
      benchBloom: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter],
      root: String, cfg: IngestConfig,
      willWriteAudit: Boolean = false): DayFrames = {
    // the cross-store probe results are cached ONLY when the audit log
    // will consume them a second time (the drop frames re-read each
    // probe): a probe-only day evaluates each probe once, and caching
    // there would pay storage-write cost for zero reuse
    def cacheIfAudit(df: DataFrame): DataFrame =
      if (willWriteAudit) df.cache() else df
    if (willWriteAudit) {
      // the [[DropReasons]] unique-id precondition, enforced where the
      // drop log is actually derived — one aggregate pass over the day
      val idc = dayDocs.agg(count(lit(1)).as("n"),
        countDistinct(col("doc_id")).as("nd")).head
      require(idc.getLong(0) == idc.getLong(1),
        s"daily ingest drop log requires doc_id unique within the day " +
          s"(got ${idc.getLong(0)} rows, ${idc.getLong(1)} distinct ids): " +
          "a duplicated id would log a surviving copy as dropped — " +
          "dedupe the feed or disable auditLog")
    }
    // ---- stage 0: URL frontier ------------------------------------
    val canon = dayDocs.withColumn("curl",
      TextFunctions.canonicalizeUrl(col("url")))
    // within-day keep-first on the canonical URL, then the frontier
    // bloom sheds every URL any PRIOR day saw
    val urlFirst = canon
      .withColumn("_rn",
        row_number().over(Window.partitionBy("curl").orderBy("doc_id")))
      .where(col("_rn") === 1).drop("_rn")
    // probes carry the same mid-replace guard as the appends: a probe
    // against a history-holding root whose bloom is mid-replacement
    // must not silently keep everything (only reachable outside the
    // ledger's retry ordering — e.g. a probeDay against a crashed root)
    requireBloomOrFirstBuild(spark, root, urlStore(root), exceptDay = -1)
    val urlKept =
      if (bloomReady(spark, urlStore(root)))
        NoveltyBloomStore.novelAgainst(urlFirst, urlStore(root),
          textCol = "curl").drop("h")
      else urlFirst
    // ---- stage 1: exact-content novelty ---------------------------
    // a page with no text has no content to dedup on — production
    // drops empty fetches here
    val exactCand = urlKept.where(col("text").isNotNull)
    // the store header is the key-mode authority: a cfg.prefixChars
    // that contradicts it would silently split the within-day
    // keep-first key from the store probe/append key (mixed key forms
    // — the divergence the header exists to prevent), so fail loudly
    if (bloomReady(spark, textStore(root))) {
      val recorded = NoveltyBloomStore.recordedPrefixChars(spark, textStore(root))
      require(recorded == cfg.prefixChars,
        s"IngestConfig.prefixChars=${cfg.prefixChars} contradicts the content " +
          s"bloom's recorded key mode $recorded at ${textStore(root)} — the " +
          "store's key length is a build-time commitment; rebuild the store " +
          "to change it")
    }
    val exactFirst = exactCand
      .withColumn("_k", contentKey("text", cfg.prefixChars))
      .withColumn("_rn",
        row_number().over(Window.partitionBy("_k").orderBy("doc_id")))
      .where(col("_rn") === 1).drop("_rn", "_k")
    requireBloomOrFirstBuild(spark, root, textStore(root), exceptDay = -1)
    val exactKept =
      if (bloomReady(spark, textStore(root)))
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
      .cache() // consumers: within-day pairs, store probes, appends, survivors join
    // ---- stage 3: near-dup novelty ---------------------------------
    // within-day: drop a doc with an earlier-id near-dup partner TODAY;
    // cross-day: the band store sheds near-dups of any prior day's
    // clean docs. Both use the store's own est-Jaccard decision
    // function, so the union equals the batch rule exactly.
    val (withinPairs, estCache) = MinHashBandStore.estPairsTracked(clean)
    val withinDrops = withinPairs
      .select(col("id_b").as("doc_id")).distinct()
    // cached: BOTH the survivor anti-join and the audit drop frame
    // (neardup_seen) consume this store probe — uncached, the band-
    // store candidate join (the day's most expensive history join)
    // would run twice per day
    val crossKept = cacheIfAudit(
      if (exists(spark, mhStore(root)))
        MinHashBandStore.noveltyAgainstStore(clean, mhStore(root))
      else clean)
    // ---- stage 3b: semantic (embedding) novelty --------------------
    // a PARALLEL drop rule over the same clean set (see the object
    // scaladoc): docs without a vector pass — an unprovable semantic
    // dup is never dropped, the family-wide rule
    // semDropRows carries (doc_id, reason) — semantic_seen for the
    // frozen-history probe, semantic_dup_within_day for the within-day
    // rule — so the audit log can attribute without re-probing
    val (semDropRows, semSeen, trainedCenters, semCaches) = dayEmb match {
      case None =>
        // text-only mode is legitimate ONLY while no embedding store
        // exists: once one does, a vector-less day would neither probe
        // nor append — its content invisible to every later semantic
        // probe, batch equivalence silently broken. A day genuinely
        // without vectors passes an EMPTY frame, not None.
        require(!embReady(spark, embStore(root)),
          s"an embedding store exists at ${embStore(root)} but this day " +
            "supplied no vectors (dayEmb=None) — pass the day's embeddings " +
            "(an empty frame if the day truly has none) or remove the store")
        (None, None, None, Nil)
      case Some(embDf) =>
        import graft.functions.VectorFunctions.arraySqNorm
        val cleanVecs = embDf.select(col("doc_id"), col("embedding"))
          .join(clean.select("doc_id"), Seq("doc_id"))
        val storeReady = embReady(spark, embStore(root))
        // capture the quantizer generation WITH the centers: phase 2
        // (or a rebuild landing between compute and probe) must not
        // silently join postings the loaded centers no longer route —
        // matchedFromAssigned fails loudly on the mismatch
        val storeGen =
          if (storeReady) Some(IvfIndex.generation(spark, embStore(root)))
          else None
        // the quantizer is FROZEN at first build: later days load it;
        // the first day with vectors trains it ONCE here (phase 1),
        // uses it for its own within-day decisions, and stages the
        // array so phase 2 persists the SAME centers — retraining
        // from re-read rows could flip low-order bits and with them a
        // boundary pair's cell (see IvfIndex.trainCenters). The train
        // guard requires an INDEXABLE vector (non-null AND norm > 0):
        // a day of all-zero vectors has nothing the index could hold,
        // and buildFromCenters now fails loudly on an empty build —
        // such a day passes semantically untouched, like a vector-less
        // day, and the first day with a real vector builds.
        val centersOpt: Option[(Array[Array[Double]], Boolean)] =
          if (storeReady)
            Some((IvfIndex.loadCenters(spark, embStore(root)), false))
          else if (cleanVecs.where(col("embedding").isNotNull &&
              arraySqNorm(col("embedding").cast("array<double>")) > 0)
              .limit(1).count() > 0)
            Some((IvfIndex.trainCenters(cleanVecs, "doc_id", "embedding",
              cfg.semNlist, cfg.semIters), true))
          else None
        centersOpt match {
          case None => (None, Some(cleanVecs), None, Nil)
          case Some((ctrs, trained)) =>
            // ONE quantizer-assignment pass for the whole stage: the
            // within-day self-join's two sides AND the store probe's
            // two consumptions (probed-cell collect + candidate join)
            // all read this cached frame (day-sized, spills past
            // memory; released with the day's other caches)
            val assigned = IvfIndex
              .assignCells(cleanVecs, ctrs, "doc_id", "embedding", cfg.semNprobe)
              .withColumn("ord", col("id"))
              .cache()
            val within = semanticOrderedDropsFromAssigned(assigned,
              cfg.semThreshold)
            val cross =
              if (storeReady)
                IvfIndex.matchedFromAssigned(assigned, embStore(root),
                    cfg.semThreshold, expectGeneration = storeGen)
                  .select(col("id").as("doc_id"))
              else within.limit(0)
            // cached: the survivor anti-join and the audit drop frame's
            // two reason filters all read this (id, reason) set — the
            // probed-cell candidate joins behind it must run once
            val semRows = cacheIfAudit(
              cross.withColumn("reason", lit("semantic_seen"))
                .unionByName(within
                  .withColumn("reason", lit("semantic_dup_within_day"))))
            (Some(semRows), Some(cleanVecs),
              if (trained) Some(ctrs) else None,
              Seq(assigned) ++ (if (willWriteAudit) Seq(semRows) else Nil))
        }
    }
    val textSurvivors0 = crossKept.join(withinDrops, Seq("doc_id"), "left_anti")
    val textSurvivors = semDropRows match {
      case Some(sd) => textSurvivors0
        .join(sd.select("doc_id"), Seq("doc_id"), "left_anti")
      case None     => textSurvivors0
    }
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
    val (mediaPairs, sigCaches) = storeParityMediaPairsTracked(postQuality)
    val mediaWithinDrops = mediaPairs
      .select(col("id_b").as("media_id")).distinct()
    // cached for the same reason as crossKept: survivor anti-join +
    // audit drop frame share one perceptual store probe
    val mediaCrossKept = cacheIfAudit(
      if (exists(spark, sigStore(root)))
        SignatureStore.noveltyAgainstStore(postQuality,
          SignatureStore.load(spark, sigStore(root)))
      else postQuality)
    val mediaSurvivors = mediaCrossKept
      .join(mediaWithinDrops, Seq("media_id"), "left_anti")
    // ---- drop-reason audit frames (lazy — written only when
    // cfg.auditLog; see [[DropReasons]] for the attribution order).
    // Sequential-stage drops are derived by anti-joining adjacent
    // survivor sets; parallel-rule drops by each rule's own id frame.
    val dId = (df: DataFrame) => df.select("doc_id")
    val semReason = (r: String) => semDropRows
      .map(_.where(col("reason") === r).select("doc_id"))
      .getOrElse(clean.select("doc_id").limit(0))
    val textDrops = reasonPartition("doc_id", Seq(
      dId(canon).exceptAll(dId(urlFirst)) -> "url_dup_within_day",
      dId(urlFirst).exceptAll(dId(urlKept)) -> "url_seen",
      urlKept.where(col("text").isNull).select("doc_id") -> "empty_text",
      dId(exactCand).exceptAll(dId(exactFirst)) -> "exact_dup_within_day",
      dId(exactFirst).exceptAll(dId(exactKept)) -> "exact_seen",
      dId(exactKept).join(qualityIds, Seq("doc_id"), "left_anti") -> "quality",
      contaminated -> "contaminated",
      dId(clean).join(dId(crossKept), Seq("doc_id"), "left_anti") -> "neardup_seen",
      withinDrops -> "neardup_dup_within_day",
      semReason("semantic_seen") -> "semantic_seen",
      semReason("semantic_dup_within_day") -> "semantic_dup_within_day"))
    val mId = (df: DataFrame) => df.select("media_id")
    val mediaDrops = reasonPartition("media_id", Seq(
      lowInfo -> "media_low_information",
      mId(postQuality).join(mId(mediaCrossKept), Seq("media_id"), "left_anti")
        -> "media_neardup_seen",
      mediaWithinDrops -> "media_neardup_dup_within_day"))
    DayFrames(canon, urlKept, exactKept, clean, textSurvivors,
      postQuality, mediaSurvivors, semSeen, trainedCenters,
      textDrops, mediaDrops,
      caches = Seq(clean, postQuality, estCache) ++ sigCaches ++
        (if (willWriteAudit) Seq(crossKept, mediaCrossKept) else Nil) ++
        semCaches)
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

  /** [[storeParityMediaPairs]] exposing its cached per-kind signature
    * frames for the daily loop to release. Returns (pairs, sigCaches =
    * Seq(imgSigs, vidSigs, audSigs)). */
  private def storeParityMediaPairsTracked(media: DataFrame)
      : (DataFrame, Seq[DataFrame]) = {
    // cached: sims + thumbs consumers would otherwise decode twice.
    // DELIBERATE sharing beyond this function: imageSigRows' lambda is
    // capture-free (a singleton), so the store probe's identical
    // imageSigRows(media) plan resolves to THIS cache entry and both
    // consumers share one decode pass — the probe decode-budget gate
    // bills images at one signature pass, not two (SCALING.md round-16,
    // cache-identity mechanics). Unmanaged callers inherit the
    // Dedup.jaccardPairs cache-lifetime contract.
    val imgSigs = SignatureStore.imageSigRows(media).cache()
    // same mechanism for the A/V builders (r20): cache the RAW
    // videoSigRows/audioSigRows frames so BOTH in-function consumers
    // (the pair operators' post-select caches fill from here, not from
    // a fresh decode) AND the store probe's raw
    // `videoSigRows(media, 2).distinct()` / `audioSigRows(media)
    // .distinct()` plans resolve to these entries — one decode pass per
    // kind per day instead of two. Requires the capture-free
    // sampleFrames UDF (see Multimodal.sampleFramesUdf) so the two
    // video plans canonicalize equal. The probe decode-budget gate pins
    // the per-kind pass counts.
    val vidSigs = SignatureStore.videoSigRows(media, 2).cache()
    val audSigs = SignatureStore.audioSigRows(media).cache()
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
    (img.unionByName(vid).unionByName(aud).distinct(),
      Seq(imgSigs, vidSigs, audSigs))
  }

  /** True iff every day in `[0, nDays)` holds its final ledger marker —
    * i.e. a [[run]] over these days would short-circuit every day to
    * its recorded counts. Driver-side FS metadata only. Callers use it
    * to skip building inputs a fully-ingested root will never read
    * (the bench's ledger-short-circuited steady state: eager fixture
    * pins measured +1–2 s/rep on the small keystone queries for frames
    * no consumer evaluated). */
  def allDaysIngested(spark: SparkSession, root: String, nDays: Int): Boolean =
    (0 until nDays).forall(i => exists(spark, marker(root, i)))

  /** Ingest one day end-to-end with the TWO-PHASE ledger documented on
    * the object: phase 1 computes the day, writes survivors + staged
    * append inputs + the `.computed` marker; phase 2 appends every
    * store from the STAGED inputs and writes the final marker. Retry at
    * any crash point converges without recomputation against mutated
    * stores: phase 1 re-runs against unmutated stores, phase 2
    * re-appends byte-identical staged inputs (blooms idempotent —
    * stale appender locks auto-cleared under the ledger's single-writer
    * guarantee; band/signature duplicates repaired by compact();
    * postings duplicates tolerated by the distinct-aggregating probe).
    * A day whose final marker exists short-circuits to its counts. */
  def ingestDay(spark: SparkSession, dayDocs: DataFrame, dayMedia: DataFrame,
      benchDocs: DataFrame, root: String, day: Int,
      cfg: IngestConfig = IngestConfig(),
      benchBloom: Option[org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter]] = None,
      dayEmb: Option[DataFrame] = None): DayCounts = {
    val (donePath, mFs) = fs(spark, marker(root, day))
    if (mFs.exists(donePath)) return readCounts(spark, marker(root, day))
    requireNoPendingTakedown(spark, root)
    // a locally built bench bloom is destroyed before return — a
    // standalone per-day scheduler calling this daily must not
    // accumulate one broadcast bloom per day (the run() loop shares and
    // destroys its own)
    val bloom = benchBloom.getOrElse(
      TextQueries.benchContaminationBloom(benchDocs, fpp = 1e-4))
    try {
      val counts = ingestDayCompute(spark, dayDocs, dayMedia, bloom, root,
        day, cfg, dayEmb)
      ingestDayAppend(spark, root, day, counts, cfg)
    } finally if (benchBloom.isEmpty) bloom.destroy()
  }

  /** Phase 1 of [[ingestDay]] — exposed for the crash-retry spec. */
  private[graft] def ingestDayCompute(spark: SparkSession, dayDocs: DataFrame,
      dayMedia: DataFrame,
      benchBloom: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter],
      root: String, day: Int, cfg: IngestConfig = IngestConfig(),
      dayEmb: Option[DataFrame] = None): DayCounts = {
    val computedMarker = marker(root, day) + ".computed"
    val stage = s"$root/_stage/day_$day"
    // ---- phase 1: pure compute + survivor/staging writes ------------
    val counts: DayCounts =
      if (exists(spark, computedMarker)) readCounts(spark, computedMarker)
      else {
        val rddsBefore = rddIds(spark)
        val f = processDay(spark, dayDocs, dayMedia, dayEmb, benchBloom,
          root, cfg, willWriteAudit = cfg.auditLog)
        // survivors (with the packing metadata a shard writer needs),
        // materialized strictly BEFORE any append mutates the stores
        // the probe plans read. ONE evaluation of the text-survivor
        // pipeline for its three writers (id list, shard index, shard
        // streams) — the media-side mediaSurv discipline
        val textSurv = f.textSurvivors
          .select(col("doc_id"), col("source"), col("text"),
            TextFunctions.bpeTokenCount(col("text")).as("n_bpe"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // per-day admission cap (see IngestConfig.dailyBpeBudget):
        // quality-best-first prefix until the BPE budget fills; the
        // STORES below still append the full seen/clean sets — a
        // budget rejection shrinks the day's output, never its memory
        val (textKeptDf, budgetRejected) = cfg.dailyBpeBudget match {
          case Some(b) =>
            // NOT persisted again here: every consumer is a cheap map
            // over admitByBudget's internally persisted sorted RDD —
            // a third cached copy of the day's text (after textSurv
            // and that RDD) would buy nothing (the day's cache sweep
            // releases the internal RDD via the rddIds diff)
            val adm = graft.ops.Corpus.admitByBudget(
              textSurv.withColumn("_q",
                TextFunctions.qualityScore(col("text"))),
              order = Seq(col("_q").desc, col("doc_id").asc),
              weight = col("n_bpe"), budget = b)
            (adm.where(col("admitted")).drop("admitted", "_q"),
              Some(adm))
          case None => (textSurv, None)
        }
        textKeptDf.select(col("doc_id"), col("source"), col("n_bpe"))
          .write.mode("overwrite").parquet(textOut(root, day))
        // training-ready TEXT byte shards for the day — the media
        // branch's packed-stream + slice-index pair, text form: per
        // (source, shard) assembled document streams plus each doc's
        // (offset, nchars) span, gated per day by md5 slice roundtrip
        graft.ops.Corpus.shardTextIndex(textKeptDf,
            partitionKey = col("source"), order = col("doc_id"),
            weight = col("n_bpe"), text = col("text"),
            budget = cfg.shardBudgetBpe)
          .select(col("doc_id"), col("source"), col("shard"),
            col("offset"), col("nchars"))
          .write.mode("overwrite").parquet(textIndexOut(root, day))
        graft.ops.Corpus.assembleTextShards(textKeptDf,
            partitionKey = col("source"), order = col("doc_id"),
            weight = col("n_bpe"), text = col("text"),
            budget = cfg.shardBudgetBpe)
          .write.mode("overwrite").parquet(textShardOut(root, day))
        // ONE evaluation of the survivor pipeline (store probe +
        // within-day anti-join) for its three consumers — the id list,
        // the shard index, and the byte assembly; without the persist,
        // each write re-runs the perceptual store probe over the day.
        // Day-sized (payloads included), spills to disk; released with
        // the day's other caches below.
        val mediaSurv = f.mediaSurvivors
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        mediaSurv.select(col("media_id"), col("kind"))
          .write.mode("overwrite").parquet(mediaOut(root, day))
        // training-ready media byte shards for the day: packed payload
        // streams + the (offset, nbytes) slice index — the byte-exact
        // assembly pair, gated per day by md5 slice roundtrip. Payload
        // bytes come from the cached post-quality frame (no decodes).
        val survivorPayloads = mediaSurv
          .select(col("media_id"), col("kind"), col("content"))
        Multimodal.shardIndex(survivorPayloads, cfg.mediaShardBudgetBytes)
          .write.mode("overwrite").parquet(mediaIndexOut(root, day))
        Multimodal.assembleShards(survivorPayloads, cfg.mediaShardBudgetBytes)
          .write.mode("overwrite").parquet(mediaShardOut(root, day))
        // drop-reason audit log — the day's non-survivors, one reason
        // each (see [[DropReasons]]); part of phase 1 because it is a
        // pure function of the day against PRE-append stores, like the
        // survivor outputs it complements
        if (cfg.auditLog) {
          // budget rejections are drops too — disjoint from every
          // dedup-stage reason by construction (they are SURVIVORS of
          // those stages), so a plain union keeps the partition
          val textLog = budgetRejected match {
            case Some(adm) => f.textDrops.unionByName(
              adm.where(!col("admitted"))
                .select(col("doc_id"), lit("budget").as("reason")))
            case None => f.textDrops
          }
          textLog.write.mode("overwrite").parquet(dropLogOut(root, day))
          f.mediaDrops.write.mode("overwrite")
            .parquet(mediaDropLogOut(root, day))
        }
        // staged append INPUTS — what the day SAW (see object scaladoc)
        f.canon.select("doc_id", "curl").distinct()
          .write.mode("overwrite").parquet(s"$stage/seen_urls")
        f.urlKept.select("doc_id", "text")
          .write.mode("overwrite").parquet(s"$stage/exact_seen")
        // (content_key, doc_id) of EVERY incoming doc with text — the
        // same population the lake-scan exact expansion read, so the
        // store-driven expansion is its exact replacement (gated in
        // pipeline_takedown)
        f.canon.where(col("text").isNotNull)
          .select(col("doc_id"), contentKey("text", cfg.prefixChars).as("k"))
          .write.mode("overwrite").parquet(s"$stage/content_keys")
        f.clean.select("doc_id", "text")
          .write.mode("overwrite").parquet(s"$stage/clean")
        f.postQuality.write.mode("overwrite").parquet(s"$stage/postq")
        // canonical types at staging so phase 2 reads with an EXPLICIT
        // schema: a day with an embedding frame but zero clean vectors
        // (empty frame, or every vector null/zero-norm — the streaming
        // text keystone's every batch) stages an EMPTY parquet, which
        // can materialize as zero data files, and a schema-inferring
        // read of that dies instead of appending nothing
        f.semSeen.foreach(_.select(col("doc_id").cast("long"),
            col("embedding").cast("array<double>"))
          .write.mode("overwrite").parquet(s"$stage/emb_seen"))
        f.trainedCenters.foreach { ctrs =>
          val sp = spark
          import sp.implicits._
          ctrs.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
            .toDF("cell", "center").repartition(1)
            .write.mode("overwrite").parquet(s"$stage/emb_centers")
        }
        val shards = spark.read.parquet(textIndexOut(root, day))
          .select("source", "shard").distinct().count()
        val mShards = spark.read.parquet(mediaIndexOut(root, day))
          .select("kind", "shard").distinct().count()
        val c = DayCounts(day,
          incoming = dayDocs.count(), urlKept = f.urlKept.count(),
          exactKept = f.exactKept.count(), cleanKept = f.clean.count(),
          textKept = textKeptDf.count(), mediaIncoming = dayMedia.count(),
          mediaQualityKept = f.postQuality.count(),
          mediaKept = spark.read.parquet(mediaOut(root, day)).count(),
          textShards = shards, mediaShards = mShards)
        writeCounts(spark, computedMarker, c)
        sweepCaches(spark, rddsBefore, f.caches ++ Seq(mediaSurv, textSurv))
        c
      }
    counts
  }

  /** Phase 2 of [[ingestDay]] — exposed for the crash-retry spec. */
  private[graft] def ingestDayAppend(spark: SparkSession, root: String,
      day: Int, counts: DayCounts,
      cfg: IngestConfig = IngestConfig()): DayCounts = {
    val stage = s"$root/_stage/day_$day"
    // ---- phase 2: appends, from the staged inputs only ---------------
    val seenUrls = spark.read.parquet(s"$stage/seen_urls")
    requireBloomOrFirstBuild(spark, root, urlStore(root), day)
    if (bloomReady(spark, urlStore(root))) {
      clearStaleAppendLock(spark, urlStore(root))
      NoveltyBloomStore.append(seenUrls, urlStore(root), textCol = "curl")
    } else NoveltyBloomStore.build(seenUrls, urlStore(root), textCol = "curl",
      prefixChars = 0, capacity = cfg.bloomCapacity)
    val exactSeen = spark.read.parquet(s"$stage/exact_seen")
    requireBloomOrFirstBuild(spark, root, textStore(root), day)
    if (bloomReady(spark, textStore(root))) {
      clearStaleAppendLock(spark, textStore(root))
      NoveltyBloomStore.append(exactSeen, textStore(root))
    } else NoveltyBloomStore.build(exactSeen, textStore(root),
      prefixChars = cfg.prefixChars, capacity = cfg.bloomCapacity)
    // the content-key store appends beside the bloom (a phase-2 retry
    // re-appends — duplicate rows, collapsed by every reader's
    // distinct); exists-guarded so a stage written by an older build
    // (no content_keys input) appends nothing rather than failing
    if (exists(spark, s"$stage/content_keys"))
      spark.read.schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.StringType))))
        .parquet(s"$stage/content_keys")
        .write.mode("append").parquet(keyStore(root))
    val cleanStaged = spark.read.parquet(s"$stage/clean")
    if (exists(spark, mhStore(root)))
      MinHashBandStore.append(cleanStaged, mhStore(root))
    else MinHashBandStore.build(cleanStaged, mhStore(root))
    val postqStaged = spark.read.parquet(s"$stage/postq")
    if (exists(spark, sigStore(root)))
      SignatureStore.append(postqStaged, sigStore(root))
    else SignatureStore.build(postqStaged, sigStore(root))
    // the embedding index: append under the frozen quantizer (drift
    // monitored per day — IvfIndex.append logs DriftStats per batch),
    // or first-build from the STAGED centers phase 1 trained
    if (exists(spark, s"$stage/emb_seen")) {
      val embStaged = spark.read.schema(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("embedding",
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.DoubleType)))))
        .parquet(s"$stage/emb_seen")
      // STAGED CENTERS TAKE PRECEDENCE over store readiness: a day
      // that staged centers is the FIRST-BUILD day, and a crash inside
      // buildFromCenters writes centers.parquet before postings and
      // the drift reference — routing the retry by embReady would
      // append onto the partial build and silently skip the drift
      // reference FOREVER (every later day unmonitored). The build is
      // overwrite-idempotent, so the retry just re-runs it; only days
      // with no staged centers (the store predates them) append.
      if (exists(spark, s"$stage/emb_centers")) {
        val ctrs = spark.read.parquet(s"$stage/emb_centers")
          .orderBy("cell").collect().map(_.getSeq[Double](1).toArray)
        IvfIndex.buildFromCenters(embStaged, embStore(root), ctrs,
          idCol = "doc_id", vecCol = "embedding")
      } else if (embReady(spark, embStore(root)))
        IvfIndex.append(embStaged, embStore(root),
          idCol = "doc_id", vecCol = "embedding")
      // no centers staged and no store: the day had no vectors — the
      // first day WITH vectors builds
    }
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
    * drives twice. Returns (text survivors, media survivors). The
    * returned frames still reference the day's internal caches — this
    * form leaves them to storage LRU (acceptable for one-shot calls);
    * a LOOPING caller (bench reps, a long-lived dry-run scheduler)
    * should use [[probeDayTracked]] and release them per iteration. */
  def probeDay(spark: SparkSession, dayDocs: DataFrame, dayMedia: DataFrame,
      benchDocs: DataFrame, root: String,
      benchBloom: Option[org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter]] = None,
      dayEmb: Option[DataFrame] = None,
      cfg: IngestConfig = IngestConfig()): (DataFrame, DataFrame) = {
    // a locally built bloom here lives until session end (one-shot
    // contract — like the caches, acceptable once, not in a loop)
    val bloom = benchBloom.getOrElse(
      TextQueries.benchContaminationBloom(benchDocs, fpp = 1e-4))
    val (txt, med, _) = probeDayTracked(spark, dayDocs, dayMedia,
      root, bloom, dayEmb, cfg)
    (txt, med)
  }

  /** [[probeDay]] exposing the day's internal caches (the
    * `estPairsTracked` pattern): a looping caller captures
    * [[rddIds]] BEFORE the call, materializes the survivor frames,
    * then calls [[sweepCaches]] with the returned refs so bench reps /
    * daily dry-runs hold steady-state storage flat instead of
    * accumulating day-sized entries under storage LRU (the tracked
    * refs alone under-release: the probe paths pin operator-internal
    * caches too — see [[sweepCaches]]). */
  private[graft] def probeDayTracked(spark: SparkSession, dayDocs: DataFrame,
      dayMedia: DataFrame, root: String,
      benchBloom: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter],
      dayEmb: Option[DataFrame] = None,
      cfg: IngestConfig = IngestConfig())
      : (DataFrame, DataFrame, Seq[DataFrame]) = {
    // the bench bloom is REQUIRED here, not built on demand: this is
    // the looping-caller API, and a per-iteration broadcast that only
    // the callee knows about cannot be destroyed by the caller — the
    // exact accumulation ingestDay's finally-destroy closes. The loop
    // owns one bloom for its lifetime and destroys it when done.
    requireNoPendingTakedown(spark, root)
    val f = processDay(spark, dayDocs, dayMedia, dayEmb, benchBloom, root, cfg)
    (f.textSurvivors, f.mediaSurvivors, f.caches)
  }

  /** Ingest days `0 until nDays` (ledger-idempotent; see
    * [[IngestConfig]] for the sizing contracts). `emb`, when given, is
    * (doc_id, embedding, day) — the day's vectors feed the semantic
    * stage and append to the served index. */
  def run(spark: SparkSession, docs: DataFrame, media: DataFrame,
      benchDocs: DataFrame, root: String, nDays: Int,
      cfg: IngestConfig = IngestConfig(),
      emb: Option[DataFrame] = None): Seq[DayCounts] = {
    // ALL-days short-circuit: when every day already holds its final
    // ledger marker, each ingestDay call would return its recorded
    // counts without touching docs or stores — so building the bench
    // bloom first (an O(bench) shingle aggregation) would be pure
    // waste. Per-day semantics unchanged: ingestDay's own marker check
    // stays the authority; this only hoists the all-done case above
    // the bloom build.
    if (allDaysIngested(spark, root, nDays))
      return (0 until nDays).map(i => readCounts(spark, marker(root, i)))
    // ONE bench bloom for the whole run — the eval suite is frozen, so
    // re-shingling it per day would be O(bench) wasted work per day
    val benchBloom = TextQueries.benchContaminationBloom(benchDocs, fpp = 1e-4)
    try (0 until nDays).map { i =>
      ingestDay(spark, docs.where(col("day") === i),
        media.where(col("day") === i), benchDocs, root, i, cfg,
        benchBloom = Some(benchBloom),
        dayEmb = emb.map(_.where(col("day") === i).drop("day")))
    } finally benchBloom.destroy()
  }

  /** The keystone's maintenance check — [[IvfIndex.rebuildAdvice]]
    * over the root's embedding store (None while no store exists, so a
    * daily driver can call it unconditionally after each day). Act
    * BETWEEN days with `IvfIndex.rebuild(embStore(root),
    * advice.suggestedNlist)`: a rebuild landing between days re-routes
    * the next probe seamlessly under the bumped generation, while one
    * landing inside a day fails loudly (the `pipeline_ingest_rebuild`
    * gate proves the daily-equivalence contract survives the
    * mid-history migration). */
  def maintenanceAdvice(spark: SparkSession, root: String,
      targetPostingsPerCell: Long = 1L << 20, driftWindow: Int = 7,
      driftedFracBar: Double = 0.5): Option[IvfIndex.RebuildAdvice] =
    if (!embReady(spark, embStore(root))) None
    else Some(IvfIndex.rebuildAdvice(spark, embStore(root),
      targetPostingsPerCell, driftWindow, driftedFracBar))

  /** What [[maintenancePlan]] returns: both raw advices plus the
    * combined verdict. `reason` joins the firing triggers with `+`
    * (e.g. "drift+hotspot_localized"), "none" when quiet; `act` callers
    * answer with `IvfIndex.rebuild(embStore(root), plan.suggestedNlist)`
    * BETWEEN days. */
  final case class MaintenancePlan(rebuild: IvfIndex.RebuildAdvice,
      hotspot: IvfIndex.SplitAdvice, act: Boolean, suggestedNlist: Int,
      reason: String)

  /** The keystone's FULL maintenance policy — [[maintenanceAdvice]]'s
    * mean-capacity + drift triggers PLUS the per-cell hotspot census
    * ([[IvfIndex.splitAdvice]]): a skewed surge that piles one semantic
    * region into a few cells never moves the MEAN, so the capacity
    * trigger stays silent while the per-day probe cost over those cells
    * grows unbounded — the hotspot census is the signal that sees it.
    *
    * Every hotspot verdict actuates through [[IvfIndex.rebuild]], NEVER
    * [[IvfIndex.splitCells]]: a split's routing is only locally nearest
    * (documented at splitCells), which breaks the keystone's bit-level
    * home ≡ nearest batch twin — while a retrained quantizer allocates
    * multiple centers to the dense region naturally AND preserves the
    * twin (the `pipeline_ingest_rebuild` contract). Localized overflow
    * suggests at least 2× the current nlist (a same-size retrain can
    * leave a tight dense blob under one center — the geometry needs
    * spare resolution to spend on it); widespread overflow sizes nlist
    * to the per-cell budget. When drift/capacity ALSO fire, one rebuild
    * serves all triggers at the max of their suggestions.
    *
    * Cost discipline unchanged: three scalars, one bounded log tail,
    * one footer-only per-cell census — safe after every day at any
    * corpus size. None while no store exists. */
  def maintenancePlan(spark: SparkSession, root: String,
      targetPostingsPerCell: Long = 1L << 20, driftWindow: Int = 7,
      driftedFracBar: Double = 0.5, maxPostingsPerCell: Long = 1L << 21,
      maxHotFrac: Double = 0.25): Option[MaintenancePlan] =
    if (!embReady(spark, embStore(root))) None
    else {
      val dir = embStore(root)
      val reb = IvfIndex.rebuildAdvice(spark, dir, targetPostingsPerCell,
        driftWindow, driftedFracBar)
      val hot = IvfIndex.splitAdvice(spark, dir, maxPostingsPerCell, maxHotFrac)
      val needPow2 = {
        val needed = math.ceil(hot.postings.toDouble / maxPostingsPerCell)
        var p = 1
        while (p < needed && p < (1 << 30)) p <<= 1
        p
      }
      val hotNlist =
        if (hot.recommendSplit || hot.recommendRebuild)
          math.max(2 * reb.nlist, needPow2)
        else 0
      val act = reb.recommend || hot.recommendSplit || hot.recommendRebuild
      val suggested = math.max(reb.nlist, math.max(
        if (reb.recommend) reb.suggestedNlist else 0, hotNlist))
      val reason = Seq(
        if (reb.recommend) Some(reb.reason) else None,
        if (hot.recommendSplit) Some("hotspot_localized") else None,
        if (hot.recommendRebuild) Some("hotspot_widespread") else None)
        .flatten match {
        case Nil => "none"
        case rs  => rs.mkString("+")
      }
      Some(MaintenancePlan(reb, hot, act, suggested, reason))
    }

  /** RIGHT-TO-BE-FORGOTTEN across the keystone: remove the given
    * documents and media assets from every place the daily loop put
    * them — all five frozen-history stores AND the per-day survivor
    * outputs/shards — so the content stops being served AND stops
    * suppressing its own look-alikes (a victim's re-crawl or re-encode
    * must become NOVEL again; takedown that leaves the stores knowing
    * the content is not a takedown).
    *
    * Per store:
    *  - MinHash bands / signatures / IVF postings: targeted deletes
    *    ([[MinHashBandStore.deleteDocs]],
    *    [[SignatureStore.deleteSignatures]],
    *    [[IvfIndex.deleteVectors]]) — only victim-holding partitions
    *    rewritten, checked swaps throughout.
    *  - The content-key store ([[keyStore]]) is rebuilt from the lake
    *    minus the victims under the bloom's recorded key mode —
    *    deterministic overwrite, idempotent on retry.
    *  - The two BLOOMS cannot delete (insert-only sketches), so they
    *    are REBUILT from the caller's raw data lake minus the victims,
    *    under each store's RECORDED commitments
    *    ([[NoveltyBloomStore.readParams]]: key mode, fpp, capacity)
    *    and the SAME key derivations the ingest stages used. The
    *    rebuilt content bloom keys the order-free batch form of the
    *    stage-0 survivor set; it can additionally hold keys of pages a
    *    historical bloom FALSE POSITIVE dropped at fetch time — a
    *    superset in the conservative direction (seen content stays
    *    seen; only MORE future duplicates shed, never fewer).
    *  - Survivor outputs: victim rows leave every day's textOut /
    *    mediaOut via [[graft.io.Layout.deleteRows]] (only
    *    victim-holding day partitions rewritten), and every affected
    *    day's media BYTE shards are re-packed from the surviving
    *    payloads — the assembled streams physically contained the
    *    victim bytes, so row-level deletion alone would be takedown
    *    theater.
    *  - Drop logs: the audit rows ([[dropLogOut]]) record victim ids
    *    and verdicts — they are forgotten the same way (victim-holding
    *    day partitions only; roots ingested without an audit log skip).
    *
    * TRANSITIVE closure (`transitive = true`, the default): under the
    * SEEN-vs-KEPT discipline every shed duplicate/near-dup of a victim
    * is itself recorded (band rows, postings, signatures, content
    * keys), so deleting only the enumerated ids would leave the stores
    * recognizing the victim's CONTENT through its recorded copies — a
    * victim's re-crawl would stay suppressed, contradicting the
    * contract above. [[expandVictims]] therefore widens the victim set
    * ONE HOP by each store's own decision function (exact content-key
    * equality; est-Jaccard band match; one-sided semantic match;
    * store-parity perceptual match) before any deletion — one hop is
    * exactly the set a re-crawl of the victim's content could match,
    * because every decision function evaluates the re-crawl against
    * single stored rows, never against chains. Callers that truly
    * enumerate every copy themselves can pass `transitive = false`.
    *
    * IDEMPOTENCE, two-phase (the ingest ledger's discipline): phase 1
    * STAGES the expanded victim set to
    * `_ledger/takedown_<id>.victims` (tmp+rename marker) BEFORE any
    * mutation — the expansion reads the stores the mutating phase
    * rewrites, so a retry that recomputed it mid-way would expand
    * against half-forgotten stores and rebuild the blooms WITH the
    * shed copies' keys. Phase 2 (store deletes, bloom rebuilds, row
    * deletes, shard re-packs) runs from the staged set and converges
    * on retry (deletes of deleted rows no-op, rebuilds/re-packs
    * overwrite deterministically); the COMPLETION marker
    * (`_ledger/takedown_<id>`, tmp+rename) lands last — a missing
    * marker after a crash means re-run with the same arguments, a
    * present one short-circuits. `takedownId` names the operation;
    * the caller owns its uniqueness per distinct victim set.
    *
    * `docs`/`media` are the SAME full concatenated frames the ingest
    * run consumed (the raw data lake: day + url + text / payloads —
    * BOTH frames must carry `day`: the shard re-pack scope is derived
    * from the lake, not from the delete's return, so a crash-retry
    * still re-packs days whose victim rows an earlier attempt already
    * deleted). Ledger markers
    * are ingest-time records and deliberately keep their original
    * counts (they answer "what did day N see/keep at ingest", not a
    * post-takedown census). */
  def takedown(spark: SparkSession, root: String, docs: DataFrame,
      media: DataFrame, victimDocIds: DataFrame, victimMediaIds: DataFrame,
      cfg: IngestConfig = IngestConfig(), takedownId: String = "takedown",
      transitive: Boolean = true): Unit = {
    val (mPath, mFs) = fs(spark, s"$root/_ledger/takedown_$takedownId")
    if (mFs.exists(mPath)) return
    val vDocs0 = victimDocIds
      .select(col(victimDocIds.columns.head).cast("long").as("doc_id"))
    val vMedia0 = victimMediaIds
      .select(col(victimMediaIds.columns.head).cast("long").as("media_id"))
    // TWO-PHASE, the ingest ledger's discipline: the transitive
    // expansion reads the stores this operation is about to mutate, so
    // a crash-retry that recomputed it mid-way would expand against
    // half-forgotten stores (finding nothing) and rebuild the blooms
    // WITH the shed twins' keys — the re-run would silently regress the
    // first run's contract. Phase 1 stages the expanded victim set
    // (before any mutation) under a tmp+rename marker; every retry
    // reuses the staged set, so the mutating phase is idempotent
    // against the SAME victims.
    val stageDir = s"$root/_ledger/takedown_$takedownId.victims"
    val stagedMarker = s"$stageDir/.staged"
    val longField = (n: String) => org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.LongType)))
    val (vDocs, vMedia) =
      if (exists(spark, stagedMarker)) (
        spark.read.schema(longField("doc_id")).parquet(s"$stageDir/docs"),
        spark.read.schema(longField("media_id")).parquet(s"$stageDir/media"))
      else {
        val (vDocsL, vMediaL) =
          if (transitive) expandVictims(spark, root, docs, vDocs0, vMedia0, cfg)
          else (vDocs0, vMedia0)
        // eager materialization ALSO matters here: the expansion plans
        // read the very stores the deletes below rewrite (a lazy frame
        // snapshots its file listing at creation — the third store's
        // delete would re-evaluate a plan whose files the first
        // store's swap already replaced)
        vDocsL.write.mode("overwrite").parquet(s"$stageDir/docs")
        vMediaL.write.mode("overwrite").parquet(s"$stageDir/media")
        writeMarkerFile(spark, stagedMarker, "staged")
        (spark.read.schema(longField("doc_id")).parquet(s"$stageDir/docs"),
         spark.read.schema(longField("media_id")).parquet(s"$stageDir/media"))
      }
    // targeted store deletes
    if (exists(spark, mhStore(root)))
      MinHashBandStore.deleteDocs(spark, mhStore(root), vDocs)
    if (exists(spark, sigStore(root)))
      SignatureStore.deleteSignatures(spark, sigStore(root), vMedia)
    if (embReady(spark, embStore(root)))
      IvfIndex.deleteVectors(spark, embStore(root), vDocs)
    // bloom rebuilds from the lake minus victims, recorded commitments
    val keptDocs = docs.join(vDocs, Seq("doc_id"), "left_anti")
    val canon = keptDocs.withColumn("curl",
      TextFunctions.canonicalizeUrl(col("url")))
    if (bloomReady(spark, urlStore(root))) {
      val (pc, fpp, cap) = NoveltyBloomStore.readParams(spark, urlStore(root))
      NoveltyBloomStore.build(canon.select("curl").distinct(), urlStore(root),
        textCol = "curl", prefixChars = pc, fpp = fpp, capacity = cap)
    }
    if (bloomReady(spark, textStore(root))) {
      val (pc, fpp, cap) = NoveltyBloomStore.readParams(spark, textStore(root))
      // the order-free batch form of stage 0: global URL keep-first
      // over (day, doc_id) — the content every surviving fetch exposed
      val s0 = canon.withColumn("_rn", row_number().over(
          Window.partitionBy("curl").orderBy("day", "doc_id")))
        .where(col("_rn") === 1).drop("_rn")
        .where(col("text").isNotNull)
      NoveltyBloomStore.build(s0, textStore(root),
        prefixChars = pc, fpp = fpp, capacity = cap)
      // the content-key store forgets the same way the bloom does:
      // rebuilt from the lake minus victims under the RECORDED key
      // mode — its ingest population (every incoming doc with text),
      // not s0's keep-first (the store mirrors what the lake-scan
      // expansion used to read). Overwrite — deterministic on retry.
      if (exists(spark, keyStore(root)))
        keptDocs.where(col("text").isNotNull)
          .select(col("doc_id"), contentKey("text", pc).as("k"))
          .distinct()
          .write.mode("overwrite").parquet(keyStore(root))
    }
    // survivor outputs: only victim-holding day partitions rewritten.
    // AFFECTED DAYS come from the STAGED victim set joined to the lake,
    // NOT from deleteRows' return: the delete's post-hoc semi-join is
    // empty on a crash-retry (rows already gone), and deriving the
    // re-pack scope from it would permanently skip the shard re-packs —
    // victim bytes left in the streams with the completion marker down,
    // exactly the takedown theater phase 2 exists to prevent. The
    // lake-derived set is retry-stable (a superset on days where the
    // victim never survived to the output — the re-pack is idempotent
    // there).
    val affectedTextDays = docs.join(vDocs, Seq("doc_id"), "left_semi")
      .select(col("day").cast("int")).distinct().collect().map(_.getInt(0))
    val affectedMediaDays = media.join(vMedia, Seq("media_id"), "left_semi")
      .select(col("day").cast("int")).distinct().collect().map(_.getInt(0))
    graft.io.Layout.deleteRows(spark, s"$root/corpus/text", vDocs,
      "doc_id", "day")
    graft.io.Layout.deleteRows(spark, s"$root/corpus/media", vMedia,
      "media_id", "day")
    // the drop logs record the victims' ids and verdicts — audit rows
    // are part of what a takedown forgets (only victim-holding day
    // partitions rewritten; roots without an audit log skip)
    if (exists(spark, s"$root/corpus/drop_log"))
      graft.io.Layout.deleteRows(spark, s"$root/corpus/drop_log", vDocs,
        "doc_id", "day")
    if (exists(spark, s"$root/corpus/media_drop_log"))
      graft.io.Layout.deleteRows(spark, s"$root/corpus/media_drop_log", vMedia,
        "media_id", "day")
    // A day whose EVERY row was a victim must stay READABLE empty, not
    // vanish: deleteRows removes an all-victim partition outright (a
    // zero-row partitionBy stages nothing), and an empty frame's plain
    // write can emit zero data files — either way a later schema-
    // inferring read of that day (training loaders, the driver gates)
    // dies on "path does not exist" / "unable to infer schema" instead
    // of seeing an empty day. writeReadable pins one schema-bearing
    // file (repartition(1) forces one write task even at zero rows);
    // restoreDay re-creates a removed day directory the same way.
    def writeReadable(df: DataFrame, empty: Boolean, path: String): Unit =
      (if (empty) df.repartition(1) else df)
        .write.mode("overwrite").parquet(path)
    def restoreDay(path: String, ddl: String): Unit =
      if (!exists(spark, path))
        writeReadable(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(ddl)),
          empty = true, path)
    // re-pack the affected days' TEXT byte shards: the assembled
    // streams physically contain victim text, so the row deletion
    // above alone would be takedown theater — same reasoning as media.
    affectedTextDays.foreach { day =>
      restoreDay(textOut(root, day), "doc_id bigint, source string, n_bpe int")
      if (exists(spark, s"$root/corpus/drop_log"))
        restoreDay(dropLogOut(root, day), "doc_id bigint, reason string")
      val texts = readDayOrEmpty(spark, textOut(root, day),
          "doc_id bigint, source string, n_bpe int")
        .join(docs.select("doc_id", "text"), Seq("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val dayEmpty = texts.isEmpty
        writeReadable(
          graft.ops.Corpus.shardTextIndex(texts, partitionKey = col("source"),
              order = col("doc_id"), weight = col("n_bpe"), text = col("text"),
              budget = cfg.shardBudgetBpe)
            .select(col("doc_id"), col("source"), col("shard"),
              col("offset"), col("nchars")),
          dayEmpty, textIndexOut(root, day))
        writeReadable(
          graft.ops.Corpus.assembleTextShards(texts, partitionKey = col("source"),
            order = col("doc_id"), weight = col("n_bpe"), text = col("text"),
            budget = cfg.shardBudgetBpe),
          dayEmpty, textShardOut(root, day))
      } finally texts.unpersist()
    }
    // re-pack the affected days' media byte shards from surviving payloads
    affectedMediaDays.foreach { day =>
      restoreDay(mediaOut(root, day), "media_id bigint, kind string")
      if (exists(spark, s"$root/corpus/media_drop_log"))
        restoreDay(mediaDropLogOut(root, day), "media_id bigint, reason string")
      val surviving = readDayOrEmpty(spark, mediaOut(root, day),
        "media_id bigint, kind string").select("media_id")
      val payloads = media.join(surviving, Seq("media_id"), "left_semi")
        .select(col("media_id"), col("kind"), col("content"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val dayEmpty = payloads.isEmpty
        writeReadable(Multimodal.shardIndex(payloads, cfg.mediaShardBudgetBytes),
          dayEmpty, mediaIndexOut(root, day))
        writeReadable(Multimodal.assembleShards(payloads, cfg.mediaShardBudgetBytes),
          dayEmpty, mediaShardOut(root, day))
      } finally payloads.unpersist()
    }
    // completion marker LAST — its absence after a crash means the
    // takedown must be re-run (each step above is idempotent against
    // the STAGED victim set); the staging survives for post-hoc audit
    writeMarkerFile(spark, s"$root/_ledger/takedown_$takedownId",
      s"docs=${vDocs.count()},media=${vMedia.count()}")
  }

  /** Widen a victim set ONE HOP by each store's own decision function —
    * the transitive closure [[takedown]] needs so the stores stop
    * recognizing the victims' CONTENT, not merely their ids (see the
    * takedown scaladoc). Reads recorded FEATURES from the stores
    * themselves wherever they exist (band rows + signatures for
    * near-dup; postings vectors for semantic; signature rows for
    * perceptual; the persisted [[keyStore]] for exact-content-key
    * equality, which the insert-only bloom alone could not answer).
    * Each probe is the store's own bounded candidate join (banded
    * buckets / probed cells / sentinel-indexed sims / key equi-join),
    * never victims × corpus; the pre-key-store LAKE SCAN survives only
    * as the fallback for roots ingested before the store existed. */
  private[graft] def expandVictims(spark: SparkSession, root: String,
      docs: DataFrame, vDocs: DataFrame, vMedia: DataFrame,
      cfg: IngestConfig): (DataFrame, DataFrame) = {
    // exact: every doc sharing a victim's content key. The persisted
    // key store makes this O(victims · store) — two narrow equi-joins
    // on the key, no text reads, no hashing; the lake scan survives
    // only as the fallback for roots ingested before the store existed
    val exactPartners =
      if (exists(spark, keyStore(root))) {
        val ks = spark.read.parquet(keyStore(root)).distinct() // retried-append dups
        val vKeys = ks.join(vDocs, Seq("doc_id"), "left_semi")
          .select("k").distinct()
        ks.join(vKeys, Seq("k")).select("doc_id")
      } else {
        val keyed = docs.where(col("text").isNotNull)
          .select(col("doc_id"), contentKey("text", cfg.prefixChars).as("_k"))
        val vKeys = keyed.join(vDocs, Seq("doc_id"), "left_semi")
          .select("_k").distinct()
        keyed.join(vKeys, Seq("_k")).select("doc_id")
      }
    // near-dup: partners by the band store's est-Jaccard decision,
    // from STORED sigs/bands only
    val mhPartners =
      if (exists(spark, mhStore(root)))
        MinHashBandStore.matchedPairsFromStore(spark, mhStore(root), vDocs)
          .select(col("hist_id").as("doc_id"))
      else vDocs.limit(0)
    // semantic: partners by the index's one-sided rule, victim vectors
    // read from the postings themselves
    val semPartners =
      if (embReady(spark, embStore(root))) {
        val centers = IvfIndex.loadCenters(spark, embStore(root))
        val vVecs = spark.read
          .parquet(s"${embStore(root)}/postings.parquet")
          .join(vDocs.select(col("doc_id").as("id")), Seq("id"), "left_semi")
          .select(col("id").as("doc_id"), col("v").as("embedding"))
        IvfIndex.matchedPairsFromAssigned(
            IvfIndex.assignCells(vVecs, centers, "doc_id", "embedding",
              cfg.semNprobe),
            embStore(root), cfg.semThreshold)
          .select(col("hist_id").as("doc_id"))
      } else vDocs.limit(0)
    // perceptual: partners by the signature store's own per-kind
    // budgets, victim signature rows read from the store
    val sigPartners =
      if (exists(spark, sigStore(root)))
        SignatureStore.matchedPairsFromStore(spark, sigStore(root), vMedia)
          .select(col("hist_id").as("media_id"))
      else vMedia.limit(0)
    (vDocs.unionByName(exactPartners).unionByName(mhPartners)
       .unionByName(semPartners).distinct(),
     vMedia.unionByName(sigPartners).distinct())
  }

  /** Read a per-day output directory, or a schema'd EMPTY frame when
    * the directory is absent or file-less — the state
    * [[graft.io.Layout.deleteRows]] leaves behind when a day's every
    * row was a victim (the partition is deleted, not emptied). */
  private def readDayOrEmpty(spark: SparkSession, path: String,
      ddl: String): DataFrame = {
    val (p, f) = fs(spark, path)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    if (f.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Tmp+rename marker write (the [[writeCounts]] discipline) for
    * markers that carry no DayCounts payload. */
  private def writeMarkerFile(spark: SparkSession, markerPath: String,
      content: String): Unit = {
    val (p, f) = fs(spark, markerPath)
    graft.io.Layout.writeFileAtomic(f, p, content,
      tmpTag = spark.sparkContext.applicationId)
  }

  /** Ledger markers are written tmp+rename (the
    * [[NoveltyBloomStore]] writeStore pattern): marker existence
    * implies a COMPLETE record — a crash mid-write leaves only a tmp
    * file no reader consults, never a truncated marker that
    * short-circuits the day and then fails (or silently corrupts) the
    * counts read. */
  private def writeCounts(spark: SparkSession, markerPath: String,
      c: DayCounts): Unit =
    writeMarkerFile(spark, markerPath,
      Seq(c.day, c.incoming, c.urlKept, c.exactKept, c.cleanKept,
        c.textKept, c.mediaIncoming, c.mediaQualityKept, c.mediaKept,
        c.textShards, c.mediaShards).mkString(","))

  /** A completed day's recorded [[DayCounts]] — the ledger is the
    * count-of-record, and the audit gate ties the drop log's algebra to
    * it (urlKept = incoming − url drops, …). */
  private[graft] def dayCounts(spark: SparkSession, root: String,
      day: Int): DayCounts =
    readCounts(spark, marker(root, day))

  private def readCounts(spark: SparkSession, markerPath: String): DayCounts = {
    val (p, f) = fs(spark, markerPath)
    val in = f.open(p)
    val line = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val v = line.trim.split(",").map(_.toLong)
    // the marker field count IS the ledger format version: a root whose
    // days completed under a different field set is a different-format
    // ledger — finish it with the version that started it (or start a
    // new root); silently defaulting missing counts would misreport
    require(v.length == 11,
      s"ledger marker $markerPath has ${v.length} fields, this version " +
        s"writes 11 — a root begun under another version must be finished " +
        s"by it, or re-ingested into a fresh root: '$line'")
    DayCounts(v(0).toInt, v(1), v(2), v(3), v(4), v(5), v(6), v(7), v(8),
      v(9), v(10))
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
    val emb = graft.ops.OpsQueries.dailyEmb(spark, dir, nDays)
    val bench = graft.ops.OpsQueries.dailyBench(spark, dir)
    val t0 = System.nanoTime()
    val days = run(spark, docs, media, bench, root, nDays, emb = Some(emb))
    val secs = (System.nanoTime() - t0) / 1e9
    val perDay = days.map(c =>
      s"""{"day":${c.day},"in":${c.incoming},"url":${c.urlKept},"exact":${c.exactKept},"clean":${c.cleanKept},"text":${c.textKept},"mediaIn":${c.mediaIncoming},"mediaQ":${c.mediaQualityKept},"media":${c.mediaKept},"shards":${c.textShards},"mediaShards":${c.mediaShards}}""")
      .mkString("[", ",", "]")
    println(f"""{"workload":"daily_ingest","dir":"$dir","days":$perDay,"sec":$secs%.1f}""")
    spark.stop()
  }
}
