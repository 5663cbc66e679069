package graft.multimodal

import graft.{Gate, Q}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal query surface over the REAL codec ([[Codec]]). Metadata
  * queries stay DuckDB-oracled (all metadata are closed-form in doc_id);
  * the perceptual queries are gated on planted twins built by real lossy
  * transforms — JPEG re-encode, bilinear upscale, trim + gain — i.e. the
  * perturbations perceptual hashing/fingerprinting exist to survive. */
object MultimodalQueries {

  /** Feature extraction over the synthetic media table: real payloads →
    * 32 floats in [0,1] via the codec, streamed lazily per partition.
    * Byte-level → rows-only check + shape gates. Exploded to scalar
    * (media_id, kind, pos, feature) rows — the driver's rows-only
    * comparator sorts with pandas, which cannot sort array cells. */
  val features: Q = Q.gated("multimodal_features") { (s, d) =>
    import s.implicits._
    Multimodal.extractFeatures(
        Multimodal.syntheticMedia(s, d).as[MediaItem], dim = 32)
      .toDF()
      .select(col("media_id"), col("kind"),
        posexplode(col("features")).as(Seq("pos", "feature")))
  } { (s, d, res) =>
    // batch-shape contract: every asset decodes (the synthesizer only
    // emits valid payloads) and yields exactly 32 features in [0,1]
    val nAssets = res.select("media_id").distinct().count()
    val expected = s.read.parquet(s"$d/documents.parquet").count()
    val dims = res.groupBy("media_id").agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("mn"), max(col("n")).as("mx")).head
    val fr = res.agg(
      avg(when(col("feature") >= 0.0 && col("feature") <= 1.0, 1.0).otherwise(0.0)))
      .head.getDouble(0)
    Seq(
      Gate("assets_with_features", nAssets.toDouble, nAssets == expected),
      Gate("min_dims_per_asset", dims.getLong(0).toDouble, dims.getLong(0) == 32),
      Gate("max_dims_per_asset", dims.getLong(1).toDouble, dims.getLong(1) == 32),
      Gate("frac_feature_in_range", fr, fr == 1.0))
  }

  /** Frame-sampling metadata path: one row per sampled video frame via
    * the REAL container parse, counted per asset. The synthesis pins
    * the container's frame count to the closed-form metadata
    * (n_frames = (doc_id·17)%7+2), so DuckDB can oracle the count of a
    * stride-2 sample without decoding anything — and a parse that
    * dropped or duplicated frames would hash-mismatch. */
  val frameCounts: Q = Q(
    "multimodal_frame_counts",
    """SELECT doc_id AS media_id,
      |  CAST(floor((((doc_id * 17) % 7 + 2) - 1) / 2) + 1 AS BIGINT) AS n_sampled
      |FROM documents WHERE doc_id % 3 = 2""".stripMargin
  ) { (s, d) =>
    Multimodal.sampleFrames(Multimodal.syntheticMedia(s, d), stride = 2)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_sampled"))
  }

  /** Aspect-preserving resize metadata over image assets (the payload is
    * REALLY re-encoded at the new dims — MultimodalSpec decodes the
    * output and checks pixel dims == metadata; the oracle checks the
    * metadata arithmetic). Box 24×24 so both branches run: 16-px assets
    * pass through (scale clamps at 1), larger ones shrink. */
  val resized: Q = Q(
    "multimodal_resize_meta",
    """SELECT doc_id AS media_id,
      |  CAST(floor(w * s) AS INTEGER) AS width,
      |  CAST(floor(h * s) AS INTEGER) AS height
      |FROM (
      |  SELECT doc_id, w, h,
      |    least(24.0 / w, 24.0 / h, 1.0) AS s
      |  FROM (SELECT doc_id,
      |          (doc_id * 37) % 48 + 16 AS w,
      |          (doc_id * 53) % 40 + 16 AS h
      |        FROM documents WHERE doc_id % 3 = 0))""".stripMargin
  ) { (s, d) =>
    Multimodal.resize(Multimodal.syntheticMedia(s, d), 24, 24)
      .where(col("kind") === "image")
      .select(col("media_id"), col("width"), col("height"))
  }

  /** Twin id offsets: re-encode twins (+10M), resized image twins
    * (+20M) — far above any fixture media_id so twins never collide
    * with base assets, and recoverable by subtraction. */
  private val ReencodeOffset = 10000000L
  private val ResizeOffset = 20000000L

  /** Base id of any asset (twin/fresh ids map back to the asset whose
    * content SEED they carry — fresh assets at +30M keep their own
    * offset id as the seed key, matching [[noveltyIncoming]]'s
    * seed = media_id·1000003 derivation being unrelated to any base). */
  private def baseId(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c >= 30000000L, c) // fresh: own content, no base twin
      .when(c >= ResizeOffset, c - ResizeOffset)
      .when(c >= ReencodeOffset, c - ReencodeOffset)
      .otherwise(c)

  /** Kind-aware lossy re-encode — the realistic "same content,
    * different bytes" transform per modality:
    *  - image: JPEG re-encode at quality 0.75 (pHash's home turf);
    *  - video: every container frame JPEG-re-encoded at 0.8;
    *  - audio: stride-aligned trim (drop the first 256-sample window)
    *    PLUS a 0.97 gain — exercising both the position-independence
    *    and the gain-invariance of the fingerprint. */
  private[graft] val reencode = udf { (kind: String, content: Array[Byte]) =>
    kind match {
      case "image" =>
        Codec.decodeImage(content)
          .map(i => Codec.encodeJpeg(i, 0.75f)).getOrElse(content)
      case "video" =>
        Codec.encodeFrames(Codec.decodeFrames(content).map(f =>
          Codec.decodeImage(f).map(i => Codec.encodeJpeg(i, 0.8f)).getOrElse(f)))
      case _ =>
        Codec.decodeWavSamples(content).map { samples =>
          Codec.encodeWav(
            samples.drop(256).map(v => (v * 0.97).toShort), 16000)
        }.getOrElse(content)
    }
  }

  /** 1.5× bilinear upscale, PNG re-encoded — the resize twin. */
  private val upscale = udf { (content: Array[Byte]) =>
    Codec.decodeImage(content).map { img =>
      Codec.encodePng(Codec.scaleTo(img,
        img.getWidth * 3 / 2, img.getHeight * 3 / 2))
    }.getOrElse(content)
  }

  /** Base media plus planted perceptual near-dups: every asset with
    * media_id % 7 == 3 gets a lossy re-encoded twin (+10M), and every
    * IMAGE with media_id % 7 == 5 additionally a 1.5×-upscaled twin
    * (+20M). Deterministic — same fixture ⇒ same planted set, so the
    * gates can enumerate the truth. */
  def mediaWithPlantedNearDups(s: SparkSession, d: String): DataFrame = {
    val base = Multimodal.syntheticMedia(s, d)
    val twins = base.where(pmod(col("media_id"), lit(7)) === 3)
      .withColumn("media_id", col("media_id") + lit(ReencodeOffset))
      .withColumn("content", reencode(col("kind"), col("content")))
      .withColumn("mime",
        when(col("kind") === "image", lit("image/jpeg")).otherwise(col("mime")))
    val resizedTwins = base
      .where(col("kind") === "image" && pmod(col("media_id"), lit(7)) === 5)
      .withColumn("media_id", col("media_id") + lit(ResizeOffset))
      .withColumn("content", upscale(col("content")))
      .withColumn("width", expr("cast(width * 3 / 2 as int)"))
      .withColumn("height", expr("cast(height * 3 / 2 as int)"))
    base.unionByName(twins).unionByName(resizedTwins)
  }

  /** Content seed per BASE asset (first md5(text) chunk): two assets
    * share payload content iff they share a seed, which is the exact
    * ground truth the false-positive gates verify against — a reported
    * pair must be a planted twin pair or a duplicate-text pair. */
  private def seedTable(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id").as("base_id"), md5(col("text")).as("seed"))

  /** Pairs in `res` (media_a, media_b) whose BASE assets carry different
    * content seeds — perceptual false positives by construction. TOTAL:
    * an id that resolves to no seed (e.g. a fresh +30M asset, whose
    * content is unrelated to every base) counts as a mismatch rather
    * than silently dropping out of an inner join. */
  private def falsePositives(s: SparkSession, d: String, res: DataFrame): Long = {
    val seeds = seedTable(s, d)
    res
      .withColumn("ba", baseId(col("media_a")))
      .withColumn("bb", baseId(col("media_b")))
      .join(seeds.select(col("base_id").as("ba"), col("seed").as("seed_a")), Seq("ba"), "left")
      .join(seeds.select(col("base_id").as("bb"), col("seed").as("seed_b")), Seq("bb"), "left")
      .where(col("seed_a").isNull || col("seed_b").isNull ||
        col("seed_a") =!= col("seed_b"))
      .count()
  }

  private def recallOf(res: DataFrame, planted: DataFrame): (Long, Double) = {
    val n = planted.count()
    val hit = res.join(planted, Seq("media_a", "media_b"), "left_semi").count()
    (n, if (n == 0) 1.0 else hit.toDouble / n)
  }

  /** Perceptual-hash near-dup dedup over REAL image payloads, gated on
    * both planted twin families: the JPEG re-encode and the 1.5×
    * upscale must each be recalled at ≥ 0.95 (these are exactly the
    * perturbations the 64-bit DCT pHash is designed to survive — a
    * miss means either the hash or the banding join broke), and every
    * reported pair must share a content seed (planted twin or
    * duplicate-text asset) — zero perceptual false positives. */
  val phashDedup: Q = Q.gated("multimodal_phash_dedup") { (s, d) =>
    Multimodal.phashPairs(mediaWithPlantedNearDups(s, d), maxHamming = 7)
  } { (s, d, res) =>
    val imageIds = Multimodal.syntheticMedia(s, d)
      .where(col("kind") === "image").select(col("media_id"))
    val jpeg = imageIds.where(pmod(col("media_id"), lit(7)) === 3)
      .select(col("media_id").as("media_a"),
        (col("media_id") + ReencodeOffset).as("media_b"))
    val up = imageIds.where(pmod(col("media_id"), lit(7)) === 5)
      .select(col("media_id").as("media_a"),
        (col("media_id") + ResizeOffset).as("media_b"))
    val (nJpeg, jpegRecall) = recallOf(res, jpeg)
    val (nUp, upRecall) = recallOf(res, up)
    val fp = falsePositives(s, d, res)
    Seq(
      Gate("planted_jpeg_twins", nJpeg.toDouble, nJpeg > 0),
      Gate("recall_jpeg_reencode", jpegRecall, jpegRecall >= 0.95),
      Gate("planted_resize_twins", nUp.toDouble, nUp > 0),
      Gate("recall_resized", upRecall, upRecall >= 0.95),
      Gate("false_positive_pairs", fp.toDouble, fp == 0))
  }

  /** Video-level near-dup over REAL sampled-frame pHash signatures,
    * gated on the planted twins that are videos (frame-wise JPEG
    * re-encodes): every twin must be found — each re-encoded frame
    * pHashes within the per-frame Hamming budget of its original, so
    * the containment match_frac reaches the 0.8 floor — with zero
    * different-seed pairs. */
  val videoNearDup: Q = Q.gated("multimodal_video_neardup") { (s, d) =>
    Multimodal.videoNearDupPairs(mediaWithPlantedNearDups(s, d))
  } { (s, d, res) =>
    val planted = Multimodal.syntheticMedia(s, d)
      .where(col("kind") === "video" && pmod(col("media_id"), lit(7)) === 3)
      .select(col("media_id").as("media_a"),
        (col("media_id") + ReencodeOffset).as("media_b"))
    val (nPlanted, recall) = recallOf(res, planted)
    val fp = falsePositives(s, d, res)
    Seq(
      Gate("planted_video_twins", nPlanted.toDouble, nPlanted > 0),
      Gate("recall_vs_planted_neardups", recall, recall >= 0.95),
      Gate("false_positive_pairs", fp.toDouble, fp == 0))
  }

  /** Audio-level near-dup over REAL decoded sample streams, gated on
    * the planted trim+gain twins: the sub-band fingerprint is
    * gain-invariant and the overlap join position-independent, so every
    * twin must be found (its window set is a gain-scaled suffix of the
    * original's); zero different-seed pairs. */
  val audioNearDup: Q = Q.gated("multimodal_audio_neardup") { (s, d) =>
    Multimodal.audioNearDupPairs(mediaWithPlantedNearDups(s, d))
  } { (s, d, res) =>
    val planted = Multimodal.syntheticMedia(s, d)
      .where(col("kind") === "audio" && pmod(col("media_id"), lit(7)) === 3)
      .select(col("media_id").as("media_a"),
        (col("media_id") + ReencodeOffset).as("media_b"))
    val (nPlanted, recall) = recallOf(res, planted)
    val fp = falsePositives(s, d, res)
    Seq(
      Gate("planted_audio_twins", nPlanted.toDouble, nPlanted > 0),
      Gate("recall_vs_planted_neardups", recall, recall >= 0.95),
      Gate("false_positive_pairs", fp.toDouble, fp == 0))
  }

  private val FreshOffset = 30000000L

  /** Incoming feed for the novelty filter: every planted twin (all
    * kinds — the image ones are known near-dups of history, the
    * audio/video ones probe the image-scoped pass-through) plus
    * genuinely FRESH images (unrelated seeds, +30M ids). */
  def noveltyIncoming(s: SparkSession, d: String): DataFrame = {
    val twins = mediaWithPlantedNearDups(s, d)
      .where(col("media_id") >= ReencodeOffset)
    val freshUdf = udf { (seed: Long, w: Int, h: Int) =>
      Codec.synthImageBytes(seed, w, h)
    }
    val fresh = Multimodal.syntheticMedia(s, d)
      .where(col("kind") === "image" && pmod(col("media_id"), lit(7)) === 1)
      .withColumn("media_id", col("media_id") + lit(FreshOffset))
      .withColumn("content",
        freshUdf(col("media_id") * 1000003L, col("width"), col("height")))
    twins.unionByName(fresh)
  }

  /** Frozen-history perceptual novelty
    * ([[Multimodal.perceptualNoveltyBatch]]): history = the base media,
    * incoming = [[noveltyIncoming]]. Gates: every IMAGE twin
    * (JPEG-re-encode or resize of a history asset) is shed, every fresh
    * image survives, non-image rows pass through untouched, and the
    * STREAMING form's broadcast banded index
    * ([[graft.streaming.MediaStream]]) produces the identical survivor
    * set — the two implementations of the same contract may not diverge
    * on a single asset. */
  val phashNovelty: Q = Q.gated("multimodal_phash_novelty") { (s, d) =>
    // cached: perceptualNoveltyBatch consumes incoming three times
    // (signature builder, verify payload join, survivors barrier) and
    // incoming carries the re-encode/synthesis UDFs — one
    // materialization feeds all three (r20; unmanaged cache)
    Multimodal.perceptualNoveltyBatch(
        noveltyIncoming(s, d).cache(), Multimodal.syntheticMedia(s, d))
      .select(col("media_id"), col("kind"))
  } { (s, d, res) =>
    val incoming = noveltyIncoming(s, d)
    val imageTwinsLeaked = res.where(col("kind") === "image" &&
      col("media_id") >= ReencodeOffset && col("media_id") < FreshOffset).count()
    val freshTotal = incoming.where(col("media_id") >= FreshOffset).count()
    val freshKept = res.where(col("media_id") >= FreshOffset).count()
    val nonImageTotal = incoming.where(col("kind") =!= "image").count()
    val nonImageKept = res.where(col("kind") =!= "image").count()
    val index = graft.streaming.MediaStream.buildHistoryIndex(
      Multimodal.syntheticMedia(s, d), maxHamming = 7)
    val streamForm = graft.streaming.MediaStream
      .perceptualNovelty(incoming, index).select("media_id")
    val diff = res.select("media_id").exceptAll(streamForm).count() +
      streamForm.exceptAll(res.select("media_id")).count()
    Seq(
      Gate("image_twins_leaked", imageTwinsLeaked.toDouble, imageTwinsLeaked == 0),
      Gate("fresh_total", freshTotal.toDouble, freshTotal > 0),
      Gate("fresh_dropped", (freshTotal - freshKept).toDouble,
        freshKept == freshTotal),
      Gate("non_image_passthrough_diff", (nonImageTotal - nonImageKept).toDouble,
        nonImageKept == nonImageTotal && nonImageTotal > 0),
      Gate("index_vs_join_form_diff", diff.toDouble, diff == 0))
  }

  /** Incoming feed with FRESH assets of ALL kinds (not just images):
    * every planted twin plus a fresh asset per base asset with
    * media_id % 7 == 1, re-synthesized per kind from an unrelated seed
    * (+30M ids) — the truth set for the all-kind store novelty gates:
    * twins of history assets must shed, fresh assets of every kind must
    * survive. */
  def noveltyIncomingAllKinds(s: SparkSession, d: String): DataFrame = {
    val twins = mediaWithPlantedNearDups(s, d)
      .where(col("media_id") >= ReencodeOffset)
    val freshUdf = udf { (kind: String, seed: Long, w: Int, h: Int, nf: Int) =>
      kind match {
        case "image" => Codec.synthImageBytes(seed, w, h)
        case "audio" => Codec.synthWavBytes(seed, nf, 16000)
        case _       => Codec.synthVideoBytes(seed, nf)
      }
    }
    val fresh = Multimodal.syntheticMedia(s, d)
      .where(pmod(col("media_id"), lit(7)) === 1)
      .withColumn("media_id", col("media_id") + lit(FreshOffset))
      .withColumn("content", freshUdf(col("kind"), col("media_id") * 1000003L,
        col("width"), col("height"), col("n_frames")))
    twins.unionByName(fresh)
  }

  private def tmpRoot = sys.props.getOrElse("java.io.tmpdir", "/tmp")
  private def storePath(s: SparkSession, d: String, leaf: String) = {
    val tag = (d + "_" + s.sparkContext.applicationId).replaceAll("[^A-Za-z0-9]", "_")
    s"$tmpRoot/graft_sigstore/$tag/$leaf"
  }

  /** Build the store at `dir` from `media` only if absent — the
    * process-scoped reuse the Layout queries also practice: the store
    * is a PERSISTED artifact, so bench min-of-reps measures the
    * STEADY-STATE probe (store exists — the daily shape), with the
    * one-time build paid by the first rep. The app-id in [[storePath]]
    * keeps concurrent processes from sharing a half-built store. */
  private def buildStoreIfAbsent(s: SparkSession, dir: String,
      media: => DataFrame): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) SignatureStore.build(media, dir)
  }

  /** Persistent perceptual-signature store ([[SignatureStore]]): build
    * the (media_id, kind, sig, thumb) parquet from the base corpus —
    * the ONE full decode pass that corpus ever pays — and pin the
    * steady-state contract with gates:
    *
    *  1. `store_vs_decode_form_diff == 0`: image novelty computed
    *     against the STORE is row-identical to the decode-form
    *     [[Multimodal.perceptualNoveltyBatch]] (same thresholds, same
    *     verify function — the two implementations may not diverge on
    *     a single asset).
    *  2. `append_vs_rebuild_drift == 0`: build(80%) + append(20%) ≡
    *     build(100%) as a row set — incremental maintenance loses and
    *     invents nothing.
    *  3. `steady_batch_history_decodes == 0`: running the store-form
    *     novelty batch decodes ONLY incoming payloads — measured with
    *     [[Codec.decodeCalls]] against the incoming-only signature
    *     extraction as the budget. History payloads are untouched (the
    *     store has no payload column); this is the 100 TB property the
    *     store exists for.
    *  4. `kind_partitions == 3`: the store is partitioned by kind, so
    *     kind-scoped probes partition-prune at the scan.
    *
    * Result rows: per-asset signature census (media_id, kind, n_sigs).
    */
  val signatureStore: Q = Q.gated("multimodal_signature_store") { (s, d) =>
    val dir = storePath(s, d, "store_census")
    buildStoreIfAbsent(s, dir, Multimodal.syntheticMedia(s, d))
    SignatureStore.load(s, dir)
      .groupBy(col("media_id"), col("kind"))
      .agg(countDistinct(col("sig")).as("n_sigs"))
  } { (s, d, res) =>
    val history = Multimodal.syntheticMedia(s, d)
    val incoming = noveltyIncoming(s, d)
    val dir = storePath(s, d, "store_census")
    val store = SignatureStore.load(s, dir)
    // 1. store form ≡ decode form on images
    val storeForm = SignatureStore.noveltyAgainstStore(incoming, store)
      .where(col("kind") === "image").select("media_id")
    val decodeForm = Multimodal.perceptualNoveltyBatch(incoming, history)
      .where(col("kind") === "image").select("media_id")
    val formDiff = storeForm.exceptAll(decodeForm).count() +
      decodeForm.exceptAll(storeForm).count()
    // 2. incremental append ≡ full rebuild (row-set equality)
    val dirInc = storePath(s, d, "store_incr")
    SignatureStore.build(history.where(pmod(col("media_id"), lit(5)) < 4), dirInc)
    SignatureStore.append(history.where(pmod(col("media_id"), lit(5)) === 4), dirInc)
    val incr = SignatureStore.load(s, dirInc)
    val cols = Seq("media_id", "kind", "sig", "thumb").map(col)
    val drift = incr.select(cols: _*).exceptAll(store.select(cols: _*)).count() +
      store.select(cols: _*).exceptAll(incr.select(cols: _*)).count()
    // 3. steady-state batch decodes nothing beyond the incoming side
    //    (decodeCalls is JVM-global; Verify runs gates sequentially)
    Codec.decodeCalls.reset()
    SignatureStore.signatures(incoming).count()
    val incomingOnly = Codec.decodeCalls.sum()
    Codec.decodeCalls.reset()
    SignatureStore.noveltyAgainstStore(incoming, store).count()
    val steady = Codec.decodeCalls.sum()
    // 4. kind partition directories
    val kinds = new java.io.File(dir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("kind="))
    // 5. maintenance: a RETRIED append (duplicate rows + extra files)
    //    is fully repaired by compact — files shrink, exact duplicates
    //    collapse, and the novelty decision for every incoming asset is
    //    unchanged (the store equals the clean rebuild again)
    SignatureStore.append(history.where(pmod(col("media_id"), lit(5)) === 4), dirInc)
    val filesBefore = graft.io.Layout.partitionFileCounts(s, dirInc, "kind")
    val compacted = SignatureStore.compact(s, dirInc)
    val filesAfter = graft.io.Layout.partitionFileCounts(s, dirInc, "kind")
    val shrunk = compacted.nonEmpty &&
      compacted.forall(k => filesAfter.getOrElse(k, 99) <= filesBefore(k)) &&
      filesAfter.values.max == 1
    val compactedStore = SignatureStore.load(s, dirInc)
    val compactDrift = compactedStore.select(cols: _*).exceptAll(store.select(cols: _*)).count() +
      store.select(cols: _*).exceptAll(compactedStore.select(cols: _*)).count()
    // 6. signature takedown: deleting a history asset's signatures
    //    frees its look-alikes — the twin of a deleted image must stop
    //    being suppressed, victims leave the store entirely, and kinds
    //    without victims keep their exact file listing
    val victim = history.where(col("kind") === "image" &&
      pmod(col("media_id"), lit(7)) === 3).select("media_id").limit(1)
    val victimId = victim.head.getLong(0)
    val listingPre = graft.io.Layout.partitionFileListing(s, dirInc, "kind")
    SignatureStore.deleteSignatures(s, dirInc, victim)
    val listingPost = graft.io.Layout.partitionFileListing(s, dirInc, "kind")
    val victimRows = SignatureStore.load(s, dirInc)
      .where(col("media_id") === victimId).count()
    val untouchedChanged = Seq("audio", "video").count(k =>
      listingPre.getOrElse(k, Nil) != listingPost.getOrElse(k, Nil))
    val twinId = victimId + ReencodeOffset
    val twinFreed = SignatureStore.noveltyAgainstStore(
        incoming.where(col("media_id") === twinId),
        SignatureStore.load(s, dirInc)).count()
    Seq(
      Gate("store_vs_decode_form_diff", formDiff.toDouble, formDiff == 0),
      Gate("append_vs_rebuild_drift", drift.toDouble, drift == 0),
      Gate("steady_batch_history_decodes", (steady - incomingOnly).toDouble,
        steady == incomingOnly && incomingOnly > 0),
      Gate("kind_partitions", kinds.toDouble, kinds == 3),
      Gate("compact_repairs_retried_append", compactDrift.toDouble,
        shrunk && compactDrift == 0),
      Gate("takedown_victim_rows_left", victimRows.toDouble, victimRows == 0),
      Gate("takedown_untouched_kinds_changed", untouchedChanged.toDouble,
        untouchedChanged == 0),
      Gate("takedown_frees_lookalike", twinFreed.toDouble, twinFreed == 1))
  }

  /** Frozen-history novelty for AUDIO and VIDEO against the signature
    * store ([[SignatureStore.noveltyAgainstStore]]) — the A/V members
    * of the frozen-history family: video twins (every frame JPEG
    * re-encoded) and audio twins (stride-aligned trim + gain) of
    * history assets must shed via sampled-frame-signature /
    * window-fingerprint CONTAINMENT against the store, while fresh
    * assets of every kind (unrelated seeds) survive. History payloads
    * are never read — only the store's signature rows. */
  val avNovelty: Q = Q.gated("multimodal_av_novelty") { (s, d) =>
    val dir = storePath(s, d, "store_av")
    buildStoreIfAbsent(s, dir, Multimodal.syntheticMedia(s, d))
    // cached: the novelty anti-join evaluates incoming twice (the
    // survivors barrier plus the three per-kind signature builders),
    // and incoming is a synthesis-UDF-heavy plan (JPEG re-encode
    // twins) — one materialization feeds both (r20; unmanaged cache —
    // the jaccardPairs storage-LRU lifetime contract)
    val incoming = noveltyIncomingAllKinds(s, d).cache()
    SignatureStore.noveltyAgainstStore(incoming, SignatureStore.load(s, dir))
      .select(col("media_id"), col("kind"))
  } { (s, d, res) =>
    val incoming = noveltyIncomingAllKinds(s, d)
    def twinsLeaked(kind: String) = res.where(col("kind") === kind &&
      col("media_id") >= ReencodeOffset && col("media_id") < FreshOffset).count()
    def freshTotal(kind: String) = incoming.where(col("kind") === kind &&
      col("media_id") >= FreshOffset).count()
    def freshKept(kind: String) = res.where(col("kind") === kind &&
      col("media_id") >= FreshOffset).count()
    val (aLeak, vLeak, iLeak) =
      (twinsLeaked("audio"), twinsLeaked("video"), twinsLeaked("image"))
    val (aTot, vTot, iTot) =
      (freshTotal("audio"), freshTotal("video"), freshTotal("image"))
    val (aKeep, vKeep, iKeep) =
      (freshKept("audio"), freshKept("video"), freshKept("image"))
    Seq(
      Gate("audio_twins_leaked", aLeak.toDouble, aLeak == 0),
      Gate("video_twins_leaked", vLeak.toDouble, vLeak == 0),
      Gate("image_twins_leaked", iLeak.toDouble, iLeak == 0),
      Gate("fresh_audio_dropped", (aTot - aKeep).toDouble, aTot > 0 && aKeep == aTot),
      Gate("fresh_video_dropped", (vTot - vKeep).toDouble, vTot > 0 && vKeep == vTot),
      Gate("fresh_image_dropped", (iTot - iKeep).toDouble, iTot > 0 && iKeep == iTot))
  }

  /** Benchmark decontamination ([[SignatureStore.matchedAgainstStore]]
    * over a store built from the EVAL SUITE's assets): flag every
    * training asset that perceptually matches a benchmark asset — the
    * media twin of `text_contamination_bloom` (eval-set leakage). The
    * result is the training census (media_id, kind, contaminated);
    * production drops the flagged slice before packing
    * ([[SignatureStore.noveltyAgainstStore]] IS that filter, and
    * [[graft.streaming.MediaStream.startStoreNoveltyQuery]] over the
    * benchmark store is the streaming form — ExtSpec gates stream ≡
    * batch). Gates:
    *
    *  1. ≥95% of planted re-encoded benchmark twins are flagged, per
    *     kind (JPEG re-encode for image/video frames, trim+gain for
    *     audio) — the perceptual recall bar `multimodal_phash_dedup`
    *     pins for the same perturbations: a small tail of re-encodes
    *     genuinely leaves the Hamming/thumb budget (measured at sf0.1:
    *     1 image + 2 videos of ~150/kind), and gate 3 proves both
    *     implementations agree on exactly those;
    *  2. zero content-seed false positives: a flagged ordinary training
    *     asset must share its content seed with some benchmark asset
    *     (the fixture's planted duplicate texts produce byte-identical
    *     payloads across ids — genuine leakage, not error);
    *  3. the broadcast banded-INDEX probe
    *     ([[graft.streaming.MediaStream.buildHistoryIndexFromStore]])
    *     agrees with the distributed store join asset-for-asset on
    *     images — two independent implementations of the contract;
    *  4. full coverage: one census row per training asset. */
  val benchmarkDecontam: Q = Q.gated("multimodal_benchmark_decontam") { (s, d) =>
    val dir = storePath(s, d, "store_bench")
    buildStoreIfAbsent(s, dir, benchCohort(s, d))
    // cached: the census join evaluates training twice (the survivors
    // barrier plus the three per-kind signature builders) over a
    // synthesis-UDF-heavy plan — one materialization feeds both (r20)
    val training = trainingWithBenchLeakage(s, d).cache()
    val flagged = SignatureStore.matchedAgainstStore(
      training, SignatureStore.load(s, dir))
    Multimodal.survivorsBarrier(training, "bench_decontam_in")
      .select(col("media_id"), col("kind"))
      .join(flagged.withColumn("contaminated", lit(true)), Seq("media_id"), "left")
      .withColumn("contaminated", coalesce(col("contaminated"), lit(false)))
  } { (s, d, res) =>
    val dir = storePath(s, d, "store_bench")
    val training = trainingWithBenchLeakage(s, d)
    def twinsMissed(kind: String) = res.where(col("kind") === kind &&
      col("media_id") >= BenchTwinOffset && !col("contaminated")).count()
    def twinsTotal(kind: String) = res.where(col("kind") === kind &&
      col("media_id") >= BenchTwinOffset).count()
    val (iMiss, vMiss, aMiss) =
      (twinsMissed("image"), twinsMissed("video"), twinsMissed("audio"))
    val (iTot, vTot, aTot) =
      (twinsTotal("image"), twinsTotal("video"), twinsTotal("audio"))
    val nTwins = res.where(col("media_id") >= BenchTwinOffset).count()
    // content-seed FP census: flagged ordinary assets must share a seed
    // with the benchmark cohort (identical fixture texts ⇒ identical
    // payloads — genuine leakage)
    val seeds = seedTable(s, d)
    val benchSeeds = seeds.join(
        benchCohort(s, d).select(col("media_id").as("base_id")), Seq("base_id"))
      .select("seed").distinct()
    val fp = res.where(col("contaminated") && col("media_id") < BenchTwinOffset)
      .select(col("media_id").as("base_id"))
      .join(seeds, Seq("base_id"), "left")
      .join(benchSeeds, Seq("seed"), "left_anti")
      .count()
    // image parity: broadcast banded index vs distributed store join
    val index = graft.streaming.MediaStream.buildHistoryIndexFromStore(
      SignatureStore.load(s, dir))
    val trainImages = training.where(col("kind") === "image")
    val indexClean = graft.streaming.MediaStream
      .perceptualNovelty(trainImages, index).select("media_id")
    val storeClean = res.where(col("kind") === "image" && !col("contaminated"))
      .select("media_id")
    val formDiff = indexClean.exceptAll(storeClean).count() +
      storeClean.exceptAll(indexClean).count()
    val nTraining = training.count()
    val nRows = res.count()
    Seq(
      Gate("bench_twins_total", nTwins.toDouble, nTwins > 10),
      Gate("image_twins_missed_frac",
        if (iTot == 0) 1.0 else iMiss.toDouble / iTot,
        iTot > 0 && iMiss * 20 <= iTot),
      Gate("video_twins_missed_frac",
        if (vTot == 0) 1.0 else vMiss.toDouble / vTot,
        vTot > 0 && vMiss * 20 <= vTot),
      Gate("audio_twins_missed_frac",
        if (aTot == 0) 1.0 else aMiss.toDouble / aTot,
        aTot > 0 && aMiss * 20 <= aTot),
      Gate("seed_false_positives", fp.toDouble, fp == 0),
      Gate("index_vs_store_form_diff", formDiff.toDouble, formDiff == 0),
      Gate("rows_vs_training", nRows.toDouble, nRows == nTraining))
  }

  private val BlankOffset = 40000000L

  /** Base media plus planted BLANK images (constant mid-gray PNGs, +40M
    * ids) — the known-low-information truth set for the quality gate. */
  def mediaWithPlantedBlanks(s: SparkSession, d: String): DataFrame = {
    val blankUdf = udf { (w: Int, h: Int) =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = img.createGraphics()
      try { g.setColor(new java.awt.Color(128, 128, 128)); g.fillRect(0, 0, w, h) }
      finally g.dispose()
      Codec.encodePng(img)
    }
    val base = Multimodal.syntheticMedia(s, d)
    val blanks = base.where(col("kind") === "image" && pmod(col("media_id"), lit(7)) === 2)
      .withColumn("media_id", col("media_id") + lit(BlankOffset))
      .withColumn("content", blankUdf(col("width"), col("height")))
    base.unionByName(blanks)
  }

  /** Image quality statistics ([[Multimodal.imageQualityStats]]) over
    * base images + planted blanks. Gates: every planted blank is
    * flagged low-information (σ ≈ 0, edge ≈ 0), at most 5% of the real
    * sinusoid-field images are flagged (their measured σ is 20–35,
    * edge 8–20 — far above the floors), every stat is finite, and every
    * decodable image emits exactly one row. */
  val imageQuality: Q = Q.gated("multimodal_image_quality") { (s, d) =>
    Multimodal.imageQualityStats(mediaWithPlantedBlanks(s, d))
  } { (s, d, res) =>
    val blanksFlagged = res.where(col("media_id") >= BlankOffset)
    val nBlank = blanksFlagged.count()
    val blankUnflagged = blanksFlagged.where(!col("low_information")).count()
    val realTotal = res.where(col("media_id") < BlankOffset).count()
    val realFlagged = res.where(col("media_id") < BlankOffset &&
      col("low_information")).count()
    val nonFinite = res.where(
      isnan(col("mean_luma")) || isnan(col("std_luma")) ||
        isnan(col("edge_energy")) || isnan(col("aspect"))).count()
    val expected = Multimodal.syntheticMedia(s, d)
      .where(col("kind") === "image").count()
    Seq(
      Gate("planted_blanks", nBlank.toDouble, nBlank > 0),
      Gate("blanks_not_flagged", blankUnflagged.toDouble, blankUnflagged == 0),
      Gate("real_images_flagged_frac",
        if (realTotal == 0) 1.0 else realFlagged.toDouble / realTotal,
        realTotal > 0 && realFlagged.toDouble / realTotal <= 0.05),
      Gate("non_finite_stats", nonFinite.toDouble, nonFinite == 0),
      Gate("rows_vs_base_images", realTotal.toDouble, realTotal == expected))
  }

  private val SilentOffset = 50000000L
  private val ClippedOffset = 60000000L
  private val BlackVideoOffset = 70000000L
  private val StaticVideoOffset = 80000000L
  private[graft] val BenchTwinOffset = 90000000L

  /** The stand-in evaluation suite for benchmark decontamination: every
    * base asset (all kinds) with media_id % 11 == 5. */
  private def benchCohort(s: SparkSession, d: String): DataFrame =
    Multimodal.syntheticMedia(s, d).where(pmod(col("media_id"), lit(11)) === 5)

  /** Training corpus with planted EVAL-SET LEAKAGE: the non-benchmark
    * base assets plus a lossy re-encoded twin of every benchmark asset
    * (+90M ids) — the asset a crawler picks up when a benchmark image
    * circulates on the web re-encoded (the ImageNet-val-in-LAION
    * problem). The re-encode is the same per-kind transform the near-dup
    * gates use, so a flag miss means the decontamination path broke, not
    * the perturbation model. */
  def trainingWithBenchLeakage(s: SparkSession, d: String): DataFrame = {
    val base = Multimodal.syntheticMedia(s, d)
    val leaked = benchCohort(s, d)
      .withColumn("media_id", col("media_id") + lit(BenchTwinOffset))
      .withColumn("content", reencode(col("kind"), col("content")))
      .withColumn("mime",
        when(col("kind") === "image", lit("image/jpeg")).otherwise(col("mime")))
    base.where(pmod(col("media_id"), lit(11)) =!= 5).unionByName(leaked)
  }

  /** Base media plus planted DEGENERATE audio/video — the known truth
    * sets for the A/V quality gates, mirroring [[mediaWithPlantedBlanks]]:
    * near-silent clips (mic-hiss noise at ≤0.15% of full scale, +50M
    * ids), hard-clipped clips (full-scale square wave, +60M), black
    * videos (true-black frames, +70M), and static videos (one real
    * frame repeated, +80M). */
  def mediaWithPlantedAvDegenerates(s: SparkSession, d: String): DataFrame = {
    val silentUdf = udf { (n: Int, sr: Int, seed: Long) =>
      var x = seed
      val samples = Array.tabulate[Short](n) { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        (((x >>> 48) % 101).toInt - 50).toShort
      }
      Codec.encodeWav(samples, sr)
    }
    val clippedUdf = udf { (n: Int, sr: Int) =>
      val samples = Array.tabulate[Short](n)(i =>
        if ((i / 8) % 2 == 0) 32767 else -32768)
      Codec.encodeWav(samples, sr)
    }
    val blackUdf = udf { (nf: Int) =>
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY) // raster defaults to 0
      val png = Codec.encodePng(img)
      Codec.encodeFrames(Seq.fill(nf)(png))
    }
    val staticUdf = udf { (nf: Int, seed: Long) =>
      val png = Codec.encodePng(Codec.synthImage(seed, 32, 32))
      Codec.encodeFrames(Seq.fill(nf)(png))
    }
    val base = Multimodal.syntheticMedia(s, d)
    val silent = base.where(col("kind") === "audio" && pmod(col("media_id"), lit(7)) === 3)
      .withColumn("media_id", col("media_id") + lit(SilentOffset))
      .withColumn("content",
        silentUdf(col("n_frames"), col("sample_rate"), col("media_id")))
    val clipped = base.where(col("kind") === "audio" && pmod(col("media_id"), lit(7)) === 4)
      .withColumn("media_id", col("media_id") + lit(ClippedOffset))
      .withColumn("content", clippedUdf(col("n_frames"), col("sample_rate")))
    val black = base.where(col("kind") === "video" && pmod(col("media_id"), lit(7)) === 3)
      .withColumn("media_id", col("media_id") + lit(BlackVideoOffset))
      .withColumn("content", blackUdf(col("n_frames")))
    val staticV = base.where(col("kind") === "video" && pmod(col("media_id"), lit(7)) === 4)
      .withColumn("media_id", col("media_id") + lit(StaticVideoOffset))
      .withColumn("content", staticUdf(col("n_frames"), col("media_id") * 7919L))
    base.unionByName(silent).unionByName(clipped)
      .unionByName(black).unionByName(staticV)
  }

  /** Audio quality statistics ([[Multimodal.audioQualityStats]]) over
    * base clips + planted degenerates. Gates: every planted near-silent
    * clip is flagged low-information (silence ≈ 1, rms ≈ 0), every
    * planted hard-clipped clip is flagged with clipping_rate far above
    * the threshold, at most 5% of the real chirp-mix clips are flagged
    * (measured rms ≈ 0.2, silence 1–4%, clipping 0), every stat is
    * finite, and every decodable base clip emits exactly one row. */
  val audioQuality: Q = Q.gated("multimodal_audio_quality") { (s, d) =>
    Multimodal.audioQualityStats(mediaWithPlantedAvDegenerates(s, d))
  } { (s, d, res) =>
    val silent = res.where(col("media_id") >= SilentOffset &&
      col("media_id") < ClippedOffset)
    val clipped = res.where(col("media_id") >= ClippedOffset &&
      col("media_id") < BlackVideoOffset)
    val nSilent = silent.count()
    val silentUnflagged = silent.where(!col("low_information")).count()
    val nClipped = clipped.count()
    val clippedBad = clipped.where(!col("low_information") ||
      col("clipping_rate") <= 0.3).count()
    val real = res.where(col("media_id") < ReencodeOffset)
    val realTotal = real.count()
    val realFlagged = real.where(col("low_information")).count()
    val nonFinite = res.where(isnan(col("silence_fraction")) ||
      isnan(col("clipping_rate")) || isnan(col("rms"))).count()
    val expected = Multimodal.syntheticMedia(s, d)
      .where(col("kind") === "audio").count()
    Seq(
      Gate("planted_silent", nSilent.toDouble, nSilent > 0),
      Gate("silent_not_flagged", silentUnflagged.toDouble, silentUnflagged == 0),
      Gate("planted_clipped", nClipped.toDouble, nClipped > 0),
      Gate("clipped_not_flagged_or_low_rate", clippedBad.toDouble, clippedBad == 0),
      Gate("real_clips_flagged_frac",
        if (realTotal == 0) 1.0 else realFlagged.toDouble / realTotal,
        realTotal > 0 && realFlagged.toDouble / realTotal <= 0.05),
      Gate("non_finite_stats", nonFinite.toDouble, nonFinite == 0),
      Gate("rows_vs_base_audio", realTotal.toDouble, realTotal == expected))
  }

  /** Video quality statistics ([[Multimodal.videoQualityStats]]) over
    * base clips + planted degenerates. Gates: every planted black video
    * and every planted static video is flagged (and the static ones
    * score static_frame_fraction exactly 1.0 — identical frames), at
    * most 5% of the real drifting-field clips are flagged (consecutive
    * frames measure MAE ≈ 4–9, mean luma ≈ 128), and every decodable
    * base clip emits exactly one row. */
  val videoQuality: Q = Q.gated("multimodal_video_quality") { (s, d) =>
    Multimodal.videoQualityStats(mediaWithPlantedAvDegenerates(s, d))
  } { (s, d, res) =>
    val black = res.where(col("media_id") >= BlackVideoOffset &&
      col("media_id") < StaticVideoOffset)
    val staticV = res.where(col("media_id") >= StaticVideoOffset)
    val nBlack = black.count()
    val blackUnflagged = black.where(!col("low_information")).count()
    val nStatic = staticV.count()
    val staticBad = staticV.where(!col("low_information") ||
      col("static_frame_fraction") < 1.0).count()
    val real = res.where(col("media_id") < ReencodeOffset)
    val realTotal = real.count()
    val realFlagged = real.where(col("low_information")).count()
    val expected = Multimodal.syntheticMedia(s, d)
      .where(col("kind") === "video").count()
    Seq(
      Gate("planted_black", nBlack.toDouble, nBlack > 0),
      Gate("black_not_flagged", blackUnflagged.toDouble, blackUnflagged == 0),
      Gate("planted_static", nStatic.toDouble, nStatic > 0),
      Gate("static_not_flagged_or_partial", staticBad.toDouble, staticBad == 0),
      Gate("real_clips_flagged_frac",
        if (realTotal == 0) 1.0 else realFlagged.toDouble / realTotal,
        realTotal > 0 && realFlagged.toDouble / realTotal <= 0.05),
      Gate("rows_vs_base_video", realTotal.toDouble, realTotal == expected))
  }

  /** WebDataset-style media shard packing — pure REUSE of
    * [[graft.ops.Corpus.packShards]] with payload BYTES as the weight:
    * per kind, assets in deterministic media_id order pack into
    * contiguous ~budget-byte shards (an asset straddling a boundary
    * belongs to the shard where its prefix sum started — whole assets,
    * never split). Gates pin the packing contract: complete coverage
    * (every asset sharded exactly once), per-shard fill ≤ budget +
    * max-single-asset (the straddle rule's worst case), shards
    * contiguous per kind (ids 0..max with no gaps), and determinism
    * (two runs identical). */
  val shardPack: Q = Q.gated("multimodal_shard_pack") { (s, d) =>
    val budget = 64L * 1024
    graft.ops.Corpus.packShards(
        Multimodal.syntheticMedia(s, d)
          .select(col("media_id"), col("kind"), length(col("content")).as("nbytes")),
        col("kind"), col("media_id"), col("nbytes").cast("long"), budget)
      .select(col("media_id"), col("kind"), col("nbytes"), col("shard"))
  } { (s, d, res) =>
    val budget = 64L * 1024
    val expected = Multimodal.syntheticMedia(s, d).count()
    val nRows = res.count()
    val dupAssets = res.groupBy("media_id").count().where(col("count") > 1).count()
    val fills = res.groupBy("kind", "shard")
      .agg(sum(col("nbytes")).as("fill"), max(col("nbytes")).as("mx"))
    val overfilled = fills.where(col("fill") > lit(budget) + col("mx")).count()
    val gaps = res.groupBy("kind")
      .agg(countDistinct(col("shard")).as("n"), max(col("shard")).as("mx"))
      .where(col("n") =!= col("mx") + 1).count()
    val rerun = graft.ops.Corpus.packShards(
        Multimodal.syntheticMedia(s, d)
          .select(col("media_id"), col("kind"), length(col("content")).as("nbytes")),
        col("kind"), col("media_id"), col("nbytes").cast("long"), budget)
      .select(col("media_id"), col("kind"), col("nbytes"), col("shard"))
    val drift = res.exceptAll(rerun).count() + rerun.exceptAll(res).count()
    Seq(
      Gate("assets_packed", nRows.toDouble, nRows == expected),
      Gate("assets_packed_twice", dupAssets.toDouble, dupAssets == 0),
      Gate("shards_overfilled", overfilled.toDouble, overfilled == 0),
      Gate("kinds_with_shard_gaps", gaps.toDouble, gaps == 0),
      Gate("rerun_drift_rows", drift.toDouble, drift == 0))
  }

  /** Media shard byte assembly ([[Multimodal.assembleShards]] +
    * [[Multimodal.shardIndex]]) — the media twin of
    * `corpus_shard_texts`: per (kind, shard) concatenated payload
    * stream + per-asset byte coordinates. Gates prove the BYTES, not
    * just the grouping: slicing every asset back out of its shard at
    * its (offset, nbytes) must reproduce the original payload md5
    * byte-exactly (total roundtrip over all assets), stream length ==
    * Σ nbytes, full coverage, and two runs byte-identical. */
  val shardAssembly: Q = Q.gated("multimodal_shard_assembly") { (s, d) =>
    Multimodal.assembleShards(Multimodal.syntheticMedia(s, d), 64L * 1024)
      .select(col("kind"), col("shard"), col("n_assets"), col("shard_nbytes"),
        md5(col("shard_bytes")).as("shard_md5"))
  } { (s, d, res) =>
    val budget = 64L * 1024
    val media = Multimodal.syntheticMedia(s, d)
    val asm = Multimodal.assembleShards(media, budget)
    val idx = Multimodal.shardIndex(media, budget)
    val sliced = idx
      .join(media.select(col("media_id"), md5(col("content")).as("want_md5")), "media_id")
      .join(asm, Seq("kind", "shard"))
      .withColumn("got_md5", md5(expr("substring(shard_bytes, cast(offset + 1 as int), cast(nbytes as int))")))
    val badSlices = sliced.where(col("got_md5") =!= col("want_md5")).count()
    val nAssets = media.count()
    val covered = sliced.count()
    val badLens = asm.where(length(col("shard_bytes")) =!= col("shard_nbytes")).count()
    val rerun = Multimodal.assembleShards(media, budget)
      .select(col("kind"), col("shard"), md5(col("shard_bytes")).as("shard_md5"))
    val drift = res.select("kind", "shard", "shard_md5").exceptAll(rerun).count() +
      rerun.exceptAll(res.select("kind", "shard", "shard_md5")).count()
    Seq(
      Gate("asset_slice_md5_mismatches", badSlices.toDouble, badSlices == 0),
      Gate("assets_covered", covered.toDouble, covered == nAssets),
      Gate("shard_length_mismatches", badLens.toDouble, badLens == 0),
      Gate("rerun_drift_shards", drift.toDouble, drift == 0))
  }

  /** VERIFY-BUDGET ENVELOPE — the perceptual twin of
    * `dedup_minhash_est_envelope`: planted signature pairs AT the
    * budget boundaries where [[SignatureStore.matchedIds]]' verify
    * flips, pinning the decision envelope as a measured contract
    * instead of a scale-sweep surprise (the r16 sf0.1 decontam
    * calibration showed real re-encode twins sample these budget
    * tails). Signature-level by design: the contract under test is the
    * store's DECISION FUNCTION (Hamming candidacy + bit_count verify +
    * thumb-MAE verify + containment fraction), which consumes
    * signature rows — raw pixels cannot place a pair at an exact
    * Hamming distance or an exact MAE, signatures can, to ±1 bit and
    * ±1/64 MAE.
    *
    * Families and their pinned boundaries (store defaults):
    *  - image (maxHamming 7, thumb MAE ≤ 6.0, containment 1.0 over
    *    single sigs): the 3×3 grid hamming {6,7,8} × MAE
    *    {383,384,385}/64 — match iff h ≤ 7 AND MAE ≤ 6.0 exactly; the
    *    AT-budget cell (7, 6.0) MATCHES (budgets are inclusive).
    *  - video (frame hamming 7, frame MAE ≤ 3.0, containment ≥ 0.8):
    *    exact-frame containment {7,8,9}/10 — match iff ≥ 8/10; plus
    *    all-frames-at (7, 192/64=3.0) matches while (7, 193/64) and
    *    (8, 0) do not.
    *  - audio (window hamming 3, containment ≥ 0.9, no thumbs):
    *    hamming-3 window containment {8,9}/10 — match iff ≥ 9/10;
    *    all-windows-at-hamming-4 does not match (candidacy via chunk
    *    agreement survives, the bit_count verify kills it). */
  val budgetEnvelope: Q = Q.gated("multimodal_budget_envelope") { (s, d) =>
    import s.implicits._
    val rnd = new scala.util.Random(421)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // pairwise-far signatures: every planted perturbation (≤ 8 bits at
    // 64-bit, ≤ 4 at 32-bit) stays well clear of every OTHER pool
    // member, so each probe row can only ever match its own base.
    // minSep respects code capacity: 24-of-64 is roomy; 24-of-32 would
    // exceed the Plotkin bound and never terminate — 12-of-32 leaves
    // 12 − (3+4) > 0 margin and random 32-bit words satisfy it readily
    def farSigs(n: Int, bits: Int, minSep: Int): IndexedSeq[Long] = {
      val out = scala.collection.mutable.ArrayBuffer[Long]()
      while (out.length < n) {
        val c =
          if (bits == 64) rnd.nextLong()
          else rnd.nextInt().toLong & 0xffffffffL
        if (out.forall(x => ham(x, c) >= minSep)) out += c
      }
      out.toIndexedSeq
    }
    def flipLow(sig: Long, h: Int): Long = sig ^ ((1L << h) - 1)
    // mid-range thumbs (60..189) so a +6/byte shift can never clip at
    // 255 and change the realized total diff
    def thumbOf(seed: Int): Array[Byte] =
      Array.tabulate(64)(i => (60 + ((seed * 31 + i * 7) % 130)).toByte)
    def thumbShift(t: Array[Byte], total: Int): Array[Byte] = {
      val out = t.clone()
      var left = total
      var i = 0
      while (left > 0) {
        val step = math.min(7, left) // 64·7 = 448 ≥ every planted total
        out(i) = ((out(i) & 0xff) + step).toByte
        left -= step
        i += 1
      }
      out
    }
    // (media_id, sig, thumb) probe rows; store rows add the n_sigs census
    val cases = scala.collection.mutable.ArrayBuffer[(String, String, Long, Int)]()

    // ---------------- image: hamming × MAE grid ----------------------
    val imgGrid = for { h <- Seq(6, 7, 8); dTot <- Seq(383, 384, 385) }
      yield (h, dTot)
    val imgBases = farSigs(imgGrid.length, 64, 24)
    val imgHist = scala.collection.mutable.ArrayBuffer[(Long, Long, Array[Byte], Int)]()
    val imgIn = scala.collection.mutable.ArrayBuffer[(Long, Long, Array[Byte])]()
    imgGrid.zipWithIndex.foreach { case ((h, dTot), k) =>
      val t = thumbOf(k)
      imgHist += ((k.toLong, imgBases(k), t, 1))
      val inId = 1000L + k
      imgIn += ((inId, flipLow(imgBases(k), h), thumbShift(t, dTot)))
      cases += (("image", s"h${h}_d$dTot", inId,
        if (h <= 7 && dTot <= 384) 1 else 0))
    }
    val imgMatched = SignatureStore.matchedIds(
      imgIn.toSeq.toDF("media_id", "sig", "thumb"),
      imgHist.toSeq.toDF("media_id", "sig", "thumb", "n_sigs"),
      maxHamming = 7, bits = 64, minMatchFrac = 1.0, Some(6.0))

    // ---------------- video: containment + per-frame budgets ---------
    val nFrames = 10
    val vidCaseDefs = Seq(
      ("contain7", 7, 0, 0), ("contain8", 8, 0, 0), ("contain9", 9, 0, 0),
      ("frames_h7_d192", nFrames, 7, 192),   // all frames AT both budgets
      ("frames_h7_d193", nFrames, 7, 193),   // MAE one step over
      ("frames_h8_d0", nFrames, 8, 0))       // hamming one bit over
    // ONE pool covering bases and fills: fills are then provably far
    // from every base, not just probabilistically
    val vidPool = farSigs(vidCaseDefs.length * nFrames * 2, 64, 24)
    val vidBases = vidPool.take(vidCaseDefs.length * nFrames)
    val vidFill = vidPool.drop(vidCaseDefs.length * nFrames)
    val vidHist = scala.collection.mutable.ArrayBuffer[(Long, Long, Array[Byte], Int)]()
    val vidIn = scala.collection.mutable.ArrayBuffer[(Long, Long, Array[Byte])]()
    vidCaseDefs.zipWithIndex.foreach { case ((cid, m, h, dTot), k) =>
      val histId = 100L + k
      val inId = 2000L + k
      (0 until nFrames).foreach { fi =>
        val base = vidBases(k * nFrames + fi)
        val t = thumbOf(k * 100 + fi)
        vidHist += ((histId, base, t, nFrames))
        if (fi < m) vidIn += ((inId, flipLow(base, h), thumbShift(t, dTot)))
        else vidIn += ((inId, vidFill(k * nFrames + fi), thumbOf(k * 100 + fi + 50)))
      }
      val frameMatches = h <= 7 && dTot <= 192
      cases += (("video", cid, inId, if (frameMatches && m >= 8) 1 else 0))
    }
    val vidMatched = SignatureStore.matchedIds(
      vidIn.toSeq.toDF("media_id", "sig", "thumb"),
      vidHist.toSeq.toDF("media_id", "sig", "thumb", "n_sigs"),
      maxHamming = 7, bits = 64, minMatchFrac = 0.8, Some(3.0))

    // ---------------- audio: window containment, 32-bit --------------
    val audCaseDefs = Seq(
      ("contain8_h3", 8, 3), ("contain9_h3", 9, 3), ("windows_h4", nFrames, 4))
    val audPool = farSigs(audCaseDefs.length * nFrames * 2, 32, 12)
    val audBases = audPool.take(audCaseDefs.length * nFrames)
    val audFill = audPool.drop(audCaseDefs.length * nFrames)
    val audHist = scala.collection.mutable.ArrayBuffer[(Long, Long, Array[Byte], Int)]()
    val audIn = scala.collection.mutable.ArrayBuffer[(Long, Long, Array[Byte])]()
    audCaseDefs.zipWithIndex.foreach { case ((cid, m, h), k) =>
      val histId = 200L + k
      val inId = 3000L + k
      (0 until nFrames).foreach { fi =>
        val base = audBases(k * nFrames + fi)
        audHist += ((histId, base, null, nFrames))
        if (fi < m) audIn += ((inId, flipLow(base, h), null))
        else audIn += ((inId, audFill(k * nFrames + fi), null))
      }
      cases += (("audio", cid, inId, if (h <= 3 && m >= 9) 1 else 0))
    }
    val audMatched = SignatureStore.matchedIds(
      audIn.toSeq.toDF("media_id", "sig", "thumb"),
      audHist.toSeq.toDF("media_id", "sig", "thumb", "n_sigs"),
      maxHamming = 3, bits = 32, minMatchFrac = 0.9, None)

    val matchedAll = imgMatched.select(col("media_id"), lit("image").as("kind"))
      .unionByName(vidMatched.select(col("media_id"), lit("video").as("kind")))
      .unionByName(audMatched.select(col("media_id"), lit("audio").as("kind")))
    cases.toSeq.toDF("kind", "case_id", "in_id", "expected")
      .join(matchedAll.select(col("kind"), col("media_id").as("in_id"),
        lit(1).as("matched")), Seq("kind", "in_id"), "left")
      .withColumn("matched", coalesce(col("matched"), lit(0)))
      .select("kind", "case_id", "expected", "matched")
      .orderBy("kind", "case_id")
  } { (s, d, res) =>
    val mismatches = res.where(col("matched") =!= col("expected")).count()
    val nCases = res.count()
    val posCases = res.where(col("expected") === 1).count()
    val negCases = res.where(col("expected") === 0).count()
    val atBudgetMatched = res.where(col("case_id").isin("h7_d384",
      "frames_h7_d192", "contain8") && col("matched") === 1).count()
    val oneOverRejected = res.where(col("case_id").isin("h8_d384", "h7_d385",
      "frames_h7_d193", "frames_h8_d0", "contain7", "contain8_h3")
      && col("matched") === 0).count()
    Seq(
      Gate("envelope_mismatches", mismatches.toDouble, mismatches == 0),
      Gate("envelope_cases", nCases.toDouble, nCases == 18),
      Gate("envelope_positive_cases", posCases.toDouble, posCases >= 6),
      Gate("envelope_negative_cases", negCases.toDouble, negCases >= 6),
      Gate("at_budget_all_match", atBudgetMatched.toDouble, atBudgetMatched == 3),
      Gate("one_step_over_all_reject", oneOverRejected.toDouble,
        oneOverRejected == 6))
  }

  def all: Seq[Q] = Seq(features, frameCounts, resized, phashDedup, videoNearDup,
    audioNearDup, phashNovelty, imageQuality, audioQuality, videoQuality,
    shardPack, signatureStore, avNovelty, benchmarkDecontam, shardAssembly,
    budgetEnvelope)
}
