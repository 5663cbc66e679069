package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media asset: opaque binary payload + typed metadata. The payload is
  * NEVER interpreted by Spark itself — all engine-side operations (schema,
  * partitioning, shuffle, batching) treat it as `BINARY`, which is exactly
  * how a 100 TB image/audio corpus should flow: metadata columns are
  * pruned/pushed down independently of the payload, and payload bytes only
  * stream through the executors that actually decode. */
case class MediaItem(
    media_id: Long,
    kind: String,          // "image" | "audio" | "video"
    mime: String,
    width: Int,            // images; video frame dims
    height: Int,
    n_frames: Int,         // video: frame count; audio: samples
    sample_rate: Int,      // audio
    content: Array[Byte])

case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])

case class FrameSample(media_id: Long, frame_index: Int, content: Array[Byte])

/** Multimodal-column operators over the REAL codec boundary ([[Codec]]:
  * JDK ImageIO for PNG/JPEG, javax.sound WAV, a PNG-frame container for
  * video). Everything Spark-side — schemas, lazy per-partition batching,
  * metadata pushdown, payload-free projections, banding joins — is the
  * production shape; every decode tolerates corrupt payloads by skipping
  * the row (a 100 TB crawl always contains some).
  *
  * Scale contract shared by the near-dup family: payload bytes never
  * shuffle. Hashing happens in the scan stage; only (media_id, 64-bit
  * signature) projections enter any join. */
object Multimodal {

  /** See [[graft.PlanGuards.survivorsBarrier]] — shared across the
    * media and text families. */
  private[graft] def survivorsBarrier(df: DataFrame, tag: String): DataFrame =
    graft.PlanGuards.survivorsBarrier(df, tag)

  /** Deterministic synthetic media table with REAL encoded payloads
    * (PNG / WAV / PNG-frame container), derived from the documents
    * fixture: the payload seed is the first 8 bytes of md5(text), so
    * identical texts ⇒ byte-identical media (the fixture's planted
    * duplicate texts become genuine duplicate assets), and all metadata
    * are CLOSED-FORM functions of doc_id — which is what lets DuckDB
    * oracle the metadata queries without decoding anything:
    *
    *  - image (doc_id%3==0): w=(doc_id·37)%48+16, h=(doc_id·53)%40+16
    *  - audio (doc_id%3==1): n_frames = 1024+(doc_id%5)·256 samples @16k
    *  - video (doc_id%3==2): n_frames = (doc_id·17)%7+2 frames of 32×32
    */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    // The fixture's documents table is a single small parquet file, so
    // without an explicit spread every downstream CODEC stage (payload
    // synth, decode, hash) would serialize on 1-2 input splits — a
    // fixture artifact, not a design property: a real media table is
    // many files/splits wide. The seed (md5 of the text) is computed
    // BEFORE the spread so the shuffle carries only (doc_id, seed) —
    // 16 bytes/row, not the corpus text — and all per-row codec work
    // downstream parallelizes across the cluster. Predicate pushdown
    // still reaches the scan (filters push through a Repartition).
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        // seed: first 8 md5(text) bytes — content-derived, engine-free
        conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("_seed"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
    val payload = udf { (kind: String, seed: Long, w: Int, h: Int, nf: Int) =>
      kind match {
        case "image" => Codec.synthImageBytes(seed, w, h)
        case "audio" => Codec.synthWavBytes(seed, nf, 16000)
        case _       => Codec.synthVideoBytes(seed, nf)
      }
    }
    docs.select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        element_at(typedLit(Seq("image/png", "audio/wav", "video/x-graft-frames")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("mime"),
        when(pmod(col("doc_id"), lit(3)) === 0,
            (pmod(col("doc_id") * 37, lit(48)) + 16))
          .when(pmod(col("doc_id"), lit(3)) === 2, lit(32))
          .otherwise(lit(0)).cast("int").as("width"),
        when(pmod(col("doc_id"), lit(3)) === 0,
            (pmod(col("doc_id") * 53, lit(40)) + 16))
          .when(pmod(col("doc_id"), lit(3)) === 2, lit(32))
          .otherwise(lit(0)).cast("int").as("height"),
        when(pmod(col("doc_id"), lit(3)) === 1,
            lit(1024) + pmod(col("doc_id"), lit(5)) * 256)
          .when(pmod(col("doc_id"), lit(3)) === 2,
            pmod(col("doc_id") * 17, lit(7)) + 2)
          .otherwise(lit(1)).cast("int").as("n_frames"),
        when(pmod(col("doc_id"), lit(3)) === 1, lit(16000))
          .otherwise(lit(0)).cast("int").as("sample_rate"),
        col("_seed"))
      .withColumn("content",
        payload(col("kind"), col("_seed"), col("width"), col("height"), col("n_frames")))
      .drop("_seed")
  }

  /** Feature extraction through the real codec: lazy per-partition batch
    * over the typed Dataset — payload bytes stream through the iterator
    * one partition at a time (never collected), the Scala analog of a
    * Pandas-batch UDF. 32 features per asset, all in [0,1]:
    *
    *  - image: per-row means of the 32×32 luma plane / 255;
    *  - video: same, over the first decodable frame;
    *  - audio: 32 linear sub-band energy FRACTIONS of a Hann DFT over
    *    the clip head (they sum to 1 — a gain-free spectral shape).
    *
    * Undecodable payloads are SKIPPED, not errored. */
  def extractFeatures(media: Dataset[MediaItem], dim: Int = 32): Dataset[MediaFeatures] = {
    require(dim == 32, s"feature layout is fixed at 32 dims, got $dim")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val feats: Option[Array[Float]] = m.kind match {
          case "audio" =>
            Codec.decodeWavSamples(m.content).filter(_.length >= 256).map { s =>
              audioBandFractions(s)
            }
          case "video" =>
            Codec.decodeFrames(m.content).iterator
              .flatMap(Codec.decodeImage(_)).take(1).toSeq.headOption
              .map(imageRowMeans)
          case _ => Codec.decodeImage(m.content).map(imageRowMeans)
        }
        feats.map(MediaFeatures(m.media_id, m.kind, _))
      }
    }
  }

  private def imageRowMeans(img: java.awt.image.BufferedImage): Array[Float] = {
    val l = Codec.luma32(img)
    Array.tabulate(32) { y =>
      var s = 0.0
      var x = 0
      while (x < 32) { s += l(y * 32 + x); x += 1 }
      (s / (32 * 255.0)).toFloat
    }
  }

  private def audioBandFractions(samples: Array[Short]): Array[Float] = {
    // largest power-of-two window that fits the clip head (FFT input)
    val window = math.min(1024, Integer.highestOneBit(samples.length))
    val half = window / 2
    val re = new Array[Double](window)
    val im = new Array[Double](window)
    var i = 0
    while (i < window) {
      val hann = 0.5 - 0.5 * math.cos(2 * math.Pi * i / (window - 1))
      re(i) = samples(i) * hann; im(i) = 0.0
      i += 1
    }
    Codec.fft(re, im)
    val bands = new Array[Double](32)
    var k = 1
    while (k < half) {
      bands(math.min(31, (k - 1) * 32 / math.max(1, half - 1))) +=
        re(k) * re(k) + im(k) * im(k)
      k += 1
    }
    val tot = bands.sum + 1e-12
    bands.map(b => (b / tot).toFloat)
  }

  /** Aspect-preserving resize into a bounding box — REAL re-encode:
    * image payloads are decoded, bilinear-rescaled and PNG-re-encoded so
    * the output payload's pixel dimensions EQUAL the metadata (pinned in
    * MultimodalSpec). Non-image rows and undecodable payloads pass
    * through with BOTH payload and metadata untouched — the metadata
    * rewrite is gated on a decode-only decodability check, so a corrupt
    * payload can never exit with scaled metadata attached to unscaled
    * bytes (which would break the metadata==pixel-dims invariant for
    * exactly the corrupt-asset case the codec layer tolerates). */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val isImage = coalesce(col("kind") === "image", lit(false))
    val scale = least(
      lit(maxW.toDouble) / col("width"), lit(maxH.toDouble) / col("height"), lit(1.0))
    // The decode work is FACTORED so Catalyst prunes what a consumer
    // doesn't read (the r12 regression: one struct UDF feeding both
    // metadata and payload made a metadata-only projection pay
    // decode+scale+encode per row — and after projection collapse a
    // deterministic UDF was duplicated into each of its four
    // references, up to 4× that again):
    //
    //  - `dimsUdf` (LIGHT, decode only): establishes decodability — the
    //    corrupt-payload gate for the metadata rewrite. A metadata-only
    //    consumer (e.g. the resize bench query) evaluates just this:
    //    one decode per image, no scale, no encode.
    //  - `rzUdf` (HEAVY, decode+scale+encode): feeds ONLY the content
    //    column, so it prunes away whenever content is unread. A
    //    consumer reading content pays one extra decode (both UDFs
    //    run) — the price of the metadata path staying prunable.
    //
    // The two agree by construction (same decode on the same bytes), so
    // a corrupt payload exits with BOTH bytes and metadata untouched.
    // Both UDFs stay DETERMINISTIC: determinism is what keeps the whole
    // projection pushdown- and pruning-transparent (one scan, filters
    // reach it, unread work drops out), and duplication is prevented
    // structurally — `rzUdf` has exactly ONE reference, and `dimsUdf`
    // feeds downstream only through the `_ok` column, whose multiple
    // references are to the cheap boolean ATTRIBUTE (CollapseProject
    // refuses to inline a non-cheap multiply-referenced alias, so the
    // decode is never copied into its consumers). ExtSpec pins the
    // decode budgets for both consumption shapes with Codec.decodeCalls
    // over a parquet scan, so any optimizer behavior change that broke
    // this reasoning would fail the budget, not ship silently.
    val dimsUdf = udf { (content: Array[Byte]) =>
      Codec.decodeImage(content).map(img => (img.getWidth, img.getHeight))
    }
    val rzUdf = udf { (content: Array[Byte], w: Int, h: Int) =>
      Codec.decodeImage(content).map(img => Codec.encodePng(Codec.scaleTo(img, w, h)))
    }
    val targetW = floor(col("width") * scale).cast("int")
    val targetH = floor(col("height") * scale).cast("int")
    // `when(isImage, …)` gates per row: CaseWhen evaluates branches
    // lazily, so non-image rows never enter either UDF.
    // `_ok` also requires the SOURCE dims to be non-null: a decodable
    // image whose width/height metadata is null would otherwise get its
    // metadata rewritten to null (scale × null = null) while the payload
    // passes through — malformed-metadata rows must exit untouched,
    // exactly like corrupt payloads do (rzUdf already no-ops on them: a
    // null primitive arg short-circuits the UDF to null → coalesce keeps
    // the original bytes). The guard is on the RAW columns, not
    // targetW/targetH: `least` skips nulls, so target-dim nullness is
    // exactly source-dim nullness — and an unconditional targetW
    // reference would hoist the scale DIVISION out of its CaseWhen
    // guards (common-subexpression elimination), re-evaluating it on
    // non-image rows whose dims are legitimately 0 (ANSI div-by-zero).
    media
      .withColumn("_ok", isImage && dimsUdf(when(isImage, col("content"))).isNotNull &&
        col("width").isNotNull && col("height").isNotNull)
      .withColumn("new_width", when(col("_ok"), targetW).otherwise(col("width")))
      .withColumn("new_height", when(col("_ok"), targetH).otherwise(col("height")))
      .withColumn("content",
        when(isImage, coalesce(rzUdf(col("content"), targetW, targetH), col("content")))
          .otherwise(col("content")))
      .drop("width", "height", "_ok")
      .withColumnRenamed("new_width", "width")
      .withColumnRenamed("new_height", "height")
      .select(media.columns.map(col).toIndexedSeq: _*) // original column order
  }

  /** Perceptual near-duplicate pairs over IMAGE payloads — the same
    * two-stage candidacy-then-exact-verify shape as the MinHash-LSH →
    * exact-Jaccard dedup family:
    *
    *  1. CANDIDACY: each asset decodes and pHashes once at the codec
    *     boundary (classic 64-bit DCT pHash, [[Codec.phash64]];
    *     undecodable payloads drop out), and pairs within `maxHamming`
    *     bits surface via the pigeonhole banding join shared with the
    *     text SimHash family ([[graft.ops.Dedup.hammingPairs]],
    *     bits=64) — an equi-join on (chunk_id, chunk_val) carrying
    *     16-byte rows, never an all-pairs compare, never payload bytes.
    *  2. VERIFY: candidates join back to their payloads and the pair is
    *     kept only if the canonical 32×32 luma planes agree to
    *     `maxLumaMae` mean absolute error. pHash compares DCT
    *     coefficient SIGNS, so two structurally-aligned but
    *     visibly-different images can land a few bits apart (measured:
    *     a cross-content fixture pair at Hamming 6 with luma MAE 13.5,
    *     vs ≤ 1.0 for JPEG/resize twins and ≥ 14.8 for unrelated
    *     pairs) — the pixel-level verify is what makes the operator's
    *     positives exact. Decode cost is paid only on candidate pairs,
    *     which are bounded by real near-dup mass.
    *
    * Encode-family note: the hash path ([[Codec.luma32]]) normalizes
    * every payload into a fixed grayscale 32×32 frame, so cross-
    * colorspace re-encodes of the same picture (a grayscale re-encode
    * of a color original) drift ≤2 Hamming bits (pinned in ExtSpec) —
    * comfortably inside the default `maxHamming=7` budget; no
    * per-color-model banding is needed. */
  def phashPairs(media: DataFrame, maxHamming: Int = 7,
      maxLumaMae: Double = 5.0): DataFrame = {
    val images = media.where(col("kind") === "image")
    // one decode per image, guaranteed by the mapPartitions builder
    // (a udf-project + null-skip filter pays the decode twice — see
    // SignatureStore.imageSigRows)
    val sigs = SignatureStore.imageSigRows(media)
      .select(col("media_id").as("id"), col("sig").as("sim"))
    val cands = graft.ops.Dedup.hammingPairs(sigs, maxHamming, bits = 64)
    val mae = udf { (a: Array[Byte], b: Array[Byte]) =>
      (for { ia <- Codec.decodeImage(a); ib <- Codec.decodeImage(b) } yield {
        val la = Codec.luma32(ia); val lb = Codec.luma32(ib)
        var s = 0.0
        var i = 0
        while (i < la.length) { s += math.abs(la(i) - lb(i)); i += 1 }
        s / la.length
      }).getOrElse(Double.MaxValue)
    }
    val payload = images.select(col("media_id"), col("content"))
    cands
      .join(payload.select(col("media_id").as("id_a"), col("content").as("_ca")), "id_a")
      .join(payload.select(col("media_id").as("id_b"), col("content").as("_cb")), "id_b")
      .withColumn("luma_mae", mae(col("_ca"), col("_cb")))
      .where(col("luma_mae") <= maxLumaMae)
      .select(col("id_a").as("media_a"), col("id_b").as("media_b"),
        col("hamming"), col("luma_mae"))
  }

  /** Video-level near-duplicate pairs: per-frame perceptual hashes,
    * aggregated to a per-video signature-set overlap.
    *
    * Pipeline (every stage shuffle-on-key, never all-pairs):
    *
    *  1. [[sampleFrames]] parses each video container and explodes every
    *     `stride`-th REAL frame; each frame decodes and pHashes at the
    *     codec boundary ([[Codec.phash64]]).
    *  2. Frame signatures collapse to DISTINCT (media_id, hash) — a long
    *     static shot contributes ONE signature, so a 2-hour fixed-camera
    *     video doesn't get 170k identical rows into the join (and two
    *     videos sharing a static shot don't blow up quadratically).
    *  3. Candidate frame matches come from the pigeonhole banding
    *     equi-join (64-bit chunks), verified exactly with `bit_count`.
    *     Temporal offsets are free: matching is on signature content,
    *     not frame index, so a re-encode with a trimmed intro matches.
    *  4. Pairs aggregate to matched-signature counts; `match_frac`
    *     divides by least(n_sigs_a, n_sigs_b) — containment semantics
    *     ([[sigOverlapPairs]]). */
  def videoNearDupPairs(media: DataFrame, stride: Int = 2,
      maxFrameHamming: Int = 7, minMatchFrac: Double = 0.8,
      maxThumbMae: Double = 6.0): DataFrame =
    sigOverlapPairs(
      // one decode per sampled frame, guaranteed by the mapPartitions
      // builder (see SignatureStore.videoSigRows)
      SignatureStore.videoSigRows(media, stride)
        .select(col("media_id"), col("sig").as("sim"), col("thumb").as("vfy")),
      maxFrameHamming, minMatchFrac, bits = 64, vfyMae = Some(maxThumbMae))

  /** Audio-level near-duplicate pairs: Haitsma–Kalker-style sub-band
    * fingerprints over the REAL decoded sample stream
    * ([[Codec.audioFingerprints]]: per 256-sample window, 32 sign bits
    * of adjacent-band log-energy differences — gain-invariant, so a
    * volume-scaled re-master fingerprints identically), then the same
    * distinct-signature overlap machinery as video: banding equi-join
    * candidacy (32-bit chunks), exact Hamming verify, containment
    * match-fraction. Stride-aligned trims still match because matching
    * is on signature content, not position. */
  def audioNearDupPairs(media: DataFrame, maxWindowHamming: Int = 3,
      minMatchFrac: Double = 0.9): DataFrame =
    sigOverlapPairs(
      SignatureStore.audioSigRows(media)
        .select(col("media_id"), col("sig").as("sim")),
      maxWindowHamming, minMatchFrac, bits = 32)

  /** Signature-set overlap core shared by the video and audio near-dup
    * paths (steps 2–4 of the pipeline documented on
    * [[videoNearDupPairs]]): distinct per-media signatures, pigeonhole
    * banding candidacy over `bits`-bit signatures (last chunk absorbs
    * the remainder; unsigned shifts), exact bit_count verify,
    * match-fraction aggregation. `match_frac` divides the matched
    * a-side signature count by `least(n_sigs_a, n_sigs_b)` —
    * CONTAINMENT semantics, so a trim of a longer original scores 1.0
    * regardless of which side has the smaller id (an a-side denominator
    * would make the result depend on id ordering, because the pair is
    * canonicalized media_a < media_b). Input: one row per
    * (media_id, sim) occurrence; multiplicity is collapsed here.
    *
    * CACHED (r15 — reversing the r12 "rely on ReuseExchange" call):
    * the distinct signature frame has five consumers (n_sigs census,
    * stop-sim census, distinct-sim candidacy, both ownership sides)
    * and COLUMN PRUNING gives each a differently-pruned subtree below
    * the distinct's exchange — canonically different plans, so
    * ReuseExchange never actually unified them and every pruning
    * group re-ran the decode-bearing builder (measured: 4.7 decodes
    * per sampled frame; the ExtSpec reuse pin matched the string
    * "ReusedExchange" while most consumers recomputed). The cache is
    * the one materialization point pruning cannot split; rows are
    * (media_id, sim[, vfy]) — tiny. Decode budget is now pinned ≤ one
    * per sampled frame in ExtSpec. Cache lifetime note on
    * [[graft.ops.Dedup.jaccardPairs]] applies.
    *
    * HOT-BUCKET SAFETY — what is and is not bounded:
    *
    *  - SIM-level candidacy is bounded: [[graft.ops.Dedup
    *    .nearSimPairsSelf]] runs over DISTINCT sims with its bounded
    *    per-bucket posting latch (`maxBucket`), so a mass of identical
    *    signatures is ONE candidacy row and masses of distinct
    *    near-constant signatures cap at the latch instead of going
    *    O(bucket²). Identical-sim matches pair through a latch-free
    *    exact equi-join (Hamming 0 is never lost to a hot bucket).
    *  - MEDIA-level ownership re-expansion is bounded by `maxSimOwners`
    *    (stop-sim semantics, the media twin of the Jaccard path's
    *    stop-shingle cut): a sim owned by more than `maxSimOwners`
    *    media — solid-black frames, silence windows: exactly the
    *    near-zero-information content that would otherwise expand
    *    C(owners, 2) media pairs of which almost all fall below
    *    `minMatchFrac` — leaves BOTH candidacy paths entirely. The
    *    match-fraction DENOMINATOR keeps counting the dropped sim
    *    (conservative: fractions only shrink, never inflate), so the
    *    documented trade is recall on assets whose overlap is mostly
    *    stop-sims — content that is degenerate by construction. The
    *    cap is the SECOND line of defense: wholly-degenerate assets
    *    (solid-black stills/clips, silent audio) should never reach
    *    candidacy at all — the quality pre-filters
    *    ([[imageQualityStats]], [[audioQualityStats]],
    *    [[videoQualityStats]], unioned by [[lowInformationIds]]) drop
    *    them BEFORE any signature pass, so they cost no decode and no
    *    banding mass (MediaPipelineSpec pins the zero-signature-decode
    *    property; `MediaPipeline` and `examples.DailyIngest` both wire
    *    the filter ahead of the near-dup stages), and the cap's job
    *    reduces to degenerate REGIONS inside otherwise-real content. A
    *    star-on-representative (the [[graft.ops.Dedup.hammingPairs]]
    *    escape hatch) is NOT usable here: match_frac gates pairs
    *    before components form, so starring would silently zero the
    *    matched counts of non-representative owner pairs rather than
    *    merely re-shaping a component. */
  private[graft] def sigOverlapPairs(rawSigs: DataFrame, maxHamming: Int,
      minMatchFrac: Double, bits: Int,
      vfyMae: Option[Double] = None, maxBucket: Int = 4096,
      maxSimOwners: Int = 4096): DataFrame = {
    require(maxHamming >= 1 && maxHamming < 30,
      s"maxHamming in [1,30), got $maxHamming")
    require(bits >= maxHamming + 1 && bits <= 64, s"bits in [maxHamming+1, 64], got $bits")
    require(vfyMae.isEmpty || rawSigs.columns.contains("vfy"),
      "vfyMae verification needs a `vfy` column on the signatures")
    // ONE cached frame feeds every consumer: the distinct signature
    // rows plus the per-sim owner census as a WINDOW column (one
    // exchange on sim over the distinct rows, computed once at cache
    // fill — see the CACHED note above; a separate census aggregate +
    // anti-join measured ~2× this cost from repeated subtrees, and a
    // broadcast cut serialized the whole decode behind the broadcast
    // barrier). approx_count_distinct: exact at small cardinalities,
    // ±rsd near the cap — the cap is a latch, not a contract boundary,
    // and distinct-counting (not row-counting) keeps a sig with many
    // verify-payload variants in ONE asset from tripping it.
    require(maxSimOwners >= 1, s"maxSimOwners >= 1, got $maxSimOwners")
    val sigs = rawSigs.distinct()
      .withColumn("_owners", approx_count_distinct(col("media_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("sim"))))
      .cache()
    // signature count = distinct SIM values (a sig carrying several
    // verify payloads — e.g. drifted frames sharing a pHash — is one
    // signature for the match-fraction denominator; computed over ALL
    // rows, so the stop-sim cut below only ever SHRINKS match_frac)
    val nsigs = sigs.groupBy("media_id").agg(countDistinct("sim").as("n_sigs"))
    val candSigs = sigs.where(col("_owners") <= maxSimOwners).drop("_owners")
    val near = graft.ops.Dedup.nearSimPairsSelf(
      candSigs.select("sim").distinct(), maxHamming, bits, maxBucket)
    // both orders: sim-pair canonicalization (sim_a < sim_b) is
    // independent of the media-pair canonicalization (media_a < media_b)
    val nearBoth = near.unionByName(near.select(
      col("sim_b").as("sim_a"), col("sim_a").as("sim_b"), col("hamming")))
    // optional exact verify on the candidate signature pair: near-budget
    // Hamming collisions DO occur across unrelated content (measured at
    // sf0.1: 17 cross-content video pairs from frame-sig collisions —
    // a drifting clip is a CLUSTER of near-identical signatures, so one
    // colliding frame pair inflates the whole pair's match fraction);
    // the verify payload (8×8 luma thumbnail) must also agree
    val thumbOk = udf { (a: Array[Byte], b: Array[Byte]) => Codec.thumbMae(a, b) }
    val verified = vfyMae match {
      case Some(mae) => thumbOk(col("a.vfy"), col("b.vfy")) <= mae
      case None      => lit(true)
    }
    val identMatches = candSigs.as("a")
      .join(candSigs.as("b"), col("a.sim") === col("b.sim") &&
        col("a.media_id") < col("b.media_id"))
      .where(verified)
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        col("a.sim").as("sim_a"), lit(0).cast("int").as("hamming"))
    val nearMatches = candSigs.as("a")
      .join(nearBoth, col("a.sim") === col("sim_a"))
      .join(candSigs.as("b"), col("b.sim") === col("sim_b") &&
        col("a.media_id") < col("b.media_id"))
      .where(verified)
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        col("a.sim").as("sim_a"), col("hamming"))
    val sigMatches = identMatches.unionByName(nearMatches)
      .distinct() // a sig pair meeting through several buckets surfaces once
    sigMatches
      .groupBy(col("media_a"), col("media_b"))
      .agg(countDistinct(col("sim_a")).as("n_matched"))
      .join(nsigs.select(col("media_id").as("media_a"),
        col("n_sigs").as("n_sigs_a")), "media_a")
      .join(nsigs.select(col("media_id").as("media_b"),
        col("n_sigs").as("n_sigs_b")), "media_b")
      .withColumn("match_frac",
        col("n_matched").cast("double") / least(col("n_sigs_a"), col("n_sigs_b")))
      .where(col("match_frac") >= minMatchFrac)
      .select(col("media_a"), col("media_b"), col("n_matched"),
        col("n_sigs_a"), col("n_sigs_b"), col("match_frac"))
  }

  /** Frozen-history perceptual novelty — the media analog of the docs
    * novelty filter: drop every incoming IMAGE asset that is a
    * perceptual near-dup (pHash Hamming ≤ maxHamming) of ANY history
    * asset; non-image and undecodable rows pass through (novelty is
    * image-scoped, and an unprovable dup must not be dropped). This is
    * the batch/scale form: incoming and history signatures meet in the
    * pigeonhole banding EQUI-join (a near pair must agree on ≥1 of
    * maxHamming+1 disjoint chunks), Hamming-verified with bit_count,
    * then EXACT-verified on candidates only via the compact 8×8 luma
    * thumbnails ([[Codec.thumbMae]]) before matched ids leave via
    * anti-join — history can be any size, the banding join shuffles
    * 16-byte signature rows, and payload decode is paid only on
    * candidate pairs. The streaming twin
    * ([[graft.streaming.MediaStream]]) broadcasts a banded (sig, thumb)
    * index of the same history for a stateless per-row filter using the
    * SAME verify function and threshold; MultimodalSpec gates the two
    * forms identical.
    *
    * ONE-SHOT FORM: this decodes the history payloads inline, which is
    * right for a single ad-hoc pass but wrong as a recurring batch — a
    * daily ingest against a 100 TB corpus must not re-decode the corpus
    * per day. The production steady-state path is
    * [[SignatureStore.noveltyAgainstStore]]: history signatures are
    * extracted once into a persisted parquet store, appended per batch,
    * and the novelty join reads 16–72-byte signature rows instead of
    * payloads (gated equal to this form on images, with a
    * zero-history-decodes pin, in `multimodal_signature_store`). */
  def perceptualNoveltyBatch(incoming: DataFrame, history: DataFrame,
      maxHamming: Int = 7, maxThumbMae: Double = 6.0): DataFrame = {
    require(maxHamming >= 1 && maxHamming < 30,
      s"maxHamming in [1,30), got $maxHamming")
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    def chunked(df: DataFrame, idCol: String): DataFrame =
      SignatureStore.imageSigRows(df) // one decode per image, guaranteed
        .select(col("media_id").as(idCol), col("sig").as("sim"))
        .select(col(idCol), col("sim"),
          explode(sequence(lit(0), lit(chunks - 1))).as("chunk_id"))
        .withColumn("chunk_val",
          graft.ops.Dedup.bandChunkVal("sim", "chunk_id", chunks, bitsPer))
    val candidates = chunked(incoming, "media_id").as("a")
      .join(chunked(history, "hist_id").as("b"), Seq("chunk_id", "chunk_val"))
      .where(bit_count(col("a.sim").bitwiseXOR(col("b.sim"))) <= maxHamming)
      .select(col("media_id"), col("hist_id")).distinct()
    // exact verify on candidates only (the fixture family measures pHash
    // collisions at ~7e-5 per pair — candidacy alone would shed novel
    // assets): both payloads decode to the compact 8×8 luma thumbnail
    // and must agree to maxThumbMae. The SAME Codec.thumbMae runs in the
    // streaming index form, so the two implementations cannot diverge
    // on a borderline pair.
    val thumbPass = udf { (a: Array[Byte], b: Array[Byte]) =>
      (for { ia <- Codec.decodeImage(a); ib <- Codec.decodeImage(b) } yield
        Codec.thumbMae(Codec.lumaThumb8(ia), Codec.lumaThumb8(ib)) <= maxThumbMae
      ).getOrElse(false)
    }
    val matched = candidates
      .join(incoming.select(col("media_id"), col("content").as("_ci")), "media_id")
      .join(history.select(col("media_id").as("hist_id"),
        col("content").as("_ch")), "hist_id")
      .where(thumbPass(col("_ci"), col("_ch")))
      .select(col("media_id")).distinct()
    survivorsBarrier(incoming, "novelty_in")
      .join(matched, Seq("media_id"), "left_anti")
  }

  /** Per-image quality statistics from REAL pixels — the image analog of
    * the text quality heuristics (the LAION-style "filter blank and
    * low-information assets" pass a training-data pipeline runs before
    * paying for captioning/embedding): decode → 32×32 luma →
    *
    *  - `mean_luma` / `std_luma`: exposure and CONTRAST (a blank or
    *    near-constant frame has σ≈0);
    *  - `edge_energy`: mean absolute horizontal+vertical gradient —
    *    structure/sharpness (flat gradients ⇒ no content);
    *  - `aspect`: metadata width/height ratio (extreme aspect ratios are
    *    the classic banner-ad signature);
    *  - `low_information`: σ or edge energy below floors.
    *
    * One narrow projection per asset, no shuffle; undecodable payloads
    * are skipped (they are a different filter's job). Thresholds are
    * parameters; defaults sit far below the fixture family's measured
    * range (σ ≈ 20–35, edge ≈ 8–20) and far above blanks (both ≈ 0). */
  def imageQualityStats(media: DataFrame, minStd: Double = 8.0,
      minEdge: Double = 2.0): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    // typed mapPartitions, one decode per image guaranteed (the former
    // udf-project + null-skip filter paid the decode twice — see
    // SignatureStore.imageSigRows for the mechanism)
    media.where(col("kind") === "image")
      .select(col("media_id").cast("long"), col("width").cast("int"),
        col("height").cast("int"), col("content"))
      .as[(Long, Int, Int, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, w, h, c) =>
        Codec.decodeImage(c).map { img =>
          val l = Codec.luma32(img)
          val n = l.length
          var s = 0.0
          var i = 0
          while (i < n) { s += l(i); i += 1 }
          val mean = s / n
          var v = 0.0
          i = 0
          while (i < n) { val d = l(i) - mean; v += d * d; i += 1 }
          var e = 0.0
          var cnt = 0
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 32) {
              if (x + 1 < 32) { e += math.abs(l(y * 32 + x + 1) - l(y * 32 + x)); cnt += 1 }
              if (y + 1 < 32) { e += math.abs(l((y + 1) * 32 + x) - l(y * 32 + x)); cnt += 1 }
              x += 1
            }
            y += 1
          }
          (id, w, h, mean, math.sqrt(v / n), e / cnt)
        }
      })
      .toDF("media_id", "width", "height", "_mean", "_std", "_edge")
      .select(col("media_id"), col("width"), col("height"),
        round(col("_mean"), 6).as("mean_luma"),
        round(col("_std"), 6).as("std_luma"),
        round(col("_edge"), 6).as("edge_energy"),
        round(col("width").cast("double") / col("height"), 6).as("aspect"))
      .withColumn("low_information",
        col("std_luma") < minStd || col("edge_energy") < minEdge)
  }

  /** Per-clip audio quality statistics from REAL samples — the audio
    * analog of [[imageQualityStats]] (a silence-padded or near-silent
    * clip is the audio family's "blank image": the near-dup banding's
    * own stop-sim documentation assumes low-information content is
    * pre-filtered BEFORE it reaches the perceptual operators and costs
    * their recall):
    *
    *  - `silence_fraction`: fraction of samples with |s| at or below
    *    ~1% of full scale — silence padding / dead air;
    *  - `clipping_rate`: fraction at ≥99% of full scale — hard-clipped
    *    (distorted) masters;
    *  - `rms`: root-mean-square amplitude as a fraction of full scale;
    *  - `low_information`: mostly silent, near-zero energy, or heavily
    *    clipped.
    *
    * One narrow projection per asset (typed mapPartitions, ONE decode
    * per clip — the [[imageQualityStats]] discipline), no shuffle;
    * undecodable payloads are skipped. Defaults sit far from the
    * fixture family's measured range (chirp-mix RMS ≈ 0.2, silence
    * fraction ≈ 1–4%, clipping 0) and far from the degenerate payloads
    * they exist to catch (silent: fraction ≈ 1, rms ≈ 0; clipped:
    * rate ≥ 0.5). */
  def audioQualityStats(media: DataFrame, silenceLevel: Int = 327,
      maxSilenceFraction: Double = 0.9, minRms: Double = 0.01,
      clipLevel: Int = 32440, maxClippingRate: Double = 0.3): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.where(col("kind") === "audio")
      .select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, c) =>
        Codec.decodeWavSamples(c).filter(_.nonEmpty).map { s =>
          val n = s.length
          var silent = 0
          var clipped = 0
          var energy = 0.0
          var i = 0
          while (i < n) {
            val a = math.abs(s(i).toInt)
            if (a <= silenceLevel) silent += 1
            if (a >= clipLevel) clipped += 1
            energy += a.toDouble * a
            i += 1
          }
          (id, n.toLong, silent.toDouble / n, clipped.toDouble / n,
            math.sqrt(energy / n) / 32768.0)
        }
      })
      .toDF("media_id", "n_samples", "_sil", "_clip", "_rms")
      .select(col("media_id"), col("n_samples"),
        round(col("_sil"), 6).as("silence_fraction"),
        round(col("_clip"), 6).as("clipping_rate"),
        round(col("_rms"), 6).as("rms"))
      .withColumn("low_information",
        col("silence_fraction") > maxSilenceFraction ||
          col("rms") < minRms || col("clipping_rate") > maxClippingRate)
  }

  /** Per-clip video quality statistics from REAL decoded frames — the
    * video twin of [[audioQualityStats]] (black leaders and static
    * slideshows are the video family's silence padding):
    *
    *  - `black_frame_fraction`: frames whose mean luma is below
    *    `blackLuma` (true black sits at 0; real content ≈ 128);
    *  - `static_frame_fraction`: consecutive-frame pairs whose mean
    *    absolute luma delta is at most `staticMae` (identical repeated
    *    frames score 0; the fixture's drifting fields measure ≈ 4–9);
    *    a clip too short to have a pair scores 0 — "static" needs
    *    evidence of non-motion, not absence of frames;
    *  - `low_information`: mostly black or mostly static.
    *
    * One pass per clip, every sampled frame decoded exactly once, no
    * shuffle; structurally corrupt containers yield no row. */
  def videoQualityStats(media: DataFrame, blackLuma: Double = 16.0,
      maxBlackFraction: Double = 0.8, staticMae: Double = 1.0,
      maxStaticFraction: Double = 0.8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.where(col("kind") === "video")
      .select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, c) =>
        val lumas = Codec.decodeFrames(c).iterator
          .flatMap(Codec.decodeImage(_)).map(Codec.luma32).toArray
        if (lumas.isEmpty) None
        else {
          val nf = lumas.length
          var black = 0
          lumas.foreach { l =>
            var s = 0.0
            var i = 0
            while (i < l.length) { s += l(i); i += 1 }
            if (s / l.length < blackLuma) black += 1
          }
          var staticPairs = 0
          var i = 1
          while (i < nf) {
            val a = lumas(i - 1)
            val b = lumas(i)
            var d = 0.0
            var j = 0
            while (j < a.length) { d += math.abs(a(j) - b(j)); j += 1 }
            if (d / a.length <= staticMae) staticPairs += 1
            i += 1
          }
          Some((id, nf.toLong, black.toDouble / nf,
            if (nf < 2) 0.0 else staticPairs.toDouble / (nf - 1)))
        }
      })
      .toDF("media_id", "n_frames_decoded", "_black", "_static")
      .select(col("media_id"), col("n_frames_decoded"),
        round(col("_black"), 6).as("black_frame_fraction"),
        round(col("_static"), 6).as("static_frame_fraction"))
      .withColumn("low_information",
        col("black_frame_fraction") >= maxBlackFraction ||
          col("static_frame_fraction") >= maxStaticFraction)
  }

  /** Union of the three per-kind low-information flag sets — THE
    * quality pre-filter definition. It lives here ONCE because every
    * consumer must apply the identical filter: the media pipeline, the
    * daily-ingest incremental path AND its batch-equivalence twin (the
    * gate demands the same filter on both sides), and the spec budgets.
    */
  def lowInformationIds(media: DataFrame): DataFrame =
    imageQualityStats(media)
      .where(col("low_information")).select("media_id")
      .unionByName(audioQualityStats(media)
        .where(col("low_information")).select("media_id"))
      .unionByName(videoQualityStats(media)
        .where(col("low_information")).select("media_id"))

  /** Byte-offset index for media shard packing — the media twin of the
    * text side's shard layout: each asset's (shard, offset, nbytes)
    * coordinates in the per-(kind, shard) concatenated payload stream
    * that [[assembleShards]] emits, i.e. exactly what a WebDataset-style
    * reader needs to fetch one asset out of a packed shard file.
    * Offsets are the running byte sum within (kind, shard) in pack
    * order (media_id). ONE exchange: the pack window hashes on kind,
    * and hash(kind) already satisfies the (kind, shard) offset window's
    * clustering (same subset-clustering reuse as `corpus_shard_texts`);
    * no payload bytes move — the index is metadata-only. */
  def shardIndex(media: DataFrame, budgetBytes: Long): DataFrame = {
    val packed = graft.ops.Corpus.packShards(
      // null payloads pack as ZERO-LENGTH spans (complete coverage,
      // nothing contributed to the stream). coalesce, NOT a
      // null-filter: a `where(content.isNotNull)` predicate pushed
      // below a computed-content projection re-evaluates the producing
      // expression in the Filter — the SCALING.md double-eval pitfall
      // (measured 3.1× on this operator over the synthetic fixture);
      // and a null weight would poison every running sum after it.
      media.select(col("media_id"), col("kind"),
        coalesce(length(col("content")), lit(0)).cast("long").as("nbytes")),
      partitionKey = col("kind"), order = col("media_id"),
      weight = col("nbytes"), budget = budgetBytes)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("kind"), col("shard")).orderBy(col("media_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    packed.withColumn("offset", sum(col("nbytes")).over(w) - col("nbytes"))
  }

  /** Media shard byte ASSEMBLY — the step after packing's assignment:
    * per (kind, shard), the payloads concatenated in pack order into
    * ONE byte stream (what a shard writer emits to object storage),
    * alongside the counts the writer needs. Pairs with [[shardIndex]]:
    * slicing `shard_bytes` at an asset's (offset, nbytes) returns its
    * payload byte-exactly (gated via md5 roundtrip on every asset).
    *
    * Scale shape: one exchange total — the pack window's hash(kind)
    * partitioning also satisfies the (kind, shard) aggregation's
    * clustering, so payload bytes shuffle exactly once, into their
    * shard's reducer. Per-group state is one shard's payloads, bounded
    * by `budgetBytes` (+ one straddling asset) — size the budget to a
    * task (e.g. 256 MB), not to a file system block. */
  def assembleShards(media: DataFrame, budgetBytes: Long): DataFrame = {
    val cat = udf { (parts: Seq[Array[Byte]]) =>
      var total = 0
      parts.foreach(p => if (p != null) total += p.length)
      val out = new Array[Byte](total)
      var off = 0
      parts.foreach { p =>
        if (p != null) { System.arraycopy(p, 0, out, off, p.length); off += p.length }
      }
      out
    }
    val packed = graft.ops.Corpus.packShards(
      // null payloads = zero-length spans; see shardIndex for why this
      // is a coalesce and not a null-filter
      media.select(col("media_id"), col("kind"), col("content"),
        coalesce(length(col("content")), lit(0)).cast("long").as("nbytes")),
      partitionKey = col("kind"), order = col("media_id"),
      weight = col("nbytes"), budget = budgetBytes)
    packed
      .groupBy(col("kind"), col("shard"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("nbytes")).as("shard_nbytes"),
        cat(transform(
          array_sort(collect_list(struct(col("media_id"), col("content")))),
          x => x.getField("content"))).as("shard_bytes"))
  }

  /** Frame-sampling UDF for [[sampleFrames]] — CAPTURE-FREE (stride is
    * a column argument, not a closure capture), deliberately: a
    * non-capturing lambda is a JVM singleton, so two `sampleFrames`
    * calls with the same stride build CANONICALLY EQUAL plans and
    * Spark's CacheManager can resolve one against the other's cached
    * frame. The former `udf { content => ... stride ... }` form
    * captured `stride`, making every call a fresh function instance —
    * which is exactly why the daily probe's within-day video pass and
    * its store probe could never share one decode pass the way the
    * image builders do (SCALING.md round-16 cache-identity mechanics). */
  private val sampleFramesUdf = udf { (content: Array[Byte], stride: Int) =>
    val frames = Codec.decodeFrames(content)
    (0 until frames.length by stride).map(i => (i, frames(i)))
  }

  /** Frame sampling for video rows: REAL container parse
    * ([[Codec.decodeFrames]]) emitting every `stride`-th frame's PNG
    * payload with its index. One output row per sampled frame,
    * payload-bounded; corrupt/empty containers yield no rows. */
  def sampleFrames(media: DataFrame, stride: Int = 2): DataFrame = {
    require(stride >= 1, s"stride must be positive, got $stride")
    media
      .where(col("kind") === "video")
      .select(col("media_id"),
        explode(sampleFramesUdf(col("content"), lit(stride))).as("f"))
      .select(col("media_id"), col("f._1").as("frame_index"),
        col("f._2").as("content"))
  }
}
