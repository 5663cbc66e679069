package graft.ext

import graft.TestSpark
import graft.multimodal.{Codec, MediaItem, Multimodal, MultimodalQueries, SignatureStore}
import graft.streaming.{DocsStream, EventsStream, MediaStream, SessionEvent}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("synthetic media: real payloads, deterministic, metadata matches pixels") {
    val a = Multimodal.syntheticMedia(spark, dir)
    assert(a.schema("content").dataType.typeName == "binary")
    val r1 = a.orderBy("media_id").collect()
    val r2 = Multimodal.syntheticMedia(spark, dir).orderBy("media_id").collect()
    assert(r1.length == 500)
    assert(r1.zip(r2).forall { case (x, y) =>
      x.getAs[Array[Byte]]("content").sameElements(y.getAs[Array[Byte]]("content"))
    })
    // payloads are REAL media: every image decodes via ImageIO at the
    // metadata dims, every wav decodes to the metadata sample count,
    // every container parses to the metadata frame count
    r1.foreach { r =>
      val content = r.getAs[Array[Byte]]("content")
      r.getAs[String]("kind") match {
        case "image" =>
          val img = Codec.decodeImage(content).get
          assert(img.getWidth == r.getAs[Int]("width"))
          assert(img.getHeight == r.getAs[Int]("height"))
        case "audio" =>
          val samples = Codec.decodeWavSamples(content).get
          assert(samples.length == r.getAs[Int]("n_frames"))
        case "video" =>
          val frames = Codec.decodeFrames(content)
          assert(frames.length == r.getAs[Int]("n_frames"))
          frames.foreach(f => assert(Codec.decodeImage(f).nonEmpty))
      }
    }
  }

  test("feature extraction is deterministic, fixed-dim, in-range, partition-streamed") {
    import spark.implicits._
    val media = Multimodal.syntheticMedia(spark, dir).as[MediaItem]
    def feats = Multimodal.extractFeatures(media, dim = 32)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    val f1 = feats
    assert(f1.size == 500)
    assert(f1.values.forall(_.length == 32))
    assert(f1.values.forall(_.forall(v => v >= 0f && v <= 1f)))
    assert(f1 == feats, "same payload must give identical features")
  }

  test("resize really re-encodes: output pixel dims equal the metadata") {
    val out = Multimodal.resize(Multimodal.syntheticMedia(spark, dir), 24, 24)
      .where(col("kind") === "image")
      .select("media_id", "width", "height", "content").collect()
    assert(out.nonEmpty)
    var shrunk = 0
    out.foreach { r =>
      assert(r.getInt(1) <= 24 && r.getInt(2) <= 24)
      val img = Codec.decodeImage(r.getAs[Array[Byte]]("content")).get
      assert(img.getWidth == r.getInt(1), s"payload width vs metadata: $r")
      assert(img.getHeight == r.getInt(2), s"payload height vs metadata: $r")
      if (r.getInt(1) < 24 || r.getInt(2) < 24) shrunk += 1
    }
    assert(shrunk > 0, "some assets must actually shrink into the box")
  }

  test("frame sampling parses the real container: ceil(n_frames/stride) rows per video") {
    val media = Multimodal.syntheticMedia(spark, dir)
    val counts = Multimodal.sampleFrames(media, stride = 2)
      .groupBy("media_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = media.where(col("kind") === "video")
      .select(col("media_id"), col("n_frames")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1) - 1) / 2 + 1).toLong).toMap
    assert(counts == expected)
  }

  test("phash64: survives JPEG re-encode and 1.5x upscale, separates distinct images") {
    (1L to 30L).foreach { seed =>
      val img = Codec.synthImage(seed * 7919, 40, 32)
      val base = Codec.phash64(img)
      val jpeg = Codec.phash64(Codec.encodeJpeg(img, 0.75f)).get
      val dJpeg = java.lang.Long.bitCount(base ^ jpeg)
      assert(dJpeg <= 7, s"seed $seed: JPEG re-encode moved pHash $dJpeg bits")
      val up = Codec.phash64(Codec.scaleTo(img, 60, 48))
      val dUp = java.lang.Long.bitCount(base ^ up)
      assert(dUp <= 7, s"seed $seed: 1.5x upscale moved pHash $dUp bits")
      val other = Codec.phash64(Codec.synthImage(seed * 7919 + 1, 40, 32))
      val dOther = java.lang.Long.bitCount(base ^ other)
      assert(dOther > 12, s"seed $seed: unrelated images only $dOther bits apart")
    }
  }

  test("wav roundtrip is sample-exact; fingerprints are gain-invariant") {
    val bytes = Codec.synthWavBytes(424242L, 2048, 16000)
    val samples = Codec.decodeWavSamples(bytes).get
    assert(samples.length == 2048)
    assert(Codec.decodeWavSamples(Codec.encodeWav(samples, 16000)).get
      .sameElements(samples))
    val sigs = Codec.audioFingerprints(samples)
    assert(sigs.length == 8)
    // a pure gain change must move each window fingerprint at most the
    // query budget (exact invariance up to 16-bit requantization)
    val scaled = samples.map(v => (v * 0.9).toShort)
    val sigsScaled = Codec.audioFingerprints(scaled)
    sigs.zip(sigsScaled).foreach { case (a, b) =>
      assert(java.lang.Long.bitCount(a ^ b) <= 3, s"gain flipped ${java.lang.Long.bitCount(a ^ b)} bits")
    }
    // different windows of the chirped clip carry different spectra
    assert(sigs.distinct.length > 1, "fingerprints must vary across windows")
  }

  test("codec handles RGB color images: luma path + pHash stay consistent") {
    // corpora are mostly COLOR; the synthetic fixtures are grayscale, so
    // pin the RGB path explicitly: an RGB render and its grayscale twin
    // share luma by construction (Rec.601 of (v,v,v) = v), so their
    // pHashes must be near-identical, and a JPEG re-encode of the COLOR
    // image must stay inside the usual budget
    val w = 40; val h = 32
    val gray = Codec.synthImage(777L, w, h)
    val rgb = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = gray.getRaster.getSample(x, y, 0)
      rgb.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val png = Codec.encodePng(rgb)
    val decoded = Codec.decodeImage(png).get
    assert(decoded.getColorModel.getNumComponents >= 3, "PNG must round-trip as color")
    // budget 2 (r13): luma32 normalizes the HASH path into a fixed
    // TYPE_BYTE_GRAY 32×32 target regardless of source color model, so a
    // gray render and its RGB twin interpolate through the SAME space
    // and interpolation machinery — the residual drift is only the
    // monotonic gray→sRGB tone-map rounding, which the median-threshold
    // pHash absorbs. This restores a comfortable margin inside the
    // near-dup Hamming budget (7) for corpora mixing gray and RGB
    // encodes of the same content (r12's color-preserving scaleTo had
    // pushed cross-colorspace drift to ~4 bits because the two paths
    // also interpolated in different spaces).
    val dGray = java.lang.Long.bitCount(Codec.phash64(gray) ^ Codec.phash64(decoded))
    assert(dGray <= 2, s"RGB render moved pHash $dGray bits vs its grayscale twin")
    val jpeg = Codec.phash64(Codec.encodeJpeg(decoded, 0.75f)).get
    val dJpeg = java.lang.Long.bitCount(Codec.phash64(decoded) ^ jpeg)
    assert(dJpeg <= 7, s"color JPEG re-encode moved pHash $dJpeg bits")
    // the resize operator's codec call must PRESERVE color: a scaled
    // color image re-encodes as color, not a silent grayscale conversion
    val scaled = Codec.decodeImage(
      Codec.encodePng(Codec.scaleTo(decoded, w / 2, h / 2))).get
    assert(scaled.getColorModel.getNumComponents >= 3,
      "scaleTo converted a color image to grayscale")
  }

  test("resize leaves metadata untouched on undecodable payloads") {
    // a corrupt payload must exit resize with ORIGINAL metadata AND
    // original bytes — scaled metadata attached to unscaled bytes would
    // break the metadata==pixel-dims invariant exactly for the corrupt
    // assets the codec layer is designed to tolerate
    import spark.implicits._
    val junk = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val rows = Seq(
      (1L, "image", "image/png", 48, 40, 1, 0, Codec.synthImageBytes(42L, 48, 40)),
      (2L, "image", "image/png", 48, 40, 1, 0, junk))
      .toDF("media_id", "kind", "mime", "width", "height", "n_frames",
        "sample_rate", "content")
    val out = Multimodal.resize(rows, 24, 24)
      .select("media_id", "width", "height", "content")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getAs[Array[Byte]]("content"))).toMap
    assert(out(1L)._1 == 24 && out(1L)._2 == 20, "decodable image must scale")
    val dec = Codec.decodeImage(out(1L)._3).get
    assert(dec.getWidth == 24 && dec.getHeight == 20, "payload dims must equal metadata")
    assert(out(2L)._1 == 48 && out(2L)._2 == 40,
      "undecodable payload exited with rewritten metadata")
    assert(java.util.Arrays.equals(out(2L)._3, junk),
      "undecodable payload bytes must pass through unchanged")
  }

  test("resize leaves metadata untouched on null source dims") {
    // the dual of the corrupt-payload case: a DECODABLE image whose
    // width/height metadata is null must pass through with metadata
    // (still null) and bytes unchanged — the r13 column-form regression
    // rewrote new_width/new_height to null·scale = null while _ok was
    // true, silently nulling previously-null-but-typed metadata rows
    import spark.implicits._
    val img = Codec.synthImageBytes(42L, 48, 40)
    val rows = Seq(
      (1L, "image", "image/png", Some(48), Some(40), 1, 0, img),
      (2L, "image", "image/png", Option.empty[Int], Option.empty[Int], 1, 0, img))
      .toDF("media_id", "kind", "mime", "width", "height", "n_frames",
        "sample_rate", "content")
    val out = Multimodal.resize(rows, 24, 24)
      .select("media_id", "width", "height", "content")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getAs[Array[Byte]]("content"))).toMap
    assert(out(1L)._1.contains(24) && out(1L)._2.contains(20))
    assert(out(2L)._1.isEmpty && out(2L)._2.isEmpty,
      "null-dims image must keep null metadata, not a rewritten value")
    assert(java.util.Arrays.equals(out(2L)._3, img),
      "null-dims image bytes must pass through unchanged (no target to scale to)")
  }

  test("resize decode budgets: 1/image metadata-only, 2/image with payload") {
    // the r12 regression: one struct UDF fed both metadata and payload,
    // so a metadata-only projection paid decode+scale+encode per row —
    // and after projection collapse the deterministic UDF was
    // duplicated into each of its references (up to 4× that again).
    // The factored form pins two budgets: a metadata-only consumer
    // evaluates just the light decodability check (ONE decode per
    // image, no scale/encode), and a payload consumer additionally
    // runs the heavy re-encode UDF (one extra decode). Both UDFs are
    // DETERMINISTIC by design (determinism keeps the projection
    // pushdown/pruning-transparent); duplication is prevented
    // structurally instead — rzUdf has exactly one reference, and
    // dimsUdf feeds consumers only through the cheap `_ok` attribute,
    // which CollapseProject refuses to inline (see the source comment
    // on Multimodal.resizeImages). (decodeCalls is JVM-global — suites
    // run sequentially per forked JVM, see the counter's doc.)
    // parquet-backed input, NOT a LocalRelation: the optimizer folds
    // plans over LocalRelation eagerly (ConvertToLocalRelation), which
    // both hides the real scan-shaped plan and charges the decodes to
    // optimization time — the budget would measure nothing.
    import spark.implicits._
    val nImages = 24
    val tmp = java.nio.file.Files.createTempDirectory("graft_resize_budget").toString
    ((1 to nImages).map(i =>
        (i.toLong, "image", "image/png", 48, 40, 1, 0,
          Codec.synthImageBytes(i.toLong, 48, 40))) :+
        (99L, "audio", "audio/wav", 0, 0, 1024, 16000,
          Codec.synthWavBytes(7L, 1024, 16000)))
      .toDF("media_id", "kind", "mime", "width", "height", "n_frames",
        "sample_rate", "content")
      .write.mode("overwrite").parquet(tmp)
    val rows = spark.read.parquet(tmp)
    Codec.decodeCalls.reset()
    val meta = Multimodal.resize(rows, 24, 24)
      .select("media_id", "width", "height").collect()
    val metaDecodes = Codec.decodeCalls.sum()
    assert(meta.length == nImages + 1)
    assert(metaDecodes == nImages,
      s"metadata-only resize must decode each image exactly once (and never the audio row): $metaDecodes decodes for $nImages images")
    Codec.decodeCalls.reset()
    val full = Multimodal.resize(rows, 24, 24)
      .select("media_id", "width", "height", "content").collect()
    val fullDecodes = Codec.decodeCalls.sum()
    assert(full.length == nImages + 1)
    assert(fullDecodes == 2L * nImages,
      s"payload-consuming resize budget is two decodes per image (dims check + re-encode): $fullDecodes decodes for $nImages images")
  }

  test("codec decodes stereo WAV by averaging channels") {
    // build a 2-channel PCM16 WAV whose channels are v and v+2000: the
    // mono decode must be their average (rounding toward zero)
    val n = 512
    val mono = Array.tabulate(n)(i =>
      (8000 * math.sin(2 * math.Pi * 440 * i / 16000)).toShort)
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, false)
    val raw = new Array[Byte](n * 4)
    for (i <- 0 until n) {
      val l = mono(i); val r = (mono(i) + 2000).toShort
      raw(4 * i) = (l & 0xff).toByte; raw(4 * i + 1) = ((l >> 8) & 0xff).toByte
      raw(4 * i + 2) = (r & 0xff).toByte; raw(4 * i + 3) = ((r >> 8) & 0xff).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val decoded = Codec.decodeWavSamples(bos.toByteArray).get
    assert(decoded.length == n)
    for (i <- 0 until n)
      assert(decoded(i) == ((mono(i) + mono(i) + 2000) / 2).toShort,
        s"sample $i: ${decoded(i)}")
  }

  test("frame container roundtrip") {
    val frames = (0 until 5).map(i => Codec.encodePng(Codec.synthImage(9L, 16, 16, i * 0.3)))
    val packed = Codec.encodeFrames(frames)
    val back = Codec.decodeFrames(packed)
    assert(back.length == 5)
    assert(back.zip(frames).forall { case (a, b) => a.sameElements(b) })
  }

  test("phashPairs finds every planted JPEG and resize twin with zero false positives") {
    val res = Multimodal.phashPairs(
        MultimodalQueries.mediaWithPlantedNearDups(spark, dir), maxHamming = 7)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val images = Multimodal.syntheticMedia(spark, dir)
      .where(col("kind") === "image").select("media_id").collect().map(_.getLong(0))
    val planted =
      images.filter(_ % 7 == 3).map(id => (id, id + 10000000L)).toSet ++
        images.filter(_ % 7 == 5).map(id => (id, id + 20000000L)).toSet
    assert(planted.nonEmpty, "fixture sanity: some twins must be planted")
    assert((planted -- res).isEmpty, s"missed planted twins: ${(planted -- res).take(5)}")
    // any extra pair must be a duplicate-text asset pair (identical
    // seed => identical pixels), never different content
    val seeds = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), md5(col("text")).as("seed")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def base(id: Long) = if (id >= 20000000L) id - 20000000L
      else if (id >= 10000000L) id - 10000000L else id
    (res -- planted).foreach { case (x, y) =>
      assert(seeds(base(x)) == seeds(base(y)), s"false positive pair ($x,$y)")
    }
  }

  test("videoNearDupPairs: planted frame-reencoded twins found at match_frac 1, video-only") {
    val media = MultimodalQueries.mediaWithPlantedNearDups(spark, dir)
    val res = Multimodal.videoNearDupPairs(media).collect()
    val found = res.map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = Multimodal.syntheticMedia(spark, dir)
      .where(col("kind") === "video" && pmod(col("media_id"), lit(7)) === 3)
      .select("media_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 10000000L)).toSet
    assert(planted.nonEmpty, "fixture sanity: some video twins must be planted")
    assert((planted -- found).isEmpty, s"missed video twins: ${(planted -- found).take(5)}")
    res.filter(r => planted((r.getLong(0), r.getLong(1)))).foreach { r =>
      assert(r.getDouble(5) == 1.0, s"twin pair below full overlap: $r")
    }
    val nonVideo = media.where(col("kind") =!= "video")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(found.flatMap(p => Set(p._1, p._2)).intersect(nonVideo).isEmpty)
  }

  test("signature store records its stride; a contradicting append fails loudly") {
    import graft.multimodal.SignatureStore
    val media = Multimodal.syntheticMedia(spark, dir).limit(30)
    val storeDir = java.nio.file.Files.createTempDirectory("stride-store").toString + "/s"
    SignatureStore.build(media, storeDir, videoStride = 3)
    assert(SignatureStore.recordedVideoStride(spark, storeDir).contains(3))
    // default append adopts the recorded stride; a contradicting
    // explicit stride must throw, not silently mix frame censuses
    SignatureStore.append(media.limit(5), storeDir)
    val e = intercept[java.io.IOException](
      SignatureStore.append(media.limit(5), storeDir, videoStride = 2))
    assert(e.getMessage.contains("recorded stride"), e.getMessage)
    // the params file must not confuse the partitioned parquet reader
    assert(SignatureStore.load(spark, storeDir).count() > 0)
  }

  test("sigOverlapPairs computes the signature distinct once (decode budget)") {
    // decode budget is the ground truth — the pre-r15 pin matched the
    // string "ReusedExchange" and passed while column pruning split the
    // five consumers into canonically-different subtrees that each
    // re-ran the decode (measured 4.7 decodes/frame). The distinct
    // frame is now cached (the one materialization point pruning cannot
    // split); budget: at most one decode per sampled frame row, total.
    val media = MultimodalQueries.mediaWithPlantedNearDups(spark, dir)
    // budget = ONE evaluation of the signature builder over this media
    // frame (sampled-frame decodes + the fixture's own lazy re-encode
    // decodes), measured with the same counter
    Codec.decodeCalls.reset()
    graft.multimodal.SignatureStore.videoSigRows(media).count()
    val perEval = Codec.decodeCalls.sum()
    Codec.decodeCalls.reset()
    val pairs = Multimodal.videoNearDupPairs(media)
    pairs.collect()
    val decodes = Codec.decodeCalls.sum()
    assert(decodes <= perEval,
      s"overlap core decoded $decodes vs a one-evaluation budget of $perEval — a consumer recomputes the signature subtree")
  }

  test("sigOverlapPairs: stop-sim cap bounds the ident media expansion, conservatively") {
    import spark.implicits._
    // hot sim H owned by 10 media (over a cap of 4 — think silence
    // windows); media 100/101 additionally share two REAL sims. Under
    // the cap, H leaves candidacy: the 100-101 pair survives on its
    // real overlap (denominator still counts H — frac 2/3), while pairs
    // connected ONLY through H disappear. Uncapped, H alone links all
    // C(10,2) owner pairs.
    val hot = 0x1111111111L
    val rows =
      (0L until 10L).flatMap(m => Seq((m + 100L, hot))) ++
      Seq((100L, 0x2222222222L), (101L, 0x2222222222L),
        (100L, 0x4444444444L), (101L, 0x4444444444L))
    val sigs = rows.toDF("media_id", "sim")
    val capped = Multimodal.sigOverlapPairs(sigs, maxHamming = 3,
        minMatchFrac = 0.5, bits = 60, maxSimOwners = 4)
      .select("media_a", "media_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSet == Set((100L, 101L)),
      s"only the real-overlap pair may survive the stop-sim cut, got ${capped.toSet}")
    val frac = Multimodal.sigOverlapPairs(sigs, maxHamming = 3,
        minMatchFrac = 0.5, bits = 60, maxSimOwners = 4)
      .where(col("media_a") === 100L).select("match_frac").head.getDouble(0)
    assert(math.abs(frac - 2.0 / 3.0) < 1e-9,
      s"denominator must keep counting the dropped stop-sim, got $frac")
    val unCapped = Multimodal.sigOverlapPairs(sigs, maxHamming = 3,
        minMatchFrac = 0.5, bits = 60, maxSimOwners = 4096)
      .select("media_a", "media_b").count()
    assert(unCapped == 45L, s"uncapped form must emit all C(10,2) pairs, got $unCapped")
  }

  test("audioNearDupPairs: planted trim+gain twins found, audio-only, both id orderings") {
    val media = MultimodalQueries.mediaWithPlantedNearDups(spark, dir)
    val res = Multimodal.audioNearDupPairs(media).collect()
    val found = res.map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = Multimodal.syntheticMedia(spark, dir)
      .where(col("kind") === "audio" && pmod(col("media_id"), lit(7)) === 3)
      .select("media_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 10000000L)).toSet
    assert(planted.nonEmpty, "fixture sanity: some audio twins must be planted")
    assert((planted -- found).isEmpty, s"missed audio twins: ${(planted -- found).take(5)}")
    val nonAudio = media.where(col("kind") =!= "audio")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(found.flatMap(p => Set(p._1, p._2)).intersect(nonAudio).isEmpty)
    // a stride-aligned trim still matches in BOTH id orderings at the
    // strict default threshold: the least(n_sigs_a, n_sigs_b)
    // denominator makes match_frac containment semantics, so whether
    // the LONGER original carries the smaller id (the case an a-side
    // denominator would dilute) or the larger id, the pair scores 1.0
    import spark.implicits._
    val one = media.where(col("kind") === "audio").select("content").head
    val bytes = one.getAs[Array[Byte]]("content")
    val samples = Codec.decodeWavSamples(bytes).get
    val trimmedWav = Codec.encodeWav(samples.drop(256), 16000)
    for ((longId, shortId) <- Seq((1L, 999999999L), (999999999L, 1L))) {
      val two = Seq(
        (longId, "audio", bytes),
        (shortId, "audio", trimmedWav))
        .toDF("media_id", "kind", "content")
      val tr = Multimodal.audioNearDupPairs(two).collect()
      val (a, b) = (math.min(longId, shortId), math.max(longId, shortId))
      val hit = tr.find(r => r.getLong(0) == a && r.getLong(1) == b)
      assert(hit.isDefined,
        s"trim must match with long=$longId short=$shortId: ${tr.mkString(",")}")
      assert(hit.get.getDouble(5) == 1.0,
        s"containment match_frac must be 1.0: ${hit.get}")
    }
  }

  test("signature store: append == rebuild; index-from-store == index-from-payloads") {
    val history = Multimodal.syntheticMedia(spark, dir)
    val full = java.nio.file.Files.createTempDirectory("sigstore_full").toString
    val incr = java.nio.file.Files.createTempDirectory("sigstore_incr").toString
    SignatureStore.build(history, full)
    SignatureStore.build(history.where(pmod(col("media_id"), lit(3)) =!= 0), incr)
    SignatureStore.append(history.where(pmod(col("media_id"), lit(3)) === 0), incr)
    val cols = Seq("media_id", "kind", "sig", "thumb").map(col)
    val a = SignatureStore.load(spark, full).select(cols: _*)
    val b = SignatureStore.load(spark, incr).select(cols: _*)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "incremental append must lose and invent nothing vs a full rebuild")
    // streaming index built from the store == built by decoding payloads
    val idxPayload = MediaStream.buildHistoryIndex(history)
    val idxStore = MediaStream.buildHistoryIndexFromStore(
      SignatureStore.load(spark, full))
    assert(idxPayload.size == idxStore.size)
    val probe = MultimodalQueries.noveltyIncoming(spark, dir)
    val viaPayload = MediaStream.perceptualNovelty(probe, idxPayload)
      .select("media_id").collect().map(_.getLong(0)).toSet
    val viaStore = MediaStream.perceptualNovelty(probe, idxStore)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(viaPayload == viaStore,
      "the two index constructions may not diverge on a single asset")
  }

  test("store novelty: all-kind twins shed, fresh kept, history never decoded") {
    val history = Multimodal.syntheticMedia(spark, dir)
    val storeDir = java.nio.file.Files.createTempDirectory("sigstore_nov").toString
    SignatureStore.build(history, storeDir)
    val store = SignatureStore.load(spark, storeDir)
    val incoming = MultimodalQueries.noveltyIncomingAllKinds(spark, dir)
    // steady-state decode budget: the batch decodes ONLY incoming
    // payloads (signature extraction); the store has no payload column
    Codec.decodeCalls.reset()
    SignatureStore.signatures(incoming).count()
    val incomingOnly = Codec.decodeCalls.sum()
    Codec.decodeCalls.reset()
    val survivors = SignatureStore.noveltyAgainstStore(incoming, store)
      .select("media_id", "kind").collect()
    val steady = Codec.decodeCalls.sum()
    assert(steady == incomingOnly,
      s"store-form novelty decoded $steady vs incoming-only budget $incomingOnly — history payloads were touched")
    val twinsLeaked = survivors.count(r => r.getLong(0) >= 10000000L && r.getLong(0) < 30000000L)
    assert(twinsLeaked == 0, s"$twinsLeaked re-encode/upscale twins of history assets survived")
    val freshIn = incoming.where(col("media_id") >= 30000000L).count()
    val freshKept = survivors.count(_.getLong(0) >= 30000000L)
    assert(freshIn > 0 && freshKept == freshIn,
      s"fresh assets dropped: kept $freshKept of $freshIn")
  }
}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming windowed agg equals its batch twin") {
    val batch = EventsStream.windowedAggBatch(graft.Tables.events(spark, dir))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    // stream the same parquet through the engine's own file-source entry
    // point (startWindowedQuery normalizes the nanos-as-long timestamps);
    // file stream source needs a directory — stage the single fixture file
    val streamDir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventsStream.startWindowedQuery(spark, streamDir.toString, "wtest")
    try {
      q.processAllAvailable()
      val stream = spark.table("wtest")
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(stream == batch, s"stream/batch divergence: ${stream.size} vs ${batch.size}")
    } finally q.stop()
  }

  test("streaming windowed dedup equals its batch twin's key set") {
    val batch = EventsStream.dedupWindowedBatch(graft.Tables.events(spark, dir))
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2)))
      .toSet

    val streamDir = java.nio.file.Files.createTempDirectory("events-dedup-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventsStream.startDedupQuery(spark, streamDir.toString, "dtest")
    try {
      q.processAllAvailable()
      val stream = spark.table("dtest")
        .collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2)))
        .toSet
      assert(stream == batch, s"stream/batch divergence: ${stream.size} vs ${batch.size}")
    } finally q.stop()
  }

  test("stream-stream follow join equals its batch twin") {
    val batch = EventsStream.followPairsBatch(graft.Tables.events(spark, dir))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(batch.nonEmpty, "fixture sanity: some purchases must have followers")

    val streamDir = java.nio.file.Files.createTempDirectory("events-follow-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventsStream.startFollowPairsQuery(spark, streamDir.toString, "ftest")
    try {
      q.processAllAvailable()
      val stream = spark.table("ftest")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      assert(stream == batch, s"stream/batch divergence: ${stream.size} vs ${batch.size}")
    } finally q.stop()
  }

  test("outer stream-stream join: matched pairs exact, old followerless purchases null-extend") {
    val events = graft.Tables.events(spark, dir).cache()
    val maxTs = events.agg(max(col("ts"))).head.getTimestamp(0).getTime
    val splitTs = new java.sql.Timestamp(maxTs - 15L * 24 * 3600 * 1000)

    // stage the fixture as TWO parquet files; one file per trigger means
    // two micro-batches, so batch 2 runs with batch 1's watermark and
    // can null-extend batch-1-era followerless purchases
    val streamDir = java.nio.file.Files.createTempDirectory("events-follow-outer")
    events.where(col("ts") <= splitTs).coalesce(1)
      .write.parquet(streamDir.resolve("a_first").toString)
    events.where(col("ts") > splitTs).coalesce(1)
      .write.parquet(streamDir.resolve("b_second").toString)
    // file source lists files, not dirs — flatten the two part files up
    val files = java.nio.file.Files.walk(streamDir).iterator()
    val parts = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
    while (files.hasNext) { val f = files.next(); if (f.toString.endsWith(".parquet")) parts += f }
    val flat = java.nio.file.Files.createTempDirectory("events-follow-outer-flat")
    parts.sortBy(_.toString).zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.copy(f, flat.resolve(f"part$i%02d.parquet"))
    }

    val batchOuter = EventsStream.followPairsOuterBatch(events)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val batchInner = batchOuter.filter(_._2 != -1L)

    val q = EventsStream.startFollowPairsOuterQuery(spark, flat.toString, "fouter")
    try {
      q.processAllAvailable()
      val stream = spark.table("fouter")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      // 1. every matched pair arrives, none fabricated
      assert(stream.filter(_._2 != -1L) == batchInner,
        s"inner pairs diverge: ${stream.count(_._2 != -1L)} vs ${batchInner.size}")
      // 2. null-extensions are only ever for truly followerless purchases
      val streamNulls = stream.filter(_._2 == -1L).map(_._1)
      val batchNulls = batchOuter.filter(_._2 == -1L).map(_._1)
      assert(streamNulls.subsetOf(batchNulls),
        s"null-extended a purchase that HAS followers: ${(streamNulls -- batchNulls).take(5)}")
      // 3. and purchases that are followerless in the FULL data and
      // provably past the watermark batch 2 ran with (split − 2 h delay,
      // minus the 1 h join horizon) MUST have null-extended
      val safeTs = new java.sql.Timestamp(splitTs.getTime - 3L * 3600 * 1000)
      val oldPurchases = events
        .where(col("event_type") === "purchase" && col("ts") <= safeTs)
        .select("event_id").collect().map(_.getLong(0)).toSet
      val due = batchNulls intersect oldPurchases
      assert(due.subsetOf(streamNulls),
        s"old followerless purchases failed to null-extend: ${(due -- streamNulls).take(5)}")
      assert(due.nonEmpty, "fixture sanity: some old purchases must be followerless")
    } finally q.stop()
  }

  test("streaming quality scoring equals its batch twin (frozen offline model)") {
    val docsB = spark.read.parquet(s"$dir/documents.parquet")
    val model = graft.text.QualityClassifier.train(docsB, epochs = 5)
    val batch = DocsStream.scoreQuality(docsB, model)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    assert(batch.nonEmpty)

    val streamDir = java.nio.file.Files.createTempDirectory("docs-quality")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      streamDir.resolve("documents.parquet"))
    val q = DocsStream.startQualityScoreQuery(spark, streamDir.toString, "qscore", model)
    try {
      q.processAllAvailable()
      val stream = spark.table("qscore")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
      assert(stream == batch,
        s"stream/batch divergence: ${stream.size} vs ${batch.size}")
    } finally q.stop()
  }

  test("streaming document hygiene equals its batch twin (stateless plan)") {
    val batch = DocsStream.hygiene(
        spark.read.parquet(s"$dir/documents.parquet"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(batch.nonEmpty, "fixture sanity: some docs must survive hygiene")

    val streamDir = java.nio.file.Files.createTempDirectory("docs-hygiene")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      streamDir.resolve("documents.parquet"))
    val q = DocsStream.startHygieneQuery(spark, streamDir.toString, "htest")
    try {
      q.processAllAvailable()
      val stream = spark.table("htest")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
        .toSet
      assert(stream == batch, s"stream/batch divergence: ${stream.size} vs ${batch.size}")
    } finally q.stop()
  }

  test("streaming decontamination equals its batch twin; planted copies dropped") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val isBench = col("doc_id") % 100 === 7
    val bloom = DocsStream.benchBloom(docs.where(isBench))
    val corpus = docs.where(!isBench)
    val batch = DocsStream.decontaminate(corpus, bloom)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batch.nonEmpty && batch.size < corpus.count(),
      "fixture sanity: decontamination must keep some and drop some")

    val streamDir = java.nio.file.Files.createTempDirectory("docs-decon").toString
    corpus.coalesce(1).write.mode("append").parquet(streamDir)
    val q = DocsStream.startDecontaminateQuery(spark, streamDir, "dctest", bloom)
    try {
      q.processAllAvailable()
      val stream = spark.table("dctest")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(stream == batch,
        s"stream/batch divergence: ${stream.size} vs ${batch.size}")
    } finally q.stop()

    // a verbatim benchmark copy must never survive, stream or batch
    val benchText = docs.where(isBench).select("text").head.getString(0)
    val planted = Seq((900001L, benchText, "en", "srcX", benchText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(DocsStream.decontaminate(planted, bloom).count() == 0)
  }

  test("streaming novelty filter equals its batch twin; history copies never survive") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val isHistory = col("doc_id") % 10 < 8
    val history = docs.where(isHistory)
    val feed = docs.where(!isHistory)
    val batch = graft.ops.Dedup.novelAgainst(history, feed)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batch.nonEmpty, "fixture sanity: the feed must contain novel docs")

    val streamDir = java.nio.file.Files.createTempDirectory("docs-novel").toString
    feed.coalesce(1).write.mode("append").parquet(streamDir)
    val q = DocsStream.startNoveltyQuery(spark, streamDir, "nvtest", history)
    try {
      q.processAllAvailable()
      val stream = spark.table("nvtest")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(stream == batch,
        s"stream/batch divergence: ${stream.size} vs ${batch.size}")
    } finally q.stop()

    // a verbatim copy of a history doc arriving in the feed must be shed
    val histText = history.where(col("text").isNotNull)
      .select("text").head.getString(0)
    val planted = Seq((900002L, histText, "en", "srcX", histText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(graft.ops.Dedup.novelAgainst(history, planted).count() == 0)
  }

  test("bloom-store novelty: incremental store, stream == per-call batch, dup shed") {
    import spark.implicits._
    import graft.ops.{Dedup, NoveltyBloomStore}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val isHistory = col("doc_id") % 10 < 8
    val feed = docs.where(!isHistory)
    val storeDir = java.nio.file.Files.createTempDirectory("novbloom").toString + "/store"
    // incremental: build 6 deciles, append 2 more
    NoveltyBloomStore.build(docs.where(col("doc_id") % 10 < 6), storeDir,
      capacity = 100000L)
    NoveltyBloomStore.append(docs.where(col("doc_id") % 10 isin (6, 7)), storeDir)
    val storeForm = NoveltyBloomStore.novelAgainst(feed, storeDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val perCall = Dedup.novelAgainst(docs.where(isHistory), feed,
        expectedItems = Some(100000L))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(storeForm == perCall,
      s"store/per-call divergence: ${(storeForm diff perCall) ++ (perCall diff storeForm)}")
    // streaming form fed by the store == the batch decisions
    val streamDir = java.nio.file.Files.createTempDirectory("novbloom-feed").toString
    feed.coalesce(1).write.mode("append").parquet(streamDir)
    val q = DocsStream.startNoveltyQueryFromStore(spark, streamDir, "nvstore", storeDir)
    try {
      q.processAllAvailable()
      val stream = spark.table("nvstore")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(stream == storeForm,
        s"stream/batch divergence: ${stream.size} vs ${storeForm.size}")
    } finally q.stop()
    // a verbatim copy of a history doc is shed by the store form
    val histText = docs.where(isHistory && col("text").isNotNull)
      .select("text").head.getString(0)
    val planted = Seq((900003L, histText, "en", "srcX", histText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(NoveltyBloomStore.novelAgainst(planted, storeDir).count() == 0)
    // single-writer lock: a held lock fails LOUDLY with the appender
    // diagnosis; releasing it lets append proceed (idempotent re-merge)
    val lockPath = new java.io.File(storeDir, "append.lock")
    assert(lockPath.createNewFile())
    val e = intercept[java.io.IOException](
      NoveltyBloomStore.append(feed.limit(5), storeDir))
    assert(e.getMessage.contains("another appender"), e.getMessage)
    assert(lockPath.delete())
    NoveltyBloomStore.append(feed.limit(5), storeDir)
    assert(!lockPath.exists(), "append must release its lock")
  }

  test("streaming perceptual novelty equals its batch twin; history twins never survive") {
    import graft.multimodal.{Multimodal, MultimodalQueries}
    import graft.streaming.MediaStream
    val history = Multimodal.syntheticMedia(spark, dir)
    val incoming = MultimodalQueries.noveltyIncoming(spark, dir)
    val index = MediaStream.buildHistoryIndex(history, maxHamming = 7)
    val batch = MediaStream.perceptualNovelty(incoming, index)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(batch.nonEmpty, "fixture sanity: some incoming assets must be novel")
    // the banding-JOIN form (the at-scale batch pass) agrees exactly
    val joinForm = Multimodal.perceptualNoveltyBatch(incoming, history)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(joinForm == batch,
      s"index/join divergence: ${(joinForm diff batch) ++ (batch diff joinForm)}")
    // image twins of history assets are shed; fresh images survive
    val imageTwins = incoming.where(col("kind") === "image" &&
        col("media_id") < 30000000L)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(imageTwins.intersect(batch).isEmpty, "a history twin survived")
    val streamDir = java.nio.file.Files.createTempDirectory("media-novel").toString
    incoming.coalesce(1).write.mode("append").parquet(streamDir)
    val q = MediaStream.startPerceptualNoveltyQuery(spark, streamDir, "mediaNovel", index)
    try {
      q.processAllAvailable()
      val stream = spark.table("mediaNovel")
        .select("media_id").collect().map(_.getLong(0)).toSet
      assert(stream == batch,
        s"stream/batch divergence: ${stream.size} vs ${batch.size}")
    } finally q.stop()
  }

  test("streaming url frontier: raw re-crawl variants drop in-flight, fresh urls pass") {
    import spark.implicits._
    import graft.ops.NoveltyBloomStore
    import graft.text.TextFunctions.canonicalizeUrl
    // seen-URL store over canonical forms of two fetched URLs
    val storeDir = java.nio.file.Files.createTempDirectory("url-frontier").toString + "/store"
    val seen = Seq(
      (1L, "http://example.com/a/1?a=1"),
      (2L, "https://example.com/b/2")).toDF("doc_id", "url")
      .withColumn("url", canonicalizeUrl(col("url")))
    NoveltyBloomStore.build(seen, storeDir, textCol = "url",
      prefixChars = 0, capacity = 10000L)
    // raw frontier feed: byte-different re-crawl variants of the seen
    // urls + genuinely fresh urls
    val feed = Seq(
      (10L, "HTTP://Example.COM:80/a/1?utm_source=x&a=1#top"), // variant of 1
      (11L, "https://EXAMPLE.com:443/b/2/?gclid=z"),           // variant of 2
      (12L, "https://fresh.example/p/12"),
      (13L, "http://example.com/a/1?a=2")) // same path, DIFFERENT real param
      .toDF("doc_id", "url")
    val streamDir = java.nio.file.Files.createTempDirectory("url-frontier-in").toString
    feed.coalesce(1).write.mode("append").parquet(streamDir)
    val q = DocsStream.startUrlFrontierQuery(spark, streamDir, "urlfrontier", storeDir)
    try {
      q.processAllAvailable()
      val out = spark.table("urlfrontier")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out.keySet == Set(12L, 13L),
        s"variants must drop, fresh + changed-param urls must pass: $out")
      assert(out(12L) == "https://fresh.example/p/12")
      // the emitted url is the CANONICAL form (what the fetch log should key on)
      assert(out(13L) == "http://example.com/a/1?a=2")
    } finally q.stop()
  }

  test("streaming minhash-store novelty equals its batch twin; edited twins shed") {
    import graft.ops.{MinHashBandStore, OpsQueries}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val storeDir = java.nio.file.Files.createTempDirectory("mh-store").toString + "/store"
    MinHashBandStore.build(docs.where(col("doc_id") % 10 < 8), storeDir)
    val incoming = OpsQueries.mhIncoming(spark, dir)
    val batch = MinHashBandStore.noveltyAgainstStore(incoming, storeDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batch.nonEmpty)
    val streamDir = java.nio.file.Files.createTempDirectory("mh-novel-in").toString
    val outDir = java.nio.file.Files.createTempDirectory("mh-novel-out").toString + "/out"
    val ckpt = java.nio.file.Files.createTempDirectory("mh-novel-ckpt").toString
    incoming.coalesce(1).write.mode("append").parquet(streamDir)
    val q = DocsStream.startMinhashNoveltyQueryFromStore(
      spark, streamDir, outDir, ckpt, storeDir)
    try {
      q.processAllAvailable()
      val stream = spark.read.parquet(outDir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(stream == batch,
        s"stream/batch divergence: ${stream.size} vs ${batch.size}")
      // lightly-edited history re-crawls are shed on arrival
      assert(!stream.exists(id => id >= OpsQueries.PlantedTwinBase &&
          id < OpsQueries.PlantedFreshBase),
        "an edited history twin survived the stream stage")
    } finally q.stop()
  }

  test("streaming daily ingest: foreachBatch batchId + two-phase ledger equals batch ingestDay per day") {
    import graft.examples.DailyIngest
    import graft.streaming.DocsStream
    import graft.ops.OpsQueries
    val docs = OpsQueries.dailyDocs(spark, dir, 1)
    val bench = OpsQueries.dailyBench(spark, dir)
    val cols = Seq("url", "doc_id", "text", "lang", "source", "n_chars").map(col)
    val day0 = docs.where(col("day") === 0).select(cols: _*)
    val day1 = docs.where(col("day") === 1).select(cols: _*)
    def emptyMedia = spark.range(0).select(col("id").as("media_id"),
      lit("image").as("kind"), lit("image/png").as("mime"),
      lit(16).as("width"), lit(16).as("height"), lit(1).as("n_frames"),
      lit(0).as("sample_rate"), lit(null).cast("binary").as("content"))
    // the embedding branch runs REAL vectors through both paths: the
    // batch twin slices per day, the stream slices the same frame by
    // each micro-batch's arriving ids (the embLookup contract)
    val embAll = OpsQueries.dailyEmb(spark, dir, 1)
    // batch twin: the same two days through ingestDay directly
    val rootB = java.nio.file.Files.createTempDirectory("di-stream-batch").toString
    DailyIngest.ingestDay(spark, day0, emptyMedia, bench, rootB, 0,
      dayEmb = Some(embAll.where(col("day") === 0).drop("day")))
    DailyIngest.ingestDay(spark, day1, emptyMedia, bench, rootB, 1,
      dayEmb = Some(embAll.where(col("day") === 1).drop("day")))
    // stream: two staged files with ordered mtimes — one file per
    // micro-batch (maxFilesPerTrigger=1), so batchId 0 is day 0
    val streamDir = java.nio.file.Files.createTempDirectory("di-stream-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("di-stream-ckpt").toString
    val rootS = java.nio.file.Files.createTempDirectory("di-stream-root").toString
    def stageFile(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"di-stage-$name").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dest = new java.io.File(streamDir, name)
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      assert(dest.setLastModified(mtime), "test setup: mtime must stick")
    }
    val now = System.currentTimeMillis()
    stageFile(day0, "day0.parquet", now - 120000)
    stageFile(day1, "day1.parquet", now - 60000)
    val q = DocsStream.startDailyIngestQuery(spark, streamDir, ckpt, rootS, bench,
      embLookup = Some(embAll.drop("day")))
    try q.processAllAvailable() finally q.stop()
    (0 to 1).foreach { day =>
      val b = spark.read.parquet(DailyIngest.textOut(rootB, day))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val st = spark.read.parquet(DailyIngest.textOut(rootS, day))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(b.nonEmpty, s"fixture sanity: day $day must keep documents")
      assert(st == b, s"stream/batch divergence on day $day: ${st.size} vs ${b.size}")
      // the AUDIT TRAIL is stream-correct too: per day, the streamed
      // root's drop log carries the same (id, reason) verdicts as the
      // batch twin's — the log is phase-1 output like the survivors
      val logSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id bigint, reason string")
      def logRows(root: String) = spark.read.schema(logSchema)
        .parquet(DailyIngest.dropLogOut(root, day))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val lb = logRows(rootB)
      assert(lb.nonEmpty, s"fixture sanity: day $day must drop documents")
      assert(logRows(rootS) == lb,
        s"stream/batch drop-log divergence on day $day")
    }
    // the stores the two paths accumulated are BYTE-equal: same days,
    // same order, same append inputs
    def md5Of(p: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
      .map("%02x".format(_)).mkString
    assert(md5Of(s"${DailyIngest.urlStore(rootS)}/bloom.bin") ==
      md5Of(s"${DailyIngest.urlStore(rootB)}/bloom.bin"),
      "stream and batch URL frontier blooms must be byte-identical")
    assert(md5Of(s"${DailyIngest.textStore(rootS)}/bloom.bin") ==
      md5Of(s"${DailyIngest.textStore(rootB)}/bloom.bin"),
      "stream and batch content blooms must be byte-identical")
    // the EMBEDDING branch ran for real on both paths: same postings
    // (id, cell) population under the same staged day-0 quantizer, same
    // drift-log day coverage, and the planted semantic twins were SHED
    // by the stream (the branch engaged — it did not run empty)
    def postings(root: String) = spark.read
      .parquet(s"${DailyIngest.embStore(root)}/postings.parquet")
      .select("id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val pB = postings(rootB)
    val pS = postings(rootS)
    assert(pB.nonEmpty, "fixture sanity: the embedding store must hold vectors")
    assert(pS == pB,
      s"stream/batch embedding-store divergence: ${pS.size} vs ${pB.size} postings")
    def driftDays(root: String) = spark.read
      .parquet(s"${DailyIngest.embStore(root)}/drift_log.parquet")
      .select("batch").collect().map(_.getLong(0)).sorted.toSeq
    assert(driftDays(rootS) == driftDays(rootB),
      "stream and batch drift logs must cover the same appended days")
    // conditional truth, the pipeline_daily_ingest gate's discipline: a
    // twin is shed iff its BASE's vector reached the store (a base
    // dropped by day-0 hygiene never recorded a vector, and its
    // paraphrase is then correctly novel)
    val storeBases = pB.map(_._1)
    val condTwins = docs
      .where(col("doc_id") >= OpsQueries.PlantedSemTwinBase &&
        col("doc_id") < OpsQueries.PlantedSemChain1Base)
      .select("doc_id").collect().map(_.getLong(0))
      .filter(id => storeBases.contains(id - OpsQueries.PlantedSemTwinBase))
    assert(condTwins.nonEmpty,
      "fixture sanity: some planted twin's base must hold a stored vector")
    val day1Kept = spark.read.parquet(DailyIngest.textOut(rootS, 1))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val semLeaked = condTwins.count(day1Kept.contains)
    assert(semLeaked == 0,
      s"$semLeaked planted semantic twins survived the streamed embedding stage")
    // right-to-be-forgotten against the STREAM-built root: the ledger
    // and store formats are shared with the batch path, so takedown
    // needs no streaming-specific code — prove it (ADVICE r17 optional)
    import spark.implicits._
    val vic = spark.read.parquet(DailyIngest.textOut(rootS, 0))
      .select("doc_id").orderBy("doc_id").limit(1)
      .collect().map(_.getLong(0)).head
    DailyIngest.takedown(spark, rootS, docs,
      emptyMedia.withColumn("day", lit(0)),
      Seq(vic).toDF("doc_id"), Seq.empty[Long].toDF("media_id"),
      takedownId = "s1")
    assert(spark.read.parquet(DailyIngest.textOut(rootS, 0))
      .where(col("doc_id") === vic).count() == 0,
      "the victim must leave the stream-built root's day output")
    assert(graft.ops.MinHashBandStore.loadSigs(spark, DailyIngest.mhStore(rootS))
      .where(col("doc_id") === vic).count() == 0,
      "the victim must leave the stream-built root's band store")
    assert(new java.io.File(s"$rootS/_ledger/takedown_s1").exists(),
      "takedown completion marker on the stream-built root")
  }

  test("mid-stream takedown: a pending takedown fails the next micro-batch loudly; completed takedown + restart replays it green") {
    import graft.examples.DailyIngest
    import graft.streaming.DocsStream
    import graft.ops.OpsQueries
    import spark.implicits._
    val docs = OpsQueries.dailyDocs(spark, dir, 2)
    val bench = OpsQueries.dailyBench(spark, dir)
    val cols = Seq("url", "doc_id", "text", "lang", "source", "n_chars").map(col)
    def emptyMedia = spark.range(0).select(col("id").as("media_id"),
      lit("image").as("kind"), lit("image/png").as("mime"),
      lit(16).as("width"), lit(16).as("height"), lit(1).as("n_frames"),
      lit(0).as("sample_rate"), lit(null).cast("binary").as("content"))
    val streamDir = java.nio.file.Files.createTempDirectory("di-mid-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("di-mid-ckpt").toString
    val rootS = java.nio.file.Files.createTempDirectory("di-mid-root").toString
    def stageFile(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"di-mid-$name").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dest = new java.io.File(streamDir, name)
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      assert(dest.setLastModified(mtime), "test setup: mtime must stick")
    }
    val now = System.currentTimeMillis()
    val embLookup = Some(OpsQueries.dailyEmb(spark, dir, 2).drop("day"))
    stageFile(docs.where(col("day") === 0).select(cols: _*), "day0.parquet", now - 180000)
    stageFile(docs.where(col("day") === 1).select(cols: _*), "day1.parquet", now - 120000)
    val q1 = DocsStream.startDailyIngestQuery(spark, streamDir, ckpt, rootS, bench,
      embLookup = embLookup)
    try q1.processAllAvailable() finally q1.stop()
    assert(new java.io.File(s"$rootS/_ledger/day_1").exists(),
      "fixture sanity: the stream must have ledgered days 0 and 1")
    // a takedown whose phase 2 crashed before the completion marker:
    // staged victims present, stores (partially) mutated, marker absent
    val vic = spark.read.parquet(DailyIngest.textOut(rootS, 0))
      .select("doc_id").orderBy("doc_id").limit(1)
      .collect().map(_.getLong(0)).head
    // the takedown's lake frame is what the ingest run CONSUMED (days
    // 0-1) — passing the not-yet-ingested day 2 would pre-commit its
    // keys into the rebuilt blooms and shed the whole day on arrival
    val lake = docs.where(col("day") <= 1)
    DailyIngest.takedown(spark, rootS, lake, emptyMedia.withColumn("day", lit(0)),
      Seq(vic).toDF("doc_id"), Seq.empty[Long].toDF("media_id"),
      takedownId = "mid1")
    assert(new java.io.File(s"$rootS/_ledger/takedown_mid1").delete(),
      "test setup: simulate the pre-marker crash")
    // the next micro-batch must fail LOUDLY on the pending-takedown
    // fence — composing it would let the takedown retry's bloom
    // rebuilds erase the new day's commitments (see the fence scaladoc)
    stageFile(docs.where(col("day") === 2).select(cols: _*), "day2.parquet", now - 60000)
    val q2 = DocsStream.startDailyIngestQuery(spark, streamDir, ckpt, rootS, bench,
      embLookup = embLookup)
    val err = intercept[Throwable] { try q2.processAllAvailable() finally q2.stop() }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.toString +: chain(e.getCause))
    assert(chain(err).exists(_.contains("pending takedown")),
      s"the batch must fail on the takedown fence, got: ${chain(err).mkString(" <- ")}")
    assert(!new java.io.File(s"$rootS/_ledger/day_2").exists(),
      "the fenced batch must not have ledgered day 2")
    // complete the takedown (retry converges from the staged victim
    // set), restart from the checkpoint: Structured Streaming replays
    // the failed batch under the SAME batchId and the day ingests green
    DailyIngest.takedown(spark, rootS, lake, emptyMedia.withColumn("day", lit(0)),
      Seq(vic).toDF("doc_id"), Seq.empty[Long].toDF("media_id"),
      takedownId = "mid1")
    assert(new java.io.File(s"$rootS/_ledger/takedown_mid1").exists(),
      "takedown completion marker after the converging retry")
    val q3 = DocsStream.startDailyIngestQuery(spark, streamDir, ckpt, rootS, bench,
      embLookup = embLookup)
    try q3.processAllAvailable() finally q3.stop()
    assert(new java.io.File(s"$rootS/_ledger/day_2").exists(),
      "the replayed batch must ledger day 2 after the takedown completed")
    assert(spark.read.parquet(DailyIngest.textOut(rootS, 2)).count() > 0,
      "day 2 must have survivors on the replayed batch")
    (0 to 2).foreach { day =>
      assert(spark.read.parquet(DailyIngest.textOut(rootS, day))
        .where(col("doc_id") === vic).count() == 0,
        s"the victim must stay out of day $day's output after the replay")
    }
  }

  test("streaming MEDIA daily ingest: batchId-ledgered stream equals batch ingestDay per day (outputs, store, shard bytes)") {
    import graft.examples.DailyIngest
    import graft.streaming.{DocsStream, MediaStream}
    import graft.ops.OpsQueries
    val media = OpsQueries.dailyMedia(spark, dir, 1)
    val bench = OpsQueries.dailyBench(spark, dir)
    val mCols = MediaStream.mediaSchema.fieldNames.map(col).toSeq
    val day0 = media.where(col("day") === 0).select(mCols: _*)
    val day1 = media.where(col("day") === 1).select(mCols: _*)
    def emptyDocs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      DocsStream.crawlDocSchema)
    def emptyEmb = spark.range(0)
      .select(col("id").as("doc_id"),
        lit(null).cast("array<double>").as("embedding"))
    // batch twin: the same two media days through ingestDay directly
    val rootB = java.nio.file.Files.createTempDirectory("mi-stream-batch").toString
    DailyIngest.ingestDay(spark, emptyDocs, day0, bench, rootB, 0,
      dayEmb = Some(emptyEmb))
    DailyIngest.ingestDay(spark, emptyDocs, day1, bench, rootB, 1,
      dayEmb = Some(emptyEmb))
    // stream: one staged file per day, mtime-ordered
    val streamDir = java.nio.file.Files.createTempDirectory("mi-stream-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("mi-stream-ckpt").toString
    val rootS = java.nio.file.Files.createTempDirectory("mi-stream-root").toString
    def stageFile(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"mi-stage-$name").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dest = new java.io.File(streamDir, name)
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      assert(dest.setLastModified(mtime), "test setup: mtime must stick")
    }
    val now = System.currentTimeMillis()
    stageFile(day0, "day0.parquet", now - 120000)
    stageFile(day1, "day1.parquet", now - 60000)
    val q = MediaStream.startDailyIngestQuery(spark, streamDir, ckpt, rootS, bench)
    try q.processAllAvailable() finally q.stop()
    (0 to 1).foreach { day =>
      val b = spark.read.parquet(DailyIngest.mediaOut(rootB, day))
        .select("media_id").collect().map(_.getLong(0)).toSet
      val st = spark.read.parquet(DailyIngest.mediaOut(rootS, day))
        .select("media_id").collect().map(_.getLong(0)).toSet
      assert(b.nonEmpty, s"fixture sanity: day $day must keep assets")
      assert(st == b, s"stream/batch media divergence on day $day: ${st.size} vs ${b.size}")
      // the packed BYTE shards are identical streams: same survivors,
      // same pack order, same budgets
      def shardMd5s(root: String) = spark.read
        .parquet(DailyIngest.mediaShardOut(root, day))
        .select(col("kind"), col("shard"), md5(col("shard_bytes")).as("m"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      assert(shardMd5s(rootS) == shardMd5s(rootB),
        s"stream/batch shard-byte divergence on day $day")
    }
    // the signature stores the two paths accumulated hold the same rows
    def sigRows(root: String) = graft.multimodal.SignatureStore
      .load(spark, DailyIngest.sigStore(root))
      .select("media_id", "kind", "sig")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(sigRows(rootS) == sigRows(rootB),
      "stream and batch signature stores must hold the same rows")
  }

  test("COMPOSED streaming keystone: one ledgered stream drives all five stores ≡ batch") {
    import graft.examples.DailyIngest
    import graft.streaming.DocsStream
    import graft.ops.OpsQueries
    val docs = OpsQueries.dailyDocs(spark, dir, 1)
    val media = OpsQueries.dailyMedia(spark, dir, 1)
    val embAll = OpsQueries.dailyEmb(spark, dir, 1)
    val bench = OpsQueries.dailyBench(spark, dir)
    val dCols = Seq("url", "doc_id", "text", "lang", "source", "n_chars").map(col)
    def dayDocs(i: Int) = docs.where(col("day") === i).select(dCols: _*)
    def dayMedia(i: Int) = media.where(col("day") === i).drop("day")
    def dayEmb(i: Int) = embAll.where(col("day") === i).drop("day")
    // batch twin: both days through the one ingestDay call per day
    val rootB = java.nio.file.Files.createTempDirectory("comp-batch").toString
    (0 to 1).foreach { i =>
      DailyIngest.ingestDay(spark, dayDocs(i), dayMedia(i), bench, rootB, i,
        dayEmb = Some(dayEmb(i)))
    }
    // stream: the docs file stream is the trigger; media rides along
    // day-keyed, vectors id-keyed — one foreachBatch = one ledger day
    val streamDir = java.nio.file.Files.createTempDirectory("comp-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("comp-ckpt").toString
    val rootS = java.nio.file.Files.createTempDirectory("comp-root").toString
    def stageFile(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"comp-stage-$name").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dest = new java.io.File(streamDir, name)
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      assert(dest.setLastModified(mtime), "test setup: mtime must stick")
    }
    val now = System.currentTimeMillis()
    stageFile(dayDocs(0), "day0.parquet", now - 120000)
    stageFile(dayDocs(1), "day1.parquet", now - 60000)
    val q = DocsStream.startDailyIngestQuery(spark, streamDir, ckpt, rootS, bench,
      embLookup = Some(embAll.drop("day")), mediaLookup = Some(media))
    try q.processAllAvailable() finally q.stop()
    // every family's daily outputs and every store agree with batch
    (0 to 1).foreach { day =>
      def ids(root: String, path: Int => String, c: String) = spark.read
        .parquet(path(day)).select(c).collect().map(_.getLong(0)).toSet
      val tB = ids(rootB, DailyIngest.textOut(rootB, _), "doc_id")
      val tS = ids(rootS, DailyIngest.textOut(rootS, _), "doc_id")
      assert(tB.nonEmpty && tS == tB, s"text divergence on day $day")
      val mB = ids(rootB, DailyIngest.mediaOut(rootB, _), "media_id")
      val mS = ids(rootS, DailyIngest.mediaOut(rootS, _), "media_id")
      assert(mB.nonEmpty && mS == mB, s"media divergence on day $day")
      def shardMd5s(root: String) = spark.read
        .parquet(DailyIngest.mediaShardOut(root, day))
        .select(col("kind"), col("shard"), md5(col("shard_bytes")).as("m"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      assert(shardMd5s(rootS) == shardMd5s(rootB),
        s"media shard-byte divergence on day $day")
    }
    def md5Of(p: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
      .map("%02x".format(_)).mkString
    Seq(DailyIngest.urlStore _, DailyIngest.textStore _).foreach { store =>
      assert(md5Of(s"${store(rootS)}/bloom.bin") == md5Of(s"${store(rootB)}/bloom.bin"),
        "stream and batch blooms must be byte-identical")
    }
    def sigRowsC(root: String) = graft.multimodal.SignatureStore
      .load(spark, DailyIngest.sigStore(root))
      .select("media_id", "kind", "sig")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(sigRowsC(rootS) == sigRowsC(rootB),
      "stream and batch signature stores must hold the same rows")
    def postingsC(root: String) = spark.read
      .parquet(s"${DailyIngest.embStore(root)}/postings.parquet")
      .select("id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val pB = postingsC(rootB)
    assert(pB.nonEmpty && postingsC(rootS) == pB,
      "stream and batch embedding stores must hold the same postings")
  }

  test("streaming store novelty (all kinds) equals its batch twin") {
    import graft.multimodal.{Multimodal, MultimodalQueries, SignatureStore}
    import graft.streaming.MediaStream
    val history = Multimodal.syntheticMedia(spark, dir)
    val storeDir = java.nio.file.Files.createTempDirectory("stream-store").toString
    SignatureStore.build(history, storeDir)
    val store = SignatureStore.load(spark, storeDir)
    val incoming = MultimodalQueries.noveltyIncomingAllKinds(spark, dir)
    val batch = SignatureStore.noveltyAgainstStore(incoming, store)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(batch.nonEmpty)
    val streamDir = java.nio.file.Files.createTempDirectory("store-novel-in").toString
    val outDir = java.nio.file.Files.createTempDirectory("store-novel-out").toString + "/out"
    val ckpt = java.nio.file.Files.createTempDirectory("store-novel-ckpt").toString
    incoming.coalesce(1).write.mode("append").parquet(streamDir)
    val q = MediaStream.startStoreNoveltyQuery(spark, streamDir, outDir, ckpt, store)
    try {
      q.processAllAvailable()
      val stream = spark.read.parquet(outDir)
        .select("media_id").collect().map(_.getLong(0)).toSet
      assert(stream == batch,
        s"stream/batch divergence: ${stream.size} vs ${batch.size}")
      // twins of history assets (any kind) are shed on arrival
      assert(!stream.exists(id => id >= 10000000L && id < 30000000L),
        "a history twin survived the stream stage")
    } finally q.stop()
  }

  test("streaming image quality scoring equals its batch twin") {
    import graft.multimodal.{Multimodal, MultimodalQueries}
    import graft.streaming.MediaStream
    val media = MultimodalQueries.mediaWithPlantedBlanks(spark, dir)
    val batch = Multimodal.imageQualityStats(media)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(batch.nonEmpty)
    val streamDir = java.nio.file.Files.createTempDirectory("media-quality").toString
    media.coalesce(1).write.mode("append").parquet(streamDir)
    val q = MediaStream.startImageQualityQuery(spark, streamDir, "mediaQuality")
    try {
      q.processAllAvailable()
      val stream = spark.table("mediaQuality")
        .collect().map(r => r.getLong(0) -> r.toSeq).toMap
      assert(stream == batch, s"stream/batch divergence: ${stream.size} vs ${batch.size}")
      // planted blanks arrive flagged
      assert(spark.table("mediaQuality")
        .where(col("media_id") >= 40000000L && !col("low_information")).count() == 0)
    } finally q.stop()
  }

  test("streaming benchmark decontamination equals its batch twin") {
    import graft.multimodal.{Multimodal, MultimodalQueries, SignatureStore}
    import graft.streaming.MediaStream
    val storeDir = java.nio.file.Files.createTempDirectory("bench-store").toString + "/store"
    SignatureStore.build(Multimodal.syntheticMedia(spark, dir)
      .where(pmod(col("media_id"), lit(11)) === 5), storeDir)
    val store = SignatureStore.load(spark, storeDir)
    val training = MultimodalQueries.trainingWithBenchLeakage(spark, dir)
    val batch = SignatureStore.noveltyAgainstStore(training, store)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(batch.nonEmpty)
    val streamDir = java.nio.file.Files.createTempDirectory("bench-in").toString
    val outDir = java.nio.file.Files.createTempDirectory("bench-out").toString + "/out"
    val ckpt = java.nio.file.Files.createTempDirectory("bench-ckpt").toString
    training.coalesce(1).write.mode("append").parquet(streamDir)
    val q = MediaStream.startStoreNoveltyQuery(spark, streamDir, outDir, ckpt, store)
    try {
      q.processAllAvailable()
      val stream = spark.read.parquet(outDir)
        .select("media_id").collect().map(_.getLong(0)).toSet
      assert(stream == batch,
        s"stream/batch divergence: ${stream.size} vs ${batch.size}")
      // planted re-encoded benchmark twins are filtered on arrival
      assert(!stream.exists(_ >= MultimodalQueries.BenchTwinOffset),
        "a leaked benchmark twin reached the training output")
    } finally q.stop()
  }

  test("A/V quality stats: one decode per clip / per frame, full coverage") {
    import graft.multimodal.{Codec, Multimodal, MultimodalQueries}
    // parquet-stage the planted frame so the decode budget measures the
    // operators, not a constant-folded LocalRelation (SCALING.md), and
    // so the payload-synth UDFs run once here instead of inside the
    // measured stage
    val media = MultimodalQueries.mediaWithPlantedAvDegenerates(spark, dir)
    val stageDir = java.nio.file.Files.createTempDirectory("av-quality").toString
    media.write.mode("overwrite").parquet(stageDir)
    val staged = spark.read.parquet(stageDir)
    val nAudio = staged.where(col("kind") === "audio").count()
    Codec.decodeCalls.reset()
    val audio = Multimodal.audioQualityStats(staged).collect()
    val audioBill = Codec.decodeCalls.sum()
    assert(audio.length == nAudio, "every decodable clip emits exactly one row")
    assert(audioBill <= nAudio,
      s"audio stats decoded $audioBill payloads for $nAudio clips — a clip decoded twice")
    // silence/rms/clipping agree with the flag definition on every row
    audio.foreach { r =>
      val flagged = r.getAs[Boolean]("low_information")
      val expect = r.getAs[Double]("silence_fraction") > 0.9 ||
        r.getAs[Double]("rms") < 0.01 || r.getAs[Double]("clipping_rate") > 0.3
      assert(flagged == expect, s"flag/stat disagreement: $r")
    }
    val vids = staged.where(col("kind") === "video")
    val nVideo = vids.count()
    val totalFrames = vids.agg(sum(col("n_frames"))).head.getLong(0)
    Codec.decodeCalls.reset()
    val video = Multimodal.videoQualityStats(staged).collect()
    val videoBill = Codec.decodeCalls.sum()
    assert(video.length == nVideo, "every decodable container emits exactly one row")
    assert(videoBill <= totalFrames,
      s"video stats decoded $videoBill frames for $totalFrames total — a frame decoded twice")
  }

  test("streaming content dedup equals the batch hash set on the fixture") {
    import spark.implicits._
    // the fixture carries no crawl time — stage it with a synthetic one
    // (monotone in doc_id, all inside one horizon) so the single-batch
    // stream must reproduce the batch distinct-hash set exactly
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("crawl_ts", expr("timestamp_seconds(1700000000 + doc_id)"))
    val batch = DocsStream.dedupByContentBatchKeys(docs)
      .collect().map(_.getString(0)).toSet
    assert(batch.nonEmpty && batch.size < docs.count(),
      "fixture sanity: the documents fixture contains exact-prefix duplicates")

    val streamDir = java.nio.file.Files.createTempDirectory("docs-dedup").toString
    docs.coalesce(1).write.mode("append").parquet(streamDir)
    val q = DocsStream.startContentDedupQuery(spark, streamDir, "cdtest")
    try {
      q.processAllAvailable()
      val out = spark.table("cdtest").collect()
      val streamKeys = out.map(_.getAs[String]("h")).toSet
      assert(streamKeys == batch,
        s"stream/batch hash-set divergence: ${streamKeys.size} vs ${batch.size}")
      assert(out.length == batch.size,
        "exactly one survivor row per content hash within the horizon")
    } finally q.stop()
  }

  test("streaming content dedup: in-horizon dups drop, late rows drop, post-horizon re-crawls re-emit") {
    import spark.implicits._
    // controlled micro-batches against dedupByContent's documented
    // contract (10-minute horizon). Content A/B/C... are full texts whose
    // normalized 80-char prefixes differ.
    def doc(id: Long, offsetMin: Long, text: String) =
      (id, text, "en", "crawl", text.length.toLong,
        new java.sql.Timestamp((1700000000L + offsetMin * 60L) * 1000L))
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars", "crawl_ts")
    val streamDir = java.nio.file.Files.createTempDirectory("docs-dedup-late").toString

    // batch 1: A at t=0, B at t=112, sentinel S at t=120 → watermark 110
    Seq(doc(1, 0, "alpha content body"), doc(2, 112, "beta content body"),
        doc(99, 120, "sentinel content body"))
      .toDF(cols: _*).coalesce(1).write.mode("append").parquet(streamDir)
    val q = DocsStream.startContentDedupQuery(spark, streamDir, "cdlate")
    try {
      q.processAllAvailable()
      assert(spark.table("cdlate").count() == 3,
        "batch 1: three fresh content hashes all emit")

      // batch 2:
      //  id=3: dup of B at t=113 — inside the horizon, state alive → DROPPED
      //  id=4: dup of A at t=114 — A's state (event time 0) fell behind the
      //        watermark and was evicted → RE-EMITTED (at-least-once beyond
      //        the horizon, the documented trade)
      //  id=5: novel content at t=2 — behind the watermark → late, dropped
      //  id=6: novel content at t=116 — in horizon → emitted
      Seq(doc(3, 113, "beta content body"), doc(4, 114, "alpha content body"),
          doc(5, 2, "gamma novel body"), doc(6, 116, "delta novel body"))
        .toDF(cols: _*).coalesce(1).write.mode("append").parquet(streamDir)
      q.processAllAvailable()

      val ids = spark.table("cdlate").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(ids == Set(1L, 2L, 99L, 4L, 6L),
        s"contract violation — emitted ids: $ids (expected in-horizon dup 3 " +
          "and late row 5 dropped, post-horizon re-crawl 4 re-emitted)")
    } finally q.stop()
  }

  test("windowed dedup drops beyond-watermark late arrivals, keeps in-horizon ones") {
    import spark.implicits._
    // two controlled micro-batches: batch 1 advances the watermark to
    // maxTs − 10 min, batch 2 replays events shuffled past that horizon.
    // Documented semantics under test (EventsStream.dedupWindowed): keys
    // arriving within the watermark delay are emitted exactly once; rows
    // whose event time is older than the watermark — duplicate OR novel —
    // are late and dropped, never re-emitted as "new" after state expiry.
    val base = 1700000000L * 1000000000L // epoch nanos, 2023-11-14T22:13:20Z
    def ev(id: Long, offsetMin: Long, user: Long, typ: String) =
      (id, base + offsetMin * 60L * 1000000000L, user, typ, 1.0, "{}")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

    val streamDir = java.nio.file.Files.createTempDirectory("events-late").toString
    // batch 1: key A at t=0min; sentinel key S at t=120min pushes the
    // watermark to 110min once the batch commits
    Seq(ev(1, 0, 1, "view"), ev(2, 120, 99, "view"))
      .toDF(cols: _*).coalesce(1).write.mode("append").parquet(streamDir)
    val q = EventsStream.startDedupQuery(spark, streamDir, "latetest")
    try {
      q.processAllAvailable()
      val afterBatch1 = spark.table("latetest").count()
      assert(afterBatch1 == 2, s"batch 1 should emit both fresh keys, got $afterBatch1")

      // batch 2, all shuffled out of order relative to batch 1:
      //  id=3: duplicate of key A inside A's window, t=1min  << 110min horizon → late, dropped
      //  id=4: NOVEL key at t=2min                           << horizon → late, dropped
      //  id=5: novel key at t=115min, within the horizon     → emitted
      Seq(ev(3, 1, 1, "view"), ev(4, 2, 2, "click"), ev(5, 115, 3, "view"))
        .toDF(cols: _*).coalesce(1).write.mode("append").parquet(streamDir)
      q.processAllAvailable()

      val out = spark.table("latetest")
        .collect().map(r => (r.getLong(1), r.getString(2))).toSeq
      assert(out.size == 3, s"exactly one in-horizon row may join the 2 from batch 1, got $out")
      assert(out.count(_ == (1L, "view")) == 1, "late duplicate of key A must not re-emit")
      assert(!out.exists(_._1 == 2L), "beyond-watermark novel key must be dropped as late")
      assert(out.contains((3L, "view")), "in-horizon novel key must be emitted")
    } finally q.stop()
  }

  test("stateful sessionize equals the gaps-and-islands window twin") {
    import spark.implicits._
    // same 30-min gap rule, two execution paradigms: the q29 relational
    // form (windows + running sum) and flatMapGroupsWithState. Session
    // boundaries depend only on consecutive timestamps (ties contribute
    // gap 0 under either tie-break), so the (user, n_events, total)
    // session multisets must match exactly.
    val relational = graft.rel.RelationalQueries.q29Sessions.fn(spark, dir)
      .select("user_id", "n_events", "total_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val events = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[SessionEvent]
    val stateful = EventsStream.sessionize(events, gapMinutes = 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(relational == stateful,
      s"paradigm divergence: ${relational.size} vs ${stateful.size} distinct sessions")
  }

  test("exactly-once parquet ingest: manifest-committed, restart-safe, stray-file-proof") {
    val src = java.nio.file.Files.createTempDirectory("ingest-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      src.resolve("events.parquet"))
    val out = java.nio.file.Files.createTempDirectory("ingest-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ingest-ckpt").toString

    val q1 = EventsStream.startParquetIngest(spark, src.toString, out, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    val expected = graft.Tables.events(spark, dir).count()
    assert(spark.read.parquet(out).count() == expected, "ingest must equal batch")

    // restart from the same checkpoint with no new source files: the
    // committed-batch log must prevent any re-emission
    val q2 = EventsStream.startParquetIngest(spark, src.toString, out, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(out).count() == expected, "restart re-emitted rows")

    // a stray parquet dropped into a partition dir (torn write, stale
    // task attempt) is NOT in the manifest and must stay invisible
    val someDay = new java.io.File(out).listFiles()
      .find(f => f.isDirectory && f.getName.startsWith("event_date=")).get
    val stray = graft.Tables.events(spark, dir).limit(100)
      .withColumn("event_date", to_date(col("ts")))
    val tmpStray = java.nio.file.Files.createTempDirectory("stray").toString
    stray.drop("event_date").coalesce(1).write.mode("overwrite").parquet(tmpStray)
    val part = new java.io.File(tmpStray).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      someDay.toPath.resolve("part-stray.parquet"))
    assert(spark.read.parquet(out).count() == expected,
      "a file outside the sink manifest leaked into reads")
  }

  test("built-in session_window equals the gaps-and-islands twin") {
    // third paradigm, same 30-min rule: Catalyst's native session_window
    // aggregation vs the q29 relational form. (Boundary nuance: the
    // built-in merges gaps STRICTLY under the threshold, q29 also merges
    // exact-threshold gaps — the fixture's microsecond timestamps make an
    // exact 30:00.000000 gap impossible, so the multisets must agree.)
    val relational = graft.rel.RelationalQueries.q29Sessions.fn(spark, dir)
      .select("user_id", "n_events", "total_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val builtin = EventsStream.sessionWindowAgg(graft.Tables.events(spark, dir))
      .select("user_id", "n_events", "total_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(relational == builtin,
      s"paradigm divergence: ${relational.size} vs ${builtin.size} distinct sessions")
  }

  test("sessionize conserves events across closed + open sessions") {
    import spark.implicits._
    val events = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[SessionEvent]
    val sessions = EventsStream.sessionize(events, gapMinutes = 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val totals = graft.Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // every event lands in exactly one emitted session: per-user sums of
    // session counts/values must equal the user's totals
    val byUser = sessions.groupBy(_._1)
    assert(byUser.keySet == totals.keySet)
    byUser.foreach { case (u, ss) =>
      assert(ss.map(_._2).sum == totals(u)._1, s"user $u event count not conserved")
      assert(math.abs(ss.map(_._3).sum - totals(u)._2) < 1e-6, s"user $u value not conserved")
      assert(ss.count(!_._4) <= 1, s"user $u has multiple open sessions")
    }
    // the 30-min gap over this fixture actually closes some sessions
    assert(sessions.exists(_._4), "expected at least one closed session")
  }
}
