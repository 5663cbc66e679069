package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input behavior: operators over empty/trivial frames must
  * return empty/identity results or fail with a CLEAR message — never a
  * partition-dependent crash or a silent wrong answer. */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsLike(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
  private def embLike(rows: Seq[(Long, Array[Double])]) = rows.toDF("vec_id", "embedding")

  test("dedup operators on an empty corpus return no pairs") {
    val empty = docsLike(Nil)
    assert(ops.Dedup.jaccardPairs(empty).count() == 0)
    assert(ops.Dedup.minhashLshPairs(empty).count() == 0)
    assert(ops.Dedup.simhashPairs(empty).count() == 0)
    assert(ops.Dedup.exactGroups(empty).count() == 0)
  }

  test("canonicalize of no pairs is an empty assignment") {
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(ops.Dedup.canonicalize(noPairs).count() == 0)
  }

  test("text functions handle empty and null text") {
    val df = Seq((1L, ""), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = df.select(
      text.TextFunctions.tokenCount(col("text")).as("n"),
      text.TextFunctions.fingerprint(col("text")).as("fp"),
      text.TextFunctions.qualityScore(col("text")).as("q")).collect()
    // empty/blank text: zero tokens, zero fingerprint, quality 0
    assert(out(0).getInt(0) == 0 && out(0).getLong(1) == 0L)
    assert(out(1).getInt(0) == 0)
    assert(out(0).getDouble(2) == 0.0)
    // null text propagates null, never throws
    assert(out(2).isNullAt(0) && out(2).isNullAt(1) && out(2).isNullAt(2))
  }

  test("repetition score: short/null docs are 0, repeated trigrams measured") {
    val df = Seq(
      (1L, "a b"),                       // < 3 tokens → 0.0
      (2L, ""),                          // empty → 0.0
      (3L, null.asInstanceOf[String]),   // null → 0.0 (falls to otherwise)
      (4L, "a b c a b c a b c"),         // 7 trigrams, 3 distinct → 1 − 3/7
      (5L, "w x y z"))                   // all distinct → 0.0
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        text.TextFunctions.repetitionScoreFromTokens(
          text.TextFunctions.tokens(col("text"))).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 0.0 && out(2L) == 0.0 && out(3L) == 0.0 && out(5L) == 0.0)
    assert(math.abs(out(4L) - (1.0 - 3.0 / 7.0)) < 1e-15)
  }

  test("contamination: empty corpus and empty benchmark both degrade cleanly") {
    val empty = docsLike(Nil)
    assert(text.TextQueries.contaminationVs(empty, lit(false), 0.05).count() == 0)
    // no doc matches the benchmark predicate → no hits → nothing above a
    // positive threshold; threshold 0 reports every corpus doc at 0.0
    val docs = docsLike(Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta")))
    assert(text.TextQueries.contaminationVs(docs, lit(false), 0.05).count() == 0)
    val all = text.TextQueries.contaminationVs(docs, lit(false), 0.0)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(all.length == 2 && all.forall(_._2 == 0.0))
    // a doc sharing a trigram with the benchmark is flagged
    val mixed = docsLike(Seq(
      (7L, "the quick brown fox jumps"),
      (1L, "a quick brown fox runs away fast")))
    val hit = text.TextQueries.contaminationVs(mixed, col("doc_id") === 7, 0.1)
      .collect()
    assert(hit.length == 1 && hit(0).getLong(0) == 1L && hit(0).getLong(2) == 1L,
      s"expected doc 1 flagged with 1 shared trigram (quick brown fox), got ${hit.toSeq}")
  }

  test("contamination: null-text documents contribute no shingles (oracle NULL semantics)") {
    // regression for the null-text guard: without the isNotNull filter a
    // null doc either NPEs the shingle UDF or (with a coalesce) emits a
    // spurious '' shingle that the DuckDB oracle would not emit
    val docs = docsLike(Seq(
      (7L, "the quick brown fox jumps"),
      (1L, "a quick brown fox runs away fast"),
      (2L, null.asInstanceOf[String])))
    // threshold 0 reports every corpus doc that produced shingles: the
    // null doc must be absent entirely, not present at 0.0
    val all = text.TextQueries.contaminationVs(docs, col("doc_id") === 7, 0.0)
      .collect().map(_.getLong(0)).toSet
    assert(all == Set(1L), s"null-text doc must emit no rows, got ids $all")
  }

  test("bloom contamination: empty benchmark cohort flags nothing (and never throws)") {
    // the bloom aggregate over zero rows yields an empty filter; every
    // membership test is then false and no corpus doc crosses any
    // positive threshold — same as the exact twin on the same input
    val docs = docsLike(Seq(
      (1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta")))
    assert(text.TextQueries
      .contaminationBloomVs(docs, lit(false), 0.05, 1e-4).count() == 0)
    assert(text.TextQueries
      .contaminationBloomVs(docsLike(Nil), lit(false), 0.05, 1e-4).count() == 0)
  }

  test("lm perplexity: empty corpus and sub-bigram docs yield empty output, not a crash") {
    assert(text.TextQueries.lmPerplexityVs(docsLike(Nil)).count() == 0)
    // one-token and null docs carry no bigram evidence; a corpus of ONLY
    // those must come back empty (vocab still counts the lone token)
    val noEvidence = docsLike(Seq(
      (1L, "single"), (2L, null.asInstanceOf[String]), (3L, "")))
    assert(text.TextQueries.lmPerplexityVs(noEvidence).count() == 0)
  }

  test("temperature rates: empty input yields no rates; single source gets min(1, budget/n)") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "src")
    assert(ops.Corpus.temperatureRates(empty, col("src"), 0.5, 100L).count() == 0)
    val one = (1 to 40).map(i => (i.toLong, "only")).toDF("doc_id", "src")
    val r = ops.Corpus.temperatureRates(one, col("src"), 0.5, 100L).collect()
    assert(r.length == 1 && r(0).getDouble(1) == 1.0,
      "budget over corpus size clamps to keep-everything")
    val r2 = ops.Corpus.temperatureRates(one, col("src"), 0.5, 10L).collect()
    assert(r2(0).getDouble(1) == 0.25, "single source: rate = budget/n")
  }

  test("c4 cleaning: empty corpus, all-pages-cut corpus, and null text degrade cleanly") {
    assert(text.TextQueries.c4LineClean(docsLike(Nil)).count() == 0)
    // every page violates a PAGE rule (blocklist or line floor) → empty,
    // and the null-text page must not NPE inside the line lambdas
    val cut = docsLike(Seq(
      (1L, "lorem ipsum dolor sit amet.\nfine prose line here."),
      (2L, "code page { with a brace."),
      (3L, "only one good line here."),
      (4L, null.asInstanceOf[String])))
    assert(text.TextQueries.c4LineClean(cut).count() == 0)
  }

  test("dsir: empty corpus yields no weights; all-target corpus yields no raw docs") {
    assert(text.TextQueries.dsirWeights(docsLike(Nil), lit(true)).count() == 0)
    val docs = docsLike(Seq((1L, "some words here"), (2L, "more words there")))
    assert(text.TextQueries.dsirWeights(docs, lit(true)).count() == 0,
      "everything in the target cohort → nothing to score")
  }

  test("bm25: empty corpus returns the typed empty frame; query-only corpus has no index") {
    assert(text.TextQueries.bm25TopK(docsLike(Nil), lit(true)).count() == 0)
    val docs = docsLike(Seq((1L, "query text"), (2L, "another query")))
    assert(text.TextQueries.bm25TopK(docs, lit(true)).count() == 0,
      "no corpus side → nothing retrievable, not a divide-by-zero on avgdl")
  }

  test("paragraph dedup: empty corpus and all-null text yield empty output") {
    assert(text.TextQueries.paragraphDedup(docsLike(Nil)).count() == 0)
    assert(text.TextQueries.paragraphDedup(
      docsLike(Seq(1L -> null.asInstanceOf[String]))).count() == 0)
  }

  test("span scrub: empty corpus, empty bench, and bad params degrade cleanly") {
    assert(text.TextQueries.scrubContaminatedSpans(docsLike(Nil), lit(true)).count() == 0)
    val docs = docsLike(Seq(1L -> ("plenty of ordinary words here to clear " +
      "the window floor without any benchmark overlap at all")))
    assert(text.TextQueries.scrubContaminatedSpans(docs, lit(false)).count() == 0,
      "no bench docs → nothing scrubbed")
    intercept[IllegalArgumentException] {
      text.TextQueries.scrubContaminatedSpans(docs, lit(false), stride = 0)
    }
  }

  test("top n-grams: empty corpus is empty; CMS rejects empty queries and bad eps") {
    assert(text.TextQueries.topNgrams(docsLike(Nil)).count() == 0)
    // an empty-corpus sketch estimates zero, it doesn't crash
    assert(text.TextQueries.ngramSketchEstimates(docsLike(Nil), Seq("a b c"))
      .head.getLong(1) == 0L)
    intercept[IllegalArgumentException] {
      text.TextQueries.ngramSketchEstimates(docsLike(Nil), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      text.TextQueries.ngramSketchEstimates(docsLike(Nil), Seq("a b c"), eps = 0.0)
    }
    intercept[IllegalArgumentException] {
      text.TextQueries.topNgrams(docsLike(Nil), k = 0)
    }
  }

  test("dup-span scrub and vocab sketches degrade cleanly on empty/degenerate input") {
    assert(text.TextQueries.scrubDupSpans(docsLike(Nil)).count() == 0)
    // a corpus of all-unique text cuts nothing
    assert(text.TextQueries.scrubDupSpans(docsLike(Seq(
      1L -> "completely unique first document text with no repeats anywhere",
      2L -> "a second document sharing not one sixteen char window with any"
    )), windowChars = 16, stride = 4).count() == 0)
    intercept[IllegalArgumentException] {
      text.TextQueries.scrubDupSpans(docsLike(Nil), windowChars = 0)
    }
    val emptySrc = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "source", "text")
    assert(text.TextQueries.vocabHllVs(emptySrc).count() == 0)
    intercept[IllegalArgumentException] {
      text.TextQueries.vocabHllVs(emptySrc, rsd = 0.0)
    }
  }

  test("source overlap and leakage split degrade cleanly on empty/degenerate input") {
    val emptySrc = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "source", "text")
    assert(ops.Dedup.sourceOverlap(emptySrc).count() == 0)
    assert(ops.Dedup.sourceOverlapMinhashVs(emptySrc).count() == 0)
    intercept[IllegalArgumentException] {
      ops.Dedup.sourceOverlapMinhashVs(emptySrc, numHashes = 0)
    }
    // a single source has no pairs
    val one = Seq((1L, "only", "some text here please")).toDF("doc_id", "source", "text")
    assert(ops.Dedup.sourceOverlap(one).count() == 0)
    // empty cluster frame: leakageSafeSplit == hashSplit exactly
    val docs = docsLike(Seq(1L -> "alpha text", 2L -> "beta text"))
    val noClusters = Seq.empty[(Long, Long)].toDF("id", "canonical_id")
    val got = ops.Corpus.leakageSafeSplit(docs, noClusters)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val plain = ops.Corpus.hashSplit(docs, col("doc_id"))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == plain)
  }

  test("chunking and quality threshold degrade cleanly on empty/degenerate input") {
    assert(text.TextQueries.chunkDocs(docsLike(Nil)).count() == 0)
    // a doc shorter than one chunk yields exactly one chunk
    assert(text.TextQueries.chunkDocs(docsLike(Seq(1L -> "tiny"))).count() == 1)
    intercept[IllegalArgumentException] {
      text.TextQueries.chunkDocs(docsLike(Nil), maxChars = 10, overlap = 10)
    }
    intercept[IllegalArgumentException] {
      text.TextQueries.qualityThresholdVs(docsLike(Nil), keepRate = 1.0)
    }
    // empty corpus: null cutoff, zero rows kept, no crash
    assert(text.TextQueries.qualityThresholdVs(docsLike(Nil)).count() == 0)
  }

  test("Sketches blooms are well-defined over empty input and reject nothing real") {
    import spark.implicits._
    // the sentinel guarantee the four bloom operators rely on: an empty
    // benchmark/history side must yield a working (empty) filter, not a
    // null-aggregate NPE
    val emptyS = Seq.empty[String].toDF("v")
    val bs = functions.Sketches.stringBloom(emptyS, "v", fpp = 1e-4)
    assert(!bs.value.mightContainString("any real key"))
    assert(!bs.value.mightContainString("md5-shaped 0123456789abcdef"))
    val emptyL = Seq.empty[Long].toDF("v")
    val bl = functions.Sketches.longBloom(emptyL, "v", fpp = 1e-4)
    assert(!bl.value.mightContainLong(42L) && !bl.value.mightContainLong(0L))
    intercept[IllegalArgumentException] {
      functions.Sketches.stringBloom(emptyS, "v", fpp = 0.0)
    }
    // a populated filter has no false negatives
    val some = Seq("alpha", "beta").toDF("v")
    val b2 = functions.Sketches.stringBloom(some, "v", fpp = 1e-4)
    assert(b2.value.mightContainString("alpha") && b2.value.mightContainString("beta"))
  }

  test("BPE training degrades cleanly on empty/degenerate input") {
    assert(text.BpeTrainer.train(docsLike(Nil)).isEmpty)
    // single-character words have no pairs to merge
    assert(text.BpeTrainer.train(docsLike(Seq(1L -> "a b c d e"))).isEmpty)
    // below minPairCount: all pairs unique → no merges at the default 2
    assert(text.BpeTrainer.train(docsLike(Seq(1L -> "abc defg"))).isEmpty)
    intercept[IllegalArgumentException] {
      text.BpeTrainer.train(docsLike(Nil), numMerges = 0)
    }
    assert(text.BpeTrainer.segmentCounts(docsLike(Nil), Seq.empty).count() == 0)
  }

  test("kNN with k larger than n returns all n-1 neighbors") {
    val pts = embLike(Seq(
      (1L, Array(0.0, 0.0)), (2L, Array(1.0, 0.0)), (3L, Array(0.0, 2.0))))
    val out = tsne.KNN.knn(pts, "vec_id", "embedding", k = 10)
    assert(out.count() == 6, "3 points x 2 possible neighbors each")
  }

  test("brute ANN top-k on a single vector is empty (no self-pairs)") {
    val one = embLike(Seq((1L, Array(1.0, 0.0))))
    assert(ops.SimilaritySearch.bruteTopK(one, k = 5).count() == 0)
  }

  test("IVF ANN on an empty input returns an empty frame, not a kmeans crash") {
    val empty = embLike(Nil)
    val out = ops.SimilaritySearch.ivfTopK(empty, k = 5)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("i", "j", "cosine", "rank"))
  }

  test("autoBucketLength on an empty input fails with a clear message") {
    val e = intercept[IllegalArgumentException] {
      tsne.KNN.autoBucketLength(embLike(Nil), "embedding")
    }
    assert(e.getMessage.contains("empty input"), e.getMessage)
  }

  test("t-SNE rejects duplicate and null ids with clear messages") {
    val dup = embLike(Seq((1L, Array(0.0, 0.0)), (1L, Array(1.0, 1.0))))
    val e1 = intercept[IllegalArgumentException] {
      tsne.TSNE.prepareAffinities(dup, "vec_id", "embedding", tsne.TSNEParams())
    }
    assert(e1.getMessage.contains("duplicate"), e1.getMessage)

    val withNull = Seq((java.lang.Long.valueOf(1L), Array(0.0)), (null.asInstanceOf[java.lang.Long], Array(1.0)))
      .toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      tsne.TSNE.prepareAffinities(withNull, "vec_id", "embedding", tsne.TSNEParams())
    }
    assert(e2.getMessage.contains("null"), e2.getMessage)
  }

  test("PCA rejects ragged feature arrays with a clear message") {
    val ragged = embLike(Seq((1L, Array(1.0, 2.0)), (2L, Array(1.0, 2.0, 3.0))))
    val e = intercept[Exception] {
      ml.Preprocess.pca(ragged, "vec_id", "embedding", k = 2).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("ragged")
      || Option(e.getCause).exists(_.getMessage.contains("ragged")), s"got: $e")
  }

  test("streaming batch twins on an empty events frame are empty") {
    val empty = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(streaming.EventsStream.windowedAggBatch(empty).count() == 0)
    assert(streaming.EventsStream.dedupWindowedBatch(empty).count() == 0)
  }

  test("hammingPairs: empty input, identical signatures, budget bounds") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "sim")
    assert(ops.Dedup.hammingPairs(empty, maxHamming = 6).count() == 0)
    // identical signatures pair exactly once despite matching every chunk
    val same = Seq((1L, 42L), (2L, 42L), (3L, 42L)).toDF("id", "sim")
    val pairs = ops.Dedup.hammingPairs(same, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)), pairs.toString)
    // a pair exactly AT the budget survives; one past it is cut
    val atBudget = Seq((1L, 0L), (2L, (1L << 3) - 1)).toDF("id", "sim") // hamming 3
    assert(ops.Dedup.hammingPairs(atBudget, maxHamming = 3).count() == 1)
    assert(ops.Dedup.hammingPairs(atBudget, maxHamming = 2).count() == 0)
    // degenerate budgets are rejected, not silently misbanded
    intercept[IllegalArgumentException](ops.Dedup.hammingPairs(empty, 0))
    intercept[IllegalArgumentException](ops.Dedup.hammingPairs(empty, 30))
  }

  test("k-means: null embeddings excluded, empty input rejected clearly") {
    val withNull = embLike(Seq(
      (1L, Array(1.0, 2.0)), (2L, Array(3.0, 4.0)))).unionByName(
      Seq((3L, null.asInstanceOf[Array[Double]])).toDF("vec_id", "embedding"))
    val m = ml.KMeans.train(withNull, k = 2, iters = 2)
    val a = ml.KMeans.assign(withNull, m)
    assert(a.count() == 2, "the null-embedding row must be excluded, not crash")
    val e = intercept[IllegalArgumentException] {
      ml.KMeans.train(embLike(Nil), k = 2, iters = 2)
    }
    assert(e.getMessage.contains("empty input"))
  }

  test("quality classifier: null-text rows train and score with defined labels") {
    val docs = docsLike(Seq(
      (1L, "the quick brown fox jumps over the lazy dog and the cat"),
      (2L, null.asInstanceOf[String]), (3L, ""),
      (4L, "a b a b a b a b a b a b a b"))).cache()
    val m = text.QualityClassifier.train(docs, epochs = 3)
    assert(m.lossHistory.forall(l => !l.isNaN && !l.isInfinite))
    val scored = text.QualityClassifier.score(docs, m)
    assert(scored.count() == 4, "every row incl. null text must score")
    assert(scored.agg(min(col("prob")), max(col("prob"))).collect()(0)
      .toSeq.forall { case d: Double => d >= 0.0 && d <= 1.0 })
    val e = intercept[IllegalArgumentException] {
      text.QualityClassifier.train(docsLike(Nil))
    }
    assert(e.getMessage.contains("empty corpus"))
    docs.unpersist()
  }

  test("video near-dup: empty media and corrupt containers degrade cleanly") {
    val schema = "media_id LONG, kind STRING, n_frames INT, content BINARY"
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(schema))
    assert(multimodal.Multimodal.videoNearDupPairs(empty).count() == 0)
    // bad magic, truncated container, empty payload: parse yields no
    // frames, never throws
    val corrupt = Seq(
      (1L, "video", 0, Array[Byte](1, 2, 3)),
      (2L, "video", -3, Array[Byte]('G', 'F', 'R', 'M', 0, 0, 0, 9)),
      (3L, "video", 2, Array.emptyByteArray))
      .toDF("media_id", "kind", "n_frames", "content")
    assert(multimodal.Multimodal.videoNearDupPairs(corrupt).count() == 0)
  }

  test("perceptual novelty: empty history keeps everything; corrupt images pass through") {
    import multimodal.{Codec, Multimodal}
    import graft.streaming.MediaStream
    val media = Seq(
      (1L, "image", Codec.synthImageBytes(11L, 20, 20)),
      (2L, "image", Array[Byte](9, 9, 9)), // corrupt: unprovable dup, must pass
      (3L, "audio", Array[Byte](1, 2, 3))) // non-image: out of scope, must pass
      .toDF("media_id", "kind", "content")
    val emptyHistory = media.where(lit(false))
    assert(Multimodal.perceptualNoveltyBatch(media, emptyHistory).count() == 3)
    val idx = MediaStream.buildHistoryIndex(emptyHistory)
    assert(MediaStream.perceptualNovelty(media, idx).count() == 3)
    // history containing asset 1's image sheds it in both forms, keeps 2 and 3
    val history = Seq((100L, "image", Codec.synthImageBytes(11L, 20, 20)))
      .toDF("media_id", "kind", "content")
    assert(Multimodal.perceptualNoveltyBatch(media, history)
      .select("media_id").collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    assert(MediaStream.perceptualNovelty(media, MediaStream.buildHistoryIndex(history))
      .select("media_id").collect().map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("signature store: corrupt payloads index nothing; empty store keeps everything") {
    import multimodal.{Codec, SignatureStore}
    val media = Seq(
      (1L, "image", "image/png", 20, 20, 1, 0, Codec.synthImageBytes(11L, 20, 20)),
      (2L, "image", "image/png", 20, 20, 1, 0, Array[Byte](9, 9, 9)), // corrupt
      (3L, "audio", "audio/wav", 0, 0, 1024, 16000, Codec.synthWavBytes(5L, 1024, 16000)),
      (4L, "video", "video/x-graft-frames", 32, 32, 2, 0, Array[Byte](1, 2, 3, 4)), // corrupt
      (5L, "image", "image/png", 20, 20, 1, 0, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "kind", "mime", "width", "height", "n_frames",
        "sample_rate", "content")
    val sigs = SignatureStore.signatures(media)
    // corrupt/null payloads contribute NO rows; valid ones do
    assert(sigs.where(col("media_id").isin(2L, 4L, 5L)).count() == 0)
    assert(sigs.where(col("media_id") === 1L).count() == 1)
    assert(sigs.where(col("media_id") === 3L).count() >= 1)
    // novelty vs an EMPTY store keeps everything — including corrupt
    // rows (an unprovable dup is never dropped)
    val storeDir = java.nio.file.Files.createTempDirectory("edge_store").toString
    SignatureStore.build(media.where(lit(false)), storeDir)
    val empty = SignatureStore.load(spark, storeDir)
    assert(SignatureStore.noveltyAgainstStore(media, empty).count() == 5)
    // a store holding asset 1's content sheds 1, keeps the rest
    val dir2 = java.nio.file.Files.createTempDirectory("edge_store2").toString
    SignatureStore.build(Seq(
        (100L, "image", "image/png", 20, 20, 1, 0, Codec.synthImageBytes(11L, 20, 20)))
      .toDF("media_id", "kind", "mime", "width", "height", "n_frames",
        "sample_rate", "content"), dir2)
    val kept = SignatureStore.noveltyAgainstStore(media, SignatureStore.load(spark, dir2))
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L, 5L), s"kept $kept")
  }

  test("shard assembly: empty media is empty; zero/null payloads degrade cleanly") {
    import multimodal.{Codec, Multimodal}
    val schema = "media_id LONG, kind STRING, content BINARY"
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(schema))
    assert(Multimodal.assembleShards(empty, 1024).count() == 0)
    assert(Multimodal.shardIndex(empty, 1024).count() == 0)
    val media = Seq(
      (1L, "image", Codec.synthImageBytes(11L, 20, 20)),
      (2L, "image", Array.emptyByteArray),              // zero bytes: packs, adds nothing
      (3L, "image", null.asInstanceOf[Array[Byte]]))    // null: zero-length span
      .toDF("media_id", "kind", "content")
    val idx = Multimodal.shardIndex(media, 1024)
    assert(idx.select("media_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    assert(idx.where(col("media_id") === 3L).head.getAs[Long]("nbytes") == 0L)
    val asm = Multimodal.assembleShards(media, 1024).collect()
    assert(asm.map(_.getAs[Long]("n_assets")).sum == 3)
    val totalBytes = asm.map(_.getAs[Array[Byte]]("shard_bytes").length.toLong).sum
    assert(totalBytes == Codec.synthImageBytes(11L, 20, 20).length.toLong)
  }

  test("IVF append without a drift reference is not monitored (pre-monitoring index)") {
    import graft.ops.IvfIndex
    val emb = embLike((0L until 80L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 0.37 + j)))))
    val idxDir = java.nio.file.Files.createTempDirectory("ivf-nodrift").toString
    IvfIndex.build(emb.where(col("vec_id") < 40), idxDir, nlist = 4)
    // simulate a pre-monitoring index: remove the reference
    val fs = new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idxDir/drift_ref.parquet"), true)
    val stats = IvfIndex.append(emb.where(col("vec_id").between(40, 60)), idxDir)
    assert(stats.isEmpty, "append without drift_ref must skip monitoring, not throw")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idxDir/drift_log.parquet")))
  }

  test("codec: corrupt payloads decode to None/empty, never throw") {
    import multimodal.Codec
    assert(Codec.decodeImage(Array.emptyByteArray).isEmpty)
    assert(Codec.decodeImage(Array[Byte](7, 8, 9)).isEmpty)
    assert(Codec.phash64(Array[Byte](7, 8, 9)).isEmpty)
    assert(Codec.decodeWavSamples(Array[Byte](1, 2)).isEmpty)
    assert(Codec.audioFingerprints(Array[Byte](1, 2)).isEmpty)
    assert(Codec.decodeFrames(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)).isEmpty)
    // truncated mid-frame: magic ok, frame length lies past the end
    val lying = Codec.encodeFrames(Seq(Array[Byte](1, 2, 3))).dropRight(2)
    assert(Codec.decodeFrames(lying).isEmpty)
  }

  test("packSequences: boundary-exact, boundary-crossing and multi-seq spans") {
    // L=1024; token stream: d1 [0,1000) · d2 [1000,1024) ends ON the
    // boundary · d3 [1024,3072) spans 2 full sequences · d4 [3072,3073)
    val docs = Seq((1L, 1000L), (2L, 24L), (3L, 2048L), (4L, 1L))
      .toDF("doc_id", "n_tok")
    val out = ops.Corpus.packSequences(docs, lit(1), col("doc_id"),
        col("n_tok"), seqLen = 1024L)
      .select("doc_id", "tok_start", "tok_end",
        "seq_start", "off_start", "seq_end", "off_end")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    assert(out(0) == ((1L, 0L, 1000L, 0L, 0L, 0L, 1000L)))
    // a doc ending exactly at the boundary closes seq 0 with off_end = L
    assert(out(1) == ((2L, 1000L, 1024L, 0L, 1000L, 0L, 1024L)))
    // a 2·L doc starting at the boundary owns sequences 1..2 end-to-end
    assert(out(2) == ((3L, 1024L, 3072L, 1L, 0L, 2L, 1024L)))
    assert(out(3) == ((4L, 3072L, 3073L, 3L, 0L, 3L, 1L)))
  }

  test("layout: no-victim delete is a no-op; absent-day merge leaves the rollup unchanged") {
    val base = s"${sys.props("java.io.tmpdir")}/graft_layout/edgecases"
    val layout = s"$base/events"
    val rollup = s"$base/rollup"
    io.Layout.writeDatePartitioned(
      Tables.events(spark, "/root/testdata/sf0.001"), layout)
    def listing(p: String): Set[String] = {
      val root = new org.apache.hadoop.fs.Path(p)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def walk(q: org.apache.hadoop.fs.Path): Seq[String] =
        fs.listStatus(q).toSeq.flatMap { s =>
          if (s.isDirectory) walk(s.getPath)
          else Seq(s.getPath.toString + ":" + s.getLen)
        }
      walk(root).toSet
    }
    val before = listing(layout)
    val affected = io.Layout.deleteRows(spark, layout,
      Seq(-1L, -2L).toDF("event_id"), "event_id")
    assert(affected.isEmpty, "phantom ids must touch no partition")
    assert(listing(layout) == before, "no-op delete rewrote files")

    io.Layout.mergeDailyAgg(spark, layout, rollup, Seq("2024-01-03"))
    val rows = spark.read.parquet(rollup).collect().toSet
    io.Layout.mergeDailyAgg(spark, layout, rollup, Seq("1999-12-31"))
    assert(spark.read.parquet(rollup).collect().toSet == rows,
      "merging a day absent from the layout changed the rollup")
  }

  test("packSequences on an empty frame yields an empty frame") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n_tok")
    assert(ops.Corpus.packSequences(empty, lit(1), col("doc_id"),
      col("n_tok"), 1024L).count() == 0)
  }

  test("followPairsBatch: range semantics — strict lower, inclusive upper, same user") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def plus(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val events = Seq(
      (1L, t0, 100L, "purchase", 1.0),        // the purchase
      (2L, plus(30), 100L, "view", 1.0),      // inside the hour -> pair
      (3L, plus(60), 100L, "view", 1.0),      // exactly +1h, inclusive -> pair
      (4L, plus(61), 100L, "view", 1.0),      // beyond -> no
      (5L, t0, 100L, "view", 1.0),            // simultaneous, strict > -> no
      (6L, plus(30), 200L, "view", 1.0))      // other user -> no
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val pairs = streaming.EventsStream.followPairsBatch(events)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L)))
  }
}
