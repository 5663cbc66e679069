package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("langId identifies real multilingual snippets") {
    import spark.implicits._
    val samples = Seq(
      ("en", "the cat sat on the mat and it was happy with the result of that day"),
      ("fr", "le chat est dans la maison et il aime les poissons pour le diner avec une amie"),
      ("es", "el gato es muy bonito y los perros en la casa son del vecino para una fiesta"),
      ("de", "der hund ist ein gutes tier und die katze ist nicht mit dem hund zu vergleichen"),
      ("zh", "今天天气很好我们一起去公园散步吧然后吃晚饭"),
      ("und", "xyzzy plugh qwerty asdf"))
    val got = samples.toDF("expected", "text")
      .select(col("expected"), graft.text.TextFunctions.langId(col("text")).as("got"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(0)}, got ${r.getString(1)}"))
  }

  test("qualityScore orders garbage below prose and is in [0,1]") {
    import spark.implicits._
    val df = Seq(
      ("prose", "the quick brown fox jumps over the lazy dog and then it runs back home to rest for the evening while the sun sets slowly over the hills and the birds sing in the trees around the quiet little house"),
      ("garbage", "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) @@@@ #### $$$$"),
      ("repeat", "spam spam spam spam spam spam spam spam spam spam spam spam"))
    val scores = df.toDF("kind", "text")
      .select(col("kind"), graft.text.TextFunctions.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(scores("prose") > scores("garbage"), s"$scores")
    assert(scores("prose") > scores("repeat"), s"$scores")
  }

  test("bpe pre-token count matches hand-tokenized examples") {
    import spark.implicits._
    val df = Seq(
      ("hello world", 2),       // ["hello", " world"]
      ("hello, world!", 4),     // ["hello", ",", " world", "!"]
      ("a1b2", 4),              // ["a", "1", "b", "2"]
      ("", 0))
      .toDF("text", "expected")
    val got = df.select(col("expected"),
      graft.text.TextFunctions.bpeTokenCount(col("text")).as("got")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), s"${r.toSeq}"))
  }

  test("fingerprint is whitespace/punct-insensitive but order-sensitive") {
    import spark.implicits._
    val df = Seq(
      (1L, "hello world foo"),
      (2L, "Hello,   world!  FOO"),
      (3L, "foo world hello")).toDF("id", "text")
    val fps = df.select(col("id"), graft.text.TextFunctions.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L), "normalization-equivalent docs must collide")
    assert(fps(1L) != fps(3L), "different token order must differ")
  }
}

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  private def exactPairs: Set[(Long, Long)] =
    Dedup.jaccardPairs(docs, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact jaccard finds the known near-dup pairs") {
    val pairs = exactPairs
    assert(pairs.size >= 20, s"expected the ~24 near-dup pairs, got ${pairs.size}")
  }

  test("minhash LSH recall >= 0.9 vs exact jaccard, no false positives") {
    val exact = exactPairs
    val lsh = Dedup.minhashLshPairs(docs, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification step re-scores with true jaccard → no false positives
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall (${lsh.size}/${exact.size})")
  }

  test("canonicalize: distributed label propagation == driver union-find") {
    val pairs = Dedup.jaccardPairs(docs, threshold = 0.8)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val small = asMap(Dedup.canonicalize(pairs))                       // union-find path
    val dist = asMap(Dedup.canonicalize(pairs, smallGraphEdges = 0L))  // forced distributed
    assert(small.nonEmpty)
    assert(small == dist, "hybrid paths must agree exactly")
  }

  test("dupSpans: cross-doc spans flagged, intra-doc repeats and short/null docs not") {
    import spark.implicits._
    // windows of 10 at stride 5; docs 1+2 share exactly one window's
    // content ("BBBBBBBBBB"); doc 4 repeats a window WITHIN itself only;
    // doc 3 is shorter than one window; doc 5 is null text
    val df = Seq(
      (1L, Option("AAAAAAAAAA" + "BBBBBBBBBB" + "CCCCCCCCCC")),
      (2L, Option("XXXXXXXXXX" + "BBBBBBBBBB" + "ZZZZZZZZZZ")),
      (3L, Option("short")),
      (4L, Option("DDDDDDDDDD" + "EEEEE" + "DDDDDDDDDD")),
      (5L, Option.empty[String])).toDF("doc_id", "text")
    val got = Dedup.dupSpans(df, windowChars = 10, stride = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 4L), s"docs with windows: ${got.keySet}")
    // len 30 → positions 1,6,11,16,21 = 5 windows; only "BBBBBBBBBB" (one
    // window each) is cross-doc
    assert(got(1L) == ((5L, 1L, 0.2)), s"${got(1L)}")
    assert(got(2L) == ((5L, 1L, 0.2)), s"${got(2L)}")
    // doc 4: len 25 → 4 windows; positions 1 and 16 have identical content
    // but only within doc 4 → zero cross-doc dups
    assert(got(4L) == ((4L, 0L, 0.0)), s"${got(4L)}")
  }

  test("leakageSafeSplit: no cluster straddles a split; singletons match hashSplit") {
    val clusters = Dedup.canonicalize(Dedup.jaccardPairs(docs, threshold = 0.8))
    val split = Corpus.leakageSafeSplit(docs, clusters)
    // every near-dup cluster lands wholly inside one split
    val straddling = split.join(clusters, split("doc_id") === clusters("id"))
      .groupBy("canonical_id")
      .agg(countDistinct(col("split")).as("n_splits"))
      .where(col("n_splits") > 1).count()
    assert(straddling == 0, s"$straddling clusters straddle splits")
    // documents with no near-duplicate keep their plain hashSplit fate —
    // adopting the operator only ever moves clustered docs
    val naive = Corpus.hashSplit(docs.select("doc_id"), col("doc_id"))
    val changedSingletons = split
      .join(clusters, split("doc_id") === clusters("id"), "left_anti")
      .join(naive.withColumnRenamed("split", "naive_split"), "doc_id")
      .where(col("split") =!= col("naive_split")).count()
    assert(changedSingletons == 0, s"$changedSingletons unclustered docs moved")
    assert(split.count() == docs.count())
  }

  test("sourceOverlap: exact jaccard on planted trigram sets") {
    import spark.implicits._
    // srcA: {"a b c","b c d"}; srcB: {"a b c","b c e"} → common 1, union 3;
    // srcC shares nothing; the duplicate srcA doc must not double-count
    val df = Seq(
      (1L, "srcA", "a b c d"),
      (2L, "srcA", "a b c d"),
      (3L, "srcB", "a b c e"),
      (4L, "srcC", "x y z w")).toDF("doc_id", "source", "text")
    val got = Dedup.sourceOverlap(df)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(("srcA", "srcB")), s"pairs: ${got.keySet}")
    assert(got(("srcA", "srcB")) == ((1L, 1.0 / 3)), s"${got(("srcA", "srcB"))}")
  }

  test("sourceOverlapMinhash: identical sources estimate 1.0; estimates track exact") {
    import spark.implicits._
    val clone = "the very same document text repeated across both sources entirely"
    val df = Seq(
      (1L, "dup1", clone), (2L, "dup2", clone),
      (3L, "other", "completely different content with no shared trigrams at all")
    ).toDF("doc_id", "source", "text")
    val est = Dedup.sourceOverlapMinhashVs(df)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(est(("dup1", "dup2")) == 1.0, s"identical sets must match every component: $est")
    assert(est(("dup1", "other")) <= 0.15 && est(("dup2", "other")) <= 0.15, s"$est")
    // fixture-wide: every estimate within 3 std errors of the exact twin
    // (the gate's bound, checked here at spec time too)
    val exact = Dedup.sourceOverlap(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val fixtureEst = Dedup.sourceOverlapMinhashVs(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val bound = 3.0 / (2.0 * math.sqrt(128))
    fixtureEst.foreach { case (k, e) =>
      val t = exact.getOrElse(k, 0.0)
      assert(math.abs(e - t) <= bound, s"$k: est $e vs exact $t")
    }
  }

  test("novelAgainst: history dups filtered, novel docs kept, empty history keeps all") {
    import spark.implicits._
    val history = Seq(
      (1L, "the quick brown fox jumps over the lazy dog in the morning sun"),
      (2L, "an entirely different historical document about sailing ships")
    ).toDF("doc_id", "text")
    val batch = Seq(
      // same 80-char normalized prefix as history doc 1 (retyped casing)
      (10L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG IN THE MORNING SUN"),
      (11L, "a genuinely new document the history has never seen before"),
      (12L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val novel = Dedup.novelAgainst(history, batch)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(novel == Set(11L), s"got $novel")
    val emptyHist = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val all = Dedup.novelAgainst(emptyHist, batch)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(all == Set(10L, 11L), s"empty history must keep every non-null doc: $all")
    intercept[IllegalArgumentException] {
      Dedup.novelAgainst(history, batch, fpp = 0.0)
    }
  }

  test("simhash banding finds most hamming<=5 near-dups") {
    val exact = exactPairs
    val sim = Dedup.simhashPairs(docs, maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // empirically 21/24 known pairs are within hamming 5 (threshold calib)
    val recall = (sim intersect exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall")
  }
}

class CorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("temperatureRates: alpha=1 proportional, alpha=0 equalizing, alpha=0.5 between") {
    import spark.implicits._
    // skewed two-source corpus: A has 90 rows, B has 10; budget 50
    val df = ((1 to 90).map(i => (i.toLong, "A")) ++
      (91 to 100).map(i => (i.toLong, "B"))).toDF("doc_id", "src")
    def rates(alpha: Double): Map[String, Double] =
      graft.ops.Corpus.temperatureRates(df, col("src"), alpha, 50L)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // α=1: p_s ∝ n_s → every source keeps budget/N — no rebalancing
    assert(rates(1.0) == Map("A" -> 0.5, "B" -> 0.5))
    // α=0: p_s equal → B's raw rate 2.5 CLAMPS to 1 (a filter cannot
    // upsample), A keeps 50·0.5/90
    val r0 = rates(0.0)
    assert(r0("B") == 1.0 && math.abs(r0("A") - 25.0 / 90) < 1e-6)
    // α=0.5: strictly between the two extremes for the big source, and
    // the small source is upweighted relative to proportional
    val rh = rates(0.5)
    assert(rh("A") > r0("A") && rh("A") < 0.5)
    assert(rh("B") == 1.0) // sqrt weighting still over-asks for tiny B
    // p_A = √90/(√90+√10) = 0.75 → rate_A = 50·0.75/90
    assert(math.abs(rh("A") - 50.0 * 0.75 / 90) < 1e-6)
  }

  test("temperatureRates compose with mixtureSample deterministically") {
    import spark.implicits._
    val df = ((1 to 80).map(i => (i.toLong, "big")) ++
      (81 to 100).map(i => (i.toLong, "small"))).toDF("doc_id", "src")
    val rates = graft.ops.Corpus.temperatureRates(df, col("src"), 0.5, 60L)
    val kept = graft.ops.Corpus.mixtureSample(
      df.join(broadcast(rates), df("src") === rates("src")),
      col("doc_id"), col("rate"))
    val k1 = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val k2 = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(k1 == k2, "hash-derived decisions are run-stable")
    assert(k1.nonEmpty && k1.size < 100)
    // the small source's keep FRACTION must exceed the big source's
    val bigFrac = k1.count(_ <= 80) / 80.0
    val smallFrac = k1.count(_ > 80) / 20.0
    assert(smallFrac > bigFrac,
      s"alpha<1 must upweight the small source: $smallFrac vs $bigFrac")
  }

  test("admitByBudget: exact order-prefix regardless of partitioning; edge budgets; negative weight refused") {
    import spark.implicits._
    // quality scores descending in id order would be too easy — scramble
    val rows = Seq(
      (1L, 0.9, 10L), (2L, 0.5, 10L), (3L, 0.7, 10L), (4L, 0.9, 5L),
      (5L, 0.3, 100L), (6L, 0.7, 10L), (7L, 0.1, 1L), (8L, 0.9, 10L))
    // order (q desc, id asc): 1(10) 4(5) 8(10) 3(10) 6(10) 2(10) 5(100) 7(1)
    // cum:                     10   15   25    35    45    55    155    156
    def admitted(budget: Long, parts: Int): Set[Long] = {
      val df = rows.toDF("id", "q", "w").repartition(parts)
      graft.ops.Corpus.admitByBudget(df,
          order = Seq(col("q").desc, col("id").asc),
          weight = col("w"), budget = budget)
        .where(col("admitted")).select("id").collect().map(_.getLong(0)).toSet
    }
    assert(admitted(45, 3) == Set(1L, 4L, 8L, 3L, 6L))
    // the result depends only on (order, weights, budget) — never on
    // the input partitioning
    assert(admitted(45, 1) == admitted(45, 7))
    // a row straddling the boundary rejects, and the PREFIX stays
    // contiguous: the cheap id=7 after the over-budget id=5 must NOT
    // sneak in (inclusive running total, not a knapsack)
    assert(admitted(60, 3) == Set(1L, 4L, 8L, 3L, 6L, 2L))
    assert(admitted(0, 3) == Set.empty[Long])
    assert(admitted(1000, 3) == rows.map(_._1).toSet)
    val neg = Seq((1L, 1.0, -5L)).toDF("id", "q", "w")
    intercept[Exception] {
      graft.ops.Corpus.admitByBudget(neg, Seq(col("q").desc, col("id")),
        col("w"), 10).count()
    }
  }
}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  test("crossModalAlignment: zero embeddings are unprovable — dropped, never poisoning stats") {
    import spark.implicits._
    val pairs = Seq(
      (1L, "a", Array(1f, 0f), Array(1f, 0f)), // cosine 1.0
      (2L, "a", Array(1f, 0f), Array(0f, 1f)), // cosine 0.0
      (3L, "a", Array(0f, 0f), Array(1f, 0f))) // zero vector → NULL cosine
      .toDF("pair_id", "source", "img_embedding", "txt_embedding")
    val kept = SimilaritySearch.crossModalAlignment(pairs)
      .select("pair_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), s"$kept")
    val st = SimilaritySearch.crossModalAlignmentStats(pairs).collect().head
    assert(st.getAs[Long]("n_pairs") == 3L)
    assert(st.getAs[Long]("n_kept") == 1L)
    // the unprovable pair is counted but never averaged: (1.0 + 0.0) / 2
    assert(math.abs(st.getAs[Double]("avg_cosine") - 0.5) < 1e-9, s"$st")
    assert(st.getAs[Double]("min_cosine") == 0.0 && st.getAs[Double]("max_cosine") == 1.0)
  }

  test("brute-force aggregator top-k == window top-k") {
    val viaAgg = SimilaritySearch.bruteTopK(emb, k = 5)
      .select("i", "j", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaWin = SimilaritySearch.bruteTopKWindow(emb, k = 5)
      .select("i", "j", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaAgg == viaWin)
  }

  test("LSH ANN recall@5 >= 0.7 on the fixture (LSH worst case: uniform vectors)") {
    val exact = SimilaritySearch.bruteTopK(emb, k = 5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SimilaritySearch.lshTopK(emb, k = 5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx intersect exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall")
  }

  test("multi-probe LSH strictly dominates single-probe at equal tables") {
    val exact = SimilaritySearch.bruteTopK(emb, k = 5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(probes: Int) = {
      val got = SimilaritySearch.lshTopK(emb, k = 5, tables = 8, probes = probes)
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got intersect exact).size.toDouble / exact.size
    }
    val single = recallAt(1)
    val multi = recallAt(3)
    assert(multi > single,
      s"probing low-margin flip buckets must add recall: $multi vs $single")
  }

  test("IVF with distributed-kmeans centers reaches the sample-trained recall band") {
    val exact = SimilaritySearch.bruteTopK(emb, k = 5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val model = graft.ml.KMeans.train(emb, k = 16, iters = 10)
    val got = SimilaritySearch.ivfTopKWithCenters(emb, model.centers, k = 5, nprobe = 10)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got intersect exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("semantic dedup: recall >= 0.8 vs exact cosine pairs, zero false positives") {
    val exact = SimilaritySearch.cosineDupPairs(emb, threshold = 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = SimilaritySearch.semanticDupPairs(emb, threshold = 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact cosine on every emitted pair → any false positive is a bug,
    // not an approximation artifact
    assert(sem.subsetOf(exact), s"false positives: ${sem -- exact}")
    val recall = if (exact.isEmpty) 1.0 else (sem intersect exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall (${sem.size}/${exact.size})")
  }

  test("semantic dedup: symmetric probe rule beats the asymmetric one-direction rule") {
    // nprobe=1 means a pair is found only when the two sides share a home
    // cell — the weakest setting; nprobe=4 must strictly dominate it
    val base = SimilaritySearch.semanticDupPairs(emb, threshold = 0.4, nprobe = 1).count()
    val full = SimilaritySearch.semanticDupPairs(emb, threshold = 0.4, nprobe = 4).count()
    assert(full > base, s"nprobe=4 ($full) must find more than nprobe=1 ($base)")
  }

  test("IVF ANN recall@5 >= 0.8 on the fixture (uniform vectors, nprobe=10/16)") {
    val exact = SimilaritySearch.bruteTopK(emb, k = 5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SimilaritySearch.ivfTopK(emb, k = 5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx intersect exact).size.toDouble / exact.size
    println(s"[ops] IVF ANN recall@5 = $recall")
    assert(recall >= 0.8, s"recall $recall")
  }

  test("IVF-PQ: refine stage recovers the IVF candidate ceiling; deterministic") {
    val exact = SimilaritySearch.bruteTopK(emb, k = 5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilaritySearch.ivfTopK(emb, k = 5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def pqSet() = SimilaritySearch.pqTopK(emb, k = 5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = pqSet()
    val pqRecall = (pq intersect exact).size.toDouble / exact.size
    val ivfRecall = (ivf intersect exact).size.toDouble / exact.size
    println(s"[ops] PQ recall@5 = $pqRecall (IVF ceiling $ivfRecall)")
    // the cells bound what PQ can find; at refine=20 the ADC shortlist
    // must not lose a measurable slice of it
    assert(pqRecall >= ivfRecall - 0.03,
      s"ADC shortlist lost recall: $pqRecall vs IVF $ivfRecall")
    assert(pqSet() == pq, "seeded codebooks + deterministic ties: runs must agree")
  }

  test("mergeSourceSignatures: associative, idempotent, one-sided sources pass through") {
    import graft.TestSpark.spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "A"),
      (2L, "eta theta iota kappa lambda mu", "A"),
      (3L, "nu xi omicron pi rho sigma", "B"),
      (4L, "tau upsilon phi chi psi omega", "C"))
      .toDF("doc_id", "text", "source")
    def sigs(f: org.apache.spark.sql.DataFrame) =
      Dedup.sourceSignatures(f, numHashes = 16)
    def asMap(f: org.apache.spark.sql.DataFrame) =
      f.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val whole = asMap(sigs(docs))
    // split A across the halves; B only left; C only right
    val left = sigs(docs.where(col("doc_id") <= 2 || col("doc_id") === 3))
    val right = sigs(docs.where(col("doc_id") === 2 || col("doc_id") === 4))
    val merged = asMap(Dedup.mergeSourceSignatures(left, right))
    assert(merged == whole, "merge must reproduce the whole-corpus signatures")
    // idempotent: merging a side with itself changes nothing
    assert(asMap(Dedup.mergeSourceSignatures(left, left)) == asMap(left))
  }

  test("pcaTopK: full-rank projection + full candidate budget recovers exact top-k") {
    // with pcaDims = d the projection is an orthonormal rotation (inner
    // products preserved bit-for-bit up to float assoc), and with
    // candidates covering the corpus the rerank sees every pair — so the
    // two-stage path must reproduce the exact result; anything else
    // means the rerank or candidate join drops pairs
    val exact = SimilaritySearch.bruteTopK(emb, k = 5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = SimilaritySearch.pcaTopK(emb, k = 5, pcaDims = 64, candidates = 499)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact, s"ceiling not recovered: ${(exact diff full).size} lost")
  }

  test("pcaTopK: starved dimensions degrade recall (what the gate catches)") {
    val exact = SimilaritySearch.bruteTopK(emb, k = 5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(dims: Int) = {
      val s = SimilaritySearch.pcaTopK(emb, k = 5, pcaDims = dims)
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (s intersect exact).size.toDouble / exact.size
    }
    val starved = recallAt(2)
    val healthy = recallAt(16)
    println(s"[ops] pca recall@5: dims=2 $starved, dims=16 $healthy")
    assert(starved < healthy,
      s"2 dims ($starved) must lose to 16 ($healthy) — else the coarse stage is inert")
  }

  test("hardNegatives: every pair crosses labels; k bound respected") {
    val hn = SimilaritySearch.hardNegatives(emb, k = 5)
    val lbl = emb.select(col("vec_id").as("i"), col("label").as("la"))
    val lblB = emb.select(col("vec_id").as("j"), col("label").as("lb"))
    val crossed = hn.join(lbl, "i").join(lblB, "j")
    assert(crossed.where(col("la") === col("lb")).count() == 0,
      "a same-label pair survived the negative filter")
    val maxPerAnchor = hn.groupBy("i").count().agg(max("count")).head.getLong(0)
    assert(maxPerAnchor <= 5)
  }

  test("IVF-PQ: starved refine budget degrades recall (the failure mode the gate catches)") {
    val exact = SimilaritySearch.bruteTopK(emb, k = 5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(refine: Int) = {
      val pq = SimilaritySearch.pqTopK(emb, k = 5, refine = refine)
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (pq intersect exact).size.toDouble / exact.size
    }
    val starved = recallAt(1)
    val healthy = recallAt(20)
    assert(starved < healthy,
      s"refine=1 ($starved) must lose to refine=20 ($healthy) — if not, ADC isn't doing anything")
  }

  test("prototypePrune: covers the corpus, honors per-cluster quota and rank order, deterministic") {
    val n = emb.count()
    val res = SimilaritySearch.prototypePrune(emb, keepRate = 0.7)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
    assert(res.length == n, "one row per input vector")
    assert(res.map(_._1).distinct.length == n, "no duplicated ids")
    res.groupBy(_._2).foreach { case (cell, members) =>
      val kept = members.filter(_._4 == 1)
      assert(kept.length == math.ceil(members.length * 0.7).toLong,
        s"cell $cell: ${kept.length} kept of ${members.length}")
      val dropped = members.filter(_._4 == 0)
      if (dropped.nonEmpty && kept.nonEmpty) {
        // kept = least-prototypical prefix in (proto, id) order
        val maxKept = kept.map(m => (m._3, m._1)).max
        val minDrop = dropped.map(m => (m._3, m._1)).min
        assert(Ordering[(Double, Long)].lt(maxKept, minDrop),
          s"cell $cell: kept/dropped rank order violated ($maxKept vs $minDrop)")
      }
    }
    val again = SimilaritySearch.prototypePrune(emb, keepRate = 0.7)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
    assert(res.toSet == again.toSet, "seeded quantizer: runs must agree")
    // keepRate=1 keeps everything
    val full = SimilaritySearch.prototypePrune(emb, keepRate = 1.0)
    assert(full.where(col("kept") === 0).count() == 0)
  }

  test("prototypePrune: empty input yields the typed empty frame") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Double])].toDF("vec_id", "embedding")
    assert(SimilaritySearch.prototypePrune(empty).count() == 0)
  }
}

class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  test("persisted index search == in-memory search over the same centers") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    val centers = IvfIndex.build(emb, dir, nlist = 16)
    val persisted = IvfIndex.search(spark, dir, emb, k = 5, nprobe = 10)
      .select("i", "j", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val inMem = SimilaritySearch
      .ivfTopKWithCenters(emb, centers, k = 5, nprobe = 10)
      .select("i", "j", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(persisted == inMem,
      s"persisted/in-memory divergence: ${persisted.size} vs ${inMem.size}")
    // loadCenters roundtrips the trained quantizer bit-exactly
    val loaded = IvfIndex.loadCenters(spark, dir)
    assert(loaded.length == centers.length)
    assert(loaded.zip(centers).forall { case (a, b) => a.sameElements(b) })
  }

  test("append: incremental postings under the frozen quantizer == one-shot index") {
    val dir1 = java.nio.file.Files.createTempDirectory("ivfidx-inc").toString
    val dir2 = java.nio.file.Files.createTempDirectory("ivfidx-full").toString
    val half1 = emb.where(col("vec_id") % 2 === 0)
    val half2 = emb.where(col("vec_id") % 2 === 1)
    // incremental: train on half1, append half2 under the frozen centers
    val centers = IvfIndex.build(half1, dir1, nlist = 16)
    IvfIndex.append(half2, dir1)
    // reference: the same centers indexing everything in one shot (write
    // the centers, then append all postings under them)
    IvfIndex.build(half1, dir2, nlist = 16) // same deterministic centers
    IvfIndex.append(half2, dir2)
    val a = IvfIndex.search(spark, dir1, emb, k = 5, nprobe = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // in-memory truth over the same frozen centers and the full corpus
    val b = SimilaritySearch.ivfTopKWithCenters(emb, centers, k = 5, nprobe = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(a == b, s"incremental index diverges: ${a.size} vs ${b.size}")
  }

  test("compactPostings is selective: already-compact cells are never touched") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx-compact").toString
    // build (1 file/cell), then fragment ONLY the cells holding
    // odd-id vectors with two appends — even-only home cells (if any)
    // and the centers stay single-file
    IvfIndex.build(emb.where(col("vec_id") % 4 === 0), dir, nlist = 16)
    IvfIndex.append(emb.where(col("vec_id") % 4 === 1), dir)
    // second append is TINY (a dozen vectors over 16 cells), so by
    // pigeonhole several cells miss it and stay at 2 files — the
    // compact-enough population the selectivity claim is about
    IvfIndex.append(emb.where(col("vec_id") % 4 === 2 && col("vec_id") < 48), dir)
    val postings = s"$dir/postings.parquet"
    val before = graft.io.Layout.partitionFileListing(spark, postings, "cell")
    val compactCells = before.filter(_._2.size < 3).keySet
    assert(compactCells.nonEmpty, "fixture sanity: some cells must stay compact")
    val pre = IvfIndex.search(spark, dir, emb, k = 5, nprobe = 10)
      .select("i", "j", "rank").localCheckpoint(true)
    // threshold 3: cells at 1-2 files are "compact enough" and must not move
    val victims = IvfIndex.compactPostings(spark, dir, minFilesPerCell = 3)
    val after = graft.io.Layout.partitionFileListing(spark, postings, "cell")
    assert(victims.nonEmpty, "fixture sanity: some cells must fragment to >= 3 files")
    assert(victims.toSet.intersect(compactCells).isEmpty)
    compactCells.foreach { c =>
      assert(before(c) == after(c), s"untouched cell $c was rewritten")
    }
    victims.foreach { c =>
      assert(after(c).size < before(c).size, s"victim cell $c did not shrink")
    }
    // search results may not move by a single neighbor
    val post = IvfIndex.search(spark, dir, emb, k = 5, nprobe = 10)
      .select("i", "j", "rank")
    assert(pre.exceptAll(post).count() == 0 && post.exceptAll(pre).count() == 0)
    // idempotence: a second pass at the same threshold finds nothing
    assert(IvfIndex.compactPostings(spark, dir, minFilesPerCell = 3).isEmpty)
  }

  test("PQ sidecar: exhaustive-refine searchPq == raw search; twin bit-level through append/delete/compact") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx-pq").toString
    IvfIndex.build(emb.where(col("vec_id") % 4 === 0), dir, nlist = 8)
    IvfIndex.buildPq(spark, dir, m = 16, ksub = 16)
    def twinDiff(): Long = {
      val stored = spark.read.parquet(s"$dir/pq/postings.parquet")
        .select("id", "cell", "codes").distinct()
      val twin = IvfIndex.pqTwin(spark, dir).select("id", "cell", "codes")
      stored.exceptAll(twin).count() + twin.exceptAll(stored).count()
    }
    assert(twinDiff() == 0, "build-time codes must equal a re-encode twin")
    // with every cell probed and a shortlist wider than the corpus, the
    // ADC stage cannot lose a candidate — the exact refine must then
    // reproduce the raw search to the row
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.select("i", "j", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val pq = rows(IvfIndex.searchPq(spark, dir, emb, k = 5, nprobe = 8,
      refine = 200))
    val raw = rows(IvfIndex.search(spark, dir, emb, k = 5, nprobe = 8))
    assert(pq == raw, s"exhaustive-refine searchPq diverges from raw " +
      s"search: ${pq.size} vs ${raw.size} rows")
    IvfIndex.append(emb.where(col("vec_id") % 4 === 1), dir)
    assert(twinDiff() == 0, "append must encode its batch in the same call")
    IvfIndex.deleteVectors(spark, dir,
      emb.where(col("vec_id") % 8 === 0).select("vec_id"))
    assert(twinDiff() == 0, "delete must forget codes with vectors")
    val victimLeft = spark.read.parquet(s"$dir/pq/postings.parquet")
      .where(col("id") % 8 === 0).count()
    assert(victimLeft == 0, "victim codes must leave the sidecar")
    IvfIndex.compactPostings(spark, dir)
    assert(twinDiff() == 0, "compaction moves rows, never changes codes")
  }

  test("maintenancePlan: quiet store → none; widespread overflow → sized rebuild; no store → None") {
    import graft.examples.DailyIngest
    val root = java.nio.file.Files.createTempDirectory("keystone-plan").toString
    IvfIndex.build(emb, s"$root/stores/ivf_index", nlist = 4)
    val quiet = DailyIngest.maintenancePlan(spark, root).get
    assert(!quiet.act && quiet.reason == "none", s"$quiet")
    // per-cell budget of 1: EVERY cell over → hotFrac 1.0 > maxHotFrac →
    // widespread: the quantizer is globally undersized, rebuild sized to
    // the budget (and at least 2× current)
    val wide = DailyIngest.maintenancePlan(spark, root,
      maxPostingsPerCell = 1).get
    assert(wide.act && wide.reason == "hotspot_widespread", s"$wide")
    assert(wide.hotspot.recommendRebuild && !wide.hotspot.recommendSplit)
    assert(wide.suggestedNlist >= 2 * wide.rebuild.nlist, s"$wide")
    assert(wide.suggestedNlist >= wide.rebuild.postings, // budget 1/cell
      s"widespread suggestion must cover the per-cell budget: $wide")
    val empty = java.nio.file.Files.createTempDirectory("keystone-none").toString
    assert(DailyIngest.maintenancePlan(spark, empty).isEmpty)
  }

  test("PQ sidecar: stale generation fails loudly; rebuild refreshes it") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx-pqgen").toString
    IvfIndex.build(emb.where(col("vec_id") % 2 === 0), dir, nlist = 8)
    IvfIndex.buildPq(spark, dir, m = 16, ksub = 16)
    assert(IvfIndex.pqGeneration(spark, dir) == 0)
    // simulate an out-of-band migration (an old writer that bumped the
    // store generation without re-encoding): the header says gen 1, the
    // codes were cut under gen 0 — every compressed read/mutate must
    // refuse rather than ADC-compare against retired centers
    val qp = new org.apache.hadoop.fs.Path(s"$dir/_quantizer.properties")
    val hfs = qp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = hfs.create(qp, true)
    out.write("generation=1\nnlist=8\n".getBytes("UTF-8")); out.close()
    intercept[IllegalArgumentException] {
      IvfIndex.searchPq(spark, dir, emb, k = 3, nprobe = 4)
    }
    intercept[IllegalArgumentException] {
      IvfIndex.append(emb.where(col("vec_id") % 2 === 1), dir)
    }
    // a REAL migration (rebuild) retrains + re-encodes in its staged
    // swap: generation parity restored, codes match the twin
    IvfIndex.rebuild(spark, dir, newNlist = 8)
    assert(IvfIndex.pqGeneration(spark, dir) ==
      IvfIndex.generation(spark, dir))
    val stored = spark.read.parquet(s"$dir/pq/postings.parquet")
      .select("id", "cell", "codes").distinct()
    val twin = IvfIndex.pqTwin(spark, dir).select("id", "cell", "codes")
    assert(stored.exceptAll(twin).count() + twin.exceptAll(stored).count() == 0)
    assert(IvfIndex.searchPq(spark, dir, emb, k = 3, nprobe = 4).count() > 0)
  }

  test("streaming index ingestion: file-streamed appends == one-shot index") {
    val idxDir = java.nio.file.Files.createTempDirectory("ivfidx-stream").toString
    val watchDir = java.nio.file.Files.createTempDirectory("ivf-watch").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivf-ckpt").toString
    val half1 = emb.where(col("vec_id") % 2 === 0)
    val half2 = emb.where(col("vec_id") % 2 === 1)
    val centers = IvfIndex.build(half1, idxDir, nlist = 16)
    // stage half2 as a stream source file
    half2.write.mode("overwrite").parquet(s"$watchDir/batch1")
    val q = graft.streaming.IndexStream.startIndexAppendQuery(
      spark, s"$watchDir/batch1", idxDir, "idxappend", ckpt)
    try q.processAllAvailable() finally q.stop()
    val streamed = IvfIndex.search(spark, idxDir, emb, k = 5, nprobe = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val truth = SimilaritySearch.ivfTopKWithCenters(emb, centers, k = 5, nprobe = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(streamed == truth,
      s"streamed index diverges: ${streamed.size} vs ${truth.size}")
  }

  test("build and append each route every vector exactly ONCE (fused assign pass)") {
    // r13 measured build at up to 3 extra full nearest-center passes
    // (postings write + occupancy + held-out p95 each re-ran the UDF)
    // and append at 2 (write + drift census); the cached assignedFrame
    // fused them — pinned with the assignEvals counter, the exact
    // analog of Codec.decodeCalls budgets. Counter is JVM-global;
    // suites run sequentially per forked JVM.
    val dir = java.nio.file.Files.createTempDirectory("ivfidx-fused").toString
    val buildSide = emb.where(col("vec_id") % 2 === 0)
    val batchSide = emb.where(col("vec_id") % 2 === 1)
    val nBuild = buildSide.count()
    val nBatch = batchSide.count()
    val before = IvfIndex.assignEvals.get()
    IvfIndex.build(buildSide, dir, nlist = 16)
    val afterBuild = IvfIndex.assignEvals.get()
    assert(afterBuild - before == nBuild,
      s"build routed ${afterBuild - before} rows for a $nBuild-vector corpus — " +
        "the assigned frame must be computed once and cached")
    IvfIndex.append(batchSide, dir)
    val afterAppend = IvfIndex.assignEvals.get()
    assert(afterAppend - afterBuild == nBatch,
      s"append routed ${afterAppend - afterBuild} rows for a $nBatch-vector batch — " +
        "the postings write and the drift census must share one pass")
  }

  test("empty append batch logs drifted=false (no spurious rebuild signal)") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx-empty").toString
    IvfIndex.build(emb, dir, nlist = 16)
    val stats = IvfIndex.append(emb.where(lit(false)), dir)
    assert(stats.isDefined, "monitored index must still log the batch")
    assert(stats.get.n == 0 && !stats.get.drifted,
      s"empty batch carries no distribution evidence, got $stats")
    assert(stats.get.occupancyL1 == 0.0 && stats.get.fracBeyondP95 == 0.0)
  }

  test("search scans only probed cell partitions (partition pruning)") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx2").toString
    IvfIndex.build(emb, dir, nlist = 16)
    // a single query vector probes 3 of 16 cells
    val oneQuery = emb.orderBy("vec_id").limit(1)
    val res = IvfIndex.search(spark, dir, oneQuery, k = 5, nprobe = 3)
    val plan = res.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("postings.parquet") && l.contains("PartitionFilters"))
      .getOrElse(plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse(""))
    assert(scanLine.contains("cell IN") || scanLine.matches(".*PartitionFilters: \\[[^\\]].*"),
      s"probed-cell IN filter must prune partitions at the scan:\n$plan")
    res.collect() // executes against the pruned scan
  }

  test("matchedAgainstIndex: threshold semantics + the same pruned-scan shape as search") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivfidx3").toString
    IvfIndex.build(emb, dir, nlist = 16)
    // a COPY of an indexed vector matches (cos 1.0 >= any threshold);
    // a disjoint-support synthetic vector matches nothing at 0.9 (the
    // fixture's natural pairwise max is ~0.51)
    val base = emb.orderBy("vec_id").limit(1)
      .select(col("embedding")).head.getSeq[Float](0)
    val fresh = Array.tabulate(base.length) { i =>
      (((i * 2654435761L) % 1999L).toFloat - 999f) / 1000f
    }.toSeq
    val probes = Seq((900001L, base), (900002L, fresh))
      .toDF("vec_id", "embedding")
    val res = IvfIndex.matchedAgainstIndex(probes, dir, threshold = 0.9, nprobe = 3)
    val plan = res.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("postings.parquet") && l.contains("PartitionFilters"))
      .getOrElse(plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse(""))
    assert(scanLine.contains("cell IN") || scanLine.matches(".*PartitionFilters: \\[[^\\]].*"),
      s"the frozen-history probe must prune history to probed cells:\n$plan")
    val matched = res.collect().map(_.getLong(0)).toSet
    assert(matched == Set(900001L),
      s"the copy must match and the disjoint vector must not: $matched")
  }

  test("rebuild: a crash between staging and swap rolls FORWARD; readers throw until complete; rows preserved") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx-rebuild").toString
    IvfIndex.build(emb, dir, nlist = 8)
    val preRows = spark.read.parquet(s"$dir/postings.parquet")
      .select("id", "nrm").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted
    // crash point 1: staging complete + inprogress marker, ZERO swaps —
    // every reader must refuse the possibly-mixed-generation store
    IvfIndex.stageRebuild(spark, dir, newNlist = 16)
    val e = intercept[java.io.IOException](IvfIndex.loadCenters(spark, dir))
    assert(e.getMessage.contains("pending rebuild"))
    // crash point 2 (deeper): the first component's live→trash rename
    // landed but its staged→live did not — live centers are GONE
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/centers.parquet"),
      new org.apache.hadoop.fs.Path(s"$dir/.trash_rebuild_centers.parquet")),
      "test setup: simulate the mid-swap crash")
    // a NEW rebuild call first completes the pending swap from the
    // still-complete staging (generation 1), then runs the requested
    // rebuild (generation 2)
    val centers2 = IvfIndex.rebuild(spark, dir, newNlist = 16)
    assert(IvfIndex.generation(spark, dir) == 2,
      "roll-forward bumps once, the requested rebuild bumps again")
    assert(centers2.length == 16)
    val postRows = spark.read.parquet(s"$dir/postings.parquet")
      .select("id", "nrm").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(postRows.sameElements(preRows),
      "posting rows (id, nrm) must survive both rebuilds bit-level")
    assert(IvfIndex.search(spark, dir, emb, k = 3, nprobe = 4).count() > 0,
      "the recovered store must serve")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/rebuild.inprogress")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_rebuild_staging")))
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .forall(!_.getPath.getName.startsWith(".trash_rebuild")),
      "no rebuild trash left behind")
  }

  test("rebuildAdvice: detect → recommend → act → clear (capacity and drift triggers)") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx-advice").toString
    IvfIndex.build(emb.where(col("vec_id") % 10 < 6), dir, nlist = 4)
    val quiet = IvfIndex.rebuildAdvice(spark, dir,
      targetPostingsPerCell = 1L << 20, driftWindow = 2)
    assert(!quiet.recommend && quiet.reason == "none" && quiet.generation == 0,
      s"fresh in-budget store must read quiet: $quiet")
    // drift trigger: two shifted appends own the 2-row window; the
    // corpus MOVED rather than grew, so the suggestion keeps nlist
    (8 to 9).foreach { m =>
      IvfIndex.append(emb.where(col("vec_id") % 10 === m)
        .withColumn("embedding", expr("transform(embedding, x -> x + 0.5f)")), dir)
    }
    val drifted = IvfIndex.rebuildAdvice(spark, dir,
      targetPostingsPerCell = 1L << 20, driftWindow = 2)
    assert(drifted.recommend && drifted.reason == "drift" &&
      drifted.suggestedNlist == drifted.nlist, s"$drifted")
    // capacity trigger: a per-cell budget the corpus has outgrown; the
    // suggested nlist must bound the mean back under it
    val tight = IvfIndex.rebuildAdvice(spark, dir,
      targetPostingsPerCell = 10, driftWindow = 2)
    assert(tight.recommend && tight.reason == "capacity+drift", s"$tight")
    assert(tight.suggestedNlist >= 2 * tight.nlist, s"$tight")
    assert(tight.postings.toDouble / tight.suggestedNlist <= 10, s"$tight")
    // act, then re-evaluate under the SAME knobs: both triggers clear
    IvfIndex.rebuild(spark, dir, newNlist = tight.suggestedNlist)
    val after = IvfIndex.rebuildAdvice(spark, dir,
      targetPostingsPerCell = 10, driftWindow = 2)
    assert(!after.recommend && after.reason == "none" &&
      after.generation == 1 && after.nlist == tight.suggestedNlist,
      s"a completed rebuild must clear the advice: $after")
    // a routine empty append must not re-arm the drift trigger
    IvfIndex.append(emb.where(lit(false)), dir)
    val afterEmpty = IvfIndex.rebuildAdvice(spark, dir,
      targetPostingsPerCell = 10, driftWindow = 2)
    assert(!afterEmpty.recommend,
      s"an empty append re-armed the trigger: $afterEmpty")
  }

  /** The split-spec surge: one vector per corpus row, all within ~0.1
    * of a fixed anchor direction — a single home cell with real
    * per-row variance for the 2-means to find. */
  private def blobOf(df: org.apache.spark.sql.DataFrame, base: Long) =
    df.select((col("vec_id") + lit(base)).as("vec_id"),
      expr("transform(embedding, (x, i) -> cast((case when i = 0 then 1.0 " +
        "else 0.0 end) + 0.05 * x as float))").as("embedding"))

  test("splitCells: only over-budget cells split; ids conserved; untouched cells byte-stable; advice clears") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx-split").toString
    IvfIndex.build(emb, dir, nlist = 4)
    IvfIndex.append(blobOf(emb, 1L << 40), dir)
    val n = emb.count()
    val budget = math.max(1L, n / 2)
    val postings = s"$dir/postings.parquet"
    val advice = IvfIndex.splitAdvice(spark, dir, budget)
    assert(advice.recommendSplit && !advice.recommendRebuild,
      s"the localized surge must read as a split, not a rebuild: $advice")
    val idsBefore = spark.read.parquet(postings).select("id")
      .collect().map(_.getLong(0)).sorted
    val listingPre = graft.io.Layout.partitionFileListing(spark, postings, "cell")
    var victims = Seq.empty[Int]
    var more = true
    var guard = 0
    while (more && guard < 6) {
      val v = IvfIndex.splitCells(spark, dir, budget)
      victims ++= v; more = v.nonEmpty; guard += 1
    }
    assert(victims.nonEmpty, "the over-budget cell must have split")
    assert(IvfIndex.generation(spark, dir) >= 1)
    val listingPost = graft.io.Layout.partitionFileListing(spark, postings, "cell")
    val untouchedChanged = listingPre.keySet.filter(c =>
      !victims.map(_.toString).contains(c) &&
        listingPre(c) != listingPost.getOrElse(c, Nil))
    assert(untouchedChanged.isEmpty,
      s"never-victim cells were rewritten: $untouchedChanged")
    val idsAfter = spark.read.parquet(postings).select("id")
      .collect().map(_.getLong(0)).sorted
    assert(idsAfter.sameElements(idsBefore), "postings ids must be conserved")
    val maxMass = spark.read.parquet(postings)
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head.getLong(0)
    assert(maxMass <= budget, s"a cell is still over budget: $maxMass > $budget")
    val after = IvfIndex.splitAdvice(spark, dir, budget)
    assert(!after.recommendSplit && !after.recommendRebuild,
      s"advice must clear once every cell is under budget: $after")
    assert(after.nlist == 4 + victims.size,
      "each split adds exactly one cell")
    // serving survives: the store still finds near-identical pairs
    assert(IvfIndex.search(spark, dir, emb, k = 3, nprobe = 2).count() > 0)
  }

  test("splitCells: a crash between staging and swap rolls FORWARD; readers throw until complete") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx-splitcrash").toString
    IvfIndex.build(emb, dir, nlist = 4)
    IvfIndex.append(blobOf(emb, 1L << 40), dir)
    val budget = math.max(1L, emb.count() / 2)
    val preIds = spark.read.parquet(s"$dir/postings.parquet").select("id")
      .collect().map(_.getLong(0)).sorted
    val staged = IvfIndex.stageSplit(spark, dir, budget)
    assert(staged.nonEmpty, "fixture sanity: something must be over budget")
    val e = intercept[java.io.IOException](IvfIndex.loadCenters(spark, dir))
    assert(e.getMessage.contains("pending cell split"))
    intercept[java.io.IOException](IvfIndex.splitAdvice(spark, dir, budget))
    // a rebuild must refuse to run over a half-split store
    val e2 = intercept[java.io.IOException](
      IvfIndex.rebuild(spark, dir, newNlist = 8))
    assert(e2.getMessage.contains("pending"), e2.getMessage)
    // re-running splitCells completes the pending swap (roll-forward),
    // then converges (the fresh census may split residual cells)
    var guard = 0
    while (IvfIndex.splitCells(spark, dir, budget).nonEmpty && guard < 6)
      guard += 1
    assert(IvfIndex.generation(spark, dir) >= 1)
    val postIds = spark.read.parquet(s"$dir/postings.parquet").select("id")
      .collect().map(_.getLong(0)).sorted
    assert(postIds.sameElements(preIds), "ids must survive the recovery")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/split.inprogress")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_split_staging")))
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .forall(!_.getPath.getName.startsWith(".trash_split")),
      "no split trash left behind")
  }

  test("splitCells: a cell of identical vectors is skipped (no geometry splits identical mass)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivfidx-splitdeg").toString
    val same = spark.range(10)
      .select(col("id").as("vec_id"),
        array(lit(1.0), lit(0.5), lit(0.25)).as("embedding"))
    IvfIndex.build(same, dir, nlist = 1)
    val victims = IvfIndex.splitCells(spark, dir, maxPostingsPerCell = 5)
    assert(victims.isEmpty, "identical mass must be skipped, not split")
    assert(IvfIndex.generation(spark, dir) == 0,
      "a no-op pass must not bump the generation")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/split.inprogress")),
      "a skipped-everything pass must not leave a marker")
  }
}

class MinHashBandStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.DataFrame

  private def tmpStore(): String =
    java.nio.file.Files.createTempDirectory("mhband").toString + "/store"

  private def docsDF(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("params are persisted, trusted, and missing-file probes fail loudly") {
    val dir = tmpStore()
    MinHashBandStore.build(docsDF(Seq((1L, "a b c d e f g"))), dir,
      params = MinHashBandStore.Params(n = 2, numHashes = 32, bands = 8, seed = 7L))
    val p = MinHashBandStore.readParams(spark, dir)
    assert(p == MinHashBandStore.Params(2, 32, 8, 7L))
    val e = intercept[Exception](
      MinHashBandStore.readParams(spark, tmpStore() + "_absent"))
    assert(e.getMessage != null)
    intercept[IllegalArgumentException](MinHashBandStore.Params(bands = 7))
  }

  test("empty store keeps everything; null-text batch rows pass through unharmed") {
    val dir = tmpStore()
    MinHashBandStore.build(docsDF(Nil), dir)
    val batch = docsDF(Seq((1L, "the quick brown fox jumps"), (2L, null)))
    val kept = MinHashBandStore.noveltyAgainstStore(batch, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L),
      "an empty history proves nothing a dup — and an unprovable (null) doc must never drop")
  }

  test("deleteDocs of an absent id is a no-op; delete of a real id frees its copy") {
    import spark.implicits._
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val dir = tmpStore()
    MinHashBandStore.build(docsDF(Seq((10L, text), (11L, "unrelated words entirely here now"))), dir)
    val before = (MinHashBandStore.loadSigs(spark, dir).count(),
      MinHashBandStore.loadBands(spark, dir).count())
    MinHashBandStore.deleteDocs(spark, dir, Seq(999L).toDF("doc_id"))
    val after = (MinHashBandStore.loadSigs(spark, dir).count(),
      MinHashBandStore.loadBands(spark, dir).count())
    assert(before == after, "deleting an absent id must change nothing")
    // a verbatim copy of doc 10 sheds; after takedown of 10 it survives
    val copy = docsDF(Seq((900L, text)))
    assert(MinHashBandStore.noveltyAgainstStore(copy, dir).count() == 0)
    MinHashBandStore.deleteDocs(spark, dir, Seq(10L).toDF("doc_id"))
    assert(MinHashBandStore.noveltyAgainstStore(copy, dir).count() == 1)
  }

  test("retried-append duplicate rows never inflate a bucket past the cap") {
    import spark.implicits._
    // four mutual near-dup docs share band buckets; distinct occupancy
    // (4) equals maxBucket, but two RETRIED appends triple the ROWS —
    // a row-counting latch would spuriously NULL those buckets and a
    // fifth near-dup probe would sail through until compact() ran.
    // Candidacy must dedupe before the bounded aggregate.
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    def variant(k: Int) = base.replace(s"tok$k", s"edited$k")
    val docs = (1 to 4).map(i => (i.toLong, variant(i))).toSeq
    val dir = tmpStore()
    MinHashBandStore.build(docsDF(docs), dir)
    MinHashBandStore.append(docsDF(docs), dir) // retried
    MinHashBandStore.append(docsDF(docs), dir) // retried again
    val probe = docsDF(Seq((99L, variant(39))))
    val kept = MinHashBandStore.noveltyAgainstStore(probe, dir,
      maxBucket = 4).count()
    assert(kept == 0,
      "a near-dup of the stored family must shed despite retried-append row inflation")
  }

  test("sentinel ident probe partition-prunes to the band_id=-1 directory") {
    val dir = tmpStore()
    MinHashBandStore.build(docsDF(Seq((1L, "one two three four five six"))), dir)
    val p = MinHashBandStore.loadBands(spark, dir)
      .where(col("band_id") === -1)
      .queryExecution.executedPlan.toString
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("band_id") && !scanLine.contains("PartitionFilters: []"),
      s"the ident semi-join's store scan must prune to the sentinel partition:\n$p")
  }
}
