package graft.examples

import graft.Tables
import graft.ops.{Corpus, Dedup, SimilaritySearch}
import graft.text.{TextFunctions, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus assembly, composed entirely from library
  * calls — the canonical "how do the operators fit together" example:
  *
  *   documents (+ embeddings)
  *     → TextQueries.gopherRules   (quality hygiene first: it is the
  *                                  cheapest stage — scan-speed filter —
  *                                  so it runs before anything that
  *                                  shuffles)
  *     → TextQueries.contaminationBloomVs (eval-suite decontamination:
  *                                  drop corpus docs sharing ≥5% of their
  *                                  trigrams with the benchmark cohort,
  *                                  and the benchmark docs themselves)
  *     → Dedup.jaccardPairs        (lexical near-duplicate pairs — ONE
  *                                  pass at J≥0.3; the ≥0.5 slice feeds
  *                                  dedup, the full band keys the split)
  *     + SimilaritySearch.semanticDupPairs (embedding-space near-dups)
  *     → Dedup.retain              (CC canonicalization over the UNION of
  *                                  both detectors + one survivor per cluster)
  *     → Dedup.dupSpans            (boilerplate filter: drop docs that are
  *                                  mostly cross-doc duplicated substrings)
  *     → Corpus.leakageSafeSplit   (deterministic ≈80/10/10 train/val/test
  *                                  keyed on the residual J≥0.3 near-dup
  *                                  cluster representative, so
  *                                  memorization-adjacent pairs never
  *                                  straddle train/test)
  *     → Corpus.temperatureRates   (α=0.5 XLM-R rebalancing: per-source
  *                                  keep rates DERIVED from the train
  *                                  split's source counts)
  *     → Corpus.mixtureSample      (apply the broadcast-joined rates)
  *     → Corpus.stratifiedSample   (k-per-(source,lang) eval sample from val)
  *     → Corpus.packShards         (~2000-BPE-token training shards)
  *
  * Every stage is a deterministic DataFrame transform: hash-derived
  * decisions, shuffle-on-key plans, nothing driver-side — the same code
  * is the 100 TB shape, only the input path changes. Per-stage row
  * counts print as one JSON line; CorpusPipelineSpec asserts their
  * invariants (conservation across split, survivors ≤ docs, k-cap).
  */
object CorpusPipeline {

  /** Per-stage row counts — returned (not just printed) so the smoke
    * spec can assert pipeline invariants without parsing stdout. */
  case class Counts(
      docs: Long, qualityPass: Long, contaminated: Long, clean: Long,
      dupPairs: Long, semPairs: Long, retained: Long,
      boilerplateDropped: Long,
      train: Long, valN: Long, test: Long,
      mixed: Long, evalSample: Long, shards: Long)

  /** Result of [[run]]: the packed training shards, stage counts, the
    * temperature-derived per-source keep rates (|sources|-sized — lets
    * the spec verify the mix against an independent hash oracle), and
    * coarse per-phase wall seconds. Phase attribution in a lazy engine
    * is by FIRST materializing action: each entry pays the upstream
    * stages its action forced (the clean count pays quality+decontam,
    * the pairs count pays both detectors, etc.) — honest enough for the
    * "which stage went super-linear" question the scale probe asks. */
  case class Result(packed: DataFrame, counts: Counts,
      rates: Map[String, Double], train: DataFrame, split: DataFrame,
      timings: Seq[(String, Double)])

  def run(spark: SparkSession, dir: String): Result = {
    val allDocs = Tables.documents(spark, dir)
    val allEmb = Tables.embeddings(spark, dir)

    // 0. quality hygiene at scan speed: Gopher prose-band rules with the
    //    stopword floor relaxed to 1 (the synthetic fixture text is
    //    stopword-light; real corpora use the defaults). Runs FIRST so
    //    every shuffling stage downstream sees a smaller corpus.
    val quality = TextQueries.gopherRules(allDocs, minStopHits = 1)
      .select("doc_id")
    val qualityDocs = allDocs.join(quality, "doc_id")

    // 0b. eval-suite decontamination: the doc_id % 100 == 7 cohort stands
    //     in for a benchmark suite (as in text_contamination). Corpus
    //     docs sharing ≥5% of their distinct trigrams with it are
    //     dropped, as are the benchmark docs themselves — eval data must
    //     never reach a training shard. The benchmark side comes from
    //     the UNFILTERED corpus: an eval doc the quality rules happened
    //     to drop still contaminates — its n-grams must stay in the
    //     filter, only the CORPUS side is quality-gated. Bloom path: a
    //     real suite's n-gram set may not fit a broadcast join;
    //     production callers pass expectedItems to skip the sizing count.
    val isBench = col("doc_id") % 100 === 7
    val decontamInput = allDocs.where(isBench)
      .unionByName(qualityDocs.where(!isBench))
    val contaminated = TextQueries
      .contaminationBloomVs(decontamInput, isBench, threshold = 0.05, fpp = 1e-4)
      .select("doc_id")
    val docs = qualityDocs
      .where(!isBench)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .cache()
    // dedup evidence must come from the CLEAN corpus: a pair against a
    // dropped doc could otherwise steal a surviving doc's cluster
    // representative slot
    val emb = allEmb.join(
      docs.select(col("doc_id").as("vec_id")), "vec_id")

    // 1. near-duplicate pairs from TWO independent detectors — lexical
    //    (exact n-gram Jaccard over an inverted shingle index; swap in
    //    minhashLshPairs for the sketch route) and semantic (SemDeDup
    //    cluster-then-prune over the documents' embeddings, vec_id ==
    //    doc_id in the fixtures). Real pipelines union detectors: the
    //    connected components downstream merge overlapping evidence.
    //    ONE jaccard pass at the LOOSE J ≥ 0.3 band serves two consumers:
    //    the ≥ 0.5 slice feeds dedup here, the full band keys the
    //    leakage-safe split below — candidate generation is
    //    threshold-independent, so a second corpus shingle pass would buy
    //    nothing. Cached for the double consumption (docs already is).
    val pairs03 = Dedup.jaccardPairs(docs, threshold = 0.3).cache()
    val lexPairs = pairs03.where(col("jaccard") >= 0.5)
    val semPairs = SimilaritySearch.semanticDupPairs(emb, threshold = 0.5)
    val pairs = lexPairs.select("id_a", "id_b")
      .union(semPairs.select("id_a", "id_b"))
      .distinct()

    // 2. one survivor per duplicate cluster + all singletons
    val retained = Dedup.retain(docs, pairs)
    val retainedDocs = docs.join(retained.select("doc_id"), "doc_id")

    // 2b. boilerplate filter: a surviving representative whose text is
    //     still ≥80% cross-doc duplicated 40-char spans is template
    //     sludge, not content — drop it. Runs on the RETAINED set: span
    //     duplication against a doc's own removed clones is not
    //     boilerplate evidence. Docs too short to carry a window have no
    //     span verdict and are kept (left join + coalesce).
    val spans = Dedup.dupSpans(retainedDocs)
    val filteredDocs = retainedDocs
      .join(spans.select(col("doc_id"), col("dup_frac")), Seq("doc_id"), "left")
      .where(coalesce(col("dup_frac"), lit(0.0)) < 0.8)
      .drop("dup_frac")

    // phase timing by first materializing action (see Result scaladoc) —
    // started here because canonicalize below is EAGER (edge count +
    // driver union-find / propagation rounds) and must not run invisibly
    // before the harness exists
    val timings = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    def timed[A](phase: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      timings += phase -> (System.nanoTime() - t0) / 1e9
      r
    }

    // 3. LEAKAGE-SAFE train/val/test assignment: retention above already
    //    removed near-dups at the detectors' J ≥ 0.5 band, but residual
    //    MEDIUM-similarity pairs (J ≥ 0.3 — below the drop threshold,
    //    still memorization-adjacent) must never straddle train/test, so
    //    the split key is the cluster representative at the looser band,
    //    restricted to pairs whose BOTH endpoints survived retention.
    //    Unclustered docs hash exactly as plain hashSplit would — the
    //    guard only ever moves documents that have a residual near-dup.
    val survivorA = filteredDocs.select(col("doc_id").as("id_a"))
    val survivorB = filteredDocs.select(col("doc_id").as("id_b"))
    val splitClusters = timed("split clusters (J>=0.3 CC)")(
      Dedup.canonicalize(pairs03.join(survivorA, "id_a").join(survivorB, "id_b")))
    val split = Corpus.leakageSafeSplit(filteredDocs, splitClusters)

    val nDocs = timed("scan")(allDocs.count())
    val nClean = timed("quality+decontam")(docs.count())
    val nQuality = qualityDocs.count()
    val nPairs = timed("dup detectors (lex+sem)")(pairs.count())
    val nRetained = timed("retain (CC + survivors)")(retainedDocs.count())

    // 4. data mixing on the train split with TEMPERATURE-DERIVED rates
    //    (the XLM-R p_s ∝ n_s^α rebalancing, α=0.5): low-resource sources
    //    are upweighted relative to proportional sampling, and the rates
    //    come from the train split's own source counts — budget = half
    //    the split — rather than hand tuning. temperatureRates returns a
    //    |sources|-sized local frame, so the join back is a broadcast.
    val splitCounts = timed("spans filter + split") {
      split.groupBy("split").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val nTrain = splitCounts.getOrElse("train", 0L)
    val train = split.where(col("split") === "train")
    val ratesDf = Corpus.temperatureRates(
      train, col("source"), alpha = 0.5, budget = math.max(1L, nTrain / 2))
    val rates = ratesDf.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val mixed = Corpus.mixtureSample(
        train.join(broadcast(ratesDf), col("source") === col("src")),
        col("doc_id"), col("rate"))
      .drop("src", "rate")

    // 5. bounded eval sample from the val split: 3 per (source, lang)
    val evalSample = Corpus.stratifiedSample(
      split.where(col("split") === "val"), Seq("source", "lang"), k = 3,
      key = col("doc_id"))

    // 6. pack the mixed train docs into ~2000-BPE-token shards per source
    val packed = Corpus.packShards(
      mixed.select(col("doc_id"), col("source"),
        TextFunctions.bpeTokenCount(col("text")).as("n_bpe")),
      partitionKey = col("source"), order = col("doc_id"),
      weight = col("n_bpe"), budget = 2000L)

    val nMixed = timed("temperature mix")(mixed.count())
    val nEval = timed("stratified eval sample")(evalSample.count())
    val nShards = timed("shard packing")(
      packed.select("source", "shard").distinct().count())
    val counts = Counts(
      docs = nDocs,
      qualityPass = nQuality,
      contaminated = contaminated.count(),
      clean = nClean,
      dupPairs = nPairs,
      semPairs = semPairs.count(),
      retained = nRetained,
      boilerplateDropped = nRetained - filteredDocs.count(),
      train = nTrain,
      valN = splitCounts.getOrElse("val", 0L),
      test = splitCounts.getOrElse("test", 0L),
      mixed = nMixed,
      evalSample = nEval,
      shards = nShards)
    Result(packed, counts, rates, train, split, timings.toSeq)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
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
    val t0 = System.nanoTime()
    val r = run(spark, dir)
    val c = r.counts
    val secs = (System.nanoTime() - t0) / 1e9
    val phases = r.timings
      .map { case (p, s) => f""""$p":$s%.2f""" }.mkString("{", ",", "}")
    val rateJson = r.rates.toSeq.sorted
      .map { case (s, v) => s""""$s":$v""" }.mkString("{", ",", "}")
    println(f"""{"workload":"corpus_pipeline","dir":"$dir","docs":${c.docs},"quality_pass":${c.qualityPass},"contaminated":${c.contaminated},"clean":${c.clean},"dup_pairs":${c.dupPairs},"sem_pairs":${c.semPairs},"retained":${c.retained},"boilerplate_dropped":${c.boilerplateDropped},"train":${c.train},"val":${c.valN},"test":${c.test},"mixed":${c.mixed},"eval_sample":${c.evalSample},"shards":${c.shards},"rates":$rateJson,"phase_sec":$phases,"sec":$secs%.1f}""")
    spark.stop()
  }
}
