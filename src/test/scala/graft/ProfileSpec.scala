package graft

import graft.text.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ad-hoc stage profiler (not a correctness gate). Run explicitly:
  * testOnly graft.ProfileSpec */
class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.1"

  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  /** 8× perturbed replicas (±0.1% scale per replica) of the embeddings
    * fixture, CACHED — the shared 16k-vector stress input. Exact
    * duplicates would make every LSH bucket degenerate, which no real
    * corpus does; unpersist when the probe is done. */
  private def replicate8x(emb: org.apache.spark.sql.DataFrame) =
    (0 until 8).map(r =>
        emb.select((col("vec_id") + lit(r * 100000L)).as("vec_id"),
          transform(col("embedding").cast("array<double>"),
            x => x * lit(1.0 + r * 0.001)).as("embedding")))
      .reduce(_ union _).cache()

  test("minhash stage timing") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("scan count")(docs.count())
    time("tokenize")(docs.select(tokens(col("text")).as("t")).agg(sum(size(col("t")))).collect())
    time("shingles")(docs.select(shingles(col("text"), 3).as("s")).agg(sum(size(col("s")))).collect())
    time("shingle md5")(docs.select(
      transform(shingles(col("text"), 3), s => pmod(md5Hash64(s), lit(HashMod))).as("hs"))
      .agg(sum(size(col("hs")))).collect())
    val full = time("full minhashLshPairs")(
      ops.Dedup.minhashLshPairs(docs, threshold = 0.8).count())
    println(s"[profile] pairs=$full")
    // minhash internals (force evaluation via agg over the built columns)
    import graft.text.TextFunctions._
    val withSh = docs
      .select(col("doc_id").as("id"), shinglesFast(3)(tokens(col("text"))).as("sh"))
      .withColumn("hs", transform(col("sh"), s => pmod(xxhash64(s), lit(HashMod))))
      .cache()
    time("shingle+hash materialize")(
      withSh.agg(sum(size(col("hs"))), sum(size(col("sh")))).collect())
    time("cached re-agg")(withSh.agg(sum(size(col("hs")))).collect())
    val second = time("minhash again (warm)")(
      ops.Dedup.minhashLshPairs(docs, threshold = 0.8).count())
    // sub-stages on the cached frame
    val params = Array.tabulate(64)(i => (2L * i + 1, 3L * i + 7))
    val sigUdf = udf { (hs: Seq[Long]) =>
      val sig = params.map { case (a, b) =>
        var m = Long.MaxValue; var i = 0
        while (i < hs.length) { val v = (a * hs(i) + b) % HashMod; if (v < m) m = v; i += 1 }
        if (m == Long.MaxValue) 0L else m
      }
      (0 until 16).map { b =>
        var acc = 1125899906842597L
        var r = 0
        while (r < 4) { acc = acc * 31 + sig(b * 4 + r); r += 1 }
        (b, acc)
      }
    }
    val bandsDF = withSh.select(col("id"), explode(sigUdf(col("hs"))).as("band"))
      .select(col("id"), col("band._1").as("band_id"), col("band._2").as("band_hash"))
    time("bands (sig udf + explode)")(bandsDF.count())
    val cands2 = bandsDF.as("a").join(bandsDF.as("b"), Seq("band_id", "band_hash"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    time("cands (band self-join)")(cands2.count())
    val sets = withSh.select(col("id"), col("sh"))
    time("verify (2 joins + jaccard)")(cands2
      .join(sets.as("sa"), col("id_a") === col("sa.id"))
      .join(sets.as("sb"), col("id_b") === col("sb.id"))
      .select((size(array_intersect(col("sa.sh"), col("sb.sh"))).cast("double") /
        size(array_union(col("sa.sh"), col("sb.sh")))).as("j"))
      .where(col("j") >= 0.8).count())
    withSh.unpersist()
    val cands = time("jaccard full")(
      ops.Dedup.jaccardPairs(docs, threshold = 0.8).count())
    println(s"[profile] jaccard pairs=$cands")
  }

  test("scale stress: dedup_canonical distributed branch above the cutover") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    import spark.implicits._
    // Synthetic duplicate graph ABOVE the 2M-directed-edge union-find
    // cutover, with known components, mirroring real dup-graph shape:
    // mostly small cliques (star edges, diameter 2) plus a chain tail
    // (the propagation worst case — rounds grow with chain length).
    //  - 300k cliques of 4: ids [c·4, c·4+3], 3 pairs each  → 900k pairs
    //  - 30k chains of 11: ids CH+c·11+k, 10 pairs each     → 300k pairs
    // 1.2M pairs → 2.4M directed edges → distributed branch.
    val CH = 10000000L
    // `div` (integer division) — `/` on longs is DOUBLE division in Spark
    // and the operator contract is integral ids
    val cliquePairs = spark.range(300000L * 3).select(
      expr("(id div 3) * 4").as("id_a"),
      expr("(id div 3) * 4 + pmod(id, 3) + 1").as("id_b"))
    val chainPairs = spark.range(30000L * 10).select(
      expr(s"$CH + (id div 10) * 11 + pmod(id, 10)").as("id_a"),
      expr(s"$CH + (id div 10) * 11 + pmod(id, 10) + 1").as("id_b"))
    val pairs = cliquePairs.union(chainPairs).cache()
    println(s"[profile] synthetic dup pairs = ${pairs.count()}")

    val t0 = System.nanoTime()
    val canon = ops.Dedup.canonicalize(pairs)
    // expected canonical = component base id
    val expected = pairs.select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
      .withColumn("expected",
        when(col("id") < CH, expr("(id div 4) * 4"))
          .otherwise(expr(s"$CH + ((id - $CH) div 11) * 11")))
    val wrong = canon.join(expected, "id")
      .where(col("canonical_id") =!= col("expected")).count()
    val secs = (System.nanoTime() - t0) / 1e9
    val rounds = ops.Dedup.lastPropagationRounds
    println(f"[profile] canonical @1.2M pairs: $secs%.1f s total, " +
      f"$rounds rounds (${secs / math.max(1, rounds)}%.2f s/round), wrong=$wrong")
    assert(wrong == 0, "distributed min-label propagation must be exact")
    assert(rounds > 0, "probe must exercise the distributed branch")
    assert(rounds < 20, "must converge before the round cap")
    pairs.unpersist()
  }

  test("scale stress: retain() end-to-end above the union-find cutover") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // Same synthetic duplicate graph as the canonicalize probe (1.2M
    // pairs → distributed branch), PLUS a 1M-doc singleton majority —
    // retain() adds the representative window and the survivor anti-join
    // on top of canonicalize, so this exercises the full composite at the
    // same scale with a known-correct retained set.
    val CH = 10000000L
    val SG = 100000000L
    val cliquePairs = spark.range(300000L * 3).select(
      expr("(id div 3) * 4").as("id_a"),
      expr("(id div 3) * 4 + pmod(id, 3) + 1").as("id_b"))
    val chainPairs = spark.range(30000L * 10).select(
      expr(s"$CH + (id div 10) * 11 + pmod(id, 10)").as("id_a"),
      expr(s"$CH + (id div 10) * 11 + pmod(id, 10) + 1").as("id_b"))
    val pairs = cliquePairs.union(chainPairs).cache()
    println(s"[profile] synthetic dup pairs = ${pairs.count()}")
    // docs = every clustered id + 1M singletons; n_chars deterministic so
    // the expected representative (longest text, ties to smallest id) is
    // recomputable from the known component structure
    val docs = spark.range(300000L * 4).select(col("id").as("doc_id"))
      .union(spark.range(30000L * 11).select((lit(CH) + col("id")).as("doc_id")))
      .union(spark.range(1000000L).select((lit(SG) + col("id")).as("doc_id")))
      .withColumn("n_chars", (pmod(col("doc_id"), lit(7)) * 100 + 50).cast("int"))
      .cache()
    println(s"[profile] synthetic docs = ${docs.count()}")

    val t0 = System.nanoTime()
    val retained = ops.Dedup.retain(docs, pairs).cache()
    val n = retained.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[profile] retain @1.2M pairs + 2.53M docs: $secs%.1f s, $n rows, " +
      s"${ops.Dedup.lastPropagationRounds} propagation rounds")

    // the anti-join's build side is planner-chosen since the broadcast
    // hint was removed — surface what it actually picked at this scale
    retained.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("LeftAnti"))
      .foreach(l => println(s"[profile] anti-join: ${l.trim.take(120)}"))

    // exactly one survivor per cluster (300k cliques of 4, 30k chains of
    // 11) + every singleton, each with its true cluster_size — the window
    // partitions are per-canonical_id, so the largest partition it can
    // see IS the largest cluster (11 here)
    val kinds = retained.withColumn("kind",
        when(col("doc_id") >= SG, "singleton")
          .when(col("doc_id") >= CH, "chain").otherwise("clique"))
      .groupBy("kind")
      .agg(count(lit(1)).as("n"), min("cluster_size").as("lo"), max("cluster_size").as("hi"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(kinds("clique") == ((300000L, 4L, 4L)), s"cliques: ${kinds("clique")}")
    assert(kinds("chain") == ((30000L, 11L, 11L)), s"chains: ${kinds("chain")}")
    assert(kinds("singleton") == ((1000000L, 1L, 1L)), s"singletons: ${kinds("singleton")}")

    // representative correctness: recompute the expected survivor set
    // from the known component structure and require set equality
    val trueCluster = when(col("doc_id") >= SG, col("doc_id"))
      .when(col("doc_id") >= CH, expr(s"$CH + ((doc_id - $CH) div 11) * 11"))
      .otherwise(expr("(doc_id div 4) * 4"))
    val expected = docs.withColumn("c", trueCluster)
      .withColumn("rn", row_number().over(
        Window.partitionBy("c").orderBy(col("n_chars").desc, col("doc_id").asc)))
      .where(col("rn") === 1).select("doc_id")
    assert(retained.select("doc_id").except(expected).count() == 0,
      "retained a non-representative document")
    assert(n == 300000L + 30000L + 1000000L, s"row count $n")
    retained.unpersist(); docs.unpersist(); pairs.unpersist()
  }

  test("scale stress: bloom vs broadcast decontamination at a 1M-shingle benchmark") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    // SCALING.md claims the bloom/broadcast crossover is BENCHMARK-set
    // size, not corpus size. Measure both branches on a synthetic corpus
    // whose contaminated set is analytic: 100k docs of 50 tokens drawn
    // deterministically from a 50k vocab (trigram collisions across
    // different docs ≈ 0), with every doc_id % 20 == 3 corpus doc an
    // exact token-copy of bench doc (doc_id % 20000). Bench = ids
    // < 20k (~960k distinct bench trigrams); contamination of a copy is
    // 1.0, of everything else ~0 — so the flagged set must be exactly
    // the copies, on BOTH branches.
    val n = 100000L
    val nBench = 20000L
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(49)),
        i => concat(lit("w"),
          pmod(xxhash64(
            when(col("id") >= nBench && col("id") % 20 === 3,
              col("id") % nBench).otherwise(col("id")) * 53L + i),
            lit(50000L))))).as("text"))
      .cache()
    docs.count()
    val isBench = col("doc_id") < nBench
    val expectCopies = ((nBench until n).count(i => i % 20 == 3)).toLong
    // time the MATERIALIZATION (construction is lazy; the bloom branch's
    // sketch-build job and both branches' full evaluation must be inside
    // the timer for the comparison to mean anything)
    val exact = time("exact (broadcast join) decontaminate") {
      val f = text.TextQueries.contaminationVs(docs, isBench, 0.5).cache()
      f.count(); f
    }
    val nExact = exact.count()
    val bloom = time("bloom (1e-4, sized) decontaminate") {
      val f = text.TextQueries.contaminationBloomVs(docs, isBench, 0.5, 1e-4,
        expectedItems = Some(1200000L)).cache()
      f.count(); f
    }
    val nBloom = bloom.count()
    val missed = exact.join(bloom, Seq("doc_id"), "left_anti").count()
    println(s"[profile] decontam @100k docs / ~1M bench shingles: " +
      s"exact=$nExact bloom=$nBloom expected=$expectCopies missed=$missed")
    assert(nExact == expectCopies, "exact branch must flag exactly the copies")
    assert(missed == 0, "bloom must flag every exact-contaminated doc")
    assert(nBloom >= nExact && nBloom <= nExact + 50,
      "bloom false-positive docs must stay within the fpp budget")
    exact.unpersist(); bloom.unpersist(); docs.unpersist()
  }

  test("scale stress: DSIR weighting at 100k docs (bounded feature table)") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    // The scale claim on dsirWeights: the model is CAPPED at `buckets`
    // regardless of corpus size (bounded broadcast), and the weights
    // separate domains. 100k 50-token docs over a 5k vocab; the target
    // cohort (ids < 5k) draws from the first 500 words; raw docs with
    // id % 10 == 1 are target-like (same sub-vocabulary), the rest draw
    // from the disjoint tail. Target-like raw docs must score higher.
    val n = 100000L
    val nTarget = 5000L
    val targetLike = col("id") < nTarget || col("id") % 10 === 1
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(49)),
        i => concat(lit("w"), when(targetLike,
          pmod(xxhash64(col("id") * 53L + i), lit(500L)))
          .otherwise(pmod(xxhash64(col("id") * 53L + i), lit(4500L)) + 500L))))
        .as("text"))
      .cache()
    docs.count()
    val w = time("dsir weights @100k docs") {
      val f = text.TextQueries.dsirWeights(docs, col("doc_id") < nTarget).cache()
      f.count(); f
    }
    val stats = w.withColumn("tl", col("doc_id") % 10 === 1)
      .groupBy("tl").agg(avg("logw").as("m"), count(lit(1)).as("c"))
      .collect().map(r => r.getBoolean(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    println(s"[profile] dsir@100k: target-like mean=${stats(true)._1} " +
      s"(n=${stats(true)._2}) other mean=${stats(false)._1} (n=${stats(false)._2})")
    assert(stats(true)._1 > stats(false)._1,
      "target-like raw docs must carry higher importance weights")
    w.unpersist(); docs.unpersist()
  }

  test("scale stress: source overlap exact vs minhash at 100k docs / 40 sources") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    // The scale claim on sourceOverlapMinhashVs: removing the
    // (source, shingle) distinct shuffle beats the exact census once
    // shingle volume dominates, at bounded per-source state. 100k
    // 30-token docs over 40 sources; sources 2k..2k+1 share a
    // vocabulary slice (planted overlap), others draw from disjoint
    // ranges — the probe checks the estimates still track exact at
    // this scale, then compares wall time.
    val n = 100000L
    // sources 2k and 2k+1 share a "slice": half of each source's docs
    // are clones drawn from the slice's 1000-text pool (trigram overlap
    // needs shared token SEQUENCES, not just shared words), the other
    // half is unique per doc
    val slice = (pmod(col("id"), lit(40L)) / lit(2L)).cast("long")
    val cloneIdx = (col("id") / lit(40L)).cast("long") % lit(1000L)
    // parity of the per-source row index (id div 40), NOT of id itself —
    // a source holds only ids ≡ s (mod 40), so id-parity would give odd
    // sources zero clones
    val tokenSeed = when(pmod((col("id") / lit(40L)).cast("long"), lit(2L)) === 0,
      slice * lit(1000000L) + cloneIdx * lit(100L))
      .otherwise(col("id") * lit(31L) + lit(50000000L))
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      concat(lit("src"), pmod(col("id"), lit(40L))).as("source"),
      concat_ws(" ", transform(sequence(lit(0), lit(29)),
        i => concat(lit("w"), pmod(xxhash64(tokenSeed + i), lit(100000000L)))))
        .as("text"))
      .cache()
    docs.count()
    val exact = time("source overlap exact @100k") {
      val f = ops.Dedup.sourceOverlap(docs)
      val rows = f.collect(); rows
    }
    val est = time("source overlap minhash @100k") {
      ops.Dedup.sourceOverlapMinhashVs(docs).collect()
    }
    val exactMap = exact.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val bound = 3.0 / (2.0 * math.sqrt(128))
    var maxErr = 0.0
    est.foreach { r =>
      val t = exactMap.getOrElse((r.getString(0), r.getString(1)), 0.0)
      maxErr = math.max(maxErr, math.abs(r.getDouble(2) - t))
    }
    println(f"[profile] overlap@100k: ${est.length} pairs, max |est-exact| $maxErr%.4f (bound $bound%.4f)")
    assert(est.length == 40 * 39 / 2)
    assert(maxErr <= bound, s"max err $maxErr exceeds $bound")
    // planted same-slice pairs must rank above disjoint ones
    val planted = est.filter(r => r.getString(0).drop(3).toInt / 2 ==
      r.getString(1).drop(3).toInt / 2).map(_.getDouble(2))
    val disjoint = est.filter(r => r.getString(0).drop(3).toInt / 2 !=
      r.getString(1).drop(3).toInt / 2).map(_.getDouble(2))
    assert(planted.min > (if (disjoint.isEmpty) 0.0 else disjoint.max),
      "planted overlapping source pairs must dominate")
    docs.unpersist()
  }

  test("scale stress: corpus-pipeline composition at 100k docs (per-phase linearity)") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    // Every stage has an individual probe; this one runs the FULL
    // CorpusPipeline.run composition on synthetic fixtures at 25k and
    // 100k docs and checks no phase scales super-linearly (4× data →
    // each phase ≤ 8× wall, i.e. 2× linear headroom for fixed per-job
    // overhead at the small end). Corpus shape: 5 sources with skewed
    // sizes (temperature mixing has something to rebalance), every
    // id % 10 == 9 doc an exact clone of id−1 (the dedup path works),
    // stopwords at every 5th token (the Gopher rules keep prose),
    // embeddings for the first 8k ids (the semantic detector's own
    // scale knob — nlist — has its own probe; the composition sizes the
    // lexical path).
    import org.apache.spark.sql.Column
    def genFixture(n: Long): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"pipe$n").toString
      val effId = when(col("id") % 10 === 9, col("id") - 1).otherwise(col("id"))
      val stops = array(lit("the"), lit("and"), lit("of"), lit("to"), lit("is"))
      def tok(j: Column): Column =
        when(pmod(j, lit(5)) === 0,
          element_at(stops, (pmod(j / 5, lit(5)) + 1).cast("int")))
          .otherwise(concat(lit("w"),
            pmod(xxhash64(effId * 31L + j), lit(1000000L))))
      val srcBand = pmod(xxhash64(col("id") * 13L), lit(100L))
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(39)), j => tok(j))).as("text"),
        lit("en").as("lang"),
        when(srcBand < 60, "s0").when(srcBand < 85, "s1")
          .when(srcBand < 95, "s2").when(srcBand < 99, "s3")
          .otherwise("s4").as("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.parquet(s"$dir/documents.parquet")
      spark.range(math.min(n, 8000L)).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(15)), j =>
          (pmod(xxhash64(when(col("id") % 10 === 9, col("id") - 1)
            .otherwise(col("id")) * 71L + j), lit(2000L)).cast("float")
            - 1000.0f) / 1000.0f).as("embedding"),
        (col("id") % 10).cast("int").as("label"))
        .write.parquet(s"$dir/embeddings.parquet")
      dir
    }
    def runAt(n: Long): Map[String, Double] = {
      val dir = genFixture(n)
      val r = time(s"pipeline @$n")(graft.examples.CorpusPipeline.run(spark, dir))
      val c = r.counts
      println(s"[profile] pipeline @$n: clean=${c.clean} pairs=${c.dupPairs} " +
        s"retained=${c.retained} mixed=${c.mixed} shards=${c.shards} rates=${r.rates}")
      r.timings.foreach { case (p, s) => println(f"[profile]   @$n $p: $s%.2f s") }
      // composition sanity at scale: dedup actually removed the clones
      assert(c.retained < c.clean, "clone structure must be deduped")
      assert(c.mixed > 0 && c.shards > 0)
      spark.catalog.clearCache()
      r.timings.toMap
    }
    val t25 = runAt(25000L)
    val t100 = runAt(100000L)
    t100.foreach { case (phase, s100) =>
      val s25 = t25(phase)
      assert(s100 <= math.max(s25, 0.5) * 8,
        f"phase '$phase' super-linear: $s25%.2f s @25k -> $s100%.2f s @100k")
    }
  }

  test("scale stress: bloom vs broadcast SPAN decontamination at a ~1M-window benchmark") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    // The span twin's broadcast side is |suite chars| STRIDE-1 window
    // hashes — it outgrows a broadcastable join side far sooner than the
    // doc-level shingle set. Measure both branches where the bench side
    // is ~1M windows. Corpus: 50k docs; bench = ids < 5k built from
    // "w"-tokens; every corpus id % 20 == 3 embeds a verbatim copy of
    // bench doc (id % 5k)'s tokens 10..29 between unique "u"-token head/
    // tail — token widths vary with the hash, so the copy lands at an
    // id-dependent char offset: exactly the any-offset case the stride-1
    // benchmark side exists for. Non-copy docs share nothing ("u" vs "w"
    // prefixes), so the flagged set must be exactly the copies.
    import org.apache.spark.sql.Column
    val n = 50000L
    val nBench = 5000L
    def btok(id: Column, j: Column): Column =
      concat(lit("w"), pmod(xxhash64(id * 53L + j), lit(50000L)))
    def otok(id: Column, j: Column): Column =
      concat(lit("u"), pmod(xxhash64(id * 97L + j), lit(50000L)))
    def run(id: Column, lo: Int, hi: Int, tok: (Column, Column) => Column): Column =
      concat_ws(" ", transform(sequence(lit(lo), lit(hi)), j => tok(id, j)))
    val isCopy = col("id") >= nBench && col("id") % 20 === 3
    val docs = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") < nBench, run(col("id"), 0, 39, btok))
        .otherwise(concat_ws(" ",
          run(col("id"), 0, 9, otok),
          when(isCopy, run(col("id") % nBench, 10, 29, btok))
            .otherwise(run(col("id"), 10, 29, otok)),
          run(col("id"), 30, 39, otok))).as("text"))
      .cache()
    docs.count()
    val isBench = col("doc_id") < nBench
    val expectCopies = (nBench until n).count(_ % 20 == 3).toLong
    val exact = time("exact span (broadcast ~1M-hash join) decontaminate") {
      val f = text.TextQueries.contaminationSpansVs(docs, isBench).cache()
      f.count(); f
    }
    val nExact = exact.count()
    val bloom = time("bloom span (1e-4, sized) decontaminate") {
      val f = text.TextQueries.contaminationSpansBloomVs(docs, isBench,
        fpp = 1e-4, expectedItems = Some(1500000L)).cache()
      f.count(); f
    }
    val nBloom = bloom.count()
    val missed = exact.join(bloom, Seq("doc_id"), "left_anti").count()
    println(s"[profile] span decontam @50k docs / ~1M bench windows: " +
      s"exact=$nExact bloom=$nBloom expected=$expectCopies missed=$missed")
    assert(nExact == expectCopies, "exact branch must flag exactly the copies")
    assert(missed == 0, "bloom must flag every exact-contaminated doc")
    assert(nBloom >= nExact && nBloom <= nExact + 50,
      "bloom false-positive docs must stay within the fpp budget")
    exact.unpersist(); bloom.unpersist(); docs.unpersist()
  }

  test("scale stress: IVF-PQ at 16k vectors (scale-adjusted nlist)") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    // SCALING guidance says raise nlist to keep cells executor-sized as
    // n grows; validate recall parity vs same-parameter IVF holds above
    // fixture scale with 8x perturbed replicas and nlist scaled 16→64.
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val big = replicate8x(emb)
    val n = big.count()
    val exact = time("exact top-5 @16k") {
      val f = ops.SimilaritySearch.bruteTopK(big, k = 5).select("i", "j").cache()
      f.count(); f
    }
    val nExact = exact.count().toDouble
    def recallOf(res: org.apache.spark.sql.DataFrame): Double =
      res.join(exact, Seq("i", "j")).count() / nExact
    val ivfRecall = time("IVF @16k (nlist=64, nprobe=8)")(recallOf(
      ops.SimilaritySearch.ivfTopK(big, k = 5, nlist = 64, nprobe = 8)
        .select("i", "j")))
    val pqRecall = time("IVF-PQ @16k (nlist=64, nprobe=8, residual m=16/refine=10)")(recallOf(
      ops.SimilaritySearch.pqTopK(big, k = 5, nlist = 64, nprobe = 8)
        .select("i", "j")))
    println(s"[profile] pq@16k: n=$n ivf_recall=$ivfRecall pq_recall=$pqRecall")
    // the two quantizers train on different inputs (raw vs unit vectors)
    // so their probed cell slices differ — compare each against EXACT:
    // ADC + refine must not cost a measurable slice of what cells find
    assert(pqRecall >= ivfRecall - 0.05,
      s"PQ recall $pqRecall must track IVF recall $ivfRecall above fixture scale")
    exact.unpersist(); big.unpersist()
  }

  test("scale stress: LM-perplexity at 100k docs (corpus-sized bigram model)") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    // The model (bigram + unigram count tables) is corpus-sized by
    // design — never broadcast, never collected. Validate the composite
    // at 100k 50-token docs over a 5k vocab (so bigrams REPEAT and the
    // count aggregation does real combining, unlike a fixture where
    // most bigrams are singletons).
    val n = 100000L
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(49)),
        i => concat(lit("w"), pmod(xxhash64(col("id") * 53L + i), lit(5000L)))))
        .as("text"))
      .cache()
    docs.count()
    val out = time("lm perplexity @100k docs") {
      val f = text.TextQueries.lmPerplexityVs(docs).cache()
      f.count(); f
    }
    val stats = out.agg(count(lit(1)).as("rows"),
      min("ppl").as("pmin"), max("ppl").as("pmax"),
      sum(when(col("avg_logp") < 0, 0).otherwise(1)).as("badLogp")).head
    println(s"[profile] lm @100k: rows=${stats.getLong(0)} " +
      s"ppl range=[${stats.getDouble(1)}, ${stats.getDouble(2)}]")
    assert(stats.getLong(0) == n, "every >=2-token doc must score")
    assert(stats.getLong(3) == 0, "log-probabilities are strictly negative")
    assert(stats.getDouble(1) > 0, "perplexity strictly positive")
    out.unpersist(); docs.unpersist()
  }

  test("scale stress: batched distributed BPE at 1000 merges / 100k docs") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    // The r8 batched merge loop: one vocab pass buys up to 64 merges.
    // The probe pins (1) bit-exactness vs the driver loop at a merge
    // budget 30x the per-round gate's, (2) vocab passes sublinear in
    // merges — the property that makes a 32k-merge vocabulary hundreds
    // of rounds instead of 32k job barriers.
    // ZIPFIAN word draw (log-uniform rank over [1, 50000]) spelled as
    // HASH-RANDOM 2-7 letter strings: batching is tie- and chain-limited
    // by design — the provable prefix stops where a changed pair could
    // reach into the ranking — so the probe corpus must look like
    // language, not like a counter. Two rejected spellings, both
    // measured: a "w"+digits vocab (11-char alphabet, 598-748 passes for
    // 1000 merges) and base-26-of-rank (leading-'a' padding puts "aaa"
    // at the head of every frequent word, 575 passes) — in both, the top
    // pairs all chain through a handful of shared symbols, which is
    // genuinely sequential work. Letter-diverse zipfian words are the
    // workload the batch rule exists for.
    val n = 100000L
    def spellHash(rank: org.apache.spark.sql.Column) = {
      val len = pmod(xxhash64(rank * 2654435761L), lit(6L)) + lit(2L)
      concat_ws("", transform(sequence(lit(1L), len),
        i => chr(pmod(xxhash64(rank * 31L + i * 7L), lit(26L)) + lit(97))))
    }
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(49)),
        i => spellHash(floor(pow(lit(50000.0),
          pmod(xxhash64(col("id") * 53L + i), lit(1000000L)) / lit(1000000.0))))))
        .as("text"))
      .cache()
    docs.count()
    val merges = 1000
    val driver = time("bpe driver loop @1000 merges") {
      text.BpeTrainer.train(docs, numMerges = merges, maxDriverVocab = Long.MaxValue)
    }
    val dist = time("bpe batched dist loop @1000 merges") {
      text.BpeTrainer.train(docs, numMerges = merges, maxDriverVocab = 0L)
    }
    val rounds = text.BpeTrainer.lastDistributedRounds
    println(s"[profile] bpe: merges=${dist.length} vocabPasses=$rounds " +
      s"(vs $merges sequential rounds)")
    assert(dist == driver, "batched distributed loop must be bit-exact vs driver")
    // Measured: 341 passes for 1000 merges on this corpus, deterministic
    // across runs (mean batch ≈ 2.9 merges/pass — the provable-prefix
    // rule is tie/chain-limited early, and acceptance grows as merges
    // spread the count distribution, which is why the 32k-merge regime
    // does proportionally better). The bound scales with the merge count
    // (2/5 of merges = measured 0.341 ratio plus drift headroom) so a
    // future change to the probe's `merges` keeps enforcing batching —
    // a fixed cap at one merge count silently stops constraining others.
    assert(rounds > 0 && rounds <= merges * 2 / 5,
      s"vocab passes must stay batched: $rounds for ${dist.length} merges")
    docs.unpersist()
  }

  test("scale stress: full x2p composite at 16k (approx-kNN path)") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    // The x2p composite (candidates → top-k → β-search) is gated at 500
    // rows and its kNN stage probed at 16k, but the full composite —
    // including the grouped calibration UDF over LSH neighborhoods — only
    // ever ran at fixture scale before this probe. Same 8x perturbed
    // replica construction as the kNN probe.
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val big = replicate8x(emb)
    val n = big.count()
    println(s"[profile] x2p input rows = $n")
    val cand = time("x2p candidates (w=0.05, 8x2)")(
      tsne.KNN.approxCandidates(big, "vec_id", "embedding", 0.05, 8, 2).count())
    val t0 = System.nanoTime()
    val p = time("x2p full composite @16k")(
      tsne.X2P.x2p(big, "vec_id", "embedding", perplexity = 20,
        approxBucketLength = Some(0.05)).cache())
    val rows = p.count()
    val secs = (System.nanoTime() - t0) / 1e9
    // β-search normalizes every neighborhood by its own partition sum, so
    // row sums must be 1 to fp error REGARDLESS of how approximate the
    // neighborhood is — the invariant that survives the exact→LSH switch
    val stats = p.groupBy("i").agg(sum("p").as("rs"), count(lit(1)).as("k"))
      .agg(max(abs(col("rs") - 1.0)).as("dev"), count(lit(1)).as("nrows"),
        min("k").as("kmin"), max("k").as("kmax"))
      .collect()(0)
    val dev = stats.getDouble(0)
    println(f"[profile] x2p @16k: $secs%.1f s, $rows p-rows over candidate " +
      f"pairs=$cand, max row-sum dev=$dev%.2e, k range=[${stats.getLong(2)}, ${stats.getLong(3)}]")
    assert(stats.getLong(1) == n, "every input row must calibrate")
    assert(dev < 1e-6, f"row sums must normalize to 1, max dev $dev%.2e")
    val bad = p.where(col("p") < 0 || col("p") > 1 || isnan(col("p"))).count()
    assert(bad == 0, "probabilities must be in [0,1] and finite")
    p.unpersist(); big.unpersist()
  }

  test("scale stress: exact kNN at 8x rows (256M pairs)") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // perturbed replicas (±0.1% per replica) — exact duplicates would
    // make every LSH bucket degenerate, which no real corpus does
    val big = replicate8x(emb)
    println(s"[profile] scaled rows = ${big.count()}")
    val t = time("exact kNN 16k x 16k")(
      tsne.KNN.knn(big, "vec_id", "embedding", 10).count())
    println(s"[profile] knn rows = $t")
    val a = time("approx kNN 16k (LSH, 8x2 compound)")(
      tsne.KNN.knnApprox(big, "vec_id", "embedding", 10, bucketLength = 1.0, numHashTables = 8, hashesPerTable = 2).count())
    println(s"[profile] approx knn rows = $a")
    // unit vectors: projection sigma = 1/sqrt(64) = 0.125 → w ≈ sigma/2
    val nc = time("candidate count (w=0.05, 8x2)")(
      tsne.KNN.approxCandidates(big, "vec_id", "embedding", 0.05, 8, 2).count())
    println(s"[profile] candidates = $nc (exact pairs = ${16000L * 15999})")
    val a3 = time("approx kNN (w=0.05, 8x2)")(
      tsne.KNN.knnApprox(big, "vec_id", "embedding", 10, bucketLength = 0.05,
        numHashTables = 8, hashesPerTable = 2).count())
    val exact = tsne.KNN.knn(big, "vec_id", "embedding", 10)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = tsne.KNN.knnApprox(big, "vec_id", "embedding", 10, bucketLength = 0.05,
        numHashTables = 8, hashesPerTable = 2)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"[profile] approx recall = ${(approx & exact).size.toDouble / exact.size}%.3f")

    // BH iteration scaling: sec/iter at 16k rows vs the 2k bench number
    var iterTimes = List.empty[Double]
    var tPrev = System.nanoTime()
    tsne.BHTSNE.tsne(big, "vec_id", "embedding",
      tsne.TSNEParams(maxIterations = 20, perplexity = 20, earlyExaggeration = 10,
        reportLoss = 0, seed = 42),
      callback = (_, _, _) => {
        val now = System.nanoTime()
        iterTimes ::= (now - tPrev) / 1e9
        tPrev = now
      })
    println(f"[profile] BH @16k sec/iter (median of 20) = ${iterTimes.sorted.apply(10)}%.3f")

    // full-pipeline 100 TB path: BH t-SNE @16k with LSH affinities —
    // the affinity build is where exact kNN's n² dominates at scale
    val tExactAff = time("BH @16k end-to-end, EXACT affinities (2 iters)")(
      tsne.BHTSNE.tsne(big, "vec_id", "embedding",
        tsne.TSNEParams(maxIterations = 2, perplexity = 20,
          earlyExaggeration = 1, reportLoss = 0, seed = 42)).count())
    val tApproxAff = time("BH @16k end-to-end, LSH affinities (2 iters)")(
      tsne.BHTSNE.tsne(big, "vec_id", "embedding",
        tsne.TSNEParams(maxIterations = 2, perplexity = 20,
          earlyExaggeration = 1, reportLoss = 0, seed = 42,
          approxKnn = true, approxKnnBucketLength = Some(0.05))).count())
    println(s"[profile] BH 16k affinity-stage rows: exact=$tExactAff approx=$tApproxAff")
    big.unpersist()
  }

  test("scale stress: paragraph dedup under boilerplate skew (window twin measured)") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    // The scale claim on paragraphDedup: keep-first winners via the
    // hash-partialed keep_first TypedImperativeAggregate stay skew-safe
    // where a row_number() window sorts every occurrence of the hottest
    // paragraph on one task (min(struct) was REJECTED too — it plans a
    // map-side-sorting SortAggregate; see KeepFirst.scala / SCALING.md). 200k docs × 4 unique lines, plus ONE shared
    // boilerplate line on every even doc — a single paragraph hash with
    // 100k occurrences.
    import org.apache.spark.sql.expressions.Window
    val n = 200000L
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat_ws("\n",
        when(col("id") % 2 === 0,
          lit("subscribe to our newsletter for updates\n")).otherwise(lit("")),
        concat(lit("u"), col("id"), lit(" alpha line")),
        concat(lit("u"), col("id"), lit(" bravo line")),
        concat(lit("u"), col("id"), lit(" charlie line")),
        concat(lit("u"), col("id"), lit(" delta line"))).as("text"))
      .cache()
    docs.count()
    // NOTE the derivation above yields an extra empty line on even docs
    // (concat_ws keeps the embedded \n) — itself a cross-doc duplicate,
    // a second hot key. Fine: more skew is the point.
    val thresholds = Seq("128", "1000000")
    val aggs = thresholds.map { t =>
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", t)
      time(s"paragraph dedup (keep_first, fallback=$t)") {
        val f = text.TextQueries.paragraphDedup(docs)
          .agg(sum("n_paras"), sum("n_kept"), count(lit(1))).head
        (f.getLong(0), f.getLong(1), f.getLong(2))
      }
    }
    spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    val agg = aggs.head
    assert(aggs.distinct.size == 1, s"fallback threshold must not change results: $aggs")
    // the rejected twin: identical output (reassembly md5 included),
    // winners ranked by a row_number window over the paragraph hash
    val winT = time("window-ranked twin") {
      val lines = docs
        .select(col("doc_id"), posexplode(split(col("text"), "\n")).as(Seq("p", "line")))
        .withColumn("h", md5(col("line")))
      val w = Window.partitionBy("h").orderBy("doc_id", "p")
      val f = lines.withColumn("rn", row_number().over(w))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_paras"),
          sum(when(col("rn") === 1, 1).otherwise(0)).as("n_kept"),
          md5(array_join(transform(
            array_sort(collect_list(when(col("rn") === 1, struct(col("p"), col("line"))))),
            x => x.getField("line")), "\n")).as("clean_md5"))
        .agg(sum("n_paras"), sum("n_kept"), count(lit(1))).head
      (f.getLong(0), f.getLong(1), f.getLong(2))
    }
    assert(agg == winT, s"twin plans must agree: $agg vs $winT")
    // 6 lines per even doc (boiler + empty + 4 unique), 5 per odd doc;
    // survivors: all unique lines + one boiler + one empty line
    assert(agg._1 == 6 * (n / 2) + 5 * (n / 2), s"total paras: ${agg._1}")
    assert(agg._2 == 4 * n + 2, s"kept: ${agg._2}")
    docs.unpersist()
  }

  test("scale stress: pHash near-dup at 100k real-PNG assets (banding join linearity)") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    import graft.multimodal.{Codec, Multimodal}
    // 100k REAL 24×20 PNG payloads + a 1-in-50 planted JPEG-re-encode
    // twin: the decode+DCT hash runs once per asset in the scan stage
    // (timed separately via the cached sig materialization), and the
    // banding join input is n·(maxHamming+1) 24-byte rows — the probe
    // checks the join wall tracks that (linear in n), never payload
    // volume
    val n = 100000L
    val synth = udf { (id: Long) => Codec.synthImageBytes(id * 2654435761L, 24, 20) }
    val media = spark.range(n).select(
        col("id").as("media_id"), lit("image").as("kind"),
        synth(col("id")).as("content"))
    val jpegTwin = udf { (c: Array[Byte]) =>
      Codec.decodeImage(c).map(i => Codec.encodeJpeg(i, 0.75f)).getOrElse(c)
    }
    val twins = media.where(pmod(col("media_id"), lit(50)) === 1)
      .select((col("media_id") + lit(10000000L)).as("media_id"),
        col("kind"), jpegTwin(col("content")).as("content"))
    val all = media.unionByName(twins).cache()
    val total = all.count()
    val pairs = time(s"phashPairs n=$total (decode+hash+join)")(
      Multimodal.phashPairs(all, maxHamming = 7).cache())
    val nPairs = pairs.count()
    val planted = total - n
    // every planted twin is within the Hamming budget (JPEG re-encode
    // is pHash's design case); unrelated 64-bit signatures at 100k²
    // pairs contribute ~0 extras
    val hit = time("planted recall")(
      pairs.join(
        twins.select((col("media_id") - lit(10000000L)).as("media_a"),
          col("media_id").as("media_b")),
        Seq("media_a", "media_b"), "left_semi").count())
    println(s"[profile] pairs=$nPairs planted=$planted hit=$hit")
    assert(hit >= (planted * 0.95).toLong, s"recall ${hit.toDouble / planted}")
    pairs.unpersist(); all.unpersist()
  }

  test("scale stress: perceptual novelty at 50k incoming vs 50k history (banding join + candidate-only verify)") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    import graft.multimodal.{Codec, Multimodal}
    // 50k-image history; incoming = 40k fresh + 10k JPEG re-encodes of
    // history assets. The batch novelty form must shed exactly the
    // re-encodes, keep the fresh set, and its wall must be dominated by
    // the 16-byte banding join + per-candidate decode (bounded by the
    // 10k true dups), never an n² compare or an all-pairs decode.
    val n = 50000L
    val synth = udf { (id: Long) => Codec.synthImageBytes(id * 2654435761L, 24, 20) }
    val history = spark.range(n).select(
        col("id").as("media_id"), lit("image").as("kind"),
        synth(col("id")).as("content")).cache()
    val jpegTwin = udf { (c: Array[Byte]) =>
      Codec.decodeImage(c).map(i => Codec.encodeJpeg(i, 0.75f)).getOrElse(c)
    }
    val dups = history.where(pmod(col("media_id"), lit(5)) === 1)
      .select((col("media_id") + lit(10000000L)).as("media_id"),
        col("kind"), jpegTwin(col("content")).as("content"))
    val fresh = spark.range(n, n + 40000L).select(
      col("id").as("media_id"), lit("image").as("kind"),
      synth(col("id")).as("content"))
    val incoming = dups.unionByName(fresh).cache()
    val nIn = incoming.count(); history.count()
    val survivors = time(s"perceptualNoveltyBatch in=$nIn hist=$n")(
      Multimodal.perceptualNoveltyBatch(incoming, history).select("media_id").cache())
    val nSurv = survivors.count()
    val dupsLeaked = survivors.where(col("media_id") >= 10000000L).count()
    val freshKept = survivors.where(col("media_id") >= n &&
      col("media_id") < 10000000L).count()
    println(s"[profile] novelty: survivors=$nSurv dupsLeaked=$dupsLeaked freshKept=$freshKept/40000")
    assert(dupsLeaked <= (10000 * 0.05).toLong, s"re-encodes must be shed: $dupsLeaked leaked")
    // ~1% of "fresh" images legitimately drop at this density: 90k draws
    // from a ~6-parameter sinusoid family saturate the image space, and
    // a drop REQUIRES passing the 8×8 pixel verify (thumb MAE ≤ 6) —
    // those pairs genuinely look alike, which is the filter doing its
    // job, not a collision artifact (measured: 467/40000 at 50k history)
    assert(freshKept >= (40000 * 0.95).toLong, s"fresh must survive: $freshKept kept")
    survivors.unpersist(); incoming.unpersist(); history.unpersist()
  }

  test("scale stress: distributed k-means at 128k vectors (per-iteration scan cost)") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    // 128k synthetic 64-d vectors with 8 planted gaussian-ish modes: the
    // probe checks (a) the per-iteration wall is a flat data scan (no
    // lineage growth across the driver loop), (b) SSE still decreases
    // monotonically at scale, (c) the found centers give a far better
    // SSE than the seed centers (the modes are actually discovered)
    val n = 128000L
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        (pmod(col("id"), lit(8)).cast("double") * lit(3.0)) +
          sin(col("id") * (j + lit(1)).cast("double")) ).as("embedding"))
      .cache()
    vecs.count()
    val t0 = System.nanoTime()
    val m = time(s"kmeans n=$n k=8 iters=10")(
      graft.ml.KMeans.train(vecs, k = 8, iters = 10))
    val perIter = (System.nanoTime() - t0) / 1e9 / 10
    println(f"[profile] per-iter ${perIter}%.2f s; sse head=${m.sse.head}%.3e tail=${m.sse.last}%.3e")
    m.sse.indices.drop(1).foreach(i => assert(m.sse(i) <= m.sse(i - 1) * (1 + 1e-12) + 1e-6))
    assert(m.sse.last < m.sse.head * 0.5,
      s"modes not discovered: ${m.sse.head} -> ${m.sse.last}")
    val init = time("kmeans|| init (11 passes)")(
      graft.ml.KMeans.parallelInit(vecs, k = 8, rounds = 5))
    val mp = time("lloyd from kmeans|| init")(
      graft.ml.KMeans.trainFrom(vecs, init, iters = 10))
    println(f"[profile] sse hash=${m.sse.last}%.3e parallel=${mp.sse.last}%.3e")
    assert(mp.sse.last <= m.sse.last * 1.05,
      s"parallel init must not lose to hash init: ${mp.sse.last} vs ${m.sse.last}")
    vecs.unpersist()
  }

  test("scale stress: quality classifier at 100k docs (epoch = one aggregate scan)") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    // 20x replicated corpus with per-replica suffix tokens: 100k rows.
    // The probe checks the training wall is epoch-bound (one treeAggregate
    // scan per epoch; NOT quadratic in docs) and the fit still moves.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val big = (0 until 20).map(r =>
        docs.select((col("doc_id") + lit(r * 1000000L)).as("doc_id"),
          concat(col("text"), lit(s" replica token r$r")).as("text")))
      .reduce(_ unionByName _).cache()
    val n = big.count()
    val m = time(s"classifier train n=$n epochs=20")(
      graft.text.QualityClassifier.train(big, epochs = 20))
    println(f"[profile] loss ${m.lossHistory.head}%.4f -> ${m.lossHistory.last}%.4f")
    assert(m.lossHistory.last < m.lossHistory.head)
    val scored = time("score 100k")(graft.text.QualityClassifier.score(big, m).count())
    assert(scored == n)
    big.unpersist()
  }

  test("scale stress: layout maintenance at 4x events (400k rows / 30 partitions)") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    val base = s"${sys.props("java.io.tmpdir")}/graft_layout/profile4x"
    val events = (0 until 4).map(r =>
        graft.Tables.events(spark, dir)
          .withColumn("event_id", col("event_id") + lit(r * 10000000L)))
      .reduce(_ unionByName _).cache()
    val n = events.count()
    time(s"write partitioned n=$n")(
      graft.io.Layout.writeDatePartitioned(events, s"$base/events"))
    time("compact 30 dirs")(
      graft.io.Layout.compactDatePartitioned(spark, s"$base/events", s"$base/compact"))
    assert(spark.read.parquet(s"$base/compact").count() == n)
    // scale-safety of the salted compaction: a HOT date must compact
    // across >1 task (each task writes at most one file per partition
    // dir, so >1 file ⇒ >1 writer task) while staying bounded by the
    // default saltBuckets — the single-task-per-day funnel was the r10
    // verdict's named scale hazard
    val compactFiles = graft.io.Layout.partitionFileCounts(spark, s"$base/compact")
    val hottest = compactFiles.values.max
    println(s"[profile] compacted files/dir: min=${compactFiles.values.min} max=$hottest")
    assert(hottest > 1, s"hot date compacted by a single task ($compactFiles)")
    assert(compactFiles.values.forall(_ <= 4), s"files/dir exceeds saltBuckets: $compactFiles")
    time("merge 5-day rollup")(
      graft.io.Layout.mergeDailyAgg(spark, s"$base/events", s"$base/rollup",
        (11 to 15).map(d => f"2024-01-$d%02d")))
    val victims = events.where(col("event_id") % 1000 === 0).select("event_id")
    val nv = victims.count()
    val affected = time(s"targeted delete $nv victims")(
      graft.io.Layout.deleteRows(spark, s"$base/events", victims, "event_id"))
    println(s"[profile] delete touched ${affected.size}/30 partitions")
    assert(spark.read.parquet(s"$base/events").count() == n - nv)
    events.unpersist()
  }

  test("scale stress: AQE splits a skewed join partition at runtime") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    // One hot key owning 70% of a 2M-row fact side — the canonical
    // skew shape (a bot user, a boilerplate dedup hash). The engine's
    // posture is: declare the join, let AQE re-plan the hot partition
    // into advisory-sized splits at runtime — no hand salting needed on
    // the JOIN path (q27 pins the salted-AGGREGATION pattern where
    // pre-aggregation, not splitting, is the fix). Probe pins that the
    // optimization actually fires (skew=true in the final plan) and
    // that row multiplicity is untouched.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      import spark.implicits._
      val fact = spark.range(2000000L)
        .select(when(pmod(col("id"), lit(10)) < 7, 0L)
            .otherwise(pmod(col("id"), lit(1000))).as("k"),
          col("id").as("payload"))
      val dim = spark.range(1000L).select(col("id").as("k"), (col("id") * 2).as("dv"))
      val joined = fact.join(dim, "k")
      // collect() (not count()) so THIS QueryExecution runs and its
      // adaptive plan finalizes — count() would execute a different one
      val n = time("skewed join 2M rows")(joined.collect().length)
      assert(n == 2000000, s"join must preserve multiplicity, got $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew-join did not fire:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("scale stress: minhash-band-store novelty is O(batch), not O(history)") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    // Same discipline as the signature-store probe: one incoming batch
    // against a 20k-doc and a 160k-doc store — probe wall time must grow
    // far sublinearly vs the 8x history (the probe is a band equi-join
    // over band keys + sig verify on candidates; history text is never
    // shingled). Planted batch copies shed at both sizes; synthetic
    // unique docs survive.
    import spark.implicits._
    import graft.ops.MinHashBandStore
    def synthDocs(n: Int, tag: String) = spark.range(n.toLong)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 40).map(i =>
          concat(lit(s"w$tag"), pmod(col("id") * (i * 2 + 7), lit(9973)).cast("string"))): _*)
          .as("text"))
    val batch = synthDocs(2000, "b").cache()
    batch.count()
    val small = "/tmp/graft_profile_mhstore_small"
    val big = "/tmp/graft_profile_mhstore_big"
    // history = its own synthetic population + a copy of HALF the batch
    val planted = batch.where(col("doc_id") < 1000)
      .select((col("doc_id") + 500000L).as("doc_id"), col("text"))
    MinHashBandStore.build(synthDocs(20000, "h").unionByName(planted), small)
    MinHashBandStore.build(
      synthDocs(160000, "h").unionByName(planted), big)
    def probe(dir: String, label: String): (Double, Set[Long]) = {
      val t0 = System.nanoTime()
      val kept = MinHashBandStore.noveltyAgainstStore(batch, dir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] mh-store novelty $label%-8s $dt%8.2f s, kept ${kept.size}")
      (dt, kept)
    }
    probe(small, "warmup")
    val (tSmall, keptSmall) = probe(small, "20k")
    val (tBig, keptBig) = probe(big, "160k")
    assert(keptSmall == (1000L until 2000L).toSet,
      "planted batch copies must shed; unique docs must survive")
    assert(keptBig == keptSmall, "8x history changed the decision set")
    assert(tBig <= math.max(tSmall, 0.5) * 4,
      f"8x history cost ${tBig / tSmall}%.1fx — probe is not O(batch): $tSmall%.2f -> $tBig%.2f s")
    batch.unpersist()
  }

  test("scale stress: hammingPairs under planted adversarial skew (star + bounded postings)") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    // The population the r14 bounded rewrite exists for: 100k IDENTICAL
    // signatures (one exact-dup class — solid-black thumbnails) plus
    // 100k DISTINCT near-constant signatures (sensor-noise variants
    // differing only in their low 17 bits — every high band bucket goes
    // over cap). The pre-r14 bucket self-join enumerates ~C(100k,2) ≈
    // 5e9 rows inside ONE bucket on this input (infeasible); the
    // bounded form must finish with linear output: the identical class
    // stars on its representative, the distinct mass pairs only
    // through its under-cap low chunks.
    import spark.implicits._
    val base = 0x0123456789abcdefL
    val identical = spark.range(100000L)
      .select(col("id"), lit(base).as("sim"))
    val nearConstant = spark.range(100000L) // input id+1 < 131072: bits 0..16
      .select((col("id") + 200000L).as("id"), // vary; +1 keeps base itself out
        lit(base).bitwiseXOR(col("id") + 1L).as("sim"))
    val skewed = identical.unionByName(nearConstant).cache()
    skewed.count()
    val t0 = System.nanoTime()
    val pairs = ops.Dedup.hammingPairs(skewed, maxHamming = 7, bits = 64).cache()
    val nPairs = pairs.count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[profile] skewed hammingPairs       $dt%8.2f s, pairs=$nPairs")
    // identical class: star on rep = 99 999 pairs, every one at the rep
    val star = pairs.where(col("hamming") === 0 && col("id_a") === 0L).count()
    assert(star == 99999L, s"identical-class star expected 99999, got $star")
    // the near-constant mass: each sim pairs only via its two under-cap
    // low chunks (≤ 2·maxBucket candidates per sim) — output stays
    // linear-ish in the mass, nowhere near the ~5e9 of the raw join
    assert(nPairs < 60000000L, s"pair mass must stay bounded, got $nPairs")
    // hamming-0 pairs are exactly the class star: its component must
    // still canonicalize every identical id to the representative
    val canon = ops.Dedup.canonicalize(pairs.where(col("hamming") === 0))
    assert(canon.where(col("canonical_id") === 0L).count() == 100000L,
      "the identical class must still canonicalize to its representative")
    pairs.unpersist(); skewed.unpersist()
  }

  test("scale stress: store-novelty candidacy under a planted hot history bucket") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    // History accumulates 100k DISTINCT near-constant signatures (the
    // crawl-scale hot-bucket population: every band bucket of the high
    // chunks holds the whole mass, far over `maxBucket`). The pre-r15
    // matchedIds banding join enumerated |bucket| candidates per
    // incoming chunk row (~600k per incoming signature here); the
    // nearSimPairsCross form must keep candidacy ≤ (maxHamming+1)·
    // maxBucket+1 per incoming row, shed exact twins through the
    // latch-free sentinel, and keep fresh signatures.
    import spark.implicits._
    import graft.multimodal.SignatureStore
    val base = 0x0123456789abcdefL
    val histSigs = spark.range(100000L) // input id < 131072: bits 0..16 vary
      .select((col("id") + 100000000L).as("media_id"),
        lit(base).bitwiseXOR(col("id")).as("sig")).cache()
    histSigs.count()
    val uniformSigs = spark.range(100000L)
      .select((col("id") + 100000000L).as("media_id"),
        xxhash64(col("id"), lit("uniform")).as("sig")).cache()
    uniformSigs.count()
    // incoming: 2k exact twins of mass members + 2k fresh uniform sigs
    val twins = spark.range(2000L)
      .select(col("id").as("media_id"),
        lit(base).bitwiseXOR(pmod(col("id") * 49999L, lit(100000L))).as("sig"))
    val fresh = spark.range(2000L)
      .select((col("id") + 50000L).as("media_id"),
        xxhash64(col("id"), lit("fresh")).as("sig"))
    val incoming = twins.unionByName(fresh).cache()
    incoming.count()
    // direct candidacy bound (the regression pin: a revert to the raw
    // banding join blows this count up by ~3 orders of magnitude)
    val cands = ops.Dedup.nearSimPairsCross(
      incoming.select(col("media_id").as("in_id"), col("sig").as("sim")),
      histSigs.select(col("sig").as("sim")).distinct(),
      maxHamming = 7, bits = 64, maxBucket = 4096).count()
    assert(cands <= 4000L * (8L * 4096 + 1),
      s"per-row candidate bound violated: $cands")
    def probe(hist: org.apache.spark.sql.DataFrame, label: String): Set[Long] = {
      val t0 = System.nanoTime()
      val matched = SignatureStore.matchedIds(incoming, hist,
          maxHamming = 7, bits = 64, minMatchFrac = 1.0, maxThumbMae = None)
        .collect().map(_.getLong(0)).toSet
      println(f"[profile] hot-history matchedIds $label%-8s ${(System.nanoTime() - t0) / 1e9}%8.2f s, matched=${matched.size}")
      matched
    }
    val hotMatched = probe(histSigs, "hot")
    probe(uniformSigs, "uniform")
    assert((0L until 2000L).forall(hotMatched.contains),
      "every exact twin must shed through the latch-free sentinel path")
    assert(hotMatched.forall(_ < 2100L),
      "fresh incoming signatures must survive the hot mass")
    histSigs.unpersist(); uniformSigs.unpersist(); incoming.unpersist()
  }

  test("scale stress: signature-store novelty is O(batch), not O(history)") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    // The store exists so history cost is a SIGNATURE-ROW scan, never a
    // payload decode. Probe: the same incoming batch against a 64k-row
    // and a 512k-row synthetic image-signature store — probe wall time
    // may grow with the scan, but far sublinearly vs the 8x history
    // (the banding join's work is candidates, and with uniform random
    // history signatures the collision floor is tiny). Planted rows
    // (the incoming batch's own signatures copied into history) must
    // all shed; nothing else may.
    import spark.implicits._
    import graft.multimodal.{Multimodal, SignatureStore}
    val incoming = Multimodal.syntheticMedia(spark, "/root/testdata/sf0.01")
      .where(col("kind") === "image").cache()
    val inSigs = SignatureStore.imageSigRows(incoming)
      .select("media_id", "kind", "sig", "thumb").cache()
    // image media_ids are all ≡0 mod 3 (the fixture's kind rule) — plant
    // every 7th image, leaving the rest as must-survive probes
    val planted = inSigs.where(pmod(col("media_id"), lit(21)) === 0)
      .withColumn("media_id", col("media_id") + 900000000L)
      .withColumn("n_sigs", lit(1)) // one pHash per image
    val plantedIds = planted.select((col("media_id") - 900000000L).as("id"))
      .collect().map(_.getLong(0)).toSet
    def synthStore(n: Int, dir: String): Unit = {
      // uniform 64-bit sigs via splitmix-style mixing; 64-byte thumbs
      val mkThumb = udf { (seed: Long) =>
        Array.tabulate[Byte](64)(i => ((seed >> (i % 8 * 8)) & 0xff).toByte)
      }
      spark.range(n.toLong)
        .select((col("id") + 100000000L).as("media_id"), lit("image").as("kind"),
          xxhash64(col("id"), lit(dir)).as("sig"))
        .withColumn("thumb", mkThumb(col("sig")))
        .withColumn("n_sigs", lit(1))
        .unionByName(planted)
        .write.mode("overwrite").partitionBy("kind").parquet(dir)
    }
    val small = "/tmp/graft_profile_store_small"
    val big = "/tmp/graft_profile_store_big"
    synthStore(64 * 1024, small)
    synthStore(512 * 1024, big)
    def probe(dir: String, label: String): (Double, Set[Long]) = {
      val t0 = System.nanoTime()
      val kept = SignatureStore.noveltyAgainstStore(
          incoming, SignatureStore.load(spark, dir))
        .select("media_id").collect().map(_.getLong(0)).toSet
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] store-novelty $label%-10s ${dt}%8.2f s, kept ${kept.size}")
      (dt, kept)
    }
    probe(small, "warmup")
    val (tSmall, keptSmall) = probe(small, "64k")
    val (tBig, keptBig) = probe(big, "512k")
    val all = incoming.select("media_id").collect().map(_.getLong(0)).toSet
    assert(keptSmall == all -- plantedIds,
      "planted history rows must shed; random history must collide with nothing")
    assert(keptBig == keptSmall, "8x history changed the decision set")
    assert(tBig <= math.max(tSmall, 0.5) * 4,
      f"8x history cost ${tBig / tSmall}%.1fx — probe is not O(batch): $tSmall%.2f -> $tBig%.2f s")
    inSigs.unpersist(); incoming.unpersist()
  }

  test("scale stress: daily-ingest probe day is O(day), not O(history)") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    // The composed keystone: ingest 2 days vs 8 days of synthetic crawl
    // into two separate roots (all four stores appended per day), then
    // probe the SAME "today" against each. The probe day touches every
    // stage — URL bloom, content bloom, hygiene/decontam, MinHash band
    // store, quality filters, signature store — and must cost O(day):
    // 4x more ingested history may not change today\'s decisions or
    // blow up today\'s wall time.
    import spark.implicits._
    import graft.examples.DailyIngest
    import graft.multimodal.Codec
    def docsFor(n: Int, idBase: Long, day: Int, tag: String) = spark.range(n.toLong)
      .select((col("id") + idBase).as("doc_id"),
        concat(lit("https://p.ex/"), (col("id") + idBase).cast("string")).as("url"),
        // (id+1): at id 0 every product is 0 mod 9973 and the doc
        // degenerates to one repeated token, which Gopher rightly drops
        concat_ws(" ", (0 until 40).map(i =>
          concat(lit(s"the w$tag"), pmod((col("id") + 1) * (2 * i + 7), lit(9973)).cast("string"))): _*)
          .as("text"),
        lit("en").as("lang"), lit(tag).as("source"), lit(day).as("day"))
    val png = udf { (seed: Long) => Codec.synthImageBytes(seed, 24, 24) }
    def mediaFor(n: Int, idBase: Long, day: Int, seedSalt: Long) = spark.range(n.toLong)
      .select((col("id") + idBase).as("media_id"), lit("image").as("kind"),
        lit("image/png").as("mime"), lit(24).as("width"), lit(24).as("height"),
        lit(1).as("n_frames"), lit(0).as("sample_rate"),
        png((col("id") + idBase) * 7919L + seedSalt).as("content"),
        lit(day).as("day"))
    val bench = docsFor(100, 800000L, 0, "bench").drop("day")
    def mkRoot(days: Int, leaf: String): String = {
      val root = s"/tmp/graft_profile_daily_$leaf"
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      val docs = (0 until days).map(i => docsFor(2000, i * 10000L, i, s"h$i"))
        .reduce(_ unionByName _)
      val media = (0 until days).map(i => mediaFor(400, i * 10000L, i, 0L))
        .reduce(_ unionByName _)
      DailyIngest.run(spark, docs, media, bench, root, days)
      root
    }
    val root2 = mkRoot(2, "small")
    val root8 = mkRoot(8, "big")
    // today: fresh docs/assets + exact re-crawls of day 0 (shed by the
    // content bloom / signature store) + edited day-0 twins (shed by
    // the MinHash band store). Day 0 is IDENTICAL in both histories, so
    // the decision sets must match exactly.
    val fresh = docsFor(1000, 900000L, 99, "f")
    val exactCopies = docsFor(500, 910000L, 99, "h0")
      .withColumn("url", concat(lit("https://p.ex/re/"), col("doc_id").cast("string")))
    val edited = docsFor(500, 920000L, 99, "h0")
      .withColumn("url", concat(lit("https://p.ex/ed/"), col("doc_id").cast("string")))
      .withColumn("text", concat(col("text"), lit(" zedit zedit2 zedit3")))
    val todayDocs = fresh.unionByName(exactCopies).unionByName(edited).cache()
    todayDocs.count()
    val todayMedia = mediaFor(500, 900000L, 99, 31L)
      .unionByName(mediaFor(300, 910000L - 910000L, 99, 0L)
        .withColumn("media_id", col("media_id") + 910000L))
      .cache()
    todayMedia.count()
    def probe(root: String, label: String): (Double, Set[Long], Set[Long]) = {
      val t0 = System.nanoTime()
      val (txt, med) = DailyIngest.probeDay(spark, todayDocs, todayMedia, bench, root)
      val keptT = txt.select("doc_id").collect().map(_.getLong(0)).toSet
      val keptM = med.select("media_id").collect().map(_.getLong(0)).toSet
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] daily probe $label%-8s $dt%8.2f s, text ${keptT.size}, media ${keptM.size}")
      (dt, keptT, keptM)
    }
    probe(root2, "warmup")
    val (tSmall, keptT2, keptM2) = probe(root2, "2-day")
    val (tBig, keptT8, keptM8) = probe(root8, "8-day")
    // exact re-crawls shed; edited twins shed; fresh survive
    assert(!keptT2.exists(id => id >= 910000L && id < 930000L),
      "a re-crawl (exact or edited) of day-0 content survived")
    assert(keptT2.count(id => id >= 900000L && id < 910000L) == 1000,
      "synthetic fresh docs must survive")
    // the media copies re-use day-0 seeds byte-for-byte -> store match
    assert(!keptM2.exists(id => id >= 910000L),
      "a byte-identical re-encounter of a day-0 asset survived")
    assert(keptM2.count(_ < 910000L) == 500, "fresh assets must survive")
    assert(keptT8 == keptT2 && keptM8 == keptM2,
      "4x history changed today\'s decision sets")
    assert(tBig <= math.max(tSmall, 1.0) * 4,
      f"4x history cost ${tBig / tSmall}%.1fx — probe day is not O(day): $tSmall%.2f -> $tBig%.2f s")
    todayDocs.unpersist(); todayMedia.unpersist()
  }
}
