package graft.ops

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (ARRAY<FLOAT/DOUBLE>).
  *
  * Exact brute-force cosine top-k is the baseline and oracle; the scale
  * path is random-hyperplane LSH: L hash tables × b sign-bits, candidates
  * from bucket equi-joins only, exact re-scoring on candidates. Recall is
  * tested against brute force (SimilaritySpec) rather than assumed.
  */
object SimilaritySearch {

  /** (id, v ARRAY<DOUBLE>, nrm) — norms precomputed once per point so the
    * pair loops do a single array traversal (dot) per pair. */
  private def normalizedPoints(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).cast("long").as("id"), asDoubleArray(col(vecCol)).as("v"))
      .withColumn("nrm", sqrt(arraySqNorm(col("v"))))

  /** (i, j, dist2=1−cos) pairs → (i, j, cosine, rank) top-k tail. */
  private def topKTail(pairs: DataFrame, k: Int): DataFrame =
    pairs
      .groupBy(col("i"))
      .agg(org.apache.spark.sql.graft.TopKNeighbors
        .topk(k, col("j"), col("dist2")).as("nbrs"))
      .select(col("i"), posexplode(col("nbrs")).as(Seq("pos", "nbr")))
      .select(col("i"), col("nbr.j").as("j"),
        (lit(1.0) - col("nbr.dist2")).as("cosine"),
        (col("pos") + 1).cast("int").as("rank"))

  /** Exact cosine top-k per vector. Same bounded-heap partial-aggregation
    * shape as t-SNE's kNN: the shuffle after the cross product carries at
    * most k rows per (map task × key), not n². `dist2` in the aggregator
    * is 1 − cosine (monotone in angle), tie-break on j. */
  def bruteTopK(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", k: Int = 5): DataFrame = {
    val pts = normalizedPoints(emb, idCol, vecCol)
    val a = graft.Partitioning.spread(
      pts.select(col("id").as("i"), col("v").as("va"), col("nrm").as("na")))
    val b = pts.select(col("id").as("j"), col("v").as("vb"), col("nrm").as("nb"))
    topKTail(
      a.crossJoin(b)
        .where(col("i") =!= col("j"))
        .select(col("i"), col("j"),
          (lit(1.0) - arrayDot(col("va"), col("vb")) / (col("na") * col("nb"))).as("dist2")),
      k)
  }

  /** Hard-negative mining for contrastive/metric training: per anchor,
    * the k most-similar vectors carrying a DIFFERENT label — the
    * negatives near the decision boundary that actually move a
    * contrastive loss (uniform-random negatives are mostly trivial at
    * scale). Same bounded-heap top-k shape as [[bruteTopK]] with the
    * label-mismatch predicate applied BEFORE the heap, so same-label
    * pairs never occupy candidate slots. Rows with a NULL label produce
    * no pairs on either side (SQL null comparison semantics — an
    * unlabeled vector can be neither anchor nor negative).
    *
    * This exact all-pairs form is the oracle anchor; at corpus scale
    * feed [[ivfTopK]]/[[lshTopK]] candidate pairs through the same
    * label filter + heap instead (the ANN family's standard swap). */
  def hardNegatives(emb: DataFrame, k: Int = 5, idCol: String = "vec_id",
      vecCol: String = "embedding", labelCol: String = "label"): DataFrame = {
    val pts = emb.select(col(idCol).cast("long").as("id"),
        asDoubleArray(col(vecCol)).as("v"), col(labelCol).as("lbl"))
      .withColumn("nrm", sqrt(arraySqNorm(col("v"))))
    val a = graft.Partitioning.spread(
      pts.select(col("id").as("i"), col("v").as("va"), col("nrm").as("na"),
        col("lbl").as("la")))
    val b = pts.select(col("id").as("j"), col("v").as("vb"), col("nrm").as("nb"),
      col("lbl").as("lb"))
    topKTail(
      a.crossJoin(b)
        .where(col("la") =!= col("lb"))
        .select(col("i"), col("j"),
          (lit(1.0) - arrayDot(col("va"), col("vb")) / (col("na") * col("nb"))).as("dist2")),
      k)
  }

  /** Two-stage retrieval with a DIMENSION-REDUCED candidate stage: PCA
    * projects the corpus to `pcaDims` (one treeAggregate fit, pure
    * projection apply — [[graft.ml.Preprocess.pca]]), a coarse top-
    * `candidates` search runs in the cheap low-dim space, and only those
    * candidate pairs are re-scored with exact full-dimension cosine —
    * the rerank reads n·candidates pairs, never n². This is the
    * dimension-reduction member of the candidate-generation family
    * (IVF partitions space, LSH hashes it, PQ compresses it, PCA
    * shrinks it); at corpus scale compose them — run the coarse stage
    * itself as IVF over the projected vectors. Gated on recall@k vs
    * the exact twin. */
  def pcaTopK(emb: DataFrame, k: Int = 5, pcaDims: Int = 8,
      candidates: Int = 30, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val proj = graft.ml.Preprocess.pca(emb, idCol, vecCol, pcaDims)
    val coarse = bruteTopK(proj, idCol, vecCol, candidates).select(col("i"), col("j"))
    val pts = normalizedPoints(emb, idCol, vecCol)
    val a = pts.select(col("id").as("i"), col("v").as("va"), col("nrm").as("na"))
    val b = pts.select(col("id").as("j"), col("v").as("vb"), col("nrm").as("nb"))
    topKTail(
      coarse.join(a, "i").join(b, "j")
        .select(col("i"), col("j"),
          (lit(1.0) - arrayDot(col("va"), col("vb")) / (col("na") * col("nb"))).as("dist2")),
      k)
  }

  /** Window form of the same result (declarative/oracle shape). */
  def bruteTopKWindow(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", k: Int = 5): DataFrame = {
    val pts = emb.select(col(idCol).cast("long").as("id"),
      asDoubleArray(col(vecCol)).as("v"))
    val a = graft.Partitioning.spread(
      pts.select(col("id").as("i"), col("v").as("va")))
    val b = pts.select(col("id").as("j"), col("v").as("vb"))
    val w = Window.partitionBy(col("i")).orderBy(col("cosine").desc, col("j").asc)
    a.crossJoin(b)
      .where(col("i") =!= col("j"))
      .select(col("i"), col("j"), arrayCosine(col("va"), col("vb")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup detection).
    * All-pairs form — the oracle/fixture-scale variant; at corpus scale
    * run [[lshTopK]] and filter, or pre-bucket with the same hyperplanes. */
  def cosineDupPairs(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", threshold: Double = 0.4): DataFrame = {
    val pts = normalizedPoints(emb, idCol, vecCol)
    val a = graft.Partitioning.spread(
      pts.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")))
    val b = pts.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.crossJoin(b)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (arrayDot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** LAION-style cross-modal alignment filter: rows pairing an image
    * embedding with its caption/text embedding keep only pairs whose
    * cosine reaches `minCosine` — the standard keep-if-aligned gate a
    * web-scale image–text corpus runs before training. Shuffle-FREE: a
    * codegen'd projection ([[graft.functions.VectorFunctions
    * .arrayCosine]]) plus a filter, so it streams through whatever
    * partitioning the pair source already has — the 100 TB shape is
    * "read shard, project, filter, write shard" with zero exchanges.
    * Output: the input columns plus `cosine`. */
  /** Degenerate-safe cosine for the alignment family: a zero embedding
    * (a failed encoder — common in a real crawl) makes the raw cosine
    * divide by zero — under ANSI mode (Spark 4 default) that THROWS
    * and kills the whole batch; non-ANSI yields NaN, which Spark
    * comparisons treat as false but DuckDB orders ABOVE everything,
    * and which poisons any avg. Guarding the norms yields NULL: both
    * engines drop it from filters and skip it in aggregates
    * identically, and the job survives. */
  private def alignCosine(imgCol: String, txtCol: String) = {
    val na = arrayNorm(col(imgCol))
    val nb = arrayNorm(col(txtCol))
    when(na > 0 && nb > 0, arrayDot(col(imgCol), col(txtCol)) / (na * nb))
  }

  def crossModalAlignment(pairs: DataFrame, imgCol: String = "img_embedding",
      txtCol: String = "txt_embedding", minCosine: Double = 0.1): DataFrame =
    pairs
      .withColumn("cosine", alignCosine(imgCol, txtCol))
      .where(col("cosine") >= minCosine)

  /** Per-source alignment quality census over the SAME pairing — the
    * monitoring twin of [[crossModalAlignment]] (which crawl sources
    * produce misaligned captions): one map-side-combined groupBy. */
  def crossModalAlignmentStats(pairs: DataFrame, srcCol: String = "source",
      imgCol: String = "img_embedding", txtCol: String = "txt_embedding",
      minCosine: Double = 0.1): DataFrame =
    pairs
      .withColumn("cosine", alignCosine(imgCol, txtCol))
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("cosine") >= minCosine, 1L).otherwise(0L)).as("n_kept"),
        avg(col("cosine")).as("avg_cosine"),
        min(col("cosine")).as("min_cosine"),
        max(col("cosine")).as("max_cosine"))

  /** Random-hyperplane LSH ANN with multi-probe queries: per table t,
    * bucket(v) = sign-bit string of ⟨v, h_t,1..b⟩; the INDEX stores each
    * vector in its home bucket only, while each QUERY probes its home
    * bucket plus the `probes−1` single-bit flips with the smallest
    * |margin| (Lv et al. 2007 "Multi-Probe LSH") — a near neighbor that
    * lands one sign-flip away sits in exactly those low-margin buckets,
    * so extra probes substitute for extra tables without paying their
    * index build/storage/shuffle. Candidates = (table, bucket) equi-join
    * matches; exact cosine on candidates; bounded-heap top-k with
    * in-heap dedup. Hyperplanes are seeded driver-side and ship in the
    * task closure (L·b·dim doubles — a few KB).
    *
    * Defaults swept on the fixture's near-uniform unit vectors (the LSH
    * worst case — recall@5 vs the exact twin, SCALING.md): the r6
    * single-probe ladder read 12 tables→0.626, 14→0.681; multi-probe at
    * 8 tables reads probes 1→0.487, 2→0.726, 3→0.847, 4→0.903 — so the
    * adopted 8×3 default beats 14×1 by 0.17 recall at 43% fewer index
    * entries and comparable wall. Raise `bits` for tighter buckets on
    * clustered corpora; recall is measured in SimilaritySpec and the
    * per-round gate, never assumed. */
  def lshTopK(emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      k: Int = 5, tables: Int = 8, bits: Int = 5, dim: Int = 64,
      seed: Long = 42, probes: Int = 3): DataFrame = {
    require(probes >= 1 && probes <= bits + 1,
      s"probes must be in [1, bits+1]: the probe sequence is the home bucket " +
        s"plus up to $bits single-bit flips, got $probes")
    val rng = new java.util.Random(seed)
    val planes = Array.fill(tables, bits, dim)(rng.nextGaussian())

    // (t, home bucket, per-bit dots) in one pass over the planes
    def tableDots(v: Seq[Double]): IndexedSeq[(Int, Long, Array[Double])] = {
      require(v.length == dim,
        s"lshTopK: hyperplanes were generated for dim=$dim but a vector has " +
          s"${v.length} components — pass the actual embedding dimension")
      val d = dim
      (0 until tables).map { t =>
        val dots = new Array[Double](bits)
        var bucket = 0L
        var b = 0
        while (b < bits) {
          var dot = 0.0
          var i = 0
          val plane = planes(t)(b)
          while (i < d) { dot += plane(i) * v(i); i += 1 }
          dots(b) = dot
          if (dot > 0) bucket |= (1L << b)
          b += 1
        }
        (t, bucket, dots)
      }
    }
    // index side: one home bucket per table
    val bucketUdf = udf { (v: Seq[Double]) =>
      tableDots(v).map { case (t, bucket, _) => (t, bucket) }
    }
    // query side (multi-probe, Lv et al. 2007 "Multi-Probe LSH"): the
    // home bucket plus the (probes−1) single-bit flips with the smallest
    // |margin| — a neighbor that lands one sign-flip away sits in exactly
    // one of those low-margin buckets with high probability, so extra
    // probes substitute for extra tables (whose index they don't pay for)
    val probeUdf = udf { (v: Seq[Double]) =>
      tableDots(v).flatMap { case (t, bucket, dots) =>
        val flips = dots.indices.sortBy(b => math.abs(dots(b))).take(probes - 1)
        (bucket +: flips.map(b => bucket ^ (1L << b))).map(bk => (t, bk))
      }
    }

    val pts = normalizedPoints(emb, idCol, vecCol)
    def explodeBuckets(u: org.apache.spark.sql.expressions.UserDefinedFunction) = pts
      .select(col("id"), col("v"), col("nrm"), explode(u(col("v"))).as("tb"))
      .select(col("id"), col("v"), col("nrm"), col("tb._1").as("t"), col("tb._2").as("bucket"))
    val idxBuckets = explodeBuckets(bucketUdf)
    val qryBuckets = if (probes == 1) idxBuckets else explodeBuckets(probeUdf)

    // same (i,j) surfacing from several tables/probes is deduped INSIDE
    // the bounded-heap aggregator — no distinct shuffle carrying the wide
    // vector columns (at fixture scale that shuffle alone cost ~10s)
    val pairs = qryBuckets.as("a")
      .join(idxBuckets.as("b"), Seq("t", "bucket"))
      .where(col("a.id") =!= col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        (lit(1.0) - arrayDot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("dist2"))
    topKTail(pairs, k)
  }

  /** Driver-local Lloyd k-means over a bounded sample — how IVF
    * quantizers are trained at corpus scale (FAISS-style): the quantizer
    * only needs the coarse shape of the distribution, so training on
    * min(sample, n) rows collected to the driver replaces a distributed
    * fit whose per-iteration job overhead dominates at any n. Seeded
    * distinct init + empty-cluster reseeding keeps it deterministic. */
  private[ops] def localKMeans(
      xs: Array[Array[Double]], k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    val rng = new java.util.Random(seed)
    val n = xs.length
    val d = xs(0).length
    // seeded k-means++ init: each next center drawn ∝ squared distance
    // to the nearest chosen one (recovers the spread quality of MLlib's
    // k-means|| at sample scale: recall 0.62 → 0.70 on the fixture)
    val centers = new Array[Array[Double]](k)
    centers(0) = xs(rng.nextInt(n)).clone()
    val nearest = Array.fill(n)(Double.MaxValue)
    var picked = 1
    while (picked < k) {
      val last = centers(picked - 1)
      var i = 0
      var total = 0.0
      while (i < n) {
        var s = 0.0
        var j = 0
        val x = xs(i)
        while (j < d) { val df = x(j) - last(j); s += df * df; j += 1 }
        if (s < nearest(i)) nearest(i) = s
        total += nearest(i)
        i += 1
      }
      var r = rng.nextDouble() * total
      var pick = 0
      i = 0
      var acc = 0.0
      while (i < n && acc + nearest(i) < r) { acc += nearest(i); pick = i + 1; i += 1 }
      centers(picked) = xs(math.min(pick, n - 1)).clone()
      picked += 1
    }
    val counts = new Array[Int](k)
    val sums = Array.fill(k)(new Array[Double](d))
    var it = 0
    while (it < iters) {
      java.util.Arrays.fill(counts, 0)
      sums.foreach(java.util.Arrays.fill(_, 0.0))
      var i = 0
      while (i < n) {
        val x = xs(i)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var s = 0.0
          var j = 0
          val ctr = centers(c)
          while (j < d) { val df = x(j) - ctr(j); s += df * df; j += 1 }
          if (s < bestD) { bestD = s; best = c }
          c += 1
        }
        counts(best) += 1
        var j = 0
        while (j < d) { sums(best)(j) += x(j); j += 1 }
        i += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var j = 0
          while (j < d) { centers(c)(j) = sums(c)(j) / counts(c); j += 1 }
        } else {
          centers(c) = xs(rng.nextInt(n)).clone() // reseed empty cluster
        }
        c += 1
      }
      it += 1
    }
    centers
  }

  /** Best-of-3 seeded Lloyd restarts by within-cluster SSE (k-means
    * layout quality is init-luck on near-uniform data; restarts are
    * driver-cheap). */
  private def bestOf3(sample: Array[Array[Double]], k: Int,
      seed: Long): Array[Array[Double]] = {
    def sse(cs: Array[Array[Double]]): Double = {
      var total = 0.0
      var i = 0
      while (i < sample.length) {
        val x = sample(i)
        var best = Double.MaxValue
        var c = 0
        while (c < cs.length) {
          var s = 0.0
          var j = 0
          while (j < x.length) { val df = x(j) - cs(c)(j); s += df * df; j += 1 }
          if (s < best) best = s
          c += 1
        }
        total += best
        i += 1
      }
      total
    }
    (0 until 3).map(r => localKMeans(sample, k, iters = 20, seed + r)).minBy(sse)
  }

  /** Deterministic bounded driver sample of the point column `colName`
    * (TakeOrdered — no full sort). */
  private def sampleVectors(pts: DataFrame, colName: String,
      trainSample: Int): Array[Array[Double]] =
    pts.orderBy(col("id")).limit(trainSample)
      .select(col(colName)).collect().map(_.getSeq[Double](0).toArray)

  /** Train the coarse quantizer on a deterministic bounded driver sample.
    * None on empty input. */
  private def trainQuantizer(pts: DataFrame, nlist: Int, seed: Long,
      trainSample: Int): Option[Array[Array[Double]]] = {
    val sample = sampleVectors(pts, "v", trainSample)
    if (sample.isEmpty) None else Some(bestOf3(sample, nlist, seed))
  }

  /** Nearest `m` quantizer cells by euclidean distance, deterministic
    * tie-break on cell index. */
  private def nearestCells(centers: Array[Array[Double]])(
      v: Seq[Double], m: Int): Seq[Int] = {
    val d2 = centers.map { c =>
      var s = 0.0
      var i = 0
      while (i < c.length) { val df = v(i) - c(i); s += df * df; i += 1 }
      s
    }
    d2.zipWithIndex.sortBy { case (dist, idx) => (dist, idx) }.take(m).map(_._2).toSeq
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
    * index into `nlist` cells; each query probes its `nprobe` nearest
    * cells and exact cosine re-scores the candidates, bounded-heap top-k.
    *
    * 100 TB shape: the quantizer trains on a bounded driver sample
    * ([[localKMeans]], best-of-3 seeded restarts) and the centroid table
    * (nlist×dim doubles) ships in the closure like the LSH hyperplanes;
    * candidates come from an equi-join on cell id (shuffle-on-key, never
    * all-pairs); every vector indexes into exactly ONE cell, so a
    * candidate pair surfaces at most once (no in-heap dedup needed,
    * unlike multi-table LSH). recall ≈ probed-mass; raise `nprobe` (or
    * `nlist` resolution) to trade compute for recall — measured in
    * SimilaritySpec/the ann_ivf_topk gate vs the exact twin.
    *
    * Default nprobe swept on the fixtures (r8, recall@5 vs exact on the
    * near-uniform worst case; sf0.1 walls): nlist=16 at nprobe
    * 5→0.661/1.6s, 6→0.720, 8→0.822/1.9s, 10→0.900/2.2s, 12→0.951/2.8s;
    * finer quantizers LOSE on this distribution (nlist=32 nprobe=10 →
    * 0.711, nlist=64 → 0.585: boundary mass grows faster than cell
    * resolution when vectors are near-uniform). Adopted nprobe=10 — the
    * 0.9-recall knee at 1.4× the nprobe=5 wall. At corpus scale nlist
    * grows with n (cells stay executor-sized) and real clustered
    * embeddings concentrate neighbor mass in fewer cells, so the
    * fixture's probed-mass fraction (10/16) is the worst case, not the
    * scale expectation. */
  def ivfTopK(emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      k: Int = 5, nlist: Int = 16, nprobe: Int = 10, seed: Long = 42,
      trainSample: Int = 16384): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, "need 1 <= nprobe <= nlist")
    require(trainSample >= 1,
      s"trainSample must be >= 1, got $trainSample (an empty quantizer " +
        "sample would silently return an empty result for non-empty input)")

    val pts = normalizedPoints(emb, idCol, vecCol)
    val centersOpt = trainQuantizer(pts, nlist, seed, trainSample)
    if (centersOpt.isEmpty) {
      // empty input → empty result with the output schema (matches
      // bruteTopK's behavior instead of an opaque kmeans crash)
      return pts.limit(0).select(col("id").as("i"), col("id").as("j"),
        lit(0.0).as("cosine"), lit(0).cast("int").as("rank"))
    }
    ivfSearch(pts, centersOpt.get, k, nprobe)
  }

  /** The IVF candidate join against a FIXED center table: index side in
    * its home cell, query side exploded over its `nprobe` nearest cells,
    * candidates from the cell equi-join, exact cosine re-score,
    * bounded-heap top-k. */
  private def ivfSearch(pts: DataFrame, centers: Array[Array[Double]],
      k: Int, nprobe: Int): DataFrame = {
    val withVec = pts.select(col("id"), col("v"), col("nrm"))
    val cellUdf = udf { (v: Seq[Double]) => nearestCells(centers)(v, 1).head }
    val probeUdf = udf { (v: Seq[Double]) => nearestCells(centers)(v, nprobe) }

    val indexSide = withVec.select(col("id"), col("v"), col("nrm"),
      cellUdf(col("v")).as("cell"))
    val querySide = withVec.select(col("id"), col("v"), col("nrm"),
      explode(probeUdf(col("v"))).as("cell"))
    val pairs = querySide.as("a")
      .join(indexSide.as("b"), Seq("cell"))
      .where(col("a.id") =!= col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        (lit(1.0) - arrayDot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("dist2"))
    topKTail(pairs, k)
  }

  /** IVF search against an EXTERNALLY trained coarse quantizer — the
    * composition point for [[graft.ml.KMeans]]: when the corpus outgrows
    * what a bounded driver sample can represent (the documented scale
    * caveat of [[ivfTopK]]'s `trainSample` quantizer), train the centers
    * on the FULL distributed table with `KMeans.train(emb, k = nlist)`
    * and search with them here. Same cell equi-join shape; `centers`
    * ships in the closure exactly like the sample-trained table. */
  def ivfTopKWithCenters(emb: DataFrame, centers: Array[Array[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding",
      k: Int = 5, nprobe: Int = 10): DataFrame = {
    require(centers.nonEmpty, "ivfTopKWithCenters: empty center table")
    require(nprobe >= 1 && nprobe <= centers.length, "need 1 <= nprobe <= nlist")
    ivfSearch(normalizedPoints(emb, idCol, vecCol), centers, k, nprobe)
  }

  /** Squared distance of `x` to its nearest center's index; ties go to
    * the smaller index (same rule as [[nearestCells]]'s (dist, idx) sort,
    * kept consistent so the UDF and local paths route identically). */
  private def nearestCellArr(centers: Array[Array[Double]], x: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      var s = 0.0
      var i = 0
      val ctr = centers(c)
      while (i < ctr.length) { val df = x(i) - ctr(i); s += df * df; i += 1 }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  /** IVF-PQ ANN (full FAISS IVFADC shape, Jégou et al. 2011 §III-IV): the
    * coarse quantizer routes queries to `nprobe` cells as in [[ivfTopK]],
    * but the index side stores PRODUCT-QUANTIZED codes of the RESIDUAL
    * r = u − c(u) (the offset from the vector's coarse centroid) — each
    * residual split into `m` subvectors, each encoded as its nearest
    * centroid in a per-subspace `ksub`-entry codebook trained on sample
    * residuals. Residual encoding concentrates the codebooks' resolution
    * on the within-cell spread instead of the whole sphere, which is what
    * lets a small refine budget recover the cell ceiling. Candidates are
    * shortlisted by asymmetric distance computed through a per-(query,
    * probed cell) LOOKUP TABLE: the m×ksub table of
    * ‖(q − c_cell)_subⱼ − codebookⱼ[c]‖² distances is built once per
    * probe (m·ksub·dim/m flops) and each candidate then costs m table
    * reads via the codegen'd [[org.apache.spark.sql.graft.PqAdcSum]] —
    * not m·(dim/m) multiply-adds per pair (the r6 `weak` finding). The
    * LUT amortizes whenever a cell holds more candidates than ksub rows,
    * i.e. always at scale (n/nlist ≫ ksub). Finally the top k·`refine`
    * per query are re-scored with exact cosine so no quantization error
    * leaves the operator.
    *
    * 100 TB shape — PQ is the MEMORY/SHUFFLE lever of the ANN family:
    * the candidate join's index side carries m CODE BYTES (ARRAY<TINYINT>
    * — ksub ≤ 128 so a code is one byte) instead of dim doubles — 32×
    * lighter at dim=64/m=16 — so a 10⁹-vector index fits executor memory
    * and the cell equi-join shuffles bytes, not vectors. The query side
    * carries the nprobe LUTs (nprobe·m·ksub doubles per query) instead
    * of the query vector — heavier per query row, but query rows are the
    * small side of the join by construction and the per-pair saving
    * multiplies by candidate volume. Codebooks (m·ksub·dim/m doubles =
    * dim·ksub total) train driver-side on the same bounded sample as the
    * quantizer and ship in the task closure like the LSH hyperplanes.
    * Recall vs the exact twin is gate-measured per round, never assumed.
    *
    * Defaults swept on the fixture (recall@5 vs exact; the IVF candidate
    * ceiling at nlist=16/nprobe=5 was 0.6748): with residual encoding,
    * m=8/ksub=64 at refine 5→0.618, 10→0.6624, 20→0.6748; m=16 at
    * refine 5→0.6704, 10→0.6748 — m=16/refine=10 recovers the FULL cell
    * ceiling (ADC retention 1.0) where the r6 raw-vector encoding needed
    * refine=20 (its refine-10 recall was 0.658). nprobe follows
    * [[ivfTopK]]'s r8 move to 10 (cell ceiling 0.896 on the gate
    * fixture). The refine default moved 10→20 in round 11: the sf0.1
    * oracle sweep measured refine-10 ADC retention at −0.038 vs IVF on
    * that sample's distribution (outside the −0.03 retention gate),
    * while refine-20 retains −0.006 at sf0.1 and −0.000 at sf0.01 — the
    * shortlist rescore is the cheap stage, so the wider budget is the
    * right default. Zero-norm rows are excluded up front (no direction
    * → NaN unit vector would poison codebook training and every
    * cosine). */
  def pqTopK(emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      k: Int = 5, nlist: Int = 16, nprobe: Int = 10, m: Int = 16, ksub: Int = 64,
      refine: Int = 20, seed: Long = 42, trainSample: Int = 16384): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, "need 1 <= nprobe <= nlist")
    require(refine >= 1, "refine multiplies the exact-rescore shortlist")
    require(ksub >= 1 && ksub <= 128, "PQ codes are stored as bytes: need 1 <= ksub <= 128")
    val pts0 = normalizedPoints(emb, idCol, vecCol).where(col("nrm") > 0)
    val pts = pts0.select(col("id"),
      transform(col("v"), x => x / col("nrm")).as("u"))
    val sample = sampleVectors(pts, "u", trainSample)
    if (sample.isEmpty) {
      return pts.limit(0).select(col("id").as("i"), col("id").as("j"),
        lit(0.0).as("cosine"), lit(0).cast("int").as("rank"))
    }
    val dim = sample(0).length
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val sub = dim / m
    val centers = bestOf3(sample, nlist, seed)
    // codebooks train on residuals to the coarse centroid — the
    // distribution the codes will actually quantize
    val residuals = sample.map { x =>
      val ctr = centers(nearestCellArr(centers, x))
      val r = new Array[Double](dim)
      var i = 0
      while (i < dim) { r(i) = x(i) - ctr(i); i += 1 }
      r
    }
    val books: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      val subvecs = residuals.map(x => java.util.Arrays.copyOfRange(x, j * sub, (j + 1) * sub))
      localKMeans(subvecs, math.min(ksub, subvecs.length), iters = 20, seed + 1000 + j)
    }
    val ksubEff = books(0).length
    // index side: home cell + PQ codes of the residual, one pass
    val encodeUdf = udf { (u: Seq[Double]) =>
      val x = u.toArray
      val cell = nearestCellArr(centers, x)
      val ctr = centers(cell)
      val codes = new Array[Byte](m)
      var j = 0
      while (j < m) {
        val book = books(j)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < book.length) {
          var s = 0.0
          var i = 0
          val bc = book(c)
          while (i < sub) {
            val df = (x(j * sub + i) - ctr(j * sub + i)) - bc(i)
            s += df * df
            i += 1
          }
          if (s < bestD) { bestD = s; best = c }
          c += 1
        }
        codes(j) = best.toByte
        j += 1
      }
      (cell, codes.toSeq)
    }
    // query side: ONE pass per query row computes its nprobe nearest
    // cells, each paired with the flattened m×ksub ADC lookup table of
    // the query residual against that cell's codewords, and the result
    // array is EXPLODED. The Generate materializes the UDF output once
    // per query row; the per-probe rows then carry struct-field reads
    // only. A separate LUT projection after the explode is NOT enough:
    // whole-stage codegen defers projection expressions to their point
    // of use, which for a broadcast-join stream side is inside the
    // per-match loop — the first r7 cut measured 30 s at sf0.1 (6× the
    // r6 pin) from exactly that, the LUT UDF re-running per candidate
    // pair instead of once per probe.
    val probeLutUdf = udf { (u: Seq[Double]) =>
      val x = u.toArray
      nearestCells(centers)(u, nprobe).map { cell =>
        val ctr = centers(cell)
        val lut = new Array[Double](m * ksubEff)
        var j = 0
        while (j < m) {
          val book = books(j)
          var c = 0
          while (c < ksubEff) {
            var s = 0.0
            var i = 0
            val bc = book(c)
            while (i < sub) {
              val df = (x(j * sub + i) - ctr(j * sub + i)) - bc(i)
              s += df * df
              i += 1
            }
            lut(j * ksubEff + c) = s
            c += 1
          }
          j += 1
        }
        (cell, lut.toSeq)
      }
    }

    val indexSide = pts.select(col("id"), encodeUdf(col("u")).as("enc"))
      .select(col("id"), col("enc._1").as("cell"), col("enc._2").as("codes"))
    val querySide = pts
      .select(col("id"), explode(probeLutUdf(col("u"))).as("pl"))
      .select(col("id"), col("pl._1").as("cell"), col("pl._2").as("lut"))
    // the bounded heap shortlists k·refine by ADC — the only stage that
    // sees the full candidate stream reads m codes against the LUT
    val shortlist = querySide.as("a")
      .join(indexSide.as("b"), Seq("cell"))
      .where(col("a.id") =!= col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        pqAdcSum(col("a.lut"), col("b.codes")).as("adc"))
      .groupBy(col("i"))
      .agg(org.apache.spark.sql.graft.TopKNeighbors
        .topk(k * refine, col("j"), col("adc")).as("nbrs"))
      .select(col("i"), explode(col("nbrs")).as("nbr"))
      .select(col("i"), col("nbr.j").as("j"))
    // exact refine on the shortlist: RAW vectors + norms join back by id
    // (narrow id-keyed joins of n·k·refine rows) and the cosine is
    // dot/(na·nb) — the SAME expression, same rounding, as bruteTopK.
    // Scoring from the unit vectors instead (dot of u's) differs in the
    // last ulp, which is enough to scramble ranks among near-tied
    // neighbors: the 16k replica probe measured recall 0.80 vs 1.0 from
    // exactly that before this was aligned.
    val qv = pts0.select(col("id").as("i"), col("v").as("qv"), col("nrm").as("na"))
    val cv = pts0.select(col("id").as("j"), col("v").as("cv"), col("nrm").as("nb"))
    val w = Window.partitionBy(col("i")).orderBy(col("cosine").desc, col("j").asc)
    shortlist.join(qv, "i").join(cv, "j")
      .select(col("i"), col("j"),
        (arrayDot(col("qv"), col("cv")) / (col("na") * col("nb"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("i", "j", "cosine", "rank")
  }

  /** SemDeDup-style semantic near-duplicate pairs (Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication",
    * 2023): cluster the embedding space with the IVF coarse quantizer,
    * then compute exact cosine ONLY between co-clustered vectors and keep
    * pairs at or above `threshold`. The clustering turns the O(n²) dup
    * scan into Σ_cell O(|cell|·probes) — the same inverted-file shape as
    * [[ivfTopK]], with the recall/compute trade governed by `nlist`
    * (resolution) and `nprobe` (boundary tolerance: a pair is found when
    * one side's home cell is among the other side's `nprobe` nearest).
    *
    * Every emitted pair carries its EXACT cosine (no sketch scores leak
    * out), so precision vs the all-pairs twin is 1.0 by construction and
    * only recall is approximate — both are gate-measured per round
    * against [[cosineDupPairs]].
    *
    * 100 TB shape: quantizer trains on a bounded driver sample and ships
    * in the closure; candidates come from a cell equi-join
    * (shuffle-on-key, never all-pairs); within-cell work is bounded by
    * the largest cell — raise `nlist` to keep cells executor-sized as the
    * corpus grows. Defaults swept on the fixture's near-uniform vectors
    * (the clustering worst case — recall vs the exact twin at nlist=16:
    * nprobe 1→0.356, 2→0.712, 3→0.864, 4→0.915, all at ~equal wall time
    * at fixture scale; SCALING.md): nprobe=4 probes a quarter of the
    * cells, which real clustered corpora can lower. */
  def semanticDupPairs(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", threshold: Double = 0.4,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42,
      trainSample: Int = 16384): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, "need 1 <= nprobe <= nlist")
    val pts = normalizedPoints(emb, idCol, vecCol)
    val centersOpt = trainQuantizer(pts, nlist, seed, trainSample)
    if (centersOpt.isEmpty) {
      return pts.limit(0).select(col("id").as("id_a"), col("id").as("id_b"),
        lit(0.0).as("cosine"))
    }
    val centers = centersOpt.get
    val cellUdf = udf { (v: Seq[Double]) => nearestCells(centers)(v, 1).head }
    val probeUdf = udf { (v: Seq[Double]) => nearestCells(centers)(v, nprobe) }
    val withVec = pts.select(col("id"), col("v"), col("nrm"))
    val indexSide = withVec.select(col("id"), col("v"), col("nrm"),
      cellUdf(col("v")).as("cell"))
    val probeSide = withVec.select(col("id"), col("v"), col("nrm"),
      explode(probeUdf(col("v"))).as("cell"))
    // symmetric candidate rule: a pair is found when EITHER side's home
    // cell is among the other's nprobe nearest, so each unordered pair
    // surfaces once or twice. The dedup distinct runs AFTER the threshold
    // filter — a narrow (long, long, double) shuffle bounded by the
    // actual duplicate count, not the candidate count — and the cosine is
    // bit-identical from both directions (same summation order), so
    // distinct collapses them exactly.
    probeSide.as("a")
      .join(indexSide.as("b"), Seq("cell"))
      .where(col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"),
        (arrayDot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .where(col("cosine") >= threshold)
      .distinct()
  }

  /** Prototype-density pruning (Sorscher et al. 2022, "Beyond neural
    * scaling laws: beating power law scaling via data pruning"; applied
    * after SemDeDup in the D4 recipe, Tirumala et al. 2023): cluster the
    * embedding space with the IVF coarse quantizer, score each vector's
    * PROTOTYPICALITY as cosine to its cluster centroid, and keep only
    * the least-prototypical `keepRate` fraction of every cluster —
    * high-density prototypical examples are the redundant ones a
    * web-scale corpus can afford to drop. Output one row per input
    * vector: (id, cell, proto, kept 1|0); deterministic under the fixed
    * quantizer seed with a (proto, id) tie-break.
    *
    * 100 TB shape: the quantizer trains on a bounded driver sample and
    * ships in the closure (same as [[ivfTopK]]/[[semanticDupPairs]]);
    * assignment + scoring is a shuffle-free projection; the only
    * exchange is the cell-PARTITIONED ranking window, whose partition
    * size is bounded by the largest cluster — raise `nlist` to keep
    * cells executor-sized as the corpus grows. */
  def prototypePrune(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", keepRate: Double = 0.7,
      nlist: Int = 16, seed: Long = 42, trainSample: Int = 16384): DataFrame = {
    require(keepRate > 0 && keepRate <= 1, s"keepRate in (0,1], got $keepRate")
    val pts = normalizedPoints(emb, idCol, vecCol)
    val centersOpt = trainQuantizer(pts, nlist, seed, trainSample)
    if (centersOpt.isEmpty) {
      return pts.limit(0).select(col("id"), lit(0).as("cell"),
        lit(0.0).as("proto"), lit(1).as("kept"))
    }
    val centers = centersOpt.get
    // unit centroids so proto is a true cosine; a zero centroid (empty
    // cell artifact) scores 0 — its members rank first and are kept
    val unitCenters = centers.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0) c else c.map(_ / n)
    }
    val assignUdf = udf { (v: Seq[Double], nrm: Double) =>
      val cell = nearestCellArr(centers, v.toArray)
      val cu = unitCenters(cell)
      var dot = 0.0
      var i = 0
      while (i < cu.length) { dot += v(i) * cu(i); i += 1 }
      (cell, if (nrm == 0) 0.0 else dot / nrm)
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cell"))
    val byProto = w.orderBy(col("proto").asc, col("id").asc)
    pts
      .withColumn("_a", assignUdf(col("v"), col("nrm")))
      .select(col("id"), col("_a._1").as("cell"), col("_a._2").as("proto"))
      .withColumn("kept",
        (row_number().over(byProto) <= ceil(count(lit(1)).over(w) * keepRate))
          .cast("int"))
  }
}
