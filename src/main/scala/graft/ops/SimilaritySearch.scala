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

  /** Random-hyperplane LSH ANN: per table t, bucket(v) = sign-bit string
    * of ⟨v, h_t,1..b⟩. Candidates = vectors sharing any (table, bucket);
    * exact cosine on candidates; bounded-heap top-k. Hyperplanes are
    * seeded driver-side and ship in the task closure (L·b·dim doubles —
    * a few KB). Collision probability for angle θ: (1 − θ/π)^b per table,
    * 1−(1−p)^L overall. Defaults (14 tables × 5 bits) are sized for
    * neighbors around cosine 0.5 — p_bit ≈ 0.67, overall ≈ 0.8 — because
    * near-uniform random vectors (the fixture, and the hardest real case)
    * have wide-angle nearest neighbors; corpora with tight clusters can
    * raise `bits` for smaller buckets. Table count was swept on the
    * fixture (recall@5 vs the exact twin: 11→0.597, 12→0.626, 13→0.652,
    * 14→0.681, 16→0.734, candidate cost linear in tables — SCALING.md);
    * 14 buys real gate headroom at ~17% more candidates than 12. Recall
    * is measured in SimilaritySpec and the per-round gate, not assumed. */
  def lshTopK(emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      k: Int = 5, tables: Int = 14, bits: Int = 5, dim: Int = 64,
      seed: Long = 42): DataFrame = {
    val rng = new java.util.Random(seed)
    val planes = Array.fill(tables, bits, dim)(rng.nextGaussian())

    val bucketUdf = udf { (v: Seq[Double]) =>
      require(v.length == dim,
        s"lshTopK: hyperplanes were generated for dim=$dim but a vector has " +
          s"${v.length} components — pass the actual embedding dimension")
      val d = dim
      (0 until tables).map { t =>
        var bucket = 0L
        var b = 0
        while (b < bits) {
          var dot = 0.0
          var i = 0
          val plane = planes(t)(b)
          while (i < d) { dot += plane(i) * v(i); i += 1 }
          if (dot > 0) bucket |= (1L << b)
          b += 1
        }
        (t, bucket)
      }
    }

    val pts = normalizedPoints(emb, idCol, vecCol)
    val buckets = pts
      .select(col("id"), col("v"), col("nrm"), explode(bucketUdf(col("v"))).as("tb"))
      .select(col("id"), col("v"), col("nrm"), col("tb._1").as("t"), col("tb._2").as("bucket"))

    // same (i,j) surfacing from several tables is deduped INSIDE the
    // bounded-heap aggregator — no distinct shuffle carrying the wide
    // vector columns (at fixture scale that shuffle alone cost ~10s)
    val pairs = buckets.as("a")
      .join(buckets.as("b"), Seq("t", "bucket"))
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
  private def localKMeans(
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
    * SimilaritySpec/the ann_ivf_topk gate vs the exact twin. */
  def ivfTopK(emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      k: Int = 5, nlist: Int = 16, nprobe: Int = 5, seed: Long = 42,
      trainSample: Int = 16384): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, "need 1 <= nprobe <= nlist")
    require(trainSample >= 1,
      s"trainSample must be >= 1, got $trainSample (an empty quantizer " +
        "sample would silently return an empty result for non-empty input)")

    val pts = normalizedPoints(emb, idCol, vecCol)
    // deterministic bounded training sample (TakeOrdered — no full sort)
    val sample = pts.orderBy(col("id")).limit(trainSample)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    if (sample.isEmpty) {
      // empty input → empty result with the output schema (matches
      // bruteTopK's behavior instead of an opaque kmeans crash)
      return pts.limit(0).select(col("id").as("i"), col("id").as("j"),
        lit(0.0).as("cosine"), lit(0).cast("int").as("rank"))
    }
    // best-of-3 seeded restarts by within-cluster SSE (k-means layout
    // quality is init-luck on near-uniform data; restarts are driver-cheap)
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
    val centers: Array[Array[Double]] =
      (0 until 3).map(r => localKMeans(sample, nlist, iters = 20, seed + r))
        .minBy(sse)
    val withVec = pts.select(col("id"), col("v"), col("nrm"))

    // nearest cells by euclidean distance, deterministic tie-break on index
    def nearestCells(v: Seq[Double], m: Int): Seq[Int] = {
      val d2 = centers.map { c =>
        var s = 0.0
        var i = 0
        while (i < c.length) { val df = v(i) - c(i); s += df * df; i += 1 }
        s
      }
      d2.zipWithIndex.sortBy { case (dist, idx) => (dist, idx) }.take(m).map(_._2).toSeq
    }
    val cellUdf = udf { (v: Seq[Double]) => nearestCells(v, 1).head }
    val probeUdf = udf { (v: Seq[Double]) => nearestCells(v, nprobe) }

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
}
