package graft.ml

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed k-means (Lloyd's algorithm) over an embedding column.
  *
  * This is the SCALE path for clustering at corpus size — the complement
  * of the bounded driver-sample k-means that trains the IVF coarse
  * quantizer ([[graft.ops.SimilaritySearch]]): here every row participates
  * in every iteration, so the centers reflect the full distribution, not a
  * sample. The execution shape per iteration is
  *
  *  - centers ship to executors in the task closure (k·d doubles — for
  *    quantizer-scale k up to ~2^16 that's ≤32 MB; beyond that switch the
  *    closure for an explicit `sparkContext.broadcast`, same semantics),
  *  - ONE `treeAggregate` pass accumulates (per-cluster Σx, count, total
  *    SSE) into a flat (k·d + k + 1) double buffer with map-side combine —
  *    no shuffle of per-row assignments, no groupBy, O(k·d) per-partition
  *    reduce state,
  *  - the driver recomputes centers (O(k·d)) and loops.
  *
  * So an iteration costs exactly one scan of the (cached) input and
  * O(k·d·partitions) reduce traffic, independent of row count — the same
  * shape MLlib's KMeans uses, without the Vector UDT conversions. The
  * driver loop is O(1) plan size per iteration (the RDD lineage does not
  * grow: each pass re-reads the same cached RDD).
  *
  * Determinism: init picks the k seed rows with the smallest
  * `xxhash64(id)` (a seeded deterministic shuffle-order sample — spread
  * across the id space, stable across partitionings); per-point nearest
  * center iterates clusters in index order with strict `<`, so ties break
  * to the lowest cluster index; an empty cluster keeps its previous
  * center. A sequential driver twin ([[trainLocal]]) with the same init
  * reproduces the run up to floating-point summation order (treeAggregate
  * adds members in partition order, the twin in sequence order), which the
  * MlSpec/ml_kmeans gate quantifies: |ΔSSE| ≤ 1e-9 relative and ≥99%
  * identical assignments.
  */
object KMeans {

  /** Centers after `iters` Lloyd's rounds plus the SSE trajectory.
    * `sse(i)` is the total squared distance measured with the centers of
    * round i (sse(0) = the seed centers), so the sequence is
    * non-increasing by Lloyd's monotonicity. */
  final case class Model(centers: Array[Array[Double]], sse: Array[Double]) {
    def k: Int = centers.length
  }

  private def nearest(centers: Array[Array[Double]], x: Array[Double]): (Int, Double) = {
    var bi = 0
    var bd = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      var s = 0.0
      var j = 0
      while (j < x.length) { val df = x(j) - ctr(j); s += df * df; j += 1 }
      if (s < bd) { bd = s; bi = c }
      c += 1
    }
    (bi, bd)
  }

  /** Deterministic seed centers: the k rows with the smallest
    * `xxhash64(id)` — a fixed pseudo-random sample that is independent of
    * the physical row order (TakeOrdered on the hash; no full sort). */
  private def seedCenters(pts: DataFrame, k: Int): Array[Array[Double]] =
    pts.orderBy(xxhash64(col("id")), col("id")).limit(k)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)

  /** Null-embedding rows are EXCLUDED up front (same contract as the ANN
    * family's zero-norm exclusion): a null vector has no position, and
    * letting it reach the distance kernel would be a partition-dependent
    * NPE instead of a defined behavior. */
  private def toPoints(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))

  /** One Lloyd's step over an RDD of points: returns (new centers, SSE of
    * the CURRENT centers). Shared by nothing else — kept private so the
    * buffer layout (k·d sums ++ k counts ++ 1 sse) stays an implementation
    * detail. */
  private def step(data: RDD[Array[Double]], centers: Array[Array[Double]],
      d: Int): (Array[Array[Double]], Double) = {
    val k = centers.length
    val agg = data.treeAggregate(new Array[Double](k * d + k + 1))(
      seqOp = { (buf, x) =>
        val (bi, bd) = nearest(centers, x)
        var j = 0
        while (j < d) { buf(bi * d + j) += x(j); j += 1 }
        buf(k * d + bi) += 1.0
        buf(k * d + k) += bd
        buf
      },
      combOp = { (a, b) =>
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      })
    val next = Array.tabulate(k) { c =>
      val n = agg(k * d + c)
      if (n == 0.0) centers(c) // empty cluster: keep the previous center
      else Array.tabulate(d)(j => agg(c * d + j) / n)
    }
    (next, agg(k * d + k))
  }

  /** Deterministic per-(id, round) uniform draw in [0, 1): splitmix64
    * finalizer over the id/round mix, top 53 bits as the mantissa. A
    * hash-based Bernoulli makes the k-means|| sampling reproducible
    * across partitionings and reruns — no RNG state on executors. */
  private def hashFrac(id: Long, round: Int): Double = {
    var z = id ^ (round.toLong * 0x9e3779b97f4a7c15L)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble
  }

  /** k-means|| initialization (Bahmani et al. 2012): the SCALE init.
    * Sampling k seeds by hash ([[seedCenters]]) is distribution-blind —
    * on clustered data it lands ∝ mass, over-seeding dense modes and
    * missing small ones, which Lloyd's then pays for in iterations (or
    * never fixes: Lloyd's cannot move a center across an empty gap).
    * k-means|| fixes seeding for O(rounds) passes:
    *
    *  - each round: ONE pass computes Σd²(x, C) (same treeAggregate
    *    shape as a Lloyd's step), a second pass samples each point
    *    independently with p = min(1, l·d²/Σd²) via the deterministic
    *    [[hashFrac]] draw and collects the (expected ≤ l per round,
    *    hard-capped) new candidates to the driver;
    *  - candidates are then weighted by how many points they own (one
    *    more pass) and reduced to k centers by weighted driver-side
    *    Lloyd's over the ≤ rounds·cap candidate set (k-means++-free but
    *    weighted — the candidate set is already d²-spread by
    *    construction).
    *
    * Cost: 2·rounds+1 data passes ONCE, against the iterations saved in
    * every subsequent Lloyd's round — the standard trade at corpus
    * scale. Everything driver-side is O(rounds·cap·d). */
  def parallelInit(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", k: Int = 8, rounds: Int = 5,
      oversample: Double = 0.0): Array[Array[Double]] = {
    val l = if (oversample > 0) oversample else 2.0 * k
    val pts = toPoints(emb, idCol, vecCol)
    val data = pts.select(col("id"), col("v")).rdd
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val first = pts.orderBy(xxhash64(col("id")), col("id")).limit(1)
        .select(col("v")).collect()
      require(first.nonEmpty, "kmeans: empty input")
      // a candidate cap bounds the driver collect even on adversarial
      // d² distributions (expected draw per round is l)
      val cap = math.max(16, (4 * l).toInt)
      var cands = scala.collection.mutable.ArrayBuffer(
        first(0).getSeq[Double](0).toArray)
      var r = 0
      while (r < rounds) {
        val cs = cands.toArray
        val sumD2 = data.map { case (_, x) => nearest(cs, x)._2 }.sum()
        if (sumD2 <= 0) r = rounds // every point is a candidate already
        else {
          val round = r
          val drawn = data.flatMap { case (id, x) =>
            val p = math.min(1.0, l * nearest(cs, x)._2 / sumD2)
            if (hashFrac(id, round) < p) Some((hashFrac(id, -round - 1), x))
            else None
          }.takeOrdered(cap)(Ordering.by(_._1)) // deterministic cap
          cands ++= drawn.map(_._2)
          r += 1
        }
      }
      // weight candidates by ownership, then weighted Lloyd's to k
      val cs = cands.toArray
      val counts = data.map { case (_, x) => nearest(cs, x)._1 }.countByValue()
      val weights = Array.tabulate(cs.length)(i => counts.getOrElse(i, 0L).toDouble)
      weightedLloyd(cs, weights, k, iters = 20)
    } finally data.unpersist(blocking = false)
  }

  /** Driver-side weighted Lloyd's over the candidate set (all O(|cands|·
    * k·d) — |cands| ≤ rounds·cap by construction). Seeds = deterministic
    * weighted k-means++ (maxmin variant: heaviest candidate first, then
    * repeatedly the candidate maximizing w·d² to the chosen set). Seeding
    * by weight ALONE loses separated modes: a mode whose weight splits
    * across several candidates ranks below a double-picked two-candidate
    * mode, and Lloyd's can't recover a seed across an empty gap — the
    * maxmin d² term is what guarantees every far mass gets a seed. */
  private def weightedLloyd(cands: Array[Array[Double]], w: Array[Double],
      k: Int, iters: Int): Array[Array[Double]] = {
    if (cands.length <= k) return cands
    val d = cands(0).length
    val seedIdx = scala.collection.mutable.ArrayBuffer(
      w.indices.maxBy(i => (w(i), -i)))
    val minD2 = Array.fill(cands.length)(Double.MaxValue)
    while (seedIdx.length < k) {
      val last = cands(seedIdx.last)
      var i = 0
      while (i < cands.length) {
        var s = 0.0
        var j = 0
        while (j < d) { val df = cands(i)(j) - last(j); s += df * df; j += 1 }
        if (s < minD2(i)) minD2(i) = s
        i += 1
      }
      seedIdx += minD2.indices.maxBy(i => (w(i) * minD2(i), -i))
    }
    var centers = seedIdx.map(cands(_)).toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Double](k)
      var i = 0
      while (i < cands.length) {
        if (w(i) > 0) {
          val (bi, _) = nearest(centers, cands(i))
          var j = 0
          while (j < d) { sums(bi)(j) += w(i) * cands(i)(j); j += 1 }
          counts(bi) += w(i)
        }
        i += 1
      }
      centers = Array.tabulate(k) { c =>
        if (counts(c) == 0.0) centers(c)
        else Array.tabulate(d)(j => sums(c)(j) / counts(c))
      }
      it += 1
    }
    centers
  }

  /** Train with EXPLICIT initial centers (e.g. [[parallelInit]]'s) —
    * same Lloyd's loop/trajectory contract as [[train]]. */
  def trainFrom(emb: DataFrame, initCenters: Array[Array[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding",
      iters: Int = 10): Model = {
    require(initCenters.nonEmpty, "kmeans: empty initial centers")
    val pts = toPoints(emb, idCol, vecCol)
    lloydLoop(pts, initCenters, iters)
  }

  /** Train on the full distributed table. The points RDD is cached for
    * the duration of the loop (MEMORY_AND_DISK — at 100 TB the working
    * set spills rather than recomputing the scan) and unpersisted on
    * exit. */
  def train(emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      k: Int = 8, iters: Int = 10): Model = {
    val pts = toPoints(emb, idCol, vecCol)
    val centers = seedCenters(pts, k)
    require(centers.nonEmpty, "kmeans: empty input")
    lloydLoop(pts, centers, iters)
  }

  private def lloydLoop(pts: DataFrame, init: Array[Array[Double]],
      iters: Int): Model = {
    var centers = init
    val d = centers(0).length
    val data = pts.select(col("v")).rdd.map(_.getSeq[Double](0).toArray)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val sse = new Array[Double](iters + 1)
      var i = 0
      while (i < iters) {
        val (next, err) = step(data, centers, d)
        sse(i) = err
        centers = next
        i += 1
      }
      // SSE of the final centers (one more measurement pass so the
      // reported trajectory covers every center set produced)
      sse(iters) = data.map(x => nearest(centers, x)._2).sum()
      Model(centers, sse)
    } finally data.unpersist(blocking = false)
  }

  /** Sequential driver twin: identical init, identical update rule,
    * sequential summation. The distributed/driver SSE gap quantifies pure
    * floating-point reassociation — the MlSpec gate bounds it. */
  def trainLocal(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", k: Int = 8, iters: Int = 10): Model = {
    val pts = toPoints(emb, idCol, vecCol)
    var centers = seedCenters(pts, k)
    require(centers.nonEmpty, "kmeans: empty input")
    val d = centers(0).length
    val data = pts.orderBy(col("id")).select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    val sse = new Array[Double](iters + 1)
    var i = 0
    while (i < iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Double](k)
      var err = 0.0
      data.foreach { x =>
        val (bi, bd) = nearest(centers, x)
        var j = 0
        while (j < d) { sums(bi)(j) += x(j); j += 1 }
        counts(bi) += 1.0
        err += bd
      }
      sse(i) = err
      centers = Array.tabulate(k) { c =>
        if (counts(c) == 0.0) centers(c)
        else Array.tabulate(d)(j => sums(c)(j) / counts(c))
      }
      i += 1
    }
    sse(iters) = data.map(x => nearest(centers, x)._2).sum
    Model(centers, sse)
  }

  /** Assign every row to its nearest trained center: shuffle-free — the
    * centers ship in the task closure (same k·d bound as training) and
    * each row maps to (id, cluster, dist2) in one narrow pass, using the
    * identical `nearest` math so an assignment dump is consistent with
    * the training trajectory bit-for-bit. */
  def assign(emb: DataFrame, model: Model, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val centers = model.centers
    toPoints(emb, idCol, vecCol)
      .map { r =>
        val x = r.getSeq[Double](1).toArray
        val (bi, bd) = nearest(centers, x)
        (r.getLong(0), bi, bd)
      }
      .toDF("vec_id", "cluster", "dist2")
  }
}
