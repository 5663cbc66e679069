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

  /** Train on the full distributed table. The points RDD is cached for
    * the duration of the loop (MEMORY_AND_DISK — at 100 TB the working
    * set spills rather than recomputing the scan) and unpersisted on
    * exit. */
  def train(emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      k: Int = 8, iters: Int = 10): Model = {
    val pts = toPoints(emb, idCol, vecCol)
    var centers = seedCenters(pts, k)
    require(centers.nonEmpty, "kmeans: empty input")
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
