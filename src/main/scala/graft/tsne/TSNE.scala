package graft.tsne

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One sparse-affinity adjacency row: dense point index + sorted neighbor
  * indices and their symmetrized probabilities. */
case class AffRow(i: Int, js: Array[Int], ps: Array[Double])

/** Per-iteration callback: (iteration, embedding n×d row-major, loss). */
object TSNE {
  type Callback = (Int, Array[Double], Option[Double]) => Unit
  val NoopCallback: Callback = (_, _, _) => ()

  /** Prepare (id, features) into dense 0..n-1 indices + cached adjacency.
    *
    * Dense indices are required because the embedding Y is a driver-side
    * flat matrix indexed positionally (SURVEY §1.4). The reference gets
    * them implicitly from `zipWithIndex` partition order — the
    * nondeterminism hazard flagged in SURVEY §4.3.2; here the mapping is
    * orig_id rank order, realized as a broadcast-joined driver-built
    * lookup: the sorted idMap must be collected anyway (Y is a positional
    * driver matrix, so n is bounded), and joining it back beats a global
    * `row_number()` window, which would funnel every (id, features) row —
    * feature arrays included — through one partition. Only the 8-byte
    * orig_id column is ever collected (column-pruned scan).
    */
  def prepareAffinities(
      points: DataFrame,
      idCol: String,
      featuresCol: String,
      params: TSNEParams): (Dataset[AffRow], Int, Array[Long]) = {
    val spark = points.sparkSession
    import spark.implicits._

    val base = points
      .select(col(idCol).cast("long").as("orig_id"),
        graft.functions.VectorFunctions.asDoubleArray(col(featuresCol)).as("features"))
    val idRows = base.select("orig_id").collect()
    val idMap = idRows.map { r =>
      require(!r.isNullAt(0),
        s"t-SNE id column '$idCol' contains null or non-numeric values " +
          "(cast to LONG produced null) — ids must be non-null and castable")
      r.getLong(0)
    }
    java.util.Arrays.sort(idMap)
    val n = idMap.length
    var w = 1
    while (w < n) {
      require(idMap(w) != idMap(w - 1),
        s"t-SNE id column '$idCol' contains duplicate value ${idMap(w)} — " +
          "ids must be unique (dense indices are derived from id rank)")
      w += 1
    }
    val mapDf = spark.createDataset(
        idMap.toSeq.zipWithIndex.map { case (o, i) => (o, i.toLong) })
      .toDF("orig_id", "id")
    val indexed = base.join(broadcast(mapDf), "orig_id").cache()

    // right-size iteration partitions: each per-iteration job pays a task
    // per partition, and adjacency rows are tiny (~k neighbors each) —
    // target ≥256 rows/task instead of inheriting shuffle.partitions
    val iterParts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, n / 256))
    val bucket =
      if (params.approxKnn)
        Some(params.approxKnnBucketLength.getOrElse(
          KNN.autoBucketLength(indexed, "features")))
      else None
    val adj = Affinities.computeP(
        indexed, n.toLong, "id", "features", params.perplexity, params.tol, bucket)
      .select(
        col("i").cast("int").as("i"),
        col("js").cast("array<int>").as("js"),
        col("ps"))
      .as[AffRow]
      .repartition(iterParts)
      .cache()
    adj.count() // materialize before the iteration loop
    indexed.unpersist()
    (adj, n, idMap)
  }

  /** Driver-side parameter update: adaptive gains, momentum, recentering
    * (reference TSNEHelper.update, TSNEHelper.scala:31-57). All state is
    * n×d doubles — driver-local by design. */
  def update(
      y: Array[Double], dY: Array[Double], iY: Array[Double], gains: Array[Double],
      iteration: Int, params: TSNEParams, n: Int, d: Int): Unit = {
    val momentum =
      if (iteration <= params.tMomentum) params.initialMomentum else params.finalMomentum
    var k = 0
    while (k < y.length) {
      gains(k) =
        if ((dY(k) > 0) != (iY(k) > 0)) gains(k) + 0.2
        else gains(k) * 0.8
      if (gains(k) < params.minGain) gains(k) = params.minGain
      iY(k) = momentum * iY(k) - params.eta * gains(k) * dY(k)
      y(k) += iY(k)
      k += 1
    }
    // recenter each dim to zero mean
    var dd = 0
    while (dd < d) {
      var s = 0.0
      var i = 0
      while (i < n) { s += y(i * d + dd); i += 1 }
      val m = s / n
      i = 0
      while (i < n) { y(i * d + dd) -= m; i += 1 }
      dd += 1
    }
  }

  def gaussianInit(n: Int, d: Int, seed: Long, scale: Double): Array[Double] = {
    val rng = new java.util.Random(seed)
    Array.fill(n * d)(rng.nextGaussian() * scale)
  }

  /** Embedding (n×d flat, dense idx) → DataFrame via idMap: columns
    * (id, x, y[, c2, c3, …]) — one column per dimension (CSV-safe), the
    * first two keeping the conventional x/y names. */
  def toDF(spark: SparkSession, yFlat: Array[Double], idMap: Array[Long], d: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val names = (0 until d).map {
      case 0 => "x"
      case 1 => "y"
      case k => s"c$k"
    }
    val schema = StructType(
      StructField("id", LongType) +: names.map(StructField(_, DoubleType)))
    val rows = idMap.indices.map { i =>
      Row.fromSeq(idMap(i) +: (0 until d).map(k => yFlat(i * d + k)))
    }
    // right-size slices: the default (defaultParallelism) shards a few
    // hundred rows into 32 near-empty partitions, and any downstream
    // cartesian then multiplies partition COUNTS (32×32 = 1024 tiny
    // tasks for a 500-point trustworthiness pass — measured ~2 s of pure
    // scheduling). ≥4096 rows/slice keeps small embeddings in one task.
    val slices = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, rows.size / 4096))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, slices), schema)
  }
}

/** Exact-gradient t-SNE (reference impl/SimpleTSNE.scala). Two Spark jobs
  * per iteration over the cached adjacency — (1) global Student-t
  * numerator Z, (2) gradient + KL loss accumulated into an n×d buffer via
  * `treeAggregate` with in-place adds (the matrix-buffer aggregation
  * SURVEY A-3/A-4; Catalyst has no matrix-valued aggregate, so the typed
  * RDD aggregate IS the idiomatic escape hatch here). Exaggeration is a
  * multiplier applied inside the kernel — never an in-place mutation of
  * cached data (fixes reference hazard D-5).
  */
object SimpleTSNE {

  def tsne(
      points: DataFrame,
      idCol: String = "id",
      featuresCol: String = "features",
      params: TSNEParams = TSNEParams(),
      callback: TSNE.Callback = TSNE.NoopCallback): DataFrame = {
    val spark = points.sparkSession
    val sc = spark.sparkContext
    val (adj, n, idMap) = TSNE.prepareAffinities(points, idCol, featuresCol, params)
    val d = params.dims

    val y = TSNE.gaussianInit(n, d, params.seed, 1.0)
    val iY = new Array[Double](n * d)
    val gains = Array.fill(n * d)(1.0)

    val rdd = adj.rdd.cache()
    rdd.count()
    // the Dataset cache (from prepareAffinities) fed this RDD cache and is
    // not read again — release it so only one adjacency copy stays pinned
    adj.unpersist()

    var iter = 1
    while (iter <= params.maxIterations) {
      val exag = if (iter <= params.earlyExaggeration) params.exaggerationFactor else 1.0
      val bcY = sc.broadcast(y)

      // job 1: Z = Σ_{i≠j} (1 + ‖y_i − y_j‖²)⁻¹ (over row indices; O(n)/row)
      val sumZ = rdd.treeAggregate(0.0)(
        seqOp = (acc, row) => acc + TSNEKernels.rowNumeratorSum(bcY.value, n, d, row.i),
        combOp = _ + _)

      // job 2: (dY, loss)
      val (dY, loss) = rdd.treeAggregate((new Array[Double](n * d), 0.0))(
        seqOp = (acc, row) => {
          val l = TSNEKernels.exactGradientRow(bcY.value, n, d, row, sumZ, exag, acc._1)
          (acc._1, acc._2 + l)
        },
        combOp = (a, b) => {
          TSNEKernels.addInPlace(a._1, b._1)
          (a._1, a._2 + b._2)
        })

      bcY.destroy()
      TSNE.update(y, dY, iY, gains, iter, params, n, d)
      callback(iter, y.clone(), Some(loss))
      iter += 1
    }
    rdd.unpersist()
    TSNE.toDF(spark, y, idMap, d)
  }
}

/** Barnes-Hut t-SNE (reference impl/BHTSNE.scala): one job per iteration —
  * treeAggregate of (posF, negF, sumQ); the driver builds the SPTree from
  * Y (O(n log n) local) and broadcasts tree + Y; dY = posF − negF/sumQ
  * (reference :66, learning-rate factor absorbed into η).
  *
  * NOTE: like the reference (and van der Maaten's canonical Barnes-Hut
  * implementation), this driver omits the factor 4 that SimpleTSNE's
  * exact kernels include, so the same η yields a 4× smaller effective
  * step here. Loss curves are comparable across drivers; step sizes are
  * not — scale η by 4 when porting hyperparameters between them.
  */
object BHTSNE {

  def tsne(
      points: DataFrame,
      idCol: String = "id",
      featuresCol: String = "features",
      params: TSNEParams = TSNEParams(maxIterations = 500),
      callback: TSNE.Callback = TSNE.NoopCallback): DataFrame = {
    val spark = points.sparkSession
    val sc = spark.sparkContext
    val (adj, n, idMap) = TSNE.prepareAffinities(points, idCol, featuresCol, params)
    val d = params.dims

    val y = TSNE.gaussianInit(n, d, params.seed, 1e-4)
    val iY = new Array[Double](n * d)
    val gains = Array.fill(n * d)(1.0)

    val rdd = adj.rdd.cache()
    rdd.count()
    // the Dataset cache (from prepareAffinities) fed this RDD cache and is
    // not read again — release it so only one adjacency copy stays pinned
    adj.unpersist()

    var iter = 1
    while (iter <= params.maxIterations) {
      val exag = if (iter <= params.earlyExaggeration) params.exaggerationFactor else 1.0
      val wantLoss = params.reportLoss > 0 && iter % params.reportLoss == 0
      val bcY = sc.broadcast(y)
      // broadcast the struct-of-arrays tree: serializing the pointer tree
      // dominated the iteration (~140 ms vs ~20 ms build at n=16k)
      val bcTree = sc.broadcast(FlatSPTree.build(y, n, d))

      val (posF, negF, sumQ, rawLoss) =
        rdd.treeAggregate((new Array[Double](n * d), new Array[Double](n * d), 0.0, 0.0))(
          seqOp = (acc, row) => {
            val q = bcTree.value.nonEdgeForces(
              TSNEKernels.rowOf(bcY.value, d, row.i), params.theta, acc._2, row.i * d)
            val l = TSNEKernels.edgeForcesRow(bcY.value, d, row, exag, acc._1, wantLoss)
            (acc._1, acc._2, acc._3 + q, acc._4 + l)
          },
          combOp = (a, b) => {
            TSNEKernels.addInPlace(a._1, b._1)
            TSNEKernels.addInPlace(a._2, b._2)
            (a._1, a._2, a._3 + b._3, a._4 + b._4)
          })

      bcY.destroy()
      bcTree.destroy()

      val dY = new Array[Double](n * d)
      var k = 0
      while (k < dY.length) { dY(k) = posF(k) - negF(k) / sumQ; k += 1 }

      // KL(P‖Q) with q = num/sumQ: Σ p(log p − log num) + log(sumQ)·Σp,
      // and Σp = exag (symmetrized P sums to 1 before exaggeration).
      val loss = if (wantLoss) Some(rawLoss + exag * math.log(sumQ)) else None

      TSNE.update(y, dY, iY, gains, iter, params, n, d)
      callback(iter, y.clone(), loss)
      iter += 1
    }
    rdd.unpersist()
    TSNE.toDF(spark, y, idMap, d)
  }
}
