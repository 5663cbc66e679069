package graft.ml

import graft.{Gate, Q, Tables}
import org.apache.spark.sql.functions._

object MlQueries {

  /** Per-dimension z-score standardization (population σ, SURVEY §7.4.5),
    * exposed as the exploded (vec_id, pos, z) relation so DuckDB can
    * oracle it. */
  val standardize: Q = Q(
    "ml_standardize",
    """WITH e AS (
      |  SELECT vec_id, CAST(i AS INTEGER) - 1 AS pos,
      |         CAST(embedding[i] AS DOUBLE) AS x
      |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
      |m AS (SELECT pos, avg(x) AS mu,
      |        CASE WHEN stddev_pop(x) = 0 THEN 1.0 ELSE stddev_pop(x) END AS sd
      |      FROM e GROUP BY pos)
      |SELECT e.vec_id, e.pos, (e.x - m.mu) / m.sd AS z
      |FROM e JOIN m USING (pos)""".stripMargin
  ) { (s, d) =>
    Preprocess.standardize(Tables.embeddings(s, d), "vec_id", "embedding")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "z")))
  }

  /** PCA projection (top-8 components). Principal axes have sign/rotation
    * indeterminacy across implementations → rows-only check here; the
    * numeric contract (dimension, variance ordering, orthogonal recon)
    * is asserted in PreprocessSpec. Exploded to scalar (vec_id, pos, y)
    * rows — the driver's rows-only comparator sorts with pandas, which
    * cannot sort array cells. */
  val pca: Q = Q.gated("ml_pca") { (s, d) =>
    Preprocess.pca(Tables.embeddings(s, d), "vec_id", "embedding", k = 8)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "y")))
  } { (s, d, res) =>
    // PCA contract: every input vector present with exactly k scalar
    // rows (a null embedding would silently drop its vector from the
    // exploded dump), finite scores, and component variance
    // non-increasing in component index (axes ordered by explained
    // variance)
    val expected = Tables.embeddings(s, d).count() * 8.0
    val r = res.agg(
      avg(when(!isnan(col("y")) && abs(col("y")) < Double.MaxValue, 1.0)
        .otherwise(0.0)).as("ff"),
      countDistinct(col("pos")).as("k")).head
    val rows = res.count().toDouble
    val perPos = res.groupBy("pos").agg(var_pop(col("y")).as("v"))
      .orderBy("pos").collect().map(_.getDouble(1))
    val monotone = perPos.indices.drop(1)
      .forall(i => perPos(i) <= perPos(i - 1) * (1 + 1e-9) + 1e-12)
    Seq(
      Gate("rows_eq_n_times_k", rows, rows == expected),
      Gate("frac_finite", r.getDouble(0), r.getDouble(0) == 1.0),
      Gate("n_components", r.getLong(1).toDouble, r.getLong(1) == 8),
      Gate("variance_monotone", if (monotone) 1.0 else 0.0, monotone))
  }

  /** Int8 embedding quantization, exploded to scalar (vec_id, pos, code)
    * rows and oracle-matched BIT-exactly — `floor(u + 0.5)` on both
    * engines sidesteps SQL ROUND divergence. */
  val quantizeInt8: Q = Q(
    "ml_quantize_int8",
    """WITH e AS (
      |  SELECT vec_id, CAST(i AS INTEGER) - 1 AS pos,
      |         CAST(embedding[i] AS DOUBLE) AS x
      |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
      |m AS (SELECT pos, min(x) AS mn,
      |        CASE WHEN max(x) = min(x) THEN 1.0
      |             ELSE (max(x) - min(x)) / 255.0 END AS sc
      |      FROM e GROUP BY pos)
      |SELECT e.vec_id, e.pos,
      |  CAST(floor((e.x - m.mn) / m.sc + 0.5) AS INTEGER) AS code
      |FROM e JOIN m USING (pos)""".stripMargin
  ) { (s, d) =>
    Preprocess.quantizeInt8(Tables.embeddings(s, d), "vec_id", "embedding")
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("pos", "code")))
  }

  /** Distributed k-means assignments over the embeddings table. No SQL
    * oracle (iterative fixpoint) → quantified gates instead:
    *
    *  - `sse_monotone`: Lloyd's guarantees non-increasing SSE; any
    *    increase in the trajectory means the aggregation buffer or the
    *    update rule is wrong.
    *  - `sse_vs_driver_rel`: the distributed run and the sequential
    *    driver twin share init and update rule; their final-SSE gap is
    *    pure floating-point reassociation and must be ≤1e-9 relative.
    *  - `assign_agreement`: ≥99% of points land in the same cluster in
    *    both runs (ulp-level center drift may flip genuine near-ties,
    *    never more).
    *  - `rows_complete` / `clusters_nonempty`: every input row assigned,
    *    all k clusters populated on this fixture.
    */
  val kmeans: Q = Q.gated("ml_kmeans") { (s, d) =>
    val emb = Tables.embeddings(s, d)
    KMeans.assign(emb, KMeans.train(emb, k = 8, iters = 10))
  } { (s, d, res) =>
    val emb = Tables.embeddings(s, d).cache()
    try {
      val dist = KMeans.train(emb, k = 8, iters = 10)
      val local = KMeans.trainLocal(emb, k = 8, iters = 10)
      val monotone = dist.sse.indices.drop(1)
        .forall(i => dist.sse(i) <= dist.sse(i - 1) * (1 + 1e-12) + 1e-9)
      val rel = math.abs(dist.sse.last - local.sse.last) /
        math.max(local.sse.last, 1e-300)
      val n = emb.count()
      val localAssign = KMeans.assign(emb, local)
        .select(col("vec_id"), col("cluster").as("cluster_l"))
      val agree = res.join(localAssign, "vec_id")
        .where(col("cluster") === col("cluster_l")).count().toDouble /
        math.max(n, 1L)
      val nClusters = res.select(countDistinct(col("cluster"))).head.getLong(0)
      Seq(
        Gate("sse_monotone", if (monotone) 1.0 else 0.0, monotone),
        Gate("sse_vs_driver_rel", rel, rel <= 1e-9),
        Gate("assign_agreement", agree, agree >= 0.99),
        Gate("rows_complete", res.count().toDouble, res.count() == n),
        Gate("clusters_nonempty", nClusters.toDouble, nClusters == 8))
    } finally emb.unpersist(blocking = false)
  }

  def all: Seq[Q] = Seq(standardize, pca, kmeans, quantizeInt8)
}
