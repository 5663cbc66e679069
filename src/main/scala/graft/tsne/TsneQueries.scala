package graft.tsne

import graft.{Gate, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** t-SNE pipeline stages exposed on the driver's Verify/Bench surface.
  * kNN and vector norms are DuckDB-checkable; calibration and the
  * iterative embedding are verified by unit invariants + rows-only. */
object TsneQueries {

  /** Exact kNN (k=10) over the embeddings fixture — the reference's
    * candidate-generation + top-k stage (X2P.scala:23-32). */
  val knnEmbeddings: Q = Q(
    "knn_embeddings",
    """WITH pairs AS (
      |  SELECT a.vec_id AS i, b.vec_id AS j,
      |    list_sum(list_transform(list_zip(a.embedding, b.embedding),
      |      s -> (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))
      |         * (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE)))) AS dist2
      |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      |), ranked AS (
      |  SELECT i, j, dist2,
      |    CAST(row_number() OVER (PARTITION BY i ORDER BY dist2, j) AS INTEGER) AS rank
      |  FROM pairs
      |)
      |SELECT i, j, dist2, rank FROM ranked WHERE rank <= 10""".stripMargin
  ) { (s, d) =>
    KNN.knn(Tables.embeddings(s, d), "vec_id", "embedding", 10)
  }

  /** L2 norms of the embedding vectors (SURVEY P-4 norm projection),
    * through the codegen'd ArraySqNorm expression. */
  val embeddingNorms: Q = Q(
    "embedding_norms",
    """SELECT vec_id, sqrt(list_sum(list_transform(embedding,
      |  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
      |FROM embeddings""".stripMargin
  ) { (s, d) =>
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.arrayNorm(col("embedding")).as("norm"))
  }

  /** Embedding-output gate shared by both t-SNE drivers: row count must
    * equal the input point count, every coordinate finite, and the layout
    * non-degenerate (nonzero spread). */
  private def embeddingGate(expectedN: (SparkSession, String) => Long)
      : (SparkSession, String, DataFrame) => Seq[Gate] = { (s, d, res) =>
    val n = expectedN(s, d).toDouble
    val r = res.agg(
      count(lit(1)).as("cnt"),
      avg(when(!isnan(col("x")) && !isnan(col("y")) &&
            abs(col("x")) < Double.MaxValue && abs(col("y")) < Double.MaxValue,
          1.0).otherwise(0.0)).as("ff"),
      stddev_pop(col("x")).as("sd")).head
    val cnt = r.getLong(0).toDouble
    Seq(
      Gate("rows_eq_n", cnt, cnt == n),
      Gate("frac_finite", r.getDouble(1), r.getDouble(1) == 1.0),
      Gate("stddev_x", r.getDouble(2), r.getDouble(2) > 0.0))
  }

  /** X2P calibration invariants as a relation: per row, neighbor count
    * and Σ_j P(j|i) (must be 1 ± tol). β-search is not SQL-expressible →
    * gated check: the calibration contract Σ_j P(j|i) = 1 is asserted
    * per round on the dumped rows. */
  val x2pRowSums: Q = Q.gated("x2p_row_sums") { (s, d) =>
    X2P.x2p(Tables.embeddings(s, d), "vec_id", "embedding", perplexity = 20.0)
      .groupBy(col("i"))
      .agg(count(lit(1)).as("n_neighbors"), sum(col("p")).as("sum_p"))
  } { (_, _, res) =>
    val r = res.agg(
      max(abs(col("sum_p") - 1.0)).as("dev"),
      min(col("n_neighbors")).as("mn")).head
    val dev = r.getDouble(0)
    val mn = r.getLong(1).toDouble
    Seq(
      Gate("max_abs_row_sum_dev", dev, dev <= 1e-6),
      Gate("min_neighbors", mn, mn >= 1))
  }

  /** Symmetrized affinity matrix over the embeddings fixture. Gated on
    * its two defining invariants: P is symmetric and sums to 1. */
  val affinities: Q = Q.gated("tsne_affinities") { (s, d) =>
    val pts = Tables.embeddings(s, d)
    val n = pts.count()
    Affinities.symmetrize(
      X2P.x2p(pts, "vec_id", "embedding", perplexity = 20.0), n)
  } { (_, _, res) =>
    val total = res.agg(sum(col("p"))).head.getDouble(0)
    val totalDev = math.abs(total - 1.0)
    val asym = res.as("a")
      .join(res.as("b"),
        col("a.i") === col("b.j") && col("a.j") === col("b.i"), "left")
      .agg(max(abs(col("a.p") - coalesce(col("b.p"), lit(0.0)))))
      .head.getDouble(0)
    Seq(
      Gate("abs_total_p_dev", totalDev, totalDev <= 1e-6),
      Gate("max_asymmetry", asym, asym <= 1e-12))
  }

  /** Pinned seed-42 KL goldens on the 500-point embeddings fixture
    * (sf0.01; vec_id < 500 at larger SFs). Deterministic because n=500
    * keeps the whole iteration on one adjacency partition (iterParts =
    * n/256 → 1), so the float accumulation order is fixed — verified by
    * back-to-back runs agreeing to the last bit before pinning. The
    * 30-iter value is the exaggerated-phase objective of the
    * tsne_bh_embedding query config; the 100-iter value is the
    * BASELINE.md protocol (default params) truncated at iteration 100. */
  private val BhGolden30IterKl = 3.044172153633447
  private val BhGolden100IterKl = 16.65822314902931

  /** The exact goldens are pinned to the sf0.01 fixture's vectors. A
    * `vec_id < 500` subset of a LARGER fixture has the same row count but
    * different vectors (each SF is an independent sample), so n==500 alone
    * must not arm an exact-match gate — Verify runs at sf0.01, and a run
    * at any other SF falls back to the SF-independent invariant gates. */
  private def isGoldenFixture(d: String): Boolean =
    d.stripSuffix("/").endsWith("sf0.01")

  /** Barnes-Hut t-SNE, 30 iterations — the flagship iterative pipeline.
    * Stochastic-free under fixed seed but not SQL-expressible → gated on
    * the embedding-output invariants PLUS the final KL vs its pinned
    * golden (the driver loop is eager, so the iteration-30 loss is known
    * before the result frame exists and rides along as a column — the
    * gate then checks the DUMPED value, no re-run). */
  val bhEmbedding: Q = Q.gated("tsne_bh_embedding") { (s, d) =>
    var kl = Double.NaN
    val out = BHTSNE.tsne(Tables.embeddings(s, d), "vec_id", "embedding",
      TSNEParams(maxIterations = 30, perplexity = 20, earlyExaggeration = 15,
        reportLoss = 30, seed = 42),
      callback = (_, _, l) => l.foreach(kl = _))
    out.withColumn("kl", lit(kl))
  } { (s, d, res) =>
    val base = embeddingGate((s2, d2) => Tables.embeddings(s2, d2).count())(s, d, res)
    val r = res.agg(count(lit(1)).as("n"), first(col("kl")).as("kl")).head
    // golden pinned to the sf0.01 fixture; other SFs keep the shape gates
    if (r.getLong(0) == 500 && isGoldenFixture(d)) {
      val dev = math.abs(r.getDouble(1) - BhGolden30IterKl)
      base :+ Gate("kl_vs_golden_dev", dev, dev <= 1e-6)
    } else base
  }

  /** The repo's strongest numeric invariant as a machine-checked query:
    * the BASELINE.md seed-42 protocol (default params) on the fixed
    * 500-point subset, truncated at 100 iterations, must reproduce its
    * pinned KL exactly. One row out: (n, iterations, final_kl). */
  val klGolden: Q = Q.gated("tsne_kl_golden") { (s, d) =>
    import s.implicits._
    var kl = Double.NaN
    val emb = BHTSNE.tsne(
      Tables.embeddings(s, d).where(col("vec_id") < 500), "vec_id", "embedding",
      // reportLoss pinned explicitly: the gate reads the LAST callback
      // loss, which equals the iteration-100 loss only when 100 is a
      // multiple of the cadence — do not inherit the shared default
      TSNEParams(maxIterations = 100, reportLoss = 10, seed = 42),
      callback = (_, _, l) => l.foreach(kl = _))
    Seq((emb.count(), 100, kl)).toDF("n", "iterations", "final_kl")
  } { (_, d, res) =>
    val r = res.head
    val n = r.getLong(0).toDouble
    val kl = r.getDouble(2)
    if (isGoldenFixture(d)) {
      val dev = math.abs(kl - BhGolden100IterKl)
      Seq(
        Gate("n_points", n, n == 500),
        Gate("kl_vs_golden_dev", dev, dev <= 1e-9))
    } else
      Seq(Gate("kl_finite", kl, java.lang.Double.isFinite(kl)))
  }

  /** Exact-gradient driver (SimpleTSNE), 15 iterations on a fixed
    * 500-point subset — O(n²)/iteration by reference semantics, so fewer
    * iterations than the BH query. The subset is `vec_id < 500` (a
    * deterministic pushed-down filter — an unordered `limit` would pick a
    * partition-layout-dependent subset at sf0.1 where the table has 2000
    * rows, breaking fixed-seed reproducibility). Rows-only check;
    * numerics are gated by GradientSpec (finite differences) and
    * TSNESpec (loss decrease, determinism). */
  val simpleEmbedding: Q = Q.gated("tsne_simple_embedding") { (s, d) =>
    SimpleTSNE.tsne(
      Tables.embeddings(s, d).where(col("vec_id") < 500), "vec_id", "embedding",
      TSNEParams(maxIterations = 15, perplexity = 20, earlyExaggeration = 8, seed = 42))
  } (embeddingGate((s, d) => Tables.embeddings(s, d).where(col("vec_id") < 500).count()))

  /** Working LBFGS driver (reference's is broken upstream; see
    * LBFGSTSNE scaladoc) on the same fixed 500-point subset as the
    * exact-gradient query — each L-BFGS evaluation is O(n²). */
  val lbfgsEmbedding: Q = Q.gated("tsne_lbfgs_embedding") { (s, d) =>
    LBFGSTSNE.tsne(
      Tables.embeddings(s, d).where(col("vec_id") < 500), "vec_id", "embedding",
      TSNEParams(maxIterations = 15, perplexity = 20, earlyExaggeration = 5, seed = 42))
  } (embeddingGate((s, d) => Tables.embeddings(s, d).where(col("vec_id") < 500).count()))

  /** Pinned seed-42 trustworthiness of the 60-iter BH embedding on the
    * 500-point subset (same determinism argument as the KL goldens; the
    * penalty is an integer sum, so the metric is exact to the last bit). */
  private val TrustGolden60Iter = 0.7158864659051575

  /** End-to-end embedding QUALITY gate (complements the KL gates, which
    * check the optimizer's objective, not neighborhood preservation):
    * trustworthiness (Venna & Kaski 2001) of a finished short BH run
    * (60 iterations, exaggeration off at 20 — probed equal-quality to a
    * 100-iter run at 60% of the per-round cost; trust plateaus ~0.71 on
    * this fixture) vs the original space at k=12, on the fixed 500-point
    * subset. Gated on a floor of 0.65 — a real quality claim against the
    * ~0.71 plateau, not slack — AND exact match to the pinned golden.
    * One row out: (n, k, trustworthiness). */
  val trustworthiness: Q = Q.gated("tsne_trustworthiness") { (s, d) =>
    import s.implicits._
    val pts = Tables.embeddings(s, d).where(col("vec_id") < 500).cache()
    val n = pts.count()
    val emb = BHTSNE.tsne(pts, "vec_id", "embedding",
      TSNEParams(maxIterations = 60, perplexity = 20, earlyExaggeration = 20,
        reportLoss = 0, seed = 42))
    val embArr = emb.select(col("id"), array(col("x"), col("y")).as("f"))
    val t = Trustworthiness.compute(pts, "vec_id", "embedding", embArr, "id", "f", k = 12)
    pts.unpersist()
    Seq((n, 12, t)).toDF("n", "k", "trustworthiness")
  } { (_, d, res) =>
    val r = res.head
    val n = r.getLong(0)
    val t = r.getDouble(2)
    // the floor holds at every SF (measured 0.688 on sf0.1's different
    // 500-vector sample); the exact golden only on its pinned fixture
    val floor = Gate("trust_floor", t, t > 0.65)
    if (n == 500 && isGoldenFixture(d)) {
      val dev = math.abs(t - TrustGolden60Iter)
      Seq(floor, Gate("trust_vs_golden_dev", dev, dev <= 1e-9))
    } else Seq(floor)
  }

  def all: Seq[Q] = Seq(
    knnEmbeddings, embeddingNorms, x2pRowSums, affinities, bhEmbedding,
    simpleEmbedding, lbfgsEmbedding, klGolden, trustworthiness)
}
