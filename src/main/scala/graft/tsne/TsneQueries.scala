package graft.tsne

import graft.{Q, Tables}
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

  /** X2P calibration invariants as a relation: per row, neighbor count
    * and Σ_j P(j|i) (must be 1 ± tol). β-search is not SQL-expressible →
    * rows-only check; numeric invariants live in X2PSpec. */
  val x2pRowSums: Q = Q.noOracle("x2p_row_sums") { (s, d) =>
    X2P.x2p(Tables.embeddings(s, d), "vec_id", "embedding", perplexity = 20.0)
      .groupBy(col("i"))
      .agg(count(lit(1)).as("n_neighbors"), sum(col("p")).as("sum_p"))
  }

  /** Symmetrized affinity matrix over the embeddings fixture. */
  val affinities: Q = Q.noOracle("tsne_affinities") { (s, d) =>
    val pts = Tables.embeddings(s, d)
    val n = pts.count()
    Affinities.symmetrize(
      X2P.x2p(pts, "vec_id", "embedding", perplexity = 20.0), n)
  }

  /** Barnes-Hut t-SNE, 30 iterations — the flagship iterative pipeline.
    * Rows-only check (stochastic-free under fixed seed but not
    * SQL-expressible). */
  val bhEmbedding: Q = Q.noOracle("tsne_bh_embedding") { (s, d) =>
    BHTSNE.tsne(Tables.embeddings(s, d), "vec_id", "embedding",
      TSNEParams(maxIterations = 30, perplexity = 20, earlyExaggeration = 15,
        reportLoss = 0, seed = 42))
  }

  /** Exact-gradient driver (SimpleTSNE), 15 iterations on a fixed
    * 500-point subset — O(n²)/iteration by reference semantics, so fewer
    * iterations than the BH query. The subset is `vec_id < 500` (a
    * deterministic pushed-down filter — an unordered `limit` would pick a
    * partition-layout-dependent subset at sf0.1 where the table has 2000
    * rows, breaking fixed-seed reproducibility). Rows-only check;
    * numerics are gated by GradientSpec (finite differences) and
    * TSNESpec (loss decrease, determinism). */
  val simpleEmbedding: Q = Q.noOracle("tsne_simple_embedding") { (s, d) =>
    SimpleTSNE.tsne(
      Tables.embeddings(s, d).where(col("vec_id") < 500), "vec_id", "embedding",
      TSNEParams(maxIterations = 15, perplexity = 20, earlyExaggeration = 8, seed = 42))
  }

  def all: Seq[Q] = Seq(
    knnEmbeddings, embeddingNorms, x2pRowSums, affinities, bhEmbedding, simpleEmbedding)
}
