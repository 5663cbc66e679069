package graft.tsne

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Symmetrized affinity matrix — the reference's `TSNEHelper.computeP`
  * (TSNEHelper.scala:10-19) as a declarative pipeline:
  *
  *   p_ij = max( (P(j|i) + P(i|j)) / 2n , 1e-12 )
  *
  * expressed as union-with-transpose + groupBy-sum (map-side partial
  * aggregation absorbs the 2× row blowup before the shuffle), then an
  * adjacency-list rollup for the gradient stage. The reference's
  * `reduceByKey`/`groupByKey` pair becomes two hash aggregations that
  * share one shuffle partitioning on `i` — Catalyst reuses the exchange
  * instead of shuffling twice.
  */
object Affinities {

  val Clamp = 1e-12

  /** COO P(j|i) → symmetric clamped COO p_ij (both (i,j) and (j,i) rows).
    *
    * Mirroring is a single-pass explode of both directions — the
    * reference's `flatMap(e => Seq((i,j,v),(j,i,v)))` shape — NOT a
    * `union` with a transposed projection: union branches each re-execute
    * the upstream plan, which here is the full kNN+calibration pipeline
    * (measured 2× cost before this change). */
  def symmetrize(pji: DataFrame, n: Long): DataFrame =
    pji
      .select(explode(array(
        struct(col("i"), col("j")),
        struct(col("j").as("i"), col("i").as("j")))).as("e"), col("p"))
      .select(col("e.i").as("i"), col("e.j").as("j"), col("p"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("p")).as("psum"))
      .select(
        col("i"), col("j"),
        greatest(col("psum") / lit(2.0 * n), lit(Clamp)).as("p"))

  /** Symmetric COO → adjacency rows (i, js ARRAY<BIGINT>, ps ARRAY<DOUBLE>),
    * neighbor lists sorted by j for deterministic iteration order. */
  def adjacency(sym: DataFrame): DataFrame =
    sym
      .groupBy(col("i"))
      .agg(array_sort(collect_list(struct(col("j"), col("p")))).as("nbrs"))
      .select(
        col("i"),
        col("nbrs.j").as("js"),
        col("nbrs.p").as("ps"))

  /** points → calibrated, symmetrized adjacency (the gradient input).
    * `approxBucketLength` switches candidate generation to euclidean LSH
    * (the 100 TB path; exact O(n²) pairs otherwise — the reference
    * semantics and oracle). */
  def computeP(
      points: DataFrame,
      n: Long,
      idCol: String = "id",
      featuresCol: String = "features",
      perplexity: Double = X2P.DefaultPerplexity,
      tol: Double = X2P.DefaultTol,
      approxBucketLength: Option[Double] = None): DataFrame =
    adjacency(symmetrize(
      X2P.x2p(points, idCol, featuresCol, perplexity, tol, approxBucketLength), n))
}
