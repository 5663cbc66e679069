package graft.tsne

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-quality metric: trustworthiness (Venna & Kaski 2001, as used
  * for t-SNE evaluation in van der Maaten & Hinton 2008 §5):
  *
  *   T(k) = 1 − 2/(n·k·(2n−3k−1)) · Σ_i Σ_{j ∈ U_i^k} (r(i,j) − k)
  *
  * where U_i^k = points in the embedded k-NN of i but not in the original
  * k-NN, and r(i,j) is j's rank in the original space. 1.0 = perfect
  * neighborhood preservation; ~0.5 = random.
  *
  * Computed with the engine's own kNN operator on both spaces — a join of
  * two kNN relations, no driver-side O(n²) state.
  */
object Trustworthiness {

  def compute(
      original: DataFrame, origId: String, origFeatures: String,
      embedded: DataFrame, embId: String, embFeatures: String,
      k: Int): Double = {
    val spark = original.sparkSession
    val n = original.count()
    require(n == embedded.count(), "point sets must match")
    require(k > 0 && 2 * n - 3L * k - 1 > 0,
      s"trustworthiness normalizer requires k < (2n-1)/3; got k=$k, n=$n")

    // FULL rank relation in the original space (r(i,j) for an intruder can
    // be anything, so the horizon is n−1). At k≈n there is nothing for a
    // bounded heap to prune — the ranking window is the right physical
    // shape — and the relation feeds two join branches, so cache it.
    val origRanks = KNN.knnWindow(original, origId, origFeatures, (n - 1).toInt)
      .select(col("i"), col("j"), col("rank").as("orig_rank"))
      .cache()
    val embTop = KNN.knn(embedded, embId, embFeatures, k)
      .select(col("i"), col("j"))
    val origTop = origRanks.where(col("orig_rank") <= k)
      .select(col("i"), col("j"))

    // intruders: embedded-top-k minus original-top-k, with original rank
    val penalty = embTop
      .join(origTop.withColumn("in_orig", lit(1)), Seq("i", "j"), "left")
      .where(col("in_orig").isNull)
      .join(origRanks, Seq("i", "j"))
      .agg(coalesce(sum(col("orig_rank") - k), lit(0L)))
      .collect()(0).getLong(0)
    origRanks.unpersist()

    1.0 - 2.0 * penalty / (n.toDouble * k * (2 * n - 3 * k - 1))
  }
}
