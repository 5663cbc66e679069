package graft.tsne

import graft.functions.VectorFunctions.arraySqDist
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
  * Scale shape: only INTRUDER pairs are ever ranked. Both top-k relations
  * come from the bounded-heap aggregate (O(n·k) rows each); the original
  * rank of an intruder (i, j) is then 1 + |{m ≠ i : (d(i,m), m) <lex
  * (d(i,j), j)}| — a streamed count against the point set, never a
  * materialized (n−1)-rank relation. Total shuffled state is O(n·k);
  * the O(|intruders|·n) distance comparisons stream through a partial
  * (map-side) aggregation. A good embedding has few intruders, so the
  * compute cost also shrinks as quality improves.
  */
object Trustworthiness {

  /** Cap on the explicit point-set broadcast in [[compute]] (bytes of
    * n·dim doubles + per-row overhead); above it the rank join falls
    * back to a distributed cartesian. 512 MB ≈ 1M points × 64 dims. */
  private val MaxBroadcastBytes: Long = 512L << 20

  def compute(
      original: DataFrame, origId: String, origFeatures: String,
      embedded: DataFrame, embId: String, embFeatures: String,
      k: Int): Double = {
    val n = original.count()
    require(n == embedded.count(), "point sets must match")
    require(k > 0 && 2 * n - 3L * k - 1 > 0,
      s"trustworthiness normalizer requires k < (2n-1)/3; got k=$k, n=$n")

    val embTop = KNN.knn(embedded, embId, embFeatures, k)
      .select(col("i"), col("j"))
    val origTop = KNN.knn(original, origId, origFeatures, k)
      .select(col("i"), col("j"))
    val pts = KNN.prepare(original, origId, origFeatures)

    // intruders: embedded-top-k minus original-top-k
    val intruders = embTop
      .join(origTop.withColumn("in_orig", lit(1)), Seq("i", "j"), "left")
      .where(col("in_orig").isNull)
      .select("i", "j")

    // distance bound d2 = d(i,j)² in the ORIGINAL space for each intruder
    val withBound = intruders
      .join(pts.select(col("id").as("i"), col("features").as("vi")), Seq("i"))
      .join(pts.select(col("id").as("j"), col("features").as("vj")), Seq("j"))
      .select(col("i"), col("j"), col("vi"),
        arraySqDist(col("vi"), col("vj")).as("d2"))

    // r(i,j) = 1 + #{m ≠ i : (d(i,m), m) <lex (d(i,j), j)} — the same
    // (dist2, j) tie order the kNN operators use, so ranks agree with a
    // full ranking window without materializing one. The point set is
    // broadcast explicitly WHEN IT FITS: it is the bounded side by
    // construction (the intruder side grows with embedding error), and
    // a derived frame's size estimate is too unreliable to leave the
    // build-side choice to the planner on a plan-critical nested-loop
    // join. The broadcast payload is n·dim doubles — fine at t-SNE
    // scale (n ≤ ~10⁶ visualization points), but guarded: past
    // `MaxBroadcastBytes` (estimated from n and a sampled row's dim)
    // the hint drops and the comparison runs as a distributed
    // cartesian — slower, never an executor-OOM.
    val m = pts.select(col("id").as("m"), col("features").as("vm"))
    // dim probe runs on the PREPARED frame (null features already
    // filtered — the raw frame's limit(1) could hand back a null row)
    // and null-guards anyway; no probe row → 0 → broadcast path, the
    // right default for an effectively empty point set
    val dim = pts.select(col("features")).where(col("features").isNotNull)
      .limit(1).collect()
      .headOption.filterNot(_.isNullAt(0)).map(_.getSeq[Any](0).length).getOrElse(0)
    val estBytes = n * (8L * dim + 24L)
    val mSide = if (estBytes <= MaxBroadcastBytes) broadcast(m) else m
    val dm = arraySqDist(col("vi"), col("vm"))
    val ranks = withBound.crossJoin(mSide)
      .where(col("m") =!= col("i"))
      .groupBy(col("i"), col("j"))
      .agg((sum(
        when(dm < col("d2") || (dm === col("d2") && col("m") < col("j")), 1L)
          .otherwise(0L)) + 1L).as("orig_rank"))

    val penalty = ranks
      .agg(coalesce(sum(col("orig_rank") - k), lit(0L)))
      .collect()(0).getLong(0)

    1.0 - 2.0 * penalty / (n.toDouble * k * (2 * n - 3 * k - 1))
  }
}
