package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature preprocessing (reference MNIST.scala:40-48): per-dimension
  * standardization and PCA, DataFrame-native. */
object Preprocess {

  /** Per-dimension z-score using POPULATION stddev (matching the
    * reference's RDD `stdev()` — documented choice, SURVEY §7.4.5).
    * Two distributed passes: (1) posexplode → per-dim moments (partial
    * agg, one shuffle of D rows), (2) stats collected (D doubles) and
    * applied as literal arrays inside a zip_with projection — no second
    * shuffle, codegen-friendly, scales as O(rows·D). Constant dims
    * (σ=0) pass through as 0. */
  def standardize(df: DataFrame, idCol: String, featuresCol: String): DataFrame = {
    val stats = df
      .select(posexplode(col(featuresCol).cast("array<double>")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(avg(col("x")).as("mu"), stddev_pop(col("x")).as("sd"))
      .orderBy("pos")
      .collect()
    val mus = stats.map(_.getDouble(1))
    val sds = stats.map(r => { val s = r.getDouble(2); if (s == 0.0) 1.0 else s })
    df.select(
      col(idCol),
      zip_with(
        col(featuresCol).cast("array<double>"),
        typedLit(mus.indices.map(i => (mus(i), sds(i)))),
        (x, ms) => (x - ms.getField("_1")) / ms.getField("_2")).as(featuresCol))
  }

  /** Per-dimension affine int8 quantization — the embedding STORAGE
    * lever at corpus scale (a 10⁹×1024-float table is 4 TB as float32,
    * 1 TB as int8 codes + 2·D floats of dequant metadata). Same
    * two-pass shape as [[standardize]]:
    *
    *  1. one distributed pass for per-dimension (min, max) — partial
    *     min/max combine map-side, D-row shuffle;
    *  2. codes as a pure zip_with projection against the literal
    *     (min, scale) table — shuffle-free, codegen-friendly.
    *
    * code = floor((x − min_d)/scale_d + 0.5) ∈ [0, 255], with
    * scale_d = (max_d − min_d)/255 and a constant dimension (max = min)
    * pinned to scale 1 (all codes 0). floor(u + 0.5) instead of
    * round(): identical arithmetic on every engine — SQL ROUND
    * semantics differ across half-even/half-away implementations, and
    * the DuckDB oracle must reproduce codes BIT-exactly. Max error by
    * construction: scale/2 per coordinate. */
  def quantizeInt8(df: DataFrame, idCol: String, featuresCol: String): DataFrame = {
    val stats = df
      .select(posexplode(col(featuresCol).cast("array<double>")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy("pos")
      .collect()
    val mins = stats.map(_.getDouble(1))
    val scales = stats.map { r =>
      val s = (r.getDouble(2) - r.getDouble(1)) / 255.0
      if (s == 0.0) 1.0 else s
    }
    df.select(
      col(idCol),
      zip_with(
        col(featuresCol).cast("array<double>"),
        typedLit(mins.indices.map(i => (mins(i), scales(i)))),
        (x, ms) => floor((x - ms.getField("_1")) / ms.getField("_2") + lit(0.5))
          .cast("int")).as("codes"))
  }

  /** PCA to k dims (reference M-1/M-2: computePrincipalComponents +
    * multiply), implemented directly rather than through ml.feature.PCA:
    *
    *  - fit = ONE distributed pass accumulating (n, Σx, Σxxᵀ) into a
    *    D + D² buffer (the same matrix-buffer treeAggregate shape as the
    *    t-SNE gradient, A-4) — covariance and eigendecomposition are
    *    D×D driver work (D = feature dim, small by definition here);
    *  - transform = a declarative projection through the codegen'd
    *    array_dot expression against literal component vectors — no
    *    vector-UDT conversions, no MLlib model object.
    *
    * Matches MLlib semantics: covariance with n−1 normalization,
    * uncentered projection, components ordered by descending eigenvalue;
    * eigenvector signs are fixed (largest-|entry| positive) so reruns are
    * bit-identical. Measured ~4× faster than the MLlib path at fixture
    * scale (the fit overhead dominated). */
  def pca(df: DataFrame, idCol: String, featuresCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(featuresCol).cast("array<double>")).as[Array[Double]]
    val d = vecs.head().length
    require(k <= d, s"k=$k exceeds feature dimension $d")

    val (n, sums, prods) = vecs.rdd.treeAggregate(
      (0L, new Array[Double](d), new Array[Double](d * d)))(
      seqOp = { case ((cnt, s, p), x) =>
        require(x.length == d, s"ragged feature array: ${x.length} != $d")
        var i = 0
        while (i < d) {
          s(i) += x(i)
          var j = 0
          while (j <= i) { p(i * d + j) += x(i) * x(j); j += 1 }
          i += 1
        }
        (cnt + 1, s, p)
      },
      combOp = { case ((c1, s1, p1), (c2, s2, p2)) =>
        var i = 0
        while (i < s1.length) { s1(i) += s2(i); i += 1 }
        i = 0
        while (i < p1.length) { p1(i) += p2(i); i += 1 }
        (c1 + c2, s1, p1)
      })
    require(n > 1, "PCA needs at least 2 rows")

    val cov = breeze.linalg.DenseMatrix.zeros[Double](d, d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j <= i) {
        val c = (prods(i * d + j) - sums(i) * sums(j) / n) / (n - 1)
        cov(i, j) = c
        cov(j, i) = c
        j += 1
      }
      i += 1
    }
    val es = breeze.linalg.eigSym(cov) // eigenvalues ascending
    val order = (0 until d).sortBy(idx => -es.eigenvalues(idx)).take(k)
    val w: Seq[Seq[Double]] = order.map { idx =>
      val v = Array.tabulate(d)(r => es.eigenvectors(r, idx))
      // deterministic sign: the largest-|entry| coordinate is positive
      val m = v.indices.maxBy(r => math.abs(v(r)))
      if (v(m) < 0) v.map(-_).toSeq else v.toSeq
    }

    val proj = array(w.map { comp =>
      graft.functions.VectorFunctions.arrayDot(
        col(featuresCol).cast("array<double>"), typedLit(comp))
    }: _*)
    df.select(col(idCol), proj.as(featuresCol))
  }
}
