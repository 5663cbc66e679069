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

  /** PCA to k dims via ml.feature.PCA (reference M-1/M-2:
    * computePrincipalComponents + multiply). Input/output stay
    * ARRAY<DOUBLE> — the vector conversion is internal. */
  def pca(df: DataFrame, idCol: String, featuresCol: String, k: Int): DataFrame = {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val withVec = df.select(
      col(idCol),
      array_to_vector(col(featuresCol).cast("array<double>")).as("_vec"))
    val model = new PCA().setInputCol("_vec").setOutputCol("_pca").setK(k).fit(withVec)
    model.transform(withVec)
      .select(col(idCol), vector_to_array(col("_pca")).as(featuresCol))
  }
}
