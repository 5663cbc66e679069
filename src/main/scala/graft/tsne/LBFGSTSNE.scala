package graft.tsne

import org.apache.spark.sql.DataFrame

/** API stub for the reference's LBFGS-optimized variant
  * (impl/LBFGSTSNE.scala), which its own author marks "doesn't work at
  * all (yet or ever)" (LBFGSTSNE.scala:15) and which SURVEY §4.3.4 shows
  * lacks the probability clamp and exaggeration symmetry of the working
  * drivers. We deliberately ship the API surface without porting a known-
  * broken optimizer (SURVEY §7.4.7); calling it directs users to
  * [[SimpleTSNE]]/[[BHTSNE]].
  */
object LBFGSTSNE {
  def tsne(
      points: DataFrame,
      idCol: String = "id",
      featuresCol: String = "features",
      params: TSNEParams = TSNEParams()): DataFrame =
    throw new UnsupportedOperationException(
      "LBFGSTSNE is non-functional in the reference implementation " +
        "(LBFGSTSNE.scala:15 \"doesn't work at all\"); use SimpleTSNE or BHTSNE. " +
        "The API stub exists for surface parity only.")
}
