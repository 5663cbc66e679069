package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graft.{ArrayDotProduct, ArraySqDist, ArraySqNorm, GraftBridge, PqAdcSum}

/** Public Column API over the codegen'd vector expressions
  * (org.apache.spark.sql.graft.VectorExpressions). All kernels compute in
  * double; float arrays (the fixtures' ARRAY<FLOAT>) are cast once at the
  * column level, so Catalyst folds the cast into the scan projection
  * rather than per-pair.
  */
object VectorFunctions {

  /** Cast any numeric array column to ARRAY<DOUBLE>. */
  def asDoubleArray(c: Column): Column = c.cast("array<double>")

  /** a · b */
  def arrayDot(a: Column, b: Column): Column =
    GraftBridge.column(ArrayDotProduct(
      GraftBridge.expression(asDoubleArray(a)),
      GraftBridge.expression(asDoubleArray(b))))

  /** ‖a − b‖² (fused single pass) */
  def arraySqDist(a: Column, b: Column): Column =
    GraftBridge.column(ArraySqDist(
      GraftBridge.expression(asDoubleArray(a)),
      GraftBridge.expression(asDoubleArray(b))))

  /** ‖a‖² */
  def arraySqNorm(a: Column): Column =
    GraftBridge.column(ArraySqNorm(GraftBridge.expression(asDoubleArray(a))))

  /** ‖a‖ */
  def arrayNorm(a: Column): Column = sqrt(arraySqNorm(a))

  /** cos(a, b) = a·b / (‖a‖·‖b‖) */
  def arrayCosine(a: Column, b: Column): Column =
    arrayDot(a, b) / (arrayNorm(a) * arrayNorm(b))

  /** PQ asymmetric distance: Σ_j lut[j·ksub + codes_j] over a flattened
    * per-query m×ksub lookup table — m array reads per candidate pair.
    * `codes` is ARRAY<TINYINT> (ksub ≤ 128 by the pqTopK contract). */
  def pqAdcSum(lut: Column, codes: Column): Column =
    GraftBridge.column(PqAdcSum(
      GraftBridge.expression(asDoubleArray(lut)),
      GraftBridge.expression(codes.cast("array<tinyint>"))))
}
