package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{ArrayDotProduct, ArraySqDist, ArraySqNorm, BoundedIdList, KeepFirst, PqAdcSum, TopKNeighbors}

/** Session extension registering the engine's native expressions for SQL
  * use — `SELECT array_dot(a, b)` etc. — via
  * `spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * This is extension path (b) from the design guide (custom Expression,
  * codegen'd); no custom Rule/Strategy is required for parity (SURVEY
  * §4.2) — the DataFrame operators compose built-in Catalyst nodes that
  * the optimizer already handles.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  private def arity(name: String, n: Int)(args: Seq[Expression]): Seq[Expression] = {
    if (args.length != n) {
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${args.length}")
    }
    args
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      info("array_dot", "array_dot(a, b) - dot product of two numeric arrays"),
      (args: Seq[Expression]) => { val a = arity("array_dot", 2)(args); ArrayDotProduct(a(0), a(1)) }))
    ext.injectFunction((
      FunctionIdentifier("array_sq_dist"),
      info("array_sq_dist", "array_sq_dist(a, b) - squared L2 distance"),
      (args: Seq[Expression]) => { val a = arity("array_sq_dist", 2)(args); ArraySqDist(a(0), a(1)) }))
    ext.injectFunction((
      FunctionIdentifier("array_sq_norm"),
      info("array_sq_norm", "array_sq_norm(a) - squared L2 norm"),
      (args: Seq[Expression]) => { val a = arity("array_sq_norm", 1)(args); ArraySqNorm(a(0)) }))
    ext.injectFunction((
      FunctionIdentifier("pq_adc_sum"),
      info("pq_adc_sum",
        "pq_adc_sum(lut, codes) - PQ asymmetric distance: sum of lut[j*ksub + codes[j]]"),
      (args: Seq[Expression]) => { val a = arity("pq_adc_sum", 2)(args); PqAdcSum(a(0), a(1)) }))
    // native aggregates: the first argument must be a literal bound
    ext.injectFunction((
      FunctionIdentifier("topk_neighbors"),
      info("topk_neighbors",
        "topk_neighbors(k, j, dist) - bounded top-k per group, ascending (dist, j)"),
      (args: Seq[Expression]) => {
        val a = arity("topk_neighbors", 3)(args)
        TopKNeighbors(litInt("topk_neighbors", a.head), a(1), a(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("keep_first"),
      info("keep_first",
        "keep_first(doc_id, p, payload) - group's earliest (doc_id, p) occurrence as a struct"),
      (args: Seq[Expression]) => {
        val a = arity("keep_first", 3)(args)
        KeepFirst(a(0), a(1), a(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("bounded_id_list"),
      info("bounded_id_list",
        "bounded_id_list(cap, id) - group's ids as ARRAY<BIGINT>, NULL past cap"),
      (args: Seq[Expression]) => {
        val a = arity("bounded_id_list", 2)(args)
        BoundedIdList(litInt("bounded_id_list", a.head), a(1))
      }))
  }

  private def litInt(name: String, e: Expression): Int = {
    require(e.foldable, s"$name: the bound argument must be a literal")
    e.eval() match {
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long if l >= Int.MinValue && l <= Int.MaxValue => l.intValue()
      case s: java.lang.Short => s.intValue()
      case b: java.lang.Byte => b.intValue()
      case other => throw new IllegalArgumentException(
        s"$name: the bound must be an integer literal, got $other")
    }
  }
}
