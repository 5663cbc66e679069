/** Codegen'd vector primitives for the pairwise-distance hot path.
  *
  * Lives under org.apache.spark.sql because Catalyst's extension points
  * (`AbstractDataType`, `ExpressionUtils`) are private[sql] — the standard
  * hosting arrangement for third-party native expressions.
  *
  * The reference computes ‖u−v‖² per pair through precomputed norms +
  * `MLUtils.fastSquaredDistance` (reference X2PHelper.scala:13-15) because
  * RDD closures can't be vectorized. Here the same kernels are native
  * Catalyst expressions that participate in whole-stage codegen: the
  * generated Java loops directly over unsafe array data with zero boxing
  * and no intermediate arrays — `aggregate(zip_with(...))` would allocate
  * one array per pair, which at n² pairs dominates the runtime.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = VectorExprs.requireSameLength(x.numElements(), y.numElements(), prettyName)
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
         |int n = org.apache.spark.sql.graft.VectorExprs.requireSameLength(
         |  $x.numElements(), $y.numElements(), "array_dot");
         |double acc = 0.0;
         |for (int i = 0; i < n; i++) {
         |  acc += $x.getDouble(i) * $y.getDouble(i);
         |}
         |${ev.value} = acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused ‖u−v‖²: one sequential pass, no cancellation from the norm
  * identity, and bit-identical to a sequential oracle evaluation — which
  * makes kNN ranks deterministic across engines. */
case class ArraySqDist(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_sq_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = VectorExprs.requireSameLength(x.numElements(), y.numElements(), prettyName)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
         |int n = org.apache.spark.sql.graft.VectorExprs.requireSameLength(
         |  $x.numElements(), $y.numElements(), "array_sq_dist");
         |double acc = 0.0;
         |for (int i = 0; i < n; i++) {
         |  double d = $x.getDouble(i) - $y.getDouble(i);
         |  acc += d * d;
         |}
         |${ev.value} = acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ x_i² — the precomputed-norm projection (SURVEY P-4). */
case class ArraySqNorm(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_sq_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |int n = $x.numElements();
         |double acc = 0.0;
         |for (int i = 0; i < n; i++) {
         |  double v = $x.getDouble(i);
         |  acc += v * v;
         |}
         |${ev.value} = acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}


/** Shared runtime helpers for the generated code (must be a public
  * object so Janino-compiled classes can call it). */
object VectorExprs {
  /** Strict dimension check: ragged feature arrays are an upstream data
    * bug — silently truncating to min(length) (the previous behavior)
    * would compute wrong distances with no signal, corrupting every
    * downstream kNN/calibration/embedding. Mirrors MLlib Vectors.sqdist
    * semantics. */
  def requireSameLength(a: Int, b: Int, fn: String): Int = {
    if (a != b) {
      throw new IllegalArgumentException(
        s"$fn requires equal-length arrays, got $a and $b")
    }
    a
  }
}

/** Column conversions for expressions hosted outside org.apache.spark.sql. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
