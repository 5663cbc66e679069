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
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, ByteType, DataType, DoubleType}

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
      // ctx.freshName on EVERY local: two instances of this expression in
      // one whole-stage-codegen scope otherwise redeclare the same Java
      // locals, and Janino's CompileException silently drops the whole
      // stage to interpreted mode (same for the siblings below)
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = org.apache.spark.sql.graft.VectorExprs.requireSameLength(
         |  $x.numElements(), $y.numElements(), "array_dot");
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
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
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      s"""
         |int $n = org.apache.spark.sql.graft.VectorExprs.requireSameLength(
         |  $x.numElements(), $y.numElements(), "array_sq_dist");
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $x.getDouble($i) - $y.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
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
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i"); val v = ctx.freshName("v")
      s"""
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $x.getDouble($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}


/** Product-quantization asymmetric distance via a per-query lookup
  * table: Σ_j lut[j·ksub + codes_j], where `lut` is the flattened m×ksub
  * table of ‖query_residual_subⱼ − codebookⱼ[c]‖² distances computed ONCE
  * per (query, probed cell) and `codes` is a candidate's m PQ codes.
  * This is FAISS's ADC formulation (Jégou et al. 2011 §IV-A): the
  * per-candidate cost is m table reads instead of m·(dim/m) multiply-adds
  * — the fix for the r6 `weak` finding where the UDF recomputed subspace
  * distances per pair. ksub is derived per row (lut.length / codes.length)
  * so the expression needs no config plumbed through the plan. */
case class PqAdcSum(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  // codes are TINYINT (PQ codes are index bytes, ksub ≤ 128 by contract)
  // so the shuffled index side really is m BYTES per vector — an int
  // array would quietly quadruple it
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(ByteType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_sum"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = VectorExprs.requireDivides(lut.numElements(), codes.numElements(), prettyName)
    val ksub = lut.numElements() / m
    var s = 0.0
    var j = 0
    while (j < m) {
      s += lut.getDouble(VectorExprs.requireInRange(
        j * ksub + codes.getByte(j), lut.numElements(), prettyName))
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val m = ctx.freshName("m"); val ksub = ctx.freshName("ksub")
      val acc = ctx.freshName("acc"); val j = ctx.freshName("j")
      s"""
         |int $m = org.apache.spark.sql.graft.VectorExprs.requireDivides(
         |  $lut.numElements(), $codes.numElements(), "pq_adc_sum");
         |int $ksub = $lut.numElements() / $m;
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $acc += $lut.getDouble(org.apache.spark.sql.graft.VectorExprs.requireInRange(
         |    $j * $ksub + $codes.getByte($j), $lut.numElements(), "pq_adc_sum"));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
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

  /** Number of PQ subspaces, validated: a LUT whose length is not a
    * multiple of the code count means mismatched codebook config between
    * the index and query sides — wrong distances with no signal. */
  def requireDivides(lutLen: Int, m: Int, fn: String): Int = {
    if (m <= 0 || lutLen % m != 0) {
      throw new IllegalArgumentException(
        s"$fn requires lut length ($lutLen) divisible by code count ($m)")
    }
    m
  }

  /** Bounds-checked LUT index: UnsafeArrayData.getDouble does NOT bounds
    * check, so a corrupt code (≥ ksub) would silently read garbage. */
  def requireInRange(idx: Int, len: Int, fn: String): Int = {
    if (idx < 0 || idx >= len) {
      throw new IllegalArgumentException(
        s"$fn code index $idx out of lut range [0, $len)")
    }
    idx
  }
}

/** Column conversions for expressions hosted outside org.apache.spark.sql. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
