package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k buffer: parallel arrays sorted ascending by (dist, j),
  * duplicate-j entries keep the better one. All-primitive — no boxing on
  * the n² candidate path. */
final class TopKBuffer(val k: Int) {
  var n: Int = 0
  val js: Array[Long] = new Array[Long](k)
  val ds: Array[Double] = new Array[Double](k)

  @inline private def lt(d1: Double, j1: Long, d2: Double, j2: Long): Boolean =
    d1 < d2 || (d1 == d2 && j1 < j2)

  def insert(j: Long, d: Double): Unit = {
    if (n == k && !lt(d, j, ds(n - 1), js(n - 1))) return
    // duplicate-j: keep the better entry (same pair via several LSH tables)
    var dup = -1
    var i = 0
    while (i < n && dup < 0) { if (js(i) == j) dup = i; i += 1 }
    if (dup >= 0) {
      if (!lt(d, j, ds(dup), js(dup))) return
      // remove the worse duplicate, then fall through to insertion
      System.arraycopy(js, dup + 1, js, dup, n - dup - 1)
      System.arraycopy(ds, dup + 1, ds, dup, n - dup - 1)
      n -= 1
    }
    // binary search for insertion point
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lt(ds(mid), js(mid), d, j)) lo = mid + 1 else hi = mid
    }
    val pos = lo
    val last = math.min(n, k - 1)
    System.arraycopy(js, pos, js, pos + 1, last - pos)
    System.arraycopy(ds, pos, ds, pos + 1, last - pos)
    js(pos) = j
    ds(pos) = d
    if (n < k) n += 1
  }
}

/** Native top-k-per-key aggregate (the engine's hottest operator: kNN,
  * X2P, affinity construction, ANN all run through it).
  *
  * vs the `udaf(Aggregator)` wrapper: input rows are read directly from
  * `InternalRow` (no encoder round-trip per candidate), the buffer is two
  * primitive arrays (no Seq/case-class churn), and serialization — only
  * at the map/reduce shuffle boundary — is a flat ByteBuffer. Spark plans
  * it as ObjectHashAggregate with a partial phase, so each map task emits
  * ≤ k entries per key: the shuffle after an n² candidate join carries
  * O(n·k), the same bound as the reference's bounded-PQ `topByKey`
  * (MLPairRDDFunctions).
  */
case class TopKNeighbors(
    k: Int,
    left: Expression,   // j: LONG
    right: Expression,  // dist: DOUBLE
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with BinaryLike[Expression] with ImplicitCastInputTypes {

  // declared input types give clean analysis-time errors (and implicit
  // numeric widening) instead of runtime ClassCastExceptions
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, DoubleType)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val j = left.eval(input)
    val d = right.eval(input)
    if (j != null && d != null) {
      buf.insert(j.asInstanceOf[Long], d.asInstanceOf[Double])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.n) { buf.insert(other.js(i), other.ds(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = InternalRow(buf.js(i), buf.ds(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.js(i)); bb.putDouble(buf.ds(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("j", LongType), StructField("dist2", DoubleType))))
  override def nullable: Boolean = false
  override def prettyName: String = "topk_neighbors"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKNeighbors =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKNeighbors =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKNeighbors =
    copy(left = newLeft, right = newRight)
}

object TopKNeighbors {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Column form: topk(k, j, dist) → ARRAY<STRUCT<j, dist2>> sorted
    * ascending by (dist2, j). */
  def topk(k: Int, j: Column, dist: Column): Column =
    ExpressionUtils.column(
      TopKNeighbors(k, ExpressionUtils.expression(j), ExpressionUtils.expression(dist))
        .toAggregateExpression())
}
