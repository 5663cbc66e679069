package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Grow-to-cap long buffer with an overflow latch: once more than `cap`
  * elements arrive the buffer stops storing and only remembers that it
  * overflowed. This is what makes posting-list construction safe at
  * scale — a boilerplate-hot key costs O(cap) state instead of
  * collecting an unbounded list before a size filter can drop it. */
final class BoundedListBuffer(val cap: Int) {
  var n: Int = 0
  var overflow: Boolean = false
  var ids: Array[Long] = new Array[Long](math.min(math.max(cap, 1), 16))

  def add(id: Long): Unit = {
    if (overflow) return
    if (n == cap) { overflow = true; return }
    if (n == ids.length) {
      ids = java.util.Arrays.copyOf(ids, math.min(cap, math.max(ids.length * 2, 1)))
    }
    ids(n) = id
    n += 1
  }

  def mergeFrom(o: BoundedListBuffer): Unit = {
    if (o.overflow) { overflow = true; n = 0; return }
    var i = 0
    while (i < o.n && !overflow) { add(o.ids(i)); i += 1 }
    if (overflow) n = 0
  }
}

/** Native bounded collect-list for LONG keys: ARRAY<BIGINT> of the
  * group's values, or NULL if the group exceeds `cap` (the stop-key
  * cut). Partial aggregation bounds both memory and shuffle at cap per
  * (key × map task) — the building block for inverted-index/posting-list
  * operators where a `collect_list` + size-filter would materialize hot
  * keys in full before dropping them. */
case class BoundedIdList(
    cap: Int,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedListBuffer]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)

  override def createAggregationBuffer(): BoundedListBuffer = new BoundedListBuffer(cap)

  override def update(buf: BoundedListBuffer, input: InternalRow): BoundedListBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedListBuffer, other: BoundedListBuffer): BoundedListBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: BoundedListBuffer): Any =
    if (buf.overflow) null
    else ArrayData.toArrayData(java.util.Arrays.copyOf(buf.ids, buf.n))

  override def serialize(buf: BoundedListBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(5 + buf.n * 8)
    bb.put(if (buf.overflow) 1.toByte else 0.toByte)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedListBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new BoundedListBuffer(cap)
    buf.overflow = bb.get() == 1
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = true
  override def prettyName: String = "bounded_id_list"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedIdList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedIdList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedIdList =
    copy(child = newChild)
}

object BoundedIdList {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Column form: bounded_id_list(cap, id) → ARRAY<BIGINT> or NULL on
    * overflow (group size > cap). */
  def boundedList(cap: Int, id: Column): Column =
    ExpressionUtils.column(
      BoundedIdList(cap, ExpressionUtils.expression(id)).toAggregateExpression())
}
