package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Running earliest-(doc_id, p) occurrence with its payload string. */
final class FirstBuffer {
  var set: Boolean = false
  var doc: Long = 0L
  var p: Int = 0
  var payload: UTF8String = null

  def offer(d: Long, pp: Int, s: UTF8String): Unit = {
    if (!set || d < doc || (d == doc && pp < p)) {
      set = true; doc = d; p = pp; payload = s
    }
  }
}

/** Native keep-first aggregate: the group's earliest occurrence by
  * (doc_id, p) lexicographic order, as STRUCT<doc_id, p, payload>.
  *
  * Exists because `min(struct(doc_id, p, payload))` is NOT
  * hash-aggregable — struct is an immutable aggregate-buffer type, so
  * Catalyst plans a SortAggregate whose map-side SORT costs more than
  * the row_number window it was meant to replace (measured 2.3× on the
  * 200k-doc boilerplate-skew probe). This TypedImperativeAggregate
  * plans as ObjectHashAggregate: hash-based partials that collapse each
  * map partition's occurrences of a hot key to ONE buffered row before
  * the shuffle — the skew discipline corpus-wide keep-first dedup needs
  * when one boilerplate paragraph recurs 10⁹ times. */
case class KeepFirst(
    docId: Expression,
    pos: Expression,
    payload: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FirstBuffer] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(docId, pos, payload)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, IntegerType, StringType)

  override def createAggregationBuffer(): FirstBuffer = new FirstBuffer

  override def update(buf: FirstBuffer, input: InternalRow): FirstBuffer = {
    val d = docId.eval(input)
    val pp = pos.eval(input)
    if (d != null && pp != null) {
      val dl = d.asInstanceOf[Long]
      val pi = pp.asInstanceOf[Int]
      if (!buf.set || dl < buf.doc || (dl == buf.doc && pi < buf.p)) {
        // payload evaluated (and cloned) only on acceptance: the input
        // UTF8String may alias reused scan/shuffle memory, and losers —
        // the overwhelming majority under skew — are never touched
        val s = payload.eval(input).asInstanceOf[UTF8String]
        buf.set = true
        buf.doc = dl
        buf.p = pi
        buf.payload = if (s == null) null else s.clone()
      }
    }
    buf
  }

  override def merge(buf: FirstBuffer, other: FirstBuffer): FirstBuffer = {
    if (other.set) buf.offer(other.doc, other.p, other.payload)
    buf
  }

  override def eval(buf: FirstBuffer): Any =
    if (!buf.set) null
    else new GenericInternalRow(Array[Any](buf.doc, buf.p, buf.payload))

  override def serialize(buf: FirstBuffer): Array[Byte] = {
    if (!buf.set) return Array(0.toByte)
    val bytes = if (buf.payload == null) null else buf.payload.getBytes
    val n = if (bytes == null) -1 else bytes.length
    val bb = ByteBuffer.allocate(1 + 8 + 4 + 4 + math.max(n, 0))
    bb.put(1.toByte).putLong(buf.doc).putInt(buf.p).putInt(n)
    if (n > 0) bb.put(bytes)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FirstBuffer = {
    val buf = new FirstBuffer
    val bb = ByteBuffer.wrap(bytes)
    if (bb.get() == 1.toByte) {
      buf.set = true
      buf.doc = bb.getLong
      buf.p = bb.getInt
      val n = bb.getInt
      buf.payload =
        if (n < 0) null
        else {
          val arr = new Array[Byte](n)
          bb.get(arr)
          UTF8String.fromBytes(arr)
        }
    }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("p", IntegerType),
    StructField("payload", StringType)))
  override def nullable: Boolean = true
  override def prettyName: String = "keep_first"

  override def withNewMutableAggBufferOffset(newOffset: Int): KeepFirst =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KeepFirst =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KeepFirst =
    copy(docId = newChildren(0), pos = newChildren(1), payload = newChildren(2))
}

object KeepFirst {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Column form: keep_first(doc_id, p, payload) →
    * STRUCT<doc_id, p, payload> of the group's earliest occurrence. */
  def keepFirst(docId: Column, pos: Column, payload: Column): Column =
    ExpressionUtils.column(
      KeepFirst(ExpressionUtils.expression(docId),
        ExpressionUtils.expression(pos),
        ExpressionUtils.expression(payload)).toAggregateExpression())
}
