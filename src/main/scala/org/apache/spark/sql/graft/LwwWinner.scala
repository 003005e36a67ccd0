package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Mutable last-writer-wins register buffer (one per group). */
final class LwwBuffer(
    var set: Boolean,
    var updatedAt: Int,
    var prio: Int,
    var position: Long,
    var count: Int,
    var state: Int
)

/** LWW winner aggregate: per group, the (position, updatedAt, count, state) of the row
  * with maximal (updatedAt, statePriority, position) — FlockDB's conflict-resolution
  * order (`Edge.scala:61-68`; priority Normal(0) < Negative(1) < Archived(2) <
  * Removed(3), `State.scala:19-36`).
  *
  * Exists for the physical plan, not the semantics: the equivalent built-in
  * `max_by(struct(payload), struct(ordering))` carries a struct aggregation buffer,
  * which HashAggregateExec cannot hold in its UnsafeRow map — Spark silently plans a
  * SortAggregate and SORTS EVERY PARTITION of the write log by the edge key. As a
  * TypedImperativeAggregate this runs in ObjectHashAggregateExec: hash-based, map-side
  * combinable, no per-partition sort — the shape a 100 TB log fold needs. (Same trick
  * as Spark's own collect_list/percentile aggregates.)
  */
case class LwwWinner(
    position: Expression,
    updatedAt: Expression,
    count: Expression,
    state: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[LwwBuffer] {

  override def children: Seq[Expression] = Seq(position, updatedAt, count, state)
  override def nullable: Boolean = true
  override def dataType: DataType = LwwWinner.resultType
  override def prettyName: String = "graft_lww_winner"

  private def priorityOf(state: Int): Int = state match {
    case 0 => 0 // Normal
    case 3 => 1 // Negative
    case 2 => 2 // Archived
    case _ => 3 // Removed
  }

  override def createAggregationBuffer(): LwwBuffer =
    new LwwBuffer(false, 0, 0, 0L, 0, 0)

  private def fold(b: LwwBuffer, upd: Int, prio: Int, pos: Long, cnt: Int, st: Int): Unit = {
    val wins = !b.set ||
      upd > b.updatedAt ||
      (upd == b.updatedAt && (prio > b.prio || (prio == b.prio && pos > b.position)))
    if (wins) {
      b.set = true; b.updatedAt = upd; b.prio = prio; b.position = pos; b.count = cnt; b.state = st
    }
  }

  override def update(b: LwwBuffer, input: InternalRow): LwwBuffer = {
    val pos = position.eval(input)
    val upd = updatedAt.eval(input)
    if (pos != null && upd != null) {
      val st = state.eval(input).asInstanceOf[Int]
      fold(b, upd.asInstanceOf[Int], priorityOf(st), pos.asInstanceOf[Long],
        count.eval(input).asInstanceOf[Int], st)
    }
    b
  }

  override def merge(b: LwwBuffer, o: LwwBuffer): LwwBuffer = {
    if (o.set) fold(b, o.updatedAt, o.prio, o.position, o.count, o.state)
    b
  }

  override def eval(b: LwwBuffer): Any =
    if (!b.set) null
    else new GenericInternalRow(Array[Any](b.position, b.updatedAt, b.count, b.state))

  override def serialize(b: LwwBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(25)
    bb.put(if (b.set) 1.toByte else 0.toByte)
    bb.putInt(b.updatedAt).putInt(b.prio).putLong(b.position).putInt(b.count).putInt(b.state)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LwwBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val set = bb.get() == 1
    new LwwBuffer(set, bb.getInt, bb.getInt, bb.getLong, bb.getInt, bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LwwWinner =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LwwWinner =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): LwwWinner =
    copy(position = newChildren(0), updatedAt = newChildren(1),
      count = newChildren(2), state = newChildren(3))
}

object LwwWinner {

  val resultType: StructType = new StructType()
    .add("position", LongType)
    .add("updated_at", IntegerType)
    .add("count", IntegerType)
    .add("state", IntegerType)

  /** Aggregate Column: winner struct (position, updated_at, count, state). */
  def column(position: Column, updatedAt: Column, count: Column, state: Column): Column =
    ExpressionUtils.column(
      LwwWinner(
        ExpressionUtils.expression(position),
        ExpressionUtils.expression(updatedAt),
        ExpressionUtils.expression(count),
        ExpressionUtils.expression(state)
      ).toAggregateExpression())
}
