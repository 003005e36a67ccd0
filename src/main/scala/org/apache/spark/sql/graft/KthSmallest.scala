package org.apache.spark.sql.graft

import java.nio.ByteBuffer
import java.util.PriorityQueue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bounded-state k-th-smallest aggregate over (major: Long, minor: Long) pairs, ordered
  * lexicographically. Per group it returns the k-th smallest pair as a struct — or the
  * largest pair seen when the group has fewer than k rows — so
  * `pair <= kth_smallest(pair, k)` is an exact "keep the k smallest" filter.
  *
  * Exists for the physical plan: the `row_number() over (partition by g order by pair)`
  * formulation of per-group top-k puts EVERY row of a group through one task (window
  * partitions are not splittable — a billion-row group serializes). This aggregate keeps
  * a k-element max-heap per group, is map-side combinable (partials of size ≤ k merge in
  * O(k log k)), and runs in ObjectHashAggregateExec like [[LwwWinner]] — the whole input
  * is reduced to one k-sized threshold row per group before any shuffle.
  */
case class KthSmallest(
    major: Expression,
    minor: Expression,
    k: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[PriorityQueue[Array[Long]]] {

  override def children: Seq[Expression] = Seq(major, minor, k)
  override def nullable: Boolean = true
  override def dataType: DataType = KthSmallest.resultType
  override def prettyName: String = "graft_kth_smallest"

  private lazy val kVal: Int = k.eval().asInstanceOf[Int]

  // max-heap: head = largest pair currently kept
  private def cmp(a: Array[Long], b: Array[Long]): Int = {
    val c = java.lang.Long.compare(b(0), a(0))
    if (c != 0) c else java.lang.Long.compare(b(1), a(1))
  }

  override def createAggregationBuffer(): PriorityQueue[Array[Long]] =
    new PriorityQueue[Array[Long]](math.max(kVal, 1), cmp(_, _))

  private def offer(q: PriorityQueue[Array[Long]], maj: Long, min: Long): Unit = {
    if (q.size < kVal) q.offer(Array(maj, min))
    else {
      val worst = q.peek()
      if (maj < worst(0) || (maj == worst(0) && min < worst(1))) {
        q.poll()
        q.offer(Array(maj, min))
      }
    }
  }

  override def update(q: PriorityQueue[Array[Long]], input: InternalRow): PriorityQueue[Array[Long]] = {
    val ma = major.eval(input)
    val mi = minor.eval(input)
    if (ma != null && mi != null) offer(q, ma.asInstanceOf[Long], mi.asInstanceOf[Long])
    q
  }

  override def merge(q: PriorityQueue[Array[Long]], o: PriorityQueue[Array[Long]]): PriorityQueue[Array[Long]] = {
    val it = o.iterator()
    while (it.hasNext) { val p = it.next(); offer(q, p(0), p(1)) }
    q
  }

  override def eval(q: PriorityQueue[Array[Long]]): Any =
    if (q.isEmpty) null
    else {
      val worst = q.peek() // k-th smallest (or max of an under-full group)
      new GenericInternalRow(Array[Any](worst(0), worst(1)))
    }

  override def serialize(q: PriorityQueue[Array[Long]]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * q.size)
    bb.putInt(q.size)
    val it = q.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p(0)).putLong(p(1)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[Array[Long]] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) { q.offer(Array(bb.getLong, bb.getLong)); i += 1 }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KthSmallest =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KthSmallest =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KthSmallest =
    copy(major = newChildren(0), minor = newChildren(1), k = newChildren(2))
}

object KthSmallest {

  val resultType: StructType = new StructType()
    .add("major", LongType)
    .add("minor", LongType)

  /** Aggregate Column: the k-th smallest (major, minor) pair as a struct. */
  def column(major: Column, minor: Column, k: Int): Column =
    ExpressionUtils.column(
      KthSmallest(
        ExpressionUtils.expression(major),
        ExpressionUtils.expression(minor),
        Literal(k)
      ).toAggregateExpression())
}
