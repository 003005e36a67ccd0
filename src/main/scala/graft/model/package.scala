package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Core data model of the graph engine.
  *
  * Mirrors the reference's data plane (see `/root/reference/src/main/scala/com/twitter/flockdb/Edge.scala:28-29`,
  * `shards/SqlShard.scala:56-79`, `Flockdb.thrift:37-76`) re-expressed as Spark case classes / columns:
  * a single canonical edge fact table `(graphId, sourceId, destinationId, position, updatedAt, count, state)`.
  * Unlike the reference, we do NOT materialize a backward copy of each edge: backward queries swap the
  * roles of source/destination at plan time (SURVEY.md §1.4).
  */
package object model {

  /** Edge lifecycle states — ids from reference `State.scala:24-36` / thrift enum. */
  object State {
    val Normal   = 0
    val Removed  = 1
    val Archived = 2
    val Negative = 3

    /** Conflict-resolution priority (NOT the id): Normal(0) < Negative(1) < Archived(2) < Removed(3);
      * on equal `updatedAt` the higher-priority state wins (reference `State.scala:19-36`,
      * `Edge.scala:61-68`).
      */
    def priority(state: Int): Int = state match {
      case Normal   => 0
      case Negative => 1
      case Archived => 2
      case Removed  => 3
      case other    => throw new IllegalArgumentException(s"unknown state id $other")
    }

    /** Same priority mapping as a codegen-friendly Column expression. */
    def priorityCol(state: Column): Column =
      when(state === Normal, 0)
        .when(state === Negative, 1)
        .when(state === Archived, 2)
        .otherwise(3)

    /** "Edge exists" semantics of the reference `contains` call:
      * state ∈ {Normal, Negative} (reference `EdgesService.scala:51-60`).
      */
    def existsCol(state: Column): Column =
      state === Normal || state === Negative

    val all: Seq[Int] = Seq(Normal, Removed, Archived, Negative)
  }

  /** One edge row. `updatedAt` is epoch-seconds (1s resolution matters for LWW tie-breaks),
    * `position` is the recency-ordered sort key ("ordered uuid": millis << 20 | rand20 in the
    * reference, `UuidGenerator.scala:26-39`); `count` is vestigial (always 0 on upserts).
    */
  case class Edge(
      graphId: Int,
      sourceId: Long,
      destinationId: Long,
      position: Long,
      updatedAt: Int,
      count: Int,
      state: Int
  )

  /** Per-vertex aggregate (reference `Metadata.scala:29`): the count of edges in the vertex's
    * current (dominant) state; reads for other states return 0 (`SqlShard.scala:175-188`).
    */
  case class Metadata(graphId: Int, sourceId: Long, state: Int, count: Long, updatedAt: Int)

  /** Keyset-pagination token (reference `Cursor.scala:19-30`):
    * -1 = Start, 0 = End, positive c = "rows with key < c, descending",
    * negative c = backward page: "rows with key > |c|, ascending, then reversed".
    */
  object Cursor {
    val Start: Long = -1L
    val End: Long   = 0L
  }

  case class Page(count: Int, cursor: Long)

  /** One page of results (the reference's `ResultWindow`, `ResultWindow.scala:34-104`). */
  case class PagedResult[T](items: Seq[T], nextCursor: Long, prevCursor: Long)

  /** Leaf predicate of every query (reference `QueryTerm.scala:20-21`):
    * neighbors of `sourceId` in graph `graphId`; `isForward=false` swaps source/destination roles;
    * `destinationIds=None` means wildcard; empty `states` defaults to `[Normal]`
    * (reference `SelectCompiler.scala:62`).
    */
  case class QueryTerm(
      sourceId: Long,
      graphId: Int,
      isForward: Boolean = true,
      destinationIds: Option[Seq[Long]] = None,
      states: Seq[Int] = Seq(State.Normal)
  ) {
    def effectiveStates: Seq[Int] = if (states.isEmpty) Seq(State.Normal) else states
  }

  /** Write-pipeline operation kinds (reference `ExecuteCompiler.scala:48-54`):
    * each op resolves to a preferred target state.
    */
  object OpType {
    val Add: Int      = State.Normal
    val Remove: Int   = State.Removed
    val Archive: Int  = State.Archived
    val Negate: Int   = State.Negative
  }

  /** One write op: upsert of (graphId, sourceId, destinationId) toward preferred `state`
    * at `updatedAt`. `destinationId=None` is a wildcard (whole-vertex bulk op, the
    * reference's `Multi` job). `isForward=false` is a backward term: single-edge backward
    * ops swap (source, destination) before applying (reference
    * `queries/ExecuteCompiler.scala:86-99`); wildcard backward ops target the vertex's
    * INCOMING edges and its backward register (`jobs/multi/Multi.scala:110-115`).
    */
  case class WriteOp(
      graphId: Int,
      sourceId: Long,
      destinationId: Option[Long],
      state: Int,
      updatedAt: Int,
      position: Option[Long] = None,
      isForward: Boolean = true
  )

  class InvalidQueryException(msg: String) extends RuntimeException(msg)
}
