package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model._
import graft.store.EdgeStore

/** Engine configuration — the reference's cost-model constants
  * (`config/FlockDB.scala:17-30`). `intersectionTimeout` has no batch analog (a Spark job
  * runs to completion) and is intentionally absent.
  */
case class GraftConfig(
    averageIntersectionProportion: Double = 0.1,
    intersectionPageSizeMax: Int = 4000,
    aggregateJobsPageSize: Int = 500,
    /** Configured graphs (the reference's forwarding table): when set, `execute` rejects
      * ops on unknown graphs (`ExecuteCompiler.scala:45-46`). None = accept any graph.
      */
    knownGraphs: Option[Set[Int]] = None
)

/** The compiled query IR — mirrors the reference's `QueryTree` (`queries/Query.scala:40-72`)
  * but compiles to ONE declarative DataFrame instead of a demand-driven page-pull loop:
  * Catalyst then picks broadcast vs shuffle joins, pushes the leaf filters into the scan,
  * and the whole compound query is a single distributed plan (SURVEY.md §3.4).
  */
sealed trait QueryNode {

  /** The set of neighbor ids this node denotes, as a single-column DataFrame
    * (`neighbor_id`, unique). Set arithmetic is over destination-id order, like the
    * reference (`SqlShard.scala:240-244`).
    */
  def ids(store: EdgeStore): DataFrame = this match {
    case SimpleNode(term) =>
      store.adjacency(term).select(col("neighbor_id"))
    case IntersectNode(l, r) =>
      // Reference `IntersectionQuery.scala:23-76`: page smaller side, probe larger via
      // IN-lists, loop until full. Declaratively that's a semi-join; Catalyst broadcasts
      // the small side (the paging/probing loop is an artifact of row-store RPCs).
      l.ids(store).join(r.ids(store), Seq("neighbor_id"), "left_semi")
    case DifferenceNode(l, r) =>
      // Reference `DifferenceQuery.scala:22-69` — anti-join; not symmetric.
      l.ids(store).join(r.ids(store), Seq("neighbor_id"), "left_anti")
    case UnionNode(l, r) =>
      // Reference `UnionQuery.scala:22-49` — sorted dedup merge.
      l.ids(store).unionByName(r.ids(store)).distinct()
  }

  /** Paged select — reference `select2` semantics. Simple top-level terms page in
    * position (recency) order (`SqlShard.scala:252-256`); compound queries page in
    * destination-id order (`SqlShard.scala:240-244`).
    */
  def select(store: EdgeStore, page: Page): PagedResult[Long] = this match {
    case SimpleNode(term) =>
      val adj = store.adjacency(term)
      val byPos = Pagination.paginate(adj, "position", page)
      // results are ids, in position order — map positions back to neighbor ids
      if (byPos.items.isEmpty) PagedResult(Nil, byPos.nextCursor, byPos.prevCursor)
      else {
        val rows = adj
          .filter(col("position").isin(byPos.items: _*))
          .orderBy(col("position").desc)
          .select(col("neighbor_id"))
          .collect()
          .toSeq
          .map(_.getLong(0))
        PagedResult(rows, byPos.nextCursor, byPos.prevCursor)
      }
    case _ =>
      Pagination.paginate(ids(store), "neighbor_id", page)
  }

  /** Cardinality estimate — reference `count2` semantics (`Flockdb.thrift:154-156`):
    * documented ESTIMATES, not exact counts. Simple terms read the materialized metadata
    * count (`SimpleQuery.scala:24-27`); compounds combine estimates
    * (intersection ≈ min·proportion, union = max, difference = left —
    * `IntersectionQuery.scala:24-28`, `UnionQuery.scala:23`, `DifferenceQuery.scala:25`).
    */
  def sizeEstimate(store: EdgeStore, config: GraftConfig): Long = this match {
    case SimpleNode(term) =>
      term.destinationIds match {
        case Some(ids) => ids.size.toLong // where-in estimate = list size (`WhereInQuery.scala:26`)
        case None =>
          // Metadata count semantics: the materialized count covers edges in the vertex's
          // dominant state; reads for other states return 0 (`SqlShard.scala:175-188`,
          // spec `unit/SqlShardSpec.scala:140-146`). For backward terms the reference keeps
          // a mirrored metadata table; we recompute grouped by the queried column.
          val vertexCol = if (term.isForward) "source_id" else "destination_id"
          val perState = store.snapshot
            .filter(col("graph_id") === term.graphId && col(vertexCol) === term.sourceId)
            .groupBy(col("state"))
            .agg(count(lit(1)).as("c"), max(col("updated_at")).as("maxUpd"))
            .collect()
            .map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))
          if (perState.isEmpty) 0L
          else {
            // vertex state = LWW over the vertex's edge writes: max (updatedAt, priority)
            val (vertexState, vertexCount, _) =
              perState.maxBy { case (s, _, upd) => (upd, State.priority(s)) }
            if (term.effectiveStates.contains(vertexState)) vertexCount else 0L
          }
      }
    case IntersectNode(l, r) =>
      val (a, b) = (l.sizeEstimate(store, config), r.sizeEstimate(store, config))
      (math.min(a, b) * config.averageIntersectionProportion).toLong
    case UnionNode(l, r) =>
      math.max(l.sizeEstimate(store, config), r.sizeEstimate(store, config))
    case DifferenceNode(l, _) =>
      l.sizeEstimate(store, config)
  }

  /** Exact count — the config-flagged alternative to estimates (SURVEY.md §2.5 A4). */
  def exactCount(store: EdgeStore): Long = ids(store).count()
}

final case class SimpleNode(term: QueryTerm)                        extends QueryNode
final case class IntersectNode(left: QueryNode, right: QueryNode)   extends QueryNode
final case class UnionNode(left: QueryNode, right: QueryNode)       extends QueryNode
final case class DifferenceNode(left: QueryNode, right: QueryNode)  extends QueryNode

/** RPN select program — wire shape of the reference (`Flockdb.thrift:99-125`). */
sealed trait SelectOperation
final case class TermOp(term: QueryTerm) extends SelectOperation
case object IntersectionOp               extends SelectOperation
case object UnionOp                      extends SelectOperation
case object DifferenceOp                 extends SelectOperation

/** RPN → QueryNode compiler (reference `queries/SelectCompiler.scala:30-99`):
  * fold the program over a stack; binary ops pop two; the program must leave exactly one
  * node. Malformed programs throw `InvalidQueryException` (reference O10).
  */
object SelectCompiler {

  def apply(program: Seq[SelectOperation]): QueryNode = {
    if (program.isEmpty) throw new InvalidQueryException("empty query program")
    val stack = program.foldLeft(List.empty[QueryNode]) { (stack, op) =>
      op match {
        case TermOp(term) => SimpleNode(term) :: stack
        case binary =>
          stack match {
            case right :: left :: rest =>
              val node = binary match {
                case IntersectionOp => IntersectNode(left, right)
                case UnionOp        => UnionNode(left, right)
                case DifferenceOp   => DifferenceNode(left, right)
                case _              => throw new InvalidQueryException(s"unknown operation $binary")
              }
              node :: rest
            case _ =>
              throw new InvalidQueryException("operator with fewer than 2 operands on stack")
          }
      }
    }
    stack match {
      case single :: Nil => single
      case s => throw new InvalidQueryException(s"malformed program: ${s.size} items left on stack")
    }
  }
}

/** Small builder DSL mirroring the reference's client `Select` algebra
  * (`src/main/scala/com/twitter/flockdb/Select.scala:25-95`).
  */
object Select {
  def apply(sourceId: Long, graphId: Int, states: Seq[Int] = Seq(State.Normal)): QueryNode =
    SimpleNode(QueryTerm(sourceId, graphId, isForward = true, None, states))

  def backward(destinationId: Long, graphId: Int, states: Seq[Int] = Seq(State.Normal)): QueryNode =
    SimpleNode(QueryTerm(destinationId, graphId, isForward = false, None, states))

  implicit final class Ops(private val self: QueryNode) extends AnyVal {
    def intersect(other: QueryNode): QueryNode  = IntersectNode(self, other)
    def union(other: QueryNode): QueryNode      = UnionNode(self, other)
    def difference(other: QueryNode): QueryNode = DifferenceNode(self, other)
  }
}
