package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._

/** Distributed edge store over an append-only log of edge writes.
  *
  * The reference (FlockDB) materializes each write eagerly into MySQL with a guarded
  * last-writer-wins upsert (`shards/SqlShard.scala:432-524`). On Spark we instead keep the
  * *log* of writes as the source of truth and derive the current snapshot with a single
  * grouped max-by aggregation — idempotent and commutative exactly like the reference's
  * write model (`doc/blog.md:67-75`): replaying any subset of the log in any order yields
  * the same snapshot.
  *
  * Scale posture: the snapshot is `groupBy(graphId, sourceId, destinationId).agg(max_by(...))`
  * — a map-side-combinable hash aggregation, one shuffle on the edge key, no window sort.
  * At 100 TB this is the cheapest possible shape (partial aggregation collapses duplicate
  * writes before the shuffle; AQE handles skewed vertices).
  */
final class EdgeStore(val log: DataFrame) {
  import EdgeStore._

  /** Current edge snapshot: per (graphId, sourceId, destinationId) the row with max
    * (updatedAt, statePriority, position) — reference LWW semantics `Edge.scala:61-68`
    * plus a deterministic position tie-break (the reference resolves exact ties by
    * arrival order, which has no distributed analog; we pin max-position).
    */
  def snapshot: DataFrame = lwwMerge(log)

  /** Per-vertex metadata: dominant vertex state + count of edges in that state.
    *
    * The reference materializes this incrementally with count deltas
    * (`SqlShard.scala:470-524`); in batch we recompute exactly: per-vertex counts by state,
    * then keep the count of the vertex's dominant (LWW-max) state — reads for other states
    * return 0 (`SqlShard.scala:175-188`, spec `unit/SqlShardSpec.scala:140-146`).
    * Here vertex state is derived as the LWW-newest edge write's state projected to the
    * vertex level, matching the "metadata converges with the edges" repair semantics.
    */
  def metadata: DataFrame = {
    val snap = snapshot
    snap
      .groupBy(col("graph_id"), col("source_id"))
      .agg(
        max_by(
          struct(col("state"), col("updated_at")),
          struct(col("updated_at"), State.priorityCol(col("state")))
        ).as("m"),
        count(lit(1)).as("total"),
        // counts per state, map-side combined; we pick the dominant one below
        sum(when(col("state") === State.Normal, 1L).otherwise(0L)).as("c0"),
        sum(when(col("state") === State.Removed, 1L).otherwise(0L)).as("c1"),
        sum(when(col("state") === State.Archived, 1L).otherwise(0L)).as("c2"),
        sum(when(col("state") === State.Negative, 1L).otherwise(0L)).as("c3")
      )
      .select(
        col("graph_id"),
        col("source_id"),
        col("m.state").as("state"),
        when(col("m.state") === State.Normal, col("c0"))
          .when(col("m.state") === State.Removed, col("c1"))
          .when(col("m.state") === State.Archived, col("c2"))
          .otherwise(col("c3"))
          .as("count"),
        col("m.updated_at").as("updated_at")
      )
  }

  /** Adjacency relation for one query term, direction-normalized: the result column
    * `neighbor_id` is destination for forward terms, source for backward terms
    * (reference `ForwardingManager.scala:35-37`: backward graph = -graphId table; we swap
    * columns at plan time instead — SURVEY.md §1.4).
    */
  def adjacency(term: QueryTerm): DataFrame = {
    val (vertexCol, neighborCol) =
      if (term.isForward) ("source_id", "destination_id") else ("destination_id", "source_id")
    var df = snapshot
      .filter(col("graph_id") === term.graphId && col(vertexCol) === term.sourceId)
      .filter(col("state").isin(term.effectiveStates: _*))
    term.destinationIds.foreach { ids => df = df.filter(col(neighborCol).isin(ids: _*)) }
    df.select(
      col(neighborCol).as("neighbor_id"),
      col("position"),
      col("updated_at"),
      col("state")
    )
  }

  /** Point lookup (reference `Shard.get`, `SqlShard.scala:133-137`). */
  def get(graphId: Int, sourceId: Long, destinationId: Long): Option[Edge] = {
    val spark = log.sparkSession
    import spark.implicits._
    snapshot
      .filter(
        col("graph_id") === graphId && col("source_id") === sourceId &&
          col("destination_id") === destinationId
      )
      .select(
        col("graph_id").as("graphId"),
        col("source_id").as("sourceId"),
        col("destination_id").as("destinationId"),
        col("position"),
        col("updated_at").as("updatedAt"),
        col("count"),
        col("state")
      )
      .as[Edge]
      .collect()
      .headOption
  }

  /** `contains` semantics: edge exists iff its current state ∈ {Normal, Negative}
    * (reference `EdgesService.scala:51-60`).
    */
  def contains(graphId: Int, sourceId: Long, destinationId: Long): Boolean =
    get(graphId, sourceId, destinationId).exists(e => e.state == State.Normal || e.state == State.Negative)

  /** Apply a batch of write ops (the reference's async `execute` pipeline, applied
    * set-based): single-edge ops become new log rows; wildcard ops (the `Multi` bulk job,
    * `jobs/multi/Multi.scala:101-125`) expand against the current snapshot — every
    * non-Removed edge of the vertex gets a write toward the op's state
    * (`selectIncludingArchived` semantics, `SqlShard.scala:246-250`).
    *
    * Ops without explicit position keep the existing edge's position when one exists —
    * matching the reference rule that position is only refreshed on
    * Removed/Negative→Normal transitions with a supplied position (`SqlShard.scala:436-446`).
    * Batch-atomicity makes the reference's optimistic per-vertex lock unnecessary
    * (SURVEY.md §2.8 W5).
    */
  def applyOperations(ops: DataFrame): EdgeStore = {
    val snap = snapshot
    // Position rule (reference `SqlShard.scala:436-446`, spec `unit/SqlShardSpec.scala:332-377`):
    // an existing edge keeps its position UNLESS it is being resurrected from
    // Removed/Negative into Normal, in which case the op's position (or one derived from
    // the op timestamp) applies. Brand-new edges take the op position / derived position.
    val resurrected =
      col("old_state").isin(State.Removed, State.Negative) && col("op.state") === State.Normal
    val opPosition =
      coalesce(col("op.position"), graft.functions.GraftFunctions.positionFromUpdatedAt(col("op.updated_at")))
    val single = ops
      .filter(col("destination_id").isNotNull)
      .alias("op")
      .join(
        snap.select(
          col("graph_id"), col("source_id"), col("destination_id"),
          col("position").as("old_position"), col("state").as("old_state")
        ).alias("cur"),
        Seq("graph_id", "source_id", "destination_id"),
        "left"
      )
      .select(
        col("graph_id"),
        col("source_id"),
        col("destination_id"),
        when(col("old_position").isNull || resurrected, opPosition)
          .otherwise(col("old_position"))
          .as("position"),
        col("op.updated_at").as("updated_at"),
        lit(0).as("count"),
        col("op.state").as("state")
      )

    val bulk = ops
      .filter(col("destination_id").isNull)
      .select(
        col("graph_id"), col("source_id"),
        col("state").as("new_state"), col("updated_at").as("new_updated_at")
      )
      .join(
        snap.filter(col("state") =!= State.Removed),
        Seq("graph_id", "source_id")
      )
      .select(
        col("graph_id"),
        col("source_id"),
        col("destination_id"),
        col("position"),
        col("new_updated_at").as("updated_at"),
        lit(0).as("count"),
        col("new_state").as("state")
      )

    new EdgeStore(log.select(edgeCols: _*).unionByName(single).unionByName(bulk))
  }

  /** Reciprocal edges: every edge (s, d) in the given states whose reverse (d, s) also
    * exists in those states. Computed as ONE grouped aggregation on the unordered pair
    * key (graphId, min(s,d), max(s,d)) instead of a self-join — the snapshot is scanned
    * once, and the second shuffle moves only deduped edges (at 100 TB the self-join
    * formulation computes the LWW snapshot twice and shuffles it twice).
    */
  def reciprocal(states: Seq[Int] = Seq(State.Normal)): DataFrame = {
    val src = col("source_id")
    val dst = col("destination_id")
    val grouped = snapshot
      .filter(col("state").isin(states: _*))
      .select(
        col("graph_id"),
        least(src, dst).as("lo"),
        greatest(src, dst).as("hi"),
        (src <= dst).as("fwd"),
        (src >= dst).as("bwd")
      )
      .groupBy(col("graph_id"), col("lo"), col("hi"))
      .agg(max(col("fwd")).as("has_fwd"), max(col("bwd")).as("has_bwd"))
      .filter(col("has_fwd") && col("has_bwd"))
    grouped
      .select(
        col("graph_id"),
        explode(
          when(
            col("lo") === col("hi"),
            array(struct(col("lo").as("s"), col("hi").as("d")))
          ).otherwise(
            array(
              struct(col("lo").as("s"), col("hi").as("d")),
              struct(col("hi").as("s"), col("lo").as("d"))
            )
          )
        ).as("p")
      )
      .select(col("graph_id"), col("p.s").as("source_id"), col("p.d").as("destination_id"))
  }

  /** Replica repair (reference `jobs/Copy.scala:65-214`): the reference runs a k-way
    * cursor-paged merge between replicas, newest-wins. In Spark the whole repair is one
    * LWW merge over the union of both logs — no paging loop, no per-row RPCs.
    */
  def repairWith(other: EdgeStore): EdgeStore =
    new EdgeStore(log.select(edgeCols: _*).unionByName(other.log.select(edgeCols: _*)))
}

object EdgeStore {

  val edgeColNames: Seq[String] =
    Seq("graph_id", "source_id", "destination_id", "position", "updated_at", "count", "state")
  def edgeCols: Seq[Column] = edgeColNames.map(col)

  def apply(log: DataFrame): EdgeStore = new EdgeStore(log)

  def fromEdges(spark: SparkSession, edges: Seq[Edge]): EdgeStore = {
    import spark.implicits._
    new EdgeStore(
      edges.toDF("graphId", "sourceId", "destinationId", "position", "updatedAt", "count", "state")
        .toDF(edgeColNames: _*)
    )
  }

  /** The LWW merge: one hash aggregation, winner = max (updatedAt, statePriority, position).
    * `max_by(struct(allCols), struct(orderingKey))` gets partial (map-side) aggregation from
    * Catalyst — strictly cheaper than the window-function formulation at scale.
    */
  def lwwMerge(writes: DataFrame): DataFrame =
    writes
      .groupBy(col("graph_id"), col("source_id"), col("destination_id"))
      .agg(
        max_by(
          struct(col("position"), col("updated_at"), col("count"), col("state")),
          struct(col("updated_at"), State.priorityCol(col("state")), col("position"))
        ).as("w")
      )
      .select(
        col("graph_id"),
        col("source_id"),
        col("destination_id"),
        col("w.position").as("position"),
        col("w.updated_at").as("updated_at"),
        col("w.count").as("count"),
        col("w.state").as("state")
      )
}
