package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/** Distributed edge store over an append-only log of edge writes plus a vertex-level
  * state-register log.
  *
  * The reference (FlockDB) materializes each write eagerly into MySQL with a guarded
  * last-writer-wins upsert (`shards/SqlShard.scala:432-524`) and keeps a per-vertex
  * metadata row whose `state` is its own LWW register (`shards/SqlShard.scala:646-697`).
  * On Spark we instead keep the *logs* of writes as the source of truth and derive the
  * current snapshots with grouped max-by aggregations — idempotent and commutative exactly
  * like the reference's write model (`doc/blog.md:67-75`): replaying any subset of either
  * log in any order yields the same snapshots.
  *
  * Scale posture: the snapshot is `groupBy(graphId, sourceId, destinationId).agg(lwwWinner)`
  * — a map-side-combinable hash aggregation (custom ObjectHashAggregate-eligible
  * aggregate), one shuffle on the edge key, no window or partition sort.
  * At 100 TB this is the cheapest possible shape (partial aggregation collapses duplicate
  * writes before the shuffle; AQE handles skewed vertices). The vertex-register table is
  * per-vertex (orders of magnitude smaller than edges), so the write-path domination joins
  * against it broadcast under AQE.
  */
final class EdgeStore(
    val log: DataFrame,
    val vertexLog: Option[DataFrame] = None,
    /** Oldest instant this store can truthfully time-travel to. `None` = full write
      * log (every cut answerable). Compaction ([[EdgeStorage.compact]],
      * `TestGraph.compactedStore`) discards superseded writes, so the compacted
      * relation can only replay cuts at or after the newest write that superseded a
      * discarded one — [[asOf]] REJECTS older cuts instead of silently returning a
      * state that never existed.
      */
    val compactionHorizon: Option[Int] = None
) {
  import EdgeStore._

  /** Current edge snapshot: per (graphId, sourceId, destinationId) the row with max
    * (updatedAt, statePriority, position) — reference LWW semantics `Edge.scala:61-68`
    * plus a deterministic position tie-break (the reference resolves exact ties by
    * arrival order, which has no distributed analog; we pin max-position).
    */
  def snapshot: DataFrame = lwwMerge(log)

  /** Time-travel view: the store as it stood at `ts` — both logs truncated to writes
    * with `updated_at <= ts`, so EVERY derived relation (snapshot, metadata,
    * vertexStates, the whole query surface) replays the state the store held at that
    * instant. Sound because the LWW fold is a pure function of the log prefix; the
    * reference cannot offer this (MySQL rows are overwritten in place,
    * `shards/SqlShard.scala:432-524`) — keeping the write LOG as source of truth gets
    * audit/debug/backfill time travel for free.
    *
    * Scale shape: a plain predicate on the log relation, pushed to the parquet scan
    * (row-group min/max on `updated_at` prune files that contain only newer writes —
    * PlanSpec pins PushedFilters), then the identical one-shuffle fold. No extra pass,
    * no snapshot diffing.
    *
    * PRECONDITION (ENFORCED): the store must hold the write log back to `ts`.
    * Compaction ([[EdgeStorage.compact]], `TestGraph.compactedStore`) discards every
    * superseded write, so a compacted store can only answer `asOf` truthfully for
    * `ts` at or after its [[compactionHorizon]] — below it, losers that were live at
    * `ts` are gone and the replay would silently under-report. Such cuts THROW
    * (IllegalArgumentException) instead: this was the one place in the engine where
    * a correct-looking call could yield a wrong answer. Deployments that need deep
    * time travel keep the raw log (cheap: append-only parquet) alongside the
    * compacted snapshot.
    */
  def asOf(ts: Int): EdgeStore = {
    requireAboveHorizon(ts, "asOf")
    new EdgeStore(
      log.filter(col("updated_at") <= ts),
      vertexLog.map(_.filter(col("updated_at") <= ts)),
      compactionHorizon)
  }

  /** Time-travel CHURN DIFF — the audit/backfill companion to [[asOf]]: every edge
    * whose LWW winner differs between the store as of `ts1` and as of `ts2`
    * (`appeared` = no write existed at ts1; `state` = winner's state changed;
    * `position` = same state, position moved). The same newest-wins diff the
    * reference's Copy/repair jobs run between REPLICAS
    * (`jobs/Copy.scala:65-129`), pointed at time instead of space: "what changed
    * since the last backfill cut" is this relation.
    *
    * Scale shape: ONE grouped-max fold over the log prefix `updated_at <= ts2`
    * (pushed to the scan — row-group pruning like [[asOf]]'s, StorageSpec pins it),
    * computing BOTH winners per key in a single ObjectHashAggregate pass: the ts1
    * winner folds the same scan through conditionally-nulled inputs ([[LwwWinner]]
    * skips null rows), so the log is scanned once and shuffled once — never two
    * snapshot folds plus a join. A pure `updated_at` refresh that changes neither
    * state nor position is NOT churn (the winner row is materially identical).
    * The log is append-only, so edges never disappear between cuts.
    */
  def changedBetween(ts1: Int, ts2: Int): DataFrame = {
    require(ts1 <= ts2, s"changedBetween($ts1, $ts2): ts1 must not exceed ts2")
    requireAboveHorizon(ts1, "changedBetween")
    val atTs1 = col("updated_at") <= ts1
    def gated(c: Column): Column = when(atTs1, c)
    val winners = log
      .filter(col("updated_at") <= ts2)
      .groupBy(col("graph_id"), col("source_id"), col("destination_id"))
      .agg(
        org.apache.spark.sql.graft.LwwWinner
          .column(col("position"), col("updated_at"), col("count"), col("state"))
          .as("new"),
        org.apache.spark.sql.graft.LwwWinner
          .column(gated(col("position")), gated(col("updated_at")),
            gated(col("count")), gated(col("state")))
          .as("old"))
    winners
      .filter(col("old").isNull || col("old.state") =!= col("new.state") ||
        col("old.position") =!= col("new.position"))
      .select(
        col("graph_id"), col("source_id"), col("destination_id"),
        col("old.state").as("old_state"), col("old.position").as("old_position"),
        col("new.state").as("new_state"), col("new.position").as("new_position"),
        col("new.updated_at").as("new_updated_at"),
        when(col("old").isNull, lit("appeared"))
          .when(col("old.state") =!= col("new.state"), lit("state"))
          .otherwise(lit("position")).as("change"))
  }

  private def requireAboveHorizon(ts: Int, op: String): Unit =
    compactionHorizon.foreach { h =>
      require(ts >= h,
        s"$op($ts) is below this store's compaction horizon $h: compaction discarded " +
          "superseded writes older than the horizon, so replaying this cut would return " +
          "a state that never existed. Time-travel below the horizon needs the raw " +
          "(uncompacted) write log.")
    }

  private def vertexLogOrEmpty: DataFrame =
    vertexLog.getOrElse(
      log.sparkSession.createDataFrame(
        log.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row], vertexLogSchema))

  /** Current vertex-register snapshot: per (graphId, vertexId, direction) the LWW-max
    * (updatedAt, statePriority) register — the reference's metadata-state register
    * (`Metadata.scala:40-47`, `SqlShard.scala:646-697`), written by wildcard (Multi)
    * ops (`jobs/multi/Multi.scala:101-125`). Vertices without a register are implicitly
    * Normal (`Optimism.scala:69-70`: absent metadata reads as Normal).
    */
  def vertexStates: DataFrame = vertexLww(vertexLogOrEmpty)

  /** Per-vertex metadata: vertex state + count of edges in that state.
    *
    * State rule (reference semantics): when the vertex has a first-class register
    * (written by a wildcard op / metadata write), the register IS the vertex state —
    * edge writes never change it (`SqlShard.scala:646-697`); the count is then the
    * number of current edges in the register's state (`computeCount`,
    * `SqlShard.scala:208-214`), possibly 0 — a register may exist for a vertex with no
    * edges at all. Vertices without a register fall back to the derived dominant state
    * (LWW-newest edge write projected to the vertex), which is what the reference's
    * lazy `populateMetadata` + repair path converge to.
    */
  def metadata: DataFrame = {
    val snap = snapshot
    val derived = snap
      .groupBy(col("graph_id"), col("source_id"))
      .agg(
        // LwwWinner (not max_by) keeps this in ObjectHashAggregate — see lwwMerge
        org.apache.spark.sql.graft.LwwWinner
          .column(lit(0L), col("updated_at"), lit(0), col("state"))
          .as("m"),
        count(lit(1)).as("total"),
        // counts per state, map-side combined; we pick the vertex state's one below
        sum(when(col("state") === State.Normal, 1L).otherwise(0L)).as("c0"),
        sum(when(col("state") === State.Removed, 1L).otherwise(0L)).as("c1"),
        sum(when(col("state") === State.Archived, 1L).otherwise(0L)).as("c2"),
        sum(when(col("state") === State.Negative, 1L).otherwise(0L)).as("c3")
      )

    def countFor(state: Column): Column =
      when(state === State.Normal, coalesce(col("c0"), lit(0L)))
        .when(state === State.Removed, coalesce(col("c1"), lit(0L)))
        .when(state === State.Archived, coalesce(col("c2"), lit(0L)))
        .otherwise(coalesce(col("c3"), lit(0L)))

    vertexLog match {
      case None =>
        derived.select(
          col("graph_id"),
          col("source_id"),
          col("m.state").as("state"),
          countFor(col("m.state")).as("count"),
          col("m.updated_at").as("updated_at")
        )
      case Some(_) =>
        val reg = vertexStates
          .filter(col("is_forward"))
          .select(
            col("graph_id"), col("vertex_id").as("source_id"),
            col("state").as("reg_state"), col("updated_at").as("reg_updated_at")
          )
        val vState = coalesce(col("reg_state"), col("m.state"))
        derived
          .join(reg, Seq("graph_id", "source_id"), "full_outer")
          .select(
            col("graph_id"),
            col("source_id"),
            vState.as("state"),
            countFor(vState).as("count"),
            coalesce(col("reg_updated_at"), col("m.updated_at")).as("updated_at")
          )
    }
  }

  /** Graph-pruned view of the store: restrict BOTH logs to one graph before any fold.
    *
    * `graph_id` is a component of every grouping key ([[snapshot]], [[vertexStates]],
    * [[metadata]]) and every join key in the derived relations, so pruning the logs
    * first is semantics-preserving — but NOT plan-equivalent to filtering the derived
    * output: Catalyst's `PushPredicateThroughJoin` never pushes predicates into a
    * full-outer join, so `metadata.filter(graph_id === g)` folds and joins ALL graphs
    * and discards the rest at the top (the reference never pays this: a graph maps to
    * its own forwarding-table shard range, `ForwardingManager.scala:24-38`). Through
    * this view the predicate sits directly over each scan — on graph-partitioned
    * storage ([[EdgeStorage.save]]) that is directory-level partition pruning, the
    * difference between scanning one graph and scanning the store at 100 TB.
    */
  def whereGraph(graphId: Int): EdgeStore =
    new EdgeStore(
      log.filter(col("graph_id") === graphId),
      vertexLog.map(_.filter(col("graph_id") === graphId)),
      compactionHorizon)

  /** Vertex-pruned view for point metadata reads: restrict BOTH logs to one
    * (graph, source vertex) before any fold. [[whereGraph]]'s rationale applies
    * verbatim — [[metadata]]'s full-outer register join blocks predicate pushdown,
    * so `metadata.filter(key)` folds and joins the WHOLE store to report one row —
    * sharpened to a single vertex: every grouping/join key of the metadata
    * derivation contains (graph_id, source_id/vertex_id), so pruning the logs first
    * is semantics-preserving, and the point predicates sit directly over each scan.
    * This is the shape of the reference's `get_metadata` RPC, which routes to ONE
    * shard and reads one row (`ForwardingManager.scala:24-38`,
    * `SqlShard.scala:146-152`); on (graph, vertex)-partitioned storage the read is
    * partition-pruned instead of store-wide.
    */
  def whereVertex(graphId: Int, sourceId: Long): EdgeStore =
    new EdgeStore(
      log.filter(col("graph_id") === graphId && col("source_id") === sourceId),
      vertexLog.map(_.filter(col("graph_id") === graphId && col("vertex_id") === sourceId)),
      compactionHorizon)

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
    term.destinationIds.foreach { ids =>
      // small id lists stay an IN predicate (pushes to the scan); large ones become a
      // broadcast semi-join — a million-id isin would blow up the expression tree
      // (the reference routes big IN-lists to a separate query class, SqlShard.scala:323-349)
      if (ids.size <= WhereInPredicateMax) df = df.filter(col(neighborCol).isin(ids: _*))
      else {
        val spark = log.sparkSession
        import spark.implicits._
        df = df.join(broadcast(ids.toDF(neighborCol)), Seq(neighborCol), "left_semi")
      }
    }
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
    * set-based). Op columns: graph_id, source_id, destination_id (null = wildcard),
    * state (preferred state), updated_at, position (nullable), and optionally
    * is_forward (absent = all forward).
    *
    * Pipeline (mirrors `ExecuteCompiler` → `Multi`/`Single`):
    *  1. Wildcard ops first write the vertex's state REGISTER
    *     (`jobs/multi/Multi.scala:101-109` updates metadata before fanning out), then
    *     expand against the current snapshot: every non-Removed edge on the op's side
    *     of the vertex gets a per-edge write (`selectIncludingArchived` semantics,
    *     `SqlShard.scala:246-250`).
    *  2. Single-edge ops are direction-normalized: backward terms swap (source, dest)
    *     (`queries/ExecuteCompiler.scala:86-99`).
    *  3. Every per-edge write resolves its EFFECTIVE state as
    *     `max(forwardVertexState, backwardVertexState, preferredState)` by state
    *     priority — vertex archival/negation dominates the edge write
    *     (`jobs/single/Single.scala:104-107`; truth table `unit/JobSpec.scala:126-148`).
    *     Registers written by this same batch are visible to the batch's edge writes
    *     (the reference applies Multi metadata writes before its fanned-out Singles;
    *     for cross-op races the LWW register itself is the deterministic tiebreak).
    *  4. Position rule (reference `SqlShard.scala:436-446`, spec
    *     `unit/SqlShardSpec.scala:332-377`): an existing edge keeps its position UNLESS
    *     it is resurrected from Removed/Negative into effective-Normal, in which case
    *     the op's position (or one derived from the op timestamp) applies.
    *
    * Batch-atomicity makes the reference's optimistic per-vertex lock unnecessary
    * (SURVEY.md §2.8 W5). The "lost lock" rows of the JobSpec matrix are therefore
    * unrepresentable here by design.
    *
    * Scale shape — the write path touches only batch-scale data, like the reference's
    * per-key upserts (`SqlShard.scala:432-524`), never the whole store:
    *  - The batch is materialized once (eager local checkpoint; callers routinely derive
    *    ops from a snapshot query, which would otherwise re-fold per consumer).
    *  - The pre-batch state the pipeline joins against is the LWW fold of the
    *    KEY-PRUNED log: one scan of the log, broadcast-joined against the batch's
    *    distinct touched (graph, vertex) keys (same trick as `QueryNode.leafStats`) —
    *    at 100 TB with vertex-partitioned storage this is partition pruning, not a full
    *    scan, and the fold collapses only the touched keys' rows.
    *  - The result is APPENDED to the log (newRows, batch-scale, materialized); folding
    *    the log stays on the compaction cadences (`EdgeStorage.compact`,
    *    `StreamingIngest`). A 10-row execute() therefore writes ~10 rows, not the store.
    *  - Batches larger than `incrementalMax` (default [[EdgeStore.IncrementalBatchMax]])
    *    fall back to the compacting form: fold the full snapshot once, return
    *    `snapshot ∪ newRows` (sound because lww is idempotent: lww(lww(L) ∪ R) =
    *    lww(L ∪ R)) — a bulk migration touching most keys rewrites the store anyway,
    *    and its key set would not be broadcastable.
    */
  def applyOperations(ops: DataFrame, incrementalMax: Long = IncrementalBatchMax): EdgeStore =
    applyOperationsWithDelta(ops, incrementalMax)._1

  /** [[applyOperations]] additionally returning the touched-vertex key set — the
    * distinct (graph_id, source_id) of every written edge row plus every register
    * write's vertex. This is exactly the set whose metadata rows can have changed,
    * i.e. the input [[metadataPatched]] needs for incremental maintenance (backward
    * wildcards touch SOURCES of affected edges, which only the write delta knows).
    */
  def applyOperationsWithDelta(
      ops: DataFrame,
      incrementalMax: Long = IncrementalBatchMax
  ): (EdgeStore, DataFrame) = {
    val withDir = withDirection(ops).localCheckpoint(true)
    val wild    = withDir.filter(col("destination_id").isNull)

    // 1. vertex-register writes from wildcard ops
    val newRegisters = wild.select(
      col("graph_id"), col("source_id").as("vertex_id"), col("is_forward"),
      col("state"), col("updated_at")
    )
    val mergedVertexLog = vertexLogOrEmpty.unionByName(newRegisters)

    val incremental = withDir.count() <= incrementalMax
    // three joins consume the base state with differing pushed projections (defeating
    // exchange reuse) — materialize it once; on the incremental path it is batch-scale
    val snap =
      (if (incremental) lwwMerge(prunedLog(withDir)) else snapshot).localCheckpoint(true)
    val newRows = writeRows(withDir, snap, mergedVertexLog)

    // newRows stays LAZY: both of its inputs (the pruned snap and the batch) are
    // already checkpointed, so recompute is batch-scale joins — cheaper at every scale
    // tested than materializing it (a localCheckpoint additionally produces a
    // LogicalRDD whose origin constraints reference pre-checkpoint attribute ids and
    // break Union constraint rewriting downstream).
    val store =
      if (incremental)
        new EdgeStore(
          log.select(edgeCols: _*).unionByName(newRows),
          Some(mergedVertexLog),
          compactionHorizon)
      else
        // the compacting fallback discards this batch's superseded rows too, but the
        // pre-existing horizon still bounds the oldest truthful cut (batch timestamps
        // at or above it only tighten what a FUTURE compaction may raise it to)
        new EdgeStore(snap.select(edgeCols: _*).unionByName(newRows), Some(mergedVertexLog),
          compactionHorizon)
    val touched = newRows.select(col("graph_id"), col("source_id"))
      .unionByName(newRegisters.select(col("graph_id"), col("vertex_id").as("source_id")))
      .distinct()
    (store, touched)
  }

  /** Incremental metadata maintenance — the batch restatement of the reference's A2
    * count-delta path (`SqlShard.scala:470-524`): given the PRE-write metadata table
    * and the touched-vertex keys from [[applyOperationsWithDelta]], recompute metadata
    * ONLY for those vertices (key-pruned broadcast semi-join on the log, same trick as
    * the incremental write path) and keep every other row of `prev` as-is. At 100 TB a
    * 10-row `execute()` re-aggregates ~10 vertices' adjacency, not the store.
    * Equivalent to a full [[metadata]] recompute by construction (pinned by LwwSpec
    * and the g26 oracle).
    */
  def metadataPatched(prev: DataFrame, touched: DataFrame): DataFrame = {
    val keys = touched.select(col("graph_id"), col("source_id")).distinct().localCheckpoint(true)
    val prunedStore = new EdgeStore(
      log.select(edgeCols: _*).join(broadcast(keys), Seq("graph_id", "source_id"), "left_semi"),
      vertexLog.map(_.join(
        broadcast(keys.withColumnRenamed("source_id", "vertex_id")),
        Seq("graph_id", "vertex_id"), "left_semi")))
    prev.join(broadcast(keys), Seq("graph_id", "source_id"), "left_anti")
      .unionByName(prunedStore.metadata)
  }

  private def withDirection(ops: DataFrame): DataFrame =
    if (ops.columns.contains("is_forward")) ops else ops.withColumn("is_forward", lit(true))

  /** Log rows that can interact with the batch: one scan of the log with two broadcast
    * marker joins on the batch's distinct touched (graph, vertex) keys — forward keys
    * prune by source, backward-wildcard keys by destination (an OR of two semi-joins,
    * evaluated in a single pass). LWW-folding duplicates is idempotent, so a row
    * matching both sides is harmless.
    */
  private def prunedLog(withDir: DataFrame): DataFrame = {
    val wild    = withDir.filter(col("destination_id").isNull)
    val singles = withDir.filter(col("destination_id").isNotNull)
    val kFwd = singles
      .select(col("graph_id"),
        when(col("is_forward"), col("source_id")).otherwise(col("destination_id")).as("source_id"))
      .unionByName(wild.filter(col("is_forward")).select(col("graph_id"), col("source_id")))
      .distinct()
    val kBwd = wild.filter(!col("is_forward"))
      .select(col("graph_id"), col("source_id").as("destination_id"))
      .distinct()
    log.select(edgeCols: _*)
      .join(broadcast(kFwd.withColumn("pf", lit(true))), Seq("graph_id", "source_id"), "left")
      .join(broadcast(kBwd.withColumn("pb", lit(true))), Seq("graph_id", "destination_id"), "left")
      .filter(coalesce(col("pf"), lit(false)) || coalesce(col("pb"), lit(false)))
      .select(edgeCols: _*)
  }

  /** Uncheckpointed incremental write delta, exposed so PlanSpec can assert the fold
    * runs over the key-pruned scan (the production path checkpoints eagerly, which
    * hides the plan).
    */
  private[graft] def plannedIncrementalRows(ops: DataFrame): DataFrame = {
    val withDir = withDirection(ops)
    writeRows(withDir, lwwMerge(prunedLog(withDir)), vertexLogOrEmpty.unionByName(
      withDir.filter(col("destination_id").isNull).select(
        col("graph_id"), col("source_id").as("vertex_id"), col("is_forward"),
        col("state"), col("updated_at"))))
  }

  /** Steps 1b–4 of the write pipeline: per-edge writes from the batch against the given
    * pre-batch state `snap`, vertex-state dominated and position-resolved.
    */
  private def writeRows(withDir: DataFrame, snap: DataFrame, mergedVertexLog: DataFrame): DataFrame = {
    val wild    = withDir.filter(col("destination_id").isNull)
    val singles = withDir.filter(col("destination_id").isNotNull)

    // wildcard expansion: the op's side of the vertex, skipping Removed edges
    val notRemoved = snap.filter(col("state") =!= State.Removed)
    def expand(isFwd: Boolean): DataFrame = {
      val vcol = if (isFwd) "source_id" else "destination_id"
      wild
        .filter(if (isFwd) col("is_forward") else !col("is_forward"))
        .select(
          col("graph_id"), col("source_id").as(vcol),
          col("state").as("op_state"), col("updated_at").as("op_updated_at")
        )
        .join(notRemoved.select(col("graph_id"), col("source_id"), col("destination_id")),
          Seq("graph_id", vcol))
        .select(
          col("graph_id"), col("source_id"), col("destination_id"),
          col("op_state").as("state"), col("op_updated_at").as("updated_at"),
          lit(null).cast("long").as("position")
        )
    }

    // 2. direction normalization for single-edge ops
    val normSingles = singles.select(
      col("graph_id"),
      when(col("is_forward"), col("source_id")).otherwise(col("destination_id")).as("source_id"),
      when(col("is_forward"), col("destination_id")).otherwise(col("source_id")).as("destination_id"),
      col("state"), col("updated_at"), col("position").cast("long").as("position")
    )

    val perEdge = normSingles.unionByName(expand(isFwd = true)).unionByName(expand(isFwd = false))

    // 3. vertex-state domination
    val vs = vertexLww(mergedVertexLog)
    val fwdReg = vs.filter(col("is_forward"))
      .select(col("graph_id"), col("vertex_id").as("source_id"), col("state").as("fwd_state"))
    val bwdReg = vs.filter(!col("is_forward"))
      .select(col("graph_id"), col("vertex_id").as("destination_id"), col("state").as("bwd_state"))

    val f = coalesce(col("fwd_state"), lit(State.Normal))
    val b = coalesce(col("bwd_state"), lit(State.Normal))
    val o = col("state")
    val (pf, pb, po) = (State.priorityCol(f), State.priorityCol(b), State.priorityCol(o))
    val effState =
      when(pf >= pb && pf >= po, f).when(pb >= po, b).otherwise(o)

    val dominated = perEdge
      .join(fwdReg, Seq("graph_id", "source_id"), "left")
      .join(bwdReg, Seq("graph_id", "destination_id"), "left")
      .select(
        col("graph_id"), col("source_id"), col("destination_id"),
        effState.as("state"), col("updated_at"), col("position")
      )

    // 4. position rule against the pre-batch snapshot
    val resurrected =
      col("old_state").isin(State.Removed, State.Negative) && col("op.state") === State.Normal
    val opPosition =
      coalesce(col("op.position"), graft.functions.GraftFunctions.positionFromUpdatedAt(col("op.updated_at")))
    val newRows = dominated
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
    newRows
  }

  /** S12 — direct metadata sink (reference `writeMetadata`/`writeMetadatas`,
    * `SqlShard.scala:646-697`): append vertex-register writes WITHOUT edge fanout —
    * the path copy/repair uses to move vertex state between replicas (the Multi job's
    * register-plus-fanout is the wildcard branch of [[applyOperations]]). Columns:
    * graph_id, vertex_id, is_forward, state, updated_at.
    */
  def writeVertexStates(registers: DataFrame): EdgeStore =
    new EdgeStore(
      log,
      Some(vertexLogOrEmpty.unionByName(
        registers.select(vertexLogSchema.fieldNames.map(col): _*))),
      compactionHorizon
    )

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
    * LWW merge over the union of both logs (edges AND vertex registers) — no paging
    * loop, no per-row RPCs.
    */
  def repairWith(other: EdgeStore): EdgeStore = {
    val mergedVertex = (vertexLog, other.vertexLog) match {
      case (None, None) => None
      case _            => Some(vertexLogOrEmpty.unionByName(other.vertexLogOrEmpty))
    }
    // the union still lacks whatever either side's compaction discarded: the merged
    // store's oldest truthful cut is the NEWEST of the two horizons
    val mergedHorizon =
      (compactionHorizon.toSeq ++ other.compactionHorizon.toSeq).reduceOption(_ max _)
    new EdgeStore(
      log.select(edgeCols: _*).unionByName(other.log.select(edgeCols: _*)),
      mergedVertex, mergedHorizon)
  }
}

object EdgeStore {

  /** Where-in lists longer than this become broadcast semi-joins instead of IN
    * predicates (reference analog: IN-list size routes to different query classes,
    * `SqlShard.scala:323-349`).
    */
  val WhereInPredicateMax: Int = 1000

  /** Largest op batch (rows) that takes the incremental key-pruned write path; bigger
    * batches fall back to the compacting full-fold form. ~1M distinct touched keys is
    * a ~12 MB broadcast — comfortably inside executor broadcast budgets.
    */
  val IncrementalBatchMax: Long = 1000000L

  val edgeColNames: Seq[String] =
    Seq("graph_id", "source_id", "destination_id", "position", "updated_at", "count", "state")
  def edgeCols: Seq[Column] = edgeColNames.map(col)

  /** Vertex-register log schema: one row per register write (reference `Metadata.scala:29`
    * minus the count, which we derive).
    */
  val vertexLogSchema: StructType = StructType(Seq(
    StructField("graph_id", IntegerType, nullable = false),
    StructField("vertex_id", LongType, nullable = false),
    StructField("is_forward", BooleanType, nullable = false),
    StructField("state", IntegerType, nullable = false),
    StructField("updated_at", IntegerType, nullable = false)
  ))

  def apply(log: DataFrame): EdgeStore = new EdgeStore(log)

  def fromEdges(spark: SparkSession, edges: Seq[Edge]): EdgeStore = {
    import spark.implicits._
    new EdgeStore(
      edges.toDF("graphId", "sourceId", "destinationId", "position", "updatedAt", "count", "state")
        .toDF(edgeColNames: _*)
    )
  }

  /** The LWW merge: one hash aggregation, winner = max (updatedAt, statePriority, position).
    *
    * Implemented with the custom `LwwWinner` TypedImperativeAggregate rather than
    * `max_by(struct(allCols), struct(orderingKey))`: the built-in's struct aggregation
    * buffer disqualifies HashAggregateExec, so Catalyst silently plans a SortAggregate
    * that sorts EVERY partition of the write log by the edge key. LwwWinner runs in
    * ObjectHashAggregateExec — hash-based, partial (map-side) aggregation, no sort —
    * verified identical output, and the plan shape a 100 TB log fold needs
    * (PlanSpec pins it).
    */
  def lwwMerge(writes: DataFrame): DataFrame =
    writes
      .groupBy(col("graph_id"), col("source_id"), col("destination_id"))
      .agg(
        org.apache.spark.sql.graft.LwwWinner
          .column(col("position"), col("updated_at"), col("count"), col("state"))
          .as("w")
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

  /** LWW over the vertex-register log: winner = max (updatedAt, statePriority) — identical
    * ordering to `Metadata.compare` (`Metadata.scala:40-47`). Same ObjectHashAggregate
    * shape as [[lwwMerge]] (position/count pinned to 0 — a full ordering tie implies an
    * identical register, so the result is order-independent).
    */
  private[store] def vertexLww(vertexLog: DataFrame): DataFrame =
    vertexLog
      .groupBy(col("graph_id"), col("vertex_id"), col("is_forward"))
      .agg(
        org.apache.spark.sql.graft.LwwWinner
          .column(lit(0L), col("updated_at"), lit(0), col("state"))
          .as("w")
      )
      .select(
        col("graph_id"), col("vertex_id"), col("is_forward"),
        col("w.state").as("state"), col("w.updated_at").as("updated_at")
      )
}
