package graft.testgraph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.State
import graft.store.EdgeStore

/** Canonical derivation of a FlockDB-shaped edge log from the driver's `events` table
  * (TESTDATA.md). Every transform is pure integer arithmetic on `event_id`/`user_id`, so
  * the identical relation is expressible in DuckDB SQL (the driver's oracle) — see the
  * `*Sql` fragments below, which MUST stay in lockstep with the DataFrame derivation.
  *
  * Shape: 3 graphs; sources = users; ~211 distinct destinations per graph so that
  * (graph, source, destination) keys collide across events — duplicate keys are the point:
  * they exercise the LWW merge (multiple "writes" per edge with colliding `updated_at`
  * values and all four states).
  */
object TestGraph {

  /** The raw edge write log (may contain many writes per edge key). */
  def edgeLog(spark: SparkSession, sfDir: String): DataFrame = {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val eid = col("event_id")
    val stateBucket = (eid * 13) % 10
    events.select(
      (lit(1) + eid % 3).cast("int").as("graph_id"),
      col("user_id").as("source_id"),
      (lit(1) + (eid * 7919) % 97).as("destination_id"),
      eid.as("position"),
      (lit(1000000) + (eid * 31) % 500).cast("int").as("updated_at"),
      lit(0).as("count"),
      when(stateBucket < 7, State.Normal)
        .when(stateBucket === 7, State.Removed)
        .when(stateBucket === 8, State.Archived)
        .otherwise(State.Negative)
        .cast("int")
        .as("state")
    )
  }

  def store(spark: SparkSession, sfDir: String): EdgeStore = EdgeStore(edgeLog(spark, sfDir))

  /** Store over the already-folded snapshot, eagerly materialized. Write-pipeline
    * queries consume the base state several times (op derivation, domination joins,
    * final merge) with different pushed projections, so the lazy form re-runs the
    * events→log derivation and the LWW fold per consumer. Folding once and sharing the
    * compacted materialized form is sound (lww is idempotent: lww(lww(L)) = lww(L)) and
    * mirrors a real deployment, where the stored table IS the compacted snapshot.
    */
  def compactedStore(spark: SparkSession, sfDir: String): EdgeStore =
    new EdgeStore(
      store(spark, sfDir).snapshot.localCheckpoint(eager = true),
      None,
      // compacted ⇒ tagged: asOf below the horizon must throw, not under-report.
      // Conservative static bound (no extra pass per call): the fixture's updated_at
      // domain is [1000000, 1000500), so every discarded loser sits below this.
      Some(CompactionHorizon))

  /** Upper bound of [[edgeLog]]'s `updated_at` domain — sound compaction horizon for
    * [[compactedStore]] (any tighter bound would cost a per-call pass over the log;
    * `EdgeStorage.compact` computes the exact one for persisted stores).
    */
  val CompactionHorizon: Int = 1000500

  // ---------------------------------------------------------------------------
  // DuckDB oracle fragments (dialect: DuckDB 1.0). Keep in lockstep with above.
  // ---------------------------------------------------------------------------

  /** Raw log — mirror of [[edgeLog]]. */
  val rawSql: String =
    """SELECT CAST(1 + event_id % 3 AS INTEGER) AS graph_id,
      |       user_id AS source_id,
      |       1 + (event_id * 7919) % 97 AS destination_id,
      |       event_id AS position,
      |       CAST(1000000 + (event_id * 31) % 500 AS INTEGER) AS updated_at,
      |       CAST(CASE WHEN (event_id * 13) % 10 < 7 THEN 0
      |                 WHEN (event_id * 13) % 10 = 7 THEN 1
      |                 WHEN (event_id * 13) % 10 = 8 THEN 2
      |                 ELSE 3 END AS INTEGER) AS state
      |FROM events""".stripMargin

  /** LWW state-priority ordinal as a SQL CASE (Normal < Negative < Archived < Removed). */
  val prioritySql: String =
    "CASE state WHEN 0 THEN 0 WHEN 3 THEN 1 WHEN 2 THEN 2 ELSE 3 END"

  /** The one LWW-snapshot window, parameterized by an optional log-prefix cut — the
    * single source of truth both CTE forms build on, so the ordering can never
    * diverge between the current and the as-of mirror.
    */
  private def snapshotCteOver(logPredicate: Option[String]): String = {
    val where = logPredicate.map(p => s" WHERE $p").getOrElse("")
    s"""WITH edges_raw AS ($rawSql),
       |edges AS (
       |  SELECT graph_id, source_id, destination_id, position, updated_at, state
       |  FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY graph_id, source_id, destination_id
       |      ORDER BY updated_at DESC, $prioritySql DESC, position DESC) AS rn
       |    FROM edges_raw$where)
       |  WHERE rn = 1
       |)""".stripMargin
  }

  /** CTE prelude defining `edges_raw` (the log) and `edges` (the LWW snapshot:
    * per key the max (updated_at, statePriority, position) row — EdgeStore.lwwMerge).
    */
  val snapshotCte: String = snapshotCteOver(None)

  /** CTE defining `edges` as the snapshot AS OF `ts`: the identical LWW window over
    * the log prefix `updated_at <= ts` — mirror of `EdgeStore.asOf(ts).snapshot`.
    */
  def snapshotAsOfCte(ts: Int): String = snapshotCteOver(Some(s"updated_at <= $ts"))

  /** CTE adding `meta`: per-vertex dominant state + count (EdgeStore.metadata). */
  val metadataCte: String =
    s"""$snapshotCte,
       |per_state AS (
       |  SELECT graph_id, source_id, state, COUNT(*) AS c, MAX(updated_at) AS mu
       |  FROM edges GROUP BY 1, 2, 3
       |),
       |meta AS (
       |  SELECT graph_id, source_id, state, c, mu
       |  FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY graph_id, source_id
       |      ORDER BY mu DESC, $prioritySql DESC) AS rn
       |    FROM per_state)
       |  WHERE rn = 1
       |)""".stripMargin
}
