package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.EdgeStore

/** Ingest adapters: build an edge-write log (and thence an [[EdgeStore]]) from the
  * interchange formats a migrating deployment actually has — JSON-lines write feeds
  * and CSV dumps — not just the engine's own parquet layout.
  *
  * Contract shared by both readers:
  *   - The schema is ENFORCED, never inferred: at 100 TB an inference pass is a
  *     second full scan, and a drifting upstream field must fail loudly at read
  *     definition, not silently retype a column.
  *   - Malformed records are AUDITED, not dropped: PERMISSIVE mode routes any row
  *     that fails the schema into a corrupt-record column; [[split]] separates the
  *     clean log from the audit relation so ingest can land good rows and quarantine
  *     the rest in one pass (the reference's error-queue role —
  *     `/root/reference/src/main/scala/com/twitter/flockdb/jobs/package.scala` is
  *     its async analog; here quarantine is a relation, replay is re-ingest, and the
  *     LWW fold makes replays idempotent).
  *   - These are INGEST formats. Text scans have no predicate pushdown or row-group
  *     skipping, so serving reads come from the parquet/bucketed layout — ingest
  *     lands via [[graft.store.EdgeStorage.save]] and queries never touch the text
  *     again.
  */
object EdgeSources {

  /** Edge-write schema + one corrupt-record capture column. */
  private val corruptCol = "_corrupt_record"

  private val writeSchema: StructType = StructType(
    EdgeStore.edgeColNames.map {
      case c @ "graph_id"            => StructField(c, IntegerType, nullable = true)
      case c @ ("updated_at")        => StructField(c, IntegerType, nullable = true)
      case c @ "state"               => StructField(c, IntegerType, nullable = true)
      case c                         => StructField(c, LongType, nullable = true)
    } :+ StructField(corruptCol, StringType, nullable = true))

  /** (clean edge log, corrupt-record audit) from a raw permissive read. A row is
    * clean iff it carries the non-nullable key/state fields — a line that parses but
    * omits `source_id` is quarantined, not silently nulled into the fold, and a
    * MALFORMED line has every parsed field null (PERMISSIVE semantics), so the same
    * test quarantines it. Deliberately NOT a filter on the corrupt-record column:
    * Spark's text sources evaluate corrupt-column predicates inconsistently across
    * plan shapes (column pruning changes what the parser marks), so the clean/audit
    * split must rest on parsed fields only; the corrupt column is read purely as the
    * audit PAYLOAD.
    */
  private def split(raw: DataFrame): (DataFrame, DataFrame) = {
    val required = Seq("graph_id", "source_id", "destination_id", "updated_at", "state")
    val clean = required.map(col(_).isNotNull).reduce(_ && _)
    (
      raw.filter(clean)
        .select(
          col("graph_id"), col("source_id"), col("destination_id"),
          // position is derivable (F1) when the feed omits it; count is storage-owned
          coalesce(col("position"),
            graft.functions.GraftFunctions.positionFromUpdatedAt(col("updated_at"))).as("position"),
          col("updated_at"),
          coalesce(col("count"), lit(0L)).cast("int").as("count"),
          col("state")),
      raw.filter(!clean)
        // malformed lines carry the raw text; parse-but-incomplete rows render their
        // parsed fields so the quarantine is never an empty record
        .select(coalesce(
          col(corruptCol),
          to_json(struct((EdgeStore.edgeColNames).map(col): _*))).as("record"))
    )
  }

  /** JSON-lines edge-write feed → (clean log, corrupt audit).
    *
    * Parser edge (verified on Spark 4.1): a line whose object is UNTERMINATED
    * (truncated before the closing brace) is silently dropped by the Jackson
    * stream reader — it produces neither a clean row nor a corrupt record, so it
    * cannot be audited here. Garbage lines, type mismatches, and missing fields
    * all quarantine correctly; feeds at risk of mid-object truncation (e.g.
    * non-atomic appends) need an upstream line-integrity check.
    */
  def readJsonEdgeLog(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    split(spark.read
      .schema(writeSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path))

  /** Headered CSV edge dump → (clean log, corrupt audit). */
  def readCsvEdgeLog(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    split(spark.read
      .schema(writeSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path))

  /** Streaming twin of [[readJsonEdgeLog]]: a file-source JSON-lines feed split into
    * (clean write stream, quarantine stream) — the migration on-ramp for
    * [[graft.streaming.StreamingEdgeIngest]]: route the clean side into its
    * `writer`, the audit side to a quarantine sink; LWW replay-safety covers
    * re-delivered files. Both sides are streaming DataFrames off ONE source.
    */
  def streamJsonEdgeLog(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    split(spark.readStream
      .schema(writeSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path))

  /** Convenience: store over a JSON feed's clean rows (audit discarded — use
    * [[readJsonEdgeLog]] when quarantine matters).
    */
  def storeFromJson(spark: SparkSession, path: String): EdgeStore =
    EdgeStore(readJsonEdgeLog(spark, path)._1)

  /** Convenience: store over a CSV dump's clean rows. */
  def storeFromCsv(spark: SparkSession, path: String): EdgeStore =
    EdgeStore(readCsvEdgeLog(spark, path)._1)
}
