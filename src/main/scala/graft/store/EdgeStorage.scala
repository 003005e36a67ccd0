package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence layout for edge stores at cluster scale.
  *
  * The reference shards edges by (graphId, sourceId-hash-range) across MySQL hosts with
  * a forwarding table (`ForwardingManager.scala:24-38`, `doc/blog.md:84-93`). The Spark
  * equivalent is directory partitioning + in-file ordering:
  *
  *   - `partitionBy(graph_id)` → partition pruning: a query on one graph never lists the
  *     others' files (the reference's per-graph tables).
  *   - `repartition(source_id)` + `sortWithinPartitions(source_id, state, position)` →
  *     each file covers a hash-bucket of vertices, laid out in the PK order of the
  *     reference's index `(source_id, state, position)` (`SqlShard.scala:56-68`): an
  *     adjacency scan touches one bucket and reads rows min/max-pruned by the sort —
  *     parquet row-group stats on source_id become the "index".
  *
  * At 100 TB: ~`buckets` files per graph, each internally sorted; adjacency queries
  * prune to 1 partition dir × few row groups; the LWW snapshot shuffle hashes on the
  * same key the layout is bucketed by.
  */
object EdgeStorage {

  /** Write a snapshot (or log) with the scale layout. `buckets` ≈ cluster write
    * parallelism; at 100 TB choose so each file is 128-512 MB.
    */
  def save(df: DataFrame, path: String, buckets: Int = 32): Unit =
    df.repartition(buckets, col("source_id"))
      .sortWithinPartitions(col("source_id"), col("state"), col("position"))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("graph_id")
      .parquet(path)

  /** Reload. Filters on graph_id prune directories; filters on source_id prune row
    * groups via parquet min/max stats (verify with `.explain`: PushedFilters).
    */
  def load(spark: SparkSession, path: String): EdgeStore =
    EdgeStore(spark.read.parquet(path))

  /** Bucketed-table variant of [[save]]: `bucketBy(source_id)` + in-bucket sort,
    * registered in the catalog. Where [[save]] gives row-group pruning, a bucketed
    * table additionally gives Spark a PROVABLE `HashPartitioning(source_id)` at scan
    * time, so every operation that clusters on the vertex — the LWW snapshot fold
    * (grouping contains source_id), merge/copy joins between two stores bucketed the
    * same way, adjacency groupBys — plans with NO shuffle at all: at 100 TB the
    * store's dominant recurring cost (re-shuffling the log on every fold) is paid
    * once at write time and amortized over every subsequent read. This is the Spark
    * equivalent of the reference keeping each shard pre-ordered by its
    * `(source_id, state, position)` index (`SqlShard.scala:56-68`).
    */
  def saveTable(df: DataFrame, table: String, buckets: Int = 32): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, "source_id")
      .sortBy("source_id", "state", "position")
      .saveAsTable(table)

  /** Reload a [[saveTable]] store; folds/joins keyed on source_id are shuffle-free. */
  def loadTable(spark: SparkSession, table: String): EdgeStore =
    EdgeStore(spark.table(table))

  /** S10 — bulk unsafe insert (reference `bulkUnsafeInsertEdges`,
    * `SqlShard.scala:402-417`): append without conflict handling; the next LWW snapshot
    * resolves duplicates.
    */
  def appendUnsafe(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).partitionBy("graph_id").parquet(path)

  /** Maintenance compaction: fold the accumulated log (base + unsafe appends) into its
    * LWW snapshot and rewrite the layout — the job that keeps on-disk size bounded by
    * |edges| instead of |writes| at scale. Writes to a scratch path first, then swaps,
    * so a crash mid-compaction never leaves the store truncated (the scratch dir is
    * simply re-written next run).
    */
  def compact(spark: SparkSession, path: String, buckets: Int = 32): Unit = {
    val scratch = path + "_compacting"
    val snapshot = load(spark, path).snapshot
    save(snapshot, scratch, buckets)
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(hadoopPath, true)
    fs.rename(new org.apache.hadoop.fs.Path(scratch), hadoopPath)
  }
}
