package graft

import org.apache.spark.sql.SparkSession

/** Recommended session bootstrap for this engine. */
object GraftSession {

  /** Local builder with the configs every entry point needs. `cpus` also sizes
    * `spark.sql.shuffle.partitions` (on a real cluster size that to 2-3× total cores,
    * or leave AQE coalescing to shrink it).
    */
  def builder(cpus: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      // the engine's native expressions as SQL functions (graft_dot, graft_lww_winner,
      // ...) — same injection path a cluster uses via --conf spark.sql.extensions
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      // some testdata generations carry TIMESTAMP(NANOS) columns (Spark has no ns
      // timestamp type — this reads them as BIGINT ns; EventTime.micros dispatches)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE: runtime partition coalescing + skew-join splitting — the safety net for
      // skewed vertices (celebrity nodes) at scale
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // ObjectHashAggregate (the LwwWinner merge) reverts to SORT-based aggregation
      // once a task's hash map exceeds this many keys — the 128 default re-introduces
      // exactly the per-partition sort LwwWinner exists to avoid. The LWW buffer is a
      // 6-field object (~64 B); 4M keys ≈ 256 MB/task worst case, fine for the target
      // executor sizing and far above per-task key counts after map-side combine.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
}
