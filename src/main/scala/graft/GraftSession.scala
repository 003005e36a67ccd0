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
      .config("spark.sql.shuffle.partitions", cpus.toString)
      // driver test data carries TIMESTAMP(NANOS) columns
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE: runtime partition coalescing + skew-join splitting — the safety net for
      // skewed vertices (celebrity nodes) at scale
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
}
