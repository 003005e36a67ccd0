package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Physical-type-tolerant event-time access for the `events.ts` column.
  *
  * The driver's testdata has carried `ts` under two parquet representations across
  * generations: TIMESTAMP(NANOS) — which Spark has no timestamp type for, so it reads
  * as BIGINT nanoseconds under `spark.sql.legacy.parquet.nanosAsLong` — and
  * TIMESTAMP(MICROS, isAdjustedToUTC=false), which reads as TIMESTAMP_NTZ. All
  * event-time math in this engine is exact integer arithmetic on epoch MICROSECONDS
  * (the resolution DuckDB normalizes parquet timestamps to, so the oracle's
  * `epoch_us(ts)` matches bit-for-bit from either representation). Dispatching on the
  * dtype the scan actually produced — instead of baking one generation's physical
  * type into every query — keeps the whole analytics surface working against both.
  */
object EventTime {

  /** `ts` as exact epoch-µs BIGINT, whatever timestamp representation the file
    * carries. Pure projection arithmetic: stays inside whole-stage codegen and never
    * blocks scan-level column pruning (only `ts` itself is required).
    *
    * The TIMESTAMP_NTZ branch relies on the session timezone being UTC (pinned in
    * [[GraftSession]]): under UTC the NTZ→LTZ cast is the identity on the underlying
    * micros, so `unix_micros` returns the stored int64 verbatim. On a cluster that
    * cannot pin `spark.sql.session.timeZone`, read the files with
    * `spark.sql.parquet.inferTimestampNTZ.enabled=false` instead — the scan then
    * yields TIMESTAMP and the third branch is timezone-independent.
    */
  def micros(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType         => expr("ts DIV 1000") // TIMESTAMP(NANOS) via nanosAsLong
    case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
    case TimestampType    => unix_micros(col("ts"))
    case dt =>
      throw new IllegalArgumentException(
        s"events.ts has unsupported type $dt — expected BIGINT (ns) or a timestamp")
  }
}
