package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins [[EventTime.micros]]'s dtype dispatch: the same instants must come out as the
  * same epoch-µs BIGINT whether `ts` arrives as BIGINT nanoseconds (the
  * TIMESTAMP(NANOS) testdata generation read under nanosAsLong) or as TIMESTAMP_NTZ
  * microseconds (the current generation) — the regression behind round 8's 12
  * silently-dropped ev/o queries, where every event-time query assumed the ns form.
  */
class EventTimeSpec extends SparkSpec {

  private val microsFixture = Seq(0L, 1L, 1700000000L * 1000000L, 1700000003L * 1000000L + 999999L)

  test("micros: BIGINT-ns and TIMESTAMP_NTZ-µs representations agree exactly") {
    import spark.implicits._
    val asNanos = microsFixture.map(us => Tuple1(us * 1000L)).toDF("ts")
    val asNtz = microsFixture.map(Tuple1(_)).toDF("us")
      .select(expr("CAST(timestamp_micros(us) AS TIMESTAMP_NTZ)").as("ts"))
    assert(asNanos.schema("ts").dataType == LongType)
    assert(asNtz.schema("ts").dataType == TimestampNTZType)
    val fromNanos = asNanos.select(EventTime.micros(asNanos)).as[Long].collect().toSeq
    val fromNtz = asNtz.select(EventTime.micros(asNtz)).as[Long].collect().toSeq
    assert(fromNanos == microsFixture)
    assert(fromNtz == microsFixture)
  }

  test("micros: TIMESTAMP (ltz) representation agrees too") {
    import spark.implicits._
    val asLtz = microsFixture.map(Tuple1(_)).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(asLtz.schema("ts").dataType == TimestampType)
    assert(asLtz.select(EventTime.micros(asLtz)).as[Long].collect().toSeq == microsFixture)
  }

  test("micros: rejects an unusable ts type loudly") {
    import spark.implicits._
    val bad = Seq("2020-01-01").toDF("ts")
    intercept[IllegalArgumentException](EventTime.micros(bad))
  }

  test("the driver's events table reads and normalizes end-to-end") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val n = ev.select(EventTime.micros(ev).as("tsu"))
      .filter(col("tsu") > 0L).count()
    assert(n == ev.count())
    // and the event-time queries built on it run against the current generation
    assert(AnalyticsQueries.hourlyRollup(spark, "/root/testdata/sf0.001").count() > 0)
    assert(AnalyticsQueries.sessionize(spark, "/root/testdata/sf0.001").count() > 0)
  }
}
