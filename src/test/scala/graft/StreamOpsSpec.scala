package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.model._
import graft.store.EdgeStore
import graft.streaming.StreamOps

class StreamOpsSpec extends SparkSpec {

  test("windowed write rates with watermark") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Edge]
    val rates = StreamOps.writeRates(
      stream.toDS().toDF(EdgeStore.edgeColNames: _*), "2 minutes", "1 minute")
    val query = rates.writeStream.format("memory").queryName("rates")
      .outputMode(OutputMode.Update()).start()
    try {
      // three writes in minute 0, one in minute 1 (epoch seconds)
      stream.addData(
        edge(alice, bob, 1, at = 10), edge(alice, carl, 2, at = 20),
        edge(bob, carl, 3, at = 50), edge(carl, bob, 4, at = 70)
      )
      query.processAllAvailable()
      val rows = spark.sql("SELECT graph_id, n_writes FROM rates").collect()
        .map(r => r.getInt(0) -> r.getLong(1))
      assert(rows.toSeq.sortBy(_._2) == Seq((FOLLOWS, 1L), (FOLLOWS, 3L)))
    } finally query.stop()
  }

  test("flatMapGroupsWithState maintains per-vertex degree incrementally (A2 semantics)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Edge]
    val degrees = StreamOps.streamingDegree(stream.toDS())
    val query = degrees.toDF().writeStream.format("memory").queryName("degrees")
      .outputMode(OutputMode.Update()).start()

    def degreeOf(src: Long): Long =
      spark.sql(s"SELECT degree FROM degrees WHERE sourceId = $src ORDER BY degree")
        .collect().last.getLong(0)

    try {
      stream.addData(
        edge(alice, bob, 1, at = 100), edge(alice, carl, 2, at = 100))
      query.processAllAvailable()
      assert(degreeOf(alice) == 2L)

      // remove one edge, replay an older add (must be ignored by LWW state)
      stream.addData(
        edge(alice, bob, 1, at = 120, state = State.Removed),
        edge(alice, carl, 2, at = 90, state = State.Removed) // stale, loses
      )
      query.processAllAvailable()
      val last = spark.sql("SELECT degree FROM degrees WHERE sourceId = 1").collect()
        .map(_.getLong(0)).last
      assert(last == 1L, "bob removed, stale carl-removal ignored")
    } finally query.stop()
  }
}
