package graft

import java.nio.file.Files

import graft.model.State
import graft.sources.EdgeSources

/** Ingest-adapter contract: schema-enforced reads, corrupt-record quarantine, F1
  * position derivation for position-less feeds, and LWW-fold equivalence with the
  * native log.
  */
class EdgeSourcesSpec extends SparkSpec {

  private def write(lines: Seq[String], suffix: String): String = {
    val dir = Files.createTempDirectory("graft-src").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/part-0000$suffix"), lines.mkString("\n"))
    dir
  }

  test("JSON feed: clean rows fold, malformed and field-missing rows are quarantined") {
    val dir = write(Seq(
      """{"graph_id":1,"source_id":10,"destination_id":20,"position":5,"updated_at":100,"state":0}""",
      """{"graph_id":1,"source_id":10,"destination_id":20,"position":6,"updated_at":200,"state":1}""",
      """{"graph_id":1,"source_id":11,"destination_id":21,"updated_at":150,"state":0}""",
      """{"graph_id":1,"destination_id":99,"updated_at":150,"state":0}""", // no source_id
      """not json at all"""
    ), ".json")
    val (log, corrupt) = EdgeSources.readJsonEdgeLog(spark, dir)
    assert(log.count() == 3)
    assert(corrupt.count() == 2, corrupt.collect().mkString("|"))

    val snap = graft.store.EdgeStore(log).snapshot.collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r).toMap
    // LWW: the updated_at=200 Removed write wins the (10, 20) key
    assert(snap((10L, 20L)).getAs[Int]("state") == State.Removed)
    // position-less feed row derives the F1 position from updated_at
    assert(snap((11L, 21L)).getAs[Long]("position") == (150L * 1000L) << 20)
  }

  test("CSV dump: header + schema enforced, same fold as the JSON path") {
    val dir = write(Seq(
      "graph_id,source_id,destination_id,position,updated_at,count,state",
      "1,10,20,5,100,0,0",
      "1,10,20,6,200,0,1",
      "oops,not,numbers,at,all,x,y"
    ), ".csv")
    val (log, corrupt) = EdgeSources.readCsvEdgeLog(spark, dir)
    assert(log.count() == 2)
    assert(corrupt.count() == 1)
    val snap = EdgeSources.storeFromCsv(spark, dir).snapshot.collect()
    assert(snap.length == 1 && snap.head.getAs[Int]("state") == State.Removed)
  }

  test("streaming JSON feed drives StreamingEdgeIngest; quarantine lands in its own sink") {
    import graft.store.EdgeStore
    val dir = write(Seq(
      """{"graph_id":1,"source_id":10,"destination_id":20,"position":5,"updated_at":100,"state":0}""",
      """{"graph_id":1,"source_id":10,"destination_id":20,"position":6,"updated_at":200,"state":2}""",
      """garbage line"""
    ), ".json")
    val (clean, audit) = EdgeSources.streamJsonEdgeLog(spark, dir)
    val ingest = new graft.streaming.StreamingEdgeIngest(
      EdgeStore(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.testgraph.TestGraph.store(spark, "/root/testdata/sf0.001").log.schema)))
    val q1 = ingest.start(clean)
    val q2 = audit.writeStream.format("memory").queryName("edge_quarantine")
      .outputMode("append").start()
    try {
      q1.processAllAvailable(); q2.processAllAvailable()
      val snap = ingest.current.snapshot.collect()
      assert(snap.length == 1 && snap.head.getAs[Int]("state") == State.Archived)
      assert(spark.sql("SELECT * FROM edge_quarantine").count() == 1)
    } finally { q1.stop(); q2.stop() }
  }

  test("quarantine replay end-to-end: repaired corrupt rows re-ingest safely under LWW") {
    // the reference's error-queue loop (doc/blog.md:110-130): a failed write parks in
    // an error queue and is re-driven later; replay is safe because the write model is
    // idempotent. Here: quarantined rows -> upstream repair -> REPLAY through the same
    // StreamingEdgeIngest.writer, alongside an at-least-once re-delivery of an
    // already-applied row — the final store must equal a store whose feed was correct
    // from the start.
    import graft.store.EdgeStore
    val dir = write(Seq(
      """{"graph_id":1,"source_id":10,"destination_id":20,"position":5,"updated_at":100,"state":0}""",
      """{"graph_id":1,"source_id":11,"destination_id":21,"position":7,"updated_at":110,"state":0}""",
      """{"graph_id":1,"source_id":12,"destination_id":22,"updated_at":300,"state":"active"}""", // bad enum
      """{"graph_id":1,"destination_id":99,"updated_at":150,"state":2}"""                        // no source_id
    ), ".json")
    val (clean, audit) = EdgeSources.streamJsonEdgeLog(spark, dir)
    val ingest = new graft.streaming.StreamingEdgeIngest(
      EdgeStore(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.testgraph.TestGraph.store(spark, "/root/testdata/sf0.001").log.schema)))
    val q1 = ingest.start(clean)
    val q2 = audit.writeStream.format("memory").queryName("replay_quarantine")
      .outputMode("append").start()
    q1.processAllAvailable(); q2.processAllAvailable(); q1.stop(); q2.stop()
    assert(ingest.current.snapshot.count() == 2)

    // upstream repair of exactly what the quarantine relation holds: map the bad
    // enum to its code, fill the missing key field
    val parked = spark.sql("SELECT record FROM replay_quarantine").collect().map(_.getString(0))
    assert(parked.length == 2, parked.mkString("|"))
    val repaired = parked.map { r =>
      val typed = r.replace("\"state\":\"active\"", "\"state\":0")
      if (typed.contains("\"source_id\"")) typed
      else typed.replace("{", """{"source_id":13,""")
    }
    // the replay feed re-delivers an already-applied row too (at-least-once)
    val replayDir = write(repaired.toSeq :+
      """{"graph_id":1,"source_id":10,"destination_id":20,"position":5,"updated_at":100,"state":0}""",
      ".json")
    val (replayClean, replayAudit) = EdgeSources.streamJsonEdgeLog(spark, replayDir)
    val q3 = ingest.start(replayClean)
    val q4 = replayAudit.writeStream.format("memory").queryName("replay_quarantine2")
      .outputMode("append").start()
    try {
      q3.processAllAvailable(); q4.processAllAvailable()
      // nothing re-quarantines, and the store equals the correct-from-the-start fold
      assert(spark.sql("SELECT * FROM replay_quarantine2").count() == 0)
      val viaReplay = ingest.current.snapshot.collect().map(_.toString).sorted
      val correctFeed = write(Seq(
        """{"graph_id":1,"source_id":10,"destination_id":20,"position":5,"updated_at":100,"state":0}""",
        """{"graph_id":1,"source_id":11,"destination_id":21,"position":7,"updated_at":110,"state":0}""",
        """{"graph_id":1,"source_id":12,"destination_id":22,"updated_at":300,"state":0}""",
        """{"graph_id":1,"source_id":13,"destination_id":99,"updated_at":150,"state":2}"""
      ), ".json") // the type-corrupt row repairs to state 0; the keyless row to source 13
      val oneShot = EdgeSources.storeFromJson(spark, correctFeed).snapshot
        .collect().map(_.toString).sorted
      assert(viaReplay.sameElements(oneShot))
    } finally { q3.stop(); q4.stop() }
  }

  test("re-ingest replay converges: folding the feed twice equals folding it once") {
    val dir = write(Seq(
      """{"graph_id":1,"source_id":1,"destination_id":2,"position":1,"updated_at":100,"state":0}""",
      """{"graph_id":1,"source_id":1,"destination_id":3,"position":2,"updated_at":100,"state":0}"""
    ), ".json")
    val once = EdgeSources.storeFromJson(spark, dir).snapshot
    val twice = graft.store.EdgeStore(
      EdgeSources.readJsonEdgeLog(spark, dir)._1
        .unionByName(EdgeSources.readJsonEdgeLog(spark, dir)._1)).snapshot
    assert(once.collect().sortBy(_.toString).sameElements(twice.collect().sortBy(_.toString)))
  }
}
