package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model._
import graft.store.EdgeStore
import graft.streaming.RetryingEdgeIngest

/** W4 error-queue mechanics end-to-end (reference `doc/blog.md:110-130`,
  * `config/test.scala:96` errorLimit): failed writes retry through the SAME code
  * path, a transient outage converges once it lifts, a permanently-bad record
  * dead-letters after EXACTLY maxAttempts tries, and an inspected dead letter can be
  * re-injected after the "bug" is fixed.
  */
class RetryIngestSpec extends SparkSpec {

  private def feedOnce(ingest: RetryingEdgeIngest, edges: Edge*): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Edge]
    val query = ingest.writer(stream.toDS().toDF(EdgeStore.edgeColNames: _*)).start()
    try { stream.addData(edges: _*); query.processAllAvailable() }
    finally query.stop()
  }

  test("a transiently-failing record retries through the same path and converges; LWW keeps replays idempotent") {
    // "shard holding carl's partition is down" for the first two tries: the reject
    // predicate sees the pending relation INCLUDING __attempts, the per-record
    // failure count, so the outage is expressed as data, not a mock
    val ingest = new RetryingEdgeIngest(
      storeOf(), maxAttempts = 5,
      reject = _ => when(col("destination_id") === carl && col("__attempts") < 2, lit("shard down")))

    feedOnce(ingest,
      edge(alice, bob, pos = 1, at = 100),
      edge(alice, carl, pos = 2, at = 100))
    // bob landed immediately; carl is queued with one failed attempt
    assert(snapshotOf(ingest.current).keySet == Set((alice, bob)))
    assert(ingest.retryQueue.select("destination_id", "__attempts").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((carl, 1)))

    // periodic error-queue flush #1: still down (attempts 1 < 2) — fails again
    ingest.flushRetries()
    assert(snapshotOf(ingest.current).keySet == Set((alice, bob)))
    // flush #2: attempts reads 2 — outage over, the record applies via the normal fold
    ingest.flushRetries()
    assert(snapshotOf(ingest.current).keySet == Set((alice, bob), (alice, carl)))
    assert(ingest.retryQueue.isEmpty && ingest.deadLetters.isEmpty)

    // at-least-once redelivery of the SAME write is a no-op (LWW idempotence)
    feedOnce(ingest, edge(alice, carl, pos = 2, at = 100))
    assert(snapshotOf(ingest.current).keySet == Set((alice, bob), (alice, carl)))
  }

  test("a permanently-bad record dead-letters after exactly maxAttempts tries, with its reason") {
    val ingest = new RetryingEdgeIngest(storeOf(), maxAttempts = 3)
    // state 9 violates the ordinal range — invalidEdge (the default reject) never accepts it
    feedOnce(ingest,
      edge(alice, bob, pos = 1, at = 100),
      edge(alice, carl, pos = 2, at = 100, state = 9))
    assert(snapshotOf(ingest.current).keySet == Set((alice, bob)))

    // tries 2: still queued, NOT yet dead — the bound must bind exactly, not early
    ingest.flushRetries()
    assert(ingest.deadLetters.isEmpty)
    assert(ingest.retryQueue.select("__attempts").collect().map(_.getInt(0)).toSeq == Seq(2))

    // try 3 = maxAttempts: dumped to the dead-letter log with reason + attempt count
    ingest.flushRetries()
    assert(ingest.retryQueue.isEmpty)
    val dead = ingest.deadLetters.select("destination_id", "attempts", "reason").collect()
    assert(dead.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((carl, 3, "state ordinal out of range")))
    // further flushes must not resurrect or re-count it
    ingest.flushRetries()
    assert(ingest.deadLetters.count() == 1 && ingest.retryQueue.isEmpty)
  }

  test("an inspected dead letter re-injects and applies once the failure cause is fixed") {
    // the reference loop: dump after too many cycles -> inspect -> fix -> re-inject.
    // The "fix" is a driver-side flag the reject closure consults at plan-build time
    // (reject is re-invoked per batch), standing in for the shard coming back.
    @volatile var shardUp = false
    val ingest = new RetryingEdgeIngest(
      storeOf(), maxAttempts = 2,
      reject = _ =>
        if (shardUp) lit(null).cast("string")
        else when(col("destination_id") === carl, lit("shard down")))

    feedOnce(ingest, edge(alice, carl, pos = 2, at = 100))
    ingest.flushRetries() // attempt 2 = maxAttempts -> dead
    assert(ingest.deadLetters.count() == 1 && snapshotOf(ingest.current).isEmpty)

    shardUp = true
    ingest.reinject() // counter resets; next cycle services it
    assert(ingest.deadLetters.isEmpty)
    ingest.flushRetries()
    assert(snapshotOf(ingest.current).keySet == Set((alice, carl)))
    assert(ingest.retryQueue.isEmpty && ingest.deadLetters.isEmpty)
  }

  test("retry state stays bounded: the queue never holds more than the in-flight failures") {
    val ingest = new RetryingEdgeIngest(
      storeOf(), maxAttempts = 10,
      reject = _ => when(col("destination_id") === carl && col("__attempts") < 3, lit("down")))
    // three batches re-deliver the same failing write (at-least-once): the queue must
    // not accumulate one row per delivery x per retry — each cycle's failures REPLACE
    // the queue, so it holds one row per distinct in-flight failing record delivery
    feedOnce(ingest, edge(alice, carl, pos = 2, at = 100))
    assert(ingest.retryQueue.count() == 1)
    feedOnce(ingest, edge(alice, carl, pos = 2, at = 100))
    assert(ingest.retryQueue.count() == 2) // redelivered copy joins the queue...
    ingest.flushRetries(); ingest.flushRetries(); ingest.flushRetries()
    // ...but once attempts pass the outage window both copies apply and drain
    assert(ingest.retryQueue.isEmpty)
    assert(snapshotOf(ingest.current).keySet == Set((alice, carl)))
  }
}
