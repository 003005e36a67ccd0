package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

import graft.store.EdgeStore

/** Structured-Streaming ingestion of the write pipeline (reference W1-W4, SURVEY.md §2.8):
  * the reference queues writes in kestrel and applies them asynchronously with
  * at-least-once replay; idempotence + commutativity of the LWW merge make replay safe
  * (`doc/blog.md:67-130`). Here the queue is any streaming source and each micro-batch is
  * folded into the store with the same merge — `foreachBatch` gives exactly-once per
  * batch, and even under replay the merge converges (that's FlockDB's out-of-order story:
  * late data is handled by LWW, not by watermarks).
  *
  * The accumulated log is compacted every `compactEvery` batches (snapshot replaces log)
  * so state stays bounded by |edges|, not by |writes|.
  */
final class StreamingEdgeIngest(initial: EdgeStore, compactEvery: Int = 8) {

  @volatile private var store: EdgeStore = initial

  /** Current consistent view (replaced atomically per micro-batch). */
  def current: EdgeStore = store

  /** Attach to a stream of raw edge writes (columns: graph_id, source_id,
    * destination_id, position, updated_at, count, state). Caller starts the returned
    * writer. The vertex-register log rides along untouched (raw edge rows are the
    * replication/copy stream — they never carry vertex ops).
    */
  def writer(writes: DataFrame): DataStreamWriter[Row] =
    writes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val merged = new EdgeStore(
          store.log.unionByName(batch.select(EdgeStore.edgeCols: _*)), store.vertexLog)
        store =
          if (batchId % compactEvery == compactEvery - 1)
            // compact: LWW-collapse the log so it doesn't grow with write volume
            new EdgeStore(merged.snapshot.localCheckpoint(eager = true), store.vertexLog)
          else merged
      }

  def start(writes: DataFrame): StreamingQuery = writer(writes).start()

  /** Attach to a stream of write OPERATIONS (the reference's execute pipeline as a
    * stream: columns graph_id, source_id, destination_id (null = wildcard), state,
    * updated_at, position, optional is_forward). Each micro-batch runs the full write
    * semantics — vertex-register writes, direction normalization, W2 state domination,
    * wildcard fanout — via `EdgeStore.applyOperations`, which also compacts the log per
    * batch, so no separate compaction cadence is needed.
    */
  def opsWriter(ops: DataFrame): DataStreamWriter[Row] =
    ops.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store = store.applyOperations(batch)
      }

  def startOps(ops: DataFrame): StreamingQuery = opsWriter(ops).start()
}
