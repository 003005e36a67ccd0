package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{Edge, State}

/** Streaming query operators over the edge-write stream. */
object StreamOps {

  /** Windowed write-rate monitoring: writes per (graph, event-time window) with a
    * watermark bounding state. `updated_at` epoch-seconds is the event time.
    */
  def writeRates(
      writes: DataFrame,
      watermarkDelay: String = "2 minutes",
      windowLength: String = "1 minute"
  ): DataFrame =
    writes
      .withColumn("event_time", timestamp_seconds(col("updated_at")))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), windowLength), col("graph_id"))
      .agg(count(lit(1)).as("n_writes"))
      .select(
        col("window.start").as("window_start"),
        col("graph_id"),
        col("n_writes")
      )

  case class VertexDegree(graphId: Int, sourceId: Long, degree: Long)

  /** Incremental per-vertex degree maintenance — the reference's A2 count-delta path
    * (`SqlShard.scala:470-524`) as streaming state: each vertex's group state holds its
    * current adjacency LWW registers; every micro-batch folds new writes in with the
    * same (updatedAt, statePriority, position) rule and emits the updated Normal-degree.
    * Out-of-order and replayed writes converge exactly like the batch merge.
    */
  def streamingDegree(writes: Dataset[Edge]): Dataset[VertexDegree] = {
    import writes.sparkSession.implicits._

    def wins(a: Edge, b: Edge): Boolean = {
      implicit val ord: Ordering[(Int, Int, Long)] = Ordering.Tuple3
      ord.gt(
        (a.updatedAt, State.priority(a.state), a.position),
        (b.updatedAt, State.priority(b.state), b.position)
      )
    }

    def fold(
        key: (Int, Long),
        batch: Iterator[Edge],
        state: GroupState[Map[Long, Edge]]
    ): Iterator[VertexDegree] = {
      val current = state.getOption.getOrElse(Map.empty[Long, Edge])
      val merged = batch.foldLeft(current) { (m, e) =>
        m.get(e.destinationId) match {
          case Some(old) if !wins(e, old) => m
          case _                          => m.updated(e.destinationId, e)
        }
      }
      state.update(merged)
      Iterator.single(
        VertexDegree(key._1, key._2, merged.valuesIterator.count(_.state == State.Normal).toLong)
      )
    }

    writes
      .groupByKey(e => (e.graphId, e.sourceId))
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fold)
  }
}
