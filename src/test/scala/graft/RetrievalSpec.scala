package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Retrieval

/** RRF fusion semantics on hand-built ranked lists (the oracle pins the composed
  * s17 query; this pins the fusion kernel's edge cases directly).
  */
class RetrievalSpec extends SparkSpec {

  test("rrf fusion: both-list docs outrank single-list docs; absent ranks read 0") {
    import spark.implicits._
    // query 1: doc 100 is rank 2 lexically and rank 1 semantically; doc 200 is
    // lexical-only rank 1; doc 300 semantic-only rank 2
    val lex = Seq((1L, 200L, 1), (1L, 100L, 2)).toDF("query_id", "neighbor_id", "rank")
    val sem = Seq((1L, 100L, 1), (1L, 300L, 2)).toDF("query_id", "neighbor_id", "rank")
    val out = Retrieval.rrfFuseTopK(lex, sem, k = 3).collect()
      .map(r => (r.getAs[Long]("neighbor_id"),
        (r.getAs[Int]("lex_rank"), r.getAs[Int]("sem_rank"),
          r.getAs[Long]("rrf_score"), r.getAs[Int]("rank")))).toMap
    // 1000000//62 + 1000000//61 = 16129 + 16393
    assert(out(100L) == ((2, 1, 16129L + 16393L, 1)))
    // single-list contributions: 1000000//61, 1000000//62; lex-only beats sem-only
    assert(out(200L) == ((1, 0, 16393L, 2)))
    assert(out(300L) == ((0, 2, 16129L, 3)))
  }

  test("query-side dispatch: shuffle-join branch is result-identical to broadcast branch") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(maxBroadcast: Long): Seq[(Long, Long, Long, Int)] =
      Retrieval.lexicalTopK(
        docs.filter(col("doc_id") % 50 === 0), docs, "doc_id", "text", k = 10,
        maxBroadcastQueries = maxBroadcast)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
          r.getAs[Long]("lex_micro"), r.getAs[Int]("rank")))
        .sortBy(t => (t._1, t._4)).toSeq
    val viaBroadcast = run(Long.MaxValue)
    val viaShuffle = run(0L) // every batch overflows the threshold
    assert(viaBroadcast.nonEmpty && viaBroadcast == viaShuffle,
      s"branches diverged: ${viaBroadcast.take(3)} vs ${viaShuffle.take(3)}")
  }

  test("lexical ranking never returns the query itself and respects k") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lex = Retrieval.lexicalTopK(
      docs.filter(col("doc_id") % 50 === 0), docs, "doc_id", "text", k = 10)
    val rows = lex.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
    val perQuery = rows.groupBy(_.getAs[Long]("query_id")).values
    assert(perQuery.forall(_.length <= 10))
    assert(perQuery.forall(_.map(_.getAs[Int]("rank")).sorted.sameElements(1 to 10)))
  }
}
