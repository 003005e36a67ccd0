package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.State
import graft.testgraph.TestGraph

/** Frontier-delta connected components (g29's scale refinement, the g39 SSSP
  * discipline applied to min-label propagation): parity with the full-relation form
  * round-for-round, exact components on a known graph, and the anti-join patch shape
  * that keeps per-round work sized by the improved set rather than the graph.
  */
class FrontierCcSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def adjFixture: DataFrame = {
    val snap = TestGraph.store(spark, dir).snapshot
      .filter(col("graph_id") === 1 && col("state") === State.Normal &&
        col("source_id") =!= col("destination_id"))
      .select(col("source_id").as("src"), col("destination_id").as("dst"))
    snap.unionByName(snap.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
  }

  test("frontier-delta equals the full-relation form round-for-round") {
    val adj = adjFixture
    for (r <- Seq(1, 2, 4)) {
      val full = GraphQueries.ccFullFixed(adj, r).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toMap
      val delta = GraphQueries.ccFrontierFixed(adj, r).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toMap
      assert(full.nonEmpty, s"rounds=$r produced no labels")
      assert(delta == full, s"frontier-delta diverged from the full form at rounds=$r")
    }
  }

  test("known graph: exact components, empty frontier past convergence is harmless") {
    import spark.implicits._
    // a 4-chain {1,2,3,4}, a triangle {10,11,12}, an isolated edge {20,21}
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L))
    val adj = (und ++ und.map(_.swap)).toDF("src", "dst")
    // rounds far past convergence: later frontiers are EMPTY and must not disturb
    // the fixpoint
    val cc = GraphQueries.ccFrontierFixed(adj, 8).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("both convergence loops land on identical components (the size dispatch is safe)") {
    val adj = adjFixture
    val classic = GraphQueries.ccClassicLoop(adj, 50).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    val frontier = GraphQueries.ccFrontierLoop(adj, 50).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(classic.nonEmpty && frontier == classic)
  }

  test("empty graph: both convergence loops return empty, converged at round one") {
    import spark.implicits._
    // sum over an empty label relation is NULL; the convergence scalar must read it
    // as 0 (converged) instead of NPE-ing the compare
    val adj = Seq.empty[(Long, Long)].toDF("src", "dst").localCheckpoint(true)
    assert(GraphQueries.ccClassicLoop(adj, 5).count() == 0L)
    assert(GraphQueries.ccFrontierLoop(adj, 5).count() == 0L)
  }

  test("per-round plan: delta patch via anti-join; the full form never anti-joins") {
    val adj = adjFixture
    val p = GraphQueries.ccFrontierFixed(adj, 2, identity)
      .queryExecution.executedPlan.toString
    assert("LeftAnti".r.findAllMatchIn(p).size >= 2,
      s"each frontier round must patch labels with an anti-join on the improved keys:\n$p")
    assert(!p.contains("CartesianProduct"), s"label propagation must stay equi-joins:\n$p")
    val full = GraphQueries.ccFullFixed(adj, 2)
      .queryExecution.executedPlan.toString
    assert(!full.contains("LeftAnti"), "full-relation form grew an anti-join")
  }
}
