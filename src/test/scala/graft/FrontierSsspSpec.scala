package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.State
import graft.testgraph.TestGraph

/** Frontier-delta SSSP (g39's scale refinement): parity with the full-relation
  * Bellman–Ford round-for-round, correct distances on a known graph, and the plan
  * property that makes it the high-round-count default — per-round work is sized by
  * the improved set, not the graph.
  */
class FrontierSsspSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def fixture: (DataFrame, DataFrame) = {
    val edges = TestGraph.store(spark, dir).snapshot
      .filter(col("graph_id") === 1 && col("state") === State.Normal)
      .select(col("source_id").as("src"), col("destination_id").as("dst"),
        (lit(1L) + col("destination_id") % 7).as("w"))
      .localCheckpoint(true)
    val seeds = edges.select(col("src").as("v"))
      .unionByName(edges.select(col("dst").as("v"))).distinct()
      .filter(col("v") % 100 === 0)
    (edges, seeds)
  }

  test("frontier-delta equals full Bellman-Ford round-for-round (incl. past convergence)") {
    val (edges, seeds) = fixture
    for (r <- Seq(1, 3, 4, 6)) {
      val full = GraphQueries.plannedSssp(edges, seeds, r).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toMap
      val delta = GraphQueries.ssspFrontierOf(edges, seeds, r).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toMap
      assert(full.nonEmpty, s"rounds=$r produced no distances")
      assert(delta == full, s"frontier-delta diverged from full Bellman-Ford at rounds=$r")
    }
  }

  test("ssspOf dispatches to the frontier form at high round counts with equal results") {
    val (edges, seeds) = fixture
    val viaDefault = GraphQueries.ssspOf(edges, seeds, GraphQueries.FrontierSsspMinRounds)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    val viaFull = GraphQueries.plannedSssp(edges, seeds, GraphQueries.FrontierSsspMinRounds)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(viaDefault == viaFull)
  }

  test("known path graph: exact distances, frontier shrinks to empty without corruption") {
    import spark.implicits._
    // 0 -2-> 1 -3-> 2 -1-> 3, plus a shortcut 0 -7-> 3 that the path beats at round 3
    val edges = Seq((0L, 1L, 2L), (1L, 2L, 3L), (2L, 3L, 1L), (0L, 3L, 7L))
      .toDF("src", "dst", "w")
    val seeds = Seq(0L).toDF("v")
    // rounds far past convergence: later rounds have an EMPTY frontier and must not
    // disturb the fixpoint
    val d = GraphQueries.ssspFrontierOf(edges, seeds, 8).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(d == Map(0L -> 0L, 1L -> 2L, 2L -> 5L, 3L -> 6L))
  }

  test("per-round plan: delta patch via anti-join; the full variant never anti-joins") {
    val (edges, seeds) = fixture
    val p = GraphQueries.plannedSsspFrontier(edges, seeds, 2)
      .queryExecution.executedPlan.toString
    // the uncheckpointed tree duplicates the improved subtree per consumer, so the
    // count is >= rounds rather than exact
    assert("LeftAnti".r.findAllMatchIn(p).size >= 2,
      s"each frontier round must patch dist with an anti-join on the improved keys:\n$p")
    val full = GraphQueries.plannedSssp(edges, seeds, 2)
      .queryExecution.executedPlan.toString
    assert(!full.contains("LeftAnti"), "full-relation variant grew an anti-join")
  }
}
