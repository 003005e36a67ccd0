package graft

import org.apache.spark.sql.functions.col

/** Planted-fixture semantics for the round-7 operators: k-truss peeling and
  * recency-decayed PageRank.
  */
class RoundSevenOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("kTrussOf: K4 survives a 4-truss peel, a pendant triangle is peeled away") {
    import spark.implicits._
    // K4 on {1,2,3,4}: every edge closes 2 triangles (support 2 = k−2). The pendant
    // triangle {4,5,6} gives its edges support 1 — peeled in round 1; its removal
    // does not disturb K4's support.
    val und = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // K4
      (4L, 5L), (4L, 6L), (5L, 6L)                                // pendant triangle
    ).toDF("lo", "hi")
    val rows = GraphQueries.kTrussOf(und, k = 4, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(rows.map(t => (t._1, t._2)).toSeq ==
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(rows.forall(_._3 == 2L), s"every K4 edge closes exactly 2 triangles: ${rows.mkString(",")}")
  }

  test("kTrussOf: cascading peel needs the later rounds (a chain of weak ties)") {
    import spark.implicits._
    // Two triangles sharing edge (2,3): (2,3) has support 2, the other four edges 1.
    // Round 1 peels the support-1 edges; round 2 then finds (2,3) triangle-less and
    // peels it too — empty truss, only via the second round.
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("lo", "hi")
    assert(GraphQueries.kTrussOf(und, k = 4, rounds = 2).count() == 0)
    // with a single round the shared edge would (wrongly, vs the fixpoint) survive
    assert(GraphQueries.kTrussOf(und, k = 4, rounds = 1).count() == 1)
  }

  test("decayedPageRank: recent edges dominate — newest-edge target outranks stale targets") {
    // fixture-level sanity on real data: ranks are positive and the relation covers
    // every vertex of the graph-1 Normal closure (conservation is pinned by the
    // oracle hash; here we pin shape + positivity)
    val rows = GraphQueries.decayedPageRank(spark, dir).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("dpr_fp") > 0L))
  }
}
