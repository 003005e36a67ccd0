package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.TextStats
import graft.queries.Select
import graft.testgraph.TestGraph

/** Physical-plan shape assertions — the properties that matter at 100 TB, pinned so a
  * refactor can't silently regress them (plan text of the driver-visible queries on the
  * smallest test scale).
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("LWW snapshot: hash-based object aggregation, one shuffle, no partition sort") {
    val p = plan(TestGraph.store(spark, dir).snapshot)
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_graft_lww_winner"), s"partial (map-side) aggregation missing:\n$p")
    assert(!p.contains("Window"), "snapshot must not use the window-function formulation")
    assert(!p.contains("SortAggregate"),
      "a struct-buffer aggregate (e.g. max_by) would sort every partition by the edge key")
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(p).size
    assert(exchanges == 1, s"snapshot should shuffle exactly once, saw $exchanges:\n$p")
  }

  test("star joins broadcast every dimension (q05 shape)") {
    val p = plan(AnalyticsQueries.regionRevenue(spark, dir))
    assert("BroadcastHashJoin".r.findAllMatchIn(p).size >= 4, p)
    assert(!p.contains("SortMergeJoin"), s"dimension joins must broadcast:\n$p")
  }

  test("intersection compiles to a semi-join, difference to an anti-join") {
    import Select.Ops
    val store = TestGraph.store(spark, dir)
    val semi = plan((Select(1L, 1) intersect Select(2L, 1)).ids(store))
    assert(semi.contains("LeftSemi"), semi)
    val anti = plan((Select(1L, 1) difference Select(2L, 1)).ids(store))
    assert(anti.contains("LeftAnti"), anti)
  }

  test("text pipeline stays inside whole-stage codegen (native expressions)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = plan(TextStats.qualityScore(docs, "doc_id", "text"))
    assert(p.contains("*("), s"no whole-stage codegen stage found:\n$p")
    assert(p.contains("graft_count_occurrences"), p)
    val fp = plan(TextStats.fingerprint(docs, "doc_id", "text"))
    assert(fp.contains("graft_poly_fingerprint"), fp)
    assert(fp.contains("*("), s"fingerprint fell out of codegen:\n$fp")
  }

  test("adjacency/point filters push BELOW the LWW aggregation into the scan") {
    // at 100 TB this is the difference between a point lookup and folding the whole
    // log: predicates on grouping keys must reach the source as PushedFilters, with
    // only the post-merge state filter evaluated above the aggregation
    val p = plan(TestGraph.store(spark, dir).adjacency(model.QueryTerm(1L, 1)))
    assert(p.contains("PushedFilters: [IsNotNull(event_id), IsNotNull(user_id), EqualTo(user_id,1)]"),
      s"vertex predicate did not reach the scan:\n$p")
    val aggAboveScan = p.indexOf("ObjectHashAggregate")
    val filterAtScan = p.indexOf("EqualTo(user_id,1)")
    assert(aggAboveScan >= 0 && filterAtScan > aggAboveScan,
      "filter must sit below the aggregation in the plan")
  }

  test("documents scan prunes to the referenced columns only") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = plan(TextStats.tokenStats(docs, "doc_id", "text"))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan must read only (doc_id, text):\n$p")
  }
}
