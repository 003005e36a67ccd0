package graft

import org.apache.spark.sql.DataFrame

import graft.pipeline.{Dedup, Similarity}

/** Planted-fixture semantics for the round-4 batch-B operators: clustering
  * coefficient, shingle containment, hourly anomaly, dimension stats.
  */
class RoundFourOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("clusteringCoefficient: bounded in [0,1], degree<2 pins 0, triangles consistent") {
    val cc = GraphQueries.clusteringCoefficient(spark, dir).collect()
    assert(cc.nonEmpty)
    cc.foreach { r =>
      val c = r.getAs[Double]("clustering")
      assert(c >= 0.0 && c <= 1.0, s"clustering out of range: $r")
      if (r.getAs[Long]("degree") < 2) assert(c == 0.0)
    }
    // triangle counts agree with the standalone triangle query for every shared vertex
    val tri = GraphQueries.triangleCounts(spark, dir).collect()
      .map(r => r.getAs[Long]("vertex_id") -> r.getAs[Long]("n_triangles")).toMap
    cc.foreach { r =>
      assert(r.getAs[Long]("n_triangles") == tri.getOrElse(r.getAs[Long]("vertex_id"), 0L))
    }
  }

  test("containmentPairs: a quoted document scores full containment in its superset") {
    import spark.implicits._
    val quoted = "alpha beta gamma delta epsilon zeta eta theta"
    val docs: DataFrame = Seq(
      (1L, quoted), // fully contained in 2
      (2L, s"prefix words here $quoted suffix words there"),
      (3L, "unrelated content entirely different words only here")
    ).toDF("doc_id", "text")
    val r = Dedup.containmentPairs(docs, "doc_id", "text", threshold = 0.3)
      .collect()
      .map(x => (x.getAs[Long]("id_a"), x.getAs[Long]("id_b")) -> x.getAs[Double]("containment"))
      .toMap
    assert(r((1L, 2L)) == 1.0) // every shingle of 1 appears in 2
    assert(r((2L, 1L)) < 1.0) // but 2 has shingles outside 1
    assert(!r.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("hourlyAnomaly: baseline window enforced and a planted spike z-scores positive") {
    val r = AnalyticsQueries.hourlyAnomaly(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Double]("base_mean") > 0.0)
      assert(!row.getAs[Double]("z").isNaN)
    }
    // z sign tracks the deviation from the reported baseline mean
    r.foreach { row =>
      val dev = row.getAs[Long]("n").toDouble - row.getAs[Double]("base_mean")
      val z = row.getAs[Double]("z")
      if (math.abs(dev) > 1e-9 && z != 0.0)
        assert(math.signum(dev) == math.signum(z), s"z sign mismatch: $row")
    }
  }

  test("connectedComponents: edges never cross components, component = min member id") {
    val cc = GraphQueries.connectedComponents(spark, dir).collect()
      .map(r => r.getAs[Long]("vertex_id") -> r.getAs[Long]("component")).toMap
    assert(cc.nonEmpty)
    // every component label is the min vertex id among its members
    cc.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.keys.min == comp, s"component $comp is not its min member")
    }
    // both endpoints of every Normal graph-1 edge agree
    import graft.model.State
    val edges = graft.testgraph.TestGraph.store(spark, dir).snapshot
      .filter(org.apache.spark.sql.functions.col("graph_id") === 1 &&
        org.apache.spark.sql.functions.col("state") === State.Normal)
      .select("source_id", "destination_id").collect()
    edges.foreach { e =>
      val (a, b) = (e.getLong(0), e.getLong(1))
      if (a != b) assert(cc(a) == cc(b), s"edge ($a,$b) crosses components")
    }
  }

  test("asofJoin: matched click is at-or-before the purchase with a real click id") {
    val r = AnalyticsQueries.asofJoin(spark, dir).collect()
    assert(r.nonEmpty)
    r.filter(!_.isNullAt(3)).foreach { row =>
      assert(row.getAs[Long]("click_ts_us") <= row.getAs[Long]("ts_us"))
      assert(row.getAs[Long]("gap_us") ==
        row.getAs[Long]("ts_us") - row.getAs[Long]("click_ts_us"))
      assert(!row.isNullAt(4), s"matched ts without a click id: $row")
    }
  }

  test("funnelStages: stage timestamps are ordered and null-chained") {
    val r = AnalyticsQueries.funnelStages(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val signup = row.getAs[Long]("signup_ts")
      if (!row.isNullAt(2)) assert(row.getAs[Long]("click_ts") >= signup)
      if (!row.isNullAt(3)) {
        assert(!row.isNullAt(2), s"purchase without click stage: $row")
        assert(row.getAs[Long]("purchase_ts") >= row.getAs[Long]("click_ts"))
      }
    }
  }

  test("fuzzyPairs: small in-word edit is caught; unrelated docs never pair") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("quick", "quack")), // 1 in-word edit => prefix distance 1
      (3L, "completely different text about distributed query engines and shuffles")
    ).toDF("doc_id", "text")
    val r = Dedup.fuzzyPairs(docs, "doc_id", "text")
      .collect()
      .map(x => (x.getAs[Long]("id_a"), x.getAs[Long]("id_b")) -> x.getAs[Int]("edit_dist"))
      .toMap
    assert(r((1L, 2L)) == 1, s"expected edit distance 1 for the planted edit: $r")
    assert(!r.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("lengthQuantiles: exact order statistics on a planted length distribution") {
    import spark.implicits._
    // 100 docs with 1..100 tokens: p50=50, p90=90, p99=99 by the ceil(q·n) definition
    val docs = (1 to 100).map(n => ("s", Seq.fill(n)("w").mkString(" "))).toDF("source", "text")
    val r = graft.pipeline.TextStats.lengthQuantiles(docs, "source", "text").collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_docs") == 100L)
    assert(r.head.getAs[Long]("p50") == 50L)
    assert(r.head.getAs[Long]("p90") == 90L)
    assert(r.head.getAs[Long]("p99") == 99L)
  }

  test("tfIdfTop: rare terms outrank ubiquitous ones; rank cut is deterministic") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common common rare"),
      (2L, "common other"),
      (3L, "common other")
    ).toDF("doc_id", "text")
    val r = graft.pipeline.TextStats.tfIdfTop(docs, "doc_id", "text", k = 2).collect()
    val top1 = r.filter(x => x.getAs[Long]("doc_id") == 1L && x.getAs[Int]("rank") == 1).head
    // doc 1: 'rare' df=1 score=1*3/1=3 beats 'common' tf=3 df=3 score=3*3/3=3 — tie!
    // tie breaks on token asc: 'common' < 'rare', so common is rank 1
    assert(top1.getAs[String]("token") == "common")
    assert(top1.getAs[Double]("score") == 3.0)
    val top2 = r.filter(x => x.getAs[Long]("doc_id") == 1L && x.getAs[Int]("rank") == 2).head
    assert(top2.getAs[String]("token") == "rare" && top2.getAs[Double]("score") == 3.0)
    // docs 2/3: 'other' (df=2) outranks 'common' (df=3): 1*3/2 > 1*3/3
    val d2 = r.filter(x => x.getAs[Long]("doc_id") == 2L && x.getAs[Int]("rank") == 1).head
    assert(d2.getAs[String]("token") == "other")
  }

  test("dimStats: constant dimension has std 0 and exact mean; mixed dimension is exact") {
    import spark.implicits._
    val vecs = Seq(
      Tuple1(Array(1.0f, 2.0f)),
      Tuple1(Array(1.0f, 4.0f)),
      Tuple1(Array(1.0f, 0.0f))
    ).toDF("embedding")
    val r = Similarity.dimStats(vecs, "embedding").collect()
      .map(x => x.getAs[Int]("dim") -> x).toMap
    assert(r(0).getAs[Long]("n") == 3L)
    assert(r(0).getAs[Double]("mean") == 1.0)
    assert(r(0).getAs[Double]("std") == 0.0)
    assert(r(1).getAs[Double]("mean") == 2.0)
    // var = E[q²]−mean² = (16+4+0)/3·10⁶/10⁶ − 4 = 8/3 ⇒ std = sqrt(8/3)
    assert(math.abs(r(1).getAs[Double]("std") - math.sqrt(8.0 / 3.0)) < 1e-5)
  }
}
