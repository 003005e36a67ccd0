package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Label centroids + nearest-centroid assignment (the k-means building blocks). */
class CentroidSpec extends SparkSpec {

  // two well-separated labels in 2-d: label 0 near (1, 0), label 1 near (0, 1)
  private lazy val vecs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, 0, Array(1.0f, 0.0f)),
      (2L, 0, Array(0.8f, 0.2f)),
      (3L, 1, Array(0.0f, 1.0f)),
      (4L, 1, Array(0.2f, 0.8f)),
      (5L, 1, Array(0.0f, 0.6f))
    ).toDF("vec_id", "label", "embedding")
  }

  test("labelCentroids computes exact per-dimension averages in long form") {
    val r = Similarity.labelCentroids(vecs, "label", "embedding")
      .collect().map(x => (x.getInt(0), x.getInt(1)) -> x.getDouble(2)).toMap
    assert(r.size == 4) // 2 labels × 2 dims
    assert(r((0, 1)) == 0.9) // (1.0 + 0.8) / 2, float-exact values
    assert(r((0, 2)) == 0.1)
    assert(math.abs(r((1, 1)) - 0.066667) < 1e-9) // (0 + 0.2 + 0) / 3 rounded to 6
    assert(r((1, 2)) == 0.8) // (1.0 + 0.8 + 0.6) / 3
  }

  test("nearestCentroid assigns separable vectors to their own label") {
    val r = Similarity.nearestCentroid(vecs, "vec_id", "label", "embedding")
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 1))
  }

  test("nearestCentroid excludes zero-norm vectors instead of mislabeling them") {
    import spark.implicits._
    val withZero = vecs.unionByName(
      Seq((99L, 0, Array(0.0f, 0.0f))).toDF("vec_id", "label", "embedding"))
    val r = Similarity.nearestCentroid(withZero, "vec_id", "label", "embedding").collect()
    assert(!r.exists(_.getLong(0) == 99L), "zero vector must be dropped, not tie-broken")
    assert(r.length == 5)
    assert(r.forall(x => !x.isNullAt(2)), "emitted assignments must have a defined cosine")
  }

  test("annRecall: brute force scores recall 1.0 against itself via the lsh path shape") {
    import spark.implicits._
    // 30 vectors in 4 dims; queries = ids % 10 == 0
    val vs = (1L to 30L).map { i =>
      (i, 0, Array(math.sin(i * 1.0).toFloat, math.cos(i * 2.0).toFloat,
        math.sin(i * 3.0).toFloat, math.cos(i * 5.0).toFloat))
    }.toDF("vec_id", "label", "embedding")
    val r = Similarity.annRecall(
      vs.filter(col("vec_id") % 10 === 0), vs, "vec_id", "embedding", k = 3,
      nPlanes = 2, dims = 4, centroidMod = 7, nProbe = 2)
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getDouble(2)).toMap
    val queries = (1L to 30L).filter(_ % 10 == 0)
    assert(r.keySet == (for (m <- Seq("lsh", "ivf"); q <- queries) yield (m, q)).toSet,
      "one row per (method, query), including total misses")
    r.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    // deterministic: same inputs give identical recall on a second run
    val r2 = Similarity.annRecall(
      vs.filter(col("vec_id") % 10 === 0), vs, "vec_id", "embedding", k = 3,
      nPlanes = 2, dims = 4, centroidMod = 7, nProbe = 2)
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getDouble(2)).toMap
    assert(r == r2)
  }

  test("nearestCentroid scoring side broadcasts the constant-size centroid table") {
    val plan = Similarity.nearestCentroid(vecs, "vec_id", "label", "embedding")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"centroids must broadcast, not shuffle the vector side:\n$plan")
  }
}
