package graft

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.Sampling

/** Deterministic sampling / split / corpus-composition operators. */
class SamplingSpec extends SparkSpec {

  /** Independent reimplementation of Sampling.bucketCol: first 60 bits of
    * md5(salt ++ id) as hex, mod 10000.
    */
  private def expectedBucket(id: Long, salt: String = ""): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest((salt + id.toString).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % Sampling.Buckets
  }

  private lazy val docs: DataFrame = {
    import spark.implicits._
    (1L to 400L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
  }

  test("hashSplit buckets match an independent md5 computation and name the right split") {
    val rows = Sampling.hashSplit(docs, "doc_id", trainPct = 90, valPct = 5).collect()
    assert(rows.length == 400)
    rows.foreach { r =>
      val (id, bucket, split) = (r.getLong(0), r.getLong(1), r.getString(2))
      assert(bucket == expectedBucket(id), s"bucket mismatch for id $id")
      val expected = if (bucket < 9000) "train" else if (bucket < 9500) "val" else "test"
      assert(split == expected)
    }
  }

  test("hashSplit is a map-only plan (no shuffle) and stable under repartitioning") {
    val plan = Sampling.hashSplit(docs, "doc_id").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hashSplit must not shuffle:\n$plan")
    val a = Sampling.hashSplit(docs, "doc_id").collect().map(_.toSeq).toSet
    val b = Sampling.hashSplit(docs.repartition(7), "doc_id").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("hashSplit salts give independent assignments") {
    val a = Sampling.hashSplit(docs, "doc_id").collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Sampling.hashSplit(docs, "doc_id", salt = "exp2")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a != b, "different salts must produce a different split assignment")
  }

  test("weightedMix boundaries: weight 1.0 keeps all, 0.0 drops all, threshold is strict") {
    val all = Sampling.weightedMix(docs, "doc_id", "source", Map.empty, defaultWeight = 1.0)
    assert(all.count() == 400, "w=1.0 keeps every row (every bucket < 10000)")
    val none = Sampling.weightedMix(docs, "doc_id", "source", Map.empty, defaultWeight = 0.0)
    assert(none.count() == 0, "w=0.0 keeps nothing (no bucket < 0)")
    // per-source weights + default for unlisted sources; survivor iff bucket < round(w*10000)
    val mixed = Sampling.weightedMix(docs, "doc_id", "source",
      Map("src0" -> 0.5, "src1" -> 0.0), defaultWeight = 0.25).collect()
    mixed.foreach { r =>
      val thr = r.getString(1) match { case "src0" => 5000L; case "src1" => 0L; case _ => 2500L }
      assert(r.getLong(2) < thr)
    }
    val expected = docs.collect().count { r =>
      val thr = r.getString(1) match { case "src0" => 5000L; case "src1" => 0L; case _ => 2500L }
      expectedBucket(r.getLong(0)) < thr
    }
    assert(mixed.length == expected)
  }

  test("sourceCap equals the naive per-source window ranking") {
    val naive = docs
      .withColumn("bucket", conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % Sampling.Buckets)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("bucket"), col("doc_id"))))
      .filter(col("rk") <= 7)
      .select(col("doc_id"), col("source"), col("rk"))
      .collect().map(_.toSeq).toSet
    val twoPass = Sampling.sourceCap(docs, "doc_id", "source", k = 7)
      .collect().map(_.toSeq).toSet
    assert(twoPass == naive)
  }

  test("sourceCap keeps every row of a source smaller than k, ranked 1..n") {
    import spark.implicits._
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "source")
    val r = Sampling.sourceCap(tiny, "doc_id", "source", k = 10).collect()
    assert(r.length == 3)
    assert(r.filter(_.getString(1) == "a").map(_.getInt(2)).sorted.toSeq == Seq(1, 2))
    assert(r.filter(_.getString(1) == "b").map(_.getInt(2)).toSeq == Seq(1))
  }

  test("sourceCap plan reduces each source via the bounded KthSmallest aggregate") {
    val plan = Sampling.sourceCap(docs, "doc_id", "source", k = 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_kth_smallest"),
      s"two-pass sourceCap must use the bounded threshold aggregate:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"KthSmallest must run hash-based (map-side combinable):\n$plan")
  }

  test("KthSmallest returns the exact k-th smallest pair per group, max when under-full") {
    import spark.implicits._
    val df = Seq(
      // group g1: pairs (5,1) (3,2) (3,1) (9,9) — 2nd smallest is (3,2)
      ("g1", 5L, 1L), ("g1", 3L, 2L), ("g1", 3L, 1L), ("g1", 9L, 9L),
      // group g2: only one row — threshold is that row
      ("g2", 7L, 7L)
    ).toDF("g", "b", "i").repartition(4) // force partial + merge path
    val r = df.groupBy(col("g"))
      .agg(org.apache.spark.sql.graft.KthSmallest.column(col("b"), col("i"), 2).as("t"))
      .select(col("g"), col("t.major"), col("t.minor"))
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r("g1") == ((3L, 2L)))
    assert(r("g2") == ((7L, 7L)))
  }
}
