package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Sketches

/** Distributed-sketch guarantees on planted data: HLL estimate accuracy, count-min's
  * one-sided error, bloom's no-false-negative contract.
  */
class SketchesSpec extends SparkSpec {

  /** 2000 distinct items across two keys (500 + 1500), streamed with duplicates. */
  private lazy val items: DataFrame = {
    import spark.implicits._
    val rows =
      (0 until 500).map(i => ("a", s"item_a_$i")) ++
        (0 until 500).map(i => ("a", s"item_a_$i")) ++ // dup stream: HLL must ignore
        (0 until 1500).map(i => ("b", s"item_b_$i"))
    rows.toDF("k", "item")
  }

  test("hllDistinct: estimate within the ~1.04/sqrt(m) regime and duplicate-insensitive") {
    val r = Sketches.hllDistinct(items, "k", "item", b = 6).collect()
    assert(r.length == 2)
    r.foreach { row =>
      val exact = row.getAs[Long]("exact_distinct")
      val est = row.getAs[Double]("hll_est")
      val relErr = row.getAs[Double]("rel_err")
      // m=64 => σ≈13%; allow 4σ so the test pins accuracy without being flaky-by-seed
      assert(math.abs(est - exact) / exact < 0.52, s"est $est vs exact $exact")
      assert(relErr == BigDecimal(math.abs(est - exact) / exact)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val Seq(a, b) = r.sortBy(_.getAs[String]("k")).toSeq
    assert(a.getAs[Long]("exact_distinct") == 500L) // dups collapsed
    assert(b.getAs[Long]("exact_distinct") == 1500L)
  }

  test("countMin: estimates are one-sided (cms_n >= exact_n) and exact for isolated buckets") {
    import spark.implicits._
    val stream = (0 until 50).flatMap(i => Seq.fill(i + 1)(s"tok_$i")).toDF("item")
    val r = Sketches.countMin(stream, "item", depth = 4, width = 256, topK = 100).collect()
    assert(r.length == 50)
    r.foreach { row =>
      assert(row.getAs[Long]("cms_n") >= row.getAs[Long]("exact_n"))
      assert(row.getAs[Long]("overcount") ==
        row.getAs[Long]("cms_n") - row.getAs[Long]("exact_n"))
    }
    // 50 items into 4x256 buckets: at least the majority must be collision-free
    assert(r.count(_.getAs[Long]("overcount") == 0L) > 25)
  }

  test("countMin: topK cut is deterministic (count desc, item asc)") {
    import spark.implicits._
    val stream = Seq.fill(3)("x").map(Tuple1(_)).toDF("item")
      .union(Seq.fill(3)("y").map(Tuple1(_)).toDF("item"))
      .union(Seq.fill(1)("z").map(Tuple1(_)).toDF("item"))
    val r = Sketches.countMin(stream, "item", topK = 2).collect().map(_.getAs[String]("item"))
    assert(r.toSet == Set("x", "y")) // tie at 3 broken by item asc before the limit
  }

  test("bloomContamination: train shingles probed by eval docs are always flagged") {
    import spark.implicits._
    // doc ids chosen so hashSplit puts some in train and some in eval; texts overlap
    val docs = (1L to 40L)
      .map(i => (i, if (i % 2 == 0) "alpha beta gamma delta epsilon zeta" else "one two three four five six"))
      .toDF("doc_id", "text")
    val split = graft.pipeline.Sampling.hashSplit(docs, "doc_id")
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val evalDocs = split.filter(_._2 != "train").keys.toSet
    assume(evalDocs.nonEmpty, "fixture must produce at least one eval doc")
    val r = Sketches.bloomContamination(docs, "doc_id", "text").collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSet == evalDocs)
    r.foreach { row =>
      val id = row.getAs[Long]("doc_id")
      // every eval doc's text is an exact copy of a parity-mate; if ANY parity-mate
      // landed in train, all its shingles are in the filter => flag_rate == 1.0
      val mateInTrain = split.exists { case (mid, sp) => sp == "train" && (mid % 2) == (id % 2) }
      if (mateInTrain)
        assert(row.getAs[Double]("flag_rate") == 1.0,
          s"doc $id: train-known shingles must all be flagged (no false negatives)")
    }
  }
}
