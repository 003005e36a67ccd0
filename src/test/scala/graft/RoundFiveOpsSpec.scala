package graft

import org.apache.spark.sql.functions.col

import graft.pipeline.{Dedup, Similarity, TextStats}

/** Planted-fixture semantics for the round-5 operators: Adamic-Adar link prediction,
  * rolling DAU/WAU, late-order priorities, duplicate n-gram fraction, unigram LM
  * scoring, and random projection.
  */
class RoundFiveOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("adamicAdarOf: planted co-neighborhood scores exactly; existing edges excluded") {
    import spark.implicits._
    // 1 and 2 share neighbors {3, 4}; 3-4 is itself an edge so that pair is excluded
    val und = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("lo", "hi")
    val rows = GraphQueries.adamicAdarOf(und, minCommon = 2).collect()
    assert(rows.length == 1, s"expected exactly the (1,2) pair: ${rows.mkString(",")}")
    val r = rows.head
    assert(r.getAs[Long]("src_a") == 1L && r.getAs[Long]("src_b") == 2L)
    assert(r.getAs[Long]("n_common") == 2L)
    // deg(3) = deg(4) = 3 (each touches 1, 2, and the 3-4 edge)
    val perNeighbor = math.round(1e6 / math.log(3.0))
    assert(r.getAs[Long]("aa_micro") == 2L * perNeighbor)
  }

  test("adamicAdar: scores positive, pairs unlinked, common-neighbor floor holds") {
    val rows = GraphQueries.adamicAdar(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("src_a") < r.getAs[Long]("src_b"))
      assert(r.getAs[Long]("n_common") >= 2L)
      assert(r.getAs[Long]("aa_micro") > 0L)
    }
  }

  test("rollingActiveUsers: WAU dominates DAU and never exceeds the 7-day DAU sum") {
    val rows = AnalyticsQueries.rollingActiveUsers(spark, dir).collect()
    assert(rows.nonEmpty)
    val dau = rows.map(r => r.getAs[Long]("day_bucket") -> r.getAs[Long]("n_dau")).toMap
    rows.foreach { r =>
      val day = r.getAs[Long]("day_bucket")
      val wau = r.getAs[Long]("n_wau")
      assert(wau >= r.getAs[Long]("n_dau"), s"WAU below DAU on $day")
      val trailingSum = (0L to 6L).map(k => dau.getOrElse(day - k, 0L)).sum
      assert(wau <= trailingSum, s"WAU $wau exceeds trailing DAU sum $trailingSum on $day")
    }
  }

  test("latePriorityOrders: counts bounded by the order-window total") {
    val rows = AnalyticsQueries.latePriorityOrders(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_orders") > 0L))
    val windowTotal = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1996-01-01")
      .count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum <= windowTotal)
  }

  test("dupNgramFraction: shared shingles counted, unique docs at 0, short docs kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),      // shingles {a b c, b c d}; "a b c" also in doc 2
      (2L, "a b c x"),      // shingles {a b c, b c x}
      (3L, "p q r s"),      // all unique
      (4L, "too short")     // no 3-gram at all
    ).toDF("doc_id", "text")
    val r = Dedup.dupNgramFraction(docs, "doc_id", "text").collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_shingles") == 2L && r(1L).getAs[Long]("n_dup") == 1L)
    assert(r(1L).getAs[Double]("dup_fraction") == 0.5)
    assert(r(2L).getAs[Double]("dup_fraction") == 0.5)
    assert(r(3L).getAs[Long]("n_dup") == 0L && r(3L).getAs[Double]("dup_fraction") == 0.0)
    assert(r(4L).getAs[Long]("n_shingles") == 0L && r(4L).getAs[Double]("dup_fraction") == 0.0)
  }

  test("unigramLogProb: uniform two-token corpus scores ln(1/2) per token exactly") {
    import spark.implicits._
    // corpus counts: a=2, b=2, total=4 -> every token has p=1/2
    val docs = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val r = TextStats.unigramLogProb(docs, "doc_id", "text").collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    val lpMicro = math.round(1e6 * math.log(0.5)) // -693147
    assert(r(1L).getAs[Long]("n_tokens") == 3L)
    assert(r(1L).getAs[Long]("sum_lp_micro") == 3L * lpMicro)
    assert(r(1L).getAs[Double]("avg_logprob") == lpMicro.toDouble / 1e6)
    assert(r(2L).getAs[Double]("avg_logprob") == lpMicro.toDouble / 1e6)
  }

  test("randomProjection: all-ones vector projects to the plane's column sums") {
    import spark.implicits._
    val vecs = Seq((7L, Array.fill(64)(1.0f))).toDF("vec_id", "embedding")
    val rows = Similarity.randomProjection(vecs, "vec_id", "embedding", outDims = 8, dims = 64)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("vec_id") == 7L)
    // mirror of Similarity.planeWeight at family offset 32
    def weight(i: Int, j: Int): Double = if ((i * (2 * j + 3) + j) % 2 == 0) 1.0 else -1.0
    (0 until 8).foreach { j =>
      val expected = (0 until 64).map(i => weight(i, 32 + j)).sum
      assert(r.getAs[Double](s"p$j") == expected, s"p$j mismatch")
    }
  }
}
