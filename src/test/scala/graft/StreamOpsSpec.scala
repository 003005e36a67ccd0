package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{array, col, count, explode, lit}
import org.apache.spark.sql.streaming.OutputMode

import graft.model._
import graft.store.EdgeStore
import graft.streaming.StreamOps

class StreamOpsSpec extends SparkSpec {

  test("windowed write rates with watermark") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Edge]
    val rates = StreamOps.writeRates(
      stream.toDS().toDF(EdgeStore.edgeColNames: _*), "2 minutes", "1 minute")
    val query = rates.writeStream.format("memory").queryName("rates")
      .outputMode(OutputMode.Update()).start()
    try {
      // three writes in minute 0, one in minute 1 (epoch seconds)
      stream.addData(
        edge(alice, bob, 1, at = 10), edge(alice, carl, 2, at = 20),
        edge(bob, carl, 3, at = 50), edge(carl, bob, 4, at = 70)
      )
      query.processAllAvailable()
      val rows = spark.sql("SELECT graph_id, n_writes FROM rates").collect()
        .map(r => r.getInt(0) -> r.getLong(1))
      assert(rows.toSeq.sortBy(_._2) == Seq((FOLLOWS, 1L), (FOLLOWS, 3L)))
    } finally query.stop()
  }

  test("flatMapGroupsWithState maintains per-vertex degree incrementally (A2 semantics)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Edge]
    val degrees = StreamOps.streamingDegree(stream.toDS())
    val query = degrees.toDF().writeStream.format("memory").queryName("degrees")
      .outputMode(OutputMode.Update()).start()

    def degreeOf(src: Long): Long =
      spark.sql(s"SELECT degree FROM degrees WHERE sourceId = $src ORDER BY degree")
        .collect().last.getLong(0)

    try {
      stream.addData(
        edge(alice, bob, 1, at = 100), edge(alice, carl, 2, at = 100))
      query.processAllAvailable()
      assert(degreeOf(alice) == 2L)

      // remove one edge, replay an older add (must be ignored by LWW state)
      stream.addData(
        edge(alice, bob, 1, at = 120, state = State.Removed),
        edge(alice, carl, 2, at = 90, state = State.Removed) // stale, loses
      )
      query.processAllAvailable()
      val last = spark.sql("SELECT degree FROM degrees WHERE sourceId = 1").collect()
        .map(_.getLong(0)).last
      assert(last == 1L, "bob removed, stale carl-removal ignored")
    } finally query.stop()
  }

  test("degree state is bounded: aged-out tombstones are dropped, degree stays exact") {
    import graft.streaming.StreamOps.{mergeDegreeState, DegreeState}
    val horizon = 1000
    // high-degree vertex: 10k adds, then 9k removals
    val adds = (1L to 10000L).map(d => edge(alice, d, pos = d, at = 100))
    val removes = (1L to 9000L).map(d => edge(alice, d, pos = d, at = 200, state = State.Removed))
    val s1 = mergeDegreeState(DegreeState(Map.empty, Int.MinValue), (adds ++ removes).iterator, horizon)
    assert(s1.regs.valuesIterator.count(_.state == State.Normal) == 1000)
    assert(s1.regs.size == 10000, "tombstones inside the horizon are retained")

    // time passes beyond the horizon -> the 9k tombstones age out of the state store
    val later = Seq(edge(alice, 20000L, pos = 1, at = 200 + horizon + 1))
    val s2 = mergeDegreeState(s1, later.iterator, horizon)
    assert(s2.regs.size == 1001, "9k aged tombstones dropped; live registers kept")
    assert(s2.regs.valuesIterator.count(_.state == State.Normal) == 1001)

    // a replay from beyond the horizon is a no-op (cannot resurrect a dropped tombstone)
    val stale = Seq(edge(alice, 5L, pos = 5, at = 100))
    val s3 = mergeDegreeState(s2, stale.iterator, horizon)
    assert(s3 == s2, "writes older than the replay horizon are ignored")
  }

  test("streaming exact dedup keeps the first-seen id and flags later arrivals") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val verdicts = StreamOps.streamingDedup(stream.toDS())
    val query = verdicts.toDF().writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData((5L, "same text"), (3L, "same text"), (7L, "other"))
      query.processAllAvailable()
      val b1 = spark.sql("SELECT docId, isDuplicate, keepId FROM dedup").collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSet
      // within-batch: min id 3 is the keeper, 5 is its duplicate; 7 is unique
      assert(b1 == Set((3L, false, 3L), (5L, true, 3L), (7L, false, 7L)))

      // a later batch with the same content is a duplicate of the original keeper
      stream.addData((9L, "same text"))
      query.processAllAvailable()
      val b2 = spark.sql("SELECT isDuplicate, keepId FROM dedup WHERE docId = 9").collect()
        .map(r => (r.getBoolean(0), r.getLong(1))).toSeq
      assert(b2 == Seq((true, 3L)))
    } finally query.stop()
  }

  test("dropDuplicatesWithinWatermark leg: cross-batch drop, then eviction re-admits") {
    import spark.implicits._
    import graft.streaming.StreamOps.TimedDoc
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[TimedDoc]
    val out = StreamOps.streamingDedupWithinWatermark(stream.toDS(), watermarkDelay = "10 minutes")
    val query = out.writeStream.format("memory").queryName("wmdedup")
      .outputMode(OutputMode.Append()).start()
    def ids() = spark.sql("SELECT doc_id FROM wmdedup").collect().map(_.getLong(0)).toSet
    try {
      val t0 = 1000000000L // 1000 s in micros
      // batch 1: two distinct contents — both emitted
      stream.addData(TimedDoc(3L, "same text", t0), TimedDoc(7L, "other", t0))
      query.processAllAvailable()
      assert(ids() == Set(3L, 7L))
      // batch 2 (BATCH-PARITY ACROSS THE BOUNDARY): a later arrival of the
      // same content within the horizon is dropped — first-seen wins, exactly
      // the batch d01 keep-first rule
      stream.addData(TimedDoc(9L, "same text", t0 + 60L * 1000000L))
      query.processAllAvailable()
      assert(ids() == Set(3L, 7L))
      // batch 3: advance the watermark far past t0 + delay — the registers
      // for batch-1 content are evicted (the documented state bound)
      stream.addData(TimedDoc(50L, "watermark pusher", t0 + 10000L * 1000000L))
      query.processAllAvailable()
      assert(ids() == Set(3L, 7L, 50L))
      // batch 4: the same content AFTER eviction is re-admitted as a fresh
      // keeper — the replay-horizon contract, stated in the scaladoc
      stream.addData(TimedDoc(11L, "same text", t0 + 10001L * 1000000L))
      query.processAllAvailable()
      assert(ids() == Set(3L, 7L, 50L, 11L))
    } finally query.stop()
  }

  test("mergeDedupBatch is deterministic and replay-recognizable") {
    import graft.streaming.StreamOps.mergeDedupBatch
    // fresh key: batch min wins regardless of order
    assert(mergeDedupBatch(None, Seq(5L, 3L, 7L)) ==
      ((3L, Seq(3L -> false, 5L -> true, 7L -> true))))
    assert(mergeDedupBatch(None, Seq(7L, 3L, 5L)) ==
      ((3L, Seq(3L -> false, 5L -> true, 7L -> true))))
    // existing keeper: everything is a duplicate, including a replay of the keeper
    assert(mergeDedupBatch(Some(3L), Seq(3L, 9L)) ==
      ((3L, Seq(3L -> true, 9L -> true))))
    // a keeper id replayed WITHIN its first batch: only the first copy passes
    assert(mergeDedupBatch(None, Seq(3L, 3L, 9L)) ==
      ((3L, Seq(3L -> false, 3L -> true, 9L -> true))))
  }

  test("mergeDegreeState is within-batch order independent") {
    import graft.streaming.StreamOps.{mergeDegreeState, DegreeState}
    val batch = Seq(
      edge(alice, bob, 1, at = 100),
      edge(alice, bob, 1, at = 150, state = State.Removed),
      edge(alice, carl, 2, at = 120),
      edge(alice, darcy, 3, at = 90, state = State.Negative)
    )
    val init = DegreeState(Map.empty, Int.MinValue)
    val a = mergeDegreeState(init, batch.iterator, 1000)
    val b = mergeDegreeState(init, batch.reverse.iterator, 1000)
    assert(a == b)
  }

  test("streaming HLL estimate matches the batch sketch after any stream prefix") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = (0 until 300).map(i => (s"k${i % 2}", s"item_$i"))
    val (first, second) = all.splitAt(120)

    val stream = MemoryStream[(String, String)]
    val est = StreamOps.streamingHllDistinct(
      stream.toDS().toDF("key", "item"), "key", "item")
    val query = est.toDF().writeStream.format("memory").queryName("hll")
      .outputMode(OutputMode.Update()).start()
    try {
      // the memory sink accumulates one row per (key, batch); registers only
      // max-merge so the estimate is monotone non-decreasing => latest == max
      def streamingNow(): Map[String, Double] =
        spark.sql("SELECT key, round(max(hllEst), 3) e FROM hll GROUP BY key").collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
      def batchOn(prefix: Seq[(String, String)]): Map[String, Double] =
        graft.pipeline.Sketches
          .hllDistinct(prefix.toDF("key", "item"), "key", "item", b = 6)
          .collect().map(r => r.getAs[String]("key") -> r.getAs[Double]("hll_est")).toMap

      stream.addData(first: _*)
      query.processAllAvailable()
      assert(streamingNow() == batchOn(first))

      stream.addData(second: _*)
      query.processAllAvailable()
      assert(streamingNow() == batchOn(all))

      // replay the whole first batch: registers are max-merged, estimate unchanged
      stream.addData(first: _*)
      query.processAllAvailable()
      assert(streamingNow() == batchOn(all))
    } finally query.stop()
  }

  test("streaming theta registers reproduce the batch sk05 difference after any prefix") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 16
    // overlapping item sets; sizes straddle k so both regimes appear as batches land
    val all = (0 until 120).map(i => ("a", s"item_$i")) ++
      (60 until 180).map(i => ("b", s"item_$i"))
    val (first, second) = (all.take(90), all.drop(90))

    val stream = MemoryStream[(String, String)]
    val query = StreamOps.streamingTheta(stream.toDS().toDF("key", "item"), "key", "item", k)
      .toDF().writeStream.format("memory").queryName("theta")
      .outputMode(OutputMode.Update()).start()
    try {
      // md5 fidelity: hash through the same Spark expression the operators use
      def h32(prefix: Seq[(String, String)]): Map[String, Vector[Long]] =
        prefix.toDF("key", "item")
          .selectExpr("key", "cast(conv(substring(md5(item), 1, 8), 16, 10) as long) h")
          .collect().groupBy(_.getString(0))
          .view.mapValues(_.map(_.getLong(1)).toVector).toMap
      def latest(): Map[String, (Long, Int, Double)] =
        spark.sql("SELECT key, min(theta) t FROM theta GROUP BY key").collect()
          .map { r =>
            val key = r.getString(0); val t = r.getLong(1)
            val n = spark.sql(s"SELECT max(nSample) FROM theta WHERE key = '$key' AND theta = $t")
              .head().getInt(0)
            val e = spark.sql(
              s"SELECT max(estDistinct) FROM theta WHERE key = '$key' AND theta = $t AND nSample = $n")
              .head().getDouble(0)
            key -> ((t, n, e))
          }.toMap

      def check(prefix: Seq[(String, String)]): Unit = {
        val hs = h32(prefix)
        val expect = hs.map { case (key, hv) =>
          val regs = StreamOps.mergeThetaRegs(Vector.empty, hv.iterator, k)
          val (t, e) = StreamOps.thetaEstimate(regs, k)
          key -> ((t, regs.count(_ < t), e))
        }
        assert(latest() == expect, s"prefix of ${prefix.size}")
      }

      stream.addData(first: _*)
      query.processAllAvailable()
      check(first)
      stream.addData(second: _*)
      query.processAllAvailable()
      check(all)

      // the point of the sketch: the directional difference computed from the two
      // final streaming registers equals the batch operator on the same data
      val hs = h32(all)
      val regs = hs.view.mapValues(h => StreamOps.mergeThetaRegs(Vector.empty, h.iterator, k)).toMap
      val thetas = regs.map { case (key, r) => key -> StreamOps.thetaEstimate(r, k)._1 }
      def streamedDiff(a: String, b: String): (Long, Double) = {
        val tab = math.min(thetas(a), thetas(b))
        val bSet = regs(b).toSet
        val n = regs(a).count(h => h < tab && !bSet.contains(h)).toLong
        val est = BigDecimal(n.toDouble * 4294967296.0 / tab)
          .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
        (n, est)
      }
      val batch = graft.pipeline.Sketches
        .thetaDifference(all.toDF("key", "item"), "key", "item", k)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getAs[Long]("n_retained"), r.getAs[Double]("diff_est")))).toMap
      assert(batch(("a", "b")) == streamedDiff("a", "b"))
      assert(batch(("b", "a")) == streamedDiff("b", "a"))
    } finally query.stop()
  }

  test("theta register merge is order-independent, replay-idempotent, split-invariant") {
    import graft.streaming.StreamOps.mergeThetaRegs
    val rnd = new scala.util.Random(7)
    val hs = Vector.fill(200)(rnd.nextLong().abs % (1L << 32))
    val one = mergeThetaRegs(Vector.empty, hs.iterator, 16)
    assert(mergeThetaRegs(Vector.empty, hs.reverse.iterator, 16) == one)
    assert(mergeThetaRegs(one, hs.iterator, 16) == one)
    val (xs, ys) = hs.splitAt(77)
    assert(mergeThetaRegs(mergeThetaRegs(Vector.empty, xs.iterator, 16), ys.iterator, 16) == one)
  }

  test("streaming count-min matches the batch sketch after any stream prefix") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // skewed stream over a small alphabet + small width so buckets genuinely collide
    val all = (0 until 400).map(i => s"item_${(i * i) % 23}")
    val (first, second) = all.splitAt(150)

    val stream = MemoryStream[String]
    val cells = StreamOps.streamingCountMin(
      stream.toDS().toDF("item"), "item", depth = 4, width = 16)
    val query = cells.toDF().writeStream.format("memory").queryName("cms")
      .outputMode(OutputMode.Update()).start()
    try {
      def streamingNow(): Map[String, Long] = {
        // bucket totals only grow => latest emitted total per cell == max; an item's
        // estimate is the min over its depth cells of those totals
        val latest = spark.sql("SELECT r, bucket, max(bucketN) AS n FROM cms GROUP BY r, bucket")
          .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
        spark.sql("SELECT DISTINCT item, r, bucket FROM cms").collect()
          .groupBy(_.getString(0))
          .map { case (item, rows) =>
            item -> rows.map(r => latest((r.getInt(1), r.getLong(2)))).min
          }
      }
      def batchOn(prefix: Seq[String]): Map[String, Long] =
        graft.pipeline.Sketches
          .countMin(prefix.toDF("item"), "item", depth = 4, width = 16, topK = 1000)
          .collect().map(r => r.getAs[String]("item") -> r.getAs[Long]("cms_n")).toMap

      stream.addData(first: _*)
      query.processAllAvailable()
      assert(streamingNow() == batchOn(first))

      stream.addData(second: _*)
      query.processAllAvailable()
      assert(streamingNow() == batchOn(all))
    } finally query.stop()
  }

  test("mergeSessionBatch: gap splits, in-batch reordering tolerated, open session continues") {
    import graft.streaming.StreamOps.{mergeSessionBatch, SessionState}
    val hour = 3600000000L
    // one batch, shuffled order: two sessions (gap between 3h and 1h marks)
    val (open1, closed1) = mergeSessionBatch(None, Seq(3 * hour, 0L, hour / 2, 3 * hour + 1), hour)
    assert(closed1 == Seq(SessionState(0L, hour / 2, 2)))
    assert(open1 == SessionState(3 * hour, 3 * hour + 1, 2))
    // next batch continues the open session within the gap
    val (open2, closed2) = mergeSessionBatch(Some(open1), Seq(4 * hour), hour)
    assert(closed2.isEmpty && open2 == SessionState(3 * hour, 4 * hour, 3))
    // and a far-future event closes it
    val (open3, closed3) = mergeSessionBatch(Some(open2), Seq(9 * hour), hour)
    assert(closed3 == Seq(open2) && open3 == SessionState(9 * hour, 9 * hour, 1))
    // a cross-batch LATE event inside the gap extends the session START backward —
    // it must not shift the start forward or shrink the duration
    val (open4, closed4) = mergeSessionBatch(Some(open3), Seq(9 * hour - hour / 2), hour)
    assert(closed4.isEmpty && open4 == SessionState(9 * hour - hour / 2, 9 * hour, 2))
  }

  test("mergeSessionBatch: an event past the closed horizon never corrupts the open session") {
    import graft.streaming.StreamOps.{mergeSessionBatch, SessionState}
    val hour = 3600000000L
    val open = SessionState(9 * hour, 9 * hour + 1, 2)
    // 7h < start − gap: belongs to an already-closed session — it must come back as
    // its own closed singleton, with the open register untouched
    val (open2, closed) = mergeSessionBatch(Some(open), Seq(7 * hour), hour)
    assert(open2 == open)
    assert(closed == Seq(SessionState(7 * hour, 7 * hour, 1)))
    // a stale CHAIN folds under the same gap rule before closing, and a same-batch
    // live event still merges into the open session
    val (open3, closed3) = mergeSessionBatch(
      Some(open), Seq(7 * hour, 7 * hour + hour / 2, 9 * hour + 2), hour)
    assert(open3 == SessionState(9 * hour, 9 * hour + 2, 3))
    assert(closed3 == Seq(SessionState(7 * hour, 7 * hour + hour / 2, 2)))
    // an event outside the raw horizon that BRIDGES through a batch-mate within the
    // gap must merge transitively (the chain touches start − gap), not split — the
    // same outcome a single-batch fold of all four events produces
    val (open4, closed4) = mergeSessionBatch(
      Some(open), Seq(72 * hour / 10, 81 * hour / 10), hour)
    assert(closed4.isEmpty)
    assert(open4 == SessionState(72 * hour / 10, 9 * hour + 1, 4))
  }

  test("anomalyStep: an out-of-order window scores against its past but keeps the full ring") {
    import graft.streaming.StreamOps.anomalyStep
    var base = Seq.empty[(Long, Long)]
    (0 until 6).foreach { i => base = anomalyStep(base, i.toLong, 10L, 24, 3)._1 }
    // window 2 re-delivered late: scored against {0,1} only (below minBaseline ⇒ no
    // score), but windows 3..5 must survive in the persisted ring
    val (next, score) = anomalyStep(base, 2L, 99L, 24, 3)
    assert(score.isEmpty)
    assert(next.map(_._1) == Seq(0L, 1L, 2L, 3L, 4L, 5L))
    assert(next.find(_._1 == 2L).map(_._2).contains(99L), "re-delivery must replace the entry")
    // and the next in-order window scores against a baseline that includes 3..5
    val (_, s6) = anomalyStep(next, 6L, 10L, 24, 3)
    assert(s6.isDefined)
  }

  test("streamingSessionize: sessions close across micro-batches; parity with ev12 on one batch") {
    import spark.implicits._
    import graft.streaming.StreamOps.SessionEvent
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val hour = 3600000000L
    val stream = MemoryStream[SessionEvent]
    val query = StreamOps.streamingSessionize(stream.toDS()).toDF()
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData(SessionEvent(7L, 1L, 0L), SessionEvent(7L, 2L, hour / 2))
      query.processAllAvailable()
      stream.addData(SessionEvent(7L, 3L, 5 * hour)) // closes the first session
      query.processAllAvailable()
      val closed = spark.sql(
        "SELECT sessionStartUs, nEvents, durationUs FROM sessions WHERE closed").collect()
      assert(closed.length == 1)
      assert(closed.head.getLong(0) == 0L && closed.head.getLong(1) == 2L
        && closed.head.getLong(2) == hour / 2)
      val open = spark.sql(
        "SELECT sessionStartUs, nEvents FROM sessions WHERE NOT closed ORDER BY sessionStartUs")
        .collect()
      assert(open.last.getLong(0) == 5 * hour && open.last.getLong(1) == 1L)
    } finally query.stop()

    // batch parity: all fixture events in ONE batch reproduce ev12's session set
    val dir = "/root/testdata/sf0.001"
    val fixtureDF = spark.read.parquet(s"$dir/events.parquet")
    val fixture = fixtureDF
      .select(col("user_id"), col("event_id"), EventTime.micros(fixtureDF).as("tsu")).collect()
      .groupBy(_.getLong(0))
    val expected = AnalyticsQueries.sessionStats(spark, dir).collect()
      .groupBy(_.getAs[Long]("user_id"))
    fixture.foreach { case (u, rows) =>
      val (open, closedS) = StreamOps.mergeSessionBatch(None, rows.map(_.getLong(2)).toSeq, hour)
      val streamed = (closedS :+ open).map(s => (s.nEvents, s.lastUs - s.startUs))
      val batch = expected(u).sortBy(_.getAs[Long]("session_idx"))
        .map(r => (r.getAs[Long]("n_events"), r.getAs[Long]("duration_us"))).toSeq
      assert(streamed == batch, s"user $u session parity")
    }
  }

  test("streamingViewBuyJoin: watermarked interval join pairs in-window only, batch parity") {
    import spark.implicits._
    import graft.streaming.StreamOps.{BuyEvent, ViewEvent}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val hour = 3600000000L
    val base = 86400L * 1000000L
    val vStream = MemoryStream[ViewEvent]
    val bStream = MemoryStream[BuyEvent]
    val query = StreamOps.streamingViewBuyJoin(vStream.toDS(), bStream.toDS())
      .writeStream.format("memory").queryName("vb")
      .outputMode(OutputMode.Append()).start()
    try {
      val views = Seq(
        ViewEvent(1L, 1L, base), // pairs with buy 10 (30 min later)
        ViewEvent(1L, 2L, base + hour * 3), // out of window for buy 10
        ViewEvent(2L, 3L, base)) // other user — never pairs
      val buys = Seq(
        BuyEvent(1L, 10L, base + hour / 2, 999L),
        BuyEvent(1L, 11L, base + hour * 3 + hour / 4, 500L)) // pairs with view 2
      vStream.addData(views: _*)
      bStream.addData(buys.head)
      query.processAllAvailable()
      bStream.addData(buys(1)) // arrives a micro-batch later — still joins
      query.processAllAvailable()
      val got = spark.sql(
        "SELECT user_id, view_event_id, buy_event_id, gap_us, value_cents FROM vb")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      // batch parity: the identical static interval join over the same rows
      val want = (for {
        v <- views; b <- buys
        if v.userId == b.userId && b.tsUs >= v.tsUs && b.tsUs - v.tsUs <= hour
      } yield (v.userId, v.eventId, b.eventId, b.tsUs - v.tsUs, b.valueCents)).toSet
      assert(got == want, s"got $got want $want")
      assert(want == Set((1L, 1L, 10L, hour / 2, 999L),
        (1L, 2L, 11L, hour / 4, 500L)))
    } finally query.stop()
  }

  test("streamingTypeTransitions: step counts match ev21 across a batch boundary") {
    import spark.implicits._
    import graft.streaming.StreamOps.TypeStepEvent
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[TypeStepEvent]
    val query = StreamOps.streamingTypeTransitions(stream.toDS()).toDF()
      .writeStream.format("memory").queryName("steps")
      .outputMode(OutputMode.Update()).start()
    try {
      // batch 1: user 1 emits view->click (in-batch, arrival order scrambled
      // so the (tsUs, eventId) sort is doing the work); user 2 opens with view
      stream.addData(
        TypeStepEvent(1L, 2L, 2000L, "click"), TypeStepEvent(1L, 1L, 1000L, "view"),
        TypeStepEvent(2L, 3L, 1500L, "view"))
      query.processAllAvailable()
      // batch 2: the register carries user 1's click across the boundary —
      // click->purchase emits exactly once; user 2 adds view->click
      stream.addData(
        TypeStepEvent(1L, 4L, 3000L, "purchase"),
        TypeStepEvent(2L, 5L, 2500L, "click"))
      query.processAllAvailable()
      val got = spark.sql("SELECT fromType, toType FROM steps").collect()
        .map(r => (r.getString(0), r.getString(1)))
        .groupBy(identity).map { case (k, v) => k -> v.length }
      // the batch ev21 matrix over the same six events
      assert(got == Map(("view", "click") -> 2, ("click", "purchase") -> 1),
        s"got $got")
    } finally query.stop()
  }

  test("session_window built-in sessionizer: closed sessions match the ev12 break rule") {
    import spark.implicits._
    import graft.streaming.StreamOps.SessionEvent
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val hour = 3600000000L
    val base = 86400L * 1000000L
    val stream = MemoryStream[SessionEvent]
    val query = StreamOps
      .streamingSessionStatsWindowed(stream.toDS(), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("swin")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        // user 7: a gap of EXACTLY one hour stays in-session (ev12's `> gap`
        // break rule; session_window merges touching windows — same rule)
        SessionEvent(7L, 1L, base), SessionEvent(7L, 2L, base + hour / 2),
        SessionEvent(7L, 3L, base + hour / 2 + hour),
        // user 8: a single-event session
        SessionEvent(8L, 4L, base + hour / 4),
        // user 10: a gap of one hour + 1µs BREAKS (two sessions)
        SessionEvent(10L, 5L, base), SessionEvent(10L, 6L, base + hour + 1L))
      query.processAllAvailable()
      // push the watermark far past every open session so Append emits them
      stream.addData(SessionEvent(9L, 7L, base + 100L * hour))
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, session_start_us, n_events, duration_us FROM swin")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(rows == Set(
        (7L, base, 3L, hour / 2 + hour),
        (8L, base + hour / 4, 1L, 0L),
        (10L, base, 1L, 0L),
        (10L, base + hour + 1L, 1L, 0L)))
    } finally query.stop()
  }

  test("streamingSessionizeEventTime: the watermark closes sessions of absent users") {
    import spark.implicits._
    import graft.streaming.StreamOps.SessionEvent
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val hour = 3600000000L
    val stream = MemoryStream[SessionEvent]
    val query = StreamOps.streamingSessionizeEventTime(
      stream.toDS(), gapUs = hour, watermarkDelay = "0 seconds").toDF()
      .writeStream.format("memory").queryName("et_sessions")
      .outputMode(OutputMode.Update()).start()
    // NOT epoch 0: a first event at exactly the initial watermark is filtered as late
    val base = 1700000000000000L
    try {
      // user 1 is active once and never returns
      stream.addData(SessionEvent(1L, 1L, base), SessionEvent(1L, 2L, base + hour / 2))
      query.processAllAvailable()
      assert(spark.sql("SELECT * FROM et_sessions WHERE closed").count() == 0)
      // a DIFFERENT user's much-later event advances the watermark past
      // user 1's last-seen + gap, firing the event-time timeout
      stream.addData(SessionEvent(2L, 3L, base + 10 * hour))
      query.processAllAvailable()
      // one more empty-ish trigger lets the timeout batch run
      stream.addData(SessionEvent(2L, 4L, base + 10 * hour + 1))
      query.processAllAvailable()
      val closed = spark.sql(
        "SELECT userId, sessionStartUs, nEvents, durationUs FROM et_sessions WHERE closed")
        .collect()
      assert(closed.length == 1, closed.mkString(","))
      assert(closed.head.getLong(0) == 1L && closed.head.getLong(1) == base
        && closed.head.getLong(2) == 2L && closed.head.getLong(3) == hour / 2)
    } finally query.stop()
  }

  test("anomalyStep: baseline warms up, scores match the ev7 float sequence, ring is bounded") {
    import graft.streaming.StreamOps.anomalyStep
    // warm-up: first minBaseline windows emit no score
    var base = Seq.empty[(Long, Long)]
    (0 until 3).foreach { i =>
      val (b2, s) = anomalyStep(base, i.toLong, 10L, horizon = 24, minBaseline = 3)
      assert(s.isEmpty, s"window $i scored during warm-up"); base = b2
    }
    // constant baseline of 10s: variance 0 ⇒ z = 0.0, mean = 10
    val (base4, s4) = anomalyStep(base, 3L, 25L, 24, 3)
    assert(s4.contains((10.0, 0.0)))
    // now baseline {10,10,10,25}: mean 13.75, var = E[x²]−mean² = 231.25−189.0625
    val (_, s5) = anomalyStep(base4, 4L, 30L, 24, 3)
    val mean5 = 55.0 / 4.0
    val var5 = 925.0 / 4.0 - mean5 * mean5
    val expectedZ = math.rint((30.0 - mean5) / math.sqrt(var5) * 10000) / 10000
    assert(s5.contains((13.75, expectedZ)))
    // ring bound: horizon 4 keeps only the trailing 4 windows
    var b = Seq.empty[(Long, Long)]
    (0 until 10).foreach { i => b = anomalyStep(b, i.toLong, i.toLong, 4, 3)._1 }
    assert(b.map(_._1) == Seq(6L, 7L, 8L, 9L))
  }

  test("streamingRateAnomaly: per-graph baselines stay independent across micro-batches") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Int, Long, Long)]
    val query = StreamOps.streamingRateAnomaly(stream.toDS(), horizon = 24, minBaseline = 2)
      .toDF().writeStream.format("memory").queryName("anomalies")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData((1, 0L, 10L), (1, 1L, 10L), (2, 0L, 100L), (2, 1L, 200L))
      query.processAllAvailable()
      stream.addData((1, 2L, 10L), (2, 2L, 300L))
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT graphId, windowStart, baseMean, z FROM anomalies WHERE windowStart = 2")
        .collect().map(r => r.getInt(0) -> (r.getDouble(2), r.getDouble(3))).toMap
      // graph 1: flat baseline → mean 10, z 0; graph 2: mean 150, var 2500 → z = 3
      assert(rows(1) == ((10.0, 0.0)))
      assert(rows(2) == ((150.0, 3.0)))
    } finally query.stop()
  }

  test("streaming HDR quantiles: registers reproduce the batch sk07 estimates on every prefix") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(String, Long)]
    val query = StreamOps.streamingHdrQuantiles(stream.toDS().toDF("key", "v"), "key", "v")
      .toDF().writeStream.format("memory").queryName("hdr")
      .outputMode(OutputMode.Update()).start()
    val first = Seq.tabulate(40)(i => ("a", (i + 1).toLong * 7)) ++
      Seq.tabulate(10)(i => ("b", (i + 1).toLong))
    val second = Seq.tabulate(25)(i => ("a", (i + 1).toLong * 1000)) ++ Seq(("b", 1048573L))
    try {
      def check(prefix: Seq[(String, Long)]): Unit = {
        // latest streaming row per key (largest n wins under Update mode)
        val got = spark.sql(
          """SELECT key, n, p50Est, p90Est, p99Est FROM (
            |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY n DESC) AS rk FROM hdr)
            |WHERE rk = 1""".stripMargin)
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
        // batch operator over the same prefix
        val batch = graft.pipeline.Sketches
          .hdrQuantiles(prefix.toDF("key", "v"), "key", "v")
          .collect().map(r => r.getAs[String]("key") ->
            ((r.getAs[Long]("n"), r.getAs[Long]("p50_est"),
              r.getAs[Long]("p90_est"), r.getAs[Long]("p99_est")))).toMap
        assert(got == batch, s"prefix of ${prefix.size}")
      }
      stream.addData(first: _*)
      query.processAllAvailable()
      check(first)
      stream.addData(second: _*)
      query.processAllAvailable()
      check(first ++ second)
    } finally query.stop()
  }

  test("streaming AMS F2: registers reproduce the batch sk08 sums on every prefix") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Long]
    val width = 16
    val query = StreamOps.streamingAmsF2(stream.toDS().toDF("user_id"), "user_id", width = width)
      .toDF().writeStream.format("memory").queryName("ams")
      .outputMode(OutputMode.Update()).start()
    val first = (1L to 20L).flatMap(i => Seq.fill((i % 5 + 1).toInt)(i))
    val second = Seq.fill(30)(7L) ++ (21L to 25L)
    try {
      def check(prefix: Seq[Long]): Unit = {
        val got = spark.sql(
          "SELECT nRows, f2Sum, f2Est FROM ams ORDER BY nRows DESC LIMIT 1")
          .collect().head
        val batch = graft.pipeline.Sketches
          .amsF2(prefix.toDF("user_id"), "user_id", width = width)
          .collect().head
        assert(got.getLong(0) == batch.getAs[Long]("n_rows"), s"prefix ${prefix.size}")
        assert(got.getLong(1) == batch.getAs[Long]("f2_sum"), s"prefix ${prefix.size}")
        assert(got.getDouble(2) == batch.getAs[Double]("f2_est"), s"prefix ${prefix.size}")
      }
      stream.addData(first: _*)
      query.processAllAvailable()
      check(first)
      stream.addData(second: _*)
      query.processAllAvailable()
      check(first ++ second)
    } finally query.stop()
  }

  test("streaming moments: power-sum registers reproduce batch sk09 on every prefix") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(String, Long)]
    val query = StreamOps.streamingMoments(stream.toDS().toDF("source", "n_chars"),
        "source", "n_chars")
      .toDF().writeStream.format("memory").queryName("mom")
      .outputMode(OutputMode.Update()).start()
    // values large enough that x^4 sums exceed Long (forcing the BigInt register path)
    val first = Seq.tabulate(30)(i => ("a", (i + 1).toLong * 997)) ++
      Seq(("b", 1L), ("b", 2L), ("b", 3L))
    val second = Seq.tabulate(20)(i => ("a", 200000L + i)) ++ Seq(("b", 100L))
    try {
      def check(prefix: Seq[(String, Long)]): Unit = {
        val got = spark.sql(
          """SELECT key, n, meanMicro, varMicro, skewMicro, kurtMicro FROM (
            |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY n DESC) AS rk FROM mom)
            |WHERE rk = 1""".stripMargin)
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
        val batch = graft.pipeline.Sketches
          .momentsSketch(prefix.toDF("source", "n_chars"), "source", "n_chars")
          .collect().map(r => r.getAs[String]("source") ->
            ((r.getAs[Long]("n"), r.getAs[Long]("mean_micro"), r.getAs[Long]("var_micro"),
              r.getAs[Long]("skew_micro"), r.getAs[Long]("kurt_micro")))).toMap
        assert(got == batch, s"prefix of ${prefix.size}")
      }
      stream.addData(first: _*)
      query.processAllAvailable()
      check(first)
      stream.addData(second: _*)
      query.processAllAvailable()
      check(first ++ second)
    } finally query.stop()
  }

  test("streaming attribution aggregates to the batch ev15 rollup on in-order streams") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.StreamOps.AttrEvent
    val look = 1000L
    // two users; a touch at the conversion's exact ts (tie → touch first), an
    // out-of-window touch, an unattributed purchase, and a cross-batch register carry
    val first = Seq(
      AttrEvent(1L, 10L, "click", 100L, 0.0), AttrEvent(1L, 11L, "purchase", 100L, 10.004),
      AttrEvent(1L, 12L, "view", 200L, 0.0),
      AttrEvent(2L, 20L, "purchase", 50L, 7.0))
    val second = Seq(
      AttrEvent(1L, 13L, "purchase", 1100L, 3.0), // attributed to the batch-1 view at 200? no: gap 900 <= 1000 → view
      AttrEvent(1L, 14L, "purchase", 5000L, 1.0), // gap 4800 > lookback → none
      AttrEvent(2L, 21L, "signup", 60L, 0.0), AttrEvent(2L, 22L, "purchase", 61L, 2.5))
    val stream = MemoryStream[AttrEvent]
    val query = StreamOps.streamingAttribution(stream.toDS(), lookbackUs = look)
      .toDF().writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(first: _*)
      query.processAllAvailable()
      stream.addData(second: _*)
      query.processAllAvailable()
      val got = spark.sql(
        """SELECT channel, COUNT(*) AS n, CAST(SUM(valueCents) AS BIGINT) AS cents,
          |       CAST(SUM(CASE WHEN gapUs >= 0 THEN gapUs ELSE 0 END) AS BIGINT) AS gap
          |FROM attr GROUP BY 1""".stripMargin)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val batch = AnalyticsQueries.attributionOf(
        (first ++ second).toDF()
          .selectExpr("eventId AS event_id", "userId AS user_id",
            "eventType AS event_type", "tsUs AS ts_us", "value"),
        lookbackUs = look)
        .collect().map(r => r.getAs[String]("channel") ->
          ((r.getAs[Long]("n_conversions"), r.getAs[Long]("value_cents"),
            r.getAs[Long]("sum_gap_us")))).toMap
      assert(got == batch)
      // the planted semantics: same-ts touch attributes (click), in-window carry
      // across batches attributes (view), far purchase lands in none
      assert(got.keySet == Set("click", "view", "signup", "none"))
    } finally query.stop()
  }

  test("mergeAttributionBatch is arrival-order independent within a batch") {
    import graft.streaming.StreamOps.{mergeAttributionBatch, AttrEvent}
    val batch = Seq(
      AttrEvent(1L, 3L, "purchase", 100L, 1.0), AttrEvent(1L, 2L, "click", 100L, 0.0),
      AttrEvent(1L, 5L, "purchase", 300L, 2.0), AttrEvent(1L, 4L, "view", 250L, 0.0))
    val sorted = mergeAttributionBatch(None, batch, 1000L, Set("click", "view", "signup"))
    val shuffled = mergeAttributionBatch(None, batch.reverse, 1000L, Set("click", "view", "signup"))
    assert(sorted == shuffled)
    assert(sorted._2.map(_.channel) == Seq("click", "view"))
    assert(sorted._1.contains((250L, 4L, "view")))
  }

  test("mergeAmsRegs composes: split merge equals one-shot merge") {
    import graft.streaming.StreamOps.mergeAmsRegs
    val signs = (1 to 9).map(i => Vector.tabulate(8)(j => if ((i * 31 + j * 7) % 2 == 0) 1L else -1L))
    val (a, b) = signs.splitAt(4)
    val oneShot = mergeAmsRegs(Vector.fill(8)(0L), signs.iterator)
    val split = mergeAmsRegs(mergeAmsRegs(Vector.fill(8)(0L), a.iterator), b.iterator)
    assert(oneShot == split)
    assert(oneShot.map(math.abs(_)).max <= 9L)
  }

  test("mergeHllRegs is order independent and hllRho matches the string-position rank") {
    import graft.streaming.StreamOps.{hllRho, mergeHllRegs}
    for (w <- Seq(0L, 1L, 5L, 1L << 20, (1L << 26) - 1)) {
      val viaString =
        if (w == 0L) 27
        else ("0" * 26 + w.toBinaryString).takeRight(26).indexOf('1') + 1
      assert(hllRho(w, 26) == viaString, s"rho mismatch for w=$w")
    }
    val hashes = Seq(0x12345678L, 0xABCDEF01L, 0x00000001L, 0xFFFFFFFFL)
    val a = mergeHllRegs(Map.empty, hashes.iterator, 6)
    val b = mergeHllRegs(Map.empty, hashes.reverse.iterator, 6)
    assert(a == b)
  }

  test("streaming RFM register reproduces the batch per-user aggregate on every prefix") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Double)]
    val query = StreamOps.streamingRfm(stream.toDS().toDF("user_id", "tsu", "value"),
        "user_id", "tsu", "value")
      .toDF().writeStream.format("memory").queryName("rfmreg")
      .outputMode(OutputMode.Update()).start()
    val first = Seq((1L, 100L, 1.25), (1L, 300L, 2.005), (2L, 50L, 10.0), (3L, 70L, 0.0))
    val second = Seq((1L, 200L, 0.99), (2L, 400L, 3.333), (4L, 10L, 7.77))
    try {
      def check(prefix: Seq[(Long, Long, Double)]): Unit = {
        val got = spark.sql(
          """SELECT userId, recencyUs, nEvents, monetaryCents FROM (
            |  SELECT *, row_number() OVER (PARTITION BY userId ORDER BY nEvents DESC) AS rk
            |  FROM rfmreg)
            |WHERE rk = 1""".stripMargin)
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
        // the batch rfm per-user aggregate, via the SAME shared cents conversion
        val batch = prefix.toDF("user_id", "tsu", "value")
          .groupBy(col("user_id"))
          .agg(org.apache.spark.sql.functions.max(col("tsu")).as("r"),
            org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
            org.apache.spark.sql.functions.sum(
              graft.AnalyticsQueries.cents(col("value"))).as("m"))
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
        assert(got == batch, s"prefix of ${prefix.size}")
      }
      stream.addData(first: _*)
      query.processAllAvailable()
      check(first)
      stream.addData(second: _*)
      query.processAllAvailable()
      check(first ++ second)
    } finally query.stop()
  }

  test("streaming calibration registers reproduce t44's reliability table on every prefix") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the t44 planted sweep: margin = n * w exactly, several deciles covered,
    // labels flip at the 10-token heuristic minimum
    val wAlpha = 150000L
    val weights = Seq((md5Slot("alpha", 256L), wAlpha)).toDF("slot", "w_micro")
    def doc(n: Int): (Long, String) = (n.toLong, ("alpha " * n) + "w the z")
    val first = (1 to 9).map(doc)
    val second = (10 to 16).map(doc)
    val stream = MemoryStream[(Long, String)]
    val query = StreamOps.streamingCalibration(
        stream.toDS().toDF("doc_id", "text"), "text", weights, buckets = 256, nBins = 10)
      .toDF().writeStream.format("memory").queryName("calreg")
      .outputMode(OutputMode.Update()).start()
    try {
      def check(prefix: Seq[(Long, String)]): Unit = {
        val got = spark.sql(
          """SELECT bin, nDocs, nPos, predMicro, actualMicro, gapMicro FROM (
            |  SELECT *, row_number() OVER (PARTITION BY bin ORDER BY nDocs DESC) AS rk
            |  FROM calreg)
            |WHERE rk = 1""".stripMargin)
          .collect().map(r => r.getLong(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
        val batch = graft.pipeline.TextStats
          .lrCalibration(prefix.toDF("doc_id", "text"), "doc_id", "text", weights,
            buckets = 256, nBins = 10)
          .collect().map(r => r.getAs[Long]("bin") ->
            ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_pos"), r.getAs[Long]("pred_micro"),
              r.getAs[Long]("actual_micro"), r.getAs[Long]("gap_micro")))).toMap
        assert(got == batch, s"prefix of ${prefix.size}: $got vs $batch")
        assert(got.size >= 3, s"planted sweep must cover several deciles: ${got.keys.toSeq.sorted}")
      }
      stream.addData(first: _*)
      query.processAllAvailable()
      check(first)
      stream.addData(second: _*)
      query.processAllAvailable()
      check(first ++ second)
    } finally query.stop()
  }

  test("streaming domain-stats registers reproduce dc01's per-source stats on every prefix") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String, String)]
    val query = StreamOps.streamingDomainStats(
        stream.toDS().toDF("doc_id", "text", "source"), "source", "text")
      .toDF().writeStream.format("memory").queryName("domreg")
      .outputMode(OutputMode.Update()).start()
    val first = Seq(
      (1L, "alpha the beta gamma the delta", "s1"),
      (2L, "a few plain tokens here", "s2"),
      (3L, "more of the same words", "s1"))
    val second = Seq(
      (4L, "late arrival for source one", "s1"),
      (5L, "and a final one for two", "s2"))
    try {
      def check(prefix: Seq[(Long, String, String)]): Unit = {
        val got = spark.sql(
          """SELECT source, nDocs, nTokens, meanQualityMicro FROM (
            |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY nDocs DESC) AS rk
            |  FROM domreg)
            |WHERE rk = 1""".stripMargin)
          .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
        // the batch triage table over the same prefix — same columns, same kernels
        val batch = graft.pipeline.Curation
          .domainStats(prefix.toDF("doc_id", "text", "source"), "doc_id", "text", "source")
          .collect().map(r => r.getAs[String]("source") ->
            ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
              r.getAs[Long]("mean_quality_micro")))).toMap
        assert(got == batch, s"prefix of ${prefix.size}: $got vs $batch")
      }
      stream.addData(first: _*)
      query.processAllAvailable()
      check(first)
      stream.addData(second: _*)
      query.processAllAvailable()
      check(first ++ second)
    } finally query.stop()
  }

  test("streaming span probe emits the d40 archived spans; parity holds across micro-batch cuts") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val archive = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta unique archive tail"),
      (2L, "totally different archived content"))
      .toDF("doc_id", "text")
    val index = graft.pipeline.Dedup.spanHashIndex(archive, "doc_id", "text", windowTokens = 2)
    val spans = scala.collection.mutable.Map[(Long, Long), Long]()
    val stream = MemoryStream[(Long, String)]
    val query = StreamOps.streamingSpanProbe(
        stream.toDS().toDF("doc_id", "text"), "doc_id", "text", index,
        onBatch = (out, _) => spans.synchronized {
          out.collect().foreach(r =>
            spans((r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"))) =
              r.getAs[Long]("span_tokens"))
        },
        windowTokens = 2, minSpanTokens = 4)
      .start()
    try {
      stream.addData(
        (101L, "prefix words then alpha beta gamma delta epsilon and more"),
        (102L, "nothing shared here at all"))
      query.processAllAvailable()
      stream.addData((103L, "x alpha beta gamma delta y"))
      query.processAllAvailable()
      val got = spans.synchronized(spans.toMap)
      // batch parity across the micro-batch cut: same arrivals, one batch probe
      val arrivals = Seq(
        (101L, "prefix words then alpha beta gamma delta epsilon and more"),
        (102L, "nothing shared here at all"),
        (103L, "x alpha beta gamma delta y"))
        .toDF("doc_id", "text")
      val batch = graft.pipeline.Dedup
        .probeSpanIndex(arrivals, "doc_id", "text", index,
          windowTokens = 2, minSpanTokens = 4)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start")) ->
          r.getAs[Long]("span_tokens"))
        .toMap
      assert(got == batch, s"$got vs $batch")
      // 101 embeds "alpha beta gamma delta epsilon" (5 tokens, start 4);
      // 103's run "alpha beta gamma delta" just meets the 4-token bar; a
      // sub-bar overlap or no overlap (102) reports nothing
      assert(got((101L, 4L)) == 5L, got.toString)
      assert(got((103L, 2L)) == 4L, got.toString)
      assert(!got.keys.exists(_._1 == 102L), got.toString)
    } finally query.stop()
  }

  test("streaming bloom probe emits the d37 verdicts; parity holds across micro-batch cuts") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val archive = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different existing content with its own words"))
      .toDF("doc_id", "text")
    val index = graft.pipeline.Dedup.exactHashIndex(archive, "doc_id", "text")
    val verdicts = scala.collection.mutable.Map[Long, (Int, Long, Long)]()
    val stream = MemoryStream[(Long, String)]
    val query = StreamOps.streamingBloomProbe(
        stream.toDS().toDF("doc_id", "text"), "doc_id", "text", index,
        onBatch = (out, _) => verdicts.synchronized {
          out.collect().foreach(r => verdicts(r.getAs[Long]("doc_id")) =
            (r.getAs[Int]("bloom_pos"), r.getAs[Long]("dup_of"), r.getAs[Long]("n_index_copies")))
        })
      .start()
    try {
      stream.addData(
        (101L, "the quick brown fox jumps over the lazy dog again and again"), // exact copy of 1
        (102L, "fresh novel text sharing nothing with the archive"))
      query.processAllAvailable()
      stream.addData((103L, "completely different existing content with its own words")) // copy of 2
      query.processAllAvailable()
      val got = verdicts.synchronized(verdicts.toMap)
      // batch parity across the micro-batch cut: the same arrivals, one batch probe
      val arrivals = Seq(
        (101L, "the quick brown fox jumps over the lazy dog again and again"),
        (102L, "fresh novel text sharing nothing with the archive"),
        (103L, "completely different existing content with its own words"))
        .toDF("doc_id", "text")
      val batch = graft.pipeline.Dedup
        .bloomPrefilteredExactProbe(arrivals, "doc_id", "text", index)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Int]("bloom_pos"), r.getAs[Long]("dup_of"), r.getAs[Long]("n_index_copies"))))
        .toMap
      assert(got == batch, s"$got vs $batch")
      // the copies screen in and resolve; the novel arrival screens out
      assert(got(101L) == ((1, 1L, 1L)) && got(103L) == ((1, 2L, 1L)), got.toString)
      assert(got(102L) == ((0, -1L, 0L)), got.toString)
    } finally query.stop()
  }

  test("streaming CMS buckets equal the batch census across micro-batch cuts") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val query = StreamOps.streamingCmsBuckets(
        stream.toDS().toDF("doc_id", "text"), "doc_id", "text", depth = 2, width = 8)
      .writeStream.outputMode("complete").format("memory").queryName("cms_live")
      .start()
    try {
      stream.addData((1L, "the quick brown fox the fox"), (2L, "lazy dog"))
      query.processAllAvailable()
      stream.addData((3L, "the dog barks at the fox"))
      query.processAllAvailable()
      val live = spark.table("cms_live").collect()
        .map(r => (r.getAs[Int]("r"), r.getAs[Long]("bucket"), r.getAs[Long]("bucket_n")))
        .toSet
      // the batch census over ALL arrivals — mergeable state means the cut
      // placement cannot matter
      val arrivals = Seq((1L, "the quick brown fox the fox"), (2L, "lazy dog"),
        (3L, "the dog barks at the fox")).toDF("doc_id", "text")
      val batch = graft.pipeline.TextStats.tokens(arrivals, "doc_id", "text")
        .select(col("token"), explode(array(lit(0), lit(1))).as("r"))
        .withColumn("bucket", graft.pipeline.Sketches.cmsBucket(col("r"), col("token"), 8))
        .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("bucket_n"))
        .collect()
        .map(r => (r.getAs[Int]("r"), r.getAs[Long]("bucket"), r.getAs[Long]("bucket_n")))
        .toSet
      assert(live.nonEmpty && live == batch, s"$live vs $batch")
    } finally query.stop()
  }

  test("streaming incremental dedup emits the d17 verdicts against a loaded static index") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val archive = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different existing content with its own words"))
      .toDF("doc_id", "text")
    val scratch = java.nio.file.Files.createTempDirectory("graft-stream-idx")
    graft.pipeline.Dedup.saveDedupIndex(
      graft.pipeline.Dedup.dedupIndex(archive, "doc_id", "text"), scratch.toString + "/idx")
    val index = graft.pipeline.Dedup.loadDedupIndex(spark, scratch.toString + "/idx")

    val stream = MemoryStream[(Long, String)]
    val verdicts = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    val query = StreamOps.streamingIncrementalDedup(
        stream.toDS().toDF("doc_id", "text"), "doc_id", "text", index,
        onBatch = (out, _) => verdicts.synchronized {
          out.collect().foreach(r =>
            verdicts(r.getAs[Long]("doc_id")) = (r.getAs[Long]("dup_of"), r.getAs[Long]("n_bands")))
        })
      .start()
    try {
      stream.addData(
        (101L, "the quick brown fox jumps over the lazy dog again and again"), // copy of 1
        (102L, "fresh novel text sharing nothing with the archive"))
      query.processAllAvailable()
      stream.addData((103L, "completely different existing content with its own words")) // copy of 2
      query.processAllAvailable()
      val got = verdicts.synchronized(verdicts.toMap)
      // batch parity: the same arrivals through the batch probe
      val arrivals = Seq(
        (101L, "the quick brown fox jumps over the lazy dog again and again"),
        (102L, "fresh novel text sharing nothing with the archive"),
        (103L, "completely different existing content with its own words"))
        .toDF("doc_id", "text")
      val batch = graft.pipeline.Dedup.incrementalDedupAgainst(
          graft.pipeline.Dedup.dedupIndex(arrivals, "doc_id", "text"), "doc_id", index)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("dup_of"), r.getAs[Long]("n_bands")))).toMap
      assert(got == batch, s"$got vs $batch")
      assert(got.keySet == Set(101L, 103L) && got(101L) == ((1L, 16L)), got.toString)
    } finally query.stop()
  }

  test("streaming decontamination emits the d19 verdicts against a loaded benchmark index") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val benchmark = Seq(
      (10L, "the secret benchmark answer is forty two exactly"),
      (20L, "another eval question entirely different from others here"))
      .toDF("doc_id", "text")
    val scratch = java.nio.file.Files.createTempDirectory("graft-stream-bench")
    graft.pipeline.Dedup.saveBenchIndex(
      graft.pipeline.Dedup.benchIndex(benchmark, "doc_id", "text"), scratch.toString + "/bench")
    val index = graft.pipeline.Dedup.loadBenchIndex(spark, scratch.toString + "/bench")

    val stream = MemoryStream[(Long, String)]
    val flagged = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    val query = StreamOps.streamingDecontaminate(
        stream.toDS().toDF("doc_id", "text"), "doc_id", "text", index,
        onBatch = (out, _) => flagged.synchronized {
          out.collect().foreach(r => flagged(r.getAs[Long]("doc_id")) =
            ((r.getAs[Long]("n_hits"), r.getAs[Long]("hit_frac_micro"),
              r.getAs[Long]("first_bench_id"))))
        })
      .start()
    try {
      stream.addData(
        (1L, "intro words then the secret benchmark answer is forty two exactly closing remark"),
        (2L, "nothing shared here at all with anything else whatsoever"))
      query.processAllAvailable()
      stream.addData((3L, "another eval question entirely different from others here verbatim copy"))
      query.processAllAvailable()
      val got = flagged.synchronized(flagged.toMap)
      // batch parity: the same arrivals through the batch probe
      val arrivals = Seq(
        (1L, "intro words then the secret benchmark answer is forty two exactly closing remark"),
        (2L, "nothing shared here at all with anything else whatsoever"),
        (3L, "another eval question entirely different from others here verbatim copy"))
        .toDF("doc_id", "text")
      val batch = graft.pipeline.Dedup.decontaminateAgainst(arrivals, "doc_id", "text", index)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_hits"), r.getAs[Long]("hit_frac_micro"),
            r.getAs[Long]("first_bench_id")))).toMap
      assert(got == batch, s"$got vs $batch")
      // the clean doc never appears; doc 1 quotes bench 10, doc 3 quotes bench 20
      assert(got.keySet == Set(1L, 3L), got.toString)
      assert(got(1L)._3 == 10L && got(3L)._3 == 20L, got.toString)
    } finally query.stop()
  }

  test("streaming quality gate emits the t39 scores against a loaded weight artifact") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // disjoint-vocab supervision (the RoundTwelveOpsSpec planting): prose docs
    // pass the t05 gate, gibberish fails — trained weights separate them
    val snapshot = ((1L to 6L).map(i =>
      (i, s"the cat sat on a mat of warm wool and felt fine day$i")) ++
      (11L to 16L).map(i =>
        (i, s"zzzzqqqqxxxxwwww$i kkkkjjjjhhhhgggg qqqywvvvvbbbbnnnnmmmm")))
      .toDF("doc_id", "text")
    val scratch = java.nio.file.Files.createTempDirectory("graft-stream-lr")
    graft.pipeline.TextStats.saveLrWeights(
      graft.pipeline.TextStats.lrQualityTrain(snapshot, "doc_id", "text",
        buckets = 64, rounds = 3, lrMicro = 500000L), scratch.toString + "/w")
    val weights = graft.pipeline.TextStats.loadLrWeights(spark, scratch.toString + "/w")
      .localCheckpoint(true)

    val stream = MemoryStream[(Long, String)]
    val scores = scala.collection.mutable.Map.empty[Long, (Long, String)]
    val query = StreamOps.streamingQualityGate(
        stream.toDS().toDF("doc_id", "text"), "doc_id", "text", weights,
        onBatch = (out, _) => scores.synchronized {
          out.collect().foreach(r => scores(r.getAs[Long]("doc_id")) =
            ((r.getAs[Long]("margin_micro"), r.getAs[String]("label"))))
        }, buckets = 64)
      .start()
    try {
      stream.addData(
        (101L, "the cat sat on a mat of warm wool and felt fine today"),
        (102L, "zzzzqqqqxxxxwwww kkkkjjjjhhhhgggg qqqywvvvvbbbbnnnnmmmm"))
      query.processAllAvailable()
      stream.addData((103L, "a mat of warm wool and the cat"))
      query.processAllAvailable()
      val got = scores.synchronized(scores.toMap)
      // batch parity: the same arrivals through the batch scorer
      val arrivals = Seq(
        (101L, "the cat sat on a mat of warm wool and felt fine today"),
        (102L, "zzzzqqqqxxxxwwww kkkkjjjjhhhhgggg qqqywvvvvbbbbnnnnmmmm"),
        (103L, "a mat of warm wool and the cat"))
        .toDF("doc_id", "text")
      val batch = graft.pipeline.TextStats.lrScoreWith(arrivals, "doc_id", "text", weights, buckets = 64)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("margin_micro"), r.getAs[String]("label")))).toMap
      assert(got == batch, s"$got vs $batch")
      // the trained gate separates the arrivals like their training twins
      assert(got(101L)._2 == "keep" && got(103L)._2 == "keep" && got(102L)._2 == "drop", got.toString)
    } finally query.stop()
  }

  test("streaming media gate emits the batch m08 battery per micro-batch of arrivals") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val verdicts = scala.collection.mutable.Map.empty[Long, (Long, Int)]
    val stream = MemoryStream[(Long, String, Array[Byte])]
    val query = StreamOps.streamingMediaGate(
        stream.toDS().toDF("doc_id", "source", "media"), "doc_id", "source", "media",
        onBatch = (out, _) => verdicts.synchronized {
          out.collect().foreach(r => verdicts(r.getAs[Long]("asset_id")) =
            ((r.getAs[Long]("reasons"), r.getAs[Int]("kept"))))
        })
      .start()
    try {
      def payload(n: Int): Array[Byte] = Array.fill(n)('x'.toByte)
      // the m08 planted battery: asset id IS its expected bitmask
      val arrivals = Seq(
        (0L, "img", payload(64)), (1L, "img", payload(26)), (2L, "img", payload(589)),
        (4L, "img", payload(93)), (8L, "img", payload(230)))
      stream.addData(arrivals.take(2): _*)
      query.processAllAvailable()
      stream.addData(arrivals.drop(2): _*)
      query.processAllAvailable()
      val got = verdicts.synchronized(verdicts.toMap)
      val batch = graft.pipeline.Multimodal
        .mediaQualityGate(arrivals.toDF("doc_id", "source", "media"),
          "doc_id", "source", "media")
        .collect().map(r => r.getAs[Long]("asset_id") ->
          ((r.getAs[Long]("reasons"), r.getAs[Int]("kept")))).toMap
      assert(got == batch, s"$got vs $batch")
      assert(got == Map(0L -> ((0L, 1)), 1L -> ((1L, 0)), 2L -> ((2L, 0)),
        4L -> ((4L, 0)), 8L -> ((8L, 0))), got.toString)
    } finally query.stop()
  }

  test("streaming semantic decontamination probes arrivals against the benchmark vectors") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bench = Seq((0L, Array(1.0f, 0.0f)), (10L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val verdicts = scala.collection.mutable.Map.empty[Long, (Long, Long, Int)]
    val stream = MemoryStream[(Long, Array[Float])]
    val query = StreamOps.streamingSemanticDecontam(
        stream.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding", bench,
        onBatch = (out, _) => verdicts.synchronized {
          out.collect().foreach(r => verdicts(r.getAs[Long]("vec_id")) =
            ((r.getAs[Long]("bench_id"), r.getAs[Long]("max_cos_micro"),
              r.getAs[Int]("contaminated"))))
        },
        thresholdMicro = 950000L)
      .start()
    try {
      val arrivals = Seq(
        (1L, Array(2.0f, 0.0f)),  // colinear paraphrase -> contaminated
        (3L, Array(1.0f, 1.0f)),  // tie at 707107 -> bench 0, clean
        (4L, Array(-1.0f, 0.0f))) // max 0 via bench 10, clean
      stream.addData(arrivals.take(1): _*)
      query.processAllAvailable()
      stream.addData(arrivals.drop(1): _*)
      query.processAllAvailable()
      val got = verdicts.synchronized(verdicts.toMap)
      val batch = graft.pipeline.Similarity
        .semanticProbe(arrivals.toDF("vec_id", "embedding"), bench,
          "vec_id", "embedding", thresholdMicro = 950000L)
        .collect().map(r => r.getAs[Long]("vec_id") ->
          ((r.getAs[Long]("bench_id"), r.getAs[Long]("max_cos_micro"),
            r.getAs[Int]("contaminated")))).toMap
      assert(got == batch, s"$got vs $batch")
      assert(got(1L)._3 == 1 && got(3L)._3 == 0 && got(4L)._3 == 0, got.toString)
    } finally query.stop()
  }

  test("streaming semantic dedup probes arrivals against the trained corpus cells (batch parity)") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // corpus: two orthogonal directions; trained 2-cell codebook + cells built
    // once at stream setup, exactly the serving posture
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (10L, Array(0.0f, 1.0f)), (11L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val model = graft.pipeline.Similarity.kmeansRounds(
      corpus, "vec_id", "embedding", k = 2, dims = 2, rounds = 2)
    val cells = graft.pipeline.Similarity.assignToCells(
      corpus, "vec_id", "embedding", model)
    val verdicts = scala.collection.mutable.Map.empty[Long, (Long, Long, Int)]
    val stream = MemoryStream[(Long, Array[Float])]
    val query = StreamOps.streamingSemanticDedup(
        stream.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding",
        model, cells,
        onBatch = (out, _) => verdicts.synchronized {
          out.collect().foreach(r => verdicts(r.getAs[Long]("vec_id")) =
            ((r.getAs[Long]("n_close"), r.getAs[Long]("dup_of"),
              r.getAs[Int]("is_dup"))))
        },
        thresholdMicro = 950000L)
      .start()
    try {
      val arrivals = Seq(
        (20L, Array(0.95f, 0.05f)), // paraphrase of corpus direction 1 -> dup
        (21L, Array(-0.7f, 0.7f)))  // near-orthogonal to its cell -> clean
      stream.addData(arrivals.take(1): _*)
      query.processAllAvailable()
      stream.addData(arrivals.drop(1): _*)
      query.processAllAvailable()
      val got = verdicts.synchronized(verdicts.toMap)
      val batch = graft.pipeline.Dedup.semanticDedupProbe(
          arrivals.toDF("vec_id", "embedding"), corpus, "vec_id", "embedding",
          model, thresholdMicro = 950000L)
        .collect().map(r => r.getAs[Long]("vec_id") ->
          ((r.getAs[Long]("n_close"), r.getAs[Long]("dup_of"),
            r.getAs[Int]("is_dup")))).toMap
      assert(got == batch, s"$got vs $batch")
      assert(got(20L)._3 == 1 && got(20L)._2 >= 1L, got.toString)
      assert(got(21L)._3 == 0 && got(21L)._2 == -1L, got.toString)
    } finally query.stop()
  }

  test("streaming gopher gate emits the full batch t48 filter per micro-batch of arrivals") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val verdicts = scala.collection.mutable.Map.empty[Long, (Long, Long, Int)]
    val stream = MemoryStream[(Long, String)]
    // thresholds tuned down for the short planted docs (the pass-through the
    // docstring names): word-count floor 2, one required word from this vocab
    val query = StreamOps.streamingGopherGate(
        stream.toDS().toDF("doc_id", "text"), "doc_id", "text",
        onBatch = (out, _) => verdicts.synchronized {
          out.collect().foreach(r => verdicts(r.getAs[Long]("doc_id")) =
            ((r.getAs[Long]("quality_reasons"), r.getAs[Long]("rep_reasons"),
              r.getAs[Int]("kept"))))
        },
        minWords = 2L, requiredWords = Seq("a", "b"), minRequiredHits = 1)
      .start()
    try {
      val arrivals = Seq(
        (201L, "a b a b a b"),                        // loops: the top battery fires
        (202L, "p q r s t p q r s t u a"),            // 5-gram echo: the dup battery fires
        // clean doc must be LONG: with n tokens all distinct the top 4-gram
        // still covers (4t+3)/(nt+n-1) chars, above the 0.16 bar until n ~ 25;
        // 4-char tokens keep the mean word length above the quality floor of 3
        (203L, "a " + ('a' to 'z').map(c => s"$c$c$c$c").mkString(" ")),
        (204L, "b"))                                  // quality battery: below the word floor
      stream.addData(arrivals.take(2): _*)
      query.processAllAvailable()
      stream.addData(arrivals.drop(2): _*)
      query.processAllAvailable()
      val got = verdicts.synchronized(verdicts.toMap)
      val batch = graft.pipeline.TextStats
        .gopherGate(arrivals.toDF("doc_id", "text"), "doc_id", "text",
          minWords = 2L, requiredWords = Seq("a", "b"), minRequiredHits = 1)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("quality_reasons"), r.getAs[Long]("rep_reasons"),
            r.getAs[Int]("kept")))).toMap
      assert(got == batch, s"$got vs $batch")
      // repetition drops 201/202, quality drops 204, the long clean doc passes BOTH
      assert(got(201L)._3 == 0 && got(201L)._2 != 0L, got.toString)
      assert(got(202L)._3 == 0 && got(202L)._2 != 0L, got.toString)
      assert(got(204L)._3 == 0 && got(204L)._1 != 0L && got(204L)._2 == 0L, got.toString)
      assert(got(203L)._3 == 1, got.toString)
    } finally query.stop()
  }

  test("streaming funnel registers roll up to the batch ev19 operator on every prefix") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import StreamOps.FunnelEvent
    // three users: u1 full conversion, u2 stalls at click, u3 purchases BEFORE
    // viewing (the ordering case a per-type count gets wrong)
    val batch1 = Seq(
      FunnelEvent(1L, "view", 1000L), FunnelEvent(1L, "click", 2000L),
      FunnelEvent(2L, "view", 1500L),
      FunnelEvent(3L, "purchase", 500L), FunnelEvent(3L, "view", 900L))
    val batch2 = Seq(
      FunnelEvent(1L, "purchase", 5000L),
      FunnelEvent(2L, "click", 1500L), // equal ts: strictly-after rule rejects it
      FunnelEvent(2L, "click", 2500L),
      FunnelEvent(3L, "click", 1200L))
    val stream = MemoryStream[FunnelEvent]
    val rows = scala.collection.mutable.Map.empty[Long, (Int, Long, Long, Long)]
    val query = StreamOps.streamingFunnel(stream.toDS())
      .writeStream.outputMode("update")
      .foreachBatch { (out: org.apache.spark.sql.Dataset[StreamOps.FunnelUserRow], _: Long) =>
        rows.synchronized {
          out.collect().foreach(r => rows(r.userId) = ((r.step, r.t1, r.t2, r.t3)))
        }
      }
      .start()
    try {
      def batchRollup(events: Seq[FunnelEvent]): Map[Int, (Long, Long)] =
        AnalyticsQueries.funnelOf(events.toDF("user_id", "event_type", "tsu"))
          .collect()
          .map(r => r.getAs[Int]("step") -> ((r.getAs[Long]("n_users"), r.getAs[Long]("sum_gap_us"))))
          .toMap
      def registerRollup(): Map[Int, (Long, Long)] = {
        val rs = rows.synchronized(rows.toMap)
        Map(
          1 -> ((rs.values.count(_._1 >= 1).toLong, 0L)),
          2 -> ((rs.values.count(_._1 >= 2).toLong,
            rs.values.filter(_._1 >= 2).map(v => v._3 - v._2).sum)),
          3 -> ((rs.values.count(_._1 >= 3).toLong,
            rs.values.filter(_._1 >= 3).map(v => v._4 - v._3).sum)))
      }
      stream.addData(batch1)
      query.processAllAvailable()
      assert(registerRollup() == batchRollup(batch1), s"prefix 1: ${rows.toMap}")
      stream.addData(batch2)
      query.processAllAvailable()
      assert(registerRollup() == batchRollup(batch1 ++ batch2), s"prefix 2: ${rows.toMap}")
      // the ordering cases: u3's early purchase never converts; u2's equal-ts
      // click is rejected, its later click lands
      val rs = rows.synchronized(rows.toMap)
      assert(rs(3L)._1 == 2 && rs(2L)._1 == 2 && rs(1L)._1 == 3, rs.toString)
    } finally query.stop()
  }

  test("streaming ANN search answers query batches from the loaded graph index (s26 parity)") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.pipeline.Similarity
    // the s26 recall corpus: 4 tight clusters around orthogonal axes in 8 dims
    val corpus = (for {
      c <- 0 until 4
      j <- 0 until 10
    } yield {
      val v = Array.fill(8)(0.0f)
      v(2 * c) = 1.0f
      for (i <- 0 until 8) v(i) = v(i) + 0.05f * (((i * 7 + j * 13 + c * 3) % 5) - 2)
      (c * 10L + j, v)
    }).toDF("vec_id", "embedding").localCheckpoint(true)
    val scratch = java.nio.file.Files.createTempDirectory("graft-stream-ann")
    val model = Similarity.kmeansRounds(corpus, "vec_id", "embedding", k = 8, dims = 8, rounds = 2)
    Similarity.saveGraphAnnIndex(
      Similarity.knnGraph(corpus, "vec_id", "embedding", k = 5, dims = 8),
      model,
      Similarity.graphAnnEntryPoints(corpus, "vec_id", "embedding", model),
      scratch.toString + "/index")
    val (adj, m, ent) = Similarity.loadGraphAnnIndex(spark, scratch.toString + "/index")
    val adjC = adj.localCheckpoint(true)
    val entC = ent.localCheckpoint(true)
    val mC = m.localCheckpoint(true)

    val stream = MemoryStream[(Long, Array[Float])]
    val answers = scala.collection.mutable.Map.empty[(Long, Int), Long]
    val query = StreamOps.streamingAnnSearch(
        stream.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding",
        corpus, adjC, mC, entC,
        onBatch = (out, _) => answers.synchronized {
          out.collect().foreach(r => answers(
            (r.getAs[Long]("query_id"), r.getAs[Int]("rank"))) = r.getAs[Long]("neighbor_id"))
        }, k = 5, beam = 8, rounds = 2, entryProbe = 4)
      .start()
    try {
      val q1 = corpus.filter(col("vec_id") === 3L)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Float]]("embedding").toArray))
      val q2 = corpus.filter(col("vec_id") % 10 === 7)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Float]]("embedding").toArray))
      stream.addData(q1.toIndexedSeq)
      query.processAllAvailable()
      stream.addData(q2.toIndexedSeq)
      query.processAllAvailable()
      val got = answers.synchronized(answers.toMap)
      // batch parity: the same queries through the batch searcher over the same
      // loaded index must produce identical (query, rank) -> neighbor answers
      val allQ = corpus.filter(col("vec_id") === 3L || col("vec_id") % 10 === 7)
      val batch = Similarity.graphAnnSearch(allQ, corpus, "vec_id", "embedding",
          adjC, mC, k = 5, beam = 8, rounds = 2, entryProbe = 4, entries = Some(entC))
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) -> r.getAs[Long]("neighbor_id"))
        .toMap
      assert(got == batch, s"streaming $got vs batch $batch")
      assert(got.keys.map(_._1).toSet == Set(3L, 7L, 17L, 27L, 37L), got.keys.toString)
    } finally query.stop()
  }

  test("streaming routed ANN serves each tenant filter through the s48 arm its selectivity earns") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.pipeline.Similarity
    val corpus = (for {
      c <- 0 until 4
      j <- 0 until 10
    } yield {
      val v = Array.fill(8)(0.0f)
      v(2 * c) = 1.0f
      for (i <- 0 until 8) v(i) = v(i) + 0.05f * (((i * 7 + j * 13 + c * 3) % 5) - 2)
      (c * 10L + j, v)
    }).toDF("vec_id", "embedding").localCheckpoint(true)
    val model = Similarity.kmeansRounds(corpus, "vec_id", "embedding", k = 8, dims = 8, rounds = 2)
      .localCheckpoint(true)
    val adjC = Similarity.knnGraph(corpus, "vec_id", "embedding", k = 5, dims = 8)
      .localCheckpoint(true)
    val entC = Similarity.graphAnnEntryPoints(corpus, "vec_id", "embedding", model)
      .localCheckpoint(true)
    // broad tenant (50% of ids -> harvest walk) and starving tenant
    // (2 of 40 ids -> exact allowed scan), each its own serving stream
    def runStream(allowed: org.apache.spark.sql.DataFrame): Map[(Long, Int), (Long, String)] = {
      val stream = MemoryStream[(Long, Array[Float])]
      val answers = scala.collection.mutable.Map.empty[(Long, Int), (Long, String)]
      val query = StreamOps.streamingRoutedAnnSearch(
          stream.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding",
          corpus, adjC, model, entC, allowed,
          onBatch = (out, _) => answers.synchronized {
            out.collect().foreach(r => answers(
              (r.getAs[Long]("query_id"), r.getAs[Int]("rank"))) =
              ((r.getAs[Long]("neighbor_id"), r.getAs[String]("route"))))
          }, k = 3, beam = 8, rounds = 2, entryProbe = 4)
        .start()
      try {
        val qs = corpus.filter(col("vec_id") % 10 === 7)
          .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Float]]("embedding").toArray))
        stream.addData(qs.take(2).toIndexedSeq)
        query.processAllAvailable()
        stream.addData(qs.drop(2).toIndexedSeq)
        query.processAllAvailable()
        answers.synchronized(answers.toMap)
      } finally query.stop()
    }
    def runBatch(allowed: org.apache.spark.sql.DataFrame): Map[(Long, Int), (Long, String)] =
      Similarity.graphAnnFilteredRouted(
          corpus.filter(col("vec_id") % 10 === 7), corpus, "vec_id", "embedding",
          adjC, model, allowed, k = 3, beam = 8, rounds = 2, entryProbe = 4,
          entries = Some(entC))
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
          ((r.getAs[Long]("neighbor_id"), r.getAs[String]("route"))))
        .toMap
    val broad = corpus.filter(col("vec_id") % 2 === 0).select(col("vec_id"))
      .localCheckpoint(true)
    val starved = corpus.filter(col("vec_id") % 37 === 0).select(col("vec_id"))
      .localCheckpoint(true)
    val gotBroad = runStream(broad)
    assert(gotBroad.values.map(_._2).toSet == Set("graph_harvest"), gotBroad.toString)
    assert(gotBroad == runBatch(broad), "broad-filter stream/batch divergence")
    val gotStarved = runStream(starved)
    assert(gotStarved.values.map(_._2).toSet == Set("exact_allowed_scan"), gotStarved.toString)
    assert(gotStarved == runBatch(starved), "starved-filter stream/batch divergence")
    // the starving tenant still gets answers — the routed exact arm serves
    // what the starved harvest pool could not
    assert(gotStarved.nonEmpty)
  }

  test("streaming frame dedup emits the m07 verdicts against a loaded frame index") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val archive = Seq((1L, "AAAABBBBCCCC".getBytes("UTF-8"))).toDF("asset_id", "media")
    val scratch = java.nio.file.Files.createTempDirectory("graft-frame-idx")
    graft.pipeline.Multimodal.saveFrameIndex(
      graft.pipeline.Multimodal.frameIndex(archive, "asset_id", "media",
        frameBytes = 4, stride = 1), scratch.toString + "/frames")
    val index = graft.pipeline.Multimodal.loadFrameIndex(spark, scratch.toString + "/frames")

    val stream = MemoryStream[(Long, Array[Byte])]
    val flagged = scala.collection.mutable.Map.empty[Long, (Long, Long, Long, Long)]
    val query = StreamOps.streamingFrameDedup(
        stream.toDS().toDF("asset_id", "media"), "asset_id", "media", index,
        onBatch = (out, _) => flagged.synchronized {
          out.collect().foreach(r => flagged(r.getAs[Long]("asset_id")) =
            ((r.getAs[Long]("n_frames"), r.getAs[Long]("n_shared"),
              r.getAs[Long]("shared_frac_micro"), r.getAs[Long]("dup_of"))))
        },
        frameBytes = 4, stride = 1)
      .start()
    try {
      stream.addData(
        (101L, "AAAAXXXXBBBB".getBytes("UTF-8")), // reuses 2 of its 3 frames
        (102L, "YYYYZZZZ".getBytes("UTF-8")))     // shares nothing -> never emits
      query.processAllAvailable()
      val got = flagged.synchronized(flagged.toMap)
      assert(got == Map(101L -> ((3L, 2L, 666667L, 1L))), got.toString)
      // batch parity over the same arrivals
      val arrivals = Seq(
        (101L, "AAAAXXXXBBBB".getBytes("UTF-8")), (102L, "YYYYZZZZ".getBytes("UTF-8")))
        .toDF("asset_id", "media")
      val batch = graft.pipeline.Multimodal.probeFrameIndex(
          arrivals, "asset_id", "media", index, frameBytes = 4, stride = 1)
        .collect().map(r => r.getAs[Long]("asset_id") ->
          ((r.getAs[Long]("n_frames"), r.getAs[Long]("n_shared"),
            r.getAs[Long]("shared_frac_micro"), r.getAs[Long]("dup_of")))).toMap
      assert(got == batch)
    } finally query.stop()
  }

  test("streaming coverage reproduces batch dc05 on every prefix") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the saved codebook: the two axis centroids of the dc05 planted fixture
    val centroids = Seq(
      (2L, Array(1.0, 0.0, 0.0, 0.0)), (4L, Array(0.0, 1.0, 0.0, 0.0)))

    val stream = MemoryStream[(Long, String, Array[Float])]
    val latest = scala.collection.mutable.Map.empty[String, (Long, Long, Long, Long)]
    val query = StreamOps.streamingCoverage(
        stream.toDS().toDF("vec_id", "source", "embedding"), "source", "embedding", centroids)
      .writeStream.outputMode("update")
      .foreachBatch { (out: org.apache.spark.sql.Dataset[StreamOps.CoverageRow], _: Long) =>
        latest.synchronized {
          out.collect().foreach(r =>
            latest(r.source) = ((r.nVecs, r.nCells, r.entropyMicroNats, r.topCellShareMicro)))
        }
      }
      .start()

    def checkAgainstBatch(prefix: Seq[(Long, String, Array[Float])]): Unit = {
      val emb = prefix.map { case (id, _, v) => (id, v) }
        .toDF("vec_id", "embedding")
        // the batch operator derives its centroids from the corpus sample; plant
        // the SAME codebook vectors under the even ids the mod-2 convention picks
        .unionByName(Seq((2L, Array(1f, 0f, 0f, 0f)), (4L, Array(0f, 1f, 0f, 0f)))
          .toDF("vec_id", "embedding"))
      val docs = (prefix.map { case (id, s, _) => (id, s) } ++ Seq((2L, "sCode"), (4L, "sCode")))
        .toDF("doc_id", "source")
      val batch = graft.pipeline.Curation.semanticCoverage(
          docs, emb, "doc_id", "source", "vec_id", "embedding", centroidMod = 2)
        .collect().map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("n_vecs"), r.getAs[Long]("n_cells"),
            r.getAs[Long]("entropy_micro_nats"), r.getAs[Long]("top_cell_share_micro")))).toMap
      val got = latest.synchronized(latest.toMap)
      for ((src, v) <- got) assert(batch(src) == v, s"$src: $v vs ${batch(src)}")
      assert(got.nonEmpty)
    }

    try {
      val first = Seq(
        (11L, "sNarrow", Array(0.9f, 0.1f, 0f, 0f)),
        (13L, "sNarrow", Array(0.95f, 0.05f, 0f, 0f)),
        (15L, "sBroad", Array(0.8f, 0.2f, 0f, 0f)))
      stream.addData(first: _*)
      query.processAllAvailable()
      checkAgainstBatch(first)

      // later arrivals split sBroad across both cells — entropy rises, top share
      // falls, and the register keeps exact batch parity on the longer prefix
      val second = Seq(
        (17L, "sBroad", Array(0.1f, 0.9f, 0f, 0f)),
        (19L, "sNarrow", Array(1f, 0f, 0f, 0f)))
      stream.addData(second: _*)
      query.processAllAvailable()
      checkAgainstBatch(first ++ second)
    } finally query.stop()
  }

  test("streaming drift reproduces batch t37 on every prefix") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bks = 64
    val early = Seq((0L, "a b c a", "s1"), (1L, "b c d", "s2"), (2L, "a a e", "s1"))
    val reference: Map[String, Map[Long, Long]] = early.groupBy(_._3).map { case (src, ds) =>
      src -> ds.flatMap(_._2.split(" ")).groupBy(t => md5Slot(t, bks.toLong))
        .map { case (b, ts) => b -> ts.size.toLong }
    }
    val stream = MemoryStream[(String, String)]
    val query = StreamOps.streamingDrift(stream.toDS().toDF("source", "text"),
        "source", "text", reference, bks)
      .toDF().writeStream.format("memory").queryName("drift")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    val first = Seq(("s1", "a b x"), ("s2", "d d"))
    val second = Seq(("s1", "y y z"), ("s2", "b"))
    try {
      def check(prefix: Seq[(String, String)]): Unit = {
        val got = spark.sql(
          """SELECT source, nTokens, klMicroNats FROM (
            |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY nTokens DESC) AS rk
            |  FROM drift)
            |WHERE rk = 1""".stripMargin)
          .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        val batchDf = (early ++ prefix.zipWithIndex.map { case ((src, t), i) =>
          (100L + i, t, src)
        }).toDF("doc_id", "text", "source")
        val batch = graft.pipeline.TextStats
          .sourceDriftHashed(batchDf, "doc_id", "text", "source", cutId = 100L, buckets = bks)
          .collect()
          .map(r => r.getString(0) -> ((r.getAs[Long]("n_late_tokens"),
            r.getAs[Long]("kl_micro_nats")))).toMap
        got.foreach { case (src, v) => assert(batch(src) == v, s"$src at prefix ${prefix.size}") }
        assert(got.nonEmpty)
      }
      stream.addData(first: _*)
      query.processAllAvailable()
      check(first)
      stream.addData(second: _*)
      query.processAllAvailable()
      check(first ++ second)
    } finally query.stop()
  }

  test("streaming weighted reservoir equals the batch A-ES sample after every prefix") {
    import spark.implicits._
    import graft.streaming.StreamOps.WeightedDoc
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[WeightedDoc]
    val query = StreamOps.streamingWeightedSample(stream.toDS(), k = 3)
      .toDF().writeStream.format("memory").queryName("wres")
      .outputMode(OutputMode.Update()).start()
    // arrival order scrambled vs id order on purpose: the sample must not care
    val first = Seq(WeightedDoc(9L, "a", 40L), WeightedDoc(2L, "a", 1L),
      WeightedDoc(5L, "a", 900L), WeightedDoc(11L, "b", 7L), WeightedDoc(4L, "a", 0L))
    val second = Seq(WeightedDoc(1L, "a", 5000L), WeightedDoc(3L, "a", 2L),
      WeightedDoc(8L, "b", 60L), WeightedDoc(6L, "b", 3L), WeightedDoc(7L, "b", 3L))
    def check(prefix: Seq[WeightedDoc]): Unit = {
      // a re-emitted reservoir replaces the previous one; the memory sink appends,
      // so the LAST row per (source, doc) is the current membership
      val latest = spark.sql(
        """SELECT source, docId, weight, keyNano, selRank FROM wres""")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
        .groupBy(t => (t._1, t._2)).map { case (_, rows) => rows.last }
        .toSet
      val batch = graft.pipeline.Sampling.weightedSample(
          prefix.toDF("doc_id", "source", "wt"), "doc_id", "source", "wt", k = 3)
        .collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("weight"), r.getAs[Long]("key_nano"), r.getAs[Int]("sel_rank")))
        .toSet
      // batch rows ⊆ latest emissions with identical (key, rank); stale memory-sink
      // rows from earlier batches may linger for ids that since fell out, so
      // compare on the batch winner set per source
      batch.foreach { row =>
        assert(latest.contains(row), s"missing reservoir row $row in $latest")
      }
    }
    try {
      stream.addData(first: _*)
      query.processAllAvailable()
      check(first)
      stream.addData(second: _*)
      query.processAllAvailable()
      check(first ++ second)
    } finally query.stop()
  }

  test("streaming repeat registers price to dc32's card on every prefix") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String, String)]
    val query = StreamOps.streamingRepeatRegisters(
        stream.toDS().toDF("doc_id", "text", "source"), "source", "text")
      .toDF().writeStream.format("memory").queryName("repreg")
      .outputMode(OutputMode.Update()).start()
    val first = Seq(
      (1L, "alpha beta gamma delta", "s1"),
      (2L, "one two three four five six", "s2"),
      (3L, "seven more words arrive for source one here", "s1"))
    val second = Seq(
      (4L, "late tokens", "s1"),
      (5L, "and a final batch of arrivals for source two", "s2"))
    try {
      def check(prefix: Seq[(Long, String, String)]): Unit = {
        // latest register per source (memory sink keeps every update)
        val regs = spark.sql(
          """SELECT source, nDocs AS n_docs, uniqueTokens AS unique_tokens FROM (
            |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY nDocs DESC) AS rk
            |  FROM repreg)
            |WHERE rk = 1""".stripMargin)
        def card(df: org.apache.spark.sql.DataFrame) = df.collect()
          .map(r => r.getAs[String]("source") ->
            ((r.getAs[Long]("n_docs"), r.getAs[Long]("unique_tokens"),
              r.getAs[Long]("epochs_micro"), r.getAs[Long]("effective_tokens"),
              r.getAs[String]("verdict")))).toMap
        // the ONE card rendition over live registers vs the batch card on the
        // same prefix — exact equality, column for column
        val streamed = card(graft.pipeline.Sampling.repeatBudgetCardFrom(
          regs, budgetTokens = 60L, decayMicro = 800000L, maxUsefulEpochs = 4))
        val batch = card(graft.pipeline.Sampling.repeatBudgetCard(
          prefix.toDF("doc_id", "text", "source"), "doc_id", "text", "source",
          budgetTokens = 60L, decayMicro = 800000L, maxUsefulEpochs = 4))
        assert(streamed == batch, s"prefix of ${prefix.size}: $streamed vs $batch")
        // the SAME registers price the dc34 value-weighted card through its
        // From split — one greedy-fill rendition, batch and stream
        val weights = Seq(("s1", 700000L), ("s2", 300000L)).toDF("source", "w_micro")
        def vcard(df: org.apache.spark.sql.DataFrame) = df.collect()
          .map(r => r.getAs[String]("source") ->
            ((r.getAs[Long]("epochs_micro"), r.getAs[Long]("effective_tokens"),
              r.getAs[String]("verdict")))).toMap
        val vStreamed = vcard(graft.pipeline.Sampling.valueWeightedRepeatCardFrom(
          regs, weights, budgetTokens = 60L, decayMicro = 800000L, maxUsefulEpochs = 4))
        val vBatch = vcard(graft.pipeline.Sampling.valueWeightedRepeatCard(
          prefix.toDF("doc_id", "text", "source"), "doc_id", "text", "source",
          weights, budgetTokens = 60L, decayMicro = 800000L, maxUsefulEpochs = 4))
        assert(vStreamed == vBatch, s"prefix of ${prefix.size}: $vStreamed vs $vBatch")
      }
      stream.addData(first: _*)
      query.processAllAvailable()
      check(first)
      stream.addData(second: _*)
      query.processAllAvailable()
      check(first ++ second)
    } finally query.stop()
  }

  test("streaming snapshot census reproduces d42 on every id-ordered prefix") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String, String)]
    @volatile var latest: Map[String, Seq[Long]] = Map.empty
    val query = StreamOps.streamingSnapshotCensus(
        stream.toDS().toDF("doc_id", "text", "source"),
        "doc_id", "text", "source",
        onBatch = (census, _) => latest = census.collect()
          .map(r => r.getAs[String]("source") -> Seq(
            r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
            r.getAs[Long]("kept_global"), r.getAs[Long]("tokens_global"),
            r.getAs[Long]("kept_snapshot"), r.getAs[Long]("tokens_snapshot"),
            r.getAs[Long]("cross_dup_docs"), r.getAs[Long]("cross_dup_tokens"))).toMap)
      .start()
    // dup inside one source (1,3), across sources (1,4 / 2,5), and a
    // cross-batch dup (6 repeats doc 2's text from the other source)
    val first = Seq(
      (1L, "shared duplicate text", "s1"),
      (2L, "unique first text", "s1"),
      (3L, "shared duplicate text", "s1"),
      (4L, "shared duplicate text", "s2"))
    val second = Seq(
      (5L, "shared duplicate text", "s2"),
      (6L, "unique first text", "s2"),
      (7L, "brand new arrival", "s2"))
    try {
      def check(prefix: Seq[(Long, String, String)]): Unit = {
        val batch = graft.pipeline.Dedup.snapshotDedupCensus(
            prefix.toDF("doc_id", "text", "source"), "doc_id", "text", "source")
          .collect()
          .map(r => r.getAs[String]("source") -> Seq(
            r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
            r.getAs[Long]("kept_global"), r.getAs[Long]("tokens_global"),
            r.getAs[Long]("kept_snapshot"), r.getAs[Long]("tokens_snapshot"),
            r.getAs[Long]("cross_dup_docs"), r.getAs[Long]("cross_dup_tokens"))).toMap
        assert(latest == batch, s"prefix of ${prefix.size}: $latest vs $batch")
      }
      stream.addData(first: _*)
      query.processAllAvailable()
      check(first)
      stream.addData(second: _*)
      query.processAllAvailable()
      check(first ++ second)
    } finally query.stop()
  }
}
