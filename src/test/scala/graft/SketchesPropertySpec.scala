package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.streaming.StreamOps

/** Property tests of the sketch contracts — invariants that hold for ANY input:
  * count-min one-sided error, HLL register-merge algebra (commutative, idempotent,
  * associative in effect), and the pure-merge/estimate agreement with the batch
  * operator's arithmetic. Register properties run on the pure merge functions (no
  * Spark job per case); the count-min property runs real jobs with few cases.
  */
class SketchesPropertySpec extends SparkSpec {

  private def check(name: String, prop: Prop, cases: Int = 30): Unit = {
    val params = ScTest.Parameters.default.withMinSuccessfulTests(cases)
    val result = ScTest.check(params, prop)
    assert(result.passed, s"$name: $result")
  }

  private val genHashes: Gen[List[Long]] =
    Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, Gen.choose(0L, (1L << 32) - 1)))

  test("HLL register merge is order-independent and replay-idempotent") {
    check("order", Prop.forAll(genHashes) { hs =>
      val a = StreamOps.mergeHllRegs(Map.empty, hs.iterator, 6)
      val b = StreamOps.mergeHllRegs(Map.empty, hs.reverse.iterator, 6)
      a == b
    })
    check("replay", Prop.forAll(genHashes) { hs =>
      val once = StreamOps.mergeHllRegs(Map.empty, hs.iterator, 6)
      StreamOps.mergeHllRegs(once, hs.iterator, 6) == once
    })
    check("split-merge", Prop.forAll(genHashes, genHashes) { (xs, ys) =>
      // merging in any batching reaches the same registers as one pass
      val onePass = StreamOps.mergeHllRegs(Map.empty, (xs ++ ys).iterator, 6)
      val twoPass = StreamOps.mergeHllRegs(
        StreamOps.mergeHllRegs(Map.empty, xs.iterator, 6), ys.iterator, 6)
      onePass == twoPass
    })
  }

  test("HLL estimate grows monotonically as registers absorb more hashes") {
    check("monotone", Prop.forAll(genHashes, genHashes) { (xs, ys) =>
      val before = StreamOps.hllEstimate(
        StreamOps.mergeHllRegs(Map.empty, xs.iterator, 6), 6)
      val after = StreamOps.hllEstimate(
        StreamOps.mergeHllRegs(StreamOps.mergeHllRegs(Map.empty, xs.iterator, 6),
          ys.iterator, 6), 6)
      after >= before
    })
  }

  test("theta difference is EXACT below the sketch size, for any pair of sets") {
    import spark.implicits._
    val genSet: Gen[List[String]] =
      Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, Gen.choose(0, 99).map(i => s"it$i")))
    check("exact-regime", Prop.forAll(genSet, genSet) { (as, bs) =>
      // both sets are under k = 64 distinct values, so theta = 2^32 and the sketch
      // degenerates to the exact set difference in BOTH directions
      val items = (as.map(("a", _)) ++ bs.map(("b", _))).toDF("key", "item")
      val r = graft.pipeline.Sketches.thetaDifference(items, "key", "item", k = 64)
        .collect()
        .map(row => (row.getString(0), row.getString(1)) ->
          (row.getAs[Long]("n_retained"), row.getAs[Double]("diff_est")))
        .toMap
      val ea = (as.toSet -- bs.toSet).size
      val eb = (bs.toSet -- as.toSet).size
      r(("a", "b")) == ((ea.toLong, ea.toDouble)) && r(("b", "a")) == ((eb.toLong, eb.toDouble))
    }, cases = 5)
  }

  test("theta difference at scale: bounded sample, estimate near the true difference") {
    import spark.implicits._
    // |A| = |B| = 2000, |A∖B| = |B∖A| = 1000; k = 256 ⇒ expected ~128 retained
    // hashes and ~9% relative error — assert a 4-sigma-ish 35% envelope
    val items = ((0 until 2000).map(i => ("a", s"item$i")) ++
      (1000 until 3000).map(i => ("b", s"item$i"))).toDF("key", "item")
    val rows = graft.pipeline.Sketches.thetaDifference(items, "key", "item", k = 256).collect()
    assert(rows.length == 2)
    rows.foreach { row =>
      assert(row.getAs[Long]("n_retained") < 256, "sample must stay k-bounded")
      val est = row.getAs[Double]("diff_est")
      assert(math.abs(est - 1000.0) / 1000.0 < 0.35,
        s"${row.getString(0)}∖${row.getString(1)} estimate $est too far from 1000")
    }
  }

  test("count-min never under-counts, for any stream") {
    import spark.implicits._
    val genStream: Gen[List[String]] =
      Gen.choose(1, 50).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")))
    check("one-sided", Prop.forAll(genStream) { items =>
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val r = graft.pipeline.Sketches
        .countMin(items.map(Tuple1(_)).toDF("item"), "item", depth = 2, width = 4, topK = 100)
        .collect()
      r.forall { row =>
        val it = row.getAs[String]("item")
        row.getAs[Long]("cms_n") >= exact(it) && row.getAs[Long]("exact_n") == exact(it)
      } && r.length == exact.size
    }, cases = 5)
  }
}
