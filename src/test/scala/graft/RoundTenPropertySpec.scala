package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.pipeline.{Dedup, Sketches, TextStats}
import graft.streaming.StreamOps

/** Property tests of the round-10 kernels, cross-validated against independent
  * in-test implementations (the RoundSevenPropertySpec discipline): the distributed
  * exact rank against a plain in-memory sort, the minhash bucket cap's containment
  * law, the source-drift KL's identity-window zero, and the moments guard on
  * constant groups whose squares exceed double precision. Spark cases are real
  * jobs; counts kept small.
  */
class RoundTenPropertySpec extends SparkSpec {

  private def check(name: String, prop: Prop, cases: Int = 5): Unit = {
    val params = ScTest.Parameters.default.withMinSuccessfulTests(cases)
    val result = ScTest.check(params, prop)
    assert(result.passed, s"$name: $result")
  }

  // ------------------------------------------------------ distributedRank law

  test("distributedRank equals the in-memory sort rank on random multisets") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 120)
      vals <- Gen.listOfN(n, Gen.choose(0L, 8L)) // heavy ties → tiebreak matters
      parts <- Gen.choose(1, 9)
    } yield (vals, parts)
    check("distributedRank", Prop.forAll(gen) { case (vals, parts) =>
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val got = AnalyticsQueries.distributedRank(
        df, "rk", Seq(col("v").desc, col("id").asc), numParts = parts)
        .select("id", "rk").as[(Long, Long)].collect().toMap
      val expected = vals.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }
        .sortBy { case (id, v) => (-v, id) }
        .zipWithIndex.map { case ((id, _), r) => id -> (r + 1L) }.toMap
      got == expected
    })
  }

  // ------------------------------------------- minhash cap containment law

  test("capped minhash pairs are always a subset of the uncapped pairs") {
    import spark.implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val doc = Gen.listOfN(6, word).map(_.mkString(" "))
    val gen = for {
      n <- Gen.choose(4, 24)
      docs <- Gen.listOfN(n, doc)
      cap <- Gen.choose(1L, 6L)
    } yield (docs, cap)
    check("minhash cap containment", Prop.forAll(gen) { case (docs, cap) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val capped = Dedup.minhashLshPairs(df, "doc_id", "text",
        shingleSize = 2, bands = 4, rowsPerBand = 1, maxBucketMembers = cap)
        .as[(Long, Long)].collect().toSet
      val uncapped = Dedup.minhashLshPairs(df, "doc_id", "text",
        shingleSize = 2, bands = 4, rowsPerBand = 1, maxBucketMembers = Long.MaxValue)
        .as[(Long, Long)].collect().toSet
      capped.subsetOf(uncapped)
    }, cases = 4)
  }

  // ------------------------------------------------- source drift identity law

  test("sourceDrift is exactly zero when the early and late windows are identical") {
    import spark.implicits._
    // every text appears once below the cut and once above it, same source:
    // cp == cq per (source, word) → p == q → ln(1) = 0 → every term micro-rounds
    // to 0 → the KL sum is EXACTLY 0, not just small
    val texts = Seq("a b c", "b c d e", "a a f", "g h", "c d")
    val rows = texts.zipWithIndex.flatMap { case (t, i) =>
      Seq((i.toLong, t, s"src${i % 2}"), (100L + i, t, s"src${i % 2}"))
    }
    val df = rows.toDF("doc_id", "text", "source")
    val out = TextStats.sourceDrift(df, "doc_id", "text", "source", cutId = 100L).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_late_tokens") == r.getAs[Long]("n_early_tokens"))
      assert(r.getAs[Long]("kl_micro_nats") == 0L,
        s"identical windows must have zero KL: ${r.mkString(",")}")
    }
  }

  // ------------------------------- moments guard beyond double-exact squares

  test("moments guard: constant groups stay 0-skew/kurt even past 2^53 squares") {
    import spark.implicits._
    // x = 5e8: x² = 2.5e17 > 2^53, so m2 − m1·m1 can round to a tiny negative —
    // the ADVICE case the <= 0 guard exists for. Both the batch operator and the
    // streaming estimator must report 0, never a NaN artifact.
    val df = Seq.fill(7)(("k", 500000000L)).toDF("source", "n_chars")
    val row = Sketches.momentsSketch(df, "source", "n_chars").collect()(0)
    assert(row.getAs[Long]("skew_micro") == 0L && row.getAs[Long]("kurt_micro") == 0L)
    val n = 7L
    val s1 = BigInt(500000000L) * n
    val s2 = BigInt(500000000L).pow(2) * n
    val s3 = BigInt(500000000L).pow(3) * n
    val s4 = BigInt(500000000L).pow(4) * n
    val (_, _, sm, km) = StreamOps.momentsEstimates(n, s1, s2, s3, s4)
    assert(sm == 0L && km == 0L)
  }
}
