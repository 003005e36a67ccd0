package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.propBoolean

import graft.pipeline.{Dedup, Sampling}

/** Round-18 randomized laws, each against an independent pure-Scala mirror:
  *
  *   - dc34's greedy descending-marginal fill equals a sequential reference
  *     allocation exactly (epochs per source, micro for micro) on random
  *     (mass, weight, budget) instances — the strongest form of the
  *     monotonicity / budget-conservation / cap laws, since the reference
  *     provably has them;
  *   - d43's keeper containment: the global keeper set is a subset of the
  *     per-snapshot keeper set on ANY corpus (a corpus-wide min-id winner is
  *     a fortiori its source's winner), so cross_share_micro ∈ [0, 1e6] and
  *     the applied relation matches the pure-Scala keeper count under the
  *     policy the share picks;
  *   - ev33's chain is the true argmax: on random event sets the chosen
  *     3-chain's pairwise-precedence score is maximal with the lexicographic
  *     tie-break, recomputed from scratch in plain Scala.
  */
class RoundEighteenPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, cases: Int): Unit = {
    val params = ScTest.Parameters.default.withMinSuccessfulTests(cases)
    val result = ScTest.check(params, prop)
    assert(result.passed, s"$name: $result")
  }

  /** The dc34 allocation, sequentially: sort slices by (marginal desc,
    * source asc, epoch asc), fund whole slices while they fit, pro-rate the
    * boundary half-up — the spec the distributed window implements.
    */
  private def refAlloc(
      src: Seq[(String, Long, Long)], b: Long,
      decayMicro: Long, maxE: Int): Map[String, Long] = {
    val decay = decayMicro.toDouble / 1000000.0
    val pow = (0 until maxE)
      .map(j => math.floor(1000000.0 * math.pow(decay, j) + 0.5).toLong)
    val slices = for {
      (s, u, w) <- src if u > 0L
      j <- 0 until maxE
      if w * pow(j) > 0L // zero-value slices never enter the fill
    } yield (s, u, j, w * pow(j))
    var cum = 0L
    var out = Map.empty[String, Long].withDefaultValue(0L)
    slices.sortBy { case (s, _, j, m) => (-m, s, j) }.foreach { case (s, u, _, _) =>
      val prev = cum
      cum += u
      if (cum <= b) out += s -> (out(s) + 1000000L)
      else if (prev < b) out += s -> (out(s) + (2L * 1000000L * (b - prev) + u) / (2L * u))
    }
    src.map { case (s, _, _) => s -> out(s) }.toMap
  }

  test("dc34 law: the distributed greedy fill equals the sequential reference allocation") {
    val genSrc = for {
      n <- Gen.choose(2, 4)
      us <- Gen.listOfN(n, Gen.choose(1, 40))
      ws <- Gen.listOfN(n, Gen.choose(10000L, 1000000L))
    } yield us.zip(ws).zipWithIndex.map { case ((u, w), i) => (s"s$i", u.toLong, w) }
    val gen = for {
      src <- genSrc
      b <- Gen.choose(1L, 400L)
      // 10000 (decay 0.01) quantizes deep epochs' marginals to exactly 0 —
      // the zero-value-slice exclusion law rides the same mirror
      decay <- Gen.oneOf(10000L, 500000L, 800000L, 1000000L)
      maxE <- Gen.choose(1, 6)
    } yield (src, b, decay, maxE)
    check("dc34 greedy mirror", Prop.forAllNoShrink(gen) { case (src, b, decay, maxE) =>
      // one doc per source with exactly u whitespace tokens
      val docs = src.zipWithIndex
        .map { case ((s, u, _), i) => (i.toLong, Seq.fill(u.toInt)("w").mkString(" "), s) }
        .toDF("doc_id", "text", "source")
      val weights = src.map { case (s, _, w) => (s, w) }.toDF("source", "w_micro")
      val got = Sampling.valueWeightedRepeatCard(docs, "doc_id", "text", "source",
          weights, budgetTokens = b, decayMicro = decay, maxUsefulEpochs = maxE)
        .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("epochs_micro")).toMap
      val want = refAlloc(src, b, decay, maxE)
      (got == want) :| s"got $got want $want for src=$src b=$b decay=$decay maxE=$maxE"
    }, cases = 12)
  }

  test("d43 law: global keepers ⊆ snapshot keepers; the applied set matches the share's policy") {
    val genCorpus = for {
      n <- Gen.choose(3, 10)
      // few distinct texts so duplicates (within and across sources) are common
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 3), Gen.choose(0, 1)))
    } yield rows.zipWithIndex.map { case ((t, s), i) =>
      (i.toLong, Seq.fill(t + 1)(s"tok$t").mkString(" "), s"s$s")
    }
    val thr = 100000L
    check("d43 policy mirror", Prop.forAllNoShrink(genCorpus) { rows =>
      val docs = rows.toDF("doc_id", "text", "source")
      // pure-Scala keepers
      val globalKeep = rows.groupBy(_._2).map { case (_, g) => g.map(_._1).min }.toSet
      val snapKeep = rows.groupBy(r => (r._3, r._2)).map { case (_, g) => g.map(_._1).min }.toSet
      val toks = rows.map(r => r._1 -> (r._2.count(_ == ' ').toLong + 1L)).toMap
      val tSnap = snapKeep.toSeq.map(toks).sum
      val tGlob = globalKeep.toSeq.map(toks).sum
      val share = if (tSnap == 0L) 0L else (2L * 1000000L * (tSnap - tGlob) + tSnap) / (2L * tSnap)
      val wantPolicy = if (share >= thr) "per_snapshot" else "global"
      val wantIds = if (wantPolicy == "global") globalKeep else snapKeep
      val kept = Dedup.snapshotPolicyApply(docs, "doc_id", "text", "source", thr)
        .collect()
      val gotIds = kept.map(_.getAs[Long]("doc_id")).toSet
      val gotPolicies = kept.map(_.getAs[String]("policy")).toSet
      (globalKeep.subsetOf(snapKeep) :| "containment") &&
        ((share >= 0L && share <= 1000000L) :| s"share $share out of range") &&
        ((gotPolicies.isEmpty || gotPolicies == Set(wantPolicy)) :|
          s"policy $gotPolicies want $wantPolicy (share $share)") &&
        ((gotIds == wantIds) :| s"kept $gotIds want $wantIds under $wantPolicy")
    }, cases = 20)
  }

  test("ev33 law: the served chain is the lexicographically-first maximum-score triple") {
    val genEvents = for {
      nu <- Gen.choose(2, 4)
      ne <- Gen.choose(6, 14)
      rows <- Gen.listOfN(ne, Gen.zip(Gen.choose(1, nu), Gen.choose(0, 3), Gen.choose(0L, 50L)))
    } yield rows.zipWithIndex.map { case ((u, t, ts), i) =>
      (i.toLong, u.toLong, s"t$t", ts)
    }
    check("ev33 argmax mirror", Prop.forAllNoShrink(genEvents) { rows =>
      val types = rows.map(_._3).distinct
      // pure-Scala ev32 matrix over first occurrences ordered by (ts, event_id)
      val firsts = rows.groupBy(r => (r._2, r._3))
        .map { case ((u, t), g) => (u, t, g.map(r => (r._4, r._1)).min) }
      val ord = implicitly[Ordering[(Long, Long)]]
      val prec = (for {
        a <- firsts.toSeq; b <- firsts.toSeq
        if a._1 == b._1 && a._2 != b._2
      } yield ((a._2, b._2), if (ord.lt(a._3, b._3)) 1L else 0L))
        .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
        .withDefaultValue(0L)
      val havePair = (for {
        a <- firsts.toSeq; b <- firsts.toSeq
        if a._1 == b._1 && a._2 != b._2
      } yield (a._2, b._2)).toSet
      val triples: Seq[(String, String, String, Long)] = for {
        s1 <- types; s2 <- types; s3 <- types
        if s1 != s2 && s2 != s3 && s1 != s3
        if havePair((s1, s2)) && havePair((s2, s3)) && havePair((s1, s3))
      } yield (s1, s2, s3, prec((s1, s2)) + prec((s2, s3)) + prec((s1, s3)))
      val tmp = java.nio.file.Files.createTempDirectory("graft-ev33-law")
      try {
        rows.map { case (id, u, t, ts) =>
          (id, new java.sql.Timestamp(ts * 1000L), u, t)
        }.toDF("event_id", "ts", "user_id", "event_type")
          .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
          .write.parquet(tmp.toString + "/events.parquet")
        val got = AnalyticsQueries.precedenceFunnel(spark, tmp.toString)
          .orderBy(col("step")).collect()
        if (triples.isEmpty) (got.isEmpty :| s"no triple but funnel emitted ${got.length} rows")
        else {
          val want = triples.minBy { case (a, b, c, sc) => (-sc, a, b, c) }
          val gotChain = (got(0).getString(1), got(1).getString(1), got(2).getString(1))
          val gotScore = got(0).getAs[Long]("score")
          ((gotChain, gotScore) == ((want._1, want._2, want._3), want._4)) :|
            s"got $gotChain/$gotScore want $want"
        }
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(tmp.toFile)
      }
    }, cases = 8)
  }
}
