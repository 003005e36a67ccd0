package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.propBoolean

/** Property mirror of the round-14 weighted-SSSP kernel: hop-bounded
  * Bellman-Ford re-derived sequentially (min-plus relaxation over a Map) on
  * random weighted digraphs, including the md5-smallest seed rule — the same
  * independence discipline as the Tarjan/Kruskal mirrors. The kernel's early
  * exit must be invisible: a graph that converges before the hop budget still
  * has to match the full sequential unroll.
  */
class RoundFourteenPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, cases: Int = 5): Unit = {
    val params = ScTest.Parameters.default.withMinSuccessfulTests(cases)
    val result = ScTest.check(params, prop)
    assert(result.passed, s"$name: $result")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def edgeGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(3, 10)
    m <- Gen.choose(2, 24)
    edges <- Gen.listOfN(m, for {
      s <- Gen.choose(1L, n.toLong)
      d <- Gen.choose(1L, n.toLong) if d != s
      p <- Gen.choose(0L, 1000L)
    } yield (s, d, p))
  } yield edges

  /** Sequential hop-bounded Bellman-Ford with the kernel's exact conventions:
    * weight = 1 + min(position) % mod per (src, dst), seeds = the nSeeds
    * smallest (md5(v), v) vertices, `hops` full relaxation rounds.
    */
  private def mirrorSssp(
      edges: List[(Long, Long, Long)],
      nSeeds: Int,
      hops: Int,
      mod: Long): Map[Long, Long] = {
    val w = edges.groupBy(e => (e._1, e._2)).toSeq
      .map { case ((s, d), es) => (s, d, 1L + es.map(_._3).min % mod) }
    val verts = (w.map(_._1) ++ w.map(_._2)).distinct
    val seeds = verts.sortBy(v => (md5hex(v.toString), v)).take(nSeeds)
    var dist: Map[Long, Long] = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to hops) {
      val relax = w.flatMap { case (s, d, wt) => dist.get(s).map(ds => d -> (ds + wt)) }
      dist = (dist.toSeq ++ relax).groupBy(_._1)
        .map { case (v, ds) => v -> ds.map(_._2).min }
    }
    dist
  }

  test("weightedSsspKernel equals the sequential hop-bounded mirror on random digraphs") {
    check("sssp-mirror", Prop.forAll(edgeGen) { edges =>
      edges.nonEmpty ==> {
        val got = GraphQueries.weightedSsspKernel(
          edges.toDF("src", "dst", "position"), nSeeds = 3, maxHops = 4, weightMod = 7L)
          .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("dist_w")).toMap
        val want = mirrorSssp(edges, nSeeds = 3, hops = 4, mod = 7L)
        (got == want) :| s"got $got want $want edges $edges"
      }
    })
  }

  /** Sequential mirror of the g60 composition: symmetrized min-cost edges,
    * md5-smallest landmarks, `hops` weighted relaxation rounds per landmark,
    * then the (d_sum, seed)-min estimate per (u, v) pair.
    */
  private def mirrorWeightedLandmarks(
      edges: List[(Long, Long, Long)],
      nLandmarks: Int,
      hops: Int,
      uMod: Int,
      vMod: Int,
      mod: Long): Map[(Long, Long), (Long, Long)] = {
    val pairs = edges.filter(e => e._1 != e._2)
      .groupBy(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .toSeq.map { case ((a, b), es) => (a, b, 1L + es.map(_._3).min % mod) }
    val und = pairs.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val verts = und.map(_._1).distinct
    val seeds = verts.sortBy(v => (md5hex(v.toString), v)).take(nLandmarks)
    var dist: Map[(Long, Long), Long] = seeds.map(s => (s, s) -> 0L).toMap
    for (_ <- 1 to hops) {
      val relax = und.flatMap { case (s, d, wt) =>
        seeds.flatMap(sd => dist.get((sd, s)).map(ds => (sd, d) -> (ds + wt)))
      }
      dist = (dist.toSeq ++ relax).groupBy(_._1).map { case (kk, ds) => kk -> ds.map(_._2).min }
    }
    val us = dist.collect { case ((sd, v), d) if v % uMod == 0 => (sd, v, d) }.toSeq
    val vs = dist.collect { case ((sd, v), d) if v % vMod == 0 => (sd, v, d) }.toSeq
    (for {
      (sd, u, du) <- us; (sd2, v, dv) <- vs if sd2 == sd && u != v
    } yield (u, v, du + dv, sd))
      .groupBy(t => (t._1, t._2))
      .map { case (kk, cs) =>
        val best = cs.minBy(c => (c._3, c._4))
        kk -> (best._3, best._4)
      }
  }

  test("weightedLandmarkKernel equals the sequential mirror on random graphs") {
    check("wlandmark-mirror", Prop.forAll(edgeGen) { edges =>
      edges.nonEmpty ==> {
        val got = GraphQueries.weightedLandmarkKernel(
          edges.toDF("src", "dst", "position"),
          nLandmarks = 3, maxHops = 3, uMod = 2, vMod = 3, weightMod = 7L)
          .collect()
          .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v")) ->
            (r.getAs[Long]("d_est"), r.getAs[Long]("via_landmark"))).toMap
        val want = mirrorWeightedLandmarks(edges, nLandmarks = 3, hops = 3,
          uMod = 2, vMod = 3, mod = 7L)
        (got == want) :| s"got $got want $want edges $edges"
      }
    })
  }

  test("misKernel equals the sequential lexicographic greedy MIS on random graphs") {
    check("mis-greedy", Prop.forAll(edgeGen) { edges =>
      edges.nonEmpty ==> {
        val got = GraphQueries.misKernel(
          edges.toDF("src", "dst", "position").select(col("src"), col("dst")),
          rounds = 12)
          .collect().map(_.getAs[Long]("v")).toSet
        // sequential mirror: greedy scan in (md5-priority, id) order
        val und = edges.filter(e => e._1 != e._2)
          .flatMap(e => Seq((e._1, e._2), (e._2, e._1))).distinct
        val adj = und.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
        val verts = und.map(_._1).distinct
        def pri(v: Long): (BigInt, Long) =
          (BigInt(md5hex(v.toString).substring(0, 15), 16), v)
        val mis = scala.collection.mutable.Set.empty[Long]
        for (v <- verts.sortBy(pri))
          if (!adj(v).exists(mis)) mis += v
        val independent = got.forall(v => !adj(v).exists(u => u != v && got(u)))
        val maximal = verts.forall(v => got(v) || adj(v).exists(got))
        (got == mis.toSet && independent && maximal) :|
          s"got $got want $mis edges $und"
      }
    })
  }

  test("early exit is invisible: a converged chain matches the full unroll at a larger budget") {
    // a 3-chain converges in 2 hops; budgets 2 and 6 must agree exactly
    val edges = List((10L, 11L, 5L), (11L, 12L, 9L))
    def run(hops: Int) = GraphQueries.weightedSsspKernel(
      edges.toDF("src", "dst", "position"), nSeeds = 1, maxHops = hops, weightMod = 97L)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("dist_w")).toMap
    assert(run(2) == run(6))
    assert(run(6) == mirrorSssp(edges, nSeeds = 1, hops = 6, mod = 97L))
  }
}
