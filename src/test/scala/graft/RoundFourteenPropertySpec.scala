package graft

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
