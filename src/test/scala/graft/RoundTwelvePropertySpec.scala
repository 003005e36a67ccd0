package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.propBoolean

/** Property tests of the round-12 kernels against independent in-test
  * implementations: sccOf on random digraphs vs a plain-Scala Tarjan, and the
  * dc10 repeat-mass law on random corpora.
  */
class RoundTwelvePropertySpec extends SparkSpec {

  private def check(name: String, prop: Prop, cases: Int = 5): Unit = {
    val params = ScTest.Parameters.default.withMinSuccessfulTests(cases)
    val result = ScTest.check(params, prop)
    assert(result.passed, s"$name: $result")
  }

  private def edgeGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(3, 10)
    m <- Gen.choose(2, 24)
    edges <- Gen.listOfN(m, for {
      s <- Gen.choose(1L, n.toLong)
      d <- Gen.choose(1L, n.toLong) if d != s
    } yield (s, d))
  } yield edges.distinct

  /** Iterative Tarjan (explicit stack — no recursion-depth dependence), the
    * classical sequential SCC algorithm, as the independent mirror.
    */
  private def tarjanScc(edges: List[(Long, Long)]): Map[Long, Long] = {
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var counter = 0
    val index = scala.collection.mutable.Map.empty[Long, Int]
    val lowlink = scala.collection.mutable.Map.empty[Long, Int]
    val onStack = scala.collection.mutable.Set.empty[Long]
    val stack = scala.collection.mutable.ArrayBuffer.empty[Long]
    val comp = scala.collection.mutable.Map.empty[Long, Long]

    def strongconnect(v0: Long): Unit = {
      // frames: (vertex, iterator over successors)
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Long, Iterator[Long])]
      def push(v: Long): Unit = {
        index(v) = counter; lowlink(v) = counter; counter += 1
        stack += v; onStack += v
        frames += ((v, adj.getOrElse(v, Nil).iterator))
      }
      push(v0)
      while (frames.nonEmpty) {
        val (v, it) = frames.last
        if (it.hasNext) {
          val w = it.next()
          if (!index.contains(w)) push(w)
          else if (onStack(w)) lowlink(v) = math.min(lowlink(v), index(w))
        } else {
          frames.remove(frames.size - 1)
          if (frames.nonEmpty) {
            val p = frames.last._1
            lowlink(p) = math.min(lowlink(p), lowlink(v))
          }
          if (lowlink(v) == index(v)) {
            val members = scala.collection.mutable.ArrayBuffer.empty[Long]
            var w = -1L
            while (w != v) {
              w = stack.remove(stack.size - 1)
              onStack -= w
              members += w
            }
            val label = members.min
            members.foreach(m => comp(m) = label)
          }
        }
      }
    }
    verts.foreach(v => if (!index.contains(v)) strongconnect(v))
    comp.toMap
  }

  test("sccOf equals an iterative Tarjan on random digraphs") {
    import spark.implicits._
    check("scc", Prop.forAll(edgeGen) { edges =>
      edges.nonEmpty ==> {
        val got = GraphQueries.sccOf(edges.toDF("src", "dst"), maxRounds = 60)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = tarjanScc(edges)
        (got == want) :| s"edges=$edges got=$got want=$want"
      }
    })
  }

  test("sccOf resolves a planted mutual-follow core plus a DAG tail") {
    import spark.implicits._
    // cycle 1→2→3→1 (one SCC labeled 1), 3→4→5 tail (singletons), 6→2 feeder
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (6L, 2L))
    val got = GraphQueries.sccOf(edges.toDF("src", "dst"), maxRounds = 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 6L), got.toString)
  }

  test("dc10 repeat-mass law: per-source sums equal target_docs on random corpora") {
    import spark.implicits._
    val corpusGen: Gen[List[(Long, String)]] = for {
      nA <- Gen.choose(1, 8)
      nB <- Gen.choose(1, 30)
    } yield ((1L to nA.toLong).map(i => (i, "srcA")) ++
      (100L to (99L + nB).toLong).map(i => (i, "srcB"))).toList
    check("dc10", Prop.forAll(corpusGen) { docs =>
      val df = docs.toDF("doc_id", "source").withColumn(
        "text", org.apache.spark.sql.functions.lit("filler words"))
      val out = graft.pipeline.Sampling
        .mixExecuteUpsampled(df, "doc_id", "source", alphaMicro = 300000L, budgetDocs = 37L)
        .collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("target_docs"), r.getAs[Long]("repeat_factor")))
      val bySrc = out.groupBy(_._1)
      bySrc.forall { case (_, rows) => rows.map(_._3).sum == rows.head._2 } :|
        s"repeat masses ${bySrc.map { case (s, r) => s -> (r.map(_._3).sum, r.head._2) }}"
    })
  }
}
