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

  test("sccOf + condensation: contracting random digraphs yields an acyclic DAG matching Tarjan") {
    import spark.implicits._
    check("condensation", Prop.forAll(edgeGen) { edges =>
      edges.nonEmpty ==> {
        val df = edges.toDF("src", "dst").localCheckpoint(true)
        val scc = GraphQueries.sccOf(df, maxRounds = 60).localCheckpoint(true)
        val cond = df
          .join(scc.select(org.apache.spark.sql.functions.col("vertex_id").as("src"),
            org.apache.spark.sql.functions.col("scc").as("a")), Seq("src"))
          .join(scc.select(org.apache.spark.sql.functions.col("vertex_id").as("dst"),
            org.apache.spark.sql.functions.col("scc").as("b")), Seq("dst"))
          .filter(org.apache.spark.sql.functions.col("a") =!=
            org.apache.spark.sql.functions.col("b"))
          .select("a", "b").distinct()
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        // mirror from Tarjan labels
        val want = tarjanScc(edges)
        val wantCond = edges.map { case (s, d) => (want(s), want(d)) }
          .filter(p => p._1 != p._2).distinct.toSet
        // acyclicity: repeated elimination of sink nodes must consume the DAG
        var nodes = (cond.map(_._1) ++ cond.map(_._2)).distinct.toSet
        var es = cond.toSet
        var progressed = true
        while (nodes.nonEmpty && progressed) {
          val sinks = nodes.filter(n => !es.exists(_._1 == n))
          progressed = sinks.nonEmpty
          nodes = nodes -- sinks
          es = es.filterNot(e => sinks.contains(e._2))
        }
        (cond.toSet == wantCond) :| s"edges=$wantCond got=${cond.toSet}" &&
          nodes.isEmpty :| s"condensation not acyclic: residual $nodes"
      }
    })
  }

  test("dc11: per-source slot mass equals the plan, and replayed token mass >= plain mass") {
    import spark.implicits._
    val docs = ((1L to 26L).map(i =>
      (i, s"document number $i with some shared words and token$i tail", "srcBig")) ++
      (101L to 103L).map(i => (i, s"tiny source doc $i distinct words", "srcTiny")))
      .toDF("doc_id", "text", "source")
    val scratch = java.nio.file.Files.createTempDirectory("graft-r12-up")
    try {
      val path = scratch.toString + "/merges"
      graft.pipeline.TextStats.bpeSaveMerges(
        graft.pipeline.TextStats.bpeMergeLoop(docs, "doc_id", "text", rounds = 4), path)
      val merges = graft.pipeline.TextStats.bpeLoadMerges(spark, path)
      val up = graft.pipeline.Sampling.epochPackUpsampled(docs, "doc_id", "source", "text",
          merges, alphaMicro = 300000L, budgetDocs = 40L, budgetTokens = 20L, nGroups = 2)
        .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_slots")))
      val plan = graft.pipeline.Sampling.mixPlan(docs, "source",
          alphaMicro = 300000L, budgetDocs = 40L)
        .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("target_docs")).toMap
      // slots conservation: every planned replay lands in exactly one pack
      up.groupBy(_._1).foreach { case (src, packs) =>
        assert(packs.map(_._3).sum == plan(src),
          s"$src slots ${packs.map(_._3).sum} != target ${plan(src)}")
      }
      // replayed mass dominates the un-replayed epoch's mass for the upsampled source
      val plain = graft.pipeline.Sampling.epochPack(docs, "doc_id", "source", "text", merges,
          alphaMicro = 300000L, budgetDocs = 40L, budgetTokens = 20L, nGroups = 2)
        .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens")))
      val upTiny = up.filter(_._1 == "srcTiny").map(_._2).sum
      val plainTiny = plain.filter(_._1 == "srcTiny").map(_._2).sum
      assert(upTiny > plainTiny, s"replayed mass $upTiny must exceed plain $plainTiny")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(scratch).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("g51 shape on the planted core-plus-tail: levels follow the contraction's longest paths") {
    import spark.implicits._
    // condensation of {1,2,3} (scc 1) with tail 3→4→5 and feeder 6→2:
    // DAG edges 1→4→5 and 6→1; longest paths: 6@0, 1@1, 4@2, 5@3
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (6L, 2L))
      .toDF("src", "dst").localCheckpoint(true)
    val scc = GraphQueries.sccOf(edges, maxRounds = 60).localCheckpoint(true)
    val cond = edges
      .join(scc.select(org.apache.spark.sql.functions.col("vertex_id").as("src"),
        org.apache.spark.sql.functions.col("scc").as("a")), Seq("src"))
      .join(scc.select(org.apache.spark.sql.functions.col("vertex_id").as("dst"),
        org.apache.spark.sql.functions.col("scc").as("b")), Seq("dst"))
      .filter(org.apache.spark.sql.functions.col("a") =!=
        org.apache.spark.sql.functions.col("b"))
      .select("a", "b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cond == Set((1L, 4L), (4L, 5L), (6L, 1L)), cond.toString)
    // in-test longest-path mirror over the tiny DAG
    val nodes = Set(1L, 4L, 5L, 6L)
    def level(v: Long): Long = cond.filter(_._2 == v).map(e => level(e._1) + 1) match {
      case s if s.isEmpty => 0L
      case s => s.max
    }
    assert(nodes.map(v => v -> level(v)).toMap ==
      Map(6L -> 0L, 1L -> 1L, 4L -> 2L, 5L -> 3L))
  }

  test("t41 on disjoint-vocab supervision: the trained gate agrees perfectly with its labels") {
    import spark.implicits._
    val docs = ((1L to 6L).map(i =>
      (i, s"the cat sat on a mat of warm wool and felt fine day$i")) ++
      (11L to 16L).map(i =>
        (i, s"zzzzqqqqxxxxwwww$i kkkkjjjjhhhhgggg qqqywvvvvbbbbnnnnmmmm")))
      .toDF("doc_id", "text")
    val w = graft.pipeline.TextStats.lrQualityTrain(docs, "doc_id", "text",
      buckets = 64, rounds = 3, lrMicro = 500000L)
    val r = graft.pipeline.TextStats.lrQualityEval(docs, "doc_id", "text", w, buckets = 64)
      .collect().head
    assert(r.getAs[Long]("n_scored") == 12L)
    assert(r.getAs[Long]("tp") == 6L && r.getAs[Long]("tn") == 6L
      && r.getAs[Long]("fp") == 0L && r.getAs[Long]("fn") == 0L, r.toString)
    assert(r.getAs[Long]("precision_micro") == 1000000L
      && r.getAs[Long]("recall_micro") == 1000000L
      && r.getAs[Long]("agreement_micro") == 1000000L, r.toString)
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
