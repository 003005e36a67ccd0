package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.propBoolean

import graft.pipeline.{Curation, Dedup}

/** Property tests of the round-11 kernels against independent in-test
  * implementations (the RoundTenPropertySpec discipline): Katz and bounded
  * Brandes on random digraphs vs exact-arithmetic driver mirrors, d19
  * decontamination vs a plain set-intersection mirror, and dc06's matrix vs the
  * text-equality brute force on planted copies. Spark cases are real jobs;
  * counts kept small.
  */
class RoundElevenPropertySpec extends SparkSpec {

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

  // ------------------------------------------------------------- g47 law

  test("katzOf equals the exact integer mirror on random digraphs") {
    import spark.implicits._
    check("katz", Prop.forAll(edgeGen) { edges =>
      edges.nonEmpty ==> {
        val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
        var x = verts.map(_ -> 1000000L).toMap
        val acc = scala.collection.mutable.Map(verts.map(_ -> 0L): _*)
        for (_ <- 1 to 3) {
          val in = edges.groupBy(_._2).map { case (d, es) => d -> es.map(e => x(e._1)).sum }
          x = verts.map(v => v -> Math.floorDiv(in.getOrElse(v, 0L) * 50L, 100L)).toMap
          verts.foreach(v => acc(v) += x(v))
        }
        val got = GraphQueries.katzOf(edges.toDF("src", "dst"), betaPct = 50L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == acc.toMap
      }
    })
  }

  // ------------------------------------------------------------- g48 law

  private def brandesMirror(edges: Seq[(Long, Long)], seedMod: Long): Map[Long, Long] = {
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val acc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (s <- verts.filter(_ % seedMod == 0)) {
      var visited = Set(s)
      var levels = Vector(Map(s -> 1L))
      for (_ <- 1 to 3) {
        val nxt = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for ((v, sig) <- levels.last; w <- out.getOrElse(v, Set.empty[Long]) if !visited.contains(w))
          nxt(w) += sig
        visited ++= nxt.keySet
        levels :+= nxt.toMap
      }
      var delta = Map.empty[Long, Long]
      for (l <- 2 to 1 by -1) {
        val next = levels(l + 1)
        val cur = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for ((v, sv) <- levels(l); w <- out.getOrElse(v, Set.empty[Long]) if next.contains(w)) {
          val dw = delta.getOrElse(w, 0L)
          cur(v) += math.floor((sv * (1000000L + dw)).toDouble / next(w).toDouble + 0.5).toLong
        }
        cur.foreach { case (v, d) => acc(v) += d }
        delta = cur.toMap
      }
    }
    acc.filter(_._2 != 0L).toMap
  }

  test("betweennessOf equals the bounded-Brandes mirror on random digraphs") {
    import spark.implicits._
    check("betweenness", Prop.forAll(edgeGen) { edges =>
      edges.nonEmpty ==> {
        val got = GraphQueries.betweennessOf(edges.toDF("src", "dst"), seedMod = 2L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == brandesMirror(edges, seedMod = 2L)
      }
    })
  }

  // ------------------------------------------------------------- d19 law

  test("benchmarkDecontaminate matches the set-intersection mirror on random corpora") {
    import spark.implicits._
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val doc = Gen.choose(5, 12).flatMap(k => Gen.listOfN(k, word).map(_.mkString(" ")))
    val gen = for {
      n <- Gen.choose(4, 14)
      docs <- Gen.listOfN(n, doc)
    } yield docs.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
    check("decontam", Prop.forAll(gen) { docs =>
      def shingleSet(t: String): Set[String] =
        t.split(" ").sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
      val bench = docs.filter(_._1 % 3 == 0)
      val train = docs.filter(_._1 % 3 != 0)
      // per distinct benchmark shingle, the min holding bench id
      val benchIdx = bench.flatMap { case (id, t) => shingleSet(t).map(_ -> id) }
        .groupBy(_._1).map { case (sh, xs) => sh -> xs.map(_._2).min }
      val expect = train.flatMap { case (id, t) =>
        val sh = shingleSet(t)
        val hits = sh.filter(benchIdx.contains)
        if (hits.isEmpty) None
        else Some(id -> ((sh.size.toLong, hits.size.toLong,
          math.floor(1e6 * hits.size.toDouble / sh.size.toDouble + 0.5).toLong,
          hits.map(benchIdx).min)))
      }.toMap
      val got = Dedup.benchmarkDecontaminate(docs.toDF("doc_id", "text"), "doc_id", "text",
          benchmarkMod = 3L, shingleSize = 5)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_hits"),
            r.getAs[Long]("hit_frac_micro"), r.getAs[Long]("first_bench_id")))).toMap
      got == expect
    })
  }

  // ------------------------------------------------------------- dc06 law

  test("crossSourceDup matches the text-equality brute force on planted copies") {
    import spark.implicits._
    // distinct base texts share no tokens, so LSH clusters == text-equality groups
    val bases = Vector(
      "alpha bravo charlie delta echo foxtrot golf hotel",
      "india juliet kilo lima mike november oscar papa",
      "quebec romeo sierra tango uniform victor whiskey xray",
      "yankee zulu one two three four five six")
    val gen = for {
      n <- Gen.choose(4, 16)
      picks <- Gen.listOfN(n, for {
        b <- Gen.choose(0, bases.size - 1)
        s <- Gen.oneOf("sA", "sB", "sC")
      } yield (b, s))
    } yield picks.zipWithIndex.map { case ((b, s), i) => ((i + 1).toLong, bases(b), s) }
    check("crossSourceDup", Prop.forAll(gen) { docs =>
      val got = Curation.crossSourceDup(docs.toDF("doc_id", "text", "source"),
          "doc_id", "text", "source")
        .collect().map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
          ((r.getAs[Long]("n_shared_clusters"), r.getAs[Long]("n_docs_a"),
            r.getAs[Long]("n_docs_b")))).toMap
      // brute force: clusters are text-equality groups; census per (cluster, source)
      val census = docs.groupBy(_._2).values.toSeq.flatMap { grp =>
        grp.groupBy(_._3).map { case (src, ds) => (grp.map(_._1).min, src, ds.size.toLong) }
      }
      val expect = (for {
        (c1, sa, na) <- census; (c2, sb, nb) <- census
        if c1 == c2 && sa < sb
      } yield ((sa, sb), (na, nb)))
        .groupBy(_._1)
        .map { case (k, xs) =>
          k -> ((xs.size.toLong, xs.map(_._2._1).sum, xs.map(_._2._2).sum))
        }
      got == expect
    })
  }
}
