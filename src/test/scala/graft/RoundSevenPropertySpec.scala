package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.pipeline.{Retrieval, Similarity, TextStats}

/** Property tests of the round-7 operators, cross-validated against independent
  * in-test implementations (the HilbertKey/d2xy discipline): a naive symbol-vector
  * BPE trainer/encoder, a direct-arithmetic RRF scorer, and a brute-force per-cell
  * semDedup mirror. Each case is a real Spark job; counts kept small.
  */
class RoundSevenPropertySpec extends SparkSpec {

  private def check(name: String, prop: Prop, cases: Int = 5): Unit = {
    val params = ScTest.Parameters.default.withMinSuccessfulTests(cases)
    val result = ScTest.check(params, prop)
    assert(result.passed, s"$name: $result")
  }

  // ---------------------------------------------------------------- BPE mirror

  /** Greedy left-to-right non-overlapping merge of (l, r) in a symbol vector —
    * the semantics the doubled-separator `replace` trick implements.
    */
  private def greedyMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { out += (l + r); i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Naive BPE over the word-frequency dictionary: per round, frequency-weighted
    * adjacent pair counts, (count desc, pair asc) argmax, greedy merge everywhere.
    * Returns the merge table and each distinct token's post-merge symbol count.
    */
  private def naiveBpe(
      corpus: Seq[(Long, String)],
      rounds: Int
  ): (Seq[(Int, String, String, String, Long)], Map[String, Long]) = {
    val wf = corpus.flatMap(_._2.split(" ", -1))
      .filter(t => t.nonEmpty && !t.contains("|"))
      .groupBy(identity).map { case (t, ts) => t -> ts.size.toLong }
    var reprs: Map[String, Vector[String]] =
      wf.keys.map(t => t -> t.map(_.toString).toVector).toMap
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    for (round <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((t, syms) <- reprs; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += wf(t)
      val ((l, r), n) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      merges += ((round, l, r, l + r, n))
      reprs = reprs.map { case (t, syms) => t -> greedyMerge(syms, l, r) }
    }
    (merges.result(), reprs.map { case (t, syms) => t -> syms.length.toLong })
  }

  // words over {a, b, \, '} long enough that 3 merge rounds never exhaust the pair
  // table; backslash and quote are in the alphabet because merge pairs must be
  // treated as data (a SQL-splice would reparse them); the fixed tail doc guarantees
  // a pair survives to round 3 even if every random word collapses (8 chars need 3
  // full merges to reach one symbol)
  private val genWord: Gen[String] =
    Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "\\", "'")).map(_.mkString))

  private val genCorpus: Gen[List[(Long, String)]] =
    Gen.choose(2, 8).flatMap { n =>
      Gen.listOfN(n, Gen.choose(1, 6).flatMap(w => Gen.listOfN(w, genWord).map(_.mkString(" "))))
        .map(ds => (ds :+ "abababab").zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) })
    }

  test("bpeMergeLoop matches a naive symbol-vector BPE trainer on random corpora") {
    import spark.implicits._
    check("bpe merge cross-validation", Prop.forAll(genCorpus) { corpus =>
      val got = TextStats.bpeMergeLoop(corpus.toDF("doc_id", "text"), "doc_id", "text", rounds = 3)
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
        .sortBy(_._1).toSeq
      val expected = naiveBpe(corpus, rounds = 3)._1
      got == expected
    })
  }

  test("bpeEncode prices every doc exactly as the naive encoder (and within bounds)") {
    import spark.implicits._
    check("bpe encode cross-validation", Prop.forAll(genCorpus) { corpus =>
      val (_, nSym) = naiveBpe(corpus, rounds = 3)
      val expected = corpus.map { case (id, text) =>
        val toks = text.split(" ", -1).filter(t => t.nonEmpty && !t.contains("|")).toSeq
        id -> ((toks.size.toLong, toks.map(_.length.toLong).sum, toks.map(nSym).sum))
      }.filter(_._2._1 > 0).toMap
      val got = TextStats.bpeEncode(corpus.toDF("doc_id", "text"), "doc_id", "text", rounds = 3)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      got == expected && expected.forall { case (id, (nTok, nChar, nSyms)) =>
        nTok <= nSyms && nSyms <= nChar
      }
    })
  }

  // ---------------------------------------------------------------- RRF mirror

  // per query, a ranked list is a shuffled subset of neighbor ids 10..17 with
  // ranks 1..n; both lists derive from one generated seed so shrinking stays sane
  private val genRankedLists: Gen[(List[(Long, Long, Int)], List[(Long, Long, Int)])] =
    for {
      nq <- Gen.choose(1, 3)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield {
      val rnd = new scala.util.Random(seed)
      def lists: List[(Long, Long, Int)] = (1L to nq.toLong).toList.flatMap { q =>
        rnd.shuffle((10L to 17L).toList).take(rnd.nextInt(8) + 1)
          .zipWithIndex.map { case (n, i) => (q, n, i + 1) }
      }
      (lists, lists)
    }

  test("rrfFuseTopK scores and ranks match direct integer arithmetic") {
    import spark.implicits._
    check("rrf cross-validation", Prop.forAll(genRankedLists) { case (lex, sem) =>
      def contrib(rank: Int): Long = if (rank == 0) 0L else 1000000L / (60L + rank)
      val lexRank = lex.map { case (q, n, r) => (q, n) -> r }.toMap
      val semRank = sem.map { case (q, n, r) => (q, n) -> r }.toMap
      val expected = (lexRank.keySet ++ semRank.keySet).map { case (q, n) =>
        val (lr, sr) = (lexRank.getOrElse((q, n), 0), semRank.getOrElse((q, n), 0))
        (q, n) -> ((lr, sr, contrib(lr) + contrib(sr)))
      }.toMap
      val got = Retrieval.rrfFuseTopK(
        lex.toDF("query_id", "neighbor_id", "rank"),
        sem.toDF("query_id", "neighbor_id", "rank"), k = 100)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getInt(5)))
      val scoresMatch = got.map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap == expected
      // ranks re-window per query by (score desc, neighbor asc), contiguous from 1
      val ranksMatch = got.groupBy(_._1).forall { case (_, rows) =>
        val byRank = rows.sortBy(_._6)
        byRank.map(_._6).toSeq == (1 to rows.length) &&
          byRank.sliding(2).forall {
            case Array(a, b) => a._5 > b._5 || (a._5 == b._5 && a._2 < b._2)
            case _ => true
          }
      }
      scoresMatch && ranksMatch
    })
  }

  // ------------------------------------------------------------ semDedup mirror

  private val genVectors: Gen[List[(Long, Seq[Double])]] = {
    val comp = Gen.oneOf(-1.0, -0.75, -0.5, 0.25, 0.5, 0.75, 1.0)
    Gen.choose(5, 12).flatMap { n =>
      Gen.listOfN(n, Gen.listOfN(2, comp).map(_.toSeq))
        .map(_.zipWithIndex.map { case (v, i) => (i.toLong, v) })
    }
  }

  test("semDedup matches a brute-force per-cell mirror on random vectors") {
    import spark.implicits._
    check("semdedup cross-validation", Prop.forAll(genVectors) { vecs =>
      // mirror the plan's arithmetic shape exactly: dot left-to-right, squared norms,
      // cos = dot / sqrt(na * nb), rounded via the same BigDecimal HALF_UP path
      def dot(a: Seq[Double], b: Seq[Double]): Double =
        a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      def cos6(a: Seq[Double], b: Seq[Double]): Double =
        BigDecimal(dot(a, b) / math.sqrt(dot(a, a) * dot(b, b)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val cents = vecs.filter(_._1 % 3 == 0)
      val cell = vecs.map { case (id, v) =>
        id -> cents.minBy { case (cid, cv) => (-cos6(v, cv), cid) }._1
      }.toMap
      val expected = vecs.map { case (id, v) =>
        val nLower = vecs.count { case (oid, ov) =>
          oid < id && cell(oid) == cell(id) && cos6(v, ov) >= 0.4
        }.toLong
        id -> ((cell(id), nLower, nLower == 0))
      }.toMap
      val got = Similarity.semDedup(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        threshold = 0.4, centroidMod = 3)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
      got == expected
    })
  }
}
