package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.pipeline.{Dedup, Sampling, Similarity, TextStats}
import graft.streaming.StreamOps

/** Property tests of the round-9 operators, cross-validated against independent
  * in-test implementations (the RoundSevenPropertySpec discipline): a
  * direct-arithmetic Kneser–Ney scorer over random corpora, a naive two-round
  * Rocchio searcher over random vector sets, algebraic invariants of the HDR bucket
  * arithmetic over the full Long range, and normalization/ordering laws of the
  * temperature mix. Spark cases are real jobs; counts kept small.
  */
class RoundNinePropertySpec extends SparkSpec {

  private def check(name: String, prop: Prop, cases: Int = 5): Unit = {
    val params = ScTest.Parameters.default.withMinSuccessfulTests(cases)
    val result = ScTest.check(params, prop)
    assert(result.passed, s"$name: $result")
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def microQ(x: Double): Long = math.floor(x * 1000000.0 + 0.5).toLong

  // ------------------------------------------------------------- t29 Kneser–Ney

  private def naiveKn(corpus: Seq[(Long, String)], d: Double): Map[Long, (Long, Long, Long)] = {
    val docBigrams = corpus.map { case (id, t) =>
      val w = t.split(" ").toSeq
      id -> w.zip(w.tail).groupBy(identity).map { case (p, ps) => p -> ps.size.toLong }
    }.toMap
    val cb = docBigrams.values.flatten.groupBy(_._1).map { case (p, ms) => p -> ms.map(_._2).sum }
    val cw1 = cb.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val n1w1 = cb.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size.toLong }
    val ncw2 = cb.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val nBig = cb.size.toLong
    def lp(p: (String, String)): Long = {
      val prob = (cb(p).toDouble - d) / cw1(p._1).toDouble +
        d * n1w1(p._1).toDouble / cw1(p._1).toDouble * (ncw2(p._2).toDouble / nBig.toDouble)
      math.floor(1000000.0 * math.log(prob) + 0.5).toLong
    }
    docBigrams.collect { case (id, m) if m.nonEmpty =>
      val n = m.values.sum
      val s = m.map { case (p, tf) => tf * lp(p) }.sum
      id -> ((n, s, math.floor(s.toDouble / n.toDouble + 0.5).toLong))
    }
  }

  test("kneserNeyLogProb equals the direct-arithmetic mirror on random corpora") {
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "c", "d", "ab")
    val doc = Gen.chooseNum(2, 8).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpusGen = Gen.chooseNum(2, 5).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    check("kn-mirror", Prop.forAll(corpusGen) { corpus =>
      val got = TextStats.kneserNeyLogProb(corpus.toDF("doc_id", "text"), "doc_id", "text")
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_lp_micro"),
            r.getAs[Long]("avg_lp_micro"))))
        .toMap
      got == naiveKn(corpus, 0.75)
    })
  }

  // ------------------------------------------------------------- s19 Rocchio PRF

  test("prfTopK equals the naive two-round mirror on random vector sets") {
    import spark.implicits._
    val dims = 3
    val vecGen = Gen.listOfN(dims, Gen.chooseNum(-5, 5)).map(_.map(_.toDouble / 5.0))
    val setGen = for {
      n <- Gen.chooseNum(6, 12)
      vs <- Gen.listOfN(n, vecGen)
    } yield vs.zipWithIndex
      // snap to float32 precision UP FRONT: the operator receives float embeddings
      // (the embeddings-table dtype), so a mirror computing on the unquantized
      // doubles diverges by ~1e-8 — enough to flip a 6-decimal cosine digit at a
      // rounding boundary (observed as a rare-seed flake)
      .map { case (v, i) => ((i + 1).toLong, v.map(x => x.toFloat.toDouble).toArray) }
      // zero vectors make cosine 0/0 — the operator's contract is nonzero embeddings
      .filter(_._2.exists(_ != 0.0))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      round6(dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum))
    }
    check("prf-mirror", Prop.forAll(setGen) { vecs =>
      val byId = vecs.toMap
      val qIds = vecs.map(_._1).filter(_ % 3 == 0)
      val (fbK, k) = (2, 3)
      def topK(q: Long, qv: Array[Double], kk: Int): Seq[(Long, Double)] =
        vecs.collect { case (c, cv) if c != q => c -> cos(qv, cv) }
          .sortBy { case (c, s) => (-s, c) }.take(kk)
      val expansions = qIds.map { q =>
        val fb = topK(q, byId(q), fbK).map(_._1)
        q -> Array.tabulate(dims) { dIdx =>
          (fbK * microQ(byId(q)(dIdx)) + fb.map(nb => microQ(byId(nb)(dIdx))).sum).toDouble
        }
      }
      // degenerate exact cancellation (centroid = −q) zeroes the expansion and makes
      // every cosine NaN — documented out of the operator's contract; skip the case
      if (expansions.exists(_._2.forall(_ == 0.0))) true
      else {
        val expected = expansions.flatMap { case (q, expanded) =>
          topK(q, expanded, k).zipWithIndex.map { case ((nb, s), i) => (q, nb, s, i + 1) }
        }.toSet
        val df = vecs.map { case (i, v) => (i, v.map(_.toFloat)) }.toDF("vec_id", "embedding")
        val got = Similarity.prfTopK(
          df.filter(org.apache.spark.sql.functions.col("vec_id") % 3 === 0),
          df, "vec_id", "embedding", k = k, feedbackK = fbK)
          .collect()
          .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
            r.getAs[Double]("cos_sim"), r.getAs[Int]("rank")))
          .toSet
        got == expected
      }
    })
  }

  // ------------------------------------------------------------ sk07 HDR algebra

  test("HDR bucket algebra: buckets tile the positive Longs in order with 2^-2 error") {
    val vGen = Gen.oneOf(
      Gen.chooseNum(1L, 64L),
      Gen.chooseNum(1L, Long.MaxValue),
      Gen.chooseNum(Long.MaxValue - 1024, Long.MaxValue))
    check("hdr-bounds", Prop.forAll(vGen) { v =>
      if (v <= 0) true // chooseNum shrinking can escape the generator's lower bound
      else {
        val b = StreamOps.hdrBucket(v)
        val lb = StreamOps.hdrLowerBound(b)
        val nxt = if (b >= 251) Long.MaxValue else StreamOps.hdrLowerBound(b + 1)
        // the value lies in its bucket: lb ≤ v, and v is below the next DISTINCT
        // bound (below v=4 truncation collapses adjacent bounds — there the bucket
        // is exact: lb == v); bucket 251's successor would overflow by design
        val below = lb <= v
        val above = b >= 251 || nxt <= lb || v < nxt
        val exactWhenTiny = v >= 4 || lb == v
        // ≤ 2^-2 relative error of the lower-bound estimate
        val err = below && (v - lb).toDouble <= v.toDouble / 4.0 + 1
        below && above && exactWhenTiny && err
      }
    }, cases = 200)
    // monotone: bucket ids never decrease as values grow
    check("hdr-monotone", Prop.forAll(Gen.chooseNum(1L, Long.MaxValue - 1)) { v =>
      StreamOps.hdrBucket(v) <= StreamOps.hdrBucket(v + 1)
    }, cases = 200)
  }

  // ----------------------------------------------------------- t30 mix algebra

  test("temperatureMix: probabilities normalize and boosts order against share") {
    import spark.implicits._
    val countsGen = Gen.chooseNum(2, 6).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 40))).map(_.zipWithIndex)
    check("mix-laws", Prop.forAll(countsGen) { counts =>
      val docs = counts.flatMap { case (c, i) => Seq.fill(c)(s"s$i") }
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val rows = Sampling.temperatureMix(docs.toDF("doc_id", "source"), "source")
        .collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
          r.getAs[Double]("p_sample"), r.getAs[Double]("boost")))
      val pSum = rows.map(_._3).sum
      // exact-integer normalization: probabilities sum to 1 within rounding dust
      val normalized = math.abs(pSum - 1.0) < 1e-4
      // α < 1: boost is antitone in share — strictly smaller sources never get a
      // smaller boost (ties allowed when weight quantization collides)
      val byShare = rows.sortBy(_._2)
      val antitone = byShare.zip(byShare.tail).forall { case (small, large) =>
        small._4 >= large._4 - 1e-9
      }
      normalized && antitone
    })
  }

  // ------------------------------------------------------------- d14 dup spans

  test("dupSpans equals the brute-force span mirror on random small-vocab corpora") {
    import spark.implicits._
    val (win, minSpan) = (3, 4)
    val word = Gen.oneOf("a", "b", "c")
    val doc = Gen.chooseNum(3, 14).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpusGen = Gen.chooseNum(2, 5).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) })
    check("dupspan-mirror", Prop.forAll(corpusGen) { corpus =>
      // mirror: windows with positions, cross-doc duplicates, island merge
      val windows = corpus.map { case (id, t) =>
        val w = t.split(" ", -1)
        id -> w.indices.dropRight(win - 1).map(i => (i + 1, w.slice(i, i + win).mkString(" ")))
      }.toMap
      val docFreq = windows.toSeq.flatMap { case (id, ws) => ws.map(w => (id, w._2)) }
        .distinct.groupBy(_._2).map { case (s, xs) => s -> xs.size }
      val expected = windows.toSeq.flatMap { case (id, ws) =>
        val dupPos = ws.collect { case (p, s) if docFreq(s) >= 2 => p }.sorted
        // islands of consecutive duplicated starts
        val islands = dupPos.foldLeft(List.empty[(Int, Int)]) {
          case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
          case (acc, p) => (p, p) :: acc
        }
        islands.collect {
          case (s, e) if e - s + win >= minSpan =>
            (id, s.toLong, (e - s + win).toLong)
        }
      }.toSet
      val got = Dedup.dupSpans(corpus.toDF("doc_id", "text"), "doc_id", "text",
          windowTokens = win, minSpanTokens = minSpan)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
          r.getAs[Long]("span_tokens")))
        .toSet
      got == expected
    })
  }

  // ------------------------------------------------------------- s20 kNN graph

  test("knnGraph equals the naive LSH + rank mirror on random vector sets") {
    import spark.implicits._
    val dims = 4
    val vecGen = Gen.listOfN(dims, Gen.chooseNum(-5, 5)).map(_.map(_.toDouble / 5.0))
    val setGen = for {
      n <- Gen.chooseNum(5, 10)
      vs <- Gen.listOfN(n, vecGen)
    } yield vs.zipWithIndex.map { case (v, i) => ((i + 1).toLong, v.toArray) }
      .filter(_._2.exists(_ != 0.0))
    // independent mirror of the plane family (the published ±1 construction)
    def planeW(i: Int, j: Int): Double = if ((i * (2 * j + 3) + j) % 2 == 0) 1.0 else -1.0
    def bucket(v: Array[Double], nPlanes: Int, offset: Int): Long =
      (0 until nPlanes).map { j =>
        val proj = v.indices.map(i => v(i) * planeW(i, offset + j)).sum
        if (proj >= 0) 1L << j else 0L
      }.sum
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      round6(dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum))
    }
    check("knn-mirror", Prop.forAll(setGen) { vecs =>
      vecs.size < 2 || {
        val (k, planes) = (3, 3)
        val cand = (for {
          (a, va) <- vecs; (b, vb) <- vecs
          if a < b
          if bucket(va, planes, 0) == bucket(vb, planes, 0) ||
            bucket(va, planes, planes) == bucket(vb, planes, planes)
        } yield (a, b)).toSet
        val sym = cand.toSeq.flatMap { case (a, b) =>
          val c = cos(vecs.toMap.apply(a), vecs.toMap.apply(b))
          Seq((a, b, c), (b, a, c))
        }
        val expected = sym.groupBy(_._1).flatMap { case (v, es) =>
          es.sortBy { case (_, n, c) => (-c, n) }.take(k).zipWithIndex
            .map { case ((_, n, c), r) => (v, n, c, r + 1) }
        }.toSet
        val got = Similarity.knnGraph(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
            k = k, nTables = 2, planesPerTable = planes, dims = dims)
          .collect()
          .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"),
            r.getAs[Double]("cos_sim"), r.getAs[Int]("rank")))
          .toSet
        got == expected
      }
    })
  }

  // ------------------------------------------------------------- t33 PMI pairs

  test("pmiPairs equals the direct-arithmetic mirror on random small-vocab corpora") {
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "c", "d")
    val doc = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpusGen = Gen.chooseNum(2, 6).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) })
    check("pmi-mirror", Prop.forAll(corpusGen) { corpus =>
      val docs = corpus.map(_._2.split(" ").toSeq)
      val uni = docs.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val nTok = docs.map(_.size).sum.toLong
      val nPair = docs.map(d => math.max(d.size - 1, 0)).sum.toLong
      val expected = docs.flatMap(d => d.zip(d.tail))
        .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
        .filter(_._2 >= 2L)
        .map { case (p, c) =>
          val v = (c.toDouble / nPair.toDouble) /
            ((uni(p._1).toDouble / nTok.toDouble) * (uni(p._2).toDouble / nTok.toDouble))
          (p._1, p._2) -> ((c, uni(p._1), uni(p._2), microQ(math.log(v))))
        }
      val got = TextStats.pmiPairs(corpus.toDF("doc_id", "text"), "text",
          minCount = 2L, k = 1000)
        .collect()
        .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
          ((r.getAs[Long]("n_pair"), r.getAs[Long]("n_w1"), r.getAs[Long]("n_w2"),
            r.getAs[Long]("pmi_micro"))))
        .toMap
      got == expected
    })
  }

  // --------------------------------------------------------- sk09 moments merge

  test("moments registers merge associatively and match a naive BigInt mirror") {
    val values = Gen.chooseNum(1, 30)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(1L, 3000000L)))
    val zero = (0L, BigInt(0), BigInt(0), BigInt(0), BigInt(0))
    check("moments-merge", Prop.forAll(values, Gen.chooseNum(0, 29)) { (vs, cutRaw) =>
      val cut = math.min(cutRaw, vs.size)
      val (a, b) = vs.splitAt(cut)
      // any split folds to the same register as the whole (addition is the merge)
      val whole = StreamOps.mergeMomentsRegs(zero, vs.iterator)
      val split = StreamOps.mergeMomentsRegs(
        StreamOps.mergeMomentsRegs(zero, a.iterator), b.iterator)
      val naive = (vs.size.toLong,
        vs.map(BigInt(_)).sum,
        vs.map(v => BigInt(v) * v).sum,
        vs.map(v => BigInt(v) * v * v).sum,
        vs.map(v => BigInt(v) * v * v * v).sum)
      whole == split && whole == naive
    }, cases = 30)
  }

  test("momentsEstimates equals the batch sk09 operator on random grouped values") {
    import spark.implicits._
    val groupGen = Gen.chooseNum(2, 25)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(1L, 2000000L)))
    check("moments-batch-parity", Prop.forAll(groupGen) { vs =>
      val zero = (0L, BigInt(0), BigInt(0), BigInt(0), BigInt(0))
      val (n, s1, s2, s3, s4) = StreamOps.mergeMomentsRegs(zero, vs.iterator)
      val pure = StreamOps.momentsEstimates(n, s1, s2, s3, s4)
      val row = graft.pipeline.Sketches
        .momentsSketch(vs.map(("g", _)).toDF("source", "n_chars"), "source", "n_chars")
        .collect().head
      (row.getAs[Long]("n"), row.getAs[Long]("mean_micro"), row.getAs[Long]("var_micro"),
        row.getAs[Long]("skew_micro"), row.getAs[Long]("kurt_micro")) ==
        ((n, pure._1, pure._2, pure._3, pure._4))
    })
  }
}
