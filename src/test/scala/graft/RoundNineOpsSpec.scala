package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Multimodal, Sampling, Similarity, TextStats}
import graft.testgraph.TestGraph

/** Round-9 operators, cross-validated against independent in-test mirrors (the
  * HilbertKey/d2xy discipline): a direct-arithmetic Kneser–Ney scorer, a closed-form
  * temperature-mix calculator, a naive two-round Rocchio searcher, a recomputed md5
  * media embedding, planted-span dup detection, a hashed-feature DSIR mirror, and a
  * degree-normalized SALSA mirror.
  */
class RoundNineOpsSpec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def microQ(x: Double): Long = math.floor(x * 1000000.0 + 0.5).toLong

  // ------------------------------------------------------------- t29 Kneser–Ney

  test("kneserNeyLogProb matches a direct-arithmetic mirror on a planted corpus") {
    import spark.implicits._
    val corpus = Seq(1L -> "a b a c a b", 2L -> "b a b c", 3L -> "c a b a")
    val df = corpus.toDF("doc_id", "text")
    val d = 0.75

    // mirror: bigram/context/continuation counts straight from definitions
    val docBigrams = corpus.map { case (id, t) =>
      val w = t.split(" ").toSeq
      id -> w.zip(w.tail).groupBy(identity).map { case (p, ps) => p -> ps.size.toLong }
    }.toMap
    val cb = docBigrams.values.flatten
      .groupBy(_._1).map { case (p, ms) => p -> ms.map(_._2).sum }
    val cw1 = cb.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val n1w1 = cb.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size.toLong }
    val ncw2 = cb.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val nBig = cb.size.toLong
    def lpMicro(p: (String, String)): Long = {
      val prob = (cb(p).toDouble - d) / cw1(p._1).toDouble +
        d * n1w1(p._1).toDouble / cw1(p._1).toDouble * (ncw2(p._2).toDouble / nBig.toDouble)
      math.floor(1000000.0 * math.log(prob) + 0.5).toLong
    }
    val expected = docBigrams.map { case (id, m) =>
      val n = m.values.sum
      val s = m.map { case (p, tf) => tf * lpMicro(p) }.sum
      id -> ((n, s, math.floor(s.toDouble / n.toDouble + 0.5).toLong))
    }

    val rows = TextStats.kneserNeyLogProb(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_lp_micro"), r.getAs[Long]("avg_lp_micro"))))
      .toMap
    assert(rows == expected)
    // KN sanity: every observed-bigram probability is positive and below 1 → lp < 0
    assert(rows.values.forall(_._2 < 0))
  }

  test("kneserNeyLogProb differs from Jelinek–Mercer where continuation diversity does") {
    import spark.implicits._
    // 'z' follows only 'a' but does so often; KN's continuation probability punishes
    // it relative to raw-frequency JM smoothing — the signal the operator exists for
    val df = Seq(1L -> "a z a z a z a z", 2L -> "b c d e b c").toDF("doc_id", "text")
    val kn = TextStats.kneserNeyLogProb(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("avg_lp_micro")).toMap
    val jm = TextStats.bigramLogProb(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("avg_lp_micro")).toMap
    assert(kn.keySet == Set(1L, 2L) && jm.keySet == Set(1L, 2L))
    assert(kn != jm)
  }

  // --------------------------------------------------------- t30 temperature mix

  test("temperatureMix matches the closed-form calculation and sums to 1") {
    import spark.implicits._
    val docs = (Seq.fill(8)("big") ++ Seq.fill(2)("mid") ++ Seq.fill(1)("small"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    val alpha = 0.3
    val n = Map("big" -> 8L, "mid" -> 2L, "small" -> 1L)
    val total = 11L
    val wq = n.map { case (s, c) =>
      s -> microQ(math.pow(c.toDouble / total.toDouble, alpha))
    }
    val wTot = wq.values.sum
    val rows = Sampling.temperatureMix(docs, "source", alphaMicro = 300000L).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    for ((s, c) <- n) {
      val r = rows(s)
      assert(r.getAs[Long]("n_docs") == c)
      assert(r.getAs[Double]("share") == round6(c.toDouble / total.toDouble))
      assert(r.getAs[Long]("weight_micro") == wq(s))
      assert(r.getAs[Double]("p_sample") == round6(wq(s).toDouble / wTot.toDouble))
      assert(r.getAs[Double]("boost") ==
        round6((wq(s) * total).toDouble / (wTot * c).toDouble))
    }
    // α < 1 upweights the small source and downweights the big one
    assert(rows("small").getAs[Double]("boost") > 1.0)
    assert(rows("big").getAs[Double]("boost") < 1.0)
    assert(math.abs(rows.values.map(_.getAs[Double]("p_sample")).sum - 1.0) < 1e-4)
  }

  // ------------------------------------------------------------- s19 Rocchio PRF

  test("prfTopK matches a naive two-round mirror") {
    import spark.implicits._
    // deterministic pseudo-random vectors, dim 4; queries = ids ≡ 0 (mod 5)
    def vec(id: Long): Array[Double] =
      Array.tabulate(4)(d => (((id * 31 + d * 17) % 13) - 6).toDouble / 6.0)
    val ids = (1L to 20L)
    val df = ids.map(i => (i, vec(i).map(_.toFloat))).toDF("vec_id", "embedding")
    val (fbK, k) = (2, 3)

    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      round6(dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum))
    }
    def topK(q: Long, qv: Array[Double], kk: Int): Seq[(Long, Double)] =
      ids.filter(_ != q).map(c => c -> cos(qv, vec(c)))
        .sortBy { case (c, s) => (-s, c) }.take(kk).toSeq
    val expected = ids.filter(_ % 5 == 0).flatMap { q =>
      val fb = topK(q, vec(q), fbK).map(_._1)
      val expanded = Array.tabulate(4) { d =>
        (fbK * microQ(vec(q)(d)) + fb.map(nb => microQ(vec(nb)(d))).sum).toDouble
      }
      topK(q, expanded, k).zipWithIndex.map { case ((nb, s), i) => (q, nb, s, i + 1) }
    }.toSet

    val got = Similarity.prfTopK(
      df.filter(col("vec_id") % 5 === 0), df, "vec_id", "embedding", k = k, feedbackK = fbK)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos_sim"), r.getAs[Int]("rank")))
      .toSet
    assert(got == expected)
  }

  test("prfTopK feedback pulls in a cluster-mate the single-round search missed") {
    import spark.implicits._
    // designed geometry: q points at cluster {a1, a2}; round 1 ranks the spurious b
    // above a2 (b is angularly closer to q), but expanding q toward its top-1 (a1)
    // rotates the query INTO the cluster and a2 overtakes b — the PRF win condition
    val vecs = Map(
      5L -> Array(1.0f, 0.0f),   // q
      1L -> Array(0.96f, 0.28f), // a1: cos(q,a1) ≈ 0.96 — round-1 top-1
      2L -> Array(0.66f, 0.75f), // a2: cos(q,a2) ≈ 0.66 — round-1 rank 3
      3L -> Array(0.8f, -0.6f)   // b:  cos(q,b)  = 0.80 — round-1 rank 2
    )
    val df = vecs.toSeq.map { case (i, v) => (i, v) }.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 5L)
    def top2(r: org.apache.spark.sql.DataFrame): Seq[Long] = r.collect()
      .sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq
    assert(top2(Similarity.bruteForceTopK(q, df, "vec_id", "embedding", 2)) == Seq(1L, 3L))
    assert(top2(Similarity.prfTopK(q, df, "vec_id", "embedding", k = 2, feedbackK = 1)) ==
      Seq(1L, 2L))
  }

  // ------------------------------------------------------ ev14 cohort retention

  test("cohortRetention matches a mirror built from the collected (day, user) pairs") {
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val daily = ev
      .select(col("user_id"), (EventTime.micros(ev).divide(86400000000L)).cast("long").as("day"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day"))).toSet
    val cohort = daily.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
    val sizes = cohort.groupBy(_._2).map { case (d, m) => d -> m.size.toLong }
    val expected = daily.toSeq
      .map { case (u, d) => (cohort(u), d - cohort(u)) }
      .groupBy(identity).map { case ((cd, off), xs) =>
        (cd, off) -> ((xs.size.toLong, sizes(cd),
          round6(xs.size.toDouble / sizes(cd).toDouble)))
      }
    val got = AnalyticsQueries.cohortRetention(spark, dir).collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset")) ->
        ((r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"),
          r.getAs[Double]("retention"))))
      .toMap
    assert(got == expected)
    // day-0 of every cohort is the full cohort by construction
    got.collect { case ((_, 0L), (n, size, ret)) =>
      assert(n == size && ret == 1.0)
    }
  }

  // ------------------------------------------------------- sk06 KMV quantiles

  test("kmvQuantiles matches a scala bottom-k mirror and is exact below the register size") {
    import spark.implicits._
    def hv(id: Long): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    // "big" has 200 rows (> k ⇒ sampled), "small" has 7 (≤ k ⇒ exact)
    val rows = (1L to 200L).map(i => ("big", i, i * 3)) ++
      (1001L to 1007L).map(i => ("small", i, i - 1000L))
    val df = rows.toDF("source", "doc_id", "n_chars")
    val k = 16
    def mirror(xs: Seq[(String, Long, Long)]): (Long, Long, Long, Long) = {
      val vs = xs.sortBy { case (_, id, _) => (hv(id), id) }.take(k).map(_._3).sorted
      def q(p: Int): Long = vs((p * vs.size + 99) / 100 - 1)
      (vs.size.toLong, q(50), q(90), q(99))
    }
    val expected = rows.groupBy(_._1).map { case (s, xs) => s -> mirror(xs.toSeq) }
    val got = graft.pipeline.Sketches.kmvQuantiles(df, "source", "doc_id", "n_chars", k = k)
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_sample"), r.getAs[Long]("p50_est"),
          r.getAs[Long]("p90_est"), r.getAs[Long]("p99_est"))))
      .toMap
    assert(got == expected)
    // below the register size the sample IS the population: exact nearest-rank values
    assert(got("small") == ((7L, 4L, 7L, 7L)))
  }

  test("kmvQuantiles never overfills the register when row ids repeat") {
    import spark.implicits._
    // every id appears twice with two values — without the rank trim the threshold
    // filter would admit ~2k rows and diverge from the oracle's row_number cut
    val rows = (1L to 50L).flatMap(i => Seq(("dup", i, i), ("dup", i, i + 1000L)))
    val df = rows.toDF("source", "doc_id", "n_chars")
    val k = 8
    val got = graft.pipeline.Sketches.kmvQuantiles(df, "source", "doc_id", "n_chars", k = k)
      .collect().head
    assert(got.getAs[Long]("n_sample") == k.toLong)
    def hv(id: Long): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    // mirror of the deterministic trim: order by (hv, id, v), take k
    val vs = rows.sortBy { case (_, id, v) => (hv(id), id, v) }.take(k).map(_._3).sorted
    assert(got.getAs[Long]("p50_est") == vs((50 * k + 99) / 100 - 1))
  }

  // ------------------------------------------------------- sk07 HDR quantiles

  test("hdrQuantiles matches a scala mirror and bounds relative error by 2^-2") {
    import spark.implicits._
    def bucket(v: Long): Long = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      4L * e + (if (e >= 2) v >> (e - 2) else v << (2 - e)) - 4
    }
    def lowerBound(b: Long): Long = {
      val e = (b / 4).toInt; val m = b % 4 + 4
      if (e >= 2) m << (e - 2) else m >> (2 - e)
    }
    // mixed magnitudes: 1-digit to Long.MaxValue — the top octaves are exactly where
    // a 4·v or (m+4)·2^e formulation would overflow and diverge between engines
    val values = (Seq.fill(40)(7L) ++ Seq.fill(30)(123L) ++ Seq.fill(20)(4096L) ++
      Seq.fill(5)(99999L) ++ Seq.fill(3)(1048573L) ++
      Seq(1L, (1L << 61) + 17, Long.MaxValue))
    val df = values.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("source", "doc_id", "n_chars")
    def mirrorQ(p: Int): Long = {
      val byBucket = values.groupBy(bucket).map { case (b, vs) => b -> vs.size.toLong }.toSeq.sortBy(_._1)
      val n = values.size.toLong
      val cum = byBucket.scanLeft(0L)(_ + _._2).tail
      lowerBound(byBucket(cum.indexWhere(_ * 100 >= p * n))._1)
    }
    val r = graft.pipeline.Sketches.hdrQuantiles(df, "source", "n_chars").collect().head
    assert(r.getAs[Long]("n") == values.size.toLong)
    assert(r.getAs[Long]("p50_est") == mirrorQ(50))
    assert(r.getAs[Long]("p90_est") == mirrorQ(90))
    assert(r.getAs[Long]("p99_est") == mirrorQ(99))
    // the design guarantee: each estimate is within 25% below the exact quantile
    def exactQ(p: Int): Long = values.sorted.apply(((p * values.size + 99) / 100) - 1)
    for (p <- Seq(50, 90, 99)) {
      val est = r.getAs[Long](s"p${p}_est"); val ex = exactQ(p)
      assert(est <= ex && est.toDouble >= ex * 0.75, s"p$p: est=$est exact=$ex")
    }
  }

  // --------------------------------------------------------- m05 media–text align

  test("mediaTextAlignment matches recomputed md5 embeddings and thresholds on the rounded cosine") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "the quick brown fox"), (3L, "zzz"))
    val media = docs.toDF("doc_id", "text")
      .select(col("doc_id"), lit("text").as("mt"), encode(col("text"), "UTF-8").as("media"))
    def emb(id: Long): Array[Float] =
      Array.tabulate(16)(d => (((id * 7 + d * 3) % 11) - 5).toFloat / 5.0f)
    val embeddings = docs.map { case (id, _) => (id, emb(id)) }.toDF("vec_id", "embedding")

    def mediaEmb(text: String): Array[Double] = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Array.tabulate(8)(d =>
        (java.lang.Long.parseLong(hex.substring(d * 4, d * 4 + 4), 16) % 1000L) / 1000.0)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      round6(dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum))
    }
    val expected = docs.map { case (id, t) =>
      val c = cos(mediaEmb(t), emb(id).take(8).map(_.toDouble))
      id -> ((c, if (c >= 0.5) 1 else 0))
    }.toMap

    val got = Multimodal.mediaTextAlignment(
      media, "doc_id", "mt", "media", embeddings, "vec_id", "embedding",
      dims = 8, thresholdMicro = 500000L).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        ((r.getAs[Double]("align_cos"), r.getAs[Int]("aligned"))))
      .toMap
    assert(got == expected)

    // dims ≠ 8 keeps BOTH sides at the requested dimensionality (the default stub
    // derives from dims — a fixed-size default would deflate cosines silently)
    val got4 = Multimodal.mediaTextAlignment(
      media, "doc_id", "mt", "media", embeddings, "vec_id", "embedding",
      dims = 4, thresholdMicro = 500000L).collect()
      .map(r => r.getAs[Long]("asset_id") -> r.getAs[Double]("align_cos")).toMap
    val expected4 = docs.map { case (id, t) =>
      id -> cos(mediaEmb(t).take(4), emb(id).take(4).map(_.toDouble))
    }.toMap
    assert(got4 == expected4)
  }

  // ------------------------------------------------------------ d14 dup spans

  test("dupSpans finds exactly the planted maximal spans and drops sub-threshold runs") {
    import spark.implicits._
    // docs 1 and 2 share a verbatim 10-token phrase; docs 1 and 3 share a 5-token
    // run (one duplicated window — below the 8-token bar); everything else unique
    val phrase = (1 to 10).map(i => s"p$i").mkString(" ")
    val short = (1 to 5).map(i => s"m$i").mkString(" ")
    val df = Seq(
      1L -> s"a1 a2 $phrase $short a3",
      2L -> s"$phrase b1 b2",
      3L -> s"c1 $short c2",
      4L -> "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10 d11 d12"
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpans(df, "doc_id", "text", windowTokens = 5, minSpanTokens = 8)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_tokens")))
      .toSet
    // the 10-token phrase spans: doc 1 tokens 3..12, doc 2 tokens 1..10; the shared
    // 5-token run (doc 1 pos 13, doc 3 pos 2) is a single duplicated window → 5 < 8
    assert(got == Set((1L, 3L, 10L), (2L, 1L, 10L)))
  }

  test("dupSpans merges runs separated by a gap into separate maximal spans") {
    import spark.implicits._
    // two copies of an 8-token phrase with unique filler between repeats inside doc 1:
    // each occurrence is its own island (gap breaks pos - row_number constancy)
    val ph = (1 to 8).map(i => s"w$i").mkString(" ")
    val df = Seq(
      1L -> s"$ph x1 x2 x3 x4 x5 $ph",
      2L -> s"y1 $ph y2"
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpans(df, "doc_id", "text", windowTokens = 5, minSpanTokens = 8)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_tokens")))
      .toSet
    assert(got == Set((1L, 1L, 8L), (1L, 14L, 8L), (2L, 2L, 8L)))
  }

  // ------------------------------------------------------------ t31 DSIR scores

  test("dsirScores matches a direct-arithmetic mirror with hashed uni+bigram features") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha gamma", "tgt"),
      (2L, "alpha beta delta", "tgt"),
      (3L, "omega psi chi omega", "other"),
      (4L, "alpha omega", "other"))
    val df = docs.toDF("doc_id", "text", "source")
    val B = 64
    def h60(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    def grams(t: String): Seq[String] = {
      val w = t.split(" ", -1).toSeq
      w ++ w.zip(w.tail).map { case (a, b) => s"$a $b" }
    }
    val tf = docs.map { case (id, t, _) =>
      id -> grams(t).groupBy(g => h60(g) % B).map { case (b, gs) => b -> gs.size.toLong }
    }.toMap
    val cntAll = tf.values.flatten.groupBy(_._1).map { case (b, m) => b -> m.map(_._2).sum }
    val tgtIds = docs.filter(_._3 == "tgt").map(_._1).toSet
    val cntTgt = tf.filter(x => tgtIds(x._1)).values.flatten
      .groupBy(_._1).map { case (b, m) => b -> m.map(_._2).sum }
    val (nAll, nTgt) = (cntAll.values.sum, cntTgt.values.sum)
    def lnMicro(num: Long, den: Long): Long =
      math.floor(1000000.0 * math.log(num.toDouble / den.toDouble) + 0.5).toLong
    val w = cntAll.map { case (b, ca) =>
      b -> (lnMicro(cntTgt.getOrElse(b, 0L) + 1, nTgt + B) - lnMicro(ca + 1, nAll + B))
    }
    val expected = docs.map { case (id, _, _) =>
      val m = tf(id)
      val n = m.values.sum
      val s = m.map { case (b, c) => c * w(b) }.sum
      id -> ((n, s, round6(s.toDouble / (n * 1000000L).toDouble)))
    }.toMap
    val got = Sampling.dsirScores(df, "doc_id", "text", "source", "tgt", buckets = B)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_feats"), r.getAs[Long]("score_micro"),
          r.getAs[Double]("avg_log_ratio"))))
      .toMap
    assert(got == expected)
    // target-looking docs must outscore the off-domain ones
    assert(got(1L)._3 > got(3L)._3 && got(2L)._3 > got(3L)._3)
  }

  // ----------------------------------------------------------- t32 vocab growth

  test("vocabGrowth matches a direct mirror and vocabulary is monotone-saturating") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c"), (1L, "a b d"), (9L, "a e"),
      (10L, "a b c d e"), (11L, "f g"),
      (25L, "a a a"))
    val df = docs.toDF("doc_id", "text")
    val bucketDocs = 10L
    val toks = docs.flatMap { case (id, t) => t.split(" ", -1).map(id -> _) }
    val dv = toks.groupBy(_._1).map { case (id, xs) => (id / bucketDocs, id, xs.size.toLong) }
      .groupBy(_._1).map { case (b, xs) => b -> ((xs.size.toLong, xs.map(_._3).sum)) }
    val nv = toks.groupBy(_._2).map { case (_, xs) => xs.map(_._1).min / bucketDocs }
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val buckets = dv.keys.toSeq.sorted
    val expected = buckets.map { b =>
      val upTo = buckets.filter(_ <= b)
      (b,
        upTo.map(dv(_)._1).sum,
        upTo.map(dv(_)._2).sum,
        upTo.map(nv.getOrElse(_, 0L)).sum)
    }.toSet
    val got = TextStats.vocabGrowth(df, "doc_id", "text", bucketDocs = bucketDocs)
      .collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("cum_docs"),
        r.getAs[Long]("cum_tokens"), r.getAs[Long]("vocab")))
      .toSet
    assert(got == expected)
    // vocabulary never exceeds cumulative tokens and never decreases
    val ordered = got.toSeq.sortBy(_._1)
    assert(ordered.forall { case (_, _, ct, v) => v <= ct })
    assert(ordered.map(_._4) == ordered.map(_._4).sorted)
  }

  // ------------------------------------------------------------ ev15 attribution

  test("attribution credits the latest in-window touch, ties to touches then max id") {
    val dir = "/root/testdata/sf0.001"
    // mirror straight from the collected events: per purchase, argmax (ts, id) over
    // at-or-before touches, 24h lookback after the argmax
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val rows = ev.select(col("event_id"), col("user_id"), col("event_type"),
        EventTime.micros(ev).as("ts_us"), col("value")).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("ts_us"), r.getAs[Double]("value")))
    val touches = rows.filter(r => Set("click", "view", "signup")(r._3))
      .groupBy(_._2).withDefaultValue(Array.empty)
    val look = 86400000000L
    val per = rows.filter(_._3 == "purchase").map { case (_, u, _, ts, v) =>
      val elig = touches(u).filter(_._4 <= ts)
      val ch =
        if (elig.isEmpty) "none"
        else {
          val best = elig.maxBy(t => (t._4, t._1))
          if (ts - best._4 > look) "none" else best._3
        }
      val gap =
        if (ch == "none") None
        else Some(ts - elig.maxBy(t => (t._4, t._1))._4)
      (ch, math.floor(v * 100 + 0.5).toLong, gap)
    }
    val expected = per.groupBy(_._1).map { case (ch, xs) =>
      val sumGap = xs.flatMap(_._3).sum
      ch -> ((xs.length.toLong, xs.map(_._2).sum, sumGap,
        if (ch == "none") 0.0 else round6(sumGap.toDouble / xs.length.toDouble)))
    }
    val got = AnalyticsQueries.attribution(spark, dir).collect()
      .map(r => r.getAs[String]("channel") ->
        ((r.getAs[Long]("n_conversions"), r.getAs[Long]("value_cents"),
          r.getAs[Long]("sum_gap_us"), r.getAs[Double]("avg_gap_us"))))
      .toMap
    assert(got == expected)
    // every purchase lands in exactly one channel
    assert(got.values.map(_._1).sum == per.length.toLong)
  }

  // ------------------------------------------------------------- s20 kNN graph

  test("knnGraph is symmetric-by-pair, self-free, and agrees with nearDupPairs' candidates") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val g = Similarity.knnGraph(emb, "vec_id", "embedding", k = 3).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos_sim"), r.getAs[Int]("rank")))
    assert(g.nonEmpty)
    // no self edges; ranks dense from 1; at most k per vector
    assert(g.forall { case (v, n, _, _) => v != n })
    g.groupBy(_._1).foreach { case (_, es) =>
      assert(es.map(_._4).sorted.toSeq == (1 to es.length))
      assert(es.length <= 3)
    }
    // each scored pair carries ONE cosine in both directions
    val byPair = g.groupBy { case (v, n, _, _) => (math.min(v, n), math.max(v, n)) }
    byPair.foreach { case (_, es) => assert(es.map(_._3).distinct.length == 1) }
    // candidates are exactly the pairs nearDupPairs at threshold -1 would score
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding", threshold = -1.0)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(g.map { case (v, n, _, _) => (math.min(v, n), math.max(v, n)) }.toSet.subsetOf(pairs))
  }

  test("LSH bucket cap drops quadratic cells but keeps pairs other tables still find") {
    import spark.implicits._
    // 40 identical vectors clump into ONE cell of every table (the near-duplicate
    // clump that goes quadratic at corpus scale); 3 distinct vectors spread out
    val clump = (1L to 40L).map(i => (i, Array.fill(8)(1.0f)))
    val others = Seq(
      (101L, Array.tabulate(8)(d => if (d % 2 == 0) 1.0f else -1.0f)),
      (102L, Array.tabulate(8)(d => if (d % 3 == 0) -1.0f else 1.0f)),
      (103L, Array.tabulate(8)(d => -1.0f)))
    val df = (clump ++ others).toDF("vec_id", "embedding")
    val capped = Similarity.nearDupPairs(df, "vec_id", "embedding", threshold = 0.99,
      dims = 8, maxBucketMembers = 10L).collect()
    val uncapped = Similarity.nearDupPairs(df, "vec_id", "embedding", threshold = 0.99,
      dims = 8, maxBucketMembers = 10000L).collect()
    // uncapped: the clump contributes 40·39/2 identical pairs; the cap drops the
    // mega-cell from BOTH tables, so none of its pairs survive
    assert(uncapped.length >= 40 * 39 / 2)
    assert(capped.forall(r => r.getAs[Long]("id_a") > 40L || r.getAs[Long]("id_b") > 40L)
      || capped.isEmpty)
    assert(capped.length < uncapped.length)
  }

  test("semDedup mega-cell cap keeps over-cap cell members by default") {
    import spark.implicits._
    // centroidMod 1 makes every vector a centroid of itself-ish; use mod so that
    // one centroid attracts a 30-member clump
    val clump = (1L to 30L).map(i => (i, Array.fill(8)(1.0f)))
    val spread = Seq((97L, Array.tabulate(8)(d => if (d < 4) 1.0f else -1.0f)))
    val df = (clump ++ spread).toDF("vec_id", "embedding")
    val uncapped = Similarity.semDedup(df, "vec_id", "embedding",
      threshold = 0.9, centroidMod = 97).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("is_kept")).toMap
    val capped = Similarity.semDedup(df, "vec_id", "embedding",
      threshold = 0.9, centroidMod = 97, maxCellMembers = 5L).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("is_kept")).toMap
    // uncapped: the clump resolves to one representative (vec 1)
    assert(uncapped.count { case (id, kept) => id <= 30L && kept } == 1)
    // capped: the clump cell (30 > 5) skips the pairwise pass — all keep by default
    assert(capped.filter(_._1 <= 30L).values.forall(identity))
    assert(capped.keySet == uncapped.keySet)
  }

  // ------------------------------------------------------------ o03 compaction

  test("compactionPlan packs consecutive buckets into near-target groups") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val target = 300L
    val rows = graft.pipeline.Layout.compactionPlan(ev, targetRows = target, bucketShift = 12)
      .collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_rows"), r.getAs[Long]("group_id")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // mirror: exclusive running sum DIV target
    var cum = 0L
    rows.foreach { case (_, n, g) =>
      assert(g == cum / target)
      cum += n
    }
    // group ids are monotone in bucket order (contiguous key ranges)
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq)
    // sound packing invariants (a "group reaches the target" bound does NOT hold in
    // general: a huge tile straddling a boundary can leave its successor group tiny):
    // each group's tiles all START inside the group's cum range [g·T, (g+1)·T)
    var cum2 = 0L
    rows.foreach { case (_, n, g) =>
      assert(cum2 >= g * target && cum2 < (g + 1) * target)
      cum2 += n
    }
    // a tile at least as large as the target always gets a fresh group to itself
    // (nothing later can share its cum range)
    rows.zip(rows.drop(1)).foreach { case ((_, n, g), (_, _, g2)) =>
      if (n >= target) assert(g2 > g, s"oversized tile in group $g not isolated")
    }
  }

  // ------------------------------------------------------------- sk08 AMS F2

  test("amsF2 matches a direct tug-of-war mirror and brackets the exact F2") {
    import spark.implicits._
    // zipf-ish: key i appears i times — F2 = sum i^2
    val rows = (1L to 30L).flatMap(i => Seq.fill(i.toInt)(i)).toDF("user_id")
    val width = 64
    def h32(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8), 16)
    val regs = (0 until width).map { j =>
      (1L to 30L).map { k => k * (1L - 2L * (h32(s"$j:$k") % 2)) }.sum
    }
    val f2Sum = regs.map(c => c * c).sum
    val r = graft.pipeline.Sketches.amsF2(rows, "user_id", width = width).collect().head
    assert(r.getAs[Long]("n_rows") == (1L to 30L).sum)
    assert(r.getAs[Long]("n_keys") == 30L)
    assert(r.getAs[Long]("f2_exact") == (1L to 30L).map(i => i * i).sum)
    assert(r.getAs[Long]("f2_sum") == f2Sum)
    assert(r.getAs[Double]("f2_est") == round6(f2Sum.toDouble / width.toDouble))
    // 64 registers keep the tug-of-war estimate within ~3 std errs of exact
    val exact = r.getAs[Long]("f2_exact").toDouble
    assert(math.abs(r.getAs[Double]("f2_est") - exact) <= exact * 1.0,
      s"est ${r.getAs[Double]("f2_est")} vs exact $exact")
  }

  // ------------------------------------------------------------------ g43 SALSA

  test("salsa matches a scala mirror of the degree-normalized half-steps") {
    val dir = "/root/testdata/sf0.001"
    val edges = TestGraph.store(spark, dir).snapshot
      .filter(col("graph_id") === 1 && col("state") === graft.model.State.Normal)
      .select(col("source_id"), col("destination_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dout = edges.groupBy(_._1).map { case (v, es) => v -> es.length.toLong }
    val din = edges.groupBy(_._2).map { case (v, es) => v -> es.length.toLong }
    val vertices = (edges.map(_._1) ++ edges.map(_._2)).distinct
    def half(scores: Map[Long, Long], forward: Boolean): Map[Long, Long] = {
      val raw = edges.groupBy(e => if (forward) e._2 else e._1).map { case (v, es) =>
        v -> es.map { case (s, d) =>
          if (forward) scores(s) / dout(s) else scores(d) / din(d)
        }.sum
      }
      val mx = raw.values.max
      vertices.map(v => v -> raw.getOrElse(v, 0L) * 1000000L / mx).toMap
    }
    var hub = vertices.map(_ -> 1000000L).toMap
    var auth = hub
    for (_ <- 1 to 2) {
      auth = half(hub, forward = true)
      hub = half(auth, forward = false)
    }
    val got = GraphQueries.salsa(spark, dir).collect()
      .map(r => r.getAs[Long]("vertex_id") ->
        ((r.getAs[Long]("auth_fp"), r.getAs[Long]("hub_fp")))).toMap
    assert(got.keySet == vertices.toSet)
    assert(got == vertices.map(v => v -> ((auth(v), hub(v)))).toMap)
    // max-normalization pins each side's argmax to exactly 1e6
    assert(got.values.map(_._1).max == 1000000L && got.values.map(_._2).max == 1000000L)
  }

  test("harmonicCentrality matches a per-seed BFS mirror over the collected edges") {
    val dir = "/root/testdata/sf0.001"
    val edges = TestGraph.store(spark, dir).snapshot
      .filter(col("graph_id") === 1 && col("state") === graft.model.State.Normal)
      .select(col("source_id"), col("destination_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj: Map[Long, Seq[Long]] = edges.groupBy(_._1)
      .map { case (s, es) => s -> es.map(_._2).distinct.toSeq }
      .withDefaultValue(Seq.empty[Long])
    val vertices = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val seeds = vertices.filter(_ % 100 == 0)
    val maxHops = 3
    // classic per-seed BFS to the hop bound
    val dist = seeds.flatMap { s =>
      var d = Map(s -> 0)
      var frontier = Seq(s)
      for (h <- 1 to maxHops) {
        val next = frontier.flatMap(adj).distinct.filterNot(d.contains)
        next.foreach(v => d += v -> h)
        frontier = next
      }
      d.collect { case (v, dd) if dd >= 1 => (v, dd) }
    }
    val expected = dist.groupBy(_._1).map { case (v, xs) =>
      v -> ((xs.length.toLong, xs.map(x => 1000000L / x._2).sum))
    }
    val got = GraphQueries.harmonicCentrality(spark, dir).collect()
      .map(r => r.getAs[Long]("vertex_id") ->
        ((r.getAs[Long]("n_seeds"), r.getAs[Long]("harmonic_micro")))).toMap
    assert(got == expected)
    // harmonic contributions are 1e6/1, /2, /3 — every value decomposes on that grid
    assert(got.values.forall { case (n, hm) => hm <= n * 1000000L && hm >= n * 333333L })
  }

  test("randomWalks replays the md5-choice walk exactly and stops at dead ends") {
    val dir = "/root/testdata/sf0.001"
    val edges = TestGraph.store(spark, dir).snapshot
      .filter(col("graph_id") === 1 && col("state") === graft.model.State.Normal)
      .select(col("source_id"), col("destination_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // indexed adjacency in destination order — the operator's row_number contract
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).distinct.sorted }
    def h32(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8), 16)
    val (steps, seedMod) = (3, 10)
    val expected = adj.keys.filter(_ % seedMod == 0).flatMap { seed =>
      var v = seed
      var rows = List((seed, 0, seed))
      var t = 1
      var alive = true
      while (t <= steps && alive) {
        adj.get(v) match {
          case Some(nbrs) =>
            v = nbrs((h32(s"$seed:$t") % nbrs.length).toInt)
            rows ::= ((seed, t, v))
          case None => alive = false
        }
        t += 1
      }
      rows
    }.toSet
    val got = GraphQueries.randomWalks(spark, dir, steps = steps, seedMod = seedMod)
      .collect()
      .map(r => (r.getAs[Long]("walk_id"), r.getAs[Int]("step"), r.getAs[Long]("vertex_id")))
      .toSet
    assert(got == expected)
    // every walk has a step-0 row at its seed
    assert(got.filter(_._2 == 0).forall { case (w, _, v) => w == v })
  }

  test("salsa damps celebrity hubs relative to hits") {
    val dir = "/root/testdata/sf0.001"
    val salsa = GraphQueries.salsa(spark, dir).collect()
      .map(r => r.getAs[Long]("vertex_id") -> r.getAs[Long]("auth_fp")).toMap
    val hits = GraphQueries.hits(spark, dir).collect()
      .map(r => r.getAs[Long]("vertex_id") -> r.getAs[Long]("auth_fp")).toMap
    assert(salsa.keySet == hits.keySet)
    // the two rankings must genuinely differ (degree normalization is not a no-op)
    assert(salsa != hits)
  }

  // ---------------------------------------------------------- t33 PMI pairs

  test("pmiPairs matches a direct-arithmetic mirror and ranks collocations first") {
    import spark.implicits._
    // "new york" always adjacent (strong collocation); "a"/"b" frequent but unbound
    val corpus = Seq(
      1L -> "a new york b a b",
      2L -> "b new york a a b",
      3L -> "new york a b b a",
      4L -> "a b new york b a")
    val df = corpus.toDF("doc_id", "text")

    val docs = corpus.map(_._2.split(" ").toSeq)
    val uni = docs.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val nTok = docs.map(_.size).sum.toLong
    val nPair = docs.map(d => math.max(d.size - 1, 0)).sum.toLong
    val pairs = docs.flatMap(d => d.zip(d.tail))
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filter(_._2 >= 2L)
    def pmiMicro(p: (String, String), c: Long): Long = {
      val v = (c.toDouble / nPair.toDouble) /
        ((uni(p._1).toDouble / nTok.toDouble) * (uni(p._2).toDouble / nTok.toDouble))
      math.floor(1000000.0 * math.log(v) + 0.5).toLong
    }
    val expected = pairs.map { case (p, c) =>
      (p._1, p._2) -> ((c, uni(p._1), uni(p._2), pmiMicro(p, c)))
    }

    val got = TextStats.pmiPairs(df, "text", minCount = 2L, k = 100).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
        ((r.getAs[Long]("n_pair"), r.getAs[Long]("n_w1"), r.getAs[Long]("n_w2"),
          r.getAs[Long]("pmi_micro"))))
      .toMap
    assert(got == expected)
    // the planted collocation outranks every frequent-but-unbound pair
    val top = TextStats.pmiPairs(df, "text", minCount = 2L, k = 1).collect()(0)
    assert((top.getAs[String]("w1"), top.getAs[String]("w2")) == ("new", "york"))
  }

  test("pmiPairs is safe on single-token documents (no descending-sequence pairs)") {
    import spark.implicits._
    val df = Seq(1L -> "solo", 2L -> "a b a b a b").toDF("doc_id", "text")
    val rows = TextStats.pmiPairs(df, "text", minCount = 1L, k = 10).collect()
    // no pair may mention the single-token doc's word
    assert(rows.forall(r => r.getAs[String]("w1") != "solo" && r.getAs[String]("w2") != "solo"))
    assert(rows.nonEmpty)
  }

  // ---------------------------------------------------------- t34 Zipf fit

  test("zipfFit matches a direct least-squares mirror over the vocabulary head") {
    import spark.implicits._
    // frequencies 16/8/4/2/1 → a clean strictly-ranked head
    val text = (List.fill(16)("alpha") ++ List.fill(8)("beta") ++ List.fill(4)("gamma") ++
      List.fill(2)("delta") ++ List("epsilon")).mkString(" ")
    val df = Seq(1L -> text).toDF("doc_id", "text")

    val freqs = Seq(16L, 8L, 4L, 2L, 1L)
    val pts = freqs.zipWithIndex.map { case (f, i) =>
      (math.floor(1000000.0 * math.log((i + 1).toDouble) + 0.5).toLong,
        math.floor(1000000.0 * math.log(f.toDouble) + 0.5).toLong)
    }
    val n = pts.size.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val (nD, sxD, syD) = (n.toDouble, sx.toDouble, sy.toDouble)
    val covNum = nD * sxy.toDouble - sxD * syD
    val varX = nD * sxx.toDouble - sxD * sxD
    val varY = nD * syy.toDouble - syD * syD
    val slope = covNum / varX

    val row = TextStats.zipfFit(df, "doc_id", "text", fitK = 10).collect()(0)
    assert(row.getAs[Long]("n_fit") == n)
    assert(row.getAs[Long]("slope_micro") == math.floor(1000000.0 * slope + 0.5).toLong)
    assert(row.getAs[Long]("intercept_micro") ==
      math.floor((syD - slope * sxD) / nD + 0.5).toLong)
    assert(row.getAs[Long]("r2_micro") ==
      math.floor(1000000.0 * (covNum * covNum / (varX * varY)) + 0.5).toLong)
    // geometric frequencies over ranks 1..5 are Zipf-like: slope negative, R² high
    assert(row.getAs[Long]("slope_micro") < 0L)
    assert(row.getAs[Long]("r2_micro") > 900000L)
  }

  // ------------------------------------------------------- sk09 moments sketch

  test("momentsSketch matches exact-moment arithmetic and zeroes skew on symmetric data") {
    import spark.implicits._
    val df = Seq(
      ("sym", 1L), ("sym", 2L), ("sym", 3L),
      ("skw", 1L), ("skw", 1L), ("skw", 1L), ("skw", 100L))
      .toDF("source", "n_chars")

    def mirror(vs: Seq[Long]): (Long, Long, Long, Long) = {
      val nD = vs.size.toDouble
      val m1 = vs.map(v => BigInt(v)).sum.toDouble / nD
      val m2 = vs.map(v => BigInt(v) * BigInt(v)).sum.toDouble / nD
      val m3 = vs.map(v => BigInt(v) * BigInt(v) * BigInt(v)).sum.toDouble / nD
      val m4 = vs.map(v => (BigInt(v) * BigInt(v)) * (BigInt(v) * BigInt(v))).sum.toDouble / nD
      val vr = m2 - m1 * m1
      def micro(x: Double) = math.floor(1000000.0 * x + 0.5).toLong
      (micro(m1), micro(vr),
        micro((m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1) / (vr * math.sqrt(vr))),
        micro((m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2 - 3.0 * m1 * m1 * m1 * m1) /
          (vr * vr) - 3.0))
    }
    val got = graft.pipeline.Sketches.momentsSketch(df, "source", "n_chars").collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("mean_micro"), r.getAs[Long]("var_micro"),
          r.getAs[Long]("skew_micro"), r.getAs[Long]("kurt_micro"))))
      .toMap
    assert(got("sym") == mirror(Seq(1L, 2L, 3L)))
    assert(got("skw") == mirror(Seq(1L, 1L, 1L, 100L)))
    // {1,2,3} is symmetric about its mean: third central moment is exactly 0
    assert(got("sym")._3 == 0L)
    // the planted outlier group is strongly right-skewed
    assert(got("skw")._3 > 1000000L)
  }

  // ---------------------------------------------------------- o04 prune stats

  test("pruneStats: min/max skipping is sound and every count reconciles") {
    import graft.pipeline.Layout
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val (lo, hi) = (100L, 199L)
    // sf0.001 has only 15 raw users (4 low morton bit-positions), so the interleave's
    // high bits — and therefore every group boundary — would come from the HOUR axis
    // alone and a user band could never prune. Spread user_id to 10 bits so the
    // layout has user information to separate, and use fully granular tiles.
    val spread = ev.withColumn("user_id", col("event_id") % 1024)
    val row = Layout.pruneStats(spread, targetRows = 64L, bucketShift = 0,
      userLo = lo, userHi = hi).collect()(0)
    val total = spread.count()
    val matching = spread.filter(col("user_id").between(lo, hi)).count()
    // SOUNDNESS: min/max pruning may never lose a matching row — the reported match
    // count must equal the full-scan answer
    assert(row.getAs[Long]("rows_matching") == matching)
    assert(row.getAs[Long]("rows_total") == total)
    assert(row.getAs[Long]("rows_scanned") >= row.getAs[Long]("rows_matching"))
    assert(row.getAs[Long]("rows_scanned") <= row.getAs[Long]("rows_total"))
    val (ng, np) = (row.getAs[Long]("n_groups"), row.getAs[Long]("n_pruned"))
    assert(np >= 0 && np <= ng)
    assert(row.getAs[Long]("prune_rate_micro") ==
      math.floor(1000000.0 * np.toDouble / ng.toDouble + 0.5).toLong)
    assert(row.getAs[Long]("read_amp_micro") ==
      math.floor(1000000.0 * row.getAs[Long]("rows_scanned").toDouble /
        matching.toDouble + 0.5).toLong)
    // the z-order layout must actually prune something for a thin user band at
    // this file size — a zero rate here means the layout stopped paying off
    assert(np > 0, s"expected non-trivial pruning, got $np of $ng groups")
  }

  // ---------------------------------------------------------- s21 MMR re-rank

  test("mmrRerank matches a naive greedy mirror on deterministic vectors") {
    import spark.implicits._
    def vec(id: Long): Array[Double] =
      Array.tabulate(4)(d => (((id * 37 + d * 19) % 11) - 5).toDouble / 5.0)
    val ids = (1L to 15L)
    val df = ids.map(i => (i, vec(i).map(_.toFloat))).toDF("vec_id", "embedding")
    val (k, candK, lam) = (3, 6, 700000L)
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cosMicro(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      microQ(round6(dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)))
    }
    val queries = ids.filter(_ % 5 == 0)
    val expected = queries.flatMap { q =>
      val cand = ids.filter(_ != q).map(c => c -> cosMicro(vec(q), vec(c)))
        .sortBy { case (c, s) => (-s, c) }.take(candK)
      var sel = List.empty[(Long, Long, Long, Int)] // (id, rel, score, rank)
      for (r <- 1 to k) {
        val rem = cand.filterNot(c => sel.exists(_._1 == c._1))
        val pick = rem.map { case (c, rel) =>
          val maxsim =
            if (sel.isEmpty) 0L
            else sel.map(s => cosMicro(vec(c), vec(s._1))).max
          (c, rel, lam * rel - (1000000L - lam) * maxsim)
        }.minBy { case (c, _, score) => (-score, c) }
        sel = sel :+ ((pick._1, pick._2, pick._3, r))
      }
      sel.map { case (id, rel, score, r) => (q, id, rel, score, r) }
    }.toSet
    val got = Similarity.mmrRerank(df.filter(col("vec_id") % 5 === 0), df, "vec_id",
        "embedding", k = k, candK = candK, lambdaMicro = lam)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("rel_micro"), r.getAs[Long]("score_micro"), r.getAs[Int]("mmr_rank")))
      .toSet
    assert(got == expected)
  }

  test("mmrRerank diversifies: a redundant near-twin is displaced by a distinct result") {
    import spark.implicits._
    // a1 and a2 nearly coincide; b is less relevant but diverse. Plain top-3 ranks
    // a1, a2, b; MMR at λ=0.5 demotes the twin below b.
    val vecs = Map(
      5L -> Array(1.0f, 0.0f), // query
      1L -> Array(0.999f, 0.045f), // a1
      2L -> Array(0.998f, 0.063f), // a2 — near-twin of a1
      3L -> Array(0.8f, -0.6f)) // b — diverse
    val df = vecs.toSeq.map { case (i, v) => (i, v) }.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 5L)
    def order(r: org.apache.spark.sql.DataFrame, rankCol: String): Seq[Long] = r.collect()
      .sortBy(_.getAs[Int](rankCol)).map(_.getAs[Long]("neighbor_id")).toSeq
    assert(order(Similarity.bruteForceTopK(q, df, "vec_id", "embedding", 3), "rank") ==
      Seq(1L, 2L, 3L))
    assert(order(Similarity.mmrRerank(q, df, "vec_id", "embedding", k = 3, candK = 3,
      lambdaMicro = 500000L), "mmr_rank") == Seq(1L, 3L, 2L))
    // λ = 1 degenerates to plain relevance order
    assert(order(Similarity.mmrRerank(q, df, "vec_id", "embedding", k = 3, candK = 3,
      lambdaMicro = 1000000L), "mmr_rank") == Seq(1L, 2L, 3L))
  }

  // -------------------------------------------------------- d15 cluster keep

  test("clusterKeepLongest keeps the longest member per cluster and audits drops") {
    import spark.implicits._
    // two exact-dup groups of different sizes + one unique doc; exact dups collide
    // in every minhash band, so clusters are certain
    val df = Seq(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha beta gamma delta epsilon zeta",
      3L -> "alpha beta gamma delta epsilon zeta eta theta",
      4L -> "one two three four five",
      5L -> "one two three four five",
      6L -> "unique words only here nothing shared").toDF("doc_id", "text")
    val got = Dedup.clusterKeepLongest(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        ((r.getAs[Long]("kept_doc"), r.getAs[Long]("kept_tokens"),
          r.getAs[Long]("n_members"), r.getAs[Long]("n_dropped"))))
      .toMap
    // membership comes from the (oracle-matched) d05 clustering; the DECISION must
    // agree with a mirror computed from that clustering + exact token counts
    val clusters = Dedup.dedupClusters(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
    val toks = Map(1L -> 6L, 2L -> 6L, 3L -> 8L, 4L -> 5L, 5L -> 5L, 6L -> 6L)
    val expected = clusters.groupBy(_._2).map { case (c, ms) =>
      val ids = ms.map(_._1)
      val kept = ids.minBy(id => (-toks(id), id))
      c -> ((kept, toks(kept), ids.size.toLong, ids.size.toLong - 1L))
    }
    assert(got == expected)
    // docs 1-3 share every shingle window prefix… 1,2 identical; 3 is the longest
    // superset: if they clustered together, 3 must be the keeper
    val c123 = clusters.collect { case (id, c) if id <= 3 => c }.distinct
    if (c123.size == 1) assert(got(c123.head)._1 == 3L)
    // every cluster accounts for all members
    assert(got.values.map(_._3).sum == 6L)
  }

  // -------------------------------------------------- ev17 activity Pareto

  test("activityPareto deciles partition users exactly and shares telescope to 1") {
    val dir = "/root/testdata/sf0.001"
    val per = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n")))
    val nUsers = per.length.toLong
    val total = per.map(_._2).sum
    val ranked = per.sortBy(p => (-p._2, p._1))
    val mirror = ranked.zipWithIndex
      .groupBy { case (_, i) => 1L + i.toLong * 10L / nUsers }
      .map { case (d, xs) =>
        d -> ((xs.size.toLong, xs.map(_._1._2).sum))
      }
    val got = AnalyticsQueries.activityPareto(spark, dir).collect()
      .map(r => r.getAs[Long]("decile") ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("decile_events"),
          r.getAs[Long]("share_micro"), r.getAs[Long]("cum_share_micro"))))
      .toMap
    assert(got.keySet == mirror.keySet)
    mirror.foreach { case (d, (nu, ev)) =>
      assert(got(d)._1 == nu && got(d)._2 == ev, s"decile $d")
      assert(got(d)._3 ==
        math.floor(1000000.0 * ev.toDouble / total.toDouble + 0.5).toLong)
    }
    // decile user counts sum to all users; event counts to all events
    assert(got.values.map(_._1).sum == nUsers)
    assert(got.values.map(_._2).sum == total)
    // cumulative share ends at 100% and is monotone in decile order
    val byDecile = got.toSeq.sortBy(_._1).map(_._2._4)
    assert(byDecile.last == 1000000L)
    assert(byDecile == byDecile.sorted)
    // decile 1 (most active users) has the largest per-decile share
    assert(got(1L)._3 == got.values.map(_._3).max)
  }

  // ------------------------------------------------------------- ev16 RFM

  test("rfm buckets are exact quintiles of deterministic ranks over sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val per = ev
      .select(EventTime.micros(ev).as("tsu"), col("user_id"), col("value"))
      .groupBy(col("user_id"))
      .agg(
        max(col("tsu")).as("rec"),
        count(lit(1)).as("freq"),
        sum(round(col("value") * 100, 0).cast("long")).as("mon"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("rec"),
        r.getAs[Long]("freq"), r.getAs[Long]("mon")))
    val nUsers = per.length.toLong
    def buckets(rank: Seq[Long]): Map[Long, Long] =
      rank.zipWithIndex.map { case (u, i) => u -> (1L + i.toLong * 5L / nUsers) }.toMap
    val rB = buckets(per.sortBy(p => (-p._2, p._1)).map(_._1).toSeq)
    val fB = buckets(per.sortBy(p => (-p._3, p._1)).map(_._1).toSeq)
    val mB = buckets(per.sortBy(p => (-p._4, p._1)).map(_._1).toSeq)

    val got = AnalyticsQueries.rfm(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("r_bucket"), r.getAs[Long]("f_bucket"), r.getAs[Long]("m_bucket"),
          r.getAs[Long]("rfm_code"))))
      .toMap
    assert(got.keySet == per.map(_._1).toSet)
    got.foreach { case (u, (r, f, m, code)) =>
      assert(r == rB(u) && f == fB(u) && m == mB(u))
      assert(code == r * 100 + f * 10 + m)
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5)
    }
    // quintiles are balanced: each bucket holds n/5 ± 1 users per dimension
    val perBucket = got.values.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perBucket.values.forall(c => math.abs(c - nUsers / 5.0) <= 1.0))
  }
}
