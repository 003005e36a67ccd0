package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Multimodal, Sampling, Similarity, TextStats}

/** Round-9 operators, cross-validated against independent in-test mirrors (the
  * HilbertKey/d2xy discipline): a direct-arithmetic Kneser–Ney scorer, a closed-form
  * temperature-mix calculator, a naive two-round Rocchio searcher, and a recomputed
  * md5 media embedding.
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
}
