package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Curation, Dedup, Sampling, Similarity}

/** Round-14 operator pins: the LSH auto-tune pick rule, the adaptive-ANN
  * router (sequential cosine mirror for the exact branch), the probe-recall
  * curve's monotonicity + grid, the release diff's partition laws against an
  * md5 checksum mirror, the epoch-resume remainder on a planted manifest, and
  * the ev21 transition matrix against a full sequential mirror.
  */
class RoundFourteenOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The Sketches.h32-mod-1e6 checksum term, independently via java MD5. */
  private def h32check(id: Long): Long = {
    val v = java.lang.Long.parseLong(md5hex(id.toString).substring(0, 8), 16)
    ((v % 1000000L) + 1000000L) % 1000000L
  }

  test("d26: exactly one chosen config, and it is the pick rule's argmin over the report") {
    val report = Dedup.lshAutoTune(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
      shingleSize = 3, configs = Seq((16, 1), (8, 2), (4, 4)),
      threshold = 0.2, recallFloorMicro = 800000L)
      .collect()
      .map(r => (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band"),
        r.getAs[Long]("n_true"), r.getAs[Long]("n_candidates"),
        r.getAs[Long]("recall_micro"), r.getAs[Int]("qualifies"), r.getAs[Int]("chosen")))
    assert(report.length == 3)
    // every config is scored against the SAME truth
    assert(report.map(_._3).distinct.length == 1)
    assert(report.count(_._7 == 1) == 1, s"exactly one chosen: ${report.mkString(", ")}")
    val expected = report.minBy { case (b, _, _, nc, rec, q, _) =>
      (-q, if (q == 1) nc else Long.MaxValue, -rec, -b)
    }
    assert(report.find(_._7 == 1).get == expected,
      s"pick rule mirror: got ${report.find(_._7 == 1).get}, want $expected")
  }

  test("s31: the tight filter routes to the exact scan and matches a sequential cosine mirror") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val out = Similarity.filteredTopKAdaptive(
      e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding", k = 5,
      allowed = e.filter(col("label") % 10 === 0).select(col("vec_id")),
      selThresholdMicro = 250000L, kCells = 8, trainRounds = 1)
      .collect()
    assert(out.nonEmpty && out.forall(_.getAs[String]("route") == "exact_prefilter"))
    val selMicro = out.head.getAs[Long]("selectivity_micro")
    assert(selMicro > 0 && selMicro <= 250000L, s"selectivity $selMicro")
    // sequential mirror: exact cosine top-5 among ALLOWED candidates only
    val vecs = e.select(col("vec_id"), col("embedding").cast("array<double>"), col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val r = d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val allowed = vecs.filter(_._3 % 10 == 0)
    val want = vecs.filter(_._1 % 50 == 0).flatMap { case (q, qv, _) =>
      allowed.filter(_._1 != q)
        .map { case (c, cvv, _) => (c, cos(qv, cvv)) }
        .sortBy { case (c, s) => (-s, c) }
        .take(5).zipWithIndex
        .map { case ((c, _), i) => (q, c, i + 1) }
    }.toSet
    val got = out.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
      r.getAs[Int]("rank"))).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("s31: the broad filter keeps the IVF pre-filter route") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val out = Similarity.filteredTopKAdaptive(
      e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding", k = 5,
      allowed = e.filter(col("label") % 2 === 0).select(col("vec_id")),
      selThresholdMicro = 250000L, kCells = 8, trainRounds = 1)
      .select(col("route"), col("selectivity_micro")).distinct().collect()
    assert(out.length == 1 && out.head.getString(0) == "ivf_prefilter")
    assert(out.head.getLong(1) > 250000L)
  }

  test("s32: full level × query grid, recall@k in [0,1], mean recall monotone in n_probe") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.ivfProbeRecallCurve(
      e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding", k = 5,
      probeLevels = Seq(1, 2, 4), kCells = 8, trainRounds = 1)
      .collect()
      .map(r => (r.getAs[Int]("n_probe"), r.getAs[Long]("query_id"),
        r.getAs[Double]("recall_at_k")))
    val nQueries = rows.map(_._2).distinct.length
    assert(rows.length == 3 * nQueries, s"grid: ${rows.length} rows for $nQueries queries")
    assert(rows.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
    val means = Seq(1, 2, 4).map(p => rows.filter(_._1 == p).map(_._3).sum / nQueries)
    assert(means == means.sorted,
      s"recall must not fall as probes widen: ${Seq(1, 2, 4).zip(means)}")
  }

  test("dc18: planted releases — status partition laws, grid zeros, checksum mirror") {
    val oldRel = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "source")
    val newRel = Seq((2L, "a"), (3L, "b"), (4L, "b")).toDF("doc_id", "source")
    val allSources = Seq(("a", 0), ("b", 0), ("c", 0)).toDF("source", "x")
    val got = Curation.releaseDiff(oldRel, newRel, "doc_id", "source", allSources)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("status")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("id_check"))).toMap
    assert(got.size == 9, s"full 3-source × 3-status grid, got ${got.keySet}")
    assert(got(("a", "retained")) == (1L, h32check(2L)))
    assert(got(("a", "removed")) == (1L, h32check(1L)))
    assert(got(("a", "added")) == (0L, 0L))
    assert(got(("b", "retained")) == (1L, h32check(3L)))
    assert(got(("b", "removed")) == (0L, 0L))
    assert(got(("b", "added")) == (1L, h32check(4L)))
    assert(Seq("retained", "removed", "added").forall(s => got(("c", s)) == (0L, 0L)))
    // partition laws: retained + removed = |old|, retained + added = |new|
    def tot(st: String) = got.collect { case ((_, s), (n, _)) if s == st => n }.sum
    assert(tot("retained") + tot("removed") == 3L)
    assert(tot("retained") + tot("added") == 3L)
  }

  test("dc18: the shared-kernel pair derivation is set-identical to two full chains") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val words = Seq("the", "a", "value", "line")
    val (gotOld, gotNew) = Curation.releaseDiffAdmitted(docs, emb,
      "doc_id", "text", "source", "vec_id", "embedding",
      benchmarkMod = 10L, shingleSize = 5, requiredWords = words,
      oldSemanticMicro = 400000L, oldMinHits = 2,
      newSemanticMicro = 300000L, newMinHits = 1)
    def full(sem: Long, hits: Int) = Curation.releaseAdmitted(docs, emb,
      "doc_id", "text", "source", "vec_id", "embedding",
      benchmarkMod = 10L, shingleSize = 5, semanticThresholdMicro = sem,
      requiredWords = words, minRequiredHits = hits)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ids(gotOld) == full(400000L, 2), "old config")
    assert(ids(gotNew) == full(300000L, 1), "new config")
  }

  test("dc19: planted manifest — remainder past the watermark, explicit done shard") {
    val manifest = (
      // shard (a, 0): bins 0..4 → consumed_until 2, remainder bins {3, 4}
      (0 until 10).map(i => (s"a-$i", "a", i.toLong + 1, 2L, 25L, i.toLong, 0L, (i / 2).toLong)) ++
      // shard (b, 1): one bin → consumed_until 0, nothing past it — done row
      Seq(("b-0", "b", 1L, 1L, 40L, 0L, 1L, 0L))
    ).toDF("doc_id", "source", "rk", "repeat_factor", "n_syms", "bucket", "pack_group", "bin")
    val got = Sampling.epochResume(manifest, "source").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("pack_group")) ->
        (r.getAs[Long]("consumed_until"), r.getAs[Long]("resume_bin"),
          r.getAs[Long]("n_bins_left"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("n_slots"))).toMap
    assert(got.size == 2)
    // bins 3,4 hold docs a-6..a-9: 4 docs, 100 tokens, 8 slots
    assert(got(("a", 0L)) == (2L, 3L, 2L, 4L, 100L, 8L))
    assert(got(("b", 1L)) == (0L, -1L, 0L, 0L, 0L, 0L))
  }

  test("s33: census laws — members conserve, shares sum to one, imbalance recomputes") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.ivfCellCensus(e, "vec_id", "embedding",
      kCells = 8, dims = 64, trainRounds = 1)
      .collect()
      .map(r => (r.getAs[Long]("cid"), r.getAs[Long]("n_members"),
        r.getAs[Long]("share_micro"), r.getAs[Long]("imbalance_micro"),
        r.getAs[Long]("k_cells")))
    val k = rows.head._5
    assert(rows.length.toLong == k, "one row per model cell")
    val n = rows.map(_._2).sum
    assert(n == e.count(), "every vector lands in exactly one cell")
    val shareSum = rows.map(_._3).sum
    assert(math.abs(shareSum - 1000000L) <= k, s"shares sum to ~1e6: $shareSum")
    val sumSq = rows.map(r => r._2 * r._2).sum
    val wantImb = (2L * 1000000L * k * sumSq + n * n) / (2L * n * n)
    assert(rows.forall(_._4 == wantImb), s"imbalance mirror: ${rows.head._4} vs $wantImb")
    assert(wantImb >= 1000000L - k, s"imbalance factor is ≥ 1 by Cauchy-Schwarz: $wantImb")
  }

  test("ev22: transition entropy equals the sequential mirror; one-successor types are zero") {
    val got = AnalyticsQueries.transitionEntropy(spark, dir).collect()
      .map(r => r.getAs[String]("from_type") ->
        (r.getAs[Long]("n_out_types"), r.getAs[Long]("n_steps_total"),
          r.getAs[Long]("entropy_micro"))).toMap
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val rows = ev.select(col("user_id"), col("event_id"),
        EventTime.micros(ev).as("tsu"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val steps = rows.groupBy(_._1).values.flatMap { es =>
      val ordered = es.sortBy(e => (e._3, e._2)).map(_._4)
      ordered.zip(ordered.drop(1))
    }.toSeq
    val counts = steps.groupBy(identity).map { case (kk, v) => kk -> v.size.toLong }
    val want = counts.groupBy(_._1._1).map { case (f, m) =>
      val ns = m.values.toSeq
      val tot = ns.sum
      val ent = ns.map(nn => math.floor(
        1000000.0 * (nn.toDouble / tot.toDouble)
          * math.log(tot.toDouble / nn.toDouble) + 0.5).toLong).sum
      f -> (ns.size.toLong, tot, ent)
    }
    assert(got == want, s"entropy mirror: missing=${want.toSet -- got.toSet}")
    // a single-successor type carries exactly zero entropy
    want.collect { case (f, (1L, _, e0)) => assert(e0 == 0L, s"$f: $e0") }
  }

  test("d27: estimator laws — agreement bounds, formula mirror, identical pair is exact") {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(40)
    // plant an exact duplicate of doc 0 under a fresh id: the pair must be a
    // candidate (identical signatures in every band) and calibrate perfectly
    val clone = base.filter(col("doc_id") === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val rows = Dedup.minhashEstimateReport(base.unionByName(clone), "doc_id", "text")
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("n_agree"),
        r.getAs[Long]("est_micro"), r.getAs[Long]("exact_micro"),
        r.getAs[Long]("abs_err_micro")))
    assert(rows.nonEmpty)
    // a candidate shares at least one band; at rowsPerBand = 1 that IS one
    // agreeing permutation
    assert(rows.forall(r => r._3 >= 1 && r._3 <= 16))
    assert(rows.forall(r => r._4 == (2L * 1000000L * r._3 + 16L) / 32L), "est formula")
    assert(rows.forall(r => r._6 == math.abs(r._4 - r._5)), "abs err")
    val dup = rows.filter(r => r._1 == 0L && r._2 == 1000000L)
    assert(dup.length == 1 && dup.head == ((0L, 1000000L, 16L, 1000000L, 1000000L, 0L)),
      s"identical pair must calibrate exactly: ${dup.toSeq}")
  }

  test("dc20: the release-grade epoch packs only admitted sources, with positive mass") {
    // structural composition law (the full value equality is dc20's oracle row):
    // every packed source survived the release gates, and the pack is non-empty
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val admitted = Curation.releaseAdmitted(docs, emb, "doc_id", "text", "source",
      "vec_id", "embedding", benchmarkMod = 10L, shingleSize = 5,
      semanticThresholdMicro = 400000L,
      requiredWords = Seq("the", "a", "value", "line"), minRequiredHits = 2)
    val okSources = admitted.select(col("source")).distinct().collect()
      .map(_.getString(0)).toSet
    val pool = docs.join(admitted.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val merges = graft.pipeline.TextStats.bpeMergeLoop(pool, "doc_id", "text", rounds = 4)
    val packs = Sampling.epochPackUpsampled(pool, "doc_id", "source", "text", merges,
      alphaMicro = 300000L, budgetDocs = 1000L, budgetTokens = 512L, nGroups = 8)
      .collect()
    assert(packs.nonEmpty && packs.map(_.getAs[Long]("n_docs")).sum > 0)
    assert(packs.map(_.getAs[String]("source")).toSet.subsetOf(okSources))
  }

  test("g62: planted star is exactly -1; a regular ring reports the degenerate zero") {
    // star: hub 100 with 5 leaves — every directed pair is (1,5) or (5,1) ⇒ r = −1
    val star = (1L to 5L).map(i => (100L, i)).toDF("src", "dst")
    val s = GraphQueries.assortativityKernel(star).collect()(0)
    assert(s.getAs[Long]("n_directed_pairs") == 10L)
    assert(s.getAs[Int]("degenerate") == 0)
    assert(s.getAs[Long]("assortativity_micro") == -1000000L,
      s"star r: ${s.getAs[Long]("assortativity_micro")}")
    // 4-ring: every vertex degree 2 — zero variance, explicit degenerate zero
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val r = GraphQueries.assortativityKernel(ring).collect()(0)
    assert(r.getAs[Int]("degenerate") == 1 && r.getAs[Long]("assortativity_micro") == 0L)
  }

  test("ev23: the stationary vector equals a sequential power-iteration mirror") {
    val got = AnalyticsQueries.markovStationary(spark, dir, rounds = 5).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("stationary_micro")).toMap
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val rows = ev.select(col("user_id"), col("event_id"),
        EventTime.micros(ev).as("tsu"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val steps = rows.groupBy(_._1).values.flatMap { es =>
      val ordered = es.sortBy(e => (e._3, e._2)).map(_._4)
      ordered.zip(ordered.drop(1))
    }.toSeq
    val counts = steps.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val fromTotals = counts.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val rate = counts.map { case ((f, t), nSteps) =>
      (f, t) -> (2L * 1000000L * nSteps + fromTotals(f)) / (2L * fromTotals(f))
    }
    val types = rows.map(_._4).distinct.sorted
    val n = types.length.toLong
    var v: Map[String, Long] = types.map(_ -> (2L * 1000000L + n) / (2L * n)).toMap
    for (_ <- 1 to 5) {
      val stepped = rate.toSeq.groupBy(_._1._2).map { case (t, es) =>
        t -> es.map { case ((f, _), r) => v(f) * r }.sum / 1000000L
      }
      v = types.map(t => t -> stepped.getOrElse(t, 0L)).toMap
    }
    assert(got == v, s"stationary mirror: got $got want $v")
  }

  test("release lifecycle e2e: census, card, self-diff, and epoch derive one coherent corpus") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val words = Seq("the", "a", "value", "line")
    val admitted = Curation.releaseAdmitted(docs, emb, "doc_id", "text", "source",
        "vec_id", "embedding", benchmarkMod = 10L, shingleSize = 5,
        semanticThresholdMicro = 400000L, requiredWords = words, minRequiredHits = 2)
      .localCheckpoint(true)
    val census = Curation.releaseCensus(admitted, "doc_id", "source").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the card's admitted counts are the census counts (zero rows excluded)
    val card = Curation.releaseCard(docs, admitted, "doc_id", "text", "source").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_docs")).toMap
    assert(card.filter(_._2 > 0) == census, "card vs census per-source counts")
    // a release diffed against itself is pure retention
    val self = Curation.releaseDiff(admitted, admitted, "doc_id", "source", docs)
      .collect()
      .map(r => (r.getAs[String]("status"), r.getAs[Long]("n_docs")))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    assert(self("added") == 0L && self("removed") == 0L)
    assert(self("retained") == census.values.sum, "self-diff retains the census")
    // the release-grade epoch admits only released documents, and the resume
    // remainder never exceeds the manifest per shard
    val pool = docs.join(admitted.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val merges = graft.pipeline.TextStats.bpeMergeLoop(pool, "doc_id", "text", rounds = 4)
    val manifest = Sampling.epochManifestUpsampled(pool, "doc_id", "source", "text",
        merges, alphaMicro = 300000L, budgetDocs = 1000L, budgetTokens = 512L,
        nGroups = 8)
      .localCheckpoint(true)
    val admittedIds = admitted.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(manifest.select(col("doc_id")).collect().map(_.getLong(0)).forall(admittedIds),
      "every packed doc survived the gates")
    val shardTotals = manifest.groupBy(col("source"), col("pack_group"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    Sampling.epochResume(manifest, "source").collect().foreach { r =>
      val key = (r.getAs[String]("source"), r.getAs[Long]("pack_group"))
      val left = r.getAs[Long]("n_docs")
      assert(left <= shardTotals(key), s"$key remainder exceeds the shard")
      if (left > 0)
        assert(r.getAs[Long]("resume_bin") > r.getAs[Long]("consumed_until"), s"$key bin order")
    }
  }

  test("dc22: unique contributions never exceed failures; a shadowed gate reports zero") {
    val rows = Curation.gateAblation(
      spark.read.parquet(s"$dir/documents.parquet"),
      spark.read.parquet(s"$dir/embeddings.parquet"),
      "doc_id", "text", "source", "vec_id", "embedding",
      benchmarkMod = 10L, shingleSize = 5, semanticThresholdMicro = 400000L,
      requiredWords = Seq("the", "a", "value", "line"), minRequiredHits = 2)
      .collect()
      .map(r => r.getAs[String]("gate") ->
        (r.getAs[Long]("n_failing"), r.getAs[Long]("n_unique"),
          r.getAs[Long]("unique_id_check")))
    assert(rows.length == 5 && rows.map(_._1).distinct.length == 5)
    rows.foreach { case (g, (f, u, chk)) =>
      assert(u <= f, s"$g: unique $u > failing $f")
      assert((u == 0L) == (chk == 0L), s"$g: checksum/zero coherence")
    }
  }

  test("d29: kept mass never exceeds raw, and a duplicate-free corpus saves zero") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val rows = Dedup.dedupSavings(docs, "doc_id", "text", "source").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_tokens_kept") <= r.getAs[Long]("n_tokens"))
    }
    // planted: 3 unique docs (no near-dups at the pinned banding) — zero savings
    import spark.implicits._
    val unique = Seq(
      (1L, "alpha beta gamma delta", "a"),
      (2L, "epsilon zeta eta theta", "a"),
      (3L, "iota kappa lambda mu", "b")).toDF("doc_id", "text", "source")
    val u = Dedup.dedupSavings(unique, "doc_id", "text", "source").collect()
    assert(u.forall(r => r.getAs[Long]("saved_tokens_micro") == 0L
      && r.getAs[Long]("n_docs") == r.getAs[Long]("n_docs_kept")), u.mkString(", "))
  }

  test("ev21: the transition matrix equals a full sequential mirror of the fixture") {
    val got = AnalyticsQueries.typeTransitions(spark, dir).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n_steps"), r.getAs[Long]("rate_micro"))).toMap
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val rows = ev.select(col("user_id"), col("event_id"),
        EventTime.micros(ev).as("tsu"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val steps = rows.groupBy(_._1).values.flatMap { es =>
      val ordered = es.sortBy(e => (e._3, e._2)).map(_._4)
      ordered.zip(ordered.drop(1))
    }.toSeq
    val counts = steps.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val fromTotals = counts.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val want = counts.map { case ((f, t), n) =>
      (f, t) -> (n, (2L * 1000000L * n + fromTotals(f)) / (2L * fromTotals(f)))
    }
    assert(got == want,
      s"missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
  }
}
