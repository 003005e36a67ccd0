package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Sampling}

/** Round-13 operator pins: the epoch-manifest artifact's pack-range access
  * pattern (measured, the d21 discipline), and the dedup-index compaction's
  * probe-invariance + file-count collapse.
  */
class RoundThirteenOpsSpec extends SparkSpec {
  import spark.implicits._

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(f => java.nio.file.Files.deleteIfExists(f))
  }

  private def parquetFiles(f: java.io.File): Seq[java.io.File] =
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
      .flatMap(c => if (c.isDirectory) parquetFiles(c) else Seq(c))
      .filter(_.getName.endsWith(".parquet"))

  test("dc12: a pack_group fetch plans only its directory's files (measured)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // 4 sources × 4 pack_groups × 10 bins of synthetic manifest rows — the
    // artifact layout is what's pinned here; the manifest DERIVATION is pinned
    // by dc12's oracle row in CORRECTNESS
    val manifest = (for {
      s <- Seq("a", "b", "c", "d"); i <- 0 until 100
    } yield (s"$s-$i", s, i.toLong + 1, 1L, 50L, i.toLong, (i % 4).toLong, (i / 10).toLong))
      .toDF("doc_id", "source", "rk", "repeat_factor", "n_syms", "bucket", "pack_group", "bin")
    val dir = java.nio.file.Files.createTempDirectory("graft-r13-manifest")
    try {
      val path = dir.toString + "/manifest"
      Sampling.saveEpochManifest(manifest, "doc_id", "source", path, nFiles = 16)
      val loaded = Sampling.loadEpochManifest(spark, path)
      // bit-exact round trip of the integer manifest
      assert(loaded.count() == 400L)
      assert(loaded.schema("pack_group").dataType == org.apache.spark.sql.types.LongType)
      val totalFiles = parquetFiles(new java.io.File(path)).size
      val shardFiles = parquetFiles(new java.io.File(s"$path/source=b/pack_group=2")).size
      assert(shardFiles >= 1 && shardFiles < totalFiles,
        s"shard dir must hold a strict subset: $shardFiles of $totalFiles")
      // a trainer shard's fetch = one (source, pack_group) stream: the scan
      // must plan ONLY that directory's files
      val q = loaded.filter(col("source") === "b" && col("pack_group") === 2L)
      q.collect()
      val scan = q.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }.head
      assert(scan.metrics("numFiles").value == shardFiles.toLong,
        s"shard fetch planned ${scan.metrics("numFiles").value} files; dir holds $shardFiles of $totalFiles")
      // and the rollup over the loaded artifact is the dc11 rollup of the
      // in-session manifest — the round trip is invisible to the packs
      val inSession = Sampling.epochPackRollup(manifest, "source")
        .orderBy(col("source"), col("pack_group"), col("bin")).collect().toSeq
      val reloaded = Sampling.epochPackRollup(loaded, "source")
        .orderBy(col("source"), col("pack_group"), col("bin")).collect().toSeq
      assert(inSession == reloaded, "load-then-rollup must reproduce the in-session packs")
    } finally deleteRecursively(dir)
  }

  test("d22: compaction collapses appended generations and is invisible to the probe") {
    val archive = (1L to 20L).map(i => (i, s"archive document number $i with plenty of words inside"))
      .toDF("doc_id", "text")
    val waves = Seq(
      (101L to 110L).map(i => (i, s"ingest wave document $i with other words entirely")),
      (201L to 210L).map(i => (i, s"later wave document $i with different words again")))
      .map(_.toDF("doc_id", "text"))
    val probeDocs = ((1L to 5L) ++ (151L to 155L))
      .map(i => (i + 1000L, s"archive document number ${(i % 20) + 1} with plenty of words inside"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-r13-compact")
    try {
      val path = dir.toString + "/index"
      Dedup.saveDedupIndex(Dedup.dedupIndex(archive, "doc_id", "text"), path)
      waves.foreach(w => Dedup.appendToDedupIndex(Dedup.dedupIndex(w, "doc_id", "text"), path))
      def bandFiles(): Map[String, Int] =
        Option(new java.io.File(path).listFiles()).getOrElse(Array.empty).toSeq
          .filter(f => f.isDirectory && f.getName.startsWith("band="))
          .map(f => f.getName -> parquetFiles(f).size).toMap
      val before = bandFiles()
      assert(before.values.exists(_ >= 3),
        s"two appends must stack file generations inside band dirs: $before")
      val probeSigs = Dedup.dedupIndex(probeDocs, "doc_id", "text").localCheckpoint(true)
      def probe(): Seq[(Long, Long, Long)] =
        Dedup.incrementalDedupAgainst(probeSigs, "doc_id",
          Dedup.loadDedupIndex(spark, path).localCheckpoint(true))
          .collect()
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"), r.getAs[Long]("n_bands")))
          .toSeq.sortBy(_._1)
      val probeBefore = probe()
      assert(probeBefore.nonEmpty, "the planted near-dupes must collide")
      Dedup.compactDedupIndex(spark, path)
      val after = bandFiles()
      assert(after.values.forall(_ == 1),
        s"compaction must collapse every band to filesPerBand files: $after")
      assert(after.keySet == before.keySet, "compaction must keep every band directory")
      assert(!new java.io.File(path + "__compacting").exists(),
        "the staging path must be swapped away")
      assert(probe() == probeBefore, "compaction must be invisible to the probe")
    } finally deleteRecursively(dir)
  }

  test("t42: the gate-swap trigger decides swap/hold/block like retrainTrigger decides retrain") {
    import graft.pipeline.TextStats
    def evalRow(n: Long, agr: Long, prec: Long, rec: Long) =
      Seq((n, 1L, 1L, 1L, 1L, prec, rec, agr))
        .toDF("n_scored", "tp", "fp", "fn", "tn",
          "precision_micro", "recall_micro", "agreement_micro")
    // all metrics clear → swap
    val swap = TextStats.gateSwapTrigger(evalRow(100L, 900000L, 880000L, 950000L))
    assert(swap.action == "swap", swap.toString)
    // zero scored docs → no evidence, hold — never a swap, never an alert
    val hold = TextStats.gateSwapTrigger(evalRow(0L, 0L, 0L, 0L))
    assert(hold.action == "hold" && hold.reason.contains("no evidence"), hold.toString)
    // any failing metric → block, with the metric named
    val block = TextStats.gateSwapTrigger(evalRow(100L, 700000L, 880000L, 950000L))
    assert(block.action == "block" && block.reason.contains("agreement"), block.toString)
    val block2 = TextStats.gateSwapTrigger(evalRow(100L, 900000L, 700000L, 600000L))
    assert(block2.action == "block" &&
      block2.reason.contains("precision") && block2.reason.contains("recall"), block2.toString)
    // the driver-side trigger and the relational t42 form agree on every case
    for (ev <- Seq(evalRow(100L, 900000L, 880000L, 950000L), evalRow(0L, 0L, 0L, 0L),
        evalRow(100L, 700000L, 880000L, 950000L))) {
      val kernel = TextStats.gateSwapTrigger(ev).action
      val relational = TextStats.gateSwapDecision(ev).select("action").head.getString(0)
      assert(kernel == relational, s"kernel $kernel vs relational $relational")
    }
    // the deployment check: only a swap routes the candidate to the stream
    val candidate = Seq((1L, 5L)).toDF("slot", "w")
    val current = Seq((1L, 3L)).toDF("slot", "w")
    assert(TextStats.chooseGateWeights(swap, candidate, current) eq candidate)
    assert(TextStats.chooseGateWeights(hold, candidate, current) eq current)
    assert(TextStats.chooseGateWeights(block, candidate, current) eq current)
  }

  test("t39: an all-unseen-vocabulary arrival scores margin 0 / drop instead of vanishing") {
    import graft.pipeline.TextStats
    val training = (1L to 8L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val weights = TextStats.lrQualityTrain(training, "doc_id", "text",
      buckets = 4096, rounds = 1).localCheckpoint(true)
    // an ingest wave whose vocabulary the snapshot never saw — with 4096 slots
    // the planted tokens must not collide into trained slots (asserted, so a
    // collision breaks the TEST loudly, not the pin silently)
    val ingest = Seq((101L, "zzyzx qwxv jjqk"), (102L, "the quick brown fox")).toDF("doc_id", "text")
    val trainedSlots = weights.select("slot").collect().map(_.getLong(0)).toSet
    val ingestSlots = TextStats.hashedTf(ingest.filter(col("doc_id") === 101L),
      "doc_id", "text", 4096).select("slot").collect().map(_.getLong(0)).toSet
    assert(ingestSlots.intersect(trainedSlots).isEmpty,
      s"planted vocabulary collided into trained slots $ingestSlots — pick other tokens")
    val scored = TextStats.lrScoreWith(ingest, "doc_id", "text", weights, buckets = 4096)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("margin_micro"), r.getAs[Long]("p_micro"), r.getAs[String]("label"))).toMap
    // EVERY tokenized arrival gets a verdict row
    assert(scored.keySet == Set(101L, 102L), scored.toString)
    assert(scored(101L) == ((0L, 500000L, "drop")), scored(101L).toString)
  }

  test("dc13: a verbatim benchmark quote never spends an epoch budget slot") {
    import graft.pipeline.{Dedup, Sampling}
    import graft.pipeline.TextStats
    // benchmark docs are doc_id % 10 == 0; doc 41 quotes benchmark doc 20
    // verbatim, the rest of the pool is clean prose
    val bench = "the held out benchmark sentence with exactly these rare words in order"
    val docs = ((1L to 45L).filterNot(_ == 41L).map(i =>
      (i, if (i % 10 == 0 && i != 20) s"benchmark split item number $i with its own words"
          else if (i == 20) bench
          else s"ordinary training document $i with plain words and more of them here", "srcA")) ++
      Seq((41L, bench, "srcA")))
      .toDF("doc_id", "text", "source")
    val scratch = java.nio.file.Files.createTempDirectory("graft-r13-dc13")
    try {
      val train = docs.filter(col("doc_id") % 10 =!= 0)
      val contaminated = Dedup.benchmarkDecontaminate(docs, "doc_id", "text",
        benchmarkMod = 10L, shingleSize = 5).select(col("doc_id"))
      val flagged = contaminated.collect().map(_.getLong(0)).toSet
      assert(flagged.contains(41L), s"the verbatim quote must be flagged: $flagged")
      val clean = train.join(contaminated, Seq("doc_id"), "left_anti").localCheckpoint(true)
      val path = scratch.toString + "/merges"
      TextStats.bpeSaveMerges(TextStats.bpeMergeLoop(clean, "doc_id", "text", rounds = 2), path)
      val manifest = Sampling.epochManifestUpsampled(clean, "doc_id", "source", "text",
        TextStats.bpeLoadMerges(spark, path),
        alphaMicro = 300000L, budgetDocs = 30L, budgetTokens = 64L, nGroups = 2)
      val admitted = manifest.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(!admitted.contains(41L), "the contaminated doc must never be admitted")
      assert(admitted.nonEmpty && admitted.forall(id => id % 10 != 0),
        s"packs must draw from the clean training pool only: $admitted")
    } finally deleteRecursively(scratch)
  }

  test("t43: nBatches = 1 reduces exactly to the full-batch trainer (structural invariant)") {
    import graft.pipeline.TextStats
    val docs = ((1L to 9L).map(i =>
      (i, s"the cat sat on a mat of warm wool and felt fine day$i")) ++
      (11L to 14L).map(i => (i, s"zzzzqqqqxxxx$i kkkkjjjjhhhh")))
      .toDF("doc_id", "text")
    def weights(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getAs[Long]("slot") -> r.getAs[Long]("w_micro")).toMap
    val full = weights(TextStats.lrQualityTrain(docs, "doc_id", "text", buckets = 64, rounds = 3))
    val mini = weights(TextStats.lrQualityTrainMiniBatch(docs, "doc_id", "text",
      buckets = 64, rounds = 3, nBatches = 1))
    assert(full == mini, s"nBatches=1 must BE the full-batch trainer: $full vs $mini")
    // and a real mini-batch schedule still moves every batch's evidence into
    // the weights: an epoch over 2 batches trains a non-degenerate model
    val epoch = weights(TextStats.lrQualityTrainMiniBatch(docs, "doc_id", "text",
      buckets = 64, rounds = 2, nBatches = 2))
    assert(epoch.values.exists(_ != 0L), s"epoch training must move weights: $epoch")
  }

  test("s28: arrivals are searchable the moment their batch lands (bidirectional insert)") {
    import graft.pipeline.Similarity
    // 4 tight clusters (the s26 recall corpus); arrivals 100+c clone each
    // cluster's query vector exactly, so an arrival is its query's true top-1
    val base = (for {
      c <- 0 until 4
      j <- 0 until 10
    } yield {
      val v = Array.fill(8)(0.0f)
      v(2 * c) = 1.0f
      for (i <- 0 until 8) v(i) = v(i) + 0.05f * (((i * 7 + j * 13 + c * 3) % 5) - 2)
      (c * 10L + j, v)
    }).toDF("vec_id", "embedding")
    val queries = base.filter(col("vec_id") % 10 === 3).localCheckpoint(true)
    val arrivals = queries.select((col("vec_id") / 10).cast("long").as("c"), col("embedding"))
      .select((lit(100L) + col("c")).as("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val corpus = base.unionByName(arrivals).localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("graft-r13-extend")
    try {
      val path = dir.toString + "/index"
      val model = Similarity.kmeansRounds(base, "vec_id", "embedding", k = 8, dims = 8, rounds = 2)
      Similarity.saveGraphAnnIndex(
        Similarity.knnGraph(base, "vec_id", "embedding", k = 5, dims = 8),
        model,
        Similarity.graphAnnEntryPoints(base, "vec_id", "embedding", model),
        path)
      def search(): Map[Long, Seq[(Long, Int)]] = {
        val (adj, m, ent) = Similarity.loadGraphAnnIndex(spark, path)
        Similarity.graphAnnSearch(queries, corpus, "vec_id", "embedding", adj, m,
          k = 5, beam = 8, rounds = 2, entryProbe = 4, entries = Some(ent))
          .collect()
          .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank")))
          .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq.sortBy(_._2)).toMap
      }
      // before the extend: the index predates the arrivals — no search can see them
      val before = search()
      assert(before.values.flatten.forall(_._1 < 100L),
        s"arrivals must be invisible before the append: $before")
      Similarity.appendToKnnGraph(
        Similarity.knnGraphExtend(arrivals, corpus, "vec_id", "embedding", k = 5, dims = 8),
        s"$path/adj")
      // after: every query's clone arrival is reachable through a partner's
      // reverse half-edge and lands in the answer (cosine exactly 1; base
      // vector j=8 duplicates j=3 in this corpus, so the id tie-break can put
      // it ahead — presence in the top-k is the reachability claim)
      val after = search()
      for (c <- 0L until 4L) {
        val q = c * 10L + 3L
        assert(after(q).exists(_._1 == 100L + c),
          s"query $q must surface arrival ${100 + c} in its top-k: ${after(q)}")
      }
    } finally deleteRecursively(dir)
  }

  // ---- dc14 epoch shuffle ---------------------------------------------------

  test("t45: planted corpus exercises all three backoff branches and the exact tertile cut") {
    import graft.pipeline.TextStats
    // reference "a b a b c": bm = {(a,b):2, (b,a):1, (b,c):1}, cw1 = {a:2, b:2},
    // uni = {a:2, b:2, c:1}, N = 5
    val docs = Seq(
      (1L, "a b a b c", "ref"), // all bigrams seen: 0, 0, ln(1/2)µ, ln(1/2)µ -> avg -346573
      (2L, "a b", "web"),       // seen branch: ln(2/2) = 0
      (3L, "c c", "web"),       // unigram backoff: ln(0.4 * 1/5) -> -2525729
      (4L, "x y", "web"),       // OOV successor: pinned penalty
      (5L, "z", "web")          // no bigrams at all: counted, scored the penalty
    ).toDF("doc_id", "text", "source")
    val got = TextStats.ccnetTertiles(docs, "doc_id", "text", "source",
      refSource = "ref", oovLpMicro = -20000000L)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("avg_lp_micro"),
          r.getAs[Long]("tertile"), r.getAs[String]("bucket")))).toMap
    assert(got(2L) == ((1L, 0L, 1L, "head")), got.toString)             // rank 1
    assert(got(1L) == ((4L, -346573L, 1L, "head")), got.toString)       // rank 2
    assert(got(3L) == ((1L, -2525729L, 2L, "middle")), got.toString)    // rank 3
    assert(got(4L) == ((1L, -20000000L, 2L, "middle")), got.toString)   // rank 4 (id tie-break)
    assert(got(5L) == ((0L, -20000000L, 3L, "tail")), got.toString)     // rank 5
  }

  test("dc16: release funnel stages are monotone and every gate fires on the corpus") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = graft.pipeline.Curation.releaseFunnel(docs, em,
        "doc_id", "text", "source", "vec_id", "embedding",
        requiredWords = Seq("the", "a", "value", "line"))
      .groupBy(col("stage")).sum("n_docs")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val order = Seq("00_total", "01_train_split", "02_gopher", "03_exact_keeper",
      "04_ngram_clean", "05_semantic_clean")
    assert(order.forall(got.contains), got.toString)
    val counts = order.map(got)
    assert(counts.sliding(2).forall { case Seq(a, b) => a >= b; case _ => true }, got.toString)
    assert(counts.head > counts.last && counts.last > 0, got.toString)
  }

  test("m08: each media rule trips its own bit on a planted payload length") {
    import graft.pipeline.Multimodal
    // stub decode: width = (7n) % 1920 + 1, height = (13n) % 1080 + 1,
    // brightness = (n % 256)/255 — payload LENGTH n selects the verdict
    def payload(n: Int): Array[Byte] = Array.fill(n)('x'.toByte)
    val assets = Seq(
      (0L, "img", payload(64)),   // w 449, h 833, bright 250980 -> kept
      (1L, "img", payload(26)),   // 26 bytes < 64 -> bit 0 (dims/bright pass)
      (2L, "img", payload(589)),  // height 98 < 128 -> bit 1
      (4L, "img", payload(93)),   // 652 x 130: aspect > 3 -> bit 2
      (8L, "img", payload(230))   // bright 901961 > 900000 -> bit 3
    ).toDF("doc_id", "source", "media")
    val got = Multimodal.mediaQualityGate(assets, "doc_id", "source", "media")
      .collect()
      .map(r => r.getAs[Long]("asset_id") ->
        ((r.getAs[Long]("reasons"), r.getAs[Int]("kept")))).toMap
    // asset id IS its expected bitmask
    assert(got == Map(0L -> ((0L, 1)), 1L -> ((1L, 0)), 2L -> ((2L, 0)),
      4L -> ((4L, 0)), 8L -> ((8L, 0))), got.toString)
  }

  test("dc15: anneal phase is the quality head, trains last in ascending order, conserves docs") {
    import graft.pipeline.Sampling
    // planted manifest: 8 docs, two sources, 6 syms each; quality = doc_id * 10
    val manifest = (1L to 8L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", i % 2, 6L)).toDF("doc_id", "source", "pack_group", "n_syms")
    val quality = (1L to 8L).map(i => (i, i * 10L)).toDF("doc_id", "q_micro")
    val got = Sampling.epochAnneal(manifest, quality, "doc_id", "source",
      annealDocs = 3L, epoch = 0L, budgetTokens = 10L).collect()
    val anneal = got.filter(_.getAs[Long]("phase") == 1L)
    val main = got.filter(_.getAs[Long]("phase") == 0L)
    // conservation: every manifest doc lands in exactly one phase
    assert(anneal.map(_.getAs[Long]("n_docs")).sum == 3L, got.toSeq.toString)
    assert(main.map(_.getAs[Long]("n_docs")).sum == 5L, got.toSeq.toString)
    // the anneal set is the quality HEAD (docs 6, 7, 8): phase 0 tops out at 50
    assert(main.map(_.getAs[Long]("q_max")).max == 50L, main.toSeq.toString)
    assert(anneal.map(_.getAs[Long]("q_min")).min == 60L, anneal.toSeq.toString)
    // ascending within the anneal: 6 syms each, budget 10 -> bins of 1..2 docs,
    // q_max of bin b never exceeds q_min of bin b+1 (global over sources)
    val byBin = anneal.groupBy(_.getAs[Long]("ebin")).toSeq.sortBy(_._1)
      .map { case (b, rs) =>
        (b, rs.map(_.getAs[Long]("q_min")).min, rs.map(_.getAs[Long]("q_max")).max) }
    assert(byBin.size >= 2, byBin.toString)
    assert(byBin.sliding(2).forall {
      case Seq((_, _, hiPrev), (_, loNext, _)) => hiPrev <= loNext
      case _ => true
    }, byBin.toString)
    // token conservation across the whole epoch
    assert(got.map(_.getAs[Long]("n_tokens")).sum == 48L, got.toSeq.toString)
  }

  test("d24: planted paraphrase pair is flagged, orthogonal vector is clean, ties break low") {
    import graft.pipeline.Similarity
    val docs = Seq(
      (0L, Array(1.0f, 0.0f)),  // bench
      (10L, Array(0.0f, 1.0f)), // bench
      (1L, Array(2.0f, 0.0f)),  // colinear with bench 0 -> cos 1e6, contaminated
      (2L, Array(0.0f, 3.0f)),  // colinear with bench 10 -> contaminated
      (3L, Array(1.0f, 1.0f)),  // cos 707107 to BOTH -> tie breaks to bench 0, clean
      (4L, Array(-1.0f, 0.0f))  // cos -1e6 / 0 -> max 0 via bench 10, clean
    ).toDF("vec_id", "embedding")
    val got = Similarity.semanticDecontaminate(docs, "vec_id", "embedding")
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("bench_id"), r.getAs[Long]("max_cos_micro"),
          r.getAs[Int]("contaminated")))).toMap
    assert(got == Map(
      1L -> ((0L, 1000000L, 1)),
      2L -> ((10L, 1000000L, 1)),
      3L -> ((0L, 707107L, 0)),
      4L -> ((10L, 0L, 0))), got.toString)
  }

  test("s29: filtered ANN returns only allowed neighbors, fills k, and reduces to s23") {
    import graft.pipeline.Similarity
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .localCheckpoint(true)
    val queries = e.filter(col("vec_id") % 50 === 0)
    val allowedIds = e.filter(col("label") % 3 === 0).select(col("vec_id"))
    val allowedSet = allowedIds.collect().map(_.getLong(0)).toSet
    val got = Similarity.ivfPqFilteredTopK(queries, e, "vec_id", "embedding",
      k = 5, allowed = allowedIds, kCells = 8, trainRounds = 2).collect()
    // every surviving neighbor satisfies the predicate
    assert(got.forall(r => allowedSet.contains(r.getAs[Long]("neighbor_id"))))
    // pre-filtering fills k: with ~40% of the corpus allowed and every cell
    // populated, each query's probed cells hold >= k qualifying members
    val perQuery = got.groupBy(_.getAs[Long]("query_id")).map(_._2.length)
    assert(perQuery.nonEmpty && perQuery.forall(_ == 5), perQuery.toString)
    // the unfiltered top-k is NOT all-allowed (so a post-filter would starve)
    val unfiltered = Similarity.ivfPqTrainedTopK(queries, e, "vec_id", "embedding",
      k = 5, kCells = 8, trainRounds = 2).collect()
    assert(unfiltered.exists(r => !allowedSet.contains(r.getAs[Long]("neighbor_id"))))
    // allowed = everything reduces to the unfiltered search exactly
    val all = Similarity.ivfPqFilteredTopK(queries, e, "vec_id", "embedding",
      k = 5, allowed = e.select(col("vec_id")), kCells = 8, trainRounds = 2).collect()
    assert(all.map(_.toSeq).sortBy(_.toString).toSeq ==
      unfiltered.map(_.toSeq).sortBy(_.toString).toSeq)
  }

  test("dc17: a source-slice fetch of the saved release plans only its directory's files") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import graft.pipeline.Curation
    val admitted = (for { s <- Seq("a", "b", "c", "d"); i <- 0 until 100 }
      yield (s.hashCode.toLong * 1000 + i, s)).toDF("doc_id", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft-r13-release")
    try {
      val path = dir.toString + "/release"
      Curation.saveRelease(admitted, "doc_id", "source", path, nFiles = 16)
      val loaded = Curation.loadRelease(spark, path)
      // bit-exact round trip: census of the load equals census of the input
      val a = Curation.releaseCensus(admitted, "doc_id", "source")
        .orderBy(col("source")).collect().toSeq
      val b = Curation.releaseCensus(loaded, "doc_id", "source")
        .orderBy(col("source")).collect().toSeq
      assert(a == b, s"round trip must be invisible to the census: $a vs $b")
      // a per-source slice prunes to its directory
      val totalFiles = parquetFiles(new java.io.File(path)).size
      val sliceFiles = parquetFiles(new java.io.File(s"$path/source=b")).size
      assert(sliceFiles >= 1 && sliceFiles < totalFiles, s"$sliceFiles of $totalFiles")
      val q = loaded.filter(col("source") === "b")
      q.collect()
      val scan = q.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }.head
      assert(scan.metrics("numFiles").value == sliceFiles.toLong,
        s"slice fetch planned ${scan.metrics("numFiles").value} files; dir holds $sliceFiles")
    } finally deleteRecursively(dir)
  }

  test("d25: the tuning report finds a planted near-dup and reports empty truth as zeros") {
    // planted: docs 1/2 share most 3-shingles (true pair + candidate), doc 3 disjoint
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val r = Dedup.lshTuningReport(docs, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_true") == 1L && r.getAs[Long]("n_hits") == 1L, r.toString)
    assert(r.getAs[Long]("recall_micro") == 1000000L, r.toString)
    assert(r.getAs[Long]("precision_micro") > 0L, r.toString)
    // a corpus with no near-dup pairs at the threshold: explicit zeros, no 0/0
    val clean = Seq(
      (1L, "one two three four five six"),
      (2L, "seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val z = Dedup.lshTuningReport(clean, "doc_id", "text").collect()(0)
    assert(z.getAs[Long]("n_true") == 0L && z.getAs[Long]("recall_micro") == 0L, z.toString)
  }

  test("s30: filtered recall is a per-query [0,1] diagnostic with explicit miss rows") {
    import graft.pipeline.Similarity
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .localCheckpoint(true)
    val allowed = e.filter(col("label") % 3 === 0).select(col("vec_id"))
    val rec = Similarity.filteredAnnRecall(e.filter(col("vec_id") % 50 === 0), e,
        "vec_id", "embedding", k = 5, allowed = allowed)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("recall_at_k"))
    assert(rec.nonEmpty && rec.forall { case (_, v) => v >= 0.0 && v <= 1.0 }, rec.toSeq.toString)
    assert(rec.exists(_._2 > 0.0), rec.toSeq.toString) // the index finds SOMETHING
    // misses are explicit rows, not dropped queries: one row per query
    assert(rec.length == e.filter(col("vec_id") % 50 === 0).count().toInt, rec.length.toString)
  }

  test("t47: each Gopher quality rule trips its own bit on a planted doc") {
    import graft.pipeline.TextStats
    def doc(tokens: Seq[String]): String = tokens.mkString(" ")
    val fill = (n: Int) => Seq.fill(n)("word")
    val docs = Seq(
      // clean: 50 words, mean 197/50, all alpha, two required words
      (1L, doc(Seq("the", "of") ++ fill(48))),            // kept
      (2L, doc(Seq("the", "of", "word"))),                // bit 0: 3 words < 50
      (3L, doc(Seq("the", "of") ++ Seq.fill(48)("xx"))),  // bit 1: mean 101/50 < 3
      (4L, doc(Seq("the", "of") ++ Seq.fill(48)("ab#c"))),// bit 2: 48 symbols, 480 > 50
      // bit 3: 1 of 2 lines starts with "- " (word count stays >= 50)
      (5L, "- the of " + (fill(46) :+ "word\nplain").mkString(" ") + " line here"),
      // bit 4: both lines end with "..." (2 of 2 > 30%)
      (6L, doc(Seq("the", "of") ++ fill(47) :+ "x...\ny...")),
      (7L, doc(Seq("the", "of") ++ Seq.fill(48)("1234"))),// bit 5: 2 alpha of 50
      (8L, doc(Seq("the") ++ fill(49))),                  // bit 6: only 1 required word
      (9L, doc(Seq.fill(50)("the"))),                     // bit 6: DISTINCT hits, not occurrences
      (10L, "")                                           // empty: bits 0, 1, 5, 6
    ).toDF("doc_id", "text")
    val got = TextStats.gopherQuality(docs, "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("reasons"), r.getAs[Int]("kept")))).toMap
    assert(got(1L) == ((0L, 1)), got.toString)
    assert(got(2L) == ((1L, 0)), got.toString)
    assert(got(3L) == ((2L, 0)), got.toString)
    assert(got(4L) == ((4L, 0)), got.toString)
    assert(got(5L) == ((8L, 0)), got.toString)
    assert(got(6L) == ((16L, 0)), got.toString)
    assert(got(7L) == ((32L, 0)), got.toString)
    assert(got(8L) == ((64L, 0)), got.toString)
    assert(got(9L) == ((64L, 0)), got.toString)
    assert(got(10L) == ((1L + 2L + 32L + 64L, 0)), got.toString)
  }

  test("t45: the distributedRank dispatch branch equals the global-window branch") {
    import graft.pipeline.TextStats
    val docs = Seq(
      (1L, "a b a b c", "ref"), (2L, "a b", "web"), (3L, "c c", "web"),
      (4L, "x y", "web"), (5L, "z", "web")
    ).toDF("doc_id", "text", "source")
    def run(cap: Long) =
      TextStats.ccnetTertiles(docs, "doc_id", "text", "source", refSource = "ref",
        maxGlobalWindowDocs = cap)
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    // cap 0 forces the distributedRank path (the > 2M-docs production branch)
    assert(run(0L).toSeq == run(2000000L).toSeq)
  }

  test("t45: an empty reference source fails loudly instead of scoring everything OOV") {
    import graft.pipeline.TextStats
    val docs = Seq((1L, "a b c", "web")).toDF("doc_id", "text", "source")
    val e = intercept[IllegalArgumentException] {
      TextStats.ccnetTertiles(docs, "doc_id", "text", "source", refSource = "nope")
    }
    assert(e.getMessage.contains("no tokens"), e.getMessage)
  }

  test("d23: the leakage report names the worst offender and keeps clean items clean") {
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),     // bench: both 5-grams leaked
      (20L, "one two three four five six"),             // bench: clean
      (1L, "alpha beta gamma delta epsilon zeta eta"),  // quotes BOTH of item 10's grams
      (2L, "x alpha beta gamma delta epsilon")          // quotes one
    ).toDF("doc_id", "text")
    val got = Dedup.leakageReport(docs, "doc_id", "text", benchmarkMod = 10L, shingleSize = 5)
      .collect().map(r => r.getAs[Long]("bench_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_leaked"), r.getAs[Long]("leak_frac_micro"),
          r.getAs[Long]("n_train_docs"), r.getAs[Long]("worst_train_id"),
          r.getAs[Long]("worst_shared"), r.getAs[Int]("dirty")))).toMap
    assert(got(10L) == ((2L, 2L, 1000000L, 2L, 1L, 2L, 1)), got.toString)
    assert(got(20L) == ((2L, 0L, 0L, 0L, -1L, 0L, 0)), got.toString)
  }

  test("dc14: epoch shuffle conserves membership and mass, permutes order, exactly as planted") {
    // a planted manifest: one source, one pack_group, six docs of 100 symbols
    val manifest = Seq.tabulate(6)(i => (i + 1L, "web", 0L, 100L))
      .toDF("doc_id", "source", "pack_group", "n_syms")
    val roll = Sampling.epochShuffleRollup(manifest, "doc_id", "source",
      epochs = Seq(0L, 1L), budgetTokens = 250L)
      .collect()
      .map(r => (r.getAs[Long]("epoch"), r.getAs[Long]("ebin")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"), r.getAs[Long]("order_check")))
      .toMap

    // mirror: epoch order = md5("id:epoch") hash ascending, bins cut every 250
    // symbols of running EXCLUSIVE total, checksum = sum(ord * (h32(id) % 1e6))
    def mirror(epoch: Long): Map[(Long, Long), (Long, Long, Long)] = {
      val order = (1L to 6L).sortBy(id => (md5h32(s"$id:$epoch"), id)).zipWithIndex
        .map { case (id, i) => (id, i + 1L) }
      order.map { case (id, ord) =>
        val tokBefore = (ord - 1) * 100L
        (id, ord, tokBefore / 250L)
      }.groupBy(_._3).map { case (ebin, rows) =>
        (epoch, ebin) -> (
          rows.size.toLong,
          rows.size * 100L,
          rows.map { case (id, ord, _) => ord * (md5h32(id.toString) % 1000000L) }.sum)
      }
    }
    assert(roll == mirror(0L) ++ mirror(1L), s"got $roll want ${mirror(0L) ++ mirror(1L)}")

    // conservation across epochs: same doc count and symbol mass
    for (e <- Seq(0L, 1L)) {
      val mine = roll.collect { case ((ep, _), v) if ep == e => v }
      assert(mine.map(_._1).sum == 6L && mine.map(_._2).sum == 600L)
    }
    // the permutation is real: the order-sensitive checksums differ between epochs
    val check0 = roll.collect { case ((0L, _), (_, _, c)) => c }.toSeq.sorted
    val check1 = roll.collect { case ((1L, _), (_, _, c)) => c }.toSeq.sorted
    assert(check0 != check1, s"epochs 0 and 1 produced the same order: $check0")
  }

  // ---- t44 calibration ------------------------------------------------------

  test("t44: reliability table spreads bins and matches a sequential mirror on planted docs") {
    import graft.pipeline.TextStats
    // one informative token ("alpha") repeated n times per doc + a constant
    // "w the z" tail (supplies the stopword); a single planted weight on
    // alpha's slot makes margin = n * w exactly, sweeping the sigmoid through
    // several deciles. Docs with n < 8 fall under the 10-token heuristic
    // minimum -> y = 0, the rest y = 1.
    val wAlpha = 150000L
    val docs = (1 to 16).map(n => (n.toLong, ("alpha " * n) + "w the z"))
      .toDF("doc_id", "text")
    val weights = Seq((md5Slot("alpha", 256L), wAlpha)).toDF("slot", "w_micro")
    val got = TextStats.lrCalibration(docs, "doc_id", "text", weights, buckets = 256, nBins = 10)
      .collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pos"),
          r.getAs[Long]("pred_micro"), r.getAs[Long]("actual_micro"), r.getAs[Long]("gap_micro")))
      .toMap
    // sequential mirror of the same arithmetic
    val rows = (1 to 16).map { n =>
      val m = n * wAlpha
      val p = math.floor(1e6 / (1.0 + math.exp(-(m.toDouble / 1e6))) + 0.5).toLong
      val y = if (n + 3 >= 10) 1L else 0L
      (math.min(p / 100000L, 9L), p, y)
    }
    val want = rows.groupBy(_._1).map { case (bin, rs) =>
      val pred = math.floor(rs.map(_._2).sum.toDouble / rs.size + 0.5).toLong
      val act = math.floor(1e6 * rs.map(_._3).sum.toDouble / rs.size + 0.5).toLong
      bin -> (rs.size.toLong, rs.map(_._3).sum, pred, act, pred - act)
    }
    assert(got == want, s"got $got want $want")
    assert(got.size >= 3, s"planted sweep must cover several deciles: ${got.keys.toSeq.sorted}")
  }
}
