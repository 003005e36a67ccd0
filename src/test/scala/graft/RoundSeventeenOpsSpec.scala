package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Sampling, Similarity, TextStats}

/** Round-17 pins for the r16 ADVICE advisories:
  *
  *   - doremiMixWeights dial bounds: etaMicro outside (0, 1e8] is rejected at
  *     construction (a huge eta with smoothMicro = 0 can zero every register
  *     and make the normalization DIV emit silently-propagating NULLs).
  *   - bloom bit-set artifact: saveBloomBits/loadBloomBits round-trips the
  *     m_bits width stamp bit-exactly, so the width guard keeps firing on a
  *     reloaded relation; a hand-rolled width-less persist is refused.
  *   - graph-ANN dial stamp: the saved index carries its build dials, and
  *     compaction at mismatched dials fails loudly instead of quietly
  *     diverging from the fresh-build equivalence.
  */
class RoundSeventeenOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("dc29: etaMicro dial bounds are enforced at construction") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    intercept[IllegalArgumentException] {
      Sampling.doremiMixWeights(docs, "doc_id", "text", "source",
        refSource = "web", etaMicro = 0L)
    }
    intercept[IllegalArgumentException] {
      Sampling.doremiMixWeights(docs, "doc_id", "text", "source",
        refSource = "web", etaMicro = 100000001L)
    }
  }

  test("d37: bloom bit-set artifact round-trips its width stamp and keeps the guard live") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").limit(40)
      .localCheckpoint(true)
    val index = Dedup.exactHashIndex(docs, "doc_id", "text").localCheckpoint(true)
    val bits = Dedup.exactBloomBits(index, mBits = 1 << 12)
    val scratch = java.nio.file.Files.createTempDirectory("graft-bloom-bits")
    try {
      val path = scratch.toString + "/bits"
      Dedup.saveBloomBits(bits, path)
      val loaded = Dedup.loadBloomBits(spark, path).localCheckpoint(true)
      // the stamp survives the round trip bit-exactly
      assert(loaded.columns.contains("m_bits"))
      assert(loaded.select(max(col("m_bits"))).head.getLong(0) == (1L << 12))
      assert(loaded.count() == bits.count())
      // the guard still fires on the RELOADED relation: probing at a different
      // width must fail loudly, not silently screen out true duplicates
      val batchHashes = docs
        .select((col("doc_id") + 1000000L).as("doc_id"), md5(col("text")).as("text_hash"))
      val probedOk = Dedup.bloomPrefilteredProbeAgainst(batchHashes, "doc_id",
        index, loaded, mBits = 1 << 12)
      assert(probedOk.count() == batchHashes.count())
      // every batch row duplicates an indexed document, so all must resolve
      assert(probedOk.filter(col("dup_of") === -1L).count() == 0)
      val ex = intercept[Exception] {
        Dedup.bloomPrefilteredProbeAgainst(batchHashes, "doc_id",
          index, loaded, mBits = 1 << 13).count()
      }
      assert(ex.getMessage != null)
      // a width-less hand persist is refused at save time
      intercept[IllegalArgumentException] {
        Dedup.saveBloomBits(bits.select(col("pos")), scratch.toString + "/bad")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(scratch.toFile)
    }
  }

  test("t56: a long-word corpus swaps to unigram; a unit-word corpus blocks; pipes hold") {
    // 12-char words: 4 global BPE merges leave ≥ 6 pieces/word, unigram's
    // 5-char pieces cover each word in 3 — the challenger clears the margin
    val uniWins = (0L until 30L).map(i => (i, "weatherproof unbelievable weatherproof"))
      .toDF("doc_id", "text")
    val swap = TextStats.tokenizerSwapEpoch(uniWins, "doc_id", "text",
      bpeRounds = 4, uniRounds = 1, maxPieceLen = 5, seedVocab = 60, vocabTarget = 25)
    val swapRows = swap.select(col("tokenizer"), col("action")).distinct().collect()
    assert(swapRows.map(r => (r.getString(0), r.getString(1))).toSet == Set(("unigram", "swap")),
      swapRows.mkString(", "))
    // single-char words: both families price 1 piece/token — a tie keeps the
    // incumbent (a swap needs affirmative evidence past the margin)
    val tie = (0L until 20L).map(i => (i, "a b c a b c")).toDF("doc_id", "text")
    val block = TextStats.tokenizerSwapEpoch(tie, "doc_id", "text",
      bpeRounds = 4, uniRounds = 1, maxPieceLen = 5, seedVocab = 60, vocabTarget = 25)
    val blockRows = block.select(col("tokenizer"), col("action")).distinct().collect()
    assert(blockRows.map(r => (r.getString(0), r.getString(1))).toSet == Set(("bpe", "block")),
      blockRows.mkString(", "))
    // pipe-only corpus: the BPE basis excludes every token (its separator
    // encoding), zero scored tokens is NO EVIDENCE — hold, incumbent serves
    val pipes = (0L until 5L).map(i => (i, "||| |||")).toDF("doc_id", "text")
    val dec = TextStats.tokenizerSwapTrigger(
      TextStats.tokenizerCompareCard(pipes, "doc_id", "text",
        bpeRounds = 4, uniRounds = 1, maxPieceLen = 5, seedVocab = 60, vocabTarget = 25))
    assert(dec.action == "hold" && dec.chosen == "bpe", dec.toString)
  }

  test("t56: the gated union equals the standalone pricing of the chosen family") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").limit(60).localCheckpoint(true)
    val epoch = TextStats.tokenizerSwapEpoch(docs, "doc_id", "text",
      bpeRounds = 2, uniRounds = 1, maxPieceLen = 4, seedVocab = 40, vocabTarget = 20)
      .localCheckpoint(true)
    val families = epoch.select(col("tokenizer")).distinct().collect().map(_.getString(0))
    assert(families.length == 1, s"mixed families served: ${families.mkString(",")}")
    val served = epoch.select(col("doc_id"), col("n_tokens"), col("n_chars"), col("n_syms"))
    val standalone =
      if (families.head == "bpe") TextStats.bpeEncode(docs, "doc_id", "text", rounds = 2)
      else TextStats.unigramEncodeWith(docs, "doc_id", "text",
        TextStats.unigramTrain(docs, "doc_id", "text",
          rounds = 1, maxPieceLen = 4, seedVocab = 40, vocabTarget = 20),
        maxPieceLen = 4)
    assert(served.exceptAll(standalone).isEmpty && standalone.exceptAll(served).isEmpty)
  }

  test("dc31: learned weights flow to packs with slot conservation against the dc30 plan") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 10 =!= 0).localCheckpoint(true)
    val merges = TextStats.bpeMergeLoop(docs, "doc_id", "text", rounds = 2)
      .localCheckpoint(true)
    val plan = Sampling.doremiMixPlan(docs, "doc_id", "text", "source",
        refSource = "src1", budgetDocs = 600L, rounds = 2, nBatches = 2)
      .localCheckpoint(true)
    val packs = Sampling.epochPackDoremi(docs, "doc_id", "source", "text", merges,
        refSource = "src1", budgetDocs = 600L, rounds = 2, nBatches = 2,
        budgetTokens = 256L, nGroups = 4)
      .localCheckpoint(true)
    // per source, the packs' slot mass equals the learned plan's target
    // (exhausted sources cap at n_docs — the mixExecuteUpsampled law lifts
    // that cap via repeat factors, so equality is exact)
    val slots = packs.groupBy(col("source")).agg(sum(col("n_slots")).as("slots"))
    val diff = plan.join(slots, Seq("source"), "left")
      .filter(coalesce(col("slots"), lit(0L)) =!= col("target_docs"))
      .collect()
    assert(diff.isEmpty, diff.mkString("\n"))
    // and at least one source is genuinely upsampled (slots > docs) so the
    // conservation law is exercised on the repeat path, not vacuously
    val upsampled = plan.filter(col("target_docs") > col("n_docs")).count()
    assert(upsampled > 0, "plan exercised no upsampling — weaken the budget split")
  }

  test("s45: a planted arrival cluster makes the extended index measurably trail fresh") {
    // archive (ids 0..59): vectors living in dims 0..9; arrivals (ids 100..119):
    // a tight new cluster on dim 40 the archive never saw — the distribution
    // shift that ages an entry layer. Queries (id % 20 == 0) include archive
    // members AND the arrival 100/120: an arrival query's true top-k are other
    // arrivals, but the extended index's entry medoids come from the ARCHIVE
    // codebook, so its beam starts orthogonal to the answer; the fresh rebuild
    // gives the arrival cluster its own cell and medoid.
    def vec(active: Seq[(Int, Double)]): Seq[Float] = {
      val a = Array.fill(64)(0.0f)
      active.foreach { case (i, x) => a(i) = x.toFloat }
      a.toSeq
    }
    val archive = (0 until 60).map { i =>
      (i.toLong, vec(Seq((i % 10, 1.0), ((i % 10 + 1) % 10, 0.2 + 0.01 * (i / 10)))))
    }
    val arrivals = (0 until 20).map { i =>
      (100L + i, vec(Seq((40, 1.0), (41, 0.05 + 0.002 * i))))
    }
    val e = (archive ++ arrivals).toDF("vec_id", "embedding").localCheckpoint(true)
    val card = Similarity.agedIndexRecallCard(e, "vec_id", "embedding",
        arrivalCut = 100L, tombstoneMod = 7L, k = 5, queryMod = 20L,
        graphK = 4, cells = 8, trainRounds = 1, beam = 4, rounds = 2, entryProbe = 2)
      .localCheckpoint(true)
    val byArm = card.collect()
      .map(r => (r.getAs[String]("scenario"), r.getAs[String]("method")) ->
        r.getAs[Long]("recall_micro")).toMap
    // the staleness is MEASURED: extension trails its fresh rebuild
    assert(byArm(("extend", "extended")) < byArm(("extend", "fresh")),
      s"extended ${byArm(("extend", "extended"))} !< fresh ${byArm(("extend", "fresh"))}")
    // and delete-compaction costs exactly nothing (s42's theorem, at the
    // search surface, in the same card)
    assert(byArm(("compact", "compacted")) == byArm(("compact", "fresh")), byArm.toString)
    val hits = card.filter(col("scenario") === "compact").collect()
      .map(r => r.getAs[String]("method") -> r.getAs[Long]("n_hits")).toMap
    assert(hits("compacted") == hits("fresh"), hits.toString)
    // s46 closes the loop: the planted staleness trips the rebuild trigger,
    // the compaction scenario holds, and an unmeasured card is "no evidence"
    val ext = Similarity.rebuildTrigger(card, "extend", "extended", maxGapMicro = 10000L)
    assert(ext.rebuild && ext.gapMicro > 10000L, ext.toString)
    val comp = Similarity.rebuildTrigger(card, "compact", "compacted")
    assert(!comp.rebuild && comp.gapMicro == 0L, comp.toString)
    val empty = Seq(("extend", "fresh", 0L, 0L, 0L), ("extend", "extended", 0L, 0L, 0L))
      .toDF("scenario", "method", "n_queries", "n_hits", "recall_micro")
    val dec = Similarity.rebuildTrigger(empty, "extend", "extended")
    assert(!dec.rebuild && dec.reason.contains("no evidence"), dec.toString)
  }

  test("d42: planted cross-snapshot duplicate separates the two dedup policies exactly") {
    // A holds X (id 0) and Y twice (1, 2); B holds the SAME X (10) and a
    // unique Z (11). Global keeps {0, 1, 11}; per-snapshot keeps {0, 1, 10, 11}
    // — B's X copy is exactly the cross-snapshot mass the policies disagree on.
    val docs = Seq(
      (0L, "A", "x x x"), (1L, "A", "y y"), (2L, "A", "y y"),
      (10L, "B", "x x x"), (11L, "B", "z"))
      .toDF("doc_id", "source", "text")
    val census = graft.pipeline.Dedup.snapshotDedupCensus(docs, "doc_id", "text", "source")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val a = census("A")
    assert(a.getAs[Long]("n_docs") == 3 && a.getAs[Long]("n_tokens") == 7)
    assert(a.getAs[Long]("kept_global") == 2 && a.getAs[Long]("kept_snapshot") == 2)
    assert(a.getAs[Long]("cross_dup_docs") == 0 && a.getAs[Long]("cross_dup_tokens") == 0)
    val b = census("B")
    assert(b.getAs[Long]("kept_global") == 1 && b.getAs[Long]("tokens_global") == 1)
    assert(b.getAs[Long]("kept_snapshot") == 2 && b.getAs[Long]("tokens_snapshot") == 4)
    assert(b.getAs[Long]("cross_dup_docs") == 1 && b.getAs[Long]("cross_dup_tokens") == 3)
  }

  test("dc32: the three budget regimes and the repeated-value laws") {
    // 2 sources × 10 tokens = 20 unique tokens total
    val docs = (0L until 4L).map(i =>
      (i, if (i % 2 == 0) "s0" else "s1", "t1 t2 t3 t4 t5"))
      .toDF("doc_id", "source", "text")
    def card(budget: Long) = Sampling.repeatBudgetCard(docs, "doc_id", "text", "source",
      budgetTokens = budget, decayMicro = 500000L, maxUsefulEpochs = 4)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // budget 10 over 20 unique: half an epoch — fresh, no discount
    val fresh = card(10L)("s0")
    assert(fresh.getAs[String]("verdict") == "fresh", fresh.toString)
    assert(fresh.getAs[Long]("epochs_micro") == 500000L)
    // half an epoch at decay 0.5: first epoch is full value — effective == raw
    assert(fresh.getAs[Long]("effective_tokens") == fresh.getAs[Long]("raw_tokens"))
    assert(fresh.getAs[Long]("excess_tokens") == 0L)
    // budget 50 over 20: 2.5 epochs — repeat regime, repeats discounted:
    // mult = 1 + 0.5 + 0.5·0.25 = 1.625 vs 2.5 raw
    val rep = card(50L)("s1")
    assert(rep.getAs[String]("verdict") == "repeat", rep.toString)
    assert(rep.getAs[Long]("epochs_micro") == 2500000L)
    assert(rep.getAs[Long]("raw_tokens") == 25L)
    assert(rep.getAs[Long]("effective_tokens") == 16L, // floor(10 · 1.625)
      rep.toString)
    assert(rep.getAs[Long]("value_ratio_micro") < 1000000L)
    // budget 200 over 20: 10 epochs > cap 4 — data-constrained, the excess
    // priced explicitly
    val con = card(200L)("s0")
    assert(con.getAs[String]("verdict") == "data_constrained", con.toString)
    assert(con.getAs[Long]("epochs_micro") == 4000000L)
    assert(con.getAs[Long]("excess_tokens") == 60L) // (10·(10−4)·1e6)/1e6
    // law: effective never exceeds raw
    Seq(10L, 50L, 200L).foreach { b =>
      card(b).values.foreach { r =>
        assert(r.getAs[Long]("effective_tokens") <= r.getAs[Long]("raw_tokens"), r.toString)
      }
    }
  }

  test("dc33: the repeat budget flows to packs — slots equal floor(n_docs · epochs) per source") {
    // 4 docs × 5 tokens = 20 unique; budget 50 → epochs 2.5 (fractional, > 1,
    // so BOTH halves of the dc10 repeat law are exercised: base repeats + the
    // +1 hash-order prefix)
    val docs = (0L until 4L).map(i => (i, if (i % 2 == 0) "s0" else "s1", "t1 t2 t3 t4 t5"))
      .toDF("doc_id", "source", "text").localCheckpoint(true)
    val merges = TextStats.bpeMergeLoop(docs, "doc_id", "text", rounds = 1)
    val card = Sampling.repeatBudgetCard(docs, "doc_id", "text", "source",
      budgetTokens = 50L, decayMicro = 500000L, maxUsefulEpochs = 4)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("epochs_micro"))).toMap
    assert(card.values.forall { case (_, e) => e == 2500000L }, card.toString)
    val packs = Sampling.repeatBudgetEpoch(docs, "doc_id", "source", "text", merges,
      budgetTokens = 50L, decayMicro = 500000L, maxUsefulEpochs = 4,
      packTokens = 8L, nGroups = 2)
    val slots = packs.groupBy(col("source")).agg(sum(col("n_slots")).as("slots"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("slots")).toMap
    card.foreach { case (s, (n, e)) =>
      assert(slots(s) == n * e / 1000000L, s"$s: slots ${slots(s)} != floor(${n}·${e}µ)")
    }
  }

  test("s47: filtered walk dominates post-filtering a plain search; results all pass the predicate") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint(true)
    val queries = e.filter(col("vec_id") % 50 === 0)
    val allowed = e.filter(col("label") % 2 === 0).select(col("vec_id")).localCheckpoint(true)
    val graph = Similarity.knnGraph(e, "vec_id", "embedding", k = 5).localCheckpoint(true)
    val model = Similarity.kmeansRounds(e, "vec_id", "embedding", k = 8, dims = 64, rounds = 1)
    val filtered = Similarity.graphAnnSearchFiltered(queries, e, "vec_id", "embedding",
      graph, model, allowed, k = 5, beam = 8, rounds = 2, entryProbe = 4)
      .localCheckpoint(true)
    // every reported neighbor passes the predicate
    assert(filtered.join(allowed.withColumnRenamed("vec_id", "neighbor_id"),
      Seq("neighbor_id"), "left_anti").count() == 0)
    // domination: against the brute-force truth UNDER THE PREDICATE, the
    // harvest pool hits at least as often as post-filtering the plain top-k
    val truth = Similarity.bruteForceTopK(queries,
        e.join(allowed, Seq("vec_id"), "left_semi"), "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
    val plainPost = Similarity.graphAnnSearch(queries, e, "vec_id", "embedding",
        graph, model, k = 5, beam = 8, rounds = 2, entryProbe = 4)
      .join(allowed.withColumnRenamed("vec_id", "neighbor_id"), Seq("neighbor_id"), "left_semi")
      .select(col("query_id"), col("neighbor_id"))
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.join(truth, Seq("query_id", "neighbor_id"), "left_semi").count()
    val (hf, hp) = (hits(filtered.select(col("query_id"), col("neighbor_id"))), hits(plainPost))
    assert(hf >= hp, s"filtered hits $hf < post-filtered plain hits $hp")
    assert(hf > 0, "filtered search found nothing — dial problem in the pin")
  }

  test("ev32: precedence is antisymmetric and a planted order reads exactly") {
    val prec = AnalyticsQueries.typePrecedence(spark, dir).localCheckpoint(true)
    // precede(a,b) + precede(b,a) == n_both for every pair (strict total order
    // on (tsu, event_id) — no pair can tie)
    val sym = prec.as("x").join(prec.as("y"),
      col("x.from_type") === col("y.to_type") && col("x.to_type") === col("y.from_type"))
    assert(sym.filter(col("x.n_both") =!= col("y.n_both")).count() == 0)
    assert(sym.filter(col("x.n_precede") + col("y.n_precede") =!= col("x.n_both")).count() == 0)
    // planted: one user sees a->b->a, another b only; among both-type users
    // (just user 1), a's FIRST precedes b's
    import org.apache.spark.sql.types._
    val planted = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 1L, "a"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 1L, "b"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 1L, "a"),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 2L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val tmp = java.nio.file.Files.createTempDirectory("graft-ev32")
    try {
      planted.withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
        .write.parquet(tmp.toString + "/events.parquet")
      val got = AnalyticsQueries.typePrecedence(spark, tmp.toString).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getAs[Long]("n_both"), r.getAs[Long]("n_precede"))).toMap
      assert(got(("a", "b")) == ((1L, 1L)) && got(("b", "a")) == ((1L, 0L)), got.toString)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp.toFile)
    }
  }

  test("s42: compaction at mismatched build dials fails loudly; stamp round-trips") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 120).localCheckpoint(true)
    val dials = Similarity.GraphAnnDials(
      k = 4, nTables = 2, planesPerTable = 6, dims = 64, maxBucketMembers = 10000L)
    val graph = Similarity.knnGraph(e, "vec_id", "embedding", k = dials.k)
      .localCheckpoint(true)
    val scratch = java.nio.file.Files.createTempDirectory("graft-ann-dials")
    try {
      val path = scratch.toString + "/index"
      val model = Similarity.kmeansRounds(e, "vec_id", "embedding",
        k = 4, dims = 64, rounds = 1)
      Similarity.saveGraphAnnIndex(graph, model,
        Similarity.graphAnnEntryPoints(e, "vec_id", "embedding", model),
        path, dials, nFiles = 2)
      // the stamp round-trips exactly
      assert(Similarity.loadGraphAnnDials(spark, path).contains(dials))
      // a legacy artifact (no dials/) reads None
      val legacy = scratch.toString + "/legacy"
      Similarity.saveGraphAnnIndex(graph, model,
        Similarity.graphAnnEntryPoints(e, "vec_id", "embedding", model), legacy)
      assert(Similarity.loadGraphAnnDials(spark, legacy).isEmpty)
      val tomb = e.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
      // mismatched k: refused before any work
      intercept[IllegalArgumentException] {
        Similarity.compactGraphAnnAdjacency(e, tomb, graph, "vec_id", "embedding",
          k = 5, builtWith = Some(dials))
      }
      // matching dials: the guard is transparent — identical to the unchecked call
      val checked = Similarity.compactGraphAnnAdjacency(e, tomb, graph,
        "vec_id", "embedding", k = dials.k, builtWith = Some(dials))
      val unchecked = Similarity.compactGraphAnnAdjacency(e, tomb, graph,
        "vec_id", "embedding", k = dials.k)
      assert(checked.exceptAll(unchecked).isEmpty && unchecked.exceptAll(checked).isEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(scratch.toFile)
    }
  }
}
