package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Similarity}

/** Round-18 pins for the r17 ADVICE advisories:
  *
  *   - loadBloomBits is now symmetric with saveBloomBits: a parquet dir
  *     without the m_bits width stamp is refused at load instead of silently
  *     yielding a width-less relation that reverts to the unguarded probe.
  *   - benchHistory keeps driver-line readings EQUAL to an adjudicated seed
  *     floor (the strict > filter collapsed honest confirmations into the one
  *     appended floor value, thinning the spread future adjudications read).
  *   - loadGraphAnnIndexStamped + the GraphAnnIndex compaction overload make
  *     the dial-agreement guard fire by DEFAULT for lifecycle jobs working
  *     off a stamped artifact — no builtWith threading to forget.
  */
class RoundEighteenOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("loadBloomBits refuses a width-less parquet dir (save/load symmetry)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").limit(20)
      .localCheckpoint(true)
    val index = Dedup.exactHashIndex(docs, "doc_id", "text").localCheckpoint(true)
    val bits = Dedup.exactBloomBits(index, mBits = 1 << 12)
    val scratch = java.nio.file.Files.createTempDirectory("graft-bloom-load")
    try {
      // the sanctioned round trip still works
      Dedup.saveBloomBits(bits, scratch.toString + "/good")
      val loaded = Dedup.loadBloomBits(spark, scratch.toString + "/good")
      assert(loaded.columns.contains("m_bits"))
      // a hand-written stamp-less artifact fails loudly AT LOAD, not later
      bits.select(col("pos")).write.parquet(scratch.toString + "/legacy")
      val ex = intercept[IllegalArgumentException] {
        Dedup.loadBloomBits(spark, scratch.toString + "/legacy")
      }
      assert(ex.getMessage.contains("m_bits"), ex.getMessage)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(scratch.toFile)
    }
  }

  test("benchHistory keeps readings equal to the adjudicated floor as spread evidence") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-eq").toFile
    // one line reading BELOW the floor (lucky — discarded), one EXACTLY ON the
    // floor (honest confirmation — must survive), one above (spread — survives)
    val line =
      """{"metric":"total","queries":{"t25_bpe_encode":1.103},"failed":[],"sf":"x"}"""
    val line2 =
      """{"metric":"total","queries":{"t25_bpe_encode":2.044},"failed":[],"sf":"x"}"""
    val line3 =
      """{"metric":"total","queries":{"t25_bpe_encode":2.566},"failed":[],"sf":"x"}"""
    def write(name: String, tail: String): Unit = {
      val fw = new java.io.FileWriter(new java.io.File(dir, name))
      try fw.write("{\n \"tail\": \"" + tail.replace("\"", "\\\"") + "\"\n}")
      finally fw.close()
    }
    write("BENCH_r97.json", line)
    write("BENCH_r98.json", line2)
    write("BENCH_r99.json", line3)
    val fw = new java.io.FileWriter(new java.io.File(dir, "BENCH_SEED.json"))
    try fw.write("""{"metric":"seed","queries":{"t25_bpe_encode":2.044}}""")
    finally fw.close()
    val hist = Bench.benchHistory(dir, Set("t25_bpe_encode"))
    // seed's own 2.044 + the equal line reading + the above reading; the lucky
    // 1.103 is discarded; no synthetic floor append (a real reading sits on it)
    assert(hist("t25_bpe_encode").sorted == Seq(2.044, 2.044, 2.566), hist.toString)
    assert(hist("t25_bpe_encode").min == 2.044)
  }

  test("s48: the graph-side router sends a starving filter to the exact scan, a broad one to the harvest walk") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 300).localCheckpoint(true)
    val q = e.filter(col("vec_id") % 50 === 0)
    val graph = Similarity.knnGraph(e, "vec_id", "embedding", k = 4).localCheckpoint(true)
    val model = Similarity.kmeansRounds(e, "vec_id", "embedding", k = 4, dims = 64, rounds = 1)
      .localCheckpoint(true)
    def route(allowed: org.apache.spark.sql.DataFrame) =
      Similarity.graphAnnFilteredRouted(q, e, "vec_id", "embedding", graph, model,
        allowed, k = 3, beam = 4, rounds = 2, entryProbe = 2,
        selThresholdMicro = 250000L)
    // the starvation case s47's contract names: |allowed| = 4 of ~300 — even
    // the full harvest pool cannot hold k allowed candidates per query, so the
    // walk would return short; the router must scan the allowed subset exactly
    val tiny = route(e.filter(col("vec_id") % 97 === 0).select(col("vec_id")))
      .localCheckpoint(true)
    assert(tiny.select(col("route")).distinct().collect().map(_.getString(0)).toSeq
      == Seq("exact_allowed_scan"))
    // exact arm: no starvation — every query gets its full k from the allowed
    // subset (a pool-starved walk would return short for most queries)
    assert(tiny.groupBy(col("query_id")).count()
      .filter(col("count") =!= 3L).count() == 0)
    assert(tiny.count() == q.count() * 3)
    // the broad filter (≈half the corpus) must take the s47 harvest walk
    val broad = route(e.filter(col("label") % 2 === 0).select(col("vec_id")))
      .localCheckpoint(true)
    assert(broad.select(col("route")).distinct().collect().map(_.getString(0)).toSeq
      == Seq("graph_harvest"))
    // the selectivity scalar rides every row and matches the half-up formula
    val nCorpus = e.count()
    val nB = e.filter(col("label") % 2 === 0).count()
    val expect = (2L * 1000000L * nB + nCorpus) / (2L * nCorpus)
    assert(broad.select(col("selectivity_micro")).distinct().head.getLong(0) == expect)
    // both arms emit the shared serving schema — a result is attributable
    assert(tiny.columns.toSeq == broad.columns.toSeq)
  }

  test("s49: the recall card reads starvation — harvest < 1.0 and postfilter strictly worse") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint(true)
    val q = e.filter(col("vec_id") % 50 === 0)
    val card = Similarity.filteredGraphAnnRecallCard(q, e, "vec_id", "embedding",
      Similarity.knnGraph(e, "vec_id", "embedding", k = 5),
      Similarity.kmeansRounds(e, "vec_id", "embedding", k = 8, dims = 64, rounds = 1),
      filters = Seq(
        "broad" -> e.filter(col("label") % 3 === 0).select(col("vec_id")),
        "starved" -> e.filter(col("vec_id") % 97 === 0).select(col("vec_id"))),
      k = 5, beam = 8, rounds = 2, entryProbe = 4).localCheckpoint(true)
    // grid completeness: every (filter, method, query) present, misses as 0s
    assert(card.count() == q.count() * 2 * 2)
    // exact hit space (recall·k is an integer at k=5) — a double mean would
    // turn a genuine tie into a summation-order epsilon
    def hitSum(f: String, m: String): Long = card
      .filter(col("filter_name") === f && col("method") === m)
      .agg(sum((col("recall_at_k") * 5.0).cast("long"))).head.getLong(0)
    // the planted starvation case: the harvest arm reads < 1.0 (the pool
    // cannot hold k allowed candidates) and post-filtering reads STRICTLY
    // worse — the measured gap the s48 router's exact arm exists to close
    assert(hitSum("starved", "harvest") < q.count() * 5)
    assert(hitSum("starved", "harvest") > hitSum("starved", "postfilter"),
      s"harvest ${hitSum("starved", "harvest")} !> postfilter ${hitSum("starved", "postfilter")}")
    // domination holds on the broad arm too (≥ — the r17 pin, now per the card)
    assert(hitSum("broad", "harvest") >= hitSum("broad", "postfilter"))
    // the card's harvest arm IS s47's serving result measured: recomputing
    // recall from graphAnnSearchFiltered's own output matches row-for-row
    val allowed = e.filter(col("label") % 3 === 0).select(col("vec_id")).localCheckpoint(true)
    val truth = Similarity.bruteForceTopK(q,
        e.join(allowed, Seq("vec_id"), "left_semi"), "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
    val served = Similarity.graphAnnSearchFiltered(q, e, "vec_id", "embedding",
      Similarity.knnGraph(e, "vec_id", "embedding", k = 5),
      Similarity.kmeansRounds(e, "vec_id", "embedding", k = 8, dims = 64, rounds = 1),
      allowed, k = 5, beam = 8, rounds = 2, entryProbe = 4)
    val recomputed = served.select(col("query_id"), col("neighbor_id"))
      .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    val fromCard = card.filter(col("filter_name") === "broad" && col("method") === "harvest")
      .select(col("query_id"), (col("recall_at_k") * 5.0).cast("long").as("n_hit"))
    assert(fromCard.filter(col("n_hit") > 0)
      .exceptAll(recomputed).isEmpty)
  }

  test("s50: the IVF aged arm trails fresh, the int8 compacted arm ties exactly, and the trigger reads the card") {
    // sf0.01: the arrivals past the cut measurably move the corpus, so the
    // frozen archive codebook trails the fresh retrain AT THE SEARCH SURFACE
    // (sf0.001's arrivals happen to land inside the archive's cells — no gap
    // to read there); the card is 500 vectors, cheap at any sf
    val e01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .localCheckpoint(true)
    val card = Similarity.agedQuantIndexRecallCard(e01, "vec_id", "embedding",
      arrivalCut = 450L, tombstoneMod = 7L, k = 5, queryMod = 50L,
      kCells = 8, trainRounds = 2, overfetch = 4).localCheckpoint(true)
    def micro(s: String, m: String): Long = card
      .filter(col("scenario") === s && col("method") === m)
      .head.getAs[Long]("recall_micro")
    assert(micro("ivf_extend", "exact") == 1000000L)
    assert(micro("int8_compact", "exact") == 1000000L)
    // the append-side gap: the frozen codebook never learned the arrivals
    assert(micro("ivf_extend", "aged") < micro("ivf_extend", "fresh"),
      s"aged ${micro("ivf_extend", "aged")} !< fresh ${micro("ivf_extend", "fresh")}")
    // the compact-side equivalence, measured where it matters
    assert(micro("int8_compact", "compacted") == micro("int8_compact", "fresh"))
    // rebuildTrigger reads this card exactly like s45's (same schema)
    val dec = Similarity.rebuildTrigger(card, scenario = "ivf_extend",
      agedMethod = "aged", maxGapMicro = 10000L)
    assert(dec.rebuild && dec.gapMicro == micro("ivf_extend", "fresh") - micro("ivf_extend", "aged"))
    val hold = Similarity.rebuildTrigger(card, scenario = "int8_compact",
      agedMethod = "compacted", maxGapMicro = 10000L)
    assert(!hold.rebuild && hold.gapMicro == 0L)
    // the equivalence is row-for-row, not just pooled: serving through the
    // delete-compacted artifact returns the identical relation to fresh
    val e = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint(true)
    val survivors = e.filter(col("vec_id") % 7 =!= 0).localCheckpoint(true)
    val q = survivors.filter(col("vec_id") % 50 === 0)
    val tomb = e.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
    val fresh = Similarity.int8TopKWith(q, survivors, "vec_id", "embedding", 5,
      Similarity.int8Quantize(survivors, "vec_id", "embedding"), 4)
    val comp = Similarity.int8TopKWith(q, survivors, "vec_id", "embedding", 5,
      Similarity.deleteFromInt8Index(
        Similarity.int8Quantize(e, "vec_id", "embedding"), tomb, "vec_id"), 4)
    assert(fresh.exceptAll(comp).isEmpty && comp.exceptAll(fresh).isEmpty)
  }

  test("dc34/dc35: a high-value small source out-earns a low-value large one; slots conserve against the joint plan") {
    import spark.implicits._
    import graft.pipeline.{Sampling, TextStats}
    // planted pair: 'small' = 5 docs × 4 tokens (u=20) at weight 0.9;
    // 'big' = 40 docs × 8 tokens (u=320) at weight 0.1; budget 400 tokens.
    // Greedy marginal fill: small's epochs 1..10 (cost 200) all out-rank
    // big's first epoch (0.9·0.8⁹ ≈ 0.121 > 0.1), big's epoch 1 is the
    // boundary slice (frac = 200/320 = 0.625), nothing after it is affordable.
    val docs = ((0L until 5L).map(i => (i, "a b c d", "small")) ++
      (100L until 140L).map(i => (i, "e f g h i j k l", "big")))
      .toDF("doc_id", "text", "source").localCheckpoint(true)
    val weights = Seq(("small", 900000L), ("big", 100000L)).toDF("source", "w_micro")
    val card = Sampling.valueWeightedRepeatCard(docs, "doc_id", "text", "source",
      weights, budgetTokens = 400L, decayMicro = 800000L, maxUsefulEpochs = 16)
      .localCheckpoint(true)
    val bySrc = card.collect().map(r => r.getString(0) -> r).toMap
    assert(bySrc("small").getAs[Long]("epochs_micro") == 10000000L)
    assert(bySrc("big").getAs[Long]("epochs_micro") == 625000L)
    // the reallocation dc32 cannot express: 25× less unique mass, 16× more epochs
    assert(bySrc("small").getAs[Long]("epochs_micro") > bySrc("big").getAs[Long]("epochs_micro"))
    assert(bySrc("small").getAs[String]("verdict") == "more_epochs")
    assert(bySrc("big").getAs[String]("verdict") == "fewer_epochs")
    // the greedy fill spends the budget exactly when nothing is left over
    assert(card.agg(sum(col("raw_tokens"))).head.getLong(0) == 400L)
    assert(card.select(max(col("leftover_tokens"))).head.getLong(0) == 0L)
    // a budget past every useful slice caps at maxUsefulEpochs and reports
    // the worthless excess explicitly
    val capped = Sampling.valueWeightedRepeatCard(docs, "doc_id", "text", "source",
      weights, budgetTokens = 100000L, decayMicro = 800000L, maxUsefulEpochs = 16)
    assert(capped.filter(col("epochs_micro") =!= 16000000L).count() == 0)
    assert(capped.select(max(col("leftover_tokens"))).head.getLong(0) == 100000L - 340L * 16L)
    // an unweighted source fails loudly, not silently zero-allocated
    intercept[Exception] {
      Sampling.valueWeightedRepeatCard(docs, "doc_id", "text", "source",
        weights.filter(col("source") =!= "big"), budgetTokens = 400L).collect()
    }
    // so does a multi-row weight relation (the raw dc29 trail without the
    // final-round filter) — it would fan the slices and double-charge the fill
    intercept[Exception] {
      Sampling.valueWeightedRepeatCard(docs, "doc_id", "text", "source",
        weights.unionByName(weights), budgetTokens = 400L).collect()
    }
    // dc35: slots conserve per source against the JOINT plan's targets
    // (⌊n_docs·epochs⌋ = 50 for small, 25 for big — the dc10 law)
    val scratch = java.nio.file.Files.createTempDirectory("graft-dc35")
    try {
      val path = scratch.toString + "/merges"
      TextStats.bpeSaveMerges(
        TextStats.bpeMergeLoop(docs, "doc_id", "text", rounds = 4), path)
      val rollup = Sampling.valueWeightedRepeatEpoch(docs, "doc_id", "source", "text",
        TextStats.bpeLoadMerges(spark, path), weights,
        budgetTokens = 400L, decayMicro = 800000L, maxUsefulEpochs = 16,
        packTokens = 16L, nGroups = 4).localCheckpoint(true)
      val slots = rollup.groupBy(col("source")).agg(sum(col("n_slots")).as("s"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(slots("small") == 50L, slots.toString)
      assert(slots("big") == 25L, slots.toString)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(scratch.toFile)
    }
  }

  test("ev33: a planted stage order is recovered and the funnel runs over it") {
    import spark.implicits._
    // three users march x → y → z (1s apart); a distractor type w fires
    // BEFORE everything for one user only, so every chain through w loses
    // pairwise evidence to the unanimous x<y<z
    val rows = (1L to 3L).flatMap { u =>
      Seq(
        (u * 10 + 1, java.sql.Timestamp.valueOf(s"2024-01-01 00:00:0$u"), u, "x"),
        (u * 10 + 2, java.sql.Timestamp.valueOf(s"2024-01-01 00:01:0$u"), u, "y"),
        (u * 10 + 3, java.sql.Timestamp.valueOf(s"2024-01-01 00:02:0$u"), u, "z"))
    } :+ ((99L, java.sql.Timestamp.valueOf("2023-12-31 00:00:00"), 1L, "w"))
    val planted = rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-ev33")
    try {
      planted.write.parquet(tmp.toString + "/events.parquet")
      val got = AnalyticsQueries.precedenceFunnel(spark, tmp.toString)
        .orderBy(col("step")).collect()
      // the chain is recovered: x, y, z at steps 1..3, score = 3 users × 3 pairs
      assert(got.map(_.getString(1)).toSeq == Seq("x", "y", "z"), got.mkString("; "))
      assert(got.forall(_.getAs[Long]("score") == 9L))
      // the ev19 funnel over the chosen chain: all 3 users clear every step,
      // each stage gap is exactly 60 s per user
      assert(got.map(_.getAs[Long]("n_users")).toSeq == Seq(3L, 3L, 3L))
      assert(got(0).getAs[Long]("sum_gap_us") == 0L)
      assert(got(1).getAs[Long]("sum_gap_us") == 3L * 60000000L)
      assert(got(2).getAs[Long]("sum_gap_us") == 3L * 60000000L)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp.toFile)
    }
  }

  test("t54/t56 strict-shared-basis flag aligns the fertility bases on a pipe-heavy corpus") {
    import spark.implicits._
    import graft.pipeline.TextStats
    // every doc carries pipe tokens: BPE's basis drops them, default unigram's keeps them
    val pipey = (0L until 20L)
      .map(i => (i, "alpha|beta gamma delta|eps plain words here"))
      .toDF("doc_id", "text").localCheckpoint(true)
    def basis(card: org.apache.spark.sql.DataFrame): Map[String, Long] = card
      .collect().map(r => r.getAs[String]("tokenizer") -> r.getAs[Long]("n_tokens")).toMap
    val loose = basis(TextStats.tokenizerCompareCard(pipey, "doc_id", "text"))
    // the r17-flagged asymmetry is real: divergent token bases by default
    assert(loose("bpe") != loose("unigram"), loose.toString)
    val strict = basis(TextStats.tokenizerCompareCard(pipey, "doc_id", "text",
      strictSharedBasis = true))
    // under the flag both families price the SAME token set
    assert(strict("bpe") == strict("unigram"), strict.toString)
    assert(strict("bpe") == loose("bpe")) // the BPE basis itself is untouched
    // default-off means t53's published semantics are unchanged: the flagless
    // card is bit-identical to pre-flag behavior (the unigram basis keeps pipes)
    assert(loose("unigram") > loose("bpe"))
    // the actuated epoch accepts the same flag and its arms share the basis
    val epoch = TextStats.tokenizerSwapEpoch(pipey, "doc_id", "text",
      strictSharedBasis = true).localCheckpoint(true)
    assert(epoch.select(col("action")).distinct().count() == 1)
    assert(epoch.count() == 20L)
  }

  test("d43: the cross-snapshot share picks the policy and the kept set matches the census") {
    import spark.implicits._
    import graft.pipeline.Dedup
    // heavy cross-snapshot duplication: the same boilerplate in both sources —
    // global dedup would discard s2's copy (share 3/10 = 30% ≥ 10%)
    val heavy = Seq(
      (1L, "shared boilerplate row", "s1"),
      (2L, "unique one", "s1"),
      (3L, "shared boilerplate row", "s2"),
      (4L, "unique two", "s2")).toDF("doc_id", "text", "source").localCheckpoint(true)
    val keptH = Dedup.snapshotPolicyApply(heavy, "doc_id", "text", "source",
      keepShareThresholdMicro = 100000L).localCheckpoint(true)
    assert(keptH.select(col("policy")).distinct().head.getString(0) == "per_snapshot")
    assert(keptH.select(col("cross_share_micro")).distinct().head.getLong(0) == 300000L)
    // per-snapshot keeps every source's own copy — all four docs survive
    assert(keptH.count() == 4L)
    // the applied set agrees with the d42 census, per source
    val census = Dedup.snapshotDedupCensus(heavy, "doc_id", "text", "source")
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("kept_snapshot")).toMap
    val applied = keptH.groupBy(col("source")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(applied == census, s"$applied vs $census")
    // only WITHIN-source duplication: both policies keep the same set, the
    // share reads 0, and the stronger global pass wins
    val clean = Seq(
      (1L, "a b", "s1"), (2L, "c d", "s2"), (3L, "a b", "s1"))
      .toDF("doc_id", "text", "source")
    val keptC = Dedup.snapshotPolicyApply(clean, "doc_id", "text", "source",
      keepShareThresholdMicro = 100000L).localCheckpoint(true)
    assert(keptC.select(col("policy")).distinct().head.getString(0) == "global")
    assert(keptC.select(col("cross_share_micro")).distinct().head.getLong(0) == 0L)
    assert(keptC.select(col("doc_id")).collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("s51: the routed arm reads what s48 buys — max recall on the starved filter, the walk on the broad one") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint(true)
    val q = e.filter(col("vec_id") % 50 === 0)
    val card = Similarity.filteredGraphAnnRecallCard(q, e, "vec_id", "embedding",
      Similarity.knnGraph(e, "vec_id", "embedding", k = 5),
      Similarity.kmeansRounds(e, "vec_id", "embedding", k = 8, dims = 64, rounds = 1),
      filters = Seq(
        "broad" -> e.filter(col("label") % 3 === 0).select(col("vec_id")),
        "starved" -> e.filter(col("vec_id") % 97 === 0).select(col("vec_id"))),
      k = 5, beam = 8, rounds = 2, entryProbe = 4,
      routedThresholdMicro = Some(250000L)).localCheckpoint(true)
    assert(card.count() == q.count() * 3 * 2) // three methods now
    def rows(f: String, m: String): Map[Long, Double] = card
      .filter(col("filter_name") === f && col("method") === m)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("recall_at_k")).toMap
    // the starving filter's routed arm is the exact scan: with ≥ k+1 allowed
    // ids it reads FULL recall where the walk starved at ~0.1
    assert(rows("starved", "routed").values.forall(_ == 1.0), rows("starved", "routed").toString)
    // routed dominates harvest per query on BOTH filters (exact ≥ walk;
    // broad routed IS the walk)
    for (f <- Seq("broad", "starved")) {
      val (r, h) = (rows(f, "routed"), rows(f, "harvest"))
      assert(r.forall { case (qid, v) => v >= h(qid) }, s"$f: $r vs $h")
    }
    assert(rows("broad", "routed") == rows("broad", "harvest"))
  }

  test("a stamped loaded index compacts guarded by default (no builtWith threading)") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 120).localCheckpoint(true)
    val dials = Similarity.GraphAnnDials(
      k = 4, nTables = 2, planesPerTable = 6, dims = 64, maxBucketMembers = 10000L)
    val graph = Similarity.knnGraph(e, "vec_id", "embedding", k = dials.k)
      .localCheckpoint(true)
    val scratch = java.nio.file.Files.createTempDirectory("graft-ann-stamped")
    try {
      val path = scratch.toString + "/index"
      val model = Similarity.kmeansRounds(e, "vec_id", "embedding",
        k = 4, dims = 64, rounds = 1)
      Similarity.saveGraphAnnIndex(graph, model,
        Similarity.graphAnnEntryPoints(e, "vec_id", "embedding", model),
        path, dials, nFiles = 2)
      val idx = Similarity.loadGraphAnnIndexStamped(spark, path)
      assert(idx.dials.contains(dials))
      val tomb = e.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
      // wrong k against the loaded artifact: refused WITHOUT any opt-in
      intercept[IllegalArgumentException] {
        Similarity.compactGraphAnnAdjacency(e, tomb, idx, "vec_id", "embedding",
          k = 5, nTables = 2, planesPerTable = 6, dims = 64, maxBucketMembers = 10000L)
      }
      // at the build dials the overload is transparent: identical adjacency to
      // the direct call on the loaded adj
      val viaIndex = Similarity.compactGraphAnnAdjacency(e, tomb, idx,
        "vec_id", "embedding", k = dials.k, nTables = dials.nTables,
        planesPerTable = dials.planesPerTable, dims = dials.dims,
        maxBucketMembers = dials.maxBucketMembers)
      val direct = Similarity.compactGraphAnnAdjacency(e, tomb, idx.adj,
        "vec_id", "embedding", k = dials.k)
      assert(viaIndex.exceptAll(direct).isEmpty && direct.exceptAll(viaIndex).isEmpty)
      // a legacy stamp-less artifact loads with dials = None and compacts
      // unguarded, exactly as before the stamp existed
      val legacy = scratch.toString + "/legacy"
      Similarity.saveGraphAnnIndex(graph, model,
        Similarity.graphAnnEntryPoints(e, "vec_id", "embedding", model), legacy)
      val legacyIdx = Similarity.loadGraphAnnIndexStamped(spark, legacy)
      assert(legacyIdx.dials.isEmpty)
      val unguarded = Similarity.compactGraphAnnAdjacency(e, tomb, legacyIdx,
        "vec_id", "embedding", k = 5, nTables = 2, planesPerTable = 6,
        dims = 64, maxBucketMembers = 10000L)
      assert(unguarded.columns.contains("neighbor_id"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(scratch.toFile)
    }
  }
}
