package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Similarity}

/** Round-16 pins for the two r15-verdict `weak` items and the r15 ADVICE
  * advisories:
  *
  *   - s41 single-training: `tunedProbeSearch` must pay quantizer training
  *     and PQ code assignment exactly ONCE for the curve AND the actuated
  *     search combined (the previous rendition retrained for the final
  *     search), and the actuated result must still be row-identical to the
  *     standalone trained search at the chosen level — the slice IS the
  *     search.
  *   - d33 no forced broadcast: the cut-ranges join must not be hint-forced
  *     (the ranges relation is corpus-proportional at published duplication
  *     rates; AQE picks the build side).
  *   - bloom width guard: probing a bit set at a different mBits than it was
  *     built with must fail loudly, not silently screen out true duplicates.
  *   - centroidDrift zero-vector rule: zero-norm vectors are excluded from
  *     the current-mean census (the oracle's `dot(v,v) > 0` filter, one
  *     shared rendition).
  */
class RoundSixteenOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("s41: tuned-probe pays ONE quantizer training and ONE code assignment total") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") % 50 === 0)
    Similarity.kmeansTrainInvocations.set(0L)
    Similarity.pqCodeInvocations.set(0L)
    val out = Similarity.tunedProbeSearch(q, e, "vec_id", "embedding", k = 5,
      probeLevels = Seq(1, 2), targetRecallMicro = 400000L, kCells = 8, trainRounds = 1)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(Similarity.kmeansTrainInvocations.get() == 1L,
      s"curve + actuated search must share ONE trained quantizer, " +
        s"got ${Similarity.kmeansTrainInvocations.get()} trainings")
    assert(Similarity.pqCodeInvocations.get() == 1L,
      s"curve + actuated search must share ONE PQ code assignment, " +
        s"got ${Similarity.pqCodeInvocations.get()} passes")
    // the actuated search is a SLICE of the checkpointed curve relation — its
    // plan re-reads the checkpoint, it never re-scans the corpus parquet
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("FileScan"),
      s"the actuated search must slice the checkpointed curve relation, not re-scan:\n$p")
  }

  test("s41: the actuated slice is row-identical to the standalone trained search") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") % 50 === 0)
    val tuned = Similarity.tunedProbeSearch(q, e, "vec_id", "embedding", k = 5,
      probeLevels = Seq(1, 2), targetRecallMicro = 400000L, kCells = 8, trainRounds = 1)
      .collect()
    val chosen = tuned.map(_.getAs[Int]("n_probe")).distinct
    assert(chosen.length == 1, s"one winning level expected, got ${chosen.mkString(",")}")
    val standalone = Similarity.ivfPqTrainedTopK(q, e, "vec_id", "embedding", k = 5,
        kCells = 8, trainRounds = 1, nProbe = chosen.head)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("approx_d2m"), r.getAs[Double]("cos_sim"), r.getAs[Int]("rank")))
      .toSet
    val sliced = tuned
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("approx_d2m"), r.getAs[Double]("cos_sim"), r.getAs[Int]("rank")))
      .toSet
    assert(sliced == standalone,
      s"slice != standalone search at level ${chosen.head}: " +
        s"${sliced.diff(standalone)} vs ${standalone.diff(sliced)}")
  }

  test("s41: an empty query relation fails loudly, not with an opaque empty-max throw") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val ex = intercept[IllegalArgumentException] {
      Similarity.tunedProbeSearch(e.filter(lit(false)), e, "vec_id", "embedding",
        k = 5, probeLevels = Seq(1, 2), kCells = 8, trainRounds = 1)
    }
    assert(ex.getMessage.contains("empty query relation"), ex.getMessage)
  }

  test("d33: the cut-ranges join is not hint-forced — AQE picks the build side") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val cut = Dedup.repeatedSpanCut(d, "doc_id", "text")
    val analyzed = cut.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      s"the ranges relation is corpus-proportional at published duplication rates; " +
        s"the join must not carry a forced-broadcast hint:\n$analyzed")
    // ...and at THIS size AQE still picks a broadcast on its own — the hint
    // was redundant where it was safe and a scale hazard where it wasn't
    cut.collect()
    val p = cut.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"),
      s"AQE should size the small ranges side into a broadcast here:\n$p")
  }

  test("bloom probes refuse a bit set built at a different width") {
    val idx = Dedup.exactHashIndex(
      Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text"), "doc_id", "text")
    val bitsSmall = Dedup.exactBloomBits(idx, mBits = 1 << 10)
    val batch = Seq((10L, "alpha"), (11L, "novel text")).toDF("doc_id", "text")
    val bh = batch.select(col("doc_id"), md5(col("text")).as("text_hash"))
    // the guard is a codegen'd raise_error inside the screen join (zero extra
    // jobs), so the mismatch surfaces at the action, before any verdict
    val ex = intercept[Exception] {
      Dedup.bloomPrefilteredProbeAgainst(bh, "doc_id", idx, bitsSmall, mBits = 1 << 12)
        .collect()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("width mismatch"), s"$ex")
    // matching widths still screen losslessly: the true duplicate survives
    val ok = Dedup.bloomPrefilteredProbeAgainst(bh, "doc_id", idx, bitsSmall, mBits = 1 << 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_of")).toMap
    assert(ok(10L) == 1L && ok(11L) == -1L, ok.toString)
  }

  test("s42: compacted adjacency is row-identical to a fresh build on the survivors") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val tomb = e.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
    val survivors = e.filter(col("vec_id") % 7 =!= 0)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos_sim"), r.getAs[Int]("rank"))
    val compacted = Similarity.compactGraphAnnAdjacency(
        e, tomb, Similarity.knnGraph(e, "vec_id", "embedding", k = 5),
        "vec_id", "embedding", k = 5)
      .collect().map(key).toSet
    val fresh = Similarity.knnGraph(survivors, "vec_id", "embedding", k = 5)
      .collect().map(key).toSet
    assert(compacted.nonEmpty && compacted == fresh,
      s"compact != fresh: only-compact ${compacted.diff(fresh).take(5)}, " +
        s"only-fresh ${fresh.diff(compacted).take(5)}")
  }

  test("s42: a flipped bucket cap (over-cap -> under-cap) still matches the fresh build") {
    // force the cap subtlety: cells sized so deletions flip admission — with
    // maxBucketMembers tiny, several pre-delete cells exceed it and their
    // survivor membership fits, so the incremental path must re-pair those
    // members to stay fresh-equivalent
    val e = spark.read.parquet(s"$dir/embeddings.parquet").limit(300)
      .localCheckpoint(true)
    val tomb = e.filter(col("vec_id") % 3 === 0).select(col("vec_id"))
    val survivors = e.join(tomb, Seq("vec_id"), "left_anti")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos_sim"), r.getAs[Int]("rank"))
    val cap = 20L
    val compacted = Similarity.compactGraphAnnAdjacency(
        e, tomb, Similarity.knnGraph(e, "vec_id", "embedding", k = 5,
          maxBucketMembers = cap),
        "vec_id", "embedding", k = 5, maxBucketMembers = cap)
      .collect().map(key).toSet
    val fresh = Similarity.knnGraph(survivors, "vec_id", "embedding", k = 5,
        maxBucketMembers = cap)
      .collect().map(key).toSet
    assert(compacted == fresh,
      s"cap-flip divergence: only-compact ${compacted.diff(fresh).take(5)}, " +
        s"only-fresh ${fresh.diff(compacted).take(5)}")
  }

  test("dc29: a planted over-represented domain's weight falls; a high-headroom domain's rises") {
    import graft.pipeline.Sampling
    // "ref" trains the reference LM; "dup" is verbatim copies of ref content
    // (the model predicts it perfectly -> no excess loss -> DoReMi downweights,
    // the published behavior on memorized/duplicated domains); "fresh" is
    // out-of-vocabulary text (maximal excess -> upweighted)
    val refText = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    val rows =
      (1L to 8L).map(i => (i, refText, "ref")) ++
        (11L to 18L).map(i => (i, refText, "dup")) ++
        (21L to 28L).map(i => (i, s"zxqv blorp wug${i} flim glorb snib quax vorn trelm dask", "fresh"))
    val df = rows.toDF("doc_id", "text", "source")
    val trail = Sampling.doremiMixWeights(df, "doc_id", "text", "source",
        refSource = "ref", rounds = 4, nBatches = 2,
        etaMicro = 500000L, smoothMicro = 100000L)
      .collect()
    val uniform = 1000000L / 3
    val last = trail.filter(_.getAs[Int]("round") == 4)
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("w_micro")).toMap
    assert(last("dup") < uniform,
      s"the duplicated domain must be downweighted from uniform $uniform: $last")
    assert(last("fresh") > uniform,
      s"the OOV domain must be upweighted from uniform $uniform: $last")
    assert(last("dup") > 0L, s"smoothing must keep every domain revivable: $last")
    // round 0 carries the uniform start for every domain
    val r0 = trail.filter(_.getAs[Int]("round") == 0).map(_.getAs[Long]("w_micro")).distinct
    assert(r0.toSeq == Seq(uniform), r0.mkString(","))
  }

  test("t52: unigram trainer learns the repeated word as a piece; save/load encodes identically") {
    import graft.pipeline.TextStats
    val df = Seq(
      (1L, "banana banana banana bandana"),
      (2L, "banana band and ana"),
      (3L, "nan ban and banana"))
      .toDF("doc_id", "text")
    val vocab = TextStats.unigramTrain(df, "doc_id", "text",
      rounds = 2, maxPieceLen = 5, seedVocab = 40, vocabTarget = 12)
    val rows = vocab.collect()
    val byPiece = rows.map(r => r.getAs[String]("piece") ->
      (r.getAs[Long]("n_uses"), r.getAs[Long]("lp_micro"))).toMap
    // coverage: every corpus character survives as a piece
    assert(Seq("b", "a", "n", "d").forall(byPiece.contains), byPiece.keys.toSeq.sorted.mkString(","))
    // the dominant repeated content wins multi-char slots ("banan"/"anana"-family pieces)
    assert(rows.exists(r => r.getAs[String]("piece").length > 1 && r.getAs[Long]("n_uses") > 0),
      byPiece.toString)
    // Viterbi pricing: banana (6 chars) must segment into fewer pieces than characters
    val enc = TextStats.unigramEncodeWith(df, "doc_id", "text", vocab)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_syms")).toMap
    assert(enc(1L) < "banana banana banana bandana".replace(" ", "").length,
      s"multi-char pieces must compress: $enc")
    // save/load round trip: the reloaded artifact encodes byte-identically
    val scratch = java.nio.file.Files.createTempDirectory("graft-uni-vocab")
    try {
      val path = scratch.toString + "/vocab"
      TextStats.uniSaveVocab(vocab, path)
      val enc2 = TextStats.unigramEncodeWith(df, "doc_id", "text",
          TextStats.uniLoadVocab(spark, path))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_syms")).toMap
      assert(enc2 == enc, s"$enc2 vs $enc")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(scratch.toFile)
    }
  }

  test("s44: smallest-sufficient width wins when the prefix carries the signal; fallback is the max") {
    // all signal in the first 4 dims: the width-4 coarse order IS the exact
    // order, so recall@k = 1 at every width and the smallest must win
    val dims = 16
    val corpus = (1L to 60L).map { i =>
      val head = Array.tabulate(4)(d => math.sin(i.toDouble * (d + 1)) + 2.0)
      (i, head ++ Array.fill(dims - 4)(0.0))
    }.toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") % 10 === 0)
    val tuned = Similarity.tunedPrefixSearch(q, corpus, "vec_id", "embedding",
      k = 3, prefixLevels = Seq(4, 8, 16), targetRecallMicro = 999999L)
    val widths = tuned.select(col("prefix_dims")).distinct().collect().map(_.getInt(0))
    assert(widths.toSeq == Seq(4), s"smallest sufficient width must win: ${widths.mkString(",")}")
    // the actuated slice equals the standalone two-stage search at that width
    val viaRerank = Similarity.rerankTopK(q, corpus, "vec_id", "embedding",
        k = 3, coarseDims = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"))).toSet
    val viaTuned = tuned.collect().map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"))).toSet
    assert(viaTuned == viaRerank,
      s"slice != s11 at width 4: ${viaTuned.diff(viaRerank)} vs ${viaRerank.diff(viaTuned)}")
    // an unreachable target falls back to the largest width
    val fb = Similarity.tunedPrefixSearch(q, corpus, "vec_id", "embedding",
        k = 3, prefixLevels = Seq(4, 8, 16), targetRecallMicro = 1000001L)
      .select(col("prefix_dims")).distinct().collect().map(_.getInt(0))
    assert(fb.toSeq == Seq(16), s"fallback must be the max width: ${fb.mkString(",")}")
  }

  test("dc29/t52: the returned loop artifacts ride checkpoints — zero parquet re-scans") {
    import graft.pipeline.{Sampling, TextStats}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val trail = Sampling.doremiMixWeights(docs, "doc_id", "text", "source",
      refSource = "src0", rounds = 2, nBatches = 2)
    val pTrail = trail.queryExecution.executedPlan.toString
    assert(!pTrail.contains("FileScan"),
      s"the dc29 trajectory must read checkpointed registers, not re-scan the corpus:\n$pTrail")
    val vocab = TextStats.unigramTrain(docs, "doc_id", "text",
      rounds = 1, maxPieceLen = 5, seedVocab = 20, vocabTarget = 10)
    val pVocab = vocab.queryExecution.executedPlan.toString
    assert(!pVocab.contains("FileScan"),
      s"the t52 vocabulary must read checkpointed rounds, not re-scan the corpus:\n$pVocab")
  }

  test("s39: zero-norm vectors are excluded from the current-mean census") {
    val dims = 4
    def vec(xs: Double*) = xs.toArray
    val corpus = Seq(
      (1L, vec(1.0, 0.0, 0.0, 0.0)),
      (2L, vec(0.9, 0.1, 0.0, 0.0)),
      (3L, vec(0.0, 0.0, 0.0, 0.0)) // zero vector: no direction, no census vote
    ).toDF("vec_id", "embedding")
    val model = Similarity.kmeansRounds(
      corpus.filter(col("vec_id") =!= 3L), "vec_id", "embedding", k = 1,
      dims = dims, rounds = 1)
    val drift = Similarity.centroidDrift(corpus, "vec_id", "embedding", model, dims = dims)
      .collect()
    assert(drift.length == 1)
    assert(drift.head.getAs[Long]("n_now") == 2L,
      s"the zero vector must not be censused: ${drift.head}")
  }
}
