package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Layout, Multimodal, Sampling, Similarity, Sketches, TextStats}

/** text statistics / LM / tokenization / sampling operators (t*): this family's slice of [[SparkEntry.queries]] and
  * [[SparkEntry.oracleSql]] — the driver contract is unchanged, SparkEntry
  * concatenates the families. Shared pinned parameters and SQL fragments come
  * from [[OracleFragments]].
  */
private[graft] object TextOracles extends OracleFragments {

  val queries: Map[String, Q] = Map[String, Q](
    "t01_lang_id" -> ((s: SparkSession, dir: String) =>
      TextStats.langId(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", Some("lang"))),
    "t51_langid_eval" -> ((s: SparkSession, dir: String) =>
      TextStats.langIdEval(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", "lang")),
    "t02_quality_score" -> ((s: SparkSession, dir: String) =>
      TextStats.qualityScore(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    "t03_token_stats" -> ((s: SparkSession, dir: String) =>
      TextStats.tokenStats(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    "t04_fingerprint" -> ((s: SparkSession, dir: String) =>
      TextStats.fingerprint(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    "t05_quality_filter" -> ((s: SparkSession, dir: String) =>
      TextStats.qualityFilter(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    "t06_corpus_stats" -> ((s: SparkSession, dir: String) =>
      TextStats.corpusStats(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", "lang", "source")),
    "t10_repetition" -> ((s: SparkSession, dir: String) =>
      TextStats.repetitionStats(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    "t11_vocabulary" -> ((s: SparkSession, dir: String) =>
      TextStats.vocabulary(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", k = 50)),
    "t12_pii_redact" -> ((s: SparkSession, dir: String) =>
      TextStats.piiRedact(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    "t13_chunk" -> ((s: SparkSession, dir: String) =>
      TextStats.chunk(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", chunkTokens = 64)),
    "t15_vocab_coverage" -> ((s: SparkSession, dir: String) =>
      TextStats.vocabCoverage(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", k = 20)),
    "t16_source_novelty" -> ((s: SparkSession, dir: String) =>
      Dedup.sourceNovelty(s.read.parquet(s"$dir/documents.parquet"), "source", "text")),
    "t17_length_quantiles" -> ((s: SparkSession, dir: String) =>
      TextStats.lengthQuantiles(s.read.parquet(s"$dir/documents.parquet"), "source", "text")),
    "t18_tfidf_top" -> ((s: SparkSession, dir: String) =>
      TextStats.tfIdfTop(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", k = 3)),
    "t19_char_classes" -> ((s: SparkSession, dir: String) =>
      TextStats.charClassProfile(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    // --- training-data pipeline: deterministic sampling / splits / composition ---
    "t07_hash_split" -> ((s: SparkSession, dir: String) =>
      Sampling.hashSplit(s.read.parquet(s"$dir/documents.parquet"), "doc_id")),
    "t08_corpus_mix" -> ((s: SparkSession, dir: String) =>
      Sampling.weightedMix(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "source",
        Map("src0" -> 1.0, "src1" -> 0.8, "src2" -> 0.5, "src3" -> 0.25), defaultWeight = 0.6)),
    "t09_source_cap" -> ((s: SparkSession, dir: String) =>
      Sampling.sourceCap(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "source", k = 10)),
    "t14_sequence_pack" -> ((s: SparkSession, dir: String) =>
      Sampling.sequencePack(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "source", "text",
        budgetTokens = 512L, nGroups = 8)),
    "t20_unigram_logprob" -> ((s: SparkSession, dir: String) =>
      TextStats.unigramLogProb(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    "t21_bm25_top" -> ((s: SparkSession, dir: String) =>
      TextStats.bm25Top(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", k = 3)),
    "t22_bpe_pairs" -> ((s: SparkSession, dir: String) =>
      TextStats.bpePairs(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", k = 100)),
    "t23_char_entropy" -> ((s: SparkSession, dir: String) =>
      TextStats.charEntropy(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    "t24_bpe_merges" -> ((s: SparkSession, dir: String) =>
      TextStats.bpeMergeLoop(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        rounds = BpeMergeRounds)),
    "t25_bpe_encode" -> ((s: SparkSession, dir: String) =>
      TextStats.bpeEncode(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        rounds = BpeMergeRounds)),
    // the production two-job shape: train once, persist the merge artifact, encode
    // from the saved table (exercises save → load → replay end-to-end; the oracle
    // proves the round-trip reproduces the fused t25 result exactly).
    // bpeEncodeWith COLLECTS the merge table before returning, so the artifact dir
    // can be removed as soon as the encode DataFrame is constructed — deleted in the
    // finally so repeated invocations leave nothing behind (the one write a "read"
    // query performs must clean up after itself)
    "t26_bpe_encode_saved" -> ((s: SparkSession, dir: String) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val scratch = java.nio.file.Files.createTempDirectory("graft-bpe-artifact")
      try {
        val path = scratch.toString + "/merges"
        TextStats.bpeSaveMerges(
          TextStats.bpeMergeLoop(docs, "doc_id", "text", rounds = BpeMergeRounds), path)
        TextStats.bpeEncodeWith(docs, "doc_id", "text", TextStats.bpeLoadMerges(s, path))
      } finally deleteRecursively(scratch)
    }),
    "t31_dsir_scores" -> ((s: SparkSession, dir: String) =>
      Sampling.dsirScores(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        "source", targetSource = DsirTargetSource, buckets = DsirBuckets)),
    "t32_vocab_growth" -> ((s: SparkSession, dir: String) =>
      TextStats.vocabGrowth(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        bucketDocs = VocabBucketDocs)),
    "t35_source_drift" -> ((s: SparkSession, dir: String) =>
      TextStats.sourceDrift(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        "source", cutId = SourceDriftCut)),
    "t36_heaps_fit" -> ((s: SparkSession, dir: String) =>
      TextStats.heapsFit(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        bucketDocs = VocabBucketDocs)),
    "t37_drift_hashed" -> ((s: SparkSession, dir: String) =>
      TextStats.sourceDriftHashed(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        "source", cutId = SourceDriftCut, buckets = DriftBuckets)),
    "t27_bigram_logprob" -> ((s: SparkSession, dir: String) =>
      TextStats.bigramLogProb(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        lambdaMicro = BigramLambdaMicro)),
    "t28_linear_quality" -> ((s: SparkSession, dir: String) =>
      TextStats.linearQuality(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        buckets = LinearQualityBuckets)),
    "t29_kneser_ney" -> ((s: SparkSession, dir: String) =>
      TextStats.kneserNeyLogProb(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        discountMicro = KneserNeyDiscountMicro)),
    // the trained counterpart of t28: logistic regression over hashed features,
    // labels from the t05 heuristic gate, quantized rounds (the s22 discipline)
    "t38_lr_train" -> ((s: SparkSession, dir: String) =>
      TextStats.lrQualityTrain(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        buckets = LrBuckets, rounds = LrRounds, lrMicro = LrRateMicro)),
    "t40_bpe_fertility" -> ((s: SparkSession, dir: String) =>
      TextStats.bpeFertility(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        "source", rounds = BpeMergeRounds)),
    // model QA before gate swap: the trained classifier's agreement with its own
    // supervision (train in-session exactly as t38, then confusion rollup)
    "t41_lr_eval" -> ((s: SparkSession, dir: String) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      TextStats.lrQualityEval(docs, "doc_id", "text",
        TextStats.lrQualityTrain(docs, "doc_id", "text",
          buckets = LrBuckets, rounds = LrRounds, lrMicro = LrRateMicro),
        buckets = LrBuckets)
    }),
    // mini-batch rounds: nBatches hash batches swept once (an epoch of cheap
    // steps instead of rounds full corpus passes) — the corpus-scale training
    // schedule, oracle-unrolled with the same per-round batch filters
    "t43_lr_train_minibatch" -> ((s: SparkSession, dir: String) =>
      TextStats.lrQualityTrainMiniBatch(s.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text", buckets = LrBuckets, rounds = LrMiniRounds,
        lrMicro = LrRateMicro, nBatches = LrMiniBatches)),
    // the deployment decision over the t41 eval: swap/hold/block against the
    // pinned thresholds — what the streamingQualityGate redeploy actually reads
    // (the driver-side gateSwapTrigger mirrors this row, pinned in
    // RoundThirteenOpsSpec)
    "t44_lr_calibration" -> ((s: SparkSession, dir: String) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      TextStats.lrCalibration(docs, "doc_id", "text",
        TextStats.lrQualityTrain(docs, "doc_id", "text",
          buckets = LrBuckets, rounds = LrRounds, lrMicro = LrRateMicro),
        buckets = LrBuckets, nBins = CalibrationBins)
    }),
    // SentencePiece-style unigram trainer in its hard-EM/Viterbi form:
    // substring-seeded candidate vocab, per-round Viterbi segmentation of the
    // word-frequency dictionary, count-based re-estimation, coverage-safe prune
    "t52_unigram_train" -> ((s: SparkSession, dir: String) =>
      TextStats.unigramTrain(s.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text", rounds = UnigramRounds, maxPieceLen = UnigramMaxPieceLen,
        seedVocab = UnigramSeedVocab, vocabTarget = UnigramVocabTarget,
        floorLpMicro = UnigramFloorLpMicro)),
    // the trained vocabulary persisted, reloaded, and used to Viterbi-price
    // every document (the t26 artifact round-trip discipline)
    "t53_unigram_encode" -> ((s: SparkSession, dir: String) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val scratch = java.nio.file.Files.createTempDirectory("graft-uni-vocab")
      try {
        val path = scratch.toString + "/vocab"
        TextStats.uniSaveVocab(
          TextStats.unigramTrain(docs, "doc_id", "text",
            rounds = UnigramRounds, maxPieceLen = UnigramMaxPieceLen,
            seedVocab = UnigramSeedVocab, vocabTarget = UnigramVocabTarget,
            floorLpMicro = UnigramFloorLpMicro), path)
        val vocab = TextStats.uniLoadVocab(s, path).localCheckpoint(true)
        TextStats.unigramEncodeWith(docs, "doc_id", "text", vocab,
          maxPieceLen = UnigramMaxPieceLen, floorLpMicro = UnigramFloorLpMicro)
      } finally deleteRecursively(scratch)
    }),
    // the tokenizer-family decision card: trained BPE vs trained unigram on
    // the same corpus (pieces/token, chars/piece — the s40 card discipline)
    "t54_tokenizer_card" -> ((s: SparkSession, dir: String) =>
      TextStats.tokenizerCompareCard(s.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text", bpeRounds = BpeMergeRounds, uniRounds = UnigramRounds,
        maxPieceLen = UnigramMaxPieceLen, seedVocab = UnigramSeedVocab,
        vocabTarget = UnigramVocabTarget, floorLpMicro = UnigramFloorLpMicro)),
    // Kudo 2018's subword regularization over the t52 lattice: forward
    // filtering / backward sampling (α-scaled, micro-quantized), draws
    // md5-derived per (token, boundary, seed) — the g45 no-rand discipline;
    // α→∞ reduces exactly to t53's Viterbi argmax (property-pinned)
    "t55_unigram_sampled" -> ((s: SparkSession, dir: String) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val scratch = java.nio.file.Files.createTempDirectory("graft-uni-sample")
      try {
        val path = scratch.toString + "/vocab"
        TextStats.uniSaveVocab(
          TextStats.unigramTrain(docs, "doc_id", "text",
            rounds = UnigramRounds, maxPieceLen = UnigramMaxPieceLen,
            seedVocab = UnigramSeedVocab, vocabTarget = UnigramVocabTarget,
            floorLpMicro = UnigramFloorLpMicro), path)
        val vocab = TextStats.uniLoadVocab(s, path).localCheckpoint(true)
        TextStats.unigramEncodeSampled(docs, "doc_id", "text", vocab,
          maxPieceLen = UnigramMaxPieceLen, floorLpMicro = UnigramFloorLpMicro,
          alphaMicro = UnigramSampleAlphaMicro, seed = UnigramSampleSeed)
      } finally deleteRecursively(scratch)
    }),
    // the t54 card ACTUATED (the t42 swap/block/hold discipline): the corpus
    // is priced by whichever family the pinned fertility margin chooses — a
    // gated UNION over the two per-doc arms, the decision relational
    "t56_tokenizer_swap" -> ((s: SparkSession, dir: String) =>
      TextStats.tokenizerSwapEpoch(s.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text", bpeRounds = BpeMergeRounds, uniRounds = UnigramRounds,
        maxPieceLen = UnigramMaxPieceLen, seedVocab = UnigramSeedVocab,
        vocabTarget = UnigramVocabTarget, floorLpMicro = UnigramFloorLpMicro,
        marginMicro = TokenizerSwapMarginMicro)),
    "t45_ccnet_tertiles" -> ((s: SparkSession, dir: String) =>
      TextStats.ccnetTertiles(s.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text", "source", refSource = DsirTargetSource,
        oovLpMicro = CcnetOovLpMicro)),
    "t46_gopher_repetition" -> ((s: SparkSession, dir: String) =>
      TextStats.gopherRepetition(s.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text",
        topThresholdsMicro = GopherTopMicro, dupThresholdsMicro = GopherDupMicro)),
    "t47_gopher_quality" -> ((s: SparkSession, dir: String) =>
      TextStats.gopherQuality(s.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text",
        minWords = GopherMinWords, maxWords = GopherMaxWords,
        minMeanLen = GopherMinMeanLen, maxMeanLen = GopherMaxMeanLen,
        requiredWords = GopherRequiredWords,
        minRequiredHits = GopherMinRequiredHits)),
    "t48_gopher_gate" -> ((s: SparkSession, dir: String) =>
      TextStats.gopherGate(s.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text",
        minWords = GopherMinWords, maxWords = GopherMaxWords,
        requiredWords = GopherRequiredWords,
        minRequiredHits = GopherMinRequiredHits)),
    "t49_readability" -> ((s: SparkSession, dir: String) =>
      TextStats.readability(s.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text")),
    "t42_gate_swap" -> ((s: SparkSession, dir: String) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      TextStats.gateSwapDecision(
        TextStats.lrQualityEval(docs, "doc_id", "text",
          TextStats.lrQualityTrain(docs, "doc_id", "text",
            buckets = LrBuckets, rounds = LrRounds, lrMicro = LrRateMicro),
          buckets = LrBuckets),
        minAgreementMicro = GateMinAgreementMicro,
        minPrecisionMicro = GateMinPrecisionMicro,
        minRecallMicro = GateMinRecallMicro)
    }),
    // train → persist the weight artifact → reload → score (the t26 round-trip
    // discipline: the save must reproduce the in-session model's scores exactly)
    "t39_lr_score_saved" -> ((s: SparkSession, dir: String) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val scratch = java.nio.file.Files.createTempDirectory("graft-lr-weights")
      try {
        val path = scratch.toString + "/weights"
        // r18: ONE tokenize+hash pass serves training and scoring (the same
        // corpus — the tf relation is identical on both sides by definition)
        val tf = TextStats.hashedTf(docs, "doc_id", "text", LrBuckets)
          .localCheckpoint(true)
        TextStats.saveLrWeights(
          TextStats.lrQualityTrainFromTf(tf,
            TextStats.qualityFilter(docs, "doc_id", "text")
              .select(col("doc_id"), col("kept").cast("double").as("y"))
              .localCheckpoint(true),
            "doc_id", rounds = LrRounds, lrMicro = LrRateMicro), path)
        TextStats.lrScoreWithTf(tf, "doc_id",
          TextStats.loadLrWeights(s, path).localCheckpoint(true))
      } finally deleteRecursively(scratch)
    }),
    "t30_temperature_mix" -> ((s: SparkSession, dir: String) =>
      Sampling.temperatureMix(s.read.parquet(s"$dir/documents.parquet"), "source",
        alphaMicro = MixAlphaMicro)),
    "t33_pmi_pairs" -> ((s: SparkSession, dir: String) =>
      TextStats.pmiPairs(s.read.parquet(s"$dir/documents.parquet"), "text",
        minCount = PmiMinCount, k = PmiK)),
    "t34_zipf_fit" -> ((s: SparkSession, dir: String) =>
      TextStats.zipfFit(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        fitK = ZipfFitK)),
  )

  /** Shared by t41 and t42: the trained-classifier eval rollup as chained CTEs
    * ending at `evalrow` (confusion counts + the three micro ratios) — t41
    * reports it, t42 decides over it.
    */
  private lazy val lrEvalCtes: String =
    s"""${lrTrainCtes(LrRounds)},
       |mgf AS (SELECT tf.doc_id, CAST(SUM(tf.tf * COALESCE(w.w, 0)) AS BIGINT) AS m
       |        FROM tf LEFT JOIN w$LrRounds w USING (slot) GROUP BY 1),
       |ev AS (SELECT CASE WHEN mgf.m > 0 THEN 1 ELSE 0 END AS pred, lab.kept AS y
       |       FROM mgf JOIN lab USING (doc_id)),
       |c AS (SELECT COUNT(*) AS n_scored,
       |        CAST(SUM(pred * y) AS BIGINT) AS tp,
       |        CAST(SUM(pred * (1 - y)) AS BIGINT) AS fp,
       |        CAST(SUM((1 - pred) * y) AS BIGINT) AS fn,
       |        CAST(SUM((1 - pred) * (1 - y)) AS BIGINT) AS tn
       |      FROM ev),
       |evalrow AS (SELECT n_scored, tp, fp, fn, tn,
       |  CASE WHEN tp + fp = 0 THEN 0
       |       ELSE CAST(floor(1000000.0 * tp::DOUBLE / (tp + fp)::DOUBLE + 0.5) AS BIGINT)
       |  END AS precision_micro,
       |  CASE WHEN tp + fn = 0 THEN 0
       |       ELSE CAST(floor(1000000.0 * tp::DOUBLE / (tp + fn)::DOUBLE + 0.5) AS BIGINT)
       |  END AS recall_micro,
       |  CAST(floor(1000000.0 * (tp + tn)::DOUBLE / n_scored::DOUBLE + 0.5) AS BIGINT)
       |    AS agreement_micro
       |FROM c)""".stripMargin

  /** t01's marker-word argmax chain - shared by the t01 mirror and the t51
    * confusion-matrix eval (one SQL rendition of the classifier).
    */
  private lazy val langIdSql: String =
      s"""WITH scores AS (
         |  SELECT doc_id, lang,
         |    CAST(${occSql(" the ")} + ${occSql(" and ")} + ${occSql(" of ")} AS BIGINT) AS s_en,
         |    CAST(${occSql(" der ")} + ${occSql(" und ")} + ${occSql(" das ")} AS BIGINT) AS s_de,
         |    CAST(${occSql(" el ")} + ${occSql(" los ")} + ${occSql(" que ")} AS BIGINT) AS s_es,
         |    CAST(${occSql(" le ")} + ${occSql(" les ")} + ${occSql(" et ")} AS BIGINT) AS s_fr,
         |    CAST(${occSql(" de ")} + ${occSql(" shi ")} + ${occSql(" bu ")} AS BIGINT) AS s_zh
         |  FROM documents),
         |f1 AS (SELECT *, CASE WHEN s_de > s_en THEN 'de' ELSE 'en' END AS b1,
         |               CASE WHEN s_de > s_en THEN s_de ELSE s_en END AS b1s FROM scores),
         |f2 AS (SELECT *, CASE WHEN s_es > b1s THEN 'es' ELSE b1 END AS b2,
         |               CASE WHEN s_es > b1s THEN s_es ELSE b1s END AS b2s FROM f1),
         |f3 AS (SELECT *, CASE WHEN s_fr > b2s THEN 'fr' ELSE b2 END AS b3,
         |               CASE WHEN s_fr > b2s THEN s_fr ELSE b2s END AS b3s FROM f2)
         |SELECT doc_id,
         |       CASE WHEN s_zh > b3s THEN 'zh' ELSE b3 END AS predicted_lang,
         |       lang,
         |       CAST(CASE WHEN s_zh > b3s THEN 'zh' ELSE b3 END = lang AS INTEGER) AS correct
         |FROM f3""".stripMargin

  /** One Viterbi E-step as a recursive forward-DP + backtrack CTE pair over
    * `dict` under the vocab CTE `vsrc` (piece, lp): `fwd$i` carries the growing
    * dp list per token (dps[k] = best score of the first k−1 chars), `bt$i`
    * walks back from the end taking the SMALLEST start achieving the optimum
    * (= the longest piece — the tie-break TextStats.uniPath pins). Ends at
    * `bt$i` (token, cnt, pos, piece).
    */
  private def unigramViterbiPair(i: Int, vsrc: String): String = {
    val ml = UnigramMaxPieceLen
    // the vocab rides as a 1-row MAP cross-joined into each recursion step, and
    // the per-position max/argmin are list folds — NOT correlated scalar
    // subqueries: DuckDB 1.0 silently returns NULL from a correlated subquery
    // inside a recursive CTE whenever that CTE (or a consumer of it) is
    // MATERIALIZED, and without materialization the nested per-round vocab
    // chains re-evaluate exponentially. The map form is immune to both.
    s"""vk$i AS (SELECT MAP(list(piece ORDER BY piece), list(lp ORDER BY piece)) AS m
       |         FROM $vsrc),
       |fwd$i(token, cnt, pos, dps) AS (
       |  SELECT token, cnt, 0, [CAST(0 AS BIGINT)] FROM dict
       |  UNION ALL
       |  SELECT token, cnt, pos + 1,
       |    list_append(dps, list_aggregate(list_transform(
       |      generate_series(GREATEST(1, f.pos + 2 - $ml), f.pos + 1),
       |      s -> f.dps[s] + vk$i.m[substr(f.token, s, f.pos + 2 - s)][1]), 'max'))
       |  FROM fwd$i f CROSS JOIN vk$i WHERE pos < len(token)),
       |fin$i AS (SELECT token, cnt, dps FROM fwd$i WHERE pos = len(token)),
       |bt$i(token, cnt, pos, dps, piece) AS (
       |  SELECT token, cnt, len(token), dps, NULL::VARCHAR FROM fin$i
       |  UNION ALL
       |  SELECT b.token, b.cnt, sstar - 1, b.dps,
       |    substr(b.token, sstar, b.pos - sstar + 1)
       |  FROM (
       |    SELECT b.*, list_aggregate(list_filter(list_transform(
       |      generate_series(GREATEST(1, b.pos - $ml + 1), b.pos),
       |      s -> CASE WHEN b.dps[s] + vk$i.m[substr(b.token, s, b.pos - s + 1)][1]
       |                     = b.dps[b.pos + 1] THEN s END),
       |      x -> x IS NOT NULL), 'min') AS sstar
       |    FROM bt$i b CROSS JOIN vk$i WHERE b.pos > 0) b)""".stripMargin
  }

  /** One M-step + prune: counts from `bt$i`, top-`keepMulti` multi-char pieces
    * (count desc, piece asc), all corpus single chars kept (unused ones at the
    * pinned floor), log-probs over the kept mass — mirror of TextStats.uniKept.
    */
  private def unigramPrune(i: Int, countsCte: String, keepMulti: Int): String =
    s"""mul$i AS (SELECT piece, n_uses FROM (
       |    SELECT piece, n_uses, row_number() OVER (ORDER BY n_uses DESC, piece) AS rk
       |    FROM $countsCte WHERE len(piece) > 1) WHERE rk <= $keepMulti),
       |kept$i AS (SELECT c.piece, COALESCE(u.n_uses, 0) AS n_uses
       |           FROM charset c LEFT JOIN (SELECT piece, n_uses FROM $countsCte
       |                                     WHERE len(piece) = 1) u ON u.piece = c.piece
       |           UNION ALL SELECT piece, n_uses FROM mul$i),
       |v$i AS MATERIALIZED (SELECT piece, n_uses,
       |          CASE WHEN n_uses > 0 THEN
       |            CAST(floor(1000000.0 * ln(n_uses::DOUBLE / tot::DOUBLE) + 0.5) AS BIGINT)
       |          ELSE $UnigramFloorLpMicro END AS lp
       |        FROM kept$i CROSS JOIN
       |          (SELECT CAST(SUM(n_uses) AS BIGINT) AS tot FROM kept$i) t)""".stripMargin

  /** t55's FFBS pair under the vocab CTE `vsrc`: `vks$i` holds the α-scaled
    * clamped piece scores as a 1-row MAP (the unigramViterbiPair map-carried
    * discipline — see the correlated-subquery note there), `fs$i` is the
    * forward filter (Viterbi's max replaced by a max-shifted log-sum-exp,
    * micro-quantized at every position), and `bs$i` walks back sampling each
    * boundary's piece with weight ∝ exp(score − max), the draw an md5-derived
    * uniform mod Σw. Ends at `nsyms$i` (token, n_sym).
    */
  private def unigramSampledPair(i: Int, vsrc: String): String = {
    val ml = UnigramMaxPieceLen
    val alpha = UnigramSampleAlphaMicro.toDouble / 1000000.0
    s"""vks$i AS (SELECT MAP(list(piece ORDER BY piece),
       |            list(GREATEST(CAST(floor($alpha * lp + 0.5) AS BIGINT),
       |                          CAST(-40000000000000000 AS BIGINT)) ORDER BY piece)) AS m
       |          FROM $vsrc),
       |fs$i(token, cnt, pos, dps) AS (
       |  SELECT token, cnt, 0, [CAST(0 AS BIGINT)] FROM dict
       |  UNION ALL
       |  SELECT token, cnt, pos + 1,
       |    list_append(dps, mx + CAST(floor(1000000.0 * ln(
       |        list_aggregate(list_transform(qs, q -> exp((q - mx)::DOUBLE / 1000000.0)),
       |          'sum')) + 0.5) AS BIGINT))
       |  FROM (SELECT token, cnt, pos, dps, qs, list_aggregate(qs, 'max') AS mx
       |        FROM (SELECT f.token, f.cnt, f.pos, f.dps,
       |                list_filter(list_transform(
       |                  generate_series(GREATEST(1, f.pos + 2 - $ml), f.pos + 1),
       |                  s -> f.dps[s] + vks$i.m[substr(f.token, s, f.pos + 2 - s)][1]),
       |                  q -> q IS NOT NULL) AS qs
       |              FROM fs$i f CROSS JOIN vks$i WHERE f.pos < len(f.token)))),
       |fsf$i AS (SELECT token, cnt, dps FROM fs$i WHERE pos = len(token)),
       |bs$i(token, cnt, pos, dps, n) AS (
       |  SELECT token, cnt, len(token), dps, CAST(0 AS BIGINT) FROM fsf$i
       |  UNION ALL
       |  SELECT token, cnt, GREATEST(1, pos - $ml + 1) + j - 2, dps, n + 1
       |  FROM (
       |    SELECT token, cnt, pos, dps, n,
       |      list_aggregate(list_filter(list_transform(
       |        generate_series(1, len(ws)),
       |        jj -> CASE WHEN list_aggregate(list_slice(ws, 1, jj), 'sum') > u
       |              THEN jj END),
       |        x -> x IS NOT NULL), 'min') AS j
       |    FROM (
       |      SELECT token, cnt, pos, dps, n, ws,
       |        ('0x' || substr(md5(token || ':' || CAST(pos AS VARCHAR) ||
       |            ':$UnigramSampleSeed'), 1, 15))::BIGINT
       |          % CAST(list_aggregate(ws, 'sum') AS BIGINT) AS u
       |      FROM (
       |        SELECT token, cnt, pos, dps, n,
       |          list_transform(qs, q -> CASE WHEN q IS NULL THEN CAST(0 AS BIGINT)
       |            ELSE CAST(floor(1000000.0 * exp((q - mxb)::DOUBLE / 1000000.0) + 0.5)
       |                 AS BIGINT) END) AS ws
       |        FROM (
       |          SELECT token, cnt, pos, dps, n, qs, list_aggregate(qs, 'max') AS mxb
       |          FROM (
       |            SELECT b.token, b.cnt, b.pos, b.dps, b.n,
       |              list_transform(generate_series(GREATEST(1, b.pos - $ml + 1), b.pos),
       |                s -> b.dps[s] + vks$i.m[substr(b.token, s, b.pos - s + 1)][1]) AS qs
       |            FROM bs$i b CROSS JOIN vks$i WHERE b.pos > 0)))))),
       |nsyms$i AS (SELECT token, n AS n_sym FROM bs$i WHERE pos = 0)""".stripMargin
  }

  /** The t52/t53 shared chain: word-frequency dictionary, substring-seeded
    * candidates, seed prune (v0), then `rounds` unrolled Viterbi/re-estimate/
    * prune cycles. Ends at `v$rounds` (piece, n_uses, lp).
    */
  private def unigramCtes(rounds: Int): String = {
    val ml = UnigramMaxPieceLen
    val roundBlocks = (1 to rounds).map { r =>
      s"""${unigramViterbiPair(r, s"v${r - 1}")},
         |cnt$r AS (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS n_uses
         |          FROM bt$r WHERE piece IS NOT NULL GROUP BY 1),
         |${unigramPrune(r, s"cnt$r", UnigramVocabTarget)}""".stripMargin
    }.mkString(",\n")
    s"""toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
       |dict AS MATERIALIZED (SELECT token, CAST(count(*) AS BIGINT) AS cnt
       |         FROM toks WHERE len(token) >= 1 GROUP BY 1),
       |sub1 AS (SELECT token, cnt, unnest(generate_series(1, len(token))) AS s FROM dict),
       |sub2 AS (SELECT cnt, substr(token, s, e - s + 1) AS piece
       |         FROM (SELECT token, cnt, s,
       |                 unnest(generate_series(s, least(len(token), s + $ml - 1))) AS e
       |               FROM sub1)),
       |cands AS (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS n_uses FROM sub2 GROUP BY 1),
       |charset AS (SELECT piece FROM cands WHERE len(piece) = 1),
       |${unigramPrune(0, "cands", UnigramSeedVocab)},
       |$roundBlocks""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(

    // char-class profile via class-strip length differences — mirror of
    // TextStats.charClassProfile ('g' flag: DuckDB replaces first match by default)
    "t19_char_classes" ->
      s"""SELECT doc_id, length(text) AS n_chars,
         |  length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
         |  length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
         |  length(text) - length(regexp_replace(text, '[ ]', '', 'g')) AS n_space,
         |  round(CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
         |        / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS alpha_ratio
         |FROM documents""".stripMargin,
    "t01_lang_id" -> langIdSql,
    // t01's confusion matrix + the share-idiom class metrics off it — mirror
    // of TextStats.langIdEval (t01's chain reused verbatim as the subquery)
    "t51_langid_eval" ->
      s"""WITH p AS ($langIdSql),
         |cm AS (SELECT lang AS gold, predicted_lang AS pred,
         |    CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
         |gt AS (SELECT gold, CAST(sum(n) AS BIGINT) AS n_gold FROM cm GROUP BY 1),
         |pt AS (SELECT pred, CAST(sum(n) AS BIGINT) AS n_pred FROM cm GROUP BY 1),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
         |    CAST(sum(CASE WHEN gold = pred THEN n ELSE 0 END) AS BIGINT) AS n_correct
         |  FROM cm)
         |SELECT gold, pred, n, n_gold, n_pred,
         |  CAST((2 * 1000000 * n + n_gold) // (2 * n_gold) AS BIGINT) AS recall_micro,
         |  CAST((2 * 1000000 * n + n_pred) // (2 * n_pred) AS BIGINT) AS precision_micro,
         |  CAST((2 * 1000000 * n_correct + n_total) // (2 * n_total) AS BIGINT) AS accuracy_micro
         |FROM cm JOIN gt USING (gold) JOIN pt USING (pred), tot""".stripMargin,
    "t02_quality_score" ->
      s"""SELECT doc_id, n_tokens, stop_hits,
         |  round(CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE)
         |        + CAST(n_tokens AS DOUBLE) / CAST(c AS DOUBLE) * 10.0, 6) AS quality
         |FROM (SELECT doc_id, length(text) AS c,
         |        CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
         |        CAST(${occSql(" the ")} + ${occSql(" a ")} + ${occSql(" of ")} + ${occSql(" and ")} AS BIGINT) AS stop_hits
         |      FROM documents)""".stripMargin,
    "t03_token_stats" ->
      s"""SELECT doc_id, COUNT(*) AS n_tokens,
         |  CAST(SUM((length(tok) + 3) // 4) AS BIGINT) AS n_bpe
         |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
         |GROUP BY doc_id""".stripMargin,

    // mirror of Dedup.minhashWide: base hash = first 60 bits of md5(shingle) mod p,
    // permutation k = (2k+1)·h + 12289k + 1 mod p (p = 1e9+7); bands of size 1.
    "t05_quality_filter" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
         |    CAST(${occSql(" the ")} + ${occSql(" a ")} + ${occSql(" of ")} + ${occSql(" and ")} AS BIGINT) AS stop_hits,
         |    CAST(length(text) AS BIGINT) AS n_chars
         |  FROM documents)
         |SELECT doc_id, n_tokens,
         |  CAST(CASE WHEN n_tokens < 10 THEN 1 ELSE 0 END
         |     + CASE WHEN stop_hits < 1 THEN 2 ELSE 0 END
         |     + CASE WHEN (n_chars - (n_tokens - 1)) > 12 * n_tokens THEN 4 ELSE 0 END AS BIGINT) AS reasons,
         |  CAST(CASE WHEN n_tokens >= 10 AND stop_hits >= 1
         |            AND (n_chars - (n_tokens - 1)) <= 12 * n_tokens THEN 1 ELSE 0 END AS INTEGER) AS kept
         |FROM q""".stripMargin,
    "t06_corpus_stats" ->
      s"""WITH q AS (
         |  SELECT doc_id, lang, source,
         |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
         |    CAST(${occSql(" the ")} + ${occSql(" a ")} + ${occSql(" of ")} + ${occSql(" and ")} AS BIGINT) AS stop_hits,
         |    CAST(length(text) AS BIGINT) AS n_chars
         |  FROM documents)
         |SELECT lang, source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         |  CAST(SUM(CASE WHEN n_tokens >= 10 AND stop_hits >= 1
         |                AND (n_chars - (n_tokens - 1)) <= 12 * n_tokens THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM q GROUP BY lang, source""".stripMargin,

    // within-doc repetition signals — mirror of TextStats.repetitionStats
    "t10_repetition" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |pt AS (SELECT doc_id, token, COUNT(*) AS c FROM toks GROUP BY 1, 2),
         |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |               COUNT(*) AS n_distinct, CAST(MAX(c) AS BIGINT) AS max_count
         |        FROM pt GROUP BY 1)
         |SELECT doc_id, n_tokens, n_distinct,
         |  round(1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS dup_ratio,
         |  round(CAST(max_count AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS top_ratio
         |FROM agg""".stripMargin,

    // corpus top-50 tokens by occurrences (token tie-break) — mirror of TextStats.vocabulary
    "t11_vocabulary" ->
      s"""SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
         |GROUP BY token
         |ORDER BY n_occurrences DESC, token
         |LIMIT 50""".stripMargin,

    // per-source shingle novelty (shingles in no other source) — mirror of
    // Dedup.sourceNovelty on 60-bit md5 shingle hashes
    "t16_source_novelty" ->
      s"""WITH toks AS (SELECT source, string_split(text, ' ') AS ts FROM documents),
         |shs AS (SELECT DISTINCT source,
         |          ('0x' || substr(md5(array_to_string(ts[i:i+2], ' ')), 1, 15))::BIGINT AS h
         |        FROM (SELECT source, ts, unnest(generate_series(1, len(ts) - 2)) AS i
         |              FROM toks)),
         |spread AS (SELECT h, COUNT(*) AS n_sources FROM shs GROUP BY h)
         |SELECT source, COUNT(*) AS n_shingles,
         |  CAST(SUM(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         |  round(CAST(SUM(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |        / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
         |FROM shs JOIN spread USING (h)
         |GROUP BY source""".stripMargin,

    // PII counts + redacted-text hash — mirror of TextStats.piiRedact (patterns use
    // only Java-regex/RE2-common syntax; DuckDB needs the 'g' flag for replace-all)
    "t12_pii_redact" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${TextStats.EmailRe}')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(text, '${TextStats.Ipv4Re}')) AS BIGINT) AS n_ipv4,
         |  CAST(len(regexp_extract_all(text, '${TextStats.PhoneRe}')) AS BIGINT) AS n_phone,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |        '${TextStats.EmailRe}', '<EMAIL>', 'g'),
         |        '${TextStats.Ipv4Re}', '<IP>', 'g'),
         |        '${TextStats.PhoneRe}', '<PHONE>', 'g')) AS clean_md5
         |FROM documents""".stripMargin,

    // 64-token window chunking — mirror of TextStats.chunk (1-based inclusive list
    // slicing clamps at the array end in both engines)
    "t13_chunk" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |c AS (SELECT doc_id, ts, unnest(generate_series(0, (len(ts) - 1) // 64)) AS i FROM toks)
         |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
         |  CAST(len(ts[i * 64 + 1 : i * 64 + 64]) AS BIGINT) AS n_chunk_tokens,
         |  md5(array_to_string(ts[i * 64 + 1 : i * 64 + 64], ' ')) AS chunk_md5
         |FROM c""".stripMargin,

    // per-doc OOV rate vs the corpus top-20 vocabulary — mirror of
    // TextStats.vocabCoverage (vocab cut ordered by occurrences desc, token asc)
    "t15_vocab_coverage" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |vocab AS (SELECT token FROM toks GROUP BY token
         |          ORDER BY COUNT(*) DESC, token LIMIT 20),
         |j AS (SELECT t.doc_id, CASE WHEN v.token IS NULL THEN 0 ELSE 1 END AS iv
         |      FROM toks t LEFT JOIN vocab v USING (token))
         |SELECT doc_id, COUNT(*) AS n_tokens,
         |  CAST(COUNT(*) - SUM(iv) AS BIGINT) AS n_oov,
         |  round(CAST(COUNT(*) - SUM(iv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
         |FROM j GROUP BY doc_id""".stripMargin,

    // deterministic md5-bucket split — mirror of Sampling.hashSplit(90, 5)
    "t07_hash_split" ->
      s"""SELECT doc_id, bucket,
         |  CASE WHEN bucket < 9000 THEN 'train'
         |       WHEN bucket < 9500 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id, ${bucketSql("doc_id")} AS bucket FROM documents)""".stripMargin,

    // weighted corpus mix — mirror of Sampling.weightedMix(src0→1.0, src1→0.8,
    // src2→0.5, src3→0.25, default 0.6); thresholds in exact 1/10000ths
    "t08_corpus_mix" ->
      s"""SELECT doc_id, source, bucket FROM (
         |  SELECT doc_id, source, ${bucketSql("doc_id")} AS bucket,
         |    CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 8000
         |                WHEN 'src2' THEN 5000 WHEN 'src3' THEN 2500
         |                ELSE 6000 END AS thr
         |  FROM documents)
         |WHERE bucket < thr""".stripMargin,

    // per-source cap: k=10 smallest buckets per source — mirror of Sampling.sourceCap
    // (the engine computes it two-pass via KthSmallest; the top-k set is identical)
    "t09_source_cap" ->
      s"""SELECT doc_id, source, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT doc_id, source,
         |         row_number() OVER (PARTITION BY source ORDER BY bucket, doc_id) AS rk
         |  FROM (SELECT doc_id, source, ${bucketSql("doc_id")} AS bucket FROM documents))
         |WHERE rk <= 10""".stripMargin,

    // concat-and-cut sequence packing — mirror of Sampling.sequencePack(512, 8):
    // layout order (bucket, doc_id) inside (source, bucket % 8); bin = exclusive
    // running token total // 512. (bucket, doc_id) is unique so ROWS ≡ RANGE framing.
    "t14_sequence_pack" ->
      s"""WITH r AS (
         |  SELECT doc_id, source, ${bucketSql("doc_id")} AS bucket,
         |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT source, bucket % 8 AS pack_group, n_tokens,
         |        SUM(n_tokens) OVER (PARTITION BY source, bucket % 8
         |          ORDER BY bucket, doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS tok_before
         |      FROM r)
         |SELECT source, pack_group, CAST(tok_before // 512 AS BIGINT) AS bin,
         |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
         |FROM c GROUP BY 1, 2, 3""".stripMargin,

    // LEFT JOIN back to documents so empty docs (dropped by the unnest+GROUP BY) pin
    // fingerprint 0 — lockstep with TextStats.fingerprint's empty-doc guard.
    "t04_fingerprint" ->
      s"""WITH chars AS (
         |  SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i FROM documents),
         |fp AS (
         |  SELECT doc_id,
         |    CAST(SUM(ascii(substr(text, i, 1)) *
         |         ([1, 31, 961, 29791, 923521, 28629151, 887503681, 27512614111])[((i - 1) % 8) + 1])
         |         % 1000000007 AS BIGINT) AS fingerprint
         |  FROM chars GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(fp.fingerprint, 0) AS fingerprint
         |FROM documents d LEFT JOIN fp USING (doc_id)""".stripMargin,

    // exact per-source token-length quantiles via the cumulated length histogram —
    // mirror of TextStats.lengthQuantiles (integer cum·100 ≥ p·total thresholds)
    "t17_length_quantiles" ->
      s"""WITH lens AS (SELECT source,
         |                (length(text) - length(replace(text, ' ', ''))) + 1 AS len
         |              FROM documents),
         |hist AS (SELECT source, len, COUNT(*) AS c FROM lens GROUP BY 1, 2),
         |cw AS (SELECT source, len,
         |         CAST(sum(c) OVER (PARTITION BY source ORDER BY len
         |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         |         CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS total
         |       FROM hist)
         |SELECT source, max(total) AS n_docs,
         |  min(CASE WHEN cum * 100 >= 50 * total THEN len END) AS p50,
         |  min(CASE WHEN cum * 100 >= 90 * total THEN len END) AS p90,
         |  min(CASE WHEN cum * 100 >= 99 * total THEN len END) AS p99
         |FROM cw GROUP BY source""".stripMargin,

    // per-doc character Shannon entropy in integer micro-bits (term-wise rounded
    // (c/L)·log2(L/c), order-free integer sum) — mirror of TextStats.charEntropy
    "t23_char_entropy" ->
      s"""WITH ch AS (SELECT doc_id, substr(text, i, 1) AS ch
         |            FROM (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
         |                  FROM documents WHERE length(text) >= 1)),
         |cnt AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2),
         |tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS len, COUNT(*) AS n_distinct_chars
         |        FROM cnt GROUP BY 1)
         |SELECT cnt.doc_id, MAX(len) AS n_chars,
         |       CAST(MAX(n_distinct_chars) AS BIGINT) AS n_distinct_chars,
         |       CAST(SUM(CAST(round(1000000.0 * (c::DOUBLE / len::DOUBLE)
         |                           * log2(len::DOUBLE / c::DOUBLE)) AS BIGINT)) AS BIGINT)
         |         AS entropy_microbits
         |FROM cnt JOIN tot USING (doc_id) GROUP BY cnt.doc_id""".stripMargin,

    // corpus-wide adjacent char-pair counts (the BPE merge statistic), top-100 by the
    // (count desc, pair) total order — mirror of TextStats.bpePairs
    "t22_bpe_pairs" ->
      s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
         |t2 AS (SELECT token FROM toks WHERE length(token) >= 2),
         |pr AS (SELECT substr(token, i, 2) AS pair
         |       FROM (SELECT token, unnest(generate_series(1, length(token) - 1)) AS i FROM t2))
         |SELECT pair, COUNT(*) AS n FROM pr GROUP BY pair
         |ORDER BY n DESC, pair LIMIT 100""".stripMargin,

    // Bounded BPE merge loop, BpeMergeRounds pinned rounds: per round count adjacent
    // symbol pairs over the doubled-separator representation, pick the (count desc,
    // pair) argmax, merge it greedily via sequential literal replace — mirror of
    // TextStats.bpeMergeLoop (see its scaladoc for why replace = greedy merge).
    // COALESCE keeps a dry round (empty argmax → NULL scalar subqueries → NULL
    // replace) a repr no-op, mirroring the Scala side's early stop — here and in t25
    "t24_bpe_merges" -> {
      def roundCtes(i: Int): String = {
        val prev = s"r${i - 1}"
        s"""s$i AS MATERIALIZED (SELECT list_filter(string_split(repr, '||'), x -> x <> '') AS syms FROM $prev),
           |p$i AS (SELECT syms[j] AS l, syms[j + 1] AS r
           |        FROM (SELECT syms, unnest(generate_series(1, len(syms) - 1)) AS j
           |              FROM s$i WHERE len(syms) >= 2)),
           |c$i AS MATERIALIZED (SELECT l, r, COUNT(*) AS n FROM p$i GROUP BY 1, 2),
           |m$i AS MATERIALIZED (SELECT l, r, n FROM c$i ORDER BY n DESC, l, r LIMIT 1),
           |r$i AS MATERIALIZED (SELECT COALESCE(replace(repr,
           |         '|' || (SELECT l FROM m$i) || '||' || (SELECT r FROM m$i) || '|',
           |         '|' || (SELECT l FROM m$i) || (SELECT r FROM m$i) || '|'), repr) AS repr FROM $prev)""".stripMargin
      }
      s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
         |r0 AS MATERIALIZED (SELECT '||' || array_to_string(
         |         list_transform(generate_series(1, length(token)), i -> substr(token, i, 1)),
         |         '||') || '||' AS repr
         |       FROM toks WHERE length(token) >= 1 AND token NOT LIKE '%|%'),
         |${(1 to BpeMergeRounds).map(roundCtes).mkString(",\n")}
         |SELECT round, left_sym, right_sym, left_sym || right_sym AS merged,
         |       CAST(n AS BIGINT) AS n FROM (
         |  ${(1 to BpeMergeRounds).map(i =>
              s"SELECT $i AS round, l AS left_sym, r AS right_sym, n FROM m$i")
              .mkString("\n  UNION ALL ")})""".stripMargin
    },

    // BPE encoding with a freshly-trained merge table — mirror of TextStats.bpeEncode
    "t25_bpe_encode" -> bpeEncodeMirrorSql,

    // Encode-from-saved-artifact round-trip (TextStats.bpeSaveMerges →
    // bpeLoadMerges → bpeEncodeWith): replaying the persisted merge table over a
    // fresh dictionary is provably identical to the fused train+encode, so the
    // oracle mirror IS t25's — what this entry adds is the driver-checked proof
    // that the save/load/replay path reproduces it exactly
    "t26_bpe_encode_saved" -> bpeEncodeMirrorSql,

    // BM25 top-3 terms per doc, log-free: tf-part and raw idf as exact-integer
    // rationals, two IEEE divisions + one product per row (no libm ln) — mirror of
    // TextStats.bm25Top (k1=1.2, b=0.75 multiplied through by 10^6)
    "t21_bm25_top" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |dfq AS (SELECT token, COUNT(*) AS df_count FROM tf GROUP BY 1),
         |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         |tot AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
         |s AS (SELECT tf.doc_id, tf.token, tf.tf, dfq.df_count,
         |        (2200000 * tf)::DOUBLE
         |          / (1000000 * tf + 300000
         |             + CAST(round((900000 * dl * n_docs)::DOUBLE / sum_dl::DOUBLE) AS BIGINT))::DOUBLE
         |          * ((2 * n_docs - 2 * df_count + 1)::DOUBLE / (2 * df_count + 1)::DOUBLE) AS score_raw
         |      FROM tf JOIN dfq USING (token) JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN tot)
         |SELECT doc_id, token, tf, df_count, round(score_raw, 6) AS score,
         |       CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |                              ORDER BY score_raw DESC, token) AS rank FROM s)
         |WHERE rank <= 3""".stripMargin,

    // top-3 terms per doc by log-free TF-IDF (tf·N/df: exact ints, one division, no
    // rounding ⇒ bit-identical doubles) — mirror of TextStats.tfIdfTop
    "t18_tfidf_top" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |dfq AS (SELECT token, COUNT(*) AS df_count FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
         |s AS (SELECT doc_id, tf.token, tf, df_count,
         |        CAST(tf * n_docs AS DOUBLE) / CAST(df_count AS DOUBLE) AS score
         |      FROM tf JOIN dfq ON tf.token = dfq.token CROSS JOIN n)
         |SELECT doc_id, token, tf, df_count, score, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |                              ORDER BY score DESC, token) AS rank FROM s)
         |WHERE rank <= 3""".stripMargin,

    // DSIR importance-resampling scores: hashed unigram+bigram slots, add-one-smoothed
    // target-vs-corpus log-ratio weights in micro-nats (each ln rounded separately),
    // exact integer per-doc sums — mirror of Sampling.dsirScores
    "t31_dsir_scores" -> {
      val b = DsirBuckets
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |uni AS (SELECT doc_id, unnest(ts) AS g FROM toks),
         |bi AS (SELECT doc_id, array_to_string(ts[i:i+1], ' ') AS g
         |       FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM toks)),
         |feats AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT % $b AS b
         |          FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
         |tf AS (SELECT doc_id, b, count(*) AS tf FROM feats GROUP BY 1, 2),
         |allc AS (SELECT b, CAST(sum(tf) AS BIGINT) AS cnt_all FROM tf GROUP BY 1),
         |tgtc AS (SELECT b, CAST(sum(tf) AS BIGINT) AS cnt_tgt
         |         FROM tf JOIN documents USING (doc_id)
         |         WHERE source = '$DsirTargetSource' GROUP BY 1),
         |tot AS (SELECT (SELECT CAST(sum(cnt_all) AS BIGINT) FROM allc) AS n_all,
         |               (SELECT CAST(sum(cnt_tgt) AS BIGINT) FROM tgtc) AS n_tgt),
         |wt AS (SELECT allc.b,
         |         CAST(round(1000000.0 * ln((COALESCE(cnt_tgt, 0) + 1)::DOUBLE / (n_tgt + $b)::DOUBLE)) AS BIGINT)
         |         - CAST(round(1000000.0 * ln((cnt_all + 1)::DOUBLE / (n_all + $b)::DOUBLE)) AS BIGINT) AS w_micro
         |       FROM allc LEFT JOIN tgtc USING (b) CROSS JOIN tot),
         |per AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_feats,
         |               CAST(sum(tf * w_micro) AS BIGINT) AS score_micro
         |        FROM tf JOIN wt USING (b) GROUP BY 1)
         |SELECT d.doc_id, COALESCE(n_feats, 0) AS n_feats,
         |  COALESCE(score_micro, 0) AS score_micro,
         |  CASE WHEN COALESCE(n_feats, 0) = 0 THEN 0.0::DOUBLE
         |       ELSE round(score_micro::DOUBLE / (n_feats * 1000000)::DOUBLE, 6) END AS avg_log_ratio
         |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin
    },

    // vocabulary-growth (Heaps-law) curve: per-token first-appearance doc, doc-id
    // bucket rollups, cumulative window over bucket stats — mirror of
    // TextStats.vocabGrowth
    "t32_vocab_growth" ->
      s"""WITH toks0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |toks AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT AS h FROM toks0),
         |dv0 AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1),
         |dv AS (SELECT doc_id // $VocabBucketDocs AS bucket, COUNT(*) AS n_docs,
         |              CAST(SUM(n) AS BIGINT) AS n_tokens
         |       FROM dv0 GROUP BY 1),
         |nv AS (SELECT first_id // $VocabBucketDocs AS bucket, COUNT(*) AS new_vocab
         |       FROM (SELECT h, MIN(doc_id) AS first_id FROM toks GROUP BY 1)
         |       GROUP BY 1)
         |SELECT bucket,
         |  CAST(SUM(n_docs) OVER w AS BIGINT) AS cum_docs,
         |  CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens,
         |  CAST(SUM(COALESCE(new_vocab, 0)) OVER w AS BIGINT) AS vocab
         |FROM dv LEFT JOIN nv USING (bucket)
         |WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    // corpus-unigram log-probability score per document (per-token micro-unit ln, exact
    // integer sums) — mirror of TextStats.unigramLogProb
    "t20_unigram_logprob" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
        |corpus AS (SELECT token, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM corpus),
        |lp AS (SELECT token,
        |         CAST(round(1000000.0 * ln(cnt::DOUBLE / n_total::DOUBLE)) AS BIGINT) AS lp_micro
        |       FROM corpus CROSS JOIN tot),
        |per AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |               CAST(sum(tf * lp_micro) AS BIGINT) AS sum_lp_micro
        |        FROM tf JOIN lp USING (token) GROUP BY 1)
        |SELECT doc_id, n_tokens, sum_lp_micro,
        |  round(sum_lp_micro::DOUBLE / (n_tokens * 1000000)::DOUBLE, 6) AS avg_logprob
        |FROM per""".stripMargin,

    // cross-snapshot source drift: Laplace-smoothed unigram LMs over the early
    // (doc_id < cut) and late windows, per-word P·ln(P/Q) micro-quantized then
    // exact-integer-summed per source — mirror of TextStats.sourceDrift
    "t35_source_drift" ->
      s"""WITH toks AS (SELECT source, doc_id < $SourceDriftCut AS early,
         |                     unnest(string_split(text, ' ')) AS token FROM documents),
         |counts AS (SELECT source, token,
         |    CAST(SUM(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS cq,
         |    CAST(SUM(CASE WHEN early THEN 0 ELSE 1 END) AS BIGINT) AS cp
         |  FROM toks GROUP BY 1, 2),
         |tot AS (SELECT source, CAST(SUM(cp) AS BIGINT) AS np, CAST(SUM(cq) AS BIGINT) AS nq,
         |               COUNT(*) AS vocab
         |        FROM counts GROUP BY 1),
         |term AS (SELECT source, np, nq, vocab,
         |    CAST(floor(1000000.0 * ((cp + 1)::DOUBLE / (np + vocab)::DOUBLE)
         |      * ln(((cp + 1)::DOUBLE / (np + vocab)::DOUBLE)
         |           / ((cq + 1)::DOUBLE / (nq + vocab)::DOUBLE)) + 0.5) AS BIGINT) AS term_micro
         |  FROM counts JOIN tot USING (source))
         |SELECT source, max(np) AS n_late_tokens, max(nq) AS n_early_tokens,
         |       max(vocab) AS vocab, CAST(SUM(term_micro) AS BIGINT) AS kl_micro_nats
         |FROM term GROUP BY source""".stripMargin,

    // t35's bounded-state form: KL over DriftBuckets hashed token buckets, with the
    // nonzero Laplace term of every UNOBSERVED bucket added once per empty bucket —
    // mirror of TextStats.sourceDriftHashed
    "t37_drift_hashed" ->
      s"""WITH toks AS (SELECT source, doc_id < $SourceDriftCut AS early,
         |    ('0x' || substr(md5(token), 1, 15))::BIGINT % $DriftBuckets AS bucket
         |  FROM (SELECT source, doc_id, unnest(string_split(text, ' ')) AS token FROM documents)),
         |counts AS (SELECT source, bucket,
         |    CAST(SUM(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS cq,
         |    CAST(SUM(CASE WHEN early THEN 0 ELSE 1 END) AS BIGINT) AS cp
         |  FROM toks GROUP BY 1, 2),
         |tot AS (SELECT source, CAST(SUM(cp) AS BIGINT) AS np, CAST(SUM(cq) AS BIGINT) AS nq
         |        FROM counts GROUP BY 1),
         |term AS (SELECT source, np, nq,
         |    CAST(floor(1000000.0 * ((cp + 1)::DOUBLE / (np + $DriftBuckets)::DOUBLE)
         |      * ln(((cp + 1)::DOUBLE / (np + $DriftBuckets)::DOUBLE)
         |           / ((cq + 1)::DOUBLE / (nq + $DriftBuckets)::DOUBLE)) + 0.5) AS BIGINT)
         |      AS term_micro
         |  FROM counts JOIN tot USING (source)),
         |agg AS (SELECT source, max(np) AS n_late_tokens, max(nq) AS n_early_tokens,
         |          COUNT(*) AS n_obs, CAST(SUM(term_micro) AS BIGINT) AS obs_micro
         |        FROM term GROUP BY source)
         |SELECT source, n_late_tokens, n_early_tokens,
         |  CAST(obs_micro + ($DriftBuckets - n_obs) *
         |    CAST(floor(1000000.0 * (1.0 / (n_late_tokens + $DriftBuckets)::DOUBLE)
         |      * ln((1.0 / (n_late_tokens + $DriftBuckets)::DOUBLE)
         |           / (1.0 / (n_early_tokens + $DriftBuckets)::DOUBLE)) + 0.5) AS BIGINT)
         |    AS BIGINT) AS kl_micro_nats
         |FROM agg""".stripMargin,

    // interpolated bigram LM score per doc (λ·P_bi + (1−λ)·P_uni, integer micro-nat
    // per-bigram log-probs, exact integer sums) — mirror of TextStats.bigramLogProb
    "t27_bigram_logprob" -> {
      val lam = BigramLambdaMicro.toDouble / 1000000.0
      s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |big AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
         |        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i FROM base)),
         |docb AS (SELECT doc_id, w1, w2, count(*) AS tf FROM big GROUP BY 1, 2, 3),
         |bm AS (SELECT w1, w2, count(*) AS cb FROM big GROUP BY 1, 2),
         |cm AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cw1 FROM bm GROUP BY 1),
         |uc AS (SELECT token, count(*) AS cu
         |       FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) GROUP BY 1),
         |tot AS (SELECT CAST(sum(cu) AS BIGINT) AS n_total FROM uc),
         |lp AS (SELECT w1, w2,
         |        CAST(floor(1000000.0 * ln($lam * (cb::DOUBLE / cw1::DOUBLE)
         |          + ${1.0 - lam} * (cu::DOUBLE / n_total::DOUBLE)) + 0.5) AS BIGINT) AS lp_micro
         |       FROM bm JOIN cm USING (w1) JOIN uc ON uc.token = bm.w2 CROSS JOIN tot),
         |per AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
         |               CAST(sum(tf * lp_micro) AS BIGINT) AS sum_lp_micro
         |        FROM docb JOIN lp USING (w1, w2) GROUP BY 1)
         |SELECT doc_id, n_bigrams, sum_lp_micro,
         |  CAST(floor(sum_lp_micro::DOUBLE / n_bigrams::DOUBLE + 0.5) AS BIGINT) AS avg_lp_micro
         |FROM per""".stripMargin
    },

    // hashed linear bag-of-words quality classifier (md5 slot, Knuth multiplicative
    // pseudo-weights in exact milli-units, sign decision) — mirror of
    // TextStats.linearQuality
    // logistic-regression training unrolled as chained CTEs (the kmeansCtes
    // discipline): weights are exact integer micro-units, margins/gradients are
    // order-free BIGINT sums, the only floats per round are the per-doc sigmoid
    // (quantized straight back to micro) and the per-slot step — mirror of
    // TextStats.lrQualityTrain over the shared LrBuckets/LrRounds/LrRateMicro
    "t38_lr_train" ->
      s"""WITH ${lrTrainCtes(LrRounds)}
         |SELECT slot, w AS w_micro FROM w$LrRounds""".stripMargin,

    // mini-batch rounds, the same unroll with per-round batch filters — mirror
    // of TextStats.lrQualityTrainMiniBatch
    "t43_lr_train_minibatch" ->
      s"""WITH ${lrTrainMiniBatchCtes(LrMiniRounds, LrMiniBatches)}
         |SELECT slot, w AS w_micro FROM w$LrMiniRounds""".stripMargin,

    // the trained model applied: exact integer margins with the final round's
    // weights, sigmoid quantized to micro, sign-test verdict — mirror of
    // TextStats.lrScoreWith over the saved-artifact round trip (integer weights
    // survive parquet bit-exactly, so t39 shares the training CTEs verbatim)
    "t39_lr_score_saved" ->
      s"""WITH ${lrTrainCtes(LrRounds)},
         |mgf AS (SELECT tf.doc_id, CAST(SUM(tf.tf * COALESCE(w.w, 0)) AS BIGINT) AS margin_micro
         |        FROM tf LEFT JOIN w$LrRounds w USING (slot) GROUP BY 1)
         |SELECT doc_id, margin_micro,
         |  CAST(floor(1000000.0 / (1.0 + exp(-(margin_micro::DOUBLE / 1000000.0))) + 0.5)
         |    AS BIGINT) AS p_micro,
         |  CASE WHEN margin_micro > 0 THEN 'keep' ELSE 'drop' END AS label
         |FROM mgf""".stripMargin,

    // per-source tokenizer fertility/compression over the t25 pricing CTEs —
    // mirror of TextStats.bpeFertility
    "t40_bpe_fertility" ->
      s"""WITH $bpeEncodeCtes,
         |per AS (SELECT tf.doc_id,
         |          CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |          CAST(SUM(tf * length(token)) AS BIGINT) AS n_chars,
         |          CAST(SUM(tf * n_sym) AS BIGINT) AS n_syms
         |        FROM tf JOIN enc USING (token) GROUP BY 1),
         |g AS (SELECT d.source, COUNT(*) AS n_docs,
         |        CAST(SUM(per.n_tokens) AS BIGINT) AS n_tokens,
         |        CAST(SUM(per.n_chars) AS BIGINT) AS n_chars,
         |        CAST(SUM(per.n_syms) AS BIGINT) AS n_syms
         |      FROM per JOIN documents d USING (doc_id) GROUP BY 1)
         |SELECT source, n_docs, n_tokens, n_chars, n_syms,
         |  CAST(floor(1000000.0 * n_syms::DOUBLE / n_tokens::DOUBLE + 0.5) AS BIGINT)
         |    AS fertility_micro,
         |  CAST(floor(1000000.0 * n_chars::DOUBLE / n_syms::DOUBLE + 0.5) AS BIGINT)
         |    AS compression_micro
         |FROM g""".stripMargin,

    // reliability table of the trained gate: scored docs bucketed by predicted
    // decile, mean prediction vs empirical positive rate per bin — mirror of
    // TextStats.lrCalibration composed from the training CTEs
    "t44_lr_calibration" -> {
      val binWidth = 1000000L / CalibrationBins
      s"""WITH ${lrTrainCtes(LrRounds)},
         |mgf AS (SELECT tf.doc_id, CAST(SUM(tf.tf * COALESCE(w.w, 0)) AS BIGINT) AS m
         |        FROM tf LEFT JOIN w$LrRounds w USING (slot) GROUP BY 1),
         |sc AS (SELECT mgf.doc_id,
         |         CAST(floor(1000000.0 / (1.0 + exp(-(m::DOUBLE / 1000000.0))) + 0.5) AS BIGINT)
         |           AS p_micro,
         |         lab.kept AS y
         |       FROM mgf JOIN lab USING (doc_id)),
         |agg AS (SELECT least(p_micro // $binWidth, ${CalibrationBins - 1}) AS bin,
         |          COUNT(*) AS n_docs,
         |          CAST(SUM(y) AS BIGINT) AS n_pos,
         |          CAST(floor(SUM(p_micro)::DOUBLE / COUNT(*)::DOUBLE + 0.5) AS BIGINT)
         |            AS pred_micro,
         |          CAST(floor(1000000.0 * SUM(y)::DOUBLE / COUNT(*)::DOUBLE + 0.5) AS BIGINT)
         |            AS actual_micro
         |        FROM sc GROUP BY 1)
         |SELECT CAST(bin AS BIGINT) AS bin, n_docs, n_pos, pred_micro, actual_micro,
         |  pred_micro - actual_micro AS gap_micro
         |FROM agg""".stripMargin
    },

    // Flesch reading ease off three exact integer counts (whitespace words,
    // terminator sentences floored at 1, vowel-run syllables via the two-
    // regexp_replace length difference), ONE double expression with the
    // published constants as identical literals (ev24 foldable-constant
    // convention), micro-quantized once — mirror of TextStats.readability
    "t49_readability" ->
      """WITH base AS (SELECT doc_id, text, lower(text) AS low FROM documents),
        |c AS (SELECT doc_id,
        |        CAST((length(text) - length(replace(text, ' ', ''))) + 1 AS BIGINT) AS n_words,
        |        greatest(CAST(
        |            (length(text) - length(replace(text, '.', '')))
        |          + (length(text) - length(replace(text, '!', '')))
        |          + (length(text) - length(replace(text, '?', ''))) AS BIGINT),
        |          CAST(1 AS BIGINT)) AS n_sentences,
        |        greatest(CAST(
        |            length(regexp_replace(low, '[aeiou]+', 'a', 'g'))
        |          - length(regexp_replace(low, '[aeiou]+', '', 'g')) AS BIGINT),
        |          CAST(1 AS BIGINT)) AS n_syllables
        |      FROM base),
        |f AS (SELECT doc_id, n_words, n_sentences, n_syllables,
        |        CAST(floor(1000000.0 * (206.835
        |            - 1.015 * (n_words::DOUBLE / n_sentences::DOUBLE)
        |            - 84.6 * (n_syllables::DOUBLE / n_words::DOUBLE)) + 0.5) AS BIGINT)
        |          AS flesch_micro
        |      FROM c)
        |SELECT doc_id, n_words, n_sentences, n_syllables, flesch_micro,
        |  CASE WHEN flesch_micro >= 70000000 THEN 'easy'
        |       WHEN flesch_micro >= 50000000 THEN 'standard'
        |       WHEN flesch_micro >= 30000000 THEN 'difficult'
        |       ELSE 'very_difficult' END AS band
        |FROM f""".stripMargin,

    // Gopher repetition battery: word n-grams unrolled per (position, n), top
    // n-gram (n = 2..4) and duplicated n-gram (n = 5..10) character coverage as
    // exact integer micro fractions, the published thresholds as a reason
    // bitmask — mirror of TextStats.gopherRepetition
    "t46_gopher_repetition" -> gopherRepetitionSql,

    // Gopher document-quality battery: seven integer-exact rules over the
    // split-word and split-line arrays, division-free threshold comparisons —
    // mirror of TextStats.gopherQuality
    "t47_gopher_quality" -> gopherQualitySql,

    // the FULL Gopher filter: both battery mirrors joined per document,
    // kept ⇔ both masks are zero — mirror of TextStats.gopherGate
    "t48_gopher_gate" ->
      s"""SELECT q.doc_id, q.n_words, r.n_chars,
         |  q.reasons AS quality_reasons, r.reasons AS rep_reasons,
         |  CAST(CASE WHEN q.reasons = 0 AND r.reasons = 0 THEN 1 ELSE 0 END AS INTEGER)
         |    AS kept
         |FROM ($gopherQualitySql) q JOIN ($gopherRepetitionSql) r USING (doc_id)""".stripMargin,


    // unigram trainer: substring-seeded vocab, per-round Viterbi forward DP +
    // smallest-start backtrack (recursive CTEs carrying the dp list), exact
    // count re-estimation, coverage-safe prune — mirror of TextStats.unigramTrain
    "t52_unigram_train" ->
      s"""WITH RECURSIVE ${unigramCtes(UnigramRounds)}
         |SELECT piece, n_uses, lp AS lp_micro FROM v$UnigramRounds""".stripMargin,

    // the trained vocab Viterbi-pricing every document (t26 round-trip: integer
    // micro-nats survive parquet bit-exactly, so the mirror replays in-session)
    "t53_unigram_encode" ->
      s"""WITH RECURSIVE ${unigramCtes(UnigramRounds)},
         |${unigramViterbiPair(UnigramRounds + 1, s"v$UnigramRounds")},
         |nsym AS (SELECT token, CAST(COUNT(piece) AS BIGINT) AS n_sym
         |         FROM bt${UnigramRounds + 1} WHERE piece IS NOT NULL GROUP BY 1),
         |dtf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |        FROM toks WHERE len(token) >= 1 GROUP BY 1, 2)
         |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |  CAST(SUM(tf * len(token)) AS BIGINT) AS n_chars,
         |  CAST(SUM(tf * n_sym) AS BIGINT) AS n_syms
         |FROM dtf JOIN nsym USING (token) GROUP BY 1""".stripMargin,

    // the trained vocab SAMPLING-pricing every document: forward filter
    // (α-scaled log-sum-exp, micro-quantized) + md5-draw backward sampling —
    // mirror of TextStats.unigramEncodeSampled through the artifact round trip
    "t55_unigram_sampled" ->
      s"""WITH RECURSIVE ${unigramCtes(UnigramRounds)},
         |${unigramSampledPair(UnigramRounds + 1, s"v$UnigramRounds")},
         |dtf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |        FROM toks WHERE len(token) >= 1 GROUP BY 1, 2)
         |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |  CAST(SUM(tf * len(token)) AS BIGINT) AS n_chars,
         |  CAST(SUM(tf * n_sym) AS BIGINT) AS n_syms
         |FROM dtf JOIN nsyms${UnigramRounds + 1} USING (token) GROUP BY 1""".stripMargin,

    // the t54 totals deciding, then the CHOSEN family's per-doc pricing — a
    // gated UNION over the two arms; mirror of TextStats.tokenizerSwapEpoch
    "t56_tokenizer_swap" ->
      s"""WITH RECURSIVE ${unigramCtes(UnigramRounds)},
         |${unigramViterbiPair(UnigramRounds + 1, s"v$UnigramRounds")},
         |nsym AS (SELECT token, CAST(COUNT(piece) AS BIGINT) AS n_sym
         |         FROM bt${UnigramRounds + 1} WHERE piece IS NOT NULL GROUP BY 1),
         |dtf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |        FROM toks WHERE len(token) >= 1 GROUP BY 1, 2),
         |${bpeEncodeCtesOverToks()},
         |ub AS (SELECT CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |         CAST(SUM(tf * n_sym) AS BIGINT) AS n_syms
         |       FROM dtf JOIN nsym USING (token)),
         |bb AS (SELECT CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |         CAST(SUM(tf * n_sym) AS BIGINT) AS n_syms
         |       FROM tf JOIN enc USING (token)),
         |dec AS (SELECT CASE
         |    WHEN ub.n_tokens IS NULL OR ub.n_tokens = 0
         |      OR bb.n_tokens IS NULL OR bb.n_tokens = 0 THEN 'hold'
         |    WHEN (2 * 1000000 * ub.n_syms + ub.n_tokens) // (2 * ub.n_tokens)
         |         + $TokenizerSwapMarginMicro
         |         <= (2 * 1000000 * bb.n_syms + bb.n_tokens) // (2 * bb.n_tokens)
         |      THEN 'swap'
         |    ELSE 'block' END AS action FROM ub, bb),
         |uarm AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |           CAST(SUM(tf * len(token)) AS BIGINT) AS n_chars,
         |           CAST(SUM(tf * n_sym) AS BIGINT) AS n_syms
         |         FROM dtf JOIN nsym USING (token) GROUP BY 1),
         |barm AS (SELECT tf.doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |           CAST(SUM(tf * length(token)) AS BIGINT) AS n_chars,
         |           CAST(SUM(tf * n_sym) AS BIGINT) AS n_syms
         |         FROM tf JOIN enc USING (token) GROUP BY 1)
         |SELECT doc_id, 'unigram' AS tokenizer, n_tokens, n_chars, n_syms, action
         |FROM uarm, dec WHERE action = 'swap'
         |UNION ALL
         |SELECT doc_id, 'bpe' AS tokenizer, n_tokens, n_chars, n_syms, action
         |FROM barm, dec WHERE action <> 'swap'""".stripMargin,

    // the two trained tokenizer families priced on one corpus, one row each —
    // BPE chain and unigram chain share the toks CTE, totals are 1-row rollups
    "t54_tokenizer_card" ->
      s"""WITH RECURSIVE ${unigramCtes(UnigramRounds)},
         |${unigramViterbiPair(UnigramRounds + 1, s"v$UnigramRounds")},
         |nsym AS (SELECT token, CAST(COUNT(piece) AS BIGINT) AS n_sym
         |         FROM bt${UnigramRounds + 1} WHERE piece IS NOT NULL GROUP BY 1),
         |dtf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |        FROM toks WHERE len(token) >= 1 GROUP BY 1, 2),
         |${bpeEncodeCtesOverToks()},
         |ub AS (SELECT CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |         CAST(SUM(tf * len(token)) AS BIGINT) AS n_chars,
         |         CAST(SUM(tf * n_sym) AS BIGINT) AS n_syms
         |       FROM dtf JOIN nsym USING (token)),
         |bb AS (SELECT CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |         CAST(SUM(tf * length(token)) AS BIGINT) AS n_chars,
         |         CAST(SUM(tf * n_sym) AS BIGINT) AS n_syms
         |       FROM tf JOIN enc USING (token))
         |SELECT 'bpe' AS tokenizer, n_tokens, n_chars, n_syms,
         |  CAST((2 * 1000000 * n_syms + n_tokens) // (2 * n_tokens) AS BIGINT)
         |    AS syms_per_token_micro,
         |  CAST((2 * 1000000 * n_chars + n_syms) // (2 * n_syms) AS BIGINT)
         |    AS chars_per_sym_micro
         |FROM bb
         |UNION ALL
         |SELECT 'unigram' AS tokenizer, n_tokens, n_chars, n_syms,
         |  CAST((2 * 1000000 * n_syms + n_tokens) // (2 * n_tokens) AS BIGINT)
         |    AS syms_per_token_micro,
         |  CAST((2 * 1000000 * n_chars + n_syms) // (2 * n_syms) AS BIGINT)
         |    AS chars_per_sym_micro
         |FROM ub""".stripMargin,

    // CCNet perplexity tertiles: stupid-backoff bigram LM trained on the
    // reference source only, every document scored against it (seen-bigram /
    // unigram-backoff / pinned-OOV three-way per bigram, integer micro-nat
    // quantization), exact tertiles by rank with the rfm bucket formula —
    // mirror of TextStats.ccnetTertiles
    "t45_ccnet_tertiles" ->
      s"""WITH base AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
         |big AS (SELECT doc_id, source, w[i] AS w1, w[i + 1] AS w2
         |        FROM (SELECT doc_id, source, w, unnest(generate_series(1, len(w) - 1)) AS i
         |              FROM base)),
         |docb AS (SELECT doc_id, w1, w2, count(*) AS tf FROM big GROUP BY 1, 2, 3),
         |bm AS (SELECT w1, w2, count(*) AS cb FROM big
         |       WHERE source = '$DsirTargetSource' GROUP BY 1, 2),
         |cm AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cw1 FROM bm GROUP BY 1),
         |uni AS (SELECT token AS w2, count(*) AS cu
         |        FROM (SELECT unnest(w) AS token FROM base WHERE source = '$DsirTargetSource')
         |        GROUP BY 1),
         |tot AS (SELECT CAST(sum(cu) AS BIGINT) AS n_ref FROM uni),
         |sc AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
         |         CAST(sum(tf * CASE
         |           WHEN cb IS NOT NULL THEN
         |             CAST(floor(1000000.0 * ln(cb::DOUBLE / cw1::DOUBLE) + 0.5) AS BIGINT)
         |           WHEN cu IS NOT NULL THEN
         |             CAST(floor(1000000.0 * ln(0.4 * (cu::DOUBLE / n_ref::DOUBLE)) + 0.5)
         |               AS BIGINT)
         |           ELSE $CcnetOovLpMicro END) AS BIGINT) AS sum_lp
         |       FROM docb
         |         LEFT JOIN (SELECT bm.w1, bm.w2, cb, cw1 FROM bm JOIN cm USING (w1)) m
         |           USING (w1, w2)
         |         LEFT JOIN uni USING (w2) CROSS JOIN tot
         |       GROUP BY 1),
         |per AS (SELECT d.doc_id, COALESCE(n_bigrams, 0) AS n_bigrams,
         |          CASE WHEN n_bigrams IS NULL THEN $CcnetOovLpMicro
         |               ELSE CAST(floor(sum_lp::DOUBLE / n_bigrams::DOUBLE + 0.5) AS BIGINT)
         |          END AS avg_lp_micro
         |        FROM (SELECT doc_id FROM documents) d LEFT JOIN sc USING (doc_id)),
         |n AS (SELECT count(*) AS n_docs FROM per),
         |rk AS (SELECT *, row_number() OVER (ORDER BY avg_lp_micro DESC, doc_id) AS rank
         |       FROM per)
         |SELECT doc_id, n_bigrams, avg_lp_micro,
         |  CAST(1 + (rank - 1) * 3 // n_docs AS BIGINT) AS tertile,
         |  CASE CAST(1 + (rank - 1) * 3 // n_docs AS BIGINT)
         |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
         |FROM rk CROSS JOIN n""".stripMargin,

    // confusion rollup of the trained gate vs its t05 supervision over scored
    // docs — mirror of TextStats.lrQualityEval composed from the training CTEs
    "t41_lr_eval" ->
      s"""WITH $lrEvalCtes
         |SELECT n_scored, tp, fp, fn, tn, precision_micro, recall_micro, agreement_micro
         |FROM evalrow""".stripMargin,

    // the gate-swap decision over the t41 eval row (shared CTEs): the three-way
    // verdict against the pinned thresholds — mirror of TextStats.gateSwapDecision
    "t42_gate_swap" ->
      s"""WITH $lrEvalCtes
         |SELECT n_scored, agreement_micro, precision_micro, recall_micro,
         |  CASE WHEN n_scored = 0 THEN 'hold'
         |       WHEN agreement_micro >= $GateMinAgreementMicro
         |            AND precision_micro >= $GateMinPrecisionMicro
         |            AND recall_micro >= $GateMinRecallMicro THEN 'swap'
         |       ELSE 'block' END AS action
         |FROM evalrow""".stripMargin,

    "t28_linear_quality" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |s AS (SELECT doc_id,
         |        ('0x' || substr(md5(token), 1, 15))::BIGINT % $LinearQualityBuckets AS slot
         |      FROM toks),
         |w AS (SELECT doc_id, (slot * 2654435761) % 2001 - 1000 AS w FROM s),
         |per AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |               CAST(SUM(w) AS BIGINT) AS score_milli FROM w GROUP BY 1)
         |SELECT doc_id, n_tokens, score_milli,
         |  CAST(floor(score_milli::DOUBLE * 1000.0 / n_tokens::DOUBLE + 0.5) AS BIGINT)
         |    AS score_micro_per_token,
         |  CASE WHEN score_milli > 0 THEN 'keep' ELSE 'drop' END AS label
         |FROM per""".stripMargin,

    // interpolated Kneser–Ney bigram LM score per doc: P_KN(w2|w1) =
    // (cb−D)/cw1 + (D·N1+(w1,·)/cw1)·(N1+(·,w2)/N1+(··)), integer micro-nat
    // quantization, exact integer per-doc sums — mirror of TextStats.kneserNeyLogProb
    // with the shared discount constant interpolated
    "t29_kneser_ney" -> {
      val d = KneserNeyDiscountMicro.toDouble / 1000000.0
      s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |big AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
         |        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i FROM base)),
         |docb AS (SELECT doc_id, w1, w2, count(*) AS tf FROM big GROUP BY 1, 2, 3),
         |bm AS (SELECT w1, w2, count(*) AS cb FROM big GROUP BY 1, 2),
         |cm AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cw1, count(*) AS n1w1 FROM bm GROUP BY 1),
         |cont AS (SELECT w2, count(*) AS ncw2 FROM bm GROUP BY 1),
         |tot AS (SELECT count(*) AS n_big FROM bm),
         |lp AS (SELECT w1, w2,
         |        CAST(floor(1000000.0 * ln((cb::DOUBLE - $d) / cw1::DOUBLE
         |          + $d * n1w1::DOUBLE / cw1::DOUBLE * (ncw2::DOUBLE / n_big::DOUBLE)) + 0.5)
         |          AS BIGINT) AS lp_micro
         |       FROM bm JOIN cm USING (w1) JOIN cont USING (w2) CROSS JOIN tot),
         |per AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
         |               CAST(sum(tf * lp_micro) AS BIGINT) AS sum_lp_micro
         |        FROM docb JOIN lp USING (w1, w2) GROUP BY 1)
         |SELECT doc_id, n_bigrams, sum_lp_micro,
         |  CAST(floor(sum_lp_micro::DOUBLE / n_bigrams::DOUBLE + 0.5) AS BIGINT) AS avg_lp_micro
         |FROM per""".stripMargin
    },

    // temperature-scaled corpus mixing weights: p_i ∝ (n_i/N)^α, the pow() output
    // quantized to integer micro-units so normalization is exact-integer — mirror of
    // Sampling.temperatureMix with the shared α constant interpolated
    "t30_temperature_mix" -> {
      val a = MixAlphaMicro.toDouble / 1000000.0
      s"""WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM c),
         |w AS (SELECT source, n_docs, n_total,
         |        CAST(floor(1000000.0 * pow(n_docs::DOUBLE / n_total::DOUBLE, $a) + 0.5)
         |          AS BIGINT) AS weight_micro
         |      FROM c CROSS JOIN tot),
         |wt AS (SELECT CAST(SUM(weight_micro) AS BIGINT) AS w_total FROM w)
         |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
         |  round(n_docs::DOUBLE / n_total::DOUBLE, 6) AS share,
         |  weight_micro,
         |  round(weight_micro::DOUBLE / w_total::DOUBLE, 6) AS p_sample,
         |  round((weight_micro * n_total)::DOUBLE / (w_total * n_docs)::DOUBLE, 6) AS boost
         |FROM w CROSS JOIN wt""".stripMargin
    },

    // adjacent-token PMI: pair and unigram counts off the same split arrays, corpus
    // totals as single-row cross joins, ln sequence quantized to integer micro-units
    // — mirror of TextStats.pmiPairs (generate_series(1,0) is empty in DuckDB, so the
    // len>=2 guard is only needed for the pair-total arm)
    "t33_pmi_pairs" ->
      s"""WITH base AS (SELECT string_split(text, ' ') AS w FROM documents),
         |big AS (SELECT w[i] AS w1, w[i + 1] AS w2
         |        FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i FROM base)),
         |pc AS (SELECT w1, w2, COUNT(*) AS n_pair FROM big GROUP BY 1, 2
         |       HAVING COUNT(*) >= $PmiMinCount),
         |u AS (SELECT token, COUNT(*) AS n_tok
         |      FROM (SELECT unnest(w) AS token FROM base) GROUP BY 1),
         |tt AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS n_tokens_total FROM u),
         |pt AS (SELECT CAST(SUM(CASE WHEN len(w) >= 2 THEN len(w) - 1 ELSE 0 END)
         |         AS BIGINT) AS n_pairs_total FROM base)
         |SELECT w1, w2, n_pair, n_w1, n_w2, pmi_micro FROM (
         |  SELECT pc.w1, pc.w2, CAST(pc.n_pair AS BIGINT) AS n_pair,
         |    CAST(u1.n_tok AS BIGINT) AS n_w1, CAST(u2.n_tok AS BIGINT) AS n_w2,
         |    CAST(floor(1000000.0 * ln(
         |      (pc.n_pair::DOUBLE / n_pairs_total::DOUBLE) /
         |        ((u1.n_tok::DOUBLE / n_tokens_total::DOUBLE)
         |          * (u2.n_tok::DOUBLE / n_tokens_total::DOUBLE))) + 0.5) AS BIGINT)
         |      AS pmi_micro
         |  FROM pc JOIN u u1 ON u1.token = pc.w1 JOIN u u2 ON u2.token = pc.w2
         |  CROSS JOIN tt CROSS JOIN pt)
         |ORDER BY pmi_micro DESC, w1, w2 LIMIT $PmiK""".stripMargin,

    // Zipf fit over the vocabulary head: per-row micro-quantized ln, EXACT integer
    // regression power sums, fixed double sequence for slope/intercept/R² — mirror of
    // TextStats.zipfFit
    "t34_zipf_fit" ->
      s"""WITH u AS (SELECT token, COUNT(*) AS n_occurrences
         |           FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
         |           GROUP BY 1 ORDER BY n_occurrences DESC, token LIMIT $ZipfFitK),
         |r AS (SELECT n_occurrences,
         |        row_number() OVER (ORDER BY n_occurrences DESC, token) AS rank FROM u),
         |q AS (SELECT CAST(floor(1000000.0 * ln(rank::DOUBLE) + 0.5) AS BIGINT) AS lx,
         |             CAST(floor(1000000.0 * ln(n_occurrences::DOUBLE) + 0.5) AS BIGINT)
         |               AS ly FROM r),
         |s AS (SELECT COUNT(*) AS n, SUM(lx) AS sx, SUM(ly) AS sy, SUM(lx * ly) AS sxy,
         |             SUM(lx * lx) AS sxx, SUM(ly * ly) AS syy FROM q),
         |d AS (SELECT n, n::DOUBLE AS nd, sx::DOUBLE AS sxd, sy::DOUBLE AS syd,
         |             sxy::DOUBLE AS sxyd, sxx::DOUBLE AS sxxd, syy::DOUBLE AS syyd
         |      FROM s),
         |f AS (SELECT n, nd, sxd, syd,
         |        nd * sxyd - sxd * syd AS covnum,
         |        nd * sxxd - sxd * sxd AS varx,
         |        nd * syyd - syd * syd AS vary
         |      FROM d),
         |g AS (SELECT n, nd, sxd, syd, covnum, varx, vary,
         |        CASE WHEN varx = 0.0 THEN 0.0 ELSE covnum / varx END AS slope,
         |        CASE WHEN varx * vary = 0.0 THEN 0.0
         |             ELSE covnum * covnum / (varx * vary) END AS r2
         |      FROM f)
         |SELECT CAST(n AS BIGINT) AS n_fit,
         |  CAST(floor(1000000.0 * slope + 0.5) AS BIGINT) AS slope_micro,
         |  CAST(floor((syd - slope * sxd) / nd + 0.5) AS BIGINT) AS intercept_micro,
         |  CAST(floor(1000000.0 * r2 + 0.5) AS BIGINT) AS r2_micro
         |FROM g""".stripMargin,

    // Heaps'-law fit: the t34 regression tail over the t32 vocabulary-growth points
    // (ln cum_tokens vs ln vocab) — mirror of TextStats.heapsFit
    "t36_heaps_fit" ->
      s"""WITH toks0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |toks AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT AS h FROM toks0),
         |dv0 AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1),
         |dv AS (SELECT doc_id // $VocabBucketDocs AS bucket, COUNT(*) AS n_docs,
         |              CAST(SUM(n) AS BIGINT) AS n_tokens
         |       FROM dv0 GROUP BY 1),
         |nv AS (SELECT first_id // $VocabBucketDocs AS bucket, COUNT(*) AS new_vocab
         |       FROM (SELECT h, MIN(doc_id) AS first_id FROM toks GROUP BY 1)
         |       GROUP BY 1),
         |growth AS (SELECT bucket,
         |    CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens,
         |    CAST(SUM(COALESCE(new_vocab, 0)) OVER w AS BIGINT) AS vocab
         |  FROM dv LEFT JOIN nv USING (bucket)
         |  WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |q AS (SELECT CAST(floor(1000000.0 * ln(cum_tokens::DOUBLE) + 0.5) AS BIGINT) AS lx,
         |             CAST(floor(1000000.0 * ln(vocab::DOUBLE) + 0.5) AS BIGINT) AS ly
         |      FROM growth WHERE cum_tokens > 0 AND vocab > 0),
         |s AS (SELECT COUNT(*) AS n, SUM(lx) AS sx, SUM(ly) AS sy, SUM(lx * ly) AS sxy,
         |             SUM(lx * lx) AS sxx, SUM(ly * ly) AS syy FROM q),
         |d AS (SELECT n, n::DOUBLE AS nd, sx::DOUBLE AS sxd, sy::DOUBLE AS syd,
         |             sxy::DOUBLE AS sxyd, sxx::DOUBLE AS sxxd, syy::DOUBLE AS syyd
         |      FROM s),
         |f AS (SELECT n, nd, sxd, syd,
         |        nd * sxyd - sxd * syd AS covnum,
         |        nd * sxxd - sxd * sxd AS varx,
         |        nd * syyd - syd * syd AS vary
         |      FROM d),
         |g AS (SELECT n, nd, sxd, syd, covnum, varx, vary,
         |        CASE WHEN varx = 0.0 THEN 0.0 ELSE covnum / varx END AS slope,
         |        CASE WHEN varx * vary = 0.0 THEN 0.0
         |             ELSE covnum * covnum / (varx * vary) END AS r2
         |      FROM f)
         |SELECT CAST(n AS BIGINT) AS n_fit,
         |  CAST(floor(1000000.0 * slope + 0.5) AS BIGINT) AS slope_micro,
         |  CAST(floor((syd - slope * sxd) / nd + 0.5) AS BIGINT) AS intercept_micro,
         |  CAST(floor(1000000.0 * r2 + 0.5) AS BIGINT) AS r2_micro
         |FROM g""".stripMargin,
  )
}
