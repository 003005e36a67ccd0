package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Layout, Multimodal, Sampling, Similarity, Sketches, TextStats}
import graft.testgraph.TestGraph

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 (graph engine) or one
  * training-data-pipeline operator, and every entry in [[oracleSql]] is the equivalent
  * DuckDB SQL over the same parquet tables. Column names and types are aligned pairwise
  * (the driver's compare sorts columns by name and hashes values).
  */
object SparkEntry extends OracleFragments {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    GraphQueries.adjacencyTopK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ pipeline extensions). */
  def queries: Map[String, Q] = Map[String, Q](
    // --- graph engine (FlockDB semantics over the TestGraph edge log) ---
    "g01_lww_snapshot"     -> (GraphQueries.lwwSnapshot _),
    "g02_adjacency_topk"   -> (GraphQueries.adjacencyTopK _),
    "g03_intersection"     -> (GraphQueries.intersection _),
    "g04_difference"       -> (GraphQueries.difference _),
    "g05_union"            -> (GraphQueries.union _),
    "g06_reciprocal"       -> (GraphQueries.reciprocal _),
    "g07_metadata"         -> (GraphQueries.metadata _),
    "g08_count2_estimates" -> (GraphQueries.count2Estimates _),
    "g09_cursor_page"      -> (GraphQueries.cursorPage _),
    "g10_contains"         -> (GraphQueries.containsSet _),
    "g11_where_in"         -> (GraphQueries.whereIn _),
    "g12_execute_lww"      -> (GraphQueries.executeLww _),
    "g13_bulk_archive"     -> (GraphQueries.bulkArchive _),
    "g14_copy_repair"      -> (GraphQueries.copyRepair _),
    "g15_nested_compound"  -> (GraphQueries.nestedCompound _),
    "g16_uuid_functions"   -> (GraphQueries.uuidFunctions _),
    "g17_pagerank"         -> (GraphQueries.pageRank _),
    "g18_vertex_domination" -> (GraphQueries.vertexDomination _),
    "g19_backward_ops"      -> (GraphQueries.backwardOps _),
    "g20_metadata_registers" -> (GraphQueries.metadataRegisters _),
    "g21_triangles"         -> (GraphQueries.triangleCounts _),
    "g22_label_propagation" -> (GraphQueries.labelPropagation _),
    "g23_two_hop"           -> (GraphQueries.twoHop _),
    "g24_degree_histogram"  -> (GraphQueries.degreeHistogram _),
    "g25_node_jaccard"      -> (GraphQueries.nodeJaccard _),
    "g26_metadata_patched"  -> (GraphQueries.metadataPatchedQuery _),
    "g27_kcore"             -> ((s: SparkSession, dir: String) =>
      GraphQueries.kCore(s, dir, k = 20, rounds = 3)),
    "g28_clustering_coeff"  -> (GraphQueries.clusteringCoefficient _),
    "g29_connected_components" -> ((s: SparkSession, dir: String) =>
      GraphQueries.connectedComponents(s, dir)),
    "g30_assortativity"     -> (GraphQueries.assortativity _),
    "g31_adamic_adar"       -> (GraphQueries.adamicAdar _),
    "g32_personalized_pagerank" -> (GraphQueries.personalizedPageRank _),
    "g33_hits"              -> (GraphQueries.hits _),
    "g34_bfs_distance"      -> ((s: SparkSession, dir: String) =>
      GraphQueries.bfsDistance(s, dir, maxHops = 3)),
    "g35_friend_recs"       -> ((s: SparkSession, dir: String) =>
      GraphQueries.friendRecs(s, dir, k = 5)),
    "g36_local_bridges"     -> (GraphQueries.localBridges _),
    "g37_decayed_pagerank"  -> (GraphQueries.decayedPageRank _),
    "g38_ktruss"            -> ((s: SparkSession, dir: String) =>
      GraphQueries.kTruss(s, dir, k = KTrussK, rounds = KTrussRounds)),
    "g39_sssp"              -> ((s: SparkSession, dir: String) =>
      GraphQueries.boundedSssp(s, dir, rounds = 3)),
    "g40_lpa_communities"   -> ((s: SparkSession, dir: String) =>
      GraphQueries.lpaCommunities(s, dir, rounds = LpaRounds)),
    "g41_snapshot_asof"     -> (GraphQueries.snapshotAsOf _),
    "g42_churn_between"     -> (GraphQueries.churnBetween _),
    "g43_salsa"             -> (GraphQueries.salsa _),
    "g44_harmonic"          -> ((s: SparkSession, dir: String) =>
      GraphQueries.harmonicCentrality(s, dir, maxHops = 3)),
    "g45_random_walks"      -> ((s: SparkSession, dir: String) =>
      GraphQueries.randomWalks(s, dir, steps = WalkSteps, seedMod = WalkSeedMod)),
    // --- general analytics (bench headliners) ---
    "q01_pricing_summary"    -> (AnalyticsQueries.pricingSummary _),
    "q03_top_revenue_orders" -> (AnalyticsQueries.topRevenueOrders _),
    "q05_region_revenue"     -> (AnalyticsQueries.regionRevenue _),
    "q06_revenue_rollup"     -> (AnalyticsQueries.regionRevenueRollup _),
    "q07_selective_revenue"  -> (AnalyticsQueries.selectiveRevenue _),
    "q02_brand_nation_volume" -> (AnalyticsQueries.brandNationVolume _),
    "ev1_user_event_stats"   -> (AnalyticsQueries.userEventStats _),
    "ev2_sessionize"         -> (AnalyticsQueries.sessionize _),
    "ev3_hourly_rollup"      -> (AnalyticsQueries.hourlyRollup _),
    "ev4_props_extract"      -> (AnalyticsQueries.propsExtract _),
    "ev5_hourly_top_users"   -> ((s: SparkSession, dir: String) =>
      AnalyticsQueries.hourlyTopUsers(s, dir, k = 3)),
    "ev6_hourly_retention"   -> (AnalyticsQueries.hourlyRetention _),
    "ev7_hourly_anomaly"     -> (AnalyticsQueries.hourlyAnomaly _),
    "ev8_asof_join"          -> ((s: SparkSession, dir: String) =>
      AnalyticsQueries.asofJoin(s, dir)),
    "ev9_funnel_stages"      -> (AnalyticsQueries.funnelStages _),
    "ev10_type_pivot"        -> (AnalyticsQueries.eventTypePivot _),
    "ev11_rolling_actives"   -> (AnalyticsQueries.rollingActiveUsers _),
    "q04_late_priority"      -> (AnalyticsQueries.latePriorityOrders _),
    "ev12_session_stats"     -> (AnalyticsQueries.sessionStats _),
    "q08_market_share"       -> (AnalyticsQueries.marketShare _),
    "ev13_churn"             -> (AnalyticsQueries.churnRollup _),
    "q09_returned_revenue"   -> (AnalyticsQueries.returnedRevenue _),
    // --- training-data pipeline: dedup / text analysis ---
    "d01_dedup_exact" -> ((s: SparkSession, dir: String) =>
      Dedup.exact(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    "t01_lang_id" -> ((s: SparkSession, dir: String) =>
      TextStats.langId(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", Some("lang"))),
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
    // --- training-data pipeline: near-dup detection ---
    "d02_minhash_lsh" -> ((s: SparkSession, dir: String) =>
      Dedup.minhashLshPairs(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        shingleSize = 3, bands = 16, rowsPerBand = 1)),
    "d03_simhash" -> ((s: SparkSession, dir: String) =>
      Dedup.simhash(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    "d04_ngram_jaccard" -> ((s: SparkSession, dir: String) =>
      Dedup.ngramJaccardPairs(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        shingleSize = 3, threshold = 0.2)),
    "d05_dedup_clusters" -> ((s: SparkSession, dir: String) =>
      Dedup.dedupClusters(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    "d06_contamination" -> ((s: SparkSession, dir: String) =>
      Dedup.contamination(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    "d07_boilerplate" -> ((s: SparkSession, dir: String) =>
      Dedup.boilerplate(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        shingleSize = 3, minDocFreq = 25)),
    "d08_curation_funnel" -> ((s: SparkSession, dir: String) =>
      graft.pipeline.Curation.funnel(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    // --- domain-level curation surface (the C4/RefinedWeb triage discipline) ---
    "dc01_domain_stats" -> ((s: SparkSession, dir: String) =>
      graft.pipeline.Curation.domainStats(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", "source")),
    "dc02_quality_cap" -> ((s: SparkSession, dir: String) =>
      graft.pipeline.Curation.qualityCap(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", "source", k = QualityCapK)),
    "dc03_corpus_churn" -> ((s: SparkSession, dir: String) =>
      graft.pipeline.Curation.corpusChurn(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", "source",
        cutId = SourceDriftCut)),
    "d09_containment" -> ((s: SparkSession, dir: String) =>
      Dedup.containmentPairs(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        shingleSize = 3, threshold = 0.3)),
    "d10_fuzzy_pairs" -> ((s: SparkSession, dir: String) =>
      Dedup.fuzzyPairs(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    "d11_dup_ngrams" -> ((s: SparkSession, dir: String) =>
      Dedup.dupNgramFraction(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
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
    "d13_semdedup" -> ((s: SparkSession, dir: String) =>
      Similarity.semDedup(s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        threshold = SemDedupThreshold, centroidMod = SemDedupCentroidMod)),
    "d12_simhash_hamming" -> ((s: SparkSession, dir: String) =>
      Dedup.simhashHammingPairs(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    "d14_dup_spans" -> ((s: SparkSession, dir: String) =>
      Dedup.dupSpans(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        windowTokens = DupSpanWindow, minSpanTokens = DupSpanMinTokens)),
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
    "o01_zorder" -> ((s: SparkSession, dir: String) =>
      Layout.zorderKeys(s.read.parquet(s"$dir/events.parquet"))),
    "o02_hilbert" -> ((s: SparkSession, dir: String) =>
      Layout.hilbertKeys(s.read.parquet(s"$dir/events.parquet"))),
    "o03_compaction_plan" -> ((s: SparkSession, dir: String) =>
      Layout.compactionPlan(s.read.parquet(s"$dir/events.parquet"),
        targetRows = CompactionTargetRows, bucketShift = CompactionTileShift)),
    "o04_prune_stats" -> ((s: SparkSession, dir: String) =>
      Layout.pruneStats(s.read.parquet(s"$dir/events.parquet"),
        targetRows = PruneTargetRows, bucketShift = CompactionTileShift,
        userLo = PruneUserLo, userHi = PruneUserHi)),
    // --- similarity search over embeddings ---
    "s01_ann_bruteforce" -> ((s: SparkSession, dir: String) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.bruteForceTopK(e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding", 10)
    }),
    "s02_ann_lsh" -> ((s: SparkSession, dir: String) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.lshTopK(e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding", 5, nPlanes = 6)
    }),
    "s03_embed_neardup" -> ((s: SparkSession, dir: String) =>
      Similarity.nearDupPairs(s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding", 0.4)),
    "s20_knn_graph" -> ((s: SparkSession, dir: String) =>
      Similarity.knnGraph(s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        k = KnnGraphK)),
    "s21_mmr_rerank" -> ((s: SparkSession, dir: String) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.mmrRerank(e.filter(col("vec_id") % MmrQueryMod === 0), e, "vec_id",
        "embedding", k = MmrK, candK = MmrCandK, lambdaMicro = MmrLambdaMicro)
    }),
    "s05_label_centroids" -> ((s: SparkSession, dir: String) =>
      Similarity.labelCentroids(s.read.parquet(s"$dir/embeddings.parquet"), "label", "embedding")),
    "s06_nearest_centroid" -> ((s: SparkSession, dir: String) =>
      Similarity.nearestCentroid(s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "label", "embedding")),
    "s04_ann_ivf" -> ((s: SparkSession, dir: String) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.ivfTopK(e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding", 5,
        centroidMod = 97, nProbe = 2)
    }),
    "s07_ann_recall" -> ((s: SparkSession, dir: String) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.annRecall(e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding", 5)
    }),
    "s08_quantize" -> ((s: SparkSession, dir: String) =>
      Similarity.quantizeError(s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")),
    "s12_dim_stats" -> ((s: SparkSession, dir: String) =>
      Similarity.dimStats(s.read.parquet(s"$dir/embeddings.parquet"), "embedding")),
    "s13_random_projection" -> ((s: SparkSession, dir: String) =>
      Similarity.randomProjection(s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        outDims = 8, dims = 64)),
    "s14_pq_codes" -> ((s: SparkSession, dir: String) =>
      Similarity.pqCodes(s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")),
    "s15_pq_search" -> ((s: SparkSession, dir: String) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.pqSearchTopK(e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding", k = 5)
    }),
    "s16_ivf_pq" -> ((s: SparkSession, dir: String) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.ivfPqTopK(e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding", k = 5)
    }),
    "s22_kmeans_train" -> ((s: SparkSession, dir: String) =>
      Similarity.kmeansTrain(s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        k = 8, dims = 64, rounds = KmeansTrainRounds)),
    "s23_ivf_pq_trained" -> ((s: SparkSession, dir: String) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.ivfPqTrainedTopK(e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding",
        k = 5, kCells = 8, trainRounds = IvfPqTrainRounds)
    }),
    // the production two-job ANN shape: train the coarse quantizer once, persist
    // the model artifact, reload and search — the t26 save→load→replay discipline
    // applied to s23 (whose oracle SQL this query shares verbatim: the round trip
    // must reproduce the in-session result). The model is checkpointed after load
    // so the artifact dir can be removed before the lazy search materializes.
    "s24_ivf_pq_saved" -> ((s: SparkSession, dir: String) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val scratch = java.nio.file.Files.createTempDirectory("graft-ivf-model")
      try {
        val path = scratch.toString + "/centroids"
        Similarity.saveCentroids(
          Similarity.kmeansRounds(e, "vec_id", "embedding", k = 8, dims = 64,
            rounds = IvfPqTrainRounds), path)
        val model = Similarity.loadCentroids(s, path).localCheckpoint(true)
        Similarity.ivfPqWithModel(e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding",
          k = 5, model = model)
      } finally deleteRecursively(scratch)
    }),
    // the maintenance half of the s24 loop: train on the pre-cut corpus, persist,
    // reload, and census the POST-cut arrivals against the frozen codebook — the
    // per-cell growth table retrainTrigger reads on the incremental-ingest cadence
    "s25_ivf_assign_new" -> ((s: SparkSession, dir: String) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val scratch = java.nio.file.Files.createTempDirectory("graft-ivf-assign")
      try {
        val path = scratch.toString + "/centroids"
        Similarity.saveCentroids(
          Similarity.kmeansRounds(e.filter(col("vec_id") % AssignNewMod =!= 0),
            "vec_id", "embedding", k = 8, dims = 64, rounds = IvfPqTrainRounds), path)
        val model = Similarity.loadCentroids(s, path).localCheckpoint(true)
        Similarity.ivfAssignNew(
          e.filter(col("vec_id") % AssignNewMod === 0), "vec_id", "embedding", model)
      } finally deleteRecursively(scratch)
    }),
    "s17_hybrid_rrf" -> ((s: SparkSession, dir: String) =>
      graft.pipeline.Retrieval.hybridTopK(
        s.read.parquet(s"$dir/documents.parquet"),
        s.read.parquet(s"$dir/embeddings.parquet"),
        "doc_id", "text", "vec_id", "embedding",
        queryMod = HybridQueryMod, listK = HybridListK, k = HybridK, k0 = RrfK0)),
    "s18_hybrid_rrf_capped" -> ((s: SparkSession, dir: String) =>
      graft.pipeline.Retrieval.hybridTopK(
        s.read.parquet(s"$dir/documents.parquet"),
        s.read.parquet(s"$dir/embeddings.parquet"),
        "doc_id", "text", "vec_id", "embedding",
        queryMod = HybridQueryMod, listK = HybridListK, k = HybridK, k0 = RrfK0,
        dfCapFraction = Some(HybridDfCap))),
    "s09_cluster_quality" -> ((s: SparkSession, dir: String) =>
      Similarity.clusterQuality(s.read.parquet(s"$dir/embeddings.parquet"), "label", "embedding")),
    "s10_kmeans_step" -> ((s: SparkSession, dir: String) =>
      Similarity.kmeansStep(s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        k = 8, dims = 64)),
    "s11_ann_rerank" -> ((s: SparkSession, dir: String) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.rerankTopK(e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding",
        k = 5, coarseDims = 16, overfetch = 4)
    }),
    // --- multimodal: binary media column -> features (stubbed codec, real plumbing) ---
    "m01_media_features" -> ((s: SparkSession, dir: String) =>
      Multimodal.featurizeDF(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("media")),
        "doc_id", "source", "media")),
    "m02_media_resize" -> ((s: SparkSession, dir: String) =>
      Multimodal.resizeDF(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("media")),
        "doc_id", "source", "media", targetW = 641, targetH = 480)
        .select(col("asset_id"), col("media_type"), col("n_bytes"), md5(col("media")).as("media_md5"))),
    "m03_frame_sample" -> ((s: SparkSession, dir: String) =>
      Multimodal.frameSampleDF(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("media")),
        "doc_id", "media", frameBytes = 64, stride = 2)
        .select(col("asset_id"), col("frame_index"), col("frame_offset"), md5(col("frame")).as("frame_md5"))),
    "m04_frame_dedup" -> ((s: SparkSession, dir: String) =>
      Multimodal.frameDedupDF(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("media")),
        "doc_id", "media", frameBytes = 64, stride = 2)),
    "m06_clip_near_dup" -> ((s: SparkSession, dir: String) =>
      Multimodal.clipNearDup(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("media")),
        "doc_id", "media", frameBytes = 64, stride = 2)),
    // --- distributed sketches: HLL / count-min / bloom ---
    "sk01_hll_distinct" -> ((s: SparkSession, dir: String) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Sketches.hllDistinct(
        Dedup.shingles(d, "doc_id", "text")
          .join(d.select(col("doc_id"), col("source")), "doc_id")
          .select(col("source"), col("shingle")),
        "source", "shingle", b = 6)
    }),
    "sk02_countmin" -> ((s: SparkSession, dir: String) =>
      Sketches.countMin(
        Dedup.shingles(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text"),
        "shingle", depth = 4, width = 256, topK = 100)),
    "sk03_bloom_contamination" -> ((s: SparkSession, dir: String) =>
      Sketches.bloomContamination(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    "sk04_hll_overlap" -> ((s: SparkSession, dir: String) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Sketches.hllOverlap(
        Dedup.shingles(d, "doc_id", "text")
          .join(d.select(col("doc_id"), col("source")), "doc_id")
          .select(col("source"), col("shingle")),
        "source", "shingle", b = 6)
    }),
    "sk05_theta_diff" -> ((s: SparkSession, dir: String) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Sketches.thetaDifference(
        Dedup.shingles(d, "doc_id", "text")
          .join(d.select(col("doc_id"), col("source")), "doc_id")
          .select(col("source"), col("shingle")),
        "source", "shingle", k = 64)
    }),
    "t27_bigram_logprob" -> ((s: SparkSession, dir: String) =>
      TextStats.bigramLogProb(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        lambdaMicro = BigramLambdaMicro)),
    "t28_linear_quality" -> ((s: SparkSession, dir: String) =>
      TextStats.linearQuality(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        buckets = LinearQualityBuckets)),
    "t29_kneser_ney" -> ((s: SparkSession, dir: String) =>
      TextStats.kneserNeyLogProb(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        discountMicro = KneserNeyDiscountMicro)),
    "t30_temperature_mix" -> ((s: SparkSession, dir: String) =>
      Sampling.temperatureMix(s.read.parquet(s"$dir/documents.parquet"), "source",
        alphaMicro = MixAlphaMicro)),
    "s19_prf_expand" -> ((s: SparkSession, dir: String) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.prfTopK(e.filter(col("vec_id") % PrfQueryMod === 0), e, "vec_id", "embedding",
        k = PrfK, feedbackK = PrfFeedbackK)
    }),
    "ev14_cohort_retention" -> (AnalyticsQueries.cohortRetention _),
    "ev15_attribution" -> ((s: SparkSession, dir: String) =>
      AnalyticsQueries.attribution(s, dir, lookbackUs = AttributionLookbackUs)),
    "sk06_kmv_quantiles" -> ((s: SparkSession, dir: String) =>
      Sketches.kmvQuantiles(s.read.parquet(s"$dir/documents.parquet"),
        "source", "doc_id", "n_chars", k = KmvQuantK)),
    "sk07_hdr_quantiles" -> ((s: SparkSession, dir: String) =>
      Sketches.hdrQuantiles(s.read.parquet(s"$dir/documents.parquet"),
        "source", "n_chars")),
    "sk08_ams_f2" -> ((s: SparkSession, dir: String) =>
      Sketches.amsF2(s.read.parquet(s"$dir/events.parquet"), "user_id",
        width = AmsWidth)),
    "sk09_moments" -> ((s: SparkSession, dir: String) =>
      Sketches.momentsSketch(s.read.parquet(s"$dir/documents.parquet"),
        "source", "n_chars")),
    "ev16_rfm" -> ((s: SparkSession, d: String) => AnalyticsQueries.rfm(s, d)),
    "ev17_activity_pareto" -> ((s: SparkSession, d: String) => AnalyticsQueries.activityPareto(s, d)),
    "d15_cluster_keep" -> ((s: SparkSession, dir: String) =>
      Dedup.clusterKeepLongest(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    "d16_cluster_split" -> ((s: SparkSession, dir: String) =>
      Dedup.clusterAwareSplit(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    "ev18_gap_quantiles" -> (AnalyticsQueries.gapQuantiles _),
    "g46_modularity" -> ((s: SparkSession, dir: String) =>
      GraphQueries.modularity(s, dir, rounds = LpaRounds)),
    "q10_waiting_suppliers" -> (AnalyticsQueries.waitingSuppliers _),
    "q11_small_qty_revenue" -> ((s: SparkSession, d: String) =>
      AnalyticsQueries.smallQuantityRevenue(s, d)),
    "q12_idle_rich_customers" -> (AnalyticsQueries.idleRichCustomers _),
    "q13_custdist" -> (AnalyticsQueries.customerOrderDistribution _),
    "t33_pmi_pairs" -> ((s: SparkSession, dir: String) =>
      TextStats.pmiPairs(s.read.parquet(s"$dir/documents.parquet"), "text",
        minCount = PmiMinCount, k = PmiK)),
    "t34_zipf_fit" -> ((s: SparkSession, dir: String) =>
      TextStats.zipfFit(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        fitK = ZipfFitK)),
    "m05_media_text_align" -> ((s: SparkSession, dir: String) =>
      Multimodal.mediaTextAlignment(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("media")),
        "doc_id", "source", "media",
        s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        dims = AlignDims, thresholdMicro = AlignThresholdMicro)
        .withColumnRenamed("asset_id", "doc_id"))
  )

  def oracleSql: Map[String, String] = Map(
    "g01_lww_snapshot" ->
      s"""$snap SELECT graph_id, source_id, destination_id, position, updated_at, state FROM edges""",

    "g02_adjacency_topk" ->
      s"""$snap SELECT graph_id, source_id, destination_id, position, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT graph_id, source_id, destination_id, position,
         |         row_number() OVER (PARTITION BY graph_id, source_id ORDER BY position DESC) AS rank
         |  FROM edges WHERE state = 0)
         |WHERE rank <= 3""".stripMargin,

    "g03_intersection" ->
      s"""$snap SELECT destination_id AS neighbor_id FROM edges
         |WHERE graph_id = 1 AND source_id = 1 AND state = 0
         |  AND destination_id IN (SELECT destination_id FROM edges
         |                         WHERE graph_id = 1 AND source_id = 2 AND state = 0)""".stripMargin,

    "g04_difference" ->
      s"""$snap SELECT destination_id AS neighbor_id FROM edges
         |WHERE graph_id = 1 AND source_id = 1 AND state = 0
         |  AND destination_id NOT IN (SELECT destination_id FROM edges
         |                             WHERE graph_id = 1 AND source_id = 2 AND state = 0)""".stripMargin,

    "g05_union" ->
      s"""$snap SELECT destination_id AS neighbor_id FROM edges
         |WHERE graph_id = 1 AND source_id = 1 AND state = 0
         |UNION
         |SELECT destination_id FROM edges WHERE graph_id = 1 AND source_id = 2 AND state = 0""".stripMargin,

    "g06_reciprocal" ->
      s"""$snap SELECT a.graph_id, a.source_id, a.destination_id FROM edges a
         |WHERE a.state = 0 AND EXISTS (
         |  SELECT 1 FROM edges b
         |  WHERE b.graph_id = a.graph_id AND b.source_id = a.destination_id
         |    AND b.destination_id = a.source_id AND b.state = 0)""".stripMargin,

    "g07_metadata" ->
      s"""$meta SELECT graph_id, source_id, state, c AS "count", mu AS updated_at FROM meta""",

    "g08_count2_estimates" ->
      s"""$meta,
         |g AS (SELECT DISTINCT graph_id FROM edges),
         |m1 AS (SELECT graph_id, c FROM meta WHERE source_id = 1 AND state = 0),
         |m2 AS (SELECT graph_id, c FROM meta WHERE source_id = 2 AND state = 0)
         |SELECT g.graph_id,
         |       CAST(FLOOR(LEAST(COALESCE(m1.c, 0), COALESCE(m2.c, 0)) * 0.1) AS BIGINT) AS est_intersection,
         |       CAST(GREATEST(COALESCE(m1.c, 0), COALESCE(m2.c, 0)) AS BIGINT) AS est_union,
         |       CAST(COALESCE(m1.c, 0) AS BIGINT) AS est_difference
         |FROM g LEFT JOIN m1 USING (graph_id) LEFT JOIN m2 USING (graph_id)""".stripMargin,

    "g09_cursor_page" ->
      s"""$snap,
         |adj AS (SELECT destination_id AS neighbor_id, position FROM edges
         |        WHERE graph_id = 1 AND source_id = 1 AND state = 0)
         |SELECT neighbor_id, position FROM adj
         |WHERE position < (SELECT (MIN(position) + MAX(position)) // 2 FROM adj)
         |ORDER BY position DESC LIMIT 5""".stripMargin,

    "g10_contains" ->
      s"""$snap SELECT source_id, destination_id, state FROM edges
         |WHERE graph_id = 1 AND state IN (0, 3)""".stripMargin,

    "g11_where_in" ->
      s"""$snap SELECT destination_id AS neighbor_id FROM edges
         |WHERE graph_id = 1 AND source_id = 1 AND state = 0 AND destination_id BETWEEN 1 AND 30""".stripMargin,

    "g12_execute_lww" ->
      s"""$snap,
         |ops AS (SELECT CAST(1 + event_id % 3 AS INTEGER) AS graph_id,
         |               user_id AS source_id,
         |               1 + (event_id * 7919) % 97 AS destination_id,
         |               CAST(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 2 END AS INTEGER) AS state,
         |               CAST(2000000 + event_id % 100 AS INTEGER) AS updated_at
         |        FROM events WHERE event_id % 7 = 0),
         |ops_edges AS (
         |  SELECT o.graph_id, o.source_id, o.destination_id, e.position, o.updated_at, o.state
         |  FROM ops o JOIN edges e USING (graph_id, source_id, destination_id)),
         |combined AS (
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM edges_raw
         |  UNION ALL
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM ops_edges)
         |SELECT graph_id, source_id, destination_id, position, updated_at, state FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY graph_id, source_id, destination_id
         |    ORDER BY updated_at DESC, $prio DESC, position DESC) AS rn
         |  FROM combined)
         |WHERE rn = 1""".stripMargin,

    "g13_bulk_archive" ->
      s"""$snap SELECT graph_id, source_id, destination_id, position,
         |  CAST(CASE WHEN graph_id = 2 AND source_id % 10 = 0 AND state <> 1
         |            THEN 3000000 ELSE updated_at END AS INTEGER) AS updated_at,
         |  CAST(CASE WHEN graph_id = 2 AND source_id % 10 = 0 AND state <> 1
         |            THEN 2 ELSE state END AS INTEGER) AS state
         |FROM edges""".stripMargin,

    "g14_copy_repair" ->
      s"""$snap SELECT graph_id, COUNT(*) AS n_edges,
         |  CAST(SUM(position) AS BIGINT) AS sum_pos,
         |  CAST(SUM(CAST(state AS BIGINT)) AS BIGINT) AS sum_state
         |FROM edges GROUP BY graph_id""".stripMargin,

    "g15_nested_compound" ->
      s"""$snap,
         |u AS (SELECT destination_id AS neighbor_id FROM edges
         |      WHERE graph_id = 1 AND source_id = 1 AND state = 0
         |      UNION
         |      SELECT destination_id FROM edges WHERE graph_id = 1 AND source_id = 2 AND state = 0)
         |SELECT neighbor_id FROM u
         |WHERE neighbor_id IN (SELECT destination_id FROM edges
         |                      WHERE graph_id = 1 AND source_id = 3 AND state = 0)""".stripMargin,

    "g16_uuid_functions" ->
      s"""$snap SELECT source_id, destination_id,
         |  (CAST(updated_at AS BIGINT) * 1000) << 20 AS uuid_position,
         |  ((CAST(updated_at AS BIGINT) * 1000) << 20) >> 20 AS millis_roundtrip,
         |  CAST(-graph_id AS INTEGER) AS backward_graph_id
         |FROM edges WHERE graph_id = 1 AND source_id = 1""".stripMargin,

    "g17_pagerank" ->
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |nn AS (SELECT COUNT(*) AS n FROM vx),
         |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
         |r0 AS (SELECT v, 1000000000000 // (SELECT n FROM nn) AS pr FROM vx),
         |c1 AS (SELECT e.dst AS v, CAST(SUM(r0.pr // deg.deg) AS BIGINT) AS in_sum
         |       FROM e JOIN deg USING (src) JOIN r0 ON r0.v = e.src GROUP BY e.dst),
         |r1 AS (SELECT vx.v, 150000000000 // (SELECT n FROM nn) + (COALESCE(c1.in_sum, 0) * 85) // 100 AS pr
         |       FROM vx LEFT JOIN c1 USING (v)),
         |c2 AS (SELECT e.dst AS v, CAST(SUM(r1.pr // deg.deg) AS BIGINT) AS in_sum
         |       FROM e JOIN deg USING (src) JOIN r1 ON r1.v = e.src GROUP BY e.dst),
         |r2 AS (SELECT vx.v, 150000000000 // (SELECT n FROM nn) + (COALESCE(c2.in_sum, 0) * 85) // 100 AS pr
         |       FROM vx LEFT JOIN c2 USING (v)),
         |c3 AS (SELECT e.dst AS v, CAST(SUM(r2.pr // deg.deg) AS BIGINT) AS in_sum
         |       FROM e JOIN deg USING (src) JOIN r2 ON r2.v = e.src GROUP BY e.dst),
         |r3 AS (SELECT vx.v, 150000000000 // (SELECT n FROM nn) + (COALESCE(c3.in_sum, 0) * 85) // 100 AS pr
         |       FROM vx LEFT JOIN c3 USING (v))
         |SELECT v AS vertex_id, CAST(pr AS BIGINT) AS pagerank_fp FROM r3""".stripMargin,

    // Recency-decayed PageRank: positions derive from updated_at via F1
    // ((u*1000)<<20, inverse >>20 — ms is therefore exactly updated_at*1000);
    // weight = 10000 // (1 + ageSec // 60) basis points, contribution
    // (pr*w) // wsum — all exact integer arithmetic, mirror of
    // GraphQueries.decayedPageRank
    "g37_decayed_pagerank" ->
      s"""$snap,
         |e0 AS (SELECT source_id AS src, destination_id AS dst,
         |              CAST(updated_at AS BIGINT) * 1000 AS ms
         |       FROM edges WHERE graph_id = 1 AND state = 0),
         |mx AS (SELECT MAX(ms) AS maxms FROM e0),
         |ew AS (SELECT src, dst,
         |              greatest(1, 10000 // (1 + (((SELECT maxms FROM mx) - ms) // 1000) // 60)) AS w
         |       FROM e0),
         |ws AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wsum FROM ew GROUP BY src),
         |e AS (SELECT ew.src, ew.dst, ew.w, ws.wsum FROM ew JOIN ws USING (src)),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |nn AS (SELECT COUNT(*) AS n FROM vx),
         |r0 AS (SELECT v, 1000000000000 // (SELECT n FROM nn) AS pr FROM vx),
         |c1 AS (SELECT e.dst AS v, CAST(SUM((r0.pr * e.w) // e.wsum) AS BIGINT) AS in_sum
         |       FROM e JOIN r0 ON r0.v = e.src GROUP BY e.dst),
         |r1 AS (SELECT vx.v, 150000000000 // (SELECT n FROM nn) + (COALESCE(c1.in_sum, 0) * 85) // 100 AS pr
         |       FROM vx LEFT JOIN c1 USING (v)),
         |c2 AS (SELECT e.dst AS v, CAST(SUM((r1.pr * e.w) // e.wsum) AS BIGINT) AS in_sum
         |       FROM e JOIN r1 ON r1.v = e.src GROUP BY e.dst),
         |r2 AS (SELECT vx.v, 150000000000 // (SELECT n FROM nn) + (COALESCE(c2.in_sum, 0) * 85) // 100 AS pr
         |       FROM vx LEFT JOIN c2 USING (v)),
         |c3 AS (SELECT e.dst AS v, CAST(SUM((r2.pr * e.w) // e.wsum) AS BIGINT) AS in_sum
         |       FROM e JOIN r2 ON r2.v = e.src GROUP BY e.dst),
         |r3 AS (SELECT vx.v, 150000000000 // (SELECT n FROM nn) + (COALESCE(c3.in_sum, 0) * 85) // 100 AS pr
         |       FROM vx LEFT JOIN c3 USING (v))
         |SELECT v AS vertex_id, CAST(pr AS BIGINT) AS dpr_fp FROM r3""".stripMargin,

    // Bounded k-truss peeling, rounds pinned: per round, per-edge triangle support
    // over the id-oriented closure, prune edges with support < k-2, then report
    // survivors with recomputed support — mirror of GraphQueries.kTruss, unrolled
    // from the SAME (KTrussK, KTrussRounds) constants the query registration uses
    "g38_ktruss" -> {
      // every tri() references its edge CTE 3x and each round chains on the last, so
      // un-materialized CTEs inline EXPONENTIALLY (3^rounds copies of the base scan —
      // measured: DuckDB never finishes); MATERIALIZED pins linear evaluation
      def tri(e: String, t: String): String =
        s"$t AS MATERIALIZED (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c FROM $e e1 " +
          s"JOIN $e e2 ON e2.lo = e1.hi JOIN $e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi)"
      def sup(t: String, s: String): String =
        s"$s AS MATERIALIZED (SELECT lo, hi, count(*) AS sup FROM (SELECT a AS lo, b AS hi FROM $t " +
          s"UNION ALL SELECT a AS lo, c AS hi FROM $t " +
          s"UNION ALL SELECT b AS lo, c AS hi FROM $t) GROUP BY 1, 2)"
      def prune(e: String, s: String, out: String): String =
        s"$out AS MATERIALIZED (SELECT u.lo, u.hi FROM $e u JOIN $s USING (lo, hi) " +
          s"WHERE sup >= ${KTrussK - 2})"
      val roundCtes = (1 to KTrussRounds).map { i =>
        val prev = if (i == 1) "und" else s"p${i - 1}"
        s"${tri(prev, s"t$i")},\n${sup(s"t$i", s"s$i")},\n${prune(prev, s"s$i", s"p$i")}"
      }
      val last = s"p$KTrussRounds"
      val (tN, sN) = (s"t${KTrussRounds + 1}", s"s${KTrussRounds + 1}")
      s"""$snap,
         |und AS MATERIALIZED (SELECT DISTINCT least(source_id, destination_id) AS lo,
         |                        greatest(source_id, destination_id) AS hi
         |        FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |${roundCtes.mkString(",\n")},
         |${tri(last, tN)},
         |${sup(tN, sN)}
         |SELECT p.lo AS lo_id, p.hi AS hi_id,
         |  CAST(COALESCE($sN.sup, 0) AS BIGINT) AS support
         |FROM $last p LEFT JOIN $sN USING (lo, hi)""".stripMargin
    },

    // Bounded Bellman-Ford from the mod-100 seed set, weight 1 + dst % 7, 3 pinned
    // relaxation rounds — mirror of GraphQueries.boundedSssp
    "g39_sssp" ->
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst,
         |             1 + destination_id % 7 AS w
         |      FROM edges WHERE graph_id = 1 AND state = 0),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |d0 AS (SELECT v, CAST(0 AS BIGINT) AS d FROM vx WHERE v % 100 = 0),
         |r1 AS (SELECT v, CAST(MIN(d) AS BIGINT) AS d FROM (
         |         SELECT v, d FROM d0
         |         UNION ALL
         |         SELECT e.dst AS v, d0.d + e.w AS d FROM e JOIN d0 ON d0.v = e.src)
         |       GROUP BY v),
         |r2 AS (SELECT v, CAST(MIN(d) AS BIGINT) AS d FROM (
         |         SELECT v, d FROM r1
         |         UNION ALL
         |         SELECT e.dst AS v, r1.d + e.w AS d FROM e JOIN r1 ON r1.v = e.src)
         |       GROUP BY v),
         |r3 AS (SELECT v, CAST(MIN(d) AS BIGINT) AS d FROM (
         |         SELECT v, d FROM r2
         |         UNION ALL
         |         SELECT e.dst AS v, r2.d + e.w AS d FROM e JOIN r2 ON r2.v = e.src)
         |       GROUP BY v)
         |SELECT v AS vertex_id, d AS dist FROM r3""".stripMargin,

    // Bounded synchronous label propagation, LpaRounds pinned rounds: per round every
    // vertex adopts its neighbors' most frequent label, argmax tie-break
    // (count desc, label asc) — mirror of GraphQueries.lpaCommunities (g22 is the
    // different min-label CC kernel; this is community detection by majority vote)
    "g40_lpa_communities" -> {
      def roundCtes(i: Int): String = {
        val prev = s"l${i - 1}"
        s"""n$i AS (SELECT adj.src AS v, l.label, COUNT(*) AS c
           |        FROM adj JOIN $prev l ON l.v = adj.dst
           |        GROUP BY 1, 2),
           |l$i AS MATERIALIZED (SELECT v, label FROM (
           |       SELECT v, label,
           |              row_number() OVER (PARTITION BY v ORDER BY c DESC, label) AS rk
           |       FROM n$i)
           |     WHERE rk = 1)""".stripMargin
      }
      s"""$snap,
         |und AS (SELECT DISTINCT LEAST(source_id, destination_id) AS lo,
         |                        GREATEST(source_id, destination_id) AS hi
         |        FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |adj AS (SELECT lo AS src, hi AS dst FROM und UNION ALL SELECT hi, lo FROM und),
         |l0 AS (SELECT DISTINCT src AS v, src AS label FROM adj),
         |${(1 to LpaRounds).map(roundCtes).mkString(",\n")}
         |SELECT v AS vertex_id, label AS community FROM l$LpaRounds""".stripMargin
    },

    // Newman modularity of the g40 LPA partition: per-community internal-edge
    // fraction minus the degree-mass expectation, exact integers until the one
    // final micro-quantized double sequence — mirror of GraphQueries.modularity
    "g46_modularity" -> {
      def roundCtes(i: Int): String = {
        val prev = s"l${i - 1}"
        s"""n$i AS (SELECT adj.src AS v, l.label, COUNT(*) AS c
           |        FROM adj JOIN $prev l ON l.v = adj.dst
           |        GROUP BY 1, 2),
           |l$i AS MATERIALIZED (SELECT v, label FROM (
           |       SELECT v, label,
           |              row_number() OVER (PARTITION BY v ORDER BY c DESC, label) AS rk
           |       FROM n$i)
           |     WHERE rk = 1)""".stripMargin
      }
      s"""$snap,
         |und AS (SELECT DISTINCT LEAST(source_id, destination_id) AS lo,
         |                        GREATEST(source_id, destination_id) AS hi
         |        FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |adj AS (SELECT lo AS src, hi AS dst FROM und UNION ALL SELECT hi, lo FROM und),
         |l0 AS (SELECT DISTINCT src AS v, src AS label FROM adj),
         |${(1 to LpaRounds).map(roundCtes).mkString(",\n")},
         |comm AS (SELECT v, label AS community FROM l$LpaRounds),
         |mt AS (SELECT COUNT(*) AS m FROM und),
         |deg AS (SELECT v, COUNT(*) AS degree
         |        FROM (SELECT lo AS v FROM und UNION ALL SELECT hi FROM und) GROUP BY 1),
         |ds AS (SELECT community, COUNT(*) AS n_vertices, CAST(SUM(degree) AS BIGINT) AS d_sum
         |       FROM deg JOIN comm USING (v) GROUP BY 1),
         |ei AS (SELECT a.community, COUNT(*) AS e_in
         |       FROM und JOIN comm a ON a.v = und.lo JOIN comm b ON b.v = und.hi
         |       WHERE a.community = b.community GROUP BY 1)
         |SELECT ds.community, ds.n_vertices,
         |  CAST(COALESCE(ei.e_in, 0) AS BIGINT) AS e_in, ds.d_sum,
         |  CAST(floor(1000000.0 * (COALESCE(ei.e_in, 0)::DOUBLE / m::DOUBLE
         |    - (ds.d_sum::DOUBLE / (2.0 * m::DOUBLE)) * (ds.d_sum::DOUBLE / (2.0 * m::DOUBLE)))
         |    + 0.5) AS BIGINT) AS q_part_micro
         |FROM ds LEFT JOIN ei USING (community), mt""".stripMargin
    },

    // TIME-TRAVEL snapshot: the LWW fold over the log prefix updated_at <= AsOfTs —
    // mirror of GraphQueries.snapshotAsOf / EdgeStore.asOf (the cut constant is shared
    // so a retune cannot diverge the mirror)
    "g41_snapshot_asof" ->
      s"""${TestGraph.snapshotAsOfCte(GraphQueries.AsOfTs)}
         |SELECT graph_id, source_id, destination_id, position, updated_at, state FROM edges""".stripMargin,

    // Time-travel churn diff: the LWW winner as of ts1 vs as of ts2, keeping keys
    // that appeared, changed state, or moved position (a pure updated_at refresh is
    // not churn; the log is append-only, so nothing disappears) — mirror of
    // EdgeStore.changedBetween / GraphQueries.churnBetween (cut constants shared)
    "g42_churn_between" -> {
      def winnerCte(name: String, ts: Int): String =
        s"""$name AS (
           |  SELECT graph_id, source_id, destination_id, position, state
           |  FROM (
           |    SELECT *, row_number() OVER (
           |      PARTITION BY graph_id, source_id, destination_id
           |      ORDER BY updated_at DESC, ${TestGraph.prioritySql} DESC, position DESC) AS rn
           |    FROM edges_raw WHERE updated_at <= $ts)
           |  WHERE rn = 1
           |)""".stripMargin
      s"""WITH edges_raw AS (${TestGraph.rawSql}),
         |${winnerCte("s1", GraphQueries.AsOfTs)},
         |s2 AS (
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state
         |  FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY graph_id, source_id, destination_id
         |      ORDER BY updated_at DESC, ${TestGraph.prioritySql} DESC, position DESC) AS rn
         |    FROM edges_raw WHERE updated_at <= ${GraphQueries.ChurnTs2})
         |  WHERE rn = 1
         |)
         |SELECT s2.graph_id, s2.source_id, s2.destination_id,
         |       s1.state AS old_state, s1.position AS old_position,
         |       s2.state AS new_state, s2.position AS new_position,
         |       s2.updated_at AS new_updated_at,
         |       CASE WHEN s1.state IS NULL THEN 'appeared'
         |            WHEN s1.state <> s2.state THEN 'state'
         |            ELSE 'position' END AS change
         |FROM s2 LEFT JOIN s1 USING (graph_id, source_id, destination_id)
         |WHERE s1.state IS NULL OR s1.state <> s2.state OR s1.position <> s2.position""".stripMargin
    },

    // Two sequential write batches, each an LWW fold: batch1 = wildcard archive of
    // graph-1 vertices ≡0 (mod 7) (register + fanout over live edges, positions kept);
    // batch2 = adds from vertices ≡0 (mod 3), whose effective state is Archived when the
    // source's register is archived (W2 domination). Position refreshes only on
    // Removed/Negative -> effective-Normal resurrection.
    "g18_vertex_domination" ->
      s"""$snap,
         |src AS (SELECT DISTINCT source_id FROM edges WHERE graph_id = 1),
         |b1 AS (SELECT e.graph_id, e.source_id, e.destination_id, e.position,
         |              CAST(2000000 AS INTEGER) AS updated_at, CAST(2 AS INTEGER) AS state
         |       FROM edges e
         |       WHERE e.graph_id = 1 AND e.source_id % 7 = 0 AND e.state <> 1),
         |log1 AS (
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM edges_raw
         |  UNION ALL
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM b1),
         |snap1 AS (
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY graph_id, source_id, destination_id
         |      ORDER BY updated_at DESC, $prio DESC, position DESC) AS rn
         |    FROM log1)
         |  WHERE rn = 1),
         |b2 AS (SELECT CAST(1 AS INTEGER) AS graph_id, s.source_id,
         |              1 + (s.source_id * 13) % 97 AS destination_id,
         |              CAST(CASE WHEN s.source_id % 7 = 0 THEN 2 ELSE 0 END AS INTEGER) AS state,
         |              CAST(2500000 AS INTEGER) AS updated_at
         |       FROM src s WHERE s.source_id % 3 = 0),
         |b2p AS (SELECT b2.graph_id, b2.source_id, b2.destination_id,
         |               CASE WHEN s1.position IS NULL OR (s1.state IN (1, 3) AND b2.state = 0)
         |                    THEN (CAST(2500000 AS BIGINT) * 1000) << 20
         |                    ELSE s1.position END AS position,
         |               b2.updated_at, b2.state
         |        FROM b2 LEFT JOIN snap1 s1 USING (graph_id, source_id, destination_id)),
         |log2 AS (
         |  SELECT * FROM log1
         |  UNION ALL
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM b2p)
         |SELECT graph_id, source_id, destination_id, position, updated_at, state FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY graph_id, source_id, destination_id
         |    ORDER BY updated_at DESC, $prio DESC, position DESC) AS rn
         |  FROM log2)
         |WHERE rn = 1 AND graph_id = 1""".stripMargin,

    // Backward-direction write pipeline: batch1 = backward wildcard archive of graph-2
    // vertices ≡0 (mod 5) (backward register + INCOMING-edge fanout); batch2 = backward
    // single adds, (source, destination) swapped per the normalization rule, dominated
    // by the target vertex's backward register.
    "g19_backward_ops" ->
      s"""$snap,
         |dv AS (SELECT DISTINCT destination_id AS v FROM edges WHERE graph_id = 2),
         |b1 AS (SELECT e.graph_id, e.source_id, e.destination_id, e.position,
         |              CAST(2100000 AS INTEGER) AS updated_at, CAST(2 AS INTEGER) AS state
         |       FROM edges e
         |       WHERE e.graph_id = 2 AND e.destination_id % 5 = 0 AND e.state <> 1),
         |log1 AS (
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM edges_raw
         |  UNION ALL
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM b1),
         |snap1 AS (
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY graph_id, source_id, destination_id
         |      ORDER BY updated_at DESC, $prio DESC, position DESC) AS rn
         |    FROM log1)
         |  WHERE rn = 1),
         |b2 AS (SELECT CAST(2 AS INTEGER) AS graph_id,
         |              1 + (v * 11) % 150 AS source_id,
         |              v AS destination_id,
         |              CAST(CASE WHEN v % 5 = 0 THEN 2 ELSE 0 END AS INTEGER) AS state,
         |              CAST(2600000 AS INTEGER) AS updated_at
         |       FROM dv WHERE v % 3 = 0),
         |b2p AS (SELECT b2.graph_id, b2.source_id, b2.destination_id,
         |               CASE WHEN s1.position IS NULL OR (s1.state IN (1, 3) AND b2.state = 0)
         |                    THEN (CAST(2600000 AS BIGINT) * 1000) << 20
         |                    ELSE s1.position END AS position,
         |               b2.updated_at, b2.state
         |        FROM b2 LEFT JOIN snap1 s1 USING (graph_id, source_id, destination_id)),
         |log2 AS (
         |  SELECT * FROM log1
         |  UNION ALL
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM b2p)
         |SELECT graph_id, source_id, destination_id, position, updated_at, state FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY graph_id, source_id, destination_id
         |    ORDER BY updated_at DESC, $prio DESC, position DESC) AS rn
         |  FROM log2)
         |WHERE rn = 1 AND graph_id = 2""".stripMargin,

    // Register-aware metadata: archived vertices (incl. two with no edges at all)
    // report the register's state/time + the count of edges in that state; vertices
    // without a register keep the derived dominant-state metadata.
    "g20_metadata_registers" ->
      s"""$snap,
         |tgt AS (SELECT DISTINCT source_id FROM edges WHERE graph_id = 3 AND source_id % 4 = 0
         |        UNION SELECT 1000001 UNION SELECT 1000002),
         |b1 AS (SELECT e.graph_id, e.source_id, e.destination_id, e.position,
         |              CAST(2200000 AS INTEGER) AS updated_at, CAST(2 AS INTEGER) AS state
         |       FROM edges e JOIN tgt USING (source_id)
         |       WHERE e.graph_id = 3 AND e.state <> 1),
         |log1 AS (
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM edges_raw
         |  UNION ALL
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM b1),
         |snap1 AS (
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY graph_id, source_id, destination_id
         |      ORDER BY updated_at DESC, $prio DESC, position DESC) AS rn
         |    FROM log1)
         |  WHERE rn = 1),
         |ps AS (SELECT source_id, state, COUNT(*) AS c, MAX(updated_at) AS mu
         |       FROM snap1 WHERE graph_id = 3 GROUP BY 1, 2),
         |derived AS (SELECT source_id, state, c, mu FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY source_id ORDER BY mu DESC, $prio DESC) AS rn
         |    FROM ps)
         |  WHERE rn = 1),
         |reg_meta AS (SELECT t.source_id, CAST(2 AS INTEGER) AS state,
         |                    CAST(COALESCE(ps.c, 0) AS BIGINT) AS c,
         |                    CAST(2200000 AS INTEGER) AS mu
         |             FROM tgt t LEFT JOIN ps ON ps.source_id = t.source_id AND ps.state = 2)
         |SELECT CAST(3 AS INTEGER) AS graph_id, source_id, state, c AS "count", mu AS updated_at
         |FROM (
         |  SELECT * FROM reg_meta
         |  UNION ALL
         |  SELECT * FROM derived WHERE source_id NOT IN (SELECT source_id FROM tgt))""".stripMargin,

    "g21_triangles" ->
      s"""$snap,
         |und AS (SELECT DISTINCT LEAST(source_id, destination_id) AS lo,
         |                        GREATEST(source_id, destination_id) AS hi
         |        FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |tri AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
         |        FROM und e1
         |        JOIN und e2 ON e2.lo = e1.hi
         |        JOIN und e3 ON e3.lo = e1.lo AND e3.hi = e2.hi)
         |SELECT v AS vertex_id, COUNT(*) AS n_triangles FROM (
         |  SELECT a AS v FROM tri
         |  UNION ALL SELECT b FROM tri
         |  UNION ALL SELECT c FROM tri)
         |GROUP BY v""".stripMargin,

    "g22_label_propagation" ->
      s"""$snap,
         |de AS (SELECT source_id AS a, destination_id AS b FROM edges
         |       WHERE graph_id = 1 AND state = 0),
         |und AS (SELECT a, b FROM de UNION ALL SELECT b, a FROM de),
         |v AS (SELECT DISTINCT a AS v FROM und),
         |l0 AS (SELECT v, v AS label FROM v),
         |n1 AS (SELECT u.a, MIN(l.label) AS m FROM und u JOIN l0 l ON l.v = u.b GROUP BY u.a),
         |l1 AS (SELECT l0.v, LEAST(l0.label, COALESCE(n1.m, l0.label)) AS label
         |       FROM l0 LEFT JOIN n1 ON n1.a = l0.v),
         |n2 AS (SELECT u.a, MIN(l.label) AS m FROM und u JOIN l1 l ON l.v = u.b GROUP BY u.a),
         |l2 AS (SELECT l1.v, LEAST(l1.label, COALESCE(n2.m, l1.label)) AS label
         |       FROM l1 LEFT JOIN n2 ON n2.a = l1.v),
         |n3 AS (SELECT u.a, MIN(l.label) AS m FROM und u JOIN l2 l ON l.v = u.b GROUP BY u.a),
         |l3 AS (SELECT l2.v, LEAST(l2.label, COALESCE(n3.m, l2.label)) AS label
         |       FROM l2 LEFT JOIN n3 ON n3.a = l2.v)
         |SELECT v AS vertex_id, label AS label_min3 FROM l3""".stripMargin,

    // 2-hop expansion: a→b→c wedges, minus self-returns and direct edges
    "g23_two_hop" ->
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |t AS (SELECT DISTINCT a.src AS src, b.dst AS dst
         |      FROM e a JOIN e b ON a.dst = b.src WHERE b.dst <> a.src),
         |tf AS (SELECT t.src, t.dst FROM t ANTI JOIN e ON e.src = t.src AND e.dst = t.dst)
         |SELECT src AS source_id, COUNT(*) AS n_two_hop FROM tf GROUP BY src""".stripMargin,

    // power-of-two degree buckets via an integer CASE ladder — mirror of
    // GraphQueries.degreeHistogram (floor(log2) is engine-divergent at exact powers)
    "g24_degree_histogram" -> {
      val ladder = (0 until 20)
        .map(b => s"WHEN degree < ${1L << (b + 1)} THEN $b")
        .mkString(" ")
      s"""$snap,
         |deg AS (SELECT graph_id, source_id, COUNT(*) AS degree
         |        FROM edges WHERE state = 0 GROUP BY 1, 2)
         |SELECT graph_id,
         |  CAST(CASE $ladder ELSE 20 END AS INTEGER) AS deg_bucket,
         |  COUNT(*) AS n_vertices, CAST(MAX(degree) AS BIGINT) AS max_degree
         |FROM deg GROUP BY 1, 2""".stripMargin
    },

    // FULL post-write metadata recompute — the engine answers via the INCREMENTAL
    // metadataPatched path, so the hash match proves incremental ≡ full (A2).
    // Position rule for the adds mirrors g18: new-or-resurrected Normal edges take
    // the deterministic uuid position (ms << 20), existing live edges keep theirs.
    "g26_metadata_patched" ->
      s"""$snap,
         |src AS (SELECT DISTINCT source_id FROM edges WHERE graph_id = 2),
         |b AS (SELECT CAST(2 AS INTEGER) AS graph_id, s.source_id,
         |             1 + (s.source_id * 17) % 97 AS destination_id,
         |             CAST(0 AS INTEGER) AS state, CAST(2600000 AS INTEGER) AS updated_at
         |      FROM src s WHERE s.source_id % 5 = 0),
         |bp AS (SELECT b.graph_id, b.source_id, b.destination_id,
         |              CASE WHEN e.position IS NULL OR (e.state IN (1, 3) AND b.state = 0)
         |                   THEN (CAST(2600000 AS BIGINT) * 1000) << 20
         |                   ELSE e.position END AS position,
         |              b.updated_at, b.state
         |       FROM b LEFT JOIN edges e USING (graph_id, source_id, destination_id)),
         |log1 AS (
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM edges_raw
         |  UNION ALL
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM bp),
         |snap1 AS (
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY graph_id, source_id, destination_id
         |      ORDER BY updated_at DESC, $prio DESC, position DESC) AS rn
         |    FROM log1)
         |  WHERE rn = 1),
         |ps AS (SELECT source_id, state, COUNT(*) AS c, MAX(updated_at) AS mu
         |       FROM snap1 WHERE graph_id = 2 GROUP BY 1, 2)
         |SELECT CAST(2 AS INTEGER) AS graph_id, source_id, state, c AS "count", mu AS updated_at
         |FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY source_id ORDER BY mu DESC, $prio DESC) AS rn
         |  FROM ps)
         |WHERE rn = 1""".stripMargin,

    // 3-round k-core peeling (k = 20) on the undirected closure — mirror of
    // GraphQueries.kCore; survivors with residual degree
    "g27_kcore" ->
      s"""$snap,
         |und AS (SELECT DISTINCT source_id AS src, destination_id AS dst FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id
         |        UNION
         |        SELECT DISTINCT destination_id, source_id FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |k1 AS (SELECT src FROM und GROUP BY src HAVING COUNT(*) >= 20),
         |e1 AS (SELECT u.src, u.dst FROM und u JOIN k1 a ON a.src = u.src
         |       JOIN k1 b ON b.src = u.dst),
         |k2 AS (SELECT src FROM e1 GROUP BY src HAVING COUNT(*) >= 20),
         |e2 AS (SELECT u.src, u.dst FROM e1 u JOIN k2 a ON a.src = u.src
         |       JOIN k2 b ON b.src = u.dst),
         |k3 AS (SELECT src FROM e2 GROUP BY src HAVING COUNT(*) >= 20),
         |e3 AS (SELECT u.src, u.dst FROM e2 u JOIN k3 a ON a.src = u.src
         |       JOIN k3 b ON b.src = u.dst)
         |SELECT src AS source_id, COUNT(*) AS degree FROM e3 GROUP BY src""".stripMargin,

    // shared-neighbor Jaccard over graph-1 Normal adjacency sets — mirror of
    // GraphQueries.nodeJaccard (in-degree cap 10000 is a no-op at test scale but
    // stays in lockstep with the engine's skew guard)
    "g25_node_jaccard" ->
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |keep AS (SELECT dst FROM e GROUP BY dst HAVING COUNT(*) <= 10000),
         |c AS (SELECT e.src, e.dst FROM e JOIN keep USING (dst)),
         |sizes AS (SELECT src, COUNT(*) AS n FROM c GROUP BY src),
         |common AS (SELECT a.src AS src_a, b.src AS src_b, COUNT(*) AS n_common
         |           FROM c a JOIN c b ON a.dst = b.dst AND a.src < b.src
         |           GROUP BY 1, 2)
         |SELECT src_a, src_b, n_common, jaccard FROM (
         |  SELECT src_a, src_b, n_common,
         |         round(CAST(n_common AS DOUBLE) / CAST(na.n + nb.n - n_common AS DOUBLE), 6) AS jaccard
         |  FROM common
         |  JOIN sizes na ON na.src = src_a
         |  JOIN sizes nb ON nb.src = src_b)
         |WHERE jaccard >= 0.3""".stripMargin,

    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
         |  CAST(SUM($revBp) AS BIGINT) AS sum_disc_bp,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q03_top_revenue_orders" ->
      s"""WITH rev AS (
         |  SELECT l_orderkey, CAST(SUM($revBp) AS BIGINT) AS revenue_bp
         |  FROM lineitem GROUP BY l_orderkey)
         |SELECT o_orderkey, o_custkey, revenue_bp
         |FROM rev JOIN orders ON l_orderkey = o_orderkey
         |ORDER BY revenue_bp DESC, o_orderkey LIMIT 10""".stripMargin,

    "q05_region_revenue" ->
      s"""SELECT r_name, n_name, CAST(SUM($revBp) AS BIGINT) AS revenue_bp, COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name""".stripMargin,

    // region→nation revenue ROLLUP with grouping flags — mirror of
    // AnalyticsQueries.regionRevenueRollup (one grouping-sets aggregation)
    "q06_revenue_rollup" ->
      s"""SELECT r_name, n_name, CAST(SUM($revBp) AS BIGINT) AS revenue_bp, COUNT(*) AS n_items,
         |  CAST(GROUPING(r_name) AS INTEGER) AS g_region,
         |  CAST(GROUPING(n_name) AS INTEGER) AS g_nation
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,

    // Q6-style selective revenue (pushed predicates + pruned scan) — mirror of
    // AnalyticsQueries.selectiveRevenue
    "q07_selective_revenue" ->
      s"""SELECT CAST(SUM($revBp) AS BIGINT) AS revenue_bp, COUNT(*) AS n_items
         |FROM lineitem WHERE l_quantity < 25 AND l_discount >= 0.05""".stripMargin,

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

    // per-user event-type pivot (pinned type list) — mirror of
    // AnalyticsQueries.eventTypePivot
    "ev10_type_pivot" ->
      s"""SELECT user_id,
         |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
         |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
         |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
         |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
         |FROM events GROUP BY user_id""".stripMargin,

    "q02_brand_nation_volume" ->
      s"""SELECT n_name, p_brand,
         |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         |  CAST(SUM($revBp) AS BIGINT) AS revenue_bp,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN part ON l_partkey = p_partkey
         |GROUP BY n_name, p_brand""".stripMargin,

    "ev1_user_event_stats" ->
      s"""SELECT user_id, COUNT(*) AS n_events,
         |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
         |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
         |  MIN(event_id) AS first_event, MAX(event_id) AS last_event
         |FROM events GROUP BY user_id""".stripMargin,

    "ev2_sessionize" ->
      s"""WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
         |s AS (SELECT user_id, tsu,
         |        CASE WHEN prev IS NULL OR tsu - prev > 3600000000 THEN 1 ELSE 0 END AS brk
         |      FROM (SELECT user_id, tsu,
         |              lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS prev
         |            FROM t))
         |SELECT user_id, CAST(SUM(brk) AS BIGINT) AS n_sessions,
         |       CAST(MAX(tsu) - MIN(tsu) AS BIGINT) AS span_us
         |FROM s GROUP BY user_id""".stripMargin,

    // inter-event gap quantiles per type: per-user (tsu, event_id)-ordered lag,
    // whole-second gaps, then the t17 cumulated-histogram exact quantiles —
    // mirror of AnalyticsQueries.gapQuantiles
    "ev18_gap_quantiles" ->
      s"""WITH t AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu FROM events),
         |g AS (SELECT event_type, (tsu - prev) // 1000000 AS gap_s
         |      FROM (SELECT event_type, tsu,
         |              lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS prev
         |            FROM t)
         |      WHERE prev IS NOT NULL),
         |h AS (SELECT event_type, gap_s, COUNT(*) AS c FROM g GROUP BY 1, 2),
         |cm AS (SELECT event_type, gap_s,
         |         SUM(c) OVER (PARTITION BY event_type ORDER BY gap_s
         |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |         SUM(c) OVER (PARTITION BY event_type) AS total
         |       FROM h)
         |SELECT event_type, CAST(MAX(total) AS BIGINT) AS n_gaps,
         |  MIN(CASE WHEN cum * 100 >= 50 * total THEN gap_s END) AS p50_s,
         |  MIN(CASE WHEN cum * 100 >= 90 * total THEN gap_s END) AS p90_s,
         |  MIN(CASE WHEN cum * 100 >= 99 * total THEN gap_s END) AS p99_s
         |FROM cm GROUP BY event_type""".stripMargin,

    "ev3_hourly_rollup" ->
      s"""SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
         |  COUNT(*) AS n,
         |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         |FROM events GROUP BY 1, 2""".stripMargin,

    // per-hour top-3 users by event count — mirror of AnalyticsQueries.hourlyTopUsers
    "ev5_hourly_top_users" ->
      s"""SELECT hour_bucket, CAST(rank AS INTEGER) AS rank, user_id, n_events FROM (
         |  SELECT hour_bucket, user_id, n_events,
         |         row_number() OVER (PARTITION BY hour_bucket
         |                            ORDER BY n_events DESC, user_id) AS rank
         |  FROM (SELECT epoch_us(ts) // 3600000000 AS hour_bucket, user_id,
         |               COUNT(*) AS n_events
         |        FROM events GROUP BY 1, 2))
         |WHERE rank <= 3""".stripMargin,

    // hour-over-hour user retention — mirror of AnalyticsQueries.hourlyRetention
    "ev6_hourly_retention" ->
      s"""WITH a AS (SELECT DISTINCT epoch_us(ts) // 3600000000 AS hour_bucket, user_id
         |           FROM events),
         |n AS (SELECT hour_bucket - 1 AS hour_bucket, user_id, 1 AS retained FROM a)
         |SELECT a.hour_bucket, COUNT(*) AS n_active,
         |  CAST(SUM(COALESCE(n.retained, 0)) AS BIGINT) AS n_retained,
         |  round(CAST(SUM(COALESCE(n.retained, 0)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         |    AS retention
         |FROM a LEFT JOIN n USING (hour_bucket, user_id)
         |GROUP BY a.hour_bucket""".stripMargin,

    "ev4_props_extract" ->
      s"""SELECT user_id,
         |  CAST(SUM(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         |  CAST(MAX(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS max_k,
         |  CAST(COUNT(DISTINCT json_extract_string(props, '$$.k')) AS BIGINT) AS n_distinct_k
         |FROM events GROUP BY user_id""".stripMargin,

    "d01_dedup_exact" ->
      s"""SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
         |FROM documents GROUP BY md5(text)""".stripMargin,

    "t01_lang_id" ->
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
         |FROM f3""".stripMargin,

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

    // per-label per-dimension centroids — mirror of Similarity.labelCentroids
    "s05_label_centroids" ->
      s"""WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings)
         |SELECT label, CAST(i AS INTEGER) AS dim, round(avg(v[i]), 6) AS centroid
         |FROM e, unnest(generate_series(1, len(v))) AS t(i)
         |GROUP BY label, i""".stripMargin,

    // nearest-centroid assignment — mirror of Similarity.nearestCentroid: centroids
    // from the FULL corpus rounded to 6 before scoring; zero-norm vectors and all-zero
    // centroids excluded in lockstep with the engine's degenerate-input guard
    "s06_nearest_centroid" ->
      s"""WITH a AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |cent AS (SELECT label, i, round(avg(v[i]), 6) AS c
         |         FROM a, unnest(generate_series(1, len(v))) AS t(i)
         |         GROUP BY label, i),
         |cv AS (SELECT label AS c_label, list(c ORDER BY i) AS cv FROM cent GROUP BY label),
         |cvf AS (SELECT c_label, cv FROM cv WHERE list_dot_product(cv, cv) > 0),
         |e AS (SELECT vec_id, v FROM a WHERE list_dot_product(v, v) > 0),
         |scored AS (SELECT vec_id, c_label, ${cosSql("v", "cv")} AS cos_sim FROM e, cvf)
         |SELECT vec_id, c_label AS assigned_label, cos_sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, c_label) AS rk
         |  FROM scored)
         |WHERE rk = 1""".stripMargin,

    // two-stage rerank: coarse 16-dim-prefix cosine keeps 4k per query, exact cosine
    // reranks to top-5 — mirror of Similarity.rerankTopK
    "s11_ann_rerank" ->
      s"""WITH a AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv, v[1:16] AS qc FROM a WHERE vec_id % 50 = 0),
         |c AS (SELECT vec_id AS neighbor_id, v AS cv, v[1:16] AS cc FROM a),
         |coarse AS (
         |  SELECT query_id, neighbor_id, qv, cv, ${cosSql("qc", "cc")} AS coarse_sim
         |  FROM q, c WHERE neighbor_id <> query_id),
         |surv AS (SELECT query_id, neighbor_id, qv, cv FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY coarse_sim DESC, neighbor_id) AS crk
         |    FROM coarse)
         |  WHERE crk <= 20)
         |SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS cos_sim,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY ${cosSql("qv", "cv")} DESC, neighbor_id) AS rank
         |  FROM surv)
         |WHERE rank <= 5""".stripMargin,

    // per-label cohesion to own round-6 centroid — mirror of Similarity.clusterQuality
    // (same degenerate-input guards as s06)
    "s09_cluster_quality" ->
      s"""WITH a AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |cent AS (SELECT label, i, round(avg(v[i]), 6) AS c
         |         FROM a, unnest(generate_series(1, len(v))) AS t(i)
         |         GROUP BY label, i),
         |cv AS (SELECT label, list(c ORDER BY i) AS cv FROM cent GROUP BY label),
         |cvf AS (SELECT label, cv FROM cv WHERE list_dot_product(cv, cv) > 0),
         |e AS (SELECT label, v FROM a WHERE list_dot_product(v, v) > 0),
         |scored AS (SELECT e.label, ${cosSql("v", "cv")} AS cos FROM e JOIN cvf USING (label))
         |SELECT label, COUNT(*) AS n_vecs,
         |  round(avg(cos), 6) AS mean_cos, min(cos) AS min_cos
         |FROM scored GROUP BY label""".stripMargin,

    // one Lloyd's iteration from the k-smallest-id seeds — mirror of
    // Similarity.kmeansStep(k = 8): cosine argmax assignment (tie-break cluster asc),
    // then per-(cluster, dim) mean rounded to 6
    "s10_kmeans_step" ->
      s"""WITH a AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |seeds AS (SELECT CAST(vec_id AS INTEGER) AS cluster, v AS cv
         |          FROM (SELECT vec_id, v FROM a ORDER BY vec_id LIMIT 8)
         |          WHERE list_dot_product(v, v) > 0),
         |e AS (SELECT vec_id, v FROM a WHERE list_dot_product(v, v) > 0),
         |scored AS (SELECT vec_id, cluster, v, ${cosSql("v", "cv")} AS cos FROM e, seeds),
         |best AS (SELECT vec_id, cluster, v FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster) AS rk
         |    FROM scored)
         |  WHERE rk = 1)
         |SELECT cluster, CAST(i AS INTEGER) AS dim, round(avg(v[i]), 6) AS centroid,
         |       COUNT(*) AS n_members
         |FROM best, unnest(generate_series(1, len(v))) AS t(i)
         |GROUP BY cluster, i""".stripMargin,

    "d02_minhash_lsh" ->
      s"""WITH $shinglesCte,
         |hm AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % 1000000007 AS h FROM sh),
         |mh AS (SELECT doc_id, k, min(((2 * k + 1) * h + 12289 * k + 1) % 1000000007) AS minhash
         |       FROM (SELECT doc_id, h, unnest(generate_series(0, 15)) AS k FROM hm)
         |       GROUP BY doc_id, k)
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM mh a JOIN mh b ON a.k = b.k AND a.minhash = b.minhash AND a.doc_id < b.doc_id""".stripMargin,

    "d03_simhash" -> {
      val sums = (0 until 16)
        .map(i => s"SUM(CASE WHEN ascii(substr(h, ${i + 1}, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS s$i")
        .mkString(", ")
      val bits = (0 until 16)
        .map(i => s"(CASE WHEN s$i >= 0 THEN ${1L << i} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |h AS (SELECT doc_id, md5(token) AS h FROM toks),
         |sums AS (SELECT doc_id, $sums FROM h GROUP BY doc_id)
         |SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM sums""".stripMargin
    },

    // banded simhash near-dup pairs: 32-bit signature over word 3-grams, 4×8-bit
    // bands for candidates (pigeonhole-complete for hamming ≤ 3), exact bit_count
    // verification — mirror of Dedup.simhashHammingPairs
    "d12_simhash_hamming" -> {
      val sums = (0 until 32)
        .map(i => s"SUM(CASE WHEN ascii(substr(h, ${i + 1}, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS s$i")
        .mkString(", ")
      val bits = (0 until 32)
        .map(i => s"(CASE WHEN s$i >= 0 THEN ${1L << i} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $shinglesCte,
         |h AS (SELECT doc_id, md5(shingle) AS h FROM sh),
         |sums AS (SELECT doc_id, $sums FROM h GROUP BY doc_id),
         |sig AS (SELECT doc_id, CAST($bits AS BIGINT) AS sig FROM sums),
         |bd AS (SELECT doc_id, sig, band, (sig >> (8 * band)) & 255 AS bval
         |       FROM (SELECT doc_id, sig, unnest(generate_series(0, 3)) AS band FROM sig)),
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
         |                CAST(bit_count(xor(x.sig, y.sig)) AS INTEGER) AS hamming
         |         FROM bd x JOIN bd y ON x.band = y.band AND x.bval = y.bval
         |                            AND x.doc_id < y.doc_id)
         |SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 3""".stripMargin
    },

    // Jaccard over RARE shingles only (doc-freq <= 100), on 60-bit md5 shingle hashes
    // — lockstep with the skew guard and the hashed shuffle keys in
    // Dedup.ngramJaccardPairs.
    "d04_ngram_jaccard" ->
      s"""WITH $shinglesCte,
         |hsh AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM sh),
         |rare AS (SELECT h FROM hsh GROUP BY h HAVING COUNT(*) <= 100),
         |shf AS (SELECT hsh.doc_id, hsh.h FROM hsh JOIN rare USING (h)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY doc_id),
         |common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
         |           FROM shf a JOIN shf b ON a.h = b.h AND a.doc_id < b.doc_id
         |           GROUP BY 1, 2)
         |SELECT id_a, id_b, jaccard FROM (
         |  SELECT id_a, id_b,
         |         round(CAST(n_common AS DOUBLE) / CAST(na.n + nb.n - n_common AS DOUBLE), 6) AS jaccard
         |  FROM common
         |  JOIN sizes na ON na.doc_id = id_a
         |  JOIN sizes nb ON nb.doc_id = id_b)
         |WHERE jaccard >= 0.2""".stripMargin,

    // near-dup clusters: d02's pair graph + 3 min-label rounds (cluster id = min doc id
    // reachable in <=3 hops; singletons cluster as themselves)
    "d05_dedup_clusters" ->
      s"""WITH $shinglesCte,
         |$dedupClusterCtes
         |SELECT v AS doc_id, label AS cluster_id FROM l3""".stripMargin,

    // per-source triage table: doc/token counts + corpus token share, d05 dup rate
    // (non-keeper members under the min-id convention), mean per-row-micro-quantized
    // t02 quality — mirror of Curation.domainStats
    "dc01_domain_stats" ->
      s"""WITH $shinglesCte,
         |$dedupClusterCtes,
         |cl AS (SELECT v AS doc_id, label AS cluster_id FROM l3),
         |pd0 AS (SELECT doc_id, source, CAST(length(text) AS BIGINT) AS c,
         |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_toks,
         |    CAST(${occSql(" the ")} + ${occSql(" a ")} + ${occSql(" of ")} + ${occSql(" and ")} AS BIGINT) AS stop_hits
         |  FROM documents),
         |pd AS (SELECT doc_id, source, n_toks,
         |    CAST(floor(1000000.0 * (CAST(stop_hits AS DOUBLE) / CAST(n_toks AS DOUBLE)
         |      + CAST(n_toks AS DOUBLE) / CAST(c AS DOUBLE) * 10.0) + 0.5) AS BIGINT) AS quality_micro
         |  FROM pd0),
         |g AS (SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         |    CAST(SUM(CASE WHEN cl.cluster_id <> pd.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
         |    CAST(SUM(quality_micro) AS BIGINT) AS q_sum
         |  FROM pd JOIN cl ON cl.doc_id = pd.doc_id GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens FROM g)
         |SELECT source, n_docs, n_tokens,
         |  CAST(floor(1000000.0 * CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE) + 0.5) AS BIGINT) AS token_share_micro,
         |  n_dup_docs,
         |  CAST(floor(1000000.0 * CAST(n_dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) + 0.5) AS BIGINT) AS dup_rate_micro,
         |  CAST(floor(CAST(q_sum AS DOUBLE) / CAST(n_docs AS DOUBLE) + 0.5) AS BIGINT) AS mean_quality_micro
         |FROM g, tot""".stripMargin,

    // cap-the-domain-keep-its-best: top-k per source by micro quality, id tie-break
    // — mirror of Curation.qualityCap (KthSmallest threshold + bounded window ≡ the
    // plain DESC window because (quality, id) is unique per source)
    "dc02_quality_cap" ->
      s"""WITH pd0 AS (SELECT doc_id, source, CAST(length(text) AS BIGINT) AS c,
         |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_toks,
         |    CAST(${occSql(" the ")} + ${occSql(" a ")} + ${occSql(" of ")} + ${occSql(" and ")} AS BIGINT) AS stop_hits
         |  FROM documents),
         |pd AS (SELECT doc_id, source,
         |    CAST(floor(1000000.0 * (CAST(stop_hits AS DOUBLE) / CAST(n_toks AS DOUBLE)
         |      + CAST(n_toks AS DOUBLE) / CAST(c AS DOUBLE) * 10.0) + 0.5) AS BIGINT) AS quality_micro
         |  FROM pd0)
         |SELECT doc_id, source, quality_micro, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT doc_id, source, quality_micro,
         |    row_number() OVER (PARTITION BY source ORDER BY quality_micro DESC, doc_id) AS rk
         |  FROM pd)
         |WHERE rk <= $QualityCapK""".stripMargin,

    // snapshot churn: per-source early/late doc counts + share deltas + status,
    // joined with t35's vocabulary KL — mirror of Curation.corpusChurn
    "dc03_corpus_churn" ->
      s"""WITH toks AS (SELECT source, doc_id < $SourceDriftCut AS early,
         |                     unnest(string_split(text, ' ')) AS token FROM documents),
         |counts AS (SELECT source, token,
         |    CAST(SUM(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS cq,
         |    CAST(SUM(CASE WHEN early THEN 0 ELSE 1 END) AS BIGINT) AS cp
         |  FROM toks GROUP BY 1, 2),
         |tot AS (SELECT source, CAST(SUM(cp) AS BIGINT) AS np, CAST(SUM(cq) AS BIGINT) AS nq,
         |               COUNT(*) AS vocab
         |        FROM counts GROUP BY 1),
         |term AS (SELECT source,
         |    CAST(floor(1000000.0 * ((cp + 1)::DOUBLE / (np + vocab)::DOUBLE)
         |      * ln(((cp + 1)::DOUBLE / (np + vocab)::DOUBLE)
         |           / ((cq + 1)::DOUBLE / (nq + vocab)::DOUBLE)) + 0.5) AS BIGINT) AS term_micro
         |  FROM counts JOIN tot USING (source)),
         |kl AS (SELECT source, CAST(SUM(term_micro) AS BIGINT) AS kl_micro_nats
         |       FROM term GROUP BY source),
         |dc AS (SELECT source,
         |    CAST(SUM(CASE WHEN doc_id < $SourceDriftCut THEN 1 ELSE 0 END) AS BIGINT) AS docs_early,
         |    CAST(SUM(CASE WHEN doc_id < $SourceDriftCut THEN 0 ELSE 1 END) AS BIGINT) AS docs_late
         |  FROM documents GROUP BY 1),
         |dtot AS (SELECT CAST(SUM(docs_early) AS BIGINT) AS tot_early,
         |                CAST(SUM(docs_late) AS BIGINT) AS tot_late FROM dc),
         |shr AS (SELECT source, docs_early, docs_late,
         |    CASE WHEN tot_early = 0 THEN 0
         |         ELSE CAST(floor(1000000.0 * CAST(docs_early AS DOUBLE) / CAST(tot_early AS DOUBLE) + 0.5) AS BIGINT) END AS share_early_micro,
         |    CASE WHEN tot_late = 0 THEN 0
         |         ELSE CAST(floor(1000000.0 * CAST(docs_late AS DOUBLE) / CAST(tot_late AS DOUBLE) + 0.5) AS BIGINT) END AS share_late_micro
         |  FROM dc, dtot)
         |SELECT shr.source, docs_early, docs_late, share_early_micro, share_late_micro,
         |  share_late_micro - share_early_micro AS delta_share_micro,
         |  CASE WHEN docs_early = 0 AND docs_late > 0 THEN 'appeared'
         |       WHEN docs_late = 0 AND docs_early > 0 THEN 'vanished'
         |       WHEN share_late_micro > share_early_micro THEN 'grew'
         |       WHEN share_late_micro < share_early_micro THEN 'shrunk'
         |       ELSE 'flat' END AS status,
         |  kl.kl_micro_nats
         |FROM shr LEFT JOIN kl USING (source)""".stripMargin,

    // d05's clusters + the t07 hash split applied to the CLUSTER id — the
    // leakage-safe split where near-dups never straddle train/eval; mirror of
    // Dedup.clusterAwareSplit (thresholds 9000/9500 = 90/5/5 over 10k buckets)
    "d16_cluster_split" ->
      s"""WITH $shinglesCte,
         |$dedupClusterCtes,
         |cl AS (SELECT v AS doc_id, label AS cluster_id FROM l3)
         |SELECT doc_id, cluster_id, bucket,
         |  CASE WHEN bucket < 9000 THEN 'train'
         |       WHEN bucket < 9500 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id, cluster_id, ${bucketSql("cluster_id")} AS bucket FROM cl)""".stripMargin,

    // d05's clusters + the keep-longest decision: one row per cluster with the
    // longest member (token count, doc-id tie-break) and the drop count — mirror of
    // Dedup.clusterKeepLongest
    "d15_cluster_keep" ->
      s"""WITH $shinglesCte,
         |$dedupClusterCtes,
         |cl AS (SELECT v AS doc_id, label AS cluster_id FROM l3),
         |tk AS (SELECT doc_id,
         |         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
         |       FROM documents),
         |mm AS (SELECT cl.cluster_id, cl.doc_id, tk.n_tokens,
         |         row_number() OVER (PARTITION BY cl.cluster_id
         |                            ORDER BY tk.n_tokens DESC, cl.doc_id) AS rk,
         |         COUNT(*) OVER (PARTITION BY cl.cluster_id) AS n_members
         |       FROM cl JOIN tk ON tk.doc_id = cl.doc_id)
         |SELECT cluster_id, doc_id AS kept_doc, n_tokens AS kept_tokens,
         |  CAST(n_members AS BIGINT) AS n_members,
         |  CAST(n_members - 1 AS BIGINT) AS n_dropped
         |FROM mm WHERE rk = 1""".stripMargin,

    // d02's minhash bands + t07's split buckets: eval docs sharing a band with a train doc
    "d06_contamination" ->
      s"""WITH $shinglesCte,
         |hm AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % 1000000007 AS h FROM sh),
         |mh AS (SELECT doc_id, k, min(((2 * k + 1) * h + 12289 * k + 1) % 1000000007) AS minhash
         |       FROM (SELECT doc_id, h, unnest(generate_series(0, 15)) AS k FROM hm)
         |       GROUP BY doc_id, k),
         |sp AS (SELECT doc_id,
         |         CASE WHEN ${bucketSql("doc_id")} < 9000 THEN 'train'
         |              WHEN ${bucketSql("doc_id")} < 9500 THEN 'val'
         |              ELSE 'test' END AS split
         |       FROM documents),
         |tr AS (SELECT k, minhash, mh.doc_id AS train_id
         |       FROM mh JOIN sp USING (doc_id) WHERE split = 'train'),
         |ev AS (SELECT k, minhash, mh.doc_id AS eval_id, split
         |       FROM mh JOIN sp USING (doc_id) WHERE split <> 'train')
         |SELECT eval_id AS doc_id, split,
         |       CAST(COUNT(DISTINCT train_id) AS BIGINT) AS n_train_matches,
         |       MIN(train_id) AS first_train_id
         |FROM ev JOIN tr USING (k, minhash)
         |GROUP BY eval_id, split""".stripMargin,

    // cumulative curation funnel: total -> t05 quality-kept -> d05 cluster keeper
    // OVER THE SURVIVORS — mirror of Curation.funnel (clustering runs on the
    // quality-filtered corpus; every stage always reports, 0 included)
    "d08_curation_funnel" ->
      s"""WITH $shinglesCte,
         |q AS (SELECT doc_id FROM (
         |    SELECT doc_id,
         |      CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
         |      CAST(${occSql(" the ")} + ${occSql(" a ")} + ${occSql(" of ")} + ${occSql(" and ")} AS BIGINT) AS stop_hits,
         |      CAST(length(text) AS BIGINT) AS n_chars
         |    FROM documents)
         |  WHERE n_tokens >= 10 AND stop_hits >= 1 AND (n_chars - (n_tokens - 1)) <= 12 * n_tokens),
         |shq AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN q USING (doc_id)),
         |hm AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % 1000000007 AS h FROM shq),
         |mh AS (SELECT doc_id, k, min(((2 * k + 1) * h + 12289 * k + 1) % 1000000007) AS minhash
         |       FROM (SELECT doc_id, h, unnest(generate_series(0, 15)) AS k FROM hm)
         |       GROUP BY doc_id, k),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |          FROM mh a JOIN mh b ON a.k = b.k AND a.minhash = b.minhash AND a.doc_id < b.doc_id),
         |und AS (SELECT id_a AS a, id_b AS b FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
         |l0 AS (SELECT doc_id AS v, doc_id AS label FROM q),
         |n1 AS (SELECT u.a, MIN(l.label) AS m FROM und u JOIN l0 l ON l.v = u.b GROUP BY u.a),
         |l1 AS (SELECT l0.v, LEAST(l0.label, COALESCE(n1.m, l0.label)) AS label
         |       FROM l0 LEFT JOIN n1 ON n1.a = l0.v),
         |n2 AS (SELECT u.a, MIN(l.label) AS m FROM und u JOIN l1 l ON l.v = u.b GROUP BY u.a),
         |l2 AS (SELECT l1.v, LEAST(l1.label, COALESCE(n2.m, l1.label)) AS label
         |       FROM l1 LEFT JOIN n2 ON n2.a = l1.v),
         |n3 AS (SELECT u.a, MIN(l.label) AS m FROM und u JOIN l2 l ON l.v = u.b GROUP BY u.a),
         |l3 AS (SELECT l2.v, LEAST(l2.label, COALESCE(n3.m, l2.label)) AS label
         |       FROM l2 LEFT JOIN n3 ON n3.a = l2.v),
         |keep AS (SELECT v AS doc_id FROM l3 WHERE label = v),
         |s2 AS (SELECT d.doc_id FROM documents d JOIN q USING (doc_id)),
         |s3 AS (SELECT s2.doc_id FROM s2 JOIN keep USING (doc_id))
         |SELECT '00_total' AS stage, COUNT(*) AS n_docs FROM documents
         |UNION ALL SELECT '01_quality', COUNT(*) FROM s2
         |UNION ALL SELECT '02_dedup_keeper', COUNT(*) FROM s3""".stripMargin,

    // boilerplate-passage fraction per doc (doc-freq >= 25 shingles) — mirror of
    // Dedup.boilerplate on 60-bit md5 shingle hashes
    "d07_boilerplate" ->
      s"""WITH $shinglesCte,
         |hsh AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM sh),
         |hot AS (SELECT h FROM hsh GROUP BY h HAVING COUNT(*) >= 25),
         |per AS (SELECT doc_id, COUNT(*) AS n_shingles FROM hsh GROUP BY doc_id),
         |hp AS (SELECT doc_id, COUNT(*) AS n_boilerplate
         |       FROM hsh JOIN hot USING (h) GROUP BY doc_id)
         |SELECT per.doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
         |  CAST(COALESCE(n_boilerplate, 0) AS BIGINT) AS n_boilerplate,
         |  round(CAST(COALESCE(n_boilerplate, 0) AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6)
         |    AS boilerplate_frac
         |FROM per LEFT JOIN hp ON per.doc_id = hp.doc_id""".stripMargin,

    "s01_ann_bruteforce" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0),
         |scored AS (
         |  SELECT query_id, c.vec_id AS neighbor_id, ${cosSql("qv", "c.v")} AS cos_sim
         |  FROM q, e c WHERE c.vec_id <> query_id)
         |SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored)
         |WHERE rank <= 10""".stripMargin,

    // Hybrid retrieval: BM25 lexical top-listK (t21's log-free integer-micro
    // weights, summed per (query, doc)) × brute-force cosine top-listK (s01's
    // kernel), fused by integer reciprocal-rank fusion 1000000 // (k0 + rank),
    // absent list = 0 — mirror of Retrieval.hybridTopK with the shared Hybrid*/RrfK0
    // constants interpolated so a retune cannot diverge the mirror. s17 = uncapped
    // (the dense-vocab worst case); s18 = the same query with the df cap engaged,
    // both from ONE builder so the mirrors cannot drift apart
    "s17_hybrid_rrf" -> hybridRrfSql(dfCap = None),
    "s18_hybrid_rrf_capped" -> hybridRrfSql(dfCap = Some(HybridDfCap)),

    // SemDeDup: nearest-centroid cells (s04's deterministic centroid sample, argmax
    // tie-break (cosine desc, cid)), then a vector is dropped when a lower-id vector
    // in its cell clears the cosine threshold — mirror of Similarity.semDedup with
    // the shared SemDedup* constants interpolated
    "d13_semdedup" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % $SemDedupCentroidMod = 0),
         |scored_cells AS (
         |  SELECT e.vec_id, e.v, cents.cid, ${cosSql("e.v", "cents.cv")} AS cc
         |  FROM e, cents),
         |cells AS MATERIALIZED (
         |  SELECT vec_id, v, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid) AS crank
         |    FROM scored_cells)
         |  WHERE crank = 1),
         |close AS (
         |  SELECT a.vec_id, COUNT(*) AS n_close_lower
         |  FROM cells a JOIN cells b USING (cid)
         |  WHERE b.vec_id < a.vec_id AND ${cosSql("a.v", "b.v")} >= $SemDedupThreshold
         |  GROUP BY 1)
         |SELECT c.vec_id, c.cid,
         |       CAST(COALESCE(n_close_lower, 0) AS BIGINT) AS n_close_lower,
         |       COALESCE(n_close_lower, 0) = 0 AS is_kept
         |FROM cells c LEFT JOIN close USING (vec_id)""".stripMargin,

    "s02_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |b AS (SELECT vec_id, v, ${lshBucketSql("v", 6, 64)} AS bucket FROM e),
         |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id % 50 = 0),
         |scored AS (
         |  SELECT query_id, c.vec_id AS neighbor_id, ${cosSql("qv", "c.v")} AS cos_sim
         |  FROM q JOIN b c USING (bucket) WHERE c.vec_id <> query_id)
         |SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored)
         |WHERE rank <= 5""".stripMargin,

    // LSH-bucketed near-dup (mirror of Similarity.nearDupPairs): candidates collide in
    // either of 2 hash tables (disjoint plane families), exact cosine on candidates only.
    "s03_embed_neardup" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |b AS (SELECT vec_id,
         |             ${lshBucketSql("v", 6, 64, offset = 0)} AS b0,
         |             ${lshBucketSql("v", 6, 64, offset = 6)} AS b1
         |      FROM e),
         |cand AS (
         |  SELECT a.vec_id AS id_a, c.vec_id AS id_b FROM b a JOIN b c ON a.b0 = c.b0 AND a.vec_id < c.vec_id
         |  UNION
         |  SELECT a.vec_id AS id_a, c.vec_id AS id_b FROM b a JOIN b c ON a.b1 = c.b1 AND a.vec_id < c.vec_id)
         |SELECT id_a, id_b, ${cosSql("ea.v", "eb.v")} AS cos_sim
         |FROM cand
         |JOIN e ea ON ea.vec_id = id_a
         |JOIN e eb ON eb.vec_id = id_b
         |WHERE ${cosSql("ea.v", "eb.v")} >= 0.4""".stripMargin,

    // approximate kNN graph (mirror of Similarity.knnGraph): s03's two-table LSH
    // candidate union, each unordered pair scored once, both directions ranked top-k
    "s20_knn_graph" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |b AS (SELECT vec_id,
         |             ${lshBucketSql("v", 6, 64, offset = 0)} AS b0,
         |             ${lshBucketSql("v", 6, 64, offset = 6)} AS b1
         |      FROM e),
         |cand AS (
         |  SELECT a.vec_id AS id_a, c.vec_id AS id_b FROM b a JOIN b c ON a.b0 = c.b0 AND a.vec_id < c.vec_id
         |  UNION
         |  SELECT a.vec_id AS id_a, c.vec_id AS id_b FROM b a JOIN b c ON a.b1 = c.b1 AND a.vec_id < c.vec_id),
         |scored AS (
         |  SELECT id_a, id_b, ${cosSql("ea.v", "eb.v")} AS cos_sim
         |  FROM cand JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b),
         |sym AS (SELECT id_a AS vec_id, id_b AS neighbor_id, cos_sim FROM scored
         |        UNION ALL SELECT id_b, id_a, cos_sim FROM scored)
         |SELECT vec_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM sym)
         |WHERE rank <= $KnnGraphK""".stripMargin,

    // IVF ANN (mirror of Similarity.ivfTopK): centroids = vec_id ≡ 0 (mod 97); each
    // vector in its nearest cell (rounded cosine, cid tiebreak); queries probe the 2
    // nearest cells; exact cosine top-5 within them.
    "s04_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 97 = 0),
         |scored_cells AS (
         |  SELECT e.vec_id AS rid, e.v, cents.cid, ${cosSql("e.v", "cents.cv")} AS cc
         |  FROM e, cents),
         |cells AS (
         |  SELECT rid AS neighbor_id, v AS cv2, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY rid ORDER BY cc DESC, cid) AS crank
         |    FROM scored_cells)
         |  WHERE crank <= 1),
         |probes AS (
         |  SELECT rid AS query_id, v AS qv, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY rid ORDER BY cc DESC, cid) AS crank
         |    FROM scored_cells WHERE rid % 50 = 0)
         |  WHERE crank <= 2),
         |scored AS (
         |  SELECT query_id, neighbor_id, ${cosSql("qv", "cv2")} AS cos_sim
         |  FROM probes JOIN cells USING (cid)
         |  WHERE query_id <> neighbor_id)
         |SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored)
         |WHERE rank <= 5""".stripMargin,

    // recall@5 of the LSH and IVF searches vs the exact brute-force top-5 — mirror of
    // Similarity.annRecall, composed from the s01/s02/s04 oracle fragments
    "s07_ann_recall" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0),
         |truth AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, c.vec_id AS neighbor_id,
         |           row_number() OVER (PARTITION BY query_id
         |             ORDER BY ${cosSql("qv", "c.v")} DESC, c.vec_id) AS rank
         |    FROM q, e c WHERE c.vec_id <> query_id)
         |  WHERE rank <= 5),
         |b AS (SELECT vec_id, v, ${lshBucketSql("v", 6, 64)} AS bucket FROM e),
         |lsh AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id,
         |           row_number() OVER (PARTITION BY a.vec_id
         |             ORDER BY ${cosSql("a.v", "c.v")} DESC, c.vec_id) AS rank
         |    FROM b a JOIN b c USING (bucket)
         |    WHERE a.vec_id % 50 = 0 AND c.vec_id <> a.vec_id)
         |  WHERE rank <= 5),
         |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 97 = 0),
         |scored_cells AS (
         |  SELECT e.vec_id AS rid, e.v, cents.cid, ${cosSql("e.v", "cents.cv")} AS cc
         |  FROM e, cents),
         |cells AS (
         |  SELECT rid AS neighbor_id, v AS cv2, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY rid ORDER BY cc DESC, cid) AS crank
         |    FROM scored_cells)
         |  WHERE crank <= 1),
         |probes AS (
         |  SELECT rid AS query_id, v AS qv, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY rid ORDER BY cc DESC, cid) AS crank
         |    FROM scored_cells WHERE rid % 50 = 0)
         |  WHERE crank <= 2),
         |ivf AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |           row_number() OVER (PARTITION BY query_id
         |             ORDER BY ${cosSql("qv", "cv2")} DESC, neighbor_id) AS rank
         |    FROM probes JOIN cells USING (cid)
         |    WHERE query_id <> neighbor_id)
         |  WHERE rank <= 5),
         |approx AS (
         |  SELECT 'lsh' AS method, query_id, neighbor_id FROM lsh
         |  UNION ALL
         |  SELECT 'ivf' AS method, query_id, neighbor_id FROM ivf),
         |hits AS (
         |  SELECT method, query_id, COUNT(*) AS n_hit
         |  FROM approx SEMI JOIN truth USING (query_id, neighbor_id)
         |  GROUP BY method, query_id),
         |base AS (
         |  SELECT query_id, method
         |  FROM (SELECT DISTINCT query_id FROM truth), (VALUES ('lsh'), ('ivf')) m(method))
         |SELECT method, query_id,
         |       round(COALESCE(n_hit, 0) / 5.0, 6) AS recall_at_k
         |FROM base LEFT JOIN hits USING (method, query_id)""".stripMargin,

    // int8 quantization diagnostics — mirror of Similarity.quantizeError (⌊x+½⌋
    // rounding; max err, not mean, so fp order can't drift)
    "s08_quantize" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings),
         |m AS (SELECT vec_id, dv, list_max(list_transform(dv, x -> abs(x))) AS maxabs FROM v),
         |s AS (SELECT vec_id, dv, maxabs / 127.0 AS scale FROM m WHERE maxabs > 0)
         |SELECT vec_id,
         |  CAST(len(dv) AS INTEGER) AS n_dims,
         |  round(scale, 6) AS scale,
         |  CAST(list_sum(list_transform(dv,
         |    x -> CAST(abs(greatest(-127.0, least(127.0, floor(x / scale + 0.5)))) AS BIGINT))) AS BIGINT) AS sum_abs_q,
         |  round(list_max(list_transform(dv,
         |    x -> abs(x - greatest(-127.0, least(127.0, floor(x / scale + 0.5))) * scale))), 6) AS max_abs_err
         |FROM s""".stripMargin,

    "m01_media_features" ->
      s"""SELECT doc_id AS asset_id, source AS media_type,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  CAST((octet_length(encode(text)) * 7) % 1920 + 1 AS INTEGER) AS width,
         |  CAST((octet_length(encode(text)) * 13) % 1080 + 1 AS INTEGER) AS height,
         |  round((octet_length(encode(text)) % 256) / 255.0, 6) AS brightness
         |FROM documents""".stripMargin,

    // stub resize truncates to (641*480) % 4096 = 480 bytes (ASCII text: byte truncation
    // == substr); md5 compared instead of raw binary so the diff stays engine-neutral
    "m02_media_resize" ->
      s"""SELECT doc_id AS asset_id, source AS media_type,
         |  CAST(LEAST(length(text), 480) AS BIGINT) AS n_bytes,
         |  md5(substr(text, 1, 480)) AS media_md5
         |FROM documents""".stripMargin,

    // every 2nd 64-byte window of the byte stream is a "frame" (stub framing)
    "m03_frame_sample" ->
      s"""SELECT doc_id AS asset_id, CAST(i AS INTEGER) AS frame_index,
         |  CAST(i * 64 AS BIGINT) AS frame_offset,
         |  md5(substr(text, CAST(i * 64 + 1 AS INTEGER), 64)) AS frame_md5
         |FROM (SELECT doc_id, text, unnest(generate_series(0, length(text) // 64 - 1)) AS i
         |      FROM documents)
         |WHERE i % 2 = 0""".stripMargin,

    // clip-level near-dup: frame-set Jaccard over m03's sampled-frame hashes with
    // the doc-freq cap on hot frames — mirror of Multimodal.clipNearDup(64, 2)
    "m06_clip_near_dup" ->
      s"""WITH f AS (
         |  SELECT doc_id AS asset_id,
         |         md5(substr(text, CAST(i * 64 + 1 AS INTEGER), 64)) AS h
         |  FROM (SELECT doc_id, text, unnest(generate_series(0, length(text) // 64 - 1)) AS i
         |        FROM documents)
         |  WHERE i % 2 = 0),
         |fh AS (SELECT DISTINCT asset_id, h FROM f),
         |rare AS (SELECT h FROM fh GROUP BY h HAVING COUNT(*) <= 1000),
         |adm AS (SELECT asset_id, h FROM fh JOIN rare USING (h)),
         |sizes AS (SELECT asset_id, COUNT(*) AS n FROM adm GROUP BY 1),
         |pairs AS (SELECT a.asset_id AS id_a, b.asset_id AS id_b, COUNT(*) AS n_shared
         |          FROM adm a JOIN adm b ON a.h = b.h AND a.asset_id < b.asset_id
         |          GROUP BY 1, 2),
         |scored AS (SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
         |    CAST(floor(1000000.0 * n_shared::DOUBLE
         |      / (sa.n + sb.n - n_shared)::DOUBLE + 0.5) AS BIGINT) AS jaccard_micro
         |  FROM pairs
         |  JOIN sizes sa ON sa.asset_id = id_a
         |  JOIN sizes sb ON sb.asset_id = id_b)
         |SELECT id_a, id_b, n_shared, jaccard_micro
         |FROM scored WHERE jaccard_micro >= 300000""".stripMargin,

    // frames shared across >1 asset — mirror of Multimodal.frameDedupDF(64, 2);
    // keeper = lexicographic min (asset, frame index), via struct-min in both engines
    "m04_frame_dedup" ->
      s"""WITH f AS (
         |  SELECT doc_id AS asset_id, CAST(i AS INTEGER) AS frame_index,
         |         md5(substr(text, CAST(i * 64 + 1 AS INTEGER), 64)) AS frame_md5
         |  FROM (SELECT doc_id, text, unnest(generate_series(0, length(text) // 64 - 1)) AS i
         |        FROM documents)
         |  WHERE i % 2 = 0)
         |SELECT frame_md5, CAST(COUNT(DISTINCT asset_id) AS BIGINT) AS n_assets,
         |       COUNT(*) AS n_frames,
         |       (MIN({'a': asset_id, 'f': frame_index})).a AS keep_asset,
         |       (MIN({'a': asset_id, 'f': frame_index})).f AS keep_frame
         |FROM f GROUP BY frame_md5
         |HAVING COUNT(DISTINCT asset_id) > 1""".stripMargin,

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

    // local clustering coefficient over the g21 undirected closure — mirror of
    // GraphQueries.clusteringCoefficient (2·tri/(deg·(deg−1)), degree-<2 pins 0)
    "g28_clustering_coeff" ->
      s"""$snap,
         |und AS (SELECT DISTINCT LEAST(source_id, destination_id) AS lo,
         |                        GREATEST(source_id, destination_id) AS hi
         |        FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |deg AS (SELECT v AS vertex_id, COUNT(*) AS degree FROM (
         |          SELECT lo AS v FROM und UNION ALL SELECT hi FROM und)
         |        GROUP BY v),
         |tri AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
         |        FROM und e1
         |        JOIN und e2 ON e2.lo = e1.hi
         |        JOIN und e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
         |tcnt AS (SELECT v AS vertex_id, COUNT(*) AS n_triangles FROM (
         |           SELECT a AS v FROM tri
         |           UNION ALL SELECT b FROM tri
         |           UNION ALL SELECT c FROM tri)
         |         GROUP BY v)
         |SELECT d.vertex_id, d.degree,
         |  COALESCE(t.n_triangles, 0) AS n_triangles,
         |  CASE WHEN d.degree < 2 THEN 0.0::DOUBLE
         |       ELSE round(2.0::DOUBLE * CAST(COALESCE(t.n_triangles, 0) AS DOUBLE)
         |                  / CAST(d.degree * (d.degree - 1) AS DOUBLE), 6) END AS clustering
         |FROM deg d LEFT JOIN tcnt t USING (vertex_id)""".stripMargin,

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

    // personalized PageRank — same unrolled integer-fixpoint shape as g17, teleport
    // mass restricted to the seed set (v ≡ 0 mod 100) — mirror of
    // GraphQueries.personalizedPageRank
    "g32_personalized_pagerank" -> {
      def r(prev: String, cur: String, contrib: String) =
        s"""$contrib AS (SELECT e.dst AS v, CAST(SUM($prev.pr // deg.deg) AS BIGINT) AS in_sum
           |       FROM e JOIN deg USING (src) JOIN $prev ON $prev.v = e.src GROUP BY e.dst),
           |$cur AS (SELECT vx.v,
           |         CASE WHEN vx.v % 100 = 0 THEN 150000000000 // (SELECT n FROM ns) ELSE 0 END
           |           + (COALESCE($contrib.in_sum, 0) * 85) // 100 AS pr
           |       FROM vx LEFT JOIN $contrib USING (v))""".stripMargin
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |ns AS (SELECT COUNT(*) AS n FROM vx WHERE v % 100 = 0),
         |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
         |r0 AS (SELECT v, CASE WHEN v % 100 = 0
         |                      THEN 1000000000000 // (SELECT n FROM ns) ELSE 0 END AS pr FROM vx),
         |${r("r0", "r1", "c1")},
         |${r("r1", "r2", "c2")},
         |${r("r2", "r3", "c3")}
         |SELECT v AS vertex_id, CAST(pr AS BIGINT) AS ppr_fp FROM r3""".stripMargin
    },

    // HITS hubs/authorities, 2 iterations, integer max-normalization after every
    // half-step — mirror of GraphQueries.hits
    "g33_hits" -> {
      def half(prev: String, cur: String, from: String, to: String) =
        s"""${cur}r AS (SELECT e.$to AS v, CAST(SUM($prev.s) AS BIGINT) AS raw
           |       FROM e JOIN $prev ON $prev.v = e.$from GROUP BY e.$to),
           |${cur}m AS (SELECT MAX(raw) AS mx FROM ${cur}r),
           |$cur AS (SELECT vx.v,
           |         CAST((COALESCE(${cur}r.raw, 0) * 1000000) // (SELECT mx FROM ${cur}m) AS BIGINT) AS s
           |       FROM vx LEFT JOIN ${cur}r USING (v))""".stripMargin
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |h0 AS (SELECT v, 1000000 AS s FROM vx),
         |${half("h0", "a1", "src", "dst")},
         |${half("a1", "h1", "dst", "src")},
         |${half("h1", "a2", "src", "dst")},
         |${half("a2", "h2", "dst", "src")}
         |SELECT vx.v AS vertex_id, a2.s AS auth_fp, h2.s AS hub_fp
         |FROM vx JOIN a2 USING (v) JOIN h2 USING (v)""".stripMargin
    },

    // SALSA: 4 unrolled degree-normalized half-steps with integer max-normalization
    // (`//` on non-negatives ≡ Spark's DIV) — mirror of GraphQueries.salsa
    "g43_salsa" -> {
      def half(prev: String, cur: String, from: String, to: String, deg: String) =
        s"""${cur}r AS (SELECT e.$to AS v, CAST(SUM($prev.s // e.$deg) AS BIGINT) AS raw
           |       FROM e JOIN $prev ON $prev.v = e.$from GROUP BY e.$to),
           |${cur}m AS (SELECT MAX(raw) AS mx FROM ${cur}r),
           |$cur AS (SELECT vx.v,
           |         CAST((COALESCE(${cur}r.raw, 0) * 1000000) // (SELECT mx FROM ${cur}m) AS BIGINT) AS s
           |       FROM vx LEFT JOIN ${cur}r USING (v))""".stripMargin
      s"""$snap,
         |e0 AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |       WHERE graph_id = 1 AND state = 0),
         |od AS (SELECT src, COUNT(*) AS dout FROM e0 GROUP BY src),
         |ind AS (SELECT dst, COUNT(*) AS din FROM e0 GROUP BY dst),
         |e AS (SELECT e0.src, e0.dst, od.dout, ind.din
         |      FROM e0 JOIN od USING (src) JOIN ind USING (dst)),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |h0 AS (SELECT v, 1000000 AS s FROM vx),
         |${half("h0", "a1", "src", "dst", "dout")},
         |${half("a1", "h1", "dst", "src", "din")},
         |${half("h1", "a2", "src", "dst", "dout")},
         |${half("a2", "h2", "dst", "src", "din")}
         |SELECT vx.v AS vertex_id, a2.s AS auth_fp, h2.s AS hub_fp
         |FROM vx JOIN a2 USING (v) JOIN h2 USING (v)""".stripMargin
    },

    // local bridges: undirected edges with no shared neighbor (no closing triangle)
    // — mirror of GraphQueries.localBridges
    "g36_local_bridges" ->
      s"""$snap,
         |und AS (SELECT DISTINCT LEAST(source_id, destination_id) AS lo,
         |                        GREATEST(source_id, destination_id) AS hi
         |        FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |adj AS (SELECT lo AS v, hi AS w FROM und UNION ALL SELECT hi, lo FROM und),
         |wc AS (SELECT DISTINCT a.v AS lo, b.v AS hi
         |       FROM adj a JOIN adj b ON a.w = b.w AND a.v < b.v)
         |SELECT und.lo, und.hi FROM und
         |LEFT JOIN wc ON wc.lo = und.lo AND wc.hi = und.hi
         |WHERE wc.lo IS NULL""".stripMargin,

    // friend-of-friend top-5 per seed: 2-hop expansion, distinct bridge count,
    // anti-join on already-followed — mirror of GraphQueries.friendRecs
    "g35_friend_recs" ->
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |h AS (SELECT e1.src AS s, e1.dst AS b, e2.dst AS c
         |      FROM e e1 JOIN e e2 ON e2.src = e1.dst
         |      WHERE e1.src % 100 = 0 AND e2.dst <> e1.src),
         |cnt AS (SELECT s, c, COUNT(DISTINCT b) AS n_via FROM h GROUP BY 1, 2),
         |fil AS (SELECT cnt.s, cnt.c, cnt.n_via FROM cnt
         |        LEFT JOIN e ON e.src = cnt.s AND e.dst = cnt.c
         |        WHERE e.src IS NULL)
         |SELECT s AS seed_id, c AS rec_id, n_via, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY s ORDER BY n_via DESC, c) AS rank
         |  FROM fil)
         |WHERE rank <= 5""".stripMargin,

    // deterministic random walks: row_number-indexed adjacency, md5(walk:step) mod
    // outdeg choices, 3 unrolled steps — mirror of GraphQueries.randomWalks
    "g45_random_walks" -> {
      def step(t: Int) =
        s"""w$t AS (SELECT w${t - 1}.walk_id, CAST($t AS INTEGER) AS step, a.dst AS v
           |       FROM w${t - 1} JOIN a ON a.src = w${t - 1}.v
           |       WHERE a.idx = ('0x' || substr(md5(CAST(w${t - 1}.walk_id AS VARCHAR) || ':$t'), 1, 8))::BIGINT % a.dout)""".stripMargin
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |a AS (SELECT src, dst,
         |        row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx,
         |        COUNT(*) OVER (PARTITION BY src) AS dout
         |      FROM e),
         |w0 AS (SELECT src AS walk_id, CAST(0 AS INTEGER) AS step, src AS v
         |       FROM (SELECT DISTINCT src FROM a) WHERE src % $WalkSeedMod = 0),
         |${step(1)},
         |${step(2)},
         |${step(3)}
         |SELECT walk_id, step, v AS vertex_id FROM w0
         |UNION ALL SELECT walk_id, step, v FROM w1
         |UNION ALL SELECT walk_id, step, v FROM w2
         |UNION ALL SELECT walk_id, step, v FROM w3""".stripMargin
    },

    // sampled harmonic centrality: per-seed bounded BFS (3 unrolled rounds with
    // min folds on (seed, v)), then Σ 10^6 // d per vertex over d >= 1 — mirror of
    // GraphQueries.harmonicCentrality
    "g44_harmonic" -> {
      def round(h: Int) =
        s"""n$h AS (SELECT r${h - 1}.seed, e.dst AS v, CAST($h AS INTEGER) AS dist
           |       FROM r${h - 1} JOIN e ON r${h - 1}.v = e.src WHERE r${h - 1}.dist = ${h - 1}),
           |r$h AS (SELECT seed, v, MIN(dist) AS dist FROM (
           |         SELECT * FROM r${h - 1} UNION ALL SELECT * FROM n$h) GROUP BY seed, v)""".stripMargin
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |r0 AS (SELECT v AS seed, v, CAST(0 AS INTEGER) AS dist FROM vx WHERE v % 100 = 0),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT v AS vertex_id, COUNT(*) AS n_seeds,
         |       CAST(SUM(1000000 // dist) AS BIGINT) AS harmonic_micro
         |FROM r3 WHERE dist >= 1 GROUP BY v""".stripMargin
    },

    // bounded BFS from the seed set, 3 unrolled frontier expansions with min-label
    // folds — mirror of GraphQueries.bfsDistance
    "g34_bfs_distance" -> {
      def round(h: Int) =
        s"""n$h AS (SELECT e.dst AS v, CAST($h AS INTEGER) AS dist
           |       FROM r${h - 1} JOIN e ON r${h - 1}.v = e.src WHERE r${h - 1}.dist = ${h - 1}),
           |r$h AS (SELECT v, MIN(dist) AS dist FROM (
           |         SELECT * FROM r${h - 1} UNION ALL SELECT * FROM n$h) GROUP BY v)""".stripMargin
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |r0 AS (SELECT v, CAST(0 AS INTEGER) AS dist FROM vx WHERE v % 100 = 0),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT v AS vertex_id, CAST(dist AS INTEGER) AS dist FROM r3""".stripMargin
    },

    // connected components to fixpoint — the oracle computes TRUE reachability with a
    // recursive CTE (component = min reachable id), so a hash match proves the Spark
    // fixpoint loop converged, not merely that both ran the same number of rounds
    "g29_connected_components" ->
      s"""${snap.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |und AS (SELECT DISTINCT LEAST(source_id, destination_id) AS lo,
         |                        GREATEST(source_id, destination_id) AS hi
         |        FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |adj AS (SELECT lo AS a, hi AS b FROM und UNION SELECT hi, lo FROM und),
         |verts AS (SELECT DISTINCT a AS v FROM adj),
         |reach AS (SELECT v, v AS r FROM verts
         |          UNION
         |          SELECT adj.b AS v, reach.r FROM reach JOIN adj ON adj.a = reach.v)
         |SELECT v AS vertex_id, min(r) AS component FROM reach GROUP BY v""".stripMargin,

    // degree assortativity (Pearson over endpoint degrees, exact integer sums,
    // variance-term product in double space) — mirror of GraphQueries.assortativity
    "g30_assortativity" ->
      s"""$snap,
         |und AS (SELECT DISTINCT LEAST(source_id, destination_id) AS lo,
         |                        GREATEST(source_id, destination_id) AS hi
         |        FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |deg AS (SELECT v, COUNT(*) AS d FROM (
         |          SELECT lo AS v FROM und UNION ALL SELECT hi FROM und)
         |        GROUP BY v),
         |pairs AS (SELECT dx.d AS dx, dy.d AS dy
         |          FROM (SELECT lo, hi FROM und UNION ALL SELECT hi, lo FROM und) e
         |          JOIN deg dx ON dx.v = e.lo
         |          JOIN deg dy ON dy.v = e.hi),
         |a AS (SELECT COUNT(*) AS n,
         |        CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
         |        CAST(SUM(dx * dy) AS BIGINT) AS sxy,
         |        CAST(SUM(dx * dx) AS BIGINT) AS sxx,
         |        CAST(SUM(dy * dy) AS BIGINT) AS syy
         |      FROM pairs)
         |SELECT n AS n_endpoints,
         |  round((n * sxy - sx * sy)::DOUBLE
         |        / sqrt((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE), 6)
         |    AS assortativity
         |FROM a""".stripMargin,

    // as-of join: each purchase matched to the user's most recent click at-or-before
    // it (ties: max click event id) — mirror of AnalyticsQueries.asofJoin, formulated
    // here as explicit max-ts/max-id instead of the engine's tagged-union window
    "ev8_asof_join" ->
      s"""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
         |           WHERE event_type = 'purchase'),
         |c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
         |      WHERE event_type = 'click'),
         |m AS (SELECT p.event_id, p.user_id, p.ts_us, max(c.ts_us) AS click_ts_us
         |      FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts_us <= p.ts_us
         |      GROUP BY 1, 2, 3)
         |SELECT m.event_id, m.user_id, m.ts_us, m.click_ts_us,
         |  (SELECT max(c2.event_id) FROM c c2
         |   WHERE c2.user_id = m.user_id AND c2.ts_us = m.click_ts_us) AS click_event_id,
         |  m.ts_us - m.click_ts_us AS gap_us
         |FROM m""".stripMargin,

    // ordered signup→click→purchase funnel with at-or-after stage gating — mirror of
    // AnalyticsQueries.funnelStages
    "ev9_funnel_stages" ->
      s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
         |s1 AS (SELECT user_id, min(ts_us) AS signup_ts FROM ev
         |       WHERE event_type = 'signup' GROUP BY 1),
         |s2 AS (SELECT ev.user_id, min(ts_us) AS click_ts FROM ev JOIN s1 USING (user_id)
         |       WHERE event_type = 'click' AND ts_us >= signup_ts GROUP BY 1),
         |s3 AS (SELECT ev.user_id, min(ts_us) AS purchase_ts FROM ev JOIN s2 USING (user_id)
         |       WHERE event_type = 'purchase' AND ts_us >= click_ts GROUP BY 1)
         |SELECT s1.user_id, signup_ts, click_ts, purchase_ts
         |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin,

    // per-user churn rollup: activity span vs the corpus end, integer µs — mirror of
    // AnalyticsQueries.churnRollup
    "ev13_churn" ->
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS tsu, epoch_us(ts) // 86400000000 AS day
         |            FROM events),
         |endv AS (SELECT MAX(tsu) AS end_us FROM ev)
         |SELECT user_id, COUNT(*) AS n_events,
         |       CAST(COUNT(DISTINCT day) AS BIGINT) AS n_active_days,
         |       CAST(MAX(tsu) AS BIGINT) AS last_seen_us,
         |       CAST(CASE WHEN MAX(tsu) < (SELECT end_us FROM endv) - 259200000000
         |                 THEN 1 ELSE 0 END AS INTEGER) AS churned
         |FROM ev GROUP BY user_id""".stripMargin,

    // Q10-style returned-item revenue per customer, top-20 by lost bp — mirror of
    // AnalyticsQueries.returnedRevenue
    // Q17 small-quantity shape: the correlated avg decorrelated to per-part stats,
    // the 20%-of-average compare as exact integer cross-multiplication — mirror of
    // AnalyticsQueries.smallQuantityRevenue('Brand#1')
    "q11_small_qty_revenue" ->
      """WITH li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |                   CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_cents
        |            FROM lineitem),
        |bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'),
        |f AS (SELECT li.* FROM li JOIN bp ON p_partkey = l_partkey),
        |st AS (SELECT l_partkey, COUNT(*) AS cnt, CAST(SUM(qty) AS BIGINT) AS sumq
        |       FROM f GROUP BY 1)
        |SELECT CAST(SUM(price_cents) AS BIGINT) AS revenue_cents, COUNT(*) AS n_items
        |FROM f JOIN st USING (l_partkey)
        |WHERE 5 * qty * cnt < sumq""".stripMargin,

    // Q22 idle-rich shape: scalar positive-average threshold (exact cents
    // cross-multiplication) + no-RECENT-order NOT EXISTS as anti-join — mirror of
    // AnalyticsQueries.idleRichCustomers (the literal never-ordered test is
    // vacuous on this data; the 30-day recency window keeps the plan shape with a
    // non-degenerate answer)
    "q12_idle_rich_customers" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |                  CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
        |           FROM customer),
        |thr AS (SELECT COUNT(*) AS cnt_pos, CAST(SUM(bal_cents) AS BIGINT) AS sum_pos
        |        FROM c WHERE bal_cents > 0),
        |rich AS (SELECT c.* FROM c, thr WHERE bal_cents * cnt_pos > sum_pos),
        |mx AS (SELECT max(o_orderdate) AS max_date FROM orders),
        |recent AS (SELECT DISTINCT o_custkey FROM orders, mx
        |           WHERE o_orderdate > max_date - INTERVAL 30 DAY),
        |idle AS (SELECT rich.* FROM rich
        |         WHERE NOT EXISTS (SELECT 1 FROM recent WHERE o_custkey = rich.c_custkey))
        |SELECT c_mktsegment, COUNT(*) AS n_customers,
        |       CAST(SUM(bal_cents) AS BIGINT) AS total_cents
        |FROM idle GROUP BY 1""".stripMargin,

    // Q13 custdist shape: left-outer per-customer order counts (zero band kept),
    // then the count-of-counts histogram — mirror of
    // AnalyticsQueries.customerOrderDistribution
    "q13_custdist" ->
      """WITH pc AS (SELECT c_custkey, COUNT(o_custkey) AS n_orders
        |            FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |            GROUP BY 1)
        |SELECT CAST(n_orders AS BIGINT) AS n_orders, COUNT(*) AS n_customers
        |FROM pc GROUP BY 1""".stripMargin,

    // Q21 "waiting suppliers" shape: sole late shipper in multi-supplier orders,
    // the exists/not-exists composition in count form — mirror of
    // AnalyticsQueries.waitingSuppliers
    "q10_waiting_suppliers" ->
      """WITH li AS (SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem),
        |multi AS (SELECT l_orderkey FROM li GROUP BY 1 HAVING COUNT(DISTINCT l_suppkey) > 1),
        |late AS (SELECT DISTINCT l_orderkey, l_suppkey
        |         FROM li JOIN orders ON o_orderkey = l_orderkey
        |         WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY),
        |sole AS (SELECT l_orderkey, l_suppkey FROM (
        |    SELECT *, COUNT(*) OVER (PARTITION BY l_orderkey) AS n_late FROM late)
        |  WHERE n_late = 1),
        |w AS (SELECT l_suppkey, COUNT(*) AS numwait
        |      FROM sole JOIN multi USING (l_orderkey) GROUP BY 1)
        |SELECT s_name, numwait FROM (
        |  SELECT s_name, CAST(numwait AS BIGINT) AS numwait, s_suppkey
        |  FROM w JOIN supplier ON s_suppkey = l_suppkey
        |  ORDER BY numwait DESC, s_name, s_suppkey LIMIT 10)""".stripMargin,

    "q09_returned_revenue" ->
      s"""SELECT c_custkey, c_name, n_name,
         |  CAST(SUM($revBp) AS BIGINT) AS lost_bp,
         |  COUNT(*) AS n_returned_items
         |FROM lineitem
         |JOIN orders ON o_orderkey = l_orderkey
         |JOIN customer ON c_custkey = o_custkey
         |JOIN nation ON n_nationkey = c_nationkey
         |WHERE l_returnflag = 'R'
         |GROUP BY 1, 2, 3
         |ORDER BY lost_bp DESC, c_custkey LIMIT 20""".stripMargin,

    // Q8-style nation market share of region-year revenue: exact bp integers through
    // the window total, one rounded division — mirror of AnalyticsQueries.marketShare
    "q08_market_share" ->
      s"""WITH rev AS (
         |  SELECT r_name, n_name, year(o_orderdate) AS o_year,
         |         CAST(SUM($revBp) AS BIGINT) AS revenue_bp
         |  FROM lineitem
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation ON n_nationkey = c_nationkey
         |  JOIN region ON r_regionkey = n_regionkey
         |  GROUP BY 1, 2, 3)
         |SELECT r_name, n_name, o_year, revenue_bp,
         |  round(revenue_bp::DOUBLE
         |        / CAST(SUM(revenue_bp) OVER (PARTITION BY r_name, o_year) AS BIGINT)::DOUBLE,
         |        6) AS share
         |FROM rev""".stripMargin,

    // per-session event counts and exact µs durations (ev2's break rule, running-sum
    // session numbering) — mirror of AnalyticsQueries.sessionStats
    "ev12_session_stats" ->
      s"""WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
         |b AS (SELECT user_id, event_id, tsu,
         |        CASE WHEN prev IS NULL OR tsu - prev > 3600000000 THEN 1 ELSE 0 END AS brk
         |      FROM (SELECT user_id, tsu, event_id,
         |              lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS prev
         |            FROM t)),
         |s AS (SELECT user_id, tsu,
         |        CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY tsu, event_id
         |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |          AS session_idx
         |      FROM b)
         |SELECT user_id, session_idx, COUNT(*) AS n_events,
         |       CAST(MAX(tsu) - MIN(tsu) AS BIGINT) AS duration_us
         |FROM s GROUP BY 1, 2""".stripMargin,

    // hourly event-count z-scores vs the trailing-24h RANGE window — mirror of
    // AnalyticsQueries.hourlyAnomaly (fixed float sequence: mean, E[x²]−mean², sqrt)
    "ev7_hourly_anomaly" ->
      s"""WITH hourly AS (SELECT epoch_us(ts) // 3600000000 AS hour_bucket, COUNT(*) AS n
         |                FROM events GROUP BY 1),
         |wb AS (SELECT hour_bucket, n,
         |         CAST(sum(n) OVER w AS BIGINT) AS base_n,
         |         CAST(sum(n * n) OVER w AS BIGINT) AS base_sq,
         |         count(*) OVER w AS base_cnt
         |       FROM hourly
         |       WINDOW w AS (ORDER BY hour_bucket RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING))
         |SELECT hour_bucket, n,
         |  round(base_n::DOUBLE / base_cnt::DOUBLE, 4) AS base_mean,
         |  CASE WHEN greatest(base_sq::DOUBLE / base_cnt::DOUBLE
         |                     - (base_n::DOUBLE / base_cnt::DOUBLE) * (base_n::DOUBLE / base_cnt::DOUBLE),
         |                     0.0::DOUBLE) > 0.0
         |       THEN round((n::DOUBLE - base_n::DOUBLE / base_cnt::DOUBLE)
         |                  / sqrt(greatest(base_sq::DOUBLE / base_cnt::DOUBLE
         |                                  - (base_n::DOUBLE / base_cnt::DOUBLE) * (base_n::DOUBLE / base_cnt::DOUBLE),
         |                                  0.0::DOUBLE)), 4)
         |       ELSE 0.0::DOUBLE END AS z
         |FROM wb WHERE base_cnt >= 12""".stripMargin,

    // minhash-candidate pairs verified by Levenshtein on 48-char prefixes — mirror of
    // Dedup.fuzzyPairs (same 60-bit md5 + affine permutation family as d02)
    "d10_fuzzy_pairs" ->
      s"""WITH $shinglesCte,
         |hm AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % 1000000007 AS h FROM sh),
         |mh AS (SELECT doc_id, k, min(((2 * k + 1) * h + 12289 * k + 1) % 1000000007) AS minhash
         |       FROM (SELECT doc_id, h, unnest(generate_series(0, 15)) AS k FROM hm)
         |       GROUP BY doc_id, k),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM mh a JOIN mh b ON a.k = b.k AND a.minhash = b.minhash
         |                            AND a.doc_id < b.doc_id),
         |pref AS (SELECT doc_id, substr(text, 1, 48) AS pref FROM documents)
         |SELECT id_a, id_b, CAST(levenshtein(pa.pref, pb.pref) AS INTEGER) AS edit_dist
         |FROM cand
         |JOIN pref pa ON pa.doc_id = id_a
         |JOIN pref pb ON pb.doc_id = id_b
         |WHERE levenshtein(pa.pref, pb.pref) <= 16""".stripMargin,

    // shingle containment C(a→b) = n_common/n_a over doc-freq-capped shingles, both
    // directions — mirror of Dedup.containmentPairs
    "d09_containment" ->
      s"""WITH $shinglesCte,
         |hsh AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM sh),
         |rare AS (SELECT h FROM hsh GROUP BY h HAVING COUNT(*) <= 100),
         |shf AS (SELECT hsh.doc_id, hsh.h FROM hsh JOIN rare USING (h)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY doc_id),
         |common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
         |           FROM shf a JOIN shf b ON a.h = b.h AND a.doc_id <> b.doc_id
         |           GROUP BY 1, 2)
         |SELECT id_a, id_b, containment FROM (
         |  SELECT id_a, id_b,
         |         round(CAST(n_common AS DOUBLE) / CAST(na.n AS DOUBLE), 6) AS containment
         |  FROM common
         |  JOIN sizes na ON na.doc_id = id_a)
         |WHERE containment >= 0.3""".stripMargin,

    // per-dimension quantized mean/std of the embedding corpus — mirror of
    // Similarity.dimStats (floor(x·1000+0.5) milliunit quantization ⇒ exact Σq, Σq²;
    // the mean is rounded in INTEGER microunits, half away from zero — a float
    // round(,6) ties at the last digit because these rationals terminate there)
    "s12_dim_stats" ->
      s"""WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT CAST(i - 1 AS INTEGER) AS dim,
         |             CAST(floor(v[i] * 1000 + 0.5) AS BIGINT) AS q
         |      FROM e, unnest(generate_series(1, len(v))) AS t(i)),
         |a AS (SELECT dim, count(*) AS n, CAST(sum(q) AS BIGINT) AS sum_q,
         |             CAST(sum(q * q) AS BIGINT) AS sum_sq
         |      FROM q GROUP BY 1)
         |SELECT dim, n,
         |  (CASE WHEN sum_q < 0 THEN -1 ELSE 1 END
         |   * ((abs(sum_q) * 2000 + n) // (2 * n)))::DOUBLE / 1000000.0 AS mean,
         |  round(sqrt(greatest(sum_sq::DOUBLE / n::DOUBLE
         |                      - (sum_q::DOUBLE / n::DOUBLE) * (sum_q::DOUBLE / n::DOUBLE),
         |                      0.0::DOUBLE)) / 1000.0, 6) AS std
         |FROM a""".stripMargin,

    // per-source HyperLogLog distinct-shingle estimate — mirror of Sketches.hllDistinct
    // (b=6: idx = top 6 bits of the 32-bit md5 prefix, rho over the low 26 bits via the
    // same lpad(bin())+strpos arithmetic; register sum is exact-dyadic so aggregation
    // order cannot change the float result in either engine)
    "sk01_hll_distinct" -> {
      val m = 64
      val alphaMM = 0.7213 / (1.0 + 1.079 / m) * m * m // same expression as hllDistinct
      s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents),
         |sh AS (SELECT DISTINCT doc_id, source, array_to_string(ts[i:i+2], ' ') AS shingle
         |       FROM (SELECT doc_id, source, ts, unnest(generate_series(1, len(ts) - 2)) AS i
         |             FROM toks)),
         |hm AS (SELECT source, shingle, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh),
         |rg AS (SELECT source, h >> 26 AS idx,
         |         max(CASE WHEN (h & 67108863) = 0 THEN 27
         |                  ELSE strpos(lpad(bin(h & 67108863), 26, '0'), '1') END) AS rho
         |       FROM hm GROUP BY 1, 2),
         |sm AS (SELECT source,
         |         sum(1.0::DOUBLE / (1::BIGINT << rho)) + ($m - count(*))::DOUBLE AS ssum
         |       FROM rg GROUP BY 1),
         |ex AS (SELECT source, count(DISTINCT shingle) AS exact_distinct FROM hm GROUP BY 1),
         |est AS (SELECT source, round(CAST('$alphaMM' AS DOUBLE) / ssum, 3) AS hll_est,
         |               exact_distinct
         |        FROM sm JOIN ex USING (source))
         |SELECT source, hll_est, exact_distinct,
         |  round(abs(hll_est - exact_distinct::DOUBLE) / exact_distinct::DOUBLE, 4) AS rel_err
         |FROM est""".stripMargin
    },

    // pairwise source-overlap estimates by HLL register algebra (inclusion-exclusion
    // on rounded estimates, union = register max-merge) — mirror of Sketches.hllOverlap
    "sk04_hll_overlap" -> {
      val m = 64
      val alphaMM = 0.7213 / (1.0 + 1.079 / m) * m * m
      val fold = s"sum(1.0::DOUBLE / (1::BIGINT << rho)) + ($m - count(*))::DOUBLE"
      s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents),
         |sh AS (SELECT DISTINCT doc_id, source, array_to_string(ts[i:i+2], ' ') AS shingle
         |       FROM (SELECT doc_id, source, ts, unnest(generate_series(1, len(ts) - 2)) AS i
         |             FROM toks)),
         |hm AS (SELECT source, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh),
         |rg AS (SELECT source, h >> 26 AS idx,
         |         max(CASE WHEN (h & 67108863) = 0 THEN 27
         |                  ELSE strpos(lpad(bin(h & 67108863), 26, '0'), '1') END) AS rho
         |       FROM hm GROUP BY 1, 2),
         |es AS (SELECT source, round(CAST('$alphaMM' AS DOUBLE) / ($fold), 3) AS est
         |       FROM rg GROUP BY source),
         |ps AS (SELECT a.source AS key_a, b.source AS key_b
         |       FROM (SELECT DISTINCT source FROM rg) a
         |       JOIN (SELECT DISTINCT source FROM rg) b ON a.source < b.source),
         |ur AS (SELECT key_a, key_b, idx, MAX(rho) AS rho FROM (
         |         SELECT ps.key_a, ps.key_b, rg.idx, rg.rho FROM ps JOIN rg ON rg.source = ps.key_a
         |         UNION ALL
         |         SELECT ps.key_a, ps.key_b, rg.idx, rg.rho FROM ps JOIN rg ON rg.source = ps.key_b)
         |       GROUP BY 1, 2, 3),
         |uu AS (SELECT key_a, key_b, round(CAST('$alphaMM' AS DOUBLE) / ($fold), 3) AS est_union
         |       FROM ur GROUP BY 1, 2)
         |SELECT key_a, key_b, ea.est AS est_a, eb.est AS est_b, est_union,
         |  greatest(0.0::DOUBLE, round(ea.est + eb.est - est_union, 3)) AS overlap_est
         |FROM uu
         |JOIN es ea ON ea.source = key_a
         |JOIN es eb ON eb.source = key_b""".stripMargin
    },

    // count-min doc-frequency estimates for the top-100 shingles — mirror of
    // Sketches.countMin (depth 4, width 256; salt 'r:' prepended before the md5)
    "sk02_countmin" ->
      s"""WITH $shinglesCte,
         |ex AS (SELECT shingle, count(*) AS exact_n FROM sh GROUP BY 1),
         |ib AS (SELECT shingle, exact_n, r,
         |         ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || shingle), 1, 8))::BIGINT % 256 AS bucket
         |       FROM (SELECT shingle, exact_n, unnest(generate_series(0, 3)) AS r FROM ex)),
         |bc AS (SELECT r, bucket, CAST(sum(exact_n) AS BIGINT) AS bucket_n FROM ib GROUP BY 1, 2),
         |est AS (SELECT shingle, min(bucket_n) AS cms_n, max(exact_n) AS exact_n
         |        FROM ib JOIN bc USING (r, bucket) GROUP BY shingle)
         |SELECT shingle, exact_n, cms_n, cms_n - exact_n AS overcount
         |FROM est ORDER BY exact_n DESC, shingle LIMIT 100""".stripMargin,

    // bloom-filter contamination screen (k=3 positions from disjoint md5 fields,
    // m=2^18 bits, train split = hash bucket < 9000) — mirror of
    // Sketches.bloomContamination
    "sk03_bloom_contamination" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS shingle
         |       FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 2)) AS i FROM toks)),
         |sp AS (SELECT doc_id,
         |         CASE WHEN ${bucketSql("doc_id")} < 9000 THEN 'train'
         |              WHEN ${bucketSql("doc_id")} < 9500 THEN 'val'
         |              ELSE 'test' END AS split
         |       FROM documents),
         |ps AS (SELECT doc_id, split, shingle,
         |         unnest([('0x' || substr(md5(shingle), 1, 8))::BIGINT % 262144,
         |                 ('0x' || substr(md5(shingle), 9, 8))::BIGINT % 262144,
         |                 ('0x' || substr(md5(shingle), 17, 8))::BIGINT % 262144]) AS pos
         |       FROM sh JOIN sp USING (doc_id)),
         |bits AS (SELECT DISTINCT pos FROM ps WHERE split = 'train'),
         |probe AS (SELECT DISTINCT doc_id, split, shingle, pos FROM ps WHERE split <> 'train'),
         |probed AS (SELECT doc_id, split, shingle, count(*) AS n_pos
         |           FROM probe GROUP BY 1, 2, 3),
         |hits AS (SELECT doc_id, split, shingle, count(*) AS n_hit
         |         FROM probe JOIN bits USING (pos) GROUP BY 1, 2, 3)
         |SELECT doc_id, split, count(*) AS n_shingles,
         |  CAST(SUM(CASE WHEN COALESCE(n_hit, 0) = n_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |  round(CAST(SUM(CASE WHEN COALESCE(n_hit, 0) = n_pos THEN 1 ELSE 0 END) AS DOUBLE)
         |        / CAST(count(*) AS DOUBLE), 6) AS flag_rate
         |FROM probed LEFT JOIN hits USING (doc_id, split, shingle)
         |GROUP BY doc_id, split""".stripMargin,

    // Theta/KMV bottom-64 sketch set-difference estimates between sources over their
    // shingle sets: theta = 64th-smallest 32-bit md5 hash (2^32 when under-full =
    // exact regime), retained = a-samples < min(theta_a, theta_b) absent from b,
    // est = retained * 2^32 / theta — mirror of Sketches.thetaDifference
    "sk05_theta_diff" ->
      s"""WITH $shinglesCte,
         |hv AS (SELECT DISTINCT d.source AS key,
         |         ('0x' || substr(md5(sh.shingle), 1, 8))::BIGINT AS hv
         |       FROM sh JOIN documents d USING (doc_id)),
         |rk AS (SELECT key, hv, row_number() OVER (PARTITION BY key ORDER BY hv) AS rn
         |       FROM hv),
         |th AS (SELECT key,
         |         COALESCE(MAX(CASE WHEN rn = 64 THEN hv END), 4294967296) AS theta
         |       FROM rk GROUP BY key),
         |sm AS (SELECT r.key, r.hv FROM rk r JOIN th USING (key) WHERE r.hv < theta),
         |pa AS (SELECT a.key AS key_a, b.key AS key_b,
         |         CAST(least(a.theta, b.theta) AS BIGINT) AS theta_ab
         |       FROM th a JOIN th b ON a.key <> b.key),
         |rt AS (SELECT p.key_a, p.key_b, p.theta_ab, count(*) AS n_retained
         |       FROM pa p
         |       JOIN sm sa ON sa.key = p.key_a AND sa.hv < p.theta_ab
         |       WHERE NOT EXISTS (SELECT 1 FROM sm sb
         |                         WHERE sb.key = p.key_b AND sb.hv = sa.hv)
         |       GROUP BY 1, 2, 3)
         |SELECT p.key_a, p.key_b, p.theta_ab,
         |  CAST(COALESCE(rt.n_retained, 0) AS BIGINT) AS n_retained,
         |  round(CAST(COALESCE(rt.n_retained, 0) AS DOUBLE) * 4294967296.0
         |        / CAST(p.theta_ab AS DOUBLE), 3) AS diff_est
         |FROM pa p LEFT JOIN rt USING (key_a, key_b, theta_ab)""".stripMargin,

    // Q4-style late-order priority counts: EXISTS a line shipped >60 days after the
    // order date, one-year order window — mirror of AnalyticsQueries.latePriorityOrders
    // (exact epoch-µs arithmetic; 9131/9496 = epoch-days of 1995-01-01/1996-01-01)
    "q04_late_priority" ->
      """WITH ord AS (SELECT o_orderkey, o_orderpriority, o_orderdate
        |             FROM orders
        |             WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |               AND o_orderdate <  TIMESTAMP '1996-01-01')
        |SELECT o_orderpriority, count(*) AS n_orders FROM ord
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = ord.o_orderkey
        |                AND l.l_shipdate > ord.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1""".stripMargin,

    // DAU + trailing-7-day WAU per day bucket — mirror of
    // AnalyticsQueries.rollingActiveUsers (distinct (day, user) first, then a bounded
    // 7-offset fanout; only days that occur in the data survive the join)
    "ev11_rolling_actives" ->
      """WITH daily AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day_bucket, user_id
        |               FROM events),
        |dau AS (SELECT day_bucket, count(*) AS n_dau FROM daily GROUP BY 1),
        |fan AS (SELECT DISTINCT day_bucket + off AS day_bucket, user_id
        |        FROM daily, (SELECT unnest(generate_series(0, 6)) AS off)),
        |wau AS (SELECT day_bucket, count(*) AS n_wau FROM fan GROUP BY 1)
        |SELECT day_bucket, n_dau, n_wau FROM dau JOIN wau USING (day_bucket)""".stripMargin,

    // Adamic-Adar link prediction over the undirected Normal closure of graph 1:
    // unlinked pairs with ≥2 common neighbors, score = Σ 1/ln(deg) in exact integer
    // micro-units — mirror of GraphQueries.adamicAdar
    "g31_adamic_adar" ->
      s"""$snap,
         |und AS (SELECT DISTINCT LEAST(source_id, destination_id) AS lo,
         |                        GREATEST(source_id, destination_id) AS hi
         |        FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |adj AS (SELECT lo AS v, hi AS w FROM und UNION ALL SELECT hi, lo FROM und),
         |deg AS (SELECT w, count(*) AS d FROM adj GROUP BY 1),
         |wt AS (SELECT adj.v, adj.w, CAST(round(1000000.0 / ln(d)) AS BIGINT) AS aa_micro
         |       FROM adj JOIN deg USING (w) WHERE d BETWEEN 2 AND 10000),
         |pairs AS (SELECT a.v AS src_a, b.v AS src_b,
         |                 count(*) AS n_common, CAST(sum(a.aa_micro) AS BIGINT) AS aa_micro
         |          FROM wt a JOIN wt b ON a.w = b.w AND a.v < b.v
         |          GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT p.src_a, p.src_b, p.n_common, p.aa_micro
         |FROM pairs p LEFT JOIN und ON und.lo = p.src_a AND und.hi = p.src_b
         |WHERE und.lo IS NULL""".stripMargin,

    // duplicate 3-gram fraction per document (60-bit md5 shingle hashes; empty-shingle
    // docs kept at fraction 0 via LEFT JOIN) — mirror of Dedup.dupNgramFraction
    "d11_dup_ngrams" ->
      s"""WITH $shinglesCte,
         |hm AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM sh),
         |dfq AS (SELECT h, count(*) AS n_docs FROM hm GROUP BY 1),
         |per AS (SELECT doc_id, count(*) AS n_shingles,
         |               CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
         |        FROM hm JOIN dfq USING (h) GROUP BY 1)
         |SELECT d.doc_id,
         |  COALESCE(n_shingles, 0) AS n_shingles,
         |  COALESCE(n_dup, 0) AS n_dup,
         |  CASE WHEN COALESCE(n_shingles, 0) = 0 THEN 0.0::DOUBLE
         |       ELSE round(n_dup::DOUBLE / n_shingles::DOUBLE, 6) END AS dup_fraction
         |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin,

    // maximal cross-document duplicated spans: positioned 5-token windows hashed to
    // 60-bit md5 longs, doc-frequency >= 2 marks duplicated starts, gaps-and-islands
    // (pos - row_number) merges adjacent starts into maximal spans — mirror of
    // Dedup.dupSpans
    "d14_dup_spans" -> {
      val w = DupSpanWindow
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |pg AS (SELECT doc_id, i AS pos,
         |         ('0x' || substr(md5(array_to_string(ts[i:i+${w - 1}], ' ')), 1, 15))::BIGINT AS h
         |       FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - ${w - 1})) AS i FROM toks)),
         |dup AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM pg) GROUP BY h HAVING count(*) >= 2),
         |st AS (SELECT doc_id, pos,
         |         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |       FROM pg JOIN dup USING (h)),
         |sp AS (SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + ${w - 1} AS span_end
         |       FROM st GROUP BY doc_id, grp)
         |SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
         |       CAST(span_end - span_start + 1 AS BIGINT) AS span_tokens
         |FROM sp WHERE span_end - span_start + 1 >= $DupSpanMinTokens""".stripMargin
    },

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

    // 8-dim ±1 random projection (plane family offset 32, disjoint from the LSH/rerank
    // families) — mirror of Similarity.randomProjection
    "s13_random_projection" -> {
      val projs = (0 until 8)
        .map(j => s"round(list_dot_product(v, ${lshPlaneSql(32 + j, 64)}), 6) AS p$j")
        .mkString(",\n|  ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         |SELECT vec_id,
         |  $projs
         |FROM e""".stripMargin
    },

    // product-quantization code assignment: 8×8-dim subspaces, 16 lowest-id codebook
    // seeds, d² = ⟨s,s⟩−2⟨s,c⟩+⟨c,c⟩, argmin tie-broken on code id — mirror of
    // Similarity.pqCodes
    "s14_pq_codes" ->
      s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |sub AS (SELECT vec_id, s, list_slice(v, 8 * s + 1, 8 * s + 8) AS sv
         |        FROM (SELECT vec_id, v, unnest(generate_series(0, 7)) AS s FROM base)),
         |cb AS (SELECT s, CAST(vec_id AS INTEGER) AS code, sv AS cv FROM sub WHERE vec_id < 16),
         |scored AS (SELECT t.vec_id, t.s, cb.code,
         |    list_dot_product(sv, sv) - 2 * list_dot_product(sv, cv)
         |      + list_dot_product(cv, cv) AS d2
         |  FROM sub t JOIN cb ON cb.s = t.s)
         |SELECT vec_id, CAST(s AS INTEGER) AS sub, code, round(d2, 6) AS err FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY round(d2, 6), code) AS rn
         |  FROM scored)
         |WHERE rn = 1""".stripMargin,

    // PQ asymmetric-distance search: integer micro-unit LUT distances summed per
    // candidate, top-20 shortlist, exact cosine rerank to top-5 — mirror of
    // Similarity.pqSearchTopK
    "s15_pq_search" ->
      s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |sub AS (SELECT vec_id, s, list_slice(v, 8 * s + 1, 8 * s + 8) AS sv
         |        FROM (SELECT vec_id, v, unnest(generate_series(0, 7)) AS s FROM base)),
         |cb AS (SELECT s, CAST(vec_id AS INTEGER) AS code, sv AS cv FROM sub WHERE vec_id < 16),
         |scored AS (SELECT t.vec_id, t.s, cb.code,
         |    list_dot_product(sv, sv) - 2 * list_dot_product(sv, cv)
         |      + list_dot_product(cv, cv) AS d2
         |  FROM sub t JOIN cb ON cb.s = t.s),
         |codes AS (SELECT vec_id AS neighbor_id, s, code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY round(d2, 6), code) AS rn
         |    FROM scored)
         |  WHERE rn = 1),
         |lut AS (SELECT q.vec_id AS query_id, q.s, cb.code,
         |    CAST(round(1000000 * (list_dot_product(q.sv, q.sv)
         |      - 2 * list_dot_product(q.sv, cb.cv)
         |      + list_dot_product(cb.cv, cb.cv))) AS BIGINT) AS d2m
         |  FROM sub q JOIN cb ON cb.s = q.s WHERE q.vec_id % 50 = 0),
         |approx AS (SELECT l.query_id, c.neighbor_id, CAST(SUM(l.d2m) AS BIGINT) AS approx_d2m
         |  FROM codes c JOIN lut l ON l.s = c.s AND l.code = c.code
         |  WHERE l.query_id <> c.neighbor_id GROUP BY 1, 2),
         |short AS (SELECT query_id, neighbor_id, approx_d2m FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY approx_d2m, neighbor_id) AS crank
         |    FROM approx)
         |  WHERE crank <= 20),
         |rer AS (SELECT sh.query_id, sh.neighbor_id, sh.approx_d2m,
         |          ${cosSql("qb.v", "nb.v")} AS cos_sim
         |        FROM short sh
         |        JOIN base qb ON qb.vec_id = sh.query_id
         |        JOIN base nb ON nb.vec_id = sh.neighbor_id)
         |SELECT query_id, neighbor_id, approx_d2m, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                              ORDER BY cos_sim DESC, neighbor_id) AS rank FROM rer)
         |WHERE rank <= 5""".stripMargin,

    // trained k-means: the s10 step iterated KmeansTrainRounds times as chained
    // CTEs — mirror of Similarity.kmeansTrain (final round in s10's long form,
    // restricted to clusters surviving the zero-norm guard)
    "s22_kmeans_train" ->
      s"""WITH a AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |${kmeansCtes("a", 8, KmeansTrainRounds)}
         |SELECT m.cluster, m.dim, m.centroid, m.n_members
         |FROM m$KmeansTrainRounds m JOIN c$KmeansTrainRounds c USING (cluster)""".stripMargin,

    // IVF-PQ over the TRAINED coarse quantizer: the s16 pipeline with its sampled
    // cents replaced by the kmeansCtes model — mirror of Similarity.ivfPqTrainedTopK.
    // s24 (train -> save -> load -> search) shares this SQL VERBATIM: the model
    // round-trips parquet bit-exactly, so the persisted-artifact path must
    // reproduce the in-session result to the hash
    "s23_ivf_pq_trained" -> ivfPqTrainedSql,
    "s24_ivf_pq_saved" -> ivfPqTrainedSql,

    // mirror of Similarity.ivfAssignNew over the AssignNewMod split: the codebook
    // trains on the pre-cut corpus (kmeansCtes over tr — same unrolled-rounds
    // discipline as s22-s24), the post-cut arrivals assign by rounded-cosine argmax
    // (cluster-asc tie-break), and the per-cell census left-joins so starved cells
    // report n_new = 0
    "s25_ivf_assign_new" ->
      s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |tr AS (SELECT vec_id, v FROM base WHERE vec_id % $AssignNewMod <> 0),
         |${kmeansCtes("tr", 8, IvfPqTrainRounds)},
         |cents AS (SELECT CAST(cluster AS BIGINT) AS cluster, cv,
         |                 CAST(n_members AS BIGINT) AS n_trained FROM c$IvfPqTrainRounds),
         |nw AS (SELECT vec_id, v FROM base
         |       WHERE vec_id % $AssignNewMod = 0 AND list_dot_product(v, v) > 0),
         |sc AS (SELECT nw.vec_id, cents.cluster, ${cosSql("nw.v", "cents.cv")} AS cos
         |       FROM nw, cents),
         |asg AS (SELECT vec_id, cluster FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster) AS rk
         |    FROM sc)
         |  WHERE rk = 1),
         |nc AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_new FROM asg GROUP BY 1),
         |ntot AS (SELECT CAST(SUM(n_new) AS BIGINT) AS tot_new FROM nc)
         |SELECT cents.cluster, cents.n_trained,
         |  CAST(COALESCE(nc.n_new, 0) AS BIGINT) AS n_new,
         |  CAST(floor(1000000.0 * CAST(COALESCE(nc.n_new, 0) AS DOUBLE)
         |    / CAST(cents.n_trained AS DOUBLE) + 0.5) AS BIGINT) AS growth_micro,
         |  CASE WHEN COALESCE(ntot.tot_new, 0) = 0 THEN 0
         |       ELSE CAST(floor(1000000.0 * CAST(COALESCE(nc.n_new, 0) AS DOUBLE)
         |         / CAST(ntot.tot_new AS DOUBLE) + 0.5) AS BIGINT) END AS share_new_micro
         |FROM cents LEFT JOIN nc ON nc.cluster = cents.cluster, ntot""".stripMargin,

    // IVF-PQ: cell pruning bounds the candidates, the integer-µ ADC LUT scores them,
    // exact cosine reranks the shortlist — mirror of Similarity.ivfPqTopK, composing
    // the s04 cell CTEs with the s15 code/LUT CTEs
    "s16_ivf_pq" ->
      s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cents AS (SELECT vec_id AS cid, v AS cv FROM base WHERE vec_id % 97 = 0),
         |scored_cells AS (
         |  SELECT base.vec_id AS rid, base.v, cents.cid, ${cosSql("base.v", "cents.cv")} AS cc
         |  FROM base, cents),
         |cells AS (
         |  SELECT rid AS neighbor_id, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY rid ORDER BY cc DESC, cid) AS crank
         |    FROM scored_cells)
         |  WHERE crank <= 1),
         |probes AS (
         |  SELECT rid AS query_id, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY rid ORDER BY cc DESC, cid) AS crank
         |    FROM scored_cells WHERE rid % 50 = 0)
         |  WHERE crank <= 2),
         |cp AS (SELECT query_id, neighbor_id FROM probes JOIN cells USING (cid)
         |       WHERE query_id <> neighbor_id),
         |sub AS (SELECT vec_id, s, list_slice(v, 8 * s + 1, 8 * s + 8) AS sv
         |        FROM (SELECT vec_id, v, unnest(generate_series(0, 7)) AS s FROM base)),
         |cb AS (SELECT s, CAST(vec_id AS INTEGER) AS code, sv AS cv FROM sub WHERE vec_id < 16),
         |pqscored AS (SELECT t.vec_id, t.s, cb.code,
         |    list_dot_product(sv, sv) - 2 * list_dot_product(sv, cv)
         |      + list_dot_product(cv, cv) AS d2
         |  FROM sub t JOIN cb ON cb.s = t.s),
         |codes AS (SELECT vec_id AS neighbor_id, s, code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY round(d2, 6), code) AS rn
         |    FROM pqscored)
         |  WHERE rn = 1),
         |lut AS (SELECT q.vec_id AS query_id, q.s, cb.code,
         |    CAST(round(1000000 * (list_dot_product(q.sv, q.sv)
         |      - 2 * list_dot_product(q.sv, cb.cv)
         |      + list_dot_product(cb.cv, cb.cv))) AS BIGINT) AS d2m
         |  FROM sub q JOIN cb ON cb.s = q.s WHERE q.vec_id % 50 = 0),
         |approx AS (SELECT cp.query_id, cp.neighbor_id, CAST(SUM(l.d2m) AS BIGINT) AS approx_d2m
         |  FROM cp
         |  JOIN codes c ON c.neighbor_id = cp.neighbor_id
         |  JOIN lut l ON l.query_id = cp.query_id AND l.s = c.s AND l.code = c.code
         |  GROUP BY 1, 2),
         |short AS (SELECT query_id, neighbor_id, approx_d2m FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY approx_d2m, neighbor_id) AS crank
         |    FROM approx)
         |  WHERE crank <= 20),
         |rer AS (SELECT sh.query_id, sh.neighbor_id, sh.approx_d2m,
         |          ${cosSql("qb.v", "nb.v")} AS cos_sim
         |        FROM short sh
         |        JOIN base qb ON qb.vec_id = sh.query_id
         |        JOIN base nb ON nb.vec_id = sh.neighbor_id)
         |SELECT query_id, neighbor_id, approx_d2m, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                              ORDER BY cos_sim DESC, neighbor_id) AS rank FROM rer)
         |WHERE rank <= 5""".stripMargin,

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

    // Z-order (Morton) layout keys over (user_id, hour): 20-bit interleave, bucket =
    // high bits of the key — mirror of Layout.zorderKeys
    "o01_zorder" -> {
      val terms = (0 until 20)
        .map(i => s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH xy AS (SELECT event_id, user_id & 1048575 AS x,
         |                   (epoch_us(ts) // 3600000000) & 1048575 AS y FROM events),
         |z AS (SELECT event_id, CAST($terms AS BIGINT) AS zkey FROM xy)
         |SELECT event_id, zkey, zkey >> 26 AS bucket FROM z""".stripMargin
    },

    // compaction plan: o01's per-bucket counts packed into ≈target-row groups by the
    // exclusive-cumulative-sum floor division — mirror of Layout.compactionPlan
    "o03_compaction_plan" -> {
      val terms = (0 until 20)
        .map(i => s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH xy AS (SELECT event_id, user_id & 1048575 AS x,
         |                   (epoch_us(ts) // 3600000000) & 1048575 AS y FROM events),
         |z AS (SELECT event_id, CAST($terms AS BIGINT) >> $CompactionTileShift AS bucket FROM xy),
         |st AS (SELECT bucket, COUNT(*) AS n_rows FROM z GROUP BY 1),
         |cum AS (SELECT bucket, n_rows,
         |          CAST(COALESCE(SUM(n_rows) OVER (ORDER BY bucket
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |            AS cum_before
         |        FROM st)
         |SELECT bucket, n_rows, cum_before // $CompactionTargetRows AS group_id
         |FROM cum""".stripMargin
    },

    // min/max file-skipping replay over the o03 plan's groups for the pinned
    // user-band predicate: prune rate + read amplification — mirror of
    // Layout.pruneStats (same Morton-term builder as o03)
    "o04_prune_stats" -> {
      val terms = (0 until 20)
        .map(i => s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      val (lo, hi) = (PruneUserLo, PruneUserHi)
      s"""WITH xy AS (SELECT event_id, user_id, user_id & 1048575 AS x,
         |                   (epoch_us(ts) // 3600000000) & 1048575 AS y FROM events),
         |z AS (SELECT event_id, user_id,
         |        CAST($terms AS BIGINT) >> $CompactionTileShift AS bucket FROM xy),
         |st AS (SELECT bucket, COUNT(*) AS n_rows FROM z GROUP BY 1),
         |cum AS (SELECT bucket,
         |          CAST(COALESCE(SUM(n_rows) OVER (ORDER BY bucket
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |            AS cum_before
         |        FROM st),
         |pl AS (SELECT bucket, cum_before // $PruneTargetRows AS group_id FROM cum),
         |pg AS (SELECT group_id, COUNT(*) AS n_rows, MIN(user_id) AS min_u,
         |         MAX(user_id) AS max_u,
         |         CAST(SUM(CASE WHEN user_id BETWEEN $lo AND $hi THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_match
         |       FROM z JOIN pl USING (bucket) GROUP BY 1),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
         |          CAST(SUM(CASE WHEN max_u >= $lo AND min_u <= $hi THEN 0 ELSE 1 END)
         |            AS BIGINT) AS n_pruned,
         |          CAST(SUM(n_rows) AS BIGINT) AS rows_total,
         |          CAST(SUM(CASE WHEN max_u >= $lo AND min_u <= $hi THEN n_rows ELSE 0 END)
         |            AS BIGINT) AS rows_scanned,
         |          CAST(SUM(n_match) AS BIGINT) AS rows_matching
         |        FROM pg)
         |SELECT n_groups, n_pruned, rows_total, rows_scanned, rows_matching,
         |  CAST(floor(1000000.0 * n_pruned::DOUBLE / n_groups::DOUBLE + 0.5) AS BIGINT)
         |    AS prune_rate_micro,
         |  CASE WHEN rows_matching = 0 THEN CAST(0 AS BIGINT) ELSE
         |    CAST(floor(1000000.0 * rows_scanned::DOUBLE / rows_matching::DOUBLE + 0.5)
         |      AS BIGINT) END AS read_amp_micro
         |FROM agg""".stripMargin
    },

    // Hilbert index over (user_id & 0xFFFF, hour & 0xFFFF): one CTE per level of the
    // top-down quadrant walk (quadrant digit = (3*rx)^ry weighted s^2, then the
    // frame rotates/reflects for the next level) — mirror of Layout.hilbertKeys /
    // the graft_hilbert expression's loop, unrolled level-by-level
    "o02_hilbert" -> {
      val bits = 16
      def src(i: Int): String = if (i == bits - 1) "xy" else s"h${i + 1}"
      val chain = ((bits - 1) to 0 by -1).map { i =>
        val s = 1L << i
        s"h$i AS (SELECT event_id, " +
          s"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${s - 1} - y ELSE y END) ELSE x END AS x, " +
          s"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${s - 1} - x ELSE x END) ELSE y END AS y, " +
          s"d + ${s * s} * (CASE WHEN rx = 1 AND ry = 1 THEN 2 WHEN rx = 1 THEN 3 " +
          s"WHEN ry = 1 THEN 1 ELSE 0 END) AS d " +
          s"FROM (SELECT event_id, x, y, d, " +
          s"CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx, " +
          s"CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry FROM ${src(i)}))"
      }.mkString(",\n")
      "WITH xy AS (SELECT event_id, user_id & 65535 AS x, " +
        "(epoch_us(ts) // 3600000000) & 65535 AS y, CAST(0 AS BIGINT) AS d FROM events),\n" +
        chain + "\n" +
        "SELECT event_id, d AS hkey, d >> 26 AS bucket FROM h0"
    },

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

    // Rocchio pseudo-relevance-feedback: round-1 cosine top-feedbackK (s01's kernel),
    // query expanded as feedbackK·q + Σ neighbors in exact integer micro-units
    // (cosine is scale-invariant, so the unnormalized combination ranks identically),
    // round-2 cosine against the expanded vector — mirror of Similarity.prfTopK with
    // the shared Prf* constants interpolated
    "s19_prf_expand" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % $PrfQueryMod = 0),
         |r1s AS (SELECT query_id, c.vec_id AS neighbor_id, ${cosSql("qv", "c.v")} AS cos_sim
         |        FROM q, e c WHERE c.vec_id <> query_id),
         |r1 AS (SELECT query_id, neighbor_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
         |    AS rank FROM r1s) WHERE rank <= $PrfFeedbackK),
         |qm AS (SELECT query_id, i, CAST(floor(qv[i] * 1000000.0 + 0.5) AS BIGINT) AS qm
         |       FROM (SELECT query_id, qv, unnest(generate_series(1, len(qv))) AS i FROM q)),
         |nm AS (SELECT query_id, i, CAST(floor(v[i] * 1000000.0 + 0.5) AS BIGINT) AS m
         |       FROM (SELECT r1.query_id, e.v, unnest(generate_series(1, len(e.v))) AS i
         |             FROM r1 JOIN e ON e.vec_id = r1.neighbor_id)),
         |fb AS (SELECT query_id, i, CAST(SUM(m) AS BIGINT) AS fb_sum FROM nm GROUP BY 1, 2),
         |xv AS (SELECT query_id, list(($PrfFeedbackK * qm + fb_sum)::DOUBLE ORDER BY i) AS xv
         |       FROM qm JOIN fb USING (query_id, i) GROUP BY 1),
         |scored AS (SELECT query_id, c.vec_id AS neighbor_id, ${cosSql("xv", "c.v")} AS cos_sim
         |           FROM xv, e c WHERE c.vec_id <> query_id)
         |SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
         |    AS rank FROM scored)
         |WHERE rank <= $PrfK""".stripMargin,

    // MMR diversified re-ranking: greedy λ·rel − (1−λ)·max-sim-to-selected over the
    // s01 candidates, unrolled round-for-round — mirror of Similarity.mmrRerank
    // (SQL generated from the same Mmr* constants; see mmrRerankSql)
    "s21_mmr_rerank" -> mmrRerankSql,

    // cohort retention matrix: first-seen-day cohorts × day-offset active counts over
    // distinct (day, user) pairs — mirror of AnalyticsQueries.cohortRetention
    "ev14_cohort_retention" ->
      """WITH daily AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day_bucket, user_id
        |               FROM events),
        |coh AS (SELECT user_id, MIN(day_bucket) AS cohort_day FROM daily GROUP BY 1),
        |sz AS (SELECT cohort_day, COUNT(*) AS cohort_size FROM coh GROUP BY 1),
        |act AS (SELECT cohort_day, day_bucket - cohort_day AS day_offset,
        |               COUNT(*) AS n_active
        |        FROM daily JOIN coh USING (user_id) GROUP BY 1, 2)
        |SELECT cohort_day, day_offset, CAST(n_active AS BIGINT) AS n_active,
        |  CAST(cohort_size AS BIGINT) AS cohort_size,
        |  round(n_active::DOUBLE / cohort_size::DOUBLE, 6) AS retention
        |FROM act JOIN sz USING (cohort_day)""".stripMargin,

    // last-touch attribution: latest preceding touch per purchase (argmax by ts then
    // event_id, at-or-before ties), 24h lookback applied after the argmax, channel
    // rollup in exact integer cents/µs — mirror of AnalyticsQueries.attribution
    "ev15_attribution" ->
      s"""WITH t AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
         |           WHERE event_type IN ('click', 'view', 'signup')),
         |p AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events
         |      WHERE event_type = 'purchase'),
         |m AS (SELECT p.event_id, p.user_id, p.ts_us, p.value, max(t.ts_us) AS t_ts
         |      FROM p LEFT JOIN t ON t.user_id = p.user_id AND t.ts_us <= p.ts_us
         |      GROUP BY 1, 2, 3, 4),
         |a AS (SELECT m.*,
         |        (SELECT max(t2.event_id) FROM t t2
         |         WHERE t2.user_id = m.user_id AND t2.ts_us = m.t_ts) AS t_id
         |      FROM m),
         |b AS (SELECT a.*,
         |        (SELECT t3.event_type FROM t t3 WHERE t3.event_id = a.t_id) AS t_type
         |      FROM a),
         |c AS (SELECT
         |        CASE WHEN t_ts IS NULL OR ts_us - t_ts > $AttributionLookbackUs
         |             THEN 'none' ELSE t_type END AS channel,
         |        CASE WHEN t_ts IS NULL OR ts_us - t_ts > $AttributionLookbackUs
         |             THEN NULL ELSE ts_us - t_ts END AS gap_us,
         |        value
         |      FROM b)
         |SELECT channel, COUNT(*) AS n_conversions,
         |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
         |  CAST(COALESCE(SUM(gap_us), 0) AS BIGINT) AS sum_gap_us,
         |  CASE WHEN channel = 'none' THEN 0.0::DOUBLE
         |       ELSE round(COALESCE(SUM(gap_us), 0)::DOUBLE / COUNT(*)::DOUBLE, 6)
         |  END AS avg_gap_us
         |FROM c GROUP BY 1""".stripMargin,

    // KMV bottom-k sample quantiles per source: deterministic md5 bottom-k sample,
    // nearest-rank quantiles of the sampled values — mirror of Sketches.kmvQuantiles
    // with the shared register size interpolated
    "sk06_kmv_quantiles" ->
      s"""WITH rows AS (SELECT source, doc_id, n_chars,
         |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
         |      FROM documents),
         |samp AS (SELECT source, n_chars FROM (
         |    SELECT *, row_number() OVER (PARTITION BY source ORDER BY hv, doc_id, n_chars) AS rk
         |    FROM rows) WHERE rk <= $KmvQuantK),
         |agg AS (SELECT source, COUNT(*) AS n_sample, list(n_chars ORDER BY n_chars) AS vs
         |        FROM samp GROUP BY 1)
         |SELECT source, CAST(n_sample AS BIGINT) AS n_sample,
         |  CAST(vs[CAST((50 * n_sample + 99) // 100 AS INT)] AS BIGINT) AS p50_est,
         |  CAST(vs[CAST((90 * n_sample + 99) // 100 AS INT)] AS BIGINT) AS p90_est,
         |  CAST(vs[CAST((99 * n_sample + 99) // 100 AS INT)] AS BIGINT) AS p99_est
         |FROM agg""".stripMargin,

    // AMS tug-of-war F2 (self-join size) sketch: per-key counts, ±1 md5 signs per
    // (register, key), register sums squared and averaged; exact F2 as diagnostic
    // — mirror of Sketches.amsF2
    "sk08_ams_f2" ->
      s"""WITH cnt AS (SELECT CAST(user_id AS VARCHAR) AS k, COUNT(*) AS n
         |             FROM events GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
         |               CAST(SUM(n * n) AS BIGINT) AS f2_exact
         |        FROM cnt),
         |reg AS (SELECT j, CAST(SUM(n * (1 - 2 * (('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || k), 1, 8))::BIGINT % 2))) AS BIGINT) AS c
         |        FROM (SELECT k, n, unnest(generate_series(0, ${AmsWidth - 1})) AS j FROM cnt)
         |        GROUP BY 1),
         |est AS (SELECT CAST(SUM(c * c) AS BIGINT) AS f2_sum FROM reg)
         |SELECT n_rows, CAST(n_keys AS BIGINT) AS n_keys, f2_exact, f2_sum,
         |       round(f2_sum::DOUBLE / ${AmsWidth}.0, 6) AS f2_est
         |FROM tot CROSS JOIN est""".stripMargin,

    // HDR-histogram quantiles: (binary exponent, top-2 mantissa bits) buckets from
    // pure INTEGER arithmetic (bit length, shifts — no float log2 at bucket
    // boundaries), cumulated-count nearest-rank, estimate = bucket lower bound —
    // mirror of Sketches.hdrQuantiles
    "sk07_hdr_quantiles" ->
      """WITH vals AS (SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents
        |              WHERE n_chars > 0),
        |b AS (SELECT source,
        |        4 * e + (CASE WHEN e >= 2 THEN v >> (e - 2) ELSE v << (2 - e) END) - 4 AS bucket
        |      FROM (SELECT source, v, length(bin(v)) - 1 AS e FROM vals)),
        |bc AS (SELECT source, bucket, COUNT(*) AS c FROM b GROUP BY 1, 2),
        |cum AS (SELECT source, bucket,
        |          SUM(c) OVER (PARTITION BY source ORDER BY bucket
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |          SUM(c) OVER (PARTITION BY source) AS n
        |        FROM bc),
        |lb AS (SELECT source, cum, n,
        |         CASE WHEN bucket // 4 >= 2
        |              THEN (bucket % 4 + 4) << (bucket // 4 - 2)
        |              ELSE (bucket % 4 + 4) >> (2 - bucket // 4) END AS lb
        |       FROM cum)
        |SELECT source, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(MIN(CASE WHEN cum * 100 >= 50 * n THEN lb END) AS BIGINT) AS p50_est,
        |  CAST(MIN(CASE WHEN cum * 100 >= 90 * n THEN lb END) AS BIGINT) AS p90_est,
        |  CAST(MIN(CASE WHEN cum * 100 >= 99 * n THEN lb END) AS BIGINT) AS p99_est
        |FROM lb GROUP BY 1""".stripMargin,

    // moments sketch: EXACT integer power sums (DuckDB promotes per-row products to
    // HUGEINT so x^4 cannot overflow INT64; the Spark side sums decimal(12,0)-widened
    // products — both exact), then one fixed double-arithmetic sequence for the
    // population moments; pow(v,1.5) written v*sqrt(v) on BOTH sides because sqrt is
    // IEEE-correctly-rounded while pow is only ulp-accurate; zero-variance groups
    // report 0 skew/kurt by the same explicit guard as the Spark side — mirror of
    // Sketches.momentsSketch
    "sk09_moments" ->
      """WITH s AS (SELECT source, COUNT(*) AS n,
        |             SUM(n_chars::HUGEINT) AS s1,
        |             SUM(n_chars::HUGEINT * n_chars) AS s2,
        |             SUM(n_chars::HUGEINT * n_chars * n_chars) AS s3,
        |             SUM((n_chars::HUGEINT * n_chars) * (n_chars::HUGEINT * n_chars)) AS s4
        |           FROM documents GROUP BY 1),
        |m AS (SELECT source, n,
        |        s1::DOUBLE / n::DOUBLE AS m1, s2::DOUBLE / n::DOUBLE AS m2,
        |        s3::DOUBLE / n::DOUBLE AS m3, s4::DOUBLE / n::DOUBLE AS m4
        |      FROM s),
        |v AS (SELECT source, n, m1, m2, m3, m4, m2 - m1 * m1 AS var FROM m)
        |SELECT source, CAST(n AS BIGINT) AS n,
        |  CAST(floor(1000000.0 * m1 + 0.5) AS BIGINT) AS mean_micro,
        |  CAST(floor(1000000.0 * var + 0.5) AS BIGINT) AS var_micro,
        |  CASE WHEN var <= 0.0 THEN 0 ELSE
        |    CAST(floor(1000000.0 * ((m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1)
        |                            / (var * sqrt(var))) + 0.5) AS BIGINT) END AS skew_micro,
        |  CASE WHEN var <= 0.0 THEN 0 ELSE
        |    CAST(floor(1000000.0 * ((m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2
        |                             - 3.0 * m1 * m1 * m1 * m1) / (var * var) - 3.0) + 0.5)
        |      AS BIGINT) END AS kurt_micro
        |FROM v""".stripMargin,

    // RFM segmentation: per-user recency/frequency/monetary, exact quintile buckets
    // 1 + ((rank-1)*5) DIV n with user_id tie-breaks — mirror of AnalyticsQueries.rfm
    "ev16_rfm" ->
      """WITH per AS (SELECT user_id, MAX(epoch_us(ts)) AS recency_us,
        |               COUNT(*) AS n_events,
        |               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |                 AS monetary_cents
        |             FROM events GROUP BY 1),
        |r AS (SELECT *,
        |        row_number() OVER (ORDER BY recency_us DESC, user_id) AS r_rank,
        |        row_number() OVER (ORDER BY n_events DESC, user_id) AS f_rank,
        |        row_number() OVER (ORDER BY monetary_cents DESC, user_id) AS m_rank,
        |        COUNT(*) OVER () AS n_users
        |      FROM per),
        |b AS (SELECT user_id, recency_us, CAST(n_events AS BIGINT) AS n_events,
        |        monetary_cents,
        |        CAST(1 + ((r_rank - 1) * 5) // n_users AS BIGINT) AS r_bucket,
        |        CAST(1 + ((f_rank - 1) * 5) // n_users AS BIGINT) AS f_bucket,
        |        CAST(1 + ((m_rank - 1) * 5) // n_users AS BIGINT) AS m_bucket
        |      FROM r)
        |SELECT *, CAST(r_bucket * 100 + f_bucket * 10 + m_bucket AS BIGINT) AS rfm_code
        |FROM b""".stripMargin,

    // activity Pareto: exact decile cut of the per-user activity ranks, integer event
    // totals, micro-quantized shares, 10-row cumulative window — mirror of
    // AnalyticsQueries.activityPareto
    "ev17_activity_pareto" ->
      """WITH per AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total_events,
        |               COUNT(*) AS n_users_total FROM per),
        |rk AS (SELECT n_events,
        |         row_number() OVER (ORDER BY n_events DESC, user_id) AS rank
        |       FROM per),
        |dec AS (SELECT CAST(1 + ((rank - 1) * 10) // n_users_total AS BIGINT) AS decile,
        |          n_events, total_events
        |        FROM rk CROSS JOIN tot),
        |agg AS (SELECT decile, COUNT(*) AS n_users,
        |          CAST(SUM(n_events) AS BIGINT) AS decile_events,
        |          MAX(total_events) AS total_events
        |        FROM dec GROUP BY 1),
        |cum AS (SELECT *, CAST(SUM(decile_events) OVER (ORDER BY decile
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS cum_events FROM agg)
        |SELECT decile, CAST(n_users AS BIGINT) AS n_users, decile_events,
        |  CAST(floor(1000000.0 * decile_events::DOUBLE / total_events::DOUBLE + 0.5)
        |    AS BIGINT) AS share_micro,
        |  CAST(floor(1000000.0 * cum_events::DOUBLE / total_events::DOUBLE + 0.5)
        |    AS BIGINT) AS cum_share_micro
        |FROM cum""".stripMargin,

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

    // media–text alignment screen: the stub media embedding is 8 dims of the payload
    // md5 (4 hex chars each, % 1000 / 1000), the text side is the document embedding's
    // leading 8 dims, alignment = rounded cosine, keep = threshold on the ROUNDED
    // value — mirror of Multimodal.mediaTextAlignment (media bytes = UTF-8 text, so
    // md5(media) = md5(text), the m02 equivalence)
    "m05_media_text_align" -> {
      val thr = AlignThresholdMicro.toDouble / 1000000.0
      s"""WITH med AS (SELECT doc_id, md5(text) AS h FROM documents),
         |me AS (SELECT doc_id, i,
         |         (('0x' || substr(h, (i - 1) * 4 + 1, 4))::BIGINT % 1000) / 1000.0 AS m
         |       FROM (SELECT doc_id, h, unnest(generate_series(1, $AlignDims)) AS i FROM med)),
         |mv AS (SELECT doc_id, list(m ORDER BY i) AS mv FROM me GROUP BY 1),
         |tv AS (SELECT vec_id AS doc_id, (embedding::DOUBLE[])[1:$AlignDims] AS tv FROM embeddings)
         |SELECT mv.doc_id, ${cosSql("mv", "tv")} AS align_cos,
         |  CASE WHEN ${cosSql("mv", "tv")} >= $thr THEN 1 ELSE 0 END AS aligned
         |FROM mv JOIN tv ON mv.doc_id = tv.doc_id""".stripMargin
    }
  )
}
