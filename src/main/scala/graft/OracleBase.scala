package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.testgraph.TestGraph

/** The shared spine of the per-family oracle objects (GraphOracles, TextOracles, ...)
  * and [[SparkEntry]] itself: every pinned operator parameter (shared by a query
  * registration and its DuckDB mirror so a retune cannot silently diverge them) and
  * every shared SQL CTE fragment. Families mix this in so their entries read
  * identically to the pre-split single-file form; constants stay reachable as
  * `SparkEntry.<name>` for the specs because SparkEntry extends this too.
  */
private[graft] trait OracleParams {

  type Q = (SparkSession, String) => DataFrame

  /** g38's pinned parameters, shared by the query registration and the oracle mirror
    * so a retune cannot silently diverge them (the oracle unrolls `KTrussRounds`
    * chained prune rounds with prune predicate `sup >= KTrussK - 2`).
    */
  private[graft] val KTrussK = 4
  private[graft] val KTrussRounds = 3

  /** t24's pinned merge-round count, shared by registration and oracle (the g38
    * shared-constant discipline).
    */
  private[graft] val BpeMergeRounds = 4

  /** t27's pinned Jelinek–Mercer interpolation weight in micro-units (λ = 0.7),
    * shared by registration and oracle.
    */
  private[graft] val BigramLambdaMicro = 700000L

  /** t28's pinned hashed-feature slot count, shared by registration and oracle. */
  private[graft] val LinearQualityBuckets = 1024

  /** t38/t39's pinned trained-classifier hyperparameters: hashed-feature slots,
    * logistic-regression rounds (small so the oracle's unrolled CTE chain stays
    * tractable — the s22 discipline), and the learning rate in micro-units
    * (500000 → 0.5, exactly representable so both engines hold the same double).
    */
  private[graft] val LrBuckets = 256
  private[graft] val LrRounds = 3
  private[graft] val LrRateMicro = 500000L

  /** t43's pinned mini-batch schedule: nBatches hash batches, nBatches rounds =
    * one full sweep (an epoch), shared by registration and oracle.
    */
  private[graft] val LrMiniBatches = 4
  private[graft] val LrMiniRounds = 4

  /** t42's pinned gate-swap thresholds over the t41 eval (micro units), shared
    * by registration, oracle, and the driver-side trigger's defaults.
    */
  private[graft] val GateMinAgreementMicro = 850000L
  private[graft] val GateMinPrecisionMicro = 800000L
  private[graft] val GateMinRecallMicro = 800000L

  /** g40's pinned label-propagation round count, shared by registration and oracle. */
  private[graft] val LpaRounds = 4

  /** d13's pinned tuning (near-twin cosine threshold, deterministic centroid
    * sampling mod), shared by registration and oracle.
    */
  private[graft] val SemDedupThreshold = 0.4
  private[graft] val SemDedupCentroidMod = 97

  /** s17's pinned tuning (query sampling mod, per-list depth, fused depth, RRF
    * rank offset), shared by registration and oracle.
    */
  private[graft] val HybridQueryMod = 50
  private[graft] val HybridListK = 10
  private[graft] val HybridK = 5
  private[graft] val RrfK0 = 60

  /** s18's document-frequency cap: tokens in more than this fraction of docs are
    * stopwords for scoring purposes and never reach the posting join (the
    * production skew guard, priced against s17's uncapped run in the bench).
    */
  private[graft] val HybridDfCap = 0.5

  /** t29's pinned Kneser–Ney discount in micro-units (D = 0.75), shared by
    * registration and oracle.
    */
  private[graft] val KneserNeyDiscountMicro = 750000L

  /** t30's pinned sampling temperature in micro-units (α = 0.3 — the
    * small-source-upweighting regime), shared by registration and oracle.
    */
  private[graft] val MixAlphaMicro = 300000L

  /** dc04's pinned per-epoch document budget the mix plan allocates. */
  private[graft] val MixBudgetDocs = 1000L

  /** dc15's pinned anneal-set size (documents reserved for the end-of-run
    * quality phase), shared by registration and oracle.
    */
  private[graft] val AnnealDocs = 64L

  /** dc16's pinned corpus-adapted Gopher required-word set: the published
    * eight-stopword set has one member in the synthetic vocabulary, which would
    * fail the ≥ 2-distinct rule for EVERY document and zero the funnel at the
    * gopher stage — the gate takes the set as a parameter for exactly this
    * (deployments tune it per language/corpus; see gopherQuality's doc).
    */
  private[graft] val FunnelRequiredWords = Seq("the", "a", "value", "line")

  /** s19's pinned tuning (query sampling mod, feedback depth, final depth), shared
    * by registration and oracle.
    */
  private[graft] val PrfQueryMod = 50
  private[graft] val PrfFeedbackK = 5
  private[graft] val PrfK = 5

  /** m05's pinned tuning (media-embedding dimensionality, keep threshold in
    * micro-units), shared by registration and oracle.
    */
  private[graft] val AlignDims = 8
  private[graft] val AlignThresholdMicro = 500000L

  /** sk06's pinned bottom-k register size, shared by registration and oracle. */
  private[graft] val KmvQuantK = 64

  /** d14's pinned tuning (duplicated-window width in tokens, minimum span length
    * worth reporting), shared by registration and oracle.
    */
  private[graft] val DupSpanWindow = 5
  private[graft] val DupSpanMinTokens = 8

  /** t31's pinned tuning (hashed-feature slot count, target-domain source id),
    * shared by registration and oracle.
    */
  private[graft] val DsirBuckets = 1024
  private[graft] val DsirTargetSource = "src0"

  /** ev15's pinned last-touch lookback window (24 h in µs), shared by registration
    * and oracle.
    */
  private[graft] val AttributionLookbackUs = 86400000000L

  /** s20's pinned neighbor-list size, shared by registration and oracle. */
  private[graft] val KnnGraphK = 5

  /** s28's pinned archive/arrival split (vec_id < cut = archive whose graph was
    * built; ≥ cut = the ingest batch that earns lists incrementally), shared by
    * registration and oracle.
    */
  private[graft] val KnnExtendCut = 450L

  /** s26's pinned beam-search hyperparameters over the s20 graph: beam width,
    * expansion rounds (unrolled in the oracle), the trained-quantizer cell
    * count for the entry hierarchy (kmeansCtes-replayable, the s23 discipline),
    * and how many nearest cells a query enters through (the HNSW upper-layer
    * descent, fixed-size at any corpus scale).
    */
  private[graft] val GraphAnnBeam = 8
  private[graft] val GraphAnnRounds = 2
  private[graft] val GraphAnnCells = 8
  private[graft] val GraphAnnEntryProbe = 4

  /** Lloyd rounds for the s26 ENTRY codebook: one — the hierarchy only routes
    * queries to regions (medoids do the entering), so a converged codebook buys
    * nothing; fewer rounds keep the in-session s26 build honest-cheap (the s27
    * artifact amortizes it to zero per batch anyway).
    */
  private[graft] val GraphAnnTrainRounds = 1

  /** s34's pinned layer stack (sizes DECREASE toward the top — nested md5-order
    * prefixes) and the per-layer anchor width of the descent.
    */
  private[graft] val GraphAnnLayerSizes = Seq(32, 8)
  private[graft] val GraphAnnLayerProbe = 2

  /** s35/s36's pinned coarse-stage overfetch (shortlist = k · this). */
  private[graft] val Int8Overfetch = 4

  /** s38's pinned tombstone predicate (vec_id ≡ 0 mod this ⇒ deleted), shared
    * by registration and oracle.
    */
  private[graft] val Int8TombstoneMod = 7

  /** o03's pinned tuning, shared by registration and oracle: group target in rows,
    * and the tile shift — FINER than o01's write-bucket shift (26) because the
    * planner needs enough tiles to pack (shift 26 collapses the synthetic corpus
    * to one tile; 12 yields hundreds — the planner's whole point is merging many
    * small tiles into few target-sized files).
    */
  private[graft] val CompactionTargetRows = 4096L
  private[graft] val CompactionTileShift = 12

  /** sk08's pinned AMS register count, shared by registration and oracle. */
  private[graft] val AmsWidth = 64

  /** t32's pinned doc-id bucket width, shared by registration and oracle. */
  private[graft] val VocabBucketDocs = 50L

  /** g45's pinned walk length and seed sampling mod, shared by registration and
    * oracle.
    */
  private[graft] val WalkSteps = 3
  private[graft] val WalkSeedMod = 10

  /** g52's pinned seed sampling mod (seed set = vertices ≡ 0 mod this), shared
    * by registration and oracle.
    */
  private[graft] val SccReachSeedMod = 10

  /** g53's pinned landmark-oracle tuning: fixed landmark count (md5-smallest
    * selection — corpus-independent), BFS hop bound, and the two pair-query
    * sampling mods; shared by registration and oracle.
    */
  private[graft] val LandmarkCount = 16
  private[graft] val LandmarkHops = 3
  private[graft] val LandmarkUMod = 25
  private[graft] val LandmarkVMod = 37

  /** g59's pinned weighted-SSSP parameters, shared by registration, oracle,
    * and property mirror: seed set = the SsspSeeds smallest md5(v) vertices
    * (the g53 bounded-entry convention — never corpus-proportional), distances
    * relaxed for SsspHops rounds (hop-bounded Bellman-Ford: the ≤R-hop
    * min-weight semantic, total and deterministic whether or not the graph
    * converged), edge weight = 1 + position % SsspWeightMod.
    */
  private[graft] val SsspSeeds = 8
  private[graft] val SsspHops = 6
  private[graft] val SsspWeightMod = 97L

  /** g60's pinned relaxation budget for the weighted landmark tables (one more
    * hop than g53's unweighted sketch — cost paths bend around heavy edges).
    */
  private[graft] val WLandmarkHops = 4

  /** g64's pinned degree thresholds for the rich-club curve. */
  private[graft] val RichClubKs: Seq[Int] = Seq(2, 4, 8)

  /** g61's pinned Luby-round budget (expected O(log n) for hash priorities);
    * the kernel raises rather than return a partial MIS past it.
    */
  // 12 rounds ≈ 2× the expected O(log n) for hash-priority Luby at the test
  // scales (observed convergence ≤ 4 rounds at sf0.1) — headroom so a graph
  // that needs a round or two more than expected stays verifiable instead of
  // turning into a hard driver failure (r14 ADVICE). Both engines share the
  // budget: the Spark kernel raises past it, the oracle emits round = -1
  // probe rows from the residual arena (see "g61_mis") — neither silently
  // returns a partial MIS.
  private[graft] val MisRounds = 12

  /** g54's pinned HyperANF round count, shared by registration and oracle. */
  private[graft] val HyperAnfRounds = 3

  /** g55's pinned effective-diameter fraction (per cent of the neighborhood
    * function's plateau — the published 90%), shared by registration and oracle.
    */
  private[graft] val EffDiameterPct = 90

  /** g56's pinned h-index-iteration round count, shared by registration and
    * oracle (each round tightens the coreness upper bound; the oracle unrolls
    * them as chained window CTEs).
    */
  private[graft] val CorenessRounds = 3

  /** t44's pinned reliability-table bin count, shared by registration and oracle. */
  private[graft] val CalibrationBins = 10

  /** t45's pinned OOV log-score penalty in micro-nats (the score a bigram gets
    * when its successor token never appears in the reference corpus), shared by
    * registration and oracle.
    */
  private[graft] val CcnetOovLpMicro = -20000000L

  /** t52/t53's pinned unigram-LM tokenizer dials: EM(Viterbi) rounds, max piece
    * length, seed and target vocabulary sizes (binding on the synthetic
    * 31-token dictionary), and the unused-piece floor log-prob in micro-nats —
    * shared by registration and oracle.
    */
  private[graft] val UnigramRounds = 2
  private[graft] val UnigramMaxPieceLen = 5
  private[graft] val UnigramSeedVocab = 60
  private[graft] val UnigramVocabTarget = 25
  private[graft] val UnigramFloorLpMicro = -20000000L

  /** t55's pinned subword-regularization dials: the sampling sharpness α in
    * micro units (0.5 — the published smoothing regime; exactly representable
    * so both engines scale with the same double) and the epoch seed string
    * keying the md5-derived draws — shared by registration and oracle.
    */
  private[graft] val UnigramSampleAlphaMicro = 500000L
  private[graft] val UnigramSampleSeed = "e0"

  /** t56's pinned tokenizer-swap margin in micro pieces-per-token: the
    * challenger must beat the incumbent's fertility by at least this to
    * deploy — shared by registration, oracle, and the driver-side trigger.
    */
  private[graft] val TokenizerSwapMarginMicro = 50000L

  /** dc29's pinned DoReMi loop dials: EG rounds, hash minibatches per sweep
    * (the t43 machinery), step size η and uniform-smoothing mass in micro
    * units — shared by registration and oracle.
    */
  private[graft] val DoremiRounds = 4
  private[graft] val DoremiBatches = 4
  private[graft] val DoremiEtaMicro = 500000L
  private[graft] val DoremiSmoothMicro = 100000L

  /** dc32's pinned data-constrained-budget dials: the token budget, per-epoch
    * geometric value decay of repeated data in micro (the Muennighoff 2023
    * repeated-tokens law collapsed to one dial), and the useful-epoch cap —
    * shared by registration and oracle.
    */
  private[graft] val RepeatBudgetTokens = 120000L
  private[graft] val RepeatDecayMicro = 800000L
  private[graft] val RepeatMaxEpochs = 16

  /** dc31's pinned reference source: the dc13 benchmark-split convention cuts
    * every doc_id ≡ 0 (mod DecontamMod), which on the testdata's interleaved id
    * layout removes src0 (dc29's reference) and src10 ENTIRELY from the
    * training pool — so the hygienic epoch measures excess against a source
    * that survives the cut. Shared by registration and oracle.
    */
  private[graft] val DoremiEpochRefSource = "src1"

  /** t46's pinned Gopher repetition thresholds in micro units (Rae et al. 2021
    * appendix A: top n-gram char fraction for n = 2..4, duplicate n-gram char
    * fraction for n = 5..10), shared by registration and oracle.
    */
  private[graft] val GopherTopMicro = Seq(200000L, 180000L, 160000L)
  private[graft] val GopherDupMicro =
    Seq(150000L, 140000L, 130000L, 120000L, 110000L, 100000L)

  /** t47's pinned Gopher document-quality thresholds (Rae et al. 2021 appendix
    * A1.1.1: word-count and mean-word-length bounds, plus the required-word set
    * with its ≥ 2-distinct-hits rule), shared by registration and oracle.
    */
  private[graft] val GopherMinWords = 50L
  private[graft] val GopherMaxWords = 100000L
  private[graft] val GopherMinMeanLen = 3L
  private[graft] val GopherMaxMeanLen = 10L
  private[graft] val GopherRequiredWords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  private[graft] val GopherMinRequiredHits = 2

  /** g57's pinned Borůvka unroll (outer rounds / min-label propagation steps
    * per contraction), shared by registration and oracle. The sf graphs
    * converge in 4 rounds; the kernel raises if the unroll is too short.
    */
  private[graft] val MsfRounds = 6
  private[graft] val MsfPropSteps = 4

  /** g58's pinned locally-dominant-matching round budget (the sf graphs
    * converge in ≤ 4; the kernel raises past the budget).
    */
  private[graft] val MatchRounds = 8

  /** t33's pinned pair-count floor and top-k, shared by registration and oracle. */
  private[graft] val PmiMinCount = 5L
  private[graft] val PmiK = 100

  /** t34's pinned vocabulary-head size for the Zipf fit. */
  private[graft] val ZipfFitK = 1000

  /** o04's pinned file-skipping predicate band and file-size target, shared by
    * registration and oracle. The target is finer than o03's so the gate-scale data
    * splits into enough planned files for min/max pruning to actually bite
    * (sf0.01: 29 groups, 17 pruned — vs 3 unprunable groups at o03's 4096).
    */
  private[graft] val PruneUserLo = 4L
  private[graft] val PruneUserHi = 9L
  private[graft] val PruneTargetRows = 256L

  /** t35's pinned snapshot cut: doc_id < cut = the EARLY corpus snapshot (ingestion
    * order is the corpus's time axis). 250 splits the gate-scale corpus in half and
    * still leaves every source represented on both sides at sf0.001.
    */
  private[graft] val SourceDriftCut = 250L

  /** d21's second time cut: [SourceDriftCut, DedupAppendCut) is the ingest wave
    * APPENDED to the persisted band index, [DedupAppendCut, ∞) the later wave
    * that probes the extended artifact.
    */
  private[graft] val DedupAppendCut = 375L

  /** t37's pinned hashed-LM bucket count (the bounded drift-register width the
    * streaming twin holds per source).
    */
  private[graft] val DriftBuckets = 1024

  /** dc02's pinned per-source quality-cap budget. */
  private[graft] val QualityCapK = 10

  /** dc24's pinned per-source token budget and quality-bucket width (micro),
    * shared by registration and oracle. The bucket width is the boundary-window
    * cost knob: candidates = fully-admitted buckets + ONE boundary bucket, so
    * the per-source window never sees more than budget + one bucket of tokens.
    */
  private[graft] val BudgetFillTokens = 600L
  private[graft] val BudgetFillBucketMicro = 100000L

  /** dc25's pinned holdout percentage (the quality-bucket width is shared with
    * dc24 — one quantization for the strata both operators see).
    */
  private[graft] val HoldoutPct = 10

  /** d37's pinned re-crawl wave: pre-cut documents with id % mod == 0 are
    * re-ingested under id + offset — the planted true-duplicate source the
    * bloom screen must pass. Offset clears every real doc id at any SF.
    */
  private[graft] val BloomReingestMod = 13L
  private[graft] val BloomReingestOffset = 10000000L

  /** s25's pinned arrival split: vec_id % mod == 0 are the vectors that "arrived
    * after training"; the rest train the codebook.
    */
  private[graft] val AssignNewMod = 5

  /** s22/s23's pinned k-means training schedule, shared by registration and oracle:
    * s22 trains the s10 model three rounds; s23's coarse quantizer trains two (the
    * oracle unrolls the rounds as chained CTEs, so the count prices the SQL too).
    */
  private[graft] val KmeansTrainRounds = 3
  private[graft] val IvfPqTrainRounds = 2

  /** s29's pinned metadata predicate (labels ≡ 0 mod this qualify), shared by
    * registration and oracle.
    */
  private[graft] val FilteredAnnLabelMod = 3

  /** s21's pinned MMR parameters, shared by registration and oracle. */
  private[graft] val MmrQueryMod = 50
  private[graft] val MmrCandK = 10
  private[graft] val MmrK = 5
  private[graft] val MmrLambdaMicro = 700000L

  /** d19's pinned benchmark split (doc_id % mod == 0 stands in for the external
    * eval suite) and verbatim-overlap window (word 5-grams — the d14 window width;
    * the published decontamination runs use 8–13-gram windows on much longer
    * documents).
    */
  private[graft] val DecontamMod = 10L
  private[graft] val DecontamShingle = 5

  /** d30's pinned window width and minimum registrable span (the shared d14
    * kernel run at a WIDER window and a LONGER bar than d14's 5/8 inventory
    * pins — the registry only wants spans worth cutting). The published
    * substring-dedup runs use ~50-token spans on real web documents; the
    * synthetic corpus's documents are 10–99 tokens, so the pins sit where the
    * planted near-dup spans (observed 11–93 tokens across scale factors) stay
    * discriminating: an 8-token window makes random same-vocabulary
    * collisions vanish, and 16 tokens keeps only genuinely long shared runs.
    */
  private[graft] val RepeatedSpanShingle = 8
  private[graft] val RepeatedSpanMinTokens = 16

  /** d40/d41's pinned archive/arrival split: doc_id ≡ 0 (mod 5) = the ingest
    * batch probed against the span-hash index of the rest (the archive).
    */
  private[graft] val SpanProbeArrivalMod = 5L

  /** d24's pinned cosine threshold in micro units. The published practice uses
    * ~0.95 on real text embeddings; the synthetic corpus's similarity spread
    * tops out near 0.49, so the pinned value sits inside that spread (≥ 0.40)
    * to keep the flag column discriminating at bench scale.
    */
  private[graft] val SemanticDecontamMicro = 400000L

  /** d31/d32's pinned within-cell cosine threshold (micro), cell count and
    * label-prop rounds. Same synthetic-spread reasoning as [[SemanticDecontamMicro]]:
    * the corpus's within-cell pair similarities top out near 0.60 here, so
    * 0.40 admits a discriminating minority (19/26/330 pairs at
    * sf0.001/0.01/0.1 against ~15k/15k/250k within-cell candidates).
    */
  private[graft] val SemanticDedupMicro = 400000L
  private[graft] val SemanticDedupCells = 8
  private[graft] val SemanticDedupLpRounds = 3

  /** ev23's pinned power-iteration budget over the ev21 matrix, shared by
    * registration and the unrolled oracle rounds.
    */
  private[graft] val MarkovRounds = 5

  /** ev25's pinned right-censoring window: a session whose last event falls within
    * `KmCensorUs` µs (one ev2 session gap) of the corpus end is censored (it may
    * still be open), not counted as an ended session. Shared by registration and
    * oracle.
    */
  private[graft] val KmCensorUs = 3600000000L

  /** dc23's pinned per-source sample size, shared by registration and oracle. */
  private[graft] val WeightedSampleK = 10

  /** s31's two pinned filters and the routing threshold: the tight filter
    * (label % 10 = 0, ~10% of the corpus) routes to the exact-prefilter scan,
    * the broad one (label % 2 = 0, ~49%) keeps the s29 IVF path; the 25%
    * threshold sits well clear of both so a one-document drift cannot flip a
    * route. Shared by registration and oracle.
    */
  private[graft] val AdaptiveAnnTightMod = 10
  private[graft] val AdaptiveAnnBroadMod = 2
  private[graft] val AdaptiveAnnSelMicro = 250000L

  /** d43's policy dial: deduplicate per snapshot once the cross-snapshot
    * duplicate mass reaches 10% of the snapshot-kept tokens (the FineWeb
    * ablation regime where that mass is worth keeping). Shared by
    * registration, oracle, and the RoundEighteenOpsSpec planted cases.
    */
  private[graft] val SnapshotPolicyThresholdMicro = 100000L

  /** s49's planted starvation filter (~1% of the corpus): selective enough
    * that even the harvest pool usually holds fewer than k allowed candidates,
    * so the card's starved arm reads < 1.0 and post-filtering reads worse —
    * the regime the s48 router exists to route around. Shared by registration,
    * oracle, and the RoundEighteenOpsSpec pin.
    */
  private[graft] val StarvedFilterMod = 97

  /** s32's pinned probe sweep — the serving-dial levels the recall curve is
    * priced at, shared by registration and oracle.
    */
  private[graft] val ProbeCurveLevels: Seq[Int] = Seq(1, 2, 4)

  /** s41's pinned pooled-recall target: the smallest probe level meeting it
    * wins (largest as fallback), shared by the kernel and the gated mirror.
    */
  private[graft] val TunedProbeTargetMicro = 400000L

  /** s44's pinned pooled-recall target for the tuned PREFIX width, placed so
    * the smallest-sufficient rule picks an interior width on the synthetic
    * corpus (the sf0.01 pooled curve reads ~0.08/0.08/0.34/1.0 across
    * 8/16/32/64 — neither the min nor the fallback max), shared by
    * registration and oracle.
    */
  private[graft] val TunedPrefixTargetMicro = 300000L

  /** s37's pinned matryoshka prefix widths — the truncation levels the s11
    * coarse stage is priced at, shared by registration and oracle.
    */
  private[graft] val PrefixCurveLevels: Seq[Int] = Seq(8, 16, 32, 64)

  /** dc18's "next release" gate knobs, diffed against the pinned dc16/dc17
    * configuration: the quality gate LOOSENS (one required-word hit instead of
    * [[GopherMinRequiredHits]] — admits documents the old release dropped) and
    * the semantic decontamination gate TIGHTENS (300000µ instead of
    * [[SemanticDecontamMicro]] — removes documents the old release kept), so
    * the diff exercises added, removed, AND retained in one report.
    */
  private[graft] val ReleaseDiffMinRequiredHits = 1
  private[graft] val ReleaseDiffSemanticMicro = 300000L

  /** d26's pinned tuning grid — every config splits the SAME 16-hash signature
    * budget (bands × rows = 16), so the sweep isolates the banding decision
    * from the minhash cost; shared by the Spark kernel and the generated
    * oracle CTEs so the two grids cannot drift.
    */
  private[graft] val LshTuneConfigs: Seq[(Int, Int)] = Seq((16, 1), (8, 2), (4, 4))

  /** d26's pinned recall floor (0.8): the cheapest config clearing it wins;
    * if none do, the pick degrades to max recall.
    */
  private[graft] val LshTuneRecallFloorMicro = 800000L

  /** dc05's pinned deterministic centroid sample (vec_id % mod == 0 are the cell
    * centers — the s04/d13 convention).
    */
  private[graft] val CoverageCentroidMod = 97

  /** g47's pinned Katz attenuation factor as an integer percentage (β = 1/2),
    * consumed by both the registration and the unrolled oracle rounds so the two
    * sides cannot silently desynchronize.
    */
  private[graft] val KatzBetaPct = 50L

}

private[graft] trait OracleFragments extends OracleParams {

  // ---------------------------------------------------------------------------
  // DuckDB oracles. Shared CTE fragments live in TestGraph to stay in lockstep
  // with the DataFrame derivation.
  // ---------------------------------------------------------------------------

  protected val snap = TestGraph.snapshotCte
  protected val meta = TestGraph.metadataCte
  protected val prio = TestGraph.prioritySql

  /** revenue in exact basis-point-cents (mirror of AnalyticsQueries.revenueBp). */
  protected val revBp =
    "CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))"

  protected def occSql(needle: String): String = {
    val esc = needle.replace("'", "''")
    s"(length(text) - length(replace(text, '$esc', ''))) // ${needle.length}"
  }

  /** cosine in DuckDB, same rounding as Similarity.cosine (inputs already DOUBLE[]). */
  /** Scratch-dir cleanup shared by the artifact queries (t26, s24): Files.walk
    * holds open directory handles that MUST be closed (its stream contract), so
    * the walk happens inside a try/finally on the stream — the previous inline
    * form leaked a handle per invocation (reviewed r10).
    */
  protected def deleteRecursively(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(dir)
    try walk.iterator().asScala.toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
  }

  protected def cosSql(a: String, b: String): String =
    s"round(list_dot_product($a, $b) / sqrt(list_dot_product($a, $a) * list_dot_product($b, $b)), 6)"

  /** Chained-CTE replay of `Similarity.kmeansRounds` over source CTE `src` (columns
    * vec_id, v) — the t24 unrolled-rounds discipline applied to model training: c0 =
    * the k-lowest-id seeds; round r scores every vector against c(r−1) (rounded
    * cosine argmax, cluster-asc tie-break), takes per-(cluster, dim) means rounded
    * to 6 (m_r, the s10 convention), and re-assembles the centroid arrays (c_r).
    * Because each round's centroids are ROUND-6 values, both engines hold identical
    * doubles entering the next round — the contract that keeps a multi-round
    * training loop hash-checkable.
    */
  /** t38/t39's unrolled logistic-regression training chain (the kmeansCtes
    * discipline for a linear model): hashed (doc, slot, tf) features, labels from
    * the t05 heuristic gate, and per round — exact BIGINT margins (Σ tf·w), the
    * per-doc sigmoid error quantized to integer micro, exact BIGINT gradients
    * (Σ tf·e), and the per-slot integer step ⌊lr·(g/n)+½⌋. Ends at `w{rounds}`
    * (slot, w).
    */
  /** The feature/label prefix shared by [[lrTrainCtes]] (full-batch) and
    * [[lrTrainMiniBatchCtes]] (t43's per-round hash batches): hashed (doc, slot,
    * tf) features and the t05 heuristic labels — extracted so the two training
    * unrolls have exactly one rendition of the supervision.
    */
  private def lrPrefixCtes: String =
    s"""toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
       |tf AS MATERIALIZED (
       |  SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT % $LrBuckets AS slot,
       |         COUNT(*) AS tf
       |  FROM toks GROUP BY 1, 2),
       |lab AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN n_tokens >= 10 AND stop_hits >= 1
       |          AND (n_chars - (n_tokens - 1)) <= 12 * n_tokens THEN 1 ELSE 0 END AS kept
       |  FROM (SELECT doc_id,
       |          CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
       |          CAST(${occSql(" the ")} + ${occSql(" a ")} + ${occSql(" of ")} + ${occSql(" and ")} AS BIGINT) AS stop_hits,
       |          CAST(length(text) AS BIGINT) AS n_chars
       |        FROM documents))""".stripMargin

  protected def lrTrainCtes(rounds: Int): String = {
    val lr = LrRateMicro.toDouble / 1000000.0
    val sb = new StringBuilder
    sb ++= lrPrefixCtes
    sb ++= s""",
              |nn AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
              |w0 AS (SELECT DISTINCT slot, CAST(0 AS BIGINT) AS w FROM tf)""".stripMargin
    for (r <- 1 to rounds) {
      sb ++= s""",
                |mg$r AS (SELECT tf.doc_id, CAST(SUM(tf.tf * w.w) AS BIGINT) AS m
                |        FROM tf JOIN w${r - 1} w USING (slot) GROUP BY 1),
                |er$r AS (SELECT mg.doc_id,
                |          CAST(floor(1000000.0 * (1.0 / (1.0 + exp(-(mg.m::DOUBLE / 1000000.0)))
                |            - lab.kept) + 0.5) AS BIGINT) AS e
                |        FROM mg$r mg JOIN lab USING (doc_id)),
                |gr$r AS (SELECT tf.slot, CAST(SUM(tf.tf * er.e) AS BIGINT) AS g
                |        FROM tf JOIN er$r er USING (doc_id) GROUP BY 1),
                |w$r AS MATERIALIZED (
                |  SELECT w.slot,
                |    CAST(w.w - CAST(floor($lr * (COALESCE(g.g, 0)::DOUBLE / nn.n::DOUBLE) + 0.5)
                |      AS BIGINT) AS BIGINT) AS w
                |  FROM w${r - 1} w LEFT JOIN gr$r g USING (slot) CROSS JOIN nn)""".stripMargin
    }
    sb.toString
  }

  /** t43's mini-batch unroll (the lrTrainCtes discipline with per-round hash
    * batches): round r's margins and gradients compute over ONLY the documents
    * whose [[bucketSql]] bucket falls in batch (r−1) mod nBatches, the step
    * divides by THAT batch's scored-doc count, and an empty batch steps by 0 —
    * still exact BIGINT sums within the batch, one quantized sigmoid per round.
    */
  protected def lrTrainMiniBatchCtes(rounds: Int, nBatches: Int): String = {
    val lr = LrRateMicro.toDouble / 1000000.0
    val sb = new StringBuilder
    sb ++= lrPrefixCtes
    sb ++= s""",
              |bn AS (SELECT batch, COUNT(*) AS n FROM (
              |    SELECT DISTINCT doc_id, ${bucketSql("doc_id")} % $nBatches AS batch FROM tf)
              |  GROUP BY 1),
              |w0 AS (SELECT DISTINCT slot, CAST(0 AS BIGINT) AS w FROM tf)""".stripMargin
    for (r <- 1 to rounds) {
      val b = (r - 1) % nBatches
      sb ++= s""",
                |mg$r AS (SELECT tf.doc_id, CAST(SUM(tf.tf * w.w) AS BIGINT) AS m
                |        FROM tf JOIN w${r - 1} w USING (slot)
                |        WHERE ${bucketSql("tf.doc_id")} % $nBatches = $b GROUP BY 1),
                |er$r AS (SELECT mg.doc_id,
                |          CAST(floor(1000000.0 * (1.0 / (1.0 + exp(-(mg.m::DOUBLE / 1000000.0)))
                |            - lab.kept) + 0.5) AS BIGINT) AS e
                |        FROM mg$r mg JOIN lab USING (doc_id)),
                |gr$r AS (SELECT tf.slot, CAST(SUM(tf.tf * er.e) AS BIGINT) AS g
                |        FROM tf JOIN er$r er USING (doc_id) GROUP BY 1),
                |nb$r AS (SELECT COALESCE((SELECT n FROM bn WHERE batch = $b), 0) AS n),
                |w$r AS MATERIALIZED (
                |  SELECT w.slot,
                |    CAST(w.w - CASE WHEN nn.n = 0 THEN 0
                |      ELSE CAST(floor($lr * (COALESCE(g.g, 0)::DOUBLE / nn.n::DOUBLE) + 0.5)
                |        AS BIGINT) END AS BIGINT) AS w
                |  FROM w${r - 1} w LEFT JOIN gr$r g USING (slot) CROSS JOIN nb$r nn)""".stripMargin
    }
    sb.toString
  }

  protected def kmeansCtes(src: String, k: Int, rounds: Int): String =
    kmeansCtesP("", src, k, rounds)

  /** [[kmeansCtes]] with every CTE name prefixed — s45 trains three codebooks
    * (full / archive / survivor corpora) inside one query, so the fixed names
    * would collide. Ends at `${p}c$rounds`.
    */
  protected def kmeansCtesP(p: String, src: String, k: Int, rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"${p}ke AS (SELECT vec_id, v FROM $src WHERE list_dot_product(v, v) > 0),\n"
    sb ++= s"${p}c0 AS (SELECT CAST(vec_id AS INTEGER) AS cluster, v AS cv, CAST(0 AS BIGINT) AS n_members\n"
    sb ++= s"      FROM (SELECT vec_id, v FROM ${p}ke ORDER BY vec_id LIMIT $k)\n"
    sb ++= s"      WHERE list_dot_product(v, v) > 0)"
    for (r <- 1 to rounds) {
      sb ++= ",\n"
      sb ++= s"${p}sc$r AS (SELECT ${p}ke.vec_id, c.cluster, ${p}ke.v, ${cosSql(s"${p}ke.v", "c.cv")} AS cos FROM ${p}ke, ${p}c${r - 1} c),\n"
      sb ++= s"${p}b$r AS (SELECT vec_id, cluster, v FROM (\n"
      sb ++= s"    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster) AS rk FROM ${p}sc$r)\n"
      sb ++= s"  WHERE rk = 1),\n"
      sb ++= s"${p}m$r AS (SELECT cluster, CAST(i AS INTEGER) AS dim, round(avg(v[i]), 6) AS centroid, COUNT(*) AS n_members\n"
      sb ++= s"  FROM ${p}b$r, unnest(generate_series(1, len(v))) AS t(i) GROUP BY cluster, i),\n"
      sb ++= s"${p}c$r AS (SELECT cluster, cv, n_members FROM (\n"
      sb ++= s"    SELECT cluster, list(centroid ORDER BY dim) AS cv, max(n_members) AS n_members FROM ${p}m$r GROUP BY cluster)\n"
      sb ++= s"  WHERE list_dot_product(cv, cv) > 0)"
    }
    sb.toString
  }

  /** Shared by s23 and s24 registrations: the trained-quantizer IVF-PQ mirror. */
  protected lazy val ivfPqTrainedSql: String = ivfPqTrainedSqlWith(None)

  /** The s23 mirror parameterized by s29's allowed-id subquery: the predicate
    * prunes the CELL relation before pair formation (`AND rid IN (...)`) — the
    * same pre-filter placement as the Spark kernel's semi-join, so the index
    * CTEs (trained cells, codes, LUT) stay built on the full corpus.
    */
  protected def ivfPqTrainedSqlWith(allowedSql: Option[String]): String =
    ivfPqTrainedSqlAt(2, allowedSql)

  /** [[ivfPqTrainedSqlWith]] further parameterized by the probe level — s41's
    * gated arms replay the SAME chain at each candidate nProbe.
    */
  protected def ivfPqTrainedSqlAt(nProbe: Int, allowedSql: Option[String]): String = {
    val cellFilter = allowedSql.map(sub => s" AND rid IN ($sub)").getOrElse("")
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |${kmeansCtes("base", 8, IvfPqTrainRounds)},
         |cents AS (SELECT CAST(cluster AS BIGINT) AS cid, cv FROM c$IvfPqTrainRounds),
         |scored_cells AS (
         |  SELECT base.vec_id AS rid, base.v, cents.cid, ${cosSql("base.v", "cents.cv")} AS cc
         |  FROM base, cents),
         |cells AS (
         |  SELECT rid AS neighbor_id, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY rid ORDER BY cc DESC, cid) AS crank
         |    FROM scored_cells)
         |  WHERE crank <= 1$cellFilter),
         |probes AS (
         |  SELECT rid AS query_id, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY rid ORDER BY cc DESC, cid) AS crank
         |    FROM scored_cells WHERE rid % 50 = 0)
         |  WHERE crank <= $nProbe),
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
         |WHERE rank <= 5""".stripMargin
  }

  /** The s21 MMR mirror: candidates and pair sims micro-quantized from the round-6
    * cosines, then the greedy selection UNROLLED round-for-round exactly like the
    * Spark loop (the d05 unrolled-rounds discipline) — generated from the same
    * Mmr* constants so the two sides cannot drift. Round r picks, among candidates
    * not yet selected, the argmax of λ·rel − (1e6−λ)·max-sim-to-selected (exact
    * integer comparison, neighbor-id tie-break).
    */
  protected def mmrRerankSql: String = {
    val lam = MmrLambdaMicro
    val oneMinus = 1000000L - MmrLambdaMicro
    val rounds = (2 to MmrK).map { r =>
      s"""m$r AS (SELECT c.query_id, c.neighbor_id, c.rel_micro,
         |          COALESCE(MAX(pp.sim_micro), 0) AS maxsim
         |        FROM cand c LEFT JOIN
         |          (SELECT p.query_id, p.id_a, p.sim_micro FROM ps p
         |             JOIN acc${r - 1} s ON s.query_id = p.query_id AND s.neighbor_id = p.id_b) pp
         |          ON pp.query_id = c.query_id AND pp.id_a = c.neighbor_id
         |        WHERE NOT EXISTS (SELECT 1 FROM acc${r - 1} s0
         |          WHERE s0.query_id = c.query_id AND s0.neighbor_id = c.neighbor_id)
         |        GROUP BY 1, 2, 3),
         |sel$r AS (SELECT query_id, neighbor_id, rel_micro, score_micro, $r AS mmr_rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                               ORDER BY score_micro DESC, neighbor_id) AS rk
         |  FROM (SELECT query_id, neighbor_id, rel_micro,
         |          CAST($lam * rel_micro - $oneMinus * maxsim AS BIGINT) AS score_micro
         |        FROM m$r)) WHERE rk = 1),
         |acc$r AS (SELECT query_id, neighbor_id FROM acc${r - 1}
         |          UNION ALL SELECT query_id, neighbor_id FROM sel$r)""".stripMargin
    }.mkString(",\n")
    val unionAll = (1 to MmrK).map(r => s"SELECT * FROM sel$r").mkString(" UNION ALL ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % $MmrQueryMod = 0),
       |scored AS (SELECT query_id, c.vec_id AS neighbor_id, ${cosSql("qv", "c.v")} AS cos_sim
       |           FROM q, e c WHERE c.vec_id <> query_id),
       |cand AS (SELECT query_id, neighbor_id,
       |           CAST(floor(1000000.0 * cos_sim + 0.5) AS BIGINT) AS rel_micro, rank
       |         FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |                 ORDER BY cos_sim DESC, neighbor_id) AS rank FROM scored)
       |         WHERE rank <= $MmrCandK),
       |ps AS (SELECT a.query_id, a.neighbor_id AS id_a, b.neighbor_id AS id_b,
       |         CAST(floor(1000000.0 * ${cosSql("ea.v", "eb.v")} + 0.5) AS BIGINT) AS sim_micro
       |       FROM cand a JOIN cand b
       |         ON b.query_id = a.query_id AND b.neighbor_id <> a.neighbor_id
       |       JOIN e ea ON ea.vec_id = a.neighbor_id
       |       JOIN e eb ON eb.vec_id = b.neighbor_id),
       |sel1 AS (SELECT query_id, neighbor_id, rel_micro,
       |           CAST($lam * rel_micro AS BIGINT) AS score_micro, 1 AS mmr_rank
       |         FROM cand WHERE rank = 1),
       |acc1 AS (SELECT query_id, neighbor_id FROM sel1),
       |$rounds
       |SELECT query_id, neighbor_id, rel_micro, score_micro,
       |  CAST(mmr_rank AS INTEGER) AS mmr_rank
       |FROM ($unionAll)""".stripMargin
  }

  /** The hybrid-retrieval (s17/s18) mirror, parameterized by the optional
    * document-frequency cap — ONE builder for both entries so the capped and
    * uncapped mirrors can never drift apart. With a cap, tokens whose df exceeds
    * `f · n_docs` are filtered from the |vocab|-sized relation BEFORE the posting
    * join (mirror of Retrieval.lexicalTopK's dfCapFraction: same ::DOUBLE
    * comparison, so the boundary decision is engine-identical).
    */
  protected def hybridRrfSql(dfCap: Option[Double]): String = {
    val dfcCte = dfCap.map(f =>
      s"""dfc AS (SELECT token, df_count FROM dfq
         |        CROSS JOIN (SELECT COUNT(DISTINCT doc_id) AS cap_nd FROM tf)
         |        WHERE df_count::DOUBLE <= $f * cap_nd::DOUBLE),
         |""".stripMargin).getOrElse("")
    val dfSrc = if (dfCap.isDefined) "dfc" else "dfq"
    s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
       |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       |dfq AS (SELECT token, COUNT(*) AS df_count FROM tf GROUP BY 1),
       |${dfcCte}dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
       |tot AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
       |w AS (SELECT tf.doc_id AS neighbor_id, tf.token,
       |        CAST(round(1000000 * (
       |          ((2200000 * tf)::DOUBLE
       |            / (1000000 * tf + 300000
       |               + CAST(round((900000 * dl * n_docs)::DOUBLE / sum_dl::DOUBLE) AS BIGINT))::DOUBLE)
       |          * ((2 * n_docs - 2 * df_count + 1)::DOUBLE / (2 * df_count + 1)::DOUBLE))) AS BIGINT) AS w
       |      FROM tf JOIN $dfSrc USING (token) JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN tot),
       |qt AS (SELECT DISTINCT doc_id AS query_id, token FROM toks WHERE doc_id % $HybridQueryMod = 0),
       |lexs AS (SELECT qt.query_id, w.neighbor_id, CAST(SUM(w.w) AS BIGINT) AS lex_micro
       |         FROM qt JOIN w USING (token) WHERE w.neighbor_id <> qt.query_id GROUP BY 1, 2),
       |lex AS (SELECT query_id, neighbor_id, rank AS lex_rank FROM (
       |          SELECT *, row_number() OVER (PARTITION BY query_id
       |                    ORDER BY lex_micro DESC, neighbor_id) AS rank FROM lexs)
       |        WHERE rank <= $HybridListK),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % $HybridQueryMod = 0),
       |sems AS (SELECT query_id, c.vec_id AS neighbor_id, ${cosSql("qv", "c.v")} AS cos_sim
       |         FROM q, e c WHERE c.vec_id <> query_id),
       |sem AS (SELECT query_id, neighbor_id, rank AS sem_rank FROM (
       |          SELECT *, row_number() OVER (PARTITION BY query_id
       |                    ORDER BY cos_sim DESC, neighbor_id) AS rank FROM sems)
       |        WHERE rank <= $HybridListK),
       |fused AS (SELECT query_id, neighbor_id,
       |            CAST(COALESCE(lex_rank, 0) AS INTEGER) AS lex_rank,
       |            CAST(COALESCE(sem_rank, 0) AS INTEGER) AS sem_rank,
       |            CAST(CASE WHEN lex_rank IS NULL THEN 0 ELSE 1000000 // ($RrfK0 + lex_rank) END
       |               + CASE WHEN sem_rank IS NULL THEN 0 ELSE 1000000 // ($RrfK0 + sem_rank) END
       |              AS BIGINT) AS rrf_score
       |          FROM lex FULL JOIN sem USING (query_id, neighbor_id))
       |SELECT query_id, neighbor_id, lex_rank, sem_rank, rrf_score,
       |       CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |            ORDER BY rrf_score DESC, neighbor_id) AS rank FROM fused)
       |WHERE rank <= $HybridK""".stripMargin
  }

  /** ±1 hyperplane weights as a DuckDB array literal — mirror of Similarity.planeWeight. */
  protected def lshPlaneSql(j: Int, dims: Int): String =
    (0 until dims)
      .map(i => if ((i * (2 * j + 3) + j) % 2 == 0) "1.0" else "-1.0")
      .mkString("[", ", ", "]::DOUBLE[]")

  /** LSH bucket id — mirror of Similarity.lshBucket (64-dim embeddings; `offset` selects
    * the plane family = hash table).
    */
  protected def lshBucketSql(v: String, nPlanes: Int, dims: Int, offset: Int = 0): String =
    (0 until nPlanes)
      .map(j => s"(CASE WHEN list_dot_product($v, ${lshPlaneSql(offset + j, dims)}) >= 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")

  /** Deterministic hash bucket in [0, 10000) — mirror of Sampling.bucketCol (salt ""). */
  protected def bucketSql(idExpr: String): String =
    s"('0x' || substr(md5(CAST($idExpr AS VARCHAR)), 1, 15))::BIGINT % 10000"

  /** d05's minhash-band + 3-round min-label closure chain (ends at `l3`) — shared
    * VERBATIM by the d05/d15/d16 mirrors, so the closure all three ride on the
    * Scala side (Dedup.dedupClusters) also has exactly one SQL rendition
    * (reviewed r10: three hand-synced copies).
    */
  /** The 16-permutation minhash signature chain (hm → mh) — shared by the d05
    * closure below and the d17/d18 incremental-probe mirrors.
    */
  protected lazy val minhashCtes: String =
    """hm AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % 1000000007 AS h FROM sh),
      |mh AS (SELECT doc_id, k, min(((2 * k + 1) * h + 12289 * k + 1) % 1000000007) AS minhash
      |       FROM (SELECT doc_id, h, unnest(generate_series(0, 15)) AS k FROM hm)
      |       GROUP BY doc_id, k)""".stripMargin

  /** Mirror of TextStats.gopherRepetition (t46) — shared by the t46/t48
    * entries and the dc16 release funnel's gate CTE.
    */
  protected lazy val gopherRepetitionSql: String = {
      val names = (2 to 10).map(n => if (n <= 4) s"top${n}_micro" else s"dup${n}_micro")
      val gCols = (2 to 10).map(n =>
        s"CAST(COALESCE(SUM(CASE WHEN n = $n THEN chars_in END), 0) AS BIGINT) AS g$n")
      val fracCols = (2 to 10).zip(names).map { case (n, nm) =>
        s"CAST((2 * 1000000 * COALESCE(g$n, 0) + greatest(n_chars, 1)) // " +
          s"(2 * greatest(n_chars, 1)) AS BIGINT) AS $nm"
      }
      val reasonTerms = (GopherTopMicro ++ GopherDupMicro).zipWithIndex.map {
        case (t, i) => s"CASE WHEN ${names(i)} > $t THEN ${1L << i} ELSE 0 END"
      }
      s"""WITH base AS (SELECT doc_id, length(text) AS n_chars, string_split(text, ' ') AS w
         |              FROM documents),
         |ns AS (SELECT doc_id, w, unnest(generate_series(2, 10)) AS n FROM base),
         |gi AS (SELECT doc_id, w, n, unnest(generate_series(1, len(w) - n + 1)) AS i FROM ns),
         |cnt AS (SELECT doc_id, n, array_to_string(w[i:i+n-1], ' ') AS gram, COUNT(*) AS c
         |        FROM gi GROUP BY 1, 2, 3),
         |top AS (SELECT doc_id, n, CAST(c * length(gram) AS BIGINT) AS chars_in
         |        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id, n
         |                ORDER BY c DESC, length(gram) DESC, gram ASC) AS rk
         |              FROM cnt WHERE n <= 4)
         |        WHERE rk = 1),
         |dup AS (SELECT doc_id, n, CAST(SUM(c * length(gram)) AS BIGINT) AS chars_in
         |        FROM cnt WHERE n >= 5 AND c >= 2 GROUP BY 1, 2),
         |u AS (SELECT * FROM top UNION ALL SELECT * FROM dup),
         |agg AS (SELECT doc_id, ${gCols.mkString(", ")} FROM u GROUP BY 1),
         |per AS (SELECT b.doc_id, CAST(b.n_chars AS BIGINT) AS n_chars,
         |          ${(2 to 10).map(n => s"COALESCE(g$n, 0) AS g$n").mkString(", ")}
         |        FROM base b LEFT JOIN agg USING (doc_id)),
         |fr AS (SELECT doc_id, n_chars, ${fracCols.mkString(",\n         ")} FROM per)
         |SELECT doc_id, n_chars, ${names.mkString(", ")},
         |  CAST(${reasonTerms.mkString(" + ")} AS BIGINT) AS reasons,
         |  CAST(CASE WHEN ${reasonTerms.mkString(" + ")} = 0 THEN 1 ELSE 0 END AS INTEGER)
         |    AS kept
         |FROM fr""".stripMargin
  }

  /** Mirror of TextStats.gopherQuality (t47) — shared the same way. */
  protected lazy val gopherQualitySql: String = gopherQualitySqlWith(GopherRequiredWords)

  /** The t47 mirror parameterized by the required-word set — dc16 passes the
    * corpus-adapted [[FunnelRequiredWords]], matching the Spark gate's
    * pass-through parameter.
    */
  protected def gopherQualitySqlWith(
      required: Seq[String],
      minRequiredHits: Int = GopherMinRequiredHits): String = {
      val reqTerms = required
        .map(rw => s"CASE WHEN list_contains(w, '$rw') THEN 1 ELSE 0 END")
        .mkString(" + ")
      val reasonSql =
        s"""CASE WHEN n_words < $GopherMinWords OR n_words > $GopherMaxWords THEN 1 ELSE 0 END
           | + CASE WHEN sum_word_chars < $GopherMinMeanLen * n_words
           |          OR sum_word_chars > $GopherMaxMeanLen * n_words THEN 2 ELSE 0 END
           | + CASE WHEN n_symbols * 10 > n_words THEN 4 ELSE 0 END
           | + CASE WHEN n_bullet_lines * 10 > n_lines THEN 8 ELSE 0 END
           | + CASE WHEN n_ellipsis_lines * 10 > n_lines * 3 THEN 16 ELSE 0 END
           | + CASE WHEN n_alpha_words * 5 < n_words * 4 THEN 32 ELSE 0 END
           | + CASE WHEN req_hits < $minRequiredHits THEN 64 ELSE 0 END""".stripMargin
      s"""WITH base AS (SELECT doc_id, text, string_split(text, ' ') AS w,
         |                     string_split(text, chr(10)) AS ln FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(w) AS BIGINT) AS n_words,
         |  CAST(list_aggregate(list_transform(w, x -> length(x)), 'sum') AS BIGINT)
         |    AS sum_word_chars,
         |  CAST((length(text) - length(replace(text, '#', '')))
         |     + (length(text) - length(replace(text, '...', ''))) // 3
         |     + (length(text) - length(replace(text, '…', ''))) AS BIGINT) AS n_symbols,
         |  CAST(len(ln) AS BIGINT) AS n_lines,
         |  CAST(len(list_filter(ln, l -> starts_with(l, '- ') OR starts_with(l, '* ')
         |    OR starts_with(l, '•'))) AS BIGINT) AS n_bullet_lines,
         |  CAST(len(list_filter(ln, l -> ends_with(l, '...') OR ends_with(l, '…')))
         |    AS BIGINT) AS n_ellipsis_lines,
         |  CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)
         |    AS n_alpha_words,
         |  CAST($reqTerms AS BIGINT) AS req_hits
         |FROM base)
         |SELECT doc_id, n_words, sum_word_chars, n_symbols, n_lines, n_bullet_lines,
         |  n_ellipsis_lines, n_alpha_words, req_hits,
         |  CAST($reasonSql AS BIGINT) AS reasons,
         |  CAST(CASE WHEN ($reasonSql) = 0 THEN 1 ELSE 0 END AS INTEGER) AS kept
         |FROM m""".stripMargin
  }

  protected lazy val dedupClusterCtes: String =
    s"""$minhashCtes,
      |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |          FROM mh a JOIN mh b ON a.k = b.k AND a.minhash = b.minhash AND a.doc_id < b.doc_id),
      |und AS (SELECT id_a AS a, id_b AS b FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
      |l0 AS (SELECT DISTINCT doc_id AS v, doc_id AS label FROM documents),
      |n1 AS (SELECT u.a, MIN(l.label) AS m FROM und u JOIN l0 l ON l.v = u.b GROUP BY u.a),
      |l1 AS (SELECT l0.v, LEAST(l0.label, COALESCE(n1.m, l0.label)) AS label
      |       FROM l0 LEFT JOIN n1 ON n1.a = l0.v),
      |n2 AS (SELECT u.a, MIN(l.label) AS m FROM und u JOIN l1 l ON l.v = u.b GROUP BY u.a),
      |l2 AS (SELECT l1.v, LEAST(l1.label, COALESCE(n2.m, l1.label)) AS label
      |       FROM l1 LEFT JOIN n2 ON n2.a = l1.v),
      |n3 AS (SELECT u.a, MIN(l.label) AS m FROM und u JOIN l2 l ON l.v = u.b GROUP BY u.a),
      |l3 AS (SELECT l2.v, LEAST(l2.label, COALESCE(n3.m, l2.label)) AS label
      |       FROM l2 LEFT JOIN n3 ON n3.a = l2.v)""".stripMargin

  /** distinct word-3-gram shingles per doc — mirror of Dedup.shingles(n=3). */
  protected val shinglesCte: String =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |sh AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS shingle
      |       FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 2)) AS i FROM toks))""".stripMargin

  /** Shared t25/t26 mirror: the BpeMergeRounds weighted-dictionary merge loop (pair
    * counts summed over word frequencies — provably equal to occurrence counts),
    * then every doc priced in post-merge symbols via its (doc, token) tf joined to
    * the per-token symbol count. The tf CTE carries the same '|'-token exclusion
    * the Scala side applies via bpeSafeToken so the filters match structurally —
    * not merely through the final join happening to drop the rows.
    */
  /** dc04's temperature budgets applied to the t09 hash order — the mix-manifest
    * chain shared by the dc08/dc09/dc10 mirrors (Sampling.mixExecute's plan side):
    * ends at `tgt` (per-source target_docs) and `ranked` (per-source hash-order
    * rank, bucket kept for the packing mirrors' pack_group arithmetic).
    */
  protected lazy val mixManifestCtes: String = mixManifestCtesFrom("documents")

  /** [[mixManifestCtes]] over an arbitrary source CTE/table — dc13 composes the
    * same manifest over the DECONTAMINATED pool, so the admission arithmetic has
    * exactly one SQL rendition.
    */
  protected def mixManifestCtesFrom(src: String): String = {
    val a = MixAlphaMicro.toDouble / 1000000.0
    s"""c AS (SELECT source, COUNT(*) AS n_docs FROM $src GROUP BY 1),
       |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM c),
       |w AS (SELECT source, n_docs, n_total,
       |        CAST(floor(1000000.0 * pow(n_docs::DOUBLE / n_total::DOUBLE, $a) + 0.5)
       |          AS BIGINT) AS weight_micro
       |      FROM c CROSS JOIN tot),
       |wt AS (SELECT CAST(SUM(weight_micro) AS BIGINT) AS w_total FROM w),
       |tgt AS (SELECT source, n_docs,
       |          CAST((weight_micro * $MixBudgetDocs) // w_total AS BIGINT) AS target_docs
       |        FROM w CROSS JOIN wt),
       |ranked AS (SELECT doc_id, source, bucket,
       |             row_number() OVER (PARTITION BY source ORDER BY bucket, doc_id) AS rk
       |           FROM (SELECT doc_id, source, ${bucketSql("doc_id")} AS bucket FROM $src))""".stripMargin
  }

  protected lazy val bpeEncodeCtes: String = bpeEncodeCtesFrom("documents")

  /** [[bpeEncodeCtes]] over an arbitrary source CTE/table — dc13 trains and
    * prices the tokenizer on the decontaminated pool through the same chain.
    */
  protected def bpeEncodeCtesFrom(src: String): String =
    s"""toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM $src),
       |${bpeEncodeCtesOverToks()}""".stripMargin

  /** The BPE chain over an ALREADY-DEFINED `toks` CTE — t54 shares one toks
    * between the BPE and unigram chains in a single query.
    */
  protected def bpeEncodeCtesOverToks(): String = {
    def roundCtes(i: Int): String = {
      val prev = s"e${i - 1}"
      s"""es$i AS (SELECT list_filter(string_split(repr, '||'), x -> x <> '') AS syms, cnt FROM $prev),
         |ep$i AS (SELECT syms[j] AS l, syms[j + 1] AS r, cnt
         |         FROM (SELECT syms, cnt, unnest(generate_series(1, len(syms) - 1)) AS j
         |               FROM es$i WHERE len(syms) >= 2)),
         |em$i AS MATERIALIZED (SELECT l, r FROM (
         |         SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS n FROM ep$i GROUP BY 1, 2)
         |       ORDER BY n DESC, l, r LIMIT 1),
         |e$i AS MATERIALIZED (SELECT token, COALESCE(replace(repr,
         |         '|' || (SELECT l FROM em$i) || '||' || (SELECT r FROM em$i) || '|',
         |         '|' || (SELECT l FROM em$i) || (SELECT r FROM em$i) || '|'), repr) AS repr, cnt FROM $prev)""".stripMargin
    }
    s"""tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
       |       WHERE length(token) >= 1 AND token NOT LIKE '%|%' GROUP BY 1, 2),
       |wf AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1),
       |e0 AS MATERIALIZED (SELECT token, '||' || array_to_string(
       |         list_transform(generate_series(1, length(token)), i -> substr(token, i, 1)),
       |         '||') || '||' AS repr, cnt
       |       FROM wf),
       |${(1 to BpeMergeRounds).map(roundCtes).mkString(",\n")},
       |enc AS (SELECT token,
       |          len(list_filter(string_split(repr, '||'), x -> x <> '')) AS n_sym
       |        FROM e$BpeMergeRounds)""".stripMargin
  }

  protected lazy val bpeEncodeMirrorSql: String =
    s"""WITH $bpeEncodeCtes
       |SELECT tf.doc_id,
       |       CAST(SUM(tf) AS BIGINT) AS n_tokens,
       |       CAST(SUM(tf * length(token)) AS BIGINT) AS n_chars,
       |       CAST(SUM(tf * n_sym) AS BIGINT) AS n_syms
       |FROM tf JOIN enc USING (token)
       |GROUP BY 1""".stripMargin

}
