package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / split / corpus-composition operators for training-data
  * pipelines. Everything keys off a content-independent hash bucket of the document id
  * (md5 → first 60 bits → mod), so results are:
  *   - reproducible across runs, engines, and cluster sizes (no RNG, no partition
  *     dependence — `rand()` changes with partitioning and retries);
  *   - stable under corpus growth (a document keeps its split/sample fate when new
  *     documents arrive — the property train/test splits need to avoid leakage);
  *   - oracle-checkable (the same arithmetic runs in DuckDB).
  *
  * Scale shape: [[hashSplit]] and [[weightedMix]] are pure map-side column expressions
  * (no shuffle at all); [[sourceCap]] is one window per source partition (see its note).
  */
object Sampling {

  /** Bucket granularity: weights/fractions resolve to 1/10000ths. */
  val Buckets: Int = 10000

  /** Deterministic hash bucket in [0, Buckets) from the id column (+ optional salt —
    * different salts give independent splits, e.g. one per experiment).
    */
  def bucketCol(id: Column, salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 15), 16, 10)
      .cast("long") % Buckets

  /** Train/validation/test split assignment: `trainPct`% of buckets → train, next
    * `valPct`% → val, rest → test. Map-only; a document's split never changes as the
    * corpus grows.
    */
  /** Bucket → split-name assignment — the ONE threshold chain shared by
    * [[hashSplit]] and the cluster-aware split (d16), so the "singletons reduce
    * exactly to t07" invariant is structural, not two hand-synced copies.
    */
  def splitCol(bucket: Column, trainPct: Int, valPct: Int): Column =
    when(bucket < trainPct * Buckets / 100, "train")
      .when(bucket < (trainPct + valPct) * Buckets / 100, "val")
      .otherwise("test")

  def hashSplit(
      df: DataFrame,
      idCol: String,
      trainPct: Int = 90,
      valPct: Int = 5,
      salt: String = ""
  ): DataFrame = {
    val b = bucketCol(col(idCol), salt)
    df.select(
      col(idCol),
      b.as("bucket"),
      splitCol(b, trainPct, valPct).as("split")
    )
  }

  /** Weighted corpus mixing: downsample each source to its target weight (fraction in
    * [0,1]) — the "mix web at 0.5, books at 1.0" step of corpus composition. A row
    * survives iff its hash bucket falls below `weight(source) · Buckets`. Map-only
    * filter; deterministic per document.
    */
  def weightedMix(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0,
      salt: String = ""
  ): DataFrame = {
    // thresholds resolve to exact integers driver-side: comparing the bucket against
    // w·Buckets as a double would put documents on the 1-ulp boundary (0.8·10000 =
    // 8000.0000000000004) on different sides in different engines
    def thr(w: Double): Long = math.round(w * Buckets)
    val threshold = weights.foldLeft(lit(thr(defaultWeight))) { case (acc, (src, w)) =>
      when(col(sourceCol) === src, lit(thr(w))).otherwise(acc)
    }
    val b = bucketCol(col(idCol), salt)
    df.filter(b < threshold).select(col(idCol), col(sourceCol), b.as("bucket"))
  }

  /** Sequence packing: assign documents to fixed-token-budget training bins
    * ("concat-and-cut" packing — documents are laid out in a deterministic order and
    * the stream is cut every `budgetTokens` tokens; a document belongs to the bin its
    * first token falls in). Output: one row per (source, pack_group, bin) with the
    * packed document/token counts — the composition report a packing run emits.
    *
    * Determinism: layout order is (hash bucket, id) inside each (source, pack_group),
    * where pack_group = bucket % nGroups — no RNG, no partition dependence, so the
    * binning is reproducible across engines and cluster sizes.
    *
    * Scale shape: packing is inherently sequential in layout order, so the window runs
    * per (source, pack_group) — `nGroups` independent bounded partitions per source
    * rather than one unsplittable per-source window (the t09 lesson): each group is
    * ~1/nGroups of a source, and real packing jobs only need intra-worker order, which
    * this models. Raise nGroups with corpus size; everything else is map + one
    * hash-aggregation.
    */
  def sequencePack(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      textCol: String,
      budgetTokens: Long = 512L,
      nGroups: Int = 8,
      salt: String = ""
  ): DataFrame = {
    val rows = df.select(
      col(idCol),
      col(sourceCol),
      bucketCol(col(idCol), salt).as("bucket"),
      TextStats.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("pack_group", col("bucket") % nGroups)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol), col("pack_group"))
      .orderBy(col("bucket"), col(idCol))
    rows
      .withColumn("tok_before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin", (col("tok_before") / budgetTokens).cast("long"))
      .groupBy(col(sourceCol), col("pack_group"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
  }

  /** Per-source document cap: keep the `k` documents with the smallest hash buckets in
    * each source — a deterministic uniform subsample per domain (the "cap any one
    * domain's contribution" step). Tie-break on id so the result is total-ordered.
    *
    * Scale shape (two-pass exact): pass 1 reduces each source to its exact k-th smallest
    * (bucket, id) pair with a bounded k-element aggregate
    * ([[org.apache.spark.sql.graft.KthSmallest]] — map-side combinable, O(k) state, runs
    * in ObjectHashAggregate); pass 2 broadcasts the per-source thresholds (one tiny row
    * per source) and keeps rows at-or-below them with a map-only filter. The final
    * row_number window only ranks the ≤ k survivors per source. This replaces the naive
    * `row_number() over (partition by source)` form, whose unsplittable window partition
    * serializes a ~10^9-doc source through one task.
    */
  def sourceCap(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      k: Int,
      salt: String = ""
  ): DataFrame = {
    val rows = df.select(col(idCol), col(sourceCol))
      .withColumn("bucket", bucketCol(col(idCol), salt))
    val thresholds = rows
      .groupBy(col(sourceCol))
      .agg(org.apache.spark.sql.graft.KthSmallest.column(col("bucket"), col(idCol), k).as("thr"))
    val kept = rows
      .join(broadcast(thresholds), Seq(sourceCol))
      .filter(
        col("bucket") < col("thr.major") ||
          (col("bucket") === col("thr.major") && col(idCol) <= col("thr.minor")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(col("bucket"), col(idCol))
    kept
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k) // defensive trim if ids are not unique within a source
      .select(col(idCol), col(sourceCol), col("rk"))
  }

  /** Temperature-scaled corpus mixing weights — the data-mixing primitive of
    * multilingual/multi-source pretraining (sampling probability p_i ∝ (n_i/N)^α with
    * α < 1 upweights small sources; α = 1 is proportional, α = 0 uniform). For each
    * source: its document share, the temperature-scaled weight, the normalized
    * sampling probability, and the boost factor p_i/share_i (how many effective
    * epochs of the source one epoch of the mixture consumes).
    *
    * Determinism discipline: the only float the engines must agree on is
    * `pow(share, α)` itself, and it is immediately quantized to integer micro-units —
    * the normalization then happens in EXACT integer space (Σ of BIGINTs), so sums
    * are order-free and every output is a single rounded ratio of exact integers
    * (the order-free-ratio idiom used throughout this module).
    *
    * Scale shape: one map-side-combinable count per source, then arithmetic on a
    * |sources|-sized relation with a 1-row broadcast total — nothing here ever sees
    * the corpus again.
    */
  def temperatureMix(
      df: DataFrame,
      sourceCol: String,
      alphaMicro: Long = 300000L
  ): DataFrame =
    temperatureWeights(df, sourceCol, alphaMicro)
      .select(
        col(sourceCol),
        col("n_docs"),
        round(col("n_docs").cast("double") / col("n_total").cast("double"), 6).as("share"),
        col("weight_micro"),
        round(col("weight_micro").cast("double") / col("w_total").cast("double"), 6)
          .as("p_sample"),
        // boost = p/share as ONE division of two exact integer products
        round(
          (col("weight_micro") * col("n_total")).cast("double") /
            (col("w_total") * col("n_docs")).cast("double"),
          6).as("boost"))

  /** Shared core of [[temperatureMix]] and [[mixPlan]]: per-source counts with the
    * corpus total, the micro-quantized temperature weight, and the weight total —
    * (source, n_docs, n_total, weight_micro, w_total).
    */
  private def temperatureWeights(
      df: DataFrame,
      sourceCol: String,
      alphaMicro: Long
  ): DataFrame = {
    val alpha = alphaMicro.toDouble / 1000000.0
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
      .localCheckpoint(true) // two consumers (total + weighted) — else the corpus re-scans
    val total = counts.agg(sum(col("n_docs")).as("n_total"))
    val weighted = counts
      .crossJoin(broadcast(total))
      .withColumn(
        "weight_micro",
        // exact double sequence mirrored in the oracle: floor(1e6·(n/N)^α + 0.5)
        floor(
          lit(1000000.0) * pow(col("n_docs").cast("double") / col("n_total").cast("double"), alpha)
            + lit(0.5)).cast("long"))
    val wTotal = weighted.agg(sum(col("weight_micro")).as("w_total"))
    weighted.crossJoin(broadcast(wTotal))
  }

  /** dc04 — the actionable SAMPLING PLAN for one training epoch of `budgetDocs`
    * documents: per source, the temperature-target document count
    * (`target_docs` = ⌊weight·budget / Σweights⌋, exact integer arithmetic), what a
    * proportional epoch would take (`prop_docs`), and the up/down/hold verdict —
    * i.e. [[temperatureMix]]'s probabilities turned into the concrete per-source
    * budgets a curation run executes with [[sourceCap]]/[[hashSplit]]. Same scale
    * shape as temperatureMix: |sources|-sized arithmetic, 1-row broadcast totals,
    * the corpus scanned once for the counts.
    */
  def mixPlan(
      df: DataFrame,
      sourceCol: String,
      alphaMicro: Long = 300000L,
      budgetDocs: Long = 1000L
  ): DataFrame =
    temperatureWeights(df, sourceCol, alphaMicro)
      .select(
        col(sourceCol),
        col("n_docs"),
        round(col("weight_micro").cast("double") / col("w_total").cast("double"), 6)
          .as("p_sample"),
        expr(s"(weight_micro * ${budgetDocs}L) div w_total").as("target_docs"),
        expr(s"(n_docs * ${budgetDocs}L) div n_total").as("prop_docs"))
      .withColumn("verdict",
        when(col("target_docs") > col("prop_docs"), "upsample")
          .when(col("target_docs") < col("prop_docs"), "downsample")
          .otherwise("hold"))

  /** dc08 — EXECUTE the dc04 mix plan: the deterministic sample that materializes
    * the temperature-mix budgets. Every document ranks within its source by the
    * t07/t09 unbiased hash order (salted md5 bucket, id tie-break), and each
    * source keeps its own `target_docs` prefix of that order — so the output IS
    * the next epoch's corpus manifest, reproducible from the plan parameters
    * alone, and growing a source never reshuffles which of its documents are
    * sampled (ranks only extend).
    *
    * Scale shape: budgets are the |sources|-row dc04 relation (checkpointed; its
    * max is ONE driver-side scalar off that catalog-sized relation — the only
    * collect). Admission reuses t09's bounded [[org.apache.spark.sql.graft.KthSmallest]]
    * threshold at that max, so no data-sized source partition is ever window-sorted;
    * the per-source exact trim then runs over the ≤ sources×max admitted rows with
    * the budgets broadcast in.
    *
    * A source whose `target_docs` exceeds its document count contributes ALL its
    * documents and stops — this entry reports the sampled prefix only, so such an
    * epoch under-fills the plan's token mass by the shortfall. The dc10 variant
    * ([[mixExecuteUpsampled]]) materializes the plan exactly by stamping each kept
    * document with an integer `repeat_factor` whose per-source sum equals
    * `target_docs`.
    */
  def mixExecute(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      alphaMicro: Long = 300000L,
      budgetDocs: Long = 1000L,
      salt: String = ""
  ): DataFrame = {
    val budgets = mixPlan(df, sourceCol, alphaMicro, budgetDocs)
      .select(col(sourceCol), col("target_docs"))
      .localCheckpoint(true)
    val kMax = budgets.agg(max(col("target_docs"))).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
      .getOrElse(0L)
    // sourceCap's threshold k is an Int: a budget large enough to push one
    // source's target past 2^31 would silently wrap negative in toInt and admit
    // the wrong prefix — fail loudly instead (at that scale the admission needs
    // the distributedRank path, not a row_number window).
    require(kMax <= Int.MaxValue.toLong,
      s"mixExecute: largest per-source target_docs ($kMax) exceeds Int.MaxValue; " +
        "split the epoch budget or rank via AnalyticsQueries.distributedRank")
    val admitted = sourceCap(df, idCol, sourceCol, math.max(1L, kMax).toInt, salt)
    admitted.join(broadcast(budgets), Seq(sourceCol))
      .filter(col("rk") <= col("target_docs"))
      .select(col(idCol), col(sourceCol), col("rk"), col("target_docs"))
  }

  /** dc10 — mix-plan execution WITH upsampling materialized: where [[mixExecute]]
    * silently caps an over-budget source at its document count (under-filling the
    * epoch), this variant stamps every kept document with an exact integer
    * `repeat_factor` (how many times the trainer replays it this epoch) so each
    * source's Σ repeat_factor equals its planned `target_docs` EXACTLY:
    * base = target div n, and the first (target mod n) documents of the unbiased
    * hash order carry base+1 — the deterministic epoch-boost schedule of
    * temperature-mixed pretraining (small upweighted sources repeat; large
    * downsampled sources keep a prefix at factor 1). Sources with target ≤ n
    * degenerate to mixExecute rows with repeat_factor = 1.
    *
    * Scale shape: identical to mixExecute (the |sources|-row plan relation gains
    * an n_docs column; the repeat arithmetic is a map-only expression over the
    * admitted rows with the budgets broadcast in).
    */
  def mixExecuteUpsampled(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      alphaMicro: Long = 300000L,
      budgetDocs: Long = 1000L,
      salt: String = ""
  ): DataFrame =
    mixExecuteUpsampledWith(df, idCol, sourceCol,
      mixPlan(df, sourceCol, alphaMicro, budgetDocs)
        .select(col(sourceCol), col("n_docs"), col("target_docs")),
      salt)

  /** [[mixExecuteUpsampled]] with an EXPLICIT budgets relation
    * (source, n_docs, target_docs) — the admission/repeat arithmetic decoupled
    * from the temperature plan so learned budgets ([[doremiMixPlan]] — dc31)
    * flow through the identical manifest kernel.
    */
  private[graft] def mixExecuteUpsampledWith(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      planBudgets: DataFrame,
      salt: String = ""
  ): DataFrame = {
    val budgets = planBudgets
      .select(col(sourceCol), col("n_docs"), col("target_docs"))
      .localCheckpoint(true)
    val kMax = budgets.agg(max(least(col("target_docs"), col("n_docs")))).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
      .getOrElse(0L)
    require(kMax <= Int.MaxValue.toLong,
      s"mixExecuteUpsampled: largest per-source admission ($kMax) exceeds Int.MaxValue; " +
        "split the epoch budget or rank via AnalyticsQueries.distributedRank")
    val admitted = sourceCap(df, idCol, sourceCol, math.max(1L, kMax).toInt, salt)
    admitted.join(broadcast(budgets), Seq(sourceCol))
      .filter(col("rk") <= least(col("target_docs"), col("n_docs")))
      .withColumn("repeat_factor",
        when(col("target_docs") <= col("n_docs"), lit(1L))
          .otherwise(
            expr("target_docs div n_docs") +
              when(col("rk") <= col("target_docs") % col("n_docs"), lit(1L)).otherwise(lit(0L))))
      .select(col(idCol), col(sourceCol), col("rk"), col("target_docs"), col("repeat_factor"))
  }

  /** dc09 — the EPOCH MATERIALIZER: the job whose output a trainer actually reads,
    * composing the pipeline's three batch kernels end-to-end in one run —
    * [[mixExecute]]'s per-source manifest (which documents this epoch), BPE pricing
    * from a SAVED tokenizer artifact ([[graft.pipeline.TextStats.bpeEncodeWith]] —
    * train once, encode every epoch), and [[sequencePack]]'s concat-and-cut binning
    * over POST-MERGE symbol counts (the unit a context-length budget is actually
    * denominated in, not whitespace tokens). Output: one row per training pack —
    * (source, pack_group, bin) with its document count, packed symbol count, and
    * manifest-rank boundaries (`rk_first`/`rk_last` — the BOUNDING rank interval
    * of the pack within its pack_group; because pack_group = bucket % nGroups
    * interleaves documents, the interval also spans other groups' documents —
    * enumerate a pack's members by filtering the (source, pack_group, bin)
    * triple, e.g. over the persisted [[saveEpochManifest]] doc-level artifact,
    * never by slicing the rank interval alone).
    *
    * The d08 funnel discipline, applied across jobs instead of stages: the corpus'
    * TEXT is tokenized once, and only for ADMITTED documents — the manifest is an
    * id-level relation, the heavy column is read behind an id-equi-join against it,
    * and the packing stage runs entirely on the (manifest ⋈ per-doc price) relation,
    * never the corpus. A document the tokenizer prices at zero symbols (empty text,
    * all-'|' tokens — rows bpeTf drops) still occupies its manifest slot at n_syms
    * = 0: admission is the plan's decision, not the tokenizer's.
    *
    * Scale shape: manifest construction is mixExecute verbatim (bounded KthSmallest
    * admission, |sources|-row budgets broadcast, ONE driver scalar); pricing is the
    * t26 shape (dictionary-sized merge replay of a bounded collected artifact, one
    * tf pass over admitted text); packing is t14's nGroups-split windows over the
    * EPOCH-sized relation (≪ corpus; raise nGroups with epoch size). The manifest
    * is checkpointed once and feeds both the text semi-join and the final pack —
    * the multi-consumer rule.
    */
  def epochPack(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      textCol: String,
      merges: DataFrame,
      alphaMicro: Long = 300000L,
      budgetDocs: Long = 1000L,
      budgetTokens: Long = 512L,
      nGroups: Int = 8,
      salt: String = ""
  ): DataFrame = {
    val manifest = mixExecute(df, idCol, sourceCol, alphaMicro, budgetDocs, salt)
      .localCheckpoint(true)
    val admitted = df.select(col(idCol), col(textCol))
      .join(manifest.select(col(idCol)), Seq(idCol))
    val priced = graft.pipeline.TextStats
      .bpeEncodeWith(admitted, idCol, textCol, merges)
      .select(col(idCol), col("n_syms"))
    val rows = manifest
      .join(priced, Seq(idCol), "left")
      .select(
        col(idCol), col(sourceCol), col("rk"),
        coalesce(col("n_syms"), lit(0L)).as("n_syms"),
        bucketCol(col(idCol), salt).as("bucket"))
      .withColumn("pack_group", col("bucket") % nGroups)
    binPacks(rows, idCol, sourceCol, budgetTokens)
  }

  /** dc11 — the epoch materializer for an UPSAMPLED plan: [[epochPack]] with the
    * dc10 manifest, where a document's token contribution to the running cut is
    * its `repeat_factor · n_syms` (the trainer replays it that many times, so the
    * pack boundaries are denominated in REPLAYED symbols — the mass the plan
    * actually promised). Each pack additionally reports `n_slots`
    * (Σ repeat_factor — how many sequence slots its documents occupy). Identical
    * scale shape to epochPack; per-source Σ over all packs of the replayed
    * symbol mass equals the plan's token mass by dc10's exact-integer law.
    */
  def epochPackUpsampled(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      textCol: String,
      merges: DataFrame,
      alphaMicro: Long = 300000L,
      budgetDocs: Long = 1000L,
      budgetTokens: Long = 512L,
      nGroups: Int = 8,
      salt: String = ""
  ): DataFrame =
    epochPackRollup(
      epochManifestUpsampled(df, idCol, sourceCol, textCol, merges,
        alphaMicro, budgetDocs, budgetTokens, nGroups, salt),
      sourceCol)

  /** dc12 — the DOC-LEVEL epoch manifest: one row per admitted document with its
    * full pack address — (id, source, rk, repeat_factor, n_syms, bucket,
    * pack_group, bin) — the relation a trainer's data loader actually consumes
    * (dc11's per-pack stats are its one-groupBy rollup, [[epochPackRollup]]).
    * `n_syms` is already the REPLAYED mass (repeat_factor · encoded symbols), so
    * slicing any (source, pack_group, bin) yields exactly the documents and
    * token mass that pack promised; enumerate a pack's members by that triple —
    * never by an rk interval, which interleaves across pack_groups.
    *
    * Scale shape: identical to [[epochPackUpsampled]] up to (and excluding) the
    * rollup — the output is epoch-sized (≪ corpus), the pack window partitioned
    * by (source, pack_group) with nGroups the scale knob.
    */
  def epochManifestUpsampled(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      textCol: String,
      merges: DataFrame,
      alphaMicro: Long = 300000L,
      budgetDocs: Long = 1000L,
      budgetTokens: Long = 512L,
      nGroups: Int = 8,
      salt: String = ""
  ): DataFrame =
    epochManifestUpsampledWith(df, idCol, sourceCol, textCol, merges,
      mixPlan(df, sourceCol, alphaMicro, budgetDocs)
        .select(col(sourceCol), col("n_docs"), col("target_docs")),
      budgetTokens, nGroups, salt)

  /** [[epochManifestUpsampled]] over an EXPLICIT budgets relation — the pack
    * chain decoupled from the temperature plan (dc31 feeds DoReMi budgets).
    */
  private[graft] def epochManifestUpsampledWith(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      textCol: String,
      merges: DataFrame,
      planBudgets: DataFrame,
      budgetTokens: Long = 512L,
      nGroups: Int = 8,
      salt: String = ""
  ): DataFrame = {
    val manifest = mixExecuteUpsampledWith(df, idCol, sourceCol, planBudgets, salt)
      .localCheckpoint(true)
    val admitted = df.select(col(idCol), col(textCol))
      .join(manifest.select(col(idCol)), Seq(idCol))
    val priced = graft.pipeline.TextStats
      .bpeEncodeWith(admitted, idCol, textCol, merges)
      .select(col(idCol), col("n_syms"))
    val rows = manifest
      .join(priced, Seq(idCol), "left")
      .select(
        col(idCol), col(sourceCol), col("rk"), col("repeat_factor"),
        (coalesce(col("n_syms"), lit(0L)) * col("repeat_factor")).as("n_syms"),
        bucketCol(col(idCol), salt).as("bucket"))
      .withColumn("pack_group", col("bucket") % nGroups)
    packRows(rows, idCol, sourceCol, budgetTokens)
      .select(col(idCol), col(sourceCol), col("rk"), col("repeat_factor"),
        col("n_syms"), col("bucket"), col("pack_group"), col("bin"))
  }

  /** The per-pack rollup of an [[epochManifestUpsampled]] relation — dc11's
    * output, whether the manifest is in-session or reloaded from
    * [[loadEpochManifest]] (the round-trip law dc12 pins: load-then-rollup must
    * hash-match the in-session packs).
    */
  def epochPackRollup(manifest: DataFrame, sourceCol: String): DataFrame =
    manifest
      .groupBy(col(sourceCol), col("pack_group"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_syms")).as("n_tokens"),
        min(col("rk")).as("rk_first"),
        max(col("rk")).as("rk_last"),
        sum(col("repeat_factor")).as("n_slots"))

  /** dc19 — RESUME an epoch from a consumed-bin watermark: the trainer
    * checkpoint-restart job. Each (source, pack_group) shard records the last
    * pack (bin) it fully consumed; resume re-derives, from the SAME manifest
    * the run started from, exactly the remaining packs — per shard the resume
    * bin, bins/docs/tokens/slots left — so a restarted run continues the
    * identical stream with zero re-reads of consumed packs. The watermark here
    * is the pinned mid-run convention (max bin div 2 per shard — "crashed
    * halfway"); production passes the trainer's own checkpoint relation
    * through the same join.
    *
    * A shard whose remainder is EMPTY keeps an explicit row (resume_bin = −1,
    * zeros) — the funnel grid discipline: a restart coordinator diffing shard
    * states must see "done", not a missing key.
    *
    * Scale shape: the watermark is one map-side-combinable agg over the
    * manifest (shard-count-sized result, broadcast back); the remainder filter
    * is the manifest's own partition pruning when reading the
    * [[saveEpochManifest]] artifact — (source, pack_group) are directory keys
    * and bin is range-clustered within files, so a per-shard resume fetch
    * reads one directory and row-group-skips to bin > watermark (the layout
    * was built for exactly this read). dc12 pins load ≡ in-session, so this
    * runs on the in-session manifest and the artifact path inherits the law.
    */
  def epochResume(manifest: DataFrame, sourceCol: String): DataFrame = {
    val wm = manifest
      .groupBy(col(sourceCol), col("pack_group"))
      .agg(expr("max(bin) div 2").cast("long").as("consumed_until"))
      .localCheckpoint(true) // two consumers: the remainder join + the grid
    val rem = manifest.join(wm, Seq(sourceCol, "pack_group"))
      .filter(col("bin") > col("consumed_until"))
    val roll = rem
      .groupBy(col(sourceCol), col("pack_group"))
      .agg(
        min(col("bin")).as("resume_bin"),
        countDistinct(col("bin")).as("n_bins_left"),
        count(lit(1)).as("n_docs"),
        sum(col("n_syms")).as("n_tokens"),
        sum(col("repeat_factor")).as("n_slots"))
    wm.join(roll, Seq(sourceCol, "pack_group"), "left")
      .select(col(sourceCol), col("pack_group"), col("consumed_until"),
        coalesce(col("resume_bin"), lit(-1L)).as("resume_bin"),
        coalesce(col("n_bins_left"), lit(0L)).as("n_bins_left"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_slots"), lit(0L)).as("n_slots"))
  }

  /** Persist a doc-level epoch manifest as the training-run artifact, laid out
    * for how a trainer READS it — the d18/d21 layout discipline applied to the
    * pack address: directory-partitioned by (source, pack_group) (a trainer
    * shard consumes exactly one pack_group's stream, so its fetch plans ONLY
    * that directory's files — measured in RoundThirteenOpsSpec via scan
    * metrics), range-clustered across `nFiles` so each file covers a contiguous
    * bin range, and sorted within files by (bin, bucket, id) so a single-pack
    * fetch row-group-skips inside the directory. Build once per epoch on the
    * plan cadence; every shard reads its slice from the load.
    */
  def saveEpochManifest(
      manifest: DataFrame,
      idCol: String,
      sourceCol: String,
      path: String,
      nFiles: Int = 16
  ): Unit =
    manifest
      .repartitionByRange(math.max(nFiles, 1),
        col(sourceCol), col("pack_group"), col("bin"))
      .sortWithinPartitions(col(sourceCol), col("pack_group"), col("bin"), col("bucket"), col(idCol))
      .write.partitionBy(sourceCol, "pack_group")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  /** Reload a [[saveEpochManifest]] artifact. Ids, ranks, and symbol counts are
    * exact integers — the round trip is bit-exact. The directory-encoded
    * pack_group is cast back to its written LONG type (partition-column
    * inference would otherwise narrow it to int and silently change the rollup
    * schema).
    */
  def loadEpochManifest(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .withColumn("pack_group", col("pack_group").cast("long"))

  /** dc14 — deterministic BETWEEN-EPOCH shuffle of a doc-level pack manifest:
    * epoch `e` reads each (source, pack_group) stream in `md5(doc_id ":" e)`
    * order (doc-id tie-break) and re-cuts the concat-and-cut bins along that
    * order. Membership and replayed-symbol mass are epoch-INVARIANT — only the
    * order, and therefore the bin boundaries, move — which is exactly the
    * shuffle a trainer wants between epochs: no data is rewritten, no state is
    * kept, any shard can address epoch e's packs from the same persisted
    * manifest ([[saveEpochManifest]]) plus the epoch number. Scale shape: one
    * hash column + the same bounded (source, pack_group) window as
    * [[epochPack]]; nGroups remains the parallelism knob.
    *
    * Output: the manifest rows stamped with (epoch, ord, ebin) — `ord` the
    * 1-based position in epoch order, `ebin` the re-cut pack.
    */
  def epochShuffle(
      manifest: DataFrame,
      idCol: String,
      sourceCol: String,
      epoch: Long,
      budgetTokens: Long = 512L
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol), col("pack_group"))
      .orderBy(col("eh"), col(idCol))
    manifest
      .withColumn("eh",
        Sketches.h32(concat(col(idCol).cast("string"), lit(":"), lit(epoch).cast("string"))))
      .withColumn("ord", row_number().over(w))
      .withColumn("tok_before", sum(col("n_syms")).over(w) - col("n_syms"))
      .withColumn("ebin", (col("tok_before") / budgetTokens).cast("long"))
      .withColumn("epoch", lit(epoch))
  }

  /** The dc14 CORRECTNESS surface: [[epochShuffle]] rollups for a set of
    * epochs in one relation — per (epoch, source, pack_group, ebin) the doc
    * count, replayed-symbol total, and an ORDER-SENSITIVE checksum
    * (Σ ord · (h32(doc_id) mod 10⁶), exact integers) that proves the
    * permutation: totals conserve across epochs, checksums differ.
    */
  def epochShuffleRollup(
      manifest: DataFrame,
      idCol: String,
      sourceCol: String,
      epochs: Seq[Long],
      budgetTokens: Long = 512L
  ): DataFrame = {
    require(epochs.nonEmpty, "epochShuffleRollup: empty epoch set")
    val m = manifest.localCheckpoint(true) // one consumer per epoch
    epochs.map { e =>
      epochShuffle(m, idCol, sourceCol, e, budgetTokens)
        .groupBy(col("epoch"), col(sourceCol), col("pack_group"), col("ebin"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_syms")).as("n_tokens"),
          sum(col("ord").cast("long") *
            pmod(Sketches.h32(col(idCol).cast("string")), lit(1000000L)))
            .as("order_check"))
    }.reduce(_ unionByName _)
  }

  /** dc15 — ANNEALED CURRICULUM order: the published end-of-training practice
    * (anneal/decay phases of MiniCPM, OLMo 2, Llama 3: reserve the final
    * stretch of the run for the highest-quality data) derived from the epoch
    * manifest + a per-doc quality relation. The `annealDocs` best documents
    * (quality desc, id asc) form PHASE 1 and are ordered quality-ASCENDING so
    * training finishes at peak quality; everything else is PHASE 0 in the dc14
    * hash-shuffled order. Bins re-cut along each phase's order every
    * `budgetTokens` replayed symbols. Output is the correctness rollup per
    * (phase, source, pack_group, ebin): doc/token totals, the dc14
    * order-sensitive checksum, and the bin's quality range — q_max of anneal
    * bin b never exceeds q_min of bin b+1, the monotone-curriculum proof.
    *
    * `quality` is (id, q_micro) — passed in, not computed here, so a caller
    * can stamp quality in the same scan that prices tokens (the dc09 one-scan
    * discipline) or reuse a trained t39 margin instead of the t02 heuristic;
    * docs missing from it score 0 (coalesce, the left-join convention).
    *
    * Scale shape: the manifest is mix-budget-bounded by construction, so the
    * global anneal rank and the phase-1 global order are windows over a
    * budget-sized relation (never corpus-sized — the same bound dc08's
    * admission documented); phase 0 re-uses the (source, pack_group)-keyed
    * dc14 windows. One localCheckpoint detaches the phase-stamped relation
    * feeding both phase branches.
    */
  def epochAnneal(
      manifest: DataFrame,
      quality: DataFrame,
      idCol: String,
      sourceCol: String,
      annealDocs: Long,
      epoch: Long = 0L,
      budgetTokens: Long = 512L
  ): DataFrame = {
    require(annealDocs > 0, "epochAnneal: annealDocs must be positive")
    // the quality contract is (idCol, q_micro) IN THAT ORDER — a swapped
    // relation would silently anneal on ids, so the shape is enforced
    require(quality.columns.length == 2 && quality.columns.head == idCol,
      s"epochAnneal: quality must be ($idCol, <q_micro>) — got " +
        quality.columns.mkString("(", ", ", ")"))
    val q = quality.select(col(idCol), col(quality.columns(1)).as("q_micro"))
    val wQ = org.apache.spark.sql.expressions.Window
      .orderBy(col("q_micro").desc, col(idCol).asc)
    val staged = manifest
      .join(q, Seq(idCol), "left")
      .withColumn("q_micro", coalesce(col("q_micro"), lit(0L)))
      .withColumn("phase",
        when(row_number().over(wQ) <= annealDocs, 1L).otherwise(0L))
      .localCheckpoint(true) // two consumers: the per-phase order branches
    def cut(rows: DataFrame, order: Seq[Column], perGroup: Boolean): DataFrame = {
      val base = org.apache.spark.sql.expressions.Window
      val w = (if (perGroup) base.partitionBy(col(sourceCol), col("pack_group"))
               else base.partitionBy()).orderBy(order: _*)
      rows
        .withColumn("ord", row_number().over(w).cast("long"))
        .withColumn("tok_before", sum(col("n_syms")).over(w) - col("n_syms"))
        .withColumn("ebin", (col("tok_before") / budgetTokens).cast("long"))
    }
    val main = cut(
      staged.filter(col("phase") === 0L)
        .withColumn("eh", Sketches.h32(
          concat(col(idCol).cast("string"), lit(":"), lit(epoch).cast("string")))),
      Seq(col("eh"), col(idCol)), perGroup = true)
      .drop("eh")
    val anneal = cut(staged.filter(col("phase") === 1L),
      Seq(col("q_micro").asc, col(idCol).asc), perGroup = false)
    main.unionByName(anneal)
      .groupBy(col("phase"), col(sourceCol), col("pack_group"), col("ebin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_syms")).as("n_tokens"),
        sum(col("ord") * pmod(Sketches.h32(col(idCol).cast("string")), lit(1000000L)))
          .as("order_check"),
        min(col("q_micro")).as("q_min"),
        max(col("q_micro")).as("q_max"))
  }

  /** The doc-level half of the concat-and-cut fold: running exclusive token
    * total in (bucket, id) order within (source, pack_group), cut every
    * `budgetTokens` — each manifest row gains its pack's `bin`. This IS the
    * epoch manifest a trainer addresses documents through; [[binPacks]] is its
    * one-groupBy rollup, and [[saveEpochManifest]] persists it.
    */
  private def packRows(
      rows: DataFrame,
      idCol: String,
      sourceCol: String,
      budgetTokens: Long
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol), col("pack_group"))
      .orderBy(col("bucket"), col(idCol))
    rows
      .withColumn("tok_before", sum(col("n_syms")).over(w) - col("n_syms"))
      .withColumn("bin", (col("tok_before") / budgetTokens).cast("long"))
  }

  /** The shared concat-and-cut fold of the dc09/dc11 materializers:
    * [[packRows]]' bin assignment rolled up to one row per pack.
    */
  private def binPacks(
      rows: DataFrame,
      idCol: String,
      sourceCol: String,
      budgetTokens: Long,
      extraAggs: Seq[Column] = Nil
  ): DataFrame =
    packRows(rows, idCol, sourceCol, budgetTokens)
      .groupBy(col(sourceCol), col("pack_group"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        (Seq(
          sum(col("n_syms")).as("n_tokens"),
          min(col("rk")).as("rk_first"),
          max(col("rk")).as("rk_last")) ++ extraAggs): _*)

  /** DSIR importance-resampling scores (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): every document scored by how much more likely
    * its hashed n-gram features are under a TARGET corpus' unigram+bigram bag model
    * than under the full corpus' — score(d) = Σ_f tf_d(f)·[ln p̂_target(f) − ln p̂_all(f)]
    * with add-one smoothing over `buckets` hashed feature slots. High scores mark
    * documents that look like the target domain; sampling ∝ exp(score) is the paper's
    * resampling step (the score, not the sampler, is the data-parallel part).
    *
    * Determinism (the t20/t27 discipline): both log-likelihoods are rounded to integer
    * MICRO-nats per bucket before subtraction, so per-document sums are exact BIGINT
    * arithmetic in any order; the only float per output row is one final division.
    *
    * Scale shape: occurrence-level unigrams+bigrams hash to `buckets` slots (the
    * feature-hashing trick bounds model state at any vocabulary), so the weight table
    * is a ≤`buckets`-row relation built from two map-side-combinable aggs and joined
    * back broadcast-sized; per-doc scoring is one equi-join + one hash-agg. Nothing
    * pairwise, nothing driver-side.
    */
  def dsirScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      targetSource: String,
      buckets: Int = 1024
  ): DataFrame = {
    val fanned = Scans.fanOut(df)
    val grams = fanned
      .select(col(idCol),
        org.apache.spark.sql.graft.PositionedWordShingles.column(col(textCol), 1))
      .select(col(idCol), col("shingle"))
      .unionByName(fanned
        .select(col(idCol),
          org.apache.spark.sql.graft.PositionedWordShingles.column(col(textCol), 2))
        .select(col(idCol), col("shingle")))
    val tf = grams
      .select(col(idCol),
        (conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long") % buckets).as("b"))
      .groupBy(col(idCol), col("b"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // consumers: both corpus models + the per-doc scoring join
    val allCnt = tf.groupBy(col("b")).agg(sum(col("tf")).as("cnt_all"))
    val tgtCnt = tf
      .join(df.filter(col(sourceCol) === targetSource).select(col(idCol)), Seq(idCol))
      .groupBy(col("b")).agg(sum(col("tf")).as("cnt_tgt"))
    val totals = allCnt.agg(sum(col("cnt_all")).as("n_all"))
      .crossJoin(tgtCnt.agg(sum(col("cnt_tgt")).as("n_tgt")))
    // ≤`buckets` rows: smoothed log-ratio weights in integer micro-nats, each ln
    // rounded separately so the oracle reproduces the subtraction exactly
    val weights = allCnt
      .join(tgtCnt, Seq("b"), "left_outer")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        (round(lit(1000000.0) * log((coalesce(col("cnt_tgt"), lit(0L)) + 1).cast("double") /
            (col("n_tgt") + buckets).cast("double")), 0).cast("long") -
          round(lit(1000000.0) * log((col("cnt_all") + 1).cast("double") /
            (col("n_all") + buckets).cast("double")), 0).cast("long")).as("w_micro"))
    // ≤`buckets` rows by construction — broadcast so corpus-side tf never shuffles
    val scored = tf.join(broadcast(weights), Seq("b"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_feats"), sum(col("tf") * col("w_micro")).as("score_micro"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("score_micro"), lit(0L)).as("score_micro"),
        when(coalesce(col("n_feats"), lit(0L)) === 0L, lit(0.0))
          .otherwise(round(col("score_micro").cast("double") /
            (col("n_feats") * lit(1000000L)).cast("double"), 6))
          .as("avg_log_ratio"))
  }

  /** dc23 — WEIGHTED sampling without replacement (Efraimidis–Spirakis A-ES,
    * 2006): per source, the k documents with the largest priority u^(1/w), where
    * u is a deterministic md5-derived uniform and w the document's weight — the
    * exact distributed analogue of the weighted reservoir every curation pipeline
    * reaches for ("sample k docs per source ∝ token mass / quality score") and the
    * weighted generalization of [[sourceCap]]'s uniform cap. Because u is a pure
    * function of (salt, id), the sample is reproducible across engines, runs, and
    * cluster sizes, and different salts give independent draws of the same design.
    *
    * Determinism (the ev25 per-row-ln discipline): rank by u^(1/w) ⇔ rank by
    * ln(u)/w, so each row contributes `lnu_micro = ⌊10⁶·ln((h+1)/2⁶⁰) + ½⌋` — ONE
    * ln on the identical exact-rational double (h is the 60-bit md5 prefix, the
    * [[bucketCol]] hash un-moduloed) — then the priority is quantized once more,
    * `key_nano = ⌊10⁹·lnu_micro/w + ½⌋`: rounding can only create TIES, never
    * reorder, and ties break on id — so the selected set is bit-stable.
    *
    * Scale shape: the t09/[[sourceCap]] lesson — NO global or per-source full
    * window. The per-source kth priority is one [[KthSmallest]] hash-agg
    * (map-side-combinable, catalog-sized result, broadcast back); only the ≤k
    * survivors per source enter the rank window. One corpus pass end to end.
    */
  /** The dc23 priority as a plain JVM scalar — the ONE non-column rendition,
    * consumed by the streaming reservoir twin ([[graft.streaming.StreamOps]]
    * streamingWeightedSample) so batch and stream share the identical key;
    * RoundFifteenOpsSpec's sequential mirror pins it against the column form.
    * Callers pass a reusable MessageDigest (the streamingDedup per-partition
    * discipline — no per-row JCA lookup).
    */
  private[graft] def aesKeyNano(
      id: Long, weight: Long, salt: String, md: java.security.MessageDigest): Long = {
    md.reset()
    val hex = md.digest((salt + id.toString).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    val h = java.lang.Long.parseLong(hex, 16)
    val lnuMicro =
      math.floor(1000000.0 * math.log((h + 1).toDouble / 1152921504606846976.0) + 0.5).toLong
    math.floor(1000000000.0 * lnuMicro.toDouble / weight.toDouble + 0.5).toLong
  }

  def weightedSample(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      weightCol: String,
      k: Int,
      salt: String = ""
  ): DataFrame = {
    require(k >= 1, s"weightedSample: k must be >= 1, got $k")
    val h = conv(substring(md5(concat(lit(salt), col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("long")
    val rows = df
      .filter(col(weightCol) > 0) // zero/negative mass cannot be drawn
      .select(col(idCol), col(sourceCol), col(weightCol).cast("long").as("weight"))
      .withColumn("lnu_micro",
        floor(lit(1000000.0) *
          log((h + lit(1L)).cast("double") / lit(1152921504606846976.0)) + lit(0.5))
          .cast("long"))
      .withColumn("key_nano",
        floor(lit(1000000000.0) * col("lnu_micro").cast("double") / col("weight").cast("double")
          + lit(0.5)).cast("long"))
    val thresholds = rows
      .groupBy(col(sourceCol))
      .agg(org.apache.spark.sql.graft.KthSmallest
        .column(-col("key_nano"), col(idCol), k).as("thr"))
    val kept = rows
      .join(broadcast(thresholds), Seq(sourceCol))
      .filter(
        -col("key_nano") < col("thr.major") ||
          (-col("key_nano") === col("thr.major") && col(idCol) <= col("thr.minor")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(col("key_nano").desc, col(idCol).asc)
    kept
      .withColumn("sel_rank", row_number().over(w))
      .filter(col("sel_rank") <= k) // defensive trim if ids are not unique within a source
      .select(col(sourceCol), col(idCol), col("weight"), col("key_nano"), col("sel_rank"))
  }

  /** dc28 — DEDUP-AWARE temperature mix: the [[temperatureMix]] weights computed
    * over each source's near-dup CLUSTER count instead of its raw document
    * count — the published correction for sources that inflate their sampling
    * share with internal duplication (a mirror-heavy crawl counts its variety
    * once, not once per copy). Per source: raw and effective counts, the
    * duplication inflation (half-up micro of raw/effective), the raw-count
    * sampling probability, the cluster-counted one, and the shift between them —
    * the measured answer to "how much was this source's share riding on dups".
    * A cluster spanning sources counts toward EVERY source holding a member
    * (each source's variety is what it can contribute).
    *
    * Scale shape: the d05 cluster chain (band-bucketed, member-capped, bounded
    * label-prop rounds) is the only corpus-sized work; everything after is a
    * |sources|-row relation with 1-row broadcast totals, the temperatureMix
    * float contract (ONE pow per source, immediately micro-quantized; all
    * normalization in exact integers).
    */
  def dedupAwareMix(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      alphaMicro: Long = 300000L
  ): DataFrame = {
    val alpha = alphaMicro.toDouble / 1000000.0
    val labels = graft.pipeline.Dedup.dedupClusters(df, idCol, textCol)
    val counts = df.select(col(idCol), col(sourceCol))
      .join(labels, Seq(idCol))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("cluster_id")).as("n_eff"))
      .localCheckpoint(true) // catalog-sized; feeds totals + weights
    val totals = counts.agg(sum(col("n_docs")).as("n_total"), sum(col("n_eff")).as("e_total"))
    val weighted = counts
      .crossJoin(broadcast(totals))
      .withColumn("w_raw",
        floor(lit(1000000.0)
          * pow(col("n_docs").cast("double") / col("n_total").cast("double"), alpha)
          + lit(0.5)).cast("long"))
      .withColumn("w_eff",
        floor(lit(1000000.0)
          * pow(col("n_eff").cast("double") / col("e_total").cast("double"), alpha)
          + lit(0.5)).cast("long"))
      .localCheckpoint(true) // catalog-sized; read by the weight totals and the report
    val wt = weighted.agg(sum(col("w_raw")).as("wr_total"), sum(col("w_eff")).as("we_total"))
    weighted
      .crossJoin(broadcast(wt))
      .select(
        col(sourceCol), col("n_docs"), col("n_eff"),
        expr("(2 * 1000000 * n_docs + n_eff) DIV (2 * n_eff)").cast("long")
          .as("dup_inflation_micro"),
        round(col("w_raw").cast("double") / col("wr_total").cast("double"), 6).as("p_raw"),
        round(col("w_eff").cast("double") / col("we_total").cast("double"), 6).as("p_eff"),
        round(col("w_eff").cast("double") / col("we_total").cast("double")
          - col("w_raw").cast("double") / col("wr_total").cast("double"), 6).as("shift"))
  }

  /** dc27 — LENGTH-BUCKETED batching with padding-waste accounting: group
    * documents into power-of-two length buckets (the standard "length-grouped
    * batching" every trainer runs so a 20-token doc never pads to the corpus
    * max), then price exactly how many pad tokens the bucketing saves. Per
    * bucket: doc count, batch count at `batchSize`, real token mass, padded
    * mass (every sequence pads to its bucket width), and the waste share —
    * beside the NAIVE waste the same docs would pay padded to `maxLen`
    * (constant contrast column, the d29 savings-report convention). Documents
    * over `maxLen` truncate to it (their overflow is neither real nor padding —
    * it never enters a batch).
    *
    * Scale shape: one text scan → a |buckets|-row hash aggregate (map-side
    * combinable) + a broadcast 1-row total; no window, no join wider than the
    * 6-row bucket catalog. Batch counts are ⌈n/B⌉ arithmetic, not an
    * assignment pass — the bucket relation IS the batch plan.
    */
  def lengthBucketPlan(
      df: DataFrame,
      idCol: String,
      textCol: String,
      batchSize: Long = 32L,
      maxLen: Long = 512L,
      minBucket: Long = 16L
  ): DataFrame = {
    require(batchSize >= 1 && minBucket >= 1 && maxLen >= minBucket,
      s"lengthBucketPlan: need batchSize/minBucket >= 1 and maxLen >= minBucket")
    val widths = Iterator.iterate(minBucket)(_ * 2L).takeWhile(_ < maxLen).toSeq :+ maxLen
    val trunc = least(TextStats.tokenCount(col(textCol)).cast("long"), lit(maxLen))
    // smallest admitted width ≥ the truncated length — a fixed CASE chain, so
    // both engines bucket identically with no log/pow float arithmetic
    val bucket = widths.init.foldRight(lit(maxLen): Column) { (w, rest) =>
      when(trunc <= w, lit(w)).otherwise(rest)
    }
    val perBucket = Scans.fanOut(df)
      .select(bucket.as("bucket"), trunc.as("n_toks"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("tokens_real"))
    val totals = perBucket.agg(
      sum(col("n_docs")).as("all_docs"), sum(col("tokens_real")).as("all_real"))
    perBucket
      .crossJoin(broadcast(totals))
      .select(
        col("bucket"), col("n_docs"),
        expr(s"(n_docs + $batchSize - 1) DIV $batchSize").cast("long").as("n_batches"),
        col("tokens_real"),
        (col("n_docs") * col("bucket")).as("tokens_padded"),
        floor(lit(1000000.0)
          * (col("n_docs") * col("bucket") - col("tokens_real")).cast("double")
          / (col("n_docs") * col("bucket")).cast("double") + lit(0.5)).cast("long")
          .as("waste_micro"),
        floor(lit(1000000.0)
          * (col("all_docs") * maxLen - col("all_real")).cast("double")
          / (col("all_docs") * maxLen).cast("double") + lit(0.5)).cast("long")
          .as("naive_waste_micro"))
  }

  /** dc29 — LEARNED domain-mix weights: the DoReMi loop (Xie et al. 2023,
    * "DoReMi: Optimizing Data Mixtures Speeds Up Language Model Pretraining")
    * re-expressed over the engine's own measured-loss machinery. Group DRO's
    * exponentiated-gradient ascent reweights domains by their EXCESS LOSS;
    * here the loss oracle is the t45 CCNet reference LM (stupid-backoff
    * bigram NLL in exact micro-nats, [[graft.pipeline.TextStats]]'
    * `ccnetDocScores` — the published proxy/reference pairing collapsed to
    * the reference model the engine already trains), and a round's
    * measurement batch is t43's deterministic hash minibatch (round r reads
    * batch (r−1) mod `nBatches`, so nBatches rounds sweep the corpus once).
    *
    * Per round, per domain: mean NLL over the round's batch slice; EXCESS =
    * its lift over the batch-wide mean, floored at 0 — a domain the
    * reference model already predicts well (duplicated, boilerplate,
    * over-represented text) measures no headroom and its weight FALLS after
    * normalization, exactly DoReMi's published behavior on memorized
    * domains. The EG update multiplies by exp(η·(excess − max excess)): the
    * max-shift keeps every factor in (0, 10⁶] so the integer registers never
    * overflow, and the subsequent normalization cancels the shift. Weights
    * renormalize to Σ ≈ 10⁶ and mix in `smoothMicro` of uniform (DoReMi's
    * (1−c)·α + c·u smoothing — which also keeps every domain revivable: a
    * weight can never hit an absorbing 0). A domain absent from a round's
    * batch measures excess 0 for that round (no evidence, no headroom), the
    * grid discipline keeping its row explicit.
    *
    * Output: the full ROUND TRAJECTORY (the d26 measure-then-actuate
    * receipt) — (round, source, n_batch_docs, mean_nll_micro, excess_micro,
    * factor_micro, w_micro), round 0 carrying the uniform start. Feed the
    * final round's `w_micro` to the dc04/dc08 actuation exactly as
    * temperature weights are fed today.
    *
    * Determinism: NLL sums/means are exact integers (half-up divisions); the
    * only float per round is one exp(), quantized straight back to micro
    * (the t43 sigmoid discipline); normalization and smoothing are exact
    * integer products and divisions — every intermediate bounded: factor ≤
    * 10⁶, w_raw = w·factor ≤ 10¹², 2·10⁶·w_raw ≤ 2·10¹⁸ < 2⁶³.
    *
    * FROZEN-REFERENCE divergence from the paper (deliberate, the r16 verdict
    * item): published DoReMi trains a PROXY model under the evolving mixture
    * and measures each domain's excess against a FIXED reference model —
    * the reference never updates inside the loop; only the proxy does. This
    * engine has no trainable proxy (it is a data engine, not a trainer), so
    * the loop measures excess of the corpus against the fixed t45 reference
    * directly: equivalent to the paper's round 0 gradient repeated over
    * fresh minibatches, i.e. the excess signal never sharpens as a proxy
    * would sharpen it. That is the sound choice here — re-fitting the t45
    * reference per sweep would move the YARDSTICK, not emulate the proxy
    * (the reference would drift toward whatever mixture scored it, which is
    * the instability the paper's fixed reference exists to prevent) — and
    * it keeps every round's measurement oracle-replayable. A trainer that
    * wants the full proxy loop feeds its own per-domain proxy losses in as
    * `mean_nll_micro` and reuses the register arithmetic unchanged.
    *
    * Scale shape: ONE corpus scoring pass (the t45 scorer, checkpointed
    * id-thin with source/batch stamps); per round two map-side-combinable
    * batch aggregates (|sources|-row + 1-row) and |sources|-row register
    * arithmetic — the corpus is never rescanned inside the loop.
    */
  def doremiMixWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      refSource: String,
      rounds: Int = 4,
      nBatches: Int = 4,
      etaMicro: Long = 500000L,
      smoothMicro: Long = 100000L,
      oovLpMicro: Long = -20000000L
  ): DataFrame = {
    require(rounds >= 1, s"doremiMixWeights: rounds must be >= 1, got $rounds")
    require(nBatches >= 1, s"doremiMixWeights: nBatches must be >= 1, got $nBatches")
    require(smoothMicro >= 0L && smoothMicro < 1000000L,
      s"doremiMixWeights: smoothMicro must be in [0, 1e6), got $smoothMicro")
    // eta bounds (r16 advisory): with smoothMicro = 0 a huge eta floors
    // factor_micro to 0 for every non-max-excess domain, and once the
    // max-excess domain's own weight has collapsed, w_tot = 0 turns the
    // normalization DIV into silent NULLs that poison every later round.
    // Published DoReMi runs eta ~ 1; 100 is already far outside the regime.
    require(etaMicro > 0L && etaMicro <= 100000000L,
      s"doremiMixWeights: etaMicro must be in (0, 1e8], got $etaMicro")
    val scored = graft.pipeline.TextStats
      .ccnetDocScores(df, idCol, textCol, sourceCol, refSource, oovLpMicro)
      .select(col(idCol), col("avg_lp_micro"))
    val docs = df.select(col(idCol), col(sourceCol).as("source"))
      .join(scored, Seq(idCol))
      .select(col("source"), (-col("avg_lp_micro")).as("nll_micro"),
        (bucketCol(col(idCol)) % nBatches).as("batch"))
      .localCheckpoint(true) // id-thin; every round reads a batch slice of this
    val cat = docs.select(col("source")).distinct().localCheckpoint(true)
    val kDomains = cat.count() // |sources|-row catalog census, paid once
    require(kDomains > 0, "doremiMixWeights: no scored documents — empty corpus?")
    val uniform = 1000000L / kDomains
    val eta = etaMicro.toDouble / 1000000.0
    var w = cat.withColumn("w_micro", lit(uniform)).localCheckpoint(true)
    var trail = cat.select(lit(0).as("round"), col("source"),
      lit(0L).as("n_batch_docs"), lit(0L).as("mean_nll_micro"),
      lit(0L).as("excess_micro"), lit(1000000L).as("factor_micro"),
      lit(uniform).as("w_micro"))
    for (r <- 1 to rounds) {
      val b = (r - 1) % nBatches
      val batchRows = docs.filter(col("batch") === b)
      val dom = batchRows.groupBy(col("source"))
        .agg(count(lit(1)).as("n_b"), sum(col("nll_micro")).as("s_b"))
        .select(col("source"), col("n_b"),
          expr("(2 * s_b + n_b) DIV (2 * n_b)").cast("long").as("mean_nll_micro"))
      val bMean = batchRows
        .agg(count(lit(1)).as("n_all"), sum(col("nll_micro")).as("s_all"))
        .select(when(col("n_all") === 0L, lit(0L))
          .otherwise(expr("(2 * s_all + n_all) DIV (2 * n_all)").cast("long"))
          .as("batch_mean_micro"))
      val grid = cat.join(dom, Seq("source"), "left")
        .crossJoin(broadcast(bMean))
        .select(col("source"),
          coalesce(col("n_b"), lit(0L)).as("n_batch_docs"),
          coalesce(col("mean_nll_micro"), col("batch_mean_micro")).as("mean_nll_micro"),
          greatest(lit(0L),
            coalesce(col("mean_nll_micro"), col("batch_mean_micro"))
              - col("batch_mean_micro")).as("excess_micro"))
      val mx = grid.agg(max(col("excess_micro")).as("max_excess"))
      val upd = grid.crossJoin(broadcast(mx))
        .withColumn("factor_micro",
          floor(lit(1000000.0) *
            exp(lit(eta) *
              (col("excess_micro") - col("max_excess")).cast("double") / lit(1000000.0))
            + lit(0.5)).cast("long"))
      val raw = w.join(upd, Seq("source"))
        .withColumn("w_raw", col("w_micro") * col("factor_micro"))
      // the zero-mass guard (r16 advisory): if every register collapsed
      // (smoothMicro = 0 + an extreme eta/nll regime the require above does
      // not provably exclude), fail loudly INSIDE the normalization instead
      // of letting a 0-denominator DIV emit NULL weights that silently ride
      // through every remaining round and into doremiMixPlan
      val tot = raw.agg(sum(col("w_raw")).as("w_tot"))
        .select(when(col("w_tot") > 0L, col("w_tot"))
          .otherwise(raise_error(lit(
            s"doremiMixWeights: all domain weights collapsed to 0 at round $r " +
              "(w_tot = 0) — raise smoothMicro or lower etaMicro")))
          .as("w_tot"))
      w = raw.crossJoin(broadcast(tot))
        .select(col("source"), col("n_batch_docs"), col("mean_nll_micro"),
          col("excess_micro"), col("factor_micro"),
          expr(s"(((2 * 1000000 * w_raw + w_tot) DIV (2 * w_tot))" +
            s" * ${1000000L - smoothMicro}L + ${smoothMicro}L * ${uniform}L) DIV 1000000")
            .cast("long").as("w_micro"))
        .localCheckpoint(true) // |sources| rows; next round's register + the trail
      trail = trail.unionByName(w.withColumn("round", lit(r))
        .select(col("round"), col("source"), col("n_batch_docs"),
          col("mean_nll_micro"), col("excess_micro"), col("factor_micro"),
          col("w_micro")))
      w = w.select(col("source"), col("w_micro"))
    }
    trail
  }

  /** dc30 — the dc29 loop ACTUATED (the d26→d28 measure-then-actuate
    * discipline): the FINAL round's learned weights turned into the concrete
    * per-source epoch budgets a curation run executes — exactly [[mixPlan]]'s
    * arithmetic with DoReMi weights in place of temperature weights
    * (`target_docs` = ⌊w·budget / Σw⌋, `prop_docs` the proportional contrast,
    * up/down/hold verdict). Feed the output to [[sourceCap]]/[[hashSplit]] or
    * the [[mixExecute]] admission exactly as a dc04 plan is fed today.
    *
    * Scale shape: the dc29 loop (one corpus scoring pass + |sources|-row
    * rounds) plus one map-side-combinable per-source count and |sources|-row
    * arithmetic with two 1-row broadcast totals.
    */
  def doremiMixPlan(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      refSource: String,
      budgetDocs: Long = 1000L,
      rounds: Int = 4,
      nBatches: Int = 4,
      etaMicro: Long = 500000L,
      smoothMicro: Long = 100000L,
      oovLpMicro: Long = -20000000L
  ): DataFrame = {
    val wFinal = doremiMixWeights(df, idCol, textCol, sourceCol, refSource,
        rounds, nBatches, etaMicro, smoothMicro, oovLpMicro)
      .filter(col("round") === rounds)
      .select(col("source"), col("w_micro"))
      .localCheckpoint(true) // |sources| rows; the total and the plan rows
    val counts = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
      .localCheckpoint(true)
    val wTot = wFinal.agg(sum(col("w_micro")).as("w_tot"))
    val nTot = counts.agg(sum(col("n_docs")).as("n_tot"))
    wFinal.join(counts, Seq("source"))
      .crossJoin(broadcast(wTot))
      .crossJoin(broadcast(nTot))
      .select(col("source"), col("n_docs"), col("w_micro"),
        expr(s"(w_micro * ${budgetDocs}L) DIV w_tot").cast("long").as("target_docs"),
        expr(s"(n_docs * ${budgetDocs}L) DIV n_tot").cast("long").as("prop_docs"))
      .withColumn("verdict",
        when(col("target_docs") > col("prop_docs"), "upsample")
          .when(col("target_docs") < col("prop_docs"), "downsample")
          .otherwise("hold"))
  }

  /** dc32 — the REPEAT-BUDGET card for data-constrained training (Muennighoff
    * et al. 2023, "Scaling Data-Constrained Language Models"): when the token
    * budget exceeds the corpus' unique mass, the corpus is repeated for
    * multiple epochs, and the paper's central finding is that repeated tokens
    * are worth LESS than fresh ones — near-full value for the first few
    * epochs, decaying toward zero after (~4 epochs of repeats cost almost
    * nothing; ~16+ are worthless). This card prices a (budget, corpus) pair
    * under that law with a per-epoch geometric value decay (`decayMicro` — the
    * dial standing in for the paper's fitted R* half-life):
    *
    *   - corpus-level: epochs = budget / Σ unique tokens (micro), capped at
    *     `maxUsefulEpochs`; verdict `fresh` (budget fits in one pass),
    *     `repeat` (repetition within the useful regime), or
    *     `data_constrained` (the cap binds — `excess_tokens` reports the
    *     budget mass that buys nothing and should fund new data instead);
    *   - per source: raw allocated tokens (unique mass × served epochs) and
    *     EFFECTIVE tokens (Σ_e unique · decay^(e−1), fractional last epoch
    *     pro-rated) — the fresh-data equivalent the budget actually buys —
    *     plus `value_ratio_micro` = effective / raw (equal across sources
    *     under uniform epochs; it becomes the audit column when a caller
    *     feeds weighted per-source epoch counts through the same arithmetic).
    *
    * Determinism: one pow() per epoch index (bounded by `maxUsefulEpochs`),
    * each micro-quantized immediately (the t43 float discipline); everything
    * else exact integer products and half-up divisions.
    *
    * Scale shape: ONE map-side-combinable per-source token rollup; the decay
    * grid is |epochs| literals; the card is |sources| rows with two 1-row
    * totals broadcast in.
    */
  def repeatBudgetCard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      budgetTokens: Long,
      decayMicro: Long = 800000L,
      maxUsefulEpochs: Int = 16
  ): DataFrame =
    repeatBudgetCardFrom(repeatPerSourceRollup(df, textCol, sourceCol),
      budgetTokens, decayMicro, maxUsefulEpochs)

  /** Shared dial validation + micro decay grids of the repeat-budget family
    * (dc32 uniform, dc34 value-weighted): powMicro(j) = ⌊1e6·decay^j⌉ and its
    * exclusive prefix sums. ONE rendition so a bound or rounding fix cannot
    * silently diverge dc34's uniform-contrast column from the real dc32 card.
    */
  private def repeatDecayGrids(
      caller: String,
      budgetTokens: Long,
      decayMicro: Long,
      maxUsefulEpochs: Int
  ): (IndexedSeq[Long], IndexedSeq[Long]) = {
    require(budgetTokens > 0L, s"$caller: budgetTokens must be > 0, got $budgetTokens")
    // 2·10⁶·budget must stay inside int64 for the half-up epoch division —
    // past ~4·10¹² tokens (the largest published pretraining budgets) lift the
    // epoch arithmetic to DecimalType (the s33/t54 documented knob) rather
    // than letting the product wrap
    require(budgetTokens <= 4000000000000L,
      s"$caller: budgetTokens $budgetTokens exceeds the int64-safe 4e12 — " +
        "lift the epoch arithmetic to DecimalType for larger budgets")
    require(decayMicro > 0L && decayMicro <= 1000000L,
      s"$caller: decayMicro must be in (0, 1e6], got $decayMicro")
    require(maxUsefulEpochs >= 1,
      s"$caller: maxUsefulEpochs must be >= 1, got $maxUsefulEpochs")
    val decay = decayMicro.toDouble / 1000000.0
    // decay^j in micro, one pow per epoch index — a bounded literal grid
    val pow = (0 to maxUsefulEpochs)
      .map(j => math.floor(1000000.0 * math.pow(decay, j) + 0.5).toLong)
    (pow, pow.scanLeft(0L)(_ + _))
  }

  /** The one per-source (n_docs, unique_tokens) rollup every repeat card runs
    * (and [[graft.streaming.StreamOps.streamingRepeatRegisters]] mirrors as
    * its two-long state). |sources| rows, checkpointed — totals, slices, and
    * card rows all read it.
    */
  private def repeatPerSourceRollup(
      df: DataFrame, textCol: String, sourceCol: String): DataFrame =
    df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.pipeline.TextStats.tokenCount(col(textCol)).cast("long")).as("unique_tokens"))
      .localCheckpoint(true)

  /** [[repeatBudgetCard]]'s arithmetic over an ALREADY-ROLLED per-source
    * register relation (source, n_docs, unique_tokens) — the split that lets
    * the streaming twin ([[graft.streaming.StreamOps.streamingRepeatRegisters]])
    * price its live registers through the ONE card rendition: the card is a
    * pure |sources|-row function of the registers and the dials, so streamed
    * registers + this function equal the batch card on any prefix exactly.
    */
  def repeatBudgetCardFrom(
      perSource: DataFrame,
      budgetTokens: Long,
      decayMicro: Long = 800000L,
      maxUsefulEpochs: Int = 16
  ): DataFrame = {
    val (powMicro, cumPow) =
      repeatDecayGrids("repeatBudgetCard", budgetTokens, decayMicro, maxUsefulEpochs)
    val tot = perSource.agg(sum(col("unique_tokens")).as("u_tot"))
      .select(when(col("u_tot") > 0L, col("u_tot"))
        .otherwise(raise_error(lit(
          "repeatBudgetCard: corpus has zero unique tokens — nothing to repeat")))
        .as("u_tot"))
    val withEpochs = perSource.crossJoin(broadcast(tot))
      .withColumn("epochs_micro_raw",
        expr(s"(2 * 1000000 * ${budgetTokens}L + u_tot) DIV (2 * u_tot)").cast("long"))
      .withColumn("epochs_micro",
        least(col("epochs_micro_raw"), lit(maxUsefulEpochs * 1000000L)))
    // effective multiplier for e = full + frac/1e6 epochs:
    //   Σ_{j<full} decay^j + frac·decay^full / 1e6   (micro)
    withEpochs
      .withColumn("full_epochs", expr("epochs_micro DIV 1000000").cast("int"))
      .withColumn("frac_micro", expr("epochs_micro % 1000000").cast("long"))
      .withColumn("cum_micro", element_at(typedlit(cumPow), col("full_epochs") + 1))
      .withColumn("pow_micro", element_at(typedlit(powMicro), col("full_epochs") + 1))
      .withColumn("effective_mult_micro",
        expr("cum_micro + (frac_micro * pow_micro) DIV 1000000").cast("long"))
      .select(
        col("source"), col("n_docs"), col("unique_tokens"),
        col("epochs_micro"),
        when(col("epochs_micro_raw") <= 1000000L, lit("fresh"))
          .when(col("epochs_micro_raw") <= maxUsefulEpochs * 1000000L, lit("repeat"))
          .otherwise(lit("data_constrained")).as("verdict"),
        expr("(unique_tokens * epochs_micro) DIV 1000000").cast("long").as("raw_tokens"),
        expr("(unique_tokens * effective_mult_micro) DIV 1000000").cast("long")
          .as("effective_tokens"),
        // a sub-micro-epoch budget reads ratio 0 (no mass served — 0/0 pinned
        // to 0 by the greatest guard, the d25 explicit-zero convention)
        expr("(2 * 1000000 * effective_mult_micro + greatest(epochs_micro, 1))" +
          " DIV (2 * greatest(epochs_micro, 1))").cast("long").as("value_ratio_micro"),
        expr("(unique_tokens * (epochs_micro_raw - epochs_micro)) DIV 1000000")
          .cast("long").as("excess_tokens"))
  }

  /** dc33 — the repeat budget ACTUATED (dc32 → dc33 as dc29 → dc30 → dc31):
    * the card's uniform epoch count becomes per-source document budgets
    * (`target_docs = ⌊n_docs · epochs⌋` — every source repeats equally, the
    * data-constrained training regime the card priced), and the identical
    * dc10/dc11 machinery materializes the epoch: hash-prefix admission, exact
    * integer repeat factors whose per-source sum equals the budget, saved-BPE
    * pricing, replayed-symbol concat-and-cut packs. A budget below one epoch
    * degenerates to a prefix SUBSAMPLE (target < n_docs — the mixExecute
    * behavior), above one to the upsample path with fractional epochs served
    * by the +1-repeat prefix — both exactly the dc10 law, pinned against the
    * dc32-derived targets in RoundSeventeenOpsSpec.
    *
    * Scale shape: dc32's one per-source token rollup, then the dc11 chain
    * unchanged.
    */
  def repeatBudgetEpoch(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      textCol: String,
      merges: DataFrame,
      budgetTokens: Long,
      decayMicro: Long = 800000L,
      maxUsefulEpochs: Int = 16,
      packTokens: Long = 512L,
      nGroups: Int = 8,
      salt: String = ""
  ): DataFrame = {
    val budgets = repeatBudgetCard(df, idCol, textCol, sourceCol,
        budgetTokens, decayMicro, maxUsefulEpochs)
      .select(col("source").as(sourceCol), col("n_docs"),
        expr("(n_docs * epochs_micro) DIV 1000000").cast("long").as("target_docs"))
    epochPackRollup(
      epochManifestUpsampledWith(df, idCol, sourceCol, textCol, merges,
        budgets, packTokens, nGroups, salt),
      sourceCol)
  }

  /** dc34 — VALUE-WEIGHTED repeat allocation: [[repeatBudgetCard]] (dc32)
    * prices a budget under Muennighoff's repeated-data decay with UNIFORM
    * epochs; the paper's data-constrained optimum instead allocates repeats
    * where unique mass has VALUE. This card composes the decay pricing with
    * learned per-source value weights (the dc29 DoReMi loop's final round —
    * the same weights dc31 packs by): the marginal value of source s's
    * (j+1)-th epoch is w_s·decay^j per token at a cost of u_s tokens, and a
    * greedy descending-marginal fill — EXACT for a concave (geometrically
    * decaying) per-source value — spends the budget slice by slice until it
    * is gone, pro-rating the boundary slice as a fractional epoch. A
    * high-value small source therefore earns MORE epochs than a low-value
    * large one (pinned in RoundEighteenOpsSpec on a planted pair), which is
    * precisely the reallocation the uniform dc32 card cannot express; the
    * `uniform_epochs_micro` column carries dc32's allocation as the audit
    * contrast, `verdict` the more/fewer/hold delta per source, and
    * `leftover_tokens` the budget mass even maxUsefulEpochs of everything
    * cannot usefully absorb (fund new data).
    *
    * Determinism: marginal values are exact long products (micro·micro), the
    * fill order a total order (marg desc, source asc, epoch asc), fractions
    * half-up micro divisions, and the effective multiplier reuses dc32's
    * micro-quantized decay grids verbatim.
    *
    * Scale shape: one map-side-combinable per-source token rollup; the slice
    * relation is |sources|·maxUsefulEpochs rows — a driver-bounded PLAN
    * relation, so its single-partition cumulative window is fine at any
    * corpus scale; everything else is |sources|-row arithmetic with two
    * 1-row broadcast totals.
    */
  def valueWeightedRepeatCard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      weights: DataFrame,
      budgetTokens: Long,
      decayMicro: Long = 800000L,
      maxUsefulEpochs: Int = 16
  ): DataFrame =
    valueWeightedRepeatCardFrom(repeatPerSourceRollup(df, textCol, sourceCol),
      weights, budgetTokens, decayMicro, maxUsefulEpochs)

  /** [[valueWeightedRepeatCard]]'s allocation over an ALREADY-ROLLED
    * per-source register relation (source, n_docs, unique_tokens) — the
    * [[repeatBudgetCardFrom]] split applied to the value-weighted card, so
    * the SAME dc32 streaming registers
    * ([[graft.streaming.StreamOps.streamingRepeatRegisters]]) price through
    * the one greedy-fill rendition: streamed registers + learned weights +
    * this function equal the batch dc34 card on any prefix exactly
    * (StreamOpsSpec pins it).
    */
  def valueWeightedRepeatCardFrom(
      perSource: DataFrame,
      weights: DataFrame,
      budgetTokens: Long,
      decayMicro: Long = 800000L,
      maxUsefulEpochs: Int = 16
  ): DataFrame = {
    val (powMicro, cumPow) =
      repeatDecayGrids("valueWeightedRepeatCard", budgetTokens, decayMicro, maxUsefulEpochs)
    // a corpus source the weight relation never learned is a wiring bug (the
    // card would silently allocate it nothing) — fail loudly at the join; so
    // is a MULTI-ROW weight relation (e.g. the raw multi-round dc29 trail
    // without the final-round filter), which would fan every source's slices
    // out once per row and double-charge the budget — fail loudly, not fan
    val oneW = weights.select(col("source"), col("w_micro").cast("long").as("w_micro"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_w"), max(col("w_micro")).as("w_micro"))
      .select(col("source"),
        when(col("n_w") === 1L, col("w_micro"))
          .otherwise(raise_error(concat(
            lit("valueWeightedRepeatCard: source '"), col("source"),
            lit("' has multiple weight rows — pass ONE final-round row per source " +
              "(filter the dc29 trail to its last round)"))))
          .as("w_micro"))
    val ws = perSource
      .join(oneW, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("unique_tokens"),
        when(col("w_micro").isNotNull, col("w_micro"))
          .otherwise(raise_error(concat(
            lit("valueWeightedRepeatCard: source '"), col("source"),
            lit("' has no learned weight — pass the dc29 final round"))))
          .as("w_micro"))
      .localCheckpoint(true)
    // a slice whose micro-quantized marginal value is exactly 0 (deep epochs
    // at a small decay, or a zero weight) buys NOTHING the decay model can
    // price — funding it would spend budget for zero effective mass while
    // leftover_tokens read 0, so zero-value slices never enter the fill and
    // their mass surfaces in leftover_tokens ("fund new data") instead
    val slices = ws.filter(col("unique_tokens") > 0L)
      .select(col("source"), col("unique_tokens"), col("w_micro"),
        posexplode(typedlit(powMicro.take(maxUsefulEpochs))).as(Seq("j", "p")))
      .withColumn("marg", col("w_micro") * col("p")) // exact pico units
      .filter(col("marg") > 0L)
    // |sources|·maxUsefulEpochs rows — plan-sized, see the scale note above
    val wOrd = Window.orderBy(col("marg").desc, col("source").asc, col("j").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val oc = slices.withColumn("cum", sum(col("unique_tokens")).over(wOrd))
    val b = budgetTokens
    val alloc = oc.groupBy(col("source")).agg(
      (lit(1000000L) * count(when(col("cum") <= b, lit(1))) +
        coalesce(max(when(col("cum") > b && (col("cum") - col("unique_tokens")) < b,
          expr(s"(2 * 1000000 * (${b}L - (cum - unique_tokens)) + unique_tokens)" +
            " DIV (2 * unique_tokens)"))), lit(0L))).cast("long").as("epochs_micro"))
    val tot = perSource.agg(sum(col("unique_tokens")).as("u_tot"))
      .select(when(col("u_tot") > 0L, col("u_tot"))
        .otherwise(raise_error(lit(
          "valueWeightedRepeatCard: corpus has zero unique tokens — nothing to repeat")))
        .as("u_tot"))
    val slTot = slices.agg(coalesce(sum(col("unique_tokens")), lit(0L)).as("slice_cost_tot"))
    ws.join(alloc, Seq("source"), "left")
      .withColumn("epochs_micro", coalesce(col("epochs_micro"), lit(0L)))
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(slTot))
      .withColumn("full_epochs", expr("epochs_micro DIV 1000000").cast("int"))
      .withColumn("frac_micro", expr("epochs_micro % 1000000").cast("long"))
      .withColumn("cum_micro", element_at(typedlit(cumPow), col("full_epochs") + 1))
      .withColumn("pow_micro", element_at(typedlit(powMicro), col("full_epochs") + 1))
      .withColumn("effective_mult_micro",
        expr("cum_micro + (frac_micro * pow_micro) DIV 1000000").cast("long"))
      .withColumn("uniform_epochs_micro",
        least(expr(s"(2 * 1000000 * ${b}L + u_tot) DIV (2 * u_tot)"),
          lit(maxUsefulEpochs * 1000000L)).cast("long"))
      .select(
        col("source"), col("n_docs"), col("unique_tokens"), col("w_micro"),
        col("epochs_micro"),
        expr("(unique_tokens * epochs_micro) DIV 1000000").cast("long").as("raw_tokens"),
        expr("(unique_tokens * effective_mult_micro) DIV 1000000").cast("long")
          .as("effective_tokens"),
        col("uniform_epochs_micro"),
        when(col("epochs_micro") > col("uniform_epochs_micro"), lit("more_epochs"))
          .when(col("epochs_micro") < col("uniform_epochs_micro"), lit("fewer_epochs"))
          .otherwise(lit("hold")).as("verdict"),
        greatest(lit(0L), lit(b) - col("slice_cost_tot")).cast("long").as("leftover_tokens"))
  }

  /** dc35 — the value-weighted repeat budget ACTUATED (dc34 → dc35 exactly as
    * dc32 → dc33): the card's PER-SOURCE epoch counts become per-source doc
    * budgets (`target_docs = ⌊n_docs · epochs_s⌋`, the dc10 law) and the
    * identical dc11 machinery materializes the epoch — hash-prefix admission,
    * exact integer repeat factors, saved-BPE pricing, replayed-symbol
    * concat-and-cut packs. Slot conservation holds per source against the
    * JOINT plan (weights × decay × budget): Σ n_slots over all packs equals
    * the card-derived target_docs, pinned in RoundEighteenOpsSpec.
    *
    * Scale shape: the dc29 scoring pass + dc34's plan-sized allocation, then
    * the dc11 chain unchanged.
    */
  def valueWeightedRepeatEpoch(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      textCol: String,
      merges: DataFrame,
      weights: DataFrame,
      budgetTokens: Long,
      decayMicro: Long = 800000L,
      maxUsefulEpochs: Int = 16,
      packTokens: Long = 512L,
      nGroups: Int = 8,
      salt: String = ""
  ): DataFrame = {
    val budgets = valueWeightedRepeatCard(df, idCol, textCol, sourceCol, weights,
        budgetTokens, decayMicro, maxUsefulEpochs)
      .select(col("source").as(sourceCol), col("n_docs"),
        expr("(n_docs * epochs_micro) DIV 1000000").cast("long").as("target_docs"))
    epochPackRollup(
      epochManifestUpsampledWith(df, idCol, sourceCol, textCol, merges,
        budgets, packTokens, nGroups, salt),
      sourceCol)
  }

  /** dc31 — the DoReMi-weighted EPOCH, end-to-end: [[doremiMixPlan]]'s learned
    * budgets composed into the dc11-grade pack materializer — admission is the
    * identical bounded-KthSmallest hash-prefix manifest
    * ([[mixExecuteUpsampledWith]]), pricing the identical saved-BPE replay,
    * packing the identical replayed-symbol concat-and-cut — with DoReMi
    * weights in place of temperature weights. Slot conservation holds by the
    * same dc10 exact-integer law: per source, Σ n_slots over all packs equals
    * the dc30 plan's `target_docs` (capped at n_docs only when a source is
    * exhausted — upsampling repeats close the rest), pinned in
    * RoundSeventeenOpsSpec against the plan relation itself.
    *
    * The registry's dc31 entry runs this over the dc13/dc26-hygienic pool
    * (benchmark-decontaminated AND holdout-carved) so the epoch a trainer
    * reads is clean, leak-free, AND learned-mixed — the full published
    * pipeline in one composed job.
    *
    * Scale shape: dc29's one corpus scoring pass + |sources|-row rounds, then
    * the dc11 chain unchanged (one admitted-text tokenize, epoch-sized pack
    * windows with nGroups the knob).
    */
  def epochPackDoremi(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      textCol: String,
      merges: DataFrame,
      refSource: String,
      budgetDocs: Long = 1000L,
      rounds: Int = 4,
      nBatches: Int = 4,
      etaMicro: Long = 500000L,
      smoothMicro: Long = 100000L,
      oovLpMicro: Long = -20000000L,
      budgetTokens: Long = 512L,
      nGroups: Int = 8,
      salt: String = ""
  ): DataFrame =
    epochPackRollup(
      epochManifestUpsampledWith(df, idCol, sourceCol, textCol, merges,
        doremiMixPlan(df, idCol, textCol, sourceCol, refSource, budgetDocs,
          rounds, nBatches, etaMicro, smoothMicro, oovLpMicro)
          .select(col("source").as(sourceCol), col("n_docs"), col("target_docs")),
        budgetTokens, nGroups, salt),
      sourceCol)
}
