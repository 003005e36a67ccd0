package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end curation composition — the funnel a real training-data run reports:
  * how many documents survive each cumulative pipeline stage. Individual stages are
  * the oracle-checked operators ([[TextStats.qualityFilter]], [[Dedup.dedupClusters]]);
  * this composes them the way a production pass chains them, proving the operators
  * stack (shared derivations, id-only semi-joins between stages).
  */
object Curation {

  /** Cumulative funnel: total → quality-kept → near-dup cluster keeper. One row per
    * stage with the surviving document count — ALWAYS three rows (an empty stage
    * reports 0, it does not vanish), and each stage runs over the PREVIOUS stage's
    * survivors the way a chained production pass does: clustering sees only the
    * quality-filtered corpus, so a cluster whose would-be keeper was quality-rejected
    * still keeps its best surviving member.
    *
    * Scale shape: stages exchange only document-id sets (left-semi joins — never the
    * text), and each underlying operator keeps its own bucketed/broadcast plan; the
    * rollup is three scalar aggregates unioned.
    */
  def funnel(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val all = df.select(col(idCol))
    val quality = TextStats.qualityFilter(df, idCol, textCol)
      .filter(col("kept") === 1).select(col(idCol))
    // the survivor id set feeds three consumers (its stage count, the filtered-corpus
    // derivation, the final intersection) — materialize the id list once
    val s2 = all.join(quality, Seq(idCol), "left_semi").localCheckpoint(true)
    // materialize the filtered corpus once: dedupClusters' label-propagation rounds
    // re-evaluate their base relation per round, which would otherwise re-run the
    // scan + quality scoring each time
    val qualityDocs = df.join(s2, Seq(idCol), "left_semi").localCheckpoint(true)
    val keepers = Dedup.dedupClusters(qualityDocs, idCol, textCol)
      .filter(col("cluster_id") === col(idCol)).select(col(idCol))
    val s3 = s2.join(keepers, Seq(idCol), "left_semi")
    def stage(name: String, ids: DataFrame): DataFrame =
      ids.agg(count(lit(1)).as("n_docs")).select(lit(name).as("stage"), col("n_docs"))
    stage("00_total", all)
      .unionByName(stage("01_quality", s2))
      .unionByName(stage("02_dedup_keeper", s3))
  }

  /** dc16 — the RELEASE funnel: the full modern gate stack composed as one job,
    * reported per (stage, source) — the release card a corpus ships with. Where
    * d08 chains stages over shrinking pools, this is the GATE-MATRIX form every
    * large run actually uses: each gate is evaluated over the FULL corpus
    * exactly once (so gate relations are the oracle-checked operators verbatim,
    * shareable and cacheable across candidate releases), and stages are
    * cumulative id-set intersections:
    *
    *   - 00_total — corpus census
    *   - 01_train_split — the eval split (`id % benchmarkMod == 0`) withheld
    *   - 02_gopher — both published Gopher batteries pass ([[TextStats.gopherGate]])
    *   - 03_exact_keeper — the d01 exact-duplicate keeper (min id per text
    *     hash; the near-dup d05 clusters stay a SEPARATE gate by design — their
    *     pinned LSH is deliberately aggressive and on this synthetic corpus
    *     collapses nearly everything into one cluster, which would starve every
    *     later gate of evidence)
    *   - 04_ngram_clean — no verbatim benchmark n-gram overlap (d19 gate)
    *   - 05_semantic_clean — no embedding-space benchmark proximity (d24 gate,
    *     vectors keyed by the same document ids)
    *
    * Scale shape: one checkpointed (id, source, text) projection feeds every
    * text gate; each stage is an id-keyed semi-/anti-join between a survivor
    * set and a gate relation; counts are map-side-combinable per-source aggs
    * reported over the full stage × source grid (a zeroed source keeps an
    * explicit 0 row). Every row of the report is attributable: a per-source
    * drop between stages k and k+1 names the responsible gate.
    */
  def releaseFunnel(
      docs: DataFrame,
      embeddings: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      vecIdCol: String,
      vecCol: String,
      benchmarkMod: Long = 10L,
      shingleSize: Int = 5,
      semanticThresholdMicro: Long = 400000L,
      requiredWords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"),
      minRequiredHits: Int = 2
  ): DataFrame = {
    val stages = releaseStageSets(docs, embeddings, idCol, textCol, sourceCol,
      vecIdCol, vecCol, benchmarkMod, shingleSize, semanticThresholdMicro,
      requiredWords, minRequiredHits)
    // report over the FULL stage × source grid: a source whose survivors hit
    // zero keeps an explicit 0 row (groupBy alone would drop the group and a
    // reader diffing per-source counts would hit missing keys, not zeros)
    val sources = stages.head._2.select(col(sourceCol).as("source")).distinct()
      .localCheckpoint(true) // one consumer per stage
    def stage(name: String, ids: DataFrame): DataFrame =
      sources
        .join(ids.groupBy(col(sourceCol).as("source")).agg(count(lit(1)).as("cnt")),
          Seq("source"), "left")
        .select(lit(name).as("stage"), col("source"),
          coalesce(col("cnt"), lit(0L)).as("n_docs"))
    stages.map { case (n, ids) => stage(n, ids) }.reduce(_ unionByName _)
  }

  /** The six cumulative release gate sets of [[releaseFunnel]] as named
    * (id, source) relations — shared with [[releaseAdmitted]] so the persisted
    * artifact and the report derive from the identical chain.
    */
  private def releaseStageSets(
      docs: DataFrame,
      embeddings: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      vecIdCol: String,
      vecCol: String,
      benchmarkMod: Long,
      shingleSize: Int,
      semanticThresholdMicro: Long,
      requiredWords: Seq[String],
      minRequiredHits: Int
  ): Seq[(String, DataFrame)] = {
    val base = docs.select(col(idCol), col(sourceCol), col(textCol)).localCheckpoint(true)
    val s0 = base.select(col(idCol), col(sourceCol))
    val s1 = s0.filter(col(idCol) % benchmarkMod =!= 0)
    // r18: the five gate RELATIONS are independent functions of the shared
    // checkpoint (the stage sets below are just id-set intersections of them)
    // — materialize each gate in its own thread (the s45 Par shape) so their
    // jobs overlap instead of serializing on the driver. Both Gopher
    // batteries run off the SHARED checkpoint (not via gopherGate, whose own
    // internal checkpoint would materialize the corpus text a second time).
    val Seq(gq, gr, keepers, ngramContam, semContam) = Par.seq(Seq(
      () => TextStats.gopherQuality(base, idCol, textCol,
          requiredWords = requiredWords, minRequiredHits = minRequiredHits)
        .filter(col("reasons") === 0L).select(col(idCol))
        .localCheckpoint(true),
      () => TextStats.gopherRepetition(base, idCol, textCol)
        .filter(col("reasons") === 0L).select(col(idCol))
        .localCheckpoint(true),
      () => Dedup.exact(base, idCol, textCol).select(col("keep_id").as(idCol))
        .localCheckpoint(true),
      () => Dedup.benchmarkDecontaminate(base, idCol, textCol,
          benchmarkMod, shingleSize).select(col(idCol))
        .localCheckpoint(true),
      () => Similarity.semanticDecontaminate(embeddings, vecIdCol, vecCol,
          benchmarkMod, semanticThresholdMicro)
        .filter(col("contaminated") === 1)
        .select(col("vec_id").as(idCol))
        .localCheckpoint(true)))
    val s2 = s1.join(gq, Seq(idCol), "left_semi")
      .join(gr, Seq(idCol), "left_semi").localCheckpoint(true)
    val s3 = s2.join(keepers, Seq(idCol), "left_semi").localCheckpoint(true)
    val s4 = s3.join(ngramContam, Seq(idCol), "left_anti").localCheckpoint(true)
    val s5 = s4.join(semContam, Seq(idCol), "left_anti")
    Seq("00_total" -> s0, "01_train_split" -> s1, "02_gopher" -> s2,
      "03_exact_keeper" -> s3, "04_ngram_clean" -> s4, "05_semantic_clean" -> s5)
  }

  /** The RELEASE itself — the final gate set of [[releaseFunnel]] as the
    * (id, source) relation a training run reads. Derives from the identical
    * stage chain as the report, so the card and the corpus can never disagree.
    */
  def releaseAdmitted(
      docs: DataFrame,
      embeddings: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      vecIdCol: String,
      vecCol: String,
      benchmarkMod: Long = 10L,
      shingleSize: Int = 5,
      semanticThresholdMicro: Long = 400000L,
      requiredWords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"),
      minRequiredHits: Int = 2
  ): DataFrame =
    releaseStageSets(docs, embeddings, idCol, textCol, sourceCol, vecIdCol, vecCol,
      benchmarkMod, shingleSize, semanticThresholdMicro, requiredWords,
      minRequiredHits).last._2

  /** dc17 — persist the release (the d18/s27/dc12 artifact discipline):
    * source-partitioned directories, id-range-sorted files within each, so a
    * per-source slice fetch prunes to its directory and an id membership probe
    * ("is doc X in release R?") row-group-skips. Every downstream job — the
    * epoch materializer, the trainer's shard fetch, an audit — reads THIS
    * artifact instead of re-running the gates.
    */
  def saveRelease(
      admitted: DataFrame,
      idCol: String,
      sourceCol: String,
      path: String,
      nFiles: Int = 16
  ): Unit = {
    // a zero-row release writes no part files and no partition dirs — the
    // artifact would be unreadable (schema inference fails on load). An empty
    // release is a gate misconfiguration; fail loudly, the house discipline.
    require(!admitted.isEmpty,
      "saveRelease: empty release — every document was gated out (misconfigured gates?)")
    admitted
      .repartitionByRange(math.max(nFiles, 1), col(sourceCol), col(idCol))
      .sortWithinPartitions(col(sourceCol), col(idCol))
      .write.partitionBy(sourceCol)
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
  }

  /** Reload a [[saveRelease]] artifact — ids are exact integers, the round trip
    * is bit-exact; `sourceCol` comes back from the directory encoding and is
    * re-typed to STRING (partition-column type inference would re-type a
    * numeric-looking source and change the census schema — the dc12
    * pack_group cast discipline). Caveat, documented: two sources whose
    * directory encodings collide under numeric parsing (e.g. "2021" and
    * "02021") are not distinguishable after the directory round trip; source
    * labels are names, not numbers.
    */
  def loadRelease(spark: org.apache.spark.sql.SparkSession, path: String,
      sourceCol: String = "source"): DataFrame =
    spark.read.parquet(path)
      .withColumn(sourceCol, col(sourceCol).cast("string"))

  /** The dc17 CORRECTNESS surface: the loaded artifact's per-source census —
    * doc count plus an order-free integer id checksum (Σ h32(id) mod 10⁶, the
    * dc14 discipline) — which must equal the census of the in-session admitted
    * relation (the save → load round trip is invisible). Sources zeroed by the
    * gates have no directory, so the census reports sources PRESENT in the
    * release — the artifact's honest content (the explicit-zero convention
    * belongs to the report, [[releaseFunnel]], not the corpus).
    */
  def releaseCensus(admitted: DataFrame, idCol: String, sourceCol: String): DataFrame =
    admitted
      .groupBy(col(sourceCol).as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(pmod(Sketches.h32(col(idCol).cast("string")), lit(1000000L))).as("id_check"))

  /** The two admitted sets of a release diff derived with every
    * config-INVARIANT kernel computed ONCE: the train split, the Gopher
    * repetition battery, the exact keepers, and the d19 n-gram gate are
    * identical under both configurations, the quality battery differs only in
    * its required-hits floor (so it runs once with the hits rule disarmed and
    * each config filters the SAME `req_hits` column), and the semantic gate
    * differs only in its threshold (so the expensive nearest-benchmark argmax
    * runs once and each config cuts the SAME `max_cos_micro`). Halves dc18's
    * cost versus two full [[releaseAdmitted]] chains while producing
    * set-identical outputs — the oracle mirrors the two FULL chains, so the
    * sharing is hash-proven equivalent, and RoundFourteenOpsSpec pins it
    * against the unshared derivation directly.
    */
  def releaseDiffAdmitted(
      docs: DataFrame,
      embeddings: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      vecIdCol: String,
      vecCol: String,
      benchmarkMod: Long,
      shingleSize: Int,
      requiredWords: Seq[String],
      oldSemanticMicro: Long,
      oldMinHits: Int,
      newSemanticMicro: Long,
      newMinHits: Int
  ): (DataFrame, DataFrame) = {
    val base = docs.select(col(idCol), col(sourceCol), col(textCol)).localCheckpoint(true)
    val s1 = base.select(col(idCol), col(sourceCol))
      .filter(col(idCol) % benchmarkMod =!= 0)
    // minRequiredHits = 0 disarms the hits bit (req_hits < 0 never fires), so
    // reasons carries only the config-invariant rules. The five gates are
    // independent off the shared checkpoint — overlapped (the s45 Par shape).
    val Seq(gq, gr, keepers, ncon, sem) = Par.seq(Seq(
      () => TextStats.gopherQuality(base, idCol, textCol,
          requiredWords = requiredWords, minRequiredHits = 0)
        .select(col(idCol), col("reasons"), col("req_hits"))
        .localCheckpoint(true),
      () => TextStats.gopherRepetition(base, idCol, textCol)
        .filter(col("reasons") === 0L).select(col(idCol)).localCheckpoint(true),
      () => Dedup.exact(base, idCol, textCol)
        .select(col("keep_id").as(idCol)).localCheckpoint(true),
      () => Dedup.benchmarkDecontaminate(base, idCol, textCol,
          benchmarkMod, shingleSize)
        .select(col(idCol)).localCheckpoint(true),
      // threshold 0 is ignored — only the per-vector argmax is kept
      () => Similarity.semanticDecontaminate(embeddings, vecIdCol, vecCol,
          benchmarkMod, thresholdMicro = 0L)
        .select(col("vec_id").as(idCol), col("max_cos_micro"))
        .localCheckpoint(true)))
    def admitted(minHits: Int, semMicro: Long): DataFrame =
      s1
        .join(gq.filter(col("reasons") === 0L && col("req_hits") >= minHits)
          .select(col(idCol)), Seq(idCol), "left_semi")
        .join(gr, Seq(idCol), "left_semi")
        .join(keepers, Seq(idCol), "left_semi")
        .join(ncon, Seq(idCol), "left_anti")
        .join(sem.filter(col("max_cos_micro") >= semMicro).select(col(idCol)),
          Seq(idCol), "left_anti")
    (admitted(oldMinHits, oldSemanticMicro), admitted(newMinHits, newSemanticMicro))
  }

  /** dc18 — the DIFF between two releases: per (source, status ∈ retained /
    * removed / added) document counts plus the order-free id checksum of
    * [[releaseCensus]], reported over the FULL source × status grid (explicit
    * zeros — the funnel discipline; a release manager diffing two cards must
    * see "nothing added from source X", not a missing key). This is the
    * data-release changelog: before a new gate configuration ships, the diff
    * names exactly which documents the change admits and evicts, per source —
    * the review artifact a 100 TB release swap is judged by.
    *
    * Scale shape: ONE full-outer id-equi-join between two (id, source)
    * relations (both gate outputs — catalog-thin columns, never text), a
    * map-side-combinable rollup to the |sources|·3 matrix, and a broadcast
    * grid join. The old side reads the persisted dc17 artifact; the new side
    * is the candidate gate run.
    */
  def releaseDiff(
      oldRelease: DataFrame,
      newRelease: DataFrame,
      idCol: String,
      sourceCol: String,
      allSources: DataFrame
  ): DataFrame = {
    val o = oldRelease.select(col(idCol).as("id_o"), col(sourceCol).as("source_o"))
    val n = newRelease.select(col(idCol).as("id_n"), col(sourceCol).as("source_n"))
    val statusOf =
      when(col("id_o").isNotNull && col("id_n").isNotNull, "retained")
        .when(col("id_o").isNotNull, "removed")
        .otherwise("added")
    val counts = o.join(n, col("id_o") === col("id_n"), "full_outer")
      .select(
        coalesce(col("source_o"), col("source_n")).as("source"),
        statusOf.as("status"),
        coalesce(col("id_o"), col("id_n")).as("doc_id"))
      .groupBy(col("source"), col("status"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(pmod(Sketches.h32(col("doc_id").cast("string")), lit(1000000L))).as("id_check"))
    val grid = allSources.select(col(sourceCol).as("source")).distinct()
      .select(col("source"),
        explode(array(lit("retained"), lit("removed"), lit("added"))).as("status"))
    grid.join(counts, Seq("source", "status"), "left")
      .select(col("source"), col("status"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("id_check"), lit(0L)).as("id_check"))
  }

  /** dc22 — GATE ABLATION: order-free attribution of the release gates. The
    * dc16 funnel is CUMULATIVE — a document that fails two gates is charged to
    * whichever stage runs first — so a gate owner cannot read "what would
    * re-enter if MY gate were dropped" from it. This report answers exactly
    * that: per gate over the train-split universe, the total failing count and
    * the UNIQUE count (documents ONLY that gate removes — the set that
    * re-enters if the gate is ablated), plus the id checksum of the unique
    * set. Σ unique ≤ total removed, and the gap is the multi-gate overlap —
    * the ablation calculus every curation post-mortem runs.
    *
    * Scale shape: each expensive gate battery (the full-threshold Gopher
    * battery, the real-threshold semantic decontamination) is computed ONCE
    * within this report and checkpointed — no battery runs per-gate;
    * uniqueness is one anti-join per gate against the union of the other
    * four (id-thin relations); the report is |gates| rows.
    */
  def gateAblation(
      docs: DataFrame,
      embeddings: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      vecIdCol: String,
      vecCol: String,
      benchmarkMod: Long = 10L,
      shingleSize: Int = 5,
      semanticThresholdMicro: Long = 400000L,
      requiredWords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"),
      minRequiredHits: Int = 2
  ): DataFrame = {
    val base = docs.select(col(idCol), col(sourceCol), col(textCol)).localCheckpoint(true)
    val s1 = base.select(col(idCol)).filter(col(idCol) % benchmarkMod =!= 0)
      .localCheckpoint(true) // the universe every fail set intersects
    def failing(passIds: DataFrame): DataFrame =
      s1.join(passIds, Seq(idCol), "left_anti")
    val fQuality = failing(
      TextStats.gopherQuality(base, idCol, textCol,
          requiredWords = requiredWords, minRequiredHits = minRequiredHits)
        .filter(col("reasons") === 0L).select(col(idCol)))
      .localCheckpoint(true)
    val fRepetition = failing(
      TextStats.gopherRepetition(base, idCol, textCol)
        .filter(col("reasons") === 0L).select(col(idCol)))
      .localCheckpoint(true)
    val fKeeper = failing(
      Dedup.exact(base, idCol, textCol).select(col("keep_id").as(idCol)))
      .localCheckpoint(true)
    val fNgram = s1.join(
        Dedup.benchmarkDecontaminate(base, idCol, textCol, benchmarkMod, shingleSize)
          .select(col(idCol)), Seq(idCol), "left_semi")
      .localCheckpoint(true)
    val fSemantic = s1.join(
        Similarity.semanticDecontaminate(embeddings, vecIdCol, vecCol,
            benchmarkMod, semanticThresholdMicro)
          .filter(col("contaminated") === 1)
          .select(col("vec_id").as(idCol)), Seq(idCol), "left_semi")
      .localCheckpoint(true)
    val gates = Seq(
      "gopher_quality" -> fQuality, "gopher_repetition" -> fRepetition,
      "exact_keeper" -> fKeeper, "ngram_decontam" -> fNgram,
      "semantic_decontam" -> fSemantic)
    gates.map { case (name, f) =>
      val others = gates.collect { case (n, o) if n != name => o }
        .reduce(_ unionByName _)
      val unique = f.join(others, Seq(idCol), "left_anti")
      f.agg(count(lit(1)).as("n_failing"))
        .crossJoin(unique.agg(
          count(lit(1)).as("n_unique"),
          coalesce(sum(pmod(Sketches.h32(col(idCol).cast("string")), lit(1000000L))),
            lit(0L)).as("unique_id_check")))
        .select(lit(name).as("gate"), col("n_failing"), col("n_unique"),
          col("unique_id_check"))
    }.reduce(_ unionByName _)
  }

  /** dc21 — the RELEASE CARD: the per-source datasheet row a data release
    * ships with (the "Datasheets for Datasets" practice): for every source in
    * the RAW corpus — explicit zero rows for sources the gates emptied, the
    * funnel grid discipline — the admitted doc count, retention against the
    * raw corpus, admitted token count and corpus token share, mean t02 quality
    * and mean document length. Columns that are gate INVARIANTS (exact-dup
    * rate, gopher pass rate — identically 0%/100% on the admitted set by
    * construction) are deliberately absent: a card reports what varies.
    *
    * Determinism: per-doc tokens and quality are the pinned integer/micro
    * kernels; every mean/share/retention is ONE half-up integer division of
    * exact BIGINT sums.
    *
    * Scale shape: one text-bearing scan computes per-doc (tokens, quality);
    * admission arrives by id-equi-join from the gate output (catalog-thin);
    * then one map-side-combinable groupBy(source) each for raw and admitted,
    * a 1-row broadcast total for the share, and the broadcast grid join.
    */
  def releaseCard(
      docs: DataFrame,
      admitted: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String
  ): DataFrame = {
    val perDoc = docs.select(
        col(idCol), col(sourceCol),
        TextStats.qualityMicro(col(textCol)).as("q_micro"),
        TextStats.tokenCount(col(textCol)).as("n_toks"))
      .localCheckpoint(true) // raw rollup + admitted join off one text scan
    val raw = perDoc.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_raw_docs"))
    val adm = perDoc
      .join(admitted.select(col(idCol)), Seq(idCol), "left_semi")
      .groupBy(col(sourceCol).as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("q_micro")).as("sum_q"))
    val tot = adm.agg(sum(col("n_tokens")).as("tok_total"))
    raw
      .join(adm, Seq("source"), "left")
      .crossJoin(broadcast(tot))
      .select(
        col("source"),
        col("n_raw_docs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        expr("(2 * 1000000 * coalesce(n_docs, 0) + n_raw_docs) DIV (2 * n_raw_docs)")
          .cast("long").as("retention_micro"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        when(coalesce(col("tok_total"), lit(0L)) === 0L, 0L)
          .otherwise(expr(
            "(2 * 1000000 * coalesce(n_tokens, 0) + tok_total) DIV (2 * tok_total)"))
          .cast("long").as("token_share_micro"),
        when(coalesce(col("n_docs"), lit(0L)) === 0L, 0L)
          .otherwise(expr("(2 * coalesce(sum_q, 0) + n_docs) DIV (2 * n_docs)"))
          .cast("long").as("mean_quality_micro"),
        when(coalesce(col("n_docs"), lit(0L)) === 0L, 0L)
          .otherwise(expr(
            "(2 * 1000000 * coalesce(n_tokens, 0) + n_docs) DIV (2 * n_docs)"))
          .cast("long").as("mean_tokens_per_doc_micro"))
  }

  /** dc01 — the per-source triage table a curation run actually reads (the
    * C4/RefinedWeb domain-stats discipline): doc count, token count and corpus
    * token SHARE, near-dup rate (from the d05 clusters: a doc is a dup iff it is
    * a non-keeper member, `cluster_id ≠ doc_id` under the min-id keeper
    * convention), and mean t02 quality — one row per source, everything a
    * "which domains are bloating/polluting the mix" decision needs in one
    * relation.
    *
    * Determinism: every aggregate is an exact-integer SUM (quality is
    * per-row micro-quantized via [[TextStats.qualityMicro]] BEFORE summing);
    * shares/rates/means are single final divisions of exact integers, floor(+0.5)
    * micro-quantized.
    *
    * Scale shape: one map pass computes per-doc tokens + quality (codegen'd
    * occurrence counts, no explode); the dup flag arrives by doc-id equi-join from
    * d05's capped-LSH clusters; then ONE map-side-combinable groupBy(source) and a
    * 1-row broadcast total for the share — the corpus is never rescanned.
    */
  def domainStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 1,
      rounds: Int = 3,
      maxBucketMembers: Long = 10000L
  ): DataFrame = {
    val t = col(textCol)
    val perDoc = Scans.fanOut(df).select(
      col(idCol),
      col(sourceCol).as("source"),
      TextStats.tokenCount(t).cast("long").as("n_toks"),
      TextStats.qualityMicro(t).as("quality_micro"))
    val clusters =
      Dedup.dedupClusters(df, idCol, textCol, shingleSize, bands, rowsPerBand, rounds, maxBucketMembers)
    val bySrc = perDoc.join(clusters, idCol)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(when(col("cluster_id") =!= col(idCol), 1L).otherwise(0L)).as("n_dup_docs"),
        sum(col("quality_micro")).as("q_sum"))
    val tot = bySrc.agg(sum(col("n_tokens")).as("tot_tokens"))
    bySrc.crossJoin(broadcast(tot)).select(
      col("source"), col("n_docs"), col("n_tokens"),
      floor(lit(1000000.0) * col("n_tokens").cast("double") / col("tot_tokens").cast("double")
        + lit(0.5)).cast("long").as("token_share_micro"),
      col("n_dup_docs"),
      floor(lit(1000000.0) * col("n_dup_docs").cast("double") / col("n_docs").cast("double")
        + lit(0.5)).cast("long").as("dup_rate_micro"),
      floor(col("q_sum").cast("double") / col("n_docs").cast("double")
        + lit(0.5)).cast("long").as("mean_quality_micro"))
  }

  /** dc02 — per-source quality cap: keep at most `k` docs per source chosen by
    * QUALITY (micro-quantized t02 score, doc-id tie-break) instead of t09's
    * unbiased hash buckets — "cap the domain, keep its best" rather than "cap the
    * domain, keep a fair sample"; the two compose into the standard budgeted-mix
    * step. Same scale shape as t09: a bounded [[org.apache.spark.sql.graft.KthSmallest]]
    * threshold per source (map-side-combinable, never a data-sized window), the
    * per-source window only over the ≤k admitted rows. Ordering is fully integral
    * (negated micro score, then id), so the selection is deterministic and
    * oracle-mirrorable as a plain DESC window.
    */
  def qualityCap(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      k: Int
  ): DataFrame = {
    val rows = Scans.fanOut(df).select(
      col(idCol), col(sourceCol).as("source"),
      TextStats.qualityMicro(col(textCol)).as("quality_micro"))
    val thresholds = rows
      .groupBy(col("source"))
      .agg(org.apache.spark.sql.graft.KthSmallest
        .column(-col("quality_micro"), col(idCol), k).as("thr"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("quality_micro").desc, col(idCol).asc)
    rows.join(broadcast(thresholds), Seq("source"))
      .filter(
        -col("quality_micro") < col("thr.major") ||
          (-col("quality_micro") === col("thr.major") && col(idCol) <= col("thr.minor")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k) // defensive trim if ids are not unique within a source
      .select(col(idCol), col("source"), col("quality_micro"), col("rk"))
  }

  /** dc24 — per-source TOKEN-BUDGET FILL: the budgeted form of dc02's doc-count
    * cap. Each source's documents are admitted in quality order (micro-quantized
    * t02 score desc, doc-id tie-break) until the source's token budget is
    * exhausted — "spend the budget on the best tokens", the greedy knapsack
    * every mix plan actually executes once targets are fixed in TOKENS rather
    * than documents (dc04 plans the budget; this fills it).
    *
    * Scale shape — the cumulative sum never runs over the full corpus: a
    * map-side-combinable groupBy(source, quality-bucket) computes catalog-sized
    * token masses; a catalog-sized running sum finds each bucket's
    * strictly-above mass; rows join that (broadcast) relation and only rows
    * whose bucket STARTS before budget exhaustion survive as candidates —
    * fully-admitted buckets plus ONE boundary bucket, ≤ budget + one bucket of
    * tokens per source. The per-source ordered window (explicit ROWS frame —
    * the unique (quality, id) key makes RANGE ≡ ROWS, but the frame is pinned
    * anyway) runs over that candidate prefix only, so its state is
    * budget-bounded, not corpus-bounded, at any scale factor. Because the
    * candidate set is exactly a prefix of the global per-source order, the
    * restricted window's cumulative sums and ranks EQUAL the full-corpus
    * window's — the oracle mirrors the plain full window and the hash proves
    * the prefix optimization exact.
    */
  def budgetFill(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      budgetTokens: Long,
      bucketMicro: Long
  ): DataFrame = {
    val rows = Scans.fanOut(df).select(
      col(idCol), col(sourceCol).as("source"),
      TextStats.qualityMicro(col(textCol)).as("quality_micro"),
      TextStats.tokenCount(col(textCol)).cast("long").as("n_toks"))
      .withColumn("qb", expr(s"quality_micro DIV $bucketMicro"))
      .localCheckpoint(true) // one text scan feeds both the mass census and the fill
    val mass = rows.groupBy(col("source"), col("qb")).agg(sum(col("n_toks")).as("m"))
    val wb = Window.partitionBy(col("source")).orderBy(col("qb").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val above = mass
      .withColumn("above", coalesce(sum(col("m")).over(wb), lit(0L)))
      .select(col("source"), col("qb"), col("above"))
    val cands = rows.join(broadcast(above), Seq("source", "qb"))
      .filter(col("above") < budgetTokens)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality_micro").desc, col(idCol).asc)
    cands
      .withColumn("cum_tokens",
        sum(col("n_toks")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("fill_rank", row_number().over(w))
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col(idCol), col("source"), col("quality_micro"), col("n_toks"),
        col("cum_tokens"), col("fill_rank"))
  }

  /** dc25 — QUALITY-STRATIFIED exact holdout split: every (source, quality-bucket)
    * stratum contributes EXACTLY `(n·pct + 50) DIV 100` documents (half-up) to the
    * holdout, chosen deterministically by salted-md5 order — the held-out eval
    * slice every release needs, with the guarantee t07's binomial hash split can't
    * give: no stratum is over- or under-sampled by luck, so per-source/per-quality
    * eval metrics are computed on proportional slices. Re-running with the same
    * salt reproduces the split; changing the salt redraws it.
    *
    * Scale shape — no stratum-wide window: each row's md5 key is coarsened to its
    * first-2-hex-chars bucket `hb` (lexicographic key order ≡ (hb, key) order, so
    * the 256 hb buckets partition each stratum's rank range contiguously); a
    * catalog-sized (stratum × 256) cell census finds each cell's strictly-below
    * count and the stratum quota, broadcast back; a row's stratum rank is then
    * its cell's strictly-below count plus its IN-CELL rank, so the only window
    * partitions by (stratum, hb) — its state is one 256th of a stratum at any
    * corpus size — and one comparison against the quota is the verdict for
    * interior and boundary cells alike. The oracle mirrors the PLAIN per-stratum
    * rank window, proving the cell decomposition exact (the dc24 discipline).
    */
  def stratifiedHoldout(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      holdoutPct: Int,
      bucketMicro: Long,
      salt: String = ""
  ): DataFrame = {
    require(holdoutPct >= 0 && holdoutPct <= 100,
      s"stratifiedHoldout: holdoutPct must be in [0, 100], got $holdoutPct")
    val rows = Scans.fanOut(df).select(
      col(idCol), col(sourceCol).as("source"),
      md5(concat(lit(salt), col(idCol).cast("string"))).as("hkey"),
      TextStats.qualityMicro(col(textCol)).as("quality_micro"))
      .withColumn("qb", expr(s"quality_micro DIV $bucketMicro"))
      .withColumn("hb", conv(substring(col("hkey"), 1, 2), 16, 10).cast("long"))
      .localCheckpoint(true) // one text scan feeds the cell census and the verdict join
    val cells = rows.groupBy(col("source"), col("qb"), col("hb"))
      .agg(count(lit(1)).as("bn"))
      .localCheckpoint(true) // catalog-sized; read by the totals fold and the cumsum
    val totals = cells.groupBy(col("source"), col("qb"))
      .agg(sum(col("bn")).as("n_stratum"))
      .withColumn("quota", expr(s"(n_stratum * $holdoutPct + 50) DIV 100"))
    val wb = Window.partitionBy(col("source"), col("qb")).orderBy(col("hb").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val info = cells
      .withColumn("c_below", coalesce(sum(col("bn")).over(wb), lit(0L)))
      .join(totals, Seq("source", "qb"))
      .select(col("source"), col("qb"), col("hb"), col("bn"), col("c_below"),
        col("n_stratum"), col("quota"))
    val joined = rows.join(broadcast(info), Seq("source", "qb", "hb"))
    // ONE uniform verdict: stratum rank = cell's strictly-below count + in-cell
    // rank, holdout iff it lands under the quota. Interior cells satisfy or fail
    // it wholesale (c_below + bn ≤ quota ⇒ every rank passes; c_below ≥ quota ⇒
    // none does), so no branch split is needed — one corpus pass, one window
    // whose state is a single hb cell (1/256th of a stratum) at any scale
    val wcell = Window.partitionBy(col("source"), col("qb"), col("hb"))
      .orderBy(col("hkey").asc, col(idCol).asc)
    joined
      .withColumn("rnk", row_number().over(wcell))
      .select(
        col(idCol), col("source"), col("qb"), col("n_stratum"), col("quota"),
        when(col("c_below") + col("rnk") <= col("quota"), lit("holdout"))
          .otherwise(lit("train")).as("split"))
  }

  /** dc03 — corpus churn between two snapshots (the g42 churn diff applied to
    * documents): per source, doc counts in the early/late `cutId` windows, the
    * corpus-share each held (micro), the share delta, a status label
    * (appeared / vanished / grew / shrunk / flat — exact integer compares), and
    * t35's vocabulary-KL drift joined on, so "changed its VOLUME" and "changed its
    * GENERATOR" read off one relation: a source can hold share while its language
    * drifts (high KL, flat share) or double its share of an unchanged generator.
    *
    * Scale shape: the count half is ONE map-side-combinable groupBy(source) over
    * (source, early) with a 1-row broadcast total; the KL half is [[TextStats.sourceDrift]]
    * unchanged (per-(source, token) conditional aggregate); the final join is
    * |sources|-sized.
    */
  def corpusChurn(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      cutId: Long
  ): DataFrame = {
    val counts = df
      .select(col(sourceCol).as("source"), (col(idCol) < cutId).as("early"))
      .groupBy(col("source"))
      .agg(
        sum(when(col("early"), 1L).otherwise(0L)).as("docs_early"),
        sum(when(col("early"), 0L).otherwise(1L)).as("docs_late"))
    val tot = counts.agg(
      sum(col("docs_early")).as("tot_early"), sum(col("docs_late")).as("tot_late"))
    def shareMicro(n: Column, tot: Column): Column =
      when(tot === 0L, 0L)
        .otherwise(floor(lit(1000000.0) * n.cast("double") / tot.cast("double") + lit(0.5))
          .cast("long"))
    val shares = counts.crossJoin(broadcast(tot)).select(
      col("source"), col("docs_early"), col("docs_late"),
      shareMicro(col("docs_early"), col("tot_early")).as("share_early_micro"),
      shareMicro(col("docs_late"), col("tot_late")).as("share_late_micro"))
    // |sources|-row output of a big aggregation: broadcast it into the final join
    val drift = broadcast(TextStats.sourceDrift(df, idCol, textCol, sourceCol, cutId)
      .select(col("source"), col("kl_micro_nats")))
    shares
      .withColumn("delta_share_micro", col("share_late_micro") - col("share_early_micro"))
      .withColumn("status",
        when(col("docs_early") === 0L && col("docs_late") > 0L, "appeared")
          .when(col("docs_late") === 0L && col("docs_early") > 0L, "vanished")
          .when(col("share_late_micro") > col("share_early_micro"), "grew")
          .when(col("share_late_micro") < col("share_early_micro"), "shrunk")
          .otherwise("flat"))
      .join(drift, Seq("source"), "left")
  }

  /** dc05 — semantic coverage per source: how much of the corpus's embedding space
    * each source actually occupies. Every vector is assigned to its nearest coarse
    * cell (the d13/s04 deterministic 1-in-`centroidMod` centroid convention —
    * a production run would swap in the s22 trained codebook; the census is
    * identical), then per source: vectors, distinct cells hit, the Shannon entropy
    * of its cell distribution (micro-nats — LOW entropy = a semantically narrow
    * domain even if its token share is large), and the share of its most-populated
    * cell. The triage axis dc01's token counts cannot see: two sources with equal
    * volume can differ 10× in how much of the space they cover.
    *
    * Determinism: each entropy term is micro-quantized per (source, cell) ROW —
    * `floor(1e6 · (n/N) · ln(N/n) + 0.5)` with the ratio parenthesized first, the
    * dc03 KL discipline — then exact-integer summed; cell assignment tie-breaks on
    * (rounded cosine desc, centroid id asc) exactly as d13.
    *
    * Scale shape: centroids broadcast (K ≪ n, the defining IVF property), the
    * argmax window is per-vector (never data-global), and everything after the
    * assignment is map-side-combinable group-bys on |sources|·K-bounded relations.
    */
  def semanticCoverage(
      docs: DataFrame,
      embeddings: DataFrame,
      idCol: String,
      sourceCol: String,
      vecIdCol: String,
      vecCol: String,
      centroidMod: Int = 97
  ): DataFrame = {
    val e = embeddings.select(col(vecIdCol).as("vec_id"), col(vecCol).cast("array<double>").as("v"))
    val cents = broadcast(e.filter(col("vec_id") % centroidMod === 0)
      .select(col("vec_id").as("cid"), col("v").as("cv")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cc").desc, col("cid").asc)
    val cells = e.crossJoin(cents)
      .select(col("vec_id"), col("cid"),
        round(Similarity.cosine(col("v"), col("cv")), 6).as("cc"))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("cid"))
    val src = docs.select(col(idCol).as("vec_id"), col(sourceCol).as("source"))
    // the |sources|·K census feeds three consumers (per-source totals, the entropy
    // terms, the final join) — materialize it once so the n×K assignment pass
    // never re-executes per consumer
    val perCell = cells.join(src, "vec_id")
      .groupBy(col("source"), col("cid"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val perSrc = perCell.groupBy(col("source"))
      .agg(sum(col("n")).as("n_vecs"), count(lit(1)).as("n_cells"), max(col("n")).as("top_n"))
    val entropy = perCell
      .join(broadcast(perSrc.select(col("source"), col("n_vecs"))), "source")
      .select(col("source"),
        floor(lit(1000000.0) * (col("n").cast("double") / col("n_vecs").cast("double"))
          * log(col("n_vecs").cast("double") / col("n").cast("double")) + lit(0.5))
          .cast("long").as("term_micro"))
      .groupBy(col("source")).agg(sum(col("term_micro")).as("entropy_micro_nats"))
    perSrc.join(entropy, "source")
      .select(col("source"), col("n_vecs"), col("n_cells"), col("entropy_micro_nats"),
        floor(lit(1000000.0) * col("top_n").cast("double") / col("n_vecs").cast("double")
          + lit(0.5)).cast("long").as("top_cell_share_micro"))
  }

  /** dc06 — the cross-source duplication matrix: which sources mirror which. A d05
    * near-dup cluster containing documents from two different sources is direct
    * evidence of content syndication (mirror sites, scrapes of scrapes — the
    * RefinedWeb/C4 provenance problem); this aggregates those clusters into one
    * unordered source-pair matrix: shared cluster count plus each side's document
    * mass inside the shared clusters. Read it next to dc01's dup_rate: dc01 says
    * "source X is 30% dups", dc06 says WHO it is duplicating.
    *
    * Scale shape: rides d05's capped-LSH clusters unchanged; the per-(cluster,
    * source) census is one map-side-combinable groupBy; the pair join is an
    * equi-join ON cluster_id whose per-cluster fanout is bounded by the number of
    * DISTINCT SOURCES in the cluster (≤ |sources|, a catalog-sized constant) —
    * never by cluster membership.
    */
  /** dc07 — the source-centroid similarity matrix: per-source MEAN embedding (the
    * s05 kernel with source as the label, per-dim means rounded to 6 so both
    * engines hold identical doubles), then pairwise cosine between source
    * centroids. The between-source complement of dc05's within-source dispersion:
    * dc05 says "how much space does this source cover", dc07 says "which sources
    * sit on top of each other" — near-identical centroids flag the same content
    * farmed through different domains (the semantic counterpart of dc06's
    * verbatim-dup matrix). All-zero centroids are excluded (cosine undefined),
    * the s06 degenerate-input discipline.
    *
    * Scale shape: centroids are one posexplode + map-side-combinable per-(source,
    * dim) average — the exchange moves ≤ |sources|·dims rows regardless of corpus
    * size; the pair product is |sources|² on a catalog-sized checkpointed
    * relation (a deliberate nest-loop over dozens of rows, never data).
    */
  def sourceCentroidMatrix(
      docs: DataFrame,
      embeddings: DataFrame,
      idCol: String,
      sourceCol: String,
      vecIdCol: String,
      vecCol: String
  ): DataFrame = {
    val joined = embeddings.select(col(vecIdCol).as("vec_id"), col(vecCol).as("emb"))
      .join(docs.select(col(idCol).as("vec_id"), col(sourceCol).as("source")), "vec_id")
    val cents = Similarity.labelCentroids(joined, "source", "emb")
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("dim"), col("centroid")))).as("dc"))
      .select(col("label").as("source"),
        transform(col("dc"), x => x("centroid")).as("cv"))
      .filter(Similarity.norm2(col("cv")) > 0)
      .localCheckpoint(true)
    val a = cents.select(col("source").as("source_a"), col("cv").as("va"))
    val b = cents.select(col("source").as("source_b"), col("cv").as("vb"))
    a.join(b, col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        round(Similarity.cosine(col("va"), col("vb")), 6).as("cos_sim"))
  }

  def crossSourceDup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 1,
      rounds: Int = 3,
      maxBucketMembers: Long = 10000L
  ): DataFrame = {
    val clusters =
      Dedup.dedupClusters(df, idCol, textCol, shingleSize, bands, rowsPerBand, rounds, maxBucketMembers)
    val cs = clusters
      .join(df.select(col(idCol), col(sourceCol).as("source")), idCol)
      .groupBy(col("cluster_id"), col("source"))
      .agg(count(lit(1)).as("n"))
    val a = cs.select(col("cluster_id"), col("source").as("source_a"), col("n").as("na"))
    val b = cs.select(col("cluster_id"), col("source").as("source_b"), col("n").as("nb"))
    a.join(b, Seq("cluster_id"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared_clusters"),
        sum(col("na")).as("n_docs_a"), sum(col("nb")).as("n_docs_b"))
  }
}
