package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (exact, MinHash+LSH, SimHash,
  * n-gram Jaccard). Hashing is md5-based so the DuckDB oracle can reproduce signatures
  * byte-for-byte (md5 hex is lowercase and lexicographically comparable in both engines).
  *
  * Scale shape: everything is explode → hash-aggregate → equi-join. Candidate generation
  * is inverted-index / LSH-band joins — never an all-pairs cross join — so the plans hold
  * when the corpus is 10^9 documents (band keys / shingles shuffle-partition the work).
  */
object Dedup {

  /** Exact dedup: hash-groupBy on content. Output: one row per distinct content with the
    * kept (minimum) id and the duplicate count.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingles, distinct per document: (id, shingle) — a native generator
    * (org.apache.spark.sql.graft.WordShingles) doing one pass per document. No shuffle
    * at all: dedup happens inside the generator, which is equivalent to a global
    * `distinct()` because each document is one input row. (The HOF formulation —
    * explode(transform(sequence, slice+concat_ws)) + distinct — evaluated interpreted
    * and shuffled the whole shingle relation just to dedup.)
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    Scans.fanOut(df)
      .select(col(idCol), org.apache.spark.sql.graft.WordShingles.column(col(textCol), n).as("shingle"))

  /** Modulus of the affine minhash permutation family (fits 32 bits, so
    * a_k·h + b_k stays far from 64-bit overflow in both engines).
    */
  val MinhashPrime: Long = 1000000007L

  /** MinHash signatures in ONE aggregation with ONE md5 per shingle: base hash
    * h = first 60 bits of md5(shingle) mod p (oracle-reproducible:
    * `('0x' || substr(md5(s), 1, 15))::BIGINT` in DuckDB == `conv(substring(md5(s),1,15),16,10)`
    * in Spark — exact integer arithmetic, no engine drift); permutation k is the affine
    * map (2k+1)·h + 12289k + 1 mod p. Output: (id, mh0..mh{numHashes-1}), one row per doc.
    *
    * Scale shape: the k minhashes are k integer-only aggregate expressions in a single
    * map-side-combinable groupBy — the per-shingle row count is NEVER amplified k×
    * (an explode(sequence(0, k-1)) form shuffles k× the shingle rows), and md5 — the
    * dominant per-row cost — runs once per shingle, not once per (shingle, k).
    */
  def minhashWide(sh: DataFrame, idCol: String, numHashes: Int): DataFrame =
    minhashWideFromHm(
      sh.select(
        col(idCol),
        (conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long") % MinhashPrime)
          .as("hm")),
      idCol, numHashes)

  /** The aggregation half of [[minhashWide]] over a pre-hashed (id, hm) relation —
    * shared so a multi-config sweep ([[lshAutoTune]]) hashes the corpus ONCE and
    * derives every config's signatures from the same base relation. Permutation k's
    * definition is global (the affine map depends only on k), so a config using
    * fewer hashes reads a prefix of the same mh columns.
    */
  private[pipeline] def minhashWideFromHm(hashed: DataFrame, idCol: String, numHashes: Int): DataFrame = {
    val aggs = (0 until numHashes).map { k =>
      min((lit(2L * k + 1) * col("hm") + lit(12289L * k + 1)) % MinhashPrime).as(s"mh$k")
    }
    hashed.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Long form of [[minhashWide]] — (id, k, minhash) rows; the per-doc explode happens
    * AFTER the aggregation (numHashes rows per document, not per shingle).
    */
  def minhash(sh: DataFrame, idCol: String, numHashes: Int): DataFrame =
    minhashWide(sh, idCol, numHashes)
      .select(
        col(idCol),
        explode(array((0 until numHashes).map(k =>
          struct(lit(k).as("k"), col(s"mh$k").as("minhash"))): _*)).as("x")
      )
      .select(col(idCol), col("x.k").as("k"), col("x.minhash").as("minhash"))

  /** The (doc, band, signature) relation both the batch self-join (d02) and the
    * incremental index (d17/d18) are built from: band b's signature concatenates
    * its `rowsPerBand` minhashes in k order straight from the wide signature row.
    */
  private[graft] def bandSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      bands: Int,
      rowsPerBand: Int
  ): DataFrame =
    bandSigsOfWide(
      minhashWide(shingles(df, idCol, textCol, shingleSize), idCol, bands * rowsPerBand),
      idCol, bands, rowsPerBand)

  /** The banding half of [[bandSignatures]] over a pre-built wide signature row —
    * shared with the sweep ([[lshTuneSweep]]), which derives every config's bands
    * from ONE wide relation.
    */
  private def bandSigsOfWide(
      wide: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val sig = concat_ws("_",
        (b * rowsPerBand until (b + 1) * rowsPerBand).map(k => col(s"mh$k").cast("string")): _*)
      struct(lit(b).as("band"), sig.as("sig"))
    }
    wide
      .select(col(idCol), explode(array(bandStructs: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** MinHash + LSH banding: documents sharing any band signature become candidate
    * duplicate pairs. numHashes = bands × rowsPerBand.
    *
    * Skew guard (`maxBucketMembers` — the same discipline as the embedding twin
    * `Similarity.scoredLshPairs`): a (band, sig) cell with more members than the cap
    * is DROPPED before the self-join. With rowsPerBand = 1 a band signature is a
    * single minhash value, so one boilerplate clump — the normal case in web corpora,
    * and exactly what d07 exists to find — lands thousands of documents in one cell
    * and the self-join goes quadratic in its membership. Recall for an over-cap
    * clump falls to the EXACT operators (d01/d03) by design: a byte-identical clump
    * collides into the same over-cap cell in EVERY band (RoundTenOpsSpec proves all
    * intra-clump LSH pairs vanish), so the cap trades that clump's fuzzy pairs for
    * bounded tasks — cap² comparisons max — and exact dedup still removes the
    * copies. The default never binds at the bench scale factors (largest observed cell
    * ≪ 10⁴), so the DuckDB oracle mirrors of d02/d05/d08/d15 — which all ride this
    * kernel — stay capless-equivalent; production sets it to the per-task budget.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      maxBucketMembers: Long = 10000L
  ): DataFrame =
    pairsFromBandSigs(
      bandSignatures(df, idCol, textCol, shingleSize, bands, rowsPerBand), idCol,
      maxBucketMembers)

  /** The census + capped self-join half of [[minhashLshPairs]] over an explicit
    * band-signature relation — shared with the sweep.
    */
  private def pairsFromBandSigs(
      sigs: DataFrame, idCol: String, maxBucketMembers: Long): DataFrame = {
    // one band-sig row per (doc, band) — tiny; materialized once so the self-join below
    // doesn't re-run the whole shingle+minhash pipeline for each side
    val bandSigs = sigs.localCheckpoint(true)
    // membership census per cell — map-side-combinable count, then an equi-join that
    // admits only bounded cells into the quadratic step (never a global sort/window)
    val smallCells = bandSigs.groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("cell_n"))
      .filter(col("cell_n") <= maxBucketMembers)
      .select(col("band"), col("sig"))
    val admitted = bandSigs.join(smallCells, Seq("band", "sig"))
    val a = admitted.select(col("band"), col("sig"), col(idCol).as("id_a"))
    val b = admitted.select(col("band"), col("sig"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Near-duplicate CLUSTERS — the end-to-end training-data dedup flow: MinHash-LSH
    * candidate pairs become an undirected similarity graph; bounded min-label
    * propagation (the connected-components kernel, `rounds` iterations) assigns every
    * document a cluster id = the minimum doc id reachable within `rounds` hops; the
    * cluster id doubles as the canonical "keep" document. Singletons (no near-dup)
    * cluster as themselves. All-integer, so the oracle reproduces it exactly.
    */
  def dedupClusters(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 1,
      rounds: Int = 3,
      maxBucketMembers: Long = 10000L
  ): DataFrame = {
    val pairs =
      minhashLshPairs(df, idCol, textCol, shingleSize, bands, rowsPerBand, maxBucketMembers)
    clustersFromPairs(df, pairs, idCol, rounds)
  }

  /** The label-propagation half of [[dedupClusters]] over an EXPLICIT candidate
    * pair relation — shared with [[autoTunedClusters]], which already holds the
    * chosen config's checkpointed pairs from the tuning sweep and must not pay
    * the shingle+minhash pipeline a second time.
    */
  private[graft] def clustersFromPairs(
      df: DataFrame,
      pairs: DataFrame,
      idCol: String,
      rounds: Int
  ): DataFrame = {
    val und = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionByName(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
      .localCheckpoint(true) // reused every round
    var labels = df.select(col(idCol).as("v")).distinct().select(col("v"), col("v").as("label"))
    for (_ <- 1 to rounds) {
      val nbrMin = und
        .join(labels.select(col("v").as("b"), col("label").as("nbl")), "b")
        .groupBy(col("a"))
        .agg(min(col("nbl")).as("m"))
      labels = labels
        .join(nbrMin.select(col("a").as("v"), col("m")), Seq("v"), "left")
        .select(col("v"), least(col("label"), coalesce(col("m"), col("label"))).as("label"))
    }
    labels.select(col("v").as(idCol), col("label").as("cluster_id"))
  }

  /** The dedup DECISION on top of [[dedupClusters]]: one row per near-dup cluster,
    * keeping the LONGEST member (token count; doc-id tie-break) — the standard
    * "keep the most complete copy" policy a curation pipeline applies after
    * clustering, with the drop count as the audit trail. Singleton clusters pass
    * through (n_dropped = 0), so the output IS the post-dedup corpus manifest.
    *
    * Scale shape: inherits d05's banded-LSH + bounded min-label closure; the keep
    * choice adds one token-count map pass, an id equi-join, and a per-CLUSTER window
    * (partitioned by cluster_id — no global sort). Deterministic: token counts are
    * exact integers and ties break on doc id.
    */
  def clusterKeepLongest(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 1,
      rounds: Int = 3,
      maxBucketMembers: Long = 10000L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters =
      dedupClusters(df, idCol, textCol, shingleSize, bands, rowsPerBand, rounds, maxBucketMembers)
    val toks = df.select(col(idCol), TextStats.tokenCount(col(textCol)).as("n_tokens"))
    val byCluster = Window.partitionBy(col("cluster_id"))
    clusters
      .join(toks, idCol)
      .withColumn("rk",
        row_number().over(byCluster.orderBy(col("n_tokens").desc, col(idCol).asc)))
      .withColumn("n_members", count(lit(1)).over(byCluster))
      .filter(col("rk") === 1)
      .select(
        col("cluster_id"),
        col(idCol).as("kept_doc"),
        col("n_tokens").as("kept_tokens"),
        col("n_members"),
        (col("n_members") - 1L).as("n_dropped"))
  }

  /** d29 — DEDUP SAVINGS: the number near-dup dedup is justified by — per
    * source, the raw doc/token mass versus the mass surviving the d15
    * keep-longest policy, and the saved-token share. A 100 TB dedup job costs
    * real compute; this report is its ROI line (and, read per source, names
    * which feeds are bloated with copies — the dc01 triage question answered
    * in tokens, not doc counts).
    *
    * Determinism: token counts are the pinned integer kernel; the kept set is
    * d15's (exact ranks, id tie-break); shares are ONE half-up integer
    * division each.
    *
    * Scale shape: one text scan for per-doc tokens (checkpointed — raw rollup
    * and kept join both read it), the d05/d15 capped kernels for the keep set,
    * two map-side-combinable groupBys, |sources|-row output.
    */
  def dedupSavings(
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
    val perDoc = df.select(col(idCol), col(sourceCol),
        TextStats.tokenCount(col(textCol)).as("n_toks"))
      .localCheckpoint(true) // raw rollup + kept join off one text scan
    val kept = clusterKeepLongest(df, idCol, textCol, shingleSize, bands,
        rowsPerBand, rounds, maxBucketMembers)
      .select(col("kept_doc").as(idCol))
    val raw = perDoc.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    val after = perDoc.join(kept, Seq(idCol), "left_semi")
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs_kept"), sum(col("n_toks")).as("n_tokens_kept"))
    raw.join(after, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        coalesce(col("n_docs_kept"), lit(0L)).as("n_docs_kept"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"),
        expr("(2 * 1000000 * (n_tokens - coalesce(n_tokens_kept, 0)) + n_tokens)" +
          " DIV (2 * n_tokens)").cast("long").as("saved_tokens_micro"))
  }

  /** d30 — the SUBSTRING-dedup DECISION layer over the d14 span inventory
    * (exactly the relationship d15 has to d05): [[dupSpans]] reports which
    * (doc, start, length) runs are repeated across documents; this registry
    * turns that inventory into the removal manifest the published pipeline
    * step actuates (Lee et al. 2021, "Deduplicating Training Data Makes
    * Language Models Better": remove every occurrence of a long duplicated
    * substring EXCEPT ONE). Each long span is stamped with the 60-bit md5 of
    * its exact text — the span's cross-document IDENTITY — then per identity:
    * how many documents share it verbatim, the canonical keeper (minimum
    * doc id, then minimum start within it — one surviving occurrence
    * corpus-wide), and per occurrence the `cut` verdict a curation pass
    * filters on. Identity is EXACT-substring equality of maximal spans: two
    * documents sharing only part of a run carry different maximal spans and
    * different hashes by design (partial-overlap clustering is the fuzzy
    * operators' job, d02–d05).
    *
    * Scale shape: rides the shared [[dupSpanRuns]] kernel (one checkpointed
    * positioned-hash pass, no pairs, per-document windows only) at its own
    * longer window/span bar; the stamp join re-reads the corpus text once
    * with the output-sized span relation broadcast into it; the registry
    * census and keeper window partition by span hash — output-sized
    * relations, never corpus-sized.
    *
    * Determinism: positions and counts exact, hashes the repo's 60-bit md5
    * integer convention, keeper rank (doc asc, start asc) — a total order.
    */
  def repeatedSpanRegistry(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 8,
      minSpanTokens: Int = 16
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowTokens >= 2,
      s"repeatedSpanRegistry: windowTokens must be >= 2, got $windowTokens")
    require(minSpanTokens >= windowTokens,
      s"repeatedSpanRegistry: minSpanTokens ($minSpanTokens) must be >= " +
        s"windowTokens ($windowTokens)")
    val spans = dupSpanRuns(df, idCol, textCol, windowTokens)
      .filter(col("span_end") - col("span_start") + 1 >= minSpanTokens)
      .select(col(idCol).as("doc"), col("span_start").cast("long").as("span_start"),
        (col("span_end") - col("span_start") + 1).cast("long").as("span_tokens"))
    val toks = df.select(col(idCol).as("doc"), split(col(textCol), " ", -1).as("ts"))
    val stamped = spans.join(toks, Seq("doc"))
      .select(col("doc"), col("span_start"), col("span_tokens"),
        conv(substring(md5(array_join(
            slice(col("ts"), col("span_start").cast("int"), col("span_tokens").cast("int")),
            " ")), 1, 15), 16, 10).cast("long").as("span_h"))
      .localCheckpoint(true) // output-sized; two consumers: census + keeper rank
    val registry = stamped.groupBy(col("span_h"))
      .agg(countDistinct(col("doc")).as("n_docs_sharing"), min(col("doc")).as("keep_doc"))
    val wKeep = Window.partitionBy(col("span_h"))
      .orderBy(col("doc").asc, col("span_start").asc)
    stamped.withColumn("rk", row_number().over(wKeep))
      .join(registry, Seq("span_h"))
      .select(col("doc").as(idCol), col("span_start"), col("span_tokens"), col("span_h"),
        col("n_docs_sharing"), col("keep_doc"),
        (col("rk") > 1).cast("int").as("cut"))
  }

  /** d31 — CORPUS-LEVEL SEMANTIC dedup (the SemDeDup shape, Abbas et al.
    * 2023): near-duplicates by MEANING — paraphrases, re-encodings, boilerplate
    * variants that no shingle operator can see — pruned within the corpus
    * itself. Composes the engine's trained building blocks end-to-end: the s22
    * k-means codebook (trained, not the d13 modulus sample), the s33 trained-cell
    * assignment, within-CELL cosine pairs only (the bucketing: a pair across
    * cells is never considered, by construction), the d05 bounded label
    * propagation to close paraphrase chains, and the d15 KEEP-LONGEST policy
    * (token count from the documents table, id tie-break) — so the survivor of
    * each semantic group is its most complete member, not an arbitrary min-id.
    * Output per cluster: (cluster_id, kept_doc, kept_tokens, n_members,
    * n_dropped) — the same manifest shape as d15, so downstream actuation
    * (d16 splits, d29-style savings) composes unchanged.
    *
    * Scale shape: training is the s22 kernel (broadcast centroids, bounded
    * rounds); assignment is one map pass with a per-vector k-row window; the
    * quadratic step is per-CELL and capped (`maxCellMembers` — an over-cap
    * cell's members keep by default and fall to the exact d01/d02 screens);
    * label prop is `rounds` bounded id-thin joins; the keep choice is one
    * token-count map pass + a per-cluster window. Never all-pairs, nothing
    * driver-side.
    *
    * Determinism: centroids are round-6 per training round (both engines hold
    * identical doubles), pair admission is the micro-quantized rounded cosine,
    * clusters are exact integer min-label, keep ranks are exact counts with id
    * tie-breaks — oracle-mirrorable end to end.
    */
  def semanticDedupClusters(
      docs: DataFrame,
      embeddings: DataFrame,
      idCol: String,
      textCol: String,
      vecIdCol: String,
      vecCol: String,
      thresholdMicro: Long = 400000L,
      kCells: Int = 8,
      dims: Int = 64,
      trainRounds: Int = 2,
      rounds: Int = 3,
      maxCellMembers: Long = 10000L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val model = Similarity.kmeansRounds(embeddings, vecIdCol, vecCol, kCells, dims, trainRounds)
    val cells = Similarity.assignToCells(embeddings, vecIdCol, vecCol, model)
      .localCheckpoint(true) // census + both sides of the pair join
    val pairs = Similarity.withinCellPairs(cells, thresholdMicro, maxCellMembers)
    val clusters = clustersFromPairs(embeddings, pairs, vecIdCol, rounds)
    val toks = docs.select(col(idCol).as("did"), TextStats.tokenCount(col(textCol)).as("n_tokens"))
    val byCluster = Window.partitionBy(col("cluster_id"))
    clusters
      .join(toks, col(vecIdCol) === col("did"))
      .withColumn("rk",
        row_number().over(byCluster.orderBy(col("n_tokens").desc, col("did").asc)))
      .withColumn("n_members", count(lit(1)).over(byCluster))
      .filter(col("rk") === 1)
      .select(
        col("cluster_id"),
        col("did").as("kept_doc"),
        col("n_tokens").as("kept_tokens"),
        col("n_members"),
        (col("n_members") - 1L).as("n_dropped"))
  }

  /** d32 — the d29 ROI line for SEMANTIC dedup: per source, raw vs
    * d31-surviving doc/token mass and the saved-token share — what a SemDeDup
    * pass actually buys on this corpus, read next to d29's near-dup savings
    * (semantic savings ⊇ overlap with d29's: the two reports price different
    * policies on the same raw mass).
    *
    * Scale shape: d31's kernels plus one checkpointed text scan and two
    * map-side-combinable rollups; |sources|-row output.
    */
  def semanticDedupSavings(
      docs: DataFrame,
      embeddings: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      vecIdCol: String,
      vecCol: String,
      thresholdMicro: Long = 400000L,
      kCells: Int = 8,
      dims: Int = 64,
      trainRounds: Int = 2,
      rounds: Int = 3,
      maxCellMembers: Long = 10000L
  ): DataFrame = {
    val perDoc = docs.select(col(idCol), col(sourceCol),
        TextStats.tokenCount(col(textCol)).as("n_toks"))
      .localCheckpoint(true) // raw rollup + kept join off one text scan
    val kept = semanticDedupClusters(docs, embeddings, idCol, textCol, vecIdCol, vecCol,
        thresholdMicro, kCells, dims, trainRounds, rounds, maxCellMembers)
      .select(col("kept_doc").as(idCol))
    val raw = perDoc.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    val after = perDoc.join(kept, Seq(idCol), "left_semi")
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs_kept"), sum(col("n_toks")).as("n_tokens_kept"))
    raw.join(after, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        coalesce(col("n_docs_kept"), lit(0L)).as("n_docs_kept"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"),
        expr("(2 * 1000000 * (n_tokens - coalesce(n_tokens_kept, 0)) + n_tokens)" +
          " DIV (2 * n_tokens)").cast("long").as("saved_tokens_micro"))
  }

  /** The hot-cell cap of the d35 probe, paid ONCE per index generation (the
    * capDedupIndex discipline): cells above `maxCellMembers` are excluded from
    * the pairwise probe — their arrivals default-admit and fall to the exact
    * d01/d17 screens — so the corpus-sized census never runs per micro-batch.
    */
  def capSemanticCells(cells: DataFrame, maxCellMembers: Long = 10000L): DataFrame = {
    val smallCells = cells.groupBy(col("cid")).agg(count(lit(1)).as("cell_n"))
      .filter(col("cell_n") <= maxCellMembers)
      .select(col("cid"))
    cells.join(smallCells, Seq("cid"))
  }

  /** d35 — SEMANTIC dedup at INGESTION time (the d17 incremental posture
    * applied to d31's direction): arrivals are assigned to the TRAINED cells
    * of the existing corpus (the saved s24 codebook — never retrained per
    * batch) and probed against that cell's members only; an arrival whose
    * micro-cosine reaches the threshold against any corpus member is flagged a
    * semantic duplicate of the minimum such id. One verdict row per arrival
    * (explicit zeros for clean ones) — the gate a production ingest runs
    * beside the d17 minhash probe, catching the paraphrase copies the band
    * index cannot see.
    *
    * Scale shape: the codebook is a broadcast k-row relation; arrival
    * assignment is one map pass with a per-arrival k-row window; the probe is
    * an ingest-sized equi-join on cell id against the capped cell relation
    * ([[capSemanticCells]] — paid once, not per batch); the verdict rollup is
    * map-side-combinable. The corpus is never rescanned.
    */
  def semanticDedupProbe(
      newVecs: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      model: DataFrame,
      thresholdMicro: Long = 400000L,
      maxCellMembers: Long = 10000L
  ): DataFrame = {
    val cells = capSemanticCells(
      Similarity.assignToCells(corpus, idCol, vecCol, model), maxCellMembers)
      .localCheckpoint(true)
    semanticDedupProbeWith(newVecs, idCol, vecCol, model, cells, thresholdMicro)
  }

  /** The per-batch half of [[semanticDedupProbe]] over an ALREADY-capped,
    * checkpointed cell relation — the streaming twin enters here every
    * micro-batch (the streamingIncrementalDedup index-is-the-state shape).
    */
  def semanticDedupProbeWith(
      newVecs: DataFrame,
      idCol: String,
      vecCol: String,
      model: DataFrame,
      cells: DataFrame,
      thresholdMicro: Long = 400000L
  ): DataFrame = {
    val arr = Similarity.assignToCells(newVecs, idCol, vecCol, model)
      .select(col("rid").as("new_id"), col("cid"), col("v").as("av"), col("nv").as("an"))
      .localCheckpoint(true) // two consumers: the probe and the verdict grid
    val close = arr
      .join(cells.select(col("cid"), col("rid").as("corpus_id"),
        col("v").as("cv2"), col("nv").as("cn2")), Seq("cid"))
      .filter(floor(lit(1000000.0) *
        round(Similarity.cosineFromNorms(
          Similarity.dot(col("av"), col("cv2")), col("an"), col("cn2")), 6)
        + lit(0.5)).cast("long") >= thresholdMicro)
      .groupBy(col("new_id"))
      .agg(count(lit(1)).as("n_close"), min(col("corpus_id")).as("dup_of"))
    arr.select(col("new_id"), col("cid"))
      .join(close, Seq("new_id"), "left")
      .select(col("new_id").as(idCol), col("cid"),
        coalesce(col("n_close"), lit(0L)).as("n_close"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"),
        (coalesce(col("n_close"), lit(0L)) > 0L).cast("int").as("is_dup"))
  }

  /** d36 — DEDUP POLICY ABLATION: the dc22 unique-contribution calculus
    * pointed at the three dedup POLICIES the engine prices separately (d29
    * near-dup, d32 semantic, d34 substring savings answer "how much"; this
    * answers "who catches what"). Per policy — exact min-id keeper (d01),
    * near-dup keep-longest (d15), semantic keep-longest (d31) — the total
    * removed set, the UNIQUE set (documents ONLY that policy removes — what
    * re-enters the corpus if it is dropped), and the unique set's id
    * checksum. Σ unique ≤ Σ removed and the gap is the inter-policy overlap:
    * a near-dup pass whose removals are all inside exact's is shadowed — the
    * post-mortem that decides which dedup passes a pipeline actually runs.
    *
    * Scale shape: each policy's keeper kernel runs ONCE (checkpointed id-thin
    * removal sets — the gateAblation discipline); uniqueness is one anti-join
    * per policy against the union of the other two; the report is 3 rows.
    */
  def dedupPolicyAblation(
      docs: DataFrame,
      embeddings: DataFrame,
      idCol: String,
      textCol: String,
      vecIdCol: String,
      vecCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 1,
      rounds: Int = 3,
      maxBucketMembers: Long = 10000L,
      thresholdMicro: Long = 400000L,
      kCells: Int = 8,
      dims: Int = 64,
      trainRounds: Int = 2
  ): DataFrame = {
    val base = docs.select(col(idCol), col(textCol)).localCheckpoint(true)
    val all = base.select(col(idCol)).localCheckpoint(true)
    def removed(kept: DataFrame): DataFrame = all.join(kept, Seq(idCol), "left_anti")
    // r18: the three policy chains are independent — overlap them (the s45
    // Par shape; each materializes eagerly at its own boundary)
    val Seq(rExact, rNear, rSem) = Par.seq(Seq(
      () => removed(exact(base, idCol, textCol).select(col("keep_id").as(idCol)))
        .localCheckpoint(true),
      () => removed(clusterKeepLongest(base, idCol, textCol,
          shingleSize, bands, rowsPerBand, rounds, maxBucketMembers)
        .select(col("kept_doc").as(idCol)))
        .localCheckpoint(true),
      () => removed(semanticDedupClusters(docs, embeddings, idCol, textCol,
          vecIdCol, vecCol, thresholdMicro, kCells, dims, trainRounds, rounds)
        .select(col("kept_doc").as(idCol)))
        .localCheckpoint(true)))
    val policies = Seq(
      "exact_min_id" -> rExact,
      "near_keep_longest" -> rNear,
      "semantic_keep_longest" -> rSem)
    policies.map { case (name, r) =>
      val others = policies.collect { case (n, o) if n != name => o }
        .reduce(_ unionByName _)
      val unique = r.join(others, Seq(idCol), "left_anti")
      r.agg(count(lit(1)).as("n_removed"))
        .crossJoin(unique.agg(
          count(lit(1)).as("n_unique"),
          coalesce(sum(pmod(Sketches.h32(col(idCol).cast("string")), lit(1000000L))),
            lit(0L)).as("unique_id_check")))
        .select(lit(name).as("policy"), col("n_removed"), col("n_unique"),
          col("unique_id_check"))
    }.reduce(_ unionByName _)
  }

  /** d16 — leakage-safe train/val/test split: the split is a function of the
    * NEAR-DUP CLUSTER id, not the document id, so two near-duplicate documents can
    * never land on opposite sides of the train/eval boundary — the failure mode
    * d06 detects after the fact, prevented at assignment time (the standard
    * cluster-aware split of training-data curation). Composes [[dedupClusters]]
    * with the t07 deterministic hash-bucket split applied to `cluster_id`;
    * singleton clusters reduce to exactly t07's per-document assignment, so the
    * operator strictly generalizes it.
    *
    * Scale shape: inherits d05's banded-LSH + bounded min-label closure; the split
    * itself is one map pass over the cluster relation (no new shuffle, no joins).
    */
  def clusterAwareSplit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 1,
      rounds: Int = 3,
      trainPct: Int = 90,
      valPct: Int = 5,
      maxBucketMembers: Long = 10000L
  ): DataFrame = {
    val clusters =
      dedupClusters(df, idCol, textCol, shingleSize, bands, rowsPerBand, rounds, maxBucketMembers)
    val b = Sampling.bucketCol(col("cluster_id"))
    clusters.select(
      col(idCol),
      col("cluster_id"),
      b.as("bucket"),
      Sampling.splitCol(b, trainPct, valPct).as("split"))
  }

  /** Train/eval contamination detection — the decontamination step of a training-data
    * pipeline: documents land in train/val/test via the deterministic hash split
    * ([[Sampling.hashSplit]]), and an eval document is CONTAMINATED if it shares a
    * MinHash band signature with any train document (the same near-dup evidence d02
    * uses, applied across the split boundary; exact duplicates collide in every band).
    * Output: one row per contaminated eval doc — its split, how many train docs it
    * collides with, and the smallest such train id (the audit pointer).
    *
    * Scale shape: signatures are the one-aggregation minhash ([[minhashWide]]); the
    * cross-split match is an equi-join on (band, signature) — shuffle-partitioned by
    * band key like d02, never eval × train. The eval side of a 95/5 split is small but
    * NOT broadcast-safe at 10⁹ docs, so both sides shuffle on the band key.
    */
  def contamination(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      trainPct: Int = 90,
      valPct: Int = 5
  ): DataFrame = {
    val splits = Sampling.hashSplit(df, idCol, trainPct, valPct).select(col(idCol), col("split"))
    val bands = minhash(shingles(df, idCol, textCol, shingleSize), idCol, numHashes)
      .join(splits, idCol)
    val train = bands.filter(col("split") === "train")
      .select(col("k"), col("minhash"), col(idCol).as("train_id"))
    val eval = bands.filter(col("split") =!= "train")
      .select(col("k"), col("minhash"), col(idCol).as("eval_id"), col("split"))
    eval.join(train, Seq("k", "minhash"))
      .groupBy(col("eval_id"), col("split"))
      .agg(
        countDistinct(col("train_id")).as("n_train_matches"),
        min(col("train_id")).as("first_train_id"))
      .select(col("eval_id").as(idCol), col("split"), col("n_train_matches"), col("first_train_id"))
  }

  /** d19 — benchmark n-gram decontamination (the eval-suite discipline of the
    * GPT-3 appendix-C / PaLM reports): a training document is contaminated if it
    * shares a verbatim word n-gram with the BENCHMARK set — here documents with
    * `id % benchmarkMod == 0` stand in for the external eval suite. This is
    * EXACT-overlap evidence, deliberately different from [[contamination]]'s
    * minhash-band evidence (d06 answers "is an eval doc a near-dup of training
    * data"; d19 answers "does a training doc quote the benchmark verbatim" — the
    * direction and the test published decontamination runs actually use). Output:
    * one row per FLAGGED training doc — its distinct n-gram count, how many of
    * those n-grams appear anywhere in the benchmark, the overlap fraction
    * (micro-quantized), and the smallest colliding benchmark doc id (the audit
    * pointer).
    *
    * Scale shape: the benchmark n-gram set is eval-suite-sized (thousands of
    * docs, not the corpus) — it broadcasts into the probe join; the training
    * side is one linear shingle scan, never self-joined. At extreme benchmark
    * sizes the broadcast degrades to a shuffled equi-join on the n-gram hash and
    * a bloom pre-filter on the scan — the plan stays candidates-only either way.
    */
  def benchmarkDecontaminate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      benchmarkMod: Long = 10L,
      shingleSize: Int = 5
  ): DataFrame = {
    val index = benchIndex(
      df.filter(col(idCol) % benchmarkMod === 0), idCol, textCol, shingleSize)
    decontaminateAgainst(
      df.filter(col(idCol) % benchmarkMod =!= 0), idCol, textCol, index, shingleSize)
  }

  /** (id, h) shingle-hash relation both halves of d19/d20 derive from — the d19
    * hashing convention (first 60 bits of md5, oracle-reproducible).
    */
  private def shingleHashes(
      df: DataFrame, idCol: String, textCol: String, shingleSize: Int): DataFrame =
    shingles(df, idCol, textCol, shingleSize)
      .select(col(idCol),
        conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long").as("h"))

  /** Build the persistable benchmark n-gram index — (h, bench_id) with the minimum
    * holding benchmark doc per distinct n-gram hash (the audit pointer). Built once
    * per eval-suite release; every training ingest probes it.
    */
  def benchIndex(
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5
  ): DataFrame =
    shingleHashes(benchmark, idCol, textCol, shingleSize)
      .groupBy(col("h")).agg(min(col(idCol)).as("bench_id"))

  /** The probe half of [[benchmarkDecontaminate]], separated so the index can be a
    * LOADED artifact ([[saveBenchIndex]]/[[loadBenchIndex]] — build-once /
    * probe-every-ingest, the d18 discipline applied to decontamination). The
    * training side's hash relation materializes once (it feeds both the per-doc
    * totals and the probe), and the eval-sized index broadcasts into the probe.
    */
  def decontaminateAgainst(
      train: DataFrame,
      idCol: String,
      textCol: String,
      index: DataFrame,
      shingleSize: Int = 5
  ): DataFrame = {
    val hashes = shingleHashes(train, idCol, textCol, shingleSize).localCheckpoint(true)
    val perDoc = hashes.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    val hits = hashes.join(broadcast(index), "h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"), min(col("bench_id")).as("first_bench_id"))
    hits.join(perDoc, idCol)
      .select(col(idCol), col("n_shingles"), col("n_hits"),
        floor(lit(1000000.0) * col("n_hits").cast("double") / col("n_shingles").cast("double")
          + lit(0.5)).cast("long").as("hit_frac_micro"),
        col("first_bench_id"))
  }

  /** d23 — per-EVAL-ITEM leakage report: [[benchmarkDecontaminate]] reversed.
    * d19 answers "which training docs quote the benchmark" (drop them); this
    * answers the eval-governance question the published decontamination
    * reports actually tabulate (GPT-3 appendix C's clean/dirty eval splits):
    * for EVERY benchmark document with at least one word n-gram — how much of
    * it leaked into training (distinct leaked n-grams, micro fraction), how
    * many distinct training docs quote it, and the WORST offender (the
    * training doc sharing the most distinct n-grams, min-id tie-break; −1 for
    * a clean item). `dirty` = any leakage — the per-item retire/keep bit.
    *
    * Scale shape: the benchmark hash relation is eval-suite-sized and
    * broadcasts into the probe against the training side's one linear shingle
    * scan (the d19 join, re-keyed); everything downstream of the probe is
    * keyed by (bench, train) CANDIDATE pairs — hash-collision-bounded, never a
    * pair product — and the worst-offender pick is a per-bench-item window.
    */
  /** d25 — LSH TUNING report: precision/recall of the d02 band-bucket
    * candidates against the exact d04 Jaccard truth at `threshold` — the
    * s07/s30 "measure, don't guess" discipline applied to dedup: at 100 TB the
    * band/row split IS the cost-recall dial (more bands → more candidates →
    * higher recall, more verify work), and this one-row report is what a
    * parameter change is judged by. recall = |candidates ∩ true| / |true|,
    * precision = |candidates ∩ true| / |candidates|, both micro-quantized,
    * 0/0 reported as explicit zeros (an empty truth set means the corpus has
    * no near-dup pairs at the threshold — not an error).
    *
    * Scale shape: both sides reuse their operators' own bucketed plans (never
    * all-pairs); the hit count is one pair-keyed equi-join; the report is a
    * cross join of three 1-row aggregates.
    */
  def lshTuningReport(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 1,
      threshold: Double = 0.2,
      maxShingleDocFreq: Int = 100
  ): DataFrame = {
    val truth = ngramJaccardPairs(df, idCol, textCol, shingleSize, threshold,
        maxShingleDocFreq)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint(true) // the count aggregate + the hit join
    val cand = minhashLshPairs(df, idCol, textCol, shingleSize, bands, rowsPerBand)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint(true) // same
    val hits = cand.join(truth, Seq("id_a", "id_b"), "left_semi")
    val t = truth.agg(count(lit(1)).as("n_true"))
    val c = cand.agg(count(lit(1)).as("n_candidates"))
    val h = hits.agg(count(lit(1)).as("n_hits"))
    def rate(num: Column, den: Column): Column =
      when(den === 0L, 0L)
        .otherwise(floor(lit(1000000.0) * num.cast("double") / den.cast("double")
          + lit(0.5)).cast("long"))
    t.crossJoin(c).crossJoin(h)
      .select(col("n_true"), col("n_candidates"), col("n_hits"),
        rate(col("n_hits"), col("n_true")).as("recall_micro"),
        rate(col("n_hits"), col("n_candidates")).as("precision_micro"))
  }

  /** d26 — LSH AUTO-TUNE: the d25 report swept over a grid of (bands, rows)
    * splits of one fixed signature budget (bands × rows = 16 hashes for every
    * config, so all configs share the SAME minhash pipeline cost and differ
    * only in how the signature is banded), plus a deterministic pick: the
    * cheapest config (fewest candidate pairs to verify) whose recall against
    * the exact d04 truth clears `recallFloorMicro`; if none qualify, the pick
    * degrades to max recall. This is the grid-search job you run on a sample
    * BEFORE the 100 TB pass — d25 measured ONE dial setting (and found 16×1
    * buys recall 1.0 at precision 0.017); d26 is the loop that turns that
    * measurement into a configuration decision, the published S-curve
    * trade-off (1−(1−j^r)^b) measured instead of assumed.
    *
    * Scale shape: the exact truth (the expensive side) is computed ONCE and
    * checkpointed; each config reuses the capped band-bucket kernel (never
    * all-pairs) and contributes three 1-row aggregates; the chosen pick is a
    * window over the |configs|-row report. Everything after the per-config
    * pair joins is catalog-sized.
    */
  def lshAutoTune(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      configs: Seq[(Int, Int)] = Seq((16, 1), (8, 2), (4, 4)),
      threshold: Double = 0.2,
      recallFloorMicro: Long = 800000L,
      maxShingleDocFreq: Int = 100,
      maxBucketMembers: Long = 10000L
  ): DataFrame =
    lshTuneSweep(df, idCol, textCol, shingleSize, configs, threshold,
      recallFloorMicro, maxShingleDocFreq, maxBucketMembers)._1

  /** The d26 sweep with its per-config CHECKPOINTED candidate relations kept —
    * [[autoTunedClusters]] clusters straight off the chosen config's pairs
    * instead of re-running the shingle+minhash pipeline.
    */
  private def lshTuneSweep(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      configs: Seq[(Int, Int)],
      threshold: Double,
      recallFloorMicro: Long,
      maxShingleDocFreq: Int,
      maxBucketMembers: Long
  ): (DataFrame, Seq[((Int, Int), DataFrame)]) = {
    import org.apache.spark.sql.expressions.Window
    // r18: hash the corpus ONCE — the (id, h) shingle-hash relation feeds the
    // exact-Jaccard truth AND (reduced mod p) the shared wide minhash row every
    // config's band signatures slice from. The old sweep re-ran the
    // WordShingles + md5 pipeline once for the truth and once PER config
    // (1 + |configs| corpus hash passes; this is the dominant per-pass cost).
    val hs = shingleHashes(df, idCol, textCol, shingleSize)
      .localCheckpoint(true) // truth + the wide signature aggregation
    def rate(num: Column, den: Column): Column =
      when(den === 0L, 0L)
        .otherwise(floor(lit(1000000.0) * num.cast("double") / den.cast("double")
          + lit(0.5)).cast("long"))
    // r18: the exact truth and the minhash side are independent off the shared
    // hash checkpoint — overlap them, and the per-config pair relations too
    // (the s45 Par shape)
    val (truth, cands) = Par.join2(
      sharedItemPairCounts(hs, idCol, maxShingleDocFreq.toLong)
        .withColumn(
          "jaccard",
          round(col("n_shared").cast("double") /
            (col("n_a") + col("n_b") - col("n_shared")).cast("double"), 6)
        )
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint(true), // one count + one hit join per config
      {
        val wide = minhashWideFromHm(
            hs.select(col(idCol), (col("h") % MinhashPrime).as("hm")),
            idCol, configs.map { case (b, r) => b * r }.max)
          .localCheckpoint(true) // each config's band explode reads this row
        val pairRels = Par.seq(configs.map { case (b, r) => () =>
          pairsFromBandSigs(bandSigsOfWide(wide, idCol, b, r), idCol, maxBucketMembers)
            .select(col("id_a"), col("id_b"))
            .localCheckpoint(true) // count + hit join (+ d28's clustering reuse)
        })
        configs.zip(pairRels)
      })
    val t = truth.agg(count(lit(1)).as("n_true"))
    val report = cands.map { case ((b, r), cand) =>
      val c = cand.agg(count(lit(1)).as("n_candidates"))
      val h = cand.join(truth, Seq("id_a", "id_b"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      t.crossJoin(c).crossJoin(h)
        .select(lit(b).as("bands"), lit(r).as("rows_per_band"),
          col("n_true"), col("n_candidates"), col("n_hits"),
          rate(col("n_hits"), col("n_true")).as("recall_micro"),
          rate(col("n_hits"), col("n_candidates")).as("precision_micro"))
    }.reduce(_ unionByName _)
    // the decision: qualify on the recall floor, then cheapest verify bill
    // AMONG qualifiers (a non-qualifier never wins on cheapness — its cost
    // rank is voided so the no-qualifier fallback is pure max-recall);
    // bands-desc tie-break (more bands = finer buckets at equal cost). The
    // global window runs over |configs| rows — never data-sized.
    val pick = Window.orderBy(
      col("qualifies").desc,
      when(col("qualifies") === 1, col("n_candidates"))
        .otherwise(lit(Long.MaxValue)).asc,
      col("recall_micro").desc,
      col("bands").desc)
    (report
      .withColumn("qualifies", (col("recall_micro") >= recallFloorMicro).cast("int"))
      .withColumn("chosen", (row_number().over(pick) === 1).cast("int")),
      cands)
  }

  /** d27 — MINHASH ESTIMATOR calibration: for every d02 candidate pair, the
    * Jaccard ESTIMATE the signature implies (matching permutations / numHashes
    * — the textbook unbiased minhash estimator) against the EXACT Jaccard of
    * the pair's distinct shingle-hash sets, with the absolute error. This is
    * the report that justifies (or indicts) the signature budget: d25/d26
    * measured the BANDING dial; d27 measures the ESTIMATOR itself — whether 16
    * permutations resolve the similarity scale the dedup threshold lives on
    * (the variance of the estimator is j(1−j)/k; at k = 16 that is ±0.125 at
    * j = 0.5, and this table is that formula made visible on real pairs).
    *
    * Scale shape: agreement is one map over candidate pairs joined to the
    * doc-count-sized wide signature relation (16 integer equality terms, no
    * explode); the exact side joins each candidate pair's distinct shingle
    * hashes — bounded by |candidates| × shingles-per-doc, never corpus².
    * All-integer half-up micro arithmetic.
    */
  def minhashEstimateReport(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 16,
      rowsPerBand: Int = 1,
      maxBucketMembers: Long = 10000L
  ): DataFrame = {
    val cand = minhashLshPairs(df, idCol, textCol, shingleSize, bands, rowsPerBand,
        maxBucketMembers)
      .localCheckpoint(true) // three consumers: agreement join + two exact-side joins
    val wide = minhashWide(shingles(df, idCol, textCol, shingleSize), idCol, numHashes)
      .localCheckpoint(true) // joined once per pair side
    val wa = wide.select(col(idCol).as("id_a") +:
      (0 until numHashes).map(k => col(s"mh$k").as(s"a$k")): _*)
    val wb = wide.select(col(idCol).as("id_b") +:
      (0 until numHashes).map(k => col(s"mh$k").as(s"b$k")): _*)
    val agreeExpr = (0 until numHashes)
      .map(k => when(col(s"a$k") === col(s"b$k"), 1L).otherwise(0L))
      .reduce(_ + _)
    val agree = cand.join(wa, "id_a").join(wb, "id_b")
      .select(col("id_a"), col("id_b"), agreeExpr.as("n_agree"))
    val hs = shingleHashes(df, idCol, textCol, shingleSize)
      .localCheckpoint(true) // sizes + both pair sides
    val sizes = hs.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val common = cand
      .join(hs.select(col(idCol).as("id_a"), col("h")), "id_a")
      .join(hs.select(col(idCol).as("id_b"), col("h")), Seq("id_b", "h"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_common"))
    agree
      .join(common, Seq("id_a", "id_b"), "left")
      .join(sizes.select(col(idCol).as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("n_agree"),
        expr(s"(2 * 1000000 * n_agree + $numHashes) DIV (2 * $numHashes)")
          .cast("long").as("est_micro"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        expr("(2 * 1000000 * coalesce(n_common, 0)" +
          " + (n_a + n_b - coalesce(n_common, 0)))" +
          " DIV (2 * (n_a + n_b - coalesce(n_common, 0)))")
          .cast("long").as("exact_micro"))
      .withColumn("abs_err_micro", abs(col("est_micro") - col("exact_micro")))
  }

  /** d28 — the d26 decision ACTUATED: near-dup clusters (the d05 kernel) under
    * the AUTO-TUNED banding. The driver reads the |configs|-row tuning report
    * (the retrainTrigger/s31 bounded-collect discipline — a catalog-sized
    * relation choosing the plan before it is built), then ONE clustering job
    * runs at the winning config, every output row stamped with the chosen
    * (bands, rows_per_band) provenance — the t42 gate-swap pattern applied to
    * the dedup dial: measure → decide → actuate, all oracle-checked (the
    * mirror re-derives the decision and gates three cluster chains on it, so
    * a drifted pick changes which chain emits and fails the hash).
    *
    * Scale shape: the report is the d26 job (capped kernels, shared truth);
    * the clustering is d05's bounded label propagation at the one chosen
    * config — never |configs| cluster jobs.
    */
  def autoTunedClusters(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      configs: Seq[(Int, Int)] = Seq((16, 1), (8, 2), (4, 4)),
      threshold: Double = 0.2,
      recallFloorMicro: Long = 800000L,
      rounds: Int = 3,
      maxBucketMembers: Long = 10000L
  ): DataFrame = {
    val (report, cands) = lshTuneSweep(df, idCol, textCol, shingleSize, configs,
      threshold, recallFloorMicro, maxShingleDocFreq = 100,
      maxBucketMembers = maxBucketMembers)
    val chosen = report
      .filter(col("chosen") === 1)
      .select(col("bands"), col("rows_per_band"))
      .collect() // |configs| rows upstream — catalog-sized by construction
    require(chosen.length == 1, s"autoTunedClusters: expected one chosen config, got ${chosen.length}")
    val (b, r) = (chosen(0).getInt(0), chosen(0).getInt(1))
    // cluster straight off the chosen config's checkpointed pairs — the
    // sweep already paid for them; never re-run the minhash pipeline
    val pairs = cands.collectFirst { case ((`b`, `r`), c) => c }.get
    clustersFromPairs(df, pairs, idCol, rounds)
      .withColumn("bands", lit(b))
      .withColumn("rows_per_band", lit(r))
  }

  def leakageReport(
      df: DataFrame,
      idCol: String,
      textCol: String,
      benchmarkMod: Long = 10L,
      shingleSize: Int = 5
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bh = shingleHashes(df.filter(col(idCol) % benchmarkMod === 0), idCol, textCol, shingleSize)
      .withColumnRenamed(idCol, "bench_id")
      .localCheckpoint(true) // two consumers: per-item totals and the probe
    val totals = bh.groupBy(col("bench_id")).agg(count(lit(1)).as("n_grams"))
    val hits = shingleHashes(df.filter(col(idCol) % benchmarkMod =!= 0), idCol, textCol, shingleSize)
      .withColumnRenamed(idCol, "train_id")
      .join(broadcast(bh), "h")
      .localCheckpoint(true) // two consumers: leaked-gram rollup and the offender pairs
    val leaked = hits.groupBy(col("bench_id"))
      .agg(countDistinct(col("h")).as("n_leaked"),
        countDistinct(col("train_id")).as("n_train_docs"))
    val wB = Window.partitionBy(col("bench_id"))
      .orderBy(col("n_shared").desc, col("train_id").asc)
    val worst = hits.groupBy(col("bench_id"), col("train_id"))
      .agg(count(lit(1)).as("n_shared")) // (bench, h, train) triples are distinct
      .withColumn("rk", row_number().over(wB)).filter(col("rk") === 1)
      .select(col("bench_id"), col("train_id").as("worst_train_id"),
        col("n_shared").as("worst_shared"))
    totals
      .join(leaked, Seq("bench_id"), "left")
      .join(worst, Seq("bench_id"), "left")
      .select(
        col("bench_id"), col("n_grams"),
        coalesce(col("n_leaked"), lit(0L)).as("n_leaked"),
        expr("(2 * 1000000 * coalesce(n_leaked, 0) + n_grams) div (2 * n_grams)")
          .cast("long").as("leak_frac_micro"),
        coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"),
        coalesce(col("worst_train_id"), lit(-1L)).as("worst_train_id"),
        coalesce(col("worst_shared"), lit(0L)).as("worst_shared"))
      .withColumn("dirty", (col("n_leaked") > 0L).cast("int"))
  }

  /** Persist the benchmark index range-clustered and sorted on the hash, so a probe
    * (or a point audit of one n-gram) row-group-skips on h — the saveDedupIndex
    * layout discipline.
    */
  def saveBenchIndex(index: DataFrame, path: String, files: Int = 16): Unit =
    index
      .repartitionByRange(math.max(files, 1), col("h"))
      .sortWithinPartitions(col("h"))
      .write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path)

  def loadBenchIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** SimHash: `bits`-bit signature from per-feature md5 hex-digit parities. Bit i of
    * the signature is the sign of Σ_features (2·parity(hexdigit_i(md5(feature))) − 1).
    * Features are word `shingleSize`-grams: unigrams (the default) profile a doc's
    * VOCABULARY; 3-grams profile its phrasing and are far more doc-discriminative
    * (on vocab-shared corpora unigram signatures collapse — most doc pairs land
    * within a few bits — while shingle signatures spread).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 16,
      shingleSize: Int = 1): DataFrame = {
    // shingles(n=1) = per-document-distinct tokens straight from the generator — the
    // posexplode + global distinct() formulation shuffled the whole token relation
    val toks = shingles(df, idCol, textCol, shingleSize).withColumnRenamed("shingle", "token")
    val withHash = toks.withColumn("h", md5(col("token")))
    val bitSums = (0 until bits).map { i =>
      sum((ascii(substring(col("h"), i + 1, 1)) % 2 * 2 - 1).cast("long")).as(s"s$i")
    }
    val sums = withHash.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until bits)
      .map(i => when(col(s"s$i") >= 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select(col(idCol), sig.as("simhash"))
  }

  /** SimHash near-dup PAIRS: documents whose `bits`-bit simhash signatures differ in at
    * most `maxDist` bits. Candidate generation is banded (the signature split into
    * `bands` contiguous bit-bands; a pair is a candidate iff SOME band matches
    * exactly), so by pigeonhole every pair within `maxDist < bands` Hamming distance
    * is found WITHOUT an all-pairs comparison — the simhash analogue of d02's
    * MinHash-LSH banding. Verification is exact: `bit_count(sig_a ^ sig_b)`.
    *
    * Scale shape: one map-side-combinable agg for signatures (see [[simhash]]), a
    * 4×-explode into (band, band_value) keys, one equi-join on those keys, and a
    * distinct over surviving pairs. Band values are `bits/bands`-wide, so bucket
    * population — and with it the candidate-pair count — falls geometrically with
    * band width; no cross join anywhere (pinned by spec).
    */
  def simhashHammingPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int = 32,
      bands: Int = 4,
      maxDist: Int = 3,
      shingleSize: Int = 3
  ): DataFrame = {
    require(bits % bands == 0 && maxDist < bands,
      "banding finds all pairs only when maxDist < bands")
    val bandBits = bits / bands
    val mask = (1L << bandBits) - 1
    // 3-gram features, NOT unigrams: phrase-level signatures keep the band buckets
    // sparse (unigram simhash collapses on vocab-shared corpora — measured 31% of all
    // pairs within hamming 3 vs 0.02% for shingles on the sf0.01 table)
    val sig = simhash(df, idCol, textCol, bits, shingleSize)
      .localCheckpoint(true) // consumed by both sides of the band self-join
    val banded = sig.select(
      col(idCol), col("simhash"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask)).as("bval"))): _*)).as("bk"))
      .select(col(idCol), col("simhash"), col("bk.band"), col("bk.bval"))
    val left = banded.select(col(idCol).as("id_a"), col("simhash").as("sig_a"), col("band"), col("bval"))
    val right = banded.select(col(idCol).as("id_b"), col("simhash").as("sig_b"), col("band"), col("bval"))
    left.join(right, Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("CAST(bit_count(sig_a ^ sig_b) AS INT)").as("hamming"))
      // filter BEFORE the distinct: hamming is a pure function of the pair, so the
      // dedup shuffle only carries surviving pairs (the overwhelming majority of
      // band collisions are not near-dups and die here)
      .filter(col("hamming") <= maxDist)
      .distinct() // a pair agreeing in several bands is one result row
  }

  /** Boilerplate-passage scoring: the fraction of each document's shingles that are
    * corpus-wide boilerplate (doc frequency ≥ `minDocFreq`) — the template/navigation
    * detection step of web-corpus curation (documents that are mostly high-frequency
    * passages are near-templates and get filtered or stripped). Output: one row per
    * shingle-bearing document (docs shorter than `shingleSize` tokens have no shingles
    * and are not scored).
    *
    * Scale shape: the hot-shingle set is SMALL by construction (shingles repeated in
    * ≥ minDocFreq documents are a tiny fraction of the shingle vocabulary even at
    * 10⁹ docs — Zipf tail), so it is computed with one map-side-combinable agg and then
    * BROADCAST against the shingle stream: the per-doc counts are partition-local
    * aggregations of generator output, never a shuffle of the full shingle relation
    * through a join. The only full shuffles move 8-byte hashed shingle keys (the d04
    * idiom).
    */
  def boilerplate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      minDocFreq: Int = 25
  ): DataFrame = {
    val shAll = shingles(df, idCol, textCol, shingleSize)
      .select(col(idCol),
        conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long").as("h"))
      .localCheckpoint(true)
    val hot = shAll.groupBy(col("h"))
      .agg(count(lit(1)).as("df_count"))
      .filter(col("df_count") >= minDocFreq)
      .select(col("h"))
    val perDoc = shAll.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    val hotPerDoc = shAll.join(broadcast(hot), Seq("h"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_boilerplate"))
    perDoc.join(hotPerDoc, Seq(idCol), "left_outer")
      .na.fill(0L, Seq("n_boilerplate"))
      .select(
        col(idCol), col("n_shingles"), col("n_boilerplate"),
        round(col("n_boilerplate").cast("double") / col("n_shingles").cast("double"), 6)
          .as("boilerplate_frac"))
  }

  /** Per-source n-gram novelty: for each source, the fraction of its distinct shingles
    * that appear in NO other source — the diversity signal corpus-mixing decisions
    * weigh (a source whose shingles are mostly shared adds little new content at any
    * mixing weight). Exact-integer counts, one final division.
    *
    * Scale shape: per-(source, shingle-hash) distinct (one shuffle of 8-byte keys),
    * then a shingle-spread aggregation and a per-source rollup — all
    * map-side-combinable hash aggregations on hashed keys; no self-join at all.
    */
  def sourceNovelty(
      df: DataFrame,
      sourceCol: String,
      textCol: String,
      shingleSize: Int = 3
  ): DataFrame = {
    val ss = shingles(df, sourceCol, textCol, shingleSize)
      .select(col(sourceCol),
        conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long").as("h"))
      .distinct()
      .localCheckpoint(true) // two consumers: the spread agg and the rollup join
    val spread = ss.groupBy(col("h")).agg(count(lit(1)).as("n_sources"))
    ss.join(spread, Seq("h"))
      .groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("n_sources") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        round(col("n_unique").cast("double") / col("n_shingles").cast("double"), 6))
  }

  /** Duplicate n-gram fraction — the Gopher-style per-document quality signal: the share
    * of a document's distinct word n-grams that also occur in at least one OTHER
    * document. High values flag boilerplate/templated docs that exact and pairwise
    * near-dup both miss (no single pair is similar, but every shingle is corpus-common).
    *
    * Scale shape: one doc-frequency hash-agg over 60-bit shingle hashes (map-side
    * combinable, 8-byte keys) + one equi-join back — no self-join, no pair blowup.
    * Docs too short to have any n-gram are kept via the left join with fraction 0
    * (the t04 empty-doc lesson: dropping them silently would corrupt downstream
    * per-doc joins).
    */
  def dupNgramFraction(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3
  ): DataFrame = {
    val sh = shingles(df, idCol, textCol, shingleSize)
      .select(col(idCol),
        conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long").as("h"))
      .localCheckpoint(true) // two consumers: doc-frequency agg and the rollup join
    val docFreq = sh.groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
    val perDoc = sh.join(docFreq, Seq("h"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_dup"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left_outer")
      .select(
        col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        when(coalesce(col("n_shingles"), lit(0L)) === 0L, lit(0.0))
          .otherwise(round(col("n_dup").cast("double") / col("n_shingles").cast("double"), 6))
          .as("dup_fraction"))
  }

  /** Cross-document duplicated SPANS — the exact-substring dedup of Lee et al. 2021
    * ("Deduplicating Training Data Makes Language Models Better"), re-expressed
    * relationally: a token window duplicated verbatim in ≥ 2 documents marks its
    * positions, and runs of adjacent duplicated window starts merge into MAXIMAL
    * spans (start, length) per document — the spans a curation pipeline cuts out,
    * where d11 only scores the document as a whole. The suffix-array machinery of the
    * paper is a single-node construction; the same spans fall out of three shuffles:
    *
    *   1. positioned n-gram windows (occurrence-level, [[org.apache.spark.sql.graft.PositionedWordShingles]])
    *      hashed to 60-bit md5 longs — 8-byte shuffle keys, the d04 idiom;
    *   2. document frequency per window hash over DISTINCT (doc, hash) — windows in
    *      ≥ 2 docs are the duplicated ones (map-side-combinable count);
    *   3. the classic gaps-and-islands fold per document: `pos − row_number()` is
    *      constant exactly on runs of consecutive duplicated starts, so one groupBy
    *      (doc, run) yields each maximal span. A run of L adjacent duplicated n-gram
    *      starts covers L + n − 1 tokens; `minSpanTokens` keeps only spans long
    *      enough to be worth cutting (the paper's 50-token bar, scaled to corpus).
    *
    * Scale shape: no self-join, no pairs — cost is linear in corpus token count; the
    * only window function partitions by document (bounded by doc length). The df agg
    * and the dup-hash join both move hashed longs. A 60-bit collision merges two
    * windows corpus-wide (odds ~|windows|²/2⁶¹, mirrored exactly by the oracle).
    *
    * This is the INVENTORY; the removal decision (span identity, sharing
    * census, canonical keeper, cut verdicts) is [[repeatedSpanRegistry]] (d30),
    * which rides the same [[dupSpanRuns]] kernel.
    */
  def dupSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 5,
      minSpanTokens: Int = 8
  ): DataFrame =
    dupSpanRuns(df, idCol, textCol, windowTokens)
      .filter(col("span_end") - col("span_start") + 1 >= minSpanTokens)
      .select(col(idCol), col("span_start"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))

  /** The ONE rendition of the duplicated-span kernel, shared by the d14
    * inventory ([[dupSpans]]) and the d30 registry ([[repeatedSpanRegistry]]):
    * positioned window hashes → doc-frequency ≥ 2 marks duplicated starts →
    * the gaps-and-islands fold merges adjacent starts into maximal
    * (id, span_start, span_end) runs. No min-length cut here — each consumer
    * applies its own bar.
    */
  /** The one rendition of the POSITIONED window-hash relation (id, pos, h) —
    * the d14/d30 span kernel's first stage, shared with the d40 index/probe
    * split: every `windowTokens`-word window of every document, 1-based
    * position, first 60 md5 bits as the window's integer identity.
    */
  private def positionedSpanHashes(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int
  ): DataFrame =
    Scans.fanOut(df)
      .select(col(idCol),
        org.apache.spark.sql.graft.PositionedWordShingles.column(col(textCol), windowTokens))
      .select(col(idCol), col("pos"),
        conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long").as("h"))

  private[graft] def dupSpanRuns(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pg = positionedSpanHashes(df, idCol, textCol, windowTokens)
      .localCheckpoint(true) // two consumers: the doc-frequency agg and the span fold
    val dup = pg.select(col(idCol), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"))
    val runs = pg.join(dup, Seq("h"))
      .withColumn("grp",
        col("pos") - row_number().over(Window.partitionBy(col(idCol)).orderBy(col("pos"))))
    runs
      .groupBy(col(idCol), col("grp"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(windowTokens.toLong - 1)).as("span_end"))
  }

  /** d33 — the CUT actuated: apply the d30 registry's verdicts and materialize
    * the post-cut document surgery — for every document that loses at least
    * one span, the token counts before/after, the number of spans cut, and
    * the 60-bit md5 of the REBUILT text (cut positions removed, survivors
    * re-joined in order) — the per-document receipt of the Lee-et-al.
    * remove-all-but-one step, content-addressable so a downstream sink can
    * verify the surgery it applied matches the manifest. Overlapping cut
    * ranges in one document (two maximal spans whose token ranges intersect —
    * possible when islands sit closer than the window width) are handled by
    * POSITION-set semantics: a token is cut if ANY cut range covers it, so
    * `tokens_cut` is exact, never double-counted. A fully-cut document
    * reports tokens_after = 0 with the hash of the empty string.
    *
    * Scale shape: the cut-ranges relation is one row per document WITH cuts —
    * at published web-corpus duplication rates (1–10% of documents carry
    * repeated spans, the rate this operator exists for) that is
    * corpus-PROPORTIONAL, so the join must not be hint-forced to broadcast
    * (the r15-verdict scale-killer): it is a plain equi-join on the doc id
    * and AQE picks the build side, broadcasting only when the ranges side
    * actually fits. The rebuild is a codegen'd higher-order filter/transform
    * over the token array (no explode); only documents WITH cuts are emitted.
    */
  def repeatedSpanCut(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 8,
      minSpanTokens: Int = 16
  ): DataFrame = {
    applySpanCuts(df, idCol, textCol,
      repeatedSpanRegistry(df, idCol, textCol, windowTokens, minSpanTokens)
        .filter(col("cut") === 1)
        .select(col(idCol).as("doc"), col("span_start").as("s"),
          (col("span_start") + col("span_tokens") - 1L).as("e")))
  }

  /** The one rendition of the POSITION-SET surgery (shared by d33's
    * registry-driven cut and d40's probe-driven cut): `cuts` is (doc, s, e)
    * token ranges; a token is cut if ANY range covers it (overlap-safe, never
    * double-counted), and only documents WITH cuts are emitted, each with the
    * before/after counts and the 60-bit hash of the rebuilt text.
    */
  private def applySpanCuts(
      df: DataFrame,
      idCol: String,
      textCol: String,
      cuts: DataFrame
  ): DataFrame = {
    val ranges = cuts.groupBy(col("doc"))
      .agg(count(lit(1)).as("n_spans_cut"),
        collect_list(struct(col("s"), col("e"))).as("rs"))
    df.select(col(idCol).as("doc"), split(col(textCol), " ", -1).as("ts"))
      .join(ranges, Seq("doc")) // inner: only documents with cuts; AQE sizes the build side
      .withColumn("kept", expr(
        "filter(transform(sequence(1, size(ts)), " +
          "i -> IF(exists(rs, r -> i >= r.s AND i <= r.e), NULL, element_at(ts, i))), " +
          "x -> x IS NOT NULL)"))
      .select(col("doc").as(idCol),
        col("n_spans_cut"),
        size(col("ts")).cast("long").as("tokens_before"),
        (size(col("ts")) - size(col("kept"))).cast("long").as("tokens_cut"),
        size(col("kept")).cast("long").as("tokens_after"),
        conv(substring(md5(array_join(col("kept"), " ")), 1, 15), 16, 10)
          .cast("long").as("kept_text_h"))
  }

  /** d40's artifact half — the SPAN-HASH INDEX of an archive: every distinct
    * positioned-window hash the corpus contains, the substring-dedup analog of
    * [[benchIndex]]/[[exactHashIndex]] (the d19/d20 index discipline applied
    * to the d30 kernel). An arrival that repeats ANY archived text — even text
    * the archive holds only once — creates a duplicate span (archive copy +
    * arrival copy), and the Lee-et-al. remove-all-but-one rule keeps the
    * archive's: so the index is the archive's FULL window-hash set, not just
    * its internally-duplicated windows. Built once per corpus generation on a
    * standing cadence; probed per ingest batch by [[probeSpanIndex]].
    *
    * Scale shape: one text map pass + one distinct — corpus-window-sized, the
    * same order as the suffix-array/window indexes the published substring
    * dedup pipelines maintain. Persist with [[saveSpanHashIndex]] (h
    * range-clustered so the probe join row-group-skips).
    */
  def spanHashIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 8
  ): DataFrame =
    positionedSpanHashes(df, idCol, textCol, windowTokens)
      .select(col("h"))
      .distinct()

  /** Persist a [[spanHashIndex]] range-clustered and sorted on `h`: the d38
    * layout discipline — a batch's probe join prunes to the row groups its
    * window hashes actually name.
    */
  def saveSpanHashIndex(index: DataFrame, path: String, nFiles: Int = 16): Unit =
    index.select(col("h")).distinct()
      .repartitionByRange(math.max(nFiles, 1), col("h"))
      .sortWithinPartitions(col("h"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  def loadSpanHashIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** d40 — INGEST-TIME substring-dedup probe: which token spans of an arriving
    * batch already exist verbatim in the archive's [[spanHashIndex]] — the
    * d19/d20 probe posture applied to the d30 span kernel, closing the third
    * dedup policy's streaming loop (exact dedup probes d37's bloom+index,
    * semantic dedup probes d35's trained cells, and substring dedup probes
    * this). Each arrival's positioned window hashes are semi-joined against
    * the index, consecutive hits fold into maximal runs (the same
    * pos − row_number() grouping as [[dupSpanRuns]] — a probe-side rendition
    * of the published matching-window union), and runs of at least
    * `minSpanTokens` report as (id, span_start, span_tokens). Flag with this,
    * or actuate the cut with [[probeSpanCut]], BEFORE the corpus sink.
    *
    * A span the batch duplicates INTERNALLY but the archive has never seen is
    * NOT reported — that is d30's job on the next corpus cadence; this probe
    * answers only "does the archive already have it", which is what decides
    * whether the arrival's copy is redundant on arrival.
    *
    * Scale shape: the probe side is batch-sized (one text map pass over the
    * arrivals); the join keys by the 8-byte window hash against the
    * range-clustered artifact (pruned read, the d38 posture); run folding is
    * a per-document window over the batch's HIT rows only. Nothing
    * corpus-sized moves per batch.
    */
  def probeSpanIndex(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      index: DataFrame,
      windowTokens: Int = 8,
      minSpanTokens: Int = 16
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowTokens >= 2,
      s"probeSpanIndex: windowTokens must be >= 2, got $windowTokens")
    require(minSpanTokens >= windowTokens,
      s"probeSpanIndex: minSpanTokens ($minSpanTokens) must be >= " +
        s"windowTokens ($windowTokens)")
    // the artifact-shape guard of the sibling probes (probeSavedExactIndex's
    // hp require): a wrong-shaped relation would silently probe non-hashes
    // and wave every duplicate through as novel
    require(index.columns.contains("h"),
      s"probeSpanIndex: index must be a spanHashIndex artifact (h column), " +
        s"got [${index.columns.mkString(", ")}]")
    val hits = positionedSpanHashes(batch, idCol, textCol, windowTokens)
      .join(index.select(col("h")), Seq("h"), "left_semi")
    hits
      .withColumn("grp",
        col("pos") - row_number().over(Window.partitionBy(col(idCol)).orderBy(col("pos"))))
      .groupBy(col(idCol), col("grp"))
      .agg(min(col("pos")).as("s"),
        (max(col("pos")) + lit(windowTokens.toLong - 1)).as("e"))
      .filter(col("e") - col("s") + 1 >= minSpanTokens)
      .select(col(idCol), col("s").cast("long").as("span_start"),
        (col("e") - col("s") + 1).cast("long").as("span_tokens"))
  }

  /** d41 — the d40 probe ACTUATED: cut every archived span from the arrivals
    * before the sink ([[applySpanCuts]], the d33 surgery — overlap-safe
    * position sets, rebuilt-text receipts). Every probed span is cut: the
    * archive holds the keeper occurrence by definition, so an arrival never
    * wins the Lee-et-al. keep-one rule against it.
    */
  def probeSpanCut(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      index: DataFrame,
      windowTokens: Int = 8,
      minSpanTokens: Int = 16
  ): DataFrame =
    applySpanCuts(batch, idCol, textCol,
      probeSpanIndex(batch, idCol, textCol, index, windowTokens, minSpanTokens)
        .select(col(idCol).as("doc"), col("span_start").as("s"),
          (col("span_start") + col("span_tokens") - 1L).as("e")))

  /** d34 — the d29 ROI line for SUBSTRING dedup: per source, raw token mass vs
    * the mass surviving the d33 cut, with the saved-token share — what the
    * repeated-span pass buys on this corpus, read beside d29 (doc-level
    * near-dup savings) and d32 (semantic savings); the three reports price the
    * three dedup POLICIES on the same raw mass.
    *
    * Scale shape: d33's kernels plus one checkpointed token-count scan and two
    * map-side-combinable rollups; |sources|-row output.
    */
  def repeatedSpanSavings(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      windowTokens: Int = 8,
      minSpanTokens: Int = 16
  ): DataFrame = {
    val perDoc = df.select(col(idCol).as("doc"), col(sourceCol).as("source"),
        TextStats.tokenCount(col(textCol)).as("n_toks"))
      .localCheckpoint(true) // raw rollup + cut join off one text scan
    val cut = repeatedSpanCut(df, idCol, textCol, windowTokens, minSpanTokens)
      .select(col(idCol).as("doc"), col("tokens_cut"))
    val raw = perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    val ca = perDoc.join(cut, Seq("doc"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_cut"), sum(col("tokens_cut")).as("tokens_cut"))
    raw.join(ca, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        coalesce(col("n_docs_cut"), lit(0L)).as("n_docs_cut"),
        coalesce(col("tokens_cut"), lit(0L)).as("tokens_cut"),
        (col("n_tokens") - coalesce(col("tokens_cut"), lit(0L))).as("n_tokens_after"),
        expr("(2 * 1000000 * coalesce(tokens_cut, 0) + n_tokens)" +
          " DIV (2 * n_tokens)").cast("long").as("saved_tokens_micro"))
  }

  /** n-gram Jaccard near-dup: inverted-index self-join on HASHED shingles (candidates =
    * pairs sharing ≥1 shingle, with the intersection count falling out of the same
    * groupBy), then |∩| / |∪| ≥ threshold. The only float is one final division of two
    * exact integers.
    *
    * Skew guard: shingles appearing in more than `maxShingleDocFreq` documents
    * (boilerplate like " of the ") are dropped BEFORE the self-join — without it one
    * hot shingle makes the candidate join quadratic on that key at corpus scale. The
    * Jaccard is defined over the rare-shingle sets (sizes and intersections from the
    * same filtered relation, so the score stays internally consistent).
    *
    * Shuffle diet: every post-generation stage operates on the first 60 bits of
    * md5(shingle) (the d02 oracle-portable idiom) instead of the shingle string — the
    * dominant shuffles (doc-freq agg, the self-join, the pair groupBy) move 8-byte
    * longs, not ~20-byte strings. A 60-bit collision would merge two shingles
    * corpus-wide (odds ~|shingles|²/2⁶¹ — negligible, and mirrored exactly by the
    * oracle, which hashes identically).
    *
    * Prefix filtering was measured and rejected for this operator: with a doc-freq cap
    * already in place, nearly every candidate pair shares exactly ONE shingle
    * (|distinct pairs| ≈ |collision rows|), so the count-in-groupBy above is optimal —
    * a prefix+verify split still shuffles all collisions AND re-joins per-pair state
    * (measured 2.5× slower at sf0.1 in both the probe-join and array-intersect forms).
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.2,
      maxShingleDocFreq: Int = 100
  ): DataFrame = {
    val shAll = shingles(df, idCol, textCol, shingleSize)
      .select(col(idCol),
        conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long").as("h"))
    sharedItemPairCounts(shAll, idCol, maxShingleDocFreq)
      .withColumn(
        "jaccard",
        round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double"), 6)
      )
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** The pairwise set-overlap kernel shared by d04's shingle Jaccard and m06's
    * clip-frame Jaccard (reviewed r10: the two had drifted into near-identical
    * copies): from an (id, h) item relation, apply the doc-freq skew cap, self-join
    * the ADMITTED items on h (id_a < id_b), and return intersection + BOTH set
    * sizes — sizes measured over the SAME capped relation as the intersection, so
    * the score downstream is the internally-consistent rare-set Jaccard (sizes
    * from the uncapped relation would bias every score containing a hot item
    * downward). Callers apply their own quantization/threshold.
    *
    * Scale shape: the item relation is checkpointed once for its four consumers
    * (census, cap join, sizes, both self-join sides); candidates only ever come
    * from the shared-item equi-join — never ids × ids — and the cap bounds the
    * hottest item's fan-out at cap².
    */
  private[pipeline] def sharedItemPairCounts(
      items: DataFrame,
      idCol: String,
      maxItemDocFreq: Long
  ): DataFrame = {
    val all = items.localCheckpoint(true)
    val rare = all.groupBy(col("h"))
      .agg(count(lit(1)).as("df_count"))
      .filter(col("df_count") <= maxItemDocFreq)
      .select(col("h"))
    val adm = all.join(rare, Seq("h")).localCheckpoint(true)
    val sizes = adm.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    adm.select(col(idCol).as("id_a"), col("h"))
      .join(adm.select(col(idCol).as("id_b"), col("h")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col(idCol).as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("n").as("n_b")), Seq("id_b"))
  }

  /** Fuzzy near-dup pairs: minhash-collision candidates verified by Levenshtein edit
    * distance on fixed-length text prefixes — the character-level complement of the
    * shingle/Jaccard family (it catches small in-word edits that shatter every
    * containing shingle). Edit distance is O(prefixLen²) per pair, so it must NEVER
    * run all-pairs: candidates come from the same minhash equi-join discipline as
    * d02, and the verification is a map over the candidate relation.
    */
  def fuzzyPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      prefixLen: Int = 48,
      maxDist: Int = 16
  ): DataFrame = {
    val mh = minhash(shingles(df, idCol, textCol, shingleSize), idCol, numHashes)
      .localCheckpoint(true) // both sides of the candidate self-join
    val cand = mh.select(col(idCol).as("id_a"), col("k"), col("minhash"))
      .join(mh.select(col(idCol).as("id_b"), col("k"), col("minhash")), Seq("k", "minhash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
      // candidate rows are BYTE-cheap but VERIFY-expensive (O(prefixLen²) per row),
      // so AQE's size-based coalescing collapses the edit-distance stage to one task
      // — pin explicit parallelism (numbered repartitions are exempt from coalescing;
      // measured 3.6 s -> 0.4 s on the verify stage at sf0.1)
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    val pref = df.select(col(idCol), substring(col(textCol), 1, prefixLen).as("pref"))
    cand
      .join(pref.select(col(idCol).as("id_a"), col("pref").as("pref_a")), Seq("id_a"))
      .join(pref.select(col(idCol).as("id_b"), col("pref").as("pref_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("pref_a"), col("pref_b")).as("edit_dist"))
      .filter(col("edit_dist") <= maxDist)
  }

  /** Shingle containment C(a→b) = |A∩B| / |A| — the asymmetric near-dup signal that
    * Jaccard misses: a short document quoted wholesale inside a long one scores high
    * containment but low Jaccard. Emits BOTH directions of every candidate pair
    * (a→b and b→a score differently), threshold on the containment of the LEFT doc.
    *
    * Same scale discipline as ngramJaccardPairs: one hashed-shingle relation
    * materialized for all consumers, boilerplate shingles above maxShingleDocFreq
    * dropped before the inverted-index self-join (the cap applies to numerator AND
    * denominator, in lockstep with the oracle).
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.3,
      maxShingleDocFreq: Int = 100
  ): DataFrame = {
    val shAll = shingles(df, idCol, textCol, shingleSize)
      .select(col(idCol),
        conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long").as("h"))
      .localCheckpoint(true)
    val rare = shAll.groupBy(col("h"))
      .agg(count(lit(1)).as("df_count"))
      .filter(col("df_count") <= maxShingleDocFreq)
      .select(col("h"))
    val sh = shAll.join(rare, Seq("h")).localCheckpoint(true)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    // aggregate ordered pairs once (half the shuffle/agg state) and mirror after:
    // n_common is symmetric, only the n_a join below is direction-specific
    val half = sh.select(col(idCol).as("id_a"), col("h"))
      .join(sh.select(col(idCol).as("id_b"), col("h")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
    val common = half.unionByName(
      half.select(col("id_b").as("id_a"), col("id_a").as("id_b"), col("n_common")))
    common
      .join(sizes.select(col(idCol).as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .withColumn(
        "containment",
        round(col("n_common").cast("double") / col("n_a").cast("double"), 6))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  /** d17 — INCREMENTAL dedup: check documents that arrived after `cutId` against
    * the existing corpus' band index, without ever re-pairing the existing corpus
    * with itself — the production mode of LSH dedup at 100 TB, where the index is
    * maintained and each ingest batch only probes it (batch-sigs ⋈ index on
    * (band, sig), an equi-join whose left side is ingest-sized). One row per NEW
    * document that collides with the existing corpus: the minimum existing doc id
    * it duplicates (`dup_of`, the d05 keeper convention) and how many bands
    * collided (`n_bands` — with `rowsPerBand` = 1 a collision count, not a
    * similarity estimate; the jaccard verification step stays d04/d10's job).
    *
    * Skew guard: the same `maxBucketMembers` cap as [[minhashLshPairs]], applied to
    * the INDEX side's cells (a boilerplate cell in the existing corpus would
    * otherwise fan every colliding ingest row out by its membership); recall for
    * over-cap cells falls to the exact operators by design, as in d02. The default
    * never binds at bench scale, so the DuckDB mirror stays capless-equivalent.
    */
  def incrementalDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      cutId: Long,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 1,
      maxBucketMembers: Long = 10000L
  ): DataFrame = {
    val sigs = bandSignatures(df, idCol, textCol, shingleSize, bands, rowsPerBand)
      .localCheckpoint(true) // index + probe sides both derive from one materialization
    incrementalDedupAgainst(
      sigs.filter(col(idCol) >= cutId), idCol,
      sigs.filter(col(idCol) < cutId), maxBucketMembers)
  }

  /** The probe half of [[incrementalDedup]], separated so the index can be a LOADED
    * artifact ([[saveDedupIndex]]/[[loadDedupIndex]] — train-once/probe-anywhere,
    * the s24 discipline applied to dedup). Both inputs are (id, band, sig)
    * relations.
    */
  def incrementalDedupAgainst(
      newSigs: DataFrame,
      idCol: String,
      index: DataFrame,
      maxBucketMembers: Long = 10000L
  ): DataFrame =
    probeDedupIndex(newSigs, idCol, capDedupIndex(index, idCol, maxBucketMembers))

  /** Apply the hot-cell membership cap to an index ONCE, yielding the admitted
    * (band, sig, existing_id) relation that [[probeDedupIndex]] joins against.
    * Split out so a standing ingest cadence pays the corpus-sized cell census a
    * single time at setup (checkpoint the result) instead of re-running it every
    * micro-batch — the cost [[graft.streaming.StreamOps.streamingIncrementalDedup]]
    * amortizes this way.
    */
  def capDedupIndex(
      index: DataFrame,
      idCol: String,
      maxBucketMembers: Long = 10000L
  ): DataFrame = {
    val smallCells = index.groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("cell_n"))
      .filter(col("cell_n") <= maxBucketMembers)
      .select(col("band"), col("sig"))
    index.join(smallCells, Seq("band", "sig"))
      .select(col("band"), col("sig"), col(idCol).as("existing_id"))
  }

  /** The census-free probe half: arrivals' signatures equi-join the already-capped
    * index on (band, sig) — per-call cost is ingest-sized.
    */
  def probeDedupIndex(newSigs: DataFrame, idCol: String, admitted: DataFrame): DataFrame =
    newSigs.join(admitted, Seq("band", "sig"))
      .groupBy(col(idCol))
      .agg(
        min(col("existing_id")).as("dup_of"),
        countDistinct(col("band")).as("n_bands"))

  /** Build the persistable band index of a corpus — the artifact an ingest cadence
    * probes. (id, band, sig) rows.
    */
  def dedupIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 1
  ): DataFrame = bandSignatures(df, idCol, textCol, shingleSize, bands, rowsPerBand)

  /** Persist the band index partitioned by band and sig-sorted within files, so an
    * ingest probe prunes to its band directories and row-group-skips on sig — the
    * saveCorpus layout discipline applied to the index artifact.
    */
  def saveDedupIndex(index: DataFrame, path: String, filesPerBand: Int = 1, bands: Int = 16): Unit =
    writeDedupIndex(index, path, org.apache.spark.sql.SaveMode.Overwrite, filesPerBand, bands)

  /** d21 — EXTEND the persisted band index with an ingest batch's signatures (the
    * admitted arrivals, after the d17 probe decided their fate): the maintenance
    * half of the dedup loop, so a real ingest cadence never rebuilds the index
    * from the corpus — probe (d17), ingest, append, repeat. New rows land as a
    * fresh file GENERATION inside the same band=N directories, each generation
    * sig-sorted within its files, so a probe's band-directory pruning and per-file
    * sig row-group skipping hold across generations unchanged (parquet dir
    * readers union files; the layout contract is per-file). The invariant the
    * round trip must keep — load(append(index, batchSigs)) probes identically to
    * the index rebuilt over corpus ∪ batch — is pinned in RoundTwelveOpsSpec and
    * oracle-checked by d21's CORRECTNESS entry.
    *
    * Scale shape: one ingest-sized sort+write per batch, nothing corpus-sized;
    * the generation count grows with the cadence, so compaction (re-save via
    * [[saveDedupIndex]] on the loaded union) is the occasional housekeeping job,
    * exactly like any LSM-flavored layout.
    */
  def appendToDedupIndex(
      batchSigs: DataFrame, path: String, filesPerBand: Int = 1, bands: Int = 16): Unit =
    writeDedupIndex(batchSigs, path, org.apache.spark.sql.SaveMode.Append, filesPerBand, bands)

  private def writeDedupIndex(
      index: DataFrame,
      path: String,
      mode: org.apache.spark.sql.SaveMode,
      filesPerBand: Int,
      bands: Int): Unit =
    index
      .repartitionByRange(math.max(filesPerBand, 1) * math.max(bands, 1), col("band"), col("sig"))
      .sortWithinPartitions(col("band"), col("sig"))
      .write
      .mode(mode)
      .partitionBy("band")
      .parquet(path)

  def loadDedupIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** d22 — COMPACT an appended band index back to `filesPerBand` files per band:
    * the housekeeping half of the d17→ingest→d21 loop (the LSM analogy's merge),
    * run on the maintenance cadence when a band directory's generation count
    * makes per-probe file planning noticeable. One index-sized read+write — the
    * loaded union re-saved through the [[saveDedupIndex]] layout (band dirs,
    * sig-sorted files), staged to a sibling path and swapped in with a
    * filesystem rename so a crash mid-compaction leaves the original index
    * intact, and nothing is ever held in executor memory beyond the write
    * shuffle. Probe results must be IDENTICAL before and after (pinned in
    * RoundThirteenOpsSpec alongside the file-count collapse; d22's CORRECTNESS
    * entry probes through a compacted index against d21's oracle).
    */
  def compactDedupIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      filesPerBand: Int = 1,
      bands: Int = 16
  ): Unit = {
    val staging = path + "__compacting"
    saveDedupIndex(loadDedupIndex(spark, path), staging, filesPerBand, bands)
    val hconf = spark.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(staging)
    val old = new org.apache.hadoop.fs.Path(path + "__precompact")
    val fs = dst.getFileSystem(hconf)
    // Swap order keeps a complete index recoverable at every instant: the live
    // index is renamed ASIDE (never deleted) before the staged one takes its
    // place, so a crash between the two renames leaves the original at
    // `__precompact` and the compacted copy at `__compacting` — either is a
    // full index. The delete of the retired generation is last and best-effort.
    fs.delete(old, true) // clear any leftover from a previously-crashed swap
    if (!fs.rename(dst, old))
      throw new java.io.IOException(s"compactDedupIndex: could not move $path aside for swap")
    if (!fs.rename(tmp, dst)) {
      fs.rename(old, dst) // restore the original before failing
      throw new java.io.IOException(
        s"compactDedupIndex: swap rename $staging -> $path failed; original restored, compacted index left at $staging")
    }
    fs.delete(old, true)
  }

  /** The d01-style EXACT content-hash index of a corpus: (existing_id, text_hash)
    * rows — the artifact [[bloomPrefilteredExactProbe]] probes. One md5 per
    * document; persist/partition like any hash relation.
    */
  def exactHashIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("existing_id"), md5(col(textCol)).as("text_hash"))

  /** The BIT SET of an exact index: each index hash sets 3 bit positions drawn
    * from disjoint 8-hex-char fields of the hash itself (the sk03 discipline —
    * one hash pass, no second digest). ≤ `mBits` distinct ints, computed ONCE
    * per index generation and checkpointed by a standing cadence, exactly like
    * [[capDedupIndex]] amortizes the band-cell census. At production scale this
    * relation is exchanged as Spark's `bloomFilter` aggregate literal; the
    * equi-join form here keeps the bit arithmetic oracle-reproducible, and AQE
    * picks broadcast vs shuffle by the bit set's actual size.
    */
  def exactBloomBits(index: DataFrame, mBits: Int = 1 << 18): DataFrame =
    index
      .select(explode(bloomPositions(col("text_hash"), mBits)).as("pos"))
      .distinct()
      // the build width rides the artifact: positions are only meaningful mod
      // the mBits they were computed at, and the probes require agreement
      .withColumn("m_bits", lit(mBits.toLong))

  /** Persist an [[exactBloomBits]] bit set WITH its width stamp — the sanctioned
    * artifact path (r16 advisory: a user who hand-writes `bits.select("pos")` to
    * parquet and reloads it sheds the `m_bits` stamp and silently reverts to the
    * unchecked legacy probe, reopening the false-negative hazard the stamp
    * closed). The relation is ≤ mBits rows of two small ints — one file.
    */
  def saveBloomBits(bits: DataFrame, path: String): Unit = {
    require(bits.columns.contains("m_bits"),
      "saveBloomBits: refusing to persist a width-less bit set — build it with " +
        "exactBloomBits so the m_bits stamp rides the artifact")
    bits.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
  }

  /** Reload a [[saveBloomBits]] artifact (positions and the width stamp are exact
    * integers — the round trip is bit-exact, and the [[requireBitsWidth]] guard
    * keeps firing on the reloaded relation). Symmetric with the save-side
    * refusal (r17 advisory): a parquet dir that lacks the `m_bits` stamp is not
    * a saveBloomBits artifact — loading it here would silently hand back a
    * width-less relation that reverts to the unguarded legacy probe, so it
    * fails loudly at load instead. Hand-rolled legacy bit sets can still be
    * probed directly (the probes themselves accept width-less relations with a
    * warning); this loader is the sanctioned artifact path and keeps its
    * guarantee.
    */
  def loadBloomBits(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    require(df.columns.contains("m_bits"),
      s"loadBloomBits: $path is not a saveBloomBits artifact (no m_bits width " +
        "stamp) — probing it would silently skip the build-width guard; persist " +
        "bit sets with saveBloomBits, or read legacy relations explicitly")
    df
  }

  /** The d37/d38 width guard: probing a bit set at a different `mBits` than it
    * was BUILT with computes positions mod the wrong width, so true duplicates
    * silently screen out as bloom negatives — a false-negative breach of the
    * "provably novel" contract. [[exactBloomBits]] stamps its build width on
    * the artifact; the probes verify it as a codegen'd `raise_error` guard
    * INSIDE the existing screen join — zero extra jobs (an eager distinct
    * here measured +0.5 s of pure job overhead per probe at sf0.1), and any
    * mismatched row still fails the action loudly before a single verdict is
    * emitted. A legacy width-less bit relation passes unchecked (the caller's
    * consistency is then on them, as before the stamp existed).
    */
  private def requireBitsWidth(bits: DataFrame, mBits: Int): DataFrame =
    if (!bits.columns.contains("m_bits")) {
      // legacy width-less relation: accepted for compatibility, but say so —
      // the caller has silently opted out of the false-negative guard
      // (persist via saveBloomBits/loadBloomBits to keep the stamp)
      System.err.println(
        s"[dedup] WARNING: probing a width-less bloom bit set at mBits=$mBits — " +
          "the build-width guard is OFF for this probe; persist the bit set with " +
          "saveBloomBits so the m_bits stamp rides the artifact")
      bits
    } else bits.select(
      when(col("m_bits") === lit(mBits.toLong), col("pos"))
        .otherwise(raise_error(concat(
          lit(s"bloom bit-set width mismatch: probing at mBits=$mBits but the " +
            "artifact was built at "),
          col("m_bits").cast("string"),
          lit(" — positions would be computed mod the wrong width and true " +
            "duplicates would silently screen out"))))
        .as("pos"))

  /** The 3 bloom bit positions of one content hash, deduped WITHIN the row. */
  private def bloomPositions(h: Column, mBits: Int): Column = {
    def pos(start: Int): Column =
      pmod(conv(substring(h, start, 8), 16, 10).cast("long"), lit(mBits.toLong))
    array_distinct(array(pos(1), pos(9), pos(17)))
  }

  /** d37 — BLOOM-PREFILTERED exact-dedup probe: the d17 ingest posture applied to
    * EXACT dedup, with a bloom screen in front of the index join. Every ingest
    * batch must be checked against the corpus-wide content-hash index; at 10⁹+
    * indexed documents that equi-join repartitions the index (or at least the
    * batch) EVERY batch, even though almost every arrival is novel. The bloom bit
    * set answers "provably novel?" first: a batch row probes its 3 bit positions
    * against [[exactBloomBits]], and only the bloom-POSITIVE rows — true
    * duplicates plus the false-positive trickle (≈ fill³ of the batch, ~10⁻⁵ at
    * 10 bits/key) — reach the real index join. Bloom negatives are provably
    * absent (no false negatives: every indexed hash set all 3 of its bits), so
    * the output is IDENTICAL to the unscreened probe — the oracle mirrors the
    * screen and the dup join, and the d37 hash proves the screen lossless.
    *
    * Output: one row per batch document — `bloom_pos` (did the screen pass it),
    * `dup_of` (min colliding existing id, −1 when novel), `n_index_copies`
    * (how many index rows share its content). `dup_of ≠ −1 ⇒ bloom_pos = 1`
    * structurally.
    *
    * Scale shape: the bit set is ONE corpus-sized pass at setup
    * ([[exactBloomBits]], checkpointed across batches by a standing cadence).
    * Per batch, the probe side of the index join is the positives-sized
    * filter — tiny enough that AQE broadcasts it, so the index is never
    * REPARTITIONED for a batch (the unscreened probe shuffles one side every
    * batch). The index-side scan that remains is a layout job: persist the
    * artifact partitioned by a hash PREFIX and put the prefix in the join key,
    * and dynamic partition pruning reads only the buckets the positives name
    * ([[saveExactIndex]]/[[probeSavedExactIndex]] — the d38 leg).
    */
  def bloomPrefilteredExactProbe(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      index: DataFrame,
      mBits: Int = 1 << 18
  ): DataFrame =
    bloomPrefilteredProbeAgainst(
      batch.select(col(idCol), md5(col(textCol)).as("text_hash")),
      idCol, index, exactBloomBits(index, mBits), mBits)

  /** The per-batch half of [[bloomPrefilteredExactProbe]], separated so a standing
    * cadence (or the streaming twin) reuses one checkpointed bit set and index
    * across batches. `batchHashes` is (id, text_hash); `bits` is the (pos) relation.
    */
  def bloomPrefilteredProbeAgainst(
      batchHashes: DataFrame,
      idCol: String,
      index: DataFrame,
      bits: DataFrame,
      mBits: Int = 1 << 18
  ): DataFrame = {
    val checkedBits = requireBitsWidth(bits, mBits)
    val bh = batchHashes
      .select(col(idCol), col("text_hash"), bloomPositions(col("text_hash"), mBits).as("ps"))
      .localCheckpoint(true) // consumed by the probe chain and the final left joins
    val positives = bh
      .select(col(idCol), size(col("ps")).as("n_pos"), explode(col("ps")).as("pos"))
      .join(checkedBits, Seq("pos"))
      .groupBy(col(idCol), col("n_pos"))
      .agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === col("n_pos")) // all probed bits set => bloom positive
      .select(col(idCol))
    val flagged = bh
      .join(positives.withColumn("bloom_pos", lit(1)), Seq(idCol), "left")
      .select(col(idCol), col("text_hash"), coalesce(col("bloom_pos"), lit(0)).as("bloom_pos"))
      .localCheckpoint(true) // bloom chain runs ONCE; dup join + final report both read this
    val dups = flagged
      .filter(col("bloom_pos") === 1) // ONLY positives reach the index join
      .join(index, Seq("text_hash"))
      .groupBy(col(idCol))
      .agg(min(col("existing_id")).as("dup_of"), count(lit(1)).as("n_index_copies"))
    flagged
      .join(dups, Seq(idCol), "left")
      .select(
        col(idCol),
        col("bloom_pos"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"),
        coalesce(col("n_index_copies"), lit(0L)).as("n_index_copies"))
  }

  /** d39 — BLOOM SIZING report: the d26 measure-then-actuate discipline applied
    * to the d37 screen. For each candidate bit-array size: the exact set-bit
    * census and fill ratio, the MEASURED false-positive rate on the labeled
    * probe batch (truth = the exact hash join, computed once), and the
    * theoretical fill³ rate beside it — then ONE config is `chosen`: the
    * smallest array whose measured FP rate meets `targetFpMicro` (the memory
    * bill scales with the array, so smallest-sufficient is the decision rule),
    * falling back to the largest candidate when none qualifies. The chosen row
    * is what a cadence feeds [[exactBloomBits]].
    *
    * Scale shape: index and batch hashes are computed ONCE and checkpointed;
    * each config re-derives bit positions from the SAME md5 fields (mod is the
    * only per-config arithmetic — no re-hashing) and pays one set-census + one
    * batch-sized probe; the report and the choice are |grid|-row relations.
    * At production scale the exact-truth labeling runs on a SAMPLED batch (the
    * d26 sample-first posture) — the FP rate is a ratio estimate, not a
    * corpus-sized join.
    */
  def bloomSizingReport(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      index: DataFrame,
      grid: Seq[Int] = Seq(1 << 10, 1 << 12, 1 << 16, 1 << 18),
      targetFpMicro: Long = 1000L
  ): DataFrame = {
    require(grid.nonEmpty && grid.forall(_ > 0), "bloomSizingReport: grid must be positive")
    val ix = index.localCheckpoint(true)
    val bh = batch
      .select(col(idCol), md5(col(textCol)).as("text_hash"))
      .localCheckpoint(true)
    // truth once: a batch row is a TRUE dup iff its content hash is indexed
    val novel = bh.join(ix.select(col("text_hash")), Seq("text_hash"), "left_anti")
      .select(col(idCol))
      .localCheckpoint(true)
    val perConfig = grid.sorted.map { m =>
      val bits = exactBloomBits(ix, m).localCheckpoint(true)
      val positives = bh
        .select(col(idCol), bloomPositions(col("text_hash"), m).as("ps"))
        .select(col(idCol), size(col("ps")).as("n_pos"), explode(col("ps")).as("pos"))
        .join(bits, Seq("pos"))
        .groupBy(col(idCol), col("n_pos"))
        .agg(count(lit(1)).as("n_hit"))
        .filter(col("n_hit") === col("n_pos"))
        .select(col(idCol))
      val fp = novel.join(positives, Seq(idCol))
        .agg(count(lit(1)).as("n_fp"))
      val counts = novel.agg(count(lit(1)).as("n_novel"))
      bits.agg(count(lit(1)).as("n_set"))
        .crossJoin(broadcast(counts))
        .crossJoin(broadcast(fp))
        .select(
          lit(m.toLong).as("m_bits"),
          col("n_set"),
          floor(lit(1000000.0) * col("n_set").cast("double") / lit(m.toDouble) + lit(0.5))
            .cast("long").as("fill_micro"),
          col("n_novel"),
          col("n_fp"),
          when(col("n_novel") === 0L, lit(0L))
            .otherwise(floor(lit(1000000.0) * col("n_fp").cast("double")
              / col("n_novel").cast("double") + lit(0.5)).cast("long"))
            .as("fp_measured_micro"),
          floor(lit(1000000.0)
            * (col("n_set").cast("double") / lit(m.toDouble))
            * (col("n_set").cast("double") / lit(m.toDouble))
            * (col("n_set").cast("double") / lit(m.toDouble)) + lit(0.5))
            .cast("long").as("fp_theory_micro"))
    }.reduce(_.unionByName(_))
      .localCheckpoint(true) // |grid| rows; read twice (report + choice)
    val pick = perConfig
      .select(col("m_bits"), col("fp_measured_micro"))
      .agg(
        min(when(col("fp_measured_micro") <= targetFpMicro, col("m_bits"))).as("ok_m"),
        max(col("m_bits")).as("max_m"))
      .select(coalesce(col("ok_m"), col("max_m")).as("chosen_m"))
    perConfig
      .crossJoin(broadcast(pick))
      .withColumn("chosen", (col("m_bits") === col("chosen_m")).cast("int"))
      .drop("chosen_m")
  }

  /** Persist an [[exactHashIndex]] PARTITIONED by the first two hex chars of the
    * content hash (256 uniform buckets — md5 is uniform by construction, so no
    * bucket skews). The partition column is what turns the per-batch index scan
    * into a pruned read: [[probeSavedExactIndex]] joins on (hp, text_hash), the
    * positives side broadcasts, and Catalyst's dynamic partition pruning reads
    * ONLY the hp buckets the positives actually name — a batch with p positives
    * touches ≤ p of 256 bucket directories, not the corpus.
    */
  def saveExactIndex(index: DataFrame, path: String): Unit =
    index
      .withColumn("hp", substring(col("text_hash"), 1, 2))
      .repartition(col("hp"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("hp")
      .parquet(path)

  def loadExactIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** d38 — the [[bloomPrefilteredExactProbe]] cadence against the SAVED artifact:
    * identical output (the d18 discipline — persistence must be invisible to the
    * probe, d38 shares d37's oracle verbatim), but the index join carries the
    * `hp` partition prefix so the surviving corpus-sized cost of d37 — scanning
    * the index for the dup join — collapses to a dynamic-partition-pruned read
    * of just the buckets the bloom positives name. `savedIndex` must come from
    * [[loadExactIndex]] (it carries the hp partition column).
    */
  def probeSavedExactIndex(
      batchHashes: DataFrame,
      idCol: String,
      savedIndex: DataFrame,
      bits: DataFrame,
      mBits: Int = 1 << 18
  ): DataFrame = {
    require(savedIndex.columns.contains("hp"),
      "probeSavedExactIndex: savedIndex must be a loadExactIndex artifact (hp partition column)")
    val checkedBits = requireBitsWidth(bits, mBits)
    val bh = batchHashes
      .select(col(idCol), col("text_hash"), bloomPositions(col("text_hash"), mBits).as("ps"))
      .localCheckpoint(true)
    val positives = bh
      .select(col(idCol), size(col("ps")).as("n_pos"), explode(col("ps")).as("pos"))
      .join(checkedBits, Seq("pos"))
      .groupBy(col(idCol), col("n_pos"))
      .agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === col("n_pos"))
      .select(col(idCol))
    val flagged = bh
      .join(positives.withColumn("bloom_pos", lit(1)), Seq(idCol), "left")
      .select(col(idCol), col("text_hash"), coalesce(col("bloom_pos"), lit(0)).as("bloom_pos"))
      .localCheckpoint(true)
    val dups = flagged
      .filter(col("bloom_pos") === 1)
      .withColumn("hp", substring(col("text_hash"), 1, 2))
      // the hp equi-key is what hands DPP its pruning subquery; text_hash alone
      // would join identically but scan every bucket
      .join(savedIndex, Seq("hp", "text_hash"))
      .groupBy(col(idCol))
      .agg(min(col("existing_id")).as("dup_of"), count(lit(1)).as("n_index_copies"))
    flagged
      .join(dups, Seq(idCol), "left")
      .select(
        col(idCol),
        col("bloom_pos"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"),
        coalesce(col("n_index_copies"), lit(0L)).as("n_index_copies"))
  }

  /** d42 — per-SNAPSHOT vs GLOBAL exact-dedup census (the FineWeb ablation,
    * Penedo et al. 2024 §3.2: deduplicating each crawl snapshot internally
    * retains more unique, higher-quality content than one global pass, because
    * cross-snapshot repeats are disproportionately the boilerplate that
    * survives every crawl). Scope here is the measurement that DECIDES that
    * policy for a corpus: per source (the snapshot axis), how many documents
    * and tokens each policy keeps —
    *
    *   - `kept_global`: this source's documents that win the CORPUS-wide
    *     min-id-per-content-hash (the d01 keeper rule);
    *   - `kept_snapshot`: winners of the same rule scoped WITHIN the source;
    *   - `cross_dup_docs` = kept_snapshot − kept_global: content this source
    *     would keep under per-snapshot dedup but loses to an earlier snapshot
    *     under global — exactly the mass the published ablation found
    *     valuable to keep (token column beside it prices the difference).
    *
    * One md5 pass; two map-side-combinable rollups (corpus-wide keepers via a
    * (hash → min id) aggregation, snapshot keepers via (source, hash → min
    * id)); the census is |sources| rows. No pairing, no shuffle beyond the
    * two hash-keyed aggregations — the 100-TB shape of exact dedup itself.
    */
  def snapshotDedupCensus(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String
  ): DataFrame = {
    val hashed = df.select(
        col(idCol).as("doc_id"), col(sourceCol).as("source"),
        md5(col(textCol)).as("text_hash"),
        graft.pipeline.TextStats.tokenCount(col(textCol)).cast("long").as("n_toks"))
      .localCheckpoint(true) // one md5/token pass; three rollups read it
    val globalKeep = hashed.groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
    val snapKeep = hashed.groupBy(col("source"), col("text_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
    def census(keep: DataFrame, docsName: String, toksName: String): DataFrame =
      hashed.join(keep.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .groupBy(col("source"))
        .agg(count(lit(1)).as(docsName), sum(col("n_toks")).as(toksName))
    hashed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .join(census(globalKeep, "kept_global", "tokens_global"), Seq("source"), "left")
      .join(census(snapKeep, "kept_snapshot", "tokens_snapshot"), Seq("source"), "left")
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        coalesce(col("kept_global"), lit(0L)).as("kept_global"),
        coalesce(col("tokens_global"), lit(0L)).as("tokens_global"),
        coalesce(col("kept_snapshot"), lit(0L)).as("kept_snapshot"),
        coalesce(col("tokens_snapshot"), lit(0L)).as("tokens_snapshot"),
        (coalesce(col("kept_snapshot"), lit(0L))
          - coalesce(col("kept_global"), lit(0L))).as("cross_dup_docs"),
        (coalesce(col("tokens_snapshot"), lit(0L))
          - coalesce(col("tokens_global"), lit(0L))).as("cross_dup_tokens"))
  }

  /** d43 — the d42 census ACTUATED (the d26→d28 measure-then-actuate
    * discipline closing the FineWeb-ablation loop): ONE dedup policy for the
    * corpus, decided by the share of snapshot-kept token mass that a GLOBAL
    * pass would additionally discard — the published finding is that this
    * cross-snapshot mass is disproportionately content worth keeping, so when
    * `cross_share_micro = (t_snap − t_glob)/t_snap` reaches
    * `keepShareThresholdMicro` the corpus deduplicates PER SNAPSHOT, and
    * below it the stronger global pass wins (the extra dedup is nearly
    * free). The output is the KEPT document relation under the chosen
    * policy — a gated union of the two keeper arms filtered by the broadcast
    * 1-row decision, so the DuckDB oracle replays decision and application in
    * one statement (the t42/ev33 actuation shape); policy and share ride
    * every row. An empty/zero-token corpus reads share 0 and keeps the
    * global policy (no evidence never flips a policy — the s25 convention).
    *
    * Scale shape: d42's one md5/token pass and two hash-keyed min
    * aggregations, two 1-row token totals, and per arm one keeper semi-join —
    * nothing beyond the census's own 100-TB shape.
    */
  def snapshotPolicyApply(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      keepShareThresholdMicro: Long = 100000L
  ): DataFrame = {
    require(keepShareThresholdMicro >= 0L && keepShareThresholdMicro <= 1000000L,
      s"snapshotPolicyApply: keepShareThresholdMicro must be in [0, 1e6], " +
        s"got $keepShareThresholdMicro")
    val hashed = df.select(
        col(idCol).as("doc_id"), col(sourceCol).as("source"),
        md5(col(textCol)).as("text_hash"),
        graft.pipeline.TextStats.tokenCount(col(textCol)).cast("long").as("n_toks"))
      .localCheckpoint(true) // one md5/token pass; totals and both arms read it
    val globalKeep = hashed.groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
    val snapKeep = hashed.groupBy(col("source"), col("text_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
    val tots = hashed.join(snapKeep.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .agg(sum(col("n_toks")).as("t_snap"))
      .crossJoin(
        hashed.join(globalKeep.select(col("doc_id")), Seq("doc_id"), "left_semi")
          .agg(sum(col("n_toks")).as("t_glob")))
    val decision = tots
      .select(
        when(col("t_snap").isNull || col("t_snap") === 0L, lit(0L))
          // int64 guard (the repeatBudgetCard discipline, here on the DERIVED
          // token mass): past ~4e12 kept tokens the 2·10⁶ product wraps and
          // the policy would silently flip — fail loudly; lift the share
          // arithmetic to DecimalType for larger corpora (the s33/t54 knob)
          .when(col("t_snap") > 4000000000000L, raise_error(lit(
            "snapshotPolicyApply: t_snap exceeds the int64-safe 4e12 — lift the " +
              "share arithmetic to DecimalType for larger corpora")))
          .otherwise(expr("(2 * 1000000 * (t_snap - t_glob) + t_snap) DIV (2 * t_snap)"))
          .cast("long").as("cross_share_micro"))
      .select(col("cross_share_micro"),
        when(col("cross_share_micro") >= keepShareThresholdMicro, lit("per_snapshot"))
          .otherwise(lit("global")).as("policy"))
      .localCheckpoint(true) // 1 row; gates both arms
    val d = broadcast(decision)
    def arm(name: String, keep: DataFrame): DataFrame =
      hashed.join(keep.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .crossJoin(d)
        .filter(col("policy") === name)
        .select(col("doc_id"), col("source"), col("n_toks"),
          col("policy"), col("cross_share_micro"))
    arm("global", globalKeep).unionByName(arm("per_snapshot", snapKeep))
  }
}
