package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Vector math is pure column expressions (`transform`/`zip_with`/`aggregate` → whole-stage
  * codegen). All arithmetic in double (floats upcast first) so the DuckDB oracle computes
  * the same values; outputs round to 6 decimals.
  *
  * Scale path: brute force is O(|Q|·|C|) — fine for small query sets against broadcastable
  * candidate sets; the LSH-bucketed variant shuffle-partitions candidates by bucket so the
  * join is equi-key and each bucket's work is local.
  */
object Similarity {

  /** Sequential left-to-right dot product — codegen'd custom expression (bit-identical
    * to the `aggregate(zip_with(...))` fold it replaces, ~50× faster in the pair loop).
    */
  def dot(a: Column, b: Column): Column = org.apache.spark.sql.graft.DotProduct.column(a, b)

  def norm2(a: Column): Column = dot(a, a)

  private def toDouble(a: Column): Column = a.cast("array<double>")

  /** Test-pin instrumentation: invocation counters for the two expensive
    * shared index-build stages (coarse-quantizer training runs eagerly at
    * composition; PQ code assignment is one corpus map pass per composition
    * site). The s41 pin in RoundSixteenOpsSpec asserts [[tunedProbeSearch]]
    * pays each exactly ONCE for curve + actuated search combined (the
    * r15-verdict double-training fix). Zero cost outside tests.
    */
  private[graft] val kmeansTrainInvocations = new java.util.concurrent.atomic.AtomicLong(0L)
  private[graft] val pqCodeInvocations = new java.util.concurrent.atomic.AtomicLong(0L)

  /** The one rendition of the legacy-artifact rule for loaded centroid models:
    * codebooks saved before `cn` (squared centroid norm) was persisted are
    * backfilled on load; newer artifacts keep their stored column. Every
    * consumer of a (possibly loaded) codebook goes through here so the rule
    * can never drift between the IVF, PQ, and graph-ANN entry paths.
    */
  private def withCentroidNorm(model: DataFrame): DataFrame =
    if (model.columns.contains("cn")) model else model.withColumn("cn", norm2(col("cv")))

  def cosine(a: Column, b: Column): Column = {
    val (da, db) = (toDouble(a), toDouble(b))
    dot(da, db) / sqrt(norm2(da) * norm2(db))
  }

  /** cosine from a precomputed pair dot + per-side squared norms. MUST stay
    * `dot / sqrt(na * nb)` (not `sqrt(na)·sqrt(nb)`) — the exact double-op sequence is
    * pinned by the oracle.
    */
  private[graft] def cosineFromNorms(dotAB: Column, na: Column, nb: Column): Column =
    dotAB / sqrt(na * nb)

  /** Brute-force cosine top-k: `queries` (small) × `candidates`, ranked per query.
    * The query side is broadcast; candidates stream through in one pass. Squared norms
    * are computed once per vector BEFORE the join (O(|Q|+|C|) folds instead of
    * O(|Q|·|C|) — 3× fewer array folds in the pair loop).
    */
  def bruteForceTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
        .withColumn("qn", norm2(col("qv")))
    )
    val c = candidates.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm2(col("cv")))
    val scored = q
      .crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        round(cosineFromNorms(dot(col("qv"), col("cv")), col("qn"), col("cn")), 6).as("cos_sim")
      )
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic ±1 random-hyperplane weight for (dimension i, plane j) — pure integer
    * arithmetic so the oracle reproduces the same planes: +1 iff (i·(2j+3) + j) is even.
    */
  private[pipeline] def planeWeight(i: Int, j: Int): Double =
    if ((i * (2 * j + 3) + j) % 2 == 0) 1.0 else -1.0

  /** LSH bucket id from `nPlanes` random hyperplanes over `dims`-dimensional vectors:
    * bit j = [⟨v, h_{planeOffset+j}⟩ ≥ 0]. Planes are constant literal arrays (folded
    * once, not re-derived per row); the projection is the codegen'd dot product.
    * `planeOffset` selects an independent plane family — used to build multiple hash
    * tables for recall (each table hashes with a disjoint plane range).
    */
  def lshBucket(vec: Column, nPlanes: Int, dims: Int, planeOffset: Int = 0): Column = {
    val v = toDouble(vec)
    (0 until nPlanes)
      .map { j =>
        val plane = array((0 until dims).map(i => lit(planeWeight(i, planeOffset + j))): _*)
        when(dot(v, plane) >= 0, lit(1L << j)).otherwise(lit(0L))
      }
      .reduce(_ + _)
  }

  /** LSH-bucketed ANN: queries only compare against candidates in the same hyperplane
    * bucket (recall < 1 by design — the scale path when |Q|·|C| is infeasible).
    */
  def lshTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = 6,
      dims: Int = 64
  ): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"),
      lshBucket(col(vecCol), nPlanes, dims).as("bucket"))
      .withColumn("qn", norm2(col("qv")))
    val c = candidates.select(
      col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"),
      lshBucket(col(vecCol), nPlanes, dims).as("bucket"))
      .withColumn("cn", norm2(col("cv")))
    val scored = q
      .join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        round(cosineFromNorms(dot(col("qv"), col("cv")), col("qn"), col("cn")), 6).as("cos_sim")
      )
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN: a coarse quantizer assigns every vector to its nearest
    * centroid cell; queries probe only the `nProbe` nearest cells and compute exact
    * cosine within them. Centroids here are a deterministic 1-in-`centroidMod` sample
    * of the corpus (id ≡ 0 mod `centroidMod`) so the oracle reproduces the cells
    * bit-for-bit; a production deployment would train them (k-means on a sample) —
    * the query/assignment plumbing is identical.
    *
    * Scale shape: assignment is each vector against the BROADCAST centroid table
    * (K = n/centroidMod ≪ n, the defining IVF property), one window per relation for
    * the argmax, then an equi-join on cell id. Recall < 1 by design (a true neighbor
    * in an unprobed cell is missed); raise `nProbe` to trade cost for recall.
    */
  def ivfTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroidMod: Int = 97,
      nProbe: Int = 2
  ): DataFrame = {
    val cents = broadcast(
      candidates.filter(col(idCol) % centroidMod === 0)
        .select(col(idCol).as("cid"), toDouble(col(vecCol)).as("cv"))
        .withColumn("cn", norm2(col("cv"))))

    // score relation r (id, v, nv) against every centroid; keep the top `keep` cells
    // per id by (rounded cosine desc, cid asc) — rounded so the argmax tie-break is
    // engine-independent
    def nearestCells(r: DataFrame, keep: Int): DataFrame = {
      val w = Window.partitionBy(col("rid")).orderBy(col("cc").desc, col("cid").asc)
      r.crossJoin(cents)
        .select(
          col("rid"), col("v"), col("nv"), col("cid"),
          round(cosineFromNorms(dot(col("v"), col("cv")), col("nv"), col("cn")), 6).as("cc"))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .select(col("rid"), col("v"), col("nv"), col("cid"))
    }

    val cells = nearestCells(
      candidates.select(col(idCol).as("rid"), toDouble(col(vecCol)).as("v"))
        .withColumn("nv", norm2(col("v"))), keep = 1)
      .select(col("rid").as("neighbor_id"), col("v").as("cv2"), col("nv").as("cn2"), col("cid"))
    val probes = nearestCells(
      queries.select(col(idCol).as("rid"), toDouble(col(vecCol)).as("v"))
        .withColumn("nv", norm2(col("v"))), keep = nProbe)
      .select(col("rid").as("query_id"), col("v").as("qv"), col("nv").as("qn"), col("cid"))

    val scored = probes
      .join(cells, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        round(cosineFromNorms(dot(col("qv"), col("cv2")), col("qn"), col("cn2")), 6).as("cos_sim"))
    // no dedup needed: every candidate lives in exactly one cell (keep = 1), so the
    // nProbe distinct probed cells can't surface the same neighbor twice
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Per-label centroids in long form: (label, dim 1-based, centroid = avg of that
    * dimension, rounded to 6). The posexplode multiplies rows by `dims` BEFORE the
    * shuffle, but partial aggregation collapses each partition to ≤ labels×dims rows,
    * so the exchange moves a constant-size relation regardless of corpus size.
    */
  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol).as("label"), posexplode(toDouble(col(vecCol))))
      .groupBy(col("label"), (col("pos") + 1).as("dim"))
      .agg(round(avg(col("col")), 6).as("centroid"))

  /** Nearest-centroid assignment (the k-means assignment step / a centroid classifier):
    * every vector is scored against the per-label centroids of the corpus itself and
    * assigned the argmax-cosine label. Centroids are rounded to 6 BEFORE scoring so the
    * assignment is engine-independent (the argmax tie-break is (cosine desc, label)).
    *
    * Scale shape: the centroid table is labels×dims (constant) — broadcast; vectors
    * stream through one codegen'd dot-product pass. This is the building block an
    * iterative distributed k-means repeats.
    *
    * Degenerate inputs are excluded explicitly rather than silently mislabeled: a
    * zero-norm vector (cosine undefined against everything) is dropped from the
    * assignment side, and an all-zero label centroid is dropped from the candidate side
    * — otherwise the null cosine would fall through to the label tie-break and assign a
    * meaningless label.
    */
  def nearestCentroid(df: DataFrame, idCol: String, labelCol: String, vecCol: String): DataFrame = {
    val cents = broadcast(
      labelCentroids(df, labelCol, vecCol)
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("dim"), col("centroid")))).as("dc"))
        .select(col("label").as("c_label"), transform(col("dc"), x => x("centroid")).as("cv"))
        .withColumn("cn", norm2(col("cv")))
        .filter(col("cn") > 0))
    val v = df.select(col(idCol).as("vec_id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm2(col("v")))
      .filter(col("nv") > 0)
    val scored = v.crossJoin(cents)
      .select(
        col("vec_id"), col("c_label"),
        round(cosineFromNorms(dot(col("v"), col("cv")), col("nv"), col("cn")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos_sim").desc, col("c_label").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("vec_id"), col("c_label").as("assigned_label"), col("cos_sim"))
  }

  /** Two-stage retrieval with dimension truncation (coarse-then-rerank — the standard
    * production ANN pattern): stage 1 scores every candidate on only the FIRST
    * `coarseDims` dimensions (a cheap proxy — Matryoshka-style prefix embeddings) and
    * keeps `overfetch`·k per query; stage 2 reranks those survivors with the exact
    * full-dimension cosine and returns top-k. Recall < 1 exactly when the truncated
    * prefix misranks a true neighbor out of the overfetch window — raise `overfetch`
    * to trade cost for recall.
    *
    * Scale shape: stage 1 streams candidates against the broadcast query side but
    * folds only `coarseDims`/dims of each vector (the dominant cost of brute force is
    * the dot-product length), and its ranking shuffle carries ONLY
    * (query_id, neighbor_id, coarse_sim) — the full vectors are fetched back by
    * joining the |Q|·overfetch·k survivor ids (broadcast) against the candidate
    * table, so the per-pair shuffle payload is 3 scalars, not 2·dims doubles.
    * A production variant fuses stage 1 with an LSH/IVF bucket prune ([[lshTopK]],
    * [[ivfTopK]]); the rerank stage is identical.
    */
  def rerankTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      coarseDims: Int = 16,
      overfetch: Int = 4
  ): DataFrame = {
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
        .withColumn("qc", slice(col("qv"), 1, coarseDims))
        .withColumn("qn", norm2(col("qv")))
        .withColumn("qcn", norm2(col("qc"))))
    val c = candidates.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cc", slice(col("cv"), 1, coarseDims))
      .withColumn("ccn", norm2(col("cc")))
    val coarse = q.select(col("query_id"), col("qc"), col("qcn"))
      .crossJoin(c.select(col("neighbor_id"), col("cc"), col("ccn")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        round(cosineFromNorms(dot(col("qc"), col("cc")), col("qcn"), col("ccn")), 6)
          .as("coarse_sim"))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("coarse_sim").desc, col("neighbor_id").asc)
    val survivors = coarse.withColumn("crk", row_number().over(wc))
      .filter(col("crk") <= k * overfetch)
      .select(col("query_id"), col("neighbor_id"))
    val wf = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    candidates.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm2(col("cv")))
      .join(broadcast(survivors), Seq("neighbor_id"))
      .join(q.select(col("query_id"), col("qv"), col("qn")), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosineFromNorms(dot(col("qv"), col("cv")), col("qn"), col("cn")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(wf))
      .filter(col("rank") <= k)
  }

  /** Cluster-quality diagnostic: per label, how tightly its vectors hug their own
    * centroid — vector count, mean and minimum cosine-to-centroid. The cohesion report
    * that makes embedding-space labels (or k-means output) auditable: a label whose
    * min_cos is low contains outliers/mislabels; a low mean_cos label is diffuse.
    * Centroids are the round-6 [[labelCentroids]] (same degenerate-input guards as
    * [[nearestCentroid]]: zero-norm vectors and all-zero centroids are excluded).
    *
    * Scale shape: the centroid table is labels×dims (constant) — broadcast equi-join on
    * label; vectors stream through one codegen'd dot-product pass into a
    * map-side-combinable per-label aggregation. One shuffle of |labels| rows.
    */
  def clusterQuality(df: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val cents = broadcast(
      labelCentroids(df, labelCol, vecCol)
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("dim"), col("centroid")))).as("dc"))
        .select(col("label"), transform(col("dc"), x => x("centroid")).as("cv"))
        .withColumn("cn", norm2(col("cv")))
        .filter(col("cn") > 0))
    val v = df.select(col(labelCol).as("label"), toDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm2(col("v")))
      .filter(col("nv") > 0)
    v.join(cents, Seq("label"))
      .select(col("label"),
        round(cosineFromNorms(dot(col("v"), col("cv")), col("nv"), col("cn")), 6).as("cos"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        round(avg(col("cos")), 6).as("mean_cos"),
        min(col("cos")).as("min_cos"))
  }

  /** One Lloyd's iteration of distributed k-means (cosine assignment): seed centroids
    * are the first `k` vectors by id (deterministic — no RNG), every vector is assigned
    * to its argmax-cosine seed, and the new per-cluster mean centroids come back with
    * member counts. Iterating this operator IS distributed k-means; one step is exposed
    * as the query so the oracle can replay it exactly.
    *
    * Scale shape: seeds are k×dims — broadcast; assignment is one codegen'd
    * dot-product pass. The centroid recompute aggregates ELEMENT-WISE SUMS in a single
    * map-side-combinable wide aggregation (`dims` sum columns — the minhashWide trick),
    * NOT a posexplode: the shuffle moves k·dims partial sums per map task instead of
    * amplifying every assigned row ×dims.
    */
  def kmeansStep(df: DataFrame, idCol: String, vecCol: String, k: Int, dims: Int): DataFrame = {
    // seeds = the k smallest ids (distributed TakeOrdered) — NOT `id < k`, which
    // silently under-seeds on sparse or offset id spaces
    val seeds = broadcast(
      df.select(col(idCol).cast("long").as("seed_id"), toDouble(col(vecCol)).as("cv"))
        .orderBy(col("seed_id").asc)
        .limit(k)
        .select(col("seed_id").cast("int").as("cluster"), col("cv"))
        .withColumn("cn", norm2(col("cv")))
        .filter(col("cn") > 0))
    val v = df.select(col(idCol).as("vec_id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm2(col("v")))
      .filter(col("nv") > 0)
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cluster").asc)
    val best = v.crossJoin(seeds)
      .select(col("vec_id"), col("cluster"), col("v"),
        round(cosineFromNorms(dot(col("v"), col("cv")), col("nv"), col("cn")), 6).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
    val aggs = count(lit(1)).as("n_members") +:
      (0 until dims).map(i => sum(col("v")(i)).as(s"s$i"))
    best.groupBy(col("cluster"))
      .agg(aggs.head, aggs.tail: _*)
      .select(
        col("cluster"), col("n_members"),
        posexplode(array((0 until dims).map(i => col(s"s$i")): _*)).as(Seq("pos", "s")))
      .select(
        col("cluster"), (col("pos") + 1).as("dim"),
        round(col("s") / col("n_members"), 6).as("centroid"), col("n_members"))
  }

  /** `rounds` Lloyd's iterations from the s10 deterministic seeds — the TRAINING loop
    * [[kmeansStep]] exposes one step of, with the bounded-loop discipline of the BPE
    * trainer (t24): the corpus vector relation is materialized ONCE and every round's
    * assignment pass reads that checkpoint; the loop-carried state is the
    * centroid-sized (k rows) relation, checkpointed per round so lineage never grows.
    * Round arithmetic is the exact kmeansStep sequence (rounded cosine argmax with
    * cluster-asc tie-break, per-dim mean rounded to 6), so `rounds = 1` IS
    * [[kmeansStep]] (pinned in RoundTenOpsSpec) and the DuckDB oracle replays the
    * whole loop as chained CTEs. Centroid means round to 6 decimals each round; both
    * engines produce the identical doubles from that rounding, so the next round's
    * cosines stay in one shared IEEE sequence — the property that makes a TRAINED
    * model oracle-checkable at all.
    *
    * Scale shape: each round is one broadcast of k·dims doubles + one codegen'd
    * corpus map pass + one map-side-combinable wide-sum aggregation (the s10 shape,
    * `rounds`×). Nothing driver-side but the k-row centroid checkpoint.
    */
  private[graft] def kmeansRounds(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dims: Int,
      rounds: Int
  ): DataFrame = {
    kmeansTrainInvocations.incrementAndGet()
    val spark = df.sparkSession
    val v = df.select(col(idCol).as("vec_id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm2(col("v")))
      .filter(col("nv") > 0)
      .localCheckpoint(false)
    // r18: the k-row centroid state lives on the DRIVER between rounds (bounded
    // by the cells dial — the t55 vocab-literal pattern, never corpus-sized).
    // Each round is then ONE shuffle-free codegen'd corpus map (argmax over k
    // LITERAL centroids via greatest over (cos, -cluster) structs — identical
    // rounded-cosine sequence, identical cos-desc/cluster-asc tie-break) plus
    // one map-side-combinable wide-sum agg collected back to k rows. The old
    // loop paid, per round: a broadcast build job, a k×|corpus| crossJoin, a
    // per-vector window sort (an Exchange + sort of the corpus with vectors
    // aboard), and an eager k-row checkpoint job.
    def collectCents(cents: DataFrame): Array[(Int, Long, Seq[Double], Double)] =
      cents.select(col("cluster").cast("int"), col("n_members").cast("long"),
          col("cv"), col("cn"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2), r.getDouble(3)))
        .sortBy(_._1)
    var cents = collectCents(
      v.orderBy(col("vec_id").asc).limit(k)
        .select(col("vec_id").cast("int").as("cluster"), col("v").as("cv"))
        .withColumn("cn", norm2(col("cv")))
        .filter(col("cn") > 0)
        .withColumn("n_members", lit(0L)))
    for (_ <- 1 to rounds if cents.nonEmpty) {
      val bestStruct = cents.map { case (cl, _, cv, cn) =>
        struct(
          round(cosineFromNorms(dot(col("v"), lit(cv.toArray)), col("nv"), lit(cn)), 6)
            .as("cos"),
          lit(-cl).as("negc"))
      }.toSeq
      val bs = if (bestStruct.size == 1) bestStruct.head else greatest(bestStruct: _*)
      val best = v.select((-bs.getField("negc")).as("cluster"), col("v"))
      val aggs = count(lit(1)).as("n_members") +:
        (0 until dims).map(i => sum(col("v")(i)).as(s"s$i"))
      cents = collectCents(best.groupBy(col("cluster"))
        .agg(aggs.head, aggs.tail: _*)
        .select(col("cluster"), col("n_members"),
          array((0 until dims).map(i => round(col(s"s$i") / col("n_members"), 6)): _*).as("cv"))
        .withColumn("cn", norm2(col("cv")))
        .filter(col("cn") > 0))
    }
    // hand the final k-row state back as a local relation (same columns the
    // checkpointed loop used to return; broadcasts downstream are unchanged)
    spark.createDataFrame(
        spark.sparkContext.parallelize(cents.toSeq.map { case (cl, n, cv, cn) =>
          org.apache.spark.sql.Row(cl, n, cv, cn)
        }, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("cluster",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("n_members",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("cv",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType, containsNull = false),
            nullable = false),
          org.apache.spark.sql.types.StructField("cn",
            org.apache.spark.sql.types.DoubleType, nullable = false))))
  }

  /** s22 — the trained model in [[kmeansStep]]'s long form: (cluster, dim, centroid,
    * n_members) of the FINAL round's centroids.
    */
  def kmeansTrain(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dims: Int,
      rounds: Int
  ): DataFrame =
    kmeansRounds(df, idCol, vecCol, k, dims, rounds)
      .select(
        col("cluster"), col("n_members"),
        posexplode(col("cv")).as(Seq("pos", "centroid")))
      .select(
        col("cluster"), (col("pos") + 1).as("dim"), col("centroid"), col("n_members"))

  /** Recall@k of the approximate ANN paths against the exact brute-force top-k — the
    * diagnostic that makes LSH/IVF parameter changes measurable instead of guessed:
    * one row per (method, query), recall = |approx top-k ∩ true top-k| / k.
    * Deterministic end-to-end (pinned hyperplanes, modulus-sampled centroids, rounded
    * cosines, id tie-breaks), so it is oracle-checkable like the searches themselves.
    *
    * Scale shape: the truth relation is |Q|·k rows (materialized once for its two
    * consumers); everything else reuses the searches' own bucketed plans, and the
    * hit-count join is an equi-join on (query, neighbor).
    */
  def annRecall(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = 6,
      dims: Int = 64,
      centroidMod: Int = 97,
      nProbe: Int = 2
  ): DataFrame = {
    val truth = bruteForceTopK(queries, candidates, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(false)
    val approx = lshTopK(queries, candidates, idCol, vecCol, k, nPlanes, dims)
      .select(lit("lsh").as("method"), col("query_id"), col("neighbor_id"))
      .unionByName(
        ivfTopK(queries, candidates, idCol, vecCol, k, centroidMod, nProbe)
          .select(lit("ivf").as("method"), col("query_id"), col("neighbor_id")))
    val hits = approx
      .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("method"), col("query_id"))
      .agg(count(lit(1)).as("n_hit"))
    // every (method, query) must appear, including total misses (recall 0)
    val base = truth.select(col("query_id")).distinct()
      .select(col("query_id"), explode(array(lit("lsh"), lit("ivf"))).as("method"))
    base
      .join(hits, Seq("method", "query_id"), "left")
      .select(
        col("method"), col("query_id"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / lit(k.toDouble), 6)
          .as("recall_at_k"))
  }

  /** s30 — recall@k of the FILTERED ANN path ([[ivfPqFilteredTopK]]) against
    * the exact brute-force top-k UNDER THE SAME PREDICATE — the s07 diagnostic
    * for s29: filtered search has its own recall regime (probed cells can hold
    * fewer qualifying members than k even when the corpus holds plenty), so
    * tuning nProbe/overfetch for a tenant's filter needs its own measurement.
    * One row per query, recall = |approx ∩ truth| / k, total misses kept as
    * explicit 0 rows (the s07 convention).
    *
    * Scale shape: the truth side is a brute-force pass over the ALLOWED subset
    * only (the predicate prunes before scoring, same as the search under test);
    * the hit count is one (query, neighbor) equi-join; everything else reuses
    * the s29 plan itself.
    */
  def filteredAnnRecall(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      allowed: DataFrame,
      kCells: Int = 8,
      trainRounds: Int = 2
  ): DataFrame = {
    val allowedCands = candidates.join(
      allowed.select(col(allowed.columns.head).as(idCol)), Seq(idCol), "left_semi")
    val truth = bruteForceTopK(queries, allowedCands, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = ivfPqFilteredTopK(queries, candidates, idCol, vecCol, k, allowed,
      kCells, trainRounds)
      .select(col("query_id"), col("neighbor_id"))
    val hits = approx
      .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hit"))
    queries.select(col(idCol).as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(
        col("query_id"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / lit(k.toDouble), 6)
          .as("recall_at_k"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold (symmetric, id_a < id_b).
    *
    * Candidate pairs come from LSH hyperplane buckets — `nTables` independent hash
    * tables (disjoint plane families), pair = candidate iff it collides in ANY table —
    * then exact cosine is computed on candidates only. Everything is equi-join on
    * (table, bucket): no all-pairs cross join, no full-side broadcast, so the plan
    * survives corpora where O(n²) comparison is infeasible. Recall < 1 by design
    * (pairs above threshold that collide in no table are missed); raise `nTables` /
    * lower `planesPerTable` to trade cost for recall.
    */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nTables: Int = 2,
      planesPerTable: Int = 6,
      dims: Int = 64,
      maxBucketMembers: Long = 10000L
  ): DataFrame =
    scoredLshPairs(df, idCol, vecCol, nTables, planesPerTable, dims, maxBucketMembers)
      .filter(col("cos_sim") >= threshold)

  /** Shared LSH candidate generation + exact pair scoring — the common front half of
    * [[nearDupPairs]] and [[knnGraph]]: (id_a, id_b, cos_sim) for every unordered
    * pair (id_a < id_b) colliding in ANY of the `nTables` hyperplane tables, cosine
    * computed once per distinct pair. Kept as ONE definition so a candidate-side
    * change cannot silently diverge the two operators.
    *
    * Skew guard (`maxBucketMembers` — the d04 doc-freq-cap discipline applied to
    * LSH): a (table, bucket) cell with more than the cap's members is DROPPED from
    * candidate generation before the self-join. One such cell is quadratic in its
    * membership — a near-duplicate clump at corpus scale turns one hot bucket into
    * the whole job's runtime — and its pairs are precisely the ones other tables
    * (or the exact operators d01-d03) already find. The default never binds at the
    * bench scale factors (largest observed cell ≪ 10⁴), so the oracle mirrors stay
    * capless-equivalent; production sets it to the per-task comparison budget.
    */
  private def scoredLshPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nTables: Int,
      planesPerTable: Int,
      dims: Int,
      maxBucketMembers: Long
  ): DataFrame = {
    // vectors feed three consumers (bucket derivation + the two joins back onto the
    // candidate pairs) and the bucket relation self-joins; materialize each once
    val vecs = df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm2(col("v")))
      .localCheckpoint(false)
    // r18: each unordered pair is emitted by its EARLIEST admitted colliding
    // table instead of by every colliding table with a distinct() afterwards —
    // the cross-table dedup becomes a filter on the join output (earlier-table
    // buckets ride along on the per-id row), removing the pairs-sized Exchange
    // the distinct paid. Same pair set by construction: a pair survives iff
    // some table's cell holds both ids under the cap, and it is generated
    // exactly once, at the first such table.
    val wide = vecs.select(col("id") +: (0 until nTables).map(t =>
      lshBucket(col("v"), planesPerTable, dims, planeOffset = t * planesPerTable)
        .as(s"b$t")): _*)
    // per-table admitted flag from the cell census (catalog-sized, broadcast);
    // an over-cap cell's members keep adm=false and generate nothing there
    val flagged = (0 until nTables).foldLeft(wide) { (acc, t) =>
      val cells = wide.groupBy(col(s"b$t")).agg(count(lit(1)).as("cell_n"))
        .filter(col("cell_n") <= maxBucketMembers)
        .select(col(s"b$t"), lit(true).as(s"adm$t"))
      acc.join(broadcast(cells), Seq(s"b$t"), "left")
    }.select(col("id") +: (0 until nTables).flatMap(t =>
        Seq(col(s"b$t"), coalesce(col(s"adm$t"), lit(false)).as(s"adm$t"))): _*)
      .localCheckpoint(false) // self-joins once per table
    val cand = (0 until nTables).map { t =>
      val l = flagged.filter(col(s"adm$t")).select(
        col("id").as("id_a") +: col(s"b$t").as("bucket") +:
          (0 until t).flatMap(i => Seq(col(s"b$i").as(s"a_b$i"), col(s"adm$i").as(s"a_adm$i"))): _*)
      val r = flagged.filter(col(s"adm$t")).select(
        col("id").as("id_b") +: col(s"b$t").as("bucket") +:
          (0 until t).map(i => col(s"b$i").as(s"b_b$i")): _*)
      val firstTable = (0 until t)
        .map(i => !(col(s"a_adm$i") && col(s"a_b$i") === col(s"b_b$i")))
        .foldLeft(lit(true))(_ && _)
      l.join(r, Seq("bucket"))
        .filter(col("id_a") < col("id_b") && firstTable)
        .select(col("id_a"), col("id_b"))
    }.reduce(_ unionByName _)
    cand
      .join(vecs.select(col("id").as("id_a"), col("v").as("va"), col("nv").as("na")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb"), col("nv").as("nb")), Seq("id_b"))
      .select(
        col("id_a"), col("id_b"),
        round(cosineFromNorms(dot(col("va"), col("vb")), col("na"), col("nb")), 6).as("cos_sim")
      )
  }

  /** Approximate kNN GRAPH over the whole corpus — every vector's top-`k` cosine
    * neighbors among LSH candidates. The batch primitive under graph-based ANN
    * indexes (NN-descent seeding, HNSW base layers) and under SemDeDup-style
    * curation: d13 asks "has this vector a near-twin", the kNN graph answers "which
    * ones", feeding cluster-merge and diversity-sampling passes.
    *
    * Candidates collide in ANY of `nTables` hyperplane families (the [[nearDupPairs]]
    * recall construction); each unordered pair is scored ONCE (lo < hi, distinct),
    * then both directions rank per source vector. Recall < 1 by design — a true
    * neighbor sharing no bucket is missed; more tables trade cost for recall.
    *
    * Scale shape: candidate generation is (table, bucket) equi-joins — never
    * all-pairs; scoring is per-candidate; ranking is one window per source vector,
    * bounded by its candidate count. The known corpus-scale hazard is a dense bucket
    * (near-duplicate clumps) going quadratic — `maxBucketMembers` drops such cells
    * from candidate generation (see [[scoredLshPairs]]), the same way the d-family
    * caps doc frequency.
    */
  def knnGraph(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nTables: Int = 2,
      planesPerTable: Int = 6,
      dims: Int = 64,
      maxBucketMembers: Long = 10000L
  ): DataFrame = {
    val scored = scoredLshPairs(df, idCol, vecCol, nTables, planesPerTable, dims, maxBucketMembers)
      .localCheckpoint(false) // consumed twice (both directions of the symmetric edge)
    val sym = scored
      .select(col("id_a").as("vec_id"), col("id_b").as("neighbor_id"), col("cos_sim"))
      .unionByName(scored
        .select(col("id_b").as("vec_id"), col("id_a").as("neighbor_id"), col("cos_sim")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    sym.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** s28 — INCREMENTAL kNN-graph maintenance: neighbor lists for vectors that
    * ARRIVED AFTER the graph was built, without re-pairing the archive with
    * itself — the d17 probe shape applied to the ANN index (and the production
    * mode of a graph index at 100 TB: build once, then per ingest batch only
    * the arrivals earn lists). Each new vector's candidates are the corpus
    * members sharing any of its `nTables` hyperplane buckets (including other
    * arrivals — new-new links form immediately); exact rounded cosine ranks its
    * top-`k` (cos desc, id asc), and the insert emits BOTH half-edges — the
    * arrival's list plus each partner's reverse link (annotated with the
    * arrival's rank) — the bidirectional insertion of the published structure
    * (Malkov–Yashunin 2016 §4), so a beam search whose frontier touches a
    * partner can step INTO the arrival immediately: new documents are
    * searchable the moment their batch lands, pinned in RoundThirteenOpsSpec.
    * Partner lists temporarily exceed `k` and archive-archive links stay stale
    * until the cadence rebuild re-prunes — the documented incremental
    * approximation (HNSW's insert-then-prune does the same between repairs).
    *
    * Scale shape: bucketing the arrivals is batch-sized; the corpus bucket
    * relation is one map pass + the same capped cell census as [[knnGraph]]
    * (cap on the CORPUS side, the capDedupIndex convention — a boilerplate cell
    * would otherwise fan every colliding arrival), and candidate generation is
    * a (tbl, bucket) equi-join whose left side is batch-sized; scoring fetches
    * partner vectors by id-equi-join. A standing cadence amortizes further by
    * persisting the bucket relation with the index — the corpus is then never
    * rescanned, exactly d18's split.
    */
  def knnGraphExtend(
      newVecs: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nTables: Int = 2,
      planesPerTable: Int = 6,
      dims: Int = 64,
      maxBucketMembers: Long = 10000L
  ): DataFrame = {
    def bucketed(df: DataFrame): DataFrame = {
      val v = df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      val tables = (0 until nTables).map { t =>
        struct(
          lit(t).as("tbl"),
          lshBucket(col("v"), planesPerTable, dims, planeOffset = t * planesPerTable).as("bucket"))
      }
      v.select(col("id"), explode(array(tables: _*)).as("tb"))
        .select(col("id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    }
    val corpusBuckets = bucketed(corpus).localCheckpoint(false)
    val smallCells = corpusBuckets.groupBy(col("tbl"), col("bucket"))
      .agg(count(lit(1)).as("cell_n"))
      .filter(col("cell_n") <= maxBucketMembers)
      .select(col("tbl"), col("bucket"))
    val admitted = corpusBuckets.join(smallCells, Seq("tbl", "bucket"))
    val cand = bucketed(newVecs).select(col("tbl"), col("bucket"), col("id").as("id_a"))
      .join(admitted.select(col("tbl"), col("bucket"), col("id").as("id_b")), Seq("tbl", "bucket"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val newSide = newVecs.select(col(idCol).as("id_a"), toDouble(col(vecCol)).as("va"))
      .withColumn("na", norm2(col("va")))
    val corpusSide = corpus.select(col(idCol).as("id_b"), toDouble(col(vecCol)).as("vb"))
      .withColumn("nb", norm2(col("vb")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    val fwd = cand
      .join(newSide, Seq("id_a"))
      .join(corpusSide, Seq("id_b"))
      .select(
        col("id_a").as("vec_id"), col("id_b").as("neighbor_id"),
        round(cosineFromNorms(dot(col("va"), col("vb")), col("na"), col("nb")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    fwd.unionByName(fwd.select(
      col("neighbor_id").as("vec_id"), col("vec_id").as("neighbor_id"),
      col("cos_sim"), col("rank")))
  }

  /** s42 — DELETE/COMPACT for the graph-ANN adjacency: the s38 lifecycle leg
    * the graph index was missing (an index you can add to but not delete from
    * is half a lifecycle — GDPR erasure and re-crawl retractions arrive as id
    * catalogs). The compacted adjacency is PROVABLY identical to
    * [[knnGraph]] rebuilt fresh on the survivors, without re-pairing the
    * archive with itself:
    *
    *   - tombstoned nodes' lists are anti-joined out;
    *   - a surviving list that contains NO tombstoned neighbor carries over
    *     VERBATIM — its fresh-build candidate set is its old one minus
    *     vectors that weren't in its top-k, so cosines and ranks are
    *     unchanged;
    *   - survivors that LOST a ranked neighbor (the stale-half-edge case)
    *     are re-paired against their surviving admitted cell-mates and
    *     re-ranked — exactly the fresh build's list for those nodes;
    *   - cells whose pre-delete membership exceeded `maxBucketMembers` but
    *     whose SURVIVOR membership fits are newly admitted by a fresh build
    *     (deletes can only shrink cells, so admission only flips over→under):
    *     their surviving members gain candidates and re-pair too.
    *
    * That affected-set characterization is exhaustive — candidate sets only
    * change via a removed member or a flipped cell — which is what makes the
    * equivalence exact (the RoundSixteenOpsSpec pin, and the s42 oracle
    * replays the FRESH build on survivors against this incremental path).
    *
    * Scale shape: one corpus bucket pass (map + catalog-sized cell census),
    * tombstones broadcast as a catalog, and re-pairing restricted to the
    * affected × admitted-cell-mates relation — at published deletion rates a
    * tiny fraction of the full self-join a cadence rebuild pays. `corpus` is
    * the PRE-delete relation the current graph was built on.
    */
  def compactGraphAnnAdjacency(
      corpus: DataFrame,
      tombstones: DataFrame,
      graph: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nTables: Int = 2,
      planesPerTable: Int = 6,
      dims: Int = 64,
      maxBucketMembers: Long = 10000L,
      builtWith: Option[GraphAnnDials] = None
  ): DataFrame = {
    // the dial-agreement guard (r16 advisory, the probeSpanIndex 'h' discipline):
    // the fresh-build equivalence is a theorem ONLY at the dials the input graph
    // was built with — a mismatched caller gets a quietly divergent adjacency,
    // not an error. When the graph came off a stamped artifact
    // ([[saveGraphAnnIndex]] with dials / [[loadGraphAnnDials]]), require
    // agreement before compacting.
    builtWith.foreach { d =>
      val asked = GraphAnnDials(k, nTables, planesPerTable, dims, maxBucketMembers)
      require(d == asked,
        s"compactGraphAnnAdjacency: dial mismatch — the graph artifact was built " +
          s"with $d but compaction was asked for $asked; the fresh-build " +
          "equivalence only holds at the build dials")
    }
    val tomb = tombstones.select(col(tombstones.columns.head).as("tid")).distinct()
      .localCheckpoint(false) // id catalog; broadcast into every cut below
    val vecs = corpus.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm2(col("v")))
      .localCheckpoint(false)
    val tables = (0 until nTables).map { t =>
      struct(lit(t).as("tbl"),
        lshBucket(col("v"), planesPerTable, dims, planeOffset = t * planesPerTable).as("bucket"))
    }
    val buckets = vecs.select(col("id"), explode(array(tables: _*)).as("tb"))
      .select(col("id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      .join(broadcast(tomb), col("id") === col("tid"), "left")
      .select(col("id"), col("tbl"), col("bucket"), col("tid").isNotNull.as("is_tomb"))
      .localCheckpoint(false) // feeds the census, the flipped-cell cut, and re-pairing
    val census = buckets.groupBy(col("tbl"), col("bucket"))
      .agg(count(lit(1)).as("n_full"),
        sum(when(col("is_tomb"), 0L).otherwise(1L)).as("n_surv"))
      .localCheckpoint(false) // cell catalog — two consumers
    val admittedSurv = census.filter(col("n_surv") <= maxBucketMembers)
      .select(col("tbl"), col("bucket"))
    val flipped = census
      .filter(col("n_full") > maxBucketMembers && col("n_surv") <= maxBucketMembers)
      .select(col("tbl"), col("bucket"))
    val lostEdge = graph
      .join(broadcast(tomb.select(col("tid").as("neighbor_id"))), Seq("neighbor_id"), "left_semi")
      .select(col("vec_id").as("id")).distinct()
    val inFlipped = buckets.filter(!col("is_tomb"))
      .join(flipped, Seq("tbl", "bucket"), "left_semi")
      .select(col("id")).distinct()
    val affected = lostEdge.unionByName(inFlipped).distinct()
      .join(broadcast(tomb.select(col("tid").as("id"))), Seq("id"), "left_anti")
      .localCheckpoint(false) // consumed by the carry-over cut and the re-pair probe
    val keep = graph
      .join(broadcast(tomb.select(col("tid").as("vec_id"))), Seq("vec_id"), "left_anti")
      .join(affected.select(col("id").as("vec_id")), Seq("vec_id"), "left_anti")
    val survBuckets = buckets.filter(!col("is_tomb"))
      .join(admittedSurv, Seq("tbl", "bucket"))
    val cand = survBuckets.select(col("tbl"), col("bucket"), col("id").as("id_a"))
      .join(affected.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
      .join(survBuckets.select(col("tbl"), col("bucket"), col("id").as("id_b")),
        Seq("tbl", "bucket"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    val repaired = cand
      .join(vecs.select(col("id").as("id_a"), col("v").as("va"), col("nv").as("na")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb"), col("nv").as("nb")), Seq("id_b"))
      .select(col("id_a").as("vec_id"), col("id_b").as("neighbor_id"),
        round(cosineFromNorms(dot(col("va"), col("vb")), col("na"), col("nb")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    keep.unionByName(repaired)
  }

  /** Persist a built kNN graph ([[knnGraph]] output) as the search-index
    * artifact, range-partitioned and sorted on the probe key (`vec_id`) so a
    * beam round's expansion join prunes and row-group-skips — the
    * saveDedupIndex layout discipline applied to the neighbor lists. Build once
    * on the corpus cadence, serve every [[graphAnnSearch]] batch from the load,
    * EXTEND per ingest batch with [[appendToKnnGraph]].
    */
  def saveKnnGraph(graph: DataFrame, path: String, nFiles: Int = 16): Unit =
    writeKnnGraph(graph, path, org.apache.spark.sql.SaveMode.Overwrite, nFiles)

  /** s28's artifact half — EXTEND the persisted neighbor lists with an ingest
    * batch's rows ([[knnGraphExtend]] output): new lists land as a fresh file
    * generation beside the archive's (the d21 discipline — parquet dir readers
    * union generations; each generation keeps its own vec_id range-sort), so a
    * real ingest cadence never rebuilds the graph per batch. Compaction = the
    * cadence rebuild ([[knnGraph]] over the full corpus + [[saveKnnGraph]]),
    * which is ALSO when the archive's stale lists pick up their new neighbors.
    */
  def appendToKnnGraph(newLists: DataFrame, path: String, nFiles: Int = 16): Unit =
    writeKnnGraph(newLists, path, org.apache.spark.sql.SaveMode.Append, nFiles)

  private def writeKnnGraph(
      graph: DataFrame, path: String, mode: org.apache.spark.sql.SaveMode, nFiles: Int): Unit =
    graph
      .repartitionByRange(math.max(nFiles, 1), col("vec_id"))
      .sortWithinPartitions(col("vec_id"), col("rank"))
      .write.mode(mode).parquet(path)

  def loadKnnGraph(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** s27 — the COMPLETE graph-ANN index artifact: the [[knnGraph]] adjacency
    * (`adj/`, vec_id-range-clustered via [[saveKnnGraph]]), the trained coarse
    * codebook (`model/`, the [[saveCentroids]] s24 layout), and the per-cell
    * entry medoids (`entries/`, k rows) — everything [[graphAnnSearch]] needs,
    * so a searcher process loads the index and serves query batches without
    * ever re-deriving corpus-scale state. Doubles and ids round-trip parquet
    * bit-exactly; a reloaded index must search identically to the in-session
    * build (s27's oracle IS s26's SQL).
    */
  def saveGraphAnnIndex(
      graph: DataFrame,
      model: DataFrame,
      entries: DataFrame,
      path: String,
      nFiles: Int = 16
  ): Unit = {
    saveKnnGraph(graph, s"$path/adj", nFiles)
    saveCentroids(model, s"$path/model")
    entries.select(col("cluster"), col("cand")).coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$path/entries")
  }

  /** The build dials of a [[knnGraph]] adjacency — stamped on the saved index so
    * lifecycle jobs (s42's delete/compact above all) can verify they run at the
    * dials the structure was built with instead of silently diverging (r16
    * advisory; the probeSavedExactIndex 'hp' / probeSpanIndex 'h' guard
    * discipline applied to the graph artifact).
    */
  final case class GraphAnnDials(
      k: Int, nTables: Int, planesPerTable: Int, dims: Int, maxBucketMembers: Long)

  /** [[saveGraphAnnIndex]] WITH the build-dial stamp (`dials/`, one row). */
  def saveGraphAnnIndex(
      graph: DataFrame,
      model: DataFrame,
      entries: DataFrame,
      path: String,
      dials: GraphAnnDials,
      nFiles: Int
  ): Unit = {
    saveGraphAnnIndex(graph, model, entries, path, nFiles)
    val spark = graph.sparkSession
    import spark.implicits._
    Seq(dials).toDF().coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$path/dials")
  }

  /** Read the dial stamp of a [[saveGraphAnnIndex]] artifact — None for a legacy
    * index saved before the stamp existed (the caller's dial consistency is then
    * on them, as before).
    */
  def loadGraphAnnDials(
      spark: org.apache.spark.sql.SparkSession, path: String): Option[GraphAnnDials] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/dials")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else spark.read.parquet(s"$path/dials")
      .select(col("k"), col("nTables"), col("planesPerTable"), col("dims"),
        col("maxBucketMembers"))
      .collect() // 1 row — the artifact stamp, bounded by construction
      .headOption
      .map(r => GraphAnnDials(r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
  }

  /** Reload a [[saveGraphAnnIndex]] artifact: (adjacency, codebook, entries). */
  def loadGraphAnnIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String
  ): (DataFrame, DataFrame, DataFrame) =
    (loadKnnGraph(spark, s"$path/adj"),
      loadCentroids(spark, s"$path/model"),
      spark.read.parquet(s"$path/entries"))

  /** A loaded graph-ANN index WITH its build-dial stamp — what a lifecycle job
    * should hold, so the dial-agreement guard fires by default instead of only
    * for callers who remember to thread [[loadGraphAnnDials]] through (r17
    * advisory: the `builtWith` opt-in left every existing load path compacting
    * unguarded). `dials` is None only for a legacy artifact saved before the
    * stamp existed.
    */
  final case class GraphAnnIndex(
      adj: DataFrame, model: DataFrame, entries: DataFrame, dials: Option[GraphAnnDials])

  /** [[loadGraphAnnIndex]] + the dial stamp in one artifact handle — the load
    * path lifecycle jobs should use: [[compactGraphAnnAdjacency]]'s index
    * overload threads `dials` into the agreement guard automatically.
    */
  def loadGraphAnnIndexStamped(
      spark: org.apache.spark.sql.SparkSession,
      path: String
  ): GraphAnnIndex = {
    val (adj, model, entries) = loadGraphAnnIndex(spark, path)
    GraphAnnIndex(adj, model, entries, loadGraphAnnDials(spark, path))
  }

  /** Compact a LOADED index ([[loadGraphAnnIndexStamped]]): the dial stamp the
    * artifact carries is required to agree with the compaction dials — guarded
    * by DEFAULT, no `builtWith` threading for the caller to forget. A legacy
    * stamp-less artifact compacts unguarded exactly as before (dials = None).
    */
  def compactGraphAnnAdjacency(
      corpus: DataFrame,
      tombstones: DataFrame,
      index: GraphAnnIndex,
      idCol: String,
      vecCol: String,
      k: Int,
      nTables: Int,
      planesPerTable: Int,
      dims: Int,
      maxBucketMembers: Long
  ): DataFrame =
    compactGraphAnnAdjacency(corpus, tombstones, index.adj, idCol, vecCol,
      k, nTables, planesPerTable, dims, maxBucketMembers, builtWith = index.dials)

  /** The ENTRY layer of the graph-ANN index: one representative corpus vector
    * (medoid) per trained coarse-quantizer cell — the batch analog of HNSW's
    * upper layers (Malkov–Yashunin 2016), where a query descends a FIXED-size
    * hierarchy to pick its base-layer entry points instead of scanning a corpus
    * sample. Every nonzero corpus vector is assigned to its nearest trained
    * centroid (the s06/s22 assignment kernel: rounded cosine argmax, cluster-asc
    * tie-break), and each cell's medoid is its best-assigned member (cos desc,
    * id asc) — the graph node a beam enters that region through.
    *
    * Output: (cluster, cand) — exactly one row per surviving cell, so the entry
    * set is MODEL-sized (k rows) at any corpus size. Build-time cost is one
    * corpus map pass against the broadcast k-row codebook (the ivfAssignNew
    * shape), paid when the index is built — never per query batch.
    */
  def graphAnnEntryPoints(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      model: DataFrame
  ): DataFrame = {
    val withCn = withCentroidNorm(model)
    val cents = withCn.select(col("cluster").cast("long").as("cluster"), col("cv"), col("cn"))
    val v = df.select(col(idCol).as("cand"), toDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm2(col("v")))
      .filter(col("nv") > 0)
    val wAsg = Window.partitionBy(col("cand")).orderBy(col("cos").desc, col("cluster").asc)
    val asg = v.crossJoin(broadcast(cents))
      .select(col("cand"), col("cluster"),
        round(cosineFromNorms(dot(col("v"), col("cv")), col("nv"), col("cn")), 6).as("cos"))
      .withColumn("rk", row_number().over(wAsg))
      .filter(col("rk") === 1)
    val wMed = Window.partitionBy(col("cluster")).orderBy(col("cos").desc, col("cand").asc)
    asg.withColumn("mrk", row_number().over(wMed))
      .filter(col("mrk") === 1)
      .select(col("cluster"), col("cand"))
  }

  /** Round-0 seed of [[graphAnnSearch]]: route each query through the trained
    * quantizer — score it against the broadcast k-row codebook, keep its
    * `entryProbe` nearest cells (rounded cos desc, cluster asc), and enter the
    * graph at those cells' medoids. Both joined relations are MODEL-sized
    * (k centroids, ≤ k entry rows), so the seed is |Q|·entryProbe rows at any
    * corpus size — the property PlanSpec pins (nothing corpus-proportional is
    * scored or broadcast before the first beam round).
    */
  private[graft] def graphAnnSeedCandidates(
      qs: DataFrame,
      model: DataFrame,
      entries: DataFrame,
      entryProbe: Int
  ): DataFrame = {
    val withCn = withCentroidNorm(model)
    val cents = withCn.select(col("cluster").cast("long").as("cluster"), col("cv"), col("cn"))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("ccos").desc, col("cluster").asc)
    val qcells = qs.crossJoin(broadcast(cents))
      .select(col("query_id"), col("cluster"),
        round(cosineFromNorms(dot(col("qv"), col("cv")), col("qn"), col("cn")), 6).as("ccos"))
      .withColumn("crk", row_number().over(wq))
      .filter(col("crk") <= entryProbe)
      .select(col("query_id"), col("cluster"))
    qcells
      .join(broadcast(entries.select(col("cluster").cast("long").as("cluster"), col("cand"))),
        Seq("cluster"))
      .select(col("query_id"), col("cand"))
  }

  /** s26 — graph-ANN SEARCH over the [[knnGraph]] artifact: bounded-round beam
    * search, the batch form of the HNSW/NSG base-layer query (Malkov–Yashunin
    * 2016's greedy-with-beam walk, run breadth-synchronous for a whole query
    * batch). Queries ENTER through the trained coarse quantizer — the published
    * structure's fixed-size upper hierarchy: each query routes to its
    * `entryProbe` nearest trained cells against the broadcast k-row codebook
    * and seeds its beam at those cells' medoids ([[graphAnnEntryPoints]]); cell
    * spread matters because the kNN graph holds only NEAR links, so a beam
    * seeded in one region cannot cross to another. Each round then expands the
    * current beam's out-neighbors via ONE equi-join against the neighbor lists,
    * re-scores candidates by exact rounded cosine, and keeps the top-`beam` per
    * query (cos desc, id asc — a total order); after `rounds` rounds the beam's
    * top-`k` non-self survivors are the answer. Recall < 1 by construction (a
    * target outside the explored ball is missed); deeper rounds/wider beams trade
    * cost for recall exactly as in the published structure, and the recall
    * diagnostic vs the s01 exact truth is pinned in RoundTwelveOpsSpec.
    *
    * Scale shape: the graph, codebook, and entry medoids are the persisted index
    * (build once — [[knnGraph]] + [[kmeansRounds]] + [[graphAnnEntryPoints]],
    * the s24 artifact discipline); at query time NOTHING corpus-proportional is
    * touched before the first expansion — the seed is |Q|·entryProbe rows off
    * two model-sized broadcasts — and per round the moving state is ≤ beam rows
    * per query: expansion is a (cand)-keyed equi-join into the neighbor lists,
    * scoring joins the candidate ids back to the vector relation, and the
    * per-query window is bounded by beam·k candidates, never corpus-sized.
    * Rounds are pinned for the oracle (unrolled CTEs); a production searcher
    * runs the same per-round plan to its beam's convergence.
    *
    * Ids need only a total order (tie-breaks are id-asc) — no numeric-id
    * assumption. Fails loudly on an empty codebook or entry set (a corpus with
    * no nonzero vector, or a legacy/mismatched artifact) rather than returning
    * zero rows for every query.
    */
  def graphAnnSearch(
      queries: DataFrame,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      graph: DataFrame,
      model: DataFrame,
      k: Int = 5,
      beam: Int = 8,
      rounds: Int = 2,
      entryProbe: Int = 4,
      entries: Option[DataFrame] = None
  ): DataFrame =
    graphAnnSearchPrepared(queries, idCol, vecCol,
      graphAnnPrepare(df, idCol, vecCol, graph, model, entries), k, beam, rounds, entryProbe)

  /** The batch-invariant half of a graph-ANN SERVING deployment: corpus
    * vectors (with squared norms), adjacency, codebook, and entry medoids,
    * each already materialized via `localCheckpoint` and emptiness-guarded.
    * Built ONCE per index generation by [[graphAnnPrepare]]; every
    * [[graphAnnSearchPrepared]] call (one per query micro-batch in
    * [[graft.streaming.StreamOps.streamingAnnSearch]]) then pays only the
    * batch-sized beam walk — the corpus scan, entry derivation, and the
    * entry-emptiness job are NOT re-run per batch.
    */
  final case class GraphAnnPrepared(
      vecs: DataFrame,
      adj: DataFrame,
      model: DataFrame,
      entries: DataFrame)

  /** Materialize the corpus-sided relations of [[graphAnnSearch]] once. */
  def graphAnnPrepare(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      graph: DataFrame,
      model: DataFrame,
      entries: Option[DataFrame] = None
  ): GraphAnnPrepared = {
    // EAGER checkpoints by contract: callers load these relations from scratch
    // artifacts and delete the files as soon as this returns (the s27/s42
    // oracle shape) — a lazy checkpoint here would read deleted paths at the
    // first downstream action. This is the one prepare-side exception to the
    // r18 lazy-checkpoint default.
    val vecs = df.select(col(idCol).as("cand"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm2(col("cv")))
      .localCheckpoint(true)
    val ent = entries.getOrElse(graphAnnEntryPoints(df, idCol, vecCol, model))
      .localCheckpoint(true)
    // both are model-sized relations — the emptiness probe is a k-row job, and
    // an all-miss search that LOOKS like recall 0 becomes a named error instead
    require(!ent.isEmpty,
      "graphAnnSearch: empty entry set — the trained model matched no nonzero corpus " +
        "vector (empty/zero corpus, or an entries artifact from a different corpus); " +
        "rebuild with graphAnnEntryPoints")
    val adj = graph.select(col("vec_id").as("cand"), col("neighbor_id")).localCheckpoint(true)
    GraphAnnPrepared(vecs, adj, model, ent)
  }

  /** The per-batch half of [[graphAnnSearch]]: seed through the prepared
    * codebook + entries, then `rounds` beam expansions over the prepared
    * adjacency. Everything corpus-sized comes in already checkpointed.
    */
  def graphAnnSearchPrepared(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      prep: GraphAnnPrepared,
      k: Int = 5,
      beam: Int = 8,
      rounds: Int = 2,
      entryProbe: Int = 4
  ): DataFrame = {
    val qs = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm2(col("qv")))
      .localCheckpoint(false)
    beamWalk(qs, graphAnnSeedCandidates(qs, prep.model, prep.entries, entryProbe),
      prep.vecs, prep.adj, k, beam, rounds)
  }

  /** s47 — FILTERED graph-ANN search: the predicate-aware serving leg of the
    * graph index (the IVF side has s29/s31; graphs need their own strategy).
    * The published answer (filtered-DiskANN, Gollapudi et al. 2023; ACORN,
    * Patel et al. 2024) is to TRAVERSE UNFILTERED and HARVEST FILTERED: the
    * beam walks the full graph — pruning disallowed nodes from the frontier
    * would disconnect it exactly when the filter is selective — while every
    * scored candidate that PASSES the predicate is banked in a per-query
    * result pool, and the top-k comes from the pool. The result therefore
    * dominates post-filtering a plain search's final beam (the naive
    * alternative): every allowed candidate the walk ever touched competes,
    * not just the last round's `beam` survivors — RoundSeventeenOpsSpec pins
    * the domination on the s26 corpus.
    *
    * Scale shape: identical to [[graphAnnSearch]] plus one |allowed|-catalog
    * semi-join at harvest; the pool is ≤ |Q|·(rounds+1)·beam·fanout rows —
    * query-batch-sized, never corpus-sized. A filter selective enough to
    * starve even the pool below k is the s31 routing case (scan the allowed
    * subset exactly); this operator is the broad-filter arm of that router.
    */
  def graphAnnSearchFiltered(
      queries: DataFrame,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      graph: DataFrame,
      model: DataFrame,
      allowed: DataFrame,
      k: Int = 5,
      beam: Int = 8,
      rounds: Int = 2,
      entryProbe: Int = 4,
      entries: Option[DataFrame] = None
  ): DataFrame = {
    val allow = allowed.select(col(allowed.columns.head).as("cand")).distinct()
      .localCheckpoint(false) // id catalog; one harvest semi-join
    graphAnnSearchFilteredPrepared(queries, idCol, vecCol,
      graphAnnPrepare(df, idCol, vecCol, graph, model, entries),
      allow, k, beam, rounds, entryProbe)
  }

  /** The per-batch half of [[graphAnnSearchFiltered]] (the
    * [[graphAnnSearchPrepared]] split applied to the filtered walk): the
    * prepared index and the distinct single-column `allow` catalog (column
    * `cand`, already checkpointed) come in batch-invariant; each call pays
    * only the query-batch-sized banked walk and one harvest semi-join —
    * what [[graft.streaming.StreamOps.streamingRoutedAnnSearch]] runs per
    * micro-batch.
    */
  def graphAnnSearchFilteredPrepared(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      prep: GraphAnnPrepared,
      allow: DataFrame,
      k: Int = 5,
      beam: Int = 8,
      rounds: Int = 2,
      entryProbe: Int = 4
  ): DataFrame = {
    val qs = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm2(col("qv")))
      .localCheckpoint(false)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("cand").asc)
    val (pool, _) = graphAnnPoolWalk(qs, prep, beam, rounds, entryProbe)
    pool
      .join(allow, Seq("cand"), "left_semi")
      .filter(col("cand") =!= col("query_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand").as("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** The selective arm both routers serve: exact rounded-cosine top-k of the
    * query batch against the allowed subset of a (cand, cv, cn) vector
    * relation — ONE rendition (value-identical to [[bruteForceTopK]] on the
    * same rows: same dot/norm/round chain, same (cos desc, id asc) order), so
    * the batch router, the prepared router, and the recall card's routed arm
    * cannot drift.
    */
  private def exactAllowedScan(
      qs: DataFrame, vecs: DataFrame, allow: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("cand").asc)
    vecs.join(allow, Seq("cand"), "left_semi")
      .crossJoin(broadcast(qs))
      .filter(col("cand") =!= col("query_id"))
      .select(col("query_id"), col("cand"),
        round(cosineFromNorms(dot(col("qv"), col("cv")), col("qn"), col("cn")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand").as("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** The banked beam traversal shared by [[graphAnnSearchFiltered]] and
    * [[filteredGraphAnnRecallCard]]: run the UNFILTERED walk once and return
    * both everything it ever scored (the distinct harvest pool) and the final
    * beam relation (what a plain search's top-k is cut from). Scoring is exact
    * rounded cosine on every touched candidate — banking a candidate the beam
    * cut still ranks it correctly; the beam cut gates TRAVERSAL only. Each
    * round's scored set is checkpointed (it feeds both the next expansion and
    * the pool union), so the pool costs no recomputation over the plain walk.
    */
  private def graphAnnPoolWalk(
      qs: DataFrame,
      prep: GraphAnnPrepared,
      beam: Int,
      rounds: Int,
      entryProbe: Int
  ): (DataFrame, DataFrame) = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("cand").asc)
    def scoreAll(cands: DataFrame): DataFrame =
      cands.join(qs, Seq("query_id"))
        .join(prep.vecs, Seq("cand"))
        .select(col("query_id"), col("cand"),
          round(cosineFromNorms(dot(col("qv"), col("cv")), col("qn"), col("cn")), 6).as("cos_sim"))
    def cutBeam(scored: DataFrame): DataFrame =
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= beam)
        .select(col("query_id"), col("cand"), col("cos_sim"))
    var scored = scoreAll(
      graphAnnSeedCandidates(qs, prep.model, prep.entries, entryProbe)).localCheckpoint(false)
    var pool = scored
    var beamRel = cutBeam(scored)
    for (_ <- 1 to rounds) {
      val expanded = beamRel.select(col("query_id"), col("cand"))
        .join(prep.adj, Seq("cand"))
        .select(col("query_id"), col("neighbor_id").as("cand"))
        .unionByName(beamRel.select(col("query_id"), col("cand")))
        .distinct()
      scored = scoreAll(expanded).localCheckpoint(false)
      pool = pool.unionByName(scored)
      beamRel = cutBeam(scored)
    }
    // (query, cand) cosines are deterministic — distinct is exact
    (pool.distinct(), beamRel)
  }

  /** s49 — the FILTERED graph-ANN recall card: [[filteredAnnRecall]]'s (s30)
    * discipline pointed at the GRAPH index — recall@k of the s47 harvest walk
    * against the brute-force top-k UNDER THE SAME PREDICATE, with the naive
    * alternative (post-filtering a plain search's top-k) priced beside it in
    * the same card. One row per (filter, method, query), misses kept as
    * explicit 0 rows (the s07 convention), so a tenant filter on the graph
    * index tunes beam/rounds from a measurement instead of blind — and the
    * starvation regime is legible: a filter whose allowed mass barely reaches
    * the pool reads < 1.0 on the harvest arm and WORSE on the postfilter arm
    * (the domination RoundSeventeenOpsSpec pins, here measured per query).
    * With `routedThresholdMicro` set (s51), a third arm measures the s48
    * ROUTER's answer per filter — the starving filter served by the exact
    * allowed scan (recall = the maximum the allowed mass admits), the broad
    * one by the harvest walk — so what routing BUYS over serving the raw walk
    * is a read-off, not an inference.
    *
    * Scale shape: the expensive side — the unfiltered traversal — runs ONCE
    * for all filter arms ([[graphAnnPoolWalk]]; the pool and plain top-k are
    * filter-independent and checkpointed), so adding a tenant's filter to the
    * card costs one |allowed|-subset brute-force truth (the recall-card cost
    * every diagnostic here pays, s07/s30/s45 precedent — query-batch ×
    * allowed-subset, pruned before scoring) plus two catalog semi-joins and
    * one (query, neighbor) equi-join. Nothing corpus-quadratic; the grid is
    * |queries|·|methods| rows per filter.
    */
  def filteredGraphAnnRecallCard(
      queries: DataFrame,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      graph: DataFrame,
      model: DataFrame,
      filters: Seq[(String, DataFrame)],
      k: Int = 5,
      beam: Int = 8,
      rounds: Int = 2,
      entryProbe: Int = 4,
      entries: Option[DataFrame] = None,
      routedThresholdMicro: Option[Long] = None
  ): DataFrame = {
    require(filters.nonEmpty, "filteredGraphAnnRecallCard: no filter arms")
    filters.foreach { case (name, a) =>
      require(a.columns.length == 1,
        s"filteredGraphAnnRecallCard: filter '$name' must be a single-id-column " +
          s"relation, got [${a.columns.mkString(", ")}]")
    }
    val prep = graphAnnPrepare(df, idCol, vecCol, graph, model, entries)
    val qs = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm2(col("qv")))
      .localCheckpoint(false)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("cand").asc)
    val (pool, beamRel) = graphAnnPoolWalk(qs, prep, beam, rounds, entryProbe)
    // r18: the shared (filter-independent) relations materialize EAGERLY here —
    // the pool walk, the plain top-k, and the prepared index behind them — so
    // the per-filter arms below can run as parallel threads over small plans
    // (the s45 Par shape) without racing to compute a shared lazy checkpoint
    val poolC = pool.localCheckpoint(true) // shared by every filter arm
    // the plain search's answer (s26's top-k cut of the final beam) — what the
    // naive postfilter arm filters; also filter-independent, so computed once
    val plainTopK = beamRel.filter(col("cand") =!= col("query_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand"))
      .localCheckpoint(true)
    val qids = qs.select(col("query_id")).localCheckpoint(true)
    // the routed arm's corpus scalar — one register read off the checkpointed
    // vector relation, paid only when the routed arm is requested (s51)
    val nCorpus = routedThresholdMicro.map(_ => prep.vecs.count())
    val methods = Seq("harvest", "postfilter") ++
      routedThresholdMicro.map(_ => "routed").toSeq
    Par.seq(filters.map { case (name, allowed) => () =>
      val allow = allowed.select(col(allowed.columns.head).as("cand")).distinct()
        .localCheckpoint(true)
      val truth = bruteForceTopK(queries,
          df.join(allowed.select(col(allowed.columns.head).as(idCol)), Seq(idCol), "left_semi"),
          idCol, vecCol, k)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(false)
      val harvest = poolC.join(allow, Seq("cand"), "left_semi")
        .filter(col("cand") =!= col("query_id"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(lit("harvest").as("method"), col("query_id"), col("cand").as("neighbor_id"))
        .localCheckpoint(false) // the routed broad arm re-reads it
      val post = plainTopK.join(allow, Seq("cand"), "left_semi")
        .select(lit("postfilter").as("method"), col("query_id"), col("cand").as("neighbor_id"))
      // the s48 ROUTER's answer, measured in the same card: a starving filter
      // is served by the exact allowed scan (one rendition with the router's
      // arm), a broad one by the harvest walk already priced above — so the
      // card reads what routing BUYS over serving the raw walk
      val routed = routedThresholdMicro.toSeq.map { thr =>
        val selMicro = (2L * 1000000L * allow.count() + nCorpus.get) / (2L * nCorpus.get)
        val arm =
          if (selMicro <= thr) exactAllowedScan(qs, prep.vecs, allow, k)
            .select(col("query_id"), col("neighbor_id"))
          else harvest.select(col("query_id"), col("neighbor_id"))
        arm.select(lit("routed").as("method"), col("query_id"), col("neighbor_id"))
      }
      val hits = (Seq(harvest, post) ++ routed).reduce(_ unionByName _)
        .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("method"), col("query_id"))
        .agg(count(lit(1)).as("n_hit"))
      qids
        .select(col("query_id"),
          explode(array(methods.map(lit): _*)).as("method"))
        .join(hits, Seq("method", "query_id"), "left")
        .select(lit(name).as("filter_name"), col("method"), col("query_id"),
          round(coalesce(col("n_hit"), lit(0L)).cast("double") / lit(k.toDouble), 6)
            .as("recall_at_k"))
        .localCheckpoint(true) // the arm's card slice — grid-sized
    }).reduce(_ unionByName _)
  }

  /** s48 — the GRAPH-side filtered-search ROUTER: [[graphAnnSearchFiltered]]
    * (traverse unfiltered, harvest filtered — the broad-filter arm) composed
    * with an exact scan of the allowed subset (the selective arm), routed by
    * the same census-fed selectivity scalar [[filteredTopKAdaptive]] uses on
    * the IVF side. s47's own contract names the starvation case this closes:
    * a filter selective enough to starve even the harvest pool below k makes
    * graph traversal pointless — the walk pays the full beam cost to touch
    * mostly-disallowed nodes, while the allowed subset is small enough
    * (≤ `selThresholdMicro` of the corpus, by premise) to score exactly.
    * The route and the measured selectivity ride every output row, so a
    * result is always attributable to the plan that produced it (the s31
    * discipline; filtered-DiskANN §5 and ACORN §4.3 publish exactly this
    * two-regime split for graph indexes).
    *
    * Selectivity = |allowed| / |corpus| in half-up integer micro units — two
    * driver scalars that choose the plan BEFORE it is built; only the chosen
    * branch ever runs. `census` short-circuits the corpus count from any
    * maintained per-cell relation carrying `n_members` (the trained codebook's
    * own member counts, or the s33 census rows — the artifact the graph index
    * already keeps next to its adjacency); `allowedSize` likewise when the
    * tenant catalog knows its cardinality. The raw `.count()`s are the
    * census-less fallback only (metadata-cheap on parquet relations).
    *
    * Scale shape: the exact arm is a broadcast-queries × allowed-semi-join
    * scan, linear in |allowed| which the threshold caps; the graph arm is
    * s47's plan unchanged. At 100 TB the routing is per query-batch against
    * the shared artifact — tenant filters hit whichever plan their
    * selectivity earns, and the starved walk is never paid.
    */
  def graphAnnFilteredRouted(
      queries: DataFrame,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      graph: DataFrame,
      model: DataFrame,
      allowed: DataFrame,
      k: Int = 5,
      beam: Int = 8,
      rounds: Int = 2,
      entryProbe: Int = 4,
      selThresholdMicro: Long = 250000L,
      census: Option[DataFrame] = None,
      allowedSize: Option[Long] = None,
      entries: Option[DataFrame] = None
  ): DataFrame = {
    require(allowed.columns.length == 1,
      s"graphAnnFilteredRouted: allowed must be a single-id-column relation, " +
        s"got [${allowed.columns.mkString(", ")}]")
    census.foreach(c => require(c.columns.contains("n_members"),
      s"graphAnnFilteredRouted: census must carry n_members (the codebook/s33 " +
        s"artifact shape), got [${c.columns.mkString(", ")}]"))
    val nCorpus = census
      .map(_.agg(coalesce(sum(col("n_members")), lit(0L)).cast("long"))
        .collect()(0).getLong(0)) // k-row artifact aggregate, never a corpus pass
      .getOrElse(df.count())
    require(nCorpus > 0, "graphAnnFilteredRouted: empty corpus — nothing to search")
    val nAllowed = allowedSize.getOrElse(allowed.count())
    val selMicro = (2L * 1000000L * nAllowed + nCorpus) / (2L * nCorpus)
    val routed =
      if (selMicro <= selThresholdMicro) {
        val qs = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
          .withColumn("qn", norm2(col("qv")))
        val vecs = df.select(col(idCol).as("cand"), toDouble(col(vecCol)).as("cv"))
          .withColumn("cn", norm2(col("cv")))
        exactAllowedScan(qs, vecs,
          allowed.select(col(allowed.columns.head).as("cand")).distinct(), k)
          .withColumn("route", lit("exact_allowed_scan"))
      } else {
        graphAnnSearchFiltered(queries, df, idCol, vecCol, graph, model, allowed,
            k, beam, rounds, entryProbe, entries)
          .withColumn("route", lit("graph_harvest"))
      }
    routed.select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"),
      col("route"), lit(selMicro).as("selectivity_micro"))
  }

  /** The per-batch half of [[graphAnnFilteredRouted]]: the prepared index,
    * the checkpointed single-column `allow` catalog (column `cand`), and the
    * two routing scalars come in batch-invariant — corpus size and tenant
    * catalog size do not change per query micro-batch, so the route is
    * decided once per batch from two longs and only the chosen arm runs.
    * The exact arm scans `prep.vecs` (the same (cand, cv, cn) relation the
    * walk scores against) through [[exactAllowedScan]] — the one selective-arm
    * rendition — so a streamed batch and [[graphAnnFilteredRouted]] on the
    * identical batch return identical rows (StreamOpsSpec pins it).
    */
  def graphAnnFilteredRoutedPrepared(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      prep: GraphAnnPrepared,
      allow: DataFrame,
      nCorpus: Long,
      nAllowed: Long,
      k: Int = 5,
      beam: Int = 8,
      rounds: Int = 2,
      entryProbe: Int = 4,
      selThresholdMicro: Long = 250000L
  ): DataFrame = {
    require(nCorpus > 0, "graphAnnFilteredRoutedPrepared: empty corpus — nothing to search")
    val selMicro = (2L * 1000000L * nAllowed + nCorpus) / (2L * nCorpus)
    val routed =
      if (selMicro <= selThresholdMicro) {
        val qs = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
          .withColumn("qn", norm2(col("qv")))
        exactAllowedScan(qs, prep.vecs, allow, k)
          .withColumn("route", lit("exact_allowed_scan"))
      } else {
        graphAnnSearchFilteredPrepared(queries, idCol, vecCol, prep, allow,
            k, beam, rounds, entryProbe)
          .withColumn("route", lit("graph_harvest"))
      }
    routed.select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"),
      col("route"), lit(selMicro).as("selectivity_micro"))
  }

  /** The beam-walk core shared by [[graphAnnSearchPrepared]] (medoid seeds) and
    * [[graphAnnSearchLayered]] (medoid ∪ layer-descent seeds): score the seed
    * set, then `rounds` of expand-via-adjacency / exact-rescore / keep-top-beam,
    * then the top-`k` non-self survivors. `qs` = (query_id, qv, qn), `seed` =
    * (query_id, cand).
    */
  private def beamWalk(
      qs: DataFrame,
      seed: DataFrame,
      vecs: DataFrame,
      adj: DataFrame,
      k: Int,
      beam: Int,
      rounds: Int
  ): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("cand").asc)
    def scoreBeam(cands: DataFrame): DataFrame =
      cands.join(qs, Seq("query_id"))
        .join(vecs, Seq("cand"))
        .select(col("query_id"), col("cand"),
          round(cosineFromNorms(dot(col("qv"), col("cv")), col("qn"), col("cn")), 6).as("cos_sim"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= beam)
        .select(col("query_id"), col("cand"), col("cos_sim"))
    var beamRel = scoreBeam(seed).localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val expanded = beamRel.select(col("query_id"), col("cand"))
        .join(adj, Seq("cand"))
        .select(col("query_id"), col("neighbor_id").as("cand"))
        .unionByName(beamRel.select(col("query_id"), col("cand")))
        .distinct()
      beamRel = scoreBeam(expanded).localCheckpoint(false)
    }
    beamRel.filter(col("cand") =!= col("query_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand").as("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** The FIXED-SIZE md5 layer stack of [[graphAnnSearchLayered]]: layer i
    * (1-based, sizes DECREASING so the last is the top) is the first
    * `layerSizes(i-1)` nonzero corpus vectors in (md5(id), id) order — the
    * deterministic analog of HNSW's geometric level sampling (Malkov–Yashunin
    * 2016 §4: each node's max level is sampled with an exponentially decaying
    * distribution; a hash-order prefix realizes the same "each level is a
    * ~1/M subsample of the one below" shape without randomness), and the
    * same corpus-INDEPENDENT-size rule the r13 entry-set fix pinned for s26.
    * Because every layer is a PREFIX of the same ordering, upper layers are
    * subsets of lower ones — the HNSW nesting invariant — so a descent never
    * loses its anchor when it drops a level. Each member is stamped with its
    * trained coarse cell (the s22/s33 assignment), which serves as the
    * INTER-LAYER link structure: level l+1's anchors connect to level l's
    * members through shared cells, replacing HNSW's per-level link lists with
    * a relation the oracle can reproduce.
    *
    * Output: (layer, cand, cv, cn, cluster) — Σ layerSizes rows at ANY corpus
    * size. The md5-order prefix is a bounded top-N (heap per partition), never
    * a global sort materialization.
    */
  private[graft] def graphAnnLayers(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      model: DataFrame,
      layerSizes: Seq[Int]
  ): DataFrame = {
    require(layerSizes.nonEmpty && layerSizes == layerSizes.sorted(Ordering[Int].reverse),
      s"graphAnnLayers: layer sizes must decrease toward the top, got $layerSizes")
    val cents = broadcast(withCentroidNorm(model)
      .select(col("cluster").cast("long").as("cluster"), col("cv").as("ccv"), col("cn").as("ccn")))
    val base = df.select(col(idCol).as("cand"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm2(col("cv")))
      .filter(col("cn") > 0)
    val stack = layerSizes.zipWithIndex.map { case (n, i) =>
      base.orderBy(md5(col("cand").cast("string")).asc, col("cand").asc).limit(n)
        .withColumn("layer", lit(i + 1))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy(col("layer"), col("cand"))
      .orderBy(col("ccos").desc, col("cluster").asc)
    stack.crossJoin(cents)
      .select(col("layer"), col("cand"), col("cv"), col("cn"), col("cluster"),
        round(cosineFromNorms(dot(col("cv"), col("ccv")), col("cn"), col("ccn")), 6).as("ccos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("layer"), col("cand"), col("cv"), col("cn"), col("cluster"))
  }

  /** s34 — MULTI-LAYER graph-ANN: [[graphAnnSearch]] with an HNSW-flavored
    * descent ADDED to the trained medoid entry. The query first scores the
    * tiny top layer in full (fixed rows, broadcast), keeps its `layerProbe`
    * anchors, then at each lower layer scores only the members sharing a
    * trained COARSE CELL with a current anchor (the inter-layer link; anchors
    * themselves persist downward because layers are nested prefixes) and keeps
    * the new top `layerProbe`. The bottom layer's anchors join the s26 medoid
    * seeds in the base-layer beam walk — the seed set is a SUPERSET of s26's,
    * and RoundFifteenOpsSpec measures recall@k ≥ s26's at equal beam width on
    * the s30-style diagnostic.
    *
    * Scale shape: every layer relation is corpus-INDEPENDENT in size
    * (Σ layerSizes rows, PlanSpec-pinned via [[graphAnnLayers]]); descent cost
    * per query is ≤ |top layer| + layers·layerProbe·|cell ∩ layer| scored
    * rows — model-sized, never corpus-sized; the base walk is [[beamWalk]]
    * unchanged. Build once per index generation like the medoid entries.
    *
    * Determinism: layer membership is the md5-order prefix, anchors and beams
    * break ties (cos desc, id asc) — oracle-mirrorable end to end.
    */
  def graphAnnSearchLayered(
      queries: DataFrame,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      graph: DataFrame,
      model: DataFrame,
      k: Int = 5,
      beam: Int = 8,
      rounds: Int = 2,
      entryProbe: Int = 4,
      layerSizes: Seq[Int] = Seq(32, 8),
      layerProbe: Int = 2,
      entries: Option[DataFrame] = None
  ): DataFrame = {
    val prep = graphAnnPrepare(df, idCol, vecCol, graph, model, entries)
    val layers = graphAnnLayers(df, idCol, vecCol, model, layerSizes)
      .localCheckpoint(false) // Σ layerSizes rows — model-sized
    val qs = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm2(col("qv")))
      .localCheckpoint(false)
    val wAnchor = Window.partitionBy(col("query_id")).orderBy(col("acos").desc, col("cand").asc)
    def topAnchors(cands: DataFrame): DataFrame =
      cands.join(qs, Seq("query_id"))
        .select(col("query_id"), col("cand"), col("cluster"),
          round(cosineFromNorms(dot(col("qv"), col("cv")), col("qn"), col("cn")), 6).as("acos"))
        .withColumn("rk", row_number().over(wAnchor))
        .filter(col("rk") <= layerProbe)
        .select(col("query_id"), col("cand"), col("cluster"))
    val topLayer = layers.filter(col("layer") === layerSizes.length)
    var anchors = topAnchors(
      qs.select(col("query_id"))
        .crossJoin(broadcast(topLayer.select(col("cand"), col("cv"), col("cn"), col("cluster")))))
    for (l <- (layerSizes.length - 1) to 1 by -1) {
      val lay = layers.filter(col("layer") === l)
      val cands = anchors.select(col("query_id"), col("cluster")).distinct()
        .join(lay, Seq("cluster"))
        .select(col("query_id"), col("cand"), col("cv"), col("cn"), col("cluster"))
        .distinct()
      anchors = topAnchors(cands)
    }
    val seeds = graphAnnSeedCandidates(qs, prep.model, prep.entries, entryProbe)
      .unionByName(anchors.select(col("query_id"), col("cand")))
      .distinct()
    beamWalk(qs, seeds, prep.vecs, prep.adj, k, beam, rounds)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication by
    * cluster-then-dedup — assign every embedding to its nearest coarse centroid
    * (the s04 IVF assignment: deterministic 1-in-`centroidMod` centroid sample so
    * the oracle reproduces cells bit-for-bit), then within each cell mark a vector
    * a duplicate when a LOWER-id vector in the same cell has cosine ≥ `threshold`
    * (the keep-one-representative rule, min-id as the deterministic survivor).
    * Output per vector: its cell, how many lower-id near-twins share the cell, and
    * the keep verdict the curation pipeline filters on.
    *
    * Scale shape: pairwise comparison happens ONLY within cells — the defining
    * SemDeDup property (Σ|cell|² ≪ n² for any reasonable centroid count); the
    * centroid table is broadcast, cells come from an equi-join on cell id, and the
    * per-vector verdict is a map-side-combinable count. A skewed mega-cell is the
    * known failure mode at corpus scale — `maxCellMembers` excludes such cells from
    * the pairwise pass (members keep by default, screened by the exact d01/d02
    * operators instead), exactly like the d-family's doc-freq cap; the durable
    * remedy is raising the centroid count.
    */
  /** d24 — SEMANTIC decontamination: the embedding-space counterpart of the d19
    * n-gram probe. Benchmark vectors (`id % benchmarkMod == 0`, the d19 eval
    * convention) broadcast into ONE scan of the training vectors; each training
    * vector reports its nearest benchmark item (max rounded cosine, bench-id
    * tie-break) and is `contaminated` iff that similarity reaches
    * `thresholdMicro`. This catches what d19 cannot: PARAPHRASED eval leakage —
    * a reworded benchmark question shares no 5-gram with the original but sits
    * next to it in embedding space (the published motivation for
    * embedding-level contamination checks alongside n-gram ones).
    *
    * Scale shape: the benchmark side is eval-suite-sized and broadcast; the
    * training side streams through once, and the per-vector max is a map-side-
    * combinable aggregate of a (cos_micro, bench) struct — no window, no
    * shuffle of the pair relation, state is one row per training vector.
    * Cosines quantize to integer micro units off the rounded value (the MMR
    * idiom), so the argmax and the threshold compare are engine-exact.
    */
  def semanticDecontaminate(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      benchmarkMod: Long = 10L,
      thresholdMicro: Long = 950000L
  ): DataFrame =
    semanticProbe(
      df.filter(col(idCol) % benchmarkMod =!= 0),
      df.filter(col(idCol) % benchmarkMod === 0),
      idCol, vecCol, thresholdMicro)

  /** The probe half of [[semanticDecontaminate]], separated so the benchmark
    * vectors can be a LOADED artifact and a stream can gate arrivals against
    * them (the d19/d20 index/probe split applied to the embedding direction).
    * `benchmark` shares `train`'s (idCol, vecCol) shape.
    */
  def semanticProbe(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      vecCol: String,
      thresholdMicro: Long
  ): DataFrame = {
    // an empty benchmark would cross-join to ZERO rows — every vector silently
    // unscored, reading as "stream is clean" downstream. Fail loudly instead
    // (the ivfAssignNew/ccnetTertiles misconfiguration discipline); the
    // benchmark is eval-suite-sized, so the probe is cheap.
    require(!benchmark.isEmpty,
      "semanticProbe: empty benchmark relation — no vector would be scored " +
        "(wrong eval split, stale artifact?)")
    def vecs(df: DataFrame): DataFrame =
      df.select(col(idCol).as("vid"), toDouble(col(vecCol)).as("v"))
        .withColumn("nv", norm2(col("v")))
    val bench = broadcast(vecs(benchmark)
      .select(col("vid").as("bench_id"), col("v").as("bv"), col("nv").as("bn")))
    val cosMicro = floor(lit(1000000.0) *
      round(cosineFromNorms(dot(col("v"), col("bv")), col("nv"), col("bn")), 6)
      + lit(0.5)).cast("long")
    vecs(train)
      .crossJoin(bench)
      .select(col("vid").as("vec_id"), col("bench_id"), cosMicro.as("cos_micro"))
      // struct max = (highest cos, then LOWEST bench id): deterministic argmax
      // without a data-sized window — negating the id makes lexicographic max
      // pick the smallest bench id on cosine ties
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cos_micro"), (-col("bench_id")).as("neg"),
        col("bench_id"))).as("m"))
      .select(
        col("vec_id"),
        col("m.bench_id").as("bench_id"),
        col("m.cos_micro").as("max_cos_micro"),
        (col("m.cos_micro") >= thresholdMicro).cast("int").as("contaminated"))
  }

  def semDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      centroidMod: Int = 97,
      maxCellMembers: Long = 100000L
  ): DataFrame = {
    val cents = broadcast(
      df.filter(col(idCol) % centroidMod === 0)
        .select(col(idCol).as("cid"), toDouble(col(vecCol)).as("cv"))
        .withColumn("cn", norm2(col("cv"))))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cc").desc, col("cid").asc)
    // nearest cell per vector (argmax cosine, rounded so the tie-break is
    // engine-independent); self-joins below, so materialize once
    val cells = df.select(col(idCol).as("vec_id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm2(col("v")))
      .crossJoin(cents)
      .select(col("vec_id"), col("v"), col("nv"), col("cid"),
        round(cosineFromNorms(dot(col("v"), col("cv")), col("nv"), col("cn")), 6).as("cc"))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("v"), col("nv"), col("cid"))
      .localCheckpoint(false)
    // the mega-cell guard the scale note promises: a cell above `maxCellMembers` is
    // excluded from the pairwise pass (its members keep by default and fall to the
    // exact d01/d02 screens) — one such cell is quadratic in its membership, and the
    // published remedy at corpus scale is raising the centroid count; the cap keeps
    // the job alive until that retune. Default never binds at bench scale factors,
    // so the oracle mirror stays capless-equivalent.
    val smallCells = cells.groupBy(col("cid")).agg(count(lit(1)).as("cell_n"))
      .filter(col("cell_n") <= maxCellMembers)
      .select(col("cid"))
    val admitted = cells.join(smallCells, Seq("cid"))
    val close = admitted
      .join(admitted.select(col("cid"), col("vec_id").as("other_id"),
        col("v").as("ov"), col("nv").as("on2")), Seq("cid"))
      .filter(col("other_id") < col("vec_id"))
      .filter(round(cosineFromNorms(dot(col("v"), col("ov")), col("nv"), col("on2")), 6)
        >= threshold)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_close_lower"))
    cells.select(col("vec_id"), col("cid"))
      .join(close, Seq("vec_id"), "left")
      .select(
        col("vec_id"), col("cid"),
        coalesce(col("n_close_lower"), lit(0L)).as("n_close_lower"),
        (coalesce(col("n_close_lower"), lit(0L)) === 0).as("is_kept"))
  }

  /** Symmetric int8 quantization diagnostics — the compression step before an ANN index
    * is shipped to serving: per vector, scale = max|x|/127, q_i = clamp(⌊x_i/scale + ½⌋),
    * and the reconstruction quality that decides whether int8 is acceptable for the
    * corpus. Outputs per vector: n_dims, scale, Σ|q_i| (exact integer — the signature of
    * the quantized vector) and max_i |x_i − q_i·scale| (max is order-independent, unlike
    * a mean, so the distributed result is bitwise deterministic).
    *
    * Everything is one codegen'd map pass over the vectors — no shuffle, no UDF. The
    * rounding is ⌊x + ½⌋ (half-toward-+∞) rather than `round` because both engines
    * define floor identically on doubles, while round's half-case tie-breaking differs
    * by sign convention across engines. Zero vectors (scale undefined) are excluded
    * explicitly rather than emitted with null metrics.
    */
  def quantizeError(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    def quant(x: Column, scale: Column): Column =
      greatest(lit(-127.0), least(lit(127.0), floor(x / scale + lit(0.5))))
    // NB: the raw scale column must NOT be named "scale" — the output alias
    // `round(..).as("scale")` would shadow it via lateral column alias resolution,
    // silently quantizing against the 6-digit-rounded scale instead of the real one.
    df.select(col(idCol).as("vec_id"), toDouble(col(vecCol)).as("dv"))
      .withColumn("maxabs", array_max(transform(col("dv"), x => abs(x))))
      .filter(col("maxabs") > 0)
      .withColumn("scale_raw", col("maxabs") / lit(127.0))
      .select(
        col("vec_id"),
        size(col("dv")).as("n_dims"),
        round(col("scale_raw"), 6).as("scale"),
        aggregate(
          transform(col("dv"), x => abs(quant(x, col("scale_raw"))).cast("long")),
          lit(0L), (acc, x) => acc + x).as("sum_abs_q"),
        round(
          array_max(transform(col("dv"), x => abs(x - quant(x, col("scale_raw")) * col("scale_raw")))),
          6).as("max_abs_err")
      )
  }

  /** The int8 index artifact behind [[int8TopK]] (s35/s36): per nonzero vector
    * its clamped symmetric int8 codes and the RAW double scale (max|x|/127 —
    * not the 6-digit display rounding; quantizing against a rounded scale is
    * the [[quantizeError]] shadowing bug this column naming guards). Codes are
    * ints and the scale a double, so the artifact round-trips parquet
    * bit-exactly and a reloaded index searches identically (s24 discipline).
    * At 100 TB this relation IS the serving footprint win: 1 byte/dim + one
    * double against 8 bytes/dim.
    */
  def int8Quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    def quant(x: Column, scale: Column): Column =
      greatest(lit(-127.0), least(lit(127.0), floor(x / scale + lit(0.5))))
    df.select(col(idCol).as("vec_id"), toDouble(col(vecCol)).as("dv"))
      .withColumn("maxabs", array_max(transform(col("dv"), x => abs(x))))
      .filter(col("maxabs") > 0)
      .withColumn("scale_raw", col("maxabs") / lit(127.0))
      .select(col("vec_id"),
        transform(col("dv"), x => quant(x, col("scale_raw")).cast("int")).as("qcodes"),
        col("scale_raw").as("qscale"))
  }

  /** Persist / reload the [[int8Quantize]] artifact (one generation, the
    * saveCentroids layout; ints and doubles round-trip parquet bit-exactly).
    */
  def saveInt8Index(index: DataFrame, path: String, nFiles: Int = 16): Unit =
    index.repartitionByRange(math.max(nFiles, 1), col("vec_id"))
      .sortWithinPartitions(col("vec_id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  def loadInt8Index(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** s38 — DELETE from the serving artifact: drop tombstoned vectors from the
    * [[int8Quantize]] index by one anti-join, the compaction-rewrite half of the
    * index lifecycle (the d21/d22 append/compact discipline applied to ANN
    * serving: GDPR erasure and re-crawl retractions arrive as id lists, and a
    * 100-TB index answers them by rewriting the survivors — never by rebuilding
    * the quantization, whose codes are per-vector and therefore unaffected).
    * Persist the result with [[saveInt8Index]] and the reloaded artifact must
    * search EXACTLY like an index built fresh on the surviving corpus — the
    * identity RoundFifteenOpsSpec pins and the s38 oracle hash-checks.
    *
    * Scale shape: one broadcast-able anti-join on the id (tombstone lists are
    * catalogs); the rewrite streams the 1-byte/dim artifact once.
    */
  def deleteFromInt8Index(index: DataFrame, tombstones: DataFrame, idCol: String): DataFrame =
    index.join(tombstones.select(col(idCol).as("vec_id")), Seq("vec_id"), "left_anti")

  /** s35 — INT8 scalar-quantized search (the Faiss SQ8 serving shape): the
    * corpus is held as the [[int8Quantize]] artifact, each candidate scored by
    * the cosine against its RECONSTRUCTION (code × scale — the exact double
    * both engines derive), the per-query shortlist overfetched at
    * `k · overfetch`, and the final top-k reranked by EXACT cosine on the true
    * vectors — the s11/s15 two-stage discipline with compression instead of a
    * prefix as the coarse stage. The quantized stage's ranking error is
    * bounded by the reconstruction error [[quantizeError]] reports — the two
    * operators are the measure/serve pair of the same compression decision.
    *
    * Scale shape: the query side broadcasts (|Q| rows); the quantized scan
    * streams the 1-byte/dim artifact (at 100 TB the coarse stage reads ~8×
    * fewer bytes than a float scan — this is the point); the rerank touches
    * only |Q|·k·overfetch true vectors via an id equi-join. Production
    * composes the same scorer inside IVF cells (s16/s23's pruning) — pinned
    * brute here so the oracle prices the quantization exactly.
    *
    * Determinism: codes are exact ints, reconstruction is one double multiply,
    * cosines round(,6) with id tie-breaks — both stages oracle-mirrored.
    */
  def int8TopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      overfetch: Int = 4
  ): DataFrame =
    int8TopKWith(queries, candidates, idCol, vecCol, k,
      int8Quantize(candidates, idCol, vecCol), overfetch)

  /** The serving half of [[int8TopK]] over an explicit (possibly RELOADED)
    * quantized index — s36's round trip enters here and must reproduce s35
    * verbatim (they share the oracle SQL, the d17/d18 discipline).
    */
  def int8TopKWith(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      index: DataFrame,
      overfetch: Int = 4
  ): DataFrame = {
    val recon = index.select(col("vec_id").as("neighbor_id"),
        transform(col("qcodes"), x => x.cast("double") * col("qscale")).as("rv"))
      .withColumn("rn", norm2(col("rv")))
    val qs = broadcast(
      queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
        .withColumn("qn", norm2(col("qv"))))
    val wCoarse = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("neighbor_id").asc)
    val shortlist = qs.crossJoin(recon)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosineFromNorms(dot(col("qv"), col("rv")), col("qn"), col("rn")), 6).as("qcos"))
      .withColumn("crk", row_number().over(wCoarse))
      .filter(col("crk") <= k * overfetch)
      .select(col("query_id"), col("neighbor_id"))
    val exact = candidates.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm2(col("cv")))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    shortlist
      .join(exact, Seq("neighbor_id"))
      .join(qs, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosineFromNorms(dot(col("qv"), col("cv")), col("qn"), col("cn")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** s37 — the PREFIX-RECALL curve: coarse-only top-k under each matryoshka prefix
    * width vs the exact full-dimension top-k — the dial sweep that decides which
    * truncation [[rerankTopK]]'s coarse stage (s11, `coarseDims`) can afford per
    * serving tier (the s32 probe-curve discipline applied to the s11 dial; Kusupati
    * et al. 2022's MRL deployment question). No rerank inside the measured stage:
    * the curve prices the truncation itself, worst case — a width that reads 1.0
    * here needs no rerank at all, and anything below it gets exactly the s11
    * overfetch treatment.
    *
    * Scale shape: ONE corpus pass computes every prefix norm (prefixes nest — the
    * level relation is a broadcast explode over the widths); the truth set is one
    * [[bruteForceTopK]]; per (width, query) hits are a left-semi join counted
    * map-side. Output one row per (prefix_dims, query) — the grid keeps zero-hit
    * queries explicit (the s32/s33 grid discipline).
    */
  def prefixRecallCurve(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      prefixLevels: Seq[Int]
  ): DataFrame = {
    require(prefixLevels.nonEmpty, "prefixRecallCurve: no prefix levels")
    val levels = queries.sparkSession.range(1)
      .select(explode(array(prefixLevels.map(lit(_)): _*)).as("prefix_dims"))
    val qs = broadcast(
      queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
        .crossJoin(levels)
        .withColumn("qp", slice(col("qv"), lit(1), col("prefix_dims")))
        .withColumn("qpn", norm2(col("qp")))
        .filter(col("qpn") > 0)
        .select(col("prefix_dims"), col("query_id"), col("qp"), col("qpn")))
    val cand = candidates
      .select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
      .crossJoin(broadcast(levels))
      .select(col("prefix_dims"), col("neighbor_id"),
        slice(col("cv"), lit(1), col("prefix_dims")).as("cp"))
      .withColumn("cpn", norm2(col("cp")))
      .filter(col("cpn") > 0)
    val wCoarse = Window.partitionBy(col("prefix_dims"), col("query_id"))
      .orderBy(col("pcos").desc, col("neighbor_id").asc)
    val approx = qs.join(cand, Seq("prefix_dims"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("prefix_dims"), col("query_id"), col("neighbor_id"),
        round(cosineFromNorms(dot(col("qp"), col("cp")), col("qpn"), col("cpn")), 6).as("pcos"))
      .withColumn("rk", row_number().over(wCoarse))
      .filter(col("rk") <= k)
      .select(col("prefix_dims"), col("query_id"), col("neighbor_id"))
    val truth = bruteForceTopK(queries, candidates, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = approx.join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("prefix_dims"), col("query_id"))
      .agg(count(lit(1)).as("n_hit"))
    queries.select(col(idCol).as("query_id")).crossJoin(broadcast(levels))
      .join(hits, Seq("prefix_dims", "query_id"), "left")
      .select(col("prefix_dims"), col("query_id"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / lit(k.toDouble), 6)
          .as("recall_at_k"))
  }

  /** s44 — TUNED-PREFIX search: the s41 measure-then-actuate loop on the OTHER
    * serving dial — the matryoshka truncation width (s11's `coarseDims`,
    * priced by the s37 curve). Built single-pass from the start (the lesson
    * the r15 verdict taught s41): ONE width-fanned coarse shortlist is
    * computed over one corpus pass (prefixes nest; every width's scores ride
    * the same pair relation) and checkpointed at k·overfetch rows per
    * (width, query); the recall curve reads its ≤ k prefix against the exact
    * truth, pools per width in exact integers, and the SMALLEST width meeting
    * `targetRecallMicro` wins (largest as fallback — the candidate bill and
    * the bytes read scale with the width, so smallest-sufficient). The
    * actuated search then pays ONLY the exact rerank of the winning width's
    * already-computed shortlist — the s11 two-stage shape with its coarse
    * stage pre-paid by the curve. Every output row carries `prefix_dims` so
    * the oracle's gated-UNION mirror fails the hash if the pick drifts.
    *
    * Scale shape: the fan-out multiplies only the bounded shortlist relation
    * (|Q|·|widths|·k·overfetch); queries broadcast at every stage; the pick
    * is a |widths|-row driver decision (the d26 bounded-collect discipline).
    * Like s37, the coarse sweep scores |Q|·corpus pairs per width — this op
    * prices the dial AND serves from the priced relation; a standing serving
    * tier then runs s11 at the chosen width without the sweep.
    */
  def tunedPrefixSearch(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      prefixLevels: Seq[Int] = Seq(8, 16, 32, 64),
      targetRecallMicro: Long = 400000L,
      overfetch: Int = 4
  ): DataFrame = {
    require(prefixLevels.nonEmpty, "tunedPrefixSearch: no prefix levels")
    val levels = queries.sparkSession.range(1)
      .select(explode(array(prefixLevels.map(lit(_)): _*)).as("prefix_dims"))
    val qs = broadcast(
      queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
        .crossJoin(broadcast(levels))
        .withColumn("qp", slice(col("qv"), lit(1), col("prefix_dims")))
        .withColumn("qpn", norm2(col("qp")))
        .filter(col("qpn") > 0)
        .select(col("prefix_dims"), col("query_id"), col("qp"), col("qpn")))
    val cand = candidates
      .select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
      .crossJoin(broadcast(levels))
      .select(col("prefix_dims"), col("neighbor_id"),
        slice(col("cv"), lit(1), col("prefix_dims")).as("cp"))
      .withColumn("cpn", norm2(col("cp")))
      .filter(col("cpn") > 0)
    val wCoarse = Window.partitionBy(col("prefix_dims"), col("query_id"))
      .orderBy(col("pcos").desc, col("neighbor_id").asc)
    val shortlist = qs.join(cand, Seq("prefix_dims"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("prefix_dims"), col("query_id"), col("neighbor_id"),
        round(cosineFromNorms(dot(col("qp"), col("cp")), col("qpn"), col("cpn")), 6)
          .as("pcos"))
      .withColumn("crk", row_number().over(wCoarse))
      .filter(col("crk") <= k * overfetch)
      .localCheckpoint(false) // |Q|·|widths|·k·overfetch; curve + the actuated arm
    val truth = bruteForceTopK(queries, candidates, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = shortlist.filter(col("crk") <= k)
      .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("prefix_dims"), col("query_id"))
      .agg(count(lit(1)).as("n_hit"))
    val pooled = queries.select(col(idCol).as("query_id")).crossJoin(broadcast(levels))
      .join(hits, Seq("prefix_dims", "query_id"), "left")
      .select(col("prefix_dims"), coalesce(col("n_hit"), lit(0L)).as("h"))
      .groupBy(col("prefix_dims"))
      .agg(sum(col("h")).as("hits"), count(lit(1)).as("nq"))
      .select(col("prefix_dims"),
        expr(s"(2 * 1000000 * hits + nq * $k) DIV (2 * nq * $k)").cast("long")
          .as("pooled_micro"))
      .collect() // |widths| rows — bounded by the dial grid, never the data
    require(pooled.nonEmpty,
      "tunedPrefixSearch: empty query relation — no pooled curve to actuate")
    val qualifying = pooled.filter(_.getAs[Long]("pooled_micro") >= targetRecallMicro)
      .map(_.getAs[Int]("prefix_dims"))
    val chosen =
      if (qualifying.nonEmpty) qualifying.min
      else pooled.map(_.getAs[Int]("prefix_dims")).max
    val qv = broadcast(
      queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
        .withColumn("qn", norm2(col("qv"))))
    val cv = candidates.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm2(col("cv")))
    val wFinal = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    shortlist.filter(col("prefix_dims") === chosen)
      .select(col("query_id"), col("neighbor_id"))
      .join(qv, Seq("query_id"))
      .join(cv, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosineFromNorms(dot(col("qv"), col("cv")), col("qn"), col("cn")), 6)
          .as("cos_sim"))
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
      .withColumn("prefix_dims", lit(chosen))
  }

  /** Product-quantization code assignment: each vector splits into `nSub` contiguous
    * `subDim`-dim subvectors; each subvector is assigned to its nearest of `nCodes`
    * codebook entries by squared L2 — the index-compression step of IVF-PQ ANN (a
    * 64-dim float vector compresses to `nSub` byte codes). The codebook here is the
    * deterministic seed choice (the `nCodes` lowest-id vectors, the s10 kmeans-seed
    * idiom); production would iterate it with [[kmeansStep]] per subspace.
    *
    * Determinism: d² = ⟨s,s⟩ − 2⟨s,c⟩ + ⟨c,c⟩ with the sequential-fold [[dot]], a
    * fixed IEEE op sequence; argmin tie-breaks on code id via one lexicographic
    * struct-min.
    *
    * Scale shape: the codebook (nCodes·nSub rows) broadcasts; vectors explode to
    * nSub subvector rows and score nCodes candidates each in one codegen'd map pass —
    * per-vector work is O(nSub·nCodes·subDim) with NO shuffle for scoring; the only
    * shuffle is the (vec, subspace) argmin hash-agg, map-side combinable.
    */
  def pqCodes(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nSub: Int = 8,
      subDim: Int = 8,
      nCodes: Int = 16
  ): DataFrame = {
    pqCodeInvocations.incrementAndGet()
    val subs = subspaces(df, idCol, vecCol, nSub, subDim)
      .withColumnRenamed("rid", "vec_id")
    val codebook = broadcast(
      subs.filter(col("vec_id") < nCodes)
        .select(col("sub"), col("vec_id").cast("int").as("code"), col("sv").as("cv")))
    subs.join(codebook, "sub")
      // argmin on the ROUNDED distance (the repo's cross-engine ordering discipline,
      // e.g. the s04 rounded-cosine argmax): an ulp difference between Spark's dot
      // fold and DuckDB's list_dot_product on a near-tie must not flip a code
      // assignment and cascade through pqSearchTopK/ivfPqTopK
      .withColumn("d2r", round(
        norm2(col("sv")) - lit(2.0) * dot(col("sv"), col("cv")) + norm2(col("cv")), 6))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d2r"), col("code"))).as("m"))
      .select(col("vec_id"), col("sub"), col("m.code").as("code"),
        col("m.d2r").as("err"))
  }

  /** PQ asymmetric-distance search (ADC) with exact rerank — the compressed-index ANN
    * path: candidates are represented ONLY by their [[pqCodes]] (nSub byte codes, a
    * 64× compression of a 64-dim float vector); each query precomputes a lookup table
    * of exact subspace distances to every codebook entry, so a candidate's
    * approximate distance is nSub table lookups summed — no float math against the
    * full vectors until the final exact rerank of the top `overfetch·k`.
    *
    * Determinism: per-subspace LUT distances are fixed to integer MICRO-units
    * (round(10⁶·d²) as BIGINT) before the per-candidate sum, so the 8-way add is
    * order-independent integer arithmetic (the t20 micro-unit pattern); the rerank is
    * the pinned cosine sequence.
    *
    * Scale shape: the LUT is |Q|·nSub·nCodes rows — tiny, broadcast; the scoring pass
    * is one equi-join of the code relation (N·nSub rows of 3 small ints) against that
    * broadcast + a map-side-combinable integer sum: the full-precision vectors are
    * touched only for overfetch·k rows per query. This is why PQ wins at 100 TB — the
    * scan side is 1/64th the bytes of the raw embedding column.
    */
  /** Per-vector subspace rows: (rid, sub, sv) with sv = the sub-th `subDim`-wide
    * slice — the shared shredding step of the PQ family.
    */
  private def subspaces(
      df: DataFrame, idCol: String, vecCol: String, nSub: Int, subDim: Int): DataFrame =
    df.select(col(idCol).as("rid"), toDouble(col(vecCol)).as("v"))
      .select(
        col("rid"), col("v"),
        explode(array((0 until nSub).map(s =>
          struct(lit(s).as("sub"), slice(col("v"), s * subDim + 1, subDim).as("sv"))): _*)).as("e"))
      .select(col("rid"), col("e.sub").as("sub"), col("e.sv").as("sv"))

  /** The query-side ADC lookup table: exact subspace distances to every codebook
    * entry, fixed to integer micro-units (order-independent to sum).
    */
  private def adcLut(
      queries: DataFrame, candidates: DataFrame, idCol: String, vecCol: String,
      nSub: Int, subDim: Int, nCodes: Int): DataFrame = {
    val codebook = broadcast(
      subspaces(candidates, idCol, vecCol, nSub, subDim).filter(col("rid") < nCodes)
        .select(col("sub"), col("rid").cast("int").as("code"), col("sv").as("cv")))
    subspaces(queries, idCol, vecCol, nSub, subDim).join(codebook, "sub")
      .select(
        col("rid").as("query_id"), col("sub"), col("code"),
        round(lit(1000000.0) *
          (norm2(col("sv")) - lit(2.0) * dot(col("sv"), col("cv")) + norm2(col("cv"))))
          .cast("long").as("d2m"))
  }

  def pqSearchTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nSub: Int = 8,
      subDim: Int = 8,
      nCodes: Int = 16,
      overfetch: Int = 4
  ): DataFrame = {
    val codes = pqCodes(candidates, idCol, vecCol, nSub, subDim, nCodes)
      .select(col("vec_id").as("neighbor_id"), col("sub"), col("code"))
    val lut = broadcast(adcLut(queries, candidates, idCol, vecCol, nSub, subDim, nCodes))

    val approx = codes.join(lut, Seq("sub", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("d2m")).as("approx_d2m"))
    exactRerank(adcShortlist(approx, k * overfetch), queries, candidates, idCol, vecCol, k)
  }

  /** Top-`limit` per query from the ADC approximate distances — the shared coarse
    * cut of the PQ search family (ties on the exact integer distance break by id).
    */
  private def adcShortlist(approx: DataFrame, limit: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_d2m").asc, col("neighbor_id").asc)
    approx.withColumn("crank", row_number().over(w))
      .filter(col("crank") <= limit)
      .select(col("query_id"), col("neighbor_id"), col("approx_d2m"))
  }

  /** Exact-cosine rerank of a (query_id, neighbor_id, approx_d2m) shortlist — the
    * ONE place the PQ family touches full-precision vectors. The rounded-cosine
    * order and neighbor tie-break are the oracle-pinned determinism contract, so
    * every caller must share this exact sequence.
    */
  private def exactRerank(
      shortlist: DataFrame, queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val qv = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm2(col("qv")))
    val cv = candidates.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("nv"))
      .withColumn("cn", norm2(col("nv")))
    val wFinal = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    shortlist
      .join(broadcast(qv), "query_id")
      .join(cv, "neighbor_id")
      .select(
        col("query_id"), col("neighbor_id"), col("approx_d2m"),
        round(cosineFromNorms(dot(col("qv"), col("nv")), col("qn"), col("cn")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
  }

  /** IVF-PQ: the production ANN composition — IVF cell pruning ([[ivfTopK]]'s
    * broadcast-centroid assignment) bounds WHICH candidates are scored, PQ
    * asymmetric distance ([[pqSearchTopK]]'s integer-µ LUT) bounds WHAT is read to
    * score them, and only the surviving `overfetch·k` shortlist touches
    * full-precision vectors for the exact rerank. Every candidate lives in exactly
    * one cell (keep = 1), so the nProbe probed cells cannot surface a neighbor
    * twice — no dedup stage.
    *
    * Scale shape: centroids and the LUT broadcast; the probe→cell join keys the
    * shuffle by cell id (IVF's partitioning win), and the ADC scan inside probed
    * cells reads nSub small ints per candidate instead of the embedding column.
    */
  def ivfPqTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroidMod: Int = 97,
      nProbe: Int = 2,
      nSub: Int = 8,
      subDim: Int = 8,
      nCodes: Int = 16,
      overfetch: Int = 4
  ): DataFrame =
    // ONE scoring path for the whole IVF-PQ family: the sampled-centroid model is
    // just a model relation — any fix to assignment/probe/ADC applies to s16 and
    // s23/s24 alike (reviewed r10: the two bodies had been duplicated)
    ivfPqWithModel(queries, candidates, idCol, vecCol, k,
      candidates.filter(col(idCol) % centroidMod === 0)
        .select(col(idCol).as("cluster"), toDouble(col(vecCol)).as("cv")),
      nProbe, nSub, subDim, nCodes, overfetch)

  /** s23 — IVF-PQ over a TRAINED coarse quantizer: [[ivfPqTopK]] with the
    * deterministic-sample centroids replaced by [[kmeansRounds]]' trained model —
    * the production ANN shape end-to-end (train the cells, assign, probe, ADC-score,
    * rerank), all still oracle-replayable because the training loop itself is
    * ([[kmeansTrain]]'s cross-engine rounding contract). Cell ids are the trained
    * cluster ids; everything downstream of cell assignment is byte-identical to
    * [[ivfPqTopK]]'s scoring path.
    *
    * Scale shape: training adds `trainRounds` corpus passes against a broadcast
    * k-row model (amortized over every query batch served from the index);
    * assignment/probe/score/rerank inherit the ivfPqTopK shape unchanged.
    */
  def ivfPqTrainedTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      kCells: Int = 8,
      trainRounds: Int = 2,
      nProbe: Int = 2,
      nSub: Int = 8,
      subDim: Int = 8,
      nCodes: Int = 16,
      overfetch: Int = 4
  ): DataFrame =
    ivfPqWithModel(queries, candidates, idCol, vecCol, k,
      kmeansRounds(candidates, idCol, vecCol, kCells, nSub * subDim, trainRounds),
      nProbe, nSub, subDim, nCodes, overfetch)

  /** s29 — FILTERED ANN: [[ivfPqTrainedTopK]] under a metadata predicate — the
    * multi-tenant / faceted-search shape every production vector store serves
    * ("top-k among documents matching this filter"). `allowed` is the
    * predicate's id relation (first column = candidate ids that qualify); it
    * PRE-filters the cell relation before pair formation inside
    * [[ivfPqWithModel]], so each query fills k results whenever its probed
    * cells hold k qualifying members — where post-filtering an unfiltered
    * top-k would silently return fewer, or none when the global winners are
    * all disallowed (the documented pre- vs post-filter distinction of the
    * published IDSelector interface, Faiss / filtered-search literature).
    *
    * Scale shape: the index (trained cells, PQ codes, LUT) is built on the
    * FULL corpus exactly once and shared across every filter — the predicate
    * arrives per query batch and costs one semi-join against the cell
    * relation, keyed on the candidate id, BEFORE any ADC scoring: candidate
    * volume after the cut is |allowed ∩ probed cells|, and the expensive
    * stages (ADC, exact rerank) never see a disallowed row.
    */
  def ivfPqFilteredTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      allowed: DataFrame,
      kCells: Int = 8,
      trainRounds: Int = 2,
      nProbe: Int = 2,
      nSub: Int = 8,
      subDim: Int = 8,
      nCodes: Int = 16,
      overfetch: Int = 4
  ): DataFrame =
    ivfPqWithModel(queries, candidates, idCol, vecCol, k,
      kmeansRounds(candidates, idCol, vecCol, kCells, nSub * subDim, trainRounds),
      nProbe, nSub, subDim, nCodes, overfetch, allowed = Some(allowed))

  /** s31 — ADAPTIVE filtered ANN: route each query batch by the filter's
    * SELECTIVITY, the published filtered-search strategy (Faiss IDSelector
    * guidance, Qdrant/Milvus filtered HNSW planners): a HIGHLY selective
    * filter (few allowed ids) makes index probes pointless — most probed
    * candidates fail the predicate and the query starves below k results-worth
    * of useful work — so the engine scans the allowed subset EXACTLY (it is
    * small by premise; cost |Q|·|allowed|, bounded by the threshold); a broad
    * filter keeps the s29 path: the shared IVF-PQ index probed with the
    * predicate pre-filtering the cell relation. The route and the measured
    * selectivity ride every output row, so a result is always attributable to
    * the plan that produced it.
    *
    * Selectivity = |allowed| / |corpus| in half-up integer micro units — two
    * scalars (catalog-bounded driver reads, the retrainTrigger discipline)
    * that choose the plan BEFORE it is built; only the chosen branch ever
    * runs. The corpus size comes from the MAINTAINED index census when the
    * caller has one (`census` = the s33 [[ivfCellCensus]] rows, or any
    * relation carrying per-cell `n_members` — the engine already maintains
    * exactly this number next to the index artifact), so the routing
    * decision costs one k-row aggregate, not a corpus pass; `allowedSize`
    * likewise short-circuits the filter count when the caller's tenant
    * catalog already knows it. `candidates.count()` / `allowed.count()` are
    * the FALLBACK for census-less callers only (metadata-cheap on a raw
    * parquet relation, a full pass on anything derived — r14 ADVICE).
    *
    * Scale shape: the exact branch is a broadcast-queries × allowed-semi-join
    * scan — linear in |allowed|, which the threshold caps at
    * `selThresholdMicro` of the corpus; the IVF branch is s29's plan
    * unchanged. At 100 TB the routing is per query-batch against the shared
    * artifact: tenant filters hit whichever plan their selectivity earns.
    */
  def filteredTopKAdaptive(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      allowed: DataFrame,
      selThresholdMicro: Long = 250000L,
      kCells: Int = 8,
      trainRounds: Int = 2,
      census: Option[DataFrame] = None,
      allowedSize: Option[Long] = None
  ): DataFrame = {
    // a multi-column allowed relation means the caller passed the wrong thing
    // (rows, not an id set) — fail loudly, the ivfAssignNew discipline
    require(allowed.columns.length == 1,
      s"filteredTopKAdaptive: allowed must be a single-id-column relation, " +
        s"got [${allowed.columns.mkString(", ")}]")
    census.foreach(c => require(c.columns.contains("n_members"),
      s"filteredTopKAdaptive: census must carry n_members (the s33/s25 " +
        s"artifact shape), got [${c.columns.mkString(", ")}]"))
    val nCorpus = census
      .map(_.agg(coalesce(sum(col("n_members")), lit(0L)).cast("long"))
        .collect()(0).getLong(0)) // k-row artifact aggregate, never a corpus pass
      .getOrElse(candidates.count())
    require(nCorpus > 0, "filteredTopKAdaptive: empty corpus — nothing to search")
    val nAllowed = allowedSize.getOrElse(allowed.count())
    val selMicro = (2L * 1000000L * nAllowed + nCorpus) / (2L * nCorpus)
    val routed =
      if (selMicro <= selThresholdMicro) {
        val allowedCands = candidates.join(
          allowed.select(col(allowed.columns.head).as(idCol)), Seq(idCol), "left_semi")
        bruteForceTopK(queries, allowedCands, idCol, vecCol, k)
          .withColumn("route", lit("exact_prefilter"))
      } else {
        ivfPqFilteredTopK(queries, candidates, idCol, vecCol, k, allowed,
            kCells, trainRounds)
          .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
          .withColumn("route", lit("ivf_prefilter"))
      }
    routed.select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"),
      col("route"), lit(selMicro).as("selectivity_micro"))
  }

  /** s32 — the PROBE-RECALL curve: recall@k of the trained IVF-PQ path at each
    * probe level, against the exact brute-force truth, from ONE shared
    * pipeline — the s07/d25/s30 "measure, don't guess" discipline pointed at
    * nProbe, THE serving dial at 100 TB (each probe level multiplies the
    * candidate volume a query pays; this curve is what a latency/recall SLO
    * trade is decided by).
    *
    * The trick that makes the sweep one job instead of |levels| jobs: cell
    * assignment keeps each query's probe RANK, so "probed at level p" is just
    * `crank ≤ p` — the quantizer, cell relation, PQ codes, and query LUTs are
    * computed once, and only the candidate-pair relation fans out by level
    * (level p's pairs ⊆ level max's pairs, tagged not recomputed). Shortlist,
    * rerank, and recall then key by (n_probe, query).
    *
    * Scale shape: everything the trained path broadcasts stays broadcast
    * (centroids, LUT, levels); the fan-out multiplies only the bounded
    * candidate-pair relation (≤ |levels| ×), and the recall grid is
    * |queries|·|levels| with explicit zero rows for starved (level, query)
    * cells.
    */
  def ivfProbeRecallCurve(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      probeLevels: Seq[Int] = Seq(1, 2, 4),
      kCells: Int = 8,
      trainRounds: Int = 2,
      nSub: Int = 8,
      subDim: Int = 8,
      nCodes: Int = 16,
      overfetch: Int = 4
  ): DataFrame = {
    require(probeLevels.nonEmpty, "ivfProbeRecallCurve: no probe levels")
    val model = kmeansRounds(candidates, idCol, vecCol, kCells, nSub * subDim, trainRounds)
    probeRecallGrid(
      probeLevelRanked(queries, candidates, idCol, vecCol, k, probeLevels, model,
        nSub, subDim, nCodes, overfetch),
      queries, candidates, idCol, vecCol, k, probeLevels)
  }

  /** The level-fanned ranked-search relation shared by s32 and s41: top-k per
    * (n_probe, query) at EVERY probe level from ONE quantizer / cell / code /
    * LUT computation — level p's candidate pairs are level max's pairs
    * filtered by probe rank, so widening the sweep multiplies only the
    * bounded pair relation. At a FIXED level the chain (assignment tie-break,
    * ADC shortlist window, rerank rounding) is stage-for-stage identical to
    * [[ivfPqWithModel]]'s, which is what lets [[tunedProbeSearch]] actuate
    * the winning level by SLICING this relation instead of re-running the
    * search. Output: (n_probe, query_id, neighbor_id, approx_d2m, cos_sim,
    * rank) with rank ≤ k — |queries|·|levels|·k rows, never corpus-sized.
    */
  private def probeLevelRanked(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      probeLevels: Seq[Int],
      model: DataFrame,
      nSub: Int,
      subDim: Int,
      nCodes: Int,
      overfetch: Int
  ): DataFrame = {
    val maxProbe = probeLevels.max
    val cents = broadcast(withCentroidNorm(model)
      .select(col("cluster").cast("long").as("cid"), col("cv"), col("cn")))
    def withNorm(df: DataFrame): DataFrame =
      df.select(col(idCol).as("rid"), toDouble(col(vecCol)).as("v"))
        .withColumn("nv", norm2(col("v")))
    def scoredCells(r: DataFrame, keep: Int): DataFrame = {
      val w = Window.partitionBy(col("rid")).orderBy(col("cc").desc, col("cid").asc)
      r.crossJoin(cents)
        .select(col("rid"), col("cid"),
          round(cosineFromNorms(dot(col("v"), col("cv")), col("nv"), col("cn")), 6).as("cc"))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
    }
    val cells = scoredCells(withNorm(candidates), keep = 1)
      .select(col("rid").as("neighbor_id"), col("cid"))
    val probes = scoredCells(withNorm(queries), keep = maxProbe)
      .select(col("rid").as("query_id"), col("cid"), col("crank"))
    val levels = queries.sparkSession.range(1)
      .select(explode(array(probeLevels.map(lit(_)): _*)).as("n_probe"))
    val cp = probes.crossJoin(broadcast(levels))
      .filter(col("crank") <= col("n_probe"))
      .join(cells, "cid")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("n_probe"), col("query_id"), col("neighbor_id"))
    val codes = pqCodes(candidates, idCol, vecCol, nSub, subDim, nCodes)
      .select(col("vec_id").as("neighbor_id"), col("sub"), col("code"))
    val lut = broadcast(adcLut(queries, candidates, idCol, vecCol, nSub, subDim, nCodes))
    val approx = cp
      .join(codes, "neighbor_id")
      .join(lut, Seq("query_id", "sub", "code"))
      .groupBy(col("n_probe"), col("query_id"), col("neighbor_id"))
      .agg(sum(col("d2m")).as("approx_d2m"))
    val wShort = Window.partitionBy(col("n_probe"), col("query_id"))
      .orderBy(col("approx_d2m").asc, col("neighbor_id").asc)
    val short = approx.withColumn("srank", row_number().over(wShort))
      .filter(col("srank") <= k * overfetch)
    val qv = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm2(col("qv")))
    val cv = candidates.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("nv2"))
      .withColumn("cn2", norm2(col("nv2")))
    val wFinal = Window.partitionBy(col("n_probe"), col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    short
      .join(broadcast(qv), "query_id")
      .join(cv, "neighbor_id")
      .select(col("n_probe"), col("query_id"), col("neighbor_id"), col("approx_d2m"),
        round(cosineFromNorms(dot(col("qv"), col("nv2")), col("qn"), col("cn2")), 6)
          .as("cos_sim"))
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
  }

  /** Recall@k grid over a [[probeLevelRanked]] relation: hits vs the exact
    * brute-force truth, with explicit zero rows for starved (level, query)
    * cells (the grid discipline). Split out of [[ivfProbeRecallCurve]] so
    * s41 can pool the grid over a CHECKPOINTED ranked relation it then also
    * slices for the actuated search.
    */
  private def probeRecallGrid(
      ranked: DataFrame,
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      probeLevels: Seq[Int]
  ): DataFrame = {
    val truth = bruteForceTopK(queries, candidates, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = ranked.select(col("n_probe"), col("query_id"), col("neighbor_id"))
      .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("n_probe"), col("query_id"))
      .agg(count(lit(1)).as("n_hit"))
    val levels = queries.sparkSession.range(1)
      .select(explode(array(probeLevels.map(lit(_)): _*)).as("n_probe"))
    val grid = queries.select(col(idCol).as("query_id")).crossJoin(broadcast(levels))
    grid.join(hits, Seq("n_probe", "query_id"), "left")
      .select(col("n_probe"), col("query_id"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / lit(k.toDouble), 6)
          .as("recall_at_k"))
  }

  /** s41 — TUNED-PROBE search: the d26→d28 measure-then-actuate loop applied
    * to the serving dial. The s32 probe-recall curve is computed ONCE (shared
    * quantizer/codes/LUT, level fan-out on the bounded pair relation), pooled
    * per level in exact integers (per-query recalls fold back to hit counts —
    * round-6 recall·k re-quantizes exactly for k ≪ 10³), and the SMALLEST
    * probe level meeting `targetRecallMicro` is chosen (largest as fallback —
    * the d39 decision rule: the candidate bill scales with nProbe, so
    * smallest-sufficient). The actuated search then costs NOTHING beyond the
    * curve: the quantizer is trained once, the cells/codes/LUT are computed
    * once, the level-fanned ranked relation is checkpointed
    * (|queries|·|levels|·k rows), and the winning level's results are a
    * FILTER of that relation — [[probeLevelRanked]]'s fixed-level chain is
    * stage-identical to [[ivfPqWithModel]], so the slice IS the search (the
    * r15-verdict fix: the previous rendition retrained the quantizer and
    * re-assigned PQ codes for the final search). Every output row carries
    * `n_probe` so the oracle's gated-UNION mirror fails the hash if the pick
    * ever drifts. The pick itself is a |levels|-row driver decision (the
    * d26/retrainTrigger bounded-collect discipline).
    */
  def tunedProbeSearch(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      probeLevels: Seq[Int] = Seq(1, 2, 4),
      targetRecallMicro: Long = 400000L,
      kCells: Int = 8,
      trainRounds: Int = 2
  ): DataFrame = {
    require(probeLevels.nonEmpty, "tunedProbeSearch: no probe levels")
    val model = kmeansRounds(candidates, idCol, vecCol, kCells, 64, trainRounds) // dims = nSub·subDim = 64
    val ranked = probeLevelRanked(queries, candidates, idCol, vecCol, k, probeLevels,
        model, nSub = 8, subDim = 8, nCodes = 16, overfetch = 4)
      .localCheckpoint(false) // |queries|·|levels|·k rows; consumers: grid pooling + the actuated slice
    val curve = probeRecallGrid(ranked, queries, candidates, idCol, vecCol, k, probeLevels)
    val pooled = curve
      .select(col("n_probe"),
        floor(col("recall_at_k") * k + lit(0.5)).cast("long").as("h"))
      .groupBy(col("n_probe"))
      .agg(sum(col("h")).as("hits"), count(lit(1)).as("nq"))
      .select(col("n_probe"),
        expr(s"(2 * 1000000 * hits + nq * $k) DIV (2 * nq * $k)").cast("long")
          .as("pooled_micro"))
      .collect() // |levels| rows — bounded by the dial grid, never the data
    require(pooled.nonEmpty,
      "tunedProbeSearch: empty query relation — no pooled curve to actuate")
    val qualifying = pooled.filter(_.getAs[Long]("pooled_micro") >= targetRecallMicro)
      .map(_.getAs[Int]("n_probe"))
    val chosen =
      if (qualifying.nonEmpty) qualifying.min else pooled.map(_.getAs[Int]("n_probe")).max
    ranked.filter(col("n_probe") === chosen)
      .select(col("query_id"), col("neighbor_id"), col("approx_d2m"), col("cos_sim"),
        col("rank"))
      .withColumn("n_probe", lit(chosen))
  }

  /** s33 — IVF INDEX-HEALTH census: every vector assigned to its nearest
    * trained cell (the serving path's own cells relation), then per cell the
    * membership count and corpus share, plus the published imbalance factor
    * (Faiss's metric: k·Σnᵢ²/N², 1.0 = perfectly balanced, k = every vector in
    * one cell) — the telemetry an index operator reads BEFORE serving: a hot
    * cell means every probe that lands there pays its whole membership, and
    * this one number is the early warning s25's growth census watches after
    * deployment. Cells the quantizer kept but no vector chose report explicit
    * zero rows (the grid discipline).
    *
    * Determinism: counts are exact longs; share and imbalance are single final
    * divisions in the half-up `(2·10⁶·a + b) div (2·b)` integer form — no
    * float anywhere. The imbalance numerator 2·10⁶·k·Σnᵢ² needs 128-bit
    * arithmetic past ~10⁹ members per cell — at that scale compute it in
    * DecimalType (documented knob, not a silent overflow: the oracle mirror's
    * engine errors on int64 overflow rather than wrapping).
    *
    * Scale shape: one broadcast-centroid assignment pass (the s23 shape), a
    * map-side-combinable count, and a k-row rollup crossed with one 1-row
    * total — the corpus is scanned once.
    */
  def ivfCellCensus(
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      kCells: Int = 8,
      dims: Int = 64,
      trainRounds: Int = 2
  ): DataFrame = {
    val model = kmeansRounds(candidates, idCol, vecCol, kCells, dims, trainRounds)
    val cents = broadcast(withCentroidNorm(model)
      .select(col("cluster").cast("long").as("cid"), col("cv"), col("cn")))
    val assigned = assignToCells(candidates, idCol, vecCol, model)
      .select(col("rid"), col("cid"))
    val counts = assigned.groupBy(col("cid")).agg(count(lit(1)).as("n"))
    val cells = cents.select(col("cid"))
      .join(counts, Seq("cid"), "left")
      .select(col("cid"), coalesce(col("n"), lit(0L)).as("n_members"))
      .localCheckpoint(false) // two consumers: the rows and the 1-row total
    val tot = cells.agg(
      count(lit(1)).as("k_cells"),
      sum(col("n_members")).as("n_total"),
      sum(col("n_members") * col("n_members")).as("sum_sq"))
    cells.crossJoin(broadcast(tot))
      .select(col("cid"), col("n_members"),
        expr("(2 * 1000000 * n_members + n_total) DIV (2 * n_total)")
          .cast("long").as("share_micro"),
        expr("(2 * 1000000 * k_cells * sum_sq + n_total * n_total)" +
          " DIV (2 * n_total * n_total)").cast("long").as("imbalance_micro"),
        col("k_cells"))
  }

  /** The one rendition of trained-cell ASSIGNMENT (shared by the s33 census and
    * the d31 semantic-dedup kernel): each vector of `df` to its nearest model
    * centroid — rounded-cosine argmax, cluster-asc tie-break, a per-VECTOR
    * window (k rows each, never data-sized) over a broadcast centroid catalog.
    * Returns (rid, cid, v, nv) so a pairwise consumer keeps the vector and its
    * squared norm without a second corpus pass.
    */
  private[graft] def assignToCells(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      model: DataFrame,
      skipZero: Boolean = false
  ): DataFrame = {
    val cents = broadcast(withCentroidNorm(model)
      .select(col("cluster").cast("long").as("cid"), col("cv"), col("cn")))
    val w = Window.partitionBy(col("rid")).orderBy(col("cc").desc, col("cid").asc)
    val base = df.select(col(idCol).as("rid"), toDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm2(col("v")))
    // skipZero cuts zero-norm vectors AFTER the one norm fold (a caller-side
    // pre-filter would recompute the norm — measured +1 s at sf0.1 on s39)
    (if (skipZero) base.filter(col("nv") > 0) else base)
      .crossJoin(cents)
      .select(col("rid"), col("v"), col("nv"), col("cid"),
        round(cosineFromNorms(dot(col("v"), col("cv")), col("nv"), col("cn")), 6).as("cc"))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") === 1)
      .select(col("rid"), col("cid"), col("v"), col("nv"))
  }

  /** The d31 pairwise half, exposed to [[graft.pipeline.Dedup.semanticDedupClusters]]:
    * within-cell candidate pairs over a trained assignment, cells above
    * `maxCellMembers` excluded from the quadratic step (the [[semDedup]]
    * mega-cell guard — their members keep by default and fall to the exact
    * d01/d02 screens; the published remedy is raising the centroid count).
    * Pair admission is the micro-quantized rounded cosine ≥ `thresholdMicro`.
    */
  private[graft] def withinCellPairs(
      cells: DataFrame,
      thresholdMicro: Long,
      maxCellMembers: Long
  ): DataFrame = {
    val smallCells = cells.groupBy(col("cid")).agg(count(lit(1)).as("cell_n"))
      .filter(col("cell_n") <= maxCellMembers)
      .select(col("cid"))
    val admitted = cells.join(smallCells, Seq("cid"))
    admitted
      .join(admitted.select(col("cid"), col("rid").as("id_b"),
        col("v").as("bv"), col("nv").as("bn")), Seq("cid"))
      .filter(col("rid") < col("id_b"))
      .filter(floor(lit(1000000.0) *
        round(cosineFromNorms(dot(col("v"), col("bv")), col("nv"), col("bn")), 6)
        + lit(0.5)).cast("long") >= thresholdMicro)
      .select(col("rid").as("id_a"), col("id_b"))
  }

  /** Persist a trained coarse-quantizer model ([[kmeansRounds]] output) — the s24
    * artifact: cluster id + centroid array, one tiny parquet file. Doubles
    * round-trip parquet bit-exactly, so a reloaded model searches identically to
    * the in-session one (s24's oracle IS s23's SQL — the round trip must
    * reproduce it).
    */
  def saveCentroids(model: DataFrame, path: String): Unit =
    model.select(
        col("cluster") +: col("cv") +:
          (if (model.columns.contains("n_members")) Seq(col("n_members")) else Nil): _*)
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  /** Reload a [[saveCentroids]] artifact into [[ivfPqWithModel]] form. */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path).withColumn("cn", norm2(col("cv")))

  /** s25 — the index-MAINTENANCE half of the production ANN loop s24 opened: assign
    * vectors that ARRIVED AFTER TRAINING to the saved centroids (the s06/s22
    * assignment kernel: rounded cosine argmax, cluster-asc tie-break) and report
    * per-cell growth — training census (`n_trained` from the persisted model's
    * member counts), new arrivals (`n_new`, 0 for starved cells), growth ratio and
    * new-mass share (micro). This is the table the retrain decision
    * ([[retrainTrigger]]) reads: a hot cell or a starved majority means the frozen
    * codebook no longer matches the data.
    *
    * Scale shape: the model is a k-row broadcast; assignment is one map pass over
    * the new vectors with a per-VECTOR window (k rows each, never data-sized); the
    * census is one map-side-combinable groupBy plus a 1-row broadcast total. The
    * corpus and the training set are never rescanned — exactly what an
    * incremental-ingest cadence can afford at 100 TB.
    *
    * Determinism: cosines are round(,6) with id tie-breaks (the s-family
    * convention); counts are exact integers; ratios are single final divisions
    * micro-quantized — oracle-mirrorable like the searches themselves.
    */
  def ivfAssignNew(
      newVecs: DataFrame,
      idCol: String,
      vecCol: String,
      model: DataFrame
  ): DataFrame = {
    // Centroid artifacts written before saveCentroids carried member counts load
    // without n_members and would otherwise die in an opaque unresolved-column
    // AnalysisException at the select below — name the condition explicitly.
    require(model.columns.contains("n_members"),
      "ivfAssignNew: model has no n_members column — legacy centroid artifact " +
        "(pre-census saveCentroids); retrain with kmeansRounds and re-save")
    val withCn = withCentroidNorm(model)
    val cents = withCn.select(
      col("cluster").cast("long").as("cluster"), col("cv"), col("cn"),
      col("n_members").cast("long").as("n_trained"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cluster").asc)
    val assigned = newVecs
      .select(col(idCol).as("vec_id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm2(col("v")))
      .filter(col("nv") > 0)
      .crossJoin(broadcast(cents.select(col("cluster"), col("cv"), col("cn"))))
      .select(col("vec_id"), col("cluster"),
        round(cosineFromNorms(dot(col("v"), col("cv")), col("nv"), col("cn")), 6).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
    val newCounts = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("n_new"))
    val tot = newCounts.agg(sum(col("n_new")).as("tot_new"))
    // k-row left join: broadcast the RIGHT side (a left-outer join cannot build left)
    cents.select(col("cluster"), col("n_trained"))
      .join(broadcast(newCounts), Seq("cluster"), "left")
      .select(col("cluster"), col("n_trained"), coalesce(col("n_new"), lit(0L)).as("n_new"))
      .crossJoin(broadcast(tot))
      .select(
        col("cluster"), col("n_trained"), col("n_new"),
        floor(lit(1000000.0) * col("n_new").cast("double") / col("n_trained").cast("double")
          + lit(0.5)).cast("long").as("growth_micro"),
        when(coalesce(col("tot_new"), lit(0L)) === 0L, 0L)
          .otherwise(floor(lit(1000000.0) * col("n_new").cast("double")
            / col("tot_new").cast("double") + lit(0.5)).cast("long"))
          .as("share_new_micro"))
  }

  /** s39 — CENTROID DRIFT monitor: the GEOMETRIC staleness leg beside s25's
    * membership one. s25/retrainTrigger catch the codebook mismatching the data
    * by COUNT (hot cells, starved cells); a distribution that rotates while
    * keeping cell populations balanced slips past both — this op catches it by
    * comparing each frozen centroid against the CURRENT mean of the vectors the
    * cell attracts. Per cell: the trained census, the current membership, and
    * `drift_micro` = 10⁶·(1 − cos(stored centroid, current cell mean)) from the
    * rounded cosine (the s-family round-6 contract, so both engines quantize the
    * same double); a cell no current vector lands in (or a degenerate zero-norm
    * mean) reports maximal drift — the codebook region is dead. `stale` flags
    * cells at ≥ `driftMaxMicro`; any stale cell is the retrain signal this
    * monitor feeds a cadence.
    *
    * Scale shape: one broadcast-codebook assignment pass over the corpus (the
    * [[assignToCells]] kernel — per-vector window of k rows), one
    * map-side-combinable wide-sum per cell for the means, then a k-row join —
    * nothing data-sized ever shuffles twice, the s25 cadence cost.
    */
  def centroidDrift(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      model: DataFrame,
      dims: Int,
      driftMaxMicro: Long = 1000L
  ): DataFrame = {
    require(model.columns.contains("n_members"),
      "centroidDrift: model has no n_members column — legacy centroid artifact " +
        "(pre-census saveCentroids); retrain with kmeansRounds and re-save")
    // zero-norm vectors carry no direction: they are excluded before the
    // cosine is formed (the oracle's `WHERE list_dot_product(v,v) > 0` is the
    // same rule — one shared rendition, not a latent zero-division/
    // NaN-assignment divergence; kmeansRounds applies the identical cut at
    // training)
    val cells = assignToCells(corpus, idCol, vecCol, model, skipZero = true)
    val aggs = count(lit(1)).as("n_now") +:
      (0 until dims).map(i => sum(col("v")(i)).as(s"s$i"))
    val means = cells.groupBy(col("cid")).agg(aggs.head, aggs.tail: _*)
      .select(col("cid"), col("n_now"),
        array((0 until dims).map(i => round(col(s"s$i") / col("n_now"), 6)): _*).as("mv"))
      .withColumn("mn", norm2(col("mv")))
    val cents = withCentroidNorm(model).select(
      col("cluster").cast("long").as("cid"), col("cv"), col("cn"),
      col("n_members").cast("long").as("n_trained"))
    val driftCos = round(cosineFromNorms(dot(col("cv"), col("mv")), col("cn"), col("mn")), 6)
    cents
      .join(broadcast(means), Seq("cid"), "left") // k-row join, the ivfAssignNew shape
      .select(
        col("cid").as("cluster"), col("n_trained"),
        coalesce(col("n_now"), lit(0L)).as("n_now"),
        when(col("mv").isNull || col("mn") <= lit(0.0), lit(1000000L))
          .otherwise(floor(lit(1000000.0) * (lit(1.0) - driftCos) + lit(0.5)).cast("long"))
          .as("drift_micro"))
      .withColumn("stale", (col("drift_micro") >= driftMaxMicro).cast("int"))
  }

  /** s40 — the SERVING RECALL CARD: every approximate index family priced
    * against the ONE exact truth on the standard service query set — the table
    * a serving owner reads to pick the index tier (the g67/dc21/t51 card
    * discipline applied to ANN serving). Per method: query count, hits against
    * the brute-force top-k, and pooled recall@k in half-up micro. Methods here
    * are the two persisted-artifact families (trained IVF-PQ at the s23
    * configuration, int8 scalar quantization at the s35 one); the exact arm
    * rides along at recall 1.0 as the calibration row.
    *
    * Scale shape: ONE truth computation (broadcast-queries brute force,
    * checkpointed) shared by every arm; each arm is its own bounded search
    * kernel; the card folds to |methods| rows. Honest composite cost — it runs
    * the searches it prices, like dc21 runs its gates.
    */
  def servingRecallCard(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      queryMod: Int = 50,
      kCells: Int = 8,
      trainRounds: Int = 2,
      int8Overfetch: Int = 4
  ): DataFrame = {
    val queries = corpus.filter(col(idCol) % queryMod === 0)
    val truth = bruteForceTopK(queries, corpus, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(false) // one truth, every arm joins it
    // the query census rides as a broadcast 1-row relation — no eager count on
    // a derived relation (the s31 census lesson)
    val nQueries = queries.agg(count(lit(1)).as("n_queries"))
    def arm(method: String, approx: DataFrame): DataFrame =
      approx.select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .crossJoin(broadcast(nQueries))
        .select(
          lit(method).as("method"),
          col("n_queries"),
          col("n_hits"),
          expr(s"(2 * 1000000 * n_hits + n_queries * $k) DIV (2 * n_queries * $k)")
            .cast("long").as("recall_micro"))
    arm("exact", truth)
      .unionByName(arm("ivf_pq_trained",
        ivfPqTrainedTopK(queries, corpus, idCol, vecCol, k, kCells, trainRounds)))
      .unionByName(arm("int8",
        int8TopK(queries, corpus, idCol, vecCol, k, overfetch = int8Overfetch)))
  }

  /** s45 — the AGED-INDEX recall card: the s40 serving-card discipline applied
    * to index AGE, so the documented staleness of incrementally-maintained
    * graph-ANN artifacts (s28's "archive links stay stale until the cadence
    * rebuild") becomes a MEASURED rebuild-cadence dial instead of a doc note.
    * Two lifecycle scenarios, each priced against its own brute-force truth
    * (the exact arm riding along as calibration):
    *
    *   - EXTEND aging (`scenario = 'extend'`, corpus = archive ∪ arrivals):
    *     `fresh` rebuilds everything on the full corpus; `extended` serves the
    *     honest aged stack — the archive-built adjacency plus
    *     [[knnGraphExtend]]'s arrival lists, with the ARCHIVE's codebook and
    *     entry medoids (a real serving process keeps the saved artifact's
    *     entry layer until the rebuild). The recall gap between the two rows
    *     IS the price of deferring the cadence rebuild at this arrival
    *     fraction.
    *   - COMPACT aging (`scenario = 'compact'`, corpus = survivors):
    *     `fresh` rebuilds on the survivors; `compacted` serves
    *     [[compactGraphAnnAdjacency]]'s incremental result. s42 proves the two
    *     adjacencies IDENTICAL, so these rows must tie exactly — the card
    *     shows delete-compaction costs zero recall, in the same table that
    *     shows extension costs some.
    *
    * Output: (scenario, method, n_queries, n_hits, recall_micro) — 6 rows.
    *
    * Scale shape: each truth is ONE broadcast-queries brute-force pass over
    * its corpus (checkpointed, shared by its scenario's arms); the graph
    * builds are the s20/s28/s42 kernels unchanged (band-bucketed, capped);
    * searches are |Q|-sided beam walks. Honest composite cost — it runs the
    * lifecycles it prices, like s42 and dc20 run theirs.
    */
  def agedIndexRecallCard(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      arrivalCut: Long,
      tombstoneMod: Long,
      k: Int = 5,
      queryMod: Long = 50L,
      graphK: Int = 5,
      cells: Int = 8,
      trainRounds: Int = 1,
      beam: Int = 8,
      rounds: Int = 2,
      entryProbe: Int = 4
  ): DataFrame = {
    def recallArm(
        scenario: String, method: String, approx: DataFrame,
        truth: DataFrame, nQueries: DataFrame): DataFrame =
      recallCardArm(scenario, method, approx, truth, nQueries, k)
    // r18: arms materialize EAGERLY at their boundaries but in PARALLEL
    // threads (Par — guide §2.6). One fused lazy plan for the whole card made
    // AQE re-optimize a giant tree once per stage (171 driver-bound jobs, wall
    // ≫ task time); per-arm checkpoints keep every plan small while the
    // threads overlap the arms' jobs on the executors.
    def scenario(
        name: String,
        serveCorpus: DataFrame,
        freshAdj: DataFrame,
        agedMethod: String,
        agedAdj: DataFrame,
        agedModelCorpus: DataFrame): DataFrame = {
      val queries = serveCorpus.filter(col(idCol) % queryMod === 0)
      val nQueries = queries.agg(count(lit(1)).as("n_queries"))
      val freshModel = kmeansRounds(serveCorpus, idCol, vecCol, cells, dims = 64,
        rounds = trainRounds)
      // when the aged artifact's model corpus IS the serving corpus (the
      // compaction scenario — s42 retrains codebook and medoids on the
      // survivors), the model is the fresh one: train it once
      val agedModel =
        if (agedModelCorpus eq serveCorpus) freshModel
        else kmeansRounds(agedModelCorpus, idCol, vecCol, cells, dims = 64,
          rounds = trainRounds)
      val (truth, fresh, aged) = Par.join3(
        bruteForceTopK(queries, serveCorpus, idCol, vecCol, k)
          .select(col("query_id"), col("neighbor_id"))
          .localCheckpoint(true), // one truth per scenario, every arm joins it
        graphAnnSearch(queries, serveCorpus, idCol, vecCol,
          freshAdj, freshModel,
          k = k, beam = beam, rounds = rounds, entryProbe = entryProbe)
          .localCheckpoint(true),
        graphAnnSearch(queries, serveCorpus, idCol, vecCol,
          agedAdj, agedModel,
          k = k, beam = beam, rounds = rounds, entryProbe = entryProbe,
          entries = Some(graphAnnEntryPoints(agedModelCorpus, idCol, vecCol, agedModel)))
          .localCheckpoint(true))
      recallArm(name, "exact", truth, truth, nQueries)
        .unionByName(recallArm(name, "fresh", fresh, truth, nQueries))
        .unionByName(recallArm(name, agedMethod, aged, truth, nQueries))
    }
    val archive = corpus.filter(col(idCol) < arrivalCut)
    val arrivals = corpus.filter(col(idCol) >= arrivalCut)
    val tomb = corpus.filter(col(idCol) % tombstoneMod === 0).select(col(idCol))
    val survivors = corpus.filter(col(idCol) % tombstoneMod =!= 0)
    // the full-corpus graph serves twice — scenario A's fresh arm and the
    // compaction input — so it is built once and checkpointed; the three
    // independent adjacency builds run concurrently
    val (gFull, extendedAdj, gSurv) = Par.join3(
      knnGraph(corpus, idCol, vecCol, k = graphK).localCheckpoint(true),
      knnGraph(archive, idCol, vecCol, k = graphK)
        .unionByName(knnGraphExtend(arrivals, corpus, idCol, vecCol, k = graphK))
        .localCheckpoint(true),
      knnGraph(survivors, idCol, vecCol, k = graphK).localCheckpoint(true))
    val compactedAdj = compactGraphAnnAdjacency(corpus, tomb,
      gFull, idCol, vecCol, k = graphK)
    val (cardA, cardB) = Par.join2(
      scenario("extend", corpus, gFull, "extended", extendedAdj, archive)
        .localCheckpoint(true),
      scenario("compact", survivors, gSurv, "compacted", compactedAdj, survivors)
        .localCheckpoint(true))
    cardA.unionByName(cardB)
  }

  /** One (scenario, method) row of an aged-index recall card: pooled hits of
    * `approx` against `truth`, recall as the half-up integer micro ratio —
    * shared by [[agedIndexRecallCard]] (graph family) and
    * [[agedQuantIndexRecallCard]] (IVF-PQ / int8 families) so the two cards
    * cannot diverge in how they price an arm.
    */
  private def recallCardArm(
      scenario: String, method: String, approx: DataFrame,
      truth: DataFrame, nQueries: DataFrame, k: Int): DataFrame =
    approx.select(col("query_id"), col("neighbor_id"))
      .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
      .crossJoin(broadcast(nQueries))
      .select(
        lit(scenario).as("scenario"), lit(method).as("method"),
        col("n_queries"), col("n_hits"),
        expr(s"(2 * 1000000 * n_hits + n_queries * $k) DIV (2 * n_queries * $k)")
          .cast("long").as("recall_micro"))

  /** s50 — the s45 aging card for the OTHER persisted families: the
    * s25-appended IVF-PQ artifact and the s38-compacted int8 artifact, each
    * priced against a fresh rebuild and the brute-force truth at the SEARCH
    * surface (recall@k pooled over the query batch, the exact arm as
    * calibration). Scenario `ivf_extend` serves the honest s25 aged state —
    * the codebook trained on the pre-cut archive and FROZEN while arrivals
    * were only assigned, so queries landing in the new region probe cells
    * that never learned it and the aged arm may trail fresh (the gap is the
    * rebuild-cadence price, fed to [[rebuildTrigger]] exactly like s45's).
    * Scenario `int8_compact` serves the s38 lifecycle both ways —
    * delete-from-full-then-compact vs quantize-fresh-on-survivors; int8
    * codes are PER-VECTOR (scale = own maxabs), so the two arms must tie
    * EXACTLY — the s38 equivalence, here measured where it matters instead
    * of asserted on the artifact relation.
    *
    * Scale shape: one brute-force truth per scenario (the dial-bounded
    * recall-card cost, s07/s40/s45 precedent), each serving arm is the
    * production plan unchanged (model-sized broadcasts, bounded shortlists),
    * and the card is 6 rows. Nothing here is corpus-quadratic beyond the
    * truth passes the card exists to pay.
    */
  def agedQuantIndexRecallCard(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      arrivalCut: Long,
      tombstoneMod: Long,
      k: Int = 5,
      queryMod: Long = 50L,
      kCells: Int = 8,
      trainRounds: Int = 2,
      overfetch: Int = 4
  ): DataFrame = {
    // r18: the six arms are independent — materialize each eagerly at its
    // boundary but in parallel threads (the s45 Par shape: small plans, AQE
    // never re-optimizes one fused card tree, jobs overlap on the executors)
    // scenario A — the s25 lifecycle at the search surface
    val queriesA = corpus.filter(col(idCol) % queryMod === 0)
    val nqA = queriesA.agg(count(lit(1)).as("n_queries"))
    val freshModel = kmeansRounds(corpus, idCol, vecCol, kCells, dims = 64,
      rounds = trainRounds)
    val agedModel = kmeansRounds(corpus.filter(col(idCol) < arrivalCut), idCol, vecCol,
      kCells, dims = 64, rounds = trainRounds) // the frozen archive codebook
    // scenario B — the s38 lifecycle, both construction paths
    val survivors = corpus.filter(col(idCol) % tombstoneMod =!= 0).localCheckpoint(true)
    val tomb = corpus.filter(col(idCol) % tombstoneMod === 0).select(col(idCol))
    val queriesB = survivors.filter(col(idCol) % queryMod === 0)
    val nqB = queriesB.agg(count(lit(1)).as("n_queries"))
    val Seq(truthA, freshA, agedA, truthB, freshB, compB) = Par.seq(Seq(
      () => bruteForceTopK(queriesA, corpus, idCol, vecCol, k)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(true), // one truth per scenario, every arm joins it
      () => ivfPqWithModel(queriesA, corpus, idCol, vecCol, k, freshModel,
        overfetch = overfetch).localCheckpoint(true),
      () => ivfPqWithModel(queriesA, corpus, idCol, vecCol, k, agedModel,
        overfetch = overfetch).localCheckpoint(true),
      () => bruteForceTopK(queriesB, survivors, idCol, vecCol, k)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(true),
      () => int8TopKWith(queriesB, survivors, idCol, vecCol, k,
        int8Quantize(survivors, idCol, vecCol), overfetch).localCheckpoint(true),
      () => int8TopKWith(queriesB, survivors, idCol, vecCol, k,
        deleteFromInt8Index(int8Quantize(corpus, idCol, vecCol), tomb, idCol), overfetch)
        .localCheckpoint(true)))
    recallCardArm("ivf_extend", "exact", truthA, truthA, nqA, k)
      .unionByName(recallCardArm("ivf_extend", "fresh", freshA, truthA, nqA, k))
      .unionByName(recallCardArm("ivf_extend", "aged", agedA, truthA, nqA, k))
      .unionByName(recallCardArm("int8_compact", "exact", truthB, truthB, nqB, k))
      .unionByName(recallCardArm("int8_compact", "fresh", freshB, truthB, nqB, k))
      .unionByName(recallCardArm("int8_compact", "compacted", compB, truthB, nqB, k))
  }

  /** The rebuild decision over an [[agedIndexRecallCard]] — the
    * [[retrainTrigger]] discipline applied to index AGE, closing s45's loop
    * the way dc30 closes dc29's: REBUILD when the aged artifact's measured
    * recall trails its fresh rebuild by more than `maxGapMicro` (the card
    * priced the staleness; past the tolerance the cadence rebuild is due),
    * HOLD otherwise, and a zero-query card is explicitly "no evidence" —
    * never a rebuild (the s25 quiet-cadence convention: an idle scheduler
    * must not rebuild an unmeasured index every cycle). Driver-side by
    * design: the card is 6 rows (scenario-sized, never data-sized).
    */
  final case class RebuildDecision(
      rebuild: Boolean, reason: String,
      freshRecallMicro: Long, agedRecallMicro: Long, gapMicro: Long)

  def rebuildTrigger(
      card: DataFrame,
      scenario: String = "extend",
      agedMethod: String = "extended",
      maxGapMicro: Long = 50000L
  ): RebuildDecision = {
    val rows = card
      .filter(col("scenario") === scenario)
      .select(col("method"), col("n_queries").cast("long"), col("recall_micro").cast("long"))
      .collect() // ≤ 3 rows — the scenario's slice of the 6-row card
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    (rows.get("fresh"), rows.get(agedMethod)) match {
      case (Some((nq, fresh)), Some((_, aged))) if nq > 0L =>
        val gap = fresh - aged
        if (gap > maxGapMicro)
          RebuildDecision(rebuild = true,
            s"aged '$agedMethod' trails fresh by ${gap}µ > ${maxGapMicro}µ — rebuild due",
            fresh, aged, gap)
        else
          RebuildDecision(rebuild = false,
            s"aged '$agedMethod' within ${maxGapMicro}µ of fresh", fresh, aged, gap)
      case _ =>
        RebuildDecision(rebuild = false, "no measured queries — no evidence", 0L, 0L, 0L)
    }
  }

  /** The retrain decision over [[ivfAssignNew]]'s per-cell growth table: retrain
    * when the new mass is SKEWED onto a hot cell (`maxShareMicro · k ≥
    * hotFactorMicro` — a cell drawing ≥ hotFactor× its uniform 1/k share) or when
    * MORE THAN `starvedNum/starvedDen` of the cells are STARVED (no new arrivals —
    * the data moved away from most of the codebook; strict majority so an exact
    * half never trips it). A quiet cadence window (zero arrivals) is explicitly
    * "no evidence", never a retrain — otherwise a scheduler wired to this decision
    * would retrain the unchanged codebook every idle cycle. Driver-side by design:
    * the growth table is k rows (model-sized, never data-sized), the repo's
    * bounded-collect discipline.
    */
  final case class RetrainDecision(
      retrain: Boolean, reason: String, maxShareMicro: Long, starvedCells: Long, cells: Long)

  def retrainTrigger(
      growth: DataFrame,
      hotFactorMicro: Long = 3000000L,
      starvedNum: Int = 1,
      starvedDen: Int = 2
  ): RetrainDecision = {
    val rows = growth.select(col("share_new_micro").cast("long"), col("n_new").cast("long"))
      .collect() // k rows — bounded by the codebook, not the data
    val k = rows.length.toLong
    val maxShare = if (rows.isEmpty) 0L else rows.map(_.getLong(0)).max
    val starved = rows.count(_.getLong(1) == 0L).toLong
    if (k == 0L || starved == k)
      RetrainDecision(retrain = false, "no new arrivals — no evidence", maxShare, starved, k)
    else if (maxShare * k >= hotFactorMicro)
      RetrainDecision(retrain = true, s"hot cell: max share ${maxShare}µ ≥ ${hotFactorMicro}µ/k",
        maxShare, starved, k)
    else if (starved * starvedDen > k * starvedNum)
      RetrainDecision(retrain = true, s"starved cells: $starved of $k got no new vectors",
        maxShare, starved, k)
    else RetrainDecision(retrain = false, "balanced", maxShare, starved, k)
  }

  /** IVF-PQ search against a PRE-TRAINED model relation (cluster, cv[, cn]) — the
    * serving half of the production two-job split: training ([[kmeansRounds]] →
    * [[saveCentroids]]) runs on the index-build cadence; every query batch calls
    * this with the loaded model and pays only assignment + probe + ADC + rerank.
    */
  def ivfPqWithModel(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      model: DataFrame,
      nProbe: Int = 2,
      nSub: Int = 8,
      subDim: Int = 8,
      nCodes: Int = 16,
      overfetch: Int = 4,
      allowed: Option[DataFrame] = None
  ): DataFrame = {
    val withCn = withCentroidNorm(model)
    val cents = broadcast(
      withCn.select(col("cluster").cast("long").as("cid"), col("cv"), col("cn")))
    def nearestCells(r: DataFrame, keep: Int): DataFrame = {
      val w = Window.partitionBy(col("rid")).orderBy(col("cc").desc, col("cid").asc)
      r.crossJoin(cents)
        .select(
          col("rid"), col("cid"),
          round(cosineFromNorms(dot(col("v"), col("cv")), col("nv"), col("cn")), 6).as("cc"))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .select(col("rid"), col("cid"))
    }
    def withNorm(df: DataFrame): DataFrame =
      df.select(col(idCol).as("rid"), toDouble(col(vecCol)).as("v"))
        .withColumn("nv", norm2(col("v")))

    val allCells = nearestCells(withNorm(candidates), keep = 1)
      .select(col("rid").as("neighbor_id"), col("cid"))
    // PRE-filter, not post-filter: the allowed set prunes the cell relation
    // BEFORE pair formation, so a query still fills k results whenever its
    // probed cells hold k allowed members — post-filtering the unfiltered
    // top-k would return fewer (or none, when the global winners are all
    // disallowed). The index itself (cells, codes, LUT codebooks) stays built
    // on the FULL corpus: the filter is a per-query-batch argument against a
    // shared artifact, the published IDSelector shape (Faiss), and the
    // earliest place the predicate can cut the candidate volume.
    val cells = allowed.fold(allCells)(a =>
      allCells.join(a.select(col(a.columns.head).as("neighbor_id")),
        Seq("neighbor_id"), "left_semi"))
    val probes = nearestCells(withNorm(queries), keep = nProbe)
      .select(col("rid").as("query_id"), col("cid"))
    val candidatePairs = probes.join(cells, "cid")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))

    val codes = pqCodes(candidates, idCol, vecCol, nSub, subDim, nCodes)
      .select(col("vec_id").as("neighbor_id"), col("sub"), col("code"))
    val lut = broadcast(adcLut(queries, candidates, idCol, vecCol, nSub, subDim, nCodes))
    val approx = candidatePairs
      .join(codes, "neighbor_id")
      .join(lut, Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("d2m")).as("approx_d2m"))
    exactRerank(adcShortlist(approx, k * overfetch), queries, candidates, idCol, vecCol, k)
  }

  /** Random-projection dimensionality reduction (Johnson-Lindenstrauss with ±1 sign
    * matrices): each vector folds to `outDims` coordinates, coordinate j = ⟨v, h_j⟩
    * with the same deterministic hyperplane family as [[lshBucket]] — LSH's bucket
    * bits are exactly the SIGNS of these projections, so this is the continuous
    * counterpart (used for cheap pre-filtering, visualization, and coarse clustering).
    *
    * Scale shape: pure map — `outDims` codegen'd dot products against constant-folded
    * literal planes per row; no shuffle at all. Projections are rounded to 6 digits
    * (sums of ±x_i; a dot product evaluates left-to-right identically in both
    * engines, the proven s01/s02 contract).
    */
  def randomProjection(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      outDims: Int,
      dims: Int,
      planeOffset: Int = 32
  ): DataFrame = {
    val v = toDouble(col(vecCol))
    val projections = (0 until outDims).map { j =>
      val plane = array((0 until dims).map(i => lit(planeWeight(i, planeOffset + j))): _*)
      round(dot(v, plane), 6).as(s"p$j")
    }
    df.select(col(idCol).as("vec_id") +: projections: _*)
  }

  /** Per-dimension corpus statistics (mean/std) — the embedding-drift telemetry query.
    * Components are quantized to integer milliunits BEFORE aggregation so Σq and Σq²
    * are exact longs (a raw float sum's value depends on Spark's aggregation order;
    * the quantized one can't). One fixed IEEE sequence per dim at the end — mean, then
    * var = E[q²] − mean_q², clamped at 0 — mirrored verbatim in the oracle.
    *
    * Scale: posexplode → map-side-combinable agg keyed by dim; state is one row per
    * dimension regardless of corpus size.
    */
  def dimStats(df: DataFrame, vecCol: String): DataFrame = {
    // floor(x+0.5) quantization, not round(): the proven oracle-portable idiom
    // (quantizeError) — round()'s tie behavior differs across engines
    val q = floor(col("x").cast("double") * 1000 + lit(0.5)).cast("long")
    // the mean is a RATIONAL whose decimal expansion often terminates exactly at the
    // rounding digit (n is a round number), so round(double, 6) is tie-exposed —
    // round it in integer microunits instead (half away from zero), then one exact
    // integer division. |sum_q|·2000 stays under 2^63 up to ~10^12 rows per dim.
    val meanMicro =
      (when(col("sum_q") < 0, lit(-1L)).otherwise(lit(1L)) *
        expr("(abs(sum_q) * 2000 + n) DIV (2 * n)")).as("mean_micro")
    val meanQ = col("sum_q").cast("double") / col("n").cast("double")
    val varQ = greatest(
      col("sum_sq").cast("double") / col("n").cast("double") - meanQ * meanQ,
      lit(0.0))
    df.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("dim"), q.as("q"))
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("q")).as("sum_q"),
        sum(col("q") * col("q")).as("sum_sq"))
      .select(
        col("dim"),
        col("n"),
        (meanMicro / lit(1000000.0)).as("mean"),
        // std keeps the float path: sqrt's output is (near-)irrational, so a
        // terminating-decimal tie at the rounding digit cannot realistically occur
        round(sqrt(varQ) / 1000.0, 6).as("std"))
  }

  /** Rocchio pseudo-relevance-feedback search — the two-round retrieval primitive:
    * round 1 retrieves each query's `feedbackK` nearest neighbors, the query is
    * EXPANDED toward their centroid, and round 2 ranks the corpus against the
    * expanded query. With equal query/centroid weights the expansion is
    * q/2 + centroid/2 ∝ feedbackK·q + Σ neighbors — and since cosine is
    * scale-invariant, the engine ranks with the UNNORMALIZED integer combination:
    * every component is quantized to exact micro-units (floor(1e6·x + 0.5), the
    * engine-portable idiom), so the expanded vector is a sum of BIGINTs — order-free,
    * bit-identical in the oracle — and only the final cosine is float.
    *
    * Scale shape: round 1 is [[bruteForceTopK]] (broadcast query side, one corpus
    * pass); the expansion works on |Q|·feedbackK·dims rows (tiny — never the corpus);
    * round 2 is a second broadcast-query corpus pass. Two passes total, both
    * map-side; swap the round-1/round-2 kernel for [[ivfTopK]] at corpus scales where
    * brute force is infeasible — the expansion step is kernel-agnostic.
    *
    * Degenerate input note: if the feedback centroid is EXACTLY −q (possible only
    * with adversarially constructed embeddings), the expansion cancels to the zero
    * vector and every round-2 cosine is NaN — standard float semantics, same as
    * querying [[bruteForceTopK]] with a zero vector; real embedding corpora cannot
    * hit it.
    */
  def prfTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      feedbackK: Int = 5
  ): DataFrame = {
    val micro = floor(col("x") * lit(1000000.0) + lit(0.5)).cast("long")
    val fb = bruteForceTopK(queries, candidates, idCol, vecCol, feedbackK)
      .select(col("query_id"), col("neighbor_id"))
    // neighbor components in exact micro-units, summed per (query, dim)
    val fbSums = fb
      .join(
        candidates.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("v")),
        "neighbor_id")
      .select(col("query_id"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("query_id"), col("dim"))
      .agg(sum(micro).as("fb_sum"))
    val expanded = queries
      .select(col(idCol).as("query_id"), posexplode(toDouble(col(vecCol))).as(Seq("dim", "x")))
      .select(col("query_id"), col("dim"), micro.as("qm"))
      .join(fbSums, Seq("query_id", "dim"))
      .select(col("query_id"), col("dim"), (lit(feedbackK.toLong) * col("qm") + col("fb_sum")).as("w"))
      .groupBy(col("query_id"))
      // reassemble in dim order: array_sort on (dim, w) structs sorts by dim first
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("w")))),
        s => s.getField("w").cast("double")).as("xv"))
      .withColumn("xn", norm2(col("xv")))
    val c = candidates.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm2(col("cv")))
    val scored = broadcast(expanded)
      .crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        round(cosineFromNorms(dot(col("xv"), col("cv")), col("xn"), col("cn")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** MMR (maximal marginal relevance) diversified re-ranking: from each query's
    * `candK` cosine candidates, greedily select `k` results maximizing
    * λ·relevance − (1−λ)·max-similarity-to-already-selected — the standard
    * redundancy-killer between ANN retrieval and the consumer (Carbonell & Goldstein,
    * SIGIR'98). λ = 1 reduces to plain top-k; lower λ trades relevance for spread.
    *
    * Determinism: relevance and candidate-pair similarities are micro-quantized from
    * the round-6 cosines, so every greedy argmax compares EXACT integers
    * (λ_micro·rel − (1e6−λ_micro)·maxsim ≤ 1e12 — Long-safe), ties on neighbor id.
    * The greedy loop is k−1 unrolled rounds of anti-join (remaining) + equi-join
    * (sims to selected) + per-query argmax window — the d05 unrolled-rounds
    * discipline, mirrored round-for-round in the oracle.
    *
    * Scale shape: candidate generation is the s01 broadcast pass (swap in
    * [[ivfTopK]] at corpus scale — the re-rank is agnostic to where candidates come
    * from); everything after runs on the |Q|·candK candidate relation and its
    * per-query candK² pair sims — bounded by the QUERY batch, never the corpus — and
    * each round's joins are query-key equi-joins on those bounded relations.
    */
  def mmrRerank(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      candK: Int = 10,
      lambdaMicro: Long = 700000L
  ): DataFrame = {
    def micro(c: Column): Column = floor(lit(1000000.0) * c + lit(0.5)).cast("long")
    val cand = bruteForceTopK(queries, candidates, idCol, vecCol, candK)
      .select(col("query_id"), col("neighbor_id"), micro(col("cos_sim")).as("rel_micro"),
        col("rank"))
      .localCheckpoint(false) // consumed every greedy round
    val vecs = candidates
      .select(col(idCol).as("vid"), toDouble(col(vecCol)).as("v"))
      .withColumn("vn", norm2(col("v")))
    // all candidate-candidate sims per query (candK² rows per query, both directions)
    val pairSims = cand.select(col("query_id"), col("neighbor_id").as("id_a"))
      .join(cand.select(col("query_id"), col("neighbor_id").as("id_b")), "query_id")
      .filter(col("id_a") =!= col("id_b"))
      .join(vecs.select(col("vid").as("id_a"), col("v").as("va"), col("vn").as("na")), "id_a")
      .join(vecs.select(col("vid").as("id_b"), col("v").as("vb"), col("vn").as("nb")), "id_b")
      .select(col("query_id"), col("id_a"), col("id_b"),
        micro(round(cosineFromNorms(dot(col("va"), col("vb")), col("na"), col("nb")), 6))
          .as("sim_micro"))
      .localCheckpoint(false) // consumed every greedy round
    // round 1: the empty-selection MMR score is λ·rel, so the pick IS the top-ranked
    var sel = cand
      .filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id"), col("rel_micro"),
        (lit(lambdaMicro) * col("rel_micro")).as("score_micro"),
        lit(1).as("mmr_rank"))
    for (r <- 2 to k) {
      val selIds = sel.select(col("query_id"), col("neighbor_id"))
      val simToSel = pairSims
        .join(selIds.select(col("query_id"), col("neighbor_id").as("id_b")), Seq("query_id", "id_b"))
        .groupBy(col("query_id"), col("id_a"))
        .agg(max(col("sim_micro")).as("maxsim"))
      val pick = cand
        .join(selIds, Seq("query_id", "neighbor_id"), "left_anti")
        .join(simToSel.withColumnRenamed("id_a", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left")
        .select(col("query_id"), col("neighbor_id"), col("rel_micro"),
          (lit(lambdaMicro) * col("rel_micro") -
            lit(1000000L - lambdaMicro) * coalesce(col("maxsim"), lit(0L)))
            .as("score_micro"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("score_micro").desc, col("neighbor_id").asc)))
        .filter(col("rk") === 1)
        .select(col("query_id"), col("neighbor_id"), col("rel_micro"), col("score_micro"),
          lit(r).as("mmr_rank"))
      sel = sel.unionByName(pick).localCheckpoint(false) // selection feeds the next round
    }
    sel
  }
}
