package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Distributed sketch operators — the canonical 100 TB substitutes for exact global
  * aggregation: HyperLogLog distinct counting, count-min frequency estimation, and
  * Bloom-filter set membership.
  *
  * Unlike Spark's built-ins (`approx_count_distinct`, `DataFrameStatFunctions.bloomFilter`),
  * every sketch here is built from explicit md5 arithmetic so the DuckDB oracle can
  * reproduce the estimate bit-for-bit — the driver hash-compares results, so the
  * "approximate" answer must still be deterministic. The price is a hash that is md5
  * instead of xxhash; the plan shapes (map-side partial agg into a tiny register/bucket
  * relation) are identical to what the production sketch would do, so the 100 TB posture
  * is the real one.
  *
  * Float-determinism discipline: every floating sum is a sum of exact dyadic rationals
  * (1/2^rho with rho ≤ 27 and ≤ m ≤ 64 terms), so each partial sum is exactly
  * representable in a double and the result is independent of Spark's aggregation
  * order. Integer arithmetic everywhere else; one final IEEE division before `round`.
  */
object Sketches {

  /** 32-bit hash: first 8 hex chars of md5 — oracle mirror
    * `('0x' || substr(md5(x), 1, 8))::BIGINT`. Shared with the streaming twins
    * (StreamOps) — batch/streaming parity rests on this being the ONE definition.
    */
  private[graft] def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** The count-min cell recipe ('r:'-salted [[h32]] mod width) — single definition
    * shared by [[countMin]] and the streaming maintenance twin.
    */
  private[graft] def cmsBucket(r: Column, item: Column, width: Int): Column =
    pmod(h32(concat(r.cast("string"), lit(":"), item)), lit(width.toLong))

  /** Per-key HyperLogLog distinct estimate, with the exact count alongside as the
    * error diagnostic.
    *
    * b register-index bits (m = 2^b registers); the remaining 32−b hash bits feed the
    * rank rho = position of the first 1-bit (all-zero tail ⇒ 32−b+1). Raw HLL estimate
    * αm·m²/Σ2^(−M_j) with absent registers contributing 2^0 = 1; no small-range linear
    * counting (it needs ln(), whose libm rounding is not oracle-portable at hash
    * granularity) — callers pick b so n/m stays in the raw-formula regime.
    *
    * Plan: one map-side-combinable max-agg into m rows per key, then an m-row fold —
    * the full item stream is never shuffled beyond (key, idx), so a 100 TB scan reduces
    * to m·|keys| rows of state exactly like production HLL.
    */
  /** (key, idx, rho) register relation — the oracle-pinned HLL register recipe (rank
    * of the first 1-bit in the `32−b`-wide hash tail, via the binary-string position:
    * instr of lpad(bin); integer-exact and shared verbatim with the oracle SQL).
    * ONE implementation for every HLL operator — [[hllDistinct]] and [[hllOverlap]]
    * must never diverge on register format.
    */
  private def hllRegisters(items: DataFrame, keyCol: String, itemCol: String, b: Int): DataFrame = {
    val wBits = 32 - b
    val h = h32(col(itemCol))
    val rho = when(col("w") === 0L, lit(wBits + 1))
      .otherwise(instr(lpad(bin(col("w")), wBits, "0"), "1"))
    items
      .select(
        col(keyCol).as("key"),
        shiftright(h, wBits).as("idx"),
        h.bitwiseAND(lit((1L << wBits) - 1)).as("w"))
      .groupBy(col("key"), col("idx"))
      .agg(max(rho).as("rho"))
  }

  def hllDistinct(items: DataFrame, keyCol: String, itemCol: String, b: Int = 6): DataFrame = {
    require(b >= 4 && b <= 16, s"register bits out of range: $b")
    val m = 1 << b
    val alphaMM = 0.7213 / (1.0 + 1.079 / m) * m * m
    val mat = items.localCheckpoint(true) // two consumers: registers + exact diagnostic
    val sums = hllRegisters(mat, keyCol, itemCol, b)
      .groupBy(col("key"))
      .agg(
        sum(lit(1.0) / expr("shiftleft(CAST(1 AS BIGINT), rho)").cast("double")).as("hit_sum"),
        count(lit(1)).as("n_regs"))
      .select(
        col("key").as(keyCol),
        (col("hit_sum") + (lit(m.toLong) - col("n_regs")).cast("double")).as("ssum"))
    val exact = mat
      .groupBy(col(keyCol))
      .agg(countDistinct(col(itemCol)).as("exact_distinct"))
    sums
      .join(exact, keyCol)
      .withColumn("hll_est", round(lit(alphaMM) / col("ssum"), 3))
      .select(
        col(keyCol),
        col("hll_est"),
        col("exact_distinct"),
        round(
          abs(col("hll_est") - col("exact_distinct").cast("double")) /
            col("exact_distinct").cast("double"),
          4
        ).as("rel_err"))
  }

  /** Count-min frequency estimates over a weighted item stream: `depth` hash rows ×
    * `width` buckets; estimate = min over rows of the bucket total. Reported for the
    * `topK` heaviest items (deterministic (count desc, item) order) so output stays
    * bounded at any scale factor; `cms_n ≥ exact_n` always (one-sided error).
    *
    * The bucket table is built from the exact per-item counts (one shuffle on item —
    * needed anyway for the diagnostic), then re-keyed to depth·width rows: equivalent
    * to streaming increments, but the second shuffle moves |distinct items| rows, not
    * the raw stream. At 100 TB the (r, bucket) relation is depth·width rows total —
    * broadcastable state, like a production CMS merge.
    */
  def countMin(
      items: DataFrame,
      itemCol: String,
      depth: Int = 4,
      width: Int = 256,
      topK: Int = 100
  ): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth out of range: $depth")
    require(width >= 1, s"width out of range: $width") // width 0 would reach pmod-by-zero
    val exact = items.groupBy(col(itemCol)).agg(count(lit(1)).as("exact_n"))
    val itemBuckets = exact
      .select(
        col(itemCol),
        col("exact_n"),
        explode(array((0 until depth).map(lit): _*)).as("r"))
      .withColumn("bucket", cmsBucket(col("r"), col(itemCol), width))
      .localCheckpoint(true) // two consumers: bucket totals + the probe join
    val bucketCounts = itemBuckets
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("exact_n")).as("bucket_n"))
    itemBuckets
      .join(bucketCounts, Seq("r", "bucket"))
      .groupBy(col(itemCol))
      .agg(min(col("bucket_n")).as("cms_n"), max(col("exact_n")).as("exact_n"))
      .orderBy(col("exact_n").desc, col(itemCol))
      .limit(topK)
      .select(col(itemCol), col("exact_n"), col("cms_n"), (col("cms_n") - col("exact_n")).as("overcount"))
  }

  /** sk10 — HEAVY HITTERS with a CMS screen: every token holding ≥ φ of the
    * corpus token mass, found without ever shuffling the long tail at full
    * count precision. The screen is the d37 no-false-negative discipline in
    * sketch form: CMS estimates only OVER-count (each row's bucket total ≥ the
    * item's true count), so a true φ-heavy item can never fall below the
    * threshold at the screen — candidates ⊇ hitters structurally, and only the
    * candidate set (Zipf head, tiny) pays the exact verification join. The
    * report carries `n_candidates` beside the confirmed hitters — the measured
    * screen efficiency (candidates − hitters = the FP bill paid to avoid the
    * tail).
    *
    * Thresholding is the exact integer comparison `count ≥ ⌈φ·N⌉` (one ceil
    * division, no floats; overflow bound: φ_micro·N stays in BIGINT to ~10¹³
    * tokens at φ = 2% — the g62/s33 convention).
    *
    * Scale shape: the bucket table aggregates the RAW token stream map-side
    * (depth·width rows out — broadcastable); the distinct-token relation probes
    * it broadcast; only candidates reach the exact count. The one vocab-sized
    * shuffle is the distinct itself — the exact-count shuffle the screen
    * avoids would carry the full stream's tail.
    */
  def heavyHitters(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      phiMicro: Long = 20000L,
      depth: Int = 4,
      width: Int = 256
  ): DataFrame = {
    require(depth >= 1 && depth <= 8 && width >= 1 && phiMicro >= 1,
      s"heavyHitters: bad params depth=$depth width=$width phi=$phiMicro")
    val toks = graft.pipeline.TextStats.tokens(docs, idCol, textCol)
      .select(col("token"))
      .localCheckpoint(true) // three consumers: total, bucket table, exact verify
    val total = toks.agg(count(lit(1)).as("n_total"))
    val bucketCounts = toks
      .select(col("token"), explode(array((0 until depth).map(lit): _*)).as("r"))
      .withColumn("bucket", cmsBucket(col("r"), col("token"), width))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("bucket_n"))
    val candidates = toks.distinct()
      .select(col("token"), explode(array((0 until depth).map(lit): _*)).as("r"))
      .withColumn("bucket", cmsBucket(col("r"), col("token"), width))
      .join(broadcast(bucketCounts), Seq("r", "bucket"))
      .groupBy(col("token"))
      .agg(min(col("bucket_n")).as("cms_n"))
      .crossJoin(broadcast(total))
      .filter(col("cms_n") >= expr(s"($phiMicro * n_total + 999999) DIV 1000000"))
      .localCheckpoint(true) // Zipf-head-sized; read by the verify join and the census
    val nCand = candidates.agg(count(lit(1)).as("n_candidates"))
    toks
      .join(broadcast(candidates.select(col("token"))), Seq("token")) // tail never joins
      .groupBy(col("token"))
      .agg(count(lit(1)).as("exact_n"))
      .join(broadcast(candidates.select(col("token"), col("cms_n"), col("n_total"))), Seq("token"))
      .filter(col("exact_n") >= expr(s"($phiMicro * n_total + 999999) DIV 1000000"))
      .crossJoin(broadcast(nCand))
      .select(col("token"), col("exact_n"), col("cms_n"), col("n_total"), col("n_candidates"))
  }

  /** Pairwise set-overlap estimates between keys via HLL register algebra — the
    * source-overlap matrix of corpus curation ("how much does crawl A duplicate
    * crawl B") WITHOUT ever joining item sets: HLL registers merge by max, unions
    * are free, and |A∩B| ≈ est(A) + est(B) − est(A∪B) by inclusion-exclusion.
    *
    * Same deterministic md5 registers and dyadic-rational fold as [[hllDistinct]]
    * (see the object scaladoc); inclusion-exclusion runs on the ROUNDED per-set
    * estimates in a fixed order, so the oracle reproduces it bit-for-bit. Negative
    * estimates are floored at 0 (inclusion-exclusion noise for near-disjoint sets).
    *
    * Scale shape: the item stream folds once into |keys|·m register rows; every
    * pairwise union is register-table self-algebra — |keys|²·m tiny rows, no
    * re-scan of the data. This is why sketch overlap wins at 100 TB: the exact
    * answer needs a |keys|²-way join of the full item sets.
    */
  def hllOverlap(items: DataFrame, keyCol: String, itemCol: String, b: Int = 6): DataFrame = {
    require(b >= 4 && b <= 16, s"register bits out of range: $b")
    val m = 1 << b
    val alphaMM = 0.7213 / (1.0 + 1.079 / m) * m * m
    val regs = hllRegisters(items, keyCol, itemCol, b)
      .localCheckpoint(true) // three consumers: per-key fold + both sides of the pair union

    def estimate(grouped: DataFrame, ks: Seq[String]): DataFrame =
      grouped
        .groupBy(ks.map(col): _*)
        .agg(
          sum(lit(1.0) / expr("shiftleft(CAST(1 AS BIGINT), rho)").cast("double")).as("hit_sum"),
          count(lit(1)).as("n_regs"))
        .withColumn("est",
          round(lit(alphaMM) /
            (col("hit_sum") + (lit(m.toLong) - col("n_regs")).cast("double")), 3))

    val ests = estimate(regs, Seq("key")).select(col("key"), col("est"))
    val keys = regs.select(col("key")).distinct()
    val pairs = broadcast(keys.select(col("key").as("key_a")))
      .crossJoin(broadcast(keys.select(col("key").as("key_b"))))
      .filter(col("key_a") < col("key_b"))
    val unionRegs = pairs
      .join(regs.withColumnRenamed("key", "key_a"), "key_a")
      .select(col("key_a"), col("key_b"), col("idx"), col("rho"))
      .unionByName(
        pairs.join(regs.withColumnRenamed("key", "key_b"), "key_b")
          .select(col("key_a"), col("key_b"), col("idx"), col("rho")))
      .groupBy(col("key_a"), col("key_b"), col("idx"))
      .agg(max(col("rho")).as("rho"))
    estimate(unionRegs, Seq("key_a", "key_b"))
      .select(col("key_a"), col("key_b"), col("est").as("est_union"))
      .join(broadcast(ests.select(col("key").as("key_a"), col("est").as("est_a"))), "key_a")
      .join(broadcast(ests.select(col("key").as("key_b"), col("est").as("est_b"))), "key_b")
      .select(
        col("key_a"), col("key_b"), col("est_a"), col("est_b"), col("est_union"),
        greatest(lit(0.0), round(col("est_a") + col("est_b") - col("est_union"), 3))
          .as("overlap_est"))
  }

  /** Theta/KMV (bottom-k) sketch set-DIFFERENCE estimates between keys — the J2
    * difference semantics at sketch scale, which HLL register algebra cannot express
    * (registers only union: inclusion-exclusion recovers A∩B, but |A∖B| would need
    * |A| − |A∩B| with compounded error; the theta sketch estimates the difference
    * directly on a retained uniform sample). For every ordered key pair (a, b):
    * θ_ab = min(θ_a, θ_b); retained = a's sample hashes < θ_ab that do NOT occur in
    * b (a valid membership test on samples alone: any b-hash < θ_ab ≤ θ_b is in b's
    * sample by construction); est |A∖B| = retained · 2³² / θ_ab. A key with fewer
    * than k distinct hashes has θ = 2³² — its whole hash set is the sample, so
    * small-set differences come out EXACT.
    *
    * Determinism: the same md5 [[h32]] as every sketch here; integer arithmetic
    * throughout with ONE final IEEE division + round (object scaladoc discipline).
    *
    * Scale shape: the item stream folds ONCE into a ≤ k-hash sample per key, with
    * the k-th-smallest threshold computed by the bounded-state map-side-combinable
    * [[org.apache.spark.sql.graft.KthSmallest]] aggregate (never a per-key window
    * sort — a billion-item key would serialize through one task); all pair algebra
    * then runs on |keys|·k sample rows with broadcast joins. This is exactly how a
    * production theta-sketch difference works: sketch once, set-op on sketches.
    */
  def thetaDifference(
      items: DataFrame,
      keyCol: String,
      itemCol: String,
      k: Int = 64
  ): DataFrame = thetaDifferenceImpl(items, keyCol, itemCol, k, _.localCheckpoint(true))

  /** Uncheckpointed [[thetaDifference]], exposed so PlanSpec can assert the fold and
    * join shapes (the production path's eager checkpoints hide them behind RDD scans).
    */
  private[graft] def plannedThetaDifference(
      items: DataFrame, keyCol: String, itemCol: String, k: Int): DataFrame =
    thetaDifferenceImpl(items, keyCol, itemCol, k, identity)

  private def thetaDifferenceImpl(
      items: DataFrame,
      keyCol: String,
      itemCol: String,
      k: Int,
      mat: DataFrame => DataFrame
  ): DataFrame = {
    require(k >= 2, s"sketch size too small: $k")
    val full = lit(1L << 32)
    val hashes = mat(items
      .select(col(keyCol).as("key"), h32(col(itemCol)).as("hv"))
      .distinct()) // three consumers: theta fold + both sample sides
    val thetas = mat(hashes
      .groupBy(col("key"))
      .agg(
        org.apache.spark.sql.graft.KthSmallest.column(col("hv"), lit(0L), k).as("kth"),
        count(lit(1)).as("n_distinct"))
      .select(
        col("key"),
        when(col("n_distinct") >= k, col("kth.major")).otherwise(full).as("theta"))
    ) // |keys| rows; three consumers (samples + both pair sides)
    val samples = hashes
      .join(broadcast(thetas), "key")
      .filter(col("hv") < col("theta")) // the k-th value itself is θ, excluded
    val pairs = broadcast(thetas.select(col("key").as("key_a"), col("theta").as("theta_a")))
      .crossJoin(broadcast(thetas.select(col("key").as("key_b"), col("theta").as("theta_b"))))
      .filter(col("key_a") =!= col("key_b"))
      .select(col("key_a"), col("key_b"),
        least(col("theta_a"), col("theta_b")).as("theta_ab"))
    val retained = pairs
      .join(samples.select(col("key").as("key_a"), col("hv")), "key_a")
      .filter(col("hv") < col("theta_ab"))
      .join(samples.select(col("key").as("key_b"), col("hv")), Seq("key_b", "hv"), "left_anti")
      .groupBy(col("key_a"), col("key_b"), col("theta_ab"))
      .agg(count(lit(1)).as("n_retained"))
    pairs
      .join(retained, Seq("key_a", "key_b", "theta_ab"), "left")
      .select(
        col("key_a"),
        col("key_b"),
        col("theta_ab"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        round(
          coalesce(col("n_retained"), lit(0L)).cast("double") * lit(4294967296.0) /
            col("theta_ab").cast("double"),
          3).as("diff_est"))
  }

  /** KMV-sample quantiles: per key, an O(k)-state bottom-k sample (by md5 of the row
    * id — a uniform, deterministic, MERGEABLE register: the union's bottom-k is the
    * bottom-k of the unioned registers) and nearest-rank quantiles of the sampled
    * values. The bounded-state complement of t17's exact cumulated histogram: the
    * histogram is exact but carries |distinct values| state per key; this carries k
    * rows per key at ANY value cardinality — the shape a 100 TB quantile monitor
    * actually ships. Estimates are deterministic (same sample in both engines), and
    * exact whenever a key has ≤ k rows.
    *
    * Scale shape: the sample selection is the [[Sampling.sourceCap]] two-pass design
    * — a bounded k-element threshold aggregate (map-side combinable, O(k) state in
    * ObjectHashAggregate), then a broadcast-threshold filter; only the ≤ k survivors
    * per key reach the final per-key sort, so no window ever sees the full stream.
    */
  def kmvQuantiles(
      items: DataFrame,
      keyCol: String,
      idCol: String,
      valueCol: String,
      k: Int = 64
  ): DataFrame = {
    // full-width 60-bit hash (not Sampling's 10^4 buckets: collisions would bias the
    // sample toward small ids); minor key = id keeps the order total and engine-stable
    val hv = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10).cast("long")
    val rows = items.select(col(keyCol), col(idCol), col(valueCol).cast("long").as("v"))
      .withColumn("hv", hv)
    val thresholds = rows
      .groupBy(col(keyCol))
      .agg(org.apache.spark.sql.graft.KthSmallest.column(col("hv"), col(idCol), k).as("thr"))
    val sample = rows
      .join(broadcast(thresholds), Seq(keyCol))
      .filter(
        col("hv") < col("thr.major") ||
          (col("hv") === col("thr.major") && col(idCol) <= col("thr.minor")))
      // defensive trim if ids are not unique within a key (the sourceCap guard):
      // duplicate ids at the register boundary would otherwise overfill the sample;
      // the value tie-break keeps the survivor deterministic on BOTH engines
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
          .orderBy(col("hv"), col(idCol), col("v"))))
      .filter(col("rk") <= k)
    // nearest-rank on the sorted sample: q(p) = vs[ceil(p·n/100)] (1-indexed)
    def q(p: Int): Column =
      expr(s"element_at(vs, CAST((${p}L * n_sample + 99) DIV 100 AS INT))")
    sample
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_sample"),
        sort_array(collect_list(col("v"))).as("vs"))
      .select(
        col(keyCol),
        col("n_sample"),
        q(50).as("p50_est"),
        q(90).as("p90_est"),
        q(99).as("p99_est"))
  }

  /** HDR-histogram quantiles: positive integer values bucket by (binary exponent,
    * top-2 mantissa bits) — bucket id `4·e + (4v DIV 2^e) − 4`, lower bound
    * `(bucket mod 4 + 4)·2^e DIV 4` — giving ≤ 2^−2 RELATIVE error with at most
    * 4·63 buckets of state per key at ANY value range. The log-bucketed complement
    * of [[kmvQuantiles]]'s rank-exact sample: the sample nails ranks but its error
    * on the VALUE is unbounded at heavy tails; the histogram bounds value error
    * everywhere and its registers merge by addition (the production
    * latency-percentile shape).
    *
    * Everything is INTEGER arithmetic — the binary exponent comes from the bit
    * length of the value, not from float log2, so a boundary value can never land
    * in different buckets on different engines (the determinism failure mode of
    * log-bucket sketches computed via `floor(ln x / ln γ)`).
    *
    * Scale shape: one map-side-combinable (key, bucket) count — the only pass over
    * the data — then a cumulated-count window over the ≤ 252-bucket-per-key
    * relation; the raw stream never reaches a window or a sort.
    */
  def hdrQuantiles(
      items: DataFrame,
      keyCol: String,
      valueCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buckets = items
      .select(col(keyCol), col(valueCol).cast("long").as("v"))
      .filter(col("v") > 0)
      // e = floor(log2 v) via bit length (exact); bucket = 4e + (v DIV 2^(e−2)) − 4.
      // The sub-bucket shifts v DOWN (never 4v up): 4·v would overflow Long above
      // 2^61 and silently wrap on Spark while DuckDB errors — the one way the two
      // engines could diverge on this integer-only sketch
      .withColumn("e", (length(expr("bin(v)")) - 1).cast("long"))
      .withColumn("bucket",
        lit(4L) * col("e") +
          expr("""CASE WHEN e >= 2 THEN shiftright(v, CAST(e - 2 AS INT))
                 |     ELSE shiftleft(v, CAST(2 - e AS INT)) END""".stripMargin) - lit(4L))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col(keyCol))
    val cum = buckets.select(
      col(keyCol),
      col("bucket"),
      sum(col("c")).over(cumW).as("cum"),
      sum(col("c")).over(totW).as("n"))
    // nearest-rank over the cumulated buckets (the t17 idiom), estimate = the
    // bucket's integer lower bound (bucket mod 4 + 4)·2^(e−2) — shifted from the
    // 3-bit mantissa, never through an overflowing (m+4)·2^e product
    val lb = expr(
      """CASE WHEN bucket DIV 4 >= 2
        |     THEN shiftleft(bucket % 4 + 4, CAST(bucket DIV 4 - 2 AS INT))
        |     ELSE shiftright(bucket % 4 + 4, CAST(2 - bucket DIV 4 AS INT)) END""".stripMargin)
    def q(p: Int): Column =
      min(when(col("cum") * 100 >= lit(p.toLong) * col("n"), lb)).as(s"p${p}_est")
    cum
      .groupBy(col(keyCol))
      .agg(max(col("n")).as("n"), q(50), q(90), q(99))
  }

  /** AMS F₂ sketch — the tug-of-war estimate of a column's SECOND frequency moment
    * Σ n_k² (Alon–Matias–Szegedy, STOC '96). F₂ is the column's self-join size: the
    * quantity a planner needs to price a join on this key and the skew signal of a
    * 100 TB shuffle (uniform keys ⇒ F₂ ≈ N²/|keys|; one hot key drives it toward N²).
    * Each register j sums count·sign(key, j) over ±1 md5 signs; E[c_j²] = F₂, and the
    * estimate averages `width` independent registers. The exact F₂ rides along as the
    * error diagnostic (the sk01/sk02 discipline).
    *
    * Scale shape: one map-side-combinable count per key, then a width-per-key explode
    * of the |keys|-sized COUNT relation (never the raw stream) into `width` register
    * sums — bounded state like a production AMS merge; registers combine by addition,
    * so the sketch is mergeable across partitions/streams. Register sums are exact
    * BIGINTs (|c_j| ≤ N, squares safe below N ≈ 3·10⁹ per register — beyond that,
    * shard the column before sketching).
    */
  def amsF2(items: DataFrame, itemCol: String, width: Int = 64): DataFrame = {
    require(width >= 1, s"width out of range: $width")
    val cnt = items.groupBy(col(itemCol)).agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // two consumers: the exact-F2 totals and the registers
    val totals = cnt.agg(
      sum(col("n")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      sum(col("n") * col("n")).as("f2_exact"))
    val regs = cnt
      .select(col(itemCol).cast("string").as("k"), col("n"),
        explode(array((0 until width).map(lit): _*)).as("j"))
      .withColumn("sign",
        lit(1L) - lit(2L) * pmod(h32(concat(col("j").cast("string"), lit(":"), col("k"))), lit(2L)))
      .groupBy(col("j"))
      .agg(sum(col("n") * col("sign")).as("c"))
    val est = regs.agg(sum(col("c") * col("c")).as("f2_sum"))
    totals
      .crossJoin(est)
      .select(
        col("n_rows"), col("n_keys"), col("f2_exact"), col("f2_sum"),
        round(col("f2_sum").cast("double") / lit(width.toDouble), 6).as("f2_est"))
  }

  /** Bloom-filter contamination screen: build a k=3-hash filter over the TRAIN split's
    * shingles, probe every eval-split document's shingles against it. No false
    * negatives (every true train-shingle hit is flagged); false-positive rate set by
    * mBits vs train cardinality. Per eval doc: shingle count, flagged count, flag rate.
    *
    * The three bit positions come from disjoint 8-hex-char fields of ONE md5 — one hash
    * pass per shingle, same as d02's minhash discipline. The bit-set relation is
    * |train shingles|·3 distinct ints ≤ mBits — at production scale this becomes
    * Spark's `bloomFilter` aggregate exchanged as a literal; the equi-join here keeps
    * the same semantics while staying oracle-reproducible, and AQE picks broadcast vs
    * shuffle join by the bit-set's actual size.
    */
  def bloomContamination(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      mBits: Int = 1 << 18,
      shingleSize: Int = 3,
      trainPct: Int = 90
  ): DataFrame = {
    val split = Sampling.hashSplit(docs, idCol, trainPct, 5).select(col(idCol), col("split"))
    val md = md5(col("shingle"))
    def pos(start: Int): Column =
      pmod(conv(substring(md, start, 8), 16, 10).cast("long"), lit(mBits.toLong))
    // positions deduped WITHIN the row (p_i collisions) before any explode — a
    // relation-level distinct here would shuffle the 3×-exploded stream for nothing
    val withPos = Dedup
      .shingles(docs, idCol, textCol, shingleSize)
      .join(split, idCol)
      .select(
        col(idCol),
        col("split"),
        col("shingle"),
        array_distinct(array(pos(1), pos(9), pos(17))).as("ps"))
      .localCheckpoint(true) // two consumers: the train bit set and the eval probes
    val bits = withPos
      .filter(col("split") === "train")
      .select(explode(col("ps")).as("pos"))
      .distinct()
    val probes = withPos.filter(col("split") =!= "train")
    val flagged = probes
      .select(
        col(idCol),
        col("split"),
        col("shingle"),
        size(col("ps")).as("n_pos"),
        explode(col("ps")).as("pos"))
      .join(bits, Seq("pos"))
      .groupBy(col(idCol), col("split"), col("shingle"), col("n_pos"))
      .agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === col("n_pos")) // all probed bits set => bloom positive
      .groupBy(col(idCol), col("split"))
      .agg(count(lit(1)).as("n_flagged"))
    probes
      .groupBy(col(idCol), col("split"))
      .agg(count(lit(1)).as("n_shingles"))
      .join(flagged, Seq(idCol, "split"), "left")
      .select(
        col(idCol),
        col("split"),
        col("n_shingles"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
        round(
          coalesce(col("n_flagged"), lit(0L)).cast("double") /
            col("n_shingles").cast("double"),
          6).as("flag_rate"))
  }

  /** Moments sketch: per-group mean / variance / skewness / excess kurtosis from the
    * first four POWER sums — the classic mergeable moments summary (Σx, Σx², Σx³, Σx⁴
    * combine across partitions and across days by plain addition, so a 100 TB fleet
    * keeps one constant-size register per group and merges them map-side; contrast
    * with exact percentiles, which need the data). This is the distribution-drift
    * monitor for corpus curation: a source whose length skew or kurtosis jumps between
    * snapshots changed its generator.
    *
    * Determinism and headroom, honestly stated: x is widened to decimal(12,0), so a
    * single x⁴ term (decimal precision caps products at 38 digits, scale 0) is exact
    * for x < ~3.1e9, and the 38-digit Σx⁴ accumulator then holds 1e38/x⁴ rows per
    * group (1e14 rows at x = 1e6 — document lengths never approach either bound).
    * The sums are therefore EXACT integers with no float-order variance, and the
    * population-moment formulas are one fixed double-arithmetic sequence over them,
    * mirrored verbatim in the oracle (whose per-row products are promoted to HUGEINT
    * for the same reason). Spark's own `skewness`/`kurtosis` are NOT used: their
    * streaming central-moment updates are float-order-dependent and their bias
    * conventions differ from DuckDB's. A zero-variance group (every value equal) has
    * undefined skew/kurtosis; both engines report 0 by explicit guard rather than
    * leaking a NaN (Spark) vs NULL (DuckDB) disagreement. The guard is `variance <= 0`
    * (not `== 0`): above x ≈ 3e8 a constant group's x² exceeds 2⁵³, the double
    * sequence m2 − m1·m1 can round to a tiny NEGATIVE, and sqrt of that is NaN — so
    * skew/kurt are only claimed NaN-free across the full x < ~3.1e9 exact-sum
    * envelope BECAUSE of the ≤; with an equality guard the claim would only hold for
    * x ≲ 3e8.
    */
  def momentsSketch(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val x = col(valCol).cast("decimal(12,0)")
    val sums = df
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("s1"),
        sum(x * x).as("s2"),
        sum(x * x * x).as("s3"),
        sum((x * x) * (x * x)).as("s4"))
    val nD = col("n").cast("double")
    val m1 = col("s1").cast("double") / nD
    val m2 = col("s2").cast("double") / nD
    val m3 = col("s3").cast("double") / nD
    val m4 = col("s4").cast("double") / nD
    val variance = m2 - m1 * m1
    // v·sqrt(v), not pow(v, 1.5): sqrt is IEEE-correctly-rounded in both engines,
    // pow is only ulp-accurate (Java Math.pow vs libm could differ in the last bit)
    val skew = (m3 - lit(3.0) * m1 * m2 + lit(2.0) * m1 * m1 * m1) /
      (variance * sqrt(variance))
    val kurt =
      (m4 - lit(4.0) * m1 * m3 + lit(6.0) * m1 * m1 * m2 - lit(3.0) * m1 * m1 * m1 * m1) /
        (variance * variance) - lit(3.0)
    def micro(c: Column): Column = floor(lit(1000000.0) * c + lit(0.5)).cast("long")
    // <= 0, not == 0: for (near-)constant groups with values above ~3e8 (x² beyond
    // 2^53) the double sequence m2 − m1·m1 can round to a TINY NEGATIVE, and
    // sqrt(negative) = NaN would then hit Spark's silent NaN→0 BIGINT cast while
    // DuckDB's CAST(NaN AS BIGINT) errors — the one spot the engines could diverge
    def guarded(c: Column): Column = when(variance <= lit(0.0), lit(0L)).otherwise(micro(c))
    sums.select(
      col(groupCol),
      col("n"),
      micro(m1).as("mean_micro"),
      micro(variance).as("var_micro"),
      guarded(skew).as("skew_micro"),
      guarded(kurt).as("kurt_micro"))
  }
}
