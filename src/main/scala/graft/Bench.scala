package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** Headline subset whose per-query seconds go into the emitted JSON line.
    * The driver retains only a ~2000-char tail of the run's output, so the
    * full 100-query map (~2.4 KB) cannot be reported per-query without the
    * line being head-truncated into unparseable JSON. The headline set covers
    * every operator family plus every historically-expensive query; the
    * "value" field is still the total over ALL queries run.
    */
  val headline: Seq[String] = Seq(
    "q03_top_revenue_orders",
    "g01_lww_snapshot", "g12_execute_lww",
    "g17_pagerank", "g18_vertex_domination", "g20_metadata_registers", "g21_triangles",
    "g27_kcore", "g29_connected_components", "g32_personalized_pagerank",
    "g34_bfs_distance", "g37_decayed_pagerank", "g38_ktruss",
    "g39_sssp", "g40_lpa_communities", "g42_churn_between",
    "d02_minhash_lsh", "d05_dedup_clusters", "d08_curation_funnel",
    "d10_fuzzy_pairs", "d12_simhash_hamming", "d13_semdedup",
    "s07_ann_recall", "s11_ann_rerank", "s14_pq_codes", "s15_pq_search",
    "s16_ivf_pq", "s17_hybrid_rrf", "s18_hybrid_rrf_capped", "s19_prf_expand",
    "s20_knn_graph", "s22_kmeans_train", "s23_ivf_pq_trained", "s24_ivf_pq_saved",
    // rotated out for line-length headroom (still in the total): t01_lang_id,
    // t13_chunk, ev3_hourly_rollup, m03_frame_sample, q01_pricing_summary,
    // ev8_asof_join, o01_zorder, s01_ann_bruteforce, t06_corpus_stats,
    // g06_reciprocal, g33_hits (r8, paying for cal_end + g42), t14_sequence_pack,
    // ev12_session_stats (r9, paying for s19 + t29), ev11_rolling_actives,
    // sk04_hll_overlap, q06_revenue_rollup (r9b, paying for g43 + d14 + t31),
    // t22_bpe_pairs, s02_ann_lsh (r9c, paying for g44 + t32) —
    // all historically <2s and family-covered by the remaining entries;
    // q05_region_revenue, g02_adjacency_topk rotated r9d, paying for t33 + sk09;
    // t18_tfidf_top, sk05_theta_diff rotated r9e, paying for s21 + d15;
    // s10_kmeans_step, s03_embed_neardup, g35_friend_recs, d04_ngram_jaccard
    // rotated r10, paying for s22 + s23 + t35 + the cal_max field (s22's loop
    // runs the s10 step three times; s03 shares s20's scoredLshPairs kernel;
    // g35 composes g23+g31's shapes; d04's jaccard kernel rides in d10 — all
    // historically <2s); s04_ann_ivf rotated r10b, paying for s24 (s04's IVF
    // cell kernel runs inside s16/s23/s24; s24 is the expensive new artifact
    // round-trip at ~5s)
    "t20_unigram_logprob", "t21_bm25_top", "t35_source_drift",
    "t24_bpe_merges", "t25_bpe_encode", "t29_kneser_ney", "t31_dsir_scores",
    "ev2_sessionize", "q08_market_share",
    "sk01_hll_distinct", "sk03_bloom_contamination",
    "m01_media_features", "o02_hilbert", "g43_salsa", "d14_dup_spans",
    "g44_harmonic", "t32_vocab_growth", "t33_pmi_pairs", "sk09_moments", "g46_modularity",
    "s21_mmr_rerank", "d15_cluster_keep",
  )

  /** Fixed calibration workload, timed AFTER warmup and BEFORE the query loop: a
    * constant synthetic aggregation (hash + small-key groupBy over a generated range
    * — CPU-bound, shuffle-light, independent of the data directory). Its seconds go
    * into the JSON as `"cal"`, so a cross-round per-query comparison can normalize
    * for host load first: r6's driver run read untouched queries 3–5× slower purely
    * from box contention, and without a calibration constant that regression pattern
    * is indistinguishable from a plan change.
    */
  private def calibrate(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 200000000L, 1L, 32)
      .selectExpr("xxhash64(id) % 1024 AS k")
      .groupBy("k").count()
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** 1/5-scale calibration (~0.25 s clean) interleaved INSIDE the query loop every
    * [[microCalEvery]] queries: r9 proved the two-point cal/cal_end bracket is blind
    * to load that arrives mid-run and leaves before the end sample (cal 0.988 /
    * cal_end 1.019 around ten queries inflated 2–6×, the third consecutive
    * contaminated driver bench). Raw micro seconds don't convert to full-cal units
    * by the row ratio — per-job fixed overhead and mid-loop cache/thread state bias
    * the small job (measured: ~1.3× vs a pristine reference even with the pre-sample
    * GC) — so samples normalize against their OWN run median: scaled_i = raw_i ·
    * cal / median(raw), and `cal_max` = worst of {cal, cal_end, scaled samples}. A
    * clean run reads cal_max ≈ 1.0–1.5 on this box (each sample is a min-of-3, but
    * ~1.3× residual jitter between sample POINTS survives — honest floor, stated so
    * nobody chases it); a mid-run load WINDOW (a minority of samples — the r9
    * failure mode, 2–6× on queries) spikes the max well above 2 and is visible from
    * the JSON line alone; SUSTAINED contamination moves the median instead, which
    * is exactly the case the cal/cal_end bracket already catches. Raw per-sample seconds and per-query start offsets go to stderr so
    * the contaminated SPAN is identifiable post-hoc, not just its existence.
    */
  private def microCalibrate(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 40000000L, 1L, 32)
      .selectExpr("xxhash64(id) % 1024 AS k")
      .groupBy("k").count()
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  private[graft] val microCalEvery = 15

  /** The emitted contract line (see BenchContractSpec): headline per-query seconds
    * plus all failures, total over every query run, and the host-load calibration
    * constants. `cal` is sampled before the query loop and `cal_end` after it — two
    * consecutive driver rounds were contention-garbage, and a start-only sample
    * understates load that arrives MID-run (r7: cal 1.219 caught the start, but the
    * 8-10x phantom spikes came later). `cal_max` is the worst of the bracket AND the
    * [[microCalibrate]] samples interleaved through the loop (r9: both bracket
    * samples read clean around a mid-run window that inflated ten queries 2–6×).
    * A cross-run comparison rejects any run where cal/cal_end exceed ~1.0 or
    * cal_max exceeds ~2 (clean cal_max floor is ~1.5 — see [[microCalibrate]]).
    */
  private[graft] def renderLine(
      total: Double,
      cal: Double,
      calEnd: Double,
      calMax: Double,
      n: Int,
      secByName: Map[String, Double],
      failed: Seq[String],
      sfDir: String): String = {
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val mapped = (headline.filter(secByName.contains) ++ failed).distinct
    val qs = mapped.map(k => "\"" + k + "\":" + f(secByName(k))).mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    s"""{"metric":"total","value":${f(total)},"unit":"sec","cal":${f(cal)},"cal_end":${f(calEnd)},"cal_max":${f(calMax)},"n":$n,"queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen/parquet-footer/AQE init, so the first timed query
    // isn't charged for session bring-up. One representative query per operator family
    // (write pipeline incl. LwwWinner + checkpoints, md5/shingle pipeline, star join)
    // — measured: the first query through each family otherwise absorbs ~3 s of JIT
    // that has nothing to do with the plan being graded.
    spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy("user_id").count().count()
    Seq("g12_execute_lww", "d03_simhash", "q05_region_revenue", "s02_ann_lsh").foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] warmup $n failed: ${e.getMessage}") }
      }
    }
    val cal = calibrate(spark)
    microCalibrate(spark) // untimed: the micro shape's first run pays JIT/codegen
    // optional args = subset of query names (local iteration); no args = full suite
    args.filterNot(SparkEntry.queries.contains).foreach { n =>
      System.err.println(s"[bench] unknown query name: $n")
    }
    val selected =
      if (args.isEmpty) SparkEntry.queries.toSeq
      else args.toSeq.flatMap(n => SparkEntry.queries.get(n).map(n -> _))
    val runStart = System.nanoTime()
    val microSamples = scala.collection.mutable.ArrayBuffer.empty[Double]
    val results = selected.zipWithIndex.map { case ((name, fn), i) =>
      if (i > 0 && i % microCalEvery == 0) {
        System.gc() // samples must measure HOST load, not the prior queries' heap
        // debt (never called inside a timed query region)
        // min-of-3: a single ~0.25 s job's seconds vary ~1.5× from scheduler noise
        // alone; the min discards transient hiccups while a REAL load window covers
        // all three runs and still inflates it
        val m = (1 to 3).map(_ => microCalibrate(spark)).min
        microSamples += m
        System.err.println(
          "[bench] micro-cal %.3f raw at t+%.1fs (before query %d)".formatLocal(
            java.util.Locale.ROOT, m, (System.nanoTime() - runStart) / 1e9, i))
      }
      System.err.println("[bench] t+%.1fs start %s".formatLocal(
        java.util.Locale.ROOT, (System.nanoTime() - runStart) / 1e9, name))
      val t0 = System.nanoTime()
      // noop sink materializes EVERY column — under .count() Catalyst prunes unused
      // columns and map-only queries would be timed as little more than a scan
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      // drop checkpoint/cache blocks between queries: every query builds its own
      // stores, and eager localCheckpoints would otherwise accumulate in storage
      // memory across the 100-query run
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      // (measured: a System.gc() here tightens the per-query max by moving major
      // collections out of timed regions, but raises the TOTAL ~10% — rejected)
      (name, sec, ok)
    }
    val secByName = results.map { case (k, v, _) => k -> v }.toMap
    // every failure is always reported, even off-headline
    val failed = results.filterNot(_._3).map(_._1)
    // total counts SUCCESSFUL queries only — a query that dies in 10 ms must read as a
    // failure, not as a speedup
    val total = results.collect { case (_, v, true) => v }.sum
    // second calibration sample AFTER the last query: brackets the run, so mid-run
    // load arrival (which a start-only sample misses) shows up in at least one
    val calEnd = calibrate(spark)
    // lower-median normalization (index (n-1)/2): with few samples the max must not
    // normalize against itself or a 2-sample run's spike would read as clean
    val microScaled =
      if (microSamples.isEmpty) Nil
      else {
        val med = microSamples.sorted.apply((microSamples.size - 1) / 2)
        microSamples.map(_ * cal / math.max(med, 1e-9)).toSeq
      }
    val calMax = (Seq(cal, calEnd) ++ microScaled).max
    val line = renderLine(total, cal, calEnd, calMax, results.size, secByName, failed, sfDir)
    // stop Spark BEFORE emitting: shutdown logging must not land after the JSON
    // line, which has to sit at the very end of the captured output tail
    spark.stop()
    if (line.length > 1800)
      System.err.println(s"[bench] WARNING: JSON line ${line.length} chars may exceed the captured tail")
    println(line)
  }
}
