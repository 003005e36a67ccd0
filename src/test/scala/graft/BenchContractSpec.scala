package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench emission contract the driver depends on: the JSON line must survive the
  * driver's ~2000-char output-tail capture (head-truncation made r1–r4's numbers
  * unparseable), and — since r11 — the end-of-run outlier re-run must catch the
  * sub-cadence contamination pattern that r10 proved cal_max alone cannot see.
  * Pure string/logic checks — no Spark session.
  */
class BenchContractSpec extends AnyFunSuite {

  test("every headline name is a real query, with no duplicates") {
    val unknown = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty, s"headline references unknown queries: ${unknown.mkString(", ")}")
    assert(Bench.headline.distinct.size == Bench.headline.size, "duplicate headline entries")
  }

  test("worst-case headline JSON stays well inside the driver's captured tail") {
    // the REAL line constructor with every value at its widest realistic formatting
    // (4 integer digits + 3 decimals); failures list empty — a failure replaces a
    // success entry at comparable width and failures are a bug anyway. reran at its
    // widest: EVERY headline query flagged, so the cap + "+N" marker must hold the
    // line. The overflow marker renders the count, so the worst case is the cap's
    // longest names plus the widest count. secByName carries EVERY registered
    // query (what main passes), not just the headline — `fam` renders a maximum
    // for every family in the suite, and a headline-only map understates the
    // line by the non-headline families' ~55 chars (the r13 review catch).
    val line = Bench.renderLine(
      total = 99999.999, cal = 9999.999, calEnd = 9999.999, calMax = 9999.999,
      n = SparkEntry.queries.size,
      secByName = SparkEntry.queries.keysIterator.map(_ -> 9999.999).toMap,
      failed = Nil, reran = Bench.headline.sortBy(-_.length),
      sfDir = "/root/testdata/sf0.1", capped = 99)
    assert(line.length <= 1700,
      s"worst-case bench line is ${line.length} chars (cap 1700 for tail-capture " +
        "headroom) — rotate fast queries out of Bench.headline before adding more")
  }

  test("the line carries both host-load calibration fields (run start and end)") {
    // r6's driver run read untouched queries 3-5x slower from box contention alone;
    // "cal" (a fixed synthetic workload's seconds) is what lets a cross-round
    // comparison normalize for host load before calling anything a regression.
    // r7 showed a start-only sample misses load arriving mid-run, so the same
    // workload is re-timed after the last query as "cal_end": a comparison rejects
    // runs where either sample reads contended.
    val line = Bench.renderLine(10.0, 1.234, 2.345, 3.456, 2,
      Map("q01_pricing_summary" -> 5.0), Nil, Nil, "/root/testdata/sf0.1")
    assert(line.contains("\"cal\":1.234"), line)
    assert(line.contains("\"cal_end\":2.345"), line)
    assert(line.indexOf("\"cal\":") < line.indexOf("\"queries\":") &&
      line.indexOf("\"cal_end\":") < line.indexOf("\"queries\":"),
      "both cal fields must sit in the fixed head of the line, before the variable-width map")
  }

  test("the line carries cal_max — the worst calibration sample seen anywhere in the run") {
    // r9: BOTH bracket samples read clean (0.988 / 1.019) around a mid-run load
    // window that inflated ten queries 2-6x — the third consecutive driver bench
    // invalidated by contention the bracket could not see. cal_max folds in the
    // micro-calibrations interleaved every ~15 queries (scaled to full-cal units),
    // so a contaminated run self-identifies from the JSON line alone — when the
    // window spans a sample point; shorter windows are the re-run's job (below).
    val line = Bench.renderLine(10.0, 0.988, 1.019, 4.321, 2,
      Map("q01_pricing_summary" -> 5.0), Nil, Nil, "/root/testdata/sf0.1")
    assert(line.contains("\"cal_max\":4.321"), line)
    assert(line.indexOf("\"cal_max\":") < line.indexOf("\"queries\":"),
      "cal_max must sit in the fixed head of the line, before the variable-width map")
    assert(Bench.microCalEvery > 0 && Bench.microCalEvery <= 20,
      "interleave cadence must actually sample inside a ~160-query run")
  }

  test("the line carries the reran list, capped with an overflow marker") {
    val line = Bench.renderLine(10.0, 0.8, 0.8, 1.1, 2,
      Map("q01_pricing_summary" -> 5.0), Nil,
      Seq("a_q", "b_q", "c_q", "d_q", "e_q", "f_q"), "/root/testdata/sf0.1")
    assert(line.contains("\"reran\":[\"a_q\",\"b_q\",\"c_q\",\"d_q\",\"+2\"]"), line)
    val clean = Bench.renderLine(10.0, 0.8, 0.8, 1.1, 2,
      Map("q01_pricing_summary" -> 5.0), Nil, Nil, "/root/testdata/sf0.1")
    assert(clean.contains("\"reran\":[]"), clean)
  }

  test("the line carries per-family maxima over every query run, not just the headline") {
    // the r12 schema concern: rotation was eating per-query visibility as the
    // suite grew — `fam` keeps each family's WORST cost reporting every round
    val line = Bench.renderLine(10.0, 0.8, 0.8, 1.1, 4,
      Map("q01_pricing_summary" -> 5.0, "dc09_epoch_pack" -> 7.25,
        "dc03_corpus_churn" -> 1.5, "ev2_sessionize" -> 2.0), Nil, Nil, "/root/testdata/sf0.1")
    assert(line.contains("\"fam\":{\"dc\":7.250,\"ev\":2.000,\"q\":5.000}"), line)
    // family ids must never collide with query-name parsing in benchHistory
    assert(Bench.familyOf("dc09_epoch_pack") == "dc" && Bench.familyOf("ev2_sessionize") == "ev"
      && Bench.familyOf("g01_lww_snapshot") == "g")
  }

  test("benchHistory reads the committed BENCH_r*.json lines from the repo root") {
    // the bench runs with cwd = repo root, where the driver commits each round's
    // line; this test reads the REAL files so a format drift in what the driver
    // writes breaks loudly here, not silently in flagOutliers
    val hist = Bench.benchHistory(new java.io.File("."), SparkEntry.queries.keySet)
    assert(hist.nonEmpty, "no BENCH_r*.json history parsed from the repo root")
    // s17 has been in the headline since r7 — multiple rounds of history expected
    assert(hist.get("s17_hybrid_rrf").exists(_.size >= 2), hist.get("s17_hybrid_rrf").toString)
    // metric/cal/total fields must NOT leak in as phantom queries
    assert(!hist.contains("cal") && !hist.contains("value") && !hist.contains("total"))
  }

  test("a failed query's death time never enters history (it would poison min-of-history)") {
    // a 12 ms crash recorded as a 'time' would make every later healthy run read
    // as a ~500x outlier and crowd real contamination out of the capped re-runs
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-hist").toFile
    val line = """{"metric":"total","value":9.9,"unit":"sec","cal":0.8,""" +
      """"queries":{"t25_bpe_encode":0.012,"g17_pagerank":1.3},""" +
      """"failed":["t25_bpe_encode"],"sf":"x"}"""
    val fw = new java.io.FileWriter(new java.io.File(dir, "BENCH_r99.json"))
    try fw.write("{\n \"tail\": \"" + line.replace("\"", "\\\"") + "\"\n}") finally fw.close()
    val hist = Bench.benchHistory(dir, Set("t25_bpe_encode", "g17_pagerank"))
    assert(!hist.contains("t25_bpe_encode"), hist.toString)
    assert(hist.get("g17_pagerank").contains(Seq(1.3)), hist.toString)
  }

  test("BENCH_SEED.json gives non-headline composites history: honest costs stop burning re-runs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-seed").toFile
    val seed = """{"metric":"seed","queries":{"dc15_epoch_anneal":5.693}}"""
    val fw = new java.io.FileWriter(new java.io.File(dir, "BENCH_SEED.json"))
    try fw.write(seed) finally fw.close()
    val hist = Bench.benchHistory(dir, Set("dc15_epoch_anneal"))
    assert(hist.get("dc15_epoch_anneal").contains(Seq(5.693)), hist.toString)
    // the literal r13 clean-run regime: a 5.7 s honest composite against a
    // ~1.4 s run median. Unseeded, the no-history rule (3x median) flags it
    // every round; seeded, the 1.6x-of-min rule leaves it alone
    val sec = Map("dc15_epoch_anneal" -> 5.701)
    val (unseeded, _) = Bench.flagOutliers(sec, Map.empty, runMedian = 1.4)
    assert(unseeded == Seq("dc15_epoch_anneal"), unseeded.toString)
    val (seeded, _) = Bench.flagOutliers(sec, hist, runMedian = 1.4)
    assert(seeded.isEmpty, seeded.toString)
    // a genuinely contaminated run still heals: 3x the seeded cost flags
    val (contaminated, _) =
      Bench.flagOutliers(Map("dc15_epoch_anneal" -> 17.0), hist, runMedian = 1.4)
    assert(contaminated == Seq("dc15_epoch_anneal"), contaminated.toString)
  }

  test("an adjudicated seed floor discards lucky driver-line readings below it (r17 raise)") {
    // the dc20/t25 pattern: one best-ever line reading 1.5-2x under the honest
    // idle spread, locked in by the min ratchet, flags every honest run; the
    // adjudication RAISES the seed floor, and history readings below the
    // adjudicated value must not resurrect the stale minimum
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-adj").toFile
    val line = """{"metric":"total","queries":{"t25_bpe_encode":1.103,"g17_pagerank":1.2},"failed":[],"sf":"x"}"""
    val fw1 = new java.io.FileWriter(new java.io.File(dir, "BENCH_r98.json"))
    try fw1.write("{\n \"tail\": \"" + line.replace("\"", "\\\"") + "\"\n}") finally fw1.close()
    val fw2 = new java.io.FileWriter(new java.io.File(dir, "BENCH_SEED.json"))
    try fw2.write("""{"metric":"seed","queries":{"t25_bpe_encode":2.044}}""") finally fw2.close()
    val hist = Bench.benchHistory(dir, Set("t25_bpe_encode", "g17_pagerank"))
    assert(hist("t25_bpe_encode").min == 2.044, hist.toString)
    // readings ABOVE the seed survive as spread evidence; uncovered queries keep
    // raw line history
    assert(hist("g17_pagerank") == Seq(1.2), hist.toString)
    // an honest 2.0-2.6 s run no longer burns a re-run slot...
    val (clean, _) = Bench.flagOutliers(Map("t25_bpe_encode" -> 2.566), hist, runMedian = 1.4)
    assert(clean.isEmpty, clean.toString)
    // ...and real contamination still flags against the adjudicated floor
    val (dirty, _) = Bench.flagOutliers(Map("t25_bpe_encode" -> 6.398), hist, runMedian = 1.4)
    assert(dirty == Seq("t25_bpe_encode"), dirty.toString)
  }

  test("the r10 contamination pattern is flagged and corrected by the end-of-run re-run") {
    // The literal BENCH_r10 failure: cal_max 1.395 read under the ~2 reject line,
    // yet these six queries were 2.5-4x their clean cost (judge idle numbers in
    // VERDICT r10). History here is the REAL committed BENCH_r*.json series —
    // the exact data the production path consults.
    val hist = Bench.benchHistory(new java.io.File("."), SparkEntry.queries.keySet)
    val r10 = Map(
      "s17_hybrid_rrf" -> 19.862, "s18_hybrid_rrf_capped" -> 15.291,
      "g20_metadata_registers" -> 11.804, "t25_bpe_encode" -> 6.398,
      "s11_ann_rerank" -> 3.772,
      // controls that must NOT be flagged (clean in r10 and near history)
      "g17_pagerank" -> 1.294, "d05_dedup_clusters" -> 3.227, "s15_pq_search" -> 1.367)
    val (flagged, _) = Bench.flagOutliers(r10, hist, runMedian = 1.2)
    val mustFlag = Seq("s17_hybrid_rrf", "s18_hybrid_rrf_capped", "g20_metadata_registers", "t25_bpe_encode")
    mustFlag.foreach(q => assert(flagged.contains(q), s"$q not flagged; flagged=$flagged hist=${hist.get(q)}"))
    Seq("g17_pagerank", "d05_dedup_clusters", "s15_pq_search").foreach(q =>
      assert(!flagged.contains(q), s"control $q wrongly flagged (hist ${hist.get(q)})"))
    // ...and the correction: a fake "idle box" re-runner returning the judge's
    // clean measurements collapses the inflated entries to clean min-of-two
    val idle = Map("s17_hybrid_rrf" -> 5.34, "s18_hybrid_rrf_capped" -> 3.75,
      "g20_metadata_registers" -> 3.00, "t25_bpe_encode" -> 2.39, "s11_ann_rerank" -> 0.82)
    val (corrected, reran) = Bench.rerunOutliers(flagged, r10, n => idle.get(n))
    mustFlag.foreach { q =>
      assert(corrected(q) == idle(q), s"$q not corrected: ${corrected(q)}")
      assert(reran.contains(q))
    }
    assert(corrected("g17_pagerank") == 1.294, "untouched query must keep its first-run time")
  }

  test("a query new this round (no history) earns a confirming re-run only when far above the run median") {
    // r10's s23/s24 were new AND inflated — unadjudicable without a manual re-run.
    // The no-history rule buys each expensive new query one confirming re-run in
    // its first round; a genuinely slow one stays slow on the re-run (min is a
    // no-op) and has history from then on.
    // an empty history stands in for "first round this query exists"; headline
    // names because only headline queries are re-run candidates
    val sec = Map("s23_ivf_pq_trained" -> 11.4, "g17_pagerank" -> 1.0)
    val (flagged, _) = Bench.flagOutliers(sec, hist = Map.empty, runMedian = 1.2)
    assert(flagged == Seq("s23_ivf_pq_trained"), flagged)
    // genuinely-slow confirmation: re-run returns a similar time, min keeps it slow
    val (corrected, _) = Bench.rerunOutliers(flagged, sec, _ => Some(11.1))
    assert(corrected("s23_ivf_pq_trained") == 11.1)
  }

  test("non-headline contamination heals the TOTAL (the r11 residual gap)") {
    // BENCH_r11 self-healed its 9 headline outliers but reported value=324.1 s
    // against a ~243 s clean run: the ~80 s excess sat in non-headline first-run
    // seconds that the headline-only flagOutliers never examined. Replay that
    // regime: a contamination window inflates a handful of NON-headline queries
    // (never rendered into bench-line history, so only the no-history 3x-median
    // rule can catch them) while the suite median stays clean.
    val clean = Map(
      "g17_pagerank" -> 1.3, "d05_dedup_clusters" -> 3.2, "s15_pq_search" -> 1.4,
      "ev4_props_extract" -> 0.9, "t02_quality_score" -> 0.6, "sk02_countmin" -> 0.7)
    // window hits four non-headline queries (t25-style 5-10x inflation)
    val inflated = Map(
      "ev5_hourly_top_users" -> 9.8, "t11_vocabulary" -> 6.4,
      "sk06_kmv_quantiles" -> 5.2, "d07_boilerplate" -> 4.9)
    val idleCost = Map( // judge-idle clean costs for the inflated four
      "ev5_hourly_top_users" -> 1.1, "t11_vocabulary" -> 0.8,
      "sk06_kmv_quantiles" -> 0.9, "d07_boilerplate" -> 0.7)
    val sec = clean ++ inflated
    val names = sec.keySet
    assert(names.forall(SparkEntry.queries.contains), "test must use real query names")
    assert(inflated.keys.forall(n => !Bench.headline.contains(n)),
      "the contaminated queries must be NON-headline names")
    val (flagged, _) = Bench.flagOutliers(sec, hist = Map.empty, runMedian = 1.2)
    inflated.keys.foreach(q => assert(flagged.contains(q), s"$q not flagged; flagged=$flagged"))
    clean.keys.foreach(q => assert(!flagged.contains(q), s"control $q wrongly flagged"))
    val (corrected, reran) = Bench.rerunOutliers(flagged, sec, n => idleCost.get(n))
    assert(reran.toSet == inflated.keySet)
    val totalBefore = sec.values.sum
    val totalAfter = names.toSeq.map(corrected).sum
    val totalClean = (clean ++ idleCost).values.sum
    assert(totalAfter == totalClean, s"total must converge to clean: $totalBefore -> $totalAfter vs $totalClean")
  }

  test("the re-run volume is capped and ranked worst-absolute-excess-first") {
    // a globally-contaminated run (which cal/cal_end already reject) must not
    // double the run through re-runs
    val hist = Bench.headline.map(_ -> Seq(1.0)).toMap
    val sec = Bench.headline.zipWithIndex.map { case (n, i) => n -> (3.0 + i) }.toMap
    val (flagged, cappedOut) = Bench.flagOutliers(sec, hist, runMedian = 1.0)
    assert(flagged.size == 12, s"cap must bind: ${flagged.size}")
    // worst excess = largest seconds here (uniform history); the cap keeps those
    val worst = sec.toSeq.sortBy(-_._2).take(12).map(_._1).toSet
    assert(flagged.toSet == worst)
    // everything flagged-but-capped-out is reported, never silently dropped
    assert(cappedOut.size == sec.size - 12, s"capped-out tail wrong: ${cappedOut.size}")
    assert(flagged.toSet.intersect(cappedOut.toSet).isEmpty)
  }

  test("the r12 cap-binding regime: absolute-excess ranking keeps the biggest offenders") {
    // The literal BENCH_r12 failure: the cap bound for the first time and
    // RATIO-ranking gave all 12 slots to high-ratio cheap queries, letting the
    // two largest ABSOLUTE offenders keep their contaminated seconds in the
    // reported map — s18 11.80 s vs hist-min 3.5 (ratio 3.4, excess +8.3) and
    // d18 9.31 s vs hist-min 2.3 (ratio 4.0, excess +7.0); judge idle re-price
    // 3.29 / 2.04. Replay: 13 cheap queries inflate 9x (0.3 -> 2.7, excess a
    // mere +2.4 each) alongside the two heavies — excess ranking must hand s18
    // and d18 slots ahead of every cheap one.
    val cheap = Seq("ev3_hourly_rollup", "m01_media_features", "o02_hilbert",
      "sk09_moments", "t01_lang_id", "t13_chunk", "q01_pricing_summary",
      "ev8_asof_join", "o01_zorder", "s01_ann_bruteforce", "t06_corpus_stats",
      "g06_reciprocal", "g33_hits")
    assert(cheap.forall(SparkEntry.queries.contains), "replay must use real query names")
    val hist = (cheap.map(_ -> Seq(0.3)) ++
      Seq("s18_hybrid_rrf_capped" -> Seq(3.5), "d18_dedup_saved_index" -> Seq(2.3))).toMap
    val sec = (cheap.map(_ -> 2.7) ++
      Seq("s18_hybrid_rrf_capped" -> 11.80, "d18_dedup_saved_index" -> 9.31)).toMap
    val (flagged, cappedOut) = Bench.flagOutliers(sec, hist, runMedian = 1.2)
    assert(flagged.contains("s18_hybrid_rrf_capped") && flagged.contains("d18_dedup_saved_index"),
      s"the biggest absolute offenders must win capped slots: $flagged")
    // and they rank FIRST — the slots heal the most seconds available
    assert(flagged.take(2).toSet == Set("s18_hybrid_rrf_capped", "d18_dedup_saved_index"), flagged)
    assert(flagged.size == 12 && cappedOut.size == 3, s"cap 12 of 15: $flagged / $cappedOut")
    // the emitted line surfaces the unadjudicated tail
    val line = Bench.renderLine(10.0, 0.8, 0.8, 1.1, 2,
      Map("q01_pricing_summary" -> 5.0), Nil, flagged, "/root/testdata/sf0.1",
      capped = cappedOut.size)
    assert(line.contains("\"capped\":3"), line)
    val clean = Bench.renderLine(10.0, 0.8, 0.8, 1.1, 2,
      Map("q01_pricing_summary" -> 5.0), Nil, Nil, "/root/testdata/sf0.1")
    assert(clean.contains("\"capped\":0"), clean)
  }
}
