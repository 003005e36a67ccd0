package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Curation, Similarity}

/** Planted-input mirrors for the round-11 operators: the oracle gate proves
  * cross-engine equality at scale; these prove the SEMANTICS on inputs small
  * enough to hand-compute (the independent-mirror discipline).
  */
class RoundElevenOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Independent JVM-side mirror of the t02 quality micro score. */
  private def qualityMicroOf(text: String): Long = {
    def occ(needle: String): Int =
      text.sliding(needle.length).count(_ == needle)
    val nt = text.count(_ == ' ') + 1
    val stops = occ(" the ") + occ(" a ") + occ(" of ") + occ(" and ")
    math.floor(1e6 * (stops.toDouble / nt + nt.toDouble / text.length * 10.0) + 0.5).toLong
  }

  private val corpus = Seq(
    // srcA: docs 1 and 2 are byte-identical (a near-dup cluster; 1 is the min-id
    // keeper, 2 the dup), doc 3 unique
    (1L, "alpha the beta gamma the delta epsilon zeta", "srcA"),
    (2L, "alpha the beta gamma the delta epsilon zeta", "srcA"),
    (3L, "unique walrus text with several plain tokens here", "srcA"),
    // srcB: two unique docs
    (4L, "another document about nothing in particular today", "srcB"),
    (5L, "final entry of the tiny corpus for testing", "srcB"))

  test("dc01: planted dup counts, token shares, and mean quality match the hand mirror") {
    val docs = corpus.toDF("doc_id", "text", "source")
    val out = Curation.domainStats(docs, "doc_id", "text", "source")
      .collect().map(r => r.getAs[String]("source") -> r).toMap

    val toks = corpus.map { case (_, t, s) => s -> (t.count(_ == ' ') + 1).toLong }
    val tokA = toks.filter(_._1 == "srcA").map(_._2).sum
    val tokB = toks.filter(_._1 == "srcB").map(_._2).sum
    val a = out("srcA"); val b = out("srcB")
    assert(a.getAs[Long]("n_docs") == 3L && b.getAs[Long]("n_docs") == 2L)
    assert(a.getAs[Long]("n_tokens") == tokA && b.getAs[Long]("n_tokens") == tokB)
    // doc 2 is the only non-keeper cluster member in the corpus
    assert(a.getAs[Long]("n_dup_docs") == 1L && b.getAs[Long]("n_dup_docs") == 0L)
    assert(a.getAs[Long]("dup_rate_micro") == math.floor(1e6 / 3.0 + 0.5).toLong)
    val shareA = math.floor(1e6 * tokA.toDouble / (tokA + tokB) + 0.5).toLong
    assert(a.getAs[Long]("token_share_micro") == shareA, a.toString)
    val qA = corpus.filter(_._3 == "srcA").map(c => qualityMicroOf(c._2))
    assert(a.getAs[Long]("mean_quality_micro") == math.floor(qA.sum.toDouble / qA.size + 0.5).toLong)
  }

  test("dc02: per-source cap keeps the k BEST by quality with deterministic ranks") {
    val docs = corpus.toDF("doc_id", "text", "source")
    val kept = Curation.qualityCap(docs, "doc_id", "text", "source", k = 2)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("quality_micro"), r.getAs[Int]("rk")))
    assert(kept.count(_._1 == "srcA") == 2 && kept.count(_._1 == "srcB") == 2)
    // independent mirror: expected survivors = top-2 by (quality desc, id asc)
    for (src <- Seq("srcA", "srcB")) {
      val expect = corpus.filter(_._3 == src)
        .map(c => (c._1, qualityMicroOf(c._2)))
        .sortBy { case (id, q) => (-q, id) }.take(2)
      val got = kept.filter(_._1 == src).sortBy(_._4).map(r => (r._2, r._3))
      assert(got.toSeq == expect, s"$src: got ${got.toSeq}, expected $expect")
    }
  }

  test("dc03: planted appeared/vanished/flat statuses with drift KL on one relation") {
    // cut at 100: srcV exists only early, srcN only late, srcF holds its share
    val docs = Seq(
      (1L, "vanishing source early text one", "srcV"),
      (2L, "vanishing source early text two", "srcV"),
      (10L, "steady source early alpha beta", "srcF"),
      (11L, "steady source early gamma delta", "srcF"),
      (101L, "brand new source late text one", "srcN"),
      (102L, "brand new source late text two", "srcN"),
      (110L, "steady source late epsilon zeta", "srcF"),
      (111L, "steady source late eta theta", "srcF")
    ).toDF("doc_id", "text", "source")
    val out = Curation.corpusChurn(docs, "doc_id", "text", "source", cutId = 100L)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("srcV").getAs[String]("status") == "vanished")
    assert(out("srcN").getAs[String]("status") == "appeared")
    assert(out("srcF").getAs[String]("status") == "flat")
    // srcF: 2 of 4 docs on each side — shares 500000/500000, delta 0
    assert(out("srcF").getAs[Long]("share_early_micro") == 500000L)
    assert(out("srcF").getAs[Long]("delta_share_micro") == 0L)
    assert(out("srcV").getAs[Long]("delta_share_micro") == -500000L)
    // the generator-change axis rides along for every source (t35's KL)
    assert(out.values.forall(r => !r.isNullAt(r.fieldIndex("kl_micro_nats"))))
  }

  test("s25: new vectors census against a SAVED codebook; starved cells report zero") {
    // two well-separated 4-dim clusters seeded by the two lowest train ids
    val train = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0.9f, 0.1f, 0f, 0f)), (4L, Array(0.1f, 0.9f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val fresh = Seq(
      (11L, Array(0.95f, 0.05f, 0f, 0f)), (12L, Array(0.8f, 0.2f, 0f, 0f)),
      (13L, Array(0.99f, 0.01f, 0f, 0f)), (14L, Array(0.05f, 0.95f, 0f, 0f)),
      (15L, Array(0f, 0f, 0f, 0f)) // zero vector: no cosine, must be excluded
    ).toDF("vec_id", "embedding")

    val scratch = java.nio.file.Files.createTempDirectory("graft-assign-test")
    val model = Similarity.kmeansRounds(train, "vec_id", "embedding", k = 2, dims = 4, rounds = 1)
    Similarity.saveCentroids(model, scratch.toString + "/m")
    val loaded = Similarity.loadCentroids(spark, scratch.toString + "/m")
    val out = Similarity.ivfAssignNew(fresh, "vec_id", "embedding", loaded)
      .collect().map(r => r.getAs[Long]("cluster") -> r).toMap

    // clusters keyed by seed ids 1 and 2; each trained 2 members (persisted through
    // the artifact); A-side gets 3 arrivals, B-side 1; the zero vector vanishes
    assert(out.keySet == Set(1L, 2L))
    assert(out.values.map(_.getAs[Long]("n_trained")).toSeq.sorted == Seq(2L, 2L))
    assert(out(1L).getAs[Long]("n_new") == 3L && out(2L).getAs[Long]("n_new") == 1L)
    assert(out(1L).getAs[Long]("growth_micro") == 1500000L)
    assert(out(1L).getAs[Long]("share_new_micro") == 750000L)
    assert(out(2L).getAs[Long]("share_new_micro") == 250000L)
  }

  test("d17/d18: an ingest batch probes the existing index; copies collide on every band") {
    import graft.pipeline.Dedup
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "old"),
      (2L, "completely different existing content with its own words", "old"),
      (101L, "the quick brown fox jumps over the lazy dog again and again", "new"), // copy of 1
      (102L, "fresh novel text sharing nothing with the archive", "new")
    ).toDF("doc_id", "text", "source")

    val out = Dedup.incrementalDedup(docs, "doc_id", "text", cutId = 100L).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("dup_of"), r.getAs[Long]("n_bands")))).toMap
    // the byte-identical arrival collides with doc 1 on ALL 16 bands; the novel
    // doc must not appear at all (no collision row, not a zero row)
    assert(out.get(101L).contains((1L, 16L)), out.toString)
    assert(!out.contains(102L) && !out.contains(1L) && !out.contains(2L), out.toString)

    // the persisted-index round trip reproduces the in-session probe exactly
    val scratch = java.nio.file.Files.createTempDirectory("graft-d18-test")
    Dedup.saveDedupIndex(
      Dedup.dedupIndex(docs.filter(col("doc_id") < 100L), "doc_id", "text"),
      scratch.toString + "/idx")
    val loaded = Dedup.loadDedupIndex(spark, scratch.toString + "/idx")
    val out2 = Dedup.incrementalDedupAgainst(
        Dedup.dedupIndex(docs.filter(col("doc_id") >= 100L), "doc_id", "text"), "doc_id", loaded)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("dup_of"), r.getAs[Long]("n_bands")))).toMap
    assert(out2 == out)
  }

  test("dc04: budgets are exact integer splits and verdicts follow the temperature direction") {
    import graft.pipeline.Sampling
    // srcBig 8 docs, srcSmall 2 — α<1 upweights the small source
    val docs = ((1L to 8L).map(i => (i, s"doc $i text", "srcBig")) ++
      Seq((9L, "doc 9 text", "srcSmall"), (10L, "doc 10 text", "srcSmall")))
      .toDF("doc_id", "text", "source")
    val out = Sampling.mixPlan(docs, "source", alphaMicro = 300000L, budgetDocs = 100L)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val big = out("srcBig"); val small = out("srcSmall")
    // independent mirror of the exact integer arithmetic
    def wMicro(n: Long, tot: Long): Long =
      math.floor(1e6 * math.pow(n.toDouble / tot, 0.3) + 0.5).toLong
    val (wb, ws) = (wMicro(8, 10), wMicro(2, 10))
    assert(big.getAs[Long]("target_docs") == wb * 100L / (wb + ws))
    assert(small.getAs[Long]("target_docs") == ws * 100L / (wb + ws))
    assert(big.getAs[Long]("prop_docs") == 80L && small.getAs[Long]("prop_docs") == 20L)
    assert(big.getAs[String]("verdict") == "downsample")
    assert(small.getAs[String]("verdict") == "upsample")
  }

  test("retrainTrigger: hot cell, starved majority, and balanced cases") {
    def growth(rows: Seq[(Long, Long, Long)]): org.apache.spark.sql.DataFrame =
      rows.toDF("cluster", "n_new", "share_new_micro")

    // hot: one of 8 cells draws 60% of new mass (uniform share = 12.5%)
    val hot = growth((1L, 60L, 600000L) +: (2L to 8L).map(c => (c, 8L, 57143L)))
    val hd = Similarity.retrainTrigger(hot)
    assert(hd.retrain && hd.reason.startsWith("hot cell"), hd.toString)

    // starved: 5 of 8 cells get nothing, but no single cell is hot
    val starved = growth(Seq((1L, 5L, 333333L), (2L, 5L, 333333L), (3L, 5L, 333334L)) ++
      (4L to 8L).map(c => (c, 0L, 0L)))
    val sd = Similarity.retrainTrigger(starved)
    assert(sd.retrain && sd.reason.startsWith("starved"), sd.toString)

    // balanced: uniform-ish arrivals — keep serving the frozen codebook
    val ok = growth((1L to 8L).map(c => (c, 10L, 125000L)))
    val od = Similarity.retrainTrigger(ok)
    assert(!od.retrain && od.reason == "balanced", od.toString)

    // a quiet cadence window (zero arrivals anywhere) is no evidence, never a
    // retrain — an idle scheduler must not churn the codebook
    val idle = growth((1L to 8L).map(c => (c, 0L, 0L)))
    val id = Similarity.retrainTrigger(idle)
    assert(!id.retrain && id.reason.startsWith("no new arrivals"), id.toString)

    // EXACTLY half starved is not a majority — must not trip the starved rule
    val half = growth((1L to 4L).map(c => (c, 10L, 250000L)) ++ (5L to 8L).map(c => (c, 0L, 0L)))
    val hf = Similarity.retrainTrigger(half)
    assert(!hf.retrain, hf.toString)
  }
}
