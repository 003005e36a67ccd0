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

  test("d19: a training doc quoting the benchmark verbatim is flagged; clean docs never appear") {
    import graft.pipeline.Dedup
    // ids 10 and 20 are the benchmark split (id % 10 == 0); doc 1 embeds doc 10's
    // full text (so all 4 of doc 10's distinct word 5-grams collide), doc 2 is clean
    val docs = Seq(
      (10L, "the secret benchmark answer is forty two exactly"),
      (20L, "another eval question entirely different from others here"),
      (1L, "intro words then the secret benchmark answer is forty two exactly closing remark"),
      (2L, "nothing shared here at all with anything else whatsoever")
    ).toDF("doc_id", "text")
    val out = Dedup.benchmarkDecontaminate(docs, "doc_id", "text").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(1L), out.mkString("; "))
    val r = out.head
    // doc 1: 13 tokens -> 9 distinct 5-grams, of which the 4 spanning the quoted
    // benchmark sentence hit; fraction = floor(1e6 * 4/9 + 0.5)
    assert(r.getAs[Long]("n_shingles") == 9L)
    assert(r.getAs[Long]("n_hits") == 4L)
    assert(r.getAs[Long]("hit_frac_micro") == 444444L)
    assert(r.getAs[Long]("first_bench_id") == 10L)
  }

  test("g47: the distributed Katz rounds match a driver-side exact-integer mirror") {
    import graft.model.State
    import graft.testgraph.TestGraph
    val dir = "/root/testdata/sf0.001"
    val edges = TestGraph.store(spark, dir).snapshot
      .filter(col("graph_id") === 1 && col("state") === State.Normal)
      .select("source_id", "destination_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var x = verts.map(_ -> 1000000L).toMap
    val acc = scala.collection.mutable.Map(verts.map(_ -> 0L): _*)
    for (_ <- 1 to 3) {
      val inSum = edges.groupBy(_._2).map { case (d, es) => d -> es.map(e => x(e._1)).sum }
      x = verts.map(v => v -> Math.floorDiv(inSum.getOrElse(v, 0L) * 50L, 100L)).toMap
      verts.foreach(v => acc(v) += x(v))
    }
    val got = GraphQueries.katzCentrality(spark, dir).collect()
      .map(r => r.getAs[Long]("vertex_id") -> r.getAs[Long]("katz_fp")).toMap
    assert(got == acc.toMap, s"mismatch on ${got.toSet.diff(acc.toSet).take(5)}")
  }

  test("dc05: a narrow source collapses to one cell, a broad source splits — entropy matches ln 2") {
    // centroids = even ids (mod 2): id 2 -> x-axis, id 4 -> y-axis
    val emb = Seq(
      (1L, Array(0.9f, 0.1f, 0f, 0f)), (3L, Array(0.95f, 0.05f, 0f, 0f)),
      (5L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(1f, 0f, 0f, 0f)), (4L, Array(0f, 1f, 0f, 0f)),
      (7L, Array(0.8f, 0.2f, 0f, 0f)), (9L, Array(0.2f, 0.8f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val docs = Seq(
      (1L, "srcNarrow"), (3L, "srcNarrow"), (5L, "srcNarrow"),
      (2L, "srcBroad"), (4L, "srcBroad"), (7L, "srcBroad"), (9L, "srcBroad")
    ).toDF("doc_id", "source")
    val out = Curation.semanticCoverage(docs, emb, "doc_id", "source",
        "vec_id", "embedding", centroidMod = 2)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val narrow = out("srcNarrow"); val broad = out("srcBroad")
    // narrow: all three vectors land in the x-axis cell — zero entropy, full top share
    assert(narrow.getAs[Long]("n_cells") == 1L && narrow.getAs[Long]("n_vecs") == 3L)
    assert(narrow.getAs[Long]("entropy_micro_nats") == 0L)
    assert(narrow.getAs[Long]("top_cell_share_micro") == 1000000L)
    // broad: 2+2 split over both cells — H = ln 2, term-quantized: 2·⌊1e6·½·ln2 + ½⌋
    assert(broad.getAs[Long]("n_cells") == 2L && broad.getAs[Long]("n_vecs") == 4L)
    assert(broad.getAs[Long]("entropy_micro_nats") == 2L * 346574L)
    assert(broad.getAs[Long]("top_cell_share_micro") == 500000L)
  }

  test("dc06: a cross-source clone pairs its sources; a within-source clone never does") {
    val docs = Seq(
      // docs 1 (srcA) and 2 (srcB) byte-identical -> a cross-source cluster
      (1L, "the quick brown fox jumps over the lazy dog again and again", "srcA"),
      (2L, "the quick brown fox jumps over the lazy dog again and again", "srcB"),
      // docs 3 and 4 identical WITHIN srcA -> must produce no pair row
      (3L, "entirely different content that repeats inside one source only here", "srcA"),
      (4L, "entirely different content that repeats inside one source only here", "srcA"),
      (5L, "a unique singleton document belonging to the third source", "srcC")
    ).toDF("doc_id", "text", "source")
    val out = Curation.crossSourceDup(docs, "doc_id", "text", "source").collect()
    assert(out.length == 1, out.mkString("; "))
    val r = out.head
    assert(r.getAs[String]("source_a") == "srcA" && r.getAs[String]("source_b") == "srcB")
    assert(r.getAs[Long]("n_shared_clusters") == 1L)
    assert(r.getAs[Long]("n_docs_a") == 1L && r.getAs[Long]("n_docs_b") == 1L)
  }

  test("g48: distributed bounded Brandes matches a driver-side exact mirror") {
    import graft.model.State
    import graft.testgraph.TestGraph
    val dir = "/root/testdata/sf0.001"
    val edges = TestGraph.store(spark, dir).snapshot
      .filter(col("graph_id") === 1 && col("state") === State.Normal)
      .select("source_id", "destination_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val seeds = verts.filter(_ % 10 == 0)

    val acc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (s <- seeds) {
      // forward: levels with exact path counts
      var visited = Set(s)
      var levels = Vector(Map(s -> 1L))
      for (_ <- 1 to 3) {
        val nxt = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for ((v, sig) <- levels.last; w <- out.getOrElse(v, Set.empty) if !visited.contains(w))
          nxt(w) += sig
        visited ++= nxt.keySet
        levels :+= nxt.toMap
      }
      // backward: micro-quantized dependency fold, deepest level contributes 0
      var delta = Map.empty[Long, Long]
      for (l <- 2 to 1 by -1) {
        val next = levels(l + 1)
        val cur = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for ((v, sv) <- levels(l); w <- out.getOrElse(v, Set.empty) if next.contains(w)) {
          val dw = delta.getOrElse(w, 0L)
          cur(v) += math.floor((sv * (1000000L + dw)).toDouble / next(w).toDouble + 0.5).toLong
        }
        cur.foreach { case (v, d) => acc(v) += d }
        delta = cur.toMap
      }
    }
    val expect = acc.filter(_._2 != 0L).toMap
    val got = GraphQueries.betweennessSampled(spark, dir).collect()
      .map(r => r.getAs[Long]("vertex_id") -> r.getAs[Long]("btw_micro")).toMap
    assert(got == expect, s"diff: ${got.toSet.diff(expect.toSet).take(5)} / ${expect.toSet.diff(got.toSet).take(5)}")
  }

  test("dc08: executes dc04's budgets as hash-order prefixes; growth extends, never reshuffles") {
    import graft.pipeline.Sampling
    def bucketOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % Sampling.Buckets
    }
    // srcBig 8 docs, srcSmall 2 — the dc04 fixture: α=0.3, budget 6
    val docs = ((1L to 8L).map(i => (i, "x", "srcBig")) ++
      Seq((9L, "x", "srcSmall"), (10L, "x", "srcSmall")))
      .toDF("doc_id", "text", "source")
    val out = Sampling.mixExecute(docs, "doc_id", "source",
        alphaMicro = 300000L, budgetDocs = 6L)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Int]("rk")))

    // independent mirror: targets from the exact dc04 integer arithmetic, then
    // each source's (bucket, id)-ordered prefix
    def wMicro(n: Long, tot: Long): Long =
      math.floor(1e6 * math.pow(n.toDouble / tot, 0.3) + 0.5).toLong
    val (wb, ws) = (wMicro(8, 10), wMicro(2, 10))
    val targets = Map(
      "srcBig" -> wb * 6L / (wb + ws), "srcSmall" -> ws * 6L / (wb + ws))
    for (src <- Seq("srcBig", "srcSmall")) {
      val ids = (if (src == "srcBig") 1L to 8L else 9L to 10L)
        .sortBy(id => (bucketOf(id), id))
        .take(targets(src).toInt)
      val got = out.filter(_._1 == src).sortBy(_._3).map(_._2).toSeq
      assert(got == ids, s"$src: $got vs $ids (target ${targets(src)})")
    }
    // determinism under growth: adding docs to srcBig must keep the original
    // prefix ORDER intact (new docs only displace by hash rank, never reshuffle
    // the relative order of survivors)
    val grown = (docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))) ++
      Seq((11L, "x", "srcBig"), (12L, "x", "srcBig")))
      .toSeq.toDF("doc_id", "text", "source")
    val out2 = Sampling.mixExecute(grown, "doc_id", "source",
        alphaMicro = 300000L, budgetDocs = 6L)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Int]("rk")))
    val order1 = out.filter(_._1 == "srcBig").sortBy(_._3).map(_._2).toSeq
    val order2 = out2.filter(_._1 == "srcBig").sortBy(_._3).map(_._2).toSeq
    assert(order1.filter(order2.contains) == order2.filter(order1.contains),
      s"relative order of common survivors changed: $order1 vs $order2")
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
