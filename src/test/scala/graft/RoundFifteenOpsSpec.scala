package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Sampling, Similarity}

/** Round-15 operator pins. The s31 census-routing pair proves the r14 ADVICE
  * fix: a supplied index census replaces the corpus `count()` in the routing
  * decision (equality pin — same rows, same selectivity, same route as the
  * count path), and the routed call performs NO action on the corpus relation
  * at all when both sizes are supplied (poison pin — a corpus whose every
  * executed row throws still builds the routed plan).
  */
class RoundFifteenOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("s31: census-fed routing equals the count()-fed routing row for row") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") % 50 === 0)
    val allowed = e.filter(col("label") % 10 === 0).select(col("vec_id"))
    val cen = Similarity.ivfCellCensus(e, "vec_id", "embedding",
      kCells = 8, dims = 64, trainRounds = 1)
    // the census totals the corpus exactly (every vector is assigned once),
    // so the routing scalar — and therefore the route and every output row —
    // must be identical to the count() fallback's
    def rows(censusOpt: Option[org.apache.spark.sql.DataFrame],
             sizeOpt: Option[Long]) =
      Similarity.filteredTopKAdaptive(q, e, "vec_id", "embedding", k = 5,
        allowed = allowed, selThresholdMicro = 250000L, kCells = 8,
        trainRounds = 1, census = censusOpt, allowedSize = sizeOpt)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
          r.getAs[Int]("rank"), r.getAs[String]("route"),
          r.getAs[Long]("selectivity_micro")))
        .toSet
    val viaCount = rows(None, None)
    val viaCensus = rows(Some(cen), Some(allowed.count()))
    assert(viaCount.nonEmpty && viaCensus == viaCount,
      s"census route diverged: ${viaCensus.diff(viaCount)} vs ${viaCount.diff(viaCensus)}")
  }

  test("s31: with census + allowedSize supplied, routing touches the corpus ZERO times") {
    val boom = udf((x: Long) => {
      throw new RuntimeException("eager action on corpus relation"); x
    })
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val poisoned = e.withColumn("vec_id", boom(col("vec_id")))
    val cen = Seq(500L, 300L, 200L).toDF("n_members") // Σ = 1000-vector census
    // selectivity 10/1000 = 1% → exact route; the call must RETURN (plan
    // construction only — the census aggregate is the only action)
    val out = Similarity.filteredTopKAdaptive(
      poisoned.filter(col("label") % 50 === 0), poisoned, "vec_id", "embedding",
      k = 5, allowed = poisoned.select(col("vec_id")),
      selThresholdMicro = 250000L, kCells = 8, trainRounds = 1,
      census = Some(cen), allowedSize = Some(10L))
    assert(out.columns.contains("route"))
    // guard against a vacuous poison WITHOUT failing a Spark job on the shared
    // session (a failed broadcast thread can bleed into concurrently-running
    // suites): the throwing UDF must sit in the routed plan's lineage — had the
    // routing executed the corpus, the call above would already have thrown
    val analyzed = out.queryExecution.analyzed.toString
    assert(analyzed.toLowerCase.contains("udf"),
      s"poison UDF must be in the routed lineage:\n$analyzed")
  }

  test("d30: a planted 200-token shared span registers once, keeper kept, copy cut") {
    // globally unique fillers so no accidental cross-doc window exists
    val shared = (1 to 200).map(i => s"sh$i").mkString(" ")
    val docA = ((1 to 50).map(i => s"ua$i") :+ shared) ++ (1 to 30).map(i => s"za$i")
    val docB = ((1 to 70).map(i => s"ub$i") :+ shared)
    val docC = (1 to 120).map(i => s"uc$i")
    val docs = Seq(
      (1L, docA.mkString(" ")), (2L, docB.mkString(" ")), (3L, docC.mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.repeatedSpanRegistry(docs, "doc_id", "text",
        windowTokens = 8, minSpanTokens = 16)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_tokens"), r.getAs[Long]("span_h"),
        r.getAs[Long]("n_docs_sharing"), r.getAs[Long]("keep_doc"),
        r.getAs[Int]("cut")))
      .sortBy(r => (r._1, r._2))
    // exactly the planted span, at its 1-based start in each doc, nothing in C
    assert(out.length == 2, s"want the two planted occurrences, got ${out.mkString(", ")}")
    assert(out(0)._1 == 1L && out(0)._2 == 51L && out(0)._3 == 200L)
    assert(out(1)._1 == 2L && out(1)._2 == 71L && out(1)._3 == 200L)
    // one identity shared by both docs; doc 1 is the canonical keeper, doc 2 cut
    assert(out(0)._4 == out(1)._4, "same exact text, same identity")
    assert(out.forall(r => r._5 == 2L && r._6 == 1L))
    assert(out(0)._7 == 0 && out(1)._7 == 1, s"keep first occurrence only: $out")
    // fully disjoint corpus → empty output
    val disjoint = Seq((1L, docC.mkString(" ")), (2L, (1 to 90).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    assert(Dedup.repeatedSpanRegistry(disjoint, "doc_id", "text").isEmpty)
  }

  test("d30: spans shorter than minSpanTokens are dropped, boundary length kept") {
    // a shared run of exactly minSpanTokens tokens must survive; one token
    // shorter must not (the boundary of the length cut)
    def corpus(n: Int) = {
      val shared = (1 to n).map(i => s"s$i").mkString(" ")
      Seq((1L, (1 to 20).map(i => s"a$i").mkString(" ") + " " + shared),
          (2L, (1 to 20).map(i => s"b$i").mkString(" ") + " " + shared))
        .toDF("doc_id", "text")
    }
    val kept = Dedup.repeatedSpanRegistry(corpus(16), "doc_id", "text",
      windowTokens = 8, minSpanTokens = 16).collect()
    assert(kept.length == 2 && kept.forall(_.getAs[Long]("span_tokens") == 16L))
    // exactly one occurrence survives the cut across the whole corpus
    assert(kept.count(_.getAs[Int]("cut") == 0) == 1)
    assert(Dedup.repeatedSpanRegistry(corpus(15), "doc_id", "text",
      windowTokens = 8, minSpanTokens = 16).isEmpty)
  }

  test("d31: a planted paraphrase pair dedups (longest kept); a distinct-topic pair survives") {
    // ids 1,2 seed the two cells (lowest-id k-means seeds): topic A along e1,
    // topic B along e2. 3 and 4 are paraphrases inside topic A (cos ≈ 0.9999);
    // every other within-cell pair sits below the 0.999 threshold
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (4L, Array(0.89f, 0.11f, 0.0f, 0.0f)),
      (5L, Array(0.0f, 0.9f, 0.1f, 0.0f)))
      .toDF("vec_id", "embedding")
    val docs = Seq(
      (1L, "a b c"), (2L, "d e f"),
      (3L, "p q r s t"), (4L, "p q r s t u v w x"), (5L, "g h i"))
      .toDF("doc_id", "text")
    val out = Dedup.semanticDedupClusters(docs, emb, "doc_id", "text",
        "vec_id", "embedding", thresholdMicro = 999000L,
        kCells = 2, dims = 4, trainRounds = 2, rounds = 3)
      .collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        ((r.getAs[Long]("kept_doc"), r.getAs[Long]("kept_tokens"),
          r.getAs[Long]("n_members"), r.getAs[Long]("n_dropped"))))
      .toMap
    // paraphrase pair {3,4} merged, the LONGER member kept; topic pair (2,5)
    // shares a cell but stays apart; singletons pass through
    assert(out == Map(
      1L -> ((1L, 3L, 1L, 0L)),
      2L -> ((2L, 3L, 1L, 0L)),
      3L -> ((4L, 9L, 2L, 1L)),
      5L -> ((5L, 3L, 1L, 0L))), s"got $out")
  }

  test("d32: savings totals are consistent with the d31 manifest") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val manifest = Dedup.semanticDedupClusters(docs, emb, "doc_id", "text",
      "vec_id", "embedding", trainRounds = 1)
    val savings = Dedup.semanticDedupSavings(docs, emb, "doc_id", "text", "source",
      "vec_id", "embedding", trainRounds = 1).collect()
    val keptDocs = savings.map(_.getAs[Long]("n_docs_kept")).sum
    assert(keptDocs == manifest.count(), "Σ per-source kept docs == manifest rows")
    savings.foreach { r =>
      assert(r.getAs[Long]("n_tokens_kept") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_docs_kept") <= r.getAs[Long]("n_docs"))
      val m = r.getAs[Long]("saved_tokens_micro")
      assert(m >= 0L && m <= 1000000L)
    }
  }

  test("s34: layered descent recall@k >= s26's at equal beam width (real embeddings)") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = e.filter(col("vec_id") % 50 === 0)
    val graph = Similarity.knnGraph(e, "vec_id", "embedding", k = 5).localCheckpoint(true)
    val model = Similarity.kmeansRounds(e, "vec_id", "embedding", k = 8, dims = 64, rounds = 1)
    def recallOf(res: Array[(Long, Long)]): Double = {
      val truth = Similarity.bruteForceTopK(queries, e, "vec_id", "embedding", k = 5)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val byQ = res.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recalls = truth.map { case (q, t) =>
        t.count(byQ.getOrElse(q, Set.empty).contains).toDouble / t.size
      }
      recalls.sum / recalls.size
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    val base = recallOf(rows(Similarity.graphAnnSearch(queries, e, "vec_id", "embedding",
      graph, model, k = 5, beam = 8, rounds = 2, entryProbe = 4)))
    val layered = recallOf(rows(Similarity.graphAnnSearchLayered(queries, e, "vec_id", "embedding",
      graph, model, k = 5, beam = 8, rounds = 2, entryProbe = 4,
      layerSizes = Seq(32, 8), layerProbe = 2)))
    assert(layered >= base,
      s"layered recall $layered must not trail the single-layer $base at equal beam")
  }

  test("s34: layer stack is nested md5-order prefixes with fixed sizes") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val model = Similarity.kmeansRounds(e, "vec_id", "embedding", k = 8, dims = 64, rounds = 1)
    val layers = Similarity.graphAnnLayers(e, "vec_id", "embedding", model, Seq(32, 8))
      .collect().map(r => (r.getAs[Int]("layer"), r.getAs[Long]("cand")))
    val l1 = layers.filter(_._1 == 1).map(_._2).toSet
    val l2 = layers.filter(_._1 == 2).map(_._2).toSet
    assert(l1.size == 32 && l2.size == 8, "fixed sizes at any corpus size")
    assert(l2.subsetOf(l1), "upper layer nests inside the lower (HNSW invariant)")
    // independent mirror of the md5-order prefix rule
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = e.select(col("vec_id")).collect().map(_.getLong(0))
      .sortBy(v => (md5hex(v.toString), v)).take(32).toSet
    assert(l1 == want, "layer 1 is exactly the md5-smallest 32 ids")
    // decreasing-size contract enforced
    intercept[IllegalArgumentException] {
      Similarity.graphAnnLayers(e, "vec_id", "embedding", model, Seq(8, 32))
    }
  }

  test("g65: a tie-mislabeled boundary vertex is corrected by the guarded local move") {
    // A = 4-clique {1..4}, B = triangle {10,11,12}, bridge 8 with ONE edge to
    // each side. LPA's tie-break (count desc, LABEL ASC) files 8 under A's
    // lower label even though B's smaller degree mass makes 8∈B the strictly
    // better partition — exactly the boundary case the refinement exists for.
    val cliqueA = for { a <- 1 to 4; b <- (a + 1) to 4 } yield (a.toLong, b.toLong)
    val cliqueB = for { a <- 10 to 12; b <- (a + 1) to 12 } yield (a.toLong, b.toLong)
    val edges = cliqueA ++ cliqueB ++ Seq((1L, 8L), (8L, 10L))
    val und = edges.toDF("lo", "hi")
    val adj = und.select(col("lo").as("src"), col("hi").as("dst"))
      .unionByName(und.select(col("hi").as("src"), col("lo").as("dst")))
    val lpa = GraphQueries.plannedLpa(adj, rounds = 4)
      .select(col("vertex_id").as("v"), col("community"))
    val lpaMap = lpa.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bLabel = lpaMap(10L)
    assert(lpaMap(8L) == lpaMap(1L) && lpaMap(8L) != bLabel,
      s"planted premise: LPA must file the bridge under A, got $lpaMap")
    assert(Set(10L, 11L, 12L).map(lpaMap) == Set(bLabel), "B intact under one label")
    def qSum(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.getAs[Long]("q_part_micro")).sum
    val before = GraphQueries.modularityOf(und, lpa).collect()
    val after = GraphQueries.refineByModularity(und, lpa, refineRounds = 1).collect()
    // the move pass relocates EXACTLY the bridge into B's community…
    val bAfter = after.find(_.getAs[Long]("community") == bLabel).get
    assert(bAfter.getAs[Long]("n_vertices") == 4L, s"bridge joined B: ${after.mkString(", ")}")
    assert(after.map(_.getAs[Long]("n_vertices")).sum == 8L)
    // …and the g46 score strictly improves (the acceptance gate held)
    assert(qSum(after) > qSum(before), s"${qSum(before)} -> ${qSum(after)}")
    // a second round finds no further strict improvement: output identical
    // (the bounded-round early exit is invisible — the g57/g61 discipline)
    val two = GraphQueries.refineByModularity(und, lpa, refineRounds = 2).collect()
    assert(two.map(_.toString).sorted.sameElements(after.map(_.toString).sorted))
  }

  test("g65: monotone law on the real graph — refined Q never trails g46's") {
    def qSum(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getAs[Long]("q_part_micro")).sum
    val base = qSum(GraphQueries.modularity(spark, dir, rounds = 4))
    val refined = qSum(GraphQueries.modularityRefined(spark, dir, lpaRounds = 4, refineRounds = 1))
    assert(refined >= base, s"refined $refined must not trail LPA's $base")
  }

  test("d33: overlapping cut spans are position-set cut, never double-counted; keepers untouched") {
    // doc 3 carries c1..c60; doc 1 = c1..c20 exactly, doc 2 = c17..c50 exactly.
    // Doc 3's two maximal spans [1,20] (shared with 1) and [17,50] (shared
    // with 2) OVERLAP on tokens 17..20; docs 1 and 2 are the min-id keepers of
    // their identities, so doc 3 loses both spans — 50 distinct tokens, not 54
    val c = (1 to 60).map(i => s"c$i")
    val docs = Seq(
      (1L, c.take(20).mkString(" ")),
      (2L, c.slice(16, 50).mkString(" ")),
      (3L, c.mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.repeatedSpanCut(docs, "doc_id", "text",
        windowTokens = 8, minSpanTokens = 16)
      .collect()
    assert(out.length == 1, s"only doc 3 is cut: ${out.mkString(", ")}")
    val r = out.head
    assert(r.getAs[Long]("doc_id") == 3L)
    assert(r.getAs[Long]("n_spans_cut") == 2L)
    assert(r.getAs[Long]("tokens_before") == 60L)
    assert(r.getAs[Long]("tokens_cut") == 50L, s"position-set, not 20+34: $r")
    assert(r.getAs[Long]("tokens_after") == 10L)
    // the rebuilt text is exactly the surviving suffix
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val wantH = java.lang.Long.parseLong(
      md5hex(c.drop(50).mkString(" ")).substring(0, 15), 16)
    assert(r.getAs[Long]("kept_text_h") == wantH)
  }

  test("d33: a fully-cut document reports zero survivors and the empty-string hash") {
    val shared = (1 to 20).map(i => s"f$i")
    val docs = Seq(
      (1L, "u1 u2 u3 " + shared.mkString(" ")), // keeper (min doc)
      (2L, shared.mkString(" ")))               // IS the span — fully cut
      .toDF("doc_id", "text")
    val out = Dedup.repeatedSpanCut(docs, "doc_id", "text",
        windowTokens = 8, minSpanTokens = 16)
      .collect()
    assert(out.length == 1 && out.head.getAs[Long]("doc_id") == 2L)
    assert(out.head.getAs[Long]("tokens_after") == 0L)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.head.getAs[Long]("kept_text_h") ==
      java.lang.Long.parseLong(md5hex("").substring(0, 15), 16))
  }

  test("d34: savings totals are consistent with the d33 manifest on real data") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val cut = Dedup.repeatedSpanCut(docs, "doc_id", "text").collect()
    val savings = Dedup.repeatedSpanSavings(docs, "doc_id", "text", "source").collect()
    assert(savings.map(_.getAs[Long]("n_docs_cut")).sum == cut.length.toLong)
    assert(savings.map(_.getAs[Long]("tokens_cut")).sum ==
      cut.map(_.getAs[Long]("tokens_cut")).sum)
    savings.foreach { r =>
      assert(r.getAs[Long]("n_tokens_after") ==
        r.getAs[Long]("n_tokens") - r.getAs[Long]("tokens_cut"))
      val m = r.getAs[Long]("saved_tokens_micro")
      assert(m >= 0L && m <= 1000000L)
    }
  }

  test("s35: int8 coarse stage + exact rerank recovers nearly all of the exact top-k") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = e.filter(col("vec_id") % 50 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    val truth = pairs(Similarity.bruteForceTopK(queries, e, "vec_id", "embedding", k = 5))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = pairs(Similarity.int8TopK(queries, e, "vec_id", "embedding", k = 5))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = truth.map { case (q, t) =>
      t.count(got.getOrElse(q, Set.empty).contains).toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"int8+rerank mean recall@5 $mean < 0.9")
    assert(got.keySet == truth.keySet)
  }

  test("s35/s36: the persisted int8 index reloads and serves identically") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") % 50 === 0)
    val scratch = java.nio.file.Files.createTempDirectory("graft-int8-test")
    try {
      val path = scratch.toString + "/int8"
      val built = Similarity.int8Quantize(e, "vec_id", "embedding")
      // codes are genuinely byte-ranged ints, scale the raw double
      val row = built.head()
      assert(row.getAs[Seq[Int]]("qcodes").forall(c => c >= -127 && c <= 127))
      Similarity.saveInt8Index(built, path)
      val reloaded = Similarity.loadInt8Index(spark, path)
      def rows(idx: org.apache.spark.sql.DataFrame) =
        Similarity.int8TopKWith(q, e, "vec_id", "embedding", k = 5, index = idx)
          .collect().map(_.toString).sorted.toSeq
      assert(rows(reloaded) == rows(built), "load must reproduce the in-session search")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(scratch.toFile)
    }
  }

  test("d36: policy ablation laws — exact ⊆ near, semantic-only pair lands in semantic's unique set") {
    // 1,2: identical text AND identical vectors (exact+near+semantic all see it)
    // 5,6: different texts, identical vectors (semantic-ONLY near-dups)
    // 7: unique in both directions
    val t12 = (1 to 20).map(i => s"a$i").mkString(" ")
    val docs = Seq(
      (1L, t12), (2L, t12),
      (5L, (1 to 25).map(i => s"c$i").mkString(" ")),
      (6L, (1 to 15).map(i => s"d$i").mkString(" ")),
      (7L, (1 to 18).map(i => s"e$i").mkString(" ")))
      .toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)), (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (5L, Array(0.0f, 1.0f, 0.0f, 0.0f)), (6L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (7L, Array(0.0f, 0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.dedupPolicyAblation(docs, emb, "doc_id", "text",
        "vec_id", "embedding",
        shingleSize = 3, bands = 4, rowsPerBand = 4, rounds = 3,
        thresholdMicro = 990000L, kCells = 2, dims = 4, trainRounds = 1)
      .collect()
      .map(r => r.getAs[String]("policy") ->
        ((r.getAs[Long]("n_removed"), r.getAs[Long]("n_unique"))))
      .toMap
    // identical texts also tie on tokens, so near's keep-longest keeps the
    // SAME min-id keeper exact does: exact's removals are never unique
    assert(out("exact_min_id") == ((1L, 0L)), out.toString)
    // near = exactly the identical pair at (4,4) banding (nothing else shares
    // a full band); its removal is shared with exact and semantic → unique 0
    assert(out("near_keep_longest") == ((1L, 0L)), out.toString)
    // semantic removes the identical-vector copies: doc 2 (shared with the
    // others) and doc 6 (the semantic-ONLY catch — its text is unrelated)
    assert(out("semantic_keep_longest") == ((2L, 1L)), out.toString)
    out.values.foreach { case (r, u) => assert(u <= r) }
  }

  test("substring-dedup lifecycle e2e: registry verdicts ≡ cut manifest ≡ savings totals") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val registry = Dedup.repeatedSpanRegistry(docs, "doc_id", "text").collect()
    val cut = Dedup.repeatedSpanCut(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans_cut"), r.getAs[Long]("tokens_before"),
          r.getAs[Long]("tokens_cut"), r.getAs[Long]("tokens_after"))))
      .toMap
    // every registry cut verdict lands in the manifest, with matching counts
    val cutByDoc = registry.filter(_.getAs[Int]("cut") == 1)
      .groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.length.toLong).toMap
    assert(cutByDoc.keySet == cut.keySet, "cut docs ≡ manifest docs")
    cutByDoc.foreach { case (doc, n) =>
      assert(cut(doc)._1 == n, s"doc $doc: registry says $n cut spans, manifest ${cut(doc)._1}")
    }
    // surgery arithmetic: after = before − cut, and cut ≤ Σ span_tokens of the
    // doc's cut spans (strictly less when spans overlap)
    cut.values.foreach { case (_, before, tcut, after) =>
      assert(after == before - tcut && tcut > 0L)
    }
    registry.filter(_.getAs[Int]("cut") == 1)
      .groupBy(_.getAs[Long]("doc_id"))
      .foreach { case (doc, spans) =>
        assert(cut(doc)._3 <= spans.map(_.getAs[Long]("span_tokens")).sum)
      }
    // every span group keeps exactly one occurrence corpus-wide
    registry.groupBy(_.getAs[Long]("span_h")).foreach { case (_, occ) =>
      assert(occ.count(_.getAs[Int]("cut") == 0) == 1)
    }
  }

  test("ev25: planted lifetimes reproduce the hand-computed Kaplan-Meier curve") {
    // four subjects: two churn at t=2, two censored at t=10 → the curve has ONE
    // step: t=2 with n_risk=4, d=2, S = 1 - 2/4 = 0.5 (the t=10 censored rows are
    // not event times and must not emit)
    val obs = Seq((2L, 0L), (2L, 0L), (10L, 1L), (10L, 1L)).toDF("t", "censored")
    val rows = AnalyticsQueries.survivalCurveOf(obs).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Long]("duration_days") == 2L)
    assert(r.getAs[Long]("n_risk") == 4L && r.getAs[Long]("n_events") == 2L &&
      r.getAs[Long]("n_censored") == 0L)
    assert(r.getAs[Long]("survival_micro") == 500000L)
    assert(r.getAs[Long]("cum_hazard_micro") == 500000L)
  }

  test("ev25: extinction step (d = n) pins survival to exactly zero, hazard keeps accumulating") {
    // t=1: d=1 of n=3 → S=2/3; t=5: d=2 of n=2 → extinction, S=0 exactly
    val obs = Seq((1L, 0L), (5L, 0L), (5L, 0L)).toDF("t", "censored")
    val rows = AnalyticsQueries.survivalCurveOf(obs).collect()
      .sortBy(_.getAs[Long]("duration_days"))
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("survival_micro") == 666667L) // floor(1e6*exp(ln(2/3))+.5)
    assert(rows(1).getAs[Long]("survival_micro") == 0L)
    assert(rows(1).getAs[Long]("cum_hazard_micro") ==
      rows(0).getAs[Long]("cum_hazard_micro") + 1000000L)
  }

  test("ev25: survival is non-increasing, hazard non-decreasing, risk set shrinking on the real corpus") {
    val rows = AnalyticsQueries.survivalCurve(spark, dir, censorUs = 3600000000L)
      .collect().sortBy(_.getAs[Long]("duration_days"))
    assert(rows.length > 5, "expected a real curve on the sf0.001 sessions")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("survival_micro") <= a.getAs[Long]("survival_micro"))
      assert(b.getAs[Long]("cum_hazard_micro") >= a.getAs[Long]("cum_hazard_micro"))
      assert(b.getAs[Long]("n_risk") < a.getAs[Long]("n_risk"))
      case _ => ()
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") >= 1L)
      assert(r.getAs[Long]("n_risk") >= r.getAs[Long]("n_events") + r.getAs[Long]("n_censored"))
    }
  }

  test("s37: a planted prefix-misleading neighbor reads recall 0 at the narrow width, 1 at full") {
    // q's 2-dim prefix matches B exactly while the full vector matches A —
    // truncation at width 2 MUST miss, full width must recover
    val qdf = Seq((100L, Seq(2f, 1f, 0f, 10f))).toDF("vec_id", "embedding")
    val cdf = Seq(
      (1L, Seq(1f, 0f, 0f, 10f)), // true nearest (dominated by dim 4)
      (2L, Seq(2f, 1f, 0f, 0f))   // prefix-perfect decoy
    ).toDF("vec_id", "embedding")
    val rows = Similarity.prefixRecallCurve(qdf, cdf, "vec_id", "embedding",
      k = 1, prefixLevels = Seq(2, 4)).collect()
      .map(r => r.getAs[Int]("prefix_dims") -> r.getAs[Double]("recall_at_k")).toMap
    assert(rows(2) == 0.0 && rows(4) == 1.0)
  }

  test("s37: full-width recall is exactly 1 for every query and the grid is complete") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") % 50 === 0)
    val rows = Similarity.prefixRecallCurve(q, e, "vec_id", "embedding",
      k = 5, prefixLevels = Seq(8, 64)).collect()
    val nq = q.count()
    assert(rows.length == 2 * nq, s"grid incomplete: ${rows.length} rows for $nq queries")
    // width 64 = the full dimension: the coarse stage IS the exact ranking
    rows.filter(_.getAs[Int]("prefix_dims") == 64)
      .foreach(r => assert(r.getAs[Double]("recall_at_k") == 1.0))
  }

  test("dc23: the distributed A-ES sample equals the sequential priority sort exactly") {
    // sequential mirror of the kernel's whole priority chain (md5 prefix → micro
    // ln → nano key → sort desc, id asc → top k), computed in plain Scala
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("n_chars")))
    def keyNano(id: Long, w: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val lnuMicro = math.floor(1000000.0 * math.log((h + 1).toDouble / 1152921504606846976.0) + 0.5).toLong
      math.floor(1000000000.0 * lnuMicro.toDouble / w.toDouble + 0.5).toLong
    }
    val expected = docs.filter(_._3 > 0)
      .groupBy(_._2)
      .toSeq
      .flatMap { case (src, rows) =>
        rows.map { case (id, _, w) => (id, w, keyNano(id, w)) }
          .sortBy { case (id, _, k) => (-k, id) }
          .take(10)
          .zipWithIndex
          .map { case ((id, w, k), i) => (src, id, w, k, i + 1) }
      }.toSet
    val got = Sampling.weightedSample(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "source", "n_chars", k = 10)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Long]("weight"),
        r.getAs[Long]("key_nano"), r.getAs[Int]("sel_rank")))
      .toSet
    assert(got == expected,
      s"A-ES divergence: ${got.diff(expected).take(3)} vs ${expected.diff(got).take(3)}")
  }

  test("dc23: a heavyweight document always outdraws featherweights; zero weight never draws") {
    // one doc carries 10^9 weight vs 1-weight peers: P(excluded) = (1 - w/W)^... ~ 0,
    // and with the deterministic hash this is a hard pin, not a probability
    val rows = (1L to 50L).map(i => (i, "s", if (i == 7L) 1000000000L else 1L)) :+ ((51L, "s", 0L))
    val df = rows.toDF("doc_id", "source", "wt")
    val out = Sampling.weightedSample(df, "doc_id", "source", "wt", k = 5).collect()
    assert(out.length == 5)
    assert(out.exists(_.getAs[Long]("doc_id") == 7L), "the 10^9-weight doc must be drawn")
    assert(!out.exists(_.getAs[Long]("doc_id") == 51L), "zero weight must never be drawn")
    // ranks are exactly 1..5 with keys non-increasing
    val byRank = out.sortBy(_.getAs[Int]("sel_rank"))
    assert(byRank.map(_.getAs[Int]("sel_rank")).toSeq == (1 to 5))
    byRank.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("key_nano") >= b.getAs[Long]("key_nano"))
      case _ => ()
    }
  }

  test("g66: a split clique merges in one level-2 move; the anti-swap orientation holds") {
    // two 4-cliques bridged by one edge; community 1's clique is SPLIT {1,2}|{3,4}
    // while B={5,6,7,8} is intact. Level-2 must glue the split (score
    // 2·13·4 − 6·7 = 62 > 0, oriented 3→1) and must NOT merge B across the
    // bridge (2·13·1 − 7·13 < 0)
    def clique(ids: Seq[Long]) = for { a <- ids; b <- ids if a < b } yield (a, b)
    val und = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(5L, 6L, 7L, 8L)) :+ ((4L, 5L)))
      .toDF("lo", "hi")
    val start = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L),
      (5L, 5L), (6L, 5L), (7L, 5L), (8L, 5L)).toDF("v", "community")
    val merged = GraphQueries.aggregateMoveRound(und, start).collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Long]("community")).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(merged(_) == 1L),
      s"the split clique must reunite under the smaller label: $merged")
    assert(Seq(5L, 6L, 7L, 8L).forall(merged(_) == 5L),
      s"the intact clique must not merge across the bridge: $merged")
  }

  test("g66: accepted level-2 modularity is never below the level-1 score on the real graph") {
    def qSum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(coalesce(sum(col("q_part_micro")), lit(0L)).cast("long")).collect()(0).getLong(0)
    val q1 = qSum(GraphQueries.modularityRefined(spark, dir, lpaRounds = 4, refineRounds = 1))
    val q2 = qSum(GraphQueries.louvainAggregated(spark, dir, lpaRounds = 4))
    assert(q2 >= q1, s"level-2 gate violated: $q2 < $q1")
  }

  test("s38: the compacted index searches exactly like a fresh build on the survivors; no tombstone resurfaces") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val tomb = e.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
    val survivors = e.filter(col("vec_id") % 7 =!= 0)
    val queries = e.filter(col("vec_id") % 50 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos_sim"), r.getAs[Int]("rank"))).toSet
    val deleted = Similarity.deleteFromInt8Index(
      Similarity.int8Quantize(e, "vec_id", "embedding"), tomb, "vec_id")
    val viaDelete = rows(Similarity.int8TopKWith(
      queries, survivors, "vec_id", "embedding", k = 5, index = deleted))
    val viaFresh = rows(Similarity.int8TopK(
      queries, survivors, "vec_id", "embedding", k = 5))
    assert(viaDelete.nonEmpty && viaDelete == viaFresh,
      s"delete path diverged: ${viaDelete.diff(viaFresh)} vs ${viaFresh.diff(viaDelete)}")
    assert(!viaDelete.exists(_._2 % 7 == 0), "a tombstoned id resurfaced as a neighbor")
  }

  test("dc24: budget admits the quality prefix, cuts at the boundary, zeroes an over-budget source") {
    // same token count (10) and char mass per doc, quality ordered by planted
    // stopword hits alone: d1 (4× the) > d2 (2×) > d3 (0×)
    val d1 = "w01 the w02 the w03 the w04 the w05 w06"
    val d2 = "w07 the w08 the w09 w10 w11 w12 w13 w14"
    val d3 = "w15 w16 w17 w18 w19 w20 w21 w22 w23 w24"
    // source b's single doc alone exceeds the budget → whole source empty
    val big = (1 to 30).map(i => f"x$i%02d").mkString(" ")
    val docs = Seq((1L, d1, "a"), (2L, d2, "a"), (3L, d3, "a"), (4L, big, "b"))
      .toDF("doc_id", "text", "source")
    val out = graft.pipeline.Curation.budgetFill(docs, "doc_id", "text", "source",
        budgetTokens = 25L, bucketMicro = 100000L)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_toks"), r.getAs[Long]("cum_tokens"),
        r.getAs[Int]("fill_rank")))
      .sortBy(_._5)
    // d1 then d2 admitted (cum 10, 20 ≤ 25); d3 would reach 30 → cut; b empty
    assert(out.toSeq == Seq((1L, "a", 10L, 10L, 1), (2L, "a", 10L, 20L, 2)),
      s"got ${out.mkString(", ")}")
  }

  test("dc24: the admitted set is invariant to the bucket width (prefix optimization exact)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def rows(bucket: Long) =
      graft.pipeline.Curation.budgetFill(docs, "doc_id", "text", "source",
          budgetTokens = 600L, bucketMicro = bucket)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
          r.getAs[Long]("quality_micro"), r.getAs[Long]("n_toks"),
          r.getAs[Long]("cum_tokens"), r.getAs[Int]("fill_rank")))
        .toSet
    val fine = rows(1L)            // every micro value its own bucket
    val mid = rows(100000L)        // the registered width
    val one = rows(10000000000L)   // everything in one bucket = the plain window
    assert(fine.nonEmpty && fine == mid && mid == one,
      s"bucket width changed the admitted set: fine=${fine.size} mid=${mid.size} one=${one.size}")
  }

  test("d37: dups always pass the screen; a saturated bloom shows FPs without changing dup columns") {
    import graft.pipeline.Dedup
    val index = Dedup.exactHashIndex(
      Seq((1L, "alpha beta gamma"), (2L, "delta epsilon")).toDF("doc_id", "text"),
      "doc_id", "text")
    val batch = (Seq((10L, "alpha beta gamma"), (11L, "delta epsilon")) ++ // re-crawls
      (20 to 69).map(i => (i.toLong, s"novel text number $i"))).toDF("doc_id", "text")
    def rows(mBits: Int) =
      Dedup.bloomPrefilteredExactProbe(batch, "doc_id", "text", index, mBits)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Int]("bloom_pos"), r.getAs[Long]("dup_of"), r.getAs[Long]("n_index_copies"))))
        .toMap
    val wide = rows(1 << 18)
    // true dups pass the screen and resolve; the 50 novel docs are (deterministically,
    // for these strings) bloom-negative — the screen actually screens
    assert(wide(10L) == ((1, 1L, 1L)) && wide(11L) == ((1, 2L, 1L)), s"$wide")
    assert((20L to 69L).forall(wide(_) == ((0, -1L, 0L))), s"novel rows must screen out: $wide")
    // mBits = 1: the single bit is set by any index hash, so EVERYTHING is
    // bloom-positive — the false-positive path, exercised deterministically; the
    // dup columns must not change (the screen is lossless in both directions)
    val sat = rows(1)
    assert(sat.values.forall(_._1 == 1), s"saturated bloom must pass every row: $sat")
    assert(sat(10L)._2 == 1L && sat(11L)._2 == 2L)
    assert((20L to 69L).forall(sat(_)._2 == -1L), "an FP must still resolve as novel")
  }

  test("d38: the saved hp-partitioned artifact probes exactly like the in-memory index") {
    import graft.pipeline.Dedup
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val index = Dedup.exactHashIndex(docs.filter(col("doc_id") < 250), "doc_id", "text")
    val batch = docs.filter(col("doc_id") >= 250)
      .unionByName(docs.filter(col("doc_id") < 250 && col("doc_id") % 13 === 0)
        .withColumn("doc_id", col("doc_id") + 10000000L))
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("bloom_pos"),
        r.getAs[Long]("dup_of"), r.getAs[Long]("n_index_copies"))).toSet
    val direct = keyed(Dedup.bloomPrefilteredExactProbe(batch, "doc_id", "text", index))
    val scratch = java.nio.file.Files.createTempDirectory("graft-r15-exact-index")
    try {
      val path = scratch.toString + "/index"
      Dedup.saveExactIndex(index, path)
      val idx = Dedup.loadExactIndex(spark, path)
      val saved = keyed(Dedup.probeSavedExactIndex(
        batch.select(col("doc_id"), md5(col("text")).as("text_hash")), "doc_id", idx,
        Dedup.exactBloomBits(idx.select(col("existing_id"), col("text_hash")))))
      assert(direct.nonEmpty && saved == direct,
        s"saved-artifact probe diverged: ${saved.diff(direct)} vs ${direct.diff(saved)}")
      assert(direct.exists(_._3 != -1L), "the planted re-crawl wave must resolve as dups")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(scratch).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("m09: banding finds every pair within maxDist and only those; over-cap cells fall out") {
    import graft.pipeline.Multimodal
    def pairs(hs: Seq[(Long, Long)], cap: Long = 1000L) =
      Multimodal.phashNearDupOf(hs.toDF("asset_id", "phash"),
          bands = 4, maxDist = 3, maxAssetsPerBucket = cap)
        .collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Int]("hamming")))
        .toSet
    val got = pairs(Seq(
      1L -> 0L,                                   // base
      2L -> 1L,                                   // hamming 1 from base
      3L -> 15L,                                  // 4 bits in ONE band: candidate via bands 1-3, hamming 4 → cut
      4L -> ((1L << 0) + (1L << 15) + (1L << 30) + (1L << 45)), // 4 bits, one per band: no band matches base, hamming 4
      5L -> ((1L << 0) + (1L << 15) + (1L << 30))))             // 3 bits in 3 bands: band 3 matches, hamming 3 → kept
    // within-maxDist pairs and nothing else: 1-2 (d1), 1-5 (d3), 2-3 (1^15 = 0b1110,
    // d3), 2-4 (d3), 2-5 (d2), 4-5 (d1); 1-3/1-4 at d4 cut, 3-4/3-5 far
    assert(got == Set((1L, 2L, 1), (1L, 5L, 3), (2L, 3L, 3),
      (2L, 4L, 3), (2L, 5L, 2), (4L, 5L, 1)), s"got $got")
    // the hot-cell cap: two exact copies share every cell; cap 1 drops all their
    // cells (recall falls to the exact pass by design), cap 2 admits the pair
    assert(pairs(Seq(1L -> 7L, 2L -> 7L), cap = 1L).isEmpty)
    assert(pairs(Seq(1L -> 7L, 2L -> 7L), cap = 2L) == Set((1L, 2L, 0)))
  }

  test("ev28: hand-computed Gini — uniform type scores 0, whale type scores 0.4") {
    // type a: four users × 1 event (perfect equality, G = 0)
    // type b: counts [1, 9] → s = 1·1 + 2·9 = 19, G = (38 − 3·10)/(2·10) = 0.4
    val events = (Seq.fill(1)(("a", 1L)) ++ Seq(("a", 2L), ("a", 3L), ("a", 4L)) ++
      Seq(("b", 10L)) ++ Seq.fill(9)(("b", 20L)))
      .toDF("event_type", "user_id")
    val out = AnalyticsQueries.giniConcentrationOf(events)
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("total_events"), r.getAs[Long]("gini_micro"))))
      .toMap
    assert(out("a") == ((4L, 4L, 0L)), s"$out")
    assert(out("b") == ((2L, 10L, 400000L)), s"$out")
  }

  test("m10: cuts open at the first frame and on hamming >= threshold; scenes number cumulatively") {
    import graft.pipeline.Multimodal
    val frames = Seq(
      (1L, 0, 0L, 0L), (1L, 2, 128L, 0L),     // identical pair → one scene
      (1L, 4, 256L, 255L), (1L, 6, 384L, 255L), // 8-bit jump → scene 2
      (1L, 8, 512L, 254L),                     // hamming 1 < 8 → still scene 2
      (2L, 0, 0L, 42L))                        // single-frame asset → its own scene 1
      .toDF("asset_id", "frame_index", "frame_offset", "phash")
    val out = Multimodal.sceneCutsOf(frames, cutHamming = 8)
      .collect()
      .map(r => (r.getAs[Long]("asset_id"), r.getAs[Int]("frame_index"),
        r.getAs[Int]("hamming_prev"), r.getAs[Int]("is_cut"), r.getAs[Long]("scene_no")))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      (1L, 0, -1, 1, 1L), (1L, 2, 0, 0, 1L),
      (1L, 4, 8, 1, 2L), (1L, 6, 0, 0, 2L), (1L, 8, 1, 0, 2L),
      (2L, 0, -1, 1, 1L)), s"got ${out.mkString(", ")}")
  }

  test("ev29: metronome bot, bursty human, and machine-speed burst score hand-computed batteries") {
    // user 1: perfect 60 s metronome inside one hour → regular (bit 1) + single-
    // window (bit 2); rate 66/h stays under the 120/h line
    val metronome = (0 until 10).map(i => (1L, i * 60000000L))
    // user 2: bursty gaps (CV² ≈ 1.076) spread over four hours, peak share 2/6
    val human = Seq(0L, 10000000L, 3700000000L, 15060000000L, 15160000000L, 20000000000L)
      .map(t => (2L, t))
    // user 3: three events in the same microsecond → span 0 (bit 0) + bit 2; CV²
    // unscored (s = 0)
    val burst = Seq.fill(3)((3L, 42L))
    val twoEvents = Seq((4L, 0L), (4L, 1000000L)) // under the n >= 3 floor
    val out = AnalyticsQueries.botBatteryOf(
        (metronome ++ human ++ burst ++ twoEvents).toDF("user_id", "tsu"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("span_us"), r.getAs[Long]("rate_per_hour"),
          r.getAs[Long]("cv2_micro"), r.getAs[Long]("peak_share_micro"),
          r.getAs[Long]("reasons"), r.getAs[Int]("bot"))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L), s"$out")
    assert(out(1L) == ((10L, 540000000L, 66L, 0L, 1000000L, 6L, 1)), s"${out(1L)}")
    assert(out(2L) == ((6L, 20000000000L, 1L, 1076268L, 333333L, 0L, 0)), s"${out(2L)}")
    assert(out(3L) == ((3L, 0L, -1L, 0L, 1000000L, 5L, 1)), s"${out(3L)}")
  }

  test("s39: an aligned cell reads drift 0, a rotated cell its exact cosine gap, a dead cell max") {
    val model = Seq(
      (0, Array(1.0, 0.0, 0.0, 0.0), 5L),
      (1, Array(0.0, 1.0, 0.0, 0.0), 5L),
      (2, Array(0.0, 0.0, 1.0, 0.0), 5L))
      .toDF("cluster", "cv", "n_members")
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f, 0.0f)), // cell 0, exactly on the centroid
      (11L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (20L, Array(0.0f, 0.8f, 0.6f, 0.0f)), // cell 1 (cos 0.8 beats cell 2's 0.6), rotated
      (21L, Array(0.0f, 0.8f, 0.6f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.centroidDrift(corpus, "vec_id", "embedding", model,
        dims = 4, driftMaxMicro = 1000L)
      .collect()
      .map(r => r.getAs[Long]("cluster") ->
        ((r.getAs[Long]("n_trained"), r.getAs[Long]("n_now"),
          r.getAs[Long]("drift_micro"), r.getAs[Int]("stale"))))
      .toMap
    assert(out(0L) == ((5L, 2L, 0L, 0)), s"$out")       // aligned → fresh
    assert(out(1L) == ((5L, 2L, 200000L, 1)), s"$out")  // 1 − 0.8 exactly
    assert(out(2L) == ((5L, 0L, 1000000L, 1)), s"$out") // dead region → max drift
  }

  test("dc26: the holdout never leaks into the epoch manifest; an unhygienic pack WOULD leak") {
    import graft.pipeline.{Curation, Sampling}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val holdoutIds = Curation.stratifiedHoldout(docs, "doc_id", "text", "source",
        holdoutPct = 10, bucketMicro = 100000L)
      .filter(col("split") === "holdout")
      .select(col("doc_id"))
      .localCheckpoint(true)
    val merges = graft.pipeline.TextStats.bpeMergeLoop(docs, "doc_id", "text", rounds = 2)
    def packedIds(pool: org.apache.spark.sql.DataFrame) =
      Sampling.epochManifestUpsampled(pool, "doc_id", "source", "text", merges,
        alphaMicro = 300000L, budgetDocs = 200L, budgetTokens = 512L, nGroups = 8)
        .select(col("doc_id"))
    val train = docs.join(holdoutIds, Seq("doc_id"), "left_anti")
    // hygiene: the dc26 pool cannot emit a held-out doc
    assert(packedIds(train).join(holdoutIds, Seq("doc_id")).isEmpty,
      "a held-out doc leaked into the clean epoch")
    // contrast: the SAME pack over the full corpus does leak — the audit is not vacuous
    assert(!packedIds(docs).join(holdoutIds, Seq("doc_id")).isEmpty,
      "expected the unhygienic pack to draw held-out docs at this budget")
  }

  test("ev30: a sustained step alarms at its hand-computed CUSUM peak; a flat series reads zero") {
    // "shift": 15 quiet hours (1/h) then 5 hours at 50/h — μ = 13.25, k = μ/2,
    // dev_high = 30,125,000µ, peak S = 5·dev_high = 150,625,000 ≥ 5μ → alarm.
    // "flat": 2/h throughout — Z strictly falls, S ≡ 0, peak at the first hour.
    val shift = (0 until 15).map(h => Seq(("shift", h * 3600000000L))) ++
      (15 until 20).map(h => Seq.fill(50)(("shift", h * 3600000000L)))
    val flat = (0 until 20).map(h => Seq.fill(2)(("flat", h * 3600000000L)))
    val out = AnalyticsQueries.cusumChangepointOf(
        (shift ++ flat).flatten.toDF("event_type", "tsu"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_hours"), r.getAs[Long]("total_events"),
          r.getAs[Long]("mean_micro"), r.getAs[Long]("max_cusum_micro"),
          r.getAs[Long]("peak_hour_index"), r.getAs[Int]("alarm"))))
      .toMap
    assert(out("shift") == ((20L, 265L, 13250000L, 150625000L, 19L, 1)), s"${out("shift")}")
    assert(out("flat") == ((20L, 40L, 2000000L, 0L, 0L, 0)), s"${out("flat")}")
  }

  test("dc27: hand-computed buckets, batch counts, truncation, and waste vs the naive contrast") {
    import graft.pipeline.Sampling
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // 3 docs of 10 tokens (bucket 16), 1 of 20 (bucket 32), 1 of 600 → truncates
    // to 512 (bucket 512, zero padding)
    val docs = Seq((1L, words(10)), (2L, words(10)), (3L, words(10)),
      (4L, words(20)), (5L, words(600)))
      .toDF("doc_id", "text")
    val out = Sampling.lengthBucketPlan(docs, "doc_id", "text", batchSize = 2L)
      .collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_batches"), r.getAs[Long]("tokens_real"),
          r.getAs[Long]("tokens_padded"), r.getAs[Long]("waste_micro"),
          r.getAs[Long]("naive_waste_micro"))))
      .toMap
    // naive: 5 docs × 512 = 2560 padded for 30+20+512 = 562 real → 78.047% waste
    val naive = math.floor(1e6 * (2560.0 - 562.0) / 2560.0 + 0.5).toLong
    assert(out(16L) == ((3L, 2L, 30L, 48L, 375000L, naive)), s"$out")
    assert(out(32L) == ((1L, 1L, 20L, 32L, 375000L, naive)), s"$out")
    assert(out(512L) == ((1L, 1L, 512L, 512L, 0L, naive)), s"$out")
  }

  test("d39: saturated grids fall back to the largest array; a clean one is chosen smallest-first") {
    import graft.pipeline.Dedup
    val index = Dedup.exactHashIndex(
      Seq((1L, "alpha beta gamma"), (2L, "delta epsilon")).toDF("doc_id", "text"),
      "doc_id", "text")
    val batch = ((10L, "alpha beta gamma") +:
      (20 to 49).map(i => (i.toLong, s"novel text number $i"))).toDF("doc_id", "text")
    def report(grid: Seq[Int]) =
      Dedup.bloomSizingReport(batch, "doc_id", "text", index, grid, targetFpMicro = 1000L)
        .collect()
        .map(r => (r.getAs[Long]("m_bits"), r.getAs[Long]("n_novel"),
          r.getAs[Long]("fp_measured_micro"), r.getAs[Int]("chosen")))
        .sortBy(_._1)
    // 2- and 4-bit arrays saturate (every novel row is an FP) → nothing meets
    // the target → the fallback picks the LARGEST candidate
    val sat = report(Seq(2, 4))
    assert(sat.forall(_._2 == 30L), s"$sat")
    assert(sat.forall(_._3 == 1000000L), s"all novel rows must be FPs on a saturated array: $sat")
    assert(sat.collect { case (m, _, _, 1) => m }.toSeq == Seq(4L), s"$sat")
    // a wide array is clean; with a saturated one beside it the CLEAN one wins
    // even though both are "available" — smallest sufficient, not largest
    val mixed = report(Seq(4, 1 << 18))
    assert(mixed.collect { case (m, _, _, 1) => m }.toSeq == Seq(262144L), s"$mixed")
    assert(mixed.find(_._1 == 262144L).get._3 == 0L, s"$mixed")
  }

  test("dc28: a mirror-heavy source demotes, a variety-rich one boosts; inflation is exact") {
    import graft.pipeline.Sampling
    val copy = (1 to 8).map(i => s"tok$i").mkString(" ")
    val docs = ((1 to 4).map(i => (i.toLong, copy, "dup")) ++
      (5 to 8).map(i => (i.toLong, (1 to 8).map(j => s"u$i$j").mkString(" "), "var")))
      .toDF("doc_id", "text", "source")
    val out = Sampling.dedupAwareMix(docs, "doc_id", "text", "source")
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_eff"),
          r.getAs[Long]("dup_inflation_micro"), r.getAs[Double]("p_raw"),
          r.getAs[Double]("p_eff"), r.getAs[Double]("shift"))))
      .toMap
    val (dup, vr) = (out("dup"), out("var"))
    assert(dup._1 == 4L && dup._2 == 1L && dup._3 == 4000000L, s"$dup")
    assert(vr._1 == 4L && vr._2 == 4L && vr._3 == 1000000L, s"$vr")
    // raw shares tie at 0.5; cluster-counted shares split 1/5 vs 4/5 pre-pow
    assert(dup._4 == vr._4 && dup._4 == 0.5, s"$out")
    assert(vr._5 > dup._5 && vr._6 > 0.0 && dup._6 < 0.0, s"$out")
  }

  test("ev31: paths never cross users or session gaps; ties rank lexicographically") {
    // user 1: view->click->buy twice in-session, then a >1h gap before 'view' —
    // the triple (buy,view,click) spanning the gap must NOT count
    val h = 3600000000L
    val u1 = Seq(("view", 0L), ("click", 10L), ("buy", 20L),
      ("view", 30L), ("click", 40L), ("buy", 50L),
      ("view", 50L + 2 * h), ("click", 51L + 2 * h), ("buy", 52L + 2 * h))
    // user 2 contributes one in-session triple; crossing into user 1 is impossible
    val u2 = Seq(("view", 0L), ("click", 5L), ("buy", 9L))
    val events = (u1.map { case (t, ts) => (1L, t, ts) } ++ u2.map { case (t, ts) => (2L, t, ts) })
      .zipWithIndex.map { case ((u, t, ts), i) => (u, i.toLong, ts, t) }
      .toDF("user_id", "event_id", "tsu", "event_type")
    val out = AnalyticsQueries.topEventPathsOf(events, k = 20)
      .collect()
      .map(r => ((r.getAs[String]("t1"), r.getAs[String]("t2"), r.getAs[String]("t3")),
        r.getAs[Long]("n_paths"), r.getAs[Long]("rank")))
      .sortBy(_._3)
    // (view,click,buy): u1 ×3 (third session included — its hops are in-gap) + u2 = 4
    assert(out.head == ((("view", "click", "buy"), 4L, 1L)), s"${out.toSeq}")
    // the overlapping shifted triples: (click,buy,view) and (buy,view,click)
    // exist only INSIDE session 1+2 of user 1 (1 each); the gap kills the rest
    val m = out.map(t => t._1 -> t._2).toMap
    assert(m(("click", "buy", "view")) == 1L && m(("buy", "view", "click")) == 1L, s"$m")
    assert(!m.contains(("buy", "buy", "view")) && out.map(_._2).sum == 4 + 2, s"$m")
  }

  test("m11: copies collapse to one stored payload; distinct payloads save nothing") {
    import graft.pipeline.Multimodal
    val docs = Seq(
      (1L, "img", "aaaa"), (2L, "img", "aaaa"), (3L, "img", "aaaa"), // 3 copies of 4 bytes
      (4L, "img", "bbbbbbbb"),                                      // unique 8 bytes
      (5L, "vid", "cccc"), (6L, "vid", "dddd"))                     // all-unique type
      .toDF("doc_id", "source", "payload")
      .select(col("doc_id"), col("source"), encode(col("payload"), "UTF-8").as("media"))
    val out = Multimodal.mediaDedupSavings(docs, "doc_id", "source", "media")
      .collect()
      .map(r => r.getAs[String]("media_type") ->
        ((r.getAs[Long]("n_assets"), r.getAs[Long]("n_unique"), r.getAs[Long]("bytes_raw"),
          r.getAs[Long]("bytes_dedup"), r.getAs[Long]("savings_micro"))))
      .toMap
    // img: raw 3·4 + 8 = 20, dedup 4 + 8 = 12 → 40% saved
    assert(out("img") == ((4L, 2L, 20L, 12L, 400000L)), s"$out")
    assert(out("vid") == ((2L, 2L, 8L, 8L, 0L)), s"$out")
  }

  test("sk10: the screen never loses a true hitter; tail FPs are verified away") {
    import graft.pipeline.Sketches
    // one true hitter (50 of 90 tokens) and a 40-token unique tail; width 2
    // forces the tail into the hitter's buckets, so the screen admits FPs —
    // which the exact pass must then reject
    val docs = Seq(
      (1L, Seq.fill(50)("hot").mkString(" ")),
      (2L, (1 to 40).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Sketches.heavyHitters(docs, "doc_id", "text",
        phiMicro = 200000L, depth = 2, width = 2)
      .collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("exact_n"), r.getAs[Long]("cms_n"),
        r.getAs[Long]("n_total"), r.getAs[Long]("n_candidates")))
    // thr = ceil(0.2 * 90) = 18: only "hot" survives the exact verify
    assert(out.map(_._1).toSeq == Seq("hot"), s"${out.toSeq}")
    val hot = out.head
    assert(hot._2 == 50L && hot._4 == 90L, s"$hot")
    assert(hot._3 >= hot._2, "CMS must never under-count")
    assert(hot._5 > 1L, s"width 2 must admit tail FPs for the verify to reject: $hot")
  }

  test("t51: the confusion card reads hand-computed class metrics off a planted mislabel") {
    val docs = Seq(
      (1L, "x the y and z of w", "en"),  // correctly English
      (2L, "x der y und z das w", "de"), // correctly German
      (3L, "x the y and z of w", "de"))  // German-labeled English text → (de, en) cell
      .toDF("doc_id", "text", "lang")
    val out = graft.pipeline.TextStats.langIdEval(docs, "doc_id", "text", "lang")
      .collect()
      .map(r => (r.getAs[String]("gold"), r.getAs[String]("pred")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("recall_micro"),
          r.getAs[Long]("precision_micro"), r.getAs[Long]("accuracy_micro"))))
      .toMap
    assert(out.keySet == Set(("en", "en"), ("de", "de"), ("de", "en")), s"$out")
    assert(out(("en", "en")) == ((1L, 1000000L, 500000L, 666667L)), s"$out")
    assert(out(("de", "de")) == ((1L, 500000L, 1000000L, 666667L)), s"$out")
    assert(out(("de", "en")) == ((1L, 500000L, 500000L, 666667L)), s"$out")
  }

  test("g67: the datasheet arithmetic matches a fully hand-computed graph") {
    // triangle 1-2-3 (one mutual pair 1<->2), pendant 4, separate pair 5-6
    val de = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 4L), (5L, 6L))
      .toDF("s", "d")
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 5L), (6L, 5L))
      .toDF("vertex_id", "component")
    val r = GraphQueries.graphCardOf(de, comps).collect().head
    val got = (r.getAs[Long]("n_vertices"), r.getAs[Long]("n_edges_directed"),
      r.getAs[Long]("n_edges_und"), r.getAs[Long]("reciprocity_micro"),
      r.getAs[Long]("max_degree"), r.getAs[Long]("avg_degree_micro"),
      r.getAs[Long]("n_components"), r.getAs[Long]("giant_share_micro"),
      r.getAs[Long]("n_triangles"), r.getAs[Long]("n_wedges"),
      r.getAs[Long]("transitivity_micro"))
    // recip 2/6, avg 10/6, giant 4/6, transitivity 3·1/5
    assert(got == ((6L, 6L, 5L, 333333L, 3L, 1666667L, 2L, 666667L, 1L, 5L, 600000L)),
      s"$got")
  }

  test("s40: the exact arm calibrates at 1.0; every arm's hits stay within the pool") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val out = Similarity.servingRecallCard(e, "vec_id", "embedding",
        k = 5, trainRounds = 2, int8Overfetch = 4)
      .collect()
      .map(r => r.getAs[String]("method") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Long]("n_hits"), r.getAs[Long]("recall_micro"))))
      .toMap
    assert(out.keySet == Set("exact", "ivf_pq_trained", "int8"), s"$out")
    val nq = out("exact")._1
    assert(out("exact") == ((nq, nq * 5, 1000000L)), s"the calibration row must read 1.0: $out")
    assert(out.values.forall { case (q, h, r) => h <= q * 5 && r <= 1000000L && r >= 0L },
      s"hits/recall out of range: $out")
  }

  test("s41: the dial picks smallest-sufficient, falls back to largest, and actuates exactly") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") % 50 === 0)
    def rows(target: Long) =
      Similarity.tunedProbeSearch(q, e, "vec_id", "embedding", k = 5,
        probeLevels = Seq(1, 2, 4), targetRecallMicro = target,
        kCells = 8, trainRounds = 2)
    // target 0: every level qualifies → the SMALLEST wins
    val loose = rows(0L)
    assert(loose.select(col("n_probe")).distinct().collect().map(_.getInt(0)).toSeq == Seq(1))
    // unreachable target: none qualifies → the LARGEST is the fallback
    val strict = rows(1000001L)
    assert(strict.select(col("n_probe")).distinct().collect().map(_.getInt(0)).toSeq == Seq(4))
    // actuation identity: the chosen arm IS the trained search at that nProbe
    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("neighbor_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val direct = keyed(Similarity.ivfPqTrainedTopK(q, e, "vec_id", "embedding",
      k = 5, kCells = 8, trainRounds = 2, nProbe = 4))
    assert(keyed(strict) == direct, "the actuated search must equal the direct one")
  }

  test("s31: a census without n_members fails loudly") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val bad = Seq(1L).toDF("n_rows")
    val err = intercept[IllegalArgumentException] {
      Similarity.filteredTopKAdaptive(
        e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding", k = 5,
        allowed = e.select(col("vec_id")), census = Some(bad))
    }
    assert(err.getMessage.contains("n_members"))
  }
}
