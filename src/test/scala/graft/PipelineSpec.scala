package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline._

/** Training-data pipeline operators on planted fixtures: exact/near duplicates,
  * similarity search, multimodal featurization.
  */
class PipelineSpec extends SparkSpec {

  private lazy val docs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy cat again and again"), // near dup of 1
      (4L, "completely different content about spark distributed engines here"),
      (5L, "tiny")
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical content and keeps the min id") {
    val r = Dedup.exact(docs, "doc_id", "text").collect()
    assert(r.length == 4)
    val dupGroup = r.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dupGroup.getAs[Long]("keep_id") == 1L)
  }

  test("minhash LSH surfaces exact and near duplicates as candidate pairs") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", shingleSize = 3, bands = 16, rowsPerBand = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "exact dup must share every band")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)), "near dup shares most minhashes")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "unrelated doc shares nothing")
  }

  test("ngram jaccard: exact dup scores 1.0, near dup is high, unrelated absent") {
    val rows = Dedup.ngramJaccardPairs(docs, "doc_id", "text", shingleSize = 3, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rows((1L, 2L)) == 1.0)
    assert(rows((1L, 3L)) > 0.5 && rows((1L, 3L)) < 1.0)
    assert(!rows.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("prefix-filtered jaccard equals the unfiltered all-pairs reference (lossless pruning)") {
    import spark.implicits._
    // 40 docs with overlapping shingle sets at many sizes, several pairs near threshold
    val corpus = (1L to 40L).map { i =>
      val words = (0 until (6 + (i % 9)).toInt).map(j => s"w${(i + j * 3) % 23}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val fast = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", shingleSize = 2, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // reference: exact jaccard over every pair, straight from collected shingle sets
    val sets = Dedup.shingles(corpus, "doc_id", "text", 2)
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getString(1)).toSet }
    val slow = (for {
      a <- sets.keys; b <- sets.keys if a < b
      j = sets(a).intersect(sets(b)).size.toDouble / sets(a).union(sets(b)).size
      if BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.3
    } yield (a, b, BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(fast == slow, s"missing=${slow -- fast} extra=${fast -- slow}")
  }

  test("repetitionStats: duplicate and top-token ratios from exact token counts") {
    import spark.implicits._
    val d = Seq(
      (1L, "a a a b"),    // 4 tokens, 2 distinct, max count 3
      (2L, "x y z w"),    // no repetition
      (3L, "")            // empty text = one empty token
    ).toDF("doc_id", "text")
    val r = TextStats.repetitionStats(d, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4)))).toMap
    assert(r(1L) == ((4L, 2L, 0.5, 0.75)))
    assert(r(2L) == ((4L, 4L, 0.0, 0.25)))
    assert(r(3L) == ((1L, 1L, 0.0, 1.0)))
  }

  test("vocabulary: top-k tokens by occurrences with doc frequency, token tie-break") {
    import spark.implicits._
    val d = Seq((1L, "b a b c"), (2L, "a b z")).toDF("doc_id", "text")
    val r = TextStats.vocabulary(d, "doc_id", "text", k = 3)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq(("b", 3L, 2L), ("a", 2L, 2L), ("c", 1L, 1L)),
      "ordered by count desc then token asc; doc frequency distinct per doc")
  }

  test("dedup clusters: near-dups share the min-id cluster; singletons keep their own") {
    val clusters = Dedup.dedupClusters(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L,
      "exact + near dups collapse onto the minimum doc id")
    assert(clusters(4L) == 4L && clusters(5L) == 5L, "unrelated docs are their own cluster")
  }

  test("simhash: identical docs hash identically; near dup is close in hamming distance") {
    val h = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(1L), h(3L)) <= hamming(h(1L), h(4L)))
  }

  private lazy val vecs: DataFrame = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.95f, 0.05f, 0.0f)), // nearly parallel to 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f))   // anti-parallel to 0
    ).toDF("vec_id", "embedding")
  }

  test("brute-force ANN ranks the nearly-parallel vector first") {
    val r = Similarity.bruteForceTopK(vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", 2)
      .orderBy(col("rank")).collect()
    assert(r(0).getAs[Long]("neighbor_id") == 1L)
    assert(r(0).getAs[Double]("cos_sim") > 0.99)
    assert(r.length == 2)
  }

  test("near-dup pairs by cosine threshold (LSH-bucketed candidates)") {
    val pairs = Similarity.nearDupPairs(vecs, "vec_id", "embedding", 0.9, dims = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("near-dup plan contains no cross join (candidates are equi-joins)") {
    val plan = Similarity.nearDupPairs(vecs, "vec_id", "embedding", 0.9, dims = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("cartesian"), s"plan must not be all-pairs:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan must not be all-pairs:\n$plan")
  }

  test("IVF ANN: query probes nearest cells and finds the near-parallel vector") {
    // centroids = ids 0, 2, 4; vector 1 lands in vector 0's cell; query 0 probes it
    val r = Similarity.ivfTopK(vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding",
        k = 3, centroidMod = 2, nProbe = 2)
      .collect()
    assert(r.exists(row => row.getAs[Long]("neighbor_id") == 1L && row.getAs[Int]("rank") == 1))
  }

  test("LSH buckets: identical vectors collide; ANN within bucket finds the dup") {
    val r = Similarity.lshTopK(vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", 3, nPlanes = 4)
      .collect()
    // vector 1 is in the same half-space as 0 for every hyperplane (tiny angle)
    assert(r.exists(row => row.getAs[Long]("neighbor_id") == 1L))
  }

  test("multimodal resize truncates payloads; frame sampling fans out stride windows") {
    val assets = docs.select(col("doc_id"), lit("text/plain").as("kind"), encode(col("text"), "UTF-8").as("bin"))
    // (641*480) % 4096 = 480 -> payloads cap at 480 bytes
    val resized = Multimodal.resizeDF(assets, "doc_id", "kind", "bin", targetW = 641, targetH = 480)
      .collect().map(r => r.getAs[Long]("asset_id") -> r.getAs[Long]("n_bytes")).toMap
    assert(resized(5L) == 4L, "short payload unchanged ('tiny')")
    assert(resized.values.forall(_ <= 480L))

    val frames = Multimodal.frameSampleDF(
        assets.select(col("doc_id"), col("bin")), "doc_id", "bin", frameBytes = 8, stride = 2)
      .collect()
    val f1 = frames.filter(_.getAs[Long]("asset_id") == 1L).map(_.getAs[Int]("frame_index")).sorted
    val len1 = docs.filter(col("doc_id") === 1).head().getString(1).length
    val expected = (0 until len1 / 8 by 2).toArray
    assert(f1.sameElements(expected), s"frame indices ${f1.toSeq} vs ${expected.toSeq}")
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 8))
  }

  test("multimodal featurize: deterministic stub features via mapPartitions plumbing") {
    val assets = docs.select(col("doc_id"), lit("text/plain").as("kind"), encode(col("text"), "UTF-8").as("bin"))
    val feats = Multimodal.featurizeDF(assets, "doc_id", "kind", "bin").collect()
      .map(r => r.getAs[Long]("asset_id") -> r).toMap
    assert(feats.size == 5)
    val f1 = feats(1L)
    assert(f1.getAs[Long]("n_bytes") == docs.filter(col("doc_id") === 1).head().getString(1).length)
    assert(f1.getAs[Int]("width") >= 1 && f1.getAs[Int]("width") <= 1920)
    // identical bytes -> identical features
    assert(feats(1L).toSeq.drop(1) == feats(2L).toSeq.drop(1))
  }

  test("int8 quantization: hand-computed scale, |q| mass and max reconstruction error") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f)),
      (2L, Array(0.0f, 0.0f, 0.0f)) // zero vector: scale undefined, excluded
    ).toDF("vec_id", "embedding")
    val r = Similarity.quantizeError(df, "vec_id", "embedding").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("vec_id") == 1L)
    assert(row.getAs[Int]("n_dims") == 3)
    // scale = 2/127; q = (64, -127, 32) -> sum |q| = 223; worst dim err = |1 - 64·(2/127)|
    assert(row.getAs[Double]("scale") == 0.015748)
    assert(row.getAs[Long]("sum_abs_q") == 223L)
    assert(row.getAs[Double]("max_abs_err") == 0.007874)
  }

  test("contamination flags an eval doc that duplicates a train doc, and nothing else") {
    import spark.implicits._
    val ids = (1L to 60L)
    val split = Sampling.hashSplit(ids.toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val trainId = ids.find(split(_) == "train").get
    val evalId = ids.find(split(_) != "train").get
    val dupText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = ids.map { id =>
      val text =
        if (id == trainId || id == evalId) dupText
        else s"w${id}a w${id}b w${id}c w${id}d w${id}e w${id}f" // disjoint shingle sets
      (id, text)
    }.toDF("doc_id", "text")
    val rows = Dedup.contamination(corpus, "doc_id", "text").collect()
    assert(rows.length == 1, s"expected exactly the planted leak, got ${rows.toSeq}")
    val row = rows.head
    assert(row.getAs[Long]("doc_id") == evalId)
    assert(row.getAs[String]("split") == split(evalId))
    assert(row.getAs[Long]("n_train_matches") == 1L)
    assert(row.getAs[Long]("first_train_id") == trainId)
  }

  test("BPE merge loop: greedy left-to-right merges, deterministic argmax, merged vocab") {
    import spark.implicits._
    // 'aa' appears 3x in "aaaa" pairs + 2x in "aaab" + 1x in "aab" = 6; after the
    // aa-merge, back-to-back runs must merge GREEDILY ("aaaa" -> [aa, aa], giving an
    // (aa, aa) pair), not skip-chain ("aaaa" -> [aa, a, a])
    val docs = Seq((1L, "aaaa aaab"), (2L, "aab xy")).toDF("doc_id", "text")
    val m = pipeline.TextStats.bpeMergeLoop(docs, "doc_id", "text", rounds = 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))).toMap
    assert(m(1) == (("a", "a", "aa", 6L)))
    // post-merge pairs: "aaaa"->[aa,aa] gives (aa,aa); "aaab"->[aa,a,b] gives
    // (aa,a),(a,b); "aab"->[aa,b] gives (aa,b); "xy" gives (x,y) — all count 1,
    // so the (count desc, pair asc) argmax is lexicographic: (a, b)
    assert(m(2) == (("a", "b", "ab", 1L)))
  }

  test("BPE encode prices docs in post-merge symbols (greedy consumption respected)") {
    import spark.implicits._
    // rounds=2 learns (a,a)->aa then (a,b)->ab (see the merge-loop test above):
    // "aaaa"->[aa,aa], "aaab"->[aa,ab], "aab"->[aa,b] (its 'a' was consumed by the
    // aa merge, so ab must NOT fire), "xy"->[x,y]
    val docs = Seq((1L, "aaaa aaab"), (2L, "aab xy")).toDF("doc_id", "text")
    val enc = pipeline.TextStats.bpeEncode(docs, "doc_id", "text", rounds = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(enc(1L) == ((2L, 8L, 4L)), s"doc 1: $enc")
    assert(enc(2L) == ((2L, 5L, 4L)), s"doc 2: $enc")
  }

  test("BPE merges symbols containing backslashes and quotes verbatim (no splice rewrite)") {
    import spark.implicits._
    // a backslash symbol spliced into SQL text would parse as an escape and merge the
    // wrong pair; as literal columns the pattern is data
    val docs = Seq((1L, "a\\ a\\ x'y")).toDF("doc_id", "text")
    val m = pipeline.TextStats.bpeMergeLoop(docs, "doc_id", "text", rounds = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(m.toSeq == Seq(("a", "\\", "a\\", 2L)), m.toSeq.toString)
    val enc = pipeline.TextStats.bpeEncode(docs, "doc_id", "text", rounds = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // tokens: a\ a\ x'y -> 3 tokens, 7 chars; post-merge: [a\][a\][x,',y] = 5 symbols
    assert(enc == Seq((3L, 7L, 5L)), enc.toString)
  }

  test("BPE training stops early when the pair table runs dry (no exception, partial table)") {
    import spark.implicits._
    // single-char tokens have no adjacent pairs: zero merges, not a crash
    val singles = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(pipeline.TextStats.bpeMergeLoop(singles, "doc_id", "text", rounds = 3).count() == 0L)
    val encSingles = pipeline.TextStats.bpeEncode(singles, "doc_id", "text", rounds = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(encSingles(1L) == ((3L, 3L, 3L)), s"unmerged symbols price at one per char: $encSingles")
    // "aa aa" supports exactly one merge; asking for 3 rounds ships the 1 that exists
    val tiny = Seq((1L, "aa aa")).toDF("doc_id", "text")
    val m = pipeline.TextStats.bpeMergeLoop(tiny, "doc_id", "text", rounds = 3).collect()
    assert(m.map(_.getString(3)).toSeq == Seq("aa"), m.toSeq.toString)
    val enc = pipeline.TextStats.bpeEncode(tiny, "doc_id", "text", rounds = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(enc == Seq((2L, 4L, 2L)), enc.toString)
  }

  test("BPE excludes separator-containing tokens: training ignores them, encode drops them") {
    import spark.implicits._
    // "a|a" would parse as phantom symbol runs in the doubled-separator repr and
    // inflate the (a, a) pair count; the dictionary filter must keep it out of
    // training, and encode's vocab join must drop it from the per-doc totals
    val dirty = Seq((1L, "aa a|a aa")).toDF("doc_id", "text")
    val clean = Seq((1L, "aa aa")).toDF("doc_id", "text")
    val mDirty = pipeline.TextStats.bpeMergeLoop(dirty, "doc_id", "text", rounds = 1).collect()
    val mClean = pipeline.TextStats.bpeMergeLoop(clean, "doc_id", "text", rounds = 1).collect()
    assert(mDirty.map(_.toSeq).toSeq == mClean.map(_.toSeq).toSeq,
      s"pipe token must not reach pair statistics: ${mDirty.toSeq} vs ${mClean.toSeq}")
    val enc = pipeline.TextStats.bpeEncode(dirty, "doc_id", "text", rounds = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // only the two "aa" occurrences are priced: 2 tokens, 4 chars, 2 post-merge symbols
    assert(enc(1L) == ((2L, 4L, 2L)), s"encode must drop the excluded token: $enc")
  }

  test("semDedup keeps the min-id representative per near-twin group, within cells only") {
    import spark.implicits._
    // centroidMod=2 -> centroids 0:[1,0], 2:[0,1], 4:[-1,0]; members cluster around
    // them, so cell 0 holds {0,1,3} (a 3-chain of near-twins), cell 2 holds {2,5},
    // cell 4 holds {4} alone
    val emb = Seq(
      0L -> Seq(1.0, 0.0), 1L -> Seq(0.9, 0.1), 2L -> Seq(0.0, 1.0),
      3L -> Seq(1.0, 0.05), 4L -> Seq(-1.0, 0.0), 5L -> Seq(-0.05, 1.0)
    ).toDF("vec_id", "embedding")
    val r = pipeline.Similarity.semDedup(emb, "vec_id", "embedding", threshold = 0.4,
      centroidMod = 2)
      .collect().map(x => x.getLong(0) -> ((x.getLong(2), x.getBoolean(3)))).toMap
    assert(r(0L) == ((0L, true)) && r(2L) == ((0L, true)) && r(4L) == ((0L, true)), r.toString)
    assert(r(1L) == ((1L, false)), s"id 1 has one lower near-twin (0): $r")
    assert(r(3L) == ((2L, false)), s"id 3 has two lower near-twins (0, 1): $r")
    assert(r(5L) == ((1L, false)), s"id 5 has one lower near-twin (2): $r")
  }

  test("lexicalTopK df cap: 1.0 is the identity; capping drops stopword contributions only") {
    import spark.implicits._
    // "the" appears in every doc (df fraction 1.0); distinctive tokens carry the signal
    val docs = Seq((0L, "the apple pie"), (1L, "the apple tart"),
      (2L, "the banana split"), (3L, "the code review")).toDF("doc_id", "text")
    def scores(cap: Option[Double]): Map[(Long, Long), Long] =
      pipeline.Retrieval.lexicalTopK(docs, docs, "doc_id", "text", k = 10, cap)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
          r.getAs[Long]("lex_micro")).toMap
    val exact = scores(None)
    assert(scores(Some(1.0)) == exact, "cap 1.0 must be the identity")
    val capped = scores(Some(0.9))
    // the cap removes the "the" postings, so pairs whose ONLY shared token was the
    // stopword vanish from the candidate set — the posting-join-size win — and the
    // surviving pairs (the two "apple" docs) lose exactly the stopword contribution
    // (dl and corpus totals still count it: the cap prunes postings, it does not
    // rewrite the corpus statistics)
    assert(capped.keySet == Set((0L, 1L), (1L, 0L)),
      s"only the apple pair shares a non-stopword token: $capped")
    assert(capped.forall { case (k2, v) => v < exact(k2) },
      s"capped scores must drop the stopword contribution: $capped vs $exact")
  }

  test("RRF fusion: integer rank algebra, absent list contributes 0, fused order re-windowed") {
    import spark.implicits._
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)).toDF("query_id", "neighbor_id", "rank")
    val sem = Seq((1L, 11L, 1), (1L, 13L, 2)).toDF("query_id", "neighbor_id", "rank")
    val r = pipeline.Retrieval.rrfFuseTopK(lex, sem, k = 3)
      .collect().map(x => (x.getAs[Long]("neighbor_id"),
        (x.getAs[Int]("lex_rank"), x.getAs[Int]("sem_rank"),
          x.getAs[Long]("rrf_score"), x.getAs[Int]("rank")))).toMap
    // 11 fuses both lists: 1000000/62 + 1000000/61 = 16129 + 16393; 10 is lex-only
    // (sem contributes 0), 13 sem-only; 12 (lex score 1000000/63 = 15873) is cut at k=3
    assert(r(11L) == ((2, 1, 32522L, 1)), r.toString)
    assert(r(10L) == ((1, 0, 16393L, 2)), r.toString)
    assert(r(13L) == ((0, 2, 16129L, 3)), r.toString)
    assert(!r.contains(12L), s"k=3 must cut the weakest: $r")
  }

  test("two-hop counts exclude self-returns and direct edges") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (2L, 4L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = GraphQueries.twoHopCounts(e)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // 1: {3 via 2 (direct, dropped), 4 via 2} = 1; 2: {1 via 3} = 1; 3: {2 via 1} = 1
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
