package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Round-10 operators and scale guards, cross-validated against independent
  * in-test mirrors where the operator's arithmetic allows it.
  */
class RoundTenOpsSpec extends SparkSpec {

  // --------------------------------------------- minhash-LSH bucket-membership cap

  test("minhash band-bucket cap drops the quadratic clump but keeps other pairs") {
    import spark.implicits._
    // 30 byte-identical documents minhash to the SAME signature in every band —
    // the boilerplate clump (d07's quarry) that makes one (band, sig) cell
    // quadratic at corpus scale. Two more docs share text only with each other.
    val clump = (1L to 30L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
    val pair = Seq(
      (101L, "alpha beta gamma delta epsilon zeta eta theta"),
      (102L, "alpha beta gamma delta epsilon zeta eta theta"))
    val distinct = Seq((201L, "completely unrelated content about volcano geology"))
    val df = (clump ++ pair ++ distinct).toDF("doc_id", "text")

    val uncapped = Dedup.minhashLshPairs(df, "doc_id", "text",
      shingleSize = 3, bands = 16, rowsPerBand = 1, maxBucketMembers = 10000L)
      .as[(Long, Long)].collect().toSet
    val capped = Dedup.minhashLshPairs(df, "doc_id", "text",
      shingleSize = 3, bands = 16, rowsPerBand = 1, maxBucketMembers = 10L)
      .as[(Long, Long)].collect().toSet

    // uncapped: the clump contributes all 30·29/2 pairs plus the planted (101, 102)
    assert(uncapped.size >= 30 * 29 / 2 + 1)
    assert(uncapped.contains((101L, 102L)))
    // capped: every clump cell (30 > 10 members) is dropped from every band, so no
    // intra-clump pair survives — but the 2-member cell of the planted pair does
    assert(capped.contains((101L, 102L)))
    assert(capped.forall { case (a, b) => a > 30L || b > 30L })
    assert(capped.size < uncapped.size)
  }

  test("minhash cap default is capless-equivalent at bench-like scale") {
    import spark.implicits._
    // cells stay far below the 10k default → identical pair sets
    val docs = (1L to 60L).map(i =>
      (i, s"document number $i with shared trigram filler words plus token${i % 7}"))
      .toDF("doc_id", "text")
    val dflt = Dedup.minhashLshPairs(docs, "doc_id", "text").as[(Long, Long)].collect().toSet
    val huge = Dedup.minhashLshPairs(docs, "doc_id", "text", maxBucketMembers = Long.MaxValue)
      .as[(Long, Long)].collect().toSet
    assert(dflt == huge)
  }

  test("dedupClusters threads the bucket cap through to the pair kernel") {
    import spark.implicits._
    val clump = (1L to 25L).map(i => (i, "same boilerplate text in every single doc"))
    val df = clump.toDF("doc_id", "text")
    val capped = Dedup.dedupClusters(df, "doc_id", "text", maxBucketMembers = 5L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // with the clump's cells dropped there are no edges: every doc is a singleton
    assert(capped.forall { case (id, cl) => id == cl })
    val uncapped = Dedup.dedupClusters(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uncapped.values.toSet == Set(1L))
  }

  // ------------------------------------------- ev16/ev17 distributed exact rank

  private val dir = "/root/testdata/sf0.001"

  test("rfm dispatch identity: distributedRank branch equals the global-window branch") {
    val small = AnalyticsQueries.rfm(spark, dir).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    val large = AnalyticsQueries.rfm(spark, dir, maxGlobalWindowUsers = 0L).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    assert(small == large)
  }

  test("activityPareto dispatch identity across rank branches") {
    val small = AnalyticsQueries.activityPareto(spark, dir).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    val large = AnalyticsQueries.activityPareto(spark, dir, maxGlobalWindowUsers = 0L)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(small == large)
  }

  // ------------------------------------------------- q10 waiting suppliers

  test("waitingSuppliers kernel on planted orders: sole-late in multi-supplier only") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(days: Int) =
      new java.sql.Timestamp(base.getTime + days * 86400000L)
    // order 1: suppliers 10, 20; only 10 ships late  → 10 counts
    // order 2: suppliers 10, 20; both ship late      → nobody counts (not sole)
    // order 3: supplier 10 alone ships late          → not multi-supplier
    // order 4: suppliers 20, 30; only 30 ships late  → 30 counts
    val li = Seq(
      (1L, 10L, plus(90)), (1L, 20L, plus(10)),
      (2L, 10L, plus(90)), (2L, 20L, plus(95)),
      (3L, 10L, plus(90)),
      (4L, 20L, plus(5)), (4L, 30L, plus(70))
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val ord = Seq((1L, base), (2L, base), (3L, base), (4L, base))
      .toDF("o_orderkey", "o_orderdate")
    val sup = Seq((10L, "S10"), (20L, "S20"), (30L, "S30")).toDF("s_suppkey", "s_name")
    val got = AnalyticsQueries.waitingSuppliersOf(li, ord, sup).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("S10" -> 1L, "S30" -> 1L))
  }

  // ------------------------------------------------------ m06 clip near-dup

  test("clipNearDup scores planted half-overlapping clips and drops hot frames") {
    import spark.implicits._
    // 64-byte frames, stride 2 samples every even frame. Clips A and B share
    // frames 0 and 2 (identical 256-char prefix); C is unrelated.
    val frame = "x" * 64
    val f2 = "y" * 64
    val shared = frame * 4                       // frames 0..3; sampled: 0, 2
    val a = shared + f2 * 4                      // sampled: 0,2 shared + 4,6 (y)
    val b = shared + ("z" * 64) * 4              // sampled: 0,2 shared + 4,6 (z)
    val c = ("w" * 64) * 8
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
      .select(col("doc_id"), org.apache.spark.sql.functions.encode(col("text"), "UTF-8").as("media"))
    val got = graft.pipeline.Multimodal
      .clipNearDup(df, "doc_id", "media", frameBytes = 64, stride = 2,
        jaccardMicroMin = 100000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // A has 3 distinct sampled hashes {x, y} → wait: frames 0,2 are both "x"*64 →
    // ONE distinct hash; 4,6 are one more. |A| = 2, |B| = 2, shared = 1 →
    // J = 1/(2+2-1) = 1/3 → 333333 micro
    assert(got.toSeq == Seq((1L, 2L, 1L, 333333L)))
    // a hot-frame cap of 1 drops the shared frame → no pairs at all
    val capped = graft.pipeline.Multimodal
      .clipNearDup(df, "doc_id", "media", frameBytes = 64, stride = 2,
        jaccardMicroMin = 100000L, maxAssetsPerFrame = 1L)
      .collect()
    assert(capped.isEmpty)
  }

  // --------------------------------------------------------- g46 modularity

  test("modularity kernel matches direct arithmetic on a planted partition") {
    import spark.implicits._
    // two triangles bridged by one edge; the natural partition scores high
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("lo", "hi")
    val comm = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L)
      .toDF("v", "community")
    val got = GraphQueries.modularityOf(und, comm).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // mirror: m = 7; community 1 = {1,2,3}: e_in = 3, d = 2+2+3 = 7;
    // community 4 = {4,5,6}: e_in = 3, d = 3+2+2 = 7
    def micro(e: Long, d: Long): Long =
      math.floor(1000000.0 * (e.toDouble / 7.0 - (d.toDouble / 14.0) * (d.toDouble / 14.0))
        + 0.5).toLong
    assert(got(1L) == ((3L, 3L, 7L, micro(3L, 7L))))
    assert(got(4L) == ((3L, 3L, 7L, micro(3L, 7L))))
    // Q = sum of parts: high for the planted split (2 * (3/7 - 1/4) ≈ 0.357)
    val q = got.values.map(_._4).sum
    assert(q > 300000L && q < 500000L, s"Q out of the planted range: $q")
  }

  // -------------------------------------------------- d16 cluster-aware split

  test("clusterAwareSplit never lets a near-dup cluster straddle the split boundary") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // near-dup of 1 → same cluster
      (50L, "completely different text about volcano geology formations"),
      (60L, "another unrelated passage concerning maritime navigation rules"))
      .toDF("doc_id", "text")
    val out = Dedup.clusterAwareSplit(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // every member of a cluster carries the identical (bucket, split)
    out.groupBy(_._2).foreach { case (_, members) =>
      assert(members.map(m => (m._3, m._4)).distinct.size == 1)
    }
    assert(out.find(_._1 == 1L).get._2 == out.find(_._1 == 2L).get._2)
    // singleton clusters reduce exactly to the t07 per-document hash split
    val t07 = graft.pipeline.Sampling.hashSplit(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    Seq(50L, 60L).foreach { id =>
      val r = out.find(_._1 == id).get
      assert(r._2 == id && (r._3, r._4) == t07(id))
    }
  }

  // ------------------------------------------------------------ t36 Heaps fit

  test("heapsFit matches a direct-arithmetic mirror on a planted corpus") {
    import spark.implicits._
    // 6 buckets of 1 doc each (bucketDocs = 1); vocabulary grows sublinearly
    val docs = Seq(
      (0L, "a b c d"),
      (1L, "a b c e f"),
      (2L, "a b g"),
      (3L, "c d e h"),
      (4L, "a i b c"),
      (5L, "j a b")).toDF("doc_id", "text")
    val got = graft.pipeline.TextStats.heapsFit(docs, "doc_id", "text", bucketDocs = 1L)
      .collect()(0)

    // mirror straight from definitions
    val texts = Seq("a b c d", "a b c e f", "a b g", "c d e h", "a i b c", "j a b")
      .map(_.split(" ").toSeq)
    val seen = scala.collection.mutable.Set.empty[String]
    var cumToks = 0L
    val pts = texts.map { ws =>
      cumToks += ws.size
      ws.foreach(seen += _)
      (cumToks, seen.size.toLong)
    }
    def micro(x: Double): Long = math.floor(1000000.0 * x + 0.5).toLong
    val q = pts.map { case (n, v) => (micro(math.log(n.toDouble)), micro(math.log(v.toDouble))) }
    val (n, sx, sy) = (q.size.toLong, q.map(_._1).sum, q.map(_._2).sum)
    val sxy = q.map(p => p._1 * p._2).sum
    val sxx = q.map(p => p._1 * p._1).sum
    val syy = q.map(p => p._2 * p._2).sum
    val (nd, sxd, syd) = (n.toDouble, sx.toDouble, sy.toDouble)
    val covnum = nd * sxy.toDouble - sxd * syd
    val varx = nd * sxx.toDouble - sxd * sxd
    val vary = nd * syy.toDouble - syd * syd
    val slope = if (varx == 0.0) 0.0 else covnum / varx
    val r2 = if (varx * vary == 0.0) 0.0 else covnum * covnum / (varx * vary)
    assert(got.getAs[Long]("n_fit") == n)
    assert(got.getAs[Long]("slope_micro") == micro(slope))
    assert(got.getAs[Long]("intercept_micro") == math.floor((syd - slope * sxd) / nd + 0.5).toLong)
    assert(got.getAs[Long]("r2_micro") == micro(r2))
    // Heaps' law sanity: vocabulary grows, but sublinearly
    val b = got.getAs[Long]("slope_micro")
    assert(b > 0L && b < 1000000L, s"beta out of (0, 1): $b")
  }

  // --------------------------------------------------- trained k-means / IVF-PQ

  test("kmeansTrain with one round IS kmeansStep") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val step = graft.pipeline.Similarity.kmeansStep(emb, "vec_id", "embedding", k = 8, dims = 64)
      .collect().map(_.toSeq).toSet
    val train1 = graft.pipeline.Similarity.kmeansTrain(
      emb, "vec_id", "embedding", k = 8, dims = 64, rounds = 1)
      .collect().map(_.toSeq).toSet
    assert(train1 == step)
  }

  test("training actually moves the model and conserves membership") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nVecs = emb.count()
    val r1 = graft.pipeline.Similarity.kmeansTrain(
      emb, "vec_id", "embedding", k = 8, dims = 64, rounds = 1).collect()
    val r3 = graft.pipeline.Similarity.kmeansTrain(
      emb, "vec_id", "embedding", k = 8, dims = 64, rounds = 3).collect()
    // every vector is assigned in every round: per-cluster members sum to the corpus
    def members(rows: Array[org.apache.spark.sql.Row]): Long =
      rows.groupBy(_.getInt(0)).map(_._2.head.getLong(3)).sum
    assert(members(r1) == nVecs && members(r3) == nVecs)
    // rounds 2-3 moved at least one centroid coordinate
    val c1 = r1.map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val moved = r3.count(r => c1.get((r.getInt(0), r.getInt(1))).exists(_ != r.getDouble(2)))
    assert(moved > 0, "three training rounds left every centroid exactly at round 1")
  }

  test("kmeans training reaches a fixed point on well-separated clusters") {
    import spark.implicits._
    // two tight angular clusters; after round 1 every vector sits with its own
    // centroid, so assignments never change and rounds 2+ are the identity —
    // training must be a FIXED POINT, not drift from float re-accumulation
    val a = (1L to 10L).map(i => (i, Array.tabulate(8)(d => if (d < 4) 1.0f + (i % 3) * 0.01f else 0.0f)))
    val b = (11L to 20L).map(i => (i, Array.tabulate(8)(d => if (d >= 4) 1.0f + (i % 3) * 0.01f else 0.0f)))
    val df = (a ++ b).toDF("vec_id", "embedding")
    val r2 = graft.pipeline.Similarity.kmeansTrain(df, "vec_id", "embedding",
      k = 2, dims = 8, rounds = 2).collect().map(_.toSeq).toSet
    val r4 = graft.pipeline.Similarity.kmeansTrain(df, "vec_id", "embedding",
      k = 2, dims = 8, rounds = 4).collect().map(_.toSeq).toSet
    assert(r2 == r4, "extra rounds after convergence must be the identity")
  }

  test("distributedRank is an exact dense 1..n row_number under its total order") {
    import spark.implicits._
    // values with heavy ties so the tiebreak column carries the order; 7 range
    // partitions over 200 rows exercises empty/uneven partitions
    val df = (1L to 200L).map(i => (i, i % 13)).toDF("id", "v")
    val ranked = AnalyticsQueries.distributedRank(
      df, "rk", Seq(org.apache.spark.sql.functions.col("v").desc,
        org.apache.spark.sql.functions.col("id").asc), numParts = 7)
      .select("id", "v", "rk").as[(Long, Long, Long)].collect()
    val expected = (1L to 200L).map(i => (i, i % 13))
      .sortBy { case (id, v) => (-v, id) }
      .zipWithIndex.map { case ((id, v), i) => (id, v, i + 1L) }.toSet
    assert(ranked.toSet == expected)
  }
}
