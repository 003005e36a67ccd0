package graft

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Sampling, Similarity, TextStats}

/** Round-4 curation operators: PII redaction, token-window chunking, boilerplate
  * scoring, sequence packing, cluster quality, degree histogram.
  */
class CurationSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def docsOf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // --- piiRedact ---

  test("piiRedact counts and masks emails, IPv4s, and phone numbers") {
    val docs = docsOf(
      1L -> "contact alice@example.com or bob.smith@mail.co today",
      2L -> "server at 10.0.0.1 and 192.168.1.254 up",
      3L -> "call +1 555 123 4567 now",
      4L -> "no pii here at all"
    )
    val out = TextStats.piiRedact(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 2 && out(1L).getLong(2) == 0 && out(1L).getLong(3) == 0)
    assert(out(1L).getString(4) == md5hex("contact <EMAIL> or <EMAIL> today"))
    assert(out(2L).getLong(2) == 2)
    assert(out(2L).getString(4) == md5hex("server at <IP> and <IP> up"))
    assert(out(3L).getLong(3) == 1)
    assert(out(3L).getString(4) == md5hex("call <PHONE> now"))
    assert(out(4L).getLong(1) == 0 && out(4L).getLong(2) == 0 && out(4L).getLong(3) == 0)
    assert(out(4L).getString(4) == md5hex("no pii here at all"))
  }

  test("piiRedact does not mask over-long octet runs or bare number runs") {
    val docs = docsOf(1L -> "version 1.2.3.4567 build 555 123 4567")
    val r = TextStats.piiRedact(docs, "doc_id", "text").collect()(0)
    // 4567 exceeds the 1-3 digit octet, and the phone pattern requires a leading +
    assert(r.getLong(2) == 0 && r.getLong(3) == 0)
    assert(r.getString(4) == md5hex("version 1.2.3.4567 build 555 123 4567"))
  }

  // --- chunk ---

  test("chunk cuts exact 64-token windows with a short last chunk") {
    val words = (1 to 130).map(i => s"w$i")
    val docs = docsOf(7L -> words.mkString(" "))
    val out = TextStats.chunk(docs, "doc_id", "text", chunkTokens = 64)
      .orderBy("chunk_idx").collect()
    assert(out.length == 3)
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    assert(out.map(_.getLong(2)).toSeq == Seq(64L, 64L, 2L))
    assert(out(0).getString(3) == md5hex(words.slice(0, 64).mkString(" ")))
    assert(out(2).getString(3) == md5hex(words.slice(128, 130).mkString(" ")))
  }

  test("chunk emits one chunk for short and empty documents") {
    val docs = docsOf(1L -> "a b", 2L -> "")
    val out = TextStats.chunk(docs, "doc_id", "text", chunkTokens = 64)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) == 2L && out(1L).getString(3) == md5hex("a b"))
    // split("") = [""] in both engines: one 1-token chunk hashing the empty string
    assert(out(2L).getLong(2) == 1L && out(2L).getString(3) == md5hex(""))
  }

  // --- boilerplate ---

  test("boilerplate scores the shared-passage fraction per document") {
    // 30 docs share the 3-gram "x y z"; their other 3 shingles are unique per doc
    val shared = (1 to 30).map(i => (i.toLong, s"x y z u$i a$i b$i"))
    val unique = (31 to 35).map(i => (i.toLong, s"p$i q$i r$i s$i t$i u$i"))
    val out = Dedup.boilerplate(docsOf(shared ++ unique: _*), "doc_id", "text",
      shingleSize = 3, minDocFreq = 25)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    (1 to 30).foreach { i =>
      assert(out(i.toLong) == ((4L, 1L, 0.25)), s"doc $i")
    }
    (31 to 35).foreach { i =>
      assert(out(i.toLong) == ((4L, 0L, 0.0)), s"doc $i")
    }
  }

  // --- sequencePack ---

  test("sequencePack reproduces an independent concat-and-cut computation") {
    import spark.implicits._
    val docs = (1L to 60L)
      .map(i => (i, "s", Seq.fill((i % 7 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val out = Sampling.sequencePack(docs, "doc_id", "source", "text",
      budgetTokens = 10L, nGroups = 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> (r.getLong(3), r.getLong(4)))
      .toMap
    // independent recomputation: same bucket fn as SamplingSpec, layout (bucket, id)
    def bucket(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % Sampling.Buckets
    }
    val expected = (1L to 60L)
      .map(i => (i, bucket(i), i % 7 + 1))
      .groupBy { case (_, b, _) => b % 4 }
      .flatMap { case (grp, rows) =>
        val ordered = rows.sortBy { case (id, b, _) => (b, id) }
        val cum = ordered.scanLeft(0L) { case (acc, (_, _, n)) => acc + n }
        ordered.zip(cum).map { case ((id, _, n), before) => (grp, before / 10L, n) }
      }
      .groupBy { case (grp, bin, _) => ("s", grp, bin) }
      .map { case (k, rows) => k -> ((rows.size.toLong, rows.map(_._3).sum)) }
    assert(out == expected)
    assert(out.values.map(_._1).sum == 60L)
  }

  // --- clusterQuality ---

  test("clusterQuality reports per-label cohesion against the round-6 centroid") {
    import spark.implicits._
    val vecs = Seq(
      (1L, 1, Seq(1.0f, 0.0f)),
      (2L, 1, Seq(0.0f, 1.0f)),
      (3L, 2, Seq(2.0f, 0.0f)),
      (4L, 3, Seq(0.0f, 0.0f)) // zero-norm: label 3 must not appear
    ).toDF("vec_id", "label", "embedding")
    val out = Similarity.clusterQuality(vecs, "label", "embedding")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // label 1 centroid (0.5, 0.5); both vectors at cos 1/sqrt(2) = 0.707107
    assert(out(1) == ((2L, 0.707107, 0.707107)))
    assert(out(2) == ((1L, 1.0, 1.0)))
    assert(!out.contains(3))
  }

  // --- vocabCoverage ---

  test("vocabCoverage counts tokens outside the top-k vocabulary with multiplicity") {
    val docs = docsOf(1L -> "x x x y", 2L -> "x z z")
    // k=1: vocabulary = {x} (5 occurrences)
    val out = TextStats.vocabCoverage(docs, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((4L, 1L, 0.25)))
    assert(out(2L) == ((3L, 2L, 0.666667)))
  }

  // --- sourceNovelty ---

  test("sourceNovelty counts shingles unique to each source") {
    import spark.implicits._
    val docs = Seq(
      ("A", "x y z a b c"), // shingles: xyz yza zab abc
      ("B", "x y z q r s")  // shares only "x y z" with A
    ).toDF("source", "text")
    val out = Dedup.sourceNovelty(docs, "source", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("A") == ((4L, 3L, 0.75)))
    assert(out("B") == ((4L, 3L, 0.75)))
  }

  // --- nodeJaccard ---

  test("nodeJaccard scores shared-neighbor overlap and honors the in-degree cap") {
    import spark.implicits._
    val edges = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 11L), (2L, 12L), (2L, 13L),
      (3L, 99L)
    ).toDF("src", "dst")
    val out = GraphQueries.nodeJaccardOf(edges, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 2L, 3L, 0.75)))
    // a cap of 1 drops every shared destination before the self-join
    assert(GraphQueries.nodeJaccardOf(edges, threshold = 0.0, maxInDegree = 1).count() == 0)
  }

  // --- kmeansStep ---

  test("kmeansStep assigns by cosine to seed vectors and recomputes mean centroids") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), // seed cluster 0
      (1L, Seq(0.0f, 1.0f)), // seed cluster 1
      (2L, Seq(2.0f, 0.1f)),
      (3L, Seq(0.1f, 3.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.kmeansStep(vecs, "vec_id", "embedding", k = 2, dims = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> ((r.getDouble(2), r.getLong(3)))).toMap
    assert(out((0, 1)) == ((1.5, 2L)) && out((0, 2)) == ((0.05, 2L)))
    assert(out((1, 1)) == ((0.05, 2L)) && out((1, 2)) == ((2.0, 2L)))
  }

  // --- rerankTopK ---

  test("rerank with full-dimension coarse stage equals brute force; truncation can differ") {
    import spark.implicits._
    val vecs = (0L to 19L).map(i =>
      (i, Seq(math.cos(i * 0.7).toFloat, math.sin(i * 0.7).toFloat,
        (i % 5).toFloat, (i % 3).toFloat))).toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = rows(Similarity.bruteForceTopK(q, vecs, "vec_id", "embedding", 5))
    val rerank = rows(Similarity.rerankTopK(q, vecs, "vec_id", "embedding", 5,
      coarseDims = 4, overfetch = 4))
    assert(rerank == brute, "coarse = full dims must reproduce exact search")
    // tight overfetch with a 1-dim coarse proxy is allowed to miss, never to crash
    val truncated = Similarity.rerankTopK(q, vecs, "vec_id", "embedding", 5,
      coarseDims = 1, overfetch = 1)
    assert(truncated.count() == 5)
  }

  // --- frameDedupDF ---

  test("frameDedupDF surfaces frame payloads shared across assets") {
    import graft.pipeline.Multimodal
    import org.apache.spark.sql.functions.encode
    // assets 1 and 2 share their first 8-byte frame; asset 3 is disjoint
    val docs = docsOf(
      1L -> "AAAABBBBxxxxxxxx",
      2L -> "AAAABBBByyyyyyyy",
      3L -> "zzzzzzzzqqqqqqqq")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
    val out = Multimodal.frameDedupDF(docs, "doc_id", "media", frameBytes = 8, stride = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    // one shared frame: 2 assets, 2 copies, keeper = (asset 1, frame 0)
    assert(out.toSeq == Seq((2L, 2L, 1L, 0)))
  }

  // --- Curation.funnel ---

  test("curation funnel reports cumulative survivors per stage") {
    import graft.pipeline.Curation
    // 2 near-identical quality docs (cluster keeper = min id), 1 low-quality doc
    val good = "the fast a key of order and sort table scan merge part window hash join"
    val docs = docsOf(1L -> good, 2L -> (good + " extra"), 3L -> "tiny")
    val out = Curation.funnel(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("00_total") == 3L)
    assert(out("01_quality") == 2L) // doc 3 fails the min-token filter
    assert(out("02_dedup_keeper") == 1L) // docs 1 and 2 collapse; keeper = 1
  }

  // --- kCore ---

  test("kCore peels low-degree vertices and reports residual degrees") {
    import spark.implicits._
    // 4-clique {1,2,3,4} plus pendant 5 attached to 1
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (1L, 5L))
    val und = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val out = GraphQueries.kCoreOf(und, k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // pendant peeled in round 1; the clique survives with degree 3 each
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  // --- degreeHistogram ---

  test("degreeHistogram buckets degrees into power-of-two bins, Normal edges only") {
    import graft.model.State
    val edges =
      (1 to 1).map(d => edge(alice, d, d)) ++ // degree 1 -> bucket 0
        (1 to 2).map(d => edge(bob, d, d)) ++ // degree 2 -> bucket 1
        (1 to 3).map(d => edge(carl, d, d)) ++ // degree 3 -> bucket 1
        (1 to 4).map(d => edge(darcy, d, d)) ++ // degree 4 -> bucket 2
        (1 to 2).map(d => edge(earl, d, d, state = State.Archived)) // excluded
    val out = GraphQueries.degreeHistogramOf(storeOf(edges: _*).snapshot)
      .collect().map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(0) == ((1L, 1L)))
    assert(out(1) == ((2L, 3L)))
    assert(out(2) == ((1L, 4L)))
    assert(out.size == 3)
  }
}
