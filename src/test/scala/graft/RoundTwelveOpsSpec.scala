package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Sampling, Similarity, TextStats}
import graft.streaming.StreamOps

/** Round-12 pins: the dc09 epoch materializer (one text scan, packing mirrored
  * in plain Scala), dc10 upsampling invariants, and the advisor-found guard
  * rails (empty coverage register, mixExecute overflow, legacy centroid
  * artifact).
  */
class RoundTwelveOpsSpec extends SparkSpec {
  import spark.implicits._

  private def deleteRecursively(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
  }

  /** ~30 docs over two skewed sources: srcBig large enough to be downsampled,
    * srcTiny small enough that a temperature budget upsamples it.
    */
  private def plantedDocs = {
    val big = (1L to 26L).map(i =>
      (i, s"document number $i with some shared words and token$i tail", "srcBig"))
    val tiny = (101L to 103L).map(i => (i, s"tiny source doc $i distinct words", "srcTiny"))
    (big ++ tiny).toDF("doc_id", "text", "source")
  }

  test("dc09: epochPack's packing stage matches a plain-Scala fold over the priced manifest") {
    val docs = plantedDocs
    val scratch = java.nio.file.Files.createTempDirectory("graft-r12-bpe")
    try {
      val path = scratch.toString + "/merges"
      TextStats.bpeSaveMerges(TextStats.bpeMergeLoop(docs, "doc_id", "text", rounds = 4), path)
      val merges = TextStats.bpeLoadMerges(spark, path)
      val out = Sampling.epochPack(docs, "doc_id", "source", "text", merges,
        alphaMicro = 300000L, budgetDocs = 20L, budgetTokens = 20L, nGroups = 2)
        .collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("pack_group"), r.getAs[Long]("bin")) ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"), r.getAs[Int]("rk_first"), r.getAs[Int]("rk_last")))
        .toMap

      // independent mirror of the packing stage: manifest and pricing come from the
      // two already-oracle-pinned kernels, the concat-and-cut fold is plain Scala
      val manifest = Sampling.mixExecute(docs, "doc_id", "source",
          alphaMicro = 300000L, budgetDocs = 20L)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Int]("rk")))
      val priced = TextStats.bpeEncodeWith(
          docs.join(manifest.map(_._1).toSeq.toDF("doc_id"), "doc_id"), "doc_id", "text", merges)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_syms")).toMap
      val bucketOf = docs.select(col("doc_id"), Sampling.bucketCol(col("doc_id")).as("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      final case class PackRow(src: String, pg: Long, bucket: Long, id: Long, rk: Int, syms: Long)
      val expected = manifest.toSeq
        .map { case (id, src, rk) =>
          PackRow(src, bucketOf(id) % 2, bucketOf(id), id, rk, priced.getOrElse(id, 0L)) }
        .groupBy(p => (p.src, p.pg))
        .flatMap { case ((src, pg), rows) =>
          var cum = 0L
          rows.sortBy(p => (p.bucket, p.id)).map { p =>
            val bin = cum / 20L
            cum += p.syms
            (bin, p.rk, p.syms)
          }.groupBy(_._1).map { case (bin, members) =>
            (src, pg, bin) ->
              ((members.size.toLong, members.map(_._3).sum, members.map(_._2).min, members.map(_._2).max))
          }
        }
      assert(out == expected, s"packs differ:\n got $out\n exp $expected")
      assert(out.size > 2, "planted corpus must produce multiple packs")
      // manifest mass conservation: every admitted doc lands in exactly one pack
      assert(out.values.map(_._1).sum == manifest.size.toLong)
    } finally deleteRecursively(scratch)
  }

  test("dc09: the corpus text column is scanned exactly once (the funnel-across-jobs pin)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-r12-docs")
    try {
      val docsPath = dir.toString + "/documents"
      plantedDocs.write.parquet(docsPath)
      val mergesPath = dir.toString + "/merges"
      // tokenizer training is its own job by design (train once, ship the
      // artifact) — it happens before the listener window opens
      TextStats.bpeSaveMerges(
        TextStats.bpeMergeLoop(spark.read.parquet(docsPath), "doc_id", "text", rounds = 4),
        mergesPath)

      val plans = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
          // an eager localCheckpoint reports twice — once as the inner "rdd"
          // materialization and once as "localCheckpoint", two QueryExecution
          // objects around ONE physical job — keep the outer report only
          if (funcName != "rdd")
            plans.add(System.identityHashCode(qe) ->
              qe.executedPlan.toString.split("== Initial Plan ==")(0))
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        Sampling.epochPack(spark.read.parquet(docsPath), "doc_id", "source", "text",
          TextStats.bpeLoadMerges(spark, mergesPath),
          alphaMicro = 300000L, budgetDocs = 20L, budgetTokens = 20L, nGroups = 2)
          .collect()
        // listener delivery is async on the shared bus — wait until it quiesces
        var last = -1
        var stable = 0
        var waited = 0
        while (stable < 3 && waited < 100) {
          if (plans.size == last) stable += 1 else { stable = 0; last = plans.size }
          Thread.sleep(100); waited += 1
        }
      } finally spark.listenerManager.unregister(listener)

      import scala.jdk.CollectionConverters._
      // a text-bearing scan of the corpus = a FileScan line naming the documents
      // dir whose output includes the text column. The same QueryExecution is
      // reported twice for an eager localCheckpoint (funcName "rdd" then
      // "localCheckpoint"), so dedup on the QueryExecution's identity first.
      val textScans = plans.asScala.toSeq
        .groupBy(_._1).values.map(_.head._2).toSeq
        .flatMap(_.linesIterator)
        .filter(l => l.contains("FileScan parquet") || l.contains("Scan parquet"))
        .count(l => l.contains("documents") && l.contains("text"))
      assert(textScans == 1,
        s"expected exactly one text-bearing corpus scan across all epochPack jobs, saw $textScans")
    } finally deleteRecursively(dir)
  }

  test("dc10: per-source repeat mass equals the plan exactly, and upsampling actually fires") {
    val docs = plantedDocs
    val out = Sampling.mixExecuteUpsampled(docs, "doc_id", "source",
        alphaMicro = 300000L, budgetDocs = 40L)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("rk"), r.getAs[Long]("target_docs"), r.getAs[Long]("repeat_factor")))
    // sum(repeat_factor) per source == target_docs in EVERY regime (downsample,
    // exact, upsample): n·base + rem = target by construction
    out.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.map(_._5).sum == rows.head._4,
        s"$src: repeat mass ${rows.map(_._5).sum} != target ${rows.head._4}")
    }
    // srcTiny has 3 docs; with budget 40 and alpha 0.3 its temperature target
    // exceeds its size, so the planted scenario MUST exercise repeat_factor > 1
    val tiny = out.filter(_._1 == "srcTiny")
    assert(tiny.nonEmpty && tiny.head._4 > 3L, s"planted target must exceed n_docs: ${tiny.headOption}")
    assert(tiny.length == 3, "an upsampled source keeps ALL its docs")
    assert(tiny.exists(_._5 > 1L), s"no repeat_factor > 1 in $tiny")
    // the first (target mod n) docs in hash order carry the +1
    val base = tiny.head._4 / 3L
    val rem = (tiny.head._4 % 3L).toInt
    tiny.sortBy(_._3).zipWithIndex.foreach { case ((_, _, _, _, rf), i) =>
      assert(rf == (if (i < rem) base + 1 else base), s"doc at rank ${i + 1} has factor $rf")
    }
    // ...and the non-upsampled rows agree with mixExecute verbatim
    val plain = Sampling.mixExecute(docs, "doc_id", "source",
        alphaMicro = 300000L, budgetDocs = 40L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rk"))).toMap
    out.filter(t => t._4 <= 26L && t._1 == "srcBig").foreach { case (_, id, rk, _, rf) =>
      assert(rf == 1L && plain.get(id).contains(rk))
    }
  }

  test("d21: probing the appended index equals probing the index rebuilt over corpus ∪ batch") {
    import graft.pipeline.Dedup
    // near-dup plants across the waves: 1≈11 (archive vs appended wave),
    // 2≈21 (archive vs probe wave), 12≈22 (appended wave vs probe wave)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "a completely different archive document with its own words"),
      (3L, "third archive entry nothing like the others at all"),
      (11L, "the quick brown fox jumps over the lazy dog again and again"),
      (12L, "fresh ingest text that the later wave will also carry forward"),
      (21L, "a completely different archive document with its own words"),
      (22L, "fresh ingest text that the later wave will also carry forward"),
      (23L, "entirely novel probe document matching nothing before it")
    ).toDF("doc_id", "text")
    val archive = docs.filter(col("doc_id") < 10)
    val wave1 = docs.filter(col("doc_id") >= 10 && col("doc_id") < 20)
    val probe = Dedup.dedupIndex(docs.filter(col("doc_id") >= 20), "doc_id", "text")
      .localCheckpoint(true)

    val dir = java.nio.file.Files.createTempDirectory("graft-r12-append")
    try {
      val path = dir.toString + "/index"
      Dedup.saveDedupIndex(Dedup.dedupIndex(archive, "doc_id", "text"), path)
      Dedup.appendToDedupIndex(Dedup.dedupIndex(wave1, "doc_id", "text"), path)
      val appended = Dedup.incrementalDedupAgainst(
          probe, "doc_id", Dedup.loadDedupIndex(spark, path).localCheckpoint(true))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val rebuilt = Dedup.incrementalDedupAgainst(
          probe, "doc_id",
          Dedup.dedupIndex(archive.unionByName(wave1), "doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(appended == rebuilt, s"appended $appended != rebuilt $rebuilt")
      // the planted collisions actually fire: 21 dups the archive, 22 dups wave1
      val dupOf = appended.map(t => t._1 -> t._2).toMap
      assert(dupOf.get(21L).contains(2L) && dupOf.get(22L).contains(12L), appended.toString)
      assert(!dupOf.contains(23L), "novel doc must not collide")
      // the appended generation preserves the band=N directory layout
      val bandDirs = new java.io.File(path).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("band=")).toSet
      assert(bandDirs.nonEmpty, "band partition dirs missing after append")
    } finally deleteRecursively(dir)
  }

  test("t38/t39: the trained classifier separates planted good/bad docs with disjoint vocab") {
    // good docs pass every t05 gate (>=10 tokens, stopwords, short mean length);
    // bad docs fail (no stopwords + gibberish tokens). Vocabularies are disjoint,
    // so three LR rounds must push good-slot weights positive and bad-slot
    // weights negative — the scored labels then reproduce the supervision.
    val good = (1L to 6L).map(i =>
      (i, s"the cat sat on a mat of warm wool and felt fine day$i"))
    val bad = (11L to 16L).map(i =>
      (i, s"zzzzqqqqxxxxwwww$i kkkkjjjjhhhhgggg qqqywvvvvbbbbnnnnmmmm"))
    val docs = (good ++ bad).toDF("doc_id", "text")
    val labels = graft.pipeline.TextStats.qualityFilter(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("kept")).toMap
    assert(good.forall(d => labels(d._1) == 1) && bad.forall(d => labels(d._1) == 0),
      s"supervision must be planted correctly: $labels")

    val dir = java.nio.file.Files.createTempDirectory("graft-r12-lr")
    try {
      val path = dir.toString + "/weights"
      graft.pipeline.TextStats.saveLrWeights(
        graft.pipeline.TextStats.lrQualityTrain(docs, "doc_id", "text",
          buckets = 64, rounds = 3, lrMicro = 500000L), path)
      val loaded = graft.pipeline.TextStats.loadLrWeights(spark, path)
      val scored = graft.pipeline.TextStats.lrScoreWith(docs, "doc_id", "text", loaded, buckets = 64)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("margin_micro"), r.getAs[Long]("p_micro"), r.getAs[String]("label"))).toMap
      good.foreach { case (id, _) =>
        assert(scored(id)._1 > 0 && scored(id)._3 == "keep", s"good doc $id: ${scored(id)}")
      }
      bad.foreach { case (id, _) =>
        assert(scored(id)._1 < 0 && scored(id)._3 == "drop", s"bad doc $id: ${scored(id)}")
      }
      // p_micro is a probability in micro-units, monotone in the margin
      val pGood = good.map(d => scored(d._1)._2).min
      val pBad = bad.map(d => scored(d._1)._2).max
      assert(pGood > 500000L && pBad < 500000L, s"separation: min-good $pGood, max-bad $pBad")
    } finally deleteRecursively(dir)
  }

  test("s26: beam search over the kNN graph recovers most of the exact top-k (the s07 recall discipline)") {
    // 4 tight clusters around orthogonal axes in 8 dims, deterministic jitter —
    // the kNN graph is well-connected within clusters, so a 2-round beam walk
    // entered through the trained-quantizer medoids must recover most exact
    // neighbors
    val vecs = (for {
      c <- 0 until 4
      j <- 0 until 10
    } yield {
      val v = Array.fill(8)(0.0f)
      v(2 * c) = 1.0f
      for (i <- 0 until 8) v(i) = v(i) + 0.05f * (((i * 7 + j * 13 + c * 3) % 5) - 2)
      (c * 10L + j, v)
    }).toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") % 10 === 3)
    val graph = graft.pipeline.Similarity
      .knnGraph(vecs, "vec_id", "embedding", k = 5, dims = 8)
      .localCheckpoint(true)
    val model = graft.pipeline.Similarity
      .kmeansRounds(vecs, "vec_id", "embedding", k = 8, dims = 8, rounds = 2)
    val got = graft.pipeline.Similarity
      .graphAnnSearch(queries, vecs, "vec_id", "embedding", graph, model,
        k = 5, beam = 8, rounds = 2, entryProbe = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    val truth = graft.pipeline.Similarity
      .bruteForceTopK(queries, vecs, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    val byQ = truth.groupBy(_._1)
    val gotByQ = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = byQ.map { case (q, t) =>
      val hits = t.count(p => gotByQ.getOrElse(q, Set.empty).contains(p._2))
      hits.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall@5 $mean < 0.6 (recalls per query: $recalls)")
    // every query answered, and answers never include the query itself
    assert(gotByQ.keySet == byQ.keySet)
    assert(got.forall(p => p._1 != p._2))
  }

  test("d21: band-directory pruning holds across appended file generations (measured)") {
    import graft.pipeline.Dedup
    import org.apache.spark.sql.execution.FileSourceScanExec
    val archive = (1L to 20L).map(i => (i, s"archive document number $i with plenty of words inside"))
      .toDF("doc_id", "text")
    val wave = (101L to 110L).map(i => (i, s"ingest wave document $i with other words entirely"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-r12-prune")
    try {
      val path = dir.toString + "/index"
      Dedup.saveDedupIndex(Dedup.dedupIndex(archive, "doc_id", "text"), path)
      Dedup.appendToDedupIndex(Dedup.dedupIndex(wave, "doc_id", "text"), path)
      def parquetFiles(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
          .flatMap(c => if (c.isDirectory) parquetFiles(c) else Seq(c))
          .filter(_.getName.endsWith(".parquet"))
      val totalFiles = parquetFiles(new java.io.File(path)).size
      val band3Files = parquetFiles(new java.io.File(s"$path/band=3")).size
      assert(band3Files >= 2, s"append must add a second file generation under band=3 ($band3Files)")
      assert(band3Files < totalFiles)
      // a one-band probe must plan only that band's files, across BOTH generations
      val q = Dedup.loadDedupIndex(spark, path).filter(col("band") === 3)
      q.collect()
      val scan = q.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }.head
      assert(scan.metrics("numFiles").value == band3Files.toLong,
        s"probe planned ${scan.metrics("numFiles").value} files; band=3 holds $band3Files of $totalFiles")
    } finally deleteRecursively(dir)
  }

  test("coverageMicro yields the zero row on an empty register instead of throwing") {
    assert(StreamOps.coverageMicro(Map.empty) == ((0L, 0L, 0L, 0L)))
    // non-empty registers unchanged
    val (n, k, ent, top) = StreamOps.coverageMicro(Map(1L -> 2L, 2L -> 2L))
    assert(n == 4L && k == 2L && top == 500000L && ent > 0L)
  }

  test("mixExecute refuses a per-source target beyond Int.MaxValue instead of wrapping") {
    val docs = Seq((1L, "one"), (2L, "two")).toDF("doc_id", "source")
      .withColumn("source", lit("only"))
    val e = intercept[IllegalArgumentException] {
      Sampling.mixExecute(docs, "doc_id", "source", budgetDocs = 3_000_000_000L)
    }
    assert(e.getMessage.contains("Int.MaxValue"), e.getMessage)
  }

  test("ivfAssignNew names the legacy-artifact condition on a model without n_members") {
    val legacy = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0))).toDF("cluster", "cv")
    val vecs = Seq((10L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfAssignNew(vecs, "vec_id", "embedding", legacy)
    }
    assert(e.getMessage.contains("legacy centroid artifact"), e.getMessage)
  }
}
