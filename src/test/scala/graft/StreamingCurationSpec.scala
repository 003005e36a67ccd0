package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.OutputMode

import graft.sources.DocumentSources
import graft.streaming.StreamOps

/** The streaming curation pipeline END-TO-END: JSONL corpus files arrive over time
  * → [[DocumentSources.streamJsonlDocs]] splits clean/quarantine off one source →
  * the clean stream drives the live drift monitor whose emissions stay equal to the
  * batch t37 operator over every file-arrival prefix, while the quarantine stream
  * counts the malformed lines. This is the composed contract the pieces are
  * individually pinned for — proven here as one wiring.
  */
class StreamingCurationSpec extends SparkSpec {

  test("files arriving over time drive drift + quarantine consistent with batch") {
    import spark.implicits._
    val bks = 64
    // the frozen reference LM: last snapshot's per-source hashed counts
    val early = Seq((0L, "a b c a", "s1"), (1L, "b c d", "s2"))
    val reference: Map[String, Map[Long, Long]] = early.groupBy(_._3).map { case (src, ds) =>
      src -> ds.flatMap(_._2.split(" ")).groupBy(t => md5Slot(t, bks.toLong))
        .map { case (b, ts) => b -> ts.size.toLong }
    }

    val dir = Files.createTempDirectory("graft-curation").toString
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.writeString(java.nio.file.Paths.get(s"$dir/$name"), lines.mkString("\n"))

    writeFile("batch1.jsonl", Seq(
      """{"doc_id":100,"text":"a b x","source":"s1"}""",
      """{"doc_id":101,"text":"d d","source":"s2"}""",
      """totally broken line"""))

    val (docs, quarantine) = DocumentSources.streamJsonlDocs(spark, dir)
    val driftQ = StreamOps.streamingDrift(docs, "source", "text", reference, bks)
      .toDF().writeStream.format("memory").queryName("cur_drift")
      .outputMode(OutputMode.Update()).start()
    val quarQ = quarantine.writeStream.format("memory").queryName("cur_quar").start()

    try {
      def checkAgainstBatch(prefix: Seq[(Long, String, String)]): Unit = {
        val got = spark.sql(
          """SELECT source, nTokens, klMicroNats FROM (
            |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY nTokens DESC) AS rk
            |  FROM cur_drift)
            |WHERE rk = 1""".stripMargin)
          .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        val batch = graft.pipeline.TextStats.sourceDriftHashed(
          (early ++ prefix).toDF("doc_id", "text", "source"),
          "doc_id", "text", "source", cutId = 100L, buckets = bks)
          .collect()
          .map(r => r.getString(0) -> ((r.getAs[Long]("n_late_tokens"),
            r.getAs[Long]("kl_micro_nats")))).toMap
        got.foreach { case (src, v) => assert(batch(src) == v, s"$src: $v vs ${batch(src)}") }
        assert(got.nonEmpty)
      }

      driftQ.processAllAvailable(); quarQ.processAllAvailable()
      checkAgainstBatch(Seq((100L, "a b x", "s1"), (101L, "d d", "s2")))
      assert(spark.sql("SELECT * FROM cur_quar").count() == 1)

      // a second file lands later — the monitor advances, batch parity holds on
      // the longer prefix, the quarantine keeps counting
      writeFile("batch2.jsonl", Seq(
        """{"doc_id":102,"text":"y y z","source":"s1"}""",
        """{"doc_id":103,"source":"s2"}""")) // no text → quarantined
      driftQ.processAllAvailable(); quarQ.processAllAvailable()
      checkAgainstBatch(Seq(
        (100L, "a b x", "s1"), (101L, "d d", "s2"), (102L, "y y z", "s1")))
      assert(spark.sql("SELECT * FROM cur_quar").count() == 2)
    } finally { driftQ.stop(); quarQ.stop() }
  }

  test("the full ingest gauntlet: quarantine, dedup probe, decontamination AND Gopher gates off one stream") {
    import spark.implicits._
    // the two persisted gate artifacts a production ingest probes: the corpus'
    // band index (d17/d18) and the eval suite's n-gram index (d19/d20)
    val archive = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val benchmark = Seq(
      (10L, "the secret benchmark answer is forty two exactly"))
      .toDF("doc_id", "text")
    val scratch = Files.createTempDirectory("graft-gauntlet").toString
    graft.pipeline.Dedup.saveDedupIndex(
      graft.pipeline.Dedup.dedupIndex(archive, "doc_id", "text"), s"$scratch/bands")
    graft.pipeline.Dedup.saveBenchIndex(
      graft.pipeline.Dedup.benchIndex(benchmark, "doc_id", "text"), s"$scratch/bench")
    val bandIdx = graft.pipeline.Dedup.loadDedupIndex(spark, s"$scratch/bands")
    val benchIdx = graft.pipeline.Dedup.loadBenchIndex(spark, s"$scratch/bench")

    val dir = Files.createTempDirectory("graft-gauntlet-in").toString
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.writeString(java.nio.file.Paths.get(s"$dir/$name"), lines.mkString("\n"))
    writeFile("b1.jsonl", Seq(
      """{"doc_id":100,"text":"the quick brown fox jumps over the lazy dog again and again","source":"s1"}""",
      """{"doc_id":101,"text":"quote the secret benchmark answer is forty two exactly here","source":"s1"}""",
      """{"doc_id":102,"text":"a genuinely novel document passing every gate with plenty of distinct tokens spread across it covering enough span that no repeated ngram dominates character mass while several additional harmless filler phrases extend things further downward","source":"s2"}""",
      """not even json"""))

    val (docs, quarantine) = DocumentSources.streamJsonlDocs(spark, dir)
    val dups = scala.collection.mutable.Map.empty[Long, Long]
    val contam = scala.collection.mutable.Map.empty[Long, Long]
    val dedupQ = StreamOps.streamingIncrementalDedup(
        docs, "doc_id", "text", bandIdx,
        onBatch = (out, _) => dups.synchronized {
          out.collect().foreach(r => dups(r.getAs[Long]("doc_id")) = r.getAs[Long]("dup_of"))
        })
      .start()
    val decontamQ = StreamOps.streamingDecontaminate(
        docs, "doc_id", "text", benchIdx,
        onBatch = (out, _) => contam.synchronized {
          out.collect().foreach(r =>
            contam(r.getAs[Long]("doc_id")) = r.getAs[Long]("first_bench_id"))
        })
      .start()
    // the filter-battery leg beside the artifact probes: the FULL Gopher gate
    // (t48) on the same stream, thresholds tuned to the short planted docs
    val gopher = scala.collection.mutable.Map.empty[Long, Int]
    val gopherQ = StreamOps.streamingGopherGate(
        docs, "doc_id", "text",
        onBatch = (out, _) => gopher.synchronized {
          out.collect().foreach(r => gopher(r.getAs[Long]("doc_id")) = r.getAs[Int]("kept"))
        },
        minWords = 5L, requiredWords = Seq("the", "a"), minRequiredHits = 1)
      .start()
    val quarQ = quarantine.writeStream.format("memory").queryName("gauntlet_quar").start()

    try {
      def settle(): Unit = {
        dedupQ.processAllAvailable(); decontamQ.processAllAvailable()
        gopherQ.processAllAvailable(); quarQ.processAllAvailable()
      }
      settle()
      // batch 1: the archive copy trips ONLY the dedup gate, the benchmark quote
      // trips ONLY the decontamination gate, the novel doc passes both, the
      // malformed line lands in quarantine — each evidence stream is disjoint
      assert(dups.synchronized(dups.toMap) == Map(100L -> 1L), dups.toString)
      assert(contam.synchronized(contam.toMap) == Map(101L -> 10L), contam.toString)
      assert(spark.sql("SELECT * FROM gauntlet_quar").count() == 1)

      // a later file: a second archive copy still resolves to the same keeper,
      // and prior verdicts are untouched (gates are stateless probes)
      writeFile("b2.jsonl", Seq(
        """{"doc_id":103,"text":"the quick brown fox jumps over the lazy dog again and again","source":"s2"}"""))
      settle()
      assert(dups.synchronized(dups.toMap) == Map(100L -> 1L, 103L -> 1L), dups.toString)
      assert(contam.synchronized(contam.toMap) == Map(101L -> 10L), contam.toString)

      // batch parity across the whole arrival prefix for both gates
      val arrivals = Seq(
        (100L, "the quick brown fox jumps over the lazy dog again and again"),
        (101L, "quote the secret benchmark answer is forty two exactly here"),
        (102L, "a genuinely novel document passing every gate with plenty of distinct tokens spread across it covering enough span that no repeated ngram dominates character mass while several additional harmless filler phrases extend things further downward"),
        (103L, "the quick brown fox jumps over the lazy dog again and again"))
        .toDF("doc_id", "text")
      val batchDups = graft.pipeline.Dedup.incrementalDedupAgainst(
          graft.pipeline.Dedup.dedupIndex(arrivals, "doc_id", "text"), "doc_id", bandIdx)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_of")).toMap
      val batchContam = graft.pipeline.Dedup.decontaminateAgainst(
          arrivals, "doc_id", "text", benchIdx)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("first_bench_id")).toMap
      assert(dups.synchronized(dups.toMap) == batchDups)
      assert(contam.synchronized(contam.toMap) == batchContam)
      // the Gopher leg's verdicts arrived for every doc on the same stream,
      // identical to the batch t48 gate over the whole arrival prefix
      val batchGopher = graft.pipeline.TextStats.gopherGate(arrivals, "doc_id", "text",
          minWords = 5L, requiredWords = Seq("the", "a"), minRequiredHits = 1)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("kept")).toMap
      assert(gopher.synchronized(gopher.toMap) == batchGopher, gopher.toString)
      assert(gopher.synchronized(gopher(102L)) == 1, "the novel doc passes the battery")
    } finally { dedupQ.stop(); decontamQ.stop(); gopherQ.stop(); quarQ.stop() }
  }
}
