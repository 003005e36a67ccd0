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

  private def bucketOf(token: String, buckets: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(token.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % buckets
  }

  test("files arriving over time drive drift + quarantine consistent with batch") {
    import spark.implicits._
    val bks = 64
    // the frozen reference LM: last snapshot's per-source hashed counts
    val early = Seq((0L, "a b c a", "s1"), (1L, "b c d", "s2"))
    val reference: Map[String, Map[Long, Long]] = early.groupBy(_._3).map { case (src, ds) =>
      src -> ds.flatMap(_._2.split(" ")).groupBy(t => bucketOf(t, bks))
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
}
