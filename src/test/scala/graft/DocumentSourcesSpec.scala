package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.DocumentSources

/** Corpus-ingest contract: schema-enforced reads, lang/source coercion, corrupt-row
  * quarantine, and clean-side compatibility with the operator suite (the ingested
  * relation must be a drop-in for documents.parquet).
  */
class DocumentSourcesSpec extends SparkSpec {

  private def write(lines: Seq[String], suffix: String): String = {
    val dir = Files.createTempDirectory("graft-docsrc").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/part-0000$suffix"), lines.mkString("\n"))
    dir
  }

  test("JSONL corpus: clean rows coerce defaults, malformed and text-less quarantine") {
    val dir = write(Seq(
      """{"doc_id":1,"text":"the quick brown fox","lang":"en","source":"web"}""",
      """{"doc_id":2,"text":"salta la volpe"}""", // lang/source missing → coerced
      """{"doc_id":3,"lang":"en","source":"web"}""", // no text → quarantine
      """{"text":"orphan text with no id"}""", // no doc_id → quarantine
      """not json at all"""
    ), ".jsonl")
    val (docs, corrupt) = DocumentSources.readJsonlDocs(spark, dir)
    val rows = docs.collect().map(r => r.getLong(0) ->
      ((r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))).toMap
    assert(rows.keySet == Set(1L, 2L))
    assert(rows(1L) == (("the quick brown fox", "en", "web", 19L)))
    assert(rows(2L) == (("salta la volpe", "und", "unknown", 14L)))
    assert(corrupt.count() == 3, corrupt.collect().mkString("|"))
  }

  test("CSV corpus dump: header + schema enforced, same split") {
    val dir = write(Seq(
      "doc_id,text,lang,source",
      "1,hello world,en,web",
      "2,bonjour monde,fr,books",
      "x,not-a-number,en,web"
    ), ".csv")
    val (docs, corrupt) = DocumentSources.readCsvDocs(spark, dir)
    assert(docs.count() == 2)
    assert(corrupt.count() == 1)
  }

  test("the ingested relation is a drop-in for the operator suite") {
    val dir = write(Seq(
      """{"doc_id":1,"text":"alpha beta gamma alpha","lang":"en","source":"web"}""",
      """{"doc_id":2,"text":"alpha beta gamma alpha","lang":"en","source":"web"}""",
      """{"doc_id":3,"text":"delta epsilon zeta eta theta","lang":"en","source":"books"}"""
    ), ".jsonl")
    val (docs, _) = DocumentSources.readJsonlDocs(spark, dir)
    // text ops run unchanged on the ingested schema
    val q = graft.pipeline.TextStats.qualityScore(docs, "doc_id", "text").collect()
    assert(q.length == 3)
    // and the dedup family finds the planted exact pair (docs 1 and 2 share text)
    val dups = graft.pipeline.Dedup.exact(docs, "doc_id", "text")
      .filter(col("n_copies") > 1).collect()
    assert(dups.length == 1 && dups.head.getAs[Long]("keep_id") == 1L &&
      dups.head.getAs[Long]("n_copies") == 2L)
  }

  test("saveCorpus: source-partitioned dirs, doc_id-sorted files, round-trip intact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Files.createTempDirectory("graft-corpus-sink").toString + "/corpus"
    graft.sources.DocumentSources.saveCorpus(docs, out, numFiles = 8)
    // per-source directory partitioning (the mixing/caps/drift read unit)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("source=")), dirs.mkString(","))
    // round trip loses nothing
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    // in-file doc_id sort → footer min/max ranges are disjoint-ish per file: a
    // point read decodes less than the whole corpus (row-group stats pruning)
    val stats = graft.pipeline.Layout.parquetColumnStats(spark, out, "doc_id")
    val perFile = stats.groupBy(_._1).map { case (_, g) => (g.map(_._3).min, g.map(_._4).max) }
    assert(perFile.exists { case (mn, mx) => mx - mn < docs.count() - 1 },
      s"no file covers a narrow id range — the in-file sort bought nothing: $perFile")
  }

  test("saveCorpus: the d16 access pattern prunes directories, files, and row groups (measured)") {
    // The LayoutFilesSpec discipline applied to the corpus sink: write a real
    // corpus, read back with the split/drift access pattern (source filter +
    // doc_id band), and measure what the reader actually touched — a regression
    // to interleaved ids would fail the disjointness and decode asserts, not
    // slip past an exists() spot check.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val hconf = spark.sparkContext.hadoopConfiguration
    val oldBlock = hconf.get("parquet.block.size")
    try {
      // small row groups so in-file stats are visible at test scale (production
      // files hold many 128 MB groups naturally)
      hconf.setInt("parquet.block.size", 16 * 1024)
      val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val out = Files.createTempDirectory("graft-corpus-prune").toString + "/corpus"
      // 40 range partitions over 20 sources → ~2 files per source dir
      graft.sources.DocumentSources.saveCorpus(docs, out, numFiles = 40)

      // (a) one contiguous id band per file per source: within every source dir,
      // per-file [min,max] are pairwise DISJOINT — the claim a hash salt breaks
      val stats = graft.pipeline.Layout.parquetColumnStats(spark, out, "doc_id")
      val bySource = stats.groupBy(t => t._1.split("/source=")(1).split("/")(0))
      val multiFile = bySource.filter(_._2.map(_._1).distinct.size >= 2)
      assert(multiFile.nonEmpty, "need at least one source split across files to check band disjointness")
      for ((src, g) <- bySource) {
        val files = g.groupBy(_._1).map { case (f, gs) => (f, gs.map(_._3).min, gs.map(_._4).max) }
          .toSeq.sortBy(_._2)
        files.sliding(2).foreach {
          case Seq((_, _, mxA), (_, mnB, _)) =>
            assert(mnB > mxA, s"source $src: file id bands overlap ($mxA vs $mnB) — ids interleaved")
          case _ =>
        }
      }

      // (b) the d16 split / drift-baseline read: one source, one id band
      val (lo, hi) = (1000L, 2000L)
      val q = spark.read.parquet(out)
        .filter(col("source") === "src3" && col("doc_id").between(lo, hi))
      val nMatch = q.count()
      val expected = docs.filter(col("source") === "src3" && col("doc_id").between(lo, hi)).count()
      assert(nMatch == expected && nMatch > 0)

      q.collect()
      val scan = q.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }.head
      // partition-directory pruning: only source=src3's files are planned at all
      val srcFiles = stats.map(_._1).distinct.filter(_.contains("source=src3"))
      val plannedFiles = scan.metrics("numFiles").value
      assert(plannedFiles == srcFiles.size.toLong,
        s"planner read $plannedFiles files, source=src3 holds ${srcFiles.size}")
      assert(srcFiles.size < stats.map(_._1).distinct.size / 5,
        "directory pruning bought less than a 5x file cut")
      // the id band must reach the reader as pushed filters
      val pushed = scan.metadata.getOrElse("PushedFilters", "")
      assert(pushed.contains("GreaterThanOrEqual(doc_id") && pushed.contains("LessThanOrEqual(doc_id"), pushed)
      // row-group skipping: decoded ≤ rows of groups whose [min,max] admit the band
      val srcStats = stats.filter(_._1.contains("source=src3"))
      val admitted = srcStats.filter { case (_, _, mn, mx, _) => mx >= lo && mn <= hi }.map(_._5).sum
      val srcRows = srcStats.map(_._5).sum
      val decoded = scan.metrics("numOutputRows").value
      assert(decoded <= admitted, s"decoded $decoded > footer-admitted $admitted")
      assert(decoded < srcRows, s"no row-group skipping inside source=src3 ($decoded of $srcRows)")
      info(s"prune: ${stats.map(_._5).sum} corpus rows -> $srcRows after dir prune -> " +
        s"$admitted footer-admitted -> $decoded decoded for $nMatch matches")
    } finally {
      if (oldBlock == null) hconf.unset("parquet.block.size")
      else hconf.set("parquet.block.size", oldBlock)
    }
  }

  test("streaming JSONL corpus: one source, clean and quarantine streams") {
    val dir = write(Seq(
      """{"doc_id":1,"text":"streaming corpus line","lang":"en","source":"web"}""",
      """{"doc_id":2,"text":"another clean line"}""",
      """garbage"""
    ), ".jsonl")
    val (docs, corrupt) = DocumentSources.streamJsonlDocs(spark, dir)
    val q1 = docs.writeStream.format("memory").queryName("docsrc_clean").start()
    val q2 = corrupt.writeStream.format("memory").queryName("docsrc_bad").start()
    try {
      q1.processAllAvailable(); q2.processAllAvailable()
      assert(spark.sql("SELECT * FROM docsrc_clean").count() == 2)
      assert(spark.sql("SELECT * FROM docsrc_bad").count() == 1)
    } finally { q1.stop(); q2.stop() }
  }
}
