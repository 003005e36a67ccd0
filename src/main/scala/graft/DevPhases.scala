package graft

import org.apache.spark.sql.functions._

/** Dev scratch: phase-level timing of the dc20 chain (and friends) so the
  * expensive sub-operator is identified empirically, not guessed.
  * Usage: runMain graft.DevPhases [sfDir]
  */
object DevPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.builder(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.3fs")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // warmup
    docs.count(); emb.count()
    SparkEntry.queries("d03_simhash")(spark, sfDir).write.format("noop").mode("overwrite").save()

    import graft.pipeline.{Curation, Dedup, Sampling, Similarity, TextStats}
    val base = docs.select(col("doc_id"), col("source"), col("text")).localCheckpoint(true)
    time("gopherQuality") {
      TextStats.gopherQuality(base, "doc_id", "text",
        requiredWords = Seq("the", "a", "value", "line"), minRequiredHits = 2)
        .write.format("noop").mode("overwrite").save()
    }
    time("gopherRepetition") {
      TextStats.gopherRepetition(base, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("Dedup.exact") {
      Dedup.exact(base, "doc_id", "text").write.format("noop").mode("overwrite").save()
    }
    time("benchmarkDecontaminate") {
      Dedup.benchmarkDecontaminate(base, "doc_id", "text", 10L, 5)
        .write.format("noop").mode("overwrite").save()
    }
    time("semanticDecontaminate") {
      Similarity.semanticDecontaminate(emb, "vec_id", "embedding", 10L, 400000L)
        .write.format("noop").mode("overwrite").save()
    }
    val admitted = time("releaseAdmitted") {
      val a = Curation.releaseAdmitted(
        docs, emb, "doc_id", "text", "source", "vec_id", "embedding",
        benchmarkMod = 10L, shingleSize = 5,
        semanticThresholdMicro = 400000L,
        requiredWords = Seq("the", "a", "value", "line"), minRequiredHits = 2)
        .select(col("doc_id"))
      a.write.format("noop").mode("overwrite").save()
      a
    }
    val pool = time("pool checkpoint") {
      docs.join(admitted, Seq("doc_id"), "left_semi").localCheckpoint(true)
    }
    val merges = time("bpeMergeLoop") {
      TextStats.bpeMergeLoop(pool, "doc_id", "text", rounds = 4)
    }
    val scratch = java.nio.file.Files.createTempDirectory("graft-devphases")
    val path = scratch.toString + "/merges"
    time("bpeSaveMerges") { TextStats.bpeSaveMerges(merges, path) }
    time("epochPackUpsampled") {
      Sampling.epochPackUpsampled(pool, "doc_id", "source", "text",
        TextStats.bpeLoadMerges(spark, path),
        alphaMicro = 300000L, budgetDocs = 1000L,
        budgetTokens = 512L, nGroups = 8)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
