package graft

import org.apache.spark.sql.functions._

import graft.pipeline.TextStats

/** Round-8 additions: the BPE artifact round-trip (train once, persist the merge
  * table, encode from the saved artifact) must reproduce the fused train+encode
  * exactly — same merge decisions, same per-doc symbol pricing.
  */
class RoundEightOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bpe merge artifact: save -> load -> encodeWith equals the fused bpeEncode") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft-bpe-test").toString + "/merges"

    val merges = TextStats.bpeMergeLoop(docs, "doc_id", "text", rounds = 4)
    TextStats.bpeSaveMerges(merges, path)
    val loaded = TextStats.bpeLoadMerges(spark, path)

    // the artifact round-trips verbatim (schema and rows)
    val saved = loaded.orderBy("round").collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[String]("merged"), r.getAs[Long]("n")))
    val direct = merges.orderBy("round").collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[String]("merged"), r.getAs[Long]("n")))
    assert(saved.nonEmpty && saved.sameElements(direct))

    def keyed(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Long)] =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"), r.getAs[Long]("n_syms")))).toMap
    val fused = keyed(TextStats.bpeEncode(docs, "doc_id", "text", rounds = 4))
    val replayed = keyed(TextStats.bpeEncodeWith(docs, "doc_id", "text", loaded))
    assert(fused == replayed, "encode-from-saved must equal fused train+encode")
  }

  test("bpe encodeWith replays merges in ROUND order even when the artifact is shuffled") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val merges = TextStats.bpeMergeLoop(docs, "doc_id", "text", rounds = 4)
    // merge order matters (round 2 can consume round 1's merged symbol); a parquet
    // read returns rows in arbitrary order, so encodeWith must sort by round
    val shuffled = merges.orderBy(col("merged").desc)
    val a = TextStats.bpeEncodeWith(docs, "doc_id", "text", shuffled)
      .agg(sum("n_syms")).collect()(0).getLong(0)
    val b = TextStats.bpeEncode(docs, "doc_id", "text", rounds = 4)
      .agg(sum("n_syms")).collect()(0).getLong(0)
    assert(a == b)
  }
}
