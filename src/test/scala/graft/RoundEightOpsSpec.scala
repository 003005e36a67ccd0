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

  test("bigram LM score: every doc scored, scores negative, n_bigrams = n_tokens - 1") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val scored = TextStats.bigramLogProb(docs, "doc_id", "text").collect()
    assert(scored.length == docs.count())
    // log-probabilities of a proper distribution are strictly negative
    assert(scored.forall(_.getAs[Long]("sum_lp_micro") < 0L))
    assert(scored.forall(r => r.getAs[Long]("avg_lp_micro") < 0L))
    // each doc contributes exactly len-1 bigrams (no nulls leak through the lead)
    val nTok = TextStats.tokenStats(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(scored.forall(r => r.getAs[Long]("n_bigrams") == nTok(r.getAs[Long]("doc_id")) - 1))
  }

  test("bigram LM score: a repetitive doc outscores a shuffled-vocabulary doc") {
    import spark.implicits._
    // "a a a ..." has one dominant bigram (high P(a|a)); the scattered doc's bigrams
    // are all singletons priced mostly by the unigram back-off
    val docs = Seq(
      (1L, ("a " * 40).trim),
      (2L, (0 until 40).map(i => s"w${i % 20}").mkString(" "))
    ).toDF("doc_id", "text")
    val m = TextStats.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("avg_lp_micro")).toMap
    assert(m(1L) > m(2L), s"repetitive doc must score higher: $m")
  }

  test("linear quality: deterministic, label agrees with score sign, micro pricing exact") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val rows = TextStats.linearQuality(docs, "doc_id", "text").collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      val (milli, n) = (r.getAs[Long]("score_milli"), r.getAs[Long]("n_tokens"))
      val label = r.getAs[String]("label")
      assert(label == (if (milli > 0) "keep" else "drop"))
      val expect = math.floor(milli.toDouble * 1000.0 / n.toDouble + 0.5).toLong
      assert(r.getAs[Long]("score_micro_per_token") == expect)
    }
    // same input twice -> identical scores (pure hash arithmetic, no randomness)
    val again = TextStats.linearQuality(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_milli")).toMap
    assert(rows.forall(r => again(r.getAs[Long]("doc_id")) == r.getAs[Long]("score_milli")))
  }
}
