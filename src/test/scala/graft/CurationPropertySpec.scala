package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.pipeline.{Sampling, TextStats}

/** Property tests of the curation operators' conservation laws — the invariants that
  * must hold for ANY corpus, driven by scalacheck over small random document sets
  * (each case is a real Spark job; counts kept small).
  */
class CurationPropertySpec extends SparkSpec {

  private val genWord: Gen[String] = Gen.oneOf("a", "bb", "ccc", "dddd", "w", "xy")

  private val genDoc: Gen[String] =
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, genWord).map(_.mkString(" ")))

  private val genCorpus: Gen[List[(Long, String)]] =
    Gen.choose(3, 12).flatMap { n =>
      Gen.listOfN(n, genDoc).map(_.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) })
    }

  private def check(name: String, prop: Prop): Unit = {
    val params = ScTest.Parameters.default.withMinSuccessfulTests(6)
    val result = ScTest.check(params, prop)
    assert(result.passed, s"$name: $result")
  }

  private def df(corpus: List[(Long, String)]) = {
    import spark.implicits._
    corpus.toDF("doc_id", "text")
  }

  test("chunk conserves tokens: chunk sizes per doc sum to the doc's token count") {
    check("chunk conservation", Prop.forAll(genCorpus) { corpus =>
      val expected = corpus.map { case (id, t) => id -> t.split(" ", -1).length.toLong }.toMap
      val got = TextStats.chunk(df(corpus), "doc_id", "text", chunkTokens = 7)
        .groupBy("doc_id").sum("n_chunk_tokens")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    })
  }

  test("chunk windows are full-size except the last per document") {
    check("chunk shape", Prop.forAll(genCorpus) { corpus =>
      val rows = TextStats.chunk(df(corpus), "doc_id", "text", chunkTokens = 7)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      rows.groupBy(_._1).forall { case (_, cs) =>
        val byIdx = cs.sortBy(_._2)
        byIdx.map(_._2).toSeq == (0 until cs.length) &&
          byIdx.init.forall(_._3 == 7L) && byIdx.last._3 >= 1L && byIdx.last._3 <= 7L
      }
    })
  }

  test("sequencePack conserves documents and tokens, bins contiguous from 0") {
    check("pack conservation", Prop.forAll(genCorpus) { corpus =>
      val docs = {
        import spark.implicits._
        corpus.map { case (id, t) => (id, s"src${id % 2}", t) }.toDF("doc_id", "source", "text")
      }
      val rows = Sampling.sequencePack(docs, "doc_id", "source", "text",
        budgetTokens = 9L, nGroups = 3)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val totalTokens = corpus.map(_._2.split(" ", -1).length.toLong).sum
      rows.map(_._4).sum == corpus.size.toLong &&
        rows.map(_._5).sum == totalTokens &&
        rows.groupBy(r => (r._1, r._2)).forall { case (_, group) =>
          // first cut is always bin 0; bins are distinct (a doc longer than the
          // budget legitimately skips the bins its body spans)
          val bins = group.map(_._3).sorted.toSeq
          bins.headOption.contains(0L) && bins.distinct == bins
        }
    })
  }

  test("piiRedact on PII-free corpora is a pure pass-through of the text hash") {
    check("pii passthrough", Prop.forAll(genCorpus) { corpus =>
      import org.apache.spark.sql.functions.{col, md5}
      val out = TextStats.piiRedact(df(corpus), "doc_id", "text")
      val orig = df(corpus).select(col("doc_id"), md5(col("text")).as("m"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      out.collect().forall { r =>
        r.getLong(1) == 0 && r.getLong(2) == 0 && r.getLong(3) == 0 &&
          r.getString(4) == orig(r.getLong(0))
      }
    })
  }
}
