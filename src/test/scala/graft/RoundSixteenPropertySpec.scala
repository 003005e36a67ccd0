package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.propBoolean

import graft.pipeline.{Dedup, TextStats}

/** Round-16 randomized laws.
  *
  *   - t52/t53: the engine's Viterbi fold agrees piece-count-for-piece-count
  *     with an independent sequential mirror (forward max + smallest-start
  *     backtrack), whose path score is the brute-force optimum over ALL
  *     segmentations; and trained vocabularies always price their own corpus
  *     within the structural bounds n_tokens ≤ n_syms ≤ n_chars.
  *   - d40: every reported span is archived-window-covered and MAXIMAL —
  *     every window inside it hits the index, and extending by one window on
  *     either side either leaves the token or misses the index.
  */
class RoundSixteenPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, cases: Int = 5): Unit = {
    val params = ScTest.Parameters.default.withMinSuccessfulTests(cases)
    val result = ScTest.check(params, prop)
    assert(result.passed, s"$name: $result")
  }

  private val maxPieceLen = 3

  /** Brute-force best Σ lp over ALL segmentations (None iff uncoverable). */
  private def bestScore(tok: String, vocab: Map[String, Long]): Option[Long] = {
    val memo = scala.collection.mutable.Map[Int, Option[Long]](0 -> Some(0L))
    def dp(i: Int): Option[Long] = memo.getOrElseUpdate(i, {
      val opts = for {
        l <- 1 to math.min(maxPieceLen, i)
        lp <- vocab.get(tok.substring(i - l, i))
        prev <- dp(i - l)
      } yield prev + lp
      if (opts.isEmpty) None else Some(opts.max)
    })
    dp(tok.length)
  }

  /** Sequential mirror of the engine's Viterbi: forward max, then
    * smallest-start backtrack — an independent implementation the fold must
    * agree with.
    */
  private def mirrorPath(tok: String, vocab: Map[String, Long]): Seq[String] = {
    val L = tok.length
    val dp = Array.fill[Option[Long]](L + 1)(None)
    dp(0) = Some(0L)
    for (i <- 1 to L) {
      val opts = for {
        s <- math.max(1, i - maxPieceLen + 1) to i
        lp <- vocab.get(tok.substring(s - 1, i))
        prev <- dp(s - 1)
      } yield prev + lp
      if (opts.nonEmpty) dp(i) = Some(opts.max)
    }
    var p = L
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (p > 0) {
      val s = (math.max(1, p - maxPieceLen + 1) to p).find { s =>
        (for { lp <- vocab.get(tok.substring(s - 1, p)); prev <- dp(s - 1) } yield prev + lp)
          .contains(dp(p).get)
      }.get
      out += tok.substring(s - 1, p)
      p = s - 1
    }
    out.toSeq
  }

  test("t52 law: engine Viterbi == sequential mirror, mirror path is brute-force optimal") {
    val tokGen = Gen.choose(1, 8)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val lpGen = Gen.choose(-9000000L, -1000000L)
    val pieces = Seq("a", "b", "c", "ab", "bc", "ca", "aa", "abc", "bca", "cab", "bb", "cc")
    check("t52-viterbi-mirror", Prop.forAll(
      Gen.listOfN(4, tokGen), Gen.listOfN(pieces.size, lpGen)) {
      (toks: List[String], lps: List[Long]) =>
        val vocab = pieces.zip(lps).toMap
        val docs = toks.distinct.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val enc = TextStats.unigramEncodeWith(docs, "doc_id", "text",
            vocab.toSeq.toDF("piece", "lp_micro").withColumn("n_uses", lit(1L)),
            maxPieceLen = maxPieceLen)
          .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_syms")).toMap
        toks.distinct.zipWithIndex.forall { case (t, i) =>
          val path = mirrorPath(t, vocab)
          enc(i.toLong) == path.length.toLong &&
            bestScore(t, vocab).contains(path.map(vocab).sum)
        }
    }, cases = 15)
  }

  test("t52 law: a trained vocabulary prices its own corpus within structural bounds") {
    val textGen = Gen.listOfN(6,
      Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.oneOf('x', 'y', 'z')).map(_.mkString)))
      .map(_.mkString(" "))
    check("t52-train-coverage", Prop.forAll(Gen.listOfN(3, textGen)) { (texts: List[String]) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val vocab = TextStats.unigramTrain(df, "doc_id", "text",
        rounds = 1, maxPieceLen = 3, seedVocab = 10, vocabTarget = 5)
      val enc = TextStats.unigramEncodeWith(df, "doc_id", "text", vocab, maxPieceLen = 3)
        .collect()
      // a piece never spans a space and is at least one char
      enc.length == texts.length && enc.forall { r =>
        val (nt, nc, ns) =
          (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"), r.getAs[Long]("n_syms"))
        ns >= nt && ns <= nc
      }
    }, cases = 6)
  }

  test("d40 law: reported spans are index-covered and maximal") {
    val word = Gen.oneOf("red", "blue", "green", "ash", "oak", "elm", "fir", "ivy")
    val docGen = Gen.listOfN(12, word).map(_.mkString(" "))
    val w = 3 // windowTokens
    val minSpan = 4
    check("d40-span-maximality", Prop.forAll(
      Gen.listOfN(3, docGen), Gen.listOfN(2, docGen)) {
      (archiveTexts: List[String], batchTexts: List[String]) =>
        val archive = archiveTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val batch = batchTexts.zipWithIndex.map { case (t, i) => (100L + i, t) }
          .toDF("doc_id", "text")
        val index = Dedup.spanHashIndex(archive, "doc_id", "text", windowTokens = w)
        val spans = Dedup.probeSpanIndex(batch, "doc_id", "text", index,
            windowTokens = w, minSpanTokens = minSpan)
          .collect()
          .map(r => (r.getAs[Long]("doc_id"),
            r.getAs[Long]("span_start").toInt, r.getAs[Long]("span_tokens").toInt))
        val archived = archiveTexts.flatMap(_.split(" ").sliding(w).map(_.mkString(" "))).toSet
        val byId = batchTexts.zipWithIndex.map { case (t, i) => (100L + i) -> t.split(" ") }.toMap
        spans.forall { case (id, start, len) =>
          val toks = byId(id)
          val covered = len >= minSpan &&
            (start to (start + len - w)).forall { s =>
              archived.contains(toks.slice(s - 1, s - 1 + w).mkString(" "))
            }
          val leftMax = start <= 1 ||
            !archived.contains(toks.slice(start - 2, start - 2 + w).mkString(" "))
          val nextS = start + len - w + 1
          val rightMax = nextS + w - 1 > toks.length ||
            !archived.contains(toks.slice(nextS - 1, nextS - 1 + w).mkString(" "))
          covered && leftMax && rightMax
        }
    }, cases = 300)
  }
}
