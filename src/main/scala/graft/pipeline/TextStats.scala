package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines. All pure column
  * expressions (whole-stage codegen, no UDFs) — each scales as an embarrassingly parallel
  * map over the corpus.
  *
  * Portability discipline (for the DuckDB oracle): token/occurrence counts use
  * length-difference arithmetic, fingerprints use exact integer polynomial hashing — no
  * regexes, no engine-specific tokenizers.
  */
object TextStats {

  /** # of non-overlapping occurrences of `needle` in `text` — a native codegen'd
    * indexOf loop (org.apache.spark.sql.graft.CountOccurrences); counts are identical
    * to the oracle's `(length - length(replace)) // len(needle)` arithmetic but skip
    * the per-needle regex walk over every document.
    */
  def occurrences(text: Column, needle: String): Column =
    org.apache.spark.sql.graft.CountOccurrences.column(text, lit(needle))

  private def occ(text: Column, needle: String): Column = occurrences(text, needle)

  /** Shared stopword-hit count — the t02 quality numerator. */
  private[pipeline] def stopHits(text: Column): Column =
    occ(text, " the ") + occ(text, " a ") + occ(text, " of ") + occ(text, " and ")

  /** [[qualityScore]]'s score micro-quantized per ROW (floor(1e6·q + 0.5), the
    * repo-wide micro idiom) — the exact-integer form downstream per-source
    * aggregates (dc01) can SUM order-free: both engines compute the identical
    * double and quantize once, so the sums never see float associativity.
    */
  private[graft] def qualityMicro(text: Column): Column = {
    val nt = tokenCount(text)
    floor(lit(1000000.0) * (stopHits(text).cast("double") / nt.cast("double")
      + nt.cast("double") / length(text).cast("double") * 10.0) + lit(0.5)).cast("long")
  }

  /** Whitespace token count: #spaces + 1. */
  def tokenCount(text: Column): Column =
    occ(text, " ") + 1L

  /** Token inventory: (id, token) pairs — the shared explode for shingle-based ops. */
  def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Scans.fanOut(df)
      .select(col(idCol), posexplode(split(col(textCol), " ", -1)).as(Seq("pos", "token")))

  /** Token counting query: whitespace tokens + a BPE-ish subword estimate
    * (⌈len/4⌉ subwords per token — the standard "~4 chars per token" heuristic).
    */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    tokens(df, idCol, textCol)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(((length(col("token")) + 3) / 4).cast("long")).as("n_bpe")
      )

  /** Quality scoring: stopword ratio + token density, exact-integer inputs, one final
    * float division each (order-free ⇒ oracle-stable).
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTokens = tokenCount(t)
    val stops = stopHits(t) // ONE definition of the stopword set (dc01/dc02 ride it via qualityMicro)
    df.select(
      col(idCol),
      nTokens.as("n_tokens"),
      stops.as("stop_hits"),
      round(
        stops.cast("double") / nTokens.cast("double") +
          nTokens.cast("double") / length(t).cast("double") * 10.0,
        6
      ).as("quality")
    )
  }

  /** Language-ID by marker-word scoring (n-gram/stopword heuristic): score each language
    * by marker-word occurrences; argmax with a fixed tie-break order.
    */
  def langId(df: DataFrame, idCol: String, textCol: String, truthCol: Option[String]): DataFrame = {
    val t = col(textCol)
    val langs = Seq(
      "en" -> Seq(" the ", " and ", " of "),
      "de" -> Seq(" der ", " und ", " das "),
      "es" -> Seq(" el ", " los ", " que "),
      "fr" -> Seq(" le ", " les ", " et "),
      "zh" -> Seq(" de ", " shi ", " bu ")
    )
    // score each language ONCE into its own column; the argmax fold below then chains
    // cheap column references — folding over the raw score expressions would duplicate
    // every occurrence-count subtree exponentially through the when() nesting
    val scored = df.select(
      (col(idCol) +: truthCol.map(c => col(c)).toSeq) ++
        langs.map { case (lang, markers) =>
          markers.map(m => occ(t, m)).reduce(_ + _).as(s"score_$lang")
        }: _*
    )
    // argmax with fixed priority order (earlier wins ties)
    val scoreCols = langs.map { case (lang, _) => lang -> col(s"score_$lang") }
    val best = scoreCols.tail.foldLeft((lit(scoreCols.head._1), scoreCols.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lang).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }
    val base = scored.select(
      col(idCol) +: (best._1.as("predicted_lang") +: truthCol.map(c => col(c)).toSeq): _*
    )
    truthCol match {
      case Some(c) => base.withColumn("correct", (col("predicted_lang") === col(c)).cast("int"))
      case None    => base
    }
  }

  /** t51 — LANGUAGE-ID EVALUATION card: the confusion matrix of [[langId]]'s
    * marker-word classifier against the corpus' gold language labels, with the
    * class metrics read off it — per (gold, predicted) cell: the count, the
    * gold-row and predicted-column totals, recall and precision (the half-up
    * share idiom — on the diagonal these ARE the class recall/precision), and
    * overall accuracy as the constant audit column. This is the eval loop the
    * t42 gate-swap decision needs before trusting t01 as a gate: WHERE the
    * heuristic fails (which gold class bleeds into which prediction), not just
    * how often.
    *
    * Scale shape: one classified corpus pass → a |langs|²-cell hash aggregate;
    * row/column totals and the accuracy row are folds over that catalog —
    * nothing after the first aggregate sees the corpus.
    */
  def langIdEval(df: DataFrame, idCol: String, textCol: String, truthCol: String): DataFrame = {
    val cm = langId(df, idCol, textCol, Some(truthCol))
      .groupBy(col(truthCol).as("gold"), col("predicted_lang").as("pred"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // |langs|² rows; feeds 3 folds + the report join
    val goldTotals = cm.groupBy(col("gold")).agg(sum(col("n")).as("n_gold"))
    val predTotals = cm.groupBy(col("pred")).agg(sum(col("n")).as("n_pred"))
    val totals = cm.agg(
      sum(col("n")).as("n_total"),
      sum(when(col("gold") === col("pred"), col("n")).otherwise(lit(0L))).as("n_correct"))
    cm
      .join(broadcast(goldTotals), Seq("gold"))
      .join(broadcast(predTotals), Seq("pred"))
      .crossJoin(broadcast(totals))
      .select(
        col("gold"), col("pred"), col("n"), col("n_gold"), col("n_pred"),
        expr("(2 * 1000000 * n + n_gold) DIV (2 * n_gold)").cast("long").as("recall_micro"),
        expr("(2 * 1000000 * n + n_pred) DIV (2 * n_pred)").cast("long").as("precision_micro"),
        expr("(2 * 1000000 * n_correct + n_total) DIV (2 * n_total)").cast("long")
          .as("accuracy_micro"))
  }

  /** C4-style quality FILTER: each heuristic sets a bit in `reasons`; `kept` = no bits.
    * Bit 0: too few tokens (< minTokens). Bit 1: stopword hits below minStopHits
    * (non-language-like). Bit 2: mean token length > maxMeanTokenLen (gibberish /
    * code-ish). All exact-integer tests (mean-length compare cross-multiplied), so the
    * oracle reproduces the verdicts bit-for-bit.
    */
  def qualityFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Long = 10L,
      minStopHits: Long = 1L,
      maxMeanTokenLen: Long = 12L
  ): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      tokenCount(t).as("n_tokens"),
      qualityReasons(t, minTokens, minStopHits, maxMeanTokenLen).as("reasons"),
      (qualityReasons(t, minTokens, minStopHits, maxMeanTokenLen) === 0L)
        .cast("int").as("kept")
    )
  }

  /** The one rendition of the heuristic-gate rule bits ([[qualityFilter]]'s
    * reasons column; kept ⇔ reasons = 0) — shared with the streaming
    * calibration monitor so the label side can never drift from the batch gate.
    */
  private[graft] def qualityReasons(
      t: Column,
      minTokens: Long = 10L,
      minStopHits: Long = 1L,
      maxMeanTokenLen: Long = 12L
  ): Column = {
    val nTokens = tokenCount(t)
    val stops = stopHits(t) // same shared stopword set as qualityScore/qualityMicro
    val charLen = length(t).cast("long")
    // mean token length > max  ⇔  (len - (nTokens - 1)) > max * nTokens, integer-exact
    val gibberish = (charLen - (nTokens - 1L)) > lit(maxMeanTokenLen) * nTokens
    when(nTokens < minTokens, 1L).otherwise(0L) +
      when(stops < minStopHits, 2L).otherwise(0L) +
      when(gibberish, 4L).otherwise(0L)
  }

  /** Dataset-card rollup: corpus composition per (language, source) — documents, exact
    * token/byte volume, kept-fraction under [[qualityFilter]]. The numbers a curation
    * run reports after each pipeline stage.
    */
  def corpusStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      sourceCol: String
  ): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol), col(langCol).as("lang"), col(sourceCol).as("source"),
        tokenCount(t).as("n_tokens"), length(t).cast("long").as("n_chars"))
      .join(qualityFilter(df, idCol, textCol).select(col(idCol), col("kept")), idCol)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("kept").cast("long")).as("n_kept")
      )
  }

  /** Vocabulary-growth curve — the Heaps-law diagnostic of corpus curation: distinct
    * vocabulary size as a function of corpus position (doc-id buckets of
    * `bucketDocs`), alongside cumulative document and token volume. A healthy
    * natural corpus grows vocabulary ∝ tokensᵝ with β ≈ 0.5; premature saturation
    * flags heavy duplication (dedup left templated text behind), and super-linear
    * growth flags noise/gibberish — the after-pass companion to the d-family.
    *
    * Every number is exact-integer: a token's first appearance is `min(doc_id)`
    * (order-free), per-bucket new-vocabulary and token counts are
    * map-side-combinable aggs, and the cumulative fold is a window over BUCKET
    * STATS (|docs|/bucketDocs rows — the t17 cumulated-histogram bound, planner-
    * sized, never the token stream). The first-appearance agg shuffles 60-bit md5
    * hashes, not token strings (the d02 shuffle-diet idiom; a collision merges two
    * tokens' vocabulary entries corpus-wide — odds ~|vocab|²/2⁶¹, mirrored exactly
    * by the oracle, which hashes identically).
    */
  def vocabGrowth(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bucketDocs: Long = 50L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = tokens(df, idCol, textCol)
      .select(col(idCol),
        conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long").as("h"))
      .localCheckpoint(true) // two consumers: per-doc volume and first-appearance
    val docVol = toks.groupBy(col(idCol)).agg(count(lit(1)).as("n_tokens"))
      .select(expr(s"$idCol DIV $bucketDocs").as("bucket"), col("n_tokens"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    val newVocab = toks.groupBy(col("h")).agg(min(col(idCol)).as("first_id"))
      .select(expr(s"first_id DIV $bucketDocs").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_vocab"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docVol
      .join(newVocab, Seq("bucket"), "left_outer")
      .select(col("bucket"), col("n_docs"), col("n_tokens"),
        coalesce(col("new_vocab"), lit(0L)).as("new_vocab"))
      .select(
        col("bucket"),
        sum(col("n_docs")).over(w).as("cum_docs"),
        sum(col("n_tokens")).over(w).as("cum_tokens"),
        sum(col("new_vocab")).over(w).as("vocab"))
  }

  /** Document fingerprint: exact-integer polynomial hash over character codepoints,
    * `sum(codepoint(i) · 31^(i mod 8)) mod 1e9+7` — a native codegen'd one-pass
    * expression (org.apache.spark.sql.graft.PolyFingerprint; the HOF-fold formulation
    * was O(len²) because substring(s, i, 1) seeks from the start of the string).
    * Exact-integer arithmetic ⇒ bit-identical to the DuckDB oracle; empty docs pin
    * fingerprint 0.
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      org.apache.spark.sql.graft.PolyFingerprint.column(col(textCol)).as("fingerprint")
    )

  /** Within-document repetition signals (the Gopher-style repetition filters): token
    * total, distinct-token count, duplicate-token ratio (1 − distinct/total), and the
    * most-frequent token's share. High dup/top ratios flag boilerplate and generated
    * spam that length/stopword filters miss.
    *
    * Scale shape: explode → two hash aggregations ((id, token) then id) — the standard
    * shuffle-partitioned token pipeline; no windows, no driver state.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    tokens(df, idCol, textCol)
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("max_count")
      )
      .select(
        col(idCol),
        col("n_tokens"),
        col("n_distinct"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens").cast("double"), 6)
          .as("dup_ratio"),
        round(col("max_count").cast("double") / col("n_tokens").cast("double"), 6)
          .as("top_ratio")
      )

  /** PII detection + redaction: count and mask email addresses, IPv4 addresses, and
    * international-format phone numbers. The redaction step every pre-training corpus
    * runs before anything else sees the text. Counts are taken on the original text;
    * redaction applies the three patterns in a fixed order (email → ipv4 → phone) so the
    * output is deterministic. The redacted text itself is returned hashed (`clean_md5`)
    * — the driver's oracle hashes values anyway, and at 100 TB the redacted corpus
    * would be written to a sink, not carried through a diagnostic result set.
    *
    * Pattern discipline: the regexes use only syntax with identical semantics in Java's
    * engine (Spark) and RE2 (DuckDB) — character classes, bounded repetition, `\b`,
    * no backreferences or lookaround.
    *
    * Scale shape: pure map over the corpus (whole-stage codegen; regex per row is the
    * dominant cost and is embarrassingly parallel).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+[0-9]{1,2}[- ][0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"

  def piiRedact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val clean = regexp_replace(
      regexp_replace(regexp_replace(t, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
    df.select(
      col(idCol),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_email"),
      regexp_count(t, lit(Ipv4Re)).cast("long").as("n_ipv4"),
      regexp_count(t, lit(PhoneRe)).cast("long").as("n_phone"),
      md5(clean).as("clean_md5")
    )
  }

  /** Fixed-size token-window chunking: split each document into consecutive
    * `chunkTokens`-token training sequences (the "cut the corpus into context windows"
    * step before tokenization/packing). Output: one row per chunk with its index,
    * exact token count (the last chunk is short), and content hash.
    *
    * Scale shape: map + generator explode — each document expands to ⌈tokens/chunk⌉
    * rows with no shuffle; array slicing happens once per chunk on the already-split
    * token array.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String, chunkTokens: Int = 64): DataFrame = {
    val ts = split(col(textCol), " ", -1)
    df.select(col(idCol), ts.as("ts"))
      .select(
        col(idCol),
        posexplode(transform(
          sequence(lit(0), ((size(col("ts")) - 1) / chunkTokens).cast("int")),
          i => slice(col("ts"), i * chunkTokens + 1, lit(chunkTokens))
        )).as(Seq("chunk_idx", "chunk"))
      )
      .select(
        col(idCol),
        col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_md5")
      )
  }

  /** Vocabulary coverage: per-document out-of-vocabulary rate against the corpus
    * top-`k` token vocabulary — the coverage check run after tokenizer training (a
    * document whose tokens mostly fall outside the vocabulary will shatter into
    * byte-level pieces and is usually noise). Exact-integer counts, one final division.
    *
    * Scale shape: the vocabulary is top-k (constant) — computed once with the
    * distributed TakeOrdered of [[vocabulary]] and BROADCAST against the token stream;
    * the per-doc rollup is a map-side-combinable aggregation of generator output. No
    * full-token-relation shuffle.
    */
  def vocabCoverage(df: DataFrame, idCol: String, textCol: String, k: Int = 20): DataFrame = {
    val vocab = broadcast(
      vocabulary(df, idCol, textCol, k).select(col("token")).withColumn("in_vocab", lit(1L)))
    tokens(df, idCol, textCol)
      .join(vocab, Seq("token"), "left_outer")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(coalesce(col("in_vocab"), lit(0L))).as("n_in_vocab"))
      .select(
        col(idCol), col("n_tokens"),
        (col("n_tokens") - col("n_in_vocab")).as("n_oov"),
        round((col("n_tokens") - col("n_in_vocab")).cast("double") /
          col("n_tokens").cast("double"), 6).as("oov_rate"))
  }

  /** Corpus vocabulary: the `k` most frequent tokens with document frequency — the
    * vocabulary-building / tokenizer-training precursor. Global top-k via
    * order-by-limit (planned as a distributed TakeOrdered: per-partition heaps, no full
    * sort); ties broken by token so the cut is deterministic.
    */
  def vocabulary(df: DataFrame, idCol: String, textCol: String, k: Int = 50): DataFrame =
    tokens(df, idCol, textCol)
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("n_occurrences"),
        countDistinct(col(idCol)).as("n_docs")
      )
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(k)

  /** Character-class profile: digit / uppercase / punctuation / whitespace counts and
    * an alpha ratio per document — the cheap structural signal that separates prose
    * from tables, code, and boilerplate before any expensive scoring runs. Counts via
    * length-difference over class stripping (regexp_replace with the same class in
    * both engines); exact integers, one final division.
    */
  def charClassProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    def classCount(pattern: String): Column =
      length(t) - length(regexp_replace(t, pattern, ""))
    val nDigit = classCount("[0-9]")
    val nUpper = classCount("[A-Z]")
    val nSpace = classCount("[ ]")
    val nAlpha = classCount("[A-Za-z]")
    df.select(
      col(idCol),
      length(t).cast("long").as("n_chars"), // long: DuckDB length() is BIGINT
      nDigit.cast("long").as("n_digit"),
      nUpper.cast("long").as("n_upper"),
      nSpace.cast("long").as("n_space"),
      round(nAlpha.cast("double") / greatest(length(t), lit(1)).cast("double"), 6)
        .as("alpha_ratio"))
  }

  /** Top-k distinguishing terms per document by log-free TF-IDF: score =
    * tf · N / df — the same ordering as tf·(N/df) without the log, so the score is ONE
    * exact-integer multiply + ONE IEEE division and therefore bit-identical across
    * engines with NO rounding step (a logarithm's libm rounding is not
    * oracle-portable). Ties break on token so the rank-k cut is deterministic.
    *
    * Scale: tf is a map-side-combinable agg; document frequency is an agg over the
    * (token, doc) relation; N is a 1-row broadcast; the rank window partitions by
    * document (bounded by per-doc vocabulary).
    */
  def tfIdfTop(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = tokens(df, idCol, textCol)
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df_count"))
    val nDocs = df.select(countDistinct(col(idCol)).as("n_docs"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("token"))
    tf
      .join(dfreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("df_count").cast("double"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df_count"), col("score"), col("rank"))
  }

  /** Unigram language-model score — the perplexity proxy of training-data curation:
    * each document scored by the average log-probability of its tokens under the
    * corpus's own unigram MLE (p(tok) = corpus_count/total). Outlier-low scores flag
    * gibberish/rare-charset docs; outlier-high flag degenerate repetition.
    *
    * Determinism: ln(p) is fixed to integer MICRO-units per DISTINCT token
    * (round(1e6·ln(cnt/N)) as BIGINT), so per-document sums are exact integer
    * arithmetic in any order — the only float per output row is one final division of
    * two exact integers (the dim-stats microunit pattern).
    *
    * Scale shape: token counts are two map-side-combinable hash-aggs (per-(doc,token)
    * tf, then corpus counts over distinct tokens); the corpus total joins in as a
    * 1-row broadcast. No windows, no sorts.
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = tokens(df, idCol, textCol)
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // two consumers: corpus counts and the per-doc rollup
    val corpus = tf.groupBy(col("token")).agg(sum(col("tf")).as("cnt"))
    val total = corpus.select(sum(col("cnt")).as("n_total"))
    val lp = corpus.crossJoin(broadcast(total))
      .select(
        col("token"),
        round(lit(1000000.0) *
          log(col("cnt").cast("double") / col("n_total").cast("double")), 0)
          .cast("long").as("lp_micro"))
    tf.join(lp, Seq("token"))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("lp_micro")).as("sum_lp_micro"))
      .withColumn("avg_logprob",
        round(col("sum_lp_micro").cast("double") /
          (col("n_tokens") * lit(1000000L)).cast("double"), 6))
  }

  /** BM25 top-k terms per document (k1 = 1.2, b = 0.75) — the retrieval-grade term
    * salience score (length-normalized TF against corpus rarity), used for keyword
    * extraction and quality-weighted retrieval indexes over training corpora.
    *
    * Determinism (the t18 log-free discipline, extended): the BM25 tf-part and the
    * raw idf ratio are both EXACT-INTEGER rationals —
    *   tf_part = 2 200 000·tf / (1 000 000·tf + 300 000 + rr),
    *     rr = round(900 000·dl·N / Σdl)  (k1=6/5, b=3/4 multiplied through by 10⁶)
    *   idf_raw = (2N − 2df + 1) / (2df + 1)   (the +0.5 idf, doubled through)
    * so the only float ops per row are two exact-int divisions and one product — all
    * IEEE-correctly-rounded primitives, bit-identical in any engine (no ln: a log-idf
    * would hit libm, which IS allowed to differ between JVM and C).
    *
    * Scale shape: two map-side-combinable hash-aggs (per-(doc,token) tf, per-token
    * df), doc length folded from tf, corpus totals join in as a 1-row broadcast; the
    * only sort is the per-doc top-k window, partitioned by doc_id.
    */
  def bm25Top(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = tokens(df, idCol, textCol)
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // three consumers: df counts, doc lengths, final scoring
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df_count"))
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val totals = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val rr = round((lit(900000L) * col("dl") * col("n_docs")).cast("double") /
      col("sum_dl").cast("double")).cast("long")
    val tfPart = (lit(2200000L) * col("tf")).cast("double") /
      (lit(1000000L) * col("tf") + lit(300000L) + col("rr")).cast("double")
    val idfRaw = (lit(2L) * col("n_docs") - lit(2L) * col("df_count") + lit(1L)).cast("double") /
      (lit(2L) * col("df_count") + lit(1L)).cast("double")
    val w = Window.partitionBy(col(idCol)).orderBy(col("score_raw").desc, col("token"))
    tf
      .join(dfreq, "token")
      .join(dl, idCol)
      .crossJoin(broadcast(totals))
      .withColumn("rr", rr)
      .withColumn("score_raw", tfPart * idfRaw)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df_count"),
        round(col("score_raw"), 6).as("score"), col("rank"))
  }

  /** Corpus-wide adjacent character-pair counts — the inner statistic of BPE
    * tokenizer training (each merge round picks the most frequent adjacent pair;
    * this computes that frequency table over token occurrences, so a merge decision
    * is one `limit(1)` away). Top-k by (count desc, pair) — a total order, so the
    * cut is deterministic.
    *
    * Scale shape: pure generator (one `transform(sequence(...))` per token, no
    * shuffle of raw text) into a map-side-combinable count over a key space bounded
    * by |alphabet|² — the final sort touches only that tiny aggregate.
    */
  def bpePairs(df: DataFrame, idCol: String, textCol: String, k: Int = 100): DataFrame =
    tokens(df, idCol, textCol)
      .filter(length(col("token")) >= 2)
      .select(explode(
        expr("transform(sequence(1, length(token) - 1), i -> substring(token, i, 2))")).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)

  /** A token's initial doubled-separator symbol representation: `||c1||c2||…||`. */
  private def symRepr: Column =
    concat(lit("||"),
      array_join(
        expr("transform(sequence(1, length(token)), i -> substring(token, i, 1))"), "||"),
      lit("||"))

  /** The separator-safety contract, in ONE place: every BPE consumer must apply the
    * same token filter, or trainer and encoder would see different dictionaries.
    */
  private def bpeSafeToken: Column =
    length(col("token")) >= 1 && !col("token").contains("|")

  /** Finish a (token, cnt) rollup into the checkpointed training dictionary. */
  private def bpeDictOf(tokenCounts: DataFrame): DataFrame =
    tokenCounts
      .select(col("token"), symRepr.as("repr"), col("cnt"))
      .localCheckpoint(true)

  /** The word-frequency dictionary in doubled-separator representation — the ONE
    * corpus-sized pass of BPE training (exposed for PlanSpec's pin that every merge
    * round reads this checkpoint, never the corpus). Carries (token, repr, cnt);
    * consumers that don't need the token just ignore the column.
    *
    * Tokens containing the separator character '|' are excluded: their reprs would
    * parse as phantom symbol runs and silently corrupt the pair statistics. BPE
    * trainers run over normalized text; the filter makes the contract explicit
    * instead of trusting the corpus.
    */
  private[graft] def bpeDictionary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    bpeDictOf(
      tokens(df, idCol, textCol)
        .filter(bpeSafeToken)
        .groupBy(col("token")).agg(count(lit(1)).as("cnt")))

  /** One round's frequency-weighted adjacent-pair counts over the dictionary. */
  private[graft] def bpePairCounts(repr: DataFrame): DataFrame =
    repr
      .select(filter(split(col("repr"), "\\|\\|"), x => x =!= "").as("syms"), col("cnt"))
      .filter(size(col("syms")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "j -> named_struct('l', element_at(syms, j), 'r', element_at(syms, j + 1)))")).as("p"),
        col("cnt"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("n"))

  /** The shared merge loop: `rounds` iterations of (weighted pair count → argmax →
    * greedy replace) over any dictionary carrying `repr` and `cnt`; extra columns
    * (e.g. the token itself, for encoding) ride along untouched. Returns the merge
    * decisions and the dictionary in its post-merge representation.
    *
    * Stops early when the pair table runs dry (every token fully merged, or a
    * single-character corpus): a production trainer asked for more rounds than the
    * corpus can support ships the merges that exist, not an exception.
    */
  private def bpeTrainRounds(
      dict: DataFrame,
      rounds: Int
  ): (Seq[(Int, String, String, String, Long)], DataFrame) = {
    var repr = dict
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var round = 1
    var dry = false
    while (round <= rounds && !dry) {
      bpePairCounts(repr)
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1)
        .collect() match {
        case Array(top) =>
          val (l, r, n) = (top.getString(0), top.getString(1), top.getLong(2))
          merges += ((round, l, r, l + r, n))
          // the pair comes from corpus tokens: pass it as literal COLUMNS, never
          // spliced into SQL text — quote-escaping alone left backslashes open
          // (Spark string literals treat \ as an escape, so a backslash symbol
          // rewrote the pattern and merged the wrong pair)
          repr = repr.withColumn("repr",
            replace(col("repr"), lit(s"|$l||$r|"), lit(s"|$l$r|")))
        case _ => dry = true
      }
      round += 1
    }
    (merges.toSeq, repr)
  }

  /** Bounded BPE merge LOOP — the actual tokenizer-training primitive over t22's
    * pair statistic: per round, count adjacent symbol pairs corpus-wide, merge the
    * most frequent pair (count desc, pair asc — a total order, so the decision is
    * deterministic) greedily left-to-right in every token, and re-count. Returns the
    * merge table (round, left_sym, right_sym, merged, n) — the artifact a BPE
    * tokenizer ships. Rounds are pinned so the oracle replays (the d05/g27
    * bounded-fixpoint discipline); production training runs more rounds with the
    * same per-round plan.
    *
    * Symbol sequences are carried as DOUBLED-separator strings (`||s1||s2||…||`,
    * '|'-containing tokens excluded by [[bpeDictionary]]): the merge of pair (a, b)
    * is then the single literal-column `replace(repr, '|a||b|', '|ab|')`, whose
    * left-to-right non-overlapping scan IS greedy BPE merging (each match consumes
    * one separator from each side, so back-to-back occurrences like `aaaa` merge to
    * `aa aa`, not `aa a a`) — one codegen'd map pass, no regex, no UDF, identical
    * semantics in any engine with sequential replace.
    *
    * Scale shape: the corpus is read ONCE, collapsed to the word-frequency
    * dictionary (distinct token, occurrence count) — the structure every
    * production BPE trainer iterates over, because pair counts over occurrences
    * equal pair counts over distinct words weighted by frequency. Each round then
    * explodes adjacent pairs of a dictionary-sized relation (typically orders of
    * magnitude smaller than the corpus), sums the weights map-side over a key
    * space bounded by |vocab|², and collects ONE driver-side row (the argmax pair
    * — the bounded-collect pattern of GraphQueries' loop scalars). The merge is a
    * lazily-chained map-only replace over the checkpointed dictionary: round r
    * re-applies r cheap linear-scan replaces instead of materializing a new
    * dictionary per round.
    */
  def bpeMergeLoop(df: DataFrame, idCol: String, textCol: String, rounds: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    bpeTrainRounds(bpeDictionary(df, idCol, textCol), rounds)._1
      .toDF("round", "left_sym", "right_sym", "merged", "n")
  }

  /** BPE ENCODING with a freshly-trained merge table — the tokenize step of a
    * training-data pipeline (train merges on the corpus, then price every document
    * in post-merge symbols; the per-doc symbol count is what sequence packing and
    * context-length budgeting consume). Output per doc: whitespace-token count,
    * character count, and the post-merge symbol count.
    *
    * Scale shape: training is t24's dictionary loop (corpus read once into the
    * word-frequency dictionary); ENCODING is also dictionary-sized — each distinct
    * token is encoded once (its post-merge repr is already in the trained
    * dictionary) and per-doc totals come from the (doc, token) tf relation joined
    * to the |vocab|-sized symbol-count table, an equi-join plus one map-side-
    * combinable rollup. No corpus-sized relation is ever re-scanned per round.
    */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String, rounds: Int = 4): DataFrame = {
    val tf = bpeTf(df, idCol, textCol)
    val dict = bpeDictOf(tf.groupBy(col("token")).agg(sum(col("tf")).as("cnt")))
    val (_, trained) = bpeTrainRounds(dict, rounds)
    bpePrice(tf, trained, idCol)
  }

  /** ONE corpus pass shared by the encode paths: the (doc, token) tf relation serves
    * both sides — the word-frequency dictionary is its token-level rollup (train /
    * merge-replay input) and the per-doc pricing join probes it (encode input).
    * bpeDictionary's standalone corpus pass would be a second explode+agg over the
    * same text.
    */
  private def bpeTf(df: DataFrame, idCol: String, textCol: String): DataFrame =
    tokens(df, idCol, textCol)
      .filter(bpeSafeToken)
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)

  /** Price every doc in post-merge symbols: the |vocab|-sized symbol-count table
    * equi-joined to tf, one map-side-combinable rollup.
    */
  private def bpePrice(tf: DataFrame, trained: DataFrame, idCol: String): DataFrame = {
    val symCount = trained.select(col("token"),
      size(filter(split(col("repr"), "\\|\\|"), x => x =!= "")).as("n_sym"))
    tf
      .join(symCount, "token")
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        sum(col("tf") * length(col("token"))).as("n_chars"),
        sum(col("tf") * col("n_sym")).as("n_syms"))
  }

  /** Persist a trained merge table ([[bpeMergeLoop]]'s output) as the tokenizer
    * artifact: train ONCE on the big corpus, ship the (tiny, rounds-sized) merge
    * relation, and price any number of future corpora with [[bpeEncodeWith]] —
    * two jobs, one artifact, no retraining. Coalesced to one file: the artifact is
    * a handful of rows and readers want it as a unit.
    */
  def bpeSaveMerges(merges: DataFrame, path: String): Unit =
    merges.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  /** Reload a [[bpeSaveMerges]] artifact. */
  def bpeLoadMerges(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** BPE encoding with a SAVED merge table — the production tokenize step (the
    * artifact comes from a prior training job via [[bpeSaveMerges]]; this job never
    * recounts pairs). Replays the merges in round order over the fresh corpus's
    * word-frequency dictionary — the same literal-column greedy replace the trainer
    * applied, so encoding a corpus with its own trained merges is EXACTLY
    * [[bpeEncode]] (RoundEightOpsSpec pins the round-trip). The merge collect is
    * bounded by the round count (a tokenizer artifact is a few thousand rows at
    * production vocab sizes — driver-side by design, like every bounded loop scalar
    * here).
    */
  def bpeEncodeWith(df: DataFrame, idCol: String, textCol: String, merges: DataFrame): DataFrame = {
    val tf = bpeTf(df, idCol, textCol)
    var repr = bpeDictOf(tf.groupBy(col("token")).agg(sum(col("tf")).as("cnt")))
    merges.select(col("round"), col("left_sym"), col("right_sym"))
      .collect().sortBy(_.getInt(0))
      .foreach { m =>
        val (l, r) = (m.getString(1), m.getString(2))
        repr = repr.withColumn("repr",
          replace(col("repr"), lit(s"|$l||$r|"), lit(s"|$l$r|")))
      }
    bpePrice(tf, repr, idCol)
  }

  // ---- t52/t53: unigram-LM (SentencePiece-style) tokenizer ----

  /** The (doc, token, tf) relation for the unigram family — [[bpeTf]] without
    * the BPE separator exclusion ('|' is an ordinary character to a substring
    * vocabulary). One corpus pass, checkpointed: the dictionary rollup and the
    * per-doc pricing join both read it.
    *
    * `excludePipes = true` is the STRICT-SHARED-BASIS variant (r17 ADVICE):
    * the t54/t56 comparison is like-for-like only if both families price the
    * same token set, so on pipe-heavy corpora the card can opt the unigram
    * arm into the BPE pipe-exclusion. Default OFF — t52/t53's published
    * semantics ('|' is an ordinary character) are unchanged.
    */
  private def uniTf(
      df: DataFrame, idCol: String, textCol: String,
      excludePipes: Boolean = false): DataFrame = {
    val base = tokens(df, idCol, textCol).filter(length(col("token")) >= 1)
    (if (excludePipes) base.filter(!col("token").contains("|")) else base)
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
  }

  /** Piece log-prob lookup under a LITERAL vocab map, with the single-char UNK
    * fallback (SentencePiece's coverage rule: every single character scores —
    * trained charsets cover the training corpus, so the fallback only fires on
    * unseen characters at encode time). ONE rendition shared by the DP, the
    * backtrack, and the encoder — the tie conditions can never drift.
    */
  private def uniLp(m: Column, piece: Column, floorLpMicro: Long): Column =
    coalesce(element_at(m, piece),
      when(length(piece) === 1, lit(floorLpMicro)))

  /** Viterbi forward scores per token: dps(k) = best Σ lp over segmentations of
    * the first k−1 characters (dps(1) = 0), each step maximizing over pieces of
    * length ≤ maxPieceLen ending at that character — a codegen'd higher-order
    * fold, no UDF, no shuffle (the published unigram-LM Viterbi, Kudo 2018 §3).
    */
  private def uniDps(tok: Column, m: Column, maxPieceLen: Int, floorLpMicro: Long): Column =
    aggregate(
      sequence(lit(1), length(tok)),
      array(lit(0L)),
      (acc, i) => concat(acc, array(array_max(transform(
        sequence(greatest(lit(1), i - maxPieceLen + 1), i),
        s => element_at(acc, s) + uniLp(m, tok.substr(s, i - s + lit(1)), floorLpMicro))))))

  /** The Viterbi PATH over a precomputed [[uniDps]] column: walk from the end,
    * at each position taking the SMALLEST start achieving the optimum (= the
    * longest piece — the deterministic tie-break the oracle mirrors), emitting
    * the pieces in reverse document order (order is irrelevant to counts).
    */
  private def uniPath(
      tok: Column, dps: Column, m: Column, maxPieceLen: Int, floorLpMicro: Long): Column =
    aggregate(
      sequence(lit(1), length(tok)),
      struct(length(tok).cast("int").as("p"), typedlit(Seq.empty[String]).as("ps")),
      (acc, _) => {
        val p = acc.getField("p")
        val sStar = array_min(filter(
          transform(sequence(greatest(lit(1), p - maxPieceLen + 1), p),
            s => when(element_at(dps, s)
              + uniLp(m, tok.substr(s, p - s + lit(1)), floorLpMicro)
              === element_at(dps, p + 1), s)),
          x => x.isNotNull))
        when(p === 0, acc).otherwise(
          struct((sStar - 1).cast("int").as("p"),
            concat(acc.getField("ps"),
              array(tok.substr(sStar, p - sStar + lit(1)))).as("ps")))
      },
      acc => acc.getField("ps"))

  /** Close a round: keep ALL corpus single characters (the coverage guarantee —
    * a Viterbi path must always exist) plus the top `keepMulti` multi-character
    * pieces by use count (count desc, piece asc — a total order), then re-score:
    * lp = ⌊10⁶·ln(n/Σn)+0.5⌋ micro-nats over the KEPT mass, unused survivors at
    * the pinned floor (ln(0) has no finite value; the floor is the mirrored
    * convention, like t45's OOV penalty).
    */
  private def uniKept(
      counts: DataFrame,
      charset: DataFrame,
      keepMulti: Int,
      floorLpMicro: Long
  ): DataFrame = {
    val multi = counts.filter(length(col("piece")) > 1)
      .orderBy(col("n_uses").desc, col("piece").asc)
      .limit(keepMulti) // bounded top-N (heap per partition), never a global sort
    val singles = charset
      .join(counts.filter(length(col("piece")) === 1), Seq("piece"), "left")
      .select(col("piece"), coalesce(col("n_uses"), lit(0L)).as("n_uses"))
    val kept = singles.unionByName(multi.select(col("piece"), col("n_uses")))
      .localCheckpoint(true) // vocab-sized; the total and the rows both read it
    val tot = kept.agg(sum(col("n_uses")).as("tot"))
    kept.crossJoin(broadcast(tot))
      .select(col("piece"), col("n_uses"),
        when(col("n_uses") > 0,
          floor(lit(1000000.0)
            * log(col("n_uses").cast("double") / col("tot").cast("double"))
            + lit(0.5)).cast("long"))
          .otherwise(lit(floorLpMicro)).as("lp_micro"))
  }

  /** Collect a vocab relation into the literal map the DP folds consume — a
    * bounded tokenizer-artifact collect (≤ seed-vocab + charset rows), the
    * [[bpeEncodeWith]] discipline.
    */
  private def uniVocabMap(vocab: DataFrame): Column =
    typedlit(vocab.select(col("piece"), col("lp_micro")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap)

  /** t52 — UNIGRAM-LM tokenizer trainer (the SentencePiece complement to
    * t24–t26's BPE; Kudo 2018, "Subword Regularization", §3.2's trainer in its
    * hard-EM/Viterbi form): seed a bounded candidate-piece vocabulary from
    * occurrence-weighted substring counts (the published frequent-substring
    * seeding), then per round (E) Viterbi-segment the word-frequency dictionary
    * under the current piece log-probs and count piece uses weighted by word
    * frequency, (M) re-estimate log-probs from the counts, and PRUNE to the
    * target vocabulary — single characters never pruned (the coverage
    * guarantee), multi-character pieces kept by use count. Viterbi (hard-EM)
    * replaces the paper's forward–backward expectations: it is the same
    * algorithm SentencePiece serves inference with, keeps every count an exact
    * integer, and makes the loop oracle-replayable (the d05/g27
    * bounded-fixpoint discipline — soft-EM's float expectations would not
    * cross engines bit-exactly).
    *
    * Output: the trained vocabulary (piece, n_uses, lp_micro) — the artifact
    * [[unigramEncodeWith]] prices corpora with (persist via
    * [[uniSaveVocab]]/[[uniLoadVocab]]; integer micro-nats round-trip parquet
    * bit-exactly, the t26/s24 discipline).
    *
    * Scale shape: the corpus collapses ONCE to the word-frequency dictionary
    * (the same structure the BPE trainer iterates over); seeding explodes
    * dictionary tokens into ≤ len·maxPieceLen substrings folded map-side to
    * piece counts with a bounded top-N keep; each round is one dictionary-sized
    * map pass (two codegen'd folds per distinct token, O(len·maxPieceLen) map
    * probes against the broadcast literal vocab) + one map-side-combinable
    * count rollup. The per-round vocab collect is tokenizer-artifact-sized by
    * construction.
    */
  def unigramTrain(
      df: DataFrame,
      idCol: String,
      textCol: String,
      rounds: Int = 2,
      maxPieceLen: Int = 5,
      seedVocab: Int = 300,
      vocabTarget: Int = 120,
      floorLpMicro: Long = -20000000L
  ): DataFrame =
    unigramTrainFromTf(uniTf(df, idCol, textCol), rounds, maxPieceLen, seedVocab,
      vocabTarget, floorLpMicro)

  /** [[unigramTrain]] over an already-computed (doc, token, tf) relation — the
    * shared-pass entry [[tokenizerCompareCard]] uses so training and pricing
    * pay the corpus tokenize ONCE.
    */
  private[graft] def unigramTrainFromTf(
      tf: DataFrame,
      rounds: Int,
      maxPieceLen: Int,
      seedVocab: Int,
      vocabTarget: Int,
      floorLpMicro: Long
  ): DataFrame = {
    require(rounds >= 1, s"unigramTrain: rounds must be >= 1, got $rounds")
    require(maxPieceLen >= 2, s"unigramTrain: maxPieceLen must be >= 2, got $maxPieceLen")
    val dict = tf
      .groupBy(col("token")).agg(sum(col("tf")).as("cnt"))
      .localCheckpoint(true) // every round re-reads the dictionary, never the corpus
    val tok = col("token")
    val subs = flatten(transform(
      sequence(lit(1), length(tok)),
      s => transform(
        sequence(s, least(length(tok), s + maxPieceLen - 1)),
        e => tok.substr(s, e - s + lit(1)))))
    val cands = dict.select(col("cnt"), explode(subs).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("n_uses"))
      .localCheckpoint(true) // two consumers: the charset and the seed keep
    val charset = cands.filter(length(col("piece")) === 1).select(col("piece"))
      .localCheckpoint(true)
    require(!charset.isEmpty, "unigramTrain: empty dictionary — no tokens to train on")
    var vocab = uniKept(cands, charset, seedVocab, floorLpMicro).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val m = uniVocabMap(vocab)
      val counts = dict
        .withColumn("dps", uniDps(tok, m, maxPieceLen, floorLpMicro))
        .select(col("cnt"),
          explode(uniPath(tok, col("dps"), m, maxPieceLen, floorLpMicro)).as("piece"))
        .groupBy(col("piece")).agg(sum(col("cnt")).as("n_uses"))
      vocab = uniKept(counts, charset, vocabTarget, floorLpMicro).localCheckpoint(true)
    }
    vocab
  }

  /** Persist a trained unigram vocabulary ([[unigramTrain]] output) — the
    * tokenizer artifact, one small file like [[bpeSaveMerges]].
    */
  def uniSaveVocab(vocab: DataFrame, path: String): Unit =
    vocab.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  def uniLoadVocab(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** t53 — unigram ENCODING with a trained/loaded vocabulary: price every
    * document in Viterbi-segmented pieces (the SentencePiece inference step —
    * the same DP and tie-breaks as training, one shared rendition). Output per
    * doc: whitespace-token count, character count, piece count — the
    * [[bpeEncodeWith]] shape, so packing/budgeting consumers compose unchanged.
    * Unseen single characters score the pinned floor (the UNK coverage rule);
    * encoding a corpus with its own trained vocabulary never exercises it.
    *
    * Scale shape: each DISTINCT token is segmented once (dictionary-sized DP
    * pass against the broadcast literal vocab); per-doc totals are the tf
    * equi-join + one map-side-combinable rollup — the t25 pricing path.
    */
  def unigramEncodeWith(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame,
      maxPieceLen: Int = 5,
      floorLpMicro: Long = -20000000L
  ): DataFrame =
    unigramEncodeWithTf(uniTf(df, idCol, textCol), idCol, vocab, maxPieceLen, floorLpMicro)

  /** [[unigramEncodeWith]] over an already-computed (doc, token, tf) relation —
    * pairs with [[unigramTrainFromTf]] so a fused train+price flow tokenizes
    * the corpus once (the registry's t53 keeps the two separate deliberately:
    * it represents the production split of a training job and a later encode
    * job reading the persisted artifact).
    */
  private[graft] def unigramEncodeWithTf(
      tf: DataFrame,
      idCol: String,
      vocab: DataFrame,
      maxPieceLen: Int = 5,
      floorLpMicro: Long = -20000000L
  ): DataFrame = {
    val m = uniVocabMap(vocab)
    val tok = col("token")
    val nSym = tf.select(tok).distinct()
      .withColumn("dps", uniDps(tok, m, maxPieceLen, floorLpMicro))
      .select(tok,
        size(uniPath(tok, col("dps"), m, maxPieceLen, floorLpMicro)).as("n_sym"))
    tf
      .join(nSym, "token")
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        sum(col("tf") * length(col("token"))).as("n_chars"),
        sum(col("tf") * col("n_sym")).as("n_syms"))
  }

  // ---- t55: sampled (subword-regularization) unigram encoding ----

  /** α-scaled piece scores as the literal map the SAMPLED DP consumes:
    * slp = ⌊α·lp + 0.5⌋ micro-nats, clamped at −4·10¹⁶ so a worst-case forward
    * sum (≤ ~200 pieces · |slp|) stays inside int64 at any α the require
    * admits. One rendition shared by the forward filter and the backward
    * sampler — the same can't-drift discipline as [[uniLp]].
    */
  private def uniScaledVocabMap(vocab: DataFrame, alphaMicro: Long): Column = {
    val alpha = alphaMicro.toDouble / 1000000.0
    typedlit(vocab.select(col("piece"), col("lp_micro")).collect()
      .map(r => r.getString(0) ->
        math.max(math.floor(alpha * r.getLong(1) + 0.5), -4.0e16).toLong)
      .toMap)
  }

  private def uniScaledFloor(alphaMicro: Long, floorLpMicro: Long): Long =
    math.max(math.floor(alphaMicro.toDouble / 1000000.0 * floorLpMicro + 0.5), -4.0e16).toLong

  /** FORWARD FILTERING scores for the sampled segmenter (Kudo 2018 §4.2's FFBS,
    * α-scaled): F(k) = α-scaled log-sum-exp over all segmentations of the first
    * k−1 characters — the Viterbi fold with max replaced by logsumexp,
    * micro-quantized at every position so the recursion is deterministic across
    * engines (the one ln/exp set per position is the t20 float exposure,
    * max-shifted so the doubles only ever see small differences).
    */
  private def uniDpsLse(tok: Column, m: Column, maxPieceLen: Int, floorSlp: Long): Column =
    aggregate(
      sequence(lit(1), length(tok)),
      array(lit(0L)),
      (acc, i) => {
        val qs = filter(
          transform(sequence(greatest(lit(1), i - maxPieceLen + 1), i),
            s => element_at(acc, s) + uniLp(m, tok.substr(s, i - s + lit(1)), floorSlp)),
          q => q.isNotNull)
        val mx = array_max(qs)
        concat(acc, array(mx + floor(lit(1000000.0) * log(
            aggregate(qs, lit(0.0),
              (a, q) => a + exp((q - mx).cast("double") / lit(1000000.0))))
          + lit(0.5)).cast("long")))
      })

  /** BACKWARD SAMPLING over precomputed [[uniDpsLse]] scores: at boundary p the
    * piece ending there is drawn with weight ∝ exp(α·(F(s−1) + lp(piece)) −
    * max), weights micro-quantized to exact integers, the draw an md5-derived
    * uniform `h(token:p:seed) mod Σw` (the g45 no-rand discipline — stable
    * under partitioning and retries where `rand()` never is). Returns the
    * sampled piece COUNT (the pricing consumers need nothing else). The
    * max-weight candidate always quantizes to 10⁶, so Σw ≥ 10⁶ — the modulus
    * is never zero.
    */
  private def uniPathSampledLen(
      tok: Column, dps: Column, m: Column, maxPieceLen: Int,
      floorSlp: Long, seed: String): Column =
    aggregate(
      sequence(lit(1), length(tok)),
      struct(length(tok).cast("int").as("p"), lit(0L).as("n")),
      (acc, _) => {
        val p = acc.getField("p")
        val sLo = greatest(lit(1), p - maxPieceLen + 1)
        val qs = transform(sequence(sLo, p),
          s => element_at(dps, s) + uniLp(m, tok.substr(s, p - s + lit(1)), floorSlp))
        val mx = array_max(qs)
        val ws = transform(qs, q => coalesce(
          floor(lit(1000000.0) * exp((q - mx).cast("double") / lit(1000000.0)) + lit(0.5))
            .cast("long"),
          lit(0L)))
        val tot = aggregate(ws, lit(0L), (a, w) => a + w)
        val u = conv(substring(md5(concat(
            tok, lit(":"), p.cast("string"), lit(":"), lit(seed))), 1, 15), 16, 10)
          .cast("long") % tot
        val j = array_min(filter(
          transform(sequence(lit(1), size(ws)),
            jj => when(aggregate(slice(ws, lit(1), jj), lit(0L), (a, w) => a + w) > u, jj)),
          x => x.isNotNull))
        val sStar = sLo + j - 1
        when(p === lit(0), acc).otherwise(
          struct((sStar - 1).cast("int").as("p"), (acc.getField("n") + 1).as("n")))
      },
      acc => acc.getField("n"))

  /** t55 — SAMPLED unigram encoding: Kudo 2018's subword regularization (§4.2,
    * the l = ∞ case) — instead of the Viterbi argmax (t53), each token's
    * segmentation is DRAWN from P(seg | token)^α over the full lattice by
    * forward-filtering / backward-sampling, the published trick that turns one
    * deterministic tokenization into a regularizing distribution of
    * tokenizations. α is the sharpness dial: α→∞ concentrates on the Viterbi
    * path (pinned: with well-separated path scores this reduces EXACTLY to
    * [[unigramEncodeWith]], RoundSeventeenPropertySpec), α→0 approaches
    * uniform over coverable segmentations.
    *
    * Determinism (the g45 no-rand discipline): draws are md5-derived,
    * keyed (token, boundary position, seed) — a given (vocab, seed) prices a
    * corpus identically on any cluster layout, and an epoch loop varies `seed`
    * per epoch to get the paper's fresh per-epoch samples. Two deliberate
    * divergences from the reference implementation, both documented knobs:
    * draws are per DISTINCT token (all occurrences in one epoch share a
    * segmentation — keeps the dictionary-sized scale shape; vary seed to
    * resample), and the lattice scores are micro-quantized integers (cross-
    * engine replayability; the sampling distribution shifts by < 1e-6 nat per
    * boundary).
    *
    * Scale shape: identical to t53 — each DISTINCT token pays one forward fold
    * and one backward fold against the broadcast literal vocab
    * (O(len·maxPieceLen) map probes), per-doc totals ride the tf equi-join.
    */
  def unigramEncodeSampled(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame,
      maxPieceLen: Int = 5,
      floorLpMicro: Long = -20000000L,
      alphaMicro: Long = 500000L,
      seed: String = ""
  ): DataFrame = {
    require(alphaMicro > 0L && alphaMicro <= 1000000000000L,
      s"unigramEncodeSampled: alphaMicro must be in (0, 1e12], got $alphaMicro")
    val tf = uniTf(df, idCol, textCol)
    val m = uniScaledVocabMap(vocab, alphaMicro)
    val floorSlp = uniScaledFloor(alphaMicro, floorLpMicro)
    val tok = col("token")
    val nSym = tf.select(tok).distinct()
      .withColumn("dps", uniDpsLse(tok, m, maxPieceLen, floorSlp))
      .select(tok,
        uniPathSampledLen(tok, col("dps"), m, maxPieceLen, floorSlp, seed).as("n_sym"))
    tf
      .join(nSym, "token")
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        sum(col("tf") * length(col("token"))).as("n_chars"),
        sum(col("tf") * col("n_sym")).as("n_syms"))
  }

  /** t54 — the TOKENIZER-FAMILY decision card: the trained BPE (t24/t25) and
    * the trained unigram-LM (t52/t53) priced on the SAME corpus, one row per
    * family — total whitespace tokens / characters / emitted pieces, plus
    * pieces-per-token and chars-per-piece in half-up micro (the s40
    * serving-recall-card discipline applied to the tokenizer choice: the two
    * published families, one corpus, one table a pipeline owner reads before
    * freezing the vocabulary). Each family prices on its own token basis —
    * BPE excludes '|'-containing tokens (its separator encoding), unigram
    * does not; identical on any corpus without literal pipes, and
    * `strictSharedBasis = true` opts the unigram arm into the same exclusion
    * for like-for-like pricing on pipe-heavy corpora (default off — t53's
    * published semantics unchanged).
    *
    * Scale shape: each family's train+encode chain unchanged (dictionary-
    * sized loops, one corpus tf pass each); the card is two 1-row rollups.
    * The micro ratios overflow int64 past ~4·10¹² pieces — at that scale lift
    * the two products to DecimalType (documented knob, same as s33).
    */
  def tokenizerCompareCard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bpeRounds: Int = 4,
      uniRounds: Int = 2,
      maxPieceLen: Int = 5,
      seedVocab: Int = 300,
      vocabTarget: Int = 120,
      floorLpMicro: Long = -20000000L,
      strictSharedBasis: Boolean = false
  ): DataFrame = {
    def card(name: String, enc: DataFrame): DataFrame =
      enc.agg(
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_syms")).as("n_syms"))
        .select(lit(name).as("tokenizer"), col("n_tokens"), col("n_chars"), col("n_syms"),
          expr("(2 * 1000000 * n_syms + n_tokens) DIV (2 * n_tokens)").cast("long")
            .as("syms_per_token_micro"),
          expr("(2 * 1000000 * n_chars + n_syms) DIV (2 * n_syms)").cast("long")
            .as("chars_per_sym_micro"))
    // one unigram tokenize pass: training and pricing share the tf relation
    // (the r16 review finding — the df-level entries would pay it twice);
    // strictSharedBasis opts the unigram arm into the BPE pipe-exclusion so
    // pipe-heavy corpora compare like-for-like (r17 ADVICE; default off —
    // t53's published semantics unchanged)
    val tf = uniTf(df, idCol, textCol, excludePipes = strictSharedBasis)
    // r18: the two families train independently — overlap them (the s45 Par
    // shape; both trainers run driver-side collect loops that otherwise
    // serialize back-to-back)
    val (bpeEnc, uniEnc) = Par.join2(
      bpeEncode(df, idCol, textCol, bpeRounds).localCheckpoint(true),
      unigramEncodeWithTf(tf, idCol,
        unigramTrainFromTf(tf, uniRounds, maxPieceLen, seedVocab,
          vocabTarget, floorLpMicro),
        maxPieceLen, floorLpMicro).localCheckpoint(true))
    card("bpe", bpeEnc).unionByName(card("unigram", uniEnc))
  }

  /** t56 — the t54 card's decision ACTUATED (the t42 swap/block/hold discipline
    * applied to the tokenizer family, closing the loop the way dc30 closes
    * dc29's): BPE is the incumbent family, unigram the challenger, and the
    * corpus is priced by WHICHEVER the pinned thresholds choose —
    *
    *   - `swap` when the challenger's fertility (pieces per whitespace token,
    *     micro) beats the incumbent's by at least `marginMicro` — the
    *     published tokenizer-selection criterion (fewer pieces = more text
    *     per context window at equal vocab budget);
    *   - `block` when it does not (ties and losses keep the incumbent — a
    *     swap needs affirmative evidence);
    *   - `hold` when either family priced ZERO tokens (an empty/unscorable
    *     corpus is NO EVIDENCE, never a swap — the s25 quiet-cadence
    *     convention); the incumbent keeps serving.
    *
    * Output: one row per document of the CHOSEN family's pricing (the
    * [[bpeEncodeWith]] shape) stamped with the family name and the decision —
    * a gated UNION of the two arms, so the decision is relational and the
    * oracle replays it (no driver-side branching in the data path; the
    * driver-side twin for schedulers is [[tokenizerSwapTrigger]]).
    *
    * Scale shape: t54's card cost (both families train + price once, the
    * unigram side sharing ONE tf pass) — the arms are already materialized
    * per-doc relations, the gate a 1-row broadcast filter. Each arm prices on
    * its own token basis (BPE excludes '|'-containing tokens), identical on
    * any corpus without literal pipes — the t54 note; `strictSharedBasis`
    * aligns the bases when they would diverge.
    */
  def tokenizerSwapEpoch(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bpeRounds: Int = 4,
      uniRounds: Int = 2,
      maxPieceLen: Int = 5,
      seedVocab: Int = 300,
      vocabTarget: Int = 120,
      floorLpMicro: Long = -20000000L,
      marginMicro: Long = 50000L,
      strictSharedBasis: Boolean = false
  ): DataFrame = {
    // strictSharedBasis: the unigram arm adopts the BPE pipe-exclusion so the
    // swap decision compares fertilities on ONE token basis (r17 ADVICE;
    // default off — the published t53 basis serves)
    val tf = uniTf(df, idCol, textCol, excludePipes = strictSharedBasis)
    // r18: the two families train independently — overlap them (the s45 Par shape)
    val (bpeDoc, uniDoc) = Par.join2(
      bpeEncode(df, idCol, textCol, bpeRounds).localCheckpoint(true),
      unigramEncodeWithTf(tf, idCol,
        unigramTrainFromTf(tf, uniRounds, maxPieceLen, seedVocab, vocabTarget, floorLpMicro),
        maxPieceLen, floorLpMicro)
        .localCheckpoint(true)) // each arm feeds its total AND the gated union
    val bTot = bpeDoc.agg(sum(col("n_tokens")).as("b_nt"), sum(col("n_syms")).as("b_ns"))
    val uTot = uniDoc.agg(sum(col("n_tokens")).as("u_nt"), sum(col("n_syms")).as("u_ns"))
    val decision = bTot.crossJoin(uTot)
      .select(
        when(col("b_nt").isNull || col("b_nt") === 0L ||
          col("u_nt").isNull || col("u_nt") === 0L, lit("hold"))
          .when(
            expr("(2 * 1000000 * u_ns + u_nt) DIV (2 * u_nt)") + marginMicro
              <= expr("(2 * 1000000 * b_ns + b_nt) DIV (2 * b_nt)"), lit("swap"))
          .otherwise(lit("block")).as("action"))
      .localCheckpoint(true) // 1 row; gates both arms
    def arm(name: String, doc: DataFrame, serveWhen: Column => Column): DataFrame =
      doc.crossJoin(broadcast(decision))
        .filter(serveWhen(col("action")))
        .select(col(idCol), lit(name).as("tokenizer"),
          col("n_tokens"), col("n_chars"), col("n_syms"), col("action"))
    arm("unigram", uniDoc, _ === "swap")
      .unionByName(arm("bpe", bpeDoc, _ =!= "swap"))
  }

  /** Driver-side form of [[tokenizerSwapEpoch]]'s gate for schedulers (the
    * gateSwapTrigger discipline: the t54 card is 2 rows — family-sized, never
    * data-sized — so the job that acts on it reads a scalar).
    */
  final case class TokenizerSwapDecision(
      action: String, reason: String, chosen: String,
      bpeSymsPerTokenMicro: Long, uniSymsPerTokenMicro: Long)

  def tokenizerSwapTrigger(card: DataFrame, marginMicro: Long = 50000L): TokenizerSwapDecision = {
    val rows = card
      .select(col("tokenizer"), coalesce(col("n_tokens").cast("long"), lit(0L)),
        coalesce(col("syms_per_token_micro").cast("long"), lit(0L)))
      .collect() // 2 rows — the t54 card, bounded by construction
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    (rows.get("bpe"), rows.get("unigram")) match {
      case (Some((bn, bs)), Some((un, us))) if bn > 0L && un > 0L =>
        if (us + marginMicro <= bs)
          TokenizerSwapDecision("swap",
            s"unigram fertility ${us}µ beats bpe ${bs}µ by ≥ ${marginMicro}µ",
            "unigram", bs, us)
        else
          TokenizerSwapDecision("block",
            s"unigram fertility ${us}µ does not beat bpe ${bs}µ by ${marginMicro}µ",
            "bpe", bs, us)
      case _ =>
        TokenizerSwapDecision("hold", "zero scored tokens — no evidence", "bpe", 0L, 0L)
    }
  }

  /** Per-document character-level Shannon entropy — the gibberish/degenerate-text
    * signal (natural prose sits near the language's typical bits/char; random bytes
    * score high, repeated filler scores low). Terms are pinned to integer micro-bits
    * per (char-count, doc-length) PAIR — round(10⁶·(c/L)·log2(L/c)) as BIGINT — so
    * the per-document sum is order-free integer addition (the t20 micro-unit
    * discipline; the single log2 call per distinct ratio is the same exposure t20's
    * ln has, measured safe).
    *
    * Scale shape: a character generator (transform over the string, no regex), one
    * (doc, char) hash-agg bounded by |alphabet| rows per doc, one per-doc rollup.
    */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = df
      .filter(length(col(textCol)) >= 1)
      .select(col(idCol), explode(
        expr(s"transform(sequence(1, length($textCol)), i -> substring($textCol, i, 1))"))
        .as("ch"))
    val cnt = chars.groupBy(col(idCol), col("ch")).agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy(col(idCol)).agg(sum(col("c")).as("len"),
      count(lit(1)).as("n_distinct_chars"))
    cnt.join(tot, idCol)
      .withColumn("term",
        round(lit(1000000.0) * (col("c").cast("double") / col("len").cast("double")) *
          log2(col("len").cast("double") / col("c").cast("double"))).cast("long"))
      .groupBy(col(idCol))
      .agg(
        max(col("len")).as("n_chars"),
        max(col("n_distinct_chars")).as("n_distinct_chars"),
        sum(col("term")).as("entropy_microbits"))
  }

  /** EXACT per-group token-length quantiles (p50/p90/p99) — the corpus length-profile
    * telemetry that decides chunk sizes and packing windows. Quantile q = the smallest
    * length whose cumulative count covers ⌈q·total⌉, found by cumulating the per-group
    * LENGTH HISTOGRAM — the full corpus is never sorted; window state is one row per
    * distinct length per group. Thresholds compare `cum·100 ≥ p·total` in integers, so
    * there is no float quantile arithmetic to drift.
    *
    * This is the exact-quantile scale path for discrete metrics (length domains are
    * bounded); for unbounded continuous domains the approximate-sketch alternative is
    * `percentile_approx`, which trades the histogram for a fixed-size digest.
    */
  def lengthQuantiles(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df
      .select(col(groupCol), tokenCount(col(textCol)).as("len"))
      .groupBy(col(groupCol), col("len"))
      .agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy(col(groupCol)).orderBy(col("len"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col(groupCol))
    def q(p: Int): Column =
      min(when(col("cum") * 100 >= lit(p.toLong) * col("total"), col("len"))).as(s"p$p")
    hist
      .select(
        col(groupCol),
        col("len"),
        sum(col("c")).over(cumW).as("cum"),
        sum(col("c")).over(totW).as("total"))
      .groupBy(col(groupCol))
      .agg(max(col("total")).as("n_docs"), q(50), q(90), q(99))
  }

  /** Interpolated bigram language-model score per document — the perplexity-proxy
    * quality signal (fluent text scores high under a corpus LM; garbled/boilerplate
    * text scores low). The LM is the corpus itself: P(w2|w1) is the bigram MLE over
    * the bigram table's own marginal (so conditionals sum to 1 exactly), interpolated
    * with the unigram MLE as `lambda·P_bi + (1−lambda)·P_uni` (Jelinek–Mercer).
    * Per-bigram log-probs quantize to integer micro-nats (the t20 idiom) so per-doc
    * sums are order-free exact integers; one final division for the average.
    *
    * Scale shape: one token explode (map), one per-doc `lead` window (shuffle by doc —
    * the partition key the per-doc rollup reuses), two vocab-sized count aggregations,
    * and equi-joins of the doc-bigram relation against the (much smaller) bigram/
    * unigram model tables — AQE broadcasts them when they fit. Nothing is ever
    * all-pairs; the model tables are the only state and they are vocabulary-sized.
    */
  def bigramLogProb(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lambdaMicro: Long = 700000L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nextW = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val bigrams = tokens(df, idCol, textCol)
      .withColumn("w2", lead(col("token"), 1).over(nextW))
      .filter(col("w2").isNotNull)
      .select(col(idCol), col("token").as("w1"), col("w2"))
    val docBigrams = bigrams.groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
    val bigramModel = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val contextModel = bigramModel.groupBy(col("w1")).agg(sum(col("cb")).as("cw1"))
    val unigramModel = tokens(df, idCol, textCol).groupBy(col("token")).agg(count(lit(1)).as("cu"))
    val totalTokens = unigramModel.agg(sum(col("cu")).as("n_total"))
    val lambda = lambdaMicro.toDouble / 1000000.0
    // exact double expression mirrored verbatim in the oracle: ln(λ·cb/cw1 + (1−λ)·cu/N)
    val lpMicro = floor(
      lit(1000000.0) * log(
        lit(lambda) * (col("cb").cast("double") / col("cw1").cast("double")) +
          lit(1.0 - lambda) * (col("cu").cast("double") / col("n_total").cast("double"))
      ) + lit(0.5)
    ).cast("long")
    val scoredModel = bigramModel
      .join(contextModel, "w1")
      .join(unigramModel.withColumnRenamed("token", "w2"), "w2")
      .crossJoin(totalTokens)
      .select(col("w1"), col("w2"), lpMicro.as("lp_micro"))
    docBigrams
      .join(scoredModel, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * col("lp_micro")).as("sum_lp_micro"))
      .select(
        col(idCol),
        col("n_bigrams"),
        col("sum_lp_micro"),
        // micro-nats per bigram, floor(x+0.5): the quotient is ≥ 1/(2·n_bigrams) away
        // from any half-integer unless exactly representable, so the rounding is
        // engine-stable (a plain 6-decimal round ties when n divides the sum evenly)
        floor(col("sum_lp_micro").cast("double") / col("n_bigrams").cast("double") + lit(0.5))
          .cast("long").as("avg_lp_micro"))
  }

  /** Hashed linear quality classifier — the fastText-style filter shape (a linear
    * model over hashed bag-of-words features) used to score web documents for
    * pretraining inclusion. Each token hashes to one of `buckets` feature slots
    * (md5-bucket idiom, engine-portable); the weight table is a fixed deterministic
    * integer function of the slot (a stand-in for trained weights — production would
    * join a broadcast weight relation of exactly this shape). Scores are exact
    * integer milli-units: order-free sums, no float drift; the decision is a pure
    * sign test.
    *
    * Scale shape: explode tokens (map), one per-doc aggregation (map-side combinable
    * sum — the ONLY shuffle), weight lookup inlined as arithmetic (a trained table
    * would broadcast). O(corpus tokens) total work, no joins, no vocabulary state.
    */
  def linearQuality(
      df: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 1024
  ): DataFrame = {
    val slot = conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long") % buckets
    // deterministic pseudo-weights in [-1000, 1000] milli-units (Knuth multiplicative)
    val weightMilli = (col("slot") * 2654435761L) % 2001L - 1000L
    tokens(df, idCol, textCol)
      .select(col(idCol), slot.as("slot"))
      .select(col(idCol), weightMilli.as("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("score_milli"))
      .select(
        col(idCol),
        col("n_tokens"),
        col("score_milli"),
        // micro-units per token via floor(x+0.5) — tie-immune across engines (the
        // milli/1000·n quotient terminates in decimal, so round(…,6) hits .5 ties)
        floor(col("score_milli").cast("double") * lit(1000.0) /
          col("n_tokens").cast("double") + lit(0.5)).cast("long").as("score_micro_per_token"),
        when(col("score_milli") > 0, lit("keep")).otherwise(lit("drop")).as("label"))
  }

  /** Per-(doc, slot) hashed term frequencies — the feature relation the trained
    * quality classifier consumes (t28's md5-slot idiom, occurrence-weighted).
    */
  /** The one rendition of the feature-slot hash, shared by the relational
    * [[hashedTf]] and the per-row [[inlineMarginMicro]] scoring forms.
    */
  private def slotOf(token: Column, buckets: Int): Column =
    conv(substring(md5(token), 1, 15), 16, 10).cast("long") % buckets

  private[graft] def hashedTf(df: DataFrame, idCol: String, textCol: String, buckets: Int): DataFrame =
    tokens(df, idCol, textCol)
      .select(col(idCol), slotOf(col("token"), buckets).as("slot"))
      .groupBy(col(idCol), col("slot")).agg(count(lit(1)).as("tf"))

  /** Per-ROW scoring margin against a weight MAP literal: Σ over token
    * instances of w(slot(token)) — the same exact integers as [[lrScoreWith]]'s
    * relational Σ tf·w (instances group to tf), with no join at all. The form a
    * stream scores arrivals with when the model is collected once at setup
    * (model-sized, the census-hoisting discipline) instead of broadcast-joined
    * per batch.
    */
  private[graft] def inlineMarginMicro(text: Column, wmap: Column, buckets: Int): Column =
    aggregate(split(text, " ", -1), lit(0L),
      (acc, t) => acc + coalesce(element_at(wmap, slotOf(t, buckets)), lit(0L)))

  /** The one rendition of the micro-quantized sigmoid over an exact integer
    * margin, shared by [[lrScoreWith]] and the streaming calibration monitor.
    */
  private[graft] def sigmoidMicro(marginMicro: Column): Column =
    floor(lit(1000000.0) /
      (lit(1.0) + exp(-(marginMicro.cast("double") / lit(1000000.0))))
      + lit(0.5)).cast("long")

  /** t38 — the TRAINED counterpart of [[linearQuality]]'s fixed pseudo-weights:
    * full-batch logistic regression over hashed bag-of-words features, with labels
    * from [[qualityFilter]] (the C4-style heuristic gate supplies the supervision,
    * the model learns to imitate and smooth it — the fastText-filter training
    * loop of CCNet/LLaMA-style pipelines). Returns the weight relation
    * (slot, w_micro), ≤ `buckets` rows — the artifact a scoring job broadcasts.
    *
    * Determinism (the s22 trained-model discipline, in integer form): weights live
    * as exact integer MICRO-units, so each round's float exposure is exactly two
    * scalar expressions — the per-doc sigmoid over the exact integer margin
    * (quantized back to micro immediately: e = ⌊10⁶·(σ(m)−y)+½⌋) and the per-slot
    * step ⌊lr·(g/n)+½⌋ over the exact integer gradient. Margins and gradients are
    * order-free BIGINT sums (Σ tf·w_micro, Σ tf·e_micro), so both engines hold
    * identical integers entering every round and the oracle unrolls the loop as
    * chained CTEs exactly like `kmeansCtes`.
    *
    * Scale shape: the corpus is tokenized ONCE into the checkpointed (doc, slot,
    * tf) relation; each round is two map-side-combinable aggregations over it
    * (per-doc margin with the ≤ buckets-row weight table BROADCAST in, per-slot
    * gradient with the doc-sized error relation equi-joined), never a corpus
    * re-scan. Rounds are pinned small for the oracle; production runs more rounds
    * of the same per-round plan.
    */
  def lrQualityTrain(
      df: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 256,
      rounds: Int = 3,
      lrMicro: Long = 500000L
  ): DataFrame =
    lrQualityTrainFromTf(
      hashedTf(df, idCol, textCol, buckets).localCheckpoint(true),
      qualityFilter(df, idCol, textCol)
        .select(col(idCol), col("kept").cast("double").as("y"))
        .localCheckpoint(true),
      idCol, rounds, lrMicro)

  /** The training loop of [[lrQualityTrain]] over pre-materialized (doc, slot,
    * tf) and label relations — shared so a train-then-score entry (t39)
    * tokenizes the corpus ONCE for both halves.
    */
  private[graft] def lrQualityTrainFromTf(
      tf: DataFrame,
      labels: DataFrame,
      idCol: String,
      rounds: Int = 3,
      lrMicro: Long = 500000L
  ): DataFrame = {
    val n = tf.select(col(idCol)).distinct().count()
    val lr = lrMicro.toDouble / 1000000.0
    var w = tf.select(col("slot")).distinct()
      .withColumn("w_micro", lit(0L)).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val margins = tf.join(broadcast(w), Seq("slot"))
        .groupBy(col(idCol)).agg(sum(col("tf") * col("w_micro")).as("m_micro"))
      val errs = margins.join(labels, Seq(idCol))
        .select(col(idCol),
          floor(lit(1000000.0) *
            (lit(1.0) / (lit(1.0) + exp(-(col("m_micro").cast("double") / lit(1000000.0))))
              - col("y")) + lit(0.5)).cast("long").as("e_micro"))
      val grads = tf.join(errs, Seq(idCol))
        .groupBy(col("slot")).agg(sum(col("tf") * col("e_micro")).as("g"))
      w = w.join(grads, Seq("slot"), "left")
        .select(col("slot"),
          (col("w_micro") -
            floor(lit(lr) * (coalesce(col("g"), lit(0L)).cast("double") /
              lit(n).cast("double")) + lit(0.5)).cast("long")).as("w_micro"))
        .localCheckpoint(true)
    }
    w
  }

  /** t43 — MINI-BATCH rounds for the distilled quality classifier: full-batch
    * gradient descent ([[lrQualityTrain]]) converges slowly at corpus scale
    * because every round pays a full corpus pass for one step; the standard fix
    * is more, cheaper steps. Round r's margins and gradients compute over ONE
    * deterministic hash batch — batch(doc) = [[graft.pipeline.Sampling.bucketCol]]
    * mod `nBatches`, round r using batch (r−1) mod nBatches, so `nBatches`
    * rounds sweep the corpus exactly once (an epoch) — and the step divides by
    * THAT batch's scored-doc count. Still the s22 discipline end-to-end: exact
    * BIGINT margin/gradient sums within the batch, the only float per round the
    * sigmoid (quantized straight back), so the DuckDB oracle unrolls the same
    * batch filters as chained CTEs. An EMPTY batch (a hash range holding no
    * scored document) steps by 0 rather than dividing by zero; `nBatches = 1`
    * reduces EXACTLY to [[lrQualityTrain]] (pinned in RoundThirteenOpsSpec —
    * the t07/d16 structural-reduction invariant).
    *
    * Scale shape: per round one batch-sized map pass (the batch filter is a
    * map-side hash expression — no shuffle added) + two map-side-combinable
    * aggs against the broadcast ≤ buckets-row weight table; batch sizes are ONE
    * bounded collect (≤ nBatches rows) before the loop.
    */
  def lrQualityTrainMiniBatch(
      df: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 256,
      rounds: Int = 4,
      lrMicro: Long = 500000L,
      nBatches: Int = 4
  ): DataFrame = {
    val tf = hashedTf(df, idCol, textCol, buckets).localCheckpoint(true)
    val labels = qualityFilter(df, idCol, textCol)
      .select(col(idCol), col("kept").cast("double").as("y"))
      .localCheckpoint(true)
    val batchOf = graft.pipeline.Sampling.bucketCol(col(idCol)) % nBatches
    val sizes = tf.select(col(idCol)).distinct()
      .groupBy(batchOf.as("batch")).agg(count(lit(1)).as("n"))
      .collect() // ≤ nBatches rows — the per-batch scored-doc census, paid once
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lr = lrMicro.toDouble / 1000000.0
    var w = tf.select(col("slot")).distinct()
      .withColumn("w_micro", lit(0L)).localCheckpoint(true)
    for (r <- 1 to rounds) {
      val b = (r - 1) % nBatches
      val nB = sizes.getOrElse(b.toLong, 0L)
      if (nB > 0L) {
        val tfB = tf.filter(batchOf === b)
        val margins = tfB.join(broadcast(w), Seq("slot"))
          .groupBy(col(idCol)).agg(sum(col("tf") * col("w_micro")).as("m_micro"))
        val errs = margins.join(labels, Seq(idCol))
          .select(col(idCol),
            floor(lit(1000000.0) *
              (lit(1.0) / (lit(1.0) + exp(-(col("m_micro").cast("double") / lit(1000000.0))))
                - col("y")) + lit(0.5)).cast("long").as("e_micro"))
        val grads = tfB.join(errs, Seq(idCol))
          .groupBy(col("slot")).agg(sum(col("tf") * col("e_micro")).as("g"))
        w = w.join(grads, Seq("slot"), "left")
          .select(col("slot"),
            (col("w_micro") -
              floor(lit(lr) * (coalesce(col("g"), lit(0L)).cast("double") /
                lit(nB).cast("double")) + lit(0.5)).cast("long")).as("w_micro"))
          .localCheckpoint(true)
      }
    }
    w
  }

  /** Persist a trained weight relation ([[lrQualityTrain]]'s output) — the
    * classifier artifact: train once on a labeled snapshot, score every future
    * ingest with [[lrScoreWith]]. Integer micro-weights round-trip parquet
    * bit-exactly, so the reloaded model scores identically (the t26/s24
    * discipline).
    */
  def saveLrWeights(weights: DataFrame, path: String): Unit =
    weights.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  def loadLrWeights(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** t39 — score documents with a trained/loaded weight relation: exact integer
    * margin (Σ tf·w_micro with the ≤ buckets-row table broadcast), the sigmoid
    * quantized to micro as the keep-probability, sign test as the verdict. One
    * tokenize pass + one map-side-combinable rollup — the per-ingest cost of a
    * learned quality gate. Documents with no tokens carry no margin and are
    * absent by design (the heuristic gate already rejects them on bit 0); a
    * TOKENIZED document always gets a row — slots the training never populated
    * (possible on ingest vocabulary the snapshot lacked) weigh 0 via the LEFT
    * join, so an all-unseen-vocabulary arrival scores margin 0 / `drop` instead
    * of silently vanishing from the gate's verdicts (reviewed r13: the inner
    * join dropped such docs; on the training corpus itself the two are
    * provably identical because training seeds a weight for every seen slot).
    */
  def lrScoreWith(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      buckets: Int = 256
  ): DataFrame =
    lrScoreWithTf(hashedTf(df, idCol, textCol, buckets), idCol, weights)

  /** [[lrScoreWith]] over a pre-materialized tf relation — the t39 sharing. */
  private[graft] def lrScoreWithTf(
      tf: DataFrame,
      idCol: String,
      weights: DataFrame
  ): DataFrame =
    tf
      .join(broadcast(weights), Seq("slot"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("tf") * coalesce(col("w_micro"), lit(0L))).as("margin_micro"))
      .select(col(idCol), col("margin_micro"),
        sigmoidMicro(col("margin_micro")).as("p_micro"),
        when(col("margin_micro") > 0, lit("keep")).otherwise(lit("drop")).as("label"))

  /** t40 — per-source tokenizer FERTILITY: how many post-merge symbols the
    * tokenizer spends per whitespace token (fertility) and how many characters
    * each symbol covers (compression) in every source — the tokenizer-health
    * telemetry of multilingual pipelines (a source whose fertility spikes is one
    * the merge table was not trained for; the signal that gates tokenizer
    * retraining the same way dc03's drift gates corpus review). Ratios are single
    * divisions of exact integer sums, micro-quantized (the repo-wide order-free
    * ratio idiom).
    *
    * Scale shape: the t25 pricing path (corpus tokenized once into the tf
    * relation, |vocab|-sized merge replay) plus one per-source
    * map-side-combinable rollup with the doc→source relation equi-joined in.
    */
  def bpeFertility(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      rounds: Int = 4
  ): DataFrame =
    bpeEncode(df, idCol, textCol, rounds)
      .join(df.select(col(idCol), col(sourceCol)), Seq(idCol))
      .groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_syms")).as("n_syms"))
      .select(
        col(sourceCol), col("n_docs"), col("n_tokens"), col("n_chars"), col("n_syms"),
        floor(lit(1000000.0) * col("n_syms").cast("double") / col("n_tokens").cast("double")
          + lit(0.5)).cast("long").as("fertility_micro"),
        floor(lit(1000000.0) * col("n_chars").cast("double") / col("n_syms").cast("double")
          + lit(0.5)).cast("long").as("compression_micro"))

  /** t41 — EVALUATE the trained quality classifier against its own supervision:
    * confusion counts and precision/recall/agreement of [[lrScoreWith]]'s verdicts
    * vs [[qualityFilter]]'s heuristic labels — the model-QA rollup a pipeline
    * runs before swapping a retrained gate in (a fastText filter that stops
    * agreeing with the rules it was distilled from is a deployment blocker, the
    * t38 counterpart of s25's retrain trigger). Evaluated over SCORED documents
    * (those with ≥1 safe token — the unscorable rest already fail the heuristic
    * gate on bit 0 and never reach the model). Exact integer counts; the three
    * ratios are single micro-quantized divisions.
    *
    * Scale shape: the t39 scoring pass plus one doc-keyed equi-join to the label
    * relation and a 1-row full aggregate (map-side combinable).
    */
  /** t44 — CALIBRATION of the trained quality gate: the reliability table a
    * pipeline reads before using the gate's probabilities as anything more
    * than a sign test (sampling weights, mixing temperatures, soft labels all
    * assume p means p). Scored documents bucket by predicted-probability
    * decile; each bin reports its mean predicted probability against the
    * empirical positive rate of the supervision labels, and the signed gap —
    * a well-calibrated distillation has gaps near zero, a confident-but-wrong
    * one shows the high bins overshooting. Determinism discipline: p_micro is
    * already an exact integer ([[lrScoreWith]]), bin = p_micro div binWidth,
    * the two per-bin means are single divisions of exact integer sums.
    *
    * Scale shape: the t39 scoring pass (one corpus tokenize, weight table
    * broadcast), one doc-keyed equi-join to the label relation, and a
    * ≤ nBins-row map-side-combinable rollup.
    */
  def lrCalibration(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      buckets: Int = 256,
      nBins: Int = 10
  ): DataFrame = {
    require(nBins > 0 && 1000000 % nBins == 0, s"nBins must divide 1e6: $nBins")
    val scored = lrScoreWith(df, idCol, textCol, weights, buckets)
      .select(col(idCol), col("p_micro"))
    val labels = qualityFilter(df, idCol, textCol)
      .select(col(idCol), col("kept").cast("long").as("y"))
    scored.join(labels, Seq(idCol))
      .withColumn("bin",
        least((col("p_micro") / lit(1000000L / nBins)).cast("long"), lit(nBins - 1L)))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("y")).as("n_pos"),
        sum(col("p_micro")).as("sum_p"))
      .select(
        col("bin"), col("n_docs"), col("n_pos"),
        floor(col("sum_p").cast("double") / col("n_docs").cast("double") + lit(0.5))
          .cast("long").as("pred_micro"),
        floor(lit(1000000.0) * col("n_pos").cast("double") / col("n_docs").cast("double")
          + lit(0.5)).cast("long").as("actual_micro"))
      .withColumn("gap_micro", col("pred_micro") - col("actual_micro"))
  }

  def lrQualityEval(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      buckets: Int = 256
  ): DataFrame = {
    val scored = lrScoreWith(df, idCol, textCol, weights, buckets)
      .select(col(idCol), (col("margin_micro") > 0).cast("long").as("pred"))
    val labels = qualityFilter(df, idCol, textCol)
      .select(col(idCol), col("kept").cast("long").as("y"))
    scored.join(labels, Seq(idCol))
      .agg(
        count(lit(1)).as("n_scored"),
        sum(col("pred") * col("y")).as("tp"),
        sum(col("pred") * (lit(1L) - col("y"))).as("fp"),
        sum((lit(1L) - col("pred")) * col("y")).as("fn"),
        sum((lit(1L) - col("pred")) * (lit(1L) - col("y"))).as("tn"))
      .select(
        col("n_scored"), col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") === 0L, 0L)
          .otherwise(floor(lit(1000000.0) * col("tp").cast("double")
            / (col("tp") + col("fp")).cast("double") + lit(0.5)).cast("long"))
          .as("precision_micro"),
        when(col("tp") + col("fn") === 0L, 0L)
          .otherwise(floor(lit(1000000.0) * col("tp").cast("double")
            / (col("tp") + col("fn")).cast("double") + lit(0.5)).cast("long"))
          .as("recall_micro"),
        floor(lit(1000000.0) * (col("tp") + col("tn")).cast("double")
          / col("n_scored").cast("double") + lit(0.5)).cast("long").as("agreement_micro"))
  }

  /** t42 — the GATE-SWAP decision over a [[lrQualityEval]] row, relational form:
    * `swap` when every eval metric clears its threshold (deploy the retrained
    * weights), `block` when any fails (a distilled gate that stopped agreeing
    * with its supervision is a deployment blocker), `hold` when zero documents
    * were scored (an empty/unscorable eval window is NO EVIDENCE, never a swap
    * and never an alert — the s25 quiet-cadence convention). The t38 family's
    * counterpart of [[graft.pipeline.Similarity.retrainTrigger]]: t38 retrains
    * on its cadence, t41 evaluates the candidate, THIS decides what the serving
    * stream reloads.
    */
  def gateSwapDecision(
      eval: DataFrame,
      minAgreementMicro: Long = 850000L,
      minPrecisionMicro: Long = 800000L,
      minRecallMicro: Long = 800000L
  ): DataFrame =
    eval.select(
      col("n_scored"), col("agreement_micro"), col("precision_micro"), col("recall_micro"),
      when(col("n_scored") === 0L, lit("hold"))
        .when(col("agreement_micro") >= minAgreementMicro &&
          col("precision_micro") >= minPrecisionMicro &&
          col("recall_micro") >= minRecallMicro, lit("swap"))
        .otherwise(lit("block")).as("action"))

  /** Driver-side form of [[gateSwapDecision]] (the retrainTrigger discipline: the
    * eval is ONE row — model-sized, never data-sized — so the scheduler that acts
    * on it reads a scalar, not a relation). Same thresholds, same three-way
    * outcome, with the failing metrics named in `reason`.
    */
  final case class GateSwapDecisionRow(
      action: String, reason: String,
      nScored: Long, agreementMicro: Long, precisionMicro: Long, recallMicro: Long)

  def gateSwapTrigger(
      eval: DataFrame,
      minAgreementMicro: Long = 850000L,
      minPrecisionMicro: Long = 800000L,
      minRecallMicro: Long = 800000L
  ): GateSwapDecisionRow = {
    val rows = eval.select(
      col("n_scored").cast("long"), col("agreement_micro").cast("long"),
      col("precision_micro").cast("long"), col("recall_micro").cast("long"))
      .collect() // 1 row — the eval rollup, bounded by construction
    if (rows.isEmpty)
      return GateSwapDecisionRow("hold", "empty eval — no evidence", 0L, 0L, 0L, 0L)
    val r = rows.head
    val (n, agr, prec, rec) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    if (n == 0L)
      GateSwapDecisionRow("hold", "zero scored documents — no evidence", n, agr, prec, rec)
    else {
      val failing = Seq(
        (agr < minAgreementMicro, s"agreement ${agr}µ < ${minAgreementMicro}µ"),
        (prec < minPrecisionMicro, s"precision ${prec}µ < ${minPrecisionMicro}µ"),
        (rec < minRecallMicro, s"recall ${rec}µ < ${minRecallMicro}µ")
      ).collect { case (true, msg) => msg }
      if (failing.isEmpty)
        GateSwapDecisionRow("swap", "all metrics clear their thresholds", n, agr, prec, rec)
      else
        GateSwapDecisionRow("block", failing.mkString("; "), n, agr, prec, rec)
    }
  }

  /** The deployment check in front of a
    * [[graft.streaming.StreamOps.streamingQualityGate]] weight reload: the
    * candidate deploys ONLY on `swap`; `hold` and `block` keep the current
    * weights (block additionally carries the alert-worthy reason). Pure
    * selection so the redeploy path is unit-testable without a stream.
    */
  def chooseGateWeights(
      decision: GateSwapDecisionRow,
      candidate: DataFrame,
      current: DataFrame): DataFrame =
    if (decision.action == "swap") candidate else current

  /** Interpolated Kneser–Ney bigram score per document — the stronger LM-quality
    * signal next to [[bigramLogProb]]'s Jelinek–Mercer form (Kneser–Ney's continuation
    * probability scores a word by how many distinct CONTEXTS it follows, not raw
    * frequency — the smoothing that n-gram LM filtering pipelines actually use):
    *
    *   P_KN(w2|w1) = (c(w1,w2) − D)/c(w1) + (D·N1+(w1,·)/c(w1)) · N1+(·,w2)/N1+(··)
    *
    * with discount `D = discountMicro/1e6 < 1` (so the max(·,0) clamp is vacuous on
    * observed bigrams, which is all the per-doc rollup ever joins). Every count is an
    * exact integer (bigram count, left-marginal, distinct-successor and
    * distinct-context type counts, total bigram types); per-bigram log-probs quantize
    * to integer micro-nats (the t20/t27 idiom) so per-doc sums are order-free.
    *
    * Scale shape: identical to [[bigramLogProb]] — one token explode, one per-doc
    * `lead` window, then vocab-sized model aggregations (the two type-count tables are
    * projections of the bigram model, not extra corpus passes) equi-joined back to the
    * doc-bigram relation; AQE broadcasts the model tables when they fit.
    */
  def kneserNeyLogProb(
      df: DataFrame,
      idCol: String,
      textCol: String,
      discountMicro: Long = 750000L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nextW = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val bigrams = tokens(df, idCol, textCol)
      .withColumn("w2", lead(col("token"), 1).over(nextW))
      .filter(col("w2").isNotNull)
      .select(col(idCol), col("token").as("w1"), col("w2"))
    val docBigrams = bigrams.groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
    val bigramModel = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      .localCheckpoint(true) // four consumers: scored model + three type-count projections
    val contextModel = bigramModel.groupBy(col("w1"))
      .agg(sum(col("cb")).as("cw1"), count(lit(1)).as("n1w1"))
    val contModel = bigramModel.groupBy(col("w2")).agg(count(lit(1)).as("ncw2"))
    val totalTypes = bigramModel.agg(count(lit(1)).as("n_big"))
    val d = discountMicro.toDouble / 1000000.0
    // exact double sequence mirrored verbatim in the oracle:
    // ln((cb − D)/cw1 + (D·n1w1/cw1)·(ncw2/nBig))
    val lpMicro = floor(
      lit(1000000.0) * log(
        (col("cb").cast("double") - lit(d)) / col("cw1").cast("double") +
          lit(d) * col("n1w1").cast("double") / col("cw1").cast("double") *
          (col("ncw2").cast("double") / col("n_big").cast("double"))
      ) + lit(0.5)
    ).cast("long")
    val scoredModel = bigramModel
      .join(contextModel, "w1")
      .join(contModel, "w2")
      .crossJoin(broadcast(totalTypes))
      .select(col("w1"), col("w2"), lpMicro.as("lp_micro"))
    docBigrams
      .join(scoredModel, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * col("lp_micro")).as("sum_lp_micro"))
      .select(
        col(idCol),
        col("n_bigrams"),
        col("sum_lp_micro"),
        floor(col("sum_lp_micro").cast("double") / col("n_bigrams").cast("double") + lit(0.5))
          .cast("long").as("avg_lp_micro"))
  }

  /** t46 — GOPHER REPETITION RULES (Rae et al. 2021, appendix A1.1.3 — the
    * published web-filter battery every modern pretraining pipeline reuses):
    * per document, the TOP n-gram character fraction for n = 2..4 (characters
    * covered by the single most frequent word n-gram) and the DUPLICATE n-gram
    * character fraction for n = 5..10 (characters covered by n-grams occurring
    * more than once), each tested against the paper's thresholds
    * (0.20/0.18/0.16 and 0.15/0.14/0.13/0.12/0.11/0.10). A failing rule sets
    * its bit in `reasons` (bit 0 = top-2 … bit 8 = dup-10, the t05 bitmask
    * idiom); `kept` ⇔ all nine pass. Character coverage is occurrence-counted
    * (count × n-gram length — the sum form, an upper bound where occurrences
    * overlap; the paper does not specify overlap handling and the sum is the
    * order-free exactly-aggregable form). The top n-gram tie-breaks
    * deterministically by (count desc, char length desc, gram asc).
    *
    * Scale shape: ONE pass — the split array fans out to (position × n) rows
    * (≤ 9·tokens per doc), per-(doc, n, gram) counts and the per-(doc, n)
    * rollups are map-side-combinable hash aggs keyed by doc, the top-gram pick
    * is a doc-keyed window over the (doc, n, gram) aggregate, and every
    * fraction is exact integer micro arithmetic ((2a+b) div 2b — no doubles
    * anywhere). Nothing holds more than per-document state.
    */
  def gopherRepetition(
      df: DataFrame,
      idCol: String,
      textCol: String,
      topThresholdsMicro: Seq[Long] = Seq(200000L, 180000L, 160000L),
      dupThresholdsMicro: Seq[Long] = Seq(150000L, 140000L, 130000L, 120000L, 110000L, 100000L)
  ): DataFrame = {
    require(topThresholdsMicro.size == 3 && dupThresholdsMicro.size == 6,
      "gopher thresholds are the published n = 2..4 top and n = 5..10 dup batteries")
    // r18 shape: every gram group of the battery lives INSIDE one document row
    // (counts are per (doc, n, gram)), so the whole battery is computable as
    // ONE codegen'd map pass — sort each n's gram array, run-length-encode the
    // sorted runs, and reduce the runs per rule. The previous shape exploded a
    // 9·tokens-per-doc gram relation, hash-aggregated it corpus-wide, shuffled
    // it twice more (per-(doc,n) window + dup rollup, unioned), pivoted, and
    // joined back to the corpus — all of it shuffle traffic over data that
    // never needed to leave its row. Value-identical: run counts over a sorted
    // array ARE the group counts, and the old gram-asc tie-break only chose
    // WHICH gram reported chars_in = c·len — ties on (c, len) all report the
    // same product, so max(struct(c, len)) over runs is the rank-1 value.
    // `fanOut` stays: at bench scale the corpus arrives as one input split and
    // the per-doc compute is the whole cost, so it must spread (at cluster
    // scale the scan has real splits and fanOut is a no-op).
    val thresholds = topThresholdsMicro ++ dupThresholdsMicro
    // ONE self-contained expression computes all nine chars_in values, with
    // every intermediate bound exactly once as a higher-order-function lambda
    // variable (the `element_at(transform(array(e), v -> body), 1)` binding
    // idiom): HOFs evaluate interpreted and are invisible to codegen CSE, so
    // naming intermediates as projection columns lets CollapseProject inline
    // them per REFERENCE — the first cut of this rewrite re-ran split(text)
    // per element access and was ~100× slower than the shuffle it replaced.
    //   w  — the split word array (bound once per doc)
    //   s  — n's sorted gram array (run-length grouping needs any total order)
    //   st — 1-based positions opening a new distinct gram run
    //   runs — (count, char length) per distinct gram: count = next start −
    //          this start (last run closed by size(s) + 1)
    val runs = "transform(st, (x, ri) -> named_struct(" +
      "'c', cast(if(ri + 2 <= size(st), element_at(st, ri + 2), size(s) + 1) - x as bigint), " +
      "'len', cast(length(element_at(s, x)) as bigint)))"
    val charsInExpr =
      "element_at(transform(array(split(t, ' ', -1)), w -> " +
        "transform(sequence(2, 10), n -> " +
          "element_at(transform(array(case when size(w) >= n then " +
              "array_sort(transform(sequence(1, size(w) - n + 1), i -> array_join(slice(w, i, n), ' ')))" +
              " else cast(array() as array<string>) end), s -> " +
            "element_at(transform(array(case when size(s) = 0 then cast(array() as array<int>) else " +
                "filter(sequence(1, size(s)), j -> j = 1 or element_at(s, j) != element_at(s, j - 1)) end), st -> " +
              // top battery (n ≤ 4): argmax over (c, len) — chars_in = c·len is
              // tie-invariant, so any (c, len) argmax equals the old rank-1 row;
              // dup battery (n ≥ 5): Σ c·len over runs with c ≥ 2
              s"if(n <= 4, aggregate($runs, named_struct('c', 0L, 'len', 0L), " +
                "(a, x) -> if(x.c > a.c or (x.c = a.c and x.len > a.len), x, a), a -> a.c * a.len), " +
              s"aggregate($runs, 0L, (a, x) -> a + if(x.c >= 2, x.c * x.len, 0L)))" +
            "), 1)" +
          "), 1)" +
        ")" +
      "), 1)"
    // explode(array(…)) is a Generate barrier: CollapseProject cannot merge
    // across it, so the battery runs once per doc and the fraction columns
    // below extract from the bound `g` attribute instead of re-deriving it
    Scans.fanOut(df)
      .select(col(idCol), col(textCol).as("t"))
      .select(col(idCol), length(col("t")).cast("long").as("n_chars"),
        explode(array(expr(charsInExpr))).as("g"))
      .select(
        col(idCol) +: col("n_chars") +:
          (2 to 10).map { n =>
            // exact floor(1e6·a/b + ½) = (2·1e6·a + b) div 2b; greatest guards the
            // empty-text doc (a = 0 there, so the clamped denominator is harmless)
            expr(s"(2 * 1000000 * element_at(g, ${n - 1}) + greatest(n_chars, 1)) div " +
              "(2 * greatest(n_chars, 1))").cast("long").as(fracName(n - 2))
          }: _*)
      .select(
        col(idCol) +: col("n_chars") +: (0 until 9).map(i => col(fracName(i))) :+
          thresholds.zipWithIndex.map { case (t, i) =>
            when(col(fracName(i)) > t, 1L << i).otherwise(0L)
          }.reduce(_ + _).as("reasons"): _*)
      .withColumn("kept", (col("reasons") === 0L).cast("int"))
  }

  private def fracName(i: Int): String =
    if (i < 3) s"top${i + 2}_micro" else s"dup${i + 2}_micro"

  /** t47 — GOPHER DOCUMENT-QUALITY RULES (Rae et al. 2021, appendix A1.1.1 —
    * with the [[gopherRepetition]] battery this completes the published Gopher
    * web filter): per document,
    *
    *   - bit 0 — word count outside [`minWords`, `maxWords`]
    *   - bit 1 — mean word length outside [`minMeanLen`, `maxMeanLen`]
    *   - bit 2 — symbol-to-word ratio > 10% ('#' plus ASCII "..." plus '…')
    *   - bit 3 — more than 10% of lines start with a bullet ("- ", "* ", '•')
    *   - bit 4 — more than 30% of lines end with an ellipsis ("..." or '…')
    *   - bit 5 — fewer than 80% of words contain an alphabetic character
    *   - bit 6 — fewer than `minRequiredHits` DISTINCT members of
    *     `requiredWords` present (the paper's {the, be, to, of, and, that,
    *     have, with} ≥ 2 rule)
    *
    * `kept` ⇔ all seven pass (the t05/t46 bitmask idiom). Every test is exact
    * integer arithmetic on counts — each ratio threshold is cleared of division
    * (10·symbols > n_words, 10·bullets > n_lines, 10·ellipsis > 3·n_lines,
    * 5·alpha < 4·n_words, minMeanLen·n ≤ Σlen ≤ maxMeanLen·n), so the verdict
    * reproduces bit-for-bit on any engine. Words are the corpus convention's
    * split-on-space array (empty split tokens included, as everywhere); lines
    * split on newline.
    *
    * Scale shape: ONE map-side pass — every metric is a per-row expression over
    * the split arrays (no explode, no join, no shuffle anywhere); the operator
    * is a pure projection and composes with any downstream gate for free.
    */
  def gopherQuality(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      minMeanLen: Long = 3L,
      maxMeanLen: Long = 10L,
      requiredWords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"),
      minRequiredHits: Int = 2
  ): DataFrame = {
    require(requiredWords.nonEmpty && requiredWords.distinct == requiredWords,
      "gopherQuality: requiredWords must be non-empty and distinct")
    val t = col(textCol)
    val words = split(t, " ", -1)
    val lines = split(t, "\n", -1)
    val metrics = df.select(
      col(idCol),
      size(words).cast("long").as("n_words"),
      aggregate(words, lit(0L), (a, x) => a + length(x)).as("sum_word_chars"),
      // non-overlapping occurrence counts, the shared length-difference recipe
      (occ(t, "#") + occ(t, "...") + occ(t, "…")).as("n_symbols"),
      size(lines).cast("long").as("n_lines"),
      size(filter(lines, l =>
        l.startsWith("- ") || l.startsWith("* ") || l.startsWith("•")))
        .cast("long").as("n_bullet_lines"),
      size(filter(lines, l => l.endsWith("...") || l.endsWith("…")))
        .cast("long").as("n_ellipsis_lines"),
      size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long").as("n_alpha_words"),
      requiredWords.map(rw => when(array_contains(words, rw), 1L).otherwise(0L))
        .reduce(_ + _).as("req_hits"))
    val reasons =
      when(col("n_words") < minWords || col("n_words") > maxWords, 1L).otherwise(0L) +
        when(col("sum_word_chars") < lit(minMeanLen) * col("n_words") ||
          col("sum_word_chars") > lit(maxMeanLen) * col("n_words"), 2L).otherwise(0L) +
        when(col("n_symbols") * 10L > col("n_words"), 4L).otherwise(0L) +
        when(col("n_bullet_lines") * 10L > col("n_lines"), 8L).otherwise(0L) +
        when(col("n_ellipsis_lines") * 10L > col("n_lines") * 3L, 16L).otherwise(0L) +
        when(col("n_alpha_words") * 5L < col("n_words") * 4L, 32L).otherwise(0L) +
        when(col("req_hits") < minRequiredHits, 64L).otherwise(0L)
    metrics
      .withColumn("reasons", reasons)
      .withColumn("kept", (col("reasons") === 0L).cast("int"))
  }

  /** t48 — the FULL published Gopher filter: the [[gopherQuality]] battery and
    * the [[gopherRepetition]] battery joined per document, `kept` ⇔ every rule
    * of BOTH passes. This is the gate a production web-corpus run deploys (Rae
    * et al. 2021 filter the two batteries together); the per-battery masks stay
    * separate in the output (`quality_reasons`, `rep_reasons`) so an audit can
    * attribute every drop to its named rule.
    *
    * Scale shape: the (id, text) projection is materialized ONCE
    * (localCheckpoint — the dc05/q15 multi-consumer discipline) and feeds both
    * batteries, so the corpus text is scanned once; the quality side is a pure
    * map over the checkpoint, the repetition side is t46's bounded fan-out, and
    * the final id-equi-join is between two per-document relations.
    */
  def gopherGate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      requiredWords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"),
      minRequiredHits: Int = 2
  ): DataFrame = {
    val base = df.select(col(idCol), col(textCol)).localCheckpoint(true)
    val quality = gopherQuality(base, idCol, textCol, minWords = minWords,
      maxWords = maxWords, requiredWords = requiredWords,
      minRequiredHits = minRequiredHits)
      .select(col(idCol), col("n_words"), col("reasons").as("quality_reasons"))
    val rep = gopherRepetition(base, idCol, textCol)
      .select(col(idCol), col("n_chars"), col("reasons").as("rep_reasons"))
    quality.join(rep, Seq(idCol))
      .select(col(idCol), col("n_words"), col("n_chars"),
        col("quality_reasons"), col("rep_reasons"),
        (col("quality_reasons") === 0L && col("rep_reasons") === 0L)
          .cast("int").as("kept"))
  }

  /** t45 — CCNet-style PERPLEXITY TERTILES (Wenzek et al., LREC 2020 §3: score
    * every document with an LM trained on a high-quality reference corpus, then
    * split the corpus into head/middle/tail thirds by perplexity — the published
    * shape behind "keep the head, drop the tail" web-corpus curation). The LM is
    * a bigram model with STUPID BACKOFF (Brants et al., EMNLP 2007 — the
    * smoothing designed for distributed trillion-token LMs precisely because
    * every score is a ratio of two counts, no normalization pass):
    *
    *   s(w2|w1) = c(w1,w2)/c(w1)        if the bigram is in the reference
    *            = α · c(w2)/N           else if w2 is a reference token (α = 0.4)
    *            = exp(oovLpMicro/1e6)   else (OOV — pinned penalty, so unseen
    *                                    vocabulary gets a score instead of vanishing)
    *
    * Cross-corpus by construction: counts come ONLY from `sourceCol = refSource`
    * documents (the t31 target-source convention); every document — including
    * reference ones — is scored against that model. Per-bigram log-scores
    * quantize to integer micro-nats (the t20/t29 idiom) so per-doc sums are
    * order-free; documents with < 2 tokens score the OOV penalty rather than
    * dropping out. Tertiles are EXACT by rank (1 + (rank−1)·3 div n, avg-score
    * desc with doc-id tie-break — the rfm bucket formula, no ntile), dispatched
    * to one bounded global window below `maxGlobalWindowDocs` and to
    * [[graft.AnalyticsQueries.distributedRank]]'s range-exchange form above it.
    *
    * Scale shape: ONE tokenize pass (checkpointed — bigram and reference-unigram
    * consumers), model relations are vocabulary-sized aggregates equi-joined
    * back to the doc-bigram relation (AQE broadcasts them when they fit), the
    * reference total rides in as one broadcast row, and the ranked relation is
    * the per-DOC aggregate. head = lowest perplexity (highest avg log-score).
    */
  def ccnetTertiles(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      refSource: String,
      oovLpMicro: Long = -20000000L,
      maxGlobalWindowDocs: Long = 2000000L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perDoc = ccnetDocScores(df, idCol, textCol, sourceCol, refSource, oovLpMicro)
      .localCheckpoint(true) // two jobs: the dispatch count and the ranked chain
    val n = perDoc.count()
    val ord = Seq(col("avg_lp_micro").desc, col(idCol).asc)
    ccnetRankTail(perDoc, idCol, n, ord, maxGlobalWindowDocs)
  }

  /** The t45 reference-LM scorer half of [[ccnetTertiles]], shared with dc29's
    * DoReMi loop ([[graft.pipeline.Sampling.doremiMixWeights]]): per document,
    * the bigram count and the average stupid-backoff log-score in exact
    * micro-nats against the `refSource`-trained model. One rendition — the
    * CTE chain, the quantization, and the OOV rule can never drift between
    * the tertile split and the mix loop.
    */
  private[graft] def ccnetDocScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      refSource: String,
      oovLpMicro: Long = -20000000L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val alpha = 0.4 // Brants et al. 2007's backoff constant, shared with the oracle
    val toks = tokens(df, idCol, textCol)
      .localCheckpoint(true) // two consumers: the bigram window and reference unigrams
    val nextW = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val bigrams = toks
      .withColumn("w2", lead(col("token"), 1).over(nextW))
      .filter(col("w2").isNotNull)
      .select(col(idCol), col("token").as("w1"), col("w2"))
      .localCheckpoint(true) // two consumers: per-doc rollup and the reference model
    val refIds = df.filter(col(sourceCol) === refSource).select(col(idCol))
    val bm = bigrams.join(refIds, Seq(idCol))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      .localCheckpoint(true) // two consumers: the score join and the context marginal
    val cm = bm.groupBy(col("w1")).agg(sum(col("cb")).as("cw1"))
    val uni = toks.join(refIds, Seq(idCol))
      .groupBy(col("token")).agg(count(lit(1)).as("cu"))
      .withColumnRenamed("token", "w2")
      .localCheckpoint(true) // two consumers: the backoff join and the token total
    val tot = uni.agg(sum(col("cu")).as("n_ref"))
    // a missing/empty reference source would silently score EVERY document the
    // OOV penalty and rank by id — data-shaped garbage. Fail loudly instead
    // (the ivfAssignNew misconfiguration discipline); 1-row collect of a
    // vocab-sized aggregate.
    require(!tot.collect()(0).isNullAt(0),
      s"ccnetTertiles: reference source '$refSource' has no tokens — " +
        "the LM would be empty and every document would score the OOV penalty")
    // exact double sequence mirrored verbatim in the oracle:
    // ln(cb/cw1) | ln(α·(cu/N)) | pinned OOV micro
    val lp =
      when(col("cb").isNotNull,
        floor(lit(1000000.0) * log(col("cb").cast("double") / col("cw1").cast("double"))
          + lit(0.5)).cast("long"))
        .when(col("cu").isNotNull,
          floor(lit(1000000.0) *
            log(lit(alpha) * (col("cu").cast("double") / col("n_ref").cast("double")))
            + lit(0.5)).cast("long"))
        .otherwise(lit(oovLpMicro))
    val scored = bigrams
      .groupBy(col(idCol), col("w1"), col("w2")).agg(count(lit(1)).as("tf"))
      .join(bm.join(cm, "w1"), Seq("w1", "w2"), "left")
      .join(uni, Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .select(col(idCol), col("tf"), lp.as("lp_micro"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_bigrams"), sum(col("tf") * col("lp_micro")).as("sum_lp"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams").isNull, lit(oovLpMicro))
          .otherwise(floor(col("sum_lp").cast("double") / col("n_bigrams").cast("double")
            + lit(0.5)).cast("long")).as("avg_lp_micro"))
  }

  /** The tertile-ranking tail of [[ccnetTertiles]] over a checkpointed
    * [[ccnetDocScores]] relation — split out so the scorer stays reusable.
    */
  private def ccnetRankTail(
      perDoc: DataFrame,
      idCol: String,
      n: Long,
      ord: Seq[Column],
      maxGlobalWindowDocs: Long
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked =
      if (n <= maxGlobalWindowDocs)
        perDoc.withColumn("rank", row_number().over(Window.orderBy(ord: _*)).cast("long"))
      else graft.AnalyticsQueries.distributedRank(perDoc, "rank", ord)
    ranked
      .withColumn("tertile", expr(s"CAST(1 + (rank - 1) * 3 DIV $n AS BIGINT)"))
      .select(col(idCol), col("n_bigrams"), col("avg_lp_micro"), col("tertile"),
        when(col("tertile") === 1L, lit("head"))
          .when(col("tertile") === 2L, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Pointwise mutual information of adjacent token pairs: the collocation detector
    * that finds multi-word units ("new york", "machine learning") worth preserving as
    * single tokenizer symbols. pmi = ln(p(xy) / (p(x)·p(y))) with p(xy) from the
    * adjacent-pair distribution and p(x) from the unigram distribution; pairs below
    * `minCount` are dropped first (rare-pair PMI is noise), output is the top `k` by
    * PMI (score quantized to integer micro-units so the cut is deterministic).
    *
    * Scale shape: bigrams come straight off the split array (one map-side transform —
    * no per-document window, no self-join), pair and unigram counts are map-side
    * combinable hash-aggs, the two count joins are equi-joins on token keys (AQE
    * broadcasts the smaller side), the corpus totals ride in as one broadcast row, and
    * the top-k is a distributed TakeOrdered. Nothing here holds more than
    * vocabulary-sized state per task at 100 TB.
    */
  def pmiPairs(
      df: DataFrame,
      textCol: String,
      minCount: Long = 5L,
      k: Int = 100
  ): DataFrame = {
    val toks = Scans.fanOut(df)
      .select(split(col(textCol), " ", -1).as("w"))
      .localCheckpoint(true) // two consumers: pair counts and unigram counts
    // guard size>=2 BEFORE sequence(): Spark's sequence(1, 0) is a DESCENDING range,
    // not empty (the oracle's generate_series(1, 0) IS empty)
    val pairCounts = toks
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1)," +
          " i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val uniCounts = toks
      .select(explode(col("w")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_tok"))
      .localCheckpoint(true) // consumed twice (the w1 and w2 join sides)
    // both corpus totals in ONE pass over the checkpointed split arrays — a single
    // broadcast row instead of two (values identical to the oracle's separate
    // unigram-sum and per-doc-pair-sum CTEs)
    val totals = toks.select(
      sum(size(col("w"))).cast("long").as("n_tokens_total"),
      sum(greatest(size(col("w")) - 1, lit(0))).cast("long").as("n_pairs_total"))
    // exact double sequence mirrored in the oracle:
    // ln( (n_pair/P) / ((n_w1/T) * (n_w2/T)) )
    val pmiMicro = floor(
      lit(1000000.0) * log(
        (col("n_pair").cast("double") / col("n_pairs_total").cast("double")) /
          ((col("n_w1").cast("double") / col("n_tokens_total").cast("double")) *
            (col("n_w2").cast("double") / col("n_tokens_total").cast("double")))
      ) + lit(0.5)
    ).cast("long")
    pairCounts
      .join(uniCounts.select(col("token").as("w1"), col("n_tok").as("n_w1")), "w1")
      .join(uniCounts.select(col("token").as("w2"), col("n_tok").as("n_w2")), "w2")
      .crossJoin(broadcast(totals))
      .select(
        col("w1"), col("w2"), col("n_pair"), col("n_w1"), col("n_w2"),
        pmiMicro.as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /** t35 — cross-snapshot source drift: per-source KL divergence (in integer
    * micro-nats) between the unigram LM of the EARLY corpus snapshot (doc_id <
    * `cutId` — ingestion order is the corpus's time axis, the g41 `asOf` idea
    * applied to documents) and the LATE remainder. This is sk09's
    * distribution-drift story at the LANGUAGE level: a source whose token
    * distribution moved between snapshots changed its generator, upstream filter,
    * or scraping target — KL(P_late ‖ Q_early) is the standard alarm quantity.
    * Both LMs are Laplace-smoothed over the source's union vocabulary, so words
    * seen in only one window contribute finite terms.
    *
    * Determinism (the t20/t33 idiom): counts and totals are exact integers; each
    * word's P·ln(P/Q) is one fixed double sequence micro-quantized
    * (`floor(1e6·x + 0.5)`) per row, and the per-source KL is then an exact
    * integer sum — order-free in both engines.
    *
    * Scale shape: one token explode, ONE map-side-combinable (source, token) count
    * pass producing both windows' counts as conditional sums (never two corpus
    * scans), source totals as a second source-sized agg broadcast back, and the
    * term rollup reuses the (source, token) partitioning. Nothing global-sorts;
    * state is vocabulary-sized.
    */
  def sourceDrift(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      cutId: Long
  ): DataFrame = {
    val toks = Scans.fanOut(df)
      .select(
        col(sourceCol).as("source"),
        (col(idCol) < cutId).as("early"),
        explode(split(col(textCol), " ", -1)).as("token"))
    val counts = toks.groupBy(col("source"), col("token"))
      .agg(
        sum(when(col("early"), 1L).otherwise(0L)).as("cq"),
        sum(when(col("early"), 0L).otherwise(1L)).as("cp"))
      .localCheckpoint(true) // two consumers: the source totals and the term pass
    val totals = counts.groupBy(col("source"))
      .agg(sum(col("cp")).as("np"), sum(col("cq")).as("nq"), count(lit(1)).as("vocab"))
    val p = (col("cp") + lit(1L)).cast("double") / (col("np") + col("vocab")).cast("double")
    val q = (col("cq") + lit(1L)).cast("double") / (col("nq") + col("vocab")).cast("double")
    val term = floor(lit(1000000.0) * p * log(p / q) + lit(0.5)).cast("long")
    counts.join(broadcast(totals), "source")
      .select(col("source"), col("np"), col("nq"), col("vocab"), term.as("term_micro"))
      .groupBy(col("source"))
      .agg(
        max(col("np")).as("n_late_tokens"),
        max(col("nq")).as("n_early_tokens"),
        max(col("vocab")).as("vocab"),
        sum(col("term_micro")).as("kl_micro_nats"))
  }

  /** t37 — [[sourceDrift]]'s BOUNDED-STATE form: the same per-source early/late KL
    * divergence, but over `buckets` hashed token buckets instead of the raw
    * vocabulary (the t31 DSIR hashed-feature discipline applied to drift). The
    * per-source state collapses from vocabulary-sized to a FIXED `buckets` counts —
    * the form whose registers a streaming monitor can hold per source forever
    * ([[graft.streaming.StreamOps.streamingDrift]] keeps exactly these counts as
    * group state and is prefix-parity-pinned against this operator). Hash
    * collisions merge word masses, so bucketed KL LOWER-bounds the vocabulary KL —
    * the standard trade for bounded monitoring state; Laplace smoothing is over
    * the fixed bucket count, making every term finite with either window empty.
    *
    * Determinism: identical to t35 — exact integer counts, one fixed double
    * sequence per bucket micro-quantized, exact integer sum per source.
    */
  def sourceDriftHashed(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      cutId: Long,
      buckets: Int = 1024
  ): DataFrame = {
    val toks = Scans.fanOut(df)
      .select(
        col(sourceCol).as("source"),
        (col(idCol) < cutId).as("early"),
        explode(split(col(textCol), " ", -1)).as("token"))
      .select(
        col("source"), col("early"),
        (conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long") % buckets)
          .as("bucket"))
    val counts = toks.groupBy(col("source"), col("bucket"))
      .agg(
        sum(when(col("early"), 1L).otherwise(0L)).as("cq"),
        sum(when(col("early"), 0L).otherwise(1L)).as("cp"))
      .localCheckpoint(true) // two consumers: the source totals and the term pass
    val totals = counts.groupBy(col("source"))
      .agg(sum(col("cp")).as("np"), sum(col("cq")).as("nq"))
    val p = (col("cp") + lit(1L)).cast("double") / (col("np") + lit(buckets.toLong)).cast("double")
    val q = (col("cq") + lit(1L)).cast("double") / (col("nq") + lit(buckets.toLong)).cast("double")
    val term = floor(lit(1000000.0) * p * log(p / q) + lit(0.5)).cast("long")
    // the Laplace term of an UNOBSERVED bucket (cp = cq = 0) is NOT zero when the
    // window sizes differ — the full-support KL adds it once per empty bucket
    val p0 = lit(1.0) / (col("n_late_tokens") + lit(buckets.toLong)).cast("double")
    val q0 = lit(1.0) / (col("n_early_tokens") + lit(buckets.toLong)).cast("double")
    val term0 = floor(lit(1000000.0) * p0 * log(p0 / q0) + lit(0.5)).cast("long")
    counts.join(broadcast(totals), "source")
      .select(col("source"), col("np"), col("nq"), term.as("term_micro"))
      .groupBy(col("source"))
      .agg(
        max(col("np")).as("n_late_tokens"),
        max(col("nq")).as("n_early_tokens"),
        count(lit(1)).as("n_obs"),
        sum(col("term_micro")).as("obs_micro"))
      .select(
        col("source"), col("n_late_tokens"), col("n_early_tokens"),
        (col("obs_micro") + (lit(buckets.toLong) - col("n_obs")) * term0)
          .as("kl_micro_nats"))
  }

  /** Zipf-law fit over the head of the vocabulary: least-squares slope/intercept/R² of
    * ln(frequency) against ln(rank) for the `fitK` most frequent tokens — the standard
    * corpus-health diagnostic (natural text sits near slope −1; machine-generated or
    * template-heavy corpora drift flat or steep). Fitting the HEAD is both the
    * statistical convention and the scale guard: the rank window only ever sees a
    * `fitK`-row relation (the top-k itself is a distributed TakeOrdered), so nothing
    * global-sorts the full vocabulary.
    *
    * Determinism: each ln() is quantized to integer micro-units per row, the five
    * regression power sums are then EXACT integer sums (order-free), and the final
    * slope/intercept/R² are a fixed double-arithmetic sequence over those exact sums —
    * mirrored verbatim in the oracle.
    */
  def zipfFit(df: DataFrame, idCol: String, textCol: String, fitK: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = vocabulary(df, idCol, textCol, k = fitK)
      .select(col("token"), col("n_occurrences"))
    // rank over the fitK-row head only (bounded single-partition window by design)
    val ranked = top
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n_occurrences").desc, col("token").asc)))
      .select(
        floor(lit(1000000.0) * log(col("rank").cast("double")) + lit(0.5))
          .cast("long").as("lx"),
        floor(lit(1000000.0) * log(col("n_occurrences").cast("double")) + lit(0.5))
          .cast("long").as("ly"))
    logLogFit(ranked)
  }

  /** t36 — Heaps'-law fit: least-squares β and ln k of V(N) ≈ k·N^β over the t32
    * vocabulary-growth curve (cumulative vocab vs cumulative tokens per doc-id
    * bucket) — the companion corpus-health diagnostic to t34's Zipf slope: natural
    * text grows vocabulary at β ≈ 0.4–0.8, while template/boilerplate corpora
    * flatten (new text re-uses old words) and ID-heavy or noisy corpora steepen
    * toward 1. Shares [[zipfFit]]'s regression kernel verbatim (one extraction,
    * two fits — the two sides cannot drift) and its determinism story: per-point
    * micro-quantized ln, exact integer power sums, one final double sequence.
    *
    * Scale shape: inherits t32's (two map-side-combinable aggs over the token
    * relation; the cumulative window sees |docs|/bucketDocs rows); the fit itself
    * aggregates that bucket-sized relation to one row.
    */
  def heapsFit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bucketDocs: Long = 50L
  ): DataFrame = {
    val points = vocabGrowth(df, idCol, textCol, bucketDocs)
      .filter(col("cum_tokens") > 0 && col("vocab") > 0)
      .select(
        floor(lit(1000000.0) * log(col("cum_tokens").cast("double")) + lit(0.5))
          .cast("long").as("lx"),
        floor(lit(1000000.0) * log(col("vocab").cast("double")) + lit(0.5))
          .cast("long").as("ly"))
    logLogFit(points)
  }

  /** Shared log-log least-squares kernel of [[zipfFit]] and [[heapsFit]]: points
    * arrive as micro-quantized (lx, ly); the five power sums are exact integer
    * aggregations (order-free), and slope/intercept/R² are one fixed double
    * sequence over them, degenerate-variance-guarded — mirrored verbatim in both
    * oracles.
    */
  private def logLogFit(points: DataFrame): DataFrame = {
    val sums = points.agg(
      count(lit(1)).as("n"),
      sum(col("lx")).as("sx"),
      sum(col("ly")).as("sy"),
      sum(col("lx") * col("ly")).as("sxy"),
      sum(col("lx") * col("lx")).as("sxx"),
      sum(col("ly") * col("ly")).as("syy"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val syD = col("sy").cast("double")
    val covNum = nD * col("sxy").cast("double") - sxD * syD
    val varX = nD * col("sxx").cast("double") - sxD * sxD
    val varY = nD * col("syy").cast("double") - syD * syD
    // degenerate-fit guard (mirrored in the oracle): a single-token vocabulary has
    // varX = 0 and a uniform-frequency head has varY = 0 — the regression is
    // undefined there, so slope/R² report 0 rather than leaking Spark-NaN-to-0 vs
    // DuckDB-NULL disagreement; the intercept degrades to the mean of ly
    val slope = when(varX === lit(0.0), lit(0.0)).otherwise(covNum / varX)
    val r2 = when(varX * varY === lit(0.0), lit(0.0))
      .otherwise(covNum * covNum / (varX * varY))
    sums.select(
      col("n").as("n_fit"),
      floor(lit(1000000.0) * slope + lit(0.5)).cast("long").as("slope_micro"),
      // ly is already micro-scaled, so the intercept is too
      floor((syD - slope * sxD) / nD + lit(0.5)).cast("long").as("intercept_micro"),
      floor(lit(1000000.0) * r2 + lit(0.5)).cast("long").as("r2_micro"))
  }

  /** t49 — READABILITY (Flesch 1948 reading ease): the classic surface-form
    * difficulty score, the third axis of the quality toolkit next to t02's
    * stopword-density heuristic and t45's LM perplexity — readability needs no
    * trained model and no reference corpus, so it is the gate a pipeline can run
    * on day one over any source.
    *
    *   F = 206.835 − 1.015 · (words / sentences) − 84.6 · (syllables / words)
    *
    * All three inputs are EXACT integers per document:
    *   - words      — [[tokenCount]] (whitespace tokens, ≥ 1 by construction)
    *   - sentences  — terminator count (`.` + `!` + `?` via the codegen'd
    *                  [[occurrences]] expression), floored at 1 so a fragment
    *                  without punctuation still scores
    *   - syllables  — VOWEL-RUN count, the standard deterministic heuristic:
    *                  each maximal `[aeiou]+` run in the lowercased text is one
    *                  syllable nucleus. Counted WITHOUT materializing a rewrite
    *                  of the text: len(collapse runs to 1 char) − len(strip
    *                  runs) = number of runs; both engines evaluate the same
    *                  two regexp_replace calls.
    *
    * The score itself is ONE double expression over those integers with the
    * published constants written as identical literals on both engines (the
    * ev24 foldable-constant convention — do NOT pre-fold or re-associate on one
    * side only), micro-quantized once per row so any downstream per-source
    * aggregate sums order-free. A banded label (easy / standard / difficult /
    * very_difficult at 70/50/30) makes the score directly gateable.
    *
    * Scale shape: a pure per-row map over one (id, text) scan — no shuffle, no
    * window, no join; whole-stage-codegen'd end to end. At 100 TB this is the
    * cheapest gate in the battery and composes into dc16-style release chains
    * as an id-keyed semi-join like every other gate.
    */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val low = lower(t)
    val words = tokenCount(t)
    val sentences = greatest(
      occ(t, ".") + occ(t, "!") + occ(t, "?"), lit(1L))
    val syllables = greatest(
      (length(regexp_replace(low, "[aeiou]+", "a")) -
        length(regexp_replace(low, "[aeiou]+", ""))).cast("long"), lit(1L))
    val flesch = lit(206.835) -
      lit(1.015) * (words.cast("double") / sentences.cast("double")) -
      lit(84.6) * (syllables.cast("double") / words.cast("double"))
    val fMicro = floor(lit(1000000.0) * flesch + lit(0.5)).cast("long")
    Scans.fanOut(df).select(
      col(idCol),
      words.as("n_words"),
      sentences.as("n_sentences"),
      syllables.as("n_syllables"),
      fMicro.as("flesch_micro"),
      when(fMicro >= 70000000L, "easy")
        .when(fMicro >= 50000000L, "standard")
        .when(fMicro >= 30000000L, "difficult")
        .otherwise("very_difficult").as("band"))
  }
}
