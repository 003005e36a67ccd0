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

  /** # occurrences of `needle` in `text` (length-difference trick — codegen-friendly). */
  def occurrences(text: Column, needle: String): Column =
    (length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(needle), ""))) / needle.length

  private def occ(text: Column, needle: String): Column =
    ((length(text) - length(replaceLit(text, needle))) / needle.length).cast("long")

  private def replaceLit(text: Column, needle: String): Column =
    regexp_replace(text, java.util.regex.Pattern.quote(needle), "")

  /** Whitespace token count: #spaces + 1. */
  def tokenCount(text: Column): Column =
    (length(text) - length(replaceLit(text, " ")) + 1).cast("long")

  /** Token inventory: (id, token) pairs — the shared explode for shingle-based ops. */
  def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), posexplode(split(col(textCol), " ", -1)).as(Seq("pos", "token")))

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
    val stopHits = occ(t, " the ") + occ(t, " a ") + occ(t, " of ") + occ(t, " and ")
    df.select(
      col(idCol),
      nTokens.as("n_tokens"),
      stopHits.as("stop_hits"),
      round(
        stopHits.cast("double") / nTokens.cast("double") +
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
    val scores = Seq(
      "en" -> (occ(t, " the ") + occ(t, " and ") + occ(t, " of ")),
      "de" -> (occ(t, " der ") + occ(t, " und ") + occ(t, " das ")),
      "es" -> (occ(t, " el ") + occ(t, " los ") + occ(t, " que ")),
      "fr" -> (occ(t, " le ") + occ(t, " les ") + occ(t, " et ")),
      "zh" -> (occ(t, " de ") + occ(t, " shi ") + occ(t, " bu "))
    )
    // argmax with fixed priority order (earlier wins ties)
    val best = scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lang).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }
    val base = df.select(
      col(idCol) +: (best._1.as("predicted_lang") +: truthCol.map(c => col(c)).toSeq): _*
    )
    truthCol match {
      case Some(c) => base.withColumn("correct", (col("predicted_lang") === col(c)).cast("int"))
      case None    => base
    }
  }

  /** Document fingerprint: exact-integer polynomial hash over character codepoints,
    * `sum(codepoint(i) · 31^(i mod 8)) mod 1e9+7`. Order-independent integer sum ⇒
    * bit-identical across engines; bounded: 600 chars × 255 × 31^7 ≈ 4·10^15 < 2^63.
    * Empty docs are pinned to fingerprint 0: `sequence(1, 0)` in Spark is the DESCENDING
    * array [1, 0] (not empty), so without the guard an empty doc would hash garbage.
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      when(length(col(textCol)) > 0,
        expr(
          s"""CAST(aggregate(
             |  sequence(1, length($textCol)),
             |  CAST(0 AS BIGINT),
             |  (acc, i) -> acc + CAST(ascii(substring($textCol, i, 1)) AS BIGINT) *
             |    element_at(array(CAST(1 AS BIGINT), 31, 961, 29791, 923521, 28629151, 887503681, 27512614111),
             |               ((i - 1) % 8) + 1)
             |) % 1000000007 AS BIGINT)""".stripMargin
        )
      ).otherwise(lit(0L)).as("fingerprint")
    )
}
