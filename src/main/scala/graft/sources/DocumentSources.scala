package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus ingest adapters — the document-side twin of [[EdgeSources]]: build a
  * `documents`-shaped relation (doc_id, text, lang, source, n_chars — the exact
  * schema every t/d/s/m operator consumes) from the interchange formats training
  * corpora actually arrive in (JSON-lines — one object per line — and headered
  * CSV), with the same malformed-row QUARANTINE discipline: a line that fails to
  * parse, or parses without the non-nullable doc_id/text, lands in an audit
  * relation carrying the raw record, never silently nulled into the pipeline. At
  * 100 TB the quarantine IS the data-quality contract: a feed change that breaks
  * 1% of lines must surface as a countable audit stream, not as a 1% quality-score
  * dip three operators downstream.
  *
  * The clean/corrupt split tests PARSED FIELDS, not the corrupt-record column —
  * Spark's text sources evaluate corrupt-column predicates inconsistently across
  * plan shapes (the [[EdgeSources]] finding); the corrupt column is read purely as
  * the audit payload. Optional fields coerce to the corpus conventions: missing
  * `lang` → "und" (BCP-47 undetermined), missing `source` → "unknown"; `n_chars`
  * derives from the text like the parquet generator's.
  */
object DocumentSources {

  private val corruptCol = "_corrupt_record"

  private val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField(corruptCol, StringType, nullable = true)))

  private def split(raw: DataFrame): (DataFrame, DataFrame) = {
    val clean = col("doc_id").isNotNull && col("text").isNotNull
    (
      raw.filter(clean)
        .select(
          col("doc_id"),
          col("text"),
          coalesce(col("lang"), lit("und")).as("lang"),
          coalesce(col("source"), lit("unknown")).as("source"),
          length(col("text")).cast("long").as("n_chars")),
      raw.filter(!clean)
        .select(coalesce(
          col(corruptCol),
          to_json(struct(col("doc_id"), col("text"), col("lang"), col("source"))))
          .as("record"))
    )
  }

  /** JSON-lines corpus → (clean documents, corrupt audit). Shares
    * [[EdgeSources]]' parser caveat: a line truncated mid-object is silently
    * dropped by the Jackson stream reader (neither side sees it) — feeds at risk
    * of non-atomic appends need an upstream line-integrity check.
    */
  def readJsonlDocs(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    split(spark.read
      .schema(docSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path))

  /** Headered CSV corpus dump → (clean documents, corrupt audit). */
  def readCsvDocs(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    split(spark.read
      .schema(docSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path))

  /** Streaming twin of [[readJsonlDocs]]: a file-source JSON-lines corpus feed
    * split into (clean document stream, quarantine stream) — the on-ramp for the
    * streaming curation monitors ([[graft.streaming.StreamOps.streamingDrift]],
    * streamingDedup, the moments registers): route clean documents into the
    * monitors, the audit side to a quarantine sink. Both are streaming DataFrames
    * off ONE source.
    */
  def streamJsonlDocs(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    split(spark.readStream
      .schema(docSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path))

  /** The write-back sink closing the ingest → curate → persist loop: a curated
    * documents relation lands as parquet partitioned by `source` (per-source reads
    * — mixing weights, drift baselines, source caps — prune directories), RANGE
    * partitioned then sorted on (source, doc_id) so every file covers one
    * contiguous id band per source and point lookups / the d16 split's id-band
    * reads prune files and row groups via footer min/max — the
    * [[graft.store.EdgeStorage]] layout discipline applied to the corpus (a HASH
    * salt here would interleave ids across files and make every footer span the
    * whole id range). `numFiles` = total range partitions ≈ output files; at
    * 100 TB pick it so files land at 128–512 MB.
    *
    * Measured (DocumentSourcesSpec "d16 access pattern", sf0.1, 16 KB row groups):
    * a one-source id-band read decodes 100 of 5 000 corpus rows — 20× from
    * directory pruning (250 rows planned) and a further 2.5× from footer min/max
    * row-group skipping (decoded ≤ footer-admitted asserted, per-source file
    * bands asserted pairwise disjoint).
    */
  def saveCorpus(docs: DataFrame, path: String, numFiles: Int = 32): Unit =
    docs
      .repartitionByRange(numFiles, col("source"), col("doc_id"))
      .sortWithinPartitions(col("source"), col("doc_id"))
      .write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("source")
      .parquet(path)
}
