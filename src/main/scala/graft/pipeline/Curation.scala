package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end curation composition — the funnel a real training-data run reports:
  * how many documents survive each cumulative pipeline stage. Individual stages are
  * the oracle-checked operators ([[TextStats.qualityFilter]], [[Dedup.dedupClusters]]);
  * this composes them the way a production pass chains them, proving the operators
  * stack (shared derivations, id-only semi-joins between stages).
  */
object Curation {

  /** Cumulative funnel: total → quality-kept → near-dup cluster keeper. One row per
    * stage with the surviving document count — ALWAYS three rows (an empty stage
    * reports 0, it does not vanish), and each stage runs over the PREVIOUS stage's
    * survivors the way a chained production pass does: clustering sees only the
    * quality-filtered corpus, so a cluster whose would-be keeper was quality-rejected
    * still keeps its best surviving member.
    *
    * Scale shape: stages exchange only document-id sets (left-semi joins — never the
    * text), and each underlying operator keeps its own bucketed/broadcast plan; the
    * rollup is three scalar aggregates unioned.
    */
  def funnel(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val all = df.select(col(idCol))
    val quality = TextStats.qualityFilter(df, idCol, textCol)
      .filter(col("kept") === 1).select(col(idCol))
    // the survivor id set feeds three consumers (its stage count, the filtered-corpus
    // derivation, the final intersection) — materialize the id list once
    val s2 = all.join(quality, Seq(idCol), "left_semi").localCheckpoint(true)
    // materialize the filtered corpus once: dedupClusters' label-propagation rounds
    // re-evaluate their base relation per round, which would otherwise re-run the
    // scan + quality scoring each time
    val qualityDocs = df.join(s2, Seq(idCol), "left_semi").localCheckpoint(true)
    val keepers = Dedup.dedupClusters(qualityDocs, idCol, textCol)
      .filter(col("cluster_id") === col(idCol)).select(col(idCol))
    val s3 = s2.join(keepers, Seq(idCol), "left_semi")
    def stage(name: String, ids: DataFrame): DataFrame =
      ids.agg(count(lit(1)).as("n_docs")).select(lit(name).as("stage"), col("n_docs"))
    stage("00_total", all)
      .unionByName(stage("01_quality", s2))
      .unionByName(stage("02_dedup_keeper", s3))
  }
}
