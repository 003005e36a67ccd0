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
    * stage with the surviving document count.
    *
    * Scale shape: stages exchange only document-id sets (left-semi joins — never the
    * text), and each underlying operator keeps its own bucketed/broadcast plan; the
    * final rollup is a 3-row aggregate.
    */
  def funnel(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val all = df.select(col(idCol))
    val quality = TextStats.qualityFilter(df, idCol, textCol)
      .filter(col("kept") === 1).select(col(idCol))
    val keepers = Dedup.dedupClusters(df, idCol, textCol)
      .filter(col("cluster_id") === col(idCol)).select(col(idCol))
    val s2 = all.join(quality, Seq(idCol), "left_semi")
    val s3 = s2.join(keepers, Seq(idCol), "left_semi")
    all.select(lit("00_total").as("stage"), col(idCol))
      .unionByName(s2.select(lit("01_quality").as("stage"), col(idCol)))
      .unionByName(s3.select(lit("02_dedup_keeper").as("stage"), col(idCol)))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"))
  }
}
