package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 (graph engine) or one
  * training-data-pipeline operator, and every entry in [[oracleSql]] is the equivalent
  * DuckDB SQL over the same parquet tables. Column names and types are aligned pairwise
  * (the driver's compare sorts columns by name and hashes values).
  */
object SparkEntry extends OracleFragments {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    GraphQueries.adjacencyTopK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ pipeline extensions),
    * concatenated from the per-family oracle objects; VerifyContractSpec pins that
    * the concatenation loses no keys and every query stays oracle-paired.
    */
  def queries: Map[String, Q] = GraphOracles.queries ++
    AnalyticsOracles.queries ++
    DedupOracles.queries ++
    TextOracles.queries ++
    LayoutOracles.queries ++
    SimilarityOracles.queries ++
    MultimodalOracles.queries ++
    SketchOracles.queries

  /** The DuckDB mirrors — same per-family objects, aligned pairwise. */
  def oracleSql: Map[String, String] = GraphOracles.oracleSql ++
    AnalyticsOracles.oracleSql ++
    DedupOracles.oracleSql ++
    TextOracles.oracleSql ++
    LayoutOracles.oracleSql ++
    SimilarityOracles.oracleSql ++
    MultimodalOracles.oracleSql ++
    SketchOracles.oracleSql
}
