package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract invariants of the per-family oracle split: SparkEntry
  * concatenates eight family objects with `++`, which silently LAST-WINS on a key
  * collision — so collisions must be impossible, and every query must keep its
  * DuckDB mirror (the correctness gate runs exactly the paired keys). Pure map
  * checks — no Spark session.
  */
class VerifyContractSpec extends AnyFunSuite {

  private val families = Seq(
    "Graph" -> (GraphOracles.queries, GraphOracles.oracleSql),
    "Analytics" -> (AnalyticsOracles.queries, AnalyticsOracles.oracleSql),
    "Dedup" -> (DedupOracles.queries, DedupOracles.oracleSql),
    "Text" -> (TextOracles.queries, TextOracles.oracleSql),
    "Layout" -> (LayoutOracles.queries, LayoutOracles.oracleSql),
    "Similarity" -> (SimilarityOracles.queries, SimilarityOracles.oracleSql),
    "Multimodal" -> (MultimodalOracles.queries, MultimodalOracles.oracleSql),
    "Sketch" -> (SketchOracles.queries, SketchOracles.oracleSql))

  test("family concatenation loses no keys (no cross-family collisions)") {
    assert(families.map(_._2._1.size).sum == SparkEntry.queries.size,
      "a queries key appears in two family objects — ++ silently dropped one")
    assert(families.map(_._2._2.size).sum == SparkEntry.oracleSql.size,
      "an oracleSql key appears in two family objects — ++ silently dropped one")
  }

  test("every query is oracle-paired, within its own family") {
    for ((name, (q, o)) <- families)
      assert(q.keySet == o.keySet,
        s"$name: unpaired keys ${(q.keySet diff o.keySet) ++ (o.keySet diff q.keySet)}")
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }

  test("every key's prefix routes to the family that holds it") {
    def fam(n: String): String =
      if (n.startsWith("sk")) "Sketch"
      else if (n.startsWith("d")) "Dedup" // d* and dc*
      else if (n.startsWith("ev") || n.startsWith("q")) "Analytics"
      else if (n.startsWith("g")) "Graph"
      else if (n.startsWith("t")) "Text"
      else if (n.startsWith("s")) "Similarity"
      else if (n.startsWith("o")) "Layout"
      else if (n.startsWith("m")) "Multimodal"
      else fail(s"unroutable key $n")
    for ((name, (q, _)) <- families; k <- q.keys)
      assert(fam(k) == name, s"$k registered under $name, prefix says ${fam(k)}")
  }
}
