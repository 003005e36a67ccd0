package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{KthSmallest, LwwWinner, PolyFingerprint}

import graft.pipeline.Dedup

/** The SQL function surface injected by [[GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions`, set in SparkSpec's builder): every
  * registered function must be callable from `spark.sql` and agree exactly with its
  * `Column`-API twin — same expression class underneath, so a divergence here means the
  * registration is wiring arguments in the wrong order.
  */
class ExtensionsSpec extends SparkSpec {

  test("graft_dot is callable from SQL") {
    val r = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(r == 11.0)
  }

  test("graft_count_occurrences counts non-overlapping occurrences from SQL") {
    val r = spark.sql("SELECT graft_count_occurrences('abcabcabc', 'bc') AS c")
      .head().getLong(0)
    assert(r == 3L)
  }

  test("graft_fingerprint agrees with the Column API") {
    import spark.implicits._
    val df = Seq("the quick brown fox", "", "päivää").toDF("text")
    df.createOrReplaceTempView("fp_docs")
    val viaSql = spark.sql("SELECT graft_fingerprint(text) AS f FROM fp_docs")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = df.select(PolyFingerprint.column(col("text")).as("f"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol)
  }

  test("graft_shingles is a generator usable in LATERAL VIEW") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "x y")).toDF("id", "text")
    df.createOrReplaceTempView("sh_docs")
    val viaSql = spark.sql(
      "SELECT id, s.shingle FROM sh_docs LATERAL VIEW graft_shingles(text, 2) s AS shingle")
      .as[(Long, String)].collect().toSet
    val viaCol = Dedup.shingles(df, "id", "text", 2)
      .as[(Long, String)].collect().toSet
    assert(viaSql == viaCol)
    assert(viaSql == Set((1L, "a b"), (1L, "b c"), (1L, "c d"), (2L, "x y")))
  }

  test("graft_positioned_shingles keeps duplicates and positions from SQL") {
    import spark.implicits._
    val df = Seq((1L, "a b a b"), (2L, "x")).toDF("id", "text")
    df.createOrReplaceTempView("psh_docs")
    val viaSql = spark.sql(
      "SELECT id, s.pos, s.shingle FROM psh_docs " +
        "LATERAL VIEW graft_positioned_shingles(text, 2) s AS pos, shingle")
      .as[(Long, Long, String)].collect().toSet
    val viaCol = df.select(col("id"),
        org.apache.spark.sql.graft.PositionedWordShingles.column(col("text"), 2))
      .as[(Long, Long, String)].collect().toSet
    assert(viaSql == viaCol)
    assert(viaSql == Set((1L, 1L, "a b"), (1L, 2L, "b a"), (1L, 3L, "a b")))
  }

  test("graft_lww_winner aggregates from SQL like the Column API") {
    val log = opsDF(
      (alice, bob, 0, 100, Some(5L)),
      (alice, bob, 2, 200, Some(5L)), // newer archive wins
      (alice, carl, 0, 300, Some(7L))
    )
    log.createOrReplaceTempView("lww_log")
    val viaSql = spark.sql(
      """SELECT source_id, destination_id,
        |       graft_lww_winner(position, updated_at, 1, state) AS w
        |FROM lww_log GROUP BY source_id, destination_id""".stripMargin)
      .select(col("source_id"), col("destination_id"), col("w.state"), col("w.updated_at"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    assert(viaSql == Set((alice, bob, 2, 200), (alice, carl, 0, 300)))
  }

  test("graft_kth_smallest aggregates from SQL like the Column API") {
    import spark.implicits._
    val df = Seq((1L, 10L), (5L, 50L), (3L, 30L), (2L, 20L)).toDF("major", "minor")
    df.createOrReplaceTempView("ks_rows")
    val viaSql = spark.sql(
      "SELECT graft_kth_smallest(major, minor, 2) AS k FROM ks_rows")
      .select(col("k.major"), col("k.minor")).head()
    assert(viaSql == Row(2L, 20L))
    val viaCol = df.agg(KthSmallest.column(col("major"), col("minor"), 2).as("k"))
      .select(col("k.major"), col("k.minor")).head()
    assert(viaSql == viaCol)
  }

  test("wrong arity is rejected at analysis") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1.0d))").collect()
    }
    assert(e.getMessage.contains("graft_dot"))
  }
}
