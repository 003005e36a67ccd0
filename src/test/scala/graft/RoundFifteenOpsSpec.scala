package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Round-15 operator pins. The s31 census-routing pair proves the r14 ADVICE
  * fix: a supplied index census replaces the corpus `count()` in the routing
  * decision (equality pin — same rows, same selectivity, same route as the
  * count path), and the routed call performs NO action on the corpus relation
  * at all when both sizes are supplied (poison pin — a corpus whose every
  * executed row throws still builds the routed plan).
  */
class RoundFifteenOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("s31: census-fed routing equals the count()-fed routing row for row") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") % 50 === 0)
    val allowed = e.filter(col("label") % 10 === 0).select(col("vec_id"))
    val cen = Similarity.ivfCellCensus(e, "vec_id", "embedding",
      kCells = 8, dims = 64, trainRounds = 1)
    // the census totals the corpus exactly (every vector is assigned once),
    // so the routing scalar — and therefore the route and every output row —
    // must be identical to the count() fallback's
    def rows(censusOpt: Option[org.apache.spark.sql.DataFrame],
             sizeOpt: Option[Long]) =
      Similarity.filteredTopKAdaptive(q, e, "vec_id", "embedding", k = 5,
        allowed = allowed, selThresholdMicro = 250000L, kCells = 8,
        trainRounds = 1, census = censusOpt, allowedSize = sizeOpt)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
          r.getAs[Int]("rank"), r.getAs[String]("route"),
          r.getAs[Long]("selectivity_micro")))
        .toSet
    val viaCount = rows(None, None)
    val viaCensus = rows(Some(cen), Some(allowed.count()))
    assert(viaCount.nonEmpty && viaCensus == viaCount,
      s"census route diverged: ${viaCensus.diff(viaCount)} vs ${viaCount.diff(viaCensus)}")
  }

  test("s31: with census + allowedSize supplied, routing touches the corpus ZERO times") {
    val boom = udf((x: Long) => {
      throw new RuntimeException("eager action on corpus relation"); x
    })
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val poisoned = e.withColumn("vec_id", boom(col("vec_id")))
    val cen = Seq(500L, 300L, 200L).toDF("n_members") // Σ = 1000-vector census
    // selectivity 10/1000 = 1% → exact route; the call must RETURN (plan
    // construction only — the census aggregate is the only action)
    val out = Similarity.filteredTopKAdaptive(
      poisoned.filter(col("label") % 50 === 0), poisoned, "vec_id", "embedding",
      k = 5, allowed = poisoned.select(col("vec_id")),
      selThresholdMicro = 250000L, kCells = 8, trainRounds = 1,
      census = Some(cen), allowedSize = Some(10L))
    assert(out.columns.contains("route"))
    // guard against a vacuous poison: executing the routed plan DOES throw
    val err = intercept[Exception] { out.collect() }
    def rootHas(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("eager action")) ||
        rootHas(t.getCause))
    assert(rootHas(err), s"poison did not propagate: $err")
  }

  test("s31: a census without n_members fails loudly") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val bad = Seq(1L).toDF("n_rows")
    val err = intercept[IllegalArgumentException] {
      Similarity.filteredTopKAdaptive(
        e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding", k = 5,
        allowed = e.select(col("vec_id")), census = Some(bad))
    }
    assert(err.getMessage.contains("n_members"))
  }
}
