package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen/parquet-footer/AQE init, so the first timed query
    // isn't charged for session bring-up. One representative query per operator family
    // (write pipeline incl. LwwWinner + checkpoints, md5/shingle pipeline, star join)
    // — measured: the first query through each family otherwise absorbs ~3 s of JIT
    // that has nothing to do with the plan being graded.
    spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy("user_id").count().count()
    Seq("g12_execute_lww", "d03_simhash", "q05_region_revenue", "s02_ann_lsh").foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] warmup $n failed: ${e.getMessage}") }
      }
    }
    // optional args = subset of query names (local iteration); no args = full suite
    args.filterNot(SparkEntry.queries.contains).foreach { n =>
      System.err.println(s"[bench] unknown query name: $n")
    }
    val selected =
      if (args.isEmpty) SparkEntry.queries.toSeq
      else args.toSeq.flatMap(n => SparkEntry.queries.get(n).map(n -> _))
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink materializes EVERY column — under .count() Catalyst prunes unused
      // columns and map-only queries would be timed as little more than a scan
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      // drop checkpoint/cache blocks between queries: every query builds its own
      // stores, and eager localCheckpoints would otherwise accumulate in storage
      // memory across the 50+ query run
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      // (measured: a System.gc() here tightens the per-query max by moving major
      // collections out of timed regions, but raises the TOTAL ~10% — rejected)
      (name, sec, ok)
    }
    // keep the emitted line SHORT: the driver retains only the tail of stdout, and a
    // long line gets head-truncated into unparseable JSON. Millisecond precision and a
    // failed-list (instead of a per-query status map that is all "ok" in the common
    // case) keep the full line within the captured window.
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    // total counts SUCCESSFUL queries only — a query that dies in 10 ms must read as a
    // failure, not as a speedup
    val total = results.collect { case (_, v, true) => v }.sum
    println(
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
