package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args = subset of query names (local iteration); driver passes 2
    val selected =
      if (args.length <= 2) SparkEntry.queries
      else {
        args.drop(2).filterNot(SparkEntry.queries.contains).foreach { n =>
          System.err.println(s"[verify] unknown query name: $n")
        }
        SparkEntry.queries.filter { case (n, _) => args.drop(2).contains(n) }
      }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failed = selected.toSeq.flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        Some(name)
      }
    }
    // loud summary on BOTH streams: a query that errors here vanishes from the
    // driver's correctness JSON entirely (no err row — round 8 lost 12 queries this
    // way to a testdata dtype change and the gate still read all-green)
    val summary =
      if (failed.isEmpty) s"[verify] SUMMARY: ${selected.size} ok, 0 failed"
      else s"[verify] SUMMARY: ${selected.size - failed.size} ok, ${failed.size} FAILED: ${failed.mkString(", ")}"
    println(summary)
    System.err.println(summary)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
