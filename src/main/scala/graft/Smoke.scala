package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke: replicates the driver's t1 check — `SparkEntry.entry` must return rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows = $n (must be > 0): ${if (n > 0) "OK" else "FAIL"}")
    spark.stop()
  }
}
