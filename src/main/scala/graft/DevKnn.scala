package graft

import org.apache.spark.sql.functions._

/** Dev scratch: decompose knnGraph's scoredLshPairs cost at sf0.1. */
object DevKnn {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.builder(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.Similarity
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    e.count()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3fs")
      r
    }
    // replicate scoredLshPairs internals
    val vecs = e.select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nv", Similarity.norm2(col("v")))
      .localCheckpoint(true)
    val tables = (0 until 2).map { t =>
      struct(lit(t).as("tbl"),
        Similarity.lshBucket(col("v"), 6, 64, planeOffset = t * 6).as("bucket"))
    }
    val buckets = vecs.select(col("id"), explode(array(tables: _*)).as("tb"))
      .select(col("id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      .localCheckpoint(true)
    time("bucket census") {
      buckets.groupBy("tbl", "bucket").count().orderBy(desc("count")).show(8, false)
    }
    val smallCells = buckets.groupBy(col("tbl"), col("bucket"))
      .agg(count(lit(1)).as("cell_n"))
      .filter(col("cell_n") <= 10000L)
      .select(col("tbl"), col("bucket"))
    val admitted = buckets.join(smallCells, Seq("tbl", "bucket"))
    val cand = admitted.select(col("tbl"), col("bucket"), col("id").as("id_a"))
      .join(admitted.select(col("tbl"), col("bucket"), col("id").as("id_b")), Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val candD = time("cand distinct count") {
      val d = cand.distinct().localCheckpoint(true)
      println("pairs: " + d.count())
      d
    }
    time("score pairs") {
      candD
        .join(vecs.select(col("id").as("id_a"), col("v").as("va"), col("nv").as("na")), Seq("id_a"))
        .join(vecs.select(col("id").as("id_b"), col("v").as("vb"), col("nv").as("nb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          round(Similarity.dot(col("va"), col("vb")) / sqrt(col("na") * col("nb")), 6).as("cos_sim"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
