package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev tool: run one SparkEntry query with a listener that counts Spark jobs,
  * stages, tasks and summed task time, so per-query wall-clock can be split
  * into scheduled work vs driver/planning overhead.
  * Usage: runMain graft.Profile <queryName> [sfDir] [cpus]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val stageMs = new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, AtomicInteger]()
    val jobSites = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val site = j.stageInfos.flatMap(_.details.linesIterator
            .filter(l => l.contains("at graft.") && !l.contains("Profile")))
          .headOption.map(_.trim.take(110)).getOrElse("?")
        jobSites.computeIfAbsent(site, _ => new AtomicInteger(0)).incrementAndGet()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        stageNames.put(s.stageInfo.stageId,
          s.stageInfo.name.take(80) + " | " + s.stageInfo.details.linesIterator
            .filter(l => l.contains("graft") && !l.contains("Profile"))
            .take(2).mkString(" <- ").take(160))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) {
          taskMs.addAndGet(t.taskInfo.duration)
          stageMs.computeIfAbsent(t.stageId, _ => new AtomicLong(0L)).addAndGet(t.taskInfo.duration)
          stageTasks.computeIfAbsent(t.stageId, _ => new AtomicInteger(0)).incrementAndGet()
        }
      }
    })
    // warmup like Bench does, so JIT/codegen bring-up is not charged to the query
    spark.read.parquet(s"$sfDir/events.parquet").groupBy("user_id").count().count()
    Seq("g12_execute_lww", "d03_simhash", "q05_region_revenue", "s02_ann_lsh").foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    }
    Thread.sleep(500)
    jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L)
    stageNames.clear(); stageMs.clear(); stageTasks.clear(); jobSites.clear()
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[profile] $name wall=$wall%.3fs jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} taskTime=${taskMs.get / 1e3}%.1fs avgTaskMs=${if (tasks.get > 0) taskMs.get / tasks.get else 0}")
    import scala.jdk.CollectionConverters._
    stageMs.asScala.toSeq.sortBy(-_._2.get).take(20).foreach { case (sid, ms) =>
      val n = Option(stageTasks.get(sid)).map(_.get).getOrElse(0)
      println(f"[stage] ${ms.get / 1e3}%7.2fs  $n%4d tasks  ${stageNames.getOrDefault(sid, "?")}")
    }
    jobSites.asScala.toSeq.sortBy(-_._2.get).take(20).foreach { case (site, n) =>
      println(f"[jobs ] ${n.get}%4d  $site")
    }
    spark.stop()
  }
}
