package graft.tools

import graft.{Graft, SparkEntry}

/** Structural profile of one registered query's STEADY execution: job
  * count, stage count, task count, and per-job wall ms, via a
  * SparkListener over a warmed second run. Answers "is this serve
  * data-bound or job-launch-bound?" without the UI.
  *
  * Run: sbt "runMain graft.tools.JobProfile x8_mv_join_stale"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Graft.defaultCores.toString)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      math.min(8, cpus.toInt).toString)
    val spark = Graft.builder(s"local[$cpus]", shuffle.toInt)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.filterNot(_.startsWith("--")).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      fn(spark, sfDir).count() // warm: fixtures land, code compiles
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
      val stages = new java.util.concurrent.atomic.AtomicInteger(0)
      val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.put(e.jobId, (e.time, -1L))
          stages.addAndGet(e.stageInfos.size)
          tasks.addAndGet(e.stageInfos.map(_.numTasks).sum)
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobs.computeIfPresent(e.jobId, (_, v) => (v._1, e.time))
      }
      spark.sparkContext.addSparkListener(listener)
      for (aqe <- Seq("true", "false")) {
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        jobs.clear(); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the listener bus drain
        import scala.jdk.CollectionConverters._
        val durs = jobs.values().asScala.toSeq
          .filter(_._2 > 0).map(v => v._2 - v._1).sorted.reverse
        println(f"$name%-24s aqe=$aqe%-5s wall=$wall%.2fs jobs=${jobs.size}" +
          f" stages=${stages.get} tasks=${tasks.get}" +
          f" jobMsTop=${durs.take(8).mkString(",")} jobMsSum=${durs.sum}")
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sparkContext.removeSparkListener(listener)
    }
    spark.stop()
  }
}
