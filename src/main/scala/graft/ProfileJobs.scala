package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Dev tool: per-gate JOB accounting (`runMain graft.ProfileJobs
  * <queryPrefix>...`) — same session shape as [[ProfileTail]] but
  * prints every job's call site and description for the LAST (warm)
  * run, so "this gate pays N jobs" decomposes into WHICH actions and
  * scaffolding fire. Dev-only: drives the serialized-stage collapse
  * work on the >2× tail. */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "128m")
      // suite-sized codegen class cache (see Bench.scala): without it a
      // 275-query pass recompiles evicted generated classes continually
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    graft.streaming.WarmRuns.enabled = false
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val recording = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (recording.get()) {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          val site = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")
          log.add(f"job ${j.jobId}%4d  stages=${j.stageInfos.size}%2d  " +
            f"tasks=${j.stageInfos.map(_.numTasks).sum}%3d  $site  $desc")
        }
    })
    def sweep(): Unit = {
      graft.etl.Checkpoints.sweep(spark)
      graft.etl.Scratch.sweep()
    }
    val all = SparkEntry.queries.keys.toSeq.sorted
    val names = if (args.isEmpty) all
      else all.filter(n => args.exists(n.startsWith))
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).count() // warm-up
      sweep()
      log.clear()
      recording.set(true)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      recording.set(false)
      // listener bus is async: give it a beat to drain before printing
      Thread.sleep(300)
      println(f"[jobs] $name  warm=$sec%.3f s  jobs=${log.size}")
      log.forEach(l => println(s"[jobs]   $l"))
      sweep()
    }
    spark.stop()
  }
}
