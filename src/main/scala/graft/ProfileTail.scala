package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev tool: per-gate stage accounting for the >2× tail sweep
  * (`runMain graft.ProfileTail <queryPrefix>...`). Replicates the
  * Bench session exactly (local[cpus], AQE, cold streaming), then for
  * each matching gate: one untimed warm-up, three timed runs, and the
  * Spark job/stage counts of the LAST run — the "how many serialized
  * tiny stages is this 1-second query paying for" number the round-14
  * verdict asks to collapse. */
object ProfileTail {
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
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
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
      try {
        SparkEntry.queries(name)(spark, sfDir).count() // warm-up
        sweep()
        val times = (1 to 3).map { i =>
          val (j0, s0, t0c) = (jobs.get(), stages.get(), tasks.get())
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          val counts = (jobs.get() - j0, stages.get() - s0, tasks.get() - t0c)
          sweep()
          (sec, counts)
        }
        val med = times.map(_._1).sorted.apply(1)
        val (j, st, tk) = times.last._2
        println(f"[tail] $name%-28s med=$med%6.3f s  runs=${times.map(t => f"${t._1}%.3f").mkString("/")}  jobs=$j stages=$st tasks=$tk")
      } catch { case e: Throwable =>
        println(s"[tail] $name ERROR ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
