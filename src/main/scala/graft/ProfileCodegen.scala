package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: quantify how much Janino compilation the TIMED bench pass
  * pays because the codegen class cache (default 100 entries) is cycled
  * by a 275-query warm-up pass. Runs the same warm-up + timed protocol
  * as [[Bench]] over the selected queries and prints the codegen
  * compile-metric deltas (count / approx total ms) per pass, plus each
  * pass's wall time. `SPARK_GRAFT_CODEGEN_CACHE` sets the cache size
  * (default: Spark's 100) so the with/without comparison runs the same
  * binary. */
object ProfileCodegen {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val cache = sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "100")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "128m")
      .config("spark.sql.codegen.cache.maxEntries", cache)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    graft.streaming.WarmRuns.enabled = false
    val m = org.apache.spark.metrics.source.CodegenMetrics
    def compiled: (Long, Double) = {
      val h = m.METRIC_COMPILATION_TIME
      (h.getCount, h.getCount * h.getSnapshot.getMean) // ~total ms
    }
    def sweep(): Unit = {
      graft.etl.Checkpoints.sweep(spark); graft.etl.Scratch.sweep()
    }
    val all = SparkEntry.queries.keys.toSeq.sorted
    val names = if (args.isEmpty) all
      else all.filter(n => args.exists(n.startsWith))
    def pass(label: String): Unit = {
      val (c0, t0) = compiled
      val w0 = System.nanoTime()
      names.foreach { n =>
        try SparkEntry.queries(n)(spark, sfDir).count()
        catch { case _: Throwable => () }
        sweep()
      }
      val wall = (System.nanoTime() - w0) / 1e9
      val (c1, t1) = compiled
      println(f"[codegen] $label cache=$cache n=${names.length} " +
        f"wall=$wall%.1f s  compiles=${c1 - c0}  compileMs~${t1 - t0}%.0f")
    }
    pass("warmup")
    pass("timed ")
    spark.stop()
  }
}
