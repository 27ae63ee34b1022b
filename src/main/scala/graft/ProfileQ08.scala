package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (r16 brief item 6): q08's ~0.9 s is 4 serialized AQE
  * stage materializations for agg → join-back → sort. A/B the
  * candidate one-stage cuts — AQE off for this shape, coalescing
  * parallelismFirst, and skipping the final-sort re-optimization —
  * against the baseline, warm medians of 5. */
object ProfileQ08 {
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
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    val targets = if (args.nonEmpty) args.toSeq else Seq("q08_agg_join_back")
    def bench(q: String, label: String, confs: (String, String)*): Unit = {
      val s = spark.newSession()
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      GraftExtensions.register(s)
      val runs = (1 to 6).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(s, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.drop(1)
      println(f"[q08] $q%-24s $label%-28s med=${runs.sorted.apply(runs.size / 2)}%6.3f  runs=${runs.map(r => f"$r%.3f").mkString("/")}")
    }
    targets.foreach { q =>
      val name = SparkEntry.queries.keys.toSeq.sorted.find(_.startsWith(q)).getOrElse(q)
      bench(name, "A base (AQE on)")
      bench(name, "B AQE off", "spark.sql.adaptive.enabled" -> "false")
      bench(name, "E rangeSample 20",
        "spark.sql.execution.rangeExchange.sampleSizePerPartition" -> "20")
    }
    spark.stop()
  }
}
