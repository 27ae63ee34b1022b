package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection harness: prints the formatted physical plan and a
  * timed execution for the named queries (all queries if none named).
  *
  *   sbt "runMain graft.Explain /root/testdata/sf0.01 q14_ngram_jaccard"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // args beyond the SF dir are name PREFIXES (same contract as
    // Verify/Bench), so `Explain <dir> q112` just works
    val names = if (args.length > 1)
      SparkEntry.queries.keys.toSeq.sorted
        .filter(n => args.drop(1).exists(n.startsWith))
    else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
