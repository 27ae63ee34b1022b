package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one or more gate
  * queries (`runMain graft.Explain <sfDir> <queryPrefix>...`) — the
  * explain-and-iterate loop for shuffle/pushdown/codegen auditing
  * without wiring a notebook. Summarizes exchange/reuse/window counts
  * per query so plan regressions show up as one greppable line. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val prefixes = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.isEmpty || prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          // with AQE, exchange reuse only materializes in the FINAL
          // adaptive plan — execute first so the counts are honest
          if (sys.env.get("GRAFT_EXPLAIN_EXEC").contains("1")) df.count()
          val plan = df.queryExecution.executedPlan.toString
          def n(re: String) = re.r.findAllIn(plan).length
          println(s"=== $name: exchanges=${n("Exchange")} " +
            s"reused=${n("ReusedExchange")} windows=${n(raw"\bWindow\b")} " +
            s"hashAgg=${n("HashAggregate")} sortAgg=${n("SortAggregate")} " +
            s"bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")} " +
            s"nlj=${n("BroadcastNestedLoopJoin")}")
          if (sys.env.get("GRAFT_EXPLAIN_FULL").contains("1"))
            println(df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
        } catch { case e: Throwable =>
          println(s"=== $name: ERROR ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
