package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: formatted plans of the trade-edge derivation with the
  * orderkey-BUCKETED fact layout vs the raw-projection fallback
  * (`runMain graft.ExplainTrade <sfDir>`), each under default planner
  * thresholds AND with broadcast disabled (the big-big posture the
  * 100× decade takes) — the r16 item-1 plan receipts. */
object ExplainTrade {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    for (bucketed <- Seq(false, true); bigBig <- Seq(false, true)) {
      val s = spark.newSession()
      s.conf.set("spark.graft.graph.bucketedFacts", bucketed.toString)
      if (bigBig) {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      }
      val df = graft.ops.Graph.tradeEdges(s, dir)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      val orderkeyEx = "hashpartitioning\\((l|o)_orderkey".r
        .findAllIn(plan).length
      println(s"=== tradeEdges bucketed=$bucketed bigBig=$bigBig " +
        s"orderkeyExchanges=$orderkeyEx")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
