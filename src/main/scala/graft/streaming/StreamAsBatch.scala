package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Run the Structured Streaming windowed aggregation over a bounded
  * parquet input to completion and return the materialized result —
  * lets the streaming operator sit in the same batch-verified driver
  * contract as everything else (complete output mode == the batch
  * aggregation result on bounded data). */
object StreamAsBatch {

  def windowedEventCounts(spark: SparkSession, eventsParquet: String,
      windowDur: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("stream-as-batch")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(eventsParquet), tmp.resolve("events.parquet"))
    val name = "graft_stream_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val agg = EventStream.readEvents(spark, tmp.toString)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
