package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.EventWindows
import graft.streaming.EventStream

/** Streaming ≡ batch: replay the driver's events parquet through
  * Structured Streaming and compare against the batch plans. */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  // FileStreamSource needs a directory containing only the events table
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("streaming windowed agg matches the batch tumbling aggregation") {
    val stream = EventStream.readEvents(spark, dir)
    val got = EventStream.runToMemory(
      EventStream.windowedAgg(stream, "1 hour", "30 minutes"),
      "stream_windows", OutputMode.Append())
      .select("window_start", "event_type", "n", "sum_value")
    val want = EventWindows.tumbling(
      graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "events"), "ts", "1 hour",
      Seq("event_type"),
      Seq(count(lit(1)).as("n"), sum(col("value")).as("sum_value")))
      .select("window_start", "event_type", "n", "sum_value")
    // one replay of a bounded input: watermark never closes the final
    // windows in append mode, so compare on the windows that did emit
    assert(got.count() > 0)
    assert(got.except(want).isEmpty, "streaming emitted a window batch disagrees with")
  }

  test("stateful sessionize emits per-user session aggregates") {
    val events = EventStream.readEvents(spark, dir)
      .select($"event_id", $"user_id", $"ts", $"value")
      .as[EventStream.Event]
    // run the stateful operator in a single streaming batch
    val out = EventStream.runToMemory(
      EventStream.sessionize(events, 1800).toDF(),
      "stream_sessions", OutputMode.Update())
    // one row per user (last update wins per trigger); session ids match
    // the batch sessionizer's max session id per user
    val batch = EventWindows.sessionize(
      graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "events"), "user_id", "ts",
      1800, "event_id")
      .groupBy("user_id").agg(max("session_id").as("max_sid"))
    val got = out.groupBy("user_id").agg(max("session_id").as("max_sid"))
    assert(got.except(batch).isEmpty && batch.except(got).isEmpty)
  }
}
