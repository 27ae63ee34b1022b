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

  test("dedupStream drops re-delivered events within the watermark") {
    // replay the events table UNIONed with itself (simulated
    // at-least-once redelivery): every event_id arrives twice; the
    // stream must emit each exactly once
    val d = java.nio.file.Files.createTempDirectory("events-dup")
    val src = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "events")
      .limit(500)
    src.union(src).write.mode("overwrite")
      .parquet(d.resolve("in").toString)
    val stream = spark.readStream
      .schema(src.schema).parquet(d.resolve("in").toString)
    val got = EventStream.runToMemory(
      EventStream.dedupStream(stream, Seq("event_id"), "30 minutes"),
      "stream_dedup", OutputMode.Append())
    assert(got.count() == 500)
    assert(got.groupBy("event_id").count().where($"count" > 1).isEmpty)
  }

  test("stream-stream joinWithin matches the batch time-bounded join") {
    val views = EventStream.readEvents(spark, dir)
      .where($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("view_ts"))
    val buys = EventStream.readEvents(spark, dir)
      .where($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("buy_id"), $"ts".as("buy_ts"))
    val got = EventStream.runToMemory(
      EventStream.joinWithin(views, buys, Seq("user_id"),
        "view_ts", "buy_ts", "30 minutes"),
      "stream_join", OutputMode.Append())
      .select("view_id", "buy_id")
    val ev = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "events")
    val bviews = ev.where($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("view_ts"))
    val bbuys = ev.where($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("buy_id"), $"ts".as("buy_ts"))
    val want = bviews.join(bbuys,
        bviews("user_id") === bbuys("user_id")
          && $"buy_ts" >= $"view_ts"
          && $"buy_ts" <= $"view_ts" + expr("INTERVAL 30 MINUTES"))
      .select("view_id", "buy_id")
    assert(got.count() > 0)
    // inner join results within the watermark horizon must agree; on a
    // single bounded replay every pair is within horizon, so exact match
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("event-time sessionizeClosed emits sessions once the watermark passes") {
    import graft.streaming.EventStream.{ClosedSession, Event}
    val inDir = java.nio.file.Files.createTempDirectory("sess-closed")
    def land(name: String, rows: Seq[(Long, Long, String, Double)]): Unit =
      rows.toDF("event_id", "user_id", "ts_s", "value")
        .select($"event_id", $"user_id",
          to_timestamp($"ts_s").as("ts"), $"value")
        .coalesce(1).write.parquet(s"$inDir/$name")
    // batch 1: user 1 has a session at 10:00-10:05
    land("b1", Seq(
      (1L, 1L, "2024-01-01 10:00:00", 1.0),
      (2L, 1L, "2024-01-01 10:05:00", 2.0)))
    val stream = spark.readStream
      .schema("event_id long, user_id long, ts timestamp, value double")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$inDir/*")
      .withWatermark("ts", "1 second")
      .as[Event]
    val q = graft.streaming.EventStream.sessionizeClosed(stream, gapSeconds = 1800)
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("closed_sessions").start()
    try {
      q.processAllAvailable()
      // batch 2: an event far past the gap advances the watermark and
      // must close user 1's first session exactly once
      land("b2", Seq((3L, 1L, "2024-01-01 13:00:00", 5.0)))
      q.processAllAvailable()
      land("b3", Seq((4L, 2L, "2024-01-01 14:00:00", 7.0)))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("closed_sessions").as[ClosedSession].collect()
    val first = out.filter(s => s.user_id == 1L &&
      s.session_start == java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(first.length == 1, s"expected one closed first session, got ${out.toSeq}")
    assert(first.head.n_events == 2 && first.head.sum_value == 3.0)
    assert(first.head.session_end == java.sql.Timestamp.valueOf("2024-01-01 10:05:00"))
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
