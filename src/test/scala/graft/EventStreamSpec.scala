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

  test("restart from checkpoint resumes exactly-once over newly arrived files") {
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("ckpt-restart")
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    val ev = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "value")
    def runOnce(): Unit = {
      val q = spark.readStream.schema(ev.schema).parquet(in)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    // batch 1 lands, first run processes it
    ev.where($"event_id" < 200).write.mode("overwrite").parquet(in)
    runOnce()
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst == 200, s"first run wrote $afterFirst")
    // new files arrive; a RESTARTED query (same checkpoint) must pick
    // up only the new ones — no reprocessing, no loss
    ev.where($"event_id" >= 200 && $"event_id" < 350)
      .write.mode("append").parquet(in)
    runOnce()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 350, s"after restart: ${rows.count()}")
    assert(rows.groupBy("event_id").count().where($"count" > 1).isEmpty,
      "restart reprocessed already-committed input")
  }

  test("stream-static enrichWithDim matches the batch broadcast join and drops no facts") {
    val dim = Seq(("click", "engagement"), ("view", "engagement"),
      ("purchase", "revenue")).toDF("event_type", "category")
    // signup/other event types have NO dim row -> must survive with null
    val stream = EventStream.readEvents(spark, dir)
    val got = EventStream.runToMemory(
      EventStream.enrichWithDim(stream, dim, Seq("event_type")),
      "stream_enrich", OutputMode.Append())
      .select("event_id", "event_type", "category")
    val ev = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "events")
    val want = ev.join(broadcast(dim), Seq("event_type"), "left")
      .select("event_id", "event_type", "category")
    assert(got.count() == ev.count(), "enrichment dropped facts")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(got.where($"category".isNull).count() > 0,
      "expected unmatched event types to pass through with nulls")
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

  test("append-mode windowedAgg on a late-event replay ≡ batch with the watermark cut") {
    // The production-stream semantics: append mode emits each window
    // exactly once (when the watermark passes its end) and DROPS an
    // event exactly when its WINDOW is already finalized (window end <=
    // watermark at arrival) — a late event whose window is still open is
    // admitted. Replay a three-batch sequence exercising both cases and
    // check the emitted output equals a batch plan reproducing the cut.
    val inDir = java.nio.file.Files.createTempDirectory("wm-append")
    // rows: (event_id, event_type, ts, value)
    val b1 = Seq(
      (1L, "view", "2024-01-01 10:00:00", 1.0),
      (2L, "view", "2024-01-01 10:30:00", 2.0),
      (3L, "view", "2024-01-01 11:10:00", 3.0))
    // 10:20 is behind the watermark (10:40) but its window [10:00,11:00)
    // is still open (end 11:00 > 10:40) -> ADMITTED; 12:10 advances the
    // watermark to 11:40, which closes and emits [10:00,11:00)
    val b2 = Seq(
      (4L, "view", "2024-01-01 10:20:00", 10.0),
      (5L, "view", "2024-01-01 12:10:00", 4.0))
    // 10:15's window end 11:00 <= watermark 11:40: too late -> DROPPED.
    // 14:00 pushes the watermark to 13:30, closing every window through
    // [12:00,13:00); its own window [14:00,15:00) stays open (not emitted)
    val b3 = Seq(
      (6L, "view", "2024-01-01 10:15:00", 20.0),
      (7L, "view", "2024-01-01 14:00:00", 5.0))
    def toDf(rows: Seq[(Long, String, String, Double)]) =
      rows.toDF("event_id", "event_type", "ts_s", "value")
        .select($"event_id", to_timestamp($"ts_s").as("ts"), $"event_type", $"value")
    def land(name: String, rows: Seq[(Long, String, String, Double)]): Unit =
      toDf(rows).coalesce(1).write.parquet(s"$inDir/$name")
    land("b1", b1)
    val stream = spark.readStream
      .schema("event_id long, ts timestamp, event_type string, value double")
      .parquet(s"$inDir/*")
    val q = EventStream.windowedAgg(stream, "1 hour", "30 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("wm_append").start()
    try {
      q.processAllAvailable()
      land("b2", b2); q.processAllAvailable()
      land("b3", b3); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("wm_append")
      .select("window_start", "event_type", "n", "sum_value")

    // Batch reproduction of the cut: replay the batches through the
    // watermark update rule (wm = max seen event time - delay, applied
    // to the NEXT batch), drop rows whose tumbling window is already
    // finalized at arrival, aggregate, and keep only the windows the
    // final watermark closed.
    val delayMs = 30L * 60 * 1000
    val hourMs = 3600L * 1000
    def evMs(r: (Long, String, String, Double)): Long =
      java.sql.Timestamp.valueOf(r._3).getTime
    def windowEndMs(tsMs: Long): Long = Math.floorDiv(tsMs, hourMs) * hourMs + hourMs
    val (accepted, finalWmMs) =
      Seq(b1, b2, b3).foldLeft(
        (Seq.empty[(Long, String, String, Double)], Long.MinValue)) {
        case ((acc, wm), batch) =>
          val onTime = batch.filter(r => windowEndMs(evMs(r)) > wm)
          (acc ++ onTime, math.max(wm, batch.map(evMs).max - delayMs))
      }
    val want = EventWindows.tumbling(toDf(accepted), "ts", "1 hour",
        Seq("event_type"),
        Seq(count(lit(1)).as("n"), sum(col("value")).as("sum_value")))
      .select("window_start", "event_type", "n", "sum_value")
      .where(col("window_start") + expr("INTERVAL 1 HOUR")
        <= lit(new java.sql.Timestamp(finalWmMs)))
    assert(want.count() == 3, "cut reproduction should close exactly 3 windows")
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      s"append-mode output disagrees with the batch watermark cut: " +
        s"got=${got.collect().toSeq} want=${want.collect().toSeq}")
    // the open-window late event (10.0) was admitted, the closed-window
    // one (20.0) was cut: 1+2+10, not 1+2 and not 1+2+10+20
    assert(got.where($"window_start" === "2024-01-01 10:00:00")
      .select("sum_value").as[Double].head() == 13.0)
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

  test("readEvents on the raw driver file yields watermarkable ts for every stateful op") {
    // Round 6 regression guard: the driver regenerates events.parquet in
    // changing physical shapes (nanos-long, then timestamp[us]/NTZ); the
    // streaming reader must normalize whatever is on disk to a
    // session-zoned TimestampType, because watermarks REJECT
    // TIMESTAMP_NTZ event time and a mis-decoded epoch silently empties
    // windows. Read the real file DIRECTLY (no fixture rewrite) and
    // drive the stateful ops that other specs exercise only on
    // spec-local fixtures.
    val stream = EventStream.readEvents(spark,
      "/root/testdata/sf0.001/events.parquet")
    assert(stream.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType,
      s"readEvents must normalize ts; got ${stream.schema("ts").dataType}")
    val batch = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "events")
    // watermarked exact dedup accepts the normalized event time and
    // passes the (already unique) events through one-for-one
    val deduped = EventStream.runToMemory(
      EventStream.dedupStream(stream, Seq("event_id"), "30 minutes"),
      "raw_file_dedup", OutputMode.Append())
    assert(deduped.count() == batch.count())
    // event-time-timeout sessionization consumes the same stream; the
    // watermark never closes the last open session of a bounded replay,
    // so compare the sessions that DID close against the batch
    // sessionizer's closed set
    val closed = EventStream.runToMemory(
      EventStream.sessionizeClosed(
        stream.withWatermark("ts", "0 seconds")
          .select($"event_id", $"user_id", $"ts", $"value")
          .as[EventStream.Event], 1800).toDF(),
      "raw_file_sessions", OutputMode.Append())
    // ClosedSession carries java.sql.Timestamp at MILLISECOND
    // precision, so truncate the batch-side micros the same way
    val batchSessions = graft.ops.EventWindows.sessionize(
        batch, "user_id", "ts", 1800, "event_id")
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        timestamp_millis(unix_millis(min($"ts"))).as("session_start"))
    assert(closed.count() > 0, "bounded replay should close at least one session")
    assert(closed.join(batchSessions,
        Seq("user_id", "session_start", "n_events"), "left_anti").isEmpty,
      "every closed streaming session must match a batch session")
  }

  test("streaming session_window agg ≡ batch session_window on closed sessions") {
    // native session windows in streaming mode over the REAL driver
    // file: every session the stream closes (watermark-passed) must
    // exist identically in the batch session_window aggregation; gap
    // end = last event + gap, so compare the full 5-tuple
    val stream = EventStream.readEvents(spark,
      "/root/testdata/sf0.001/events.parquet")
    val got = EventStream.runToMemory(
      EventStream.sessionWindowAgg(stream, "30 minutes"),
      "stream_session_windows", OutputMode.Append())
    val batch = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "events")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("sum_value"))
      .select($"user_id", $"session_window.start".as("session_start"),
        $"session_window.end".as("session_end"), $"n_events", $"sum_value")
    assert(got.count() > 0, "bounded replay should close sessions")
    assert(got.exceptAll(batch).isEmpty,
      "streaming emitted a session the batch aggregation disagrees with")
  }

  test("idempotent sink lands each batch once; replayed epochs are skipped") {
    import graft.streaming.EventStream
    val root = java.nio.file.Files.createTempDirectory("idem").toString + "/out"
    val d1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    // first commit writes
    assert(EventStream.landBatch(d1, 0L, root))
    // the replayed epoch (same batchId, even different data) is a no-op
    val d1replay = Seq((9L, "ZZZ")).toDF("id", "v")
    assert(!EventStream.landBatch(d1replay, 0L, root))
    // the next epoch lands
    assert(EventStream.landBatch(Seq((3L, "c")).toDF("id", "v"), 1L, root))
    val back = spark.read.parquet(root)
    assert(back.count() == 3)
    assert(back.columns.contains("batch_id")) // partition column surface
    assert(!back.where($"v" === "ZZZ").isEmpty == false)
    // the streaming writer drives the same commit path end-to-end
    val inDir = java.nio.file.Files.createTempDirectory("idem_in").toString
    Seq((10L, "x"), (11L, "y")).toDF("id", "v")
      .coalesce(1).write.parquet(s"$inDir/b1")
    val stream = spark.readStream.schema("id long, v string")
      .parquet(s"$inDir/*")
    val root2 = java.nio.file.Files.createTempDirectory("idem2").toString + "/out"
    val q = EventStream.idempotentParquetSink(stream, root2).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(root2).count() == 2)
  }
}
