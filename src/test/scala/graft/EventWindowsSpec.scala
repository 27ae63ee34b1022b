package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.EventWindows

class EventWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    (1L, 10L, ts("2024-01-01 00:05:00"), 1.0),
    (2L, 10L, ts("2024-01-01 00:20:00"), 2.0),  // same session (15m gap)
    (3L, 10L, ts("2024-01-01 01:10:00"), 3.0),  // new session (50m gap)
    (4L, 11L, ts("2024-01-01 00:59:00"), 4.0),
    (5L, 11L, ts("2024-01-01 01:01:00"), 5.0)   // same session, crosses hour
  ).toDF("event_id", "user_id", "ts", "value")

  test("tumbling windows bucket by epoch-aligned hour") {
    val out = EventWindows.tumbling(events, "ts", "1 hour", Seq.empty,
      Seq(count(lit(1)).as("n")))
    val m = out.collect().map(r =>
      r.getAs[Timestamp]("window_start") -> r.getAs[Long]("n")).toMap
    assert(m(ts("2024-01-01 00:00:00")) == 3L)
    assert(m(ts("2024-01-01 01:00:00")) == 2L)
  }

  test("sliding 1h/30m windows count each event twice") {
    val out = EventWindows.sliding(events, "ts", "1 hour", "30 minutes",
      Seq.empty, Seq(count(lit(1)).as("n")))
    assert(out.agg(sum("n")).head().getLong(0) == events.count() * 2)
  }

  test("sessionize splits on gap > threshold per entity") {
    val s = EventWindows.sessionize(events, "user_id", "ts", 1800, "event_id")
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(1L) == 1L && s(2L) == 1L) // 15m gap: same session
    assert(s(3L) == 2L)                // 50m gap: new session
    assert(s(4L) == 1L && s(5L) == 1L) // other user independent
  }

  test("sessionStats aggregates per session deterministically") {
    val st = EventWindows.sessionStats(events, "user_id", "ts", "value",
        1800, "event_id")
      .orderBy("user_id", "session_id").collect()
    assert(st.length == 3)
    val first = st.head
    assert(first.getAs[Long]("user_id") == 10L)
    assert(first.getAs[Long]("n_events") == 2L)
    assert(first.getAs[Double]("sum_value") == 3.0)
    assert(first.getAs[Long]("duration_s") == 900L)
    assert(first.getAs[Timestamp]("session_start") == ts("2024-01-01 00:05:00"))
  }
}
