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

  test("sessionize agrees with Spark's native session_window grouping") {
    // independent formulations of gap sessions must induce the same
    // partition of events: our lag/cumsum sessionize vs the built-in
    // session_window aggregation (batch mode)
    val ev = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "events")
    val ours = EventWindows.sessionStats(ev, "user_id", "ts", "value",
        gapSeconds = 1800, orderTieCol = "event_id")
      .select($"user_id", $"session_start", $"n_events",
        round($"sum_value", 4).as("sum_value"))
    val native = ev.groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 4).as("sum_value"))
      .select($"user_id",
        date_trunc("second", $"session_window.start").as("session_start"),
        $"n_events", $"sum_value")
    assert(ours.count() == native.count())
    assert(ours.except(native).isEmpty && native.except(ours).isEmpty)
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

  test("coalesceIntervals merges overlapping and touching, splits on gaps") {
    import spark.implicits._
    // [1,4] [2,5] overlap -> [1,5]; [5,6] touches -> [1,6]; [8,9] gaps
    val iv = Seq((1L, 1, 4), (1L, 2, 5), (1L, 5, 6), (1L, 8, 9),
      (2L, 0, 10)).toDF("k", "s", "e")
    val out = graft.ops.EventWindows.coalesceIntervals(iv, "k", "s", "e")
      .orderBy("k", "island").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4)))
    assert(out.toSeq == Seq((1L, 1L, 1, 6, 3L), (1L, 2L, 8, 9, 1L),
      (2L, 1L, 0, 10, 1L)))
  }

  test("weightedMedian: crossing row wins; ties and unweighted degenerate agree") {
    import spark.implicits._
    // values 1,2,3 with weights 1,1,10: tot 12, cum crosses 6 at v=3
    val df = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 3.0, 10L))
      .toDF("k", "v", "w")
    val r = graft.ops.Binning.weightedMedian(df, "k", "v", "w").head()
    assert(r.getLong(1) == 3L && r.getDouble(2) == 3.0)
    // equal weights -> lower median of 1,2,3,4 is 2
    val eq = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 3.0, 1L),
      ("g", 4.0, 1L)).toDF("k", "v", "w")
    assert(graft.ops.Binning.weightedMedian(eq, "k", "v", "w")
      .head().getDouble(2) == 2.0)
  }
}
