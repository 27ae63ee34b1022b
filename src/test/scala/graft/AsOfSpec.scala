package graft

import java.sql.Timestamp

import graft.ops.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("joinAsOf picks the latest right row at or before each left ts") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (2L, "A", ts("2024-01-01 10:30:00")),
      (3L, "A", ts("2024-01-01 09:00:00")),  // before any rate -> null
      (4L, "B", ts("2024-01-01 10:30:00"))
    ).toDF("trade_id", "sym", "t")
    val rates = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),  // exactly at trade 1 -> applies
      ("A", ts("2024-01-01 10:15:00"), 2.0),
      ("B", ts("2024-01-01 08:00:00"), 9.0)
    ).toDF("sym", "rt", "rate")
    val out = AsOf.joinAsOf(trades, rates, Seq("sym"), "t", "rt", Seq("rate"))
      .select("trade_id", "rate").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(1.0))   // inclusive at equal ts
    assert(out(2L).contains(2.0))   // latest <= 10:30 is the 10:15 rate
    assert(out(3L).isEmpty)         // no rate yet
    assert(out(4L).contains(9.0))   // per-entity isolation
  }

  test("forward direction picks the earliest right row at or after left ts") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),  // rate exactly at 10:00 applies
      (2L, "A", ts("2024-01-01 10:05:00")),  // next is 10:15
      (3L, "A", ts("2024-01-01 11:00:00"))   // nothing after -> null
    ).toDF("trade_id", "sym", "t")
    val rates = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 10:15:00"), 2.0)
    ).toDF("sym", "rt", "rate")
    val out = AsOf.joinAsOf(trades, rates, Seq("sym"), "t", "rt", Seq("rate"),
      direction = "forward")
      .select("trade_id", "rate").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(1.0))
    assert(out(2L).contains(2.0))
    assert(out(3L).isEmpty)
  }

  test("nearest direction picks the closer side, ties to backward") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:10:00")),  // 10 min back vs 5 min fwd -> fwd
      (2L, "A", ts("2024-01-01 10:07:30")),  // equidistant -> backward wins
      (3L, "A", ts("2024-01-01 09:00:00"))   // only forward exists
    ).toDF("trade_id", "sym", "t")
    val rates = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 10:15:00"), 2.0)
    ).toDF("sym", "rt", "rate")
    val out = AsOf.joinAsOf(trades, rates, Seq("sym"), "t", "rt", Seq("rate"),
      direction = "nearest")
      .select("trade_id", "rate").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(2.0))
    assert(out(2L).contains(1.0))
    assert(out(3L).contains(1.0))
  }

  test("tolerance nulls out matches farther than the bound") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:20:00")),  // 5 min since last rate -> keep
      (2L, "A", ts("2024-01-01 11:00:00"))   // 45 min -> outside 10 min
    ).toDF("trade_id", "sym", "t")
    val rates = Seq(
      ("A", ts("2024-01-01 10:15:00"), 2.0)
    ).toDF("sym", "rt", "rate")
    val out = AsOf.joinAsOf(trades, rates, Seq("sym"), "t", "rt", Seq("rate"),
      tolerance = Some(org.apache.spark.sql.functions.expr("INTERVAL 10 MINUTES")))
      .select("trade_id", "rate").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(2.0))
    assert(out(2L).isEmpty)
  }

  test("rightTieBreak makes equal-ts right rows deterministic (greatest wins)") {
    val trades = Seq((1L, "A", ts("2024-01-01 10:30:00"))).toDF("trade_id", "sym", "t")
    val rates = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1L, 10.0),
      ("A", ts("2024-01-01 10:00:00"), 2L, 20.0),  // same ts, higher seq wins
      ("A", ts("2024-01-01 10:00:00"), 3L, 30.0)
    ).toDF("sym", "rt", "seq", "rate")
    val out = AsOf.joinAsOf(trades, rates, Seq("sym"), "t", "rt",
      Seq("seq", "rate"), rightTieBreak = Some("seq"))
      .select("trade_id", "rate").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(30.0))
  }

  test("carried right row is atomic: null payload cols do not mix rows") {
    // rate2 is null on the LATEST right row; a per-column ignoreNulls
    // carry would resurrect rate2 from the older row while taking rate
    // from the newer one — the struct carry must keep the row atomic
    val trades = Seq((1L, "A", ts("2024-01-01 11:00:00"))).toDF("trade_id", "sym", "t")
    val rates = Seq(
      ("A", ts("2024-01-01 10:00:00"), Some(1.0), Some(100.0)),
      ("A", ts("2024-01-01 10:30:00"), Some(2.0), None)
    ).toDF("sym", "rt", "rate", "rate2")
    val out = AsOf.joinAsOf(trades, rates, Seq("sym"), "t", "rt",
      Seq("rate", "rate2")).select("rate", "rate2").collect().head
    assert(out.getDouble(0) == 2.0)
    assert(out.isNullAt(1))
  }

  test("joinAsOf preserves left row count (left-join semantics)") {
    val ev = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "events")
      .select($"event_id", $"user_id", $"ts")
    val rates = ev.limit(50)
      .select($"user_id", $"ts".as("upd_ts"), lit(1.0).as("rate"))
      .dropDuplicates("user_id", "upd_ts")
    val out = AsOf.joinAsOf(ev, rates, Seq("user_id"), "ts", "upd_ts", Seq("rate"))
    assert(out.count() == ev.count())
  }

  private def lit(v: Double) = org.apache.spark.sql.functions.lit(v)
}
