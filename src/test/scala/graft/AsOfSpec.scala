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
