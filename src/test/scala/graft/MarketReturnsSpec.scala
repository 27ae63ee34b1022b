package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.MarketReturns

/** Golden-output test: the full reference workload
  * (`mkt_returns/sql_test_mkt_returns.ipynb`) on the reference's own
  * committed `data.csv` (472 rows) with the reconstructed calendar,
  * diffed against values stored in the notebook outputs (cells 13/15).
  * Skips cleanly if the read-only reference checkout is absent. */
class MarketReturnsSpec extends SparkSpec {

  private val csv = "/root/reference/mkt_returns/data.csv"
  private def available = new java.io.File(csv).isFile
  private val eps = 1e-9

  test("weekly view reproduces notebook cell-13 golden rows") {
    assume(available, s"reference data.csv not present at $csv")
    val mkt = MarketReturns.loadMarketData(spark, csv)
    assert(mkt.count() == 472)
    val v = MarketReturns.weeklyView(mkt)
    // 59 dates, 16 weekend days -> 43 working days x 4 funds x 2 types
    assert(v.count() == 43 * 8)
    val first = v.where(col("fund_code") === "FUND_01" &&
        col("return_type") === "TYPE_A" &&
        col("market_date") === lit("2025-01-01").cast("date")).head()
    assert(first.getAs[String]("year_week") == "2025-00")
    assert(math.abs(first.getAs[Double]("daily_return") - 0.3007302582) < eps)
    assert(math.abs(first.getAs[Double]("weekly_return") - 0.5582162431456255) < eps)
    val firstB = v.where(col("fund_code") === "FUND_01" &&
        col("return_type") === "TYPE_B" &&
        col("market_date") === lit("2025-01-01").cast("date")).head()
    assert(math.abs(firstB.getAs[Double]("weekly_return") - 0.5805392234716797) < eps)
  }

  test("running view reproduces notebook cell-15 golden rows") {
    assume(available, s"reference data.csv not present at $csv")
    val mkt = MarketReturns.loadMarketData(spark, csv)
    val v = MarketReturns.runningView(mkt)
    val a = v.where(col("fund_code") === "FUND_01" &&
        col("return_type") === "TYPE_A" &&
        col("market_date") === lit("2025-01-01").cast("date")).head()
    // first working day of the week: evolution == its own daily return
    assert(math.abs(a.getAs[Double]("daily_compound_evolution") - 0.3007302582) < eps)
    val b = v.where(col("fund_code") === "FUND_01" &&
        col("return_type") === "TYPE_B" &&
        col("market_date") === lit("2025-01-01").cast("date")).head()
    assert(math.abs(b.getAs[Double]("daily_compound_evolution") - 0.0802217168099999) < 1e-12)
  }

  test("table-driven golden rows: weekly + running values across funds/weeks") {
    assume(available, s"reference data.csv not present at $csv")
    val mkt = MarketReturns.loadMarketData(spark, csv)
    // (fund, type, date) -> (year_week, weekly_return, running_evolution)
    // transcribed from the notebook's stored outputs of cells 13 and 15
    val golden = Seq(
      ("FUND_01", "TYPE_A", "2025-01-02", "2025-00", 0.5582162431456255, 0.49390199643674215),
      ("FUND_01", "TYPE_B", "2025-01-02", "2025-00", 0.5805392234716797, 0.4928439571984151),
      ("FUND_01", "TYPE_A", "2025-01-03", "2025-00", 0.5582162431456255, 0.5582162431456255),
      ("FUND_01", "TYPE_A", "2025-01-06", "2025-01", 0.9862496965157128, 0.10483214580000011),
      ("FUND_01", "TYPE_B", "2025-01-06", "2025-01", 1.4734731003038548, 0.08204775974),
      ("FUND_01", "TYPE_A", "2025-01-07", "2025-01", 0.9862496965157128, 0.23648683342958954),
      ("FUND_01", "TYPE_B", "2025-01-07", "2025-01", 1.4734731003038548, 0.4888577982798783),
      ("FUND_04", "TYPE_A", "2025-02-25", "2025-08", 2.79573265014471, 0.653801338320247),
      ("FUND_04", "TYPE_B", "2025-02-26", "2025-08", 1.4270981380582546, 0.7782579135571828),
      ("FUND_04", "TYPE_A", "2025-02-27", "2025-08", 2.79573265014471, 1.56520144810522),
      ("FUND_04", "TYPE_B", "2025-02-28", "2025-08", 1.4270981380582546, 1.4270981380582546),
      ("FUND_04", "TYPE_A", "2025-02-28", "2025-08", 2.79573265014471, 2.79573265014471))
    val weekly = MarketReturns.weeklyView(mkt).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDate(2).toString) ->
        (r.getString(4), r.getDouble(5))).toMap
    val running = MarketReturns.runningView(mkt).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDate(2).toString) ->
        r.getDouble(5)).toMap
    golden.foreach { case (f, t, d, yw, wret, rev) =>
      val (gotYw, gotW) = weekly((f, t, d))
      assert(gotYw == yw, s"($f,$t,$d) week key $gotYw != $yw")
      assert(math.abs(gotW - wret) < eps, s"($f,$t,$d) weekly $gotW != $wret")
      val gotR = running((f, t, d))
      assert(math.abs(gotR - rev) < eps, s"($f,$t,$d) running $gotR != $rev")
    }
  }

  test("business-key EDA invariants from cells 10-11 hold") {
    assume(available, s"reference data.csv not present at $csv")
    val mkt = MarketReturns.loadMarketData(spark, csv)
    assert(!graft.ops.Quality.isUniqueKey(mkt, Seq("fund_code", "market_date")))
    assert(graft.ops.Quality.isUniqueKey(mkt,
      Seq("fund_code", "market_date", "return_type")))
  }

  test("calendar CSV round-trip: loaded file reproduces the generated pipeline") {
    assume(available, s"reference data.csv not present at $csv")
    val mkt = MarketReturns.loadMarketData(spark, csv)
    // write the generated dimension out under the reference's
    // UPPER_CASE headers, load it back through the CSV path
    val dir = java.nio.file.Files.createTempDirectory("cal-csv").toString
    graft.ops.Calendar.asReferenceCsvColumns(
        graft.ops.Calendar.calendar(spark, "2024-12-01", "2025-04-30"))
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
    val cal = graft.ops.Calendar.load(spark, dir)
    assert(cal.columns.toSeq == Seq("cal_date", "day_of_week",
      "text_day_of_week", "text_month_of_year", "is_holiday", "is_working_day"))
    val viaCsv = MarketReturns.weeklyView(mkt, Some(cal))
      .orderBy("fund_code", "return_type", "market_date")
    val viaGen = MarketReturns.weeklyView(mkt)
      .orderBy("fund_code", "return_type", "market_date")
    assert(viaCsv.collect().toSeq == viaGen.collect().toSeq)
  }

  test("calendar CSV holidays are honored (a working Monday marked off drops)") {
    assume(available, s"reference data.csv not present at $csv")
    val mkt = MarketReturns.loadMarketData(spark, csv)
    // mark 2025-01-06 (a Monday with data) as a holiday in the file
    val cal = graft.ops.Calendar.calendar(spark, "2024-12-01", "2025-04-30")
      .withColumn("is_holiday", col("cal_date") === lit("2025-01-06").cast("date"))
      .withColumn("is_working_day",
        col("is_working_day") && !col("is_holiday"))
    val dir = java.nio.file.Files.createTempDirectory("cal-csv-h").toString
    graft.ops.Calendar.asReferenceCsvColumns(cal)
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
    val loaded = graft.ops.Calendar.load(spark, dir)
    val rows = MarketReturns.workingDayReturns(mkt, Some(loaded))
    assert(rows.where(col("market_date") === lit("2025-01-06").cast("date")).count() == 0)
    // and the baseline (no holiday) does keep that Monday
    val base = MarketReturns.workingDayReturns(mkt)
    assert(base.where(col("market_date") === lit("2025-01-06").cast("date")).count() > 0)
  }

  test("null daily returns contribute 0% days (128 nulls in data.csv)") {
    assume(available, s"reference data.csv not present at $csv")
    val mkt = MarketReturns.loadMarketData(spark, csv)
    assert(mkt.where(col("daily_return").isNull).count() == 128)
    // weekly returns remain defined wherever any non-null day exists
    val v = MarketReturns.weeklyView(mkt)
    assert(v.where(col("weekly_return").isNull).count() <
      v.count())
  }
}
