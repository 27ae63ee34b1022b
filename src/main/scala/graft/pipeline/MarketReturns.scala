package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Calendar, Returns}

/** The reference's market-returns notebook as a pipeline
  * (`mkt_returns/sql_test_mkt_returns.ipynb`): CSV ingestion with
  * inference, the RETUNR_TYPE typo fix, calendar join + working-day
  * filter, and the two view variants (weekly compound attached to
  * detail rows; intra-week running compound). Golden-tested against the
  * notebook's stored outputs in MarketReturnsSpec. */
object MarketReturns {

  /** Load `data.csv` (S6 + P5): header + inference + typo rename +
    * canonical lower-case names. */
  def loadMarketData(spark: SparkSession, csvPath: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(csvPath)
      .withColumnsRenamed(Map(
        "FUND_CODE" -> "fund_code",
        "MARKET_DATE" -> "market_date",
        "RETUNR_TYPE" -> "return_type",
        "DAILY_RETURN" -> "daily_return"))
      .withColumn("market_date", col("market_date").cast("date"))

  /** Working-day detail rows (J1 + P3). With `cal = None` the Mon-Fri
    * reconstruction applies; pass `Some(Calendar.load(...))` to honor a
    * real calendar file's IS_WORKING_DAY/IS_HOLIDAY flags (the
    * reference's actual use case — market holidays). */
  def workingDayReturns(mkt: DataFrame, cal: Option[DataFrame] = None): DataFrame =
    cal match {
      case Some(c) => Calendar.filterWorkingDays(mkt, "market_date", c)
      case None => Calendar.filterWorkingDays(mkt, "market_date")
    }

  /** vw_mkt_returns v1 (`.ipynb:671-706`): detail + weekly compound
    * via the group-then-join-back pattern the notebook uses. */
  def weeklyView(mkt: DataFrame, cal: Option[DataFrame] = None): DataFrame = {
    val daily = workingDayReturns(mkt, cal)
      .withColumn("year_week",
        graft.functions.DateTimeFunctions.yearWeek(col("market_date")))
    val weekly = daily
      .groupBy(col("fund_code"), col("return_type"), col("year_week"))
      .agg(graft.functions.ReturnFunctions.compoundReturn(col("daily_return"))
        .as("weekly_return"))
    daily.join(weekly, Seq("fund_code", "return_type", "year_week"))
      .select(col("fund_code"), col("return_type"), col("market_date"),
        col("daily_return"), col("year_week"), col("weekly_return"))
  }

  /** vw_mkt_returns v2 (`.ipynb:772-800`): detail + running compound. */
  def runningView(mkt: DataFrame, cal: Option[DataFrame] = None): DataFrame =
    Returns.withRunningCompound(workingDayReturns(mkt, cal),
        "fund_code", "return_type", "market_date", "daily_return")
      .select(col("fund_code"), col("return_type"), col("market_date"),
        col("daily_return"), col("year_week"), col("daily_compound_evolution"))
}
