package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived calendar dimension.
  *
  * The reference loads a daily-grain calendar CSV (`tb_calendar`,
  * reference `mkt_returns/sql_test_mkt_returns.ipynb:239`; schema from its
  * DESCRIBE output) and joins facts to it to keep working days only. The
  * original CSV is a stripped blob, so we generate the dimension
  * deterministically: Mon-Fri => working day, Sat/Sun => not (the rule
  * every visible notebook output obeys).
  *
  * Generated with `spark.range` — a pure plan, no driver-side collect —
  * and small enough (a century is ~36k rows) to always broadcast.
  */
object Calendar {

  /** Daily calendar covering [start, end], both inclusive, ISO dates.
    * Columns mirror the reference's `tb_calendar` (with a `cal_date`
    * name to avoid colliding with fact columns on join):
    * cal_date DATE, day_of_week BIGINT (1=Monday), text_day_of_week,
    * text_month_of_year, is_holiday (always false — reconstruction
    * rule), is_working_day BOOLEAN. */
  def calendar(spark: SparkSession, start: String, end: String): DataFrame = {
    val s = java.time.LocalDate.parse(start)
    val e = java.time.LocalDate.parse(end)
    val n = java.time.temporal.ChronoUnit.DAYS.between(s, e) + 1
    require(n > 0, s"empty calendar range $start..$end")
    spark.range(n)
      .select(date_add(lit(start).cast("date"), col("id").cast("int")).as("cal_date"))
      .withColumn("day_of_week", (weekday(col("cal_date")) + 1).cast("long"))
      .withColumn("text_day_of_week", date_format(col("cal_date"), "EEEE"))
      .withColumn("text_month_of_year", date_format(col("cal_date"), "MMMM"))
      .withColumn("is_holiday", lit(false))
      .withColumn("is_working_day", col("day_of_week") <= 5)
  }

  /** Keep only fact rows whose `dateCol` is a working day (reference J1 +
    * P3: join to calendar, filter `is_working_day = TRUE`,
    * `.ipynb:678-681`). The calendar side is explicitly broadcast: a
    * bounded dimension must never shuffle the 100 TB fact side. */
  def filterWorkingDays(fact: DataFrame, dateCol: String,
      start: String = "1990-01-01", end: String = "2060-12-31"): DataFrame = {
    val cal = calendar(fact.sparkSession, start, end)
      .where(col("is_working_day"))
      .select(col("cal_date"))
    fact.join(broadcast(cal), fact(dateCol) === cal("cal_date"), "inner")
      .drop("cal_date")
  }
}
