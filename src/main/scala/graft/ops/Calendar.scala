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
      start: String = "1990-01-01", end: String = "2060-12-31"): DataFrame =
    filterWorkingDays(fact, dateCol, calendar(fact.sparkSession, start, end))

  /** Working-day filter against an INJECTED calendar dimension — the
    * reference's actual use case is a user-supplied calendar file whose
    * `IS_HOLIDAY`/`IS_WORKING_DAY` flags encode real market holidays,
    * not the Mon-Fri reconstruction. The calendar must have `cal_date`
    * and `is_working_day` columns (see [[load]]). */
  def filterWorkingDays(fact: DataFrame, dateCol: String,
      cal: DataFrame): DataFrame = {
    val days = cal.where(col("is_working_day")).select(col("cal_date"))
    fact.join(broadcast(days), fact(dateCol) === days("cal_date"), "inner")
      .drop("cal_date")
  }

  /** Load a calendar dimension from a CSV with the reference's
    * `tb_calendar` schema (ipynb cells 5-6: CTAS from calendar.csv then
    * DESCRIBE: `DATE DATE, DAY_OF_WEEK BIGINT, TEXT_DAY_OF_WEEK
    * VARCHAR, TEXT_MONTH_OF_YEAR VARCHAR, IS_HOLIDAY BOOLEAN,
    * IS_WORKING_DAY BOOLEAN`). Header names are matched
    * case-insensitively and normalized to the lower-case names the rest
    * of the pipeline uses; the file's own holiday/working-day flags are
    * preserved — they are the point of loading a real calendar. */
  def load(spark: SparkSession, csvPath: String): DataFrame = {
    val raw = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(csvPath)
    val byLower = raw.columns.map(c => c.toLowerCase -> c).toMap
    def need(lower: String): String = byLower.getOrElse(lower,
      throw new IllegalArgumentException(
        s"calendar CSV $csvPath is missing required column $lower " +
          s"(have: ${raw.columns.mkString(", ")})"))
    raw.select(
      col(need("date")).cast("date").as("cal_date"),
      col(need("day_of_week")).cast("long").as("day_of_week"),
      col(need("text_day_of_week")).as("text_day_of_week"),
      col(need("text_month_of_year")).as("text_month_of_year"),
      col(need("is_holiday")).cast("boolean").as("is_holiday"),
      col(need("is_working_day")).cast("boolean").as("is_working_day"))
  }

  /** The generated dimension under the reference CSV's UPPER_CASE
    * header names — round-trip helper (write this out, [[load]] reads
    * it back). */
  def asReferenceCsvColumns(cal: DataFrame): DataFrame =
    cal.select(col("cal_date").as("DATE"),
      col("day_of_week").as("DAY_OF_WEEK"),
      col("text_day_of_week").as("TEXT_DAY_OF_WEEK"),
      col("text_month_of_year").as("TEXT_MONTH_OF_YEAR"),
      col("is_holiday").as("IS_HOLIDAY"),
      col("is_working_day").as("IS_WORKING_DAY"))
}
