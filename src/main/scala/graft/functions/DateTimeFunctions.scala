package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/time column functions.
  *
  * Provides the non-standard `%Y-%W` week key the reference derives with
  * DuckDB's `strftime('%Y-%W', date)` (reference:
  * `mkt_returns/sql_test_mkt_returns.ipynb:677,778`). Composed from Spark
  * built-ins so the whole expression stays inside WholeStageCodegen — no
  * UDF, no custom Expression needed.
  */
object DateTimeFunctions {

  /** Monday-first day-of-week, 1=Monday .. 7=Sunday. */
  def isoDow(d: Column): Column = weekday(d) + 1

  /** Week-of-year 00..53 with Monday as the first day of the week; days
    * before the year's first Monday fall in week 00. Matches C
    * `strftime('%W')` exactly (NOT ISO `weekofyear`):
    *
    *   week = floor((dayofyear + 7 - isoDow) / 7)
    *
    * e.g. 2025-01-01 (Wed) -> 0, 2025-01-06 (Mon) -> 1, 2024-01-01
    * (Mon) -> 1 (a year starting on Monday has no week 00).
    */
  def weekOfYearMonday(d: Column): Column =
    floor((dayofyear(d) + lit(7) - isoDow(d)) / lit(7)).cast("int")

  /** `%Y-%W` week key, e.g. "2025-08". The grouping key for weekly
    * compounded returns (reference `.ipynb:677`). */
  def yearWeek(d: Column): Column =
    concat(year(d).cast("string"), lit("-"),
      lpad(weekOfYearMonday(d).cast("string"), 2, "0"))
}
