package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — users grouped by the ISO week of their first
  * event, tracked by how many are active k weeks later.
  *
  * Scale shape: one aggregation on the user key for first-event times,
  * one distinct on (user, week), one key-shuffle join of the two
  * user-keyed frames, one final bounded aggregation
  * (weeks × offsets rows). Nothing quadratic, no global windows.
  */
object Cohorts {

  /** Output: (cohort_week DATE, week_offset, n_users) — distinct users
    * from each first-week cohort active `week_offset` weeks after
    * their cohort week (offset 0 = the cohort week itself, so
    * offset-0 rows count the full cohort). */
  def retention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val firsts = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).cast("date").as("cohort_week"))
    val active = events
      .select(col(userCol),
        date_trunc("week", col(tsCol)).cast("date").as("activity_week"))
      .distinct()
    active.join(firsts, userCol)
      .groupBy(col("cohort_week"),
        (datediff(col("activity_week"), col("cohort_week")) / 7)
          .cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
