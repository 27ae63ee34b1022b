package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DateTimeFunctions.yearWeek
import graft.functions.ReturnFunctions.{compoundReturn, runningCompound}

/** The reference's market-returns analytics re-expressed as pure
  * DataFrame transformers (reference
  * `mkt_returns/sql_test_mkt_returns.ipynb` cells 12-15).
  *
  * All take generic column names so the same operators run over the
  * reference's fund/return data and the driver's synthetic `events`
  * table. No action is ever triggered inside an operator.
  */
object Returns {

  /** vw_mkt_returns v1 (reference `.ipynb:671-706`): per
    * (entity, kind, %Y-%W week) compounded weekly return. Input must
    * already be working-day filtered (compose with
    * [[Calendar.filterWorkingDays]]). Output columns: entity keys,
    * `year_week`, `weekly_return`. */
  def weeklyReturns(daily: DataFrame, entity: String, kind: String,
      dateCol: String, ret: String): DataFrame =
    daily
      .withColumn("year_week", yearWeek(col(dateCol)))
      .groupBy(col(entity), col(kind), col("year_week"))
      .agg(compoundReturn(col(ret)).as("weekly_return"))

  /** vw_mkt_returns v2 (reference `.ipynb:772-800`): detail rows plus the
    * intra-week running compound ("daily compound evolution"). One output
    * row per input row. */
  def withRunningCompound(daily: DataFrame, entity: String, kind: String,
      dateCol: String, ret: String): DataFrame = {
    val w = Window.partitionBy(col(entity), col(kind), col("year_week"))
      .orderBy(col(dateCol))
    daily
      .withColumn("year_week", yearWeek(col(dateCol)))
      .withColumn("daily_compound_evolution", runningCompound(col(ret), w))
  }

  /** The reference's cell-12 pattern (J2): compute a group aggregate and
    * join it back onto the detail rows on the full composite key. The
    * aggregate side is derived from the detail side, so Spark plans a
    * shuffle-on-keys for the agg and reuses the exchange for the join —
    * no broadcast needed or wanted (the agg side scales with the fact). */
  def attachGroupAgg(detail: DataFrame, keys: Seq[String],
      aggCol: org.apache.spark.sql.Column, as: String): DataFrame = {
    val agg = detail.groupBy(keys.map(col): _*).agg(aggCol.as(as))
    detail.join(agg, keys, "inner")
  }

  /** The window rewrite of [[attachGroupAgg]] — the very rewrite the
    * reference notebook itself discovers in cell 14: an unbounded
    * window over the group keys attaches the aggregate in ONE shuffle
    * (no second agg relation, no join). Prefer this form when the
    * aggregate is expressible as `agg(col).over(window)`; the join-back
    * form remains for aggregates that need post-aggregation projection.
    */
  def attachGroupAggWindowed(detail: DataFrame, keys: Seq[String],
      agg: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      valueCol: String, as: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    detail.withColumn(as, agg(col(valueCol)).over(w))
  }
}
