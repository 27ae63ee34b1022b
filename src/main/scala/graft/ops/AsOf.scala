package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the most recent
  * right row with `rightTs <= leftTs` within the same entity keys —
  * the time-series join the reference's market-data domain implies
  * (prices/rates effective at trade time).
  *
  * Spark-first formulation (no custom SparkPlan needed): union both
  * sides tagged, one window pass per entity ordered by
  * (ts, side-tag), and `last(payload, ignoreNulls)` carries the
  * latest right payload forward onto each left row. Cost: ONE shuffle
  * on the entity keys + one sort — same as any window; never a range
  * cross-product. Inclusive semantics (a right row at exactly leftTs
  * applies) via the side-tag sort order; among equal-ts right rows the
  * last in (ts) order wins.
  *
  * Columns of `right` other than keys/ts must be disjoint from `left`'s.
  */
object AsOf {

  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "as-of join needs right payload columns")
    require(payload.forall(c => !left.columns.contains(c)),
      s"right payload ${payload.mkString(",")} collides with left columns")
    val rAligned = right.select(
      (keys.map(col) :+ col(rightTs).as(leftTs)) ++ payload.map(col): _*)
      .withColumn("__k", lit(0))
    val lTagged = left.withColumn("__k", lit(1))
    val u = lTagged.unionByName(rAligned, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(leftTs), col("__k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.where(col("__k") === 1).drop("__k")
  }
}
