package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension build from a change log
  * (gaps-and-islands): collapse each key's CONSECUTIVE runs of an
  * unchanged attribute into validity intervals — the dimension-table
  * shape a warehouse keeps for "what was this entity's state at time
  * t" joins (the as-of join in [[AsOf]] is the query-side dual).
  *
  * Scale shape: one shuffle on the key; two ordered windows (change
  * flag via lag, run id via running sum) and one hash aggregation per
  * run, then a final lead window over the REDUCED run frame. Nothing
  * global, state O(1) per row.
  */
object Scd {

  /** Output: (key, attr, valid_from, valid_to) — `valid_from` the
    * run's first order value, `valid_to` the next run's start (null on
    * each key's open run). `orderCols` must totally order rows within
    * a key (pass a tie-break). */
  def runIntervals(df: DataFrame, keyCol: String, orderCols: Seq[String],
      attrCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val prev = lag(col(attrCol), 1).over(w)
    val changed = when(prev.isNull || col(attrCol) =!= prev, 1L).otherwise(0L)
    val runs = df
      .withColumn("__chg", changed)
      .withColumn("__run", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__run"))
      .agg(min(col(attrCol)).as(attrCol), // constant within the run
        min(col(tsCol)).as("valid_from"))
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col("__run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
      .drop("__run")
  }

  /** CDC changelog apply: reduce a stream of keyed change events
    * (op ∈ insert/update marks vs `deleteOp`) to the FINAL table
    * state — per key, the payload of the LAST event in `orderCols`
    * order, with keys whose last event is a delete absent entirely
    * (the replication-sink semantics of MERGE applied in sequence;
    * [[graft.etl.WarehouseSink.upsertByKey]] is the single-batch,
    * no-delete special case).
    *
    * One shuffle on the key; latest-event selection is a max_by-style
    * partial aggregation over a struct of (orderCols..., op,
    * payload...) — map-side combinable, NO window over the changelog
    * (at 100 TB the log is much bigger than the key space; the
    * aggregate reduces early). `orderCols` must totally order events
    * within a key. */
  def applyChangelog(log: DataFrame, keyCol: String, orderCols: Seq[String],
      opCol: String, deleteOp: String,
      payloadCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    require(payloadCols.nonEmpty, "need at least one payload column")
    val ord = struct(orderCols.map(col): _*)
    val carried = struct(
      (orderCols.map(col) :+ col(opCol)) ++ payloadCols.map(col): _*)
    log.groupBy(col(keyCol))
      .agg(max_by(carried, ord).as("__last"))
      .where(col(s"__last.$opCol") =!= deleteOp)
      .select(col(keyCol) +:
        (orderCols ++ payloadCols).map(c => col(s"__last.$c").as(c)): _*)
  }
}
