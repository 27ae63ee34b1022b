package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-window aggregation and sessionization over event streams, in
  * batch form (the Structured Streaming variants live in
  * `graft.streaming` and share these semantics).
  *
  * Windows use Spark's `window()` (epoch-aligned tumbling/sliding
  * buckets); sessionization is the gap-based lag/cumsum pattern — one
  * shuffle on the session key, everything else window functions within
  * the partition.
  */
object EventWindows {

  /** Tumbling-window aggregation. Output: window_start + keys + aggs. */
  def tumbling(events: DataFrame, tsCol: String, duration: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame =
    events.groupBy(window(col(tsCol), duration) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .drop("window")

  /** Sliding-window aggregation. */
  def sliding(events: DataFrame, tsCol: String, duration: String,
      slide: String, keys: Seq[String], aggs: Seq[Column]): DataFrame =
    events.groupBy(window(col(tsCol), duration, slide) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .drop("window")

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same entity exceeds `gapSeconds`. Output: one
    * row per event with a per-entity `session_id` (1-based, ordered by
    * time). Deterministic: ordering ties broken by `orderTieCol`. */
  def sessionize(events: DataFrame, entityCol: String, tsCol: String,
      gapSeconds: Long, orderTieCol: String): DataFrame = {
    val order = Seq(col(tsCol), col(orderTieCol))
    val wLag = Window.partitionBy(col(entityCol)).orderBy(order: _*)
    val wCum = wLag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(wLag))
      .withColumn("__new",
        when(col("__prev").isNull ||
          (unix_micros(col(tsCol)) - unix_micros(col("__prev"))) >
            gapSeconds * 1000000L, lit(1)).otherwise(lit(0)))
      .withColumn("session_id", sum(col("__new")).over(wCum))
      .drop("__prev", "__new")
  }

  /** Per-session rollup on top of [[sessionize]]: start (second
    * precision), event count, value sum. */
  def sessionStats(events: DataFrame, entityCol: String, tsCol: String,
      valueCol: String, gapSeconds: Long, orderTieCol: String): DataFrame =
    sessionize(events, entityCol, tsCol, gapSeconds, orderTieCol)
      .groupBy(col(entityCol), col("session_id"))
      .agg(
        date_trunc("second", min(col(tsCol))).as("session_start"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 4).as("sum_value"),
        (unix_timestamp(date_trunc("second", max(col(tsCol)))) -
          unix_timestamp(date_trunc("second", min(col(tsCol))))).as("duration_s"))

  /** Coalesce overlapping/touching intervals per key into maximal
    * islands (gaps-and-islands): an interval starts a new island iff
    * its start lies strictly AFTER the running max end of everything
    * before it (equal = touching = merged). The interval-algebra
    * normalizer behind availability windows, session stitching, and
    * blackout masks. Two windows partitioned by the key (running max
    * end, then the island counter), one aggregation. Output per
    * island: (key, island, start, end, n_merged). */
  def coalesceIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("__brk",
        when(prevMax.isNull || col(startCol) > prevMax, 1).otherwise(0))
      .withColumn("__island", sum(col("__brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__island").cast("long").as("island"))
      .agg(min(col(startCol)).as("start"), max(col(endCol)).as("end"),
        count(lit(1)).as("n_merged"))
  }
}
