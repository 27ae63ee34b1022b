package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel completion counts — the product-analytics operator
  * over an event stream: how many users performed step 1, then step 2
  * strictly later, then step 3 strictly later than that, ….
  *
  * Semantics are earliest-match chaining: t₁ = the user's first
  * step-1 event; tᵢ = the first step-i event with ts > tᵢ₋₁ (greedy =
  * minimal, so a user reaches step i iff ANY strictly-increasing
  * assignment exists).
  *
  * Scale shape: the input is pre-filtered to the step types (filter
  * pushed to the scan), then ONE shuffle on the user key collects each
  * user's step events; the chain match is a per-user O(events) fold —
  * no joins, no per-step passes. Per-user state is that user's step
  * events only. The final step-count frame is k rows.
  */
object Funnel {

  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    val stepArr = array(steps.map(lit): _*)
    val k = steps.size
    // (ts, type) sorted ascending per user; ts-first makes the scan
    // order the event-time order
    val perUser = events
      .where(col(typeCol).isin(steps: _*))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col(tsCol).as("ts"),
        col(typeCol).as("tp")))).as("__evs"))
    val reached = aggregate(
      col("__evs"),
      struct(lit(0).as("r"),
        lit(null).cast(events.schema(tsCol).dataType).as("last")),
      (acc: Column, x: Column) => {
        val want = element_at(stepArr, acc.getField("r") + 1)
        val matches = acc.getField("r") < k &&
          x.getField("tp") === want &&
          (acc.getField("r") === 0 || x.getField("ts") > acc.getField("last"))
        when(matches,
          struct((acc.getField("r") + 1).as("r"), x.getField("ts").as("last")))
          .otherwise(acc)
      },
      acc => acc.getField("r"))
    val stepSums = (1 to k).map(i =>
      sum(when(col("__reached") >= i, 1L).otherwise(0L)).as(s"__c$i"))
    val counts = perUser.withColumn("__reached", reached)
      .agg(stepSums.head, stepSums.tail: _*)
    counts.select(explode(array((1 to k).map(i =>
        struct(lit(i.toLong).as("step"), lit(steps(i - 1)).as("step_name"),
          col(s"__c$i").as("n_users"))): _*)).as("__s"))
      .select(col("__s.step").as("step"), col("__s.step_name").as("step_name"),
        col("__s.n_users").as("n_users"))
  }

  /** Last-touch attribution: each conversion event (type =
    * `convType`) attributed to the key's most recent PRECEDING
    * non-conversion event type (null when the conversion has no prior
    * touch). One key shuffle; the carry is last(..., ignoreNulls)
    * over the strictly-preceding frame. Output: conversion rows +
    * `last_touch`. */
  def lastTouch(events: DataFrame, userCol: String, orderCols: Seq[String],
      typeCol: String, convType: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(orderCols.map(col): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    events
      .withColumn("last_touch",
        last(when(col(typeCol) =!= convType, col(typeCol)), ignoreNulls = true)
          .over(w))
      .where(col(typeCol) === convType)
  }

  /** Top session-opening event paths — "how do sessions start":
    * sessionize ([[EventWindows.sessionize]] semantics), take each
    * session's first `pathLen` events in (ts, tie) order, render
    * them as a `a>b>c` path, and count sessions per path. The
    * per-session collect is bounded by session length; the path
    * count frame is alphabet-bounded (|types|^pathLen), so the final
    * top-`topN` ordering is metadata-scale, never a data sort.
    * Output: path, n_sessions, rank (count desc, path asc). */
  def eventPaths(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, gapSeconds: Long,
      pathLen: Int = 3, topN: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val sessions = EventWindows.sessionize(events, userCol, tsCol,
      gapSeconds, tieCol)
    val paths = sessions
      .groupBy(col(userCol), col("session_id"))
      .agg(array_join(
        transform(
          slice(array_sort(collect_list(
            struct(col(tsCol), col(tieCol), col(typeCol)))), 1, pathLen),
          s => s.getField(typeCol)), ">").as("path"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topN)
      .withColumn("rank", row_number().over(
        w.orderBy(col("n_sessions").desc, col("path"))).cast("long"))
  }
}
