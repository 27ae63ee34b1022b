package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-shard assignment by token budget ("sequence packing" at the
  * document level): documents, taken in a deterministic order,
  * accumulate token counts, and each document is assigned to shard
  * `floor(exclusive_running_total / tokensPerShard)` — consecutive
  * documents fill a shard up to ~the budget, a document never splits,
  * and the assignment is reproducible run-to-run (the property a
  * resumable training-data build needs).
  *
  * The global running sum is computed WITHOUT a global-order window
  * (which executes on a single partition — the 100 TB failure mode).
  * Instead, a caller-supplied monotone `blockExpr` (e.g. `id div 1e6`,
  * an ingest date) coarsens the order into blocks:
  *   1. exclusive cumsum WITHIN each block — a partitioned window,
  *      fully parallel;
  *   2. per-block totals -> exclusive block offsets — a window over the
  *      block AGGREGATES only (bounded, metadata-scale rows);
  *   3. broadcast-join offsets back; shard = (offset + local) div budget.
  * Deterministic given unique `orderCol` values and a `blockExpr`
  * monotone in `orderCol`.
  */
object Packing {

  /** `partitionCols` scopes the running total: each partition (e.g. a
    * train/val/test split) packs its own shard sequence from 0 — the
    * cumsum, block offsets, and join keys all gain the partition
    * columns, so the shape (partitioned windows + bounded offset
    * frame) is unchanged. */
  def packByBudget(df: DataFrame, orderCol: String, tokensCol: String,
      tokensPerShard: Long, blockExpr: Column,
      partitionCols: Seq[String] = Nil): DataFrame = {
    require(tokensPerShard > 0, "tokensPerShard must be positive")
    val pCols = partitionCols.map(col)
    val withBlock = df.withColumn("__block", blockExpr)
    val wLocal = Window.partitionBy(pCols :+ col("__block"): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = withBlock.withColumn("__local",
      coalesce(sum(col(tokensCol)).over(wLocal), lit(0L)))
    // block aggregates: one row per (partition, block) — the only
    // order-by-block window runs over THIS frame, never the data
    val wBlocks = Window.partitionBy(pCols: _*).orderBy(col("__block"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withBlock.groupBy(pCols :+ col("__block"): _*)
      .agg(sum(col(tokensCol)).as("__btot"))
      .withColumn("__off", coalesce(sum(col("__btot")).over(wBlocks), lit(0L)))
      .select(pCols :+ col("__block") :+ col("__off"): _*)
    local.join(broadcast(offsets), partitionCols :+ "__block")
      .withColumn("shard",
        expr(s"(__off + __local) div $tokensPerShard"))
      .drop("__block", "__local", "__off")
  }

  /** Reference formulation: one global-order window (single partition —
    * correct, not scalable; spec cross-validates [[packByBudget]]
    * against it). */
  def packByBudgetGlobal(df: DataFrame, orderCol: String, tokensCol: String,
      tokensPerShard: Long): DataFrame = {
    require(tokensPerShard > 0, "tokensPerShard must be positive")
    val w = Window.orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__off", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("shard", expr(s"__off div $tokensPerShard"))
      .drop("__off")
  }
}
