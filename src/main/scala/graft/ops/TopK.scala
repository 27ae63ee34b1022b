package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top-k rows per group WITHOUT sorting whole groups.
  *
  * The window formulation (`row_number().over(partitionBy(...).orderBy
  * (...)) <= k`) shuffles every row and SORTS every group — O(n log n)
  * per group and full materialization, wasteful when k << group size
  * (the usual case at 100 TB: "top 10 per user" over billions of
  * rows). The aggregator here keeps a bounded k-element buffer per
  * group, merged map-side first (partial aggregation), so the shuffle
  * carries at most k entries per group per map partition and nothing
  * is globally sorted. O(n log k) work, O(k) state.
  *
  * Shape: (score DOUBLE, id LONG) per row — the common "top-k entities
  * by score" form. Ties break toward the smaller id (deterministic).
  */
object TopK {

  /** Sorted (desc by score, asc by id), length <= k. */
  private def insert(buf: List[(Double, Long)], v: (Double, Long),
      k: Int): List[(Double, Long)] = {
    val merged = (v :: buf).sortBy { case (s, id) => (-s, id) }
    if (merged.length > k) merged.take(k) else merged
  }

  class TopKByScore(k: Int)
      extends Aggregator[(Double, Long), List[(Double, Long)],
        Seq[(Double, Long)]] {
    require(k > 0, "k must be positive")
    override def zero: List[(Double, Long)] = Nil
    override def reduce(b: List[(Double, Long)],
        a: (Double, Long)): List[(Double, Long)] = insert(b, a, k)
    override def merge(b1: List[(Double, Long)],
        b2: List[(Double, Long)]): List[(Double, Long)] = {
      val merged = (b1 ++ b2).sortBy { case (s, id) => (-s, id) }
      if (merged.length > k) merged.take(k) else merged
    }
    override def finish(b: List[(Double, Long)]): Seq[(Double, Long)] = b
    override def bufferEncoder = Encoders.kryo[List[(Double, Long)]]
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** The bounded-heap aggregation as a raw Column — an array of
    * (score, id) structs (fields `_1`, `_2`) sorted desc-score /
    * asc-id, length ≤ k. Composable into a WIDER aggregate so a
    * caller needing counts + top-k per group pays ONE aggregation,
    * not an agg + agg + join. */
  def topKAgg(scoreCol: org.apache.spark.sql.Column,
      idCol: org.apache.spark.sql.Column,
      k: Int): org.apache.spark.sql.Column =
    udaf(new TopKByScore(k), Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaLong))(
      scoreCol.cast("double"), idCol.cast("long"))

  /** Top-k (id, score) per group, ranked 1..k descending by score.
    * Output: groupCols..., id, score, rank. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      scoreCol: String, idCol: String, k: Int): DataFrame = {
    df.groupBy(groupCols.map(col): _*)
      .agg(topKAgg(col(scoreCol), col(idCol), k).as("__top"))
      .select(groupCols.map(col) :+ posexplode(col("__top")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("col._2").as(idCol),
        col("col._1").as(scoreCol),
        (col("pos") + 1).cast("long").as("rank")): _*)
  }

  /** GLOBAL top-k keys by count — exact heavy hitters without a
    * global sort of the count frame. The naive `groupBy(key).count.
    * orderBy(desc).limit(k)` is correct but its final stage sorts
    * the whole key-cardinality frame through one ordering; at
    * vocabulary/URL cardinalities (10⁸–10⁹ keys) that ordering is
    * the bottleneck. Here every key hashes to one of `nBuckets`
    * buckets, so per-bucket counts are COMPLETE counts; the global
    * top-k is necessarily a subset of the union of per-bucket
    * top-k's (each a small partitioned window), and only that
    * (nBuckets·k)-row candidate frame is globally ordered — a
    * driver-scale sort. Output: key, n, rank (1..k, count desc,
    * key asc). */
  def globalTopK(df: DataFrame, keyCol: String, k: Int,
      nBuckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("__b", pmod(xxhash64(col(keyCol)), lit(nBuckets.toLong)))
    val wB = Window.partitionBy(col("__b"))
      .orderBy(col("n").desc, col(keyCol))
    val candidates = counts
      .withColumn("__r", row_number().over(wB))
      .where(col("__r") <= k)
    candidates
      .orderBy(col("n").desc, col(keyCol))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col(keyCol))))
      .select(col(keyCol), col("n"), col("rank").cast("long").as("rank"))
  }
}
