package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) joins without a nested-loop plan.
  *
  * Spark executes a bare inequality join as BroadcastNestedLoop (or a
  * cartesian product) — quadratic work and the classic scale trap for
  * "events inside windows" queries. The standard fix, implemented here:
  * quantize the range dimension into fixed-width buckets, explode each
  * interval onto the buckets it covers, and turn the range predicate
  * into an EQUI-join on (keys..., bucket) + a residual exact filter.
  * Work becomes linear in (rows x bucket occupancy): a shuffle-on-key
  * hash join, partial-aggregable, AQE-skew-splittable — the same plan
  * family as every other operator in this engine.
  *
  * `bucketWidth` is the cost dial: each interval lands in
  * (length / width + 1) buckets, each point in exactly one. Pick width
  * ≈ the median interval length so the explosion factor stays ~2.
  *
  * Range columns are numeric (LONG). For event-time use epoch micros
  * (`unix_micros(ts)`) — see [[EventWindows]] for the timestamp side.
  */
object RangeJoin {

  /** Floor division that is correct for negative values too (SQL `div`
    * truncates toward zero; bucket ids must floor toward -inf or
    * negative coordinates straddle bucket 0). */
  private def floorDiv(x: Column, w: Long): Column =
    ((x - ((x % w + w) % w)) / w).cast("long")

  /** The bucket a point falls in — the SQL-surface building block of
    * [[pointInInterval]] (registered as `range_bucket`): equi-join
    * `range_bucket(point, w)` against the exploded
    * [[coveringBuckets]] of the interval side, then re-check the
    * exact predicate. */
  def bucketOf(x: Column, bucketWidth: Long): Column = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    floorDiv(x, bucketWidth)
  }

  /** Every bucket an interval `[lo, hi]` covers (registered as
    * `range_buckets` for SQL use with `explode`). */
  def coveringBuckets(lo: Column, hi: Column, bucketWidth: Long): Column = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    sequence(floorDiv(lo, bucketWidth), floorDiv(hi, bucketWidth))
  }

  /** All (point, interval) matches with `start <= point <= end` and
    * equal `keys`: each point maps to ONE bucket, each interval
    * explodes onto its covering buckets, so every true match meets in
    * exactly one bucket — no post-join dedup needed.
    *
    * Column names of `points` and `intervals` (beyond `keys`) must be
    * disjoint. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val iv = intervals.withColumn("__b",
      explode(sequence(floorDiv(col(startCol), bucketWidth),
        floorDiv(col(endCol), bucketWidth))))
    val pt = points.withColumn("__b", floorDiv(col(pointCol), bucketWidth))
    pt.join(iv, keys :+ "__b")
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__b")
  }

  /** All overlapping interval pairs (`ls <= re && rs <= le`, equal
    * `keys`). Overlapping pairs share several buckets; instead of a
    * dedup pass, each pair is emitted only from the bucket of the LATER
    * start (`max(floor(ls/w), floor(rs/w))`) — which both sides cover
    * iff they overlap — so every true pair appears exactly once and no
    * distinct() shuffle is needed. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def buckets(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__b",
        explode(sequence(floorDiv(col(s), bucketWidth),
          floorDiv(col(e), bucketWidth))))
    buckets(left, leftStart, leftEnd)
      .join(buckets(right, rightStart, rightEnd), keys :+ "__b")
      .where(col(leftStart) <= col(rightEnd)
        && col(rightStart) <= col(leftEnd)
        && col("__b") === greatest(floorDiv(col(leftStart), bucketWidth),
          floorDiv(col(rightStart), bucketWidth)))
      .drop("__b")
  }
}
