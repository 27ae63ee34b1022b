package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantile threshold binning — the corpus-profiling step that buckets
  * documents by a metric (length, quality score, perplexity) into
  * k population quantile bands for per-band inspection or per-band
  * sampling budgets.
  *
  * NOT ntile: a global ntile is a single-partition sort window — the
  * 100 TB failure mode. Instead the k−1 exact interpolated quantile
  * cut points reduce out of one aggregation (a k−1-element array), the
  * 1-row cut table attaches by broadcast, and bin assignment is a
  * narrow comparison (`bin` = number of cut points strictly below the
  * value, so ties land in the lower band deterministically). At
  * unbounded scale the drop-in is [[Approx]]'s GK sketch for the cut
  * points; the assignment side is unchanged.
  */
object Binning {

  /** Attach `bin` ∈ [0, k) by exact interpolated quantile thresholds
    * of `valueCol` (cut points rounded to 6 digits so the comparison
    * is engine-stable). */
  def quantileBins(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val ps = (1 until k).map(_.toDouble / k)
    val cuts = df.agg(transform(
      percentile(col(valueCol), array(ps.map(lit): _*)),
      c => round(c, 6)).as("__cuts"))
    df.join(broadcast(cuts), lit(true))
      .withColumn("bin",
        aggregate(col("__cuts"), lit(0L),
          (acc, c) => acc + when(col(valueCol) > c, 1L).otherwise(0L)))
      .drop("__cuts")
  }
}
