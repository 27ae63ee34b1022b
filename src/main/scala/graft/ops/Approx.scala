package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates for 100 TB interactive profiling — the
  * sketch-based forms of the exact aggregates used elsewhere. No DuckDB
  * oracle entries (sketch implementations are engine-specific); specs
  * bound the error against the exact answers instead.
  *
  * - distinct counts: HyperLogLog++ (`approx_count_distinct`), mergeable
  *   across partitions, fixed memory per group.
  * - quantiles: Greenwald-Khanna (`percentile_approx`), tunable
  *   accuracy/memory via the relative-error parameter.
  */
object Approx {

  /** HLL++ distinct count with the given relative standard deviation. */
  def distinctCount(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** GK-sketch quantile; `accuracy` ~ 1/relative-error (Spark default
    * 10000 = ~0.01%). */
  def quantile(c: Column, p: Double, accuracy: Int = 10000): Column =
    percentile_approx(c, lit(p), lit(accuracy))

  /** Per-group cardinality + quantile profile of a column — the shape
    * of a data-profiling pass over a huge fact table. */
  def profile(df: DataFrame, keys: Seq[String], value: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        distinctCount(col(value), rsd).as("approx_distinct"),
        quantile(col(value), 0.5).as("approx_p50"),
        quantile(col(value), 0.99).as("approx_p99"))
}
