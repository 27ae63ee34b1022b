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

  /** Mergeable Misra-Gries heavy-hitters sketch (bounded memory: at
    * most `k` counters per partition buffer). Guarantees: every item
    * with true frequency > n/(k+1) survives; reported counts
    * undercount by at most n/(k+1). The single-pass hot-token /
    * hot-key detector for 100 TB streams — where an exact groupBy
    * would shuffle the full key universe. */
  class FrequentItems(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Map[String, Long], Map[String, Long]] {
    require(k > 0, "need at least one counter")

    override def zero: Map[String, Long] = Map.empty

    private def addOne(b: Map[String, Long], a: String): Map[String, Long] =
      if (b.contains(a)) b.updated(a, b(a) + 1)
      else if (b.size < k) b.updated(a, 1L)
      else b.view.mapValues(_ - 1).filter(_._2 > 0).toMap

    override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      addOne(b, a)

    override def merge(b1: Map[String, Long],
        b2: Map[String, Long]): Map[String, Long] = {
      val summed = b2.foldLeft(b1) { case (acc, (key, c)) =>
        acc.updated(key, acc.getOrElse(key, 0L) + c)
      }
      if (summed.size <= k) summed
      else {
        // subtract the (k+1)-th largest count from all, drop <= 0 —
        // the standard MG merge that preserves the error bound
        val cut = summed.values.toSeq.sorted(Ordering.Long.reverse)(k)
        summed.view.mapValues(_ - cut).filter(_._2 > 0).toMap
      }
    }

    override def finish(b: Map[String, Long]): Map[String, Long] = b

    override def bufferEncoder =
      org.apache.spark.sql.Encoders.kryo[Map[String, Long]]
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Heavy-hitter tokens of a text column: explode -> MG sketch,
    * one pass, bounded state. */
  def frequentTokens(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val fi = udaf(new FrequentItems(k), org.apache.spark.sql.Encoders.STRING)
    df.select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("tok"))
      .agg(fi(col("tok")).as("heavy_hitters"))
  }
}
