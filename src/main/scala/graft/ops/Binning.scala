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

  /** Exact global percentile rank (cume_dist: fraction of rows with
    * value ≤ this row's) WITHOUT a global per-row window — the
    * single-partition sort that `cume_dist() OVER (ORDER BY v)`
    * plans is the 100 TB failure mode. Instead: one hash aggregation
    * to per-VALUE counts, a cumulative window over that reduced
    * distinct-value frame (bounded when the value domain is — lengths,
    * scores, grades; for unbounded continuous domains use
    * [[quantileBins]]/[[Approx]]), and a broadcast join back. The data
    * is scanned once and never globally sorted. Output: input +
    * `cume_dist` (exact long-ratio, rounded to 9). */
  def percentileRanks(df: DataFrame, valueCol: String): DataFrame =
    percentileRanks(df, valueCol, None)

  /** [[percentileRanks]] with an optional quantize-first reduction:
    * when `nBuckets` is set, rows first map to <= nBuckets equi-width
    * bands (one min/max aggregation broadcast back — the
    * [[histogram]] pattern), the cumulative window runs over that
    * BOUNDED band frame, and ranks join back by band id — the
    * unbounded-continuous-domain path where the distinct-value frame
    * would itself be data-sized. Rank granularity is one band
    * (every row in a band gets the band's cumulative fraction);
    * discrete data with distinct values in distinct bands reproduces
    * the exact statistic. */
  def percentileRanks(df: DataFrame, valueCol: String,
      nBuckets: Option[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    nBuckets match {
      case None =>
        val counts = df.groupBy(col(valueCol)).agg(count(lit(1)).as("__c"))
        val cum = counts
          .withColumn("__cum", sum(col("__c")).over(
            Window.orderBy(col(valueCol))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("__n",
            sum(col("__c")).over(Window.partitionBy(lit(1))))
          .select(col(valueCol),
            round(col("__cum") / col("__n"), 9).as("cume_dist"))
        df.join(broadcast(cum), valueCol)
      case Some(k) =>
        require(k >= 2, "nBuckets must be at least 2")
        val vd = col(valueCol).cast("double")
        val stats = df.agg(min(vd).as("__lo"), max(vd).as("__hi"))
        val width = (col("__hi") - col("__lo")) / k
        val banded = df.join(broadcast(stats), lit(true))
          .withColumn("__b", when(col("__hi") === col("__lo"), 0L)
            .otherwise(least(floor((vd - col("__lo")) / width),
              lit(k - 1L)).cast("long")))
          .drop("__lo", "__hi")
        val counts = banded.groupBy(col("__b")).agg(count(lit(1)).as("__c"))
        val cum = counts
          .withColumn("__cum", sum(col("__c")).over(
            Window.orderBy(col("__b"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("__n",
            sum(col("__c")).over(Window.partitionBy(lit(1))))
          .select(col("__b"),
            round(col("__cum") / col("__n"), 9).as("cume_dist"))
        banded.join(broadcast(cum), "__b").drop("__b")
    }
  }

  /** Per-group winsorization (robust-stats clipping): values below
    * the group's `lo` quantile clamp up to it, above `hi` clamp down —
    * the standard outlier guard before means/regressions (the
    * complement of [[Quality.robustOutliers]], which FLAGS; this
    * REPAIRS). Quantiles are exact interpolated (`percentile` ≡
    * quantile_cont), rounded to 6 digits so the clamp threshold is
    * engine-stable.
    *
    * Shape: ONE per-group quantile aggregation joined back on the
    * group key; the clamp itself is a narrow projection. The cuts join
    * carries NO broadcast hint — AQE broadcasts it when the group
    * count is small (the common case) and degrades to a shuffled hash
    * join when a high-cardinality group column would blow the driver,
    * so the operator is safe at any cardinality (for unbounded group
    * WIDTH swap the exact cuts for [[Approx]] GK sketches).
    * Output: input + `<valueCol>_w` (clamped). Row-preserving even for
    * NULL group keys (null-safe join), and NULL values stay NULL —
    * a missing measurement is not an outlier at the low cut. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(0 <= lo && lo < hi && hi <= 1, s"bad quantiles [$lo, $hi]")
    val cuts = df.groupBy(col(groupCol)).agg(
      round(percentile(col(valueCol), lit(lo)), 6).as("__lo"),
      round(percentile(col(valueCol), lit(hi)), 6).as("__hi"))
      .withColumnRenamed(groupCol, "__g")
    df.join(cuts, col(groupCol) <=> col("__g"))
      .withColumn(s"${valueCol}_w",
        when(col(valueCol).isNotNull,
          least(greatest(col(valueCol), col("__lo")), col("__hi"))))
      .drop("__g", "__lo", "__hi")
  }

  /** Equi-width histogram: (bin, lo, hi, n) over `nBins` bands of
    * [min, max] (the max lands in the last band). One min/max
    * aggregation broadcast as a 1-row scalar, then a narrow bin
    * projection + hash aggregation — two scans, no sort. Degenerate
    * min = max collapses to one band. */
  def histogram(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    val v = col(valueCol).cast("double")
    val stats = df.agg(min(v).as("__lo"), max(v).as("__hi"))
    val width = (col("__hi") - col("__lo")) / nBins
    val bin = when(col("__hi") === col("__lo"), 0L)
      .otherwise(least(floor((v - col("__lo")) / width), lit(nBins - 1L)))
    df.join(broadcast(stats), lit(true))
      .withColumn("bin", bin.cast("long"))
      .groupBy(col("bin"))
      .agg(round(min(col("__lo")) + min(width) * col("bin"), 6).as("lo"),
        round(min(col("__lo")) + min(width) * (col("bin") + 1), 6).as("hi"),
        count(lit(1)).as("n"))
  }

  /** Exact weighted median per group — the lower weighted median: the
    * smallest value whose cumulative weight reaches half the group's
    * total (robust location when rows carry unequal mass — revenue
    * weighted by quantity, latency weighted by calls). One cumulative
    * window partitioned by the group; deterministic under value ties
    * because the pick is the MIN qualifying value — intra-tie
    * cumulative order cannot change which value first crosses.
    * NULL values/weights excluded. Output: (group, n, w_median). */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clean = df.where(col(valueCol).isNotNull && col(weightCol).isNotNull)
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    clean
      .withColumn("__cum", sum(col(weightCol)).over(wCum))
      .withColumn("__tot", sum(col(weightCol)).over(wAll))
      .withColumn("__n", count(lit(1)).over(wAll))
      .where(col("__cum") * 2 >= col("__tot"))
      .groupBy(col(groupCol))
      .agg(max(col("__n")).as("n"), min(col(valueCol)).as("w_median"))
  }
}
