package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed time-series smoothing features.
  *
  * Scale shape: one shuffle on the series key, then per-key ordered
  * window work; per-row cost is O(window), state is O(window) —
  * nothing global, nothing quadratic.
  */
object TimeSeries {

  /** Normalized exponentially-weighted moving average over the last
    * `window` observations of each key's series:
    *
    *   ewma_t = Σ_{k<min(window,t+1)} (1−α)^k · x_{t−k}
    *          / Σ_{k<min(window,t+1)} (1−α)^k
    *
    * — the adjusted (weighted-mean) EWMA form, truncated to a bounded
    * frame so weights never underflow and window state stays O(window).
    * The recursive form is a strictly sequential scan per key; this
    * windowed form is the distributed-friendly equivalent (the dropped
    * tail carries relative weight (1−α)^window — at the defaults,
    * 0.7²⁰ ≈ 8·10⁻⁴).
    *
    * The fold over the collected frame runs per row on ≤ `window`
    * elements; `orderCols` must be a deterministic total order within
    * each key (pass a tie-break column).
    * Output: input columns + `ewma`. */
  def ewma(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, alpha: Double, window: Int): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    require(window > 0, "window must be positive")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(window - 1), Window.currentRow)
    val decay = lit(1.0 - alpha)
    // frame is oldest→newest; element i of n carries weight (1−α)^(n−1−i).
    // The frame lands in its own projection first so the window
    // expression evaluates once, not once per reference in the fold.
    val folded = aggregate(
      col("__frame"),
      struct(lit(0).as("i"), lit(0.0).as("num"), lit(0.0).as("den")),
      (acc: Column, x: Column) => {
        val wt = pow(decay, size(col("__frame")) - 1 - acc.getField("i"))
        struct((acc.getField("i") + 1).as("i"),
          (acc.getField("num") + x * wt).as("num"),
          (acc.getField("den") + wt).as("den"))
      },
      acc => acc.getField("num") / acc.getField("den"))
    df.withColumn("__frame", collect_list(col(valueCol)).over(w))
      .withColumn("ewma", folded)
      .drop("__frame")
  }

  /** Exponentially time-decayed sum per key (recency-weighted feature
    * aggregation — the feature-store standard for "how active was
    * this user, recently"): each row contributes
    * `value · 0.5^((t_ref − t) / halfLifeSeconds)`. The reference
    * instant defaults to the frame's own max timestamp (one bounded
    * aggregate attached by broadcast), so the result is deterministic
    * and engine-portable — never wall-clock. Timestamps enter as
    * fractional epoch seconds (micros-exact doubles in both Spark and
    * DuckDB). ONE narrow weighting projection + one hash aggregation;
    * the decayed sum rounds to 6 digits.
    * Output: (key, n, decayed). */
  /** The per-row decay factor of [[decayedSum]] (registered as
    * `half_life_weight` for SQL use): `0.5^((tRef − t)/halfLife)`.
    * Pure arithmetic, so a SQL `SUM(value * half_life_weight(...))`
    * grouped by key IS the decayed sum — the whole operator stays
    * expressible from a SQL string. */
  def halfLifeWeight(t: Column, tRef: Column,
      halfLifeSeconds: Double): Column = {
    require(halfLifeSeconds > 0, "halfLifeSeconds must be positive")
    pow(lit(0.5), (tRef.cast("double") - t.cast("double")) / halfLifeSeconds)
  }

  def decayedSum(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, halfLifeSeconds: Double): DataFrame = {
    require(halfLifeSeconds > 0, "halfLifeSeconds must be positive")
    // TIMESTAMP_NTZ has no direct double cast — route it through the
    // session-zoned TimestampType first (UTC-pinned sessions make this
    // the naive-as-UTC reading the oracle uses). Everything else casts
    // to fractional epoch seconds directly.
    val tsd = df.schema.find(_.name == tsCol).map(_.dataType) match {
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        col(tsCol).cast(org.apache.spark.sql.types.TimestampType).cast("double")
      case _ => col(tsCol).cast("double")
    }
    val ref = df.agg(max(tsd).as("__tref"))
    df.crossJoin(broadcast(ref))
      .withColumn("__w", pow(lit(0.5),
        (col("__tref") - tsd) / halfLifeSeconds))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        round(sum(col(valueCol) * col("__w")), 6).as("decayed"))
  }

  /** OHLC resampling bars: collapse each key's series into
    * `barSeconds`-wide epoch-aligned buckets with open (first value by
    * time), high, low, close (last), count, and mean. ONE hash
    * aggregation — min_by/max_by carry the endpoint values without
    * any per-bar sort or window. `tsCol` must be unique within a key
    * (first/last are otherwise tie-ambiguous). The bar key is emitted
    * as epoch seconds (timezone-free, engine-portable). */
  def ohlcBars(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, barSeconds: Long): DataFrame = {
    require(barSeconds > 0, "barSeconds must be positive")
    val bar = (unix_timestamp(col(tsCol)).divide(barSeconds)).cast("long")
    df.withColumn("__bar", (bar * barSeconds).cast("long"))
      .groupBy(col(keyCol), col("__bar").as("bar_start"))
      .agg(min_by(col(valueCol), col(tsCol)).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), col(tsCol)).as("close"),
        count(lit(1)).as("n"),
        round(avg(col(valueCol)), 6).as("mean"))
  }

  /** Rolling DISTINCT count and rolling MEDIAN over the trailing
    * `window` rows of each key's series — two window aggregates Spark
    * has no native window form for (no DISTINCT inside windows, no
    * percentile window function), re-expressed as narrow array
    * expressions over one collected frame: distinct count =
    * size∘array_distinct, median = sorted-array midpoint (average of
    * the two middles on even frames — quantile_cont(0.5) semantics).
    * One shuffle, O(window log window) per row, a single window
    * operator evaluates the frame once for both outputs. */
  def rollingDistinctMedian(df: DataFrame, keyCol: String,
      orderCols: Seq[String], typeCol: String, valueCol: String,
      window: Int): DataFrame = {
    require(window > 0, "window must be positive")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(window - 1), Window.currentRow)
    val sorted = array_sort(col("__vals"))
    val n = size(sorted)
    val mid = (element_at(sorted, ((n + 1) / 2).cast("int"))
      + element_at(sorted, (n / 2 + 1).cast("int"))) / 2.0
    df.withColumn("__types", collect_list(col(typeCol)).over(w))
      .withColumn("__vals", collect_list(col(valueCol)).over(w))
      .withColumn("n_distinct",
        size(array_distinct(col("__types"))).cast("long"))
      .withColumn("rolling_median", round(mid, 6))
      .drop("__types", "__vals")
  }

  /** Rolling z-score anomaly flags over the trailing `window`
    * observations of each key's series: z = (x − mean)/stddev over
    * the frame (sample stddev), rounded to 4 digits for cross-engine
    * stability; `is_anomaly` iff |z| > `z` and the frame has spread.
    * Early rows score against their short prefix frame — the
    * cold-start convention that flags nothing on the first row
    * (stddev of one sample is null). Same shape as [[ewma]]: one
    * key shuffle, O(window) state. */
  /** One-sided CUSUM change detection (Page 1954) per series: the
    * recursion s_t = max(0, s_{t−1} + (x_t − k)) rewritten as the
    * WINDOW-EXPRESSIBLE identity s_t = S_t − min_{j≤t} S_j with
    * S = running Σ(x − k) — a cumulative sum and a running min, both
    * partitioned per series (the recursion itself has no
    * fixed-frame window form; the drawup identity is what makes CUSUM
    * a two-window batch operator instead of a sequential scan).
    * Alarm when s_t > h. Output per series: n, max_cusum, n_alarms,
    * first_alarm (min order value where s > h, null if never).
    * `k` (allowed drift) and `h` (threshold) are caller columns —
    * typically global mean + multiples of σ broadcast back. */
  def cusum(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, k: org.apache.spark.sql.Column,
      h: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = df.where(col(valueCol).isNotNull)
      .withColumn("__S", sum(col(valueCol) - k).over(w))
    // the running min must include the EMPTY prefix S_0 = 0 (the
    // recursion starts at s_0 = 0), hence the least(..., 0)
    val s = col("__S") - least(min(col("__S")).over(w), lit(0.0))
    base
      .withColumn("__s", s)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        round(max(col("__s")), 6).as("max_cusum"),
        sum(when(col("__s") > h, 1L).otherwise(0L)).as("n_alarms"),
        min(when(col("__s") > h, struct(orderCols.map(col): _*)))
          .as("first_alarm"))
  }

  def rollingZ(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, window: Int, z: Double = 3.0): DataFrame = {
    require(window > 1, "window must exceed 1")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(window - 1), Window.currentRow)
    val mean = avg(col(valueCol)).over(w)
    val sd = stddev_samp(col(valueCol)).over(w)
    df.withColumn("__m", mean).withColumn("__s", sd)
      .withColumn("zscore",
        when(col("__s") > 0,
          round((col(valueCol) - col("__m")) / col("__s"), 4)))
      .withColumn("is_anomaly",
        coalesce(abs(col("zscore")) > z, lit(false)))
      .drop("__m", "__s")
  }

  /** Sample autocorrelation of the per-group DAILY count series at
    * lags 1..`maxLag` — the seasonality/persistence diagnostic
    * (weekly traffic shows a spike at lag 7; a memoryless series sits
    * near 0 everywhere): r_k = Σ(x_t−μ)(x_{t+k}−μ) / Σ(x_t−μ)², with
    * μ and the denominator over the group's full series (the
    * standard biased ACF). Missing days pair with nothing, exactly
    * like the calendar self-join they stand for.
    *
    * Scale shape: one (group, day) aggregation reduces the stream to
    * the bounded daily frame; lags come from exploding a LITERAL
    * 1..maxLag array (no join); the lagged pairing is an equi-join of
    * the daily frame with itself on (group, day+lag). Output per
    * (group, lag): (n_pairs, acf), rounded at 6. */
  def dailyAutocorr(events: DataFrame, groupCol: String, tsCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be positive, got $maxLag")
    val daily = events
      .groupBy(col(groupCol).as("g"), to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).cast("double").as("x"))
    val mu = daily.groupBy(col("g")).agg(avg(col("x")).as("__mu"))
    val stats = daily.join(broadcast(mu), "g")
      .groupBy(col("g"))
      .agg(max(col("__mu")).as("__mu"),
        sum((col("x") - col("__mu")) * (col("x") - col("__mu")))
          .as("__ss"))
    val probes = daily
      .select(col("g"), col("d"), col("x").as("__xa"),
        explode(lit((1 to maxLag).toArray)).as("lag"))
      .withColumn("d2", date_add(col("d"), col("lag")))
    val pairs = probes.join(
      daily.select(col("g"), col("d").as("d2"), col("x").as("__xb")),
      Seq("g", "d2"))
    pairs.join(broadcast(stats), "g")
      .groupBy(col("g").as(groupCol), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        // a constant series has zero variance: ACF undefined -> NULL
        round(when(max(col("__ss")) > 0,
          sum((col("__xa") - col("__mu")) * (col("__xb") - col("__mu")))
            / max(col("__ss"))), 6).as("acf"))
  }

  /** Seasonality-adjusted anomaly score of the per-group DAILY count
    * series: divide out the day-of-week multiplicative index
    * (dow mean / overall mean), then z-score the adjusted series —
    * "is this Monday odd FOR A MONDAY", the screen a raw z-score
    * fails on weekly-patterned traffic.
    *
    * Cross-engine stability: the per-day adjusted value is quantized
    * to integer MICRO-UNITS (`round(a·1e6)` as long) BEFORE any
    * aggregation, so the mean comes from an exact long sum and the
    * sum of squares from an exact decimal(38,0) sum — both
    * order-independent, unlike a float sum whose low bits depend on
    * reduction order (the q237 hash-miss of round 10; same fix as
    * [[Cluster.silhouette]]'s integer micro-unit means). The inputs
    * to the quantization are themselves bit-deterministic: daily
    * counts are integers (exact as doubles), so every AVG upstream
    * is an exact-integer sum over a count. Every frame after the
    * daily reduction is bounded (days × groups, groups × 7). Output
    * per day: (group, d, n, z, anomaly = |z| > zCut); z rounded at
    * 6, NULL when the adjusted series is constant. */
  def seasonalZ(events: DataFrame, groupCol: String, tsCol: String,
      zCut: Double = 2.0): DataFrame = {
    val daily = events
      .groupBy(col(groupCol).as("g"), to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).cast("double").as("x"))
    val dowOf = weekday(col("d")) // 0 = Monday, matching isodow - 1
    val dowAvg = daily.groupBy(col("g"), dowOf.as("dow"))
      .agg(avg(col("x")).as("__dow_avg"))
    val allAvg = daily.groupBy(col("g")).agg(avg(col("x")).as("__all_avg"))
    val adj = daily
      .join(broadcast(dowAvg),
        daily("g") === dowAvg("g") && dowOf === dowAvg("dow"))
      .drop(dowAvg("g")).drop("dow")
      .join(broadcast(allAvg), "g")
      .withColumn("__am",
        round(col("x") / (col("__dow_avg") / col("__all_avg")) * 1e6)
          .cast("long"))
    // exact integer moments: sum fits long, sum of squares decimal(38,0)
    val stats = adj.groupBy(col("g"))
      .agg(sum(col("__am")).as("__s"),
        sum(col("__am").cast("decimal(19,0)")
          * col("__am").cast("decimal(19,0)")).as("__ss"),
        count(lit(1)).as("__n"))
      .withColumn("__mu", col("__s").cast("double") / col("__n"))
      .withColumn("__sd", sqrt(greatest(
        (col("__ss").cast("double")
          - col("__s").cast("double") * col("__s").cast("double")
            / col("__n")) / (col("__n") - 1), lit(0.0))))
    adj.join(broadcast(stats.select("g", "__mu", "__sd", "__n")), "g")
      .select(col("g").as(groupCol), col("d"),
        col("x").cast("long").as("n"),
        round(when(col("__sd") > 0,
          (col("__am") - col("__mu")) / col("__sd")), 6).as("z"),
        coalesce(abs((col("__am") - col("__mu")) / col("__sd")) > zCut,
          lit(false)).as("anomaly"))
  }

  /** Classical additive seasonal decomposition of the per-group
    * DAILY count series: x = trend + seasonal + residual, with
    * trend the CENTERED 7-observation moving average (defined only
    * where the full window exists), the day-of-week seasonal index
    * the mean of the detrended series per (group, dow), and the
    * residual what remains — the explainable/unexplained split
    * behind [[seasonalZ]]'s anomaly screen. Detrended values are
    * quantized to integer micro-units before the seasonal mean (the
    * [[seasonalZ]] stabilization), so every emitted float is
    * bit-stable cross-engine. Windows are group-partitioned; the
    * seasonal frame is bounded (groups × 7). Output per day with a
    * defined trend: (group, d, n, trend, seasonal, residual),
    * rounded at 6. */
  def decompose(events: DataFrame, groupCol: String,
      tsCol: String): DataFrame = {
    val daily = events
      .groupBy(col(groupCol).as("g"), to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).cast("double").as("x"))
    val w7 = Window.partitionBy(col("g")).orderBy(col("d"))
      .rowsBetween(-3, 3)
    val trended = daily
      .withColumn("__trend",
        when(count(lit(1)).over(w7) === 7, sum(col("x")).over(w7) / 7.0))
      .where(col("__trend").isNotNull)
      .withColumn("__dm",
        round((col("x") - col("__trend")) * 1e6).cast("long"))
    // half-up integer micro-unit mean (the Cluster.silhouette
    // pattern): a plain float mean can land exactly on a …5 at the
    // 6th digit, where Spark's decimal-string HALF_UP and DuckDB's
    // binary-value round disagree by one ulp of output
    val seasonal = trended.groupBy(col("g"), weekday(col("d")).as("__dow"))
      .agg(sum(col("__dm")).as("__sm"), count(lit(1)).as("__n"))
      .select(col("g"), col("__dow"),
        (signum(col("__sm"))
          * floor((lit(10L) * abs(col("__sm")) + lit(5L) * col("__n"))
            / (lit(10L) * col("__n"))) / lit(1e6)).as("__seasonal"))
    trended
      .join(broadcast(seasonal),
        trended("g") === seasonal("g") && weekday(col("d")) === col("__dow"))
      .drop(seasonal("g")).drop("__dow")
      .select(col("g").as(groupCol), col("d"),
        col("x").cast("long").as("n"),
        round(col("__trend"), 6).as("trend"),
        round(col("__seasonal"), 6).as("seasonal"),
        round(col("x") - col("__trend") - col("__seasonal"), 6)
          .as("residual"))
  }

  /** Holt's linear-trend (double) exponential smoothing of the
    * per-group DAILY count series — [[ewma]]'s trend-aware sibling
    * (Holt 1957): level l_t = α·x_t + (1−α)(l_{t−1}+b_{t−1}), trend
    * b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}, initialized l₁ = x₁,
    * b₁ = x₂−x₁. The recursion is a SEQUENTIAL fold over each
    * group's (bounded, days-sized) series via the `aggregate`
    * higher-order function — strictly ordered arithmetic, so the
    * result is bit-identical across engines folding the same list
    * (no float-order hazard to stabilize). Gaps are ignored (the
    * fold runs over observed days in date order). Output per group:
    * t (series length), level, trend, forecast (l + horizon·b),
    * rounded at 6; groups with fewer than 2 days are dropped (no
    * trend is estimable). */
  def holt(events: DataFrame, groupCol: String, tsCol: String,
      alpha: Double = 0.5, beta: Double = 0.3,
      horizon: Int = 7): DataFrame = {
    val daily = events
      .groupBy(col(groupCol).as("g"), to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).cast("double").as("x"))
    val series = daily.groupBy(col("g"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("x")))),
        s => s.getField("x")).as("xs"))
      .where(size(col("xs")) >= 2)
    val x1 = element_at(col("xs"), 1)
    val x2 = element_at(col("xs"), 2)
    val lNext = (acc: Column, xv: Column) =>
      lit(alpha) * xv + lit(1 - alpha) *
        (acc.getField("l") + acc.getField("b"))
    val folded = aggregate(
      slice(col("xs"), lit(2), size(col("xs")) - 1),
      struct(x1.as("l"), (x2 - x1).as("b")),
      (acc, xv) => struct(lNext(acc, xv).as("l"),
        (lit(beta) * (lNext(acc, xv) - acc.getField("l"))
          + lit(1 - beta) * acc.getField("b")).as("b")))
    series
      .withColumn("__hb", folded)
      .select(col("g").as(groupCol), size(col("xs")).as("t"),
        round(col("__hb.l"), 6).as("level"),
        round(col("__hb.b"), 6).as("trend"),
        round(col("__hb.l") + lit(horizon) * col("__hb.b"), 6)
          .as("forecast"))
  }
}
