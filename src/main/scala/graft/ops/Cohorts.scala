package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — users grouped by the ISO week of their first
  * event, tracked by how many are active k weeks later.
  *
  * Scale shape: one aggregation on the user key for first-event times,
  * one distinct on (user, week), one key-shuffle join of the two
  * user-keyed frames, one final bounded aggregation
  * (weeks × offsets rows). Nothing quadratic, no global windows.
  */
object Cohorts {

  /** Output: (cohort_week DATE, week_offset, n_users) — distinct users
    * from each first-week cohort active `week_offset` weeks after
    * their cohort week (offset 0 = the cohort week itself, so
    * offset-0 rows count the full cohort). */
  /** Kaplan–Meier product-limit survival estimate (Kaplan & Meier
    * 1958) over per-subject (duration, censored) observations —
    * retention's principled upgrade: right-censored subjects (the
    * event hadn't happened by their observation edge) stay in the
    * risk set until their censoring time instead of counting as
    * events. At each distinct event duration t: n_risk = subjects
    * with duration ≥ t, d = events at t, S(t) = Π_{t'≤t} (1 − d/n) —
    * the product as exp(Σ ln) over the DISTINCT-duration frame
    * (bounded by the observation window, not subjects).
    *
    * Shape: one bounded duration-frame aggregation; suffix counts +
    * the product as windows over that frame. Output per event time:
    * (duration, n_risk, events, s), s rounded at 6. */
  def kaplanMeier(subjects: DataFrame, durationCol: String,
      censoredCol: String): DataFrame =
    kmCore(subjects, durationCol, censoredCol)
      .select(col("duration"), col("n_risk"), col("events"),
        round(col("__s"), 6).as("s"))

  /** [[kaplanMeier]] plus the Greenwood (1926) variance and the plain
    * 95% normal-approximation band: se = S·sqrt(Σ_{t'≤t} d/(n(n−d))),
    * lo/hi = S ∓ 1.96·se clamped to [0, 1]. An all-events time point
    * (d = n) has undefined Greenwood variance — its se/lo/hi are NULL
    * (S is exactly 0 there and needs no band). Same bounded
    * distinct-duration frame as the estimate itself. */
  def kaplanMeierCi(subjects: DataFrame, durationCol: String,
      censoredCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wPrefix = Window.orderBy(col("duration"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gw = sum(when(col("events") < col("n_risk"),
        col("events") / (col("n_risk") * (col("n_risk") - col("events"))))
      .otherwise(Double.NaN)).over(wPrefix)
    kmCore(subjects, durationCol, censoredCol)
      .withColumn("__se",
        when(!isnan(col("__s") * sqrt(gw)), col("__s") * sqrt(gw)))
      .select(col("duration"), col("n_risk"), col("events"),
        round(col("__s"), 6).as("s"),
        round(col("__se"), 6).as("se"),
        // greatest/least IGNORE nulls — guard explicitly so the d=n
        // point's undefined band stays NULL, not clamped to 0/1
        round(when(col("__se").isNotNull,
          greatest(col("__s") - lit(1.96) * col("__se"), lit(0.0))), 6)
          .as("lo"),
        round(when(col("__se").isNotNull,
          least(col("__s") + lit(1.96) * col("__se"), lit(1.0))), 6)
          .as("hi"))
  }

  /** Shared product-limit frame: one duration aggregation + the
    * suffix risk set and prefix product windows, `__s` UNROUNDED. */
  private def kmCore(subjects: DataFrame, durationCol: String,
      censoredCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val durations = subjects.groupBy(col(durationCol).as("duration"))
      .agg(count(lit(1)).as("__all"),
        sum(when(!col(censoredCol), 1L).otherwise(0L)).as("events"))
    val wSuffix = Window.orderBy(col("duration"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wPrefix = Window.orderBy(col("duration"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    durations
      .withColumn("n_risk", sum(col("__all")).over(wSuffix))
      // greatest(..., 1e-300): an all-events time point (d = n) sends
      // S to exactly 0; a bare ln(0) is NULL in Spark and an error in
      // other engines — the clamp makes S round to 0.000000 portably
      .withColumn("__s", exp(sum(
        log(greatest(lit(1.0) - col("events") / col("n_risk"),
          lit(1e-300)))).over(wPrefix)))
      .where(col("events") > 0)
  }

  /** Log-rank test (Mantel 1966) comparing two cohorts' survival —
    * "do variant A's users convert on a different clock than B's",
    * the hypothesis test [[kaplanMeier]]'s curves eyeball. At each
    * distinct event time: observed group-A events d_a vs expected
    * d·n_a/n under H₀, hypergeometric variance
    * d·(n_a/n)·(1−n_a/n)·(n−d)/(n−1); χ²(1) = (ΣO−ΣE)²/ΣV.
    *
    * Shape: one (duration, group) aggregation, suffix-sum risk sets
    * as windows over the bounded DISTINCT-duration frame, one final
    * fold. One row out: (o_a, e_a, v, chi2, significant) with the
    * sums rounded at 6 (χ² from the rounded sums, so the verdict is
    * bit-portable). Groups with n = 1 at a time point contribute
    * zero variance (the hypergeometric is degenerate there). */
  def logRank(subjects: DataFrame, durationCol: String,
      censoredCol: String, groupCol: String, groupA: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perDur = subjects
      .groupBy(col(durationCol).as("duration"))
      .agg(count(lit(1)).as("__all"),
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("__all_a"),
        sum(when(!col(censoredCol), 1L).otherwise(0L)).as("__d"),
        sum(when(!col(censoredCol) && col(groupCol) === groupA, 1L)
          .otherwise(0L)).as("__d_a"))
    val wSuffix = Window.orderBy(col("duration"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val risk = perDur
      .withColumn("__n", sum(col("__all")).over(wSuffix).cast("double"))
      .withColumn("__n_a", sum(col("__all_a")).over(wSuffix).cast("double"))
      .where(col("__d") > 0)
    risk.agg(
        round(sum(col("__d_a")).cast("double"), 6).as("o_a"),
        round(sum(col("__d") * col("__n_a") / col("__n")), 6).as("e_a"),
        round(sum(when(col("__n") > 1,
          col("__d") * (col("__n_a") / col("__n")) *
            (lit(1.0) - col("__n_a") / col("__n")) *
            (col("__n") - col("__d")) / (col("__n") - 1))
          .otherwise(0.0)), 6).as("v"))
      .withColumn("chi2", round(
        (col("o_a") - col("e_a")) * (col("o_a") - col("e_a")) / col("v"), 6))
      // 5% critical value of chi-squared with 1 dof
      .withColumn("significant", col("chi2") > 3.841459)
  }

  /** Per-subject time-to-first-event observations for [[kaplanMeier]]:
    * duration = days from the subject's first activity to its first
    * row satisfying `isEvent`; subjects never satisfying it are
    * right-CENSORED at their last activity. One per-subject
    * aggregation (one shuffle). Output: (subject, duration,
    * censored). */
  def timeToEvent(events: DataFrame, userCol: String, tsCol: String,
      isEvent: org.apache.spark.sql.Column): DataFrame =
    events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("__first"),
        max(to_date(col(tsCol))).as("__last"),
        min(when(isEvent, to_date(col(tsCol)))).as("__ev"))
      .select(col(userCol),
        datediff(coalesce(col("__ev"), col("__last")), col("__first"))
          .cast("long").as("duration"),
        col("__ev").isNull.as("censored"))

  def retention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val firsts = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).cast("date").as("cohort_week"))
    val active = events
      .select(col(userCol),
        date_trunc("week", col(tsCol)).cast("date").as("activity_week"))
      .distinct()
    active.join(firsts, userCol)
      .groupBy(col("cohort_week"),
        (datediff(col("activity_week"), col("cohort_week")) / 7)
          .cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Cohort LTV curve — cumulative revenue per user by (first-week
    * cohort, week offset): the payback-period readout behind every
    * acquisition decision. User-week revenue is rounded then summed
    * in integer 1e-4 units (exact, order-independent) so the
    * cumulative curve is bit-stable cross-engine; the cumulative
    * window runs per cohort over the bounded offset frame. Output:
    * (cohort_week, week_offset, n_users = cohort size,
    * cum_rev_per_user rounded at 6). */
  def cohortLtv(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val uw = events.groupBy(col(userCol).as("u"),
        date_trunc("week", col(tsCol)).cast("date").as("wk"))
      .agg(round(sum(col(valueCol)), 4).as("__rev"))
    val firsts = uw.groupBy(col("u")).agg(min(col("wk")).as("cohort_week"))
    val sizes = firsts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_users"))
    val perOffset = uw.join(firsts, "u")
      .groupBy(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("long")
          .as("week_offset"))
      .agg(sum(round(col("__rev") * 1e4).cast("long")).as("__rm"))
    val wCum = Window.partitionBy(col("cohort_week"))
      .orderBy(col("week_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perOffset
      .withColumn("__cum", sum(col("__rm")).over(wCum))
      .join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        round(col("__cum").cast("double") / col("n_users") / 1e4, 6)
          .as("cum_rev_per_user"))
  }

  /** Weekly growth accounting — the canonical active-user ledger
    * (new / retained / resurrected / churned): every weekly active
    * user is NEW (first-ever week), RETAINED (also active the prior
    * week), or RESURRECTED (returning after a gap); CHURNED counts
    * users active the prior week who went silent this week, so
    * actives(w) − actives(w−1) = new + resurrected − churned holds
    * row by row. Shapes: one distinct on (user, week), one first-week
    * aggregation, one self-join on (user, week−7d) — all user-keyed
    * shuffles, output bounded by the number of weeks. Churn needs a
    * NEXT week to be observable, so the last active week carries
    * churn only when a later week exists in the data. */
  def growthAccounting(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    // the (user, week) frame feeds SIX consumers below (firsts, the
    // status spine, the prev/next self-join sides, max-week, churn) —
    // checkpoint-truncate it so the fact scan + distinct run once,
    // not once per consumer (the rfm treatment; blocks freed by the
    // caller's sweep)
    val weeks = graft.etl.Checkpoints.truncate(
      events.select(col(userCol).as("u"),
        date_trunc("week", col(tsCol)).cast("date").as("wk")).distinct())
    val firsts = weeks.groupBy(col("u")).agg(min(col("wk")).as("first_wk"))
    val prev = weeks.select(col("u"), date_add(col("wk"), 7).as("wk"),
      lit(1).as("__was_prev"))
    val status = weeks
      .join(firsts, "u")
      .join(prev, Seq("u", "wk"), "left")
      .select(col("wk"),
        when(col("wk") === col("first_wk"), "new")
          .when(col("__was_prev").isNotNull, "retained")
          .otherwise("resurrected").as("st"))
      .groupBy(col("wk"))
      .agg(sum(when(col("st") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("st") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("st") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"))
    val maxWk = weeks.agg(max(col("wk")).as("__max_wk"))
    val churned = weeks
      .join(weeks.select(col("u"), col("wk")).withColumn("__next", lit(1))
          .select(col("u"), date_add(col("wk"), -7).as("wk"), col("__next")),
        Seq("u", "wk"), "left")
      .where(col("__next").isNull)
      .select(date_add(col("wk"), 7).as("wk"))
      .join(broadcast(maxWk), lit(true))
      .where(col("wk") <= col("__max_wk"))
      .groupBy(col("wk")).agg(count(lit(1)).as("n_churned"))
    // FULL outer: a week can have churn and zero actives (everyone
    // left) — dropping it would break the ledger identity
    // actives(w) − actives(w−1) = new + resurrected − churned
    status.join(churned, Seq("wk"), "full_outer")
      .select(col("wk"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** RFM segmentation (Hughes 1994) — the classical customer-value
    * grid over recency / frequency / monetary, each quintile-scored
    * by exact interpolated thresholds ([[Binning.quantileBins]]'
    * semantics: value > cut counts up, ties stay low; no global
    * per-row window). Scores run 1..k with k best: recency scores
    * REVERSED (most recent = k), frequency/monetary ascending.
    * Monetary is rounded at 4 BEFORE binning so the float sum of a
    * user's values can never straddle a cut cross-engine. Output per
    * non-empty segment (r·100 + f·10 + m): n_users and the segment's
    * mean monetary (integer micro-unit mean — bit-stable).
    *
    * Stage shape: the per-user frame is aggregated ONCE and
    * checkpoint-truncated; the reference date, then ALL THREE cut
    * arrays in a single percentile aggregate, broadcast back over the
    * bounded blocks — three serialized fact-rescanning percentile
    * stages (the folded-quantileBins form this replaces) collapse to
    * one fact scan plus two metadata-scale broadcasts. */
  def rfm(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, k: Int = 5): DataFrame = {
    // ONE pass over the fact table; everything below runs on the
    // checkpointed |users|-row frame (freed by the caller's sweep)
    val users0 = graft.etl.Checkpoints.truncate(
      events.groupBy(col(userCol))
        .agg(max(to_date(col(tsCol))).as("__maxd"),
          count(lit(1)).as("frequency"),
          round(sum(col(valueCol)), 4).as("monetary")))
    val asOf = users0.agg(max(col("__maxd")).as("__asof"))
    val users = users0.join(broadcast(asOf), lit(true))
      .withColumn("recency",
        datediff(col("__asof"), col("__maxd")).cast("long"))
    val ps = (1 until k).map(_.toDouble / k)
    def cutsOf(c: String) = transform(
      percentile(col(c), array(ps.map(lit): _*)), x => round(x, 6))
    // all three cut arrays in ONE aggregate (they are independent
    // statistics of the same frame — the sequential quantileBins fold
    // computed them in three serialized jobs for identical values)
    val cuts = users.agg(cutsOf("recency").as("__rc"),
      cutsOf("frequency").as("__fc"), cutsOf("monetary").as("__mc"))
    def binOf(c: String, cutsCol: String) = aggregate(col(cutsCol),
      lit(0L), (acc, cc) => acc + when(col(c) > cc, 1L).otherwise(0L))
    users.join(broadcast(cuts), lit(true))
      .withColumn("segment",
        (lit(k.toLong) - binOf("recency", "__rc")) * 100
          + (binOf("frequency", "__fc") + 1) * 10
          + (binOf("monetary", "__mc") + 1))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_users"),
        round(sum(round(col("monetary") * 1e4).cast("long"))
            .cast("double") / count(lit(1)) / 1e4, 6)
          .as("mean_monetary"))
  }
}
