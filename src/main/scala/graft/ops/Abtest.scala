package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-sample A/B comparison per metric group — Welch's unequal-
  * variances t-test (Welch 1947), the experimentation readout every
  * event-logging analytics stack ends up needing. One aggregation
  * pass over the fact table computes each (group, variant)'s count /
  * mean / sample variance; the test statistic assembles on the
  * reduced two-rows-per-group frame. No per-row work beyond the
  * partial aggregation; variants beyond the named two are ignored.
  *
  * Outputs per group: `n_a/n_b`, `mean_a/mean_b`, `t` (Welch
  * statistic), `dof` (Welch–Satterthwaite), and `significant` =
  * |t| > 1.96 (the normal-approximation 5% two-sided screen — exact
  * t-CDF thresholds differ only at tiny dof, and a fixed threshold
  * keeps the readout engine-portable). Floats round at 6 (the
  * cross-engine contract). */
object Abtest {

  def welch(df: DataFrame, groupCol: String, variantCol: String,
      valueCol: String, variantA: String, variantB: String): DataFrame = {
    val per = df
      .where(col(variantCol).isin(variantA, variantB) &&
        col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(variantCol))
      .agg(count(lit(1)).as("n"), avg(col(valueCol)).as("m"),
        var_samp(col(valueCol)).as("v"))
    def side(v: String, sfx: String) = per.where(col(variantCol) === v)
      .select(col(groupCol), col("n").as(s"n_$sfx"),
        col("m").as(s"m_$sfx"), col("v").as(s"v_$sfx"))
    val a = side(variantA, "a")
    val b = side(variantB, "b")
    val se2 = col("v_a") / col("n_a") + col("v_b") / col("n_b")
    val t = (col("m_a") - col("m_b")) / sqrt(se2)
    val dof = (se2 * se2) /
      ((col("v_a") / col("n_a")) * (col("v_a") / col("n_a")) /
        (col("n_a") - 1) +
        (col("v_b") / col("n_b")) * (col("v_b") / col("n_b")) /
          (col("n_b") - 1))
    a.join(b, groupCol)
      .select(col(groupCol), col("n_a"), col("n_b"),
        round(col("m_a"), 6).as("mean_a"),
        round(col("m_b"), 6).as("mean_b"),
        round(t, 6).as("t"),
        round(dof, 6).as("dof"),
        (abs(round(t, 6)) > 1.96).as("significant"))
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi, Walker 2013): adjust
    * each unit's experiment-period metric by its PRE-period value,
    * `adj = post − θ·(pre − mean(pre))` with `θ = cov(pre, post) /
    * var(pre)` pooled across variants (the pre-period predates
    * assignment, so pooling is unbiased). The adjusted means estimate
    * the same treatment effect with variance shrunk by ≈ the squared
    * pre/post correlation — the difference between a two-week and a
    * two-day experiment on the same traffic.
    *
    * Plan shape: one aggregation to per-unit (pre, post), one
    * 1-row pooled-moment aggregate broadcast back, one per-variant
    * aggregation — three shuffles total, each on a reduced frame;
    * nothing driver-side. Units missing either period are excluded
    * (they contribute no pre/post pair to θ). Output per variant:
    * `n`, `mean_raw`, `mean_adj`, `var_reduction` =
    * `1 − var(adj)/var(post)`, floats rounded at 6. */
  def cuped(df: DataFrame, unitCol: String, variantCol: String,
      tsCol: String, valueCol: String, cutoff: Column): DataFrame = {
    val per = df.where(col(valueCol).isNotNull)
      .groupBy(col(unitCol), col(variantCol))
      .agg(avg(when(col(tsCol) < cutoff, col(valueCol))).as("pre"),
        avg(when(col(tsCol) >= cutoff, col(valueCol))).as("post"))
      .where(col("pre").isNotNull && col("post").isNotNull)
    val st = per.agg(
      (covar_samp(col("pre"), col("post")) / var_samp(col("pre")))
        .as("__theta"),
      avg(col("pre")).as("__pre_mean"))
    per.crossJoin(broadcast(st))
      .withColumn("adj",
        col("post") - col("__theta") * (col("pre") - col("__pre_mean")))
      .groupBy(col(variantCol))
      .agg(count(lit(1)).as("n"),
        round(avg(col("post")), 6).as("mean_raw"),
        round(avg(col("adj")), 6).as("mean_adj"),
        round(lit(1.0) - var_samp(col("adj")) / var_samp(col("post")), 6)
          .as("var_reduction"))
  }

  /** Sample-ratio-mismatch check (the first thing a trustworthy
    * experimentation readout verifies — Fabijan et al. 2019): per
    * group, a one-degree chi-squared test of the observed A/B counts
    * against the design ratio. `srm` = true means the assignment
    * mechanism itself is broken and every downstream metric on that
    * group is untrustworthy. One partial-agg pass; the statistic
    * assembles on the one-row-per-group frame. 3.841459 is the 5%
    * critical value of χ²(1). */
  def srm(df: DataFrame, groupCol: String, variantCol: String,
      variantA: String, variantB: String,
      ratioA: Double = 0.5): DataFrame = {
    require(ratioA > 0 && ratioA < 1, s"ratioA must be in (0,1), got $ratioA")
    val per = df.where(col(variantCol).isin(variantA, variantB))
      .groupBy(col(groupCol))
      .agg(sum(when(col(variantCol) === variantA, 1L).otherwise(0L))
          .as("n_a"),
        sum(when(col(variantCol) === variantB, 1L).otherwise(0L)).as("n_b"))
    val ea = (col("n_a") + col("n_b")) * ratioA
    val eb = (col("n_a") + col("n_b")) * (1 - ratioA)
    val chi2 = round(
      (col("n_a") - ea) * (col("n_a") - ea) / ea +
        (col("n_b") - eb) * (col("n_b") - eb) / eb, 6)
    per.withColumn("chi2", chi2)
      .withColumn("srm", chi2 > 3.841459)
  }

  /** Mann–Whitney U test (Mann & Whitney 1947) per metric group — the
    * nonparametric companion to [[welch]]: compares rank sums, so one
    * whale user cannot drag the readout (the usual failure of mean
    * tests on revenue-like metrics). Tie-averaged ranks, normal
    * approximation with the tie-corrected variance
    * σ² = nA·nB/12 · ((n+1) − Σ(t³−t)/(n(n−1))), z = (U_A − nA·nB/2)/σ.
    *
    * Shape: one rank window partitioned by group (one shuffle), tie
    * counts as a (group, value) aggregate joined back map-side-ish,
    * statistics on the two-rows-per-group frame. Output per group:
    * n_a, n_b, u_a, z, significant (|z| > 1.96), rounded at 6. */
  def mannWhitney(df: DataFrame, groupCol: String, variantCol: String,
      valueCol: String, variantA: String, variantB: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.where(col(variantCol).isin(variantA, variantB) &&
      col(valueCol).isNotNull)
    val wRank = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val wTie = Window.partitionBy(col(groupCol), col(valueCol))
    val ranked = base
      .withColumn("__t", count(lit(1)).over(wTie).cast("double"))
      .withColumn("__avgrank",
        rank().over(wRank) + (col("__t") - 1) / 2.0)
    val per = ranked.groupBy(col(groupCol))
      .agg(
        sum(when(col(variantCol) === variantA, 1L).otherwise(0L))
          .cast("double").as("__na"),
        sum(when(col(variantCol) === variantB, 1L).otherwise(0L))
          .cast("double").as("__nb"),
        sum(when(col(variantCol) === variantA, col("__avgrank"))
          .otherwise(0.0)).as("__ra"),
        // Σ(t³−t): each member of a t-tie contributes (t³−t)/t = t²−1
        sum(col("__t") * col("__t") - 1).as("__tcorr"))
    val n = col("__na") + col("__nb")
    val ua = col("__ra") - col("__na") * (col("__na") + 1) / 2
    val sigma = sqrt(col("__na") * col("__nb") / 12 *
      ((n + 1) - col("__tcorr") / (n * (n - 1))))
    val z = round((ua - col("__na") * col("__nb") / 2) / sigma, 6)
    per.select(col(groupCol),
      col("__na").cast("long").as("n_a"), col("__nb").cast("long").as("n_b"),
      round(ua, 6).as("u_a"), z.as("z"), (abs(z) > 1.96).as("significant"))
  }

  /** Kruskal–Wallis H per metric group — the k-sample extension of
    * [[mannWhitney]] (Kruskal & Wallis 1952): does `valueCol`'s
    * distribution differ across the levels of `classCol`? Tie-
    * averaged ranks within each group (rank window + peer-count
    * window, both partitioned by the group — shuffle-bounded, never
    * a global sort), class rank-sums on the (group × class) frame,
    * then H = 12/(N(N+1)) · Σ R_c²/n_c − 3(N+1) with the standard
    * tie correction C = 1 − Σ(t³−t)/(N³−N). Rank sums are exact
    * (.5-multiples of integers), so H is bit-stable cross-engine.
    * Output per group: n, k, h, h_adj (= H/C; NULL when every value
    * ties), rounded at 6. */
  def kruskalWallis(df: DataFrame, groupCol: String, classCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clean = df.where(col(valueCol).isNotNull && col(classCol).isNotNull)
    val wRank = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val wTie = Window.partitionBy(col(groupCol), col(valueCol))
    val ranked = clean
      .withColumn("__t", count(lit(1)).over(wTie).cast("double"))
      .withColumn("__ar", rank().over(wRank) + (col("__t") - 1) / 2.0)
    val perClass = ranked.groupBy(col(groupCol), col(classCol))
      .agg(sum(col("__ar")).as("__rc"), count(lit(1)).as("__nc"))
    val stats = perClass.groupBy(col(groupCol))
      .agg(sum(col("__nc")).cast("double").as("__n"),
        count(lit(1)).as("k"),
        sum(col("__rc") * col("__rc") / col("__nc")).as("__s"))
    // Σ(t³−t) from the per-(group, value) tie counts — each member
    // of a t-tie contributes (t³−t)/t = t²−1, so one pass suffices
    val ties = ranked.groupBy(col(groupCol))
      .agg(sum(col("__t") * col("__t") - 1).as("__tcorr"))
    val n = col("__n")
    val h = lit(12.0) / (n * (n + 1)) * col("__s") - lit(3.0) * (n + 1)
    val c = lit(1.0) - col("__tcorr") / (n * n * n - n)
    stats.join(ties, groupCol)
      .select(col(groupCol), n.cast("long").as("n"), col("k"),
        round(h, 6).as("h"),
        round(when(c > 0, h / c), 6).as("h_adj"))
  }
}
