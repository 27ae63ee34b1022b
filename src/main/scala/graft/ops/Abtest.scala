package graft.ops

import org.apache.spark.sql.DataFrame
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
}
