package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval/ranking evaluation metrics — the measurement leg of a
  * retrieval or embedding-training pipeline (judging a ranker against
  * labeled relevance before its output feeds curation, hard-negative
  * mining, or RAG assembly).
  *
  * Metrics per query, all at cutoff `k`:
  *   - recall@k   = |relevant ∩ top-k| / |relevant|
  *   - precision@k = |relevant ∩ top-k| / k
  *   - MRR@k      = 1 / rank of the first relevant hit (0 if none)
  *   - nDCG@k     = DCG@k / IDCG@k with the standard graded form
  *                  DCG = Σ (2^rel − 1) / log2(rank + 1)
  *
  * Scale shape: the ranking frame is already bounded (|queries| × k);
  * the relevance join keys on (query, doc) — broadcast-sized whenever
  * labels are (they are: labels are human/synthetic judgments). The
  * only full-frame pass is one hash aggregation per side; the ideal
  * DCG ranks labels inside each query partition — |labels per query|
  * rows, never the corpus. Everything is rounded (6) before emit so
  * the gate is engine-exact; ties in the ideal ordering don't matter
  * because DCG sums over a SET of gains.
  */
object Eval {

  /** Per-query metrics. `ranked` carries (qidCol, didCol, rankCol
    * 1-based); `rels` carries (qidCol, didCol, relCol ≥ 0 graded
    * relevance — 0 rows may simply be absent). One output row per
    * query id present in EITHER input: queries present in `ranked`
    * but with zero relevant labels emit NULL recall/nDCG (undefined
    * denominators), 0 hits, MRR 0 — surfacing label gaps instead of
    * silently scoring them perfect; queries with labels but zero
    * retrieved rows emit recall/precision/mrr/ndcg 0 (a ranker that
    * returned nothing scored nothing — they must not vanish).
    * Output: (qidCol, n_rel, n_hit, recall, precision, mrr, ndcg). */
  def rankingMetrics(ranked: DataFrame, rels: DataFrame,
      qidCol: String, didCol: String, rankCol: String, relCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val gain: Column => Column = r => (pow(lit(2.0), r) - 1.0)
    val topk = ranked.where(col(rankCol) <= k)
      .select(col(qidCol), col(didCol), col(rankCol))
    val posRel = rels.where(col(relCol) > 0)
      .select(col(qidCol), col(didCol), col(relCol).cast("double").as("__rel"))
    // ideal DCG: per query, gains of the top-k labels by grade
    val wIdeal = Window.partitionBy(col(qidCol))
      .orderBy(col("__rel").desc, col(didCol))
    val ideal = posRel
      .withColumn("__irank", row_number().over(wIdeal))
      .groupBy(col(qidCol))
      .agg(count(lit(1)).as("n_rel"),
        sum(when(col("__irank") <= k,
          gain(col("__rel")) / log2(col("__irank") + 1.0))
          .otherwise(lit(0.0))).as("__idcg"))
    val scored = topk
      .join(posRel, Seq(qidCol, didCol), "left")
      .groupBy(col(qidCol))
      .agg(
        count(when(col("__rel").isNotNull, lit(1))).as("n_hit"),
        sum(when(col("__rel").isNotNull,
          gain(col("__rel")) / log2(col(rankCol) + 1.0))
          .otherwise(lit(0.0))).as("__dcg"),
        min(when(col("__rel").isNotNull, col(rankCol))).as("__first"))
    // one row per query id seen ANYWHERE — a labeled query the ranker
    // returned nothing for must score 0, not disappear (both sides of
    // this union are already bounded: |queries|×k and |labels|)
    val qids = ranked.select(col(qidCol))
      .union(posRel.select(col(qidCol))).distinct()
    qids
      .join(scored, Seq(qidCol), "left")
      .join(ideal, Seq(qidCol), "left")
      .select(col(qidCol),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        // n_rel NULL (no labels) propagates NULL — the documented gap
        // signal; n_rel > 0 with no hits is an honest 0
        round(coalesce(col("n_hit"), lit(0L)) / col("n_rel"), 6)
          .as("recall"),
        round(coalesce(col("n_hit"), lit(0L)) / lit(k.toDouble), 6)
          .as("precision"),
        round(coalesce(lit(1.0) / col("__first"), lit(0.0)), 6).as("mrr"),
        round(coalesce(col("__dcg"), lit(0.0)) / col("__idcg"), 6)
          .as("ndcg"))
  }

  /** Cohen's κ between two label columns — inter-annotator (or
    * label-vs-classifier) agreement corrected for chance:
    *
    *   κ = (p_o − p_e) / (1 − p_e),
    *   p_o = agreement fraction, p_e = Σ_c marginalA(c)·marginalB(c)
    *
    * The label-QA primitive of a training-data pipeline: raw accuracy
    * against skewed marginals over-reports quality; κ doesn't. NULL is
    * treated as its own label class (null-safe compare + null-safe
    * marginal join). κ is NULL when p_e = 1 (both raters constant —
    * agreement is undefined, not perfect).
    *
    * Scale shape: two label-keyed partial aggregations + one row-level
    * agreement aggregation; the marginal join is |label alphabet|
    * rows. One row out: (n, po, pe, kappa), all rounded 6. */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val lab = df.select(col(aCol).as("__a"), col(bCol).as("__b"))
    val agree = lab.agg(count(lit(1)).as("n"),
      (sum(when(col("__a") <=> col("__b"), lit(1L)).otherwise(lit(0L)))
        / count(lit(1))).as("__po"))
    val ma = lab.groupBy(col("__a")).agg(count(lit(1)).cast("double").as("__ca"))
    val mb = lab.groupBy(col("__b")).agg(count(lit(1)).cast("double").as("__cb"))
    val chance = ma.join(mb, ma("__a") <=> mb("__b"))
      .agg(sum(col("__ca") * col("__cb")).as("__num"))
    agree.crossJoin(broadcast(chance))
      .withColumn("__pe",
        col("__num") / (col("n").cast("double") * col("n").cast("double")))
      .select(col("n"), round(col("__po"), 6).as("po"),
        round(col("__pe"), 6).as("pe"),
        // p_e = 1 → 0/0: explicit NULL (ANSI division would throw)
        when(col("__pe") < 1.0,
          round((col("__po") - col("__pe")) / (lit(1.0) - col("__pe")), 6))
          .as("kappa"))
  }

  /** Calibration curve + expected calibration error (ECE, Naeini
    * et al. 2015): scores in [0,1] bin equi-width into `nBins`; per
    * bin `conf` = mean score, `acc` = mean label, `gap` = |acc−conf|;
    * `ece` (same value on every row) = Σ n_b/N · gap_b. The standard
    * model-quality readout before a scored corpus filters on a
    * threshold — an uncalibrated quality model silently biases the
    * kept corpus.
    *
    * Shape: one partial-agg pass to the ≤nBins frame; totals/ECE as
    * windows over that bounded frame. Scores outside [0,1] and NULL
    * rows are excluded. */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int): DataFrame = {
    require(nBins >= 2, s"need at least 2 bins, got $nBins")
    import org.apache.spark.sql.expressions.Window
    val base = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("__s"),
        col(labelCol).cast("double").as("__y"))
      .where(col("__s") >= 0 && col("__s") <= 1)
    val per = base
      .withColumn("bin",
        least(floor(col("__s") * nBins), lit(nBins - 1L)).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), avg(col("__s")).as("conf"),
        avg(col("__y")).as("acc"))
    val w = Window.partitionBy(lit(1))
    per
      .withColumn("gap", abs(col("acc") - col("conf")))
      .withColumn("ece",
        sum(col("gap") * col("n")).over(w) / sum(col("n")).over(w))
  }

  /** ROC curve + trapezoid AUC of a score against a boolean label —
    * the classifier-quality measurement (is the quality score
    * actually separating keep from drop?). One threshold per DISTINCT
    * score, predicted positive when score ≥ threshold; tp/fp as
    * descending cumulative sums, AUC as the running trapezoid
    * integral (the last row's `auc` is the total; it equals the
    * tie-corrected Mann–Whitney U/(P·N)).
    *
    * Shape: one score aggregation (the only data-sized pass), then
    * windows over the DISTINCT-score frame — bounded by score
    * resolution, not row count. Output per threshold, descending:
    * (thr, tp, fp, tpr, fpr, auc), rates rounded at 6. */
  def rocCurve(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val perScore = df.where(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).as("thr"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("__p"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("__n"))
    val wAll = Window.partitionBy(lit(1))
    val wDesc = Window.orderBy(col("thr").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perScore
      .withColumn("tp", sum(col("__p")).over(wDesc))
      .withColumn("fp", sum(col("__n")).over(wDesc))
      .withColumn("tpr", col("tp") / sum(col("__p")).over(wAll))
      .withColumn("fpr", col("fp") / sum(col("__n")).over(wAll))
      .withColumn("auc", round(sum(
        (col("fpr") - coalesce(lag(col("fpr"), 1).over(
            Window.orderBy(col("thr").desc)), lit(0.0))) *
          (col("tpr") + coalesce(lag(col("tpr"), 1).over(
            Window.orderBy(col("thr").desc)), lit(0.0))) / 2)
        .over(wDesc), 6))
      .select(col("thr"), col("tp"), col("fp"),
        round(col("tpr"), 6).as("tpr"), round(col("fpr"), 6).as("fpr"),
        col("auc"))
  }

  /** Brier score + Murphy (1973) decomposition over `nBins`
    * equal-width forecast bins: brier = mean (p−y)² exactly;
    * reliability = Σ nₖ(f̄ₖ−ōₖ)²/N (binned calibration error, the
    * squared cousin of [[calibration]]'s ECE); resolution =
    * Σ nₖ(ōₖ−ō)²/N (how much the bins separate outcomes);
    * uncertainty = ō(1−ō). brier = REL − RES + UNC holds exactly only
    * for bin-constant forecasts — the residual is the within-bin
    * forecast spread, so all four are reported and the identity is
    * checkable. One data pass to the ≤nBins frame, then a fold.
    * Scores outside [0,1] and NULLs are excluded. One row out,
    * rounded at 6. */
  def brierDecomposition(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int): DataFrame = {
    require(nBins >= 1, s"nBins must be positive, got $nBins")
    val p = col(scoreCol)
    val y = when(col(labelCol), 1.0).otherwise(0.0)
    val bins = df
      .where(p.isNotNull && p >= 0 && p <= 1)
      .withColumn("__bin",
        least(floor(p * nBins).cast("long"), lit(nBins - 1L)))
      .groupBy(col("__bin"))
      .agg(count(lit(1)).as("__nk"), avg(p).as("__fk"), avg(y).as("__ok"),
        sum((p - y) * (p - y)).as("__sq"))
    // ō as a 1-row broadcast attach: it cannot nest inside the final
    // fold (aggregates of aggregates), and the bins frame is ≤nBins
    val tot = bins.agg(
      (sum(col("__nk") * col("__ok")) / sum(col("__nk"))).as("__obar"),
      sum(col("__nk")).cast("double").as("__n"))
    bins.crossJoin(broadcast(tot)).agg(
      sum(col("__nk")).as("n"),
      round(sum(col("__sq")) / max(col("__n")), 6).as("brier"),
      round(sum(col("__nk") * (col("__fk") - col("__ok"))
        * (col("__fk") - col("__ok"))) / max(col("__n")), 6)
        .as("reliability"),
      round(sum(col("__nk") * (col("__ok") - col("__obar"))
        * (col("__ok") - col("__obar"))) / max(col("__n")), 6)
        .as("resolution"),
      round(max(col("__obar")) * (lit(1.0) - max(col("__obar"))), 6)
        .as("uncertainty"))
  }
}
