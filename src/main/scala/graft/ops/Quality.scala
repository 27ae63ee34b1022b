package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality probes from the reference's EDA cells. */
object Quality {

  /** Business-key uniqueness probe (reference
    * `mkt_returns/sql_test_mkt_returns.ipynb:590-658`, A1+A2): rows per
    * candidate key with multiplicity > 1. Empty result proves the key is
    * unique. Hash aggregation on the key columns — one shuffle, partial
    * counts map-side. */
  def keyViolations(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 1)

  /** True iff `keys` is a unique key of `df`. Action at the edge —
    * intended for tests/checks, not inside pipelines. */
  def isUniqueKey(df: DataFrame, keys: Seq[String]): Boolean =
    keyViolations(df, keys).isEmpty

  /** Schema drift report against a declared contract: one row per
    * column that is missing, unexpected, or type-mismatched. Empty
    * result = schema conforms. Plan-free (driver-side metadata only). */
  def schemaDrift(df: DataFrame,
      expected: org.apache.spark.sql.types.StructType): Seq[(String, String, String, String)] = {
    val actual = df.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val exp = expected.map(f => f.name -> f.dataType.simpleString).toMap
    val missing = exp.keySet.diff(actual.keySet).toSeq.sorted
      .map(c => (c, exp(c), "", "missing"))
    val extra = actual.keySet.diff(exp.keySet).toSeq.sorted
      .map(c => (c, "", actual(c), "unexpected"))
    val mismatched = exp.keySet.intersect(actual.keySet).toSeq.sorted
      .filter(c => exp(c) != actual(c))
      .map(c => (c, exp(c), actual(c), "type_mismatch"))
    missing ++ extra ++ mismatched
  }

  /** Within-document repetition statistics — the Gopher-style quality
    * rules a pretraining pipeline filters on (Rae et al. 2021, §A1.1):
    * machine-generated and boilerplate-heavy text repeats itself.
    * Per document:
    *   - `dup_ngram_frac`: 1 − distinct/total word n-grams — the
    *     duplicate n-gram fraction (0 when the doc has < n tokens);
    *   - `top_token_frac`: occurrences of the most frequent token over
    *     total tokens — the "most common word" dominance ratio.
    * Shapes: the n-gram leg is narrow (per-row expressions, zero
    * shuffle); the token leg is two hash aggregations keyed by the doc
    * id. Both scale linearly; nothing is quadratic in document count. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    import graft.functions.TextFunctions.{tokens, wordShingles}
    val grams = df
      .select(col(idCol), tokens(col(textCol)).as("__w"))
      .select(col(idCol), col("__w"), wordShingles(col("__w"), n).as("__sh"))
      .select(col(idCol),
        size(col("__w")).cast("long").as("n_tokens"),
        greatest(size(col("__w")) - lit(n - 1), lit(0)).cast("long")
          .as("n_grams"),
        size(col("__sh")).cast("long").as("n_distinct"))
      .withColumn("dup_ngram_frac",
        when(col("n_grams") > 0,
          lit(1.0) - col("n_distinct").cast("double") / col("n_grams"))
          .otherwise(lit(0.0)))
    val top = df
      .select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .groupBy(col(idCol), col("__tok"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(max(col("__c")).as("__top_c"))
    grams.join(top, Seq(idCol))
      .select(col(idCol), col("n_tokens"), col("n_grams"),
        col("dup_ngram_frac"),
        (col("__top_c").cast("double") / col("n_tokens"))
          .as("top_token_frac"))
  }

  /** The full C4/Gopher-style quality-rule battery as one narrow
    * projection: every rule emits its measured statistic AND its
    * boolean verdict, plus the conjunction (`pass`) — so a pipeline can
    * either filter on `pass` or audit which rule rejected a document.
    * Rules (Rae et al. 2021 §A1.1 / Raffel et al. 2020 C4, thresholds
    * as parameters):
    *   - token count within [minTokens, maxTokens];
    *   - mean word length within [minMeanWordLen, maxMeanWordLen]
    *     (gibberish/URL-soup detector);
    *   - symbol ratio (non-alphanumeric, non-space chars / chars)
    *     below maxSymbolRatio;
    *   - at least minStopwordHits occurrences of function words
    *     (language-integrity check).
    * Zero shuffle — per-row expressions only; at 100 TB this is one
    * streamed pass fused into whatever scan precedes it. */
  def gopherFlags(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 10, maxTokens: Int = 100000,
      minMeanWordLen: Double = 2.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minStopwordHits: Int = 2): DataFrame = {
    import graft.functions.TextFunctions.{tokens, hitCount, punctRatio, EnStopwords}
    df.select(col(idCol), col(textCol).as("__text"),
        tokens(col(textCol)).as("__w"))
      .select(col(idCol),
        size(col("__w")).cast("long").as("n_tokens"),
        // mean word length from char counts: tokens carry no spaces, so
        // sum(len(w)) = len(text without whitespace)
        (length(regexp_replace(col("__text"), "\\s+", "")).cast("double") /
          size(col("__w"))).as("mean_word_len"),
        punctRatio(col("__text")).as("symbol_ratio"),
        hitCount(col("__w"), EnStopwords).cast("long").as("stopword_hits"))
      .withColumn("pass_tokens",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn("pass_word_len",
        col("mean_word_len") >= minMeanWordLen
          && col("mean_word_len") <= maxMeanWordLen)
      .withColumn("pass_symbols", col("symbol_ratio") <= maxSymbolRatio)
      .withColumn("pass_stopwords", col("stopword_hits") >= minStopwordHits)
      .withColumn("pass",
        col("pass_tokens") && col("pass_word_len")
          && col("pass_symbols") && col("pass_stopwords"))
  }

  /** One-pass null profile: (column, n_nulls, null_ratio) for every
    * column — a SINGLE wide aggregation (one job, one scan), not a
    * count() per column. The null-density check that gates the
    * reference's DAILY_RETURN handling (128/472 nulls, SURVEY §1.2),
    * generalized. */
  def nullProfile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = count(lit(1)).as("__n") +:
      df.columns.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c")).toSeq
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getAs[Long]("__n")
    df.columns.toSeq.map { c =>
      val nulls = row.getAs[Long](s"__nulls_$c")
      (c, nulls, if (total == 0) 0.0 else nulls.toDouble / total)
    }.toDF("column", "n_nulls", "null_ratio")
  }

  /** Snapshot diff (change-data derivation between two table
    * versions): full outer join on the key, rows classified as
    * `added` (key only in the new snapshot), `removed` (only in the
    * old), or `changed` (both sides, content hash differs);
    * unchanged rows are dropped. ONE key-shuffle join; content
    * comparison rides on 16-byte md5 hashes, never on the payload.
    * The input to an incremental downstream refresh ([[graft.etl.WarehouseSink]]
    * upsert) or a replication audit. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      payloadCol: String): DataFrame = {
    // Presence is carried explicitly (a NULL payload hashes to NULL,
    // so hash-nullness would misread present-with-null-payload as
    // added/removed); the hash compare is null-safe for the same
    // reason (NULL vs non-NULL payload IS a change).
    val o = oldDf.select(col(keyCol), md5(col(payloadCol)).as("__ho"),
      lit(true).as("__po"))
    val n = newDf.select(col(keyCol), md5(col(payloadCol)).as("__hn"),
      lit(true).as("__pn"))
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("__po").isNull, "added")
          .when(col("__pn").isNull, "removed")
          .when(!(col("__ho") <=> col("__hn")), "changed"))
      .where(col("status").isNotNull)
      .select(col(keyCol), col("status"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between groups `a` and
    * `b` of `groupCol` over `valueCol`: max |F_a(v) − F_b(v)| and the
    * smallest value attaining it — the distribution-drift detector a
    * data pipeline runs between sources, snapshots, or train/serve
    * windows (KS needs no binning choices, unlike a χ² over
    * histograms).
    *
    * Shape: one hash aggregation to per-VALUE counts for both groups
    * at once, cumulative fractions via a window over that REDUCED
    * distinct-value frame (bounded when the value domain is — the
    * [[Binning.percentileRanks]] precedent; for unbounded continuous
    * domains quantize first), and a 1-row TakeOrdered argmax. The
    * data is scanned once. |diff| rounds to 9 digits before the
    * argmax (ties → smallest value); `ks` reports at 6.
    *
    * NULL `valueCol` rows are excluded up front — an empirical CDF is
    * defined over observed values only, and NULL ordering differs
    * across engines (Spark windows put NULLS FIRST, DuckDB ORDER BY
    * puts them LAST), so counting them would make the statistic
    * engine-dependent (the [[graft.ops.Sampling.weightedSample]]
    * precedent of excluding undefined inputs explicitly). */
  def ksStatistic(df: DataFrame, valueCol: String, groupCol: String,
      a: String, b: String, nBuckets: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val f = df.where(col(groupCol).isin(a, b) && col(valueCol).isNotNull)
      .select(col(valueCol).as("v"), col(groupCol).as("g"))
    // quantize-first: for continuous domains the distinct-value frame
    // is data-sized, so reduce to <= nBuckets equi-width bands BEFORE
    // the cumulative window (each band reports its min observed value,
    // so discrete data with enough buckets reproduces the exact
    // statistic; error otherwise bounded by one band of probability).
    val counts = nBuckets.fold(
      f.groupBy(col("v")).agg(
        sum(when(col("g") === a, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("g") === b, 1L).otherwise(0L)).as("__cb"))) { k =>
      require(k >= 2, "nBuckets must be at least 2")
      val vd = col("v").cast("double")
      val stats = f.agg(min(vd).as("__lo"), max(vd).as("__hi"))
      val width = (col("__hi") - col("__lo")) / k
      f.join(broadcast(stats), lit(true))
        .withColumn("__b", when(col("__hi") === col("__lo"), 0L)
          .otherwise(least(floor((vd - col("__lo")) / width),
            lit(k - 1L)).cast("long")))
        .groupBy(col("__b")).agg(min(col("v")).as("v"),
          sum(when(col("g") === a, 1L).otherwise(0L)).as("__ca"),
          sum(when(col("g") === b, 1L).otherwise(0L)).as("__cb"))
        .drop("__b")
    }
    val wCum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(lit(1))
    counts
      .withColumn("__fa", sum(col("__ca")).over(wCum)
        / sum(col("__ca")).over(wTot))
      .withColumn("__fb", sum(col("__cb")).over(wCum)
        / sum(col("__cb")).over(wTot))
      .withColumn("__d", round(abs(col("__fa") - col("__fb")), 9))
      .orderBy(col("__d").desc, col("v"))
      .limit(1)
      .select(round(col("__d"), 6).as("ks"), col("v").as("ks_at"))
  }

  /** Categorical drift between groups `a` and `b` of `groupCol` over
    * the categories of `catCol` — the companion of [[ksStatistic]]
    * for discrete columns. One row out:
    *  - `chi2`: two-sample homogeneity χ² = Σ (o − e)²/e over both
    *    groups' category counts (e from the pooled distribution);
    *  - `dof`: #categories − 1;
    *  - `psi`: population stability index
    *    Σ (p_a − p_b)·ln(p_a / p_b), with +0.5 Laplace smoothing on
    *    every (group, category) count so absent categories stay
    *    finite (the standard monitoring convention).
    * Shape: one hash aggregation to per-category counts for both
    * groups at once, totals as windows over that bounded category
    * frame, one 1-row final aggregate. Scanned once; both statistics
    * round to 6 digits. */
  def categoricalDrift(df: DataFrame, catCol: String, groupCol: String,
      a: String, b: String, nBuckets: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base0 = df.where(col(groupCol).isin(a, b))
    // quantize-first: a continuous "category" column reduces to
    // <= nBuckets equi-width bands before the per-category counts
    // (χ²/PSI depend only on the partition, not the labels, so the
    // band id IS the category; NULLs are excluded like ksStatistic's
    // undefined inputs). dof then counts OBSERVED bands − 1.
    val base = nBuckets.fold(
      base0.select(col(catCol).as("c"), col(groupCol).as("g"))) { k =>
      require(k >= 2, "nBuckets must be at least 2")
      val f = base0.where(col(catCol).isNotNull)
        .select(col(catCol).cast("double").as("v"),
          col(groupCol).as("g"))
      val stats = f.agg(min(col("v")).as("__lo"), max(col("v")).as("__hi"))
      val width = (col("__hi") - col("__lo")) / k
      f.join(broadcast(stats), lit(true))
        .select(when(col("__hi") === col("__lo"), 0L)
          .otherwise(least(floor((col("v") - col("__lo")) / width),
            lit(k - 1L)).cast("long")).as("c"),
          col("g"))
    }
    val counts = base
      .groupBy(col("c")).agg(
        sum(when(col("g") === a, 1L).otherwise(0L)).as("__oa"),
        sum(when(col("g") === b, 1L).otherwise(0L)).as("__ob"))
    val w = Window.partitionBy(lit(1))
    val withTot = counts
      .withColumn("__na", sum(col("__oa")).over(w))
      .withColumn("__nb", sum(col("__ob")).over(w))
      .withColumn("__k", count(lit(1)).over(w))
    val pooled =
      (col("__oa") + col("__ob")) / (col("__na") + col("__nb"))
    val ea = col("__na") * pooled
    val eb = col("__nb") * pooled
    val pa = (col("__oa") + 0.5) / (col("__na") + col("__k") * 0.5)
    val pb = (col("__ob") + 0.5) / (col("__nb") + col("__k") * 0.5)
    withTot
      .withColumn("__chi",
        pow(col("__oa") - ea, 2) / ea + pow(col("__ob") - eb, 2) / eb)
      .withColumn("__psi", (pa - pb) * log(pa / pb))
      .agg(round(sum(col("__chi")), 6).as("chi2"),
        (max(col("__k")) - 1).cast("long").as("dof"),
        round(sum(col("__psi")), 6).as("psi"))
  }

  /** Robust per-group outlier profile via median/MAD (the
    * distribution-shape guard a pipeline runs on metric columns —
    * mean/stddev z-scores are themselves dragged by the outliers they
    * should flag; the median/MAD form is 50%-breakdown robust).
    * Per group: n, median, MAD, and the count of rows whose robust
    * z-score |x − med| / (1.4826·MAD) exceeds `z` (1.4826 scales MAD
    * to σ under normality). The z-score is rounded to 6 digits before
    * the cut so the flag is stable across engines/libm.
    *
    * Shape: two median aggregations joined back between them on the
    * group key, with NO broadcast hint — AQE broadcasts the per-group
    * stats when the group count is small and degrades to a shuffled
    * hash join when a high-cardinality group column would blow the
    * driver; the data is scanned twice and shuffled only by the group
    * key either way. Exact medians sort within groups; at unbounded
    * group width the drop-in scale path is [[Approx]]'s GK quantile
    * sketch. MAD-zero groups (>50% identical values) flag nothing —
    * degenerate by definition. */
  /** Jensen–Shannon divergence between two groups' CATEGORY
    * distributions (Lin 1991): JSD = ½KL(p‖m) + ½KL(q‖m) with
    * m = (p+q)/2 — the symmetric, finite drift measure for token /
    * category distributions (KL explodes on any unshared category;
    * JSD is bounded by ln 2). Zero-count sides contribute 0 to their
    * own KL term, so no smoothing is needed. One hash aggregation to
    * per-(category) counts for both groups at once, totals as
    * windows over that bounded frame, one row out: (jsd, n_cats),
    * jsd rounded at 6. */
  def jsDivergence(df: DataFrame, catCol: String, groupCol: String,
      a: String, b: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.where(col(groupCol).isin(a, b))
      .groupBy(col(catCol)).agg(
        sum(when(col(groupCol) === a, 1L).otherwise(0L)).as("__oa"),
        sum(when(col(groupCol) === b, 1L).otherwise(0L)).as("__ob"))
    val w = Window.partitionBy(lit(1))
    val withTot = counts
      .withColumn("__p", col("__oa") / sum(col("__oa")).over(w))
      .withColumn("__q", col("__ob") / sum(col("__ob")).over(w))
    val m = (col("__p") + col("__q")) / 2
    val term =
      when(col("__p") > 0, col("__p") / 2 * log(col("__p") / m))
        .otherwise(0.0) +
      when(col("__q") > 0, col("__q") / 2 * log(col("__q") / m))
        .otherwise(0.0)
    withTot.agg(round(sum(term), 6).as("jsd"),
      count(lit(1)).as("n_cats"))
  }

  /** Benford's-law first-digit audit (Benford 1938; the fraud/
    * data-entry screen): observed first-significant-digit shares vs
    * the log10(1 + 1/d) expectation, χ²(8) on the 9-digit frame. The
    * digit comes from the DECIMAL STRING RENDERING's first [1-9]
    * (portable across engines, where floor(v/10^floor(log10 v))
    * flips on 1-ulp log10 differences at exact powers of ten).
    * NULL/zero values are excluded. Output per digit: (digit, n,
    * obs_p, exp_p) + the same χ² and its 5% verdict on every row. */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val digits = df
      .where(col(valueCol).isNotNull && col(valueCol) =!= 0)
      .select(regexp_extract(abs(col(valueCol)).cast("string"),
        "[1-9]", 0).cast("long").as("digit"))
      .where(col("digit").isNotNull)
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(lit(1))
    val withTot = digits
      .withColumn("__N", sum(col("n")).over(w))
      .withColumn("obs_p", col("n") / col("__N"))
      .withColumn("exp_p", log(10.0, lit(1.0) + lit(1.0) / col("digit")))
    val chi = (col("n") - col("__N") * col("exp_p")) *
      (col("n") - col("__N") * col("exp_p")) /
      (col("__N") * col("exp_p"))
    withTot
      .withColumn("chi2", round(sum(chi).over(w), 6))
      .select(col("digit"), col("n"), round(col("obs_p"), 6).as("obs_p"),
        round(col("exp_p"), 6).as("exp_p"), col("chi2"),
        // 5% critical value of chi-squared with 8 dof
        (col("chi2") > 15.507313).as("non_benford"))
  }

  /** Mutual information between two categorical columns (the
    * feature-selection screen): I = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))),
    * in nats. One (x,y) aggregation; marginals as windows over the
    * contingency frame (bounded by the category-pair alphabet). One
    * row out: (mi, n, n_x, n_y), mi rounded at 6; NULL in either
    * column is its own category (null-safe grouping). */
  def mutualInformation(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joint = df.groupBy(col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("__nxy"))
    val w = Window.partitionBy(lit(1))
    val wx = Window.partitionBy(col("__x"))
    val wy = Window.partitionBy(col("__y"))
    val withP = joint
      .withColumn("__N", sum(col("__nxy")).over(w))
      .withColumn("__pxy", col("__nxy") / col("__N"))
      .withColumn("__px", sum(col("__nxy")).over(wx) / col("__N"))
      .withColumn("__py", sum(col("__nxy")).over(wy) / col("__N"))
    withP.agg(
      round(sum(col("__pxy") * log(col("__pxy") /
        (col("__px") * col("__py")))), 6).as("mi"),
      max(col("__N")).as("n"),
      count_distinct(col("__x")).as("n_x"),
      count_distinct(col("__y")).as("n_y"))
  }

  /** Per-group Gini coefficient over non-negative values — the
    * concentration audit (is 1% of users 99% of the traffic? is one
    * source most of the corpus?): G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) /
    * (n·Σx) over each group's ascending-sorted values. One
    * partitioned rank window (ties broken by `tieCol` — the rank
    * assignment among equal values cannot change the statistic) + one
    * aggregation. Output per group: (n, gini), rounded at 6. */
  def gini(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(tieCol))
    df.where(col(valueCol).isNotNull && col(valueCol) >= 0)
      .withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        round((lit(2) * sum(col("__i") * col(valueCol))
            - (count(lit(1)) + 1) * sum(col(valueCol)))
          / (count(lit(1)) * sum(col(valueCol))), 6).as("gini"))
  }

  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
      z: Double = 3.0): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(median(col(valueCol)).as("med"))
    val withMed = df.join(med, groupCol)
    val mad = withMed.groupBy(col(groupCol))
      .agg(median(abs(col(valueCol) - col("med"))).as("mad"))
    val score = round(
      abs(col(valueCol) - col("med")) / (lit(1.4826) * col("mad")), 6)
    withMed.join(mad, groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("med"), max(col("mad")).as("mad"),
        sum(when(col("mad") > 0 && score > z, 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Per-group Spearman rank correlation (the monotone-association
    * screen — Pearson on tie-AVERAGED ranks, the textbook treatment):
    * avg rank = (2·RANK + |ties| − 1)/2, then the closed-form Pearson
    * over the rank pairs. Two partitioned rank windows + one
    * aggregation per group — every window is keyed by the group, so
    * the shape is shuffle-bounded, never a global sort. Output per
    * group: (group, n, rho), rho rounded at 6 (NULL when either
    * column is constant within the group). */
  def spearman(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def avgRank(c: String) =
      (lit(2) * rank().over(Window.partitionBy(col(groupCol))
          .orderBy(col(c)))
        + count(lit(1)).over(Window.partitionBy(col(groupCol), col(c)))
        - 1).cast("double") / 2
    df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .withColumn("__rx", avgRank(xCol))
      .withColumn("__ry", avgRank(yCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        round(corr(col("__rx"), col("__ry")), 6).as("rho"))
  }

  /** Centered moments per group: population variance, skewness
    * (g₁ = m₃/m₂^1.5) and EXCESS kurtosis (m₄/m₂² − 3) — the shape
    * audit behind heavy-tail and asymmetry screens. Computed by the
    * numerically stable TWO-PASS form (mean joined back, then sums of
    * centered powers): the one-pass raw-moment identity cancels
    * catastrophically at Σx⁴ scale and cannot hold 6-decimal parity
    * cross-engine. Constant-valued groups yield NULL skew/kurtosis
    * (m₂ = 0). Output: (group, n, mean, variance, skewness,
    * kurtosis), rounded at 6. */
  def centralMoments(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val clean = df.where(col(valueCol).isNotNull)
    val mu = clean.groupBy(col(groupCol))
      .agg(avg(col(valueCol)).as("__mu"))
    val d = col(valueCol) - col("__mu")
    val n = count(lit(1)).cast("double")
    val m2 = sum(d * d) / n
    val m3 = sum(d * d * d) / n
    val m4 = sum(d * d * d * d) / n
    clean.join(broadcast(mu), groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        round(max(col("__mu")), 6).as("mean"),
        round(m2, 6).as("variance"),
        round(when(m2 > 0, m3 / pow(m2, 1.5)), 6).as("skewness"),
        round(when(m2 > 0, m4 / (m2 * m2) - 3), 6).as("kurtosis"))
  }

  /** χ² test of independence between two categorical columns + the
    * effect size (Cramér's V) — [[mutualInformation]]'s
    * classical-statistics sibling. Expected counts come from the
    * MARGINAL CROSS PRODUCT (zero observed cells still contribute
    * their expectation — a joint-only aggregation would understate
    * χ²); the cross join is of two alphabet-sized marginal frames,
    * never data-sized. One row out: (n, dof, chi2, cramers_v),
    * rounded at 6; NULL category is its own level. */
  def chiSquare(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val joint = df.groupBy(col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("__o"))
    val mx = joint.groupBy(col("__x")).agg(sum(col("__o")).as("__nx"))
    val my = joint.groupBy(col("__y")).agg(sum(col("__o")).as("__ny"))
    val n = joint.agg(sum(col("__o")).as("__N"))
    val cells = mx.crossJoin(my).crossJoin(broadcast(n))
      .join(joint, Seq("__x", "__y"), "left")
      .withColumn("__e", col("__nx") * col("__ny") / col("__N"))
      .withColumn("__d", coalesce(col("__o"), lit(0L)) - col("__e"))
    cells.agg(
        max(col("__N")).as("n"),
        ((count_distinct(col("__x")) - 1) *
          (count_distinct(col("__y")) - 1)).as("dof"),
        round(sum(col("__d") * col("__d") / col("__e")), 6).as("chi2"),
        round(sqrt(sum(col("__d") * col("__d") / col("__e")) /
          (max(col("__N")) *
            least(count_distinct(col("__x")) - 1,
              count_distinct(col("__y")) - 1))), 6).as("cramers_v"))
  }

  /** Flesch reading-ease per document, aggregated by word-count band
    * — the classical readability screen (Flesch 1948) that
    * complements the [[gopherFlags]] structural rules: 206.835 −
    * 1.015·(words/sentences) − 84.6·(syllables/words), with
    * syllables approximated by vowel-group count (the standard
    * hyphenation-free heuristic) and sentence count floored at 1.
    * Everything is per-row regex arithmetic (codegen'd, no shuffle
    * until the band aggregate); the band mean is summed in integer
    * micro-units so it is bit-stable cross-engine. Output per band
    * (words ÷ `bandWidth`, capped at `maxBand`): n_docs,
    * mean_flesch (6 decimals). */
  def readability(df: DataFrame, idCol: String, textCol: String,
      bandWidth: Int = 20, maxBand: Int = 4): DataFrame = {
    val words = size(split(trim(col(textCol)), "\\s+")).cast("double")
    val sentences = greatest(
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))),
      lit(1)).cast("double")
    val syllables = size(regexp_extract_all(lower(col(textCol)),
      lit("[aeiouy]+"), lit(0))).cast("double")
    val flesch = lit(206.835) - lit(1.015) * (words / sentences) -
      lit(84.6) * (syllables / words)
    df.where(col(textCol).isNotNull && length(trim(col(textCol))) >= 1)
      .select(col(idCol),
        least(floor(words / bandWidth), lit(maxBand)).cast("long")
          .as("band"),
        round(flesch * 1e6).cast("long").as("__fm"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("__fm")).cast("double") / count(lit(1)) / 1e6, 6)
          .as("mean_flesch"))
  }

  /** Theil T inequality index per group — [[gini]]'s information-
    * theoretic sibling (Theil 1967), decomposable across subgroups
    * where Gini is not: T = (1/n) Σ (x/μ)·ln(x/μ) over POSITIVE
    * values (0 = perfect equality, ln n = one unit owns
    * everything). Also emits the mean-log-deviation L = (1/n) Σ
    * ln(μ/x) (Theil's second measure). One aggregation for μ, one
    * pass for the log terms — no window, no sort. Output per group:
    * n, theil_t, theil_l, rounded at 6. */
  def theil(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val pos = df.where(col(valueCol).isNotNull && col(valueCol) > 0)
    val mu = pos.groupBy(col(groupCol)).agg(avg(col(valueCol)).as("__mu"))
    val share = col(valueCol) / col("__mu")
    pos.join(broadcast(mu), groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        round(sum(share * log(share)) / count(lit(1)), 6).as("theil_t"),
        round(sum(log(lit(1.0) / share)) / count(lit(1)), 6).as("theil_l"))
  }
}
