package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Tabular feature-engineering operators for model-training pipelines:
  * categorical target encoding and the feature-hashing trick — the two
  * standard ways a 100 TB pipeline turns unbounded-vocabulary columns
  * into fixed-width numeric features without a fitted dictionary.
  */
object Features {

  /** Smoothed target (mean) encoding with a leave-one-out variant
    * (Micci-Barreca 2001): `te` = (Σ_cat y + α·ȳ)/(n_cat + α) — the
    * category mean shrunk toward the global mean ȳ by pseudo-count α —
    * and `te_loo`, the same with the row's OWN target removed
    * ((Σ−y + α·ȳ)/(n−1+α)), the standard leakage guard when the
    * encoding feeds a model trained on the same rows. Unseen/empty
    * categories and n=1 rows fall back to ȳ (the α-smoothed limit).
    *
    * Plan: one category aggregate (broadcast back — categorical
    * cardinality is vocabulary-scale by contract; swap the broadcast
    * for a plain join if yours is not), one 1-row global-mean attach;
    * the per-row arithmetic is codegen'd column math. Rows with NULL
    * target receive `te` and a NULL-safe `te_loo` = `te` (nothing to
    * leave out). Adds columns (te, te_loo); input columns untouched. */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val labeled = df.where(col(targetCol).isNotNull)
    val agg = labeled.groupBy(col(catCol))
      .agg(sum(col(targetCol)).as("__s"), count(lit(1)).as("__n"))
    val g = labeled.agg(
      (sum(col(targetCol)) / count(lit(1))).as("__gmean"))
    val s = coalesce(col("__s"), lit(0.0))
    val n = coalesce(col("__n"), lit(0L))
    val te = (s + col("__gmean") * alpha) / (n + alpha)
    val loo = when(col(targetCol).isNotNull,
      (s - col(targetCol) + col("__gmean") * alpha) / (n - 1 + alpha))
      .otherwise(te)
    df.join(broadcast(agg), Seq(catCol), "left")
      .crossJoin(broadcast(g))
      .withColumn("te", te)
      .withColumn("te_loo", loo)
      .drop("__s", "__n", "__gmean")
  }

  /** Feature hashing ("the hashing trick", Weinberger et al. 2009):
    * whitespace tokens map to a FIXED dim-sized index space via the
    * portable md5-derived 32-bit hash (engine-reproducible, unlike
    * murmur variants), with the unbiasing ±1 sign drawn from the next
    * hash nibble. Output one row per (id, idx): `tf` = term count,
    * `sv` = signed sum — the sparse row of the hashed design matrix.
    *
    * Plan: explode → narrow hash arithmetic → ONE partial-agg shuffle
    * on (id, idx). No dictionary, no fit step, no driver state —
    * the property that lets it run on an unbounded vocabulary at
    * 100 TB. Empty tokens are dropped. */
  def hashFeatures(df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val toks = df.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("__tok"))
      .where(col("__tok") =!= "")
      .withColumn("__h", md5(col("__tok")))
    toks
      .withColumn("idx",
        pmod(conv(substring(col("__h"), 1, 8), 16, 10).cast("long"),
          lit(dim.toLong)))
      .withColumn("__sign",
        when(substring(col("__h"), 9, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), 1L)
          .otherwise(-1L))
      .groupBy(col(idCol), col("idx"))
      .agg(count(lit(1)).as("tf"), sum(col("__sign")).as("sv"))
  }
}
