package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Corpus-trained bigram language model scoring — the perplexity-style
  * quality filter of the CCNet/KenLM lineage: score each document by
  * how predictable its token sequence is under a model estimated from
  * the corpus itself (or a reference corpus), then filter/bucket on the
  * score. Machine-generated gibberish and boilerplate sit at the
  * perplexity extremes.
  *
  * Model: add-k smoothed conditional bigram estimates
  * P(w2|w1) = (C(w1,w2) + k) / (C(w1) + k·V), with C(w1) the context
  * count (= Σ_w2 C(w1,w2), computed as a WINDOW over the bigram-count
  * frame — not a second corpus aggregation) and V the number of
  * distinct contexts. Document score: mean log-probability over its
  * bigrams; perplexity = exp(−mean).
  *
  * Scale shape: bigrams come from a `lead()` window (one shuffle by
  * doc id — no position self-join); the model is one hash aggregation
  * on (w1, w2); scoring joins doc bigrams against the model keyed by
  * (w1, w2). Everything is shuffle-on-key and linear. For production,
  * persist [[bigramModel]] once and score many batches with
  * [[perplexityWithModel]] — the pure-plan [[perplexity]] re-derives
  * the model from its input corpus (fine for one-shot gating).
  */
object LangModel {

  /** (id, w1, w2) bigram frame: consecutive token pairs, in order,
    * per document. Documents with < 2 tokens contribute nothing. */
  def docBigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    docs.select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "w1")))
      .withColumn("w2", lead(col("w1"), 1).over(w))
      .where(col("w2").isNotNull)
      .select(col(idCol), col("w1"), col("w2"))
  }

  /** The smoothed-model frame: (w1, w2, c12, c1) — bigram count plus
    * its context count (window over the same frame, no recompute). */
  def bigramModel(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docBigrams(docs, idCol, textCol)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .withColumn("c1", sum(col("c12")).over(Window.partitionBy(col("w1"))))

  /** Per-document LM statistics against an explicit model:
    * (id, n_bigrams, avg_logp, ppl). `vocab` is the one-row
    * (\\_\\_v: distinct context count) frame; unseen bigrams back off to
    * P = k/(k·V) (null-model probability for an unseen context).
    * Scores are rounded to 6 digits for cross-engine determinism. */
  def perplexityWithModel(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, vocab: DataFrame, k: Double = 0.5): DataFrame =
    docBigrams(docs, idCol, textCol)
      .join(model, Seq("w1", "w2"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("logp",
        log((coalesce(col("c12"), lit(0L)) + lit(k)) /
          (coalesce(col("c1"), lit(0L)) + lit(k) * col("__v"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("logp")), 6).as("avg_logp"),
        round(exp(-avg(col("logp"))), 6).as("ppl"))

  /** Self-scored corpus: model fit on `docs`, every document scored
    * against it. One query plan; the model subtree is evaluated per
    * use (persist [[bigramModel]] for query-many workloads). */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
      k: Double = 0.5): DataFrame = {
    val model = bigramModel(docs, idCol, textCol)
    val vocab = model.agg(countDistinct(col("w1")).as("__v"))
    perplexityWithModel(docs, idCol, textCol, model, vocab, k)
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; Chen &
    * Goodman 1999) — the smoothing that actually wins LM evaluations,
    * vs [[perplexity]]'s add-k: the backoff mass goes to each word's
    * CONTINUATION probability (how many distinct contexts it follows),
    * not its raw frequency, so "Francisco" (frequent, but only after
    * "San") stops stealing probability from genuinely promiscuous
    * words. Per seen bigram, with absolute discount `d`:
    *
    *   P = max(c12 − d, 0)/c1 + (d · N1+(w1·)/c1) · Pcont(w2)
    *   Pcont(w2) = (N1+(·w2) + 0.5) / (T + (V+1)·0.5)
    *
    * where N1+(w1·)/N1+(·w2) count bigram TYPES by context/word, T =
    * total types, V = distinct continuations (the +0.5 keeps Pcont
    * finite for hypothetical unseen words under an explicit-model
    * variant; self-scoring only meets seen bigrams, like q78).
    *
    * Shape: the model is the bigram-TYPE frame (Heaps-scale), its
    * four statistics are two partitioned windows over that frame and
    * one 1-row broadcast; scoring is one join of doc bigrams against
    * the model. Output per doc: (n_bigrams, avg_logp, ppl), rounded
    * at 6. */
  def knPerplexity(docs: DataFrame, idCol: String, textCol: String,
      d: Double = 0.75): DataFrame = {
    require(d > 0 && d < 1, s"discount must be in (0,1), got $d")
    val bg = docBigrams(docs, idCol, textCol)
    val model = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .withColumn("c1", sum(col("c12")).over(Window.partitionBy(col("w1"))))
      .withColumn("n1fw", count(lit(1)).over(Window.partitionBy(col("w1"))))
      .withColumn("n1bw", count(lit(1)).over(Window.partitionBy(col("w2"))))
    val totals = model.agg(count(lit(1)).cast("double").as("__t"),
      countDistinct(col("w2")).cast("double").as("__v"))
    val pcont = (col("n1bw") + 0.5) / (col("__t") + (col("__v") + 1) * 0.5)
    val p = greatest(col("c12") - d, lit(0.0)) / col("c1") +
      (lit(d) * col("n1fw") / col("c1")) * pcont
    bg.join(model, Seq("w1", "w2"))
      .crossJoin(broadcast(totals))
      .withColumn("logp", log(p))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("logp")), 6).as("avg_logp"),
        round(exp(-avg(col("logp"))), 6).as("ppl"))
  }
}
