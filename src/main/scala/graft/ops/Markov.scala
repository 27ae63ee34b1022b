package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition estimation over per-key ordered event
  * sequences — the "common paths" model behind funnel discovery and
  * next-action prediction.
  *
  * Scale shape: one shuffle on the key for the ordered lead() window
  * (consecutive pairs — no position self-join), one hash aggregation
  * on the bounded (from, to) state space, and a window over THAT
  * reduced frame for the row normalizer. Nothing touches the event
  * stream twice.
  */
object Markov {

  /** Output: (from_type, to_type, n, p) — transition counts and
    * row-normalized probabilities (p rounded to 6). `orderCols` must
    * totally order each key's events. */
  def transitions(events: DataFrame, keyCol: String,
      orderCols: Seq[String], typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val pairs = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    pairs.withColumn("p",
      round(col("n") / sum(col("n")).over(
        Window.partitionBy(col("from_type"))), 6))
  }

  /** Entropy rate of the first-order chain (Shannon 1948):
    * H = −Σ_f π_f Σ_t p(t|f)·ln p(t|f), in nats per transition, with
    * π the from-state share of transitions (the chain's empirical
    * stationary weight). 0 for a deterministic chain, ln|alphabet|
    * for a uniform one — the "how predictable is user behavior"
    * scalar over the same lead()-window pairs as [[transitions]].
    * All post-pair windows run over the bounded (from, to) frame.
    * One row out: (h_rate, n_transitions, n_states), rounded at 6. */
  def entropyRate(events: DataFrame, keyCol: String,
      orderCols: Seq[String], typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val pairs = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(typeCol).as("__f"), col("__next").as("__t"))
      .agg(count(lit(1)).as("__n"))
    val wf = Window.partitionBy(col("__f"))
    val wAll = Window.partitionBy(lit(1))
    val withP = pairs
      .withColumn("__nf", sum(col("__n")).over(wf))
      // "__tot", not "__N": Spark's default case-INSENSITIVE resolution
      // would make col("__n") ambiguous against a sibling "__N"
      .withColumn("__tot", sum(col("__n")).over(wAll))
      .withColumn("__p", col("__n") / col("__nf"))
    withP.agg(
      round(-sum((col("__nf") / col("__tot")) * col("__p") * log(col("__p"))),
        6).as("h_rate"),
      max(col("__tot")).as("n_transitions"),
      count_distinct(col("__f")).as("n_states"))
  }
}
