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
}
