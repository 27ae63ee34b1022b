package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocklist / flaglist screening: which of a fixed phrase list occur
  * in each document — one automaton pass per row
  * ([[graft.expressions.MultiPhraseMatches]], Aho–Corasick 1975)
  * instead of P per-phrase `contains` probes. The phrase list rides
  * the closure as part of the expression (a few KB–MB broadcast with
  * the task binary); the corpus is never shuffled. */
object Blocklist {

  /** Matched phrases of `text` (array<string>, phrase-list order,
    * each at most once). Case-sensitive; normalize upstream. */
  def matches(text: Column, phrases: Seq[String]): Column =
    graft.expressions.MultiPhraseMatches(text, phrases)

  /** The composed-built-ins reference form (P codegen'd `contains`
    * probes per row): asserted equal in BlocklistSpec, kept as the
    * semantic cross-check — O(|text|·P) per row, not the hot path. */
  def matchesComposed(text: Column, phrases: Seq[String]): Column =
    filter(
      array(phrases.map(p =>
        when(contains(text, lit(p)), lit(p))): _*),
      x => x.isNotNull)

  /** Screen a corpus: `matched` (phrases hit), `n_matched`,
    * `blocked`. */
  def screen(df: DataFrame, textCol: String,
      phrases: Seq[String]): DataFrame =
    df.withColumn("matched", matches(col(textCol), phrases))
      .withColumn("n_matched", size(col("matched")).cast("long"))
      .withColumn("blocked", col("n_matched") > 0)
}
