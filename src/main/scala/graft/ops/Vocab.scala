package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Corpus vocabulary statistics — the tokenizer-training and
  * index-building passes of a training-data pipeline.
  *
  * Scale shape: every operator here is explode → hash-aggregate with
  * map-side partial aggregation, so the shuffle carries per-partition
  * partial counts (bounded by vocabulary size), never the exploded
  * token stream. The only global sorts are over the ALREADY-REDUCED
  * frames (vocab-sized), and top-N selection is TakeOrdered (no full
  * sort); the final rank window runs on the N surviving rows only.
  */
object Vocab {

  /** Token frame: (doc, token) — one row per occurrence. */
  private def tokenFrame(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
      explode(tokens(col(textCol))).as("token"))

  /** Top-N vocabulary by total occurrences: (token, n, df, rank).
    * rank is dense over (n desc, token asc) — a deterministic total
    * order. The rank window is single-partition BY CONSTRUCTION on the
    * already-limited N rows (bounded), not on the corpus. */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String,
      topN: Int): DataFrame = {
    val counts = tokenFrame(docs, idCol, textCol)
      .groupBy("token")
      .agg(count(lit(1)).as("n"), countDistinct(col("doc")).as("df"))
      .orderBy(col("n").desc, col("token")).limit(topN)
    counts.withColumn("rank",
      row_number().over(Window.orderBy(col("n").desc, col("token")))
        .cast("long"))
  }

  /** Adjacent-token-pair frequencies — the BPE merge-candidate scoring
    * pass (each top pair is a merge candidate; iterating this with a
    * merged vocabulary is BPE training). Pairs come from
    * [[LangModel.docBigrams]]'s lead() window (one shuffle by doc id,
    * no position self-join). Output: (w1, w2, n, rank), top-N. */
  def pairCounts(docs: DataFrame, idCol: String, textCol: String,
      topN: Int): DataFrame = {
    val counts = LangModel.docBigrams(docs, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w1"), col("w2")).limit(topN)
    counts.withColumn("rank",
      row_number().over(Window.orderBy(col("n").desc, col("w1"), col("w2")))
        .cast("long"))
  }

  /** Inverted index: per term its document frequency, total term
    * frequency, and the top-k posting list (doc ids by tf desc, id
    * asc, comma-joined — a portable representation). The top-k side
    * uses the bounded-heap [[TopK]] aggregator: no per-term group
    * sort, O(k) state per term. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val postings = tokenFrame(docs, idCol, textCol)
      .groupBy(col("token"), col("doc")).agg(count(lit(1)).as("tf"))
    val stats = postings.groupBy("token")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"))
    val tops = TopK.topKPerGroup(postings, Seq("token"), "tf", "doc", k)
      .groupBy("token")
      .agg(array_sort(collect_list(struct(col("rank"), col("doc")))).as("ps"))
      .select(col("token"), concat_ws(",",
        transform(col("ps"), x => x.getField("doc").cast("string")))
        .as("top_docs"))
    stats.join(tops, "token")
  }
}
