package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Per-document TF-IDF keyword extraction: tf = in-document token
  * occurrences, idf = ln(N / df) with df = number of documents
  * containing the token, score = tf * idf, top-k tokens per document.
  *
  * Shapes at scale: two hash aggregations (doc x token, then token) and
  * one join of the doc-token frame against the vocabulary frame — all
  * shuffle-partitioned by their keys, nothing quadratic; the corpus
  * count joins in as a broadcast single-row frame (no driver action).
  * The ranking window partitions by document (per-doc vocabulary is
  * small, so the per-group sort is bounded — unlike "top-k per user
  * over billions of rows", where [[TopK.topKPerGroup]]'s bounded heap
  * is the right tool).
  *
  * Ranking determinism across engines: scores are ROUNDED to 6 digits
  * BEFORE ranking (ln differs between libm implementations at ~1e-12)
  * and ties break on the token string.
  */
object Tfidf {

  def topKeywords(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    require(k > 0, "k must be positive")
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val total = docs.select(count(lit(1)).as("__n"))
    // tf is distinct per (doc, token), so df = row count per token —
    // computed as a WINDOW over the tf frame, not a second aggregation
    // of the same subtree joined back (which would re-tokenize the
    // whole corpus: Spark recomputes shared DataFrame subtrees)
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("token"))))
      .crossJoin(broadcast(total))
      .withColumn("score",
        round(col("tf") * log(col("__n").cast("double") / col("df")), 6))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("token"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"),
        col("score"), col("rank"))
  }
}
