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
    // tf is per-document: computed ROW-LOCALLY by PostingEntries and
    // exploded (no corpus-token shuffle — the q112/q74 lesson); the
    // unused dl column prunes away
    val tf = Bm25.postings(docs, idCol, textCol)
      .select(col(idCol), col("token"), col("tf"))
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

  /** Per-document top-k most-similar documents by TF-IDF sparse
    * cosine over the df-capped vocabulary — lexical "related
    * documents" retrieval (the sparse dual of the embedding ANN in
    * [[Similarity]]). Terms with df > `maxDf` are treated as
    * stopwords and excluded from the feature space (they carry ~zero
    * idf and would explode the term join — the same hot-key guard as
    * the shingle df cap in [[Dedup.jaccardPairs]]); within that
    * space the cosine is exact.
    *
    * Shape: the corpus collapses to the (doc, term, weight) frame
    * (one explode + agg; df as a window over that frame — no second
    * tokenize pass, the [[topKeywords]] lesson); candidates come from
    * the inverted term join keyed on 2 ≤ df ≤ maxDf terms, so pair
    * volume is Σ_rare df² — bounded by the cap, never |docs|². Norms
    * include every df ≤ maxDf term (df-1 terms can't match but do
    * count toward length). Scores round to 6 digits BEFORE ranking
    * (engine-stable ties broken by the other doc's id).
    * Output: (id, other_id, score, rank). */
  def similarDocs(docs: DataFrame, idCol: String, textCol: String,
      maxDf: Int, k: Int): DataFrame = {
    require(k > 0 && maxDf > 1, "k and maxDf must be positive (maxDf > 1)")
    // row-local tf (PostingEntries) — no corpus-token shuffle
    val tf = Bm25.postings(docs, idCol, textCol)
      .select(col(idCol).as("doc"), col("token"), col("tf"))
    val total = docs.select(count(lit(1)).as("__n"))
    val wtd = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("token"))))
      .where(col("df") <= maxDf)
      .crossJoin(broadcast(total))
      .withColumn("w", col("tf") * log(col("__n").cast("double") / col("df")))
      // df = N terms have idf 0: no information, and an all-zero doc
      // would have norm 0 (undefined cosine) — out of the feature space
      .where(col("w") > 0)
    val norms = wtd.groupBy(col("doc"))
      .agg(sqrt(sum(col("w") * col("w"))).as("norm"))
    val joinable = wtd.where(col("df") >= 2)
      .select(col("doc"), col("token"), col("w"))
    val pairs = joinable
      .join(joinable.select(col("doc").as("doc_b"), col("token"),
        col("w").as("wb")), "token")
      .where(col("doc") =!= col("doc_b"))
      .groupBy(col("doc"), col("doc_b"))
      .agg(sum(col("w") * col("wb")).as("dot"))
    val wRank = Window.partitionBy(col("doc"))
      .orderBy(col("score").desc, col("doc_b"))
    pairs
      .join(norms, "doc")
      .join(norms.select(col("doc").as("doc_b"), col("norm").as("norm_b")),
        "doc_b")
      .withColumn("score",
        round(col("dot") / (col("norm") * col("norm_b")), 6))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc").as(idCol), col("doc_b").as("other_id"),
        col("score"), col("rank"))
  }
}
