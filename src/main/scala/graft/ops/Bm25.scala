package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** BM25 (Okapi) ranked retrieval over a document corpus — the lexical
  * retrieval leg of a training-data pipeline (nearest-neighbor text
  * search for decontamination review, retrieval-augmented filtering,
  * duplicate triage alongside the embedding ANN operators).
  *
  * score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  * with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the Lucene/
  * Robertson-Sparck-Jones form, always positive.
  *
  * Scale shape: the corpus tokenizes into a (doc, token, tf) posting
  * frame with ONE hash aggregation; document lengths fall out of the
  * same frame (sum of tf per doc — no second scan of the text). The
  * query-term table is tiny and BROADCAST twice: once against the
  * token-grouped df frame (so only query terms' df survive — a
  * broadcast-sized frame), once against the postings (so only postings
  * of query terms flow into the scoring aggregation). The corpus is
  * never shuffled except the postings aggregation itself; per-query
  * ranking partitions by query over candidate docs only.
  *
  * Cross-engine determinism: scores are ROUNDED (6 digits) before
  * ranking and ties break on doc id — ln() differs across libm
  * implementations at ~1e-15.
  */
object Bm25 {

  /** The (id, token, tf) posting frame of a corpus. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Top-k BM25 hits per query. `queries` is a (qidCol, qtextCol)
    * frame, expected bounded (it is broadcast). Output:
    * query_id, <idCol>, score (rounded 6), rank. */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    val post = postings(docs, idCol, textCol)
    // document length from the postings (no second pass over the text)
    val dl = post.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    // one-row corpus stats; joins in as a broadcast, never collected
    val stats = dl.agg(count(lit(1)).as("__n"), avg(col("dl")).as("__avgdl"))
    val qterms = queries
      .select(col(qidCol).as("query_id"),
        explode(array_distinct(tokens(col(qtextCol)))).as("token"))
    // df restricted to query terms: broadcast-join the tiny term set
    // against the token-grouped postings, leaving a broadcast-sized
    // (query_id, token, df) frame
    val qdf = post.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .join(broadcast(qterms), "token")
    val scored = post
      .join(broadcast(qdf), "token")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("__n") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w",
        col("idf") * col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b)
            + lit(b) * col("dl") / col("__avgdl"))))
      .groupBy(col("query_id"), col(idCol))
      .agg(round(sum(col("w")), 6).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("score"), col("rank"))
  }
}
