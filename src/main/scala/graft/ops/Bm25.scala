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

  /** The (id, token, tf, dl) posting frame of a corpus: term frequency
    * per (doc, token) plus the document length (total tokens).
    *
    * Term frequency is a PER-DOCUMENT statistic, so it is computed
    * ROW-LOCALLY by the single-eval
    * [[graft.expressions.PostingEntries]] expression (one pass over
    * the text per document) and exploded, with NO shuffle at all —
    * the former `explode → groupBy(id, token)` shuffled |corpus
    * tokens| rows to aggregate a quantity each row already had
    * locally; at the 500k-doc decade that exchange was half the
    * inline-hybrid cost. dl = Σ tf rides along as a row-local
    * aggregate of the same entries. Empty documents contribute one
    * empty-string token, exactly as `split(trim(text), '\\s+')`
    * tokenizes them (the oracle-shared contract). */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    postingsFromEntries(postingEntries(docs, idCol, textCol), idCol)

  /** The COMPACT per-document posting entries (idCol, __es:
    * array<struct<token,tf>>) — one row per document. A consumer that
    * references the posting frame several times (the inline hybrid
    * ranker) materializes THIS frame (|docs| rows) instead of the
    * exploded one (|corpus tokens| rows): re-exploding in-memory
    * arrays per consumer is cheap; checkpointing the exploded frame
    * was measured at 2–3× the entire tokenization cost. */
  def postingEntries(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol),
      graft.expressions.PostingEntries(col(textCol)).as("__es"))

  /** Explode a [[postingEntries]] frame to the standard
    * (id, token, tf, dl) posting layout. */
  def postingsFromEntries(entries: DataFrame, idCol: String): DataFrame =
    entries.select(col(idCol),
        aggregate(col("__es"), lit(0L), (a, e) => a + e.getField("tf"))
          .as("dl"),
        explode(col("__es")).as("__e"))
      .select(col(idCol), col("__e.token").as("token"),
        col("__e.tf").as("tf"), col("dl"))

  /** Top-k BM25 hits per query. `queries` is a (qidCol, qtextCol)
    * frame, expected bounded (it is broadcast). Output:
    * query_id, <idCol>, score (rounded 6), rank.
    *
    * The corpus is tokenized exactly TWICE: once for the one-row
    * (N, avgdl) stats frame, once for the scoring pass — dl is carried
    * inside the postings (no join, no window over the full postings)
    * and df is a window over the broadcast-FILTERED postings, so the
    * only corpus-wide exchange is the postings aggregation itself. A
    * naive dl/df-as-separate-aggregates formulation re-derives the
    * postings four times — three redundant corpus scans at 100 TB.
    * For query-many workloads, persist [[postings]] once and use
    * [[topKFromPostings]] — then no pass reads the raw text at all. */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    // the q112 move, applied inline: corpus stats come off the COMPACT
    // per-doc entries (no explode). With exactly TWO consumers whose
    // column sets differ (stats prunes to __es; scoring needs id+__es)
    // static exchange reuse cannot fire, so the compact frame is
    // materialized ONCE (checkpoint-truncated — |docs| rows of
    // token/tf structs, freed by the caller's sweep): the text is
    // tokenized once, where the former formulation's stats pass
    // re-derived the postings — a second full tokenization — just to
    // re-aggregate a per-doc quantity the compact frame carries
    val entries = graft.etl.Checkpoints.truncate(
      postingEntries(docs, idCol, textCol))
    val stats = entries
      .select(when(size(col("__es")) > 0,
        aggregate(col("__es"), lit(0L),
          (a, e) => a + e.getField("tf"))).as("__dl"))
      .agg(count(col("__dl")).as("__n"), avg(col("__dl")).as("__avgdl"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol))
    scoredCore(postingsFromEntries(entries, idCol), stats, idCol,
        queries, qidCol, qtextCol, k1, b)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("score"), col("rank"))
  }

  /** [[topK]] over a precomputed (id, token, tf, dl) posting frame —
    * the persisted-index path: write `postings(corpus)` once, then
    * every query batch reads the compact postings, never the raw
    * text. */
  def topKFromPostings(post: DataFrame, idCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol))
    scoredFromPostings(post, idCol, queries, qidCol, qtextCol, k1, b)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("score"), col("rank"))
  }

  /** The pre-rank scoring frame of [[topKFromPostings]]:
    * (query_id, <idCol>, score) for every candidate document, score
    * rounded to 6 digits. Exposed so fused rankers ([[Retrieval
    * .hybridTopKFromPostings]]) can union scored legs BEFORE any rank
    * window — one ranking shuffle for all legs instead of one per
    * leg. */
  def scoredFromPostings(post: DataFrame, idCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // one-row corpus stats; joins in as a broadcast, never collected
    val stats = post.groupBy(col(idCol)).agg(max(col("dl")).as("__dl"))
      .agg(count(lit(1)).as("__n"), avg(col("__dl")).as("__avgdl"))
    scoredCore(post, stats, idCol, queries, qidCol, qtextCol, k1, b)
  }

  /** [[scoredFromPostings]] with the (N, avgdl) stats frame supplied by
    * the caller — the inline [[topK]] derives it from the compact
    * entries (no corpus explode); the persisted path derives it from
    * the posting frame itself. Both definitions count exactly the docs
    * that have posting rows. */
  private def scoredCore(post: DataFrame, stats: DataFrame, idCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k1: Double, b: Double): DataFrame = {
    val qterms = queries
      .select(col(qidCol).as("query_id"),
        explode(array_distinct(tokens(col(qtextCol)))).as("token"))
    val wDf = Window.partitionBy(col("query_id"), col("token"))
    post
      .join(broadcast(qterms), "token")
      // (id, token) is unique in postings, so rows per (query, token)
      // partition = documents containing the term = df
      .withColumn("df", count(lit(1)).over(wDf))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("__n") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w",
        col("idf") * col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b)
            + lit(b) * col("dl") / col("__avgdl"))))
      .groupBy(col("query_id"), col(idCol))
      .agg(round(sum(col("w")), 6).as("score"))
  }
}
