package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Query-driven retrieval rankers beyond BM25 ([[Bm25]]) and their
  * fusion — the hybrid-search step of a retrieval/deduplication
  * pipeline: run a lexical ranker and a second independent ranker
  * over the same query set, then merge the two rankings with
  * reciprocal-rank fusion (RRF, Cormack et al. 2009):
  *
  *   rrf(d) = Σ_lists 1 / (c + rank_list(d)),   c = 60 by default
  *
  * RRF needs only ranks (no score calibration between rankers), which
  * is why it is the standard fusion for BM25 + vector search.
  *
  * Scale shape: both rankers emit per-query top-k frames (bounded:
  * |queries| × k rows), so the fusion join is tiny regardless of
  * corpus size; all heavy lifting stays inside the rankers, which
  * broadcast the query set and never shuffle the corpus beyond their
  * own posting aggregation.
  */
object Retrieval {

  /** TF-IDF cosine retrieval: rank documents against a bounded query
    * set by cosine between the query's idf vector (distinct terms,
    * qtf = 1) and the document's tf·idf vector. The sparse dual of
    * [[Similarity.cosineTopK]], and the second lexical leg (besides
    * [[Bm25.topK]]) for [[rrfFuse]].
    *
    * Shape: one posting aggregation (doc × token), df as a window
    * over it (no second tokenize pass — the [[Tfidf]] lesson);
    * document norms from the same frame. Query-term weights join
    * against the vocabulary (token-keyed, vocabulary-sized), and the
    * scoring join BROADCASTS the weighted query terms against the
    * postings, so only query-term postings reach the score
    * aggregation. Document norms cover the FULL df < N vocabulary
    * (non-matching terms count toward length, as in any honest
    * cosine). Scores round to 6 digits before ranking; ties break on
    * the document id. Output: (query_id, <idCol>, score, rank). */
  def tfidfSearchTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int = 10): DataFrame =
    tfidfSearchFromPostings(
      Bm25.postings(docs, idCol, textCol), idCol,
      queries, qidCol, qtextCol, k)

  /** [[tfidfSearchTopK]] over a precomputed [[Bm25.postings]] frame
    * (id, token, tf, dl) — the persisted-index path shared with
    * [[Bm25.topKFromPostings]]: ONE posting aggregation (or one read
    * of the persisted index) serves both hybrid legs; no pass
    * re-reads the raw text. */
  def tfidfSearchFromPostings(post: DataFrame, idCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int = 10): DataFrame = {
    require(k > 0, "k must be positive")
    val tf = post.select(col(idCol), col("token"), col("tf"))
    val total = post.select(col(idCol)).distinct()
      .select(count(lit(1)).as("__n"))
    val wtd = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("token"))))
      .crossJoin(broadcast(total))
      .withColumn("w", col("tf") * log(col("__n").cast("double") / col("df")))
      // df = N terms carry zero idf — out of the feature space (an
      // all-stopword doc would otherwise have an undefined 0-norm)
      .where(col("w") > 0)
    val norms = wtd.groupBy(col(idCol))
      .agg(sqrt(sum(col("w") * col("w"))).as("__dnorm"))
    // vocabulary frame: token → (df, N); df is functional in token so
    // max() is exact, and the frame is vocabulary-sized
    val vocab = wtd.groupBy(col("token"))
      .agg(max(col("df")).as("df"), max(col("__n")).as("__n"))
    val qterms = queries.select(col(qidCol).as("query_id"),
      explode(array_distinct(tokens(col(qtextCol)))).as("token"))
    val qw = qterms.join(vocab, "token")
      .withColumn("qw", log(col("__n").cast("double") / col("df")))
      .where(col("qw") > 0)
    val qnorms = qw.groupBy(col("query_id"))
      .agg(sqrt(sum(col("qw") * col("qw"))).as("__qnorm"))
    val dots = wtd
      .join(broadcast(qw.select(col("query_id"), col("token"), col("qw"))),
        "token")
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("w") * col("qw")).as("__dot"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol))
    dots
      .join(norms, idCol)
      .join(broadcast(qnorms), "query_id")
      .withColumn("score",
        round(col("__dot") / (col("__dnorm") * col("__qnorm")), 6))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("score"), col("rank"))
  }

  /** Hybrid BM25 + TF-IDF-cosine retrieval with RRF fusion, inline:
    * each leg derives its own postings from the raw text (two narrow
    * scan+agg passes — see [[hybridTopKFromPostings]] for why they
    * are NOT shared inline, and for the persisted-index path where
    * one materialized posting frame serves both legs). */
  def hybridTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      kPerLeg: Int = 20, k: Int = 10, c: Int = 60): DataFrame =
    hybridTopKFromPostings(Bm25.postings(docs, idCol, textCol), idCol,
      queries, qidCol, qtextCol, kPerLeg, k, c)

  /** [[hybridTopK]] over a (typically PERSISTED) posting frame — at
    * scale, write [[Bm25.postings]] to parquet once and both legs
    * read the compact index instead of re-tokenizing text. Passed
    * inline, each leg re-derives the postings independently (the two
    * legs prune different columns — BM25 keeps dl, tf-idf drops it —
    * so their exchanges never canonicalize equal for ReuseExchange;
    * measured at sf0.1, recomputing the cheap narrow scan+agg twice
    * beats caching the token-string frame into executor storage). */
  def hybridTopKFromPostings(post: DataFrame, idCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      kPerLeg: Int = 20, k: Int = 10, c: Int = 60): DataFrame = {
    val bm = Bm25.topKFromPostings(post, idCol,
      queries, qidCol, qtextCol, kPerLeg)
    val tfidf = tfidfSearchFromPostings(post, idCol,
      queries, qidCol, qtextCol, kPerLeg)
    rrfFuse(bm, tfidf, idCol, k, c)
  }

  /** Reciprocal-rank fusion of two per-query rankings. Inputs are
    * (query_id, <idCol>, ..., rank) frames (any extra columns are
    * ignored); a document missing from one list simply contributes
    * nothing from it. The fused score is rounded to 6 digits before
    * re-ranking (sums of 1/(c+r) terms differ in the last ulp across
    * engines depending on addition order) and ties break on the id.
    * Output: (query_id, <idCol>, rrf, rank) — top `k` per query. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
      k: Int = 10, c: Int = 60): DataFrame = {
    require(k > 0 && c >= 0, "k must be positive, c non-negative")
    val aa = a.select(col("query_id"), col(idCol), col("rank").as("__ra"))
    val bb = b.select(col("query_id"), col(idCol), col("rank").as("__rb"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col(idCol))
    aa.join(bb, Seq("query_id", idCol), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(c) + col("__ra")), lit(0.0))
          + coalesce(lit(1.0) / (lit(c) + col("__rb")), lit(0.0)), 6))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("rrf"), col("rank"))
  }

  /** Exact phrase search over the positional token stream: documents
    * where the words of `phrase` occur CONSECUTIVELY (whitespace
    * tokenization, the corpus-wide [[tokens]] convention), with the
    * occurrence count and the first match position (1-based). The
    * positional leg the bag-of-words rankers ([[Bm25.topK]],
    * [[tfidfSearchTopK]]) cannot express — "hash join" as a phrase,
    * not two independent terms.
    *
    * Scale shape: the positional postings are pruned to the phrase's
    * own vocabulary BEFORE any join (an `isin` filter riding the
    * scan-side explode), so the m−1 position-shift equi-joins see
    * only |phrase-term postings| rows, never the corpus token stream;
    * each join keys on (doc, position) — long-keyed, equi, AQE-safe.
    * A phrase of one word degenerates to the filter alone.
    * Output: idCol, n_matches, first_pos. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrase: String): DataFrame = {
    val words = phrase.trim.split("\\s+").toSeq
    require(words.nonEmpty && words.head.nonEmpty, "phrase must be non-empty")
    val toks = docs
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("p0", "tok")))
      .where(col("tok").isin(words: _*))
      .select(col(idCol), (col("p0") + 1).as("pos"), col("tok"))
    val start = toks.where(col("tok") === words.head)
      .select(col(idCol), col("pos"))
    val matched = words.zipWithIndex.drop(1)
      .foldLeft(start) { case (acc, (w, i)) =>
        acc.join(toks.where(col("tok") === w)
          .select(col(idCol), (col("pos") - i).as("pos")), Seq(idCol, "pos"))
      }
    matched.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matches"),
        min(col("pos")).cast("long").as("first_pos"))
  }
}
