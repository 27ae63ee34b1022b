package graft

import org.apache.spark.sql.functions._

import graft.ops.Bm25

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana cherry"),
    (2L, "apple apple banana banana banana"),
    (3L, "durian elderberry fig grape"),
    (4L, "apple"),
    (5L, "banana cherry durian elderberry"))

  private val queries = Seq((10L, "apple banana"), (20L, "durian"))

  /** Driver-side reference BM25 (same formula, plain Scala). */
  private def reference(k1: Double = 1.2, b: Double = 0.75): Map[(Long, Long), Double] = {
    val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    val df = toks.values.flatMap(_.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size }
    (for {
      (qid, qt) <- queries
      term <- qt.split("\\s+").distinct.toSeq
      (did, dt) <- toks
      tf = dt.count(_ == term) if tf > 0
    } yield {
      val idf = math.log(1.0 + (n - df(term) + 0.5) / (df(term) + 0.5))
      val w = idf * tf * (k1 + 1.0) /
        (tf + k1 * (1.0 - b + b * dt.size / avgdl))
      (qid, did) -> w
    }).groupBy(_._1).map { case (k, xs) =>
      k -> BigDecimal(xs.map(_._2).sum).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  test("topK matches a driver-side reference implementation exactly") {
    val got = Bm25.topK(corpus.toDF("doc_id", "text"), "doc_id", "text",
        queries.toDF("query_id", "qtext"), "query_id", "qtext", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == reference())
  }

  test("ranking: docs with more matching mass rank higher; k truncates") {
    val hits = Bm25.topK(corpus.toDF("doc_id", "text"), "doc_id", "text",
        queries.toDF("query_id", "qtext"), "query_id", "qtext", k = 2)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // per-query at most k rows, ranks contiguous from 1
    assert(hits.count(_._1 == 10L) == 2)
    assert(hits.filter(_._1 == 10L).map(_._3).toSeq == Seq(1L, 2L))
    // the only docs containing 'durian' are 3 and 5
    assert(hits.filter(_._1 == 20L).map(_._2).toSet == Set(3L, 5L))
    // doc 4 is a one-term doc of a common term; doc 2 is term-dense:
    // doc 2 must outrank doc 1 for query 10 (higher tf, same terms)
    val q10 = Bm25.topK(corpus.toDF("doc_id", "text"), "doc_id", "text",
        queries.toDF("query_id", "qtext"), "query_id", "qtext", k = 10)
      .where($"query_id" === 10L).orderBy("rank")
      .collect().map(_.getLong(1)).toSeq
    assert(q10.indexOf(2L) < q10.indexOf(1L))
  }

  test("only query-term postings reach the scoring join (broadcast side)") {
    val plan = Bm25.topK(corpus.toDF("doc_id", "text"), "doc_id", "text",
      queries.toDF("query_id", "qtext"), "query_id", "qtext", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"query-term side should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), "no cartesian product")
  }
}
