package graft

import org.apache.spark.sql.functions._

import graft.ops.Vocab

class VocabSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a c"),
    (2L, "a b b"),
    (3L, "c a")
  ).toDF("doc_id", "text")

  test("vocabulary counts occurrences and document frequency, ranked") {
    val v = Vocab.vocabulary(docs, "doc_id", "text", topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // a: n=4 df=3; b: n=3 df=2; c: n=2 df=2
    assert(v.toSeq == Seq(("a", 4L, 3L, 1L), ("b", 3L, 2L, 2L),
      ("c", 2L, 2L, 3L)))
  }

  test("vocabulary topN cuts at the deterministic rank boundary") {
    val v = Vocab.vocabulary(docs, "doc_id", "text", topN = 2)
    assert(v.select("token").as[String].collect().toSeq == Seq("a", "b"))
  }

  test("pairCounts scores adjacent pairs like a BPE merge pass") {
    val p = Vocab.pairCounts(docs, "doc_id", "text", topN = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    // doc1: (a,b) (b,a) (a,c); doc2: (a,b) (b,b); doc3: (c,a)
    assert(p(("a", "b")) == 2L)
    assert(p(("b", "a")) == 1L && p(("a", "c")) == 1L
      && p(("b", "b")) == 1L && p(("c", "a")) == 1L)
    // rank 1 is the most frequent pair
    val top = Vocab.pairCounts(docs, "doc_id", "text", 1).head()
    assert((top.getString(0), top.getString(1)) == ("a", "b"))
  }

  test("invertedIndex: df, total tf, and tf-desc/doc-asc posting order") {
    val ix = Vocab.invertedIndex(docs, "doc_id", "text", k = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(ix("a") == ((3L, 4L, "1,2"))) // tf: doc1=2,doc2=1,doc3=1 → 1 then 2 (tie doc asc)
    assert(ix("b") == ((2L, 3L, "2,1"))) // doc2 tf=2 first
    assert(ix("c") == ((2L, 2L, "1,3")))
  }

  test("posting list is capped at k") {
    val ix = Vocab.invertedIndex(docs, "doc_id", "text", k = 1)
      .where($"token" === "a").head()
    assert(ix.getString(3) == "1")
    assert(ix.getLong(1) == 3L) // df still counts ALL postings
  }
}
