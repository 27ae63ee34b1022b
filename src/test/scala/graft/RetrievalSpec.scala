package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Retrieval, Sampling}

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana cherry"),
    (2L, "apple apple banana banana banana"),
    (3L, "durian elderberry fig grape"),
    (4L, "apple"),
    (5L, "banana cherry durian elderberry"))

  test("tfidfSearchTopK ranks term-matching docs and is partition-independent") {
    val docs = corpus.toDF("doc_id", "text")
    val qs = Seq((10L, "durian fig"), (20L, "apple")).toDF("qid", "qtext")
    val got = Retrieval.tfidfSearchTopK(docs, "doc_id", "text",
      qs, "qid", "qtext", k = 3)
    val rows = got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // doc 3 holds both 'durian' and the corpus's only 'fig' -> top hit
    val q10 = rows.filter(_._1 == 10L).sortBy(_._4)
    assert(q10.head._2 == 3L)
    // every 'apple' doc scores for q20; scores within [0, 1] + epsilon
    val q20 = rows.filter(_._1 == 20L)
    assert(q20.map(_._2).toSet.subsetOf(Set(1L, 2L, 4L)))
    assert(rows.forall(r => r._3 >= -1e-9 && r._3 <= 1.0 + 1e-9))
    // deterministic under repartitioning
    val again = Retrieval.tfidfSearchTopK(docs.repartition(7), "doc_id",
      "text", qs, "qid", "qtext", k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.sortBy(r => (r._1, r._4)).toSeq
      == again.sortBy(r => (r._1, r._4)).toSeq)
  }

  test("hybridTopK inline equals the persisted-postings path") {
    val docs = corpus.toDF("doc_id", "text")
    val qs = Seq((1L, "apple banana"), (2L, "durian")).toDF("qid", "qtext")
    val inline = graft.ops.Retrieval.hybridTopK(docs, "doc_id", "text",
      qs, "qid", "qtext", kPerLeg = 4, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // materialize the postings index to parquet, query from it
    val idx = java.nio.file.Files.createTempDirectory("postidx").toString
    graft.ops.Bm25.postings(docs, "doc_id", "text")
      .write.mode("overwrite").parquet(idx)
    val fromIndex = graft.ops.Retrieval.hybridTopKFromPostings(
      spark.read.parquet(idx), "doc_id", qs, "qid", "qtext",
      kPerLeg = 4, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(inline.sortBy(r => (r._1, r._4)).toSeq
      == fromIndex.sortBy(r => (r._1, r._4)).toSeq)
    assert(inline.nonEmpty)
  }

  test("hybridTopK inline equals postings path on a corpus with null/empty text") {
    // null-text and empty/whitespace-only docs produce NO posting rows
    // (explode drops them), so the inline path's corpus stats (N,
    // avgdl) must exclude them too or idf silently diverges
    val docs = (corpus ++ Seq((100L, null.asInstanceOf[String]),
      (101L, ""), (102L, "   \t "))).toDF("doc_id", "text")
    val qs = Seq((1L, "apple banana")).toDF("qid", "qtext")
    val inline = graft.ops.Retrieval.hybridTopK(docs, "doc_id", "text",
      qs, "qid", "qtext", kPerLeg = 4, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val fromPost = graft.ops.Retrieval.hybridTopKFromPostings(
      graft.ops.Bm25.postings(docs, "doc_id", "text"), "doc_id",
      qs, "qid", "qtext", kPerLeg = 4, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(inline.nonEmpty)
    assert(inline.sortBy(r => (r._1, r._4)).toSeq
      == fromPost.sortBy(r => (r._1, r._4)).toSeq)
  }

  test("hybridTopKFromIndex (full persisted index) equals inline") {
    val docs = corpus.toDF("doc_id", "text")
    val qs = Seq((1L, "apple banana"), (2L, "durian")).toDF("qid", "qtext")
    val inline = graft.ops.Retrieval.hybridTopK(docs, "doc_id", "text",
      qs, "qid", "qtext", kPerLeg = 4, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val idx = java.nio.file.Files.createTempDirectory("hybidx").toString
    graft.ops.Retrieval.writeHybridIndex(docs, "doc_id", "text", idx)
    val served = graft.ops.Retrieval.hybridTopKFromIndex(
      spark, idx, "doc_id", qs, "qid", "qtext", kPerLeg = 4, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(inline.sortBy(r => (r._1, r._4)).toSeq
      == served.sortBy(r => (r._1, r._4)).toSeq)
    // a query with an out-of-vocabulary term still ranks on its known
    // terms (the pushed-down IN filter must not error on zero hits)
    val oov = Seq((9L, "banana zzz_unseen")).toDF("qid", "qtext")
    val got = graft.ops.Retrieval.hybridTopKFromIndex(
      spark, idx, "doc_id", oov, "qid", "qtext", kPerLeg = 4, k = 3)
    assert(got.count() > 0)
  }

  test("phraseSearch counts consecutive matches, overlaps included") {
    val docs = Seq(
      (1L, "a b a b a"),            // "a b a" at pos 1 and 3 (overlap)
      (2L, "x a b a y"),            // one match at pos 2
      (3L, "a x b x a"),            // words present, never consecutive
      (4L, "b a a b nothing here")) // no match
      .toDF("doc_id", "text")
    val hits = Retrieval.phraseSearch(docs, "doc_id", "text", "a b a")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(hits == Map(1L -> ((2L, 1L)), 2L -> ((1L, 2L))))
    // single-word phrase degenerates to a token-occurrence count
    val one = Retrieval.phraseSearch(docs, "doc_id", "text", "a")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(1L -> 3L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  test("rrfFuse merges ranks, handles one-list-only docs, respects k") {
    val a = Seq((1L, 100L, 1L), (1L, 101L, 2L), (1L, 102L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 101L, 1L), (1L, 103L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(a, b, "doc_id", k = 10, c = 60)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._3)
    def rrf(xs: Double*) = BigDecimal(xs.sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = Map(
      100L -> rrf(1.0 / 61),            // a only
      101L -> rrf(1.0 / 62, 1.0 / 61),  // both lists -> top fused
      102L -> rrf(1.0 / 63),            // a only
      103L -> rrf(1.0 / 62))            // b only
    assert(got.map(x => x._1 -> x._2).toMap == expect)
    assert(got.head._1 == 101L, "doc in both lists must rank first")
    // ranks are 1..n dense
    assert(got.map(_._3).toSeq == (1L to 4L))
    val capped = Retrieval.rrfFuse(a, b, "doc_id", k = 2)
    assert(capped.count() == 2)
  }

  test("interleaveBySource emits a round-robin total order") {
    val df = (1L to 90L).map(i => (i, s"src${i % 3}")).toDF("id", "source")
    val got = Sampling.interleaveBySource(df, "source", "id", "s1")
      .orderBy("pos")
      .select("source", "rn", "pos").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 90)
    // equal-size sources: positions are exactly 0..89 and sources cycle
    assert(got.map(_._3).toSeq == (0L to 89L))
    assert(got.map(_._1).take(6).toSeq
      == Seq("src0", "src1", "src2", "src0", "src1", "src2"))
    // each source's rn sequence is 1..30 in pos order
    got.groupBy(_._1).foreach { case (_, xs) =>
      assert(xs.sortBy(_._3).map(_._2).toSeq == (1L to 30L))
    }
    // deterministic under repartitioning
    val again = Sampling.interleaveBySource(df.repartition(11), "source",
      "id", "s1").orderBy("pos").select("source", "rn", "pos").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == again.toSeq)
  }

  test("interleaveBySource keeps NULL-source rows as their own source") {
    // a mixing ORDER must never silently lose corpus rows
    val df = Seq[(Long, String)]((1L, "a"), (2L, null), (3L, "b"),
      (4L, null), (5L, ""), (6L, "a")).toDF("id", "source")
    val got = Sampling.interleaveBySource(df, "source", "id", "s1")
      .select("id", "source", "pos").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
    assert(got.length == 6, s"rows lost: ${got.toSeq}")
    assert(got.count(_._2.isEmpty) == 2)       // both null-source rows kept
    assert(got.map(_._3).distinct.length == 6) // pos still a total order
    // NULL and empty-string sources are distinct interleave slots
    val slots = got.map(x => x._2 -> x._3 % 4).distinct
    assert(slots.count(_._1.isEmpty) == 1 && slots.count(_._1.contains("")) == 1)
  }

  test("leakageSafeSplit keeps every near-dup cluster in one split") {
    // 3 clusters of near-identical docs + loners
    val base = "the quick brown fox jumps over the lazy dog again and again "
    val docs = (
      (1L to 4L).map(i => (i, base * 3 + s"tail$i")) ++       // cluster A
      (11L to 13L).map(i => (i, ("zebra yak xylophone walrus " * 8) + s"t$i")) ++
      (21L to 22L).map(i => (i, ("mango nectarine orange papaya " * 8) + s"e$i")) ++
      Seq((31L, "completely unrelated text about nothing in particular here today"),
          (32L, "another loner document speaking of entirely different topics"))
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      n = 3, threshold = 0.5)
    val split = Dedup.leakageSafeSplit(docs.select(col("doc_id")), "doc_id",
      pairs, 0.3, 0.3, "s1")
    val rows = split.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("group_id"),
        r.getAs[String]("split")))
    assert(rows.length == 11)
    // every group maps to exactly one split
    rows.groupBy(_._2).foreach { case (g, xs) =>
      assert(xs.map(_._3).distinct.length == 1,
        s"group $g straddles splits: ${xs.mkString(",")}")
    }
    // the planted clusters ARE grouped (members share a group_id)
    def groupOf(id: Long) = rows.find(_._1 == id).get._2
    assert((1L to 4L).map(groupOf).distinct.length == 1)
    assert((11L to 13L).map(groupOf).distinct.length == 1)
    // loners are their own group
    assert(groupOf(31L) == 31L && groupOf(32L) == 32L)
  }

  test("noveltyScores: originals score 1.0, exact late duplicates 0.0") {
    val a = "one two three four five six seven eight nine ten"
    val b = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, a),                        // first owner of its 5-grams
      (2L, b),                        // first owner
      (3L, a),                        // exact dup of 1 -> novelty 0
      (4L, a + " " + b)               // concatenation -> partially novel
    ).toDF("doc_id", "text")
    val got = Dedup.noveltyScores(docs, "doc_id", "text", n = 5)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty"))).toMap
    assert(got(1L) == ((6L, 6L, 1.0)))
    assert(got(2L) == ((6L, 6L, 1.0)))
    assert(got(3L) == ((6L, 0L, 0.0)))
    // doc 4: 16 5-grams; the 6+6 from docs 1/2 are owned by them; only
    // the 4 bridging grams (spanning the junction) are novel
    assert(got(4L) == ((16L, 4L, 0.25)))
  }
}
