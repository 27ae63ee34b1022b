package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{Scd, Tfidf}

class ScdTfidfSimSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("runIntervals collapses runs, re-opens on change-back, leaves last open") {
    val log = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "A"),
      (1L, ts("2024-01-01 11:00:00"), 2L, "A"), // same run
      (1L, ts("2024-01-01 12:00:00"), 3L, "B"), // change
      (1L, ts("2024-01-01 13:00:00"), 4L, "A"), // change BACK -> new run
      (2L, ts("2024-01-02 09:00:00"), 5L, "C")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Scd.runIntervals(log, "user_id", Seq("ts", "event_id"),
        "event_type", "ts")
      .orderBy("user_id", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).toString, Option(r.getTimestamp(3)).map(_.toString)))
    assert(got.toSeq == Seq(
      (1L, "A", "2024-01-01 10:00:00.0", Some("2024-01-01 12:00:00.0")),
      (1L, "B", "2024-01-01 12:00:00.0", Some("2024-01-01 13:00:00.0")),
      (1L, "A", "2024-01-01 13:00:00.0", None),
      (2L, "C", "2024-01-02 09:00:00.0", None)))
  }

  test("runIntervals intervals tile each key's timeline") {
    val dir = "/root/testdata/sf0.001"
    val events = graft.etl.Tables.table(spark, dir, "events")
    val iv = Scd.runIntervals(events, "user_id", Seq("ts", "event_id"),
      "event_type", "ts")
    // exactly one open interval per user
    val opens = iv.groupBy("user_id")
      .agg(sum(when(col("valid_to").isNull, 1).otherwise(0)).as("o"))
    assert(opens.where(col("o") =!= 1).isEmpty)
    // each interval's valid_to equals the next interval's valid_from
    // (by construction of lead, asserted via self-join)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from")
    val chained = iv.withColumn("nxt", lead(col("valid_from"), 1).over(w))
    assert(chained.where(col("valid_to").isNotNull &&
      col("valid_to") =!= col("nxt")).isEmpty)
    // adjacent intervals never carry the same attribute value
    val adj = iv.withColumn("nxt_attr", lead(col("event_type"), 1).over(w))
    assert(adj.where(col("nxt_attr").isNotNull &&
      col("nxt_attr") === col("event_type")).isEmpty)
  }

  test("similarDocs ranks lexical near-matches by exact capped-space cosine") {
    val docs = Seq(
      (1L, "apple banana cherry durian elderberry"),
      (2L, "apple banana cherry durian fig"),      // 4/5 overlap with 1
      (3L, "apple banana grape honeydew kiwi"),    // 2/5 overlap with 1
      (4L, "zebra yak xerus wombat vole")          // disjoint
    ).toDF("doc_id", "text")
    val got = Tfidf.similarDocs(docs, "doc_id", "text", maxDf = 10, k = 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // doc 1's best match is 2, then 3; doc 4 matches nothing
    val byDoc = got.groupBy(_._1)
    assert(byDoc(1L).map(x => (x._2, x._3)).toSeq == Seq((2L, 1L), (3L, 2L)))
    assert(!byDoc.contains(4L))
    // symmetric: 2's best match is 1
    assert(byDoc(2L).head._2 == 1L)
    // scores are true cosines in the capped space: identical docs -> 1.0
    // (a third doc keeps the twins' terms below df = N, i.e. idf > 0)
    val twins = Seq((1L, "aa bb cc"), (2L, "aa bb cc"), (3L, "dd ee"))
      .toDF("doc_id", "text")
    val s = Tfidf.similarDocs(twins, "doc_id", "text", 10, 1)
      .select("score").as[Double].collect()
    assert(s.nonEmpty && s.forall(v => math.abs(v - 1.0) < 1e-9))
    // a corpus where every term is in every doc (all idf 0) is empty,
    // not an error
    val flat = Seq((1L, "x y"), (2L, "x y")).toDF("doc_id", "text")
    assert(Tfidf.similarDocs(flat, "doc_id", "text", 10, 1).isEmpty)
  }

  test("applyChangelog: last op wins, tombstones drop the key") {
    // k1: insert then update -> final = update payload
    // k2: update then delete -> absent
    // k3: delete then re-insert (later seq) -> reappears
    // rows arrive OUT of order; seq ties broken by the second col
    val log = Seq(
      ("k1", 2L, 0L, "U", 20.0), ("k1", 1L, 0L, "I", 10.0),
      ("k2", 1L, 0L, "U", 5.0), ("k2", 2L, 0L, "D", 0.0),
      ("k3", 3L, 1L, "I", 7.0), ("k3", 3L, 0L, "D", 0.0))
      .toDF("k", "seq", "sub", "op", "v")
    val out = Scd.applyChangelog(log, "k", Seq("seq", "sub"), "op", "D",
        Seq("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map("k1" -> ((2L, 0L, 20.0)), "k3" -> ((3L, 1L, 7.0))))
    // partitioning-independent
    val again = Scd.applyChangelog(log.repartition(5), "k",
        Seq("seq", "sub"), "op", "D", Seq("v"))
      .collect().map(_.getString(0)).sorted
    assert(again.toSeq == Seq("k1", "k3"))
  }
}
