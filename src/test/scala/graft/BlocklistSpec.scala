package graft

import org.apache.spark.sql.functions._

import graft.ops.Blocklist

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String, phrases: Seq[String]): Seq[String] =
    Seq(Tuple1(text)).toDF("t")
      .select(Blocklist.matches(col("t"), phrases).as("m"))
      .head().getSeq[String](0)

  test("classic suffix-overlap case (ushers): failure links fire") {
    // "ushers" contains she, he, hers — found only via failure
    // transitions, never by restarting the scan
    assert(run("ushers", Seq("he", "she", "his", "hers"))
      == Seq("he", "she", "hers"))
  }

  test("matches report in phrase-list order, each phrase once") {
    assert(run("abc abc xyz", Seq("xyz", "abc")) == Seq("xyz", "abc"))
    assert(run("aaaa", Seq("aa")) == Seq("aa"))
  }

  test("boundary positions and phrase-inside-phrase") {
    assert(run("start middle end", Seq("start", "end", "t m")) ==
      Seq("start", "end", "t m"))
    assert(run("cocoa", Seq("cocoa", "coco", "oa")) ==
      Seq("cocoa", "coco", "oa"))
  }

  test("no match and empty text yield empty arrays; null stays null") {
    assert(run("nothing here", Seq("zebra")) == Seq.empty)
    assert(run("", Seq("zebra")) == Seq.empty)
    val r = Seq(Tuple1(null: String)).toDF("t")
      .select(Blocklist.matches(col("t"), Seq("x")).as("m")).head()
    assert(r.isNullAt(0))
  }

  test("automaton equals the composed contains form on a real corpus") {
    val docs = graft.etl.Tables.table(spark,
      "/root/testdata/sf0.001", "documents")
    val phrases = Seq("scan slow", "slow fast table", "agg row scan",
      "table part", "spark", "never matches anything")
    val diff = docs.select(col("doc_id"),
        Blocklist.matches(col("text"), phrases).as("a"),
        Blocklist.matchesComposed(col("text"), phrases).as("b"))
      .where(not(col("a") === col("b")))
    assert(diff.isEmpty, diff.take(3).mkString(","))
  }

  test("multi_match is callable from SQL via GraftExtensions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
        "SELECT multi_match('ushers', 'he', 'she', 'his', 'hers') AS m")
      .head().getSeq[String](0)
    assert(r == Seq("he", "she", "hers"))
  }

  test("screen flags and counts; large phrase list stays linear-ish") {
    val phrases = (1 to 2000).map(i => s"phrase$i needle") :+ "table"
    val docs = graft.etl.Tables.table(spark,
      "/root/testdata/sf0.001", "documents")
    val out = Blocklist.screen(docs, "text", phrases)
    val n = out.where(col("blocked")).count()
    assert(n > 0) // "table" occurs in the corpus
    assert(out.where(col("n_matched") > 1).count() == 0)
  }
}
