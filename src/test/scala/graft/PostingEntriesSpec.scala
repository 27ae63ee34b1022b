package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** [[graft.expressions.PostingEntries]] must reproduce
  * `split(trim(text), '\\s+')` term frequencies cell-for-cell —
  * including the empty-token fields a leading tab / trailing newline /
  * all-space document produces under Java split(limit = -1). */
class PostingEntriesSpec extends SparkSpec {
  import spark.implicits._

  private def composed(texts: Seq[String]): Set[(String, String, Long, Long)] =
    texts.zipWithIndex.map { case (t, i) => (i.toString, t) }
      .toDF("id", "t")
      .select(col("id"),
        explode(split(trim(col("t")), "\\s+")).as("token"),
        size(split(trim(col("t")), "\\s+")).cast("long").as("dl"))
      .groupBy(col("id"), col("token"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3), r.getLong(2)))
      .toSet

  private def viaExpr(texts: Seq[String]): Set[(String, String, Long, Long)] =
    graft.ops.Bm25.postings(
        texts.zipWithIndex.map { case (t, i) => (i.toString, t) }
          .toDF("id", "t"), "id", "t")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("hand cases: leading/trailing/internal whitespace, empties, dups") {
    val texts = Seq(
      "a b a", "  spaced  out  ", "\tleading tab", "trailing nl\n",
      "\t\n mixed \r\n runs \t", "", "   ", "\t", "one",
      "dup dup dup  dup", "ab", "ünïcode tökens ünïcode")
    assert(viaExpr(texts) == composed(texts))
  }

  test("property: random whitespace-laced strings match the composed form") {
    val piece = Gen.oneOf("a", "bb", "ccc", "Ж", "日本", "x1", ".",
      " ", "\t", "\n", "\r", "", "\f", "  ", " \t ")
    val textGen = for {
      n <- Gen.choose(0, 30)
      ps <- Gen.listOfN(n, piece)
    } yield ps.mkString
    def sample(g: Gen[String], n: Int, seed: Long): Seq[String] =
      Iterator.iterate(rng.Seed(seed))(_.next)
        .map(s => g.apply(Gen.Parameters.default, s))
        .collect { case Some(v) => v }.take(n).toSeq
    for (seed <- 1L to 4L) {
      val texts = sample(textGen, 80, seed * 7919).distinct
      assert(viaExpr(texts) == composed(texts), s"seed=$seed")
    }
  }
}
