package graft

import org.apache.spark.sql.functions._

import graft.expressions.CommonPrefixLen
import graft.ops.Suffix

class SuffixSpec extends SparkSpec {
  import spark.implicits._

  test("banana suffix ranks match the textbook order") {
    // suffixes sorted: a, ana, anana, banana, na, nana
    // -> rank by pos: 1:banana=4 2:anana=3 3:nana=6 4:ana=2 5:na=5 6:a=1
    val got = Suffix.suffixRanks(Seq((1L, "banana")).toDF("id", "text"),
        "id", "text")
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(got == Map(1 -> 4L, 2 -> 3L, 3 -> 6L, 4 -> 2L, 5 -> 5L, 6 -> 1L))
  }

  test("identical suffixes across docs share a DENSE rank") {
    val got = Suffix.suffixRanks(
        Seq((1L, "ab"), (2L, "ab")).toDF("id", "text"), "id", "text")
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    // suffixes: ab(x2) -> rank 1, b(x2) -> rank 2 (dense)
    assert(got((1L, 1)) == 1L && got((2L, 1)) == 1L)
    assert(got((1L, 2)) == 2L && got((2L, 2)) == 2L)
  }

  test("ranks agree with a brute-force string sort on random docs") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 30L).map(i =>
      (i, (1 to (3 + rnd.nextInt(20)))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString))
    val got = Suffix.suffixRanks(docs.toDF("id", "text"), "id", "text")
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    // brute force: every suffix string, sorted, dense-ranked
    val suffixes = docs.flatMap { case (id, t) =>
      (1 to t.length).map(p => ((id, p), t.substring(p - 1))) }
    val rankOf = suffixes.map(_._2).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    val want = suffixes.map { case (k, s) => k -> rankOf(s) }.toMap
    assert(got == want, {
      val bad = want.collect { case (k, v) if got.get(k) != Some(v) =>
        s"$k want $v got ${got.get(k)}" }
      bad.take(5).mkString("; ")
    })
    // budget 0 forces the pure doubling-loop path (no one-shot
    // finish) — it must reach the identical ranks
    val loop = Suffix.suffixRanks(docs.toDF("id", "text"), "id", "text",
        finishBudgetChars = 0L)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    assert(loop == want)
  }

  test("common_prefix_len: ASCII, multi-byte boundary, and nulls") {
    val df = Seq(
      ("abcdef", "abcxyz"),   // 3
      ("same", "same"),       // 4
      ("", "anything"),       // 0
      ("caféX", "caféY"), // 4 (e-acute fully matches)
      ("aéb", "aèb")) // 1 (0xC3 lead matches, cont byte differs)
      .toDF("a", "b")
    val got = df.select(CommonPrefixLen(col("a"), col("b"))).as[Long]
      .collect().toSeq
    assert(got == Seq(3L, 4L, 0L, 4L, 1L))
  }

  test("longestRepeats finds the planted long duplicate") {
    val docs = Seq(
      (1L, "xxTHEREPEATEDSEGMENTxx"),
      (2L, "yyTHEREPEATEDSEGMENTyy"),
      (3L, "zzz")).toDF("id", "text")
    val top = Suffix.longestRepeats(docs, "id", "text", k = 3).head()
    assert(top.getLong(0) >= "THEREPEATEDSEGMENT".length,
      s"lcp=${top.getLong(0)}")
    assert(top.getString(1).contains("THEREPEATEDSEGMENT"),
      s"repeat=${top.getString(1)}")
  }
}
