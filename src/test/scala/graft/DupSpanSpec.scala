package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Duplicate-span (substring-level) dedup: positional n-gram hashing
  * approximating suffix-array dedup. Span positions are 0-based
  * inclusive token indexes. */
class DupSpanSpec extends SparkSpec {
  import spark.implicits._

  // a shared 12-token run planted inside two otherwise-distinct docs,
  // one doc repeating an 8-token run within itself, one clean doc,
  // and an exact-duplicate pair (fully-covered docs)
  private val shared = (1 to 12).map(i => s"s$i").mkString(" ")
  private val rep = (1 to 8).map(i => s"r$i").mkString(" ")
  private lazy val docs = Seq(
    (1L, s"a1 a2 a3 a4 a5 $shared a6 a7 a8"),
    (2L, s"b1 b2 $shared b3"),
    (3L, (1 to 20).map(i => s"c$i").mkString(" ")),
    (4L, s"$rep x9 $rep"),
    (5L, (1 to 10).map(i => s"d$i").mkString(" ")),
    (6L, (1 to 10).map(i => s"d$i").mkString(" "))
  ).toDF("doc_id", "text")

  private lazy val spans =
    Dedup.duplicateSpans(docs, "doc_id", "text", n = 8, minOccurrences = 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("span_tokens")))
      .toSeq

  test("cross-doc shared run merges overlapping gram hits into one maximal span") {
    assert(spans.filter(_._1 == 1L) == Seq((1L, 5L, 16L, 12L)))
    assert(spans.filter(_._1 == 2L) == Seq((2L, 2L, 13L, 12L)))
  }

  test("within-doc repetition is flagged; clean docs produce no spans") {
    assert(spans.filter(_._1 == 4L).map(t => (t._2, t._3)).sorted ==
      Seq((0L, 7L), (9L, 16L)))
    assert(spans.forall(_._1 != 3L))
  }

  test("exact-duplicate pair is fully covered") {
    assert(spans.filter(_._1 == 5L) == Seq((5L, 0L, 9L, 10L)))
    assert(spans.filter(_._1 == 6L) == Seq((6L, 0L, 9L, 10L)))
  }

  test("docs shorter than n yield no grams and no spans") {
    val short = Seq((1L, "one two three"), (2L, "one two three")).toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(short, "doc_id", "text", n = 8).isEmpty)
  }

  test("stripDuplicateSpans removes spans, preserves rows, empties covered docs") {
    val out = Dedup.stripDuplicateSpans(docs, "doc_id", "text",
        n = 8, minOccurrences = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    assert(out.size == 6)
    assert(out(1L) == "a1 a2 a3 a4 a5 a6 a7 a8")
    assert(out(2L) == "b1 b2 b3")
    assert(out(3L) == (1 to 20).map(i => s"c$i").mkString(" "))
    assert(out(4L) == "x9")
    assert(out(5L) == "" && out(6L) == "")
  }
}
