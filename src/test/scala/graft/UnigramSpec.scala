package graft

import org.apache.spark.sql.functions._

import graft.ops.Unigram

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def vocabOf(entries: (String, Double)*) =
    entries.toSeq.toDF("piece", "score")
      .withColumn("cnt", lit(1L))
      .select("piece", "cnt", "score")

  test("DP cost and Viterbi pieces match the hand case") {
    val words = Seq(("abab", 3L), ("ba", 1L)).toDF("word", "wcnt")
    // costs: a=2, b=2, ab=3 -> "abab" best = [ab, ab] (6), not
    // [a,b,ab] (7) or [a,b,a,b] (8); "ba" has no 'ba' piece -> [b,a] 4
    val vocab = vocabOf("a" -> 2.0, "b" -> 2.0, "ab" -> 3.0)
    val costs = Unigram.segmentCosts(words, vocab, 2, 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(costs == Map("abab" -> 6.0, "ba" -> 4.0))
    val byWord = Unigram.viterbiSegments(words, vocab, 2, 8)
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[String](1).toList, r.getDouble(2)))).toMap
    assert(byWord("abab") == ((List("ab", "ab"), 6.0)))
    assert(byWord("ba") == ((List("b", "a"), 4.0)))
  }

  test("equal-cost tie breaks toward the longest last piece") {
    // a=1, b=1, ab=2: "ab" costs 2 both ways -> tie-break picks [ab]
    val words = Seq(("ab", 1L)).toDF("word", "wcnt")
    val vocab = vocabOf("a" -> 1.0, "b" -> 1.0, "ab" -> 2.0)
    val segs = Unigram.viterbiSegments(words, vocab, 2, 8).head()
    assert(segs.getSeq[String](1).toList == List("ab"))
    assert(segs.getDouble(2) == 2.0)
  }

  test("multibyte words segment on code points, not bytes") {
    // ü is 2 UTF-8 bytes, 日 is 3: a byte-indexed DP would misalign
    val words = Seq(("üba", 1L), ("日本", 1L)).toDF("word", "wcnt")
    val vocab = vocabOf("ü" -> 1.0, "b" -> 1.0, "a" -> 1.0, "ba" -> 1.5,
      "日" -> 2.0, "本" -> 2.0, "日本" -> 3.0)
    val byWord = Unigram.viterbiSegments(words, vocab, 2, 8)
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[String](1).toList, r.getDouble(2)))).toMap
    assert(byWord("üba") == ((List("ü", "ba"), 2.5)))
    assert(byWord("日本") == ((List("日本"), 3.0)))
    // uncoverable word (char not in vocab) drops, as before
    val none = Unigram.segmentCosts(
      Seq(("qz", 1L)).toDF("word", "wcnt"), vocab, 2, 8).count()
    assert(none == 0L)
  }

  test("seed vocabulary keeps top multi-char pieces plus ALL chars") {
    val docs = Seq("abc abc ab", "zq").toDF("text")
    val words = Unigram.wordCounts(docs, "text", 24)
    val v = Unigram.seedVocab(words, 3, 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // multi-char by weighted count: ab=3, abc=2, bc=2 -> top2 by
    // (cnt desc, piece asc) = ab, abc
    assert(v.keySet.filter(_.length > 1) == Set("ab", "abc"))
    // every corpus char survives
    assert(Set("a", "b", "c", "z", "q").subsetOf(v.keySet))
    // scores are -ln(cnt/total) over the KEPT set
    val kept = Unigram.seedVocab(words, 3, 2)
    val tot = v.values.sum.toDouble
    val scoreAb = kept.where(col("piece") === "ab").head().getDouble(2)
    assert(math.abs(scoreAb - -math.log(v("ab") / tot)) < 1e-12)
  }

  test("hard EM learns the planted piece and encode uses it") {
    // corpus dominated by "xyxy xy": after seeding + one EM round the
    // piece "xy" must out-score its characters and segment cleanly
    val docs = (1 to 50).map(_ => "xyxy xy xy").toDF("text")
    val vocab = Unigram.train(docs, "text", 2, 4, iters = 1)
    val scores = vocab.collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(scores.contains("xy"))
    assert(scores("xy") < scores("x") && scores("xy") < scores("y"),
      s"xy must be cheaper than its chars: $scores")
    val enc = Unigram.encode(docs.limit(1), "text", "text", vocab, 2)
    val pieces = enc.head().getSeq[String](1).toList
    assert(pieces == List("xy", "xy", "xy", "xy"),
      s"expected clean xy stream, got $pieces")
  }

  test("encode is word-order preserving and flags overlong words") {
    val docs = Seq((1L, "ab ba supercalifragilistic ab"))
      .toDF("id", "text")
    val vocab = vocabOf("a" -> 1.0, "b" -> 1.0, "ab" -> 1.5)
    val out = Unigram.encode(docs, "id", "text", vocab, 2,
      maxWordLen = 8).head()
    val pieces = out.getSeq[String](1).toList
    // overlong word passes through opaque, in position
    assert(pieces == List("ab", "b", "a", "supercalifragilistic", "ab"))
    assert(out.getLong(4) == 5L || out.getLong(3) == 5L) // n_pieces
    val over = out.schema.fieldNames.indexOf("n_overlong")
    assert(out.getLong(over) == 1L)
  }
}
