package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Adversarial-unicode property fuzzing for the two byte-offset
  * expressions ([[graft.expressions.SuffixPrefixes]],
  * [[graft.expressions.UnigramSegment]]): random strings drawn from a
  * pool spanning 1/2/3/4-byte UTF-8 codepoints (incl. astral-plane
  * surrogate pairs and a combining mark) are checked cell-for-cell
  * against an INDEPENDENT codepoint-array reference implementation
  * (java.lang.String codePoints — no UTF-8 byte arithmetic at all),
  * plus, for SuffixPrefixes, against the composed
  * `explode(sequence)` + `substring` form it replaced.
  *
  * Empty-input semantics are asserted explicitly: SuffixPrefixes
  * yields an empty array for "" (matching DuckDB `range(1,1)`; the
  * composed Spark form spuriously yields `sequence(1,0) = [1,0]`),
  * and UnigramSegment yields NULL for "" (the frame DP produced a
  * cost-0 row; empty words cannot occur post-tokenisation and NULL is
  * the honest "no segmentation" answer). */
class UnicodeExprPropertySpec extends SparkSpec {
  import spark.implicits._

  // 1-byte ASCII, 2-byte Latin/Cyrillic, 3-byte CJK/symbols,
  // 4-byte astral (surrogate pairs in UTF-16, 4 bytes in UTF-8),
  // and a bare combining mark (zero-width, valid codepoint)
  private val pool: Seq[String] = Seq(
    "a", "b", "z", "Q", "0", "9", " ", ".", "-",
    "é", "ß", "ñ", "б", "ü",
    "日", "本", "語", "€", "✓", "한",
    new String(Character.toChars(0x1F600)), // emoji
    new String(Character.toChars(0x1D518)), // math fraktur
    new String(Character.toChars(0x10348)), // Gothic hwair
    "́")                               // combining acute

  private def sample[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    Iterator.iterate(rng.Seed(seed))(_.next)
      .map(s => g.apply(Gen.Parameters.default, s))
      .collect { case Some(v) => v }.take(n).toSeq

  private val textGen: Gen[String] = for {
    len <- Gen.frequency(1 -> Gen.const(0), 9 -> Gen.choose(1, 40))
    cps <- Gen.listOfN(len, Gen.oneOf(pool))
  } yield cps.mkString

  // ---- independent codepoint-array references (no byte math) ----

  private def cpArray(s: String): Array[Int] = s.codePoints().toArray

  private def refPrefixes(text: String, k: Int): Seq[String] = {
    val cps = cpArray(text)
    cps.indices.map(i => new String(cps, i, math.min(i + k, cps.length) - i))
  }

  private def refSegment(word: String, vocab: Map[String, Double],
      maxPieceLen: Int): Option[(Double, List[String])] = {
    val cps = cpArray(word)
    val n = cps.length
    if (n == 0) return None
    def piece(s: Int, e: Int): String = new String(cps, s, e - s)
    val dp = Array.fill(n + 1)(Double.PositiveInfinity)
    dp(0) = 0.0
    var p = 1
    while (p <= n) {
      var s = math.max(0, p - maxPieceLen)
      while (s < p) {
        if (dp(s) != Double.PositiveInfinity) vocab.get(piece(s, p)).foreach {
          w => val cand = dp(s) + w; if (cand < dp(p)) dp(p) = cand
        }
        s += 1
      }
      p += 1
    }
    if (dp(n) == Double.PositiveInfinity) return None
    // smallest exactly-optimal split from the end (longest last piece)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var cur = n
    while (cur > 0) {
      var s = math.max(0, cur - maxPieceLen)
      var stepped = false
      while (!stepped && s < cur) {
        if (dp(s) != Double.PositiveInfinity)
          vocab.get(piece(s, cur)) match {
            case Some(w) if dp(s) + w == dp(cur) =>
              out.prepend(piece(s, cur)); cur = s; stepped = true
            case _ => ()
          }
        s += 1
      }
      assert(stepped, s"reference DP stuck at $cur for '$word'")
    }
    Some((dp(n), out.toList))
  }

  // ---- SuffixPrefixes ----

  private def prefixesViaExpr(texts: Seq[String], k: Int)
      : Map[String, Seq[String]] =
    texts.distinct.toDF("t")
      .select(col("t"), graft.expressions.SuffixPrefixes(col("t"), k).as("a"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap

  private def composed(texts: Seq[String], k: Int) =
    texts.distinct.toDF("t")
      .withColumn("pos", explode(sequence(lit(1), length(col("t")))))
      .select(col("t"), col("pos"), expr(s"substring(t, pos, $k)").as("c"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSet

  test("property: SuffixPrefixes equals the codepoint reference on random unicode") {
    for (seed <- 1L to 3L; k <- Seq(1, 2, 7, 32)) {
      val texts = sample(textGen, 80, seed * 31 + k)
      val got = prefixesViaExpr(texts, k)
      texts.distinct.foreach { t =>
        assert(got(t) == refPrefixes(t, k),
          s"k=$k text=${t.map(c => f"\\u$c%04x").mkString} ")
      }
    }
  }

  test("property: SuffixPrefixes equals the composed substring form (non-empty)") {
    for (seed <- 10L to 12L; k <- Seq(2, 32)) {
      val texts = sample(textGen, 60, seed * 17 + k).filter(_.nonEmpty)
      val viaExpr = texts.distinct.toDF("t")
        .select(col("t"),
          posexplode(graft.expressions.SuffixPrefixes(col("t"), k)))
        .select(col("t"), (col("pos") + 1).as("pos"), col("col").as("c"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
        .toSet
      assert(viaExpr == composed(texts, k), s"seed=$seed k=$k")
    }
  }

  test("empty string: expression yields [], composed form spuriously yields [1,0] rows") {
    // the documented divergence — and the expression side is the one
    // matching DuckDB range(1, len+1)
    assert(prefixesViaExpr(Seq(""), 4)("") == Seq.empty[String])
    assert(composed(Seq(""), 4) == Set(("", 1, ""), ("", 0, "")))
  }

  // ---- UnigramSegment ----

  test("property: UnigramSegment equals the codepoint reference DP, bit-exact") {
    for (seed <- 1L to 5L) {
      val maxPieceLen = 1 + (seed % 4).toInt // 2..5 and back to 1
      // truncate on CODEPOINT boundaries — String.take can split a
      // surrogate pair, and a lone surrogate doesn't round-trip UTF-8
      def takeCp(s: String, n: Int): String = {
        val cps = cpArray(s); new String(cps, 0, math.min(n, cps.length))
      }
      val words = sample(textGen, 60, seed * 101).map(takeCp(_, 24)) :+ ""
      // vocab: every pool char (so most words are coverable) minus a
      // few dropped ones (so some words are NOT coverable), plus
      // random multi-codepoint substrings of the generated words
      val dropped = sample(Gen.oneOf(pool), 3, seed * 7).toSet
      val chars = pool.filterNot(dropped).distinct
      val subs = words.filter(_.nonEmpty).flatMap { w =>
        val cps = cpArray(w)
        if (cps.length < 2) Nil
        else {
          val s = (seed % math.max(1, cps.length - 1)).toInt
          val e = math.min(cps.length, s + math.max(2, maxPieceLen))
          Seq(new String(cps, s, e - s))
        }
      }.distinct.take(20)
      val piecesAll = (chars ++ subs).distinct
        .filter(p => cpArray(p).length <= maxPieceLen)
      val scoreGen = Gen.choose(1, 9999).map(_ / 100.0)
      val scores = sample(scoreGen, piecesAll.length, seed * 13)
      val vocab = piecesAll.zip(scores).toMap
      val expect = words.distinct
        .map(w => w -> refSegment(w, vocab, maxPieceLen)).toMap

      val seg = graft.expressions.UnigramSegment(col("w"),
        piecesAll, piecesAll.map(vocab), maxPieceLen)
      val rows = words.distinct.toDF("w")
        .select(col("w"), seg.as("s"))
        .select(col("w"), col("s.cost"), col("s.pieces"))
        .collect()
      rows.foreach { r =>
        val w = r.getString(0)
        expect(w) match {
          case None =>
            assert(r.isNullAt(1) && r.isNullAt(2),
              s"expected NULL for '$w' (seed=$seed)")
          case Some((cost, pieces)) =>
            assert(!r.isNullAt(1), s"unexpected NULL for '$w' (seed=$seed)")
            // bit-exact double equality is the contract
            assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
              java.lang.Double.doubleToLongBits(cost),
              s"cost mismatch for '$w': ${r.getDouble(1)} vs $cost")
            assert(r.getSeq[String](2).toList == pieces,
              s"pieces mismatch for '$w' (seed=$seed)")
        }
      }
    }
  }
}
