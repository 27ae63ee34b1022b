package graft

import org.apache.spark.sql.functions._

import graft.ops.Winnow

/** Winnowing fingerprint selection (ops.Winnow): exact agreement with
  * a brute-force local reference, the paper's density and coverage
  * guarantees, and MOSS-style match behavior on planted duplicates. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8
  private val W = 4

  /** Brute-force local reference of the robust-winnowing rule:
    * rightmost minimal hash per window, distinct (pos, hash). */
  private def localWinnow(text: String): Set[(Long, Long)] = {
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    val n = text.length - K + 1
    val hs = (1 to n).map(i => h32(text.substring(i - 1, i - 1 + K)))
    (1 to n - W + 1).map { s =>
      // rightmost min in hs[s-1 .. s+W-2]
      val win = (s until s + W).map(i => (hs(i - 1), i))
      val m = win.minBy(_._1)._1
      val pos = win.filter(_._1 == m).map(_._2).max
      (pos.toLong, hs(pos - 1))
    }.toSet
  }

  /** Brute-force reference of the paper's ROBUST rule (§4): among
    * minimal hashes prefer the previous window's selection while it
    * stays in the window, else rightmost. */
  private def localRobust(text: String): Set[(Long, Long)] = {
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    val n = text.length - K + 1
    val hs = (1 to n).map(i => h32(text.substring(i - 1, i - 1 + K)))
    var prev = -1
    val sel = scala.collection.mutable.LinkedHashSet[(Long, Long)]()
    for (s <- 1 to n - W + 1) {
      val win = (s until s + W).map(i => (hs(i - 1), i))
      val m = win.minBy(_._1)._1
      val pos =
        if (prev >= s && prev < s + W && hs(prev - 1) == m) prev
        else win.filter(_._1 == m).map(_._2).max
      prev = pos
      sel += ((pos.toLong, hs(pos - 1)))
    }
    sel.toSet
  }

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "a completely different sentence with other words entirely here"),
    (3L, "short but ok"),
    (4L, "xy")) // below k+w-1: no full window, must drop
    .toDF("doc_id", "text")

  test("selected fingerprints match the brute-force rightmost-min reference") {
    val got = Winnow.selectedFingerprints(docs, "doc_id", "text", K, W)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(r => (r._2, r._3)).toSet }
    val texts = docs.as[(Long, String)].collect().toMap
    for (id <- Seq(1L, 2L, 3L)) {
      assert(got(id) == localWinnow(texts(id)), s"doc $id selection differs")
    }
    assert(!got.contains(4L), "sub-window document must be dropped")
  }

  test("robust selection matches its brute-force reference and thins ties") {
    // heavy hash ties: a k-length unit repeated, plus mixed repetitive
    // and natural text, plus the real corpus
    val rep = Seq(
      (1L, "a" * 40), // every k-gram identical: all windows fully tied
      (2L, "ababababababababababababababab"),
      (3L, "the same phrase the same phrase the same phrase again"),
      (4L, "plain natural sentence with no repetition to speak of"))
      .toDF("doc_id", "text")
    val texts = rep.as[(Long, String)].collect().toMap
    val got = Winnow.selectedFingerprintsRobust(rep, "doc_id", "text", K, W)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(r => (r._2, r._3)).toSet }
    for (id <- texts.keys)
      assert(got(id) == localRobust(texts(id)), s"doc $id robust selection differs")
    // strictly fewer fingerprints than rightmost-min on the tied docs,
    // never more anywhere
    val right = Winnow.selectedFingerprints(rep, "doc_id", "text", K, W)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.length).toMap
    assert(got(1L).size < right(1L) && got(2L).size < right(2L),
      s"robust must thin tied selections: ${got.view.mapValues(_.size).toMap} vs $right")
    assert(texts.keys.forall(id => got(id).size <= right(id)))
    // the real corpus agrees with the reference doc-by-doc
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val realTexts = real.select("doc_id", "text").as[(Long, String)].collect().toMap
    val realGot = Winnow.selectedFingerprintsRobust(real, "doc_id", "text", K, W)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(r => (r._2, r._3)).toSet }
    for ((id, t) <- realTexts if t.length >= K + W - 1)
      assert(realGot(id) == localRobust(t), s"real doc $id differs")
  }

  test("single-eval expression equals the composed fold form bit-for-bit") {
    // real corpus + planted edge shapes: multibyte text (code-point
    // offsets), repetitive text (dense hash ties), exact one-window
    // length, below-window length
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val edge = Seq(
      (9000001L, "héllo wörld ünïcode — ßpän σπαν 文字列のテスト and more ascii tail"),
      (9000002L, "ababababababababababababababababababab"),
      (9000003L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
      (9000004L, "exactly11ch"), // k+w-1 = 11: one full window
      (9000005L, "tenchars!!".take(10)))
      .toDF("doc_id", "text")
    for (df <- Seq(real, edge); (k, w) <- Seq((K, W), (5, 7), (2, 1))) {
      val a = Winnow.selectedFingerprints(df, "doc_id", "text", k, w)
      val b = Winnow.selectedFingerprintsFold(df, "doc_id", "text", k, w)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"expression and fold diverge at k=$k w=$w")
    }
  }

  test("both forms raise on a document breaking the PosMod packing") {
    val big = Seq((1L, "x" * (Winnow.PosMod.toInt + K - 1)))
      .toDF("doc_id", "text")
    for (form <- Seq(
        Winnow.selectedFingerprints(big, "doc_id", "text", K, W),
        Winnow.selectedFingerprintsFold(big, "doc_id", "text", K, W))) {
      val e = intercept[Exception](form.collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("winnow")),
        s"expected the packing-bound error, got $e")
    }
    // one char below the bound must select, not raise
    val ok = Seq((1L, "x" * (Winnow.PosMod.toInt + K - 2)))
      .toDF("doc_id", "text")
    assert(Winnow.selectedFingerprints(ok, "doc_id", "text", K, W).count() > 0)
  }

  test("coverage guarantee: a shared substring of length >= w+k-1 shares a hash") {
    // 40-char shared span embedded in different surroundings
    val span = "zzz shared span of text goes here yyy qq"
    val pair = Seq(
      (10L, s"left context AAA $span right context BBB"),
      (11L, s"unrelated prefix CCC $span other suffix DDD"))
      .toDF("doc_id", "text")
    val fps = Winnow.selectedFingerprints(pair, "doc_id", "text", K, W)
    val a = fps.where($"doc_id" === 10L).select("fp").as[Long].collect().toSet
    val b = fps.where($"doc_id" === 11L).select("fp").as[Long].collect().toSet
    assert((a & b).nonEmpty, "winnowing must catch the shared span")
  }

  test("selection density on the real corpus is near 2/(w+1)") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = Winnow.selectedFingerprints(real, "doc_id", "text", K, W).count()
    val positions = real.where(length($"text") >= K + W - 1)
      .agg(sum(length($"text") - (K - 1))).as[Long].head()
    val density = n.toDouble / positions
    assert(density > 0.3 && density < 0.5,
      s"density $density far from 2/(w+1) = ${2.0 / (W + 1)}")
  }

  test("matchPairs finds a planted mutated copy and not unrelated docs") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val mutated = base.replace("delta", "delXa")
    val corpus = Seq(
      (1L, base), (2L, mutated),
      (3L, "totally different content about query engines and shuffles " +
        "with partitions and executors and codegen and columnar scans"))
      .toDF("doc_id", "text")
    val pairs = Winnow.matchPairs(corpus, "doc_id", "text", K, W,
        dfCap = 10, minShared = 5)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)),
      s"expected exactly the planted pair, got $pairs")
  }

  test("alignedSpans reconstructs the matched regions around a planted edit") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val mutated = base.replace("delta", "delXa") // same length: offset 0
    val corpus = Seq(
      (1L, base), (2L, mutated),
      (3L, "totally different content about query engines and shuffles " +
        "with partitions and executors and codegen and columnar scans"))
      .toDF("doc_id", "text")
    // maxGap = w: winnowing selects a mark at least every w positions
    // in an intact shared region, so any wider gap is a real break —
    // here, the killed k-grams crossing the edited character
    val spans = Winnow.alignedSpans(corpus, "doc_id", "text", K, W,
        dfCap = 10, minShared = 5, minMarks = 1, maxGap = W)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(spans.nonEmpty && spans.forall(s => s._1 == 1L && s._2 == 2L),
      s"spans must cover exactly the planted pair: $spans")
    assert(spans.forall(_._3 == 0L),
      s"equal-length mutation must align at offset 0: $spans")
    // the edited character ('X' at 1-based char 21) must fall in no
    // span's MARK RANGE: every k-gram crossing it differs. A span may
    // legitimately end at 21+ via the +k-1 extent of a mark starting
    // before the edit, so assert on mark starts (a_start / a_end-k+1).
    assert(!spans.exists(s => s._4 <= 21 && s._5 - (K - 1) >= 21),
      s"no span's marks may straddle the edit: $spans")
    // regions both before and after the edit must be reported
    assert(spans.exists(_._4 < 14) && spans.exists(_._5 > 28),
      s"spans must flank the edit: $spans")
  }

  test("matchAcross links a revised delta doc to its original, never self-joins a side") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val corpus = Seq((1L, base),
      (2L, base), // intra-corpus duplicate: must cost nothing
      (3L, "completely different corpus content about executors and " +
        "shuffles and codegen and partitions in long running clusters"))
      .toDF("doc_id", "text")
    val delta = Seq((10L, base.replace("delta", "delXa")),
      (11L, "fresh unrelated delta document with brand new words " +
        "nothing shared here at all with anything else whatsoever"))
      .toDF("doc_id", "text")
    val got = Winnow.matchAcross(delta, "doc_id", "text",
        corpus, "doc_id", "text", K, W, dfCap = 10, minShared = 5)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(p => (p._1, p._2))
    assert(got.map(p => (p._1, p._2)) == Seq((10L, 1L), (10L, 2L)),
      s"expected the revision against both corpus copies only: $got")
  }

  test("matchPairs equals the capped-intersection reference") {
    // shared boilerplate tail: its interior fingerprints are selected
    // in all 8 docs (df 8 > cap) and must not contribute; selection
    // near the unique/boiler boundary legitimately differs per doc
    val boiler = "standard footer text here for every single document"
    val corpus = (1L to 8L).map(i =>
      (i, s"unique words number$i alpha$i beta$i gamma$i delta$i $boiler"))
      .toDF("doc_id", "text")
    val fps = Winnow.selectedFingerprints(corpus, "doc_id", "text", K, W)
      .select($"doc_id", $"fp").distinct()
      .as[(Long, Long)].collect()
    val byFp = fps.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byFp.exists(_._2.size == 8),
      "interior boilerplate hashes should be selected corpus-wide")
    val expected = byFp.values.filter(_.size <= 3)
      .flatMap(ds => for (a <- ds; b <- ds if a < b) yield (a, b))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Winnow.matchPairs(corpus, "doc_id", "text", K, W,
        dfCap = 3, minShared = 1)
      .as[(Long, Long, Long)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(got == expected,
      s"posting join diverges from reference: $got vs $expected")
  }
}
