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

  test("pmiPairs matches a driver-side reference on a tiny corpus") {
    // collocation 'x y' always adjacent; 'a' ubiquitous
    val d = Seq(
      (1L, "x y a x y a"),
      (2L, "a x y a x y"),
      (3L, "x y b a")
    ).toDF("doc_id", "text")
    // driver-side reference with the same definition
    val texts = Seq("x y a x y a", "a x y a x y", "x y b a")
      .map(_.split(" ").toSeq)
    val tokCount = texts.flatten.groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toDouble }
    val totalToks = texts.map(_.size).sum.toDouble
    val rawPairs = for {
      ts <- texts; i <- ts.indices; o <- 1 to 2 if i + o < ts.size
    } yield {
      val (a, b) = (ts(i), ts(i + o))
      if (a <= b) (a, b) else (b, a)
    }
    val pairCount = rawPairs.groupBy(identity)
      .map { case (p, xs) => p -> xs.size.toDouble }
    val totalPairs = rawPairs.size.toDouble
    def refPmi(p: (String, String)): Double = BigDecimal(
      math.log((pairCount(p) / totalPairs)
        / ((tokCount(p._1) / totalToks) * (tokCount(p._2) / totalToks))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Vocab.pmiPairs(d, "doc_id", "text",
        window = 2, minPairCount = 2, k = 50)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    for ((p, (nAb, pmi)) <- got) {
      assert(nAb.toDouble == pairCount(p), s"$p count")
      assert(math.abs(pmi - refPmi(p)) < 1e-9, s"$p pmi $pmi vs ${refPmi(p)}")
    }
    // ranking agrees with the reference ordering (pmi desc, pair asc)
    val expTop = pairCount.keys.filter(p => pairCount(p) >= 2).toSeq
      .sortBy(p => (-refPmi(p), p._1, p._2)).head
    val ranked = Vocab.pmiPairs(d, "doc_id", "text", 2, 2, 50)
      .orderBy("rank").collect()
    assert((ranked.head.getString(0), ranked.head.getString(1)) == expTop)
  }

  test("winsorize clamps to the group quantile band, preserves inliers") {
    import graft.ops.Binning
    val df = ((1 to 98).map(i => ("g", i.toDouble))
      ++ Seq(("g", -1000.0), ("g", 1000.0))
      ++ (1 to 50).map(i => ("h", 10.0))).toDF("grp", "v")
    val out = Binning.winsorize(df, "grp", "v", 0.05, 0.95)
    val g = out.where($"grp" === "g")
    // outliers clamp to the 5/95 band; inliers in the band untouched
    val (lo, hi) = (g.agg(min($"v_w")).head().getDouble(0),
      g.agg(max($"v_w")).head().getDouble(0))
    assert(lo > -1000.0 && hi < 1000.0, s"outliers not clamped: $lo $hi")
    assert(g.where($"v" === 50.0 && $"v_w" === 50.0).count() == 1)
    // constant group: everything maps to the constant
    assert(out.where($"grp" === "h" && $"v_w" === 10.0).count() == 50)
    // row count preserved
    assert(out.count() == df.count())
  }

  test("winsorize is row-preserving for NULL group keys and passes NULL values through") {
    import graft.ops.Binning
    val df = Seq((Some("g"), Some(1.0)), (Some("g"), Some(2.0)),
      (Some("g"), Some(100.0)), (Some("g"), None),
      (None, Some(5.0)), (None, Some(6.0)), (None, None))
      .toDF("grp", "v")
    val out = Binning.winsorize(df, "grp", "v", 0.25, 0.75)
    // every input row survives, including the NULL-group rows
    assert(out.count() == 7)
    assert(out.where($"grp".isNull).count() == 3)
    // NULL values stay NULL (not rewritten to the group's low cut)
    assert(out.where($"v".isNull && $"v_w".isNull).count() == 2)
    // NULL-group rows still clamp against their own group's cuts
    val nullG = out.where($"grp".isNull && $"v".isNotNull)
      .select($"v_w").collect().map(_.getDouble(0)).sorted
    assert(nullG.head >= 5.0 && nullG.last <= 6.0)
  }

  test("heapsFit: exact two-checkpoint line; global positions follow doc order") {
    import spark.implicits._
    // doc 1 "x y", doc 2 "z z": first_pos x=1 y=2 z=3; N=4
    // checkpoints {2, 4}: V(2)=2, V(4)=3 — doc-order offsets are
    // load-bearing (reversed docs would give V(2)=1)
    val docs = Seq((1L, "x y"), (2L, "z z")).toDF("doc_id", "text")
    val r = Vocab.heapsFit(docs, "doc_id", "text", minN = 2L).head()
    assert(r.getLong(0) == 2L)
    val slope = (math.log(3) - math.log(2)) / (math.log(4) - math.log(2))
    val icpt = math.log(2) - slope * math.log(2)
    assert(math.abs(r.getDouble(1) - slope) < 1e-6, s"beta=${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - icpt) < 1e-6)
  }

  test("heapsFit three-checkpoint least squares matches the closed form") {
    import spark.implicits._
    // "a b a c a b a d": first a=1 b=2 c=4 d=8; cps {2,4,8}:
    // V = 2, 3, 4
    val docs = Seq((1L, "a b a c a b a d")).toDF("doc_id", "text")
    val r = Vocab.heapsFit(docs, "doc_id", "text", minN = 2L).head()
    assert(r.getLong(0) == 3L)
    val xs = Seq(2.0, 4.0, 8.0).map(math.log)
    val ys = Seq(2.0, 3.0, 4.0).map(math.log)
    val m = 3.0
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    assert(math.abs(r.getDouble(1) - slope) < 1e-6)
    assert(math.abs(r.getDouble(2) - (sy - slope * sx) / m) < 1e-6)
  }

  test("zipfFit recovers the exact line through a two-point corpus") {
    import spark.implicits._
    // "a" x8, "b" x2 -> (ln1, ln8), (ln2, ln2): slope = -2, icpt = ln8
    val docs = Seq((1L, ("a " * 8 + "b b").trim)).toDF("doc_id", "text")
    val r = Vocab.zipfFit(docs, "doc_id", "text", 10).head()
    assert(r.getLong(0) == 2L)
    assert(math.abs(r.getDouble(1) - -2.0) < 1e-6, s"slope=${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - math.log(8)) < 1e-6)
  }
}
