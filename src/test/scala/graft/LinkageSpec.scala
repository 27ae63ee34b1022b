package graft

import org.apache.spark.sql.functions._

import graft.ops.Linkage

/** Record linkage + entity resolution (ops.Linkage): blocking recall,
  * edit-distance verification, transitive closure semantics. */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val recs = Seq(
    (1L, "Acme Corporation International Ltd"),
    (2L, "ACME Corporation International Ltd"),   // case only: dist 0 on key
    (3L, "Acme Corporatio Internationl Ltd"),     // two deletions: dist 2
    (4L, "Completely Unrelated Business Name"),
    (5L, "Zeta Systems Incorporated worldwide"),
    (6L, "Xxxx different head but same tail Incorporated worldwide"))
    .toDF("id", "name")

  test("case-normalized exact and small-edit variants link; unrelated do not") {
    val pairs = Linkage.linkPairs(recs, "id", "name", maxDist = 4)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.contains((1L, 2L, 0L)), s"case-only pair missing: $pairs")
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L && p._3 == 2L),
      s"2-edit pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated record linked: $pairs")
  }

  test("suffix blocking pass recovers pairs the prefix pass cannot see") {
    // ids 5 and 6 share only the last 8+ chars of the key; with a
    // generous maxDist they can only meet through the suffix pass
    val pairs = Linkage.linkPairs(recs, "id", "name", maxDist = 40)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.exists(p => p._1 == 5L && p._2 == 6L),
      s"suffix-blocked pair missing: $pairs")
  }

  test("entity resolution is transitive and counts members") {
    // chain: 1~2 (dist 0), 1~3 (dist 2), while 2~3 also within range —
    // all three must collapse into entity 1; 4, 5, 6 as per linkage
    val ents = Linkage.resolveEntities(recs, "id", "name", maxDist = 4)
      .orderBy("id")
      .as[(Long, Long, Long)].collect().toSeq
    val byId = ents.map(e => e._1 -> e).toMap
    assert(Seq(1L, 2L, 3L).map(byId(_)._2).distinct == Seq(1L),
      s"chain must share entity 1: $ents")
    assert(byId(1L)._3 == 3L, s"entity 1 must have 3 members: $ents")
    assert(byId(4L)._2 == 4L && byId(4L)._3 == 1L,
      s"unlinked record must be a singleton entity: $ents")
  }

  test("a planted hot block is capped: pair fan-out stays bounded") {
    // 30 records share the prefix block AND pairwise-link (tail noise
    // within maxDist); two control records in a cold block must still
    // link. With blockCap=10 the hot block (30 > 10 in the prefix
    // pass, and its suffix blocks are also hot) contributes NOTHING,
    // while the cold pair survives — fan-out is bounded by cap^2, not
    // by the hot block's n^2.
    val hot = (1L to 30L).map(i =>
      (i, f"shared boilerplate rec$i%02d text tail"))
    val cold = Seq((100L, "unique cold block record one xx"),
      (101L, "unique cold block record one yy"))
    val df = (hot ++ cold).toDF("id", "name")
    val uncapped = Linkage.linkPairs(df, "id", "name", maxDist = 8)
      .as[(Long, Long, Long)].collect().toSeq
    assert(uncapped.count(p => p._1 <= 30L) > 100,
      s"hot block should pair freely without cap: ${uncapped.size}")
    val capped = Linkage.linkPairs(df, "id", "name", maxDist = 8,
        blockCap = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(capped == Seq((100L, 101L, 2L)),
      s"capped run must keep only the cold pair: $capped")
    // the audit surface names the dropped blocks
    val over = Linkage.overCapBlocks(df, "id", "name", blockCap = 10)
      .as[(String, Long)].collect().toMap
    assert(over.keys.exists(_.startsWith("p:shared b")) &&
      over.values.forall(_ > 10), s"over-cap audit wrong: $over")
  }

  test("sub-blocking recovers within-group pairs the plain cap drops") {
    // 30 records share the 8-char prefix (level-1 block 30 > cap 10)
    // and the full tail (suffix blocks also hot at both widths), but
    // split into 10 groups of 3 under the 16-char prefix: the plain
    // cap finds NOTHING, sub-blocking finds exactly the within-group
    // pairs while every block stays <= cap
    val recs = (for (g <- 0 until 10; r <- 0 until 3) yield
      ((g * 3 + r + 1).toLong,
        f"samehead grp$g%02d m$r common tail text"))
      .toDF("id", "name")
    assert(Linkage.linkPairs(recs, "id", "name", maxDist = 2,
      blockCap = 10).count() == 0)
    val got = Linkage.linkPairsSubBlocked(recs, "id", "name", maxDist = 2,
        blockCap = 10)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val expected = (for (g <- 0 until 10; r1 <- 0 until 3; r2 <- 0 until 3
        if r1 < r2) yield
      ((g * 3 + r1 + 1).toLong, (g * 3 + r2 + 1).toLong, 1L)).sorted
    assert(got == expected,
      s"sub-blocked pairs wrong: got ${got.size}, expected ${expected.size}")
  }

  test("sortedNeighborPairs equals the brute-force rank-window reference") {
    val real = graft.etl.Tables.table(spark, "/root/testdata/sf0.001",
      "documents")
    val r = real.select(col("doc_id"),
        lower(substring(col("text"), 1, 64)).as("__name"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__name"), col("doc_id"))))
    for (w <- Seq(4, 10)) {
      val exp = r.as("a").join(r.as("b"),
          col("b.rk") > col("a.rk") && col("b.rk") <= col("a.rk") + w)
        .select(least(col("a.doc_id"), col("b.doc_id")).as("id_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("id_b"),
          levenshtein(col("a.__name"), col("b.__name")).cast("long")
            .as("dist"))
        .where(col("dist") <= 16)
      val got = Linkage.sortedNeighborPairs(real, "doc_id", "text",
        maxDist = 16, windowSize = w)
      assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty,
        s"sorted-neighborhood diverged from reference at window $w")
      assert(exp.count() > 0, s"reference empty at window $w")
    }
  }

  test("Fellegi-Sunter weights and decisions match hand-computed values") {
    def lg2(x: Double) = math.log(x) / math.log(2)
    val pairs = Seq((1L, 2L, true, true), (3L, 4L, true, false),
      (5L, 6L, false, false)).toDF("id_a", "id_b", "f1", "f2")
    val out = Linkage.fellegiSunter(pairs, Seq(
        Linkage.FsField("f1", col("f1"), m = 0.9, u = 0.05),
        Linkage.FsField("f2", col("f2"), m = 0.8, u = 0.1)),
        upper = 5.0, lower = 0.0)
      .select("id_a", "weight", "decision")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2)))
      .toMap
    val a1 = lg2(0.9 / 0.05); val d1 = lg2(0.1 / 0.95)
    val a2 = lg2(0.8 / 0.1); val d2 = lg2(0.2 / 0.9)
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((r6(a1 + a2), "match")), s"got ${out(1L)}")
    assert(out(3L) == ((r6(a1 + d2), "possible")), s"got ${out(3L)}")
    assert(out(5L) == ((r6(d1 + d2), "non_match")), s"got ${out(5L)}")
  }

  test("EM learns m > u on planted structure and ranks full agreement highest") {
    // 20 planted matches agree on both fields; 200 background pairs
    // agree only at noise rates — EM must push the agreement weights
    // positive and the disagreement weights negative
    val rnd = new scala.util.Random(7)
    val pairs = ((1 to 20).map(i => (i.toLong, (i + 1000).toLong, true, true)) ++
      (1 to 200).map(i => ((i + 5000).toLong, (i + 9000).toLong,
        rnd.nextDouble() < 0.05, rnd.nextDouble() < 0.1)))
      .toDF("id_a", "id_b", "f1", "f2")
    val out = Linkage.fellegiSunterEm(pairs,
        Seq(("f1", col("f1")), ("f2", col("f2"))),
        iters = 20, upper = 2.0, lower = 0.0)
      .select("f1", "f2", "weight", "decision")
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) ->
        (r.getDouble(2), r.getString(3))).toMap
    val (w11, d11) = out((true, true))
    val (w00, d00) = out((false, false))
    assert(w11 > 0 && d11 == "match", s"full agreement must score match: $out")
    assert(w00 < 0 && d00 == "non_match",
      s"full disagreement must score non_match: $out")
    assert(out.forall { case (_, (w, _)) => w <= w11 && w >= w00 },
      s"mixed patterns must fall between the extremes: $out")
  }

  test("one EM step matches the closed-form hand computation") {
    // Independence check on the q176 oracle (which REPLAYS the Scala
    // recurrence, so a shared conceptual bug would pass both engines):
    // k = 1 field, 2 agreeing pairs + 8 disagreeing, ONE iteration,
    // init p=0.1 m=0.8 u=0.1 — every quantity derivable on paper:
    //   w(agree)    = p·m / (p·m + (1−p)·u)           = 0.08/0.17 = 8/17
    //   w(disagree) = p(1−m) / (p(1−m) + (1−p)(1−u))  = 0.02/0.83 = 2/83
    //   sw = 2·(8/17) + 8·(2/83) = 1600/1411
    //   m' = (2·8/17) / sw              = 83/100   (exactly 0.83)
    //   u' = (2·9/17) / (10 − sw)       = 83/695
    //   → weight(agree)    = log2(m'/u')           = log2(6.95)
    //   → weight(disagree) = log2((1−m')/(1−u'))   = log2(0.17·695/612)
    val pairs = ((1 to 2).map(i => (i.toLong, true)) ++
      (3 to 10).map(i => (i.toLong, false))).toDF("id_a", "agree")
    val out = Linkage.fellegiSunterEm(pairs, Seq(("f", col("agree"))),
        iters = 1, upper = 2.0, lower = 0.0,
        initP = 0.1, initM = 0.8, initU = 0.1)
      .select("agree", "weight").distinct()
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    def lg2(x: Double) = math.log(x) / math.log(2)
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(true) == r6(lg2(6.95)),
      s"agree weight != hand-derived log2((83/100)/(83/695)): $out")
    assert(out(false) == r6(lg2(0.17 * 695.0 / 612.0)),
      s"disagree weight != hand-derived log2((17/100)/(612/695)): $out")
  }

  test("EM on an empty pair frame returns empty without NaN parameters") {
    val empty = Seq.empty[(Long, Boolean)].toDF("id_a", "agree")
    val out = Linkage.fellegiSunterEm(empty, Seq(("f", col("agree"))))
    assert(out.count() == 0)
    assert(out.columns.contains("weight") && out.columns.contains("decision"))
  }

  test("FS scorers refuse reserved input columns loudly") {
    val clash = Seq((1L, true, 0.5)).toDF("id_a", "agree", "weight")
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunterEm(clash, Seq(("f", col("agree"))))
    }
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(clash,
        Seq(Linkage.FsField("f", col("agree"), m = 0.9, u = 0.1)),
        upper = 1.0, lower = 0.0)
    }
    val gclash = Seq((1L, true, 1)).toDF("id_a", "agree", "__g0")
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunterEm(gclash, Seq(("f", col("agree"))))
    }
  }

  test("records below twice the block width are dropped, not mis-blocked") {
    val short = Seq((1L, "tiny"), (2L, "tiny")).toDF("id", "name")
    assert(Linkage.linkPairs(short, "id", "name", maxDist = 1).count() == 0)
    assert(Linkage.resolveEntities(short, "id", "name", maxDist = 1)
      .count() == 0)
  }

  test("fuzzyScoredPairs scores each within-block half-matrix pair once") {
    import spark.implicits._
    val df = Seq((1L, "blk1", "martha"), (2L, "blk1", "marhta"),
      (3L, "blk1", "marsha"), (4L, "blk2", "jon"), (5L, "blk2", "john"))
      .toDF("id", "blk", "name")
    val out = Linkage.fuzzyScoredPairs(df, "blk", "id", "name")
      .orderBy("id_a", "id_b").collect()
    assert(out.length == 4) // C(3,2) + C(2,2)
    val m = out.map(r => (r.getLong(1), r.getLong(2)) ->
      ((r.getDouble(3), r.getLong(4)))).toMap
    assert(m((1L, 2L)) == ((0.9611111111111111, 1L))) // DuckDB golden
    assert(m((4L, 5L))._2 == 1L) // jon -> john: one insertion
    assert(m.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
  }
}
