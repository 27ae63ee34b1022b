package graft

import org.apache.spark.sql.functions._

import graft.ops.Eval

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("rankingMetrics matches hand-computed recall/precision/MRR/nDCG") {
    // q1: retrieved A,B,C (ranks 1..3); relevant: B grade 1, D grade 2
    // (D never retrieved). At k = 3:
    //   n_rel 2, n_hit 1, recall 1/2, precision 1/3, MRR 1/2
    //   DCG  = (2^1-1)/log2(3)            (B at rank 2)
    //   IDCG = (2^2-1)/log2(2) + (2^1-1)/log2(3)   (ideal: D then B)
    val ranked = Seq((1L, "A", 1L), (1L, "B", 2L), (1L, "C", 3L))
      .toDF("query_id", "doc_id", "rank")
    val rels = Seq((1L, "B", 1.0), (1L, "D", 2.0))
      .toDF("query_id", "doc_id", "rel")
    val r = Eval.rankingMetrics(ranked, rels,
      "query_id", "doc_id", "rank", "rel", k = 3).head()
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val dcg = 1.0 / (math.log(3.0) / math.log(2.0))
    val idcg = 3.0 + dcg
    assert(r.getAs[Long]("n_rel") == 2 && r.getAs[Long]("n_hit") == 1)
    assert(r.getAs[Double]("recall") == 0.5)
    assert(r.getAs[Double]("precision") == r6(1.0 / 3.0))
    assert(r.getAs[Double]("mrr") == 0.5)
    assert(r.getAs[Double]("ndcg") == r6(dcg / idcg))
  }

  test("rankingMetrics: perfect ranking scores 1.0 everywhere; label-free query scores null") {
    val ranked = Seq((1L, "A", 1L), (1L, "B", 2L),
      (2L, "X", 1L), (2L, "Y", 2L))
      .toDF("query_id", "doc_id", "rank")
    val rels = Seq((1L, "A", 2.0), (1L, "B", 1.0))
      .toDF("query_id", "doc_id", "rel")
    val out = Eval.rankingMetrics(ranked, rels,
        "query_id", "doc_id", "rank", "rel", k = 2)
      .orderBy("query_id").collect()
    val perfect = out(0)
    assert(perfect.getAs[Double]("recall") == 1.0
      && perfect.getAs[Double]("precision") == 1.0
      && perfect.getAs[Double]("mrr") == 1.0
      && perfect.getAs[Double]("ndcg") == 1.0)
    // query 2 has no labels: metrics with undefined denominators are
    // NULL (not a silent perfect score), hit counts are honest zeros
    val bare = out(1)
    assert(bare.getAs[Long]("n_rel") == 0 && bare.getAs[Long]("n_hit") == 0)
    assert(bare.isNullAt(bare.fieldIndex("recall"))
      && bare.isNullAt(bare.fieldIndex("ndcg")))
    assert(bare.getAs[Double]("mrr") == 0.0)
  }

  test("rankingMetrics: labeled query with zero retrieved rows scores 0, not absent") {
    // query 2 has labels but the ranker returned nothing for it — it
    // must appear with recall/precision/mrr/ndcg 0 (a vanished row
    // would silently drop the worst failure mode from the average)
    val ranked = Seq((1L, "A", 1L)).toDF("query_id", "doc_id", "rank")
    val rels = Seq((1L, "A", 1.0), (2L, "Z", 2.0))
      .toDF("query_id", "doc_id", "rel")
    val out = Eval.rankingMetrics(ranked, rels,
        "query_id", "doc_id", "rank", "rel", k = 2)
      .orderBy("query_id").collect()
    assert(out.length == 2)
    val missed = out(1)
    assert(missed.getAs[Long]("n_rel") == 1 && missed.getAs[Long]("n_hit") == 0)
    assert(missed.getAs[Double]("recall") == 0.0
      && missed.getAs[Double]("precision") == 0.0
      && missed.getAs[Double]("mrr") == 0.0
      && missed.getAs[Double]("ndcg") == 0.0)
  }

  test("cohenKappa matches the textbook worked example") {
    // classic 2x2 worked case: raters agree on 20 yes + 15 no of 50;
    // marginals A: 25/25, B: 30/20 → po=0.7, pe=(25*30+25*20)/2500=0.5,
    // kappa=(0.7-0.5)/0.5=0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = Eval.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
    assert(r.getAs[Long]("n") == 50)
    assert(r.getAs[Double]("po") == 0.7)
    assert(r.getAs[Double]("pe") == 0.5)
    assert(r.getAs[Double]("kappa") == 0.4)
  }

  test("cohenKappa: NULL is its own class; constant raters yield NULL kappa") {
    // nulls agreeing count as agreement and enter the marginals
    val withNulls = Seq(("x", "x"), (null, null), ("x", null), ("x", "x"))
      .toDF("a", "b")
    val r = Eval.cohenKappa(withNulls, "a", "b").head()
    assert(r.getAs[Double]("po") == 0.75)
    // pe = (3*2 + 1*2)/16 = 0.5 → kappa = 0.5
    assert(r.getAs[Double]("pe") == 0.5 && r.getAs[Double]("kappa") == 0.5)
    // both raters constant: pe = 1, kappa undefined -> NULL
    val const = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    val c = Eval.cohenKappa(const, "a", "b").head()
    assert(c.getAs[Double]("po") == 1.0 && c.isNullAt(c.fieldIndex("kappa")))
  }

  test("rankingMetrics cutoff: hits below k are ignored, IDCG uses top-k ideal gains") {
    // relevant doc at rank 3 with k = 2 contributes nothing
    val ranked = Seq((1L, "A", 1L), (1L, "B", 2L), (1L, "C", 3L))
      .toDF("query_id", "doc_id", "rank")
    val rels = Seq((1L, "C", 3.0)).toDF("query_id", "doc_id", "rel")
    val r = Eval.rankingMetrics(ranked, rels,
      "query_id", "doc_id", "rank", "rel", k = 2).head()
    assert(r.getAs[Long]("n_hit") == 0 && r.getAs[Double]("mrr") == 0.0
      && r.getAs[Double]("ndcg") == 0.0 && r.getAs[Double]("recall") == 0.0)
  }

  test("calibration matches the hand case; out-of-range rows excluded") {
    import org.apache.spark.sql.functions.col
    // bin 1 (scores .11/.15): conf .13, acc 1.0 -> gap .87 (n=2)
    // bin 9 (scores .95/1.0): conf .975, acc 0.5 -> gap .475 (n=2)
    // ece = (2*.87 + 2*.475)/4 = .6725; score 1.0 lands in bin 9 (cap)
    val df = Seq((0.11, 1.0), (0.15, 1.0), (0.95, 0.0), (1.0, 1.0),
      (1.5, 1.0), (-0.1, 0.0)).toDF("s", "y")
    val out = Eval.calibration(df, "s", "y", 10)
      .orderBy("bin").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("bin") == 1L && out(0).getAs[Long]("n") == 2L)
    assert(math.abs(out(0).getAs[Double]("conf") - 0.13) < 1e-12)
    assert(math.abs(out(0).getAs[Double]("gap") - 0.87) < 1e-12)
    assert(out(1).getAs[Long]("bin") == 9L)
    assert(math.abs(out(1).getAs[Double]("acc") - 0.5) < 1e-12)
    out.foreach(r =>
      assert(math.abs(r.getAs[Double]("ece") - 0.6725) < 1e-10))
  }

  test("rocCurve matches the sklearn hand case (AUC 0.75)") {
    import spark.implicits._
    val df = Seq((0.9, true), (0.8, false), (0.7, true), (0.6, false))
      .toDF("score", "label")
    val out = Eval.rocCurve(df, "score", "label").orderBy(col("thr").desc)
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      (0.9, 1L, 0L, 0.5, 0.0, 0.0),
      (0.8, 1L, 1L, 0.5, 0.5, 0.25),
      (0.7, 2L, 1L, 1.0, 0.5, 0.25),
      (0.6, 2L, 2L, 1.0, 1.0, 0.75)))
  }

  test("brierDecomposition: hand case where the Murphy identity is exact") {
    import spark.implicits._
    // bin-constant forecasts: brier = REL - RES + UNC exactly
    val df = Seq((0.8, true), (0.8, false), (0.2, false), (0.2, false))
      .toDF("p", "y")
    val r = Eval.brierDecomposition(df, "p", "y", nBins = 10).head()
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 0.19)      // brier
    assert(r.getDouble(2) == 0.065)     // reliability
    assert(r.getDouble(3) == 0.0625)    // resolution
    assert(r.getDouble(4) == 0.1875)    // uncertainty
    assert(r.getDouble(1) ==
      r.getDouble(2) - r.getDouble(3) + r.getDouble(4))
    // out-of-range and NULL scores are excluded; p=1.0 lands in the top bin
    val edge = Seq((Option(1.0), true), (Option(1.5), true),
      (Option.empty[Double], false)).toDF("p", "y")
    val e = Eval.brierDecomposition(edge, "p", "y", nBins = 10).head()
    assert(e.getLong(0) == 1L && e.getDouble(1) == 0.0)
  }

  test("rocCurve merges tied scores into one threshold; perfect scorer gets AUC 1") {
    import spark.implicits._
    val tied = Seq((0.5, true), (0.5, false), (0.2, false)).toDF("s", "y")
    val rows = Eval.rocCurve(tied, "s", "y").orderBy(col("thr").desc).collect()
    assert(rows.length == 2 && rows(0).getLong(1) == 1L
      && rows(0).getLong(2) == 1L)
    val perfect = Seq((0.9, true), (0.8, true), (0.3, false), (0.1, false))
      .toDF("s", "y")
    val auc = Eval.rocCurve(perfect, "s", "y")
      .orderBy(col("thr")).limit(1).head().getDouble(5)
    assert(auc == 1.0)
  }
}
