package graft

import org.apache.spark.sql.functions._

import graft.ops.Abtest

class AbtestSpec extends SparkSpec {
  import spark.implicits._

  test("welch matches the hand-computed textbook case") {
    // A = {1,2,3,4}: n=4, m=2.5, var=5/3; B = {2,4,6,8,10}: n=5, m=6, var=10
    // se2 = 5/12 + 2 = 2.4166667 -> t = -3.5/1.5545632 = -2.2514
    // dof = se2^2 / ((5/12)^2/3 + 2^2/4) = 5.8402778/1.0578704 = 5.5208
    val df = (Seq(1, 2, 3, 4).map(v => ("g", "A", v.toDouble)) ++
      Seq(2, 4, 6, 8, 10).map(v => ("g", "B", v.toDouble)))
      .toDF("g", "variant", "v")
    val r = Abtest.welch(df, "g", "variant", "v", "A", "B").head()
    assert(r.getLong(1) == 4L && r.getLong(2) == 5L)
    assert(r.getDouble(3) == 2.5 && r.getDouble(4) == 6.0)
    assert(math.abs(r.getDouble(5) - -2.251440) < 1e-4, s"t=${r.getDouble(5)}")
    assert(math.abs(r.getDouble(6) - 5.520798) < 1e-3, s"dof=${r.getDouble(6)}")
    assert(r.getBoolean(7))
  }

  test("identical distributions are not significant; extras ignored") {
    val df = ((1 to 200).map(i => ("g", "A", (i % 10).toDouble)) ++
      (1 to 200).map(i => ("g", "B", (i % 10).toDouble)) ++
      (1 to 50).map(i => ("g", "C", 1e9))) // third variant must not leak
      .toDF("g", "variant", "v")
    val r = Abtest.welch(df, "g", "variant", "v", "A", "B").head()
    assert(r.getDouble(5) == 0.0 && !r.getBoolean(7))
  }

  test("cuped matches the hand case: perfect pre/post correlation") {
    // post = 2*pre per unit -> theta = cov/var = 2, pre_mean = 2.5,
    // adj = post - 2*(pre - 2.5) = 5 for every unit -> var(adj) = 0,
    // var_reduction = 1 on both variants; raw means 4 (A) and 6 (B)
    val rows = Seq(
      (1L, "A", 5, 1.0), (1L, "A", 15, 2.0),
      (2L, "B", 5, 2.0), (2L, "B", 15, 4.0),
      (3L, "A", 5, 3.0), (3L, "A", 15, 6.0),
      (4L, "B", 5, 4.0), (4L, "B", 15, 8.0))
      .toDF("u", "variant", "ts", "v")
    val r = Abtest.cuped(rows, "u", "variant", "ts", "v", lit(10))
      .orderBy("variant").collect()
    assert(r.length == 2)
    assert(r(0).getString(0) == "A" && r(0).getLong(1) == 2L)
    assert(r(0).getDouble(2) == 4.0 && r(0).getDouble(3) == 5.0)
    assert(r(0).getDouble(4) == 1.0, s"var_reduction=${r(0).getDouble(4)}")
    assert(r(1).getDouble(2) == 6.0 && r(1).getDouble(3) == 5.0)
    // units missing a period are excluded from theta and the readout
    val extra = rows.union(Seq((9L, "A", 5, 100.0)).toDF("u", "variant", "ts", "v"))
    val r2 = Abtest.cuped(extra, "u", "variant", "ts", "v", lit(10))
      .orderBy("variant").collect()
    assert(r2(0).getLong(1) == 2L, "pre-only unit must not join the readout")
  }

  test("srm flags a 60/40 split and passes a 50/50 one") {
    // g: A=60 B=40, e=50 -> chi2 = 100/50 + 100/50 = 4.0 > 3.841459
    val df = ((1 to 60).map(_ => ("g", "A")) ++ (1 to 40).map(_ => ("g", "B")) ++
      (1 to 50).map(_ => ("h", "A")) ++ (1 to 50).map(_ => ("h", "B")))
      .toDF("g", "variant")
    val r = Abtest.srm(df, "g", "variant", "A", "B").orderBy("g").collect()
    assert(r(0).getLong(1) == 60L && r(0).getLong(2) == 40L)
    assert(r(0).getDouble(3) == 4.0 && r(0).getBoolean(4))
    assert(r(1).getDouble(3) == 0.0 && !r(1).getBoolean(4))
    // a designed 75/25 ratio: the same 60/40 observed counts are now
    // consistent (e_a=75: (15^2)/75 + (15^2)/25 = 3 + 9 = 12 -> srm;
    // 75/25 observed -> chi2 0)
    val df2 = ((1 to 75).map(_ => ("g", "A")) ++ (1 to 25).map(_ => ("g", "B")))
      .toDF("g", "variant")
    val r2 = Abtest.srm(df2, "g", "variant", "A", "B", 0.75).head()
    assert(r2.getDouble(3) == 0.0 && !r2.getBoolean(4))
  }

  test("mannWhitney: tie-averaged ranks and the hand-computed z") {
    // g: A={1,3}, B={2,2} -> ranks 1, (2.5, 2.5), 4; U_A = 5-3 = 2 =
    // mu -> z = 0, not significant
    val g = Seq(("g", "A", 1.0), ("g", "A", 3.0),
      ("g", "B", 2.0), ("g", "B", 2.0))
    // h: A={10,11,12} > B={1,2,3}: U_A=9, mu=4.5, sigma=sqrt(5.25)
    //   -> z = 4.5/2.2912878 = 1.963961 > 1.96
    val h = Seq(("h", "A", 10.0), ("h", "A", 11.0), ("h", "A", 12.0),
      ("h", "B", 1.0), ("h", "B", 2.0), ("h", "B", 3.0))
    val out = Abtest.mannWhitney((g ++ h).toDF("g", "variant", "v"),
        "g", "variant", "v", "A", "B")
      .orderBy("g").collect()
    assert(out(0).getLong(1) == 2L && out(0).getLong(2) == 2L)
    assert(out(0).getDouble(3) == 2.0, s"u_a=${out(0).getDouble(3)}")
    assert(out(0).getDouble(4) == 0.0 && !out(0).getBoolean(5))
    assert(out(1).getDouble(3) == 9.0)
    assert(math.abs(out(1).getDouble(4) - 1.963961) < 1e-5)
    assert(out(1).getBoolean(5))
  }

  test("kruskalWallis: hand-computed three-sample H, tie correction") {
    // A={1,2}, B={3,4}, C={5,6}: ranks 1..6, R=(3,7,11)
    // H = 12/(6*7) * (9/2 + 49/2 + 121/2) - 3*7 = 179/7*2/... = 4.571429
    // no ties -> h_adj == h
    val g = Seq(("g", "A", 1.0), ("g", "A", 2.0), ("g", "B", 3.0),
      ("g", "B", 4.0), ("g", "C", 5.0), ("g", "C", 6.0))
    // h: every value ties -> C = 0 -> h_adj NULL, H = -? all ranks 3.5
    //  R_c = 7 each, n=6: H = 12/42*(49/2*3) - 21 = 0
    val h = Seq.fill(6)(("h", "A", 9.0)).zipWithIndex.map { case ((a, _, v), i) =>
      (a, if (i % 3 == 0) "A" else if (i % 3 == 1) "B" else "C", v) }
    val out = Abtest.kruskalWallis((g ++ h).toDF("g", "c", "v"),
      "g", "c", "v").orderBy("g").collect()
    assert(out(0).getLong(1) == 6L && out(0).getLong(2) == 3L)
    assert(math.abs(out(0).getDouble(3) - 4.571429) < 1e-6)
    assert(out(0).getDouble(4) == out(0).getDouble(3)) // tieless: H/1
    assert(out(1).getDouble(3) == 0.0 && out(1).isNullAt(4))
  }
}
