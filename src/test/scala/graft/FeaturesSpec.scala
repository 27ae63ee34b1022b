package graft

import org.apache.spark.sql.functions._

import graft.ops.Features

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("targetEncode matches the hand case, incl. LOO and fallbacks") {
    // cats: a -> targets {1, 3}; b -> {8}; global mean of {1,3,8} = 4
    // alpha = 2:
    //   te(a)  = (4 + 2*4)/(2+2) = 3.0
    //   te(b)  = (8 + 2*4)/(1+2) = 16/3
    //   loo(a, y=1) = (4-1 + 8)/(1+2) = 11/3
    //   loo(b, y=8) = (0 + 8)/(0+2)   = 4.0  (n=1 -> global mean)
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("b", Some(8.0)),
      ("c", None), ("a", None)).toDF("cat", "y")
    val out = Features.targetEncode(df, "cat", "y", 2.0)
      .select("cat", "y", "te", "te_loo").collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        r.getDouble(2), r.getDouble(3)))
    def near(a: Double, b: Double) = math.abs(a - b) < 1e-12
    val a1 = out.find(t => t._1 == "a" && t._2 == Some(1.0)).get
    assert(near(a1._3, 3.0) && near(a1._4, 11.0 / 3))
    val b8 = out.find(t => t._1 == "b").get
    assert(near(b8._3, 16.0 / 3) && near(b8._4, 4.0))
    // unseen category (no labeled rows): te = te_loo = global mean
    val cNone = out.find(t => t._1 == "c").get
    assert(near(cNone._3, 4.0) && near(cNone._4, 4.0))
    // a NULL-target row of a SEEN category gets te, loo = te
    val aNone = out.find(t => t._1 == "a" && t._2.isEmpty).get
    assert(near(aNone._4, aNone._3))
    assert(out.length == df.count(), "row-preserving")
  }

  test("hashFeatures: bounded indices, exact counts, signed sums") {
    val df = Seq((1L, "x x y"), (2L, "  "), (3L, "z")).toDF("id", "text")
    val out = Features.hashFeatures(df, "id", "text", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.forall(t => t._2 >= 0 && t._2 < 16))
    // doc 1: x twice, y once -> total tf 3 over <=2 indices
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._3).sum == 3L)
    // the sign is per-token deterministic: |sv| == tf when one token
    // owns the bucket
    assert(d1.forall(t => math.abs(t._4) <= t._3))
    // whitespace-only text contributes nothing
    assert(!out.exists(_._1 == 2L))
    // deterministic across partitionings
    val again = Features.hashFeatures(df.repartition(5), "id", "text", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSet == again.toSet)
  }
}
