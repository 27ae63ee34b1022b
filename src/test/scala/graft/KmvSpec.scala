package graft

import org.apache.spark.sql.functions._

import graft.ops.Kmv

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("sketch equals the composed bottom-k-distinct-hash form") {
    val df = (1 to 2000).map(i => ("g" + (i % 3), i % 700)).toDF("g", "v")
    val k = 32
    val got = Kmv.sketches(df, Seq("g"), "v", k, "s1")
      .select(col("g"), col("kmv"))
    // composed reference: distinct hashes, window bottom-k, array_agg
    val composed = df.where(col("v").isNotNull)
      .select(col("g"), Kmv.kmvHash(col("v"), "s1").as("h")).distinct()
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy("h")))
      .where(col("r") <= k)
      .groupBy("g").agg(sort_array(collect_list(col("h"))).as("kmv"))
    assert(got.except(composed).isEmpty && composed.except(got).isEmpty)
  }

  test("sketch is partition-independent and insertion-order-independent") {
    val base = (1 to 5000).map(i => ("g", i * 7919 % 3001)).toDF("g", "v")
    val k = 64
    def sk(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      Kmv.sketches(df, Seq("g"), "v", k, "s2")
        .head().getSeq[Long](1)
    assert(sk(base.repartition(1)) == sk(base.repartition(13)))
    assert(sk(base.orderBy(desc("v"))) == sk(base))
  }

  test("unsaturated sketch is exact; saturated estimate is within KMV error") {
    val k = 128
    // 40 distinct < k -> exact
    val small = (1 to 500).map(i => ("g", i % 40)).toDF("g", "v")
    val eSmall = Kmv.sketches(small, Seq("g"), "v", k, "s3")
      .select(Kmv.distinctEstimate(col("kmv"), k)).head().getDouble(0)
    assert(eSmall == 40.0)
    // 6000 distinct >> k -> relative error should be ~ 1/sqrt(k-2) (~9%);
    // assert a loose 3-sigma bound
    val big = (1 to 6000).map(i => ("g", i)).toDF("g", "v")
    val eBig = Kmv.sketches(big, Seq("g"), "v", k, "s3")
      .select(Kmv.distinctEstimate(col("kmv"), k)).head().getDouble(0)
    assert(math.abs(eBig - 6000.0) / 6000.0 < 0.27, s"est=$eBig")
  }

  test("union and intersection estimates track planted overlap") {
    val k = 256
    // A = 1..4000, B = 2001..6000 -> |A∪B| = 6000, |A∩B| = 2000
    val df = ((1 to 4000).map(("a", _)) ++ (2001 to 6000).map(("b", _)))
      .toDF("g", "v")
    val sk = Kmv.sketches(df, Seq("g"), "v", k, "s4")
    val a = sk.where(col("g") === "a").select(col("kmv").as("ka"))
    val b = sk.where(col("g") === "b").select(col("kmv").as("kb"))
    val row = a.crossJoin(b).select(
      Kmv.distinctEstimate(Kmv.unionSketch(col("ka"), col("kb"), k), k)
        .as("u"),
      Kmv.intersectionEstimate(col("ka"), col("kb"), k).as("i"))
      .head()
    assert(math.abs(row.getDouble(0) - 6000.0) / 6000.0 < 0.2,
      s"union=${row.getDouble(0)}")
    assert(math.abs(row.getDouble(1) - 2000.0) / 2000.0 < 0.35,
      s"inter=${row.getDouble(1)}")
  }

  test("disjoint sets estimate a near-zero intersection") {
    val k = 128
    val df = ((1 to 3000).map(("a", _)) ++ (10001 to 13000).map(("b", _)))
      .toDF("g", "v")
    val sk = Kmv.sketches(df, Seq("g"), "v", k, "s5")
    val i = sk.where(col("g") === "a").select(col("kmv").as("ka"))
      .crossJoin(sk.where(col("g") === "b").select(col("kmv").as("kb")))
      .select(Kmv.intersectionEstimate(col("ka"), col("kb"), k))
      .head().getDouble(0)
    assert(i < 3000 * 0.05, s"inter=$i")
  }
}
