package graft

import org.apache.spark.sql.functions._

import graft.etl.{Tables, WarehouseSink}
import graft.ops.Approx

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("approximate profile bounds error vs exact answers") {
    val li = Tables.table(spark, "/root/testdata/sf0.01", "lineitem")
    val approx = Approx.profile(li, Seq("l_returnflag"), "l_extendedprice")
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct($"l_extendedprice").as("d"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r).toMap
    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      val dExact = e.getLong(1).toDouble
      val dApprox = a.getLong(2).toDouble
      assert(math.abs(dApprox - dExact) / dExact < 0.15,
        s"$flag distinct: approx $dApprox vs exact $dExact")
      val p50Exact = e.getDouble(2)
      val p50Approx = a.getDouble(3)
      assert(math.abs(p50Approx - p50Exact) / p50Exact < 0.05,
        s"$flag p50: approx $p50Approx vs exact $p50Exact")
    }
  }

  test("partitioned landing prunes partitions under a filter") {
    val path = java.nio.file.Files.createTempDirectory("part").toString + "/ev"
    val ev = Tables.table(spark, "/root/testdata/sf0.001", "events")
      .withColumn("event_date", to_date($"ts"))
    WarehouseSink.overwritePath(ev, path, partitionBy = Seq("event_date"))
    val one = spark.read.parquet(path)
      .where($"event_date" === lit("2024-01-15").cast("date"))
    val plan = one.queryExecution.executedPlan.toString
    // partition filter present and scan limited to one directory
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_date"), plan.take(500))
    val scanned = one.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles")
    assert(one.count() > 0)
    scanned.foreach(m => assert(m.value <= 2, s"read ${m.value} files"))
  }

  test("bucketed tables join without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    WarehouseSink.overwriteBucketed(
      Tables.table(spark, dir, "lineitem").select("l_orderkey", "l_quantity"),
      "li_bucketed", Seq("l_orderkey"), 4, Seq("l_orderkey"))
    WarehouseSink.overwriteBucketed(
      Tables.table(spark, dir, "orders").select("o_orderkey", "o_totalprice"),
      "o_bucketed", Seq("o_orderkey"), 4, Seq("o_orderkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bloom semi-join never drops matches and bounds false positives") {
    val build = (1L to 1000L).toDF("k")
    // probe: half overlapping, half disjoint
    val probe = (501L to 1500L).toDF("pk")
    val m = 64 * 256 // 16384 bits, n=1000, k=7 -> FPR ~ 0.8%
    val got = Approx.bloomSemiJoin(probe, "pk", build, "k", m, 7)
      .collect().map(_.getLong(0)).toSet
    // no false negatives: every true match survives
    assert((501L to 1000L).forall(got))
    // false positives bounded: of the 500 disjoint keys, well under 5%
    val fps = got.count(_ > 1000L)
    assert(fps <= 25, s"$fps false positives of 500 disjoint keys")
    // pre-filter composition is exact: bloom then exact semi-join
    // equals the exact semi-join
    val exact = probe.join(build, $"pk" === $"k", "left_semi")
      .collect().map(_.getLong(0)).toSet
    val composed = Approx.bloomSemiJoin(probe, "pk", build, "k", m, 7)
      .join(build, $"pk" === $"k", "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(composed == exact)
    // the probe side stays narrow: no shuffle exchange in the plan
    val plan = Approx.bloomSemiJoin(probe, "pk", build, "k", m, 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange ") || !plan.split("\n")
      .exists(l => l.contains("Exchange") && !l.contains("Broadcast")),
      s"probe side shuffles:\n$plan")
  }

  test("single-plan bloom-reduced semi-join equals the exact semi-join") {
    val build = (1L to 1000L).toDF("k")
    val probe = (501L to 1500L).toDF("pk")
    val m = 64 * 256
    val exact = probe.join(build, $"pk" === $"k", "left_semi")
      .collect().map(_.getLong(0)).toSet
    val reduced = Approx.bloomReducedSemiJoin(probe, "pk", build, "k", m, 7)
    assert(reduced.collect().map(_.getLong(0)).toSet == exact)
    // the filter words ride the plan as a broadcast stat frame, not a
    // driver-collected literal: the executed plan carries the
    // one-row nested-loop broadcast
    val plan = reduced.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"bloom words not inlined as a broadcast frame:\n$plan")
    // empty build side: screen drops everything, result is empty
    val none = Approx.bloomReducedSemiJoin(
      probe, "pk", build.where($"k" < 0L), "k", m, 7)
    assert(none.count() == 0L)
  }

  test("DenseBits scatters sparse words into the dense array") {
    import graft.expressions.DenseBits
    val sparse = Seq((Seq((0, 5L), (3, 1L << 63))))
      .toDF("wb").select(DenseBits(col("wb"), 4).as("d"))
    assert(sparse.head().getSeq[Long](0) == Seq(5L, 0L, 0L, 1L << 63))
    // empty entry list -> all-zero array (empty build side)
    val empty = Seq(Seq.empty[(Int, Long)]).toDF("wb")
      .select(DenseBits(col("wb"), 3).as("d"))
    assert(empty.head().getSeq[Long](0) == Seq(0L, 0L, 0L))
    // out-of-range word index is a caller bug and throws
    val bad = Seq(Seq((7, 1L))).toDF("wb")
      .select(DenseBits(col("wb"), 4).as("d"))
    val e = intercept[Exception] { bad.head() }
    assert(e.getMessage != null)
  }

  test("bloom-accelerated anti-join (ingest dedup) equals the exact anti-join") {
    // standing corpus keys vs an incoming batch: bloom-negative rows
    // are PROVABLY novel (no false negatives) and skip the join; only
    // bloom-positive rows shuffle into the exact anti-join
    val standing = (1L to 5000L).toDF("k")
    val batch = (4001L to 9000L).toDF("k")
    val m = 64 * 1024
    val filter = Approx.bloomBuild(standing, "k", m, 7)
    val might = Approx.bloomMightContain(col("k"), filter, 7)
    val fast = batch.where(!might)                       // provably novel
    val checked = batch.where(might)
      .join(standing, Seq("k"), "left_anti")             // verify the rest
    val composed = fast.union(checked).collect().map(_.getLong(0)).toSet
    val exact = batch.join(standing, Seq("k"), "left_anti")
      .collect().map(_.getLong(0)).toSet
    assert(composed == exact)
    // the fast path carries real traffic (most novel keys skip the join)
    assert(fast.count() > 3000, s"fast path only ${fast.count()} rows")
  }
}
