package graft

import org.apache.spark.sql.functions._

import graft.etl.MaterializedAgg

/** Incremental materialized aggregate: create → refresh must equal a
  * from-scratch aggregate over base ∪ delta, and the refresh must be
  * genuinely incremental — untouched bucket partitions' files are not
  * rewritten, and the base frame is never rescanned. */
class MaterializedAggSpec extends SparkSpec {
  import spark.implicits._

  private def viewOf(path: String) =
    MaterializedAgg.read(spark, path, Seq("k"))
      .select(col("k"), col("n"), col("total"), col("lo"), col("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet

  private def fullOf(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("k")).agg(count(col("v")).as("n"), sum(col("v")).as("total"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet

  test("refresh(state, delta) == aggregate(base union delta)") {
    val base = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0), ("c", 10.0))
      .toDF("k", "v")
    val delta = Seq(("a", 5.0), ("c", -1.0), ("d", 7.0)).toDF("k", "v")
    val path = graft.etl.Scratch.dir("magg-spec")
    MaterializedAgg.create(base, Seq("k"), "v", path, nBuckets = 4)
    MaterializedAgg.refresh(spark, path, delta, Seq("k"), "v", nBuckets = 4)
    assert(viewOf(path) == fullOf(base.unionByName(delta)))
  }

  test("untouched bucket partitions are not rewritten") {
    // many keys so every one of the 8 buckets is populated; the delta
    // touches exactly one key -> exactly one bucket directory changes
    val base = (1 to 200).map(i => (s"k$i", i.toDouble)).toDF("k", "v")
    val path = graft.etl.Scratch.dir("magg-dyn")
    MaterializedAgg.create(base, Seq("k"), "v", path, nBuckets = 8)
    def files(): Map[String, Long] = {
      val root = new java.io.File(path)
      root.listFiles().filter(_.getName.startsWith("__bucket="))
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getPath -> f.lastModified())).toMap
    }
    val before = files()
    assert(before.keys.map(_.split("__bucket=")(1).split("/")(0)).toSet.size == 8,
      "test needs all 8 buckets populated")
    Thread.sleep(1100) // mtime granularity
    val delta = Seq(("k7", 100.0)).toDF("k", "v")
    MaterializedAgg.refresh(spark, path, delta, Seq("k"), "v", nBuckets = 8)
    val after = files()
    // every pre-existing file in an untouched bucket survives unmodified
    val touched = after.keySet.diff(before.keySet) ++
      before.keySet.diff(after.keySet) ++
      before.keys.filter(p => after.contains(p) && after(p) != before(p))
    val touchedBuckets =
      touched.map(_.split("__bucket=")(1).split("/")(0)).toSet
    assert(touchedBuckets.size == 1,
      s"delta touched one key -> one bucket may change, got $touchedBuckets")
    assert(viewOf(path) == fullOf(base.unionByName(delta)))
  }

  test("null measures count toward no partial (SQL aggregate semantics)") {
    val base = Seq(("a", Some(1.0)), ("a", None), ("b", Some(2.0)))
      .toDF("k", "v")
    val path = graft.etl.Scratch.dir("magg-null")
    MaterializedAgg.create(base, Seq("k"), "v", path, nBuckets = 2)
    MaterializedAgg.refresh(spark, path,
      Seq(("b", Option.empty[Double])).toDF("k", "v"),
      Seq("k"), "v", nBuckets = 2)
    val got = MaterializedAgg.read(spark, path, Seq("k"))
      .select("k", "n").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 1L), ("b", 1L)))
  }

  test("MaterializedDistinct: incremental == one-shot, near exact") {
    // 4 keys x overlapping value ranges; delta re-adds half of base's
    // values (the case scalar partials cannot maintain)
    val base = (1 to 2000).map(i => (s"k${i % 4}", (i % 500).toLong))
      .toDF("k", "v")
    val delta = (1 to 1000).map(i => (s"k${i % 4}", (i % 700).toLong))
      .toDF("k", "v")
    val p1 = graft.etl.Scratch.dir("mdist-spec-inc")
    val p2 = graft.etl.Scratch.dir("mdist-spec-all")
    graft.etl.MaterializedDistinct.create(base, Seq("k"), "v", p1,
      nBuckets = 4, lgK = 12)
    graft.etl.MaterializedDistinct.refresh(spark, p1, delta, Seq("k"), "v",
      nBuckets = 4, lgK = 12)
    graft.etl.MaterializedDistinct.create(base.unionByName(delta),
      Seq("k"), "v", p2, nBuckets = 4, lgK = 12)
    def ests(p: String) = graft.etl.MaterializedDistinct
      .read(spark, p, Seq("k")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val inc = ests(p1)
    assert(inc == ests(p2),
      "union-built state must estimate identically to one-shot state")
    val exact = base.unionByName(delta).groupBy("k")
      .agg(countDistinct(col("v")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(inc(k) - n) <= n * 0.05,
        s"$k: est ${inc(k)} vs exact $n") }
  }

  test("appendBatchPartials: a replayed batchId is idempotent") {
    val path = graft.etl.Scratch.dir("magg-batch")
    val b0 = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    val b1 = Seq(("a", 3.0)).toDF("k", "v")
    graft.etl.MaterializedAgg.appendBatchPartials(b0, Seq("k"), "v", path, 0L, 2)
    graft.etl.MaterializedAgg.appendBatchPartials(b1, Seq("k"), "v", path, 1L, 2)
    // the crash-replay contract: batch 1 runs AGAIN with the same id
    graft.etl.MaterializedAgg.appendBatchPartials(b1, Seq("k"), "v", path, 1L, 2)
    val got = graft.etl.MaterializedAgg.readMergedBatches(spark, path, Seq("k"))
      .select("k", "n", "total").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("a", 2L, 4.0), ("b", 1L, 2.0)),
      s"replayed batch double-counted: $got")
  }

  test("MaterializedDistinct.appendBatchPartials: replayed batch AND " +
      "re-seen values perturb nothing") {
    val path = graft.etl.Scratch.dir("mdist-batch")
    val b0 = Seq(("a", 1L), ("a", 2L), ("b", 9L)).toDF("k", "v")
    val b1 = Seq(("a", 2L), ("a", 3L)).toDF("k", "v") // value 2 re-seen
    graft.etl.MaterializedDistinct.appendBatchPartials(
      b0, Seq("k"), "v", path, 0L, 2)
    graft.etl.MaterializedDistinct.appendBatchPartials(
      b1, Seq("k"), "v", path, 1L, 2)
    graft.etl.MaterializedDistinct.appendBatchPartials(
      b1, Seq("k"), "v", path, 1L, 2) // crash-replay
    val got = graft.etl.MaterializedDistinct
      .readMergedBatches(spark, path, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 1L), s"got $got")
  }

  test("repeated refreshes accumulate (three deltas, one key)") {
    val path = graft.etl.Scratch.dir("magg-rep")
    MaterializedAgg.create(Seq(("x", 1.0)).toDF("k", "v"),
      Seq("k"), "v", path, nBuckets = 2)
    (2 to 4).foreach { i =>
      MaterializedAgg.refresh(spark, path,
        Seq(("x", i.toDouble)).toDF("k", "v"), Seq("k"), "v", nBuckets = 2)
    }
    assert(viewOf(path) == Set(("x", 4L, 10.0, 1.0, 4.0)))
  }
}
