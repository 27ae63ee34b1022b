package graft

import org.apache.spark.sql.functions._

import graft.etl.MaterializedQuantiles

/** Incremental quantile state: deterministic bottom-k sample, so
  * create→refresh must be BYTE-IDENTICAL to a one-shot build; exact
  * below k; bounded at k; replay-idempotent. */
class MaterializedQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def stateOf(path: String) =
    spark.read.parquet(path)
      .select(col("k"), col("__bucket").cast("long"), col("__h"),
        col("__rid"), col("__v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet

  test("incremental state is identical to a one-shot build") {
    val base = (1 to 400).map(i => ("g" + (i % 3), i.toLong, i * 1.5))
      .toDF("k", "id", "v")
    val delta = (401 to 700).map(i => ("g" + (i % 3), i.toLong, i * 1.5))
      .toDF("k", "id", "v")
    val pInc = graft.etl.Scratch.dir("mq-spec-inc")
    val pOne = graft.etl.Scratch.dir("mq-spec-one")
    MaterializedQuantiles.create(base, Seq("k"), "id", "v", pInc,
      k = 64, nBuckets = 4)
    MaterializedQuantiles.refresh(spark, pInc, delta, Seq("k"), "id", "v",
      k = 64, nBuckets = 4)
    MaterializedQuantiles.create(base.unionByName(delta), Seq("k"), "id",
      "v", pOne, k = 64, nBuckets = 4)
    assert(stateOf(pInc) == stateOf(pOne))
  }

  test("replaying the same delta changes nothing (idempotent merge)") {
    val base = (1 to 100).map(i => ("g", i.toLong, i * 1.0)).toDF("k", "id", "v")
    val delta = (101 to 150).map(i => ("g", i.toLong, i * 1.0)).toDF("k", "id", "v")
    val path = graft.etl.Scratch.dir("mq-spec-replay")
    MaterializedQuantiles.create(base, Seq("k"), "id", "v", path,
      k = 32, nBuckets = 2)
    MaterializedQuantiles.refresh(spark, path, delta, Seq("k"), "id", "v",
      k = 32, nBuckets = 2)
    val once = stateOf(path)
    MaterializedQuantiles.refresh(spark, path, delta, Seq("k"), "id", "v",
      k = 32, nBuckets = 2)
    assert(stateOf(path) == once)
  }

  test("below k the sample is the data and quantiles are exact") {
    // 41 rows, values 1..41 -> n=41: p50 idx = floor(40*.5)+1 = 21 -> 21.0
    val df = (1 to 41).map(i => ("g", i.toLong, i.toDouble)).toDF("k", "id", "v")
    val path = graft.etl.Scratch.dir("mq-spec-exact")
    MaterializedQuantiles.create(df, Seq("k"), "id", "v", path,
      k = 64, nBuckets = 2)
    val r = MaterializedQuantiles.read(spark, path, Seq("k"),
      Seq(("p50", 0.5), ("p100", 1.0))).head()
    assert(r.getLong(1) == 41L)
    assert(r.getDouble(2) == 21.0)
    assert(r.getDouble(3) == 41.0) // floor(40*1.0)+1 = 41 -> max
  }

  test("sample size is bounded at k and the estimate tracks the truth") {
    val n = 20000
    val df = (1 to n).map(i => ("g", i.toLong, i.toDouble)).toDF("k", "id", "v")
    val path = graft.etl.Scratch.dir("mq-spec-big")
    MaterializedQuantiles.create(df, Seq("k"), "id", "v", path,
      k = 256, nBuckets = 2)
    val r = MaterializedQuantiles.read(spark, path, Seq("k"),
      Seq(("p50", 0.5))).head()
    assert(r.getLong(1) == 256L)
    // binomial rank error ~ sqrt(.25/256) = 3.1%; allow 4 sigma
    assert(math.abs(r.getDouble(2) - n * 0.5) < n * 0.125,
      s"p50=${r.getDouble(2)}")
  }

  test("appendBatchPartials: replayed batch and arbitrary chopping " +
      "reproduce the one-shot view exactly") {
    val all = (1 to 900).map(i => ("g" + (i % 2), i.toLong, (i * 13 % 700) * 1.0))
      .toDF("k", "id", "v")
    val probs = Seq(("p50", 0.5), ("p90", 0.9))
    val path = graft.etl.Scratch.dir("mq-spec-batch")
    // three uneven batches + a crash-replay of the middle one
    MaterializedQuantiles.appendBatchPartials(
      all.where($"id" <= 100), Seq("k"), "id", "v", path, 0L, k = 64, nBuckets = 2)
    MaterializedQuantiles.appendBatchPartials(
      all.where($"id" > 100 && $"id" <= 101), Seq("k"), "id", "v", path, 1L, k = 64, nBuckets = 2)
    MaterializedQuantiles.appendBatchPartials(
      all.where($"id" > 100 && $"id" <= 101), Seq("k"), "id", "v", path, 1L, k = 64, nBuckets = 2)
    MaterializedQuantiles.appendBatchPartials(
      all.where($"id" > 101), Seq("k"), "id", "v", path, 2L, k = 64, nBuckets = 2)
    val merged = MaterializedQuantiles
      .readMergedBatches(spark, path, Seq("k"), probs, k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    val pOne = graft.etl.Scratch.dir("mq-spec-batch-one")
    MaterializedQuantiles.create(all, Seq("k"), "id", "v", pOne,
      k = 64, nBuckets = 2)
    val oneShot = MaterializedQuantiles.read(spark, pOne, Seq("k"), probs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    assert(merged == oneShot)
  }

  test("state is partition-independent") {
    val df = (1 to 3000).map(i => ("g" + (i % 2), i.toLong, (i * 37 % 500) * 1.0))
      .toDF("k", "id", "v")
    val p1 = graft.etl.Scratch.dir("mq-spec-part1")
    val p2 = graft.etl.Scratch.dir("mq-spec-part2")
    MaterializedQuantiles.create(df.repartition(1), Seq("k"), "id", "v",
      p1, k = 128, nBuckets = 4)
    MaterializedQuantiles.create(df.repartition(11), Seq("k"), "id", "v",
      p2, k = 128, nBuckets = 4)
    assert(stateOf(p1) == stateOf(p2))
  }
}
