package graft

import org.apache.spark.sql.functions._

import graft.ops.{Cooccurrence, Sharding}

class CooccurrenceShardingSpec extends SparkSpec {
  import spark.implicits._

  test("pmiPairs matches the hand-computed association table") {
    // baskets: g1={a,b,c}, g2={a,b}, g3={a}; duplicates must collapse
    val df = Seq(("g1", "a"), ("g1", "b"), ("g1", "c"), ("g1", "a"),
      ("g2", "a"), ("g2", "b"), ("g3", "a")).toDF("g", "item")
    val got = Cooccurrence.pmiPairs(df, "g", "item")
      .orderBy("item_a", "item_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    // pmi(a,b) = ln(2*3/(3*2)) = 0; pmi(a,c) = ln(1*3/(3*1)) = 0;
    // pmi(b,c) = ln(1*3/(2*1)) = ln(1.5)
    assert(got.toSeq == Seq(
      ("a", "b", 2L, 3L, 2L, 3L, 0.0),
      ("a", "c", 1L, 3L, 1L, 3L, 0.0),
      ("b", "c", 1L, 2L, 1L, 3L,
        math.rint(math.log(1.5) * 1e6) / 1e6)))
  }

  test("positive PMI for always-together, negative for avoiding items") {
    val together = (1 to 20).flatMap(i =>
      Seq((s"g$i", "x"), (s"g$i", "y")) ++
        (if (i <= 10) Seq((s"g$i", "z")) else Seq((s"g${i}b", "z"))))
      .toDF("g", "item")
    val pmi = Cooccurrence.pmiPairs(together, "g", "item")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(6)))
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(pmi(("x", "y")) > 0.3) // perfectly co-occurring
    assert(pmi(("x", "z")) < 0)   // z mostly in its own baskets
  }

  test("rendezvous shards are in range and roughly uniform") {
    val df = (1L to 5000L).toDF("id")
      .select(col("id"), Sharding.rendezvousShard(col("id"), 5).as("s"))
    val counts = df.groupBy("s").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(0, 1, 2, 3, 4))
    counts.values.foreach(n =>
      assert(math.abs(n - 1000L) < 250, s"skewed shard: $counts"))
  }

  test("growing 5 -> 6 shards moves ~1/6 of keys, ALL to the new shard") {
    val df = (1L to 6000L).toDF("id").select(col("id"),
      Sharding.rendezvousShard(col("id"), 5).as("s5"),
      Sharding.rendezvousShard(col("id"), 6).as("s6"))
    val moved = df.where(col("s5") =!= col("s6"))
    val nMoved = moved.count()
    // expectation 1000; binomial 4-sigma ~ +-116
    assert(math.abs(nMoved - 1000L) < 160, s"moved $nMoved of 6000")
    // the defining rendezvous property: a key only moves because the
    // NEW shard won its argmax — nothing reshuffles among survivors
    assert(moved.where(col("s6") =!= 5).count() == 0)
  }

  test("fast (xxhash64) path keeps the HRW properties: uniform, " +
      "bounded movement, all moves to the new shard") {
    val df = (1L to 6000L).toDF("id").select(col("id"),
      Sharding.rendezvousShardFast(col("id"), 5).as("s5"),
      Sharding.rendezvousShardFast(col("id"), 6).as("s6"))
    val counts = df.groupBy("s5").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(0, 1, 2, 3, 4))
    counts.values.foreach(n =>
      assert(math.abs(n - 1200L) < 300, s"skewed shard: $counts"))
    val moved = df.where(col("s5") =!= col("s6"))
    assert(math.abs(moved.count() - 1000L) < 160)
    assert(moved.where(col("s6") =!= 5).count() == 0)
  }

  test("pmod resharding moves ~5/6 — the contrast rendezvous fixes") {
    val df = (1L to 6000L).toDF("id").select(
      pmod(xxhash64(col("id")), lit(5)).as("s5"),
      pmod(xxhash64(col("id")), lit(6)).as("s6"))
    val nMoved = df.where(col("s5") =!= col("s6")).count()
    assert(nMoved > 4500, s"pmod moved only $nMoved of 6000")
  }
}
