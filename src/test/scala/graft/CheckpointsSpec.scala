package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

import graft.etl.Checkpoints
import graft.ops.{Dedup, Graph}

/** The lineage-truncation policy: mode routing (local | reliable),
  * block release ([[Checkpoints.free]]), and the session-host sweep.
  * Reliable mode is the cluster-honest strategy — a localCheckpoint
  * loses partitions WITH lineage on executor loss; these specs pin
  * that both modes produce identical results so the switch is purely
  * operational. */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  private def truncatedRdds(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }

  test("local truncate pins block-manager storage; free releases it") {
    val df = Checkpoints.truncate(spark.range(0, 1000).toDF("v"))
    val rdds = truncatedRdds(df)
    assert(rdds.nonEmpty, "truncate must leave a LogicalRDD plan")
    assert(rdds.forall(_.getStorageLevel != StorageLevel.NONE),
      "a local checkpoint's RDD must be persisted")
    assert(df.count() == 1000)
    Checkpoints.free(df)
    assert(rdds.forall(_.getStorageLevel == StorageLevel.NONE),
      "free must unpersist every truncated RDD in the plan")
  }

  test("free is a no-op on frames that were never truncated") {
    Checkpoints.free(spark.range(0, 10).toDF("v")) // must not throw
  }

  test("reliable mode checkpoints to the configured dir, same results") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L), (5L, 5L))
      .toDF("doc_a", "doc_b")
    val local = Dedup.nearDupComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-rel-ckpt")
    spark.conf.set(Checkpoints.ModeKey, "reliable")
    spark.conf.set(Checkpoints.DirKey, dir.toString)
    try {
      val reliable = Dedup.nearDupComponents(pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(reliable == local, "mode switch must not change results")
      assert(spark.sparkContext.getCheckpointDir.isDefined,
        "reliable mode must install a checkpoint dir")
      // checkpoint FILES actually landed (durability is the point)
      val wrote = java.nio.file.Files.walk(dir).anyMatch(p =>
        java.nio.file.Files.isRegularFile(p))
      assert(wrote, s"no checkpoint files under $dir")
    } finally {
      spark.conf.unset(Checkpoints.ModeKey)
      spark.conf.unset(Checkpoints.DirKey)
      graft.etl.Scratch.remove(dir.toString)
    }
  }

  test("reliable mode holds for the global-rank partition-pinning path") {
    // withGlobalRank relies on the checkpoint pinning __pid across two
    // jobs; a reliable checkpoint must preserve that contract too
    val df = (1 to 200).map(i => (i.toLong, f"name_${i % 37}%03d"))
      .toDF("id", "name")
    val local = graft.ops.Linkage.sortedNeighborPairs(df, "id", "name", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    spark.conf.set(Checkpoints.ModeKey, "reliable")
    try {
      val reliable = graft.ops.Linkage
        .sortedNeighborPairs(df, "id", "name", 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(reliable == local)
    } finally spark.conf.unset(Checkpoints.ModeKey)
  }

  test("an unknown mode fails loudly, not silently local") {
    spark.conf.set(Checkpoints.ModeKey, "durable")
    try intercept[IllegalArgumentException] {
      Checkpoints.truncate(spark.range(0, 5).toDF("v"))
    } finally spark.conf.unset(Checkpoints.ModeKey)
  }

  test("iterative ops free superseded rounds; only the result stays") {
    Checkpoints.sweep(spark) // isolate from earlier suites' leftovers
    // min-label propagation travels one hop per round — a 12-node
    // chain forces ~11 rounds, each leaving a checkpoint to free
    val chain = (1L to 12L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("doc_a", "doc_b")
    val labels = Dedup.nearDupComponents(chain, maxIter = 15)
    assert(labels.where(col("component") === 1L).count() == 12)
    // without in-loop frees the session would now hold one persisted
    // RDD per propagation round
    val live = spark.sparkContext.getPersistentRDDs.values
      .filter(_.getStorageLevel != StorageLevel.NONE)
    assert(live.size <= 2,
      s"expected only the final checkpoint (+edges at most) live, got ${live.size}")
  }

  test("pageRank and bfsLevels leave no superseded blocks behind") {
    Checkpoints.sweep(spark)
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0),
      (4L, 1L, 1.0)).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    assert(Graph.pageRank(nodes, edges, iters = 6).count() == 4)
    val afterPr = spark.sparkContext.getPersistentRDDs.values
      .filter(_.getStorageLevel != StorageLevel.NONE)
    assert(afterPr.size <= 1, s"pageRank left ${afterPr.size} live RDDs")
    Checkpoints.sweep(spark)
    val lvls = Graph.bfsLevels(edges.select("src", "dst"), 1L, maxHops = 10)
    assert(lvls.count() == 4)
    val afterBfs = spark.sparkContext.getPersistentRDDs.values
      .filter(_.getStorageLevel != StorageLevel.NONE)
    assert(afterBfs.size <= 1, s"bfsLevels left ${afterBfs.size} live RDDs")
  }

  test("sweep drops caches and every registered persistent RDD") {
    val cached = spark.range(0, 100).toDF("v").cache()
    assert(cached.count() == 100)
    val ck = Checkpoints.truncate(spark.range(0, 100).toDF("v"))
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    Checkpoints.sweep(spark)
    assert(spark.sparkContext.getPersistentRDDs.values
      .forall(_.getStorageLevel == StorageLevel.NONE),
      "sweep must unpersist everything")
    // the swept cache is re-computable (lineage intact for .cache())
    assert(cached.count() == 100)
  }
}
