package graft

import org.apache.spark.sql.functions._

import graft.etl.MaterializedJoin

class MaterializedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def listJ(path: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(s"$path/J"))
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSet
  }

  test("create + two-sided refresh equals the full join; J is append-only") {
    val path = graft.etl.Scratch.dir("mjoin")
    val a = (1L to 400L).map(k => (k, s"a$k")).toDF("k", "pa")
    val b = (1L to 1200L).map(i => (i % 500 + 1, i, i * 0.5))
      .toDF("bk", "bid", "pb")
    val a0 = a.where($"k" % 3 =!= 0)
    val b0 = b.where($"bid" % 2 === 0)
    MaterializedJoin.create(a0, b0, Seq("k"), Seq("bk"), path, nBuckets = 8)
    val before = listJ(path)
    MaterializedJoin.refresh(spark, path,
      a.where($"k" % 3 === 0), b.where($"bid" % 2 =!= 0),
      Seq("k"), Seq("bk"), nBuckets = 8)
    // standing join files are never rewritten (insert-only contract)
    assert(before.subsetOf(listJ(path)), "refresh rewrote standing J files")
    val got = MaterializedJoin.read(spark, path)
      .select("k", "pa", "bid", "pb")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).sorted.toSeq
    val want = a.join(b, $"k" === $"bk").select("k", "pa", "bid", "pb")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).sorted.toSeq
    assert(got == want, s"maintained join diverged: ${got.size} vs ${want.size}")
    graft.etl.Scratch.remove(path)
  }

  test("appendBatchDelta: a crash-replayed batch replaces, never duplicates") {
    val path = graft.etl.Scratch.dir("mjbatch")
    val b = (1L to 50L).map(k => (k, s"d$k")).toDF("bk", "pb")
    MaterializedJoin.createSide(b, Seq("bk"), path, nBuckets = 4)
    val batch1 = (1L to 30L).map(k => (k, k * 10)).toDF("k", "pa")
    val batch2 = (31L to 50L).map(k => (k, k * 10)).toDF("k", "pa")
    MaterializedJoin.appendBatchDelta(batch1, 0L, path, Seq("k"), Seq("bk"),
      nBuckets = 4)
    MaterializedJoin.appendBatchDelta(batch2, 1L, path, Seq("k"), Seq("bk"),
      nBuckets = 4)
    // the stream replays batch 1 after a simulated crash: same id,
    // same rows — the partition is REPLACED, the join does not grow
    MaterializedJoin.appendBatchDelta(batch1, 0L, path, Seq("k"), Seq("bk"),
      nBuckets = 4)
    val got = MaterializedJoin.readMergedBatches(spark, path)
    assert(got.count() == 50)
    assert(got.select("k").distinct().count() == 50)
    graft.etl.Scratch.remove(path)
  }

  test("one-sided delta (ΔA only) joins the full standing B exactly once") {
    val path = graft.etl.Scratch.dir("mjoin1")
    val a = (1L to 100L).map(k => (k, k * 2)).toDF("k", "pa")
    val b = (1L to 300L).map(i => (i % 120 + 1, s"b$i")).toDF("bk", "pb")
    MaterializedJoin.create(a.where($"k" <= 60), b, Seq("k"), Seq("bk"),
      path, nBuckets = 4)
    MaterializedJoin.refresh(spark, path, a.where($"k" > 60),
      b.limit(0), Seq("k"), Seq("bk"), nBuckets = 4)
    assert(MaterializedJoin.read(spark, path).count() ==
      a.join(b, $"k" === $"bk").count())
    // an empty refresh on BOTH sides is a no-op
    MaterializedJoin.refresh(spark, path, a.limit(0), b.limit(0),
      Seq("k"), Seq("bk"), nBuckets = 4)
    assert(MaterializedJoin.read(spark, path).count() ==
      a.join(b, $"k" === $"bk").count())
    graft.etl.Scratch.remove(path)
  }

  test("torn refresh (uncommitted epoch) is invisible and replay overwrites it") {
    val path = graft.etl.Scratch.dir("mjtorn")
    val a = (1L to 80L).map(k => (k, s"a$k")).toDF("k", "pa")
    val b = (1L to 80L).map(k => (k, k * 1.5)).toDF("bk", "pb")
    MaterializedJoin.create(a.where($"k" <= 40), b, Seq("k"), Seq("bk"),
      path, nBuckets = 4)
    val committed = MaterializedJoin.read(spark, path).count()
    // simulate a crash mid-refresh: epoch-1 J dir written (with junk
    // rows that would corrupt the join), NO commit marker
    spark.read.parquet(s"$path/J/__epoch=0")
      .withColumn("pa", lit("TORN"))
      .write.mode("overwrite").partitionBy("__bucket")
      .parquet(s"$path/J/__epoch=1")
    val seen = MaterializedJoin.read(spark, path)
    assert(seen.count() == committed, "torn epoch leaked into read")
    assert(seen.where($"pa" === "TORN").count() == 0)
    // the replayed refresh reuses epoch 1, replacing the torn dirs
    MaterializedJoin.refresh(spark, path, a.where($"k" > 40),
      b.limit(0), Seq("k"), Seq("bk"), nBuckets = 4)
    val got = MaterializedJoin.read(spark, path)
    assert(got.count() == a.join(b, $"k" === $"bk").count())
    assert(got.where($"pa" === "TORN").count() == 0,
      "replay failed to overwrite the torn epoch")
    graft.etl.Scratch.remove(path)
  }

  test("CDC composition: updates+deletes flow to the join; replay is a fixpoint") {
    import graft.etl.{MaterializedCdc, MaterializedJoin}
    val cdc = graft.etl.Scratch.dir("cdcstate")
    val jn = graft.etl.Scratch.dir("cdcjoin")
    // changelog: key, seq (order), op, payload — with nBuckets=2 and
    // keys 1..12 both buckets carry several keys
    def log(rows: Seq[(Long, Long, String, Double)]) =
      rows.toDF("k", "seq", "op", "v")
    val slice1 = log((1L to 12L).map(k => (k, 1L, "upsert", k * 1.0)))
    val dim = (1L to 12L).map(k => (k, s"dim$k")).toDF("dk", "dpay")
    MaterializedCdc.create(slice1, "k", Seq("seq"), "op", Seq("v"),
      cdc, nBuckets = 2)
    MaterializedJoin.createFromCdc(
      MaterializedCdc.read(spark, cdc, "op", "delete"),
      dim, Seq("k"), Seq("dk"), jn, nBuckets = 2)
    // slice 2: update keys 1-4, delete keys 5-8, insert nothing new
    val slice2 = log(
      (1L to 4L).map(k => (k, 2L, "upsert", k * 100.0)) ++
      (5L to 8L).map(k => (k, 2L, "delete", 0.0)))
    val ups = MaterializedCdc.refreshEmit(spark, cdc, slice2,
      "k", Seq("seq"), "op", Seq("v"), nBuckets = 2)
    MaterializedJoin.applyUpserts(spark, jn, ups, Seq("k"), Seq("dk"),
      "op", "delete", nBuckets = 2)
    def snapshot() = MaterializedJoin.read(spark, jn)
      .select("k", "v", "dpay").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .sorted.toSeq
    val got = snapshot()
    val want = ((1L to 4L).map(k => (k, k * 100.0, s"dim$k")) ++
      (9L to 12L).map(k => (k, k * 1.0, s"dim$k"))).sorted.toSeq
    assert(got == want, s"composed join diverged: $got")
    // crash-replay the SAME upsert batch: fixpoint, not duplication
    MaterializedJoin.applyUpserts(spark, jn, ups, Seq("k"), Seq("dk"),
      "op", "delete", nBuckets = 2)
    assert(snapshot() == want, "replayed upsert batch changed the join")
    graft.etl.Checkpoints.free(ups)
    graft.etl.Scratch.remove(cdc); graft.etl.Scratch.remove(jn)
  }

  test("overlapped CDC composition: torn overlap replays to the fixpoint") {
    import graft.etl.{Checkpoints, MaterializedCdc, MaterializedJoin, Par}
    val cdc = graft.etl.Scratch.dir("cdcstate3")
    val jn = graft.etl.Scratch.dir("cdcjoin3")
    def log(rows: Seq[(Long, Long, String, Double)]) =
      rows.toDF("k", "seq", "op", "v")
    val dim = (1L to 12L).map(k => (k, s"dim$k")).toDF("dk", "dpay")
    // overlapped CREATE (the q261/q262 shape): one checkpointed first
    // slice feeds both landings concurrently
    val st = MaterializedCdc.createForCompose(
      log((1L to 12L).map(k => (k, 1L, "upsert", k * 1.0))),
      "k", Seq("seq"), "op", Seq("v"), nBuckets = 2)
    Par.run(
      () => MaterializedCdc.writeCreated(st, cdc),
      () => MaterializedJoin.createFromCdc(
        MaterializedCdc.live(st, "op", "delete"),
        dim, Seq("k"), Seq("dk"), jn, nBuckets = 2))
    Checkpoints.free(st)
    val slice2 = log((1L to 4L).map(k => (k, 2L, "upsert", k * 100.0)) ++
      (5L to 8L).map(k => (k, 2L, "delete", 0.0)))
    def overlappedRefresh(): Unit = {
      val (merged, touched) = MaterializedCdc.mergeForCompose(spark, cdc,
        slice2, "k", Seq("seq"), "op", Seq("v"), nBuckets = 2)
      Par.run(
        () => MaterializedCdc.writeMerged(merged, cdc),
        () => MaterializedJoin.applyUpserts(spark, jn,
          MaterializedCdc.emission(merged), Seq("k"), Seq("dk"),
          "op", "delete", nBuckets = 2, knownTouched = Some(touched)))
      Checkpoints.free(merged)
    }
    // TORN overlap: the CDC leg lands, the join leg "crashes" before
    // running — state advanced, join stale — then the whole step
    // replays (the foreachBatch replay contract): must converge
    val (mergedTorn, _) = MaterializedCdc.mergeForCompose(spark, cdc,
      slice2, "k", Seq("seq"), "op", Seq("v"), nBuckets = 2)
    MaterializedCdc.writeMerged(mergedTorn, cdc)
    Checkpoints.free(mergedTorn)
    overlappedRefresh() // the replay
    def snapshot() = MaterializedJoin.read(spark, jn)
      .select("k", "v", "dpay").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .sorted.toSeq
    val want = ((1L to 4L).map(k => (k, k * 100.0, s"dim$k")) ++
      (9L to 12L).map(k => (k, k * 1.0, s"dim$k"))).sorted.toSeq
    assert(snapshot() == want, s"torn-overlap replay diverged: ${snapshot()}")
    // and replaying AGAIN over fully-landed state stays the fixpoint
    overlappedRefresh()
    assert(snapshot() == want, "second replay changed the join")
    graft.etl.Scratch.remove(cdc); graft.etl.Scratch.remove(jn)
  }

  test("applyUpserts clears a bucket whose keys were ALL deleted") {
    import graft.etl.{MaterializedCdc, MaterializedJoin}
    val cdc = graft.etl.Scratch.dir("cdcstate2")
    val jn = graft.etl.Scratch.dir("cdcjoin2")
    // single bucket (nBuckets=1): deleting every key empties it — the
    // dynamic-overwrite edge where no partition appears in the output
    val slice1 = Seq((1L, 1L, "upsert", 1.0), (2L, 1L, "upsert", 2.0))
      .toDF("k", "seq", "op", "v")
    val dim = Seq((1L, "d1"), (2L, "d2")).toDF("dk", "dpay")
    MaterializedCdc.create(slice1, "k", Seq("seq"), "op", Seq("v"),
      cdc, nBuckets = 1)
    MaterializedJoin.createFromCdc(
      MaterializedCdc.read(spark, cdc, "op", "delete"),
      dim, Seq("k"), Seq("dk"), jn, nBuckets = 1)
    assert(MaterializedJoin.read(spark, jn).count() == 2)
    val ups = MaterializedCdc.refreshEmit(spark, cdc,
      Seq((1L, 2L, "delete", 0.0), (2L, 2L, "delete", 0.0))
        .toDF("k", "seq", "op", "v"),
      "k", Seq("seq"), "op", Seq("v"), nBuckets = 1)
    MaterializedJoin.applyUpserts(spark, jn, ups, Seq("k"), Seq("dk"),
      "op", "delete", nBuckets = 1)
    assert(MaterializedJoin.read(spark, jn).count() == 0,
      "stale rows survived in a fully-expired bucket")
    graft.etl.Checkpoints.free(ups)
    graft.etl.Scratch.remove(cdc); graft.etl.Scratch.remove(jn)
  }
}
