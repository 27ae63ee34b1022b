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
}
