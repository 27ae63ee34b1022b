package graft

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pts = Seq(
    ("u1", 1L, 5L), ("u1", 2L, 15L), ("u1", 3L, 25L),
    ("u2", 4L, 5L), ("u1", 5L, -7L), ("u1", 6L, 0L)
  ).toDF("k", "pid", "p")

  private def ivs = Seq(
    ("u1", 10L, 0L, 10L),    // catches p=5, p=0
    ("u1", 11L, 14L, 30L),   // catches p=15, p=25
    ("u2", 12L, 0L, 10L),    // catches u2's p=5 only (key isolation)
    ("u1", 13L, -10L, -1L)   // negative range catches p=-7
  ).toDF("k", "iid", "s", "e")

  test("pointInInterval equals the naive inequality join, incl. negatives") {
    val naive = pts.as("p").join(ivs.as("i"),
        $"p.k" === $"i.k" && $"p" >= $"s" && $"p" <= $"e")
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val got = RangeJoin.pointInInterval(pts, ivs, Seq("k"), "p", "s", "e", w)
        .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"bucketWidth=$w diverged")
    }
  }

  test("pointInInterval emits each match exactly once (no dedup needed)") {
    // wide interval covering many buckets at small width: still one row
    // per (point, interval) match
    val out = RangeJoin.pointInInterval(pts, ivs, Seq("k"), "p", "s", "e", 2L)
      .groupBy("pid", "iid").count().where($"count" > 1)
    assert(out.isEmpty)
  }

  test("intervalOverlap equals the naive overlap join, exactly once per pair") {
    val a = ivs.select($"k", $"iid".as("ia"), $"s".as("sa"), $"e".as("ea"))
    val b = ivs.select($"k", $"iid".as("ib"), $"s".as("sb"), $"e".as("eb"))
    val naive = a.as("a").join(b.as("b"),
        $"a.k" === $"b.k" && $"sa" <= $"eb" && $"sb" <= $"ea" && $"ia" < $"ib")
      .select($"ia", $"ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 5L, 50L)) {
      val outDf = RangeJoin.intervalOverlap(a, b, Seq("k"),
          "sa", "ea", "sb", "eb", w).where($"ia" < $"ib")
      val rows = outDf.select($"ia", $"ib").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSet == naive, s"bucketWidth=$w diverged")
      assert(rows.length == rows.toSet.size, s"bucketWidth=$w emitted duplicates")
    }
  }

  test("plan is an equi hash join, not BroadcastNestedLoop/cartesian") {
    val plan = RangeJoin.pointInInterval(pts, ivs, Seq("k"), "p", "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
