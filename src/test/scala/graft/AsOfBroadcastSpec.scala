package graft

import org.apache.spark.sql.functions._

import graft.ops.AsOf

class AsOfBroadcastSpec extends SparkSpec {
  import spark.implicits._

  test("backward inclusive semantics with LEFT-outer nulls (hand case)") {
    val left = Seq(("a", 10L), ("a", 20L), ("a", 5L), ("b", 7L), ("c", 1L))
      .toDF("k", "ts")
    val right = Seq(("a", 10L, 1.0), ("a", 15L, 2.0), ("b", 9L, 9.0))
      .toDF("k", "rts", "v")
    val got = AsOf.joinAsOfBroadcast(left, right, Seq("k"), "ts", "rts",
        Seq("v"))
      .select("k", "ts", "v").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got == Set(
      ("a", 10L, Some(1.0)), // inclusive bound
      ("a", 20L, Some(2.0)), // latest <= 20
      ("a", 5L, None),       // nothing effective yet
      ("b", 7L, None),       // b's only row is later
      ("c", 1L, None)))      // key with no history at all
  }

  test("null right timestamps are never effective") {
    val left = Seq(("a", 10L)).toDF("k", "ts")
    val right = Seq(("a", Some(5L), 1.0), ("a", None, 99.0))
      .toDF("k", "rts", "v")
    val r = AsOf.joinAsOfBroadcast(left, right, Seq("k"), "ts", "rts",
      Seq("v")).select("v").head()
    assert(r.getDouble(0) == 1.0)
  }

  test("broadcast equals the composed union-window form on random data") {
    val rnd = new scala.util.Random(13)
    val left = (1 to 2000).map(i =>
      ("k" + rnd.nextInt(20), rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    // unique (k, rts) on the right: the deterministic-result contract
    val right = (1 to 800).map(i =>
      ("k" + (i % 25), (i / 25 * 7).toLong, rnd.nextInt(100).toDouble))
      .toDF("k", "rts", "v")
    val bc = AsOf.joinAsOfBroadcast(left, right, Seq("k"), "ts", "rts",
      Seq("v")).select("k", "ts", "lid", "v")
    val composed = AsOf.joinAsOf(left, right, Seq("k"), "ts", "rts",
      Seq("v")).select("k", "ts", "lid", "v")
    assert(bc.exceptAll(composed).isEmpty && composed.exceptAll(bc).isEmpty,
      bc.exceptAll(composed).take(3).mkString(" | "))
  }

  test("plans a broadcast hash join — the fact side is never shuffled") {
    val left = (1 to 100).map(i => ("k" + (i % 5), i.toLong)).toDF("k", "ts")
    val right = (1 to 50).map(i => ("k" + (i % 7), i.toLong, i * 1.0))
      .toDF("k", "rts", "v")
    val df = AsOf.joinAsOfBroadcast(left, right, Seq("k"), "ts", "rts",
      Seq("v"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the only exchanges are the right side's pack shuffle + the
    // broadcast itself — nothing repartitions or sorts the fact side
    val finalPlan = plan.substring(0, plan.indexOf("Initial Plan"))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(finalPlan).length
    assert(hashEx == 1, s"expected only the right-side pack shuffle\n$plan")
    assert(!finalPlan.contains("Sort "), s"fact side must not sort\n$plan")
  }

  test("multi-key + multi-payload with a wide left row") {
    val left = Seq((1L, "x", 10L, "keepme"), (1L, "y", 10L, "keepme2"),
      (2L, "x", 3L, "k3")).toDF("id", "grp", "ts", "note")
    val right = Seq((1L, "x", 5L, 1.0, "r1"), (1L, "y", 10L, 2.0, "r2"),
      (2L, "x", 4L, 3.0, "r3")).toDF("id", "grp", "rts", "v", "tag")
    val got = AsOf.joinAsOfBroadcast(left, right, Seq("id", "grp"),
        "ts", "rts", Seq("v", "tag"))
      .select("id", "grp", "note", "v", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        Option(r.getString(4)))).toSet
    assert(got == Set(
      (1L, "x", "keepme", Some(1.0), Some("r1")),
      (1L, "y", "keepme2", Some(2.0), Some("r2")),
      (2L, "x", "k3", None, None)))
  }
}
