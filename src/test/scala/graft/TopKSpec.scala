package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.TopK

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("topKPerGroup equals the window row_number formulation") {
    val ev = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "events")
    val got = TopK.topKPerGroup(ev, Seq("user_id"), "value", "event_id", 3)
      .select($"user_id", $"event_id", $"rank")
    val w = Window.partitionBy($"user_id")
      .orderBy($"value".desc, $"event_id")
    val want = ev.withColumn("rank", row_number().over(w).cast("long"))
      .where($"rank" <= 3)
      .select($"user_id", $"event_id", $"rank")
    assert(got.count() == want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("topKPerGroup is exact across partitionings (mergeable buffers)") {
    val ev = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "events")
    val a = TopK.topKPerGroup(ev.repartition(13), Seq("event_type"),
      "value", "event_id", 5).select("event_type", "event_id", "rank")
    val b = TopK.topKPerGroup(ev.coalesce(1), Seq("event_type"),
      "value", "event_id", 5).select("event_type", "event_id", "rank")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("partial aggregation: shuffle carries k-bounded buffers, no sort") {
    val ev = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "events")
    val plan = TopK.topKPerGroup(ev, Seq("user_id"), "value", "event_id", 3)
      .queryExecution.executedPlan.toString
    // map-side partial aggregation present; no Sort before the agg
    assert(plan.contains("partial_topkbyscore") || plan.contains("ObjectHashAggregate"),
      plan)
    assert(!plan.contains("Sort "), s"unexpected global/group sort:\n$plan")
  }

  test("globalTopK: exact heavy hitters, equal to the naive global order") {
    import spark.implicits._
    val words = (1 to 100).flatMap(i => Seq.fill(i % 7 + 1)(s"w$i"))
      .toDF("w")
    val got = TopK.globalTopK(words, "w", 10, nBuckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = words.groupBy("w").count()
      .orderBy(col("count").desc, col("w")).limit(10)
      .collect().zipWithIndex
      .map { case (r, i) => (r.getString(0), r.getLong(1), i + 1L) }
    assert(got.toSeq == want.toSeq)
  }
}
