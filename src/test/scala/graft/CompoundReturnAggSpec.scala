package graft

import graft.functions.CompoundReturnAgg

final case class AggR(fund: String, r: Option[Double])

class CompoundReturnAggSpec extends SparkSpec {
  import spark.implicits._

  test("typed Aggregator matches the composed-built-ins semantics") {
    val ds = Seq(
      AggR("a", Some(0.1)), AggR("a", None), AggR("a", Some(0.2)),
      AggR("b", None), AggR("b", None),
      AggR("c", Some(0.3007302582))).toDS()
    val out = ds.groupByKey(_.fund).mapValues(_.r)
      .agg(CompoundReturnAgg.toColumn.name("c"))
      .collect().toMap
    assert(math.abs(out("a").get - (1.1 * 1.2 - 1)) < 1e-12)
    assert(out("b").isEmpty)                       // all-null group -> None
    assert(math.abs(out("c").get - 0.3007302582) < 1e-12)
  }
}
