package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ReturnFunctions._
import graft.ops.Returns

/** A3/W1: compounded-return semantics, including the load-bearing null
  * behavior (SURVEY §2.4) and the cell-12 ≡ cell-14 equivalence. */
class ReturnFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-12

  test("compound of a single return is the return itself") {
    val r = Seq(("a", 0.3007302582)).toDF("k", "r")
      .groupBy("k").agg(compoundReturn($"r").as("c"))
      .select("c").as[Double].head()
    assert(math.abs(r - 0.3007302582) < eps)
  }

  test("compound links geometrically and is order-invariant") {
    val expected = (1.1 * 1.2 * 0.95) - 1
    for (perm <- Seq(Seq(0.1, 0.2, -0.05), Seq(-0.05, 0.1, 0.2))) {
      val c = perm.map(("a", _)).toDF("k", "r")
        .groupBy("k").agg(compoundReturn($"r").as("c"))
        .select("c").as[Double].head()
      assert(math.abs(c - expected) < eps)
    }
  }

  test("null day contributes factor 1.0 (a 0% day)") {
    val c = Seq(("a", Some(0.1)), ("a", None), ("a", Some(0.2)))
      .toDF("k", "r")
      .groupBy("k").agg(compoundReturn($"r").as("c"))
      .select("c").as[Double].head()
    assert(math.abs(c - (1.1 * 1.2 - 1)) < eps)
  }

  test("all-null group compounds to null") {
    val rows = Seq(("a", Option.empty[Double]), ("a", Option.empty[Double]))
      .toDF("k", "r")
      .groupBy("k").agg(compoundReturn($"r").as("c"))
      .select($"c".isNull).as[Boolean].head()
    assert(rows)
  }

  test("running compound's last row per group equals the group compound") {
    val daily = Seq(
      ("f1", "A", "2025-01-06", 0.1), ("f1", "A", "2025-01-07", 0.2),
      ("f1", "A", "2025-01-08", -0.05), ("f2", "A", "2025-01-06", 0.01))
      .toDF("fund", "kind", "d", "r")
      .withColumn("d", $"d".cast("date"))
    val running = Returns.withRunningCompound(daily, "fund", "kind", "d", "r")
    val lastPerGroup = running
      .withColumn("rn", row_number().over(
        Window.partitionBy("fund", "kind", "year_week").orderBy($"d".desc)))
      .where($"rn" === 1)
      .select($"fund", $"kind", $"year_week",
        $"daily_compound_evolution".as("v"))
    val grouped = Returns.weeklyReturns(daily, "fund", "kind", "d", "r")
      .select($"fund", $"kind", $"year_week", $"weekly_return".as("v"))
    assert(lastPerGroup.except(grouped).isEmpty
      && grouped.except(lastPerGroup).isEmpty)
  }

  test("same-date peers share the running value (RANGE default frame)") {
    val daily = Seq(
      ("f1", "A", "2025-01-06", 0.1), ("f1", "A", "2025-01-06", 0.2))
      .toDF("fund", "kind", "d", "r")
      .withColumn("d", $"d".cast("date"))
    val vals = Returns.withRunningCompound(daily, "fund", "kind", "d", "r")
      .select("daily_compound_evolution").as[Double].collect()
    assert(vals.length == 2 && math.abs(vals(0) - vals(1)) < eps)
    assert(math.abs(vals(0) - (1.1 * 1.2 - 1)) < eps)
  }
}
