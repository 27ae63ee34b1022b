package graft

import org.apache.spark.sql.functions._

import graft.ops.Expectations
import graft.ops.Expectations._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), 10.0, "AA", "x"),
    (Some(2L), -5.0, "AB", "y"),
    (Some(2L), 999.0, "zz", "x"),
    (None, 50.0, "AC", "w")
  ).toDF("id", "v", "code", "cat")

  private def report(rules: Seq[Expectation]) =
    Expectations.check(df, rules).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toMap

  test("row-level rules count violations in one pass") {
    val got = report(Seq(
      NotNull("id"),
      InRange("v", 0.0, 100.0),
      MatchesRegex("code", "^A"),
      OneOf("cat", Seq("x", "y"))))
    assert(got("not_null(id)") == ((1L, 4L, false)))
    assert(got("in_range(v,0.0,100.0)") == ((2L, 4L, false)))
    assert(got("matches_regex(code)") == ((1L, 4L, false)))
    assert(got("one_of(cat)") == ((1L, 4L, false)))
  }

  test("row-level rules share one aggregate (plan has a single scan)") {
    val plan = Expectations.check(df, Seq(
        NotNull("id"), InRange("v", 0.0, 100.0), MatchesRegex("code", "^A")))
      .queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.size <= 2, // data scan + the tiny rule-order frame
      s"expected one data pass, got ${scans.size} scans")
  }

  test("satisfies treats NULL predicate as violation") {
    val got = report(Seq(Satisfies("v_gt_id", col("v") > col("id"))))
    // row 2 fails the predicate outright; row 4's NULL id makes the
    // predicate NULL -> also a violation (unknown is not a pass)
    assert(got("satisfies(v_gt_id)") == ((2L, 4L, false)))
  }

  test("unique counts all rows of duplicated groups") {
    val got = report(Seq(Unique(Seq("id"))))
    // id=2 appears twice -> 2 violating rows (NULL id is its own group)
    assert(got("unique(id)") == ((2L, 4L, false)))
  }

  test("ref integrity counts keys absent from the reference") {
    val ref = Seq(1L).toDF("rid")
    val got = report(Seq(RefIntegrity("id", ref, "rid")))
    // ids 2,2 missing; NULL id is NotNull's domain, not RI's
    assert(got("ref_integrity(id)") == ((2L, 4L, false)))
  }

  test("a clean table passes everything, in declared order") {
    val clean = Seq((1L, "x"), (2L, "y")).toDF("id", "cat")
    val rows = Expectations.check(clean, Seq(
      Unique(Seq("id")), NotNull("id"), OneOf("cat", Seq("x", "y"))))
      .collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("unique(id)", "not_null(id)", "one_of(cat)"))
    assert(rows.forall(_.getBoolean(3)))
  }
}
