package graft

import graft.ops.Privacy

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // QI (city, yob): ("a",1) x4 rows / 2 sensitive values,
  // ("a",2) x2 rows / 2 values, ("b",1) x3 rows / 1 value
  private lazy val df = Seq(
    ("a", 1, "s1"), ("a", 1, "s1"), ("a", 1, "s2"), ("a", 1, "s2"),
    ("a", 2, "s1"), ("a", 2, "s3"),
    ("b", 1, "s1"), ("b", 1, "s1"), ("b", 1, "s1"))
    .toDF("city", "yob", "diag")

  test("kAnonymityAudit reports group sizes, diversity, and verdicts") {
    val r = Privacy.kAnonymityAudit(df, Seq("city", "yob"), "diag", 3, 2)
      .orderBy("city", "yob").collect()
    assert(r.length == 3)
    // ("a",1): n=4 l=2 -> both pass
    assert(r(0).getLong(2) == 4L && r(0).getLong(3) == 2L)
    assert(r(0).getBoolean(4) && r(0).getBoolean(5))
    // ("a",2): n=2 < k, l=2 -> k fails, l passes
    assert(r(1).getLong(2) == 2L && !r(1).getBoolean(4) && r(1).getBoolean(5))
    // ("b",1): n=3, l=1 -> k passes, l fails
    assert(r(2).getLong(2) == 3L && r(2).getBoolean(4) && !r(2).getBoolean(5))
  }

  test("suppress nulls QI columns of below-k groups only") {
    val out = Privacy.suppress(df, Seq("city", "yob"), 3)
      .collect()
    assert(out.length == df.count(), "suppression must not drop rows")
    // the 2-row ("a",2) group is suppressed; its non-QI column survives
    val suppressed = out.filter(_.isNullAt(0))
    assert(suppressed.length == 2)
    assert(suppressed.forall(r => r.isNullAt(1) && !r.isNullAt(2)))
    // all surviving QI groups are >= k by construction
    val kept = out.filter(!_.isNullAt(0))
      .groupBy(r => (r.getString(0), r.getInt(1)))
    assert(kept.values.forall(_.length >= 3))
  }

  test("audit rejects a sensitive column doubling as a QI") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityAudit(df, Seq("city", "diag"), "diag", 2, 2)
    }
  }
}
