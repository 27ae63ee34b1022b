package graft

import org.apache.spark.sql.functions._

import graft.ops.Abtest

class AbtestSpec extends SparkSpec {
  import spark.implicits._

  test("welch matches the hand-computed textbook case") {
    // A = {1,2,3,4}: n=4, m=2.5, var=5/3; B = {2,4,6,8,10}: n=5, m=6, var=10
    // se2 = 5/12 + 2 = 2.4166667 -> t = -3.5/1.5545632 = -2.2514
    // dof = se2^2 / ((5/12)^2/3 + 2^2/4) = 5.8402778/1.0578704 = 5.5208
    val df = (Seq(1, 2, 3, 4).map(v => ("g", "A", v.toDouble)) ++
      Seq(2, 4, 6, 8, 10).map(v => ("g", "B", v.toDouble)))
      .toDF("g", "variant", "v")
    val r = Abtest.welch(df, "g", "variant", "v", "A", "B").head()
    assert(r.getLong(1) == 4L && r.getLong(2) == 5L)
    assert(r.getDouble(3) == 2.5 && r.getDouble(4) == 6.0)
    assert(math.abs(r.getDouble(5) - -2.251440) < 1e-4, s"t=${r.getDouble(5)}")
    assert(math.abs(r.getDouble(6) - 5.520798) < 1e-3, s"dof=${r.getDouble(6)}")
    assert(r.getBoolean(7))
  }

  test("identical distributions are not significant; extras ignored") {
    val df = ((1 to 200).map(i => ("g", "A", (i % 10).toDouble)) ++
      (1 to 200).map(i => ("g", "B", (i % 10).toDouble)) ++
      (1 to 50).map(i => ("g", "C", 1e9))) // third variant must not leak
      .toDF("g", "variant", "v")
    val r = Abtest.welch(df, "g", "variant", "v", "A", "B").head()
    assert(r.getDouble(5) == 0.0 && !r.getBoolean(7))
  }
}
