package graft

import org.apache.spark.sql.functions._

import graft.etl.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq((1L, "a", 10.0), (2L, "b", 20.0),
    (3L, "c", 30.0)).toDF("id", "tag", "amt")

  test("mergeInto: update, delete, insert, and keep clauses all fire") {
    val source = Seq((2L, "B", 200.0), (3L, "DEL", 0.0), (4L, "d", 40.0))
      .toDF("id", "tag", "amt")
    val out = Merge.mergeInto(target, source, Seq("id"),
        whenMatchedDelete = col("s.tag") === "DEL",
        whenMatchedUpdate = Map("amt" -> (col("s.amt") + col("t.amt"))))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // 1 kept; 2 updated (amt summed, tag keeps TARGET); 3 deleted; 4 inserted
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "b", 220.0),
      (4L, "d", 40.0)))
  }

  test("mergeInto: insertNotMatched=false drops source-only rows; default upsert keeps target values") {
    val source = Seq((2L, "B", 200.0), (4L, "d", 40.0)).toDF("id", "tag", "amt")
    val noIns = Merge.mergeInto(target, source, Seq("id"),
        insertNotMatched = false)
      .orderBy("id").collect().map(_.getLong(0))
    assert(noIns.toSeq == Seq(1L, 2L, 3L))
    // empty update map: matched rows keep every TARGET column
    val row2 = Merge.mergeInto(target, source, Seq("id"))
      .where(col("id") === 2L).head()
    assert(row2.getString(1) == "b" && row2.getDouble(2) == 20.0)
  }

  test("mergeInto refuses update clauses naming unknown columns") {
    val source = Seq((2L, "B", 200.0)).toDF("id", "tag", "amt")
    val e = intercept[IllegalArgumentException] {
      Merge.mergeInto(target, source, Seq("id"),
        whenMatchedUpdate = Map("nope" -> lit(1)))
    }
    assert(e.getMessage.contains("nope"))
  }
}
