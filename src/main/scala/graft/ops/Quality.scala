package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality probes from the reference's EDA cells. */
object Quality {

  /** Business-key uniqueness probe (reference
    * `mkt_returns/sql_test_mkt_returns.ipynb:590-658`, A1+A2): rows per
    * candidate key with multiplicity > 1. Empty result proves the key is
    * unique. Hash aggregation on the key columns — one shuffle, partial
    * counts map-side. */
  def keyViolations(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 1)

  /** True iff `keys` is a unique key of `df`. Action at the edge —
    * intended for tests/checks, not inside pipelines. */
  def isUniqueKey(df: DataFrame, keys: Seq[String]): Boolean =
    keyViolations(df, keys).isEmpty

  /** Schema drift report against a declared contract: one row per
    * column that is missing, unexpected, or type-mismatched. Empty
    * result = schema conforms. Plan-free (driver-side metadata only). */
  def schemaDrift(df: DataFrame,
      expected: org.apache.spark.sql.types.StructType): Seq[(String, String, String, String)] = {
    val actual = df.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val exp = expected.map(f => f.name -> f.dataType.simpleString).toMap
    val missing = exp.keySet.diff(actual.keySet).toSeq.sorted
      .map(c => (c, exp(c), "", "missing"))
    val extra = actual.keySet.diff(exp.keySet).toSeq.sorted
      .map(c => (c, "", actual(c), "unexpected"))
    val mismatched = exp.keySet.intersect(actual.keySet).toSeq.sorted
      .filter(c => exp(c) != actual(c))
      .map(c => (c, exp(c), actual(c), "type_mismatch"))
    missing ++ extra ++ mismatched
  }

  /** One-pass null profile: (column, n_nulls, null_ratio) for every
    * column — a SINGLE wide aggregation (one job, one scan), not a
    * count() per column. The null-density check that gates the
    * reference's DAILY_RETURN handling (128/472 nulls, SURVEY §1.2),
    * generalized. */
  def nullProfile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = count(lit(1)).as("__n") +:
      df.columns.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c")).toSeq
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getAs[Long]("__n")
    df.columns.toSeq.map { c =>
      val nulls = row.getAs[Long](s"__nulls_$c")
      (c, nulls, if (total == 0) 0.0 else nulls.toDouble / total)
    }.toDF("column", "n_nulls", "null_ratio")
  }
}
