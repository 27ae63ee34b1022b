package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy audit + suppression over quasi-identifier (QI) columns —
  * the release gate a training corpus passes before leaving the
  * curation pipeline (companion to the PII redaction ops in
  * [[graft.ops.Redact]], which handle IN-TEXT identifiers; these
  * handle the COLUMN-COMBINATION re-identification risk).
  *
  * k-anonymity (Sweeney 2002): every QI combination must be shared by
  * at least k rows. l-diversity (Machanavelli et al. 2007): within
  * each QI group, the sensitive attribute must take at least l
  * distinct values (a k-anonymous group whose members all share one
  * sensitive value still leaks it).
  *
  * Both are single hash-aggregations on the QI key — one shuffle of
  * (QI, sensitive) pairs, no row data moved, partial aggregation
  * map-side. At 100 TB the audit is a metadata-scale result (one row
  * per QI combination); suppression is a partitioned window over the
  * same key, never a global sort.
  */
object Privacy {

  /** One row per QI combination: group size `n`, sensitive-value
    * diversity `l_div`, and the two audit verdicts. */
  def kAnonymityAudit(df: DataFrame, qi: Seq[String], sensitive: String,
      k: Int, l: Int): DataFrame = {
    require(qi.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1 && l >= 1, s"thresholds must be positive, got k=$k l=$l")
    require(!qi.contains(sensitive),
      s"sensitive column $sensitive cannot also be a quasi-identifier")
    df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(col(sensitive)).as("l_div"))
      .withColumn("k_anonymous", col("n") >= k)
      .withColumn("l_diverse", col("l_div") >= l)
  }

  /** Suppress (null out) the QI columns of every row whose QI group
    * is smaller than k — the simplest generalization ladder rung that
    * makes the output k-anonymous by construction (suppressed rows
    * all join the all-null group; callers wanting coarser ladders
    * pre-bucket the QI columns). One partitioned window over the QI
    * key; row count and non-QI columns pass through untouched. */
  def suppress(df: DataFrame, qi: Seq[String], k: Int): DataFrame = {
    require(qi.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be positive, got $k")
    val w = Window.partitionBy(qi.map(col): _*)
    val flagged = df.withColumn("__n", count(lit(1)).over(w))
    qi.foldLeft(flagged) { (d, c) =>
      d.withColumn(c, when(col("__n") >= k, col(c)))
    }.drop("__n")
  }
}
