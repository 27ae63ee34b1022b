package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the contract-check layer a
  * 100 TB ingestion needs in front of every landed batch (the
  * Deequ / dbt-test / Great-Expectations pattern, re-expressed as
  * Spark aggregations). The reference's pipeline trusts its explicit
  * DDL (`local_data_ingestion.py:31-47`) and the notebook probes
  * uniqueness by hand (analytics.ipynb HAVING-count cells); this is
  * the systematic form of both.
  *
  * Execution shape, which is the whole point at scale:
  *  - ALL row-level rules (not-null / range / regex / set-membership /
  *    custom predicate) evaluate in ONE pass — a single aggregation
  *    of conditional counts; adding a rule adds a codegen'd column,
  *    never a scan.
  *  - [[Unique]] aggregates on the key (map-side combinable) and
  *    counts groups with duplicates — no window, no full sort.
  *  - [[RefIntegrity]] is a LEFT ANTI join against the (deduplicated,
  *    broadcastable-if-small) reference key set.
  *
  * The report is one row per rule: `rule`, `n_violations`, `n_rows`,
  * `pass` — deterministic, so it oracle-gates like any query. */
object Expectations {

  sealed trait Expectation { def name: String }

  /** Column must be non-null. */
  case class NotNull(column: String) extends Expectation {
    def name = s"not_null($column)"
  }
  /** Non-null values must lie in [lo, hi]. */
  case class InRange(column: String, lo: Double, hi: Double)
      extends Expectation {
    def name = s"in_range($column,$lo,$hi)"
  }
  /** Non-null values must match the (Java/RE2-compatible) regex. */
  case class MatchesRegex(column: String, pattern: String)
      extends Expectation {
    def name = s"matches_regex($column)"
  }
  /** Non-null values must be one of the given strings. */
  case class OneOf(column: String, values: Seq[String])
      extends Expectation {
    def name = s"one_of($column)"
  }
  /** Arbitrary row predicate that must hold (NULL counts as a
    * violation — an unknown is not a pass). */
  case class Satisfies(label: String, predicate: Column)
      extends Expectation {
    def name = s"satisfies($label)"
  }
  /** The column tuple must be unique across the frame. Violations =
    * number of ROWS involved in any duplicate group. */
  case class Unique(columns: Seq[String]) extends Expectation {
    def name = s"unique(${columns.mkString(",")})"
  }
  /** Every non-null value must exist in `ref`'s `refColumn`.
    * Violations = rows whose key is absent. */
  case class RefIntegrity(column: String, ref: DataFrame,
      refColumn: String) extends Expectation {
    def name = s"ref_integrity($column)"
  }

  private def violationCond(e: Expectation): Column = e match {
    case NotNull(c) => col(c).isNull
    case InRange(c, lo, hi) =>
      col(c).isNotNull && (col(c) < lo || col(c) > hi)
    case MatchesRegex(c, p) =>
      col(c).isNotNull && !col(c).rlike(p)
    case OneOf(c, vs) =>
      col(c).isNotNull && !col(c).isin(vs: _*)
    case Satisfies(_, p) => !coalesce(p, lit(false))
    case _ => throw new IllegalArgumentException(s"not row-level: $e")
  }

  /** Evaluate `rules` against `df`: one row per rule, in RULE ORDER
    * (`rule`, `n_violations`, `n_rows`, `pass`). Row-level rules share
    * one aggregation pass; each Unique adds one reduced aggregation;
    * each RefIntegrity adds one anti join. */
  def check(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "no expectations given")
    val spark = df.sparkSession
    import spark.implicits._
    val rowRules = rules.filter {
      case _: Unique | _: RefIntegrity => false; case _ => true
    }
    val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (rowRules.nonEmpty) {
      // rule names carry parens/commas -> bind them positionally
      val aggCols = rowRules.zipWithIndex.map { case (r, i) =>
        coalesce(sum(when(violationCond(r), 1L).otherwise(0L)), lit(0L))
          .as(s"__r$i")
      } :+ count(lit(1)).as("__n")
      val one = df.agg(aggCols.head, aggCols.tail: _*)
      // unpivot the single row into (rule, n_violations, n_rows)
      frames += one.select(explode(map(
          rowRules.zipWithIndex.flatMap { case (r, i) =>
            Seq(lit(r.name), col(s"__r$i")) }: _*))
          .as(Seq("rule", "n_violations")),
        col("__n").as("n_rows"))
    }
    rules.foreach {
      case u @ Unique(cols0) =>
        // violations and total from the SAME reduced key frame — no
        // single-row re-join (sum of group sizes = row count)
        frames += df.groupBy(cols0.map(col): _*)
          .agg(count(lit(1)).as("__c"))
          .agg(
            coalesce(sum(when(col("__c") > 1, col("__c"))), lit(0L))
              .as("n_violations"),
            coalesce(sum(col("__c")), lit(0L)).as("n_rows"))
          .select(lit(u.name).as("rule"), col("n_violations"),
            col("n_rows"))
      case r @ RefIntegrity(c, ref, rc) =>
        // left join against the deduped (broadcastable) key set, then
        // one pass counts both the misses and the total
        val refKeys = ref.select(col(rc).as(c)).distinct()
          .withColumn("__hit", lit(1))
        frames += df.join(refKeys, Seq(c), "left")
          .agg(
            coalesce(sum(when(col(c).isNotNull && col("__hit").isNull,
              1L)), lit(0L)).as("n_violations"),
            count(lit(1)).as("n_rows"))
          .select(lit(r.name).as("rule"), col("n_violations"),
            col("n_rows"))
      case _ => ()
    }
    val all = frames.reduce(_.unionByName(_))
    // report in declared rule order
    val order = rules.map(_.name).zipWithIndex.toMap
    val orderDf = order.toSeq.toDF("rule", "__ord")
    all.join(broadcast(orderDf), "rule")
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("__ord")
      .select("rule", "n_violations", "n_rows", "pass")
  }
}
