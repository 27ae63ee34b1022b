package graft.etl

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** Materialized views with OPTIMIZER-INTEGRATED reuse: [[register]]
  * materializes an aggregate query to parquet and records its plan
  * fingerprint; the [[MvRewrite]] Catalyst rule then rewrites ANY
  * later query whose aggregate subtree is structurally identical to
  * read the materialization instead of re-scanning the fact table —
  * the caller keeps writing the query against the base table and the
  * planner substitutes the precomputed result. This is the
  * query-side complement of [[MaterializedAgg]] (which maintains
  * partials incrementally but must be read explicitly).
  *
  * Matching is by a canonicalized-plan fingerprint: exprIds and
  * aliases are normalized by Catalyst's canonicalization, and file
  * relations are identified by their root paths + pruned schema — so
  * the SAME aggregation over the SAME files matches regardless of
  * how the DataFrame was rebuilt, while any change to grouping keys,
  * aggregate expressions, filters, or source files misses.
  *
  * Scale shape: the rewrite replaces a full fact-table scan +
  * shuffle with a scan of the (group-cardinality-sized) parquet
  * result — the classic 100 TB dashboard lever. The registry is
  * driver-side metadata (one entry per registered view); lookups
  * happen only at Aggregate-rooted plan nodes during optimization,
  * and entries whose backing files are gone self-evict ([[prune]]
  * runs on every [[Scratch.sweep]]). */
object Mv {

  /** fingerprint -> parquet path of the materialized result. */
  private val registry = TrieMap.empty[String, String]

  /** Bypass flag so that computing the DEFINING query's fingerprint
    * (and writing its data) never routes through an earlier
    * registration of the same shape. */
  private val disabled = new ThreadLocal[Boolean] {
    override def initialValue: Boolean = false
  }

  /** Materialize `df` (an Aggregate-rooted query) to `path` and
    * register it for automatic substitution. Re-registering the same
    * shape replaces the previous entry. */
  def register(df: DataFrame, path: String): Unit = {
    disabled.set(true)
    try {
      require(df.queryExecution.optimizedPlan.isInstanceOf[Aggregate],
        "Mv.register expects an Aggregate-rooted query (got " +
          df.queryExecution.optimizedPlan.nodeName + ")")
      df.write.mode("overwrite").parquet(path)
      registry.put(fingerprint(df.queryExecution.optimizedPlan), path)
    } finally disabled.set(false)
  }

  def lookup(fp: String): Option[String] =
    if (disabled.get) None
    else registry.get(fp).filter { p =>
      val ok = java.nio.file.Files.exists(java.nio.file.Paths.get(p))
      if (!ok) registry.remove(fp)
      ok
    }

  def isEmpty: Boolean = registry.isEmpty

  def clear(): Unit = registry.clear()

  /** Drop entries whose backing files are gone (swept scratch). */
  def prune(): Unit =
    registry.keys.foreach { fp =>
      registry.get(fp).foreach { p =>
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          registry.remove(fp)
      }
    }

  /** Structural fingerprint of a canonicalized plan: node kinds +
    * canonicalized expressions, with file relations rendered as
    * (root paths, pruned output schema). Names and exprIds are
    * already normalized by canonicalization, so semantically
    * identical plans built independently fingerprint equal. */
  def fingerprint(plan: LogicalPlan): String =
    plan.canonicalized.map {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            s"scan[${fs.location.rootPaths.mkString(",")}]" +
              lr.output.map(a => a.dataType.simpleString)
                .mkString("[", ",", "]")
          case other => s"scan[${other.schema.simpleString}]"
        }
      case n =>
        n.nodeName +
          n.expressions.map(_.canonicalized.toString)
            .mkString("[", ",", "]")
    }.mkString("\n")
}

/** The substitution rule (injected via
  * `spark.experimental.extraOptimizations`, which runs AFTER the main
  * optimizer batches — so both the registered fingerprint and the
  * probed subtree are in fully-optimized form). Output attributes are
  * re-aliased positionally onto the original exprIds, keeping every
  * downstream reference valid. */
object MvRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (Mv.isEmpty) plan
    else plan.transformDown {
      case agg: Aggregate if agg.resolved &&
          Mv.lookup(Mv.fingerprint(agg)).isDefined =>
        val path = Mv.lookup(Mv.fingerprint(agg)).get
        val scan = SparkSession.active.read.parquet(path)
          .queryExecution.analyzed
        Project(agg.output.zip(scan.output).map { case (o, n) =>
          Alias(n, o.name)(exprId = o.exprId)
        }, scan)
    }
}
