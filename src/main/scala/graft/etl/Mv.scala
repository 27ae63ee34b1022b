package graft.etl

import scala.collection.concurrent.TrieMap
import scala.util.control.NonFatal

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
  * relations are identified by their CONCRETE FILE SNAPSHOT — every
  * (path, length, mtime) triple in the scan — plus the pruned
  * schema. So the SAME aggregation over the SAME files matches
  * regardless of how the DataFrame was rebuilt, while any change to
  * grouping keys, aggregate expressions, filters, or the base
  * table's files (INCLUDING files appended to the same directory, or
  * rewritten in place) misses and falls back to the live scan — a
  * stale materialization is never served.
  *
  * Scale shape: the rewrite replaces a full fact-table scan +
  * shuffle with a scan of the (group-cardinality-sized) parquet
  * result — the classic 100 TB dashboard lever. The registry is
  * driver-side metadata, SCOPED PER SESSION (keyed by session UUID,
  * so two SparkSessions in one JVM never see each other's views);
  * lookups happen only at Aggregate-rooted plan nodes during
  * optimization, and only after a cheap root-path pre-screen — the
  * full fingerprint (which lists files) is computed ONLY for
  * aggregates that actually scan a registered view's base table.
  * Entries whose backing files are gone self-evict ([[prune]] runs
  * on every [[Scratch.sweep]]); existence is resolved through the
  * path's own Hadoop FileSystem, so views materialized to HDFS/S3
  * behave the same as local ones. */
object Mv {

  private case class Entry(path: String, baseRoots: Set[String])

  /** (session UUID, fingerprint) -> materialization. */
  private val registry = TrieMap.empty[(String, String), Entry]

  /** Bypass flag so that computing the DEFINING query's fingerprint
    * (and writing its data) never routes through an earlier
    * registration of the same shape. */
  private val disabled = new ThreadLocal[Boolean] {
    override def initialValue: Boolean = false
  }

  /** Stable per-session key. Classic sessions expose a UUID; any
    * other implementation falls back to identity (still per-session,
    * just not stable across serialization — registry is driver-only
    * so that is sufficient). */
  private def sessionKey(spark: SparkSession): String =
    try org.apache.spark.sql.graftbridge.Bridge.sessionUUID(spark)
    catch { case _: ClassCastException =>
      "id-" + System.identityHashCode(spark).toString }

  /** Materialize `df` (an Aggregate-rooted query) to `path` and
    * register it for automatic substitution in `df`'s OWN session.
    * Re-registering the same shape replaces the previous entry. */
  def register(df: DataFrame, path: String): Unit = {
    disabled.set(true)
    try {
      val plan = df.queryExecution.optimizedPlan
      require(plan.isInstanceOf[Aggregate],
        "Mv.register expects an Aggregate-rooted query (got " +
          plan.nodeName + ")")
      df.write.mode("overwrite").parquet(path)
      registry.put((sessionKey(df.sparkSession), fingerprint(plan)),
        Entry(path, rootPathsOf(plan)))
    } finally disabled.set(false)
  }

  /** Register a view whose materialization ALREADY exists at `path`
    * (maintained externally, e.g. [[MaintainedMv]]): records the
    * defining plan's fingerprint without re-writing the data. Any
    * previous registration pointing at the same path (an older base
    * snapshot) is dropped — one materialization, one live
    * fingerprint. */
  private[etl] def registerExisting(df: DataFrame, path: String): Unit = {
    disabled.set(true)
    try {
      val plan = df.queryExecution.optimizedPlan
      require(plan.isInstanceOf[Aggregate],
        "Mv.registerExisting expects an Aggregate-rooted query (got " +
          plan.nodeName + ")")
      val sk = sessionKey(df.sparkSession)
      registry.keys.foreach { key =>
        if (key._1 == sk && registry.get(key).exists(_.path == path))
          registry.remove(key)
      }
      registry.put((sk, fingerprint(plan)), Entry(path, rootPathsOf(plan)))
    } finally disabled.set(false)
  }

  /** Union of the registered views' base-table root paths for this
    * session — the pre-screen set. Empty ⇒ the rewrite is a no-op. */
  def registeredRoots(spark: SparkSession): Set[String] =
    if (disabled.get || registry.isEmpty) Set.empty
    else {
      val sk = sessionKey(spark)
      registry.iterator.collect {
        case ((s, _), e) if s == sk => e.baseRoots
      }.flatten.toSet
    }

  /** Root paths of every file relation under `plan` (NOT the file
    * listing — this is the cheap pre-screen side). */
  def rootPathsOf(plan: LogicalPlan): Set[String] =
    plan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten.toSet

  def lookup(spark: SparkSession, fp: String): Option[String] =
    if (disabled.get) None
    else {
      val key = (sessionKey(spark), fp)
      registry.get(key).filter { e =>
        val ok = existsHadoop(spark, e.path)
        if (!ok) registry.remove(key)
        ok
      }.map(_.path)
    }

  def isEmpty: Boolean = registry.isEmpty

  def clear(): Unit = registry.clear()

  /** Drop entries whose backing files are gone (swept scratch). */
  def prune(): Unit =
    SparkSession.getActiveSession.foreach { spark =>
      registry.keys.foreach { key =>
        registry.get(key).foreach { e =>
          if (!existsHadoop(spark, e.path)) registry.remove(key)
        }
      }
    }

  /** Existence through the path's OWN filesystem (local, HDFS, S3 —
    * `java.nio.file` would evict every non-local materialization and
    * can throw on scheme-qualified URIs). */
  private def existsHadoop(spark: SparkSession, p: String): Boolean = {
    try {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
    } catch { case NonFatal(_) => false }
  }

  /** Structural fingerprint of a canonicalized plan: node kinds +
    * canonicalized expressions, with file relations rendered as the
    * SORTED (path, length, mtime) snapshot of their current file
    * listing + pruned output schema. Names and exprIds are already
    * normalized by canonicalization, so semantically identical plans
    * built independently fingerprint equal — but any file added,
    * removed, or rewritten under the same root path changes the
    * snapshot and misses. Listing goes through the relation's own
    * FileIndex (cached by Spark alongside the scan itself, so the
    * fingerprint sees exactly the files the query would read). */
  def fingerprint(plan: LogicalPlan): String =
    plan.canonicalized.map {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            val files = fs.location.listFiles(Nil, Nil)
              .flatMap(_.files.map(f =>
                s"${f.getPath}:${f.getLen}:${f.getModificationTime}"))
              .sorted
            s"scan[${files.mkString(",")}]" +
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
  * downstream reference valid. The fingerprint+lookup runs ONCE per
  * candidate aggregate (bound to a local, so a concurrent eviction
  * between guard and rewrite cannot throw), and only for aggregates
  * whose scanned root paths intersect a registered base table. */
object MvRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val spark = SparkSession.active
    val roots = Mv.registeredRoots(spark)
    if (roots.isEmpty) plan
    else plan.transformDown {
      case agg: Aggregate if agg.resolved &&
          Mv.rootPathsOf(agg).exists(roots) =>
        Mv.lookup(spark, Mv.fingerprint(agg)) match {
          case Some(path) =>
            val scan = spark.read.parquet(path).queryExecution.analyzed
            Project(agg.output.zip(scan.output).map { case (o, n) =>
              Alias(n, o.name)(exprId = o.exprId)
            }, scan)
          case None => agg
        }
    }
  }
}
