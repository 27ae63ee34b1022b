package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** The ONE lineage-truncation policy for every iterative operator
  * (connected components, PageRank, BFS, BPE training, MMR, winnowing,
  * global rank, prefix-join materialization). Two concerns live here:
  *
  * '''Durability strategy.''' `spark.graft.checkpoint.mode`:
  *  - `local` (default): `localCheckpoint(eager = true)` — executor
  *    block-manager storage, fastest, correct on `local[*]`. On a real
  *    cluster a lost executor loses its checkpointed partitions WITH
  *    their lineage, failing the job — acceptable only when the
  *    cluster does not decommission executors mid-job.
  *  - `reliable`: `checkpoint(eager = true)` to
  *    `spark.graft.checkpoint.dir` (or a [[Scratch]] dir when unset) —
  *    survives executor loss / dynamic allocation, the cluster-honest
  *    mode. Partitioning is preserved, so the global-rank offset
  *    alignment contract holds in both modes.
  *
  * '''Block hygiene.''' An eager checkpoint's blocks live until JVM
  * exit unless freed — a long-lived session (the driver's 352-execution
  * bench JVM) otherwise accumulates storage until late queries thrash.
  * Iterative loops free each superseded iteration via [[free]] as soon
  * as its successor is materialized; session hosts (Bench / Verify)
  * call [[sweep]] between queries to release whatever a finished query
  * left pinned (returned frames are lazy over their final checkpoint,
  * so the OP cannot free those — only the host knows when the action
  * is done). */
object Checkpoints {

  /** `local` (default) or `reliable`. Runtime-settable per session. */
  val ModeKey = "spark.graft.checkpoint.mode"

  /** Reliable-mode checkpoint directory; defaults to a managed
    * [[Scratch]] dir (per-JVM, removed at shutdown). On a cluster set
    * this to a durable shared filesystem path. */
  val DirKey = "spark.graft.checkpoint.dir"

  def mode(spark: SparkSession): String =
    spark.conf.get(ModeKey, "local")

  /** Truncate `df`'s lineage per the session's configured strategy.
    * Always eager: callers rely on materialization for both plan-depth
    * control and the free-the-predecessor contract. */
  def truncate(df: DataFrame): DataFrame = mode(df.sparkSession) match {
    case "reliable" =>
      val sc = df.sparkSession.sparkContext
      // Synchronized: concurrent first-truncates (e.g. two Par threads in
      // MaterializedJoin.refresh) must not race the check-then-set and
      // split checkpoint files across two directories.
      Checkpoints.synchronized {
        if (sc.getCheckpointDir.isEmpty)
          sc.setCheckpointDir(
            df.sparkSession.conf.get(DirKey, Scratch.dir("reliable-ckpt")))
      }
      df.checkpoint(eager = true)
    case "local" => df.localCheckpoint(eager = true)
    case other => throw new IllegalArgumentException(
      s"$ModeKey must be 'local' or 'reliable', got '$other'")
  }

  /** Release the storage behind a [[truncate]]d frame (no-op on frames
    * that were never truncated): every `LogicalRDD` in the plan is the
    * product of a checkpoint, and unpersisting it drops its blocks
    * without touching reliable-mode checkpoint FILES (those live until
    * the Scratch root is swept / the configured dir is cleaned). Only
    * call once no consumer will read the frame again — a freed LOCAL
    * checkpoint has no lineage to recompute from. */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Host-level hygiene between independent queries in one long-lived
    * session: drop every cached plan (CacheManager bookkeeping AND
    * blocks) and unpersist every still-registered RDD (eager
    * checkpoints are not tracked by the CacheManager, only here). */
  def sweep(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
