package graft.etl

import java.nio.file.{Files, Path}

/** Managed scratch-directory root for ephemeral on-disk artifacts
  * (persisted index round-trips, streaming stage/sink/checkpoint
  * dirs). Everything allocated through [[dir]] lives under ONE
  * per-JVM root that a shutdown hook removes recursively — so a full
  * bench/verify pass leaks no temp directories even when individual
  * call sites cannot delete eagerly (a gate query hands back a LAZY
  * DataFrame over files it just wrote; the files must outlive the
  * call). Call sites that CAN delete eagerly use [[remove]].
  *
  * At cluster scale the equivalent is a job-scoped path under the
  * shuffle/scratch volume (`spark.local.dir`) — the lifecycle
  * contract (owned root, removed with the job) is the part that
  * matters, not the tmpfs. */
object Scratch {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft-scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(r)))
    r
  }

  /** A fresh unique directory under the managed root. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  /** A directory EXEMPT from [[sweep]] (still removed by the exit
    * hook): for warm artifacts deliberately carried across bench
    * invocations in one JVM — streaming checkpoints/sinks/staged
    * inputs that a later identical invocation RESUMES instead of
    * rebuilding (see `graft.streaming.WarmRuns`). Bounded by design:
    * one set per distinct (gate, input) pair, registered once.
    * While warm reuse is disabled (Bench's cold comparable passes)
    * there is nothing to retain, so this degrades to ordinary
    * sweepable [[dir]] scratch — repeated cold rebuilds of the same
    * gate leak nothing between queries. */
  def retainedDir(prefix: String): String =
    if (graft.streaming.WarmRuns.enabled)
      Files.createTempDirectory(root, RetainedPrefix + prefix).toString
    else dir(prefix)

  private val RetainedPrefix = "retained-"

  /** A directory UNCONDITIONALLY exempt from [[sweep]] (still removed
    * by the exit hook): for per-JVM PREBUILT state that read-path
    * gates serve from ([[PrebuiltState]]) — persisted indexes and
    * maintained-view state whose CREATION cost is measured by a
    * paired lifecycle gate, not by the read gate. Unlike
    * [[retainedDir]] this does not degrade when streaming warm reuse
    * is off: prebuilt-state reuse is the documented contract of the
    * read gates themselves (a view exists before you query it), not a
    * bench-pass optimization. Bounded: one dir per distinct state
    * key. */
  def pinnedDir(prefix: String): String =
    Files.createTempDirectory(root, RetainedPrefix + "pin-" + prefix).toString

  /** Eagerly remove a directory tree (scratch or otherwise); safe on
    * already-removed paths. */
  def remove(path: String): Unit = deleteTree(java.nio.file.Paths.get(path))

  /** Remove every allocation under the managed root (the root itself
    * survives for later [[dir]] calls). For single-threaded session
    * hosts (Bench / Verify) between independent queries — a finished
    * query's persisted indexes and streaming checkpoints are rebuilt
    * by the next invocation, so 350+ executions in one JVM must not
    * accumulate them. NOT safe while another thread's query is live. */
  def sweep(): Unit = {
    import scala.jdk.CollectionConverters._
    try Files.list(root).iterator().asScala.toSeq
      .filterNot(_.getFileName.toString.startsWith(RetainedPrefix))
      .foreach(deleteTree)
    catch { case _: Throwable => () }
    Mv.prune() // registered views backed by swept scratch self-evict
  }

  private def deleteTree(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    try
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
    catch { case _: Throwable => () }
  }
}
