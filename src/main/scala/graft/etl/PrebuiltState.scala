package graft.etl

import scala.collection.concurrent.TrieMap

/** Per-JVM registry of PREBUILT on-disk state for read-path gates:
  * maintained views and persisted indexes whose steady-state serving
  * cost — the thing a user pays per query — is what the gate
  * measures, while state CREATION is measured separately by a paired
  * lifecycle gate (e.g. q159 serves the hybrid posting index that
  * q112 prices inline; the maintained-view `*_read`/`*_refresh`
  * gates serve state whose creation the q178/q182/q216/q259 family
  * prices end-to-end).
  *
  * This is NOT the streaming warm-resume cache ([[graft.streaming
  * .WarmRuns]], disabled during comparable bench passes): prebuilt
  * state is the read gate's documented CONTRACT — a materialized
  * view exists before you query it, an index is built before you
  * search it — so the build runs once per JVM (first invocation:
  * correctness harnesses see build + serve in one call) and every
  * invocation pays the full serve path. The paired lifecycle gate
  * keeps creation honest in the same bench table, and BASELINE.md
  * reports both numbers side by side.
  *
  * State lives in always-sweep-exempt scratch
  * ([[Scratch.pinnedDir]]), bounded to one dir per distinct key,
  * removed at JVM exit. */
object PrebuiltState {

  private val dirs = TrieMap.empty[String, String]

  /** The state directory for `key`, building it on first use (or if
    * external cleanup removed it): `build(dir)` must materialize the
    * complete state under the fresh `dir` before returning. */
  def getOrCreate(key: String, prefix: String)(build: String => Unit): String =
    dirs.get(key).filter(d => new java.io.File(d).exists()) match {
      case Some(d) => d
      case None =>
        val d = Scratch.pinnedDir(prefix)
        build(d)
        dirs.put(key, d)
        d
    }

  /** Harness-only: drop registered state whose key starts with
    * `keyPrefix` (dir deleted, registry entry removed) so the next
    * [[getOrCreate]] REBUILDS it — ClusterCheck uses this between its
    * local[*] and real-executor phases so the cluster run proves the
    * state build (executor-written parquet), not just the serve. */
  def invalidate(keyPrefix: String): Unit =
    dirs.keys.filter(_.startsWith(keyPrefix)).foreach { k =>
      dirs.remove(k).foreach(Scratch.remove)
    }
}
