package graft.etl

/** Run INDEPENDENT Spark actions concurrently from the driver.
  *
  * Spark's scheduler accepts jobs from many driver threads; a
  * lifecycle operation that lands several mutually-independent
  * datasets (e.g. [[MaterializedJoin.create]]'s bucketed A and B
  * copies, or a refresh's three per-epoch landings) wastes cluster
  * idle time by submitting them one after another — each job's tail
  * (a few straggler tasks, output commit) leaves most executors
  * idle. Overlapping them fills those gaps; at any scale the total
  * work is unchanged but the wall-clock is the max, not the sum.
  *
  * Semantics: runs every thunk to completion (no early abort — each
  * action is an idempotent overwrite whose partial output a torn-
  * epoch fence or replay already handles), then rethrows the FIRST
  * failure with every other thread's failure attached as suppressed
  * (concurrent failures usually share a root cause; losing the other
  * stack traces hides it). Caller must pass only actions with no
  * ordering dependency between them; anything that must happen-after
  * (commit markers!) stays outside the call. */
object Par {

  def run(actions: (() => Unit)*): Unit = {
    if (actions.length <= 1) { actions.foreach(_()); return }
    val errs = new java.util.concurrent.atomic.AtomicReferenceArray[Throwable](
      actions.length)
    val threads = actions.zipWithIndex.map { case (a, i) =>
      val t = new Thread(() => try a() catch { case e: Throwable =>
        errs.set(i, e) })
      t.setDaemon(true)
      t.setName(s"graft-par-$i")
      t.start()
      t
    }
    threads.foreach(_.join())
    val failures = actions.indices.flatMap(i => Option(errs.get(i)))
    if (failures.nonEmpty) {
      val first = failures.head
      failures.tail.foreach(first.addSuppressed)
      throw first
    }
  }
}
