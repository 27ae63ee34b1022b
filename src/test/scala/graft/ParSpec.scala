package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.etl.Par]] is the concurrency under every overlapped state
  * landing — its contract (run ALL actions to completion, then
  * rethrow the first failure) is what keeps torn-epoch fencing
  * sound, so it gets its own spec. */
class ParSpec extends AnyFunSuite {

  test("runs all actions and preserves effects") {
    val hits = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    graft.etl.Par.run((0 until 5).map(i => () => { hits.add(i); () }): _*)
    assert(hits.size == 5)
  }

  test("rethrows the FIRST failure after every action completes") {
    val done = new java.util.concurrent.atomic.AtomicInteger()
    val e = intercept[RuntimeException] {
      graft.etl.Par.run(
        () => throw new RuntimeException("first"),
        () => { Thread.sleep(50); done.incrementAndGet(); () },
        () => throw new IllegalStateException("second"))
    }
    assert(e.getMessage == "first")
    // the slow sibling was NOT aborted — partial outputs stay the
    // caller's (idempotent-overwrite / fence) problem, not a torn
    // thread's
    assert(done.get() == 1)
  }

  test("empty and single-action calls run inline") {
    graft.etl.Par.run()
    var ran = false
    graft.etl.Par.run(() => { ran = true })
    assert(ran)
  }
}
