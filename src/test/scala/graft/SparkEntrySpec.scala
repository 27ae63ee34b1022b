package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Driver-contract surface checks that aren't per-operator semantics:
  * concurrent invocations on one shared SparkSession must not interfere
  * (the SQL-surface queries register temp views — their names are
  * per-invocation unique). */
class SparkEntrySpec extends SparkSpec {

  private val sfA = "/root/testdata/sf0.001"
  private val sfB = "/root/testdata/sf0.01"

  test("SQL-surface queries at two SFs run concurrently without view collisions") {
    // Without unique view names, run 2's createOrReplaceTempView swaps
    // the table out from under run 1 mid-query; with 150 vs 1500
    // customers the wrong-answer modes are loud.
    for (_ <- 1 to 3) {
      val futures = Seq(
        Future(("q34a", SparkEntry.queries("q34_correlated")(spark, sfA).count())),
        Future(("q34b", SparkEntry.queries("q34_correlated")(spark, sfB).count())),
        Future(("q62a", SparkEntry.queries("q62_lateral")(spark, sfA).count())),
        Future(("q62b", SparkEntry.queries("q62_lateral")(spark, sfB).count())),
        Future(("q39a", SparkEntry.queries("q39_grouping_sets")(spark, sfA).count())),
        Future(("q39b", SparkEntry.queries("q39_grouping_sets")(spark, sfB).count())))
      val got = Await.result(Future.sequence(futures), 5.minutes).toMap
      assert(got("q34a") == 150L && got("q34b") == 1500L)
      assert(got("q62a") == 50L && got("q62b") == 50L)
      // grouping sets: |event_types| + |cohorts(10)| + 1 grand total
      assert(got("q39a") == 16L && got("q39b") == 16L)
    }
  }
}
