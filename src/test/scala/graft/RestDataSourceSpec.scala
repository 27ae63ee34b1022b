package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.etl.RestSource
import graft.sources.TestTransports

class RestDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def read(transportName: String, keys: String, onError: String = "fail") =
    spark.read.format("graft.sources.RestDataSource")
      .option("keys", keys)
      .option("urlTemplate", "http://api.test/data/all/{key}")
      .option("transport", s"registry:$transportName")
      .option("onError", onError)
      .option("initialDelaySec", "0.001")
      .load()

  test("one partition per key; bodies fetched executor-side") {
    TestTransports.register("ok", url =>
      RestSource.Response(200, s"""[{"url": "$url"}]"""))
    val df = read("ok", "2000, 2001,2002")
    assert(df.rdd.getNumPartitions == 3)
    val rows = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.keySet == Set("2000", "2001", "2002"))
    assert(rows("2001").contains("/data/all/2001"))
    // downstream JSON parse of the landed bodies
    val parsed = spark.read.json(df.select("body").as[String])
    assert(parsed.count() == 3 && parsed.columns.contains("url"))
  }

  test("transient errors retry inside the task; permanent failures skip") {
    val n = new AtomicInteger(0)
    TestTransports.register("flaky", url =>
      if (url.endsWith("/bad")) RestSource.Response(404, "gone")
      else if (n.incrementAndGet() < 3) RestSource.Response(503, "retry me")
      else RestSource.Response(200, "fine"))
    val out = read("flaky", "good,bad", onError = "skip").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("good"))
    assert(n.get() >= 3) // retried through the 503s
  }

  test("onError=fail surfaces the fetch error") {
    TestTransports.register("down", _ => RestSource.Response(500, "dead"))
    val ex = intercept[Exception] { read("down", "x").collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("REST fetch failed")))
  }
}
