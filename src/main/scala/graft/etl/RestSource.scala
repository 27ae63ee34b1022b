package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Base64
import java.util.concurrent.{Executors, Semaphore, TimeUnit}

import scala.util.Try

/** REST extraction source with the reference's exact resilience policy
  * (reference S1-S4, `local_test/scripts/local_data_extraction.py`):
  *
  *  - concurrency capped by a semaphore of `maxConcurrent` = 5 (`:22,159`)
  *  - retry <= 5 attempts; initial delay 1.0 s; backoff
  *    `delay = min(delay * 2 * U(1,2), 60 s)` (`:23-25,46-50`)
  *  - HTTP 429/5xx and transport/decode errors retry; other 4xx fail
  *    fast (`:96-106`); per-key errors collected into a run summary
  *    (`:169-185`)
  *  - idempotent landing: skip a key whose output file already exists
  *    (`:78-80`); one JSON file per key
  *
  * Transport and clock are injected so the policy is unit-testable with
  * zero egress; the default transport is `java.net.http` with the
  * reference's 30 s total timeout and Basic auth. This is a driver-side
  * connector: it lands files for `spark.read.json`, keeping the SQL
  * layer pure (SURVEY §7.3).
  */
object RestSource {

  final case class Policy(maxRetries: Int = 5, initialDelaySec: Double = 1.0,
    maxDelaySec: Double = 60.0, timeoutSec: Double = 30.0, maxConcurrent: Int = 5)

  /** status < 0 means transport error (retryable). */
  final case class Response(status: Int, body: String)

  final case class FetchError(key: String, message: String, attempts: Int)

  type Transport = String => Response

  /** `java.net.http` transport with Basic auth (reference `:154`). */
  def httpTransport(user: String, secret: String, timeoutSec: Double): Transport = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSec.toLong max 1L))
      .build()
    val auth = "Basic " + Base64.getEncoder.encodeToString(
      s"$user:$secret".getBytes(StandardCharsets.UTF_8))
    url => Try {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis((timeoutSec * 1000).toLong))
        .header("Authorization", auth)
        .header("Accept", "application/json")
        .GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      Response(resp.statusCode(), resp.body())
    }.recover { case e => Response(-1, e.toString) }.get
  }

  private def retryable(status: Int): Boolean =
    status < 0 || status == 429 || status >= 500

  /** One key with full retry/backoff. `jitter()` ~ U(0,1); `sleep` in
    * seconds (injected for tests). */
  def fetchWithRetry(transport: Transport, policy: Policy, url: String,
      sleep: Double => Unit = s => Thread.sleep((s * 1000).toLong),
      jitter: () => Double = () => scala.util.Random.nextDouble()): Either[FetchError, String] = {
    var delay = policy.initialDelaySec
    var attempt = 0
    var last = ""
    while (attempt < policy.maxRetries) {
      attempt += 1
      val r = transport(url)
      if (r.status >= 200 && r.status < 300) return Right(r.body)
      last = s"HTTP ${r.status}: ${r.body.take(200)}"
      if (!retryable(r.status))
        return Left(FetchError(url, s"permanent $last", attempt))
      if (attempt < policy.maxRetries) {
        sleep(delay)
        // delay = min(delay * 2 * U(1,2), cap)  — reference :46-50
        delay = math.min(delay * 2.0 * (1.0 + jitter()), policy.maxDelaySec)
      }
    }
    Left(FetchError(url, s"exhausted ${policy.maxRetries} retries; last $last", attempt))
  }

  /** Fetch all keys with bounded concurrency; land each result as
    * `outDir/data_all_{key}.json`, skipping keys already present
    * (idempotent re-run). Returns (landed paths, errors). */
  def landAll(transport: Transport, policy: Policy,
      keys: Seq[String], urlFor: String => String, outDir: String,
      sleep: Double => Unit = s => Thread.sleep((s * 1000).toLong),
      jitter: () => Double = () => scala.util.Random.nextDouble())
      : (Seq[String], Seq[FetchError]) = {
    Files.createDirectories(Paths.get(outDir))
    val sem = new Semaphore(policy.maxConcurrent)
    val pool = Executors.newFixedThreadPool(policy.maxConcurrent max 1)
    try {
      val futures = keys.map { key =>
        pool.submit(new java.util.concurrent.Callable[Either[FetchError, String]] {
          def call(): Either[FetchError, String] = {
            val path = Paths.get(outDir, s"data_all_$key.json")
            if (Files.exists(path)) Right(path.toString)
            else {
              sem.acquire()
              val res = try fetchWithRetry(transport, policy, urlFor(key), sleep, jitter)
              finally sem.release()
              res.map { body =>
                Files.write(path, body.getBytes(StandardCharsets.UTF_8))
                path.toString
              }.left.map(e => e.copy(key = key))
            }
          }
        })
      }
      val results = futures.map(_.get())
      (results.collect { case Right(p) => p },
        results.collect { case Left(e) => e })
    } finally {
      pool.shutdown()
      pool.awaitTermination(60, TimeUnit.SECONDS)
    }
  }
}
