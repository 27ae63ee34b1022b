package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.RestSource

/** DataSource V2 batch source for keyed REST extraction — the reference's
  * per-year fetch loop (`local_data_extraction.py:163-167`) as a Spark
  * scan: ONE INPUT PARTITION PER KEY, so the fetch parallelism is
  * cluster-scheduled instead of a driver-side thread pool, while the
  * retry/backoff policy is exactly `graft.etl.RestSource`'s.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.RestDataSource")
  *   .option("keys", "2000,2001,2002")
  *   .option("urlTemplate", "https://host/data/all/{key}")
  *   .option("user", "any-user").option("secret", sys.env("API_KEY"))
  *   .option("onError", "skip")        // or "fail" (default)
  *   .load()                           // => (key string, body string)
  * }}}
  *
  * Output rows are (key, raw response body); parse downstream with
  * `spark.read.json(df.select("body").as[String])` or `from_json`.
  * For tests (zero egress), `transport=registry:<name>` resolves a
  * transport from [[TestTransports]] (single-JVM local mode only).
  */
class RestDataSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RestTable(new CaseInsensitiveStringMap(properties))
}

object RestDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("body", StringType, nullable = true)))
}

/** Test-only transport registry (single-JVM local mode). */
object TestTransports {
  private val transports =
    new java.util.concurrent.ConcurrentHashMap[String, RestSource.Transport]()
  def register(name: String, t: RestSource.Transport): Unit =
    transports.put(name, t)
  def lookup(name: String): RestSource.Transport = {
    val t = transports.get(name)
    require(t != null, s"no test transport registered under '$name'")
    t
  }
}

private[sources] class RestTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_rest"
  override def schema(): StructType = RestDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(o)
    new RestScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private[sources] class RestScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch {

  private val keys: Seq[String] = Option(options.get("keys"))
    .getOrElse(throw new IllegalArgumentException("option 'keys' is required"))
    .split(",").map(_.trim).filter(_.nonEmpty).toSeq
  private val urlTemplate: String = Option(options.get("urlTemplate"))
    .getOrElse(throw new IllegalArgumentException("option 'urlTemplate' is required"))
  private val transportSpec = Option(options.get("transport")).getOrElse("http")
  private val user = Option(options.get("user")).getOrElse("any-user")
  private val secret = Option(options.get("secret")).getOrElse("")
  private val onError = Option(options.get("onError")).getOrElse("fail")
  private val policy = RestSource.Policy(
    maxRetries = Option(options.get("maxRetries")).map(_.toInt).getOrElse(5),
    initialDelaySec = Option(options.get("initialDelaySec")).map(_.toDouble).getOrElse(1.0),
    maxDelaySec = Option(options.get("maxDelaySec")).map(_.toDouble).getOrElse(60.0),
    timeoutSec = Option(options.get("timeoutSec")).map(_.toDouble).getOrElse(30.0))

  override def build(): Scan = this
  override def readSchema(): StructType = RestDataSource.Schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    keys.map(k => RestPartition(k, urlTemplate, transportSpec, user, secret,
      onError, policy): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory
}

private[sources] case class RestPartition(key: String, urlTemplate: String,
  transportSpec: String, user: String, secret: String, onError: String,
  policy: RestSource.Policy) extends InputPartition

private[sources] class RestReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[RestPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      private var row: InternalRow = _

      private def transport: RestSource.Transport =
        if (part.transportSpec.startsWith("registry:"))
          TestTransports.lookup(part.transportSpec.stripPrefix("registry:"))
        else RestSource.httpTransport(part.user, part.secret, part.policy.timeoutSec)

      override def next(): Boolean = {
        if (emitted) return false
        emitted = true
        val url = part.urlTemplate.replace("{key}", part.key)
        RestSource.fetchWithRetry(transport, part.policy, url) match {
          case Right(body) =>
            row = InternalRow(UTF8String.fromString(part.key),
              UTF8String.fromString(body))
            true
          case Left(err) if part.onError == "skip" => false
          case Left(err) =>
            throw new RuntimeException(
              s"REST fetch failed for key=${part.key}: ${err.message}")
        }
      }

      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
