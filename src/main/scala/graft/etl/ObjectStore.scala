package graft.etl

import org.apache.spark.sql.SparkSession

/** Object-store landing contract — the reference's own stated future
  * direction (`README.md` "Future Development": move the JSON landing
  * zone and warehouse to cloud storage; `aws_etl.drawio`). Every graft
  * source and sink addresses data by URI string ([[Tables.table]],
  * [[JsonDirSource]], [[WarehouseSink.overwritePath]], persisted
  * index/posting paths), so `s3a://bucket/prefix` flows through every
  * operator unchanged once the standard Hadoop S3A connector is
  * configured. This object centralizes that configuration using only
  * public `fs.s3a.*` settings (hadoop-aws), nothing proprietary.
  *
  * 100 TB posture — the two settings that actually matter at scale:
  *
  *  - '''Committer.''' S3 has no atomic directory rename, so the
  *    default `FileOutputCommitter` (rename-based, v1 or v2) is both
  *    slow (copy+delete per file) and unsafe under failure. The S3A
  *    "magic" committer writes task output as in-flight multipart
  *    uploads and completes them atomically at job commit —
  *    [[s3aCommitters]] enables it exactly as documented in the
  *    hadoop-aws committer guide.
  *  - '''Connection fan-out.''' A 1000-executor scan issues far more
  *    concurrent GETs than the connector's default pool allows;
  *    [[configure]] raises `fs.s3a.connection.maximum` / thread pool
  *    alongside the endpoint settings.
  *
  * This sandbox is zero-egress and ships no object store, so the
  * contract is configuration-only here (spec-asserted); on a real
  * cluster it is the one switch between `file:/` and `s3a://` layouts.
  */
object ObjectStore {

  /** Connector settings: all optional — `None` leaves the public AWS
    * default-chain behavior (instance profile / env credentials, the
    * real-cluster default). `endpoint` + `pathStyleAccess` cover
    * S3-compatible stores (MinIO, localstack) for integration rigs. */
  final case class S3Settings(
      endpoint: Option[String] = None,
      region: Option[String] = None,
      pathStyleAccess: Boolean = false,
      credentialsProvider: Option[String] = None,
      maxConnections: Int = 256)

  /** Apply connector settings to the session's Hadoop configuration.
    * Idempotent; affects every subsequently-opened `s3a://` path. */
  def configure(spark: SparkSession, s3: S3Settings = S3Settings()): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.impl", "org.apache.hadoop.fs.s3a.S3AFileSystem")
    s3.endpoint.foreach(hc.set("fs.s3a.endpoint", _))
    s3.region.foreach(hc.set("fs.s3a.endpoint.region", _))
    if (s3.pathStyleAccess) hc.set("fs.s3a.path.style.access", "true")
    s3.credentialsProvider
      .foreach(hc.set("fs.s3a.aws.credentials.provider", _))
    hc.set("fs.s3a.connection.maximum", s3.maxConnections.toString)
    hc.set("fs.s3a.threads.max", (s3.maxConnections / 4).toString)
    hc.set("fs.s3a.fast.upload", "true")
  }

  /** Enable the S3A magic committer for `s3a://` output paths (the
    * rename-free, failure-atomic job commit), per the hadoop-aws
    * committer documentation. Requires the `spark-hadoop-cloud` module
    * (shipped with Apache Spark distributions) on the classpath —
    * `PathOutputCommitProtocol` binds per output scheme, so `file:/`
    * writes keep their default committer. */
  def s3aCommitters(spark: SparkSession): Boolean = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.committer.name", "magic")
    hc.set("fs.s3a.committer.magic.enabled", "true")
    hc.set("mapreduce.outputcommitter.factory.scheme.s3a",
      "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory")
    // Spark validates committer classes at conf-set time, so the SQL
    // wiring can only land when spark-hadoop-cloud is actually on the
    // classpath; report which mode the session got
    val cloudPresent =
      try { Class.forName(
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol")
        true }
      catch { case _: ClassNotFoundException => false }
    if (cloudPresent) {
      spark.conf.set("spark.sql.parquet.output.committer.class",
        "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter")
      spark.conf.set("spark.sql.sources.commitProtocolClass",
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol")
    }
    cloudPresent
  }

  /** Resolve a table/landing path against a root URI: the one-line
    * switch between a local layout and an object-store layout.
    * `resolve("s3a://corpus/landing", "documents")` →
    * `s3a://corpus/landing/documents`. */
  def resolve(root: String, name: String): String =
    root.stripSuffix("/") + "/" + name.stripPrefix("/")
}
