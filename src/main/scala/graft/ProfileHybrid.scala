package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profiler for the q112 inline-hybrid residual
  * (round-14 brief item 4): times the posting materialization, each
  * derived aggregate, and the scoring tail separately at the given
  * corpus dir. */
object ProfileHybrid {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "128m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = graft.etl.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val qs = spark.createDataFrame(Seq(
      (1L, "spark join fast"), (2L, "hash table scan"),
      (3L, "stream window state"))).toDF("query_id", "qtext")
    // warm-up
    graft.ops.Retrieval.hybridTopK(docs, "doc_id", "text",
      qs, "query_id", "qtext", 20, 10).count()
    graft.etl.Checkpoints.sweep(spark); graft.etl.Scratch.sweep()
    (1 to 2).foreach { i =>
      println(s"--- run $i ---")
      time("tokenize-only sum(size)") {
        docs.select(size(graft.functions.TextFunctions.tokens(col("text")))
          .as("n")).agg(sum(col("n"))).head()
      }
      time("sort-only sum(size)") {
        docs.select(size(array_sort(
            graft.functions.TextFunctions.tokens(col("text")))).as("n"))
          .agg(sum(col("n"))).head()
      }
      time("postings count (no ckpt)") {
        graft.ops.Bm25.postings(docs, "doc_id", "text").count()
      }
      val post = time("postings truncate") {
        graft.etl.Checkpoints.truncate(
          graft.ops.Bm25.postings(docs, "doc_id", "text"))
      }
      time("stats") {
        post.groupBy(col("doc_id")).agg(max(col("dl")).as("__dl"))
          .agg(count(lit(1)).as("__n"), avg(col("__dl")).as("__avgdl"))
          .head()
      }
      val dfA = time("dfA count") {
        val d = post.groupBy(col("token")).agg(count(lit(1)).as("df"))
        d.count(); d
      }
      time("touched+dnorm count") {
        val qterms = qs.select(col("query_id"),
          explode(array_distinct(
            graft.functions.TextFunctions.tokens(col("qtext"))))
            .as("token"))
        val touched = post
          .join(broadcast(qterms.select(col("token")).distinct()), "token")
          .select(col("doc_id")).distinct()
        post.join(touched, Seq("doc_id"), "left_semi")
          .join(dfA, "token")
          .withColumn("w", col("tf") * lit(1.0))
          .groupBy(col("doc_id"))
          .agg(sqrt(sum(col("w") * col("w"))).as("__dnorm")).count()
      }
      time("FULL hybridTopK") {
        graft.ops.Retrieval.hybridTopK(docs, "doc_id", "text",
          qs, "query_id", "qtext", 20, 10).count()
      }
      graft.etl.Checkpoints.sweep(spark); graft.etl.Scratch.sweep()
    }
    spark.stop()
  }
}
