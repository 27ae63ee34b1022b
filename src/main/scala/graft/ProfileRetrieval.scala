package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profiler for the q159 persisted-retrieval story
  * (round-13 brief item 1): times the index build+write, the index
  * read, and the serve path separately, then the serve path's own
  * stages, at the bench SF. */
object ProfileRetrieval {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val qs = spark.createDataFrame(Seq(
      (1L, "spark join fast"), (2L, "hash table scan"),
      (3L, "stream window state"))).toDF("query_id", "qtext")
    // warm-up (JIT/codegen)
    (1 to 2).foreach { _ =>
      val d = graft.etl.Scratch.dir("post-idx")
      graft.ops.Bm25.postings(docs, "doc_id", "text")
        .write.mode("overwrite").parquet(d)
      graft.ops.Retrieval.hybridTopKFromPostings(
        spark.read.parquet(d), "doc_id", qs, "query_id", "qtext", 20, 10)
        .count()
      graft.etl.Checkpoints.sweep(spark); graft.etl.Scratch.sweep()
    }
    val idxDir = graft.etl.Scratch.dir("hyb-idx")
    time("writeHybridIndex") {
      graft.ops.Retrieval.writeHybridIndex(docs, "doc_id", "text",
        idxDir, nPartitions = 8)
    }
    (1 to 3).foreach { i =>
      println(s"--- run $i ---")
      time("serve FromIndex") {
        graft.ops.Retrieval.hybridTopKFromIndex(spark, idxDir, "doc_id",
          qs, "query_id", "qtext", 20, 10).count()
      }
      val qterms = qs.select(col("query_id"),
        explode(array_distinct(
          graft.functions.TextFunctions.tokens(col("qtext")))).as("token"))
      val qtoks = time("  qterms collect") {
        qterms.collect().map(_.getString(1)).distinct.toSeq
      }
      time("  stats head") { spark.read.parquet(s"$idxDir/stats").head() }
      time("  df collect") {
        spark.read.parquet(s"$idxDir/df")
          .where(col("token").isin(qtoks: _*)).collect()
      }
      time("  post filtered count") {
        spark.read.parquet(s"$idxDir/postings")
          .where(col("token").isin(qtoks: _*)).count()
      }
      time("  dnorm count") {
        spark.read.parquet(s"$idxDir/norms").count()
      }
      graft.etl.Checkpoints.sweep(spark)
    }
    spark.stop()
  }
}
