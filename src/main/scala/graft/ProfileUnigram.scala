package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off phase profiler for q203 at scale. */
object ProfileUnigram {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.etl.Tables.table(spark, dir, "documents")
    (1 to 2).foreach { i =>
      println(s"--- run $i ---")
      val words = graft.ops.Unigram.wordCounts(docs, "text", 12)
      time("wordCounts count") { words.count() }
      val vocab = graft.ops.Unigram.seedVocab(words, 4, 200)
      time("seedVocab collect") { vocab.collect().length }
      val rows = vocab.select(col("piece"), col("score")).collect()
      val ps = rows.map(_.getString(0)).toSeq
      val ws = rows.map(_.getDouble(1)).toSeq
      time("main action w/ precollected") {
        words.where(length(col("word")) <= 12)
          .withColumn("__seg", graft.expressions.UnigramSegment(
            col("word"), ps, ws, 4))
          .where(col("__seg").isNotNull)
          .select(col("word"), col("__seg.cost").as("cost"))
          .count()
      }
      time("segmentCosts full") {
        graft.ops.Unigram.segmentCosts(words, vocab, 4, 12).count()
      }
      time("q203 gate end-to-end") {
        SparkEntry.queries("q203_unigram_cost")(spark, dir).count()
      }
      graft.etl.Checkpoints.sweep(spark)
    }
    spark.stop()
  }
}
