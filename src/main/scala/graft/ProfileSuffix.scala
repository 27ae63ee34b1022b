package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off phase profiler for q208 (round-13 brief item 2): seed
  * ranking vs doubling/finish vs dense compression at the bench SF. */
object ProfileSuffix {
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
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = graft.etl.Tables.table(spark, sfDir, "documents")
    // warm-up
    graft.ops.Suffix.suffixRanks(docs, "doc_id", "text").count()
    graft.etl.Checkpoints.sweep(spark)
    (1 to 2).foreach { i =>
      println(s"--- run $i ---")
      time("suffixRanks total") {
        graft.ops.Suffix.suffixRanks(docs, "doc_id", "text").count()
      }
      graft.etl.Checkpoints.sweep(spark)
      // phase replication (mirrors suffixRanks internals)
      val txt = docs.where(col("text").isNotNull && length(col("text")) >= 1)
        .select(col("doc_id").as("id"), col("text").as("t"))
      val k0 = 32L
      val base = txt
        .select(col("id"), posexplode(
          graft.expressions.SuffixPrefixes(col("t"), k0.toInt)))
        .select(col("id"), (col("pos") + 1).as("pos"), col("col").as("c"))
        .withColumn("__b", substring(col("c"), 1, 2))
      time("  base explode+prefix") { base.agg(max(length(col("c")))).head() }
      val wSeed = Window.partitionBy(col("__b")).orderBy(col("c"))
      val offs0 = txt
        .select(explode(
          graft.expressions.SuffixPrefixes(col("t"), 2)).as("__b"))
        .groupBy("__b").agg(count(lit(1)).as("__c"))
        .withColumn("__off", coalesce(sum(col("__c")).over(
          Window.orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("__b", "__off")
      time("  offs0 branch") { offs0.count() }
      val seeded = time("  seeded window+join+ckpt") {
        graft.etl.Checkpoints.truncate(base
          .withColumn("__rk", rank().over(wSeed).cast("long"))
          .withColumn("__g", count(lit(1)).over(
            wSeed.rangeBetween(Window.currentRow, Window.currentRow)))
          .join(broadcast(offs0), "__b")
          .select(col("id"), col("pos"),
            (col("__off") + col("__rk")).as("r"), col("__g")))
      }
      val tied = seeded.where(col("__g") >= 2)
      println(s"[prof]   tied after seed = ${tied.count()}")
      val s0 = seeded.select("id", "pos", "r")
      time("  dense compression") {
        val n = 1500000L
        val distinctR = s0.select("r").distinct()
          .withColumn("__b", (col("r") * 256L / (n + 1L)).cast("long"))
        val wLoc = Window.partitionBy(col("__b")).orderBy(col("r"))
        val loc = distinctR
          .withColumn("__rn", row_number().over(wLoc).cast("long"))
        val offs = loc.groupBy("__b").agg(count(lit(1)).as("__c"))
          .withColumn("__off", coalesce(sum(col("__c")).over(
            Window.orderBy(col("__b"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("__b", "__off")
        val denseMap = loc.join(broadcast(offs), "__b")
          .select(col("r"), (col("__off") + col("__rn")).as("rank"))
        s0.hint("merge").join(denseMap, "r").select("id", "pos", "rank")
          .count()
      }
      graft.etl.Checkpoints.sweep(spark)
    }
    spark.stop()
  }
}
