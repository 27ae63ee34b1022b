package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profiler for q267 (steady-state CDC refresh, round-14
  * brief item 6): prebuilds the state once, then times the refresh's
  * three jobs — touched-bucket probe, merge+checkpoint, bucket
  * rewrite — separately. */
object ProfileCdc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    GraftExtensions.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val cut = to_timestamp(lit("2024-01-15 00:00:00"))
    val ev = graft.etl.Tables.table(spark, sfDir, "events")
    val path = graft.etl.Scratch.dir("prof-cdc")
    graft.etl.MaterializedCdc.create(ev.where(col("ts") < cut),
      "user_id", Seq("ts", "event_id"), "event_type", Seq("value"),
      path, nBuckets = 16)
    val delta = ev.where(col("ts") >= cut)
    // warm-up (fixpoint: refresh is idempotent)
    graft.etl.MaterializedCdc.refresh(spark, path, delta, "user_id",
      Seq("ts", "event_id"), "event_type", Seq("value"), nBuckets = 16)
    (1 to 3).foreach { i =>
      println(s"--- run $i ---")
      time("delta rows count") { delta.count() }
      time("touched probe") {
        delta.select(pmod(xxhash64(col("user_id")), lit(16L)).as("__bucket"))
          .distinct().collect()
      }
      val (merged, _) = time("mergeForCompose (ckpt)") {
        graft.etl.MaterializedCdc.mergeForCompose(spark, path, delta,
          "user_id", Seq("ts", "event_id"), "event_type", Seq("value"),
          nBuckets = 16)
      }
      time("writeMerged") {
        graft.etl.MaterializedCdc.writeMerged(merged, path)
      }
      graft.etl.Checkpoints.free(merged)
      time("FULL refresh") {
        graft.etl.MaterializedCdc.refresh(spark, path, delta, "user_id",
          Seq("ts", "event_id"), "event_type", Seq("value"), nBuckets = 16)
      }
      graft.etl.Checkpoints.sweep(spark)
    }
    spark.stop()
  }
}
