package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B the trade-edge derivation variants at a decade dir
  * (`runMain graft.ProfileGraphDerive <dir>`) — the round-15 brief's
  * q98/q91/q238 edge-derivation slice. */
object ProfileGraphDerive {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale_graph100")
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
    def t(n: String) = graft.etl.Tables.table(spark, dir, n)
    def time(label: String)(f: => Long): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[drv] $label%-24s med=${runs.sorted.apply(1)}%6.3f  runs=${runs.map(r => f"$r%.3f").mkString("/")}")
    }
    // A: current tradeEdges (joins then count agg)
    time("A tradeEdges") {
      graft.ops.Graph.tradeEdges(t("lineitem"), t("orders"),
        t("customer"), t("supplier")).count()
    }
    // B: dims first (broadcast), byte-minimal big join, then agg
    time("B dimsFirst") {
      val li = t("lineitem").select("l_orderkey", "l_suppkey")
        .join(broadcast(t("supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey"), col("s_nationkey").cast("int").as("src"))
      val od = t("orders").select("o_orderkey", "o_custkey")
        .join(broadcast(t("customer").select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey").cast("int").as("dst"))
      li.join(od, col("l_orderkey") === col("o_orderkey"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w")).count()
    }
    // C: B but DISTINCT pairs only (what bfs/triangles consume)
    time("C dimsFirstDistinct") {
      val li = t("lineitem").select("l_orderkey", "l_suppkey")
        .join(broadcast(t("supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey"), col("s_nationkey").cast("int").as("src"))
      val od = t("orders").select("o_orderkey", "o_custkey")
        .join(broadcast(t("customer").select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey").cast("int").as("dst"))
      li.join(od, col("l_orderkey") === col("o_orderkey"))
        .select("src", "dst").distinct().count()
    }
    // D: q238 as-is
    time("D q238 current") {
      t("lineitem")
        .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_suppkey"))
        .agg(count_distinct(col("o_custkey")).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("n_suppliers"))
        .count()
    }
    // F: pure scan cost (no join): aggregate each fact side alone
    time("F scans only") {
      t("lineitem").select("l_orderkey", "l_suppkey")
        .agg(sum(col("l_orderkey") + col("l_suppkey"))).count()
      t("orders").select("o_orderkey", "o_custkey")
        .agg(sum(col("o_orderkey") + col("o_custkey"))).count()
    }
    // G: lineitem pre-agg to (orderkey, src) partial counts before the
    // big join (fewer rows + narrower bytes through the one shuffle)
    time("G preagg big join") {
      val li = t("lineitem").select("l_orderkey", "l_suppkey")
        .join(broadcast(t("supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_orderkey"), col("s_nationkey").cast("int").as("src"))
        .agg(count(lit(1)).as("__k"))
      val od = t("orders").select("o_orderkey", "o_custkey")
        .join(broadcast(t("customer").select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey").cast("int").as("dst"))
      li.join(od, col("l_orderkey") === col("o_orderkey"))
        .groupBy("src", "dst").agg(sum("__k").as("w")).count()
    }
    // H: B's join order but NO broadcast hints (AQE/static planner
    // must pick broadcast itself — the posture that stays safe when
    // dims outgrow the threshold at true scale)
    time("H dimsFirst noHint") {
      val li = t("lineitem").select("l_orderkey", "l_suppkey")
        .join(t("supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey"), col("s_nationkey"))
      val od = t("orders").select("o_orderkey", "o_custkey")
        .join(t("customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
      li.join(od, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
        .agg(count(lit(1)).as("w")).count()
    }
    // E: q238 manual two-phase (explicit pair distinct, then degree)
    time("E q238 two-phase") {
      t("lineitem").select("l_orderkey", "l_suppkey")
        .join(t("orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_suppkey"), col("o_custkey")).agg(lit(1))
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("n_suppliers"))
        .count()
    }
    spark.stop()
  }
}
