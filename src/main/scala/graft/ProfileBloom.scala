package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: decade A/B for the bloom semi-join-reduction
  * (`runMain graft.ProfileBloom <dir>`) — the q185 shape (lineitem
  * semi-joined to urgent-1995 orders, then the returnflag aggregate)
  * as a plain exact left-semi join vs [[graft.ops.Approx
  * .bloomReducedSemiJoin]], filter sized at ~16 bits per build key
  * (the m/n a deployment picks; the sf0.1 gate's fixed 64 Kbit would
  * saturate once the build side grows 100×). Asserts the two plans
  * agree before timing. */
object ProfileBloom {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    def urgent = t("orders")
      .where(col("o_orderpriority") === "1-URGENT" &&
        year(col("o_orderdate")) === 1995)
    val nBuild = urgent.count()
    val numBits = math.max(1 << 16,
      java.lang.Long.highestOneBit(16L * nBuild) << 1).toInt
    println(s"[bloom] dir=$dir buildKeys=$nBuild numBits=$numBits " +
      s"(${numBits / 8 / 1024} KiB)")
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")
    def plain = agg(t("lineitem")
      .join(urgent.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi"))
    def bloomed = agg(graft.ops.Approx.bloomReducedSemiJoin(
      t("lineitem"), "l_orderkey", urgent, "o_orderkey", numBits, 5))
    val (a, b) = (plain.collect().toSeq, bloomed.collect().toSeq)
    require(a == b, s"bloom result diverges:\n$a\n$b")
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[bloom] $label%-16s med=${runs.sorted.apply(1)}%6.3f  " +
        s"runs=${runs.map(r => f"$r%.3f").mkString("/")}")
    }
    time("plain semi-join") { plain.count(): Unit }
    time("bloom-reduced") { bloomed.count(): Unit }
    // the operator's regime: build side ABOVE the broadcast bound
    // (at cluster scale a 100M-key build side cannot broadcast-hash;
    // forcing the shuffle path here measures exactly that mechanism
    // at this box's data sizes)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    time("plain @shuffle") { plain.count(): Unit }
    time("bloom @shuffle") { bloomed.count(): Unit }
    spark.stop()
  }
}
