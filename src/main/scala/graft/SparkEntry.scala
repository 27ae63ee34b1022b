package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DateTimeFunctions.yearWeek
import graft.functions.ReturnFunctions.{compoundReturn, runningCompound}
import graft.ops.{Calendar, Quality, Returns}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a pure plan builder over the driver's
  * parquet tables in `dir`; [[oracleSql]] holds the DuckDB-equivalent SQL
  * for the hash-compare gate. Conventions shared by both sides:
  *   - identical column aliases (driver sorts columns by name),
  *   - a deterministic ORDER BY on a unique (or value-identical) key,
  *   - derived doubles rounded (ROUND(x, n)) with identical n, so
  *     last-ulp float divergence between engines cannot flip the hash.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.etl.Tables.table(s, dir, name)

  /** events → market-returns analog used by the compound-return queries:
    * user_id ≡ fund, event_type ≡ return kind, date(ts) ≡ market date,
    * value/1000 ≡ daily return (keeps ln(1+r) well-conditioned). */
  private def dailyReturns(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"),
      col("user_id").as("fund_id"),
      col("event_type").as("rtype"),
      to_date(col("ts")).as("mdate"),
      (col("value") / 1000.0).as("r"))

  private val dailyReturnsSql =
    """SELECT event_id, user_id AS fund_id, event_type AS rtype,
      |       CAST(ts AS DATE) AS mdate, value/1000.0 AS r FROM events""".stripMargin

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_weekly_compound")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- reference parity: scans, joins, aggregates, windows ---------

    // S6/J1/P3/F1/F2/F3/A3/O1: the reference's weekly compounded return
    // (ipynb cells 12-13) over the events analog. Calendar dim join is
    // explicitly broadcast.
    "q01_weekly_compound" -> ((s, dir) => {
      val daily = Calendar.filterWorkingDays(dailyReturns(s, dir), "mdate")
      Returns.weeklyReturns(daily, "fund_id", "rtype", "mdate", "r")
        .withColumn("weekly_return", round(col("weekly_return"), 6))
        .orderBy("fund_id", "rtype", "year_week")
    }),

    // W1: intra-week running compound (ipynb cells 14-15).
    "q02_running_compound" -> ((s, dir) => {
      val daily = Calendar.filterWorkingDays(dailyReturns(s, dir), "mdate")
      Returns.withRunningCompound(daily, "fund_id", "rtype", "mdate", "r")
        .select(col("event_id"), col("fund_id"), col("rtype"), col("mdate"),
          col("year_week"),
          round(col("daily_compound_evolution"), 6).as("compound_evolution"))
        .orderBy("event_id")
    }),

    // A1/A2: business-key uniqueness probe (ipynb cells 10-11).
    "q03_key_uniqueness" -> ((s, dir) =>
      Quality.keyViolations(t(s, dir, "lineitem"), Seq("l_orderkey", "l_linenumber"))
        .orderBy("l_orderkey", "l_linenumber")),

    // A5/J1/O1/O2: grouped avg over a 3-table star join; dims broadcast.
    "q04_grouped_avg_topn" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("yr"))
        .agg(round(avg(col("o_totalprice")), 4).as("avg_price"),
          count(lit(1)).as("n_orders"))
        .orderBy("n_name", "yr")
        .limit(10)
    }),

    // P1/P2: projection + string-equality filter (pushed to the scan).
    "q05_filter_project" -> ((s, dir) =>
      t(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy("c_custkey")),

    // A4: scalar count.
    "q06_count" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(count(lit(1)).as("cnt"))),

    // U1: union of homogeneous projections.
    "q07_union" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val a = ev.where(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("value"))
      val b = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value"))
      a.unionByName(b).orderBy("event_id")
    }),

    // J2: group aggregate joined back onto detail rows (ipynb cell 12).
    "q08_agg_join_back" -> ((s, dir) => {
      val daily = dailyReturns(s, dir).withColumn("year_week", yearWeek(col("mdate")))
      Returns.attachGroupAgg(daily, Seq("fund_id", "rtype", "year_week"),
          round(sum(col("r")), 9), "weekly_sum")
        .select(col("event_id"), col("fund_id"), col("rtype"),
          col("year_week"), col("weekly_sum"))
        .orderBy("event_id")
    }),

    // P4/P5: bulk column rename.
    "q09_rename_project" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .withColumnsRenamed(Map(
          "l_orderkey" -> "order_key",
          "l_linenumber" -> "line_number",
          "l_quantity" -> "quantity"))
        .select(col("order_key"), col("line_number"), col("quantity"))
        .orderBy("order_key", "line_number", "quantity")),

    // A1/A2 over events: grouped count+avg with a HAVING filter.
    "q10_having_avg" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(avg(col("value")), 6).as("avg_value"))
        .where(col("n_events") > 10)
        .orderBy("user_id")),

    // O1/O2: global sort + limit (plans as TakeOrderedAndProject).
    "q11_sort_limit" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20)),

    // F1: the %Y-%W week key alone, cross-checked against DuckDB strftime.
    "q12_week_key" -> ((s, dir) =>
      t(s, dir, "events")
        .select(to_date(col("ts")).as("mdate")).distinct()
        .select(col("mdate"), yearWeek(col("mdate")).as("year_week"))
        .orderBy("mdate"))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(

    "q01_weekly_compound" ->
      s"""WITH daily AS ($dailyReturnsSql)
         |SELECT fund_id, rtype, strftime(mdate, '%Y-%W') AS year_week,
         |       ROUND(EXP(SUM(LN(1 + r))) - 1, 6) AS weekly_return
         |FROM daily WHERE isodow(mdate) <= 5
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q02_running_compound" ->
      s"""WITH daily AS ($dailyReturnsSql)
         |SELECT event_id, fund_id, rtype, mdate,
         |       strftime(mdate, '%Y-%W') AS year_week,
         |       ROUND(EXP(SUM(LN(1 + r)) OVER (
         |         PARTITION BY fund_id, rtype, strftime(mdate, '%Y-%W')
         |         ORDER BY mdate)) - 1, 6) AS compound_evolution
         |FROM daily WHERE isodow(mdate) <= 5
         |ORDER BY event_id""".stripMargin,

    "q03_key_uniqueness" ->
      """SELECT l_orderkey, l_linenumber, COUNT(1) AS cnt
        |FROM lineitem GROUP BY 1, 2 HAVING COUNT(1) > 1
        |ORDER BY 1, 2""".stripMargin,

    "q04_grouped_avg_topn" ->
      """SELECT n_name, year(o_orderdate) AS yr,
        |       ROUND(AVG(o_totalprice), 4) AS avg_price,
        |       COUNT(1) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 10""".stripMargin,

    "q05_filter_project" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin,

    "q06_count" -> "SELECT COUNT(1) AS cnt FROM lineitem",

    "q07_union" ->
      """SELECT event_id, user_id, value FROM events WHERE event_type = 'signup'
        |UNION ALL
        |SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    "q08_agg_join_back" ->
      s"""WITH daily AS (
         |  SELECT event_id, fund_id, rtype, strftime(mdate, '%Y-%W') AS year_week, r
         |  FROM ($dailyReturnsSql)
         |), weekly AS (
         |  SELECT fund_id, rtype, year_week, ROUND(SUM(r), 9) AS weekly_sum
         |  FROM daily GROUP BY 1, 2, 3
         |)
         |SELECT d.event_id, d.fund_id, d.rtype, d.year_week, w.weekly_sum
         |FROM daily d
         |JOIN weekly w ON d.fund_id = w.fund_id AND d.rtype = w.rtype
         |             AND d.year_week = w.year_week
         |ORDER BY d.event_id""".stripMargin,

    "q09_rename_project" ->
      """SELECT l_orderkey AS order_key, l_linenumber AS line_number,
        |       l_quantity AS quantity
        |FROM lineitem ORDER BY 1, 2, 3""".stripMargin,

    "q10_having_avg" ->
      """SELECT user_id, COUNT(1) AS n_events, ROUND(AVG(value), 6) AS avg_value
        |FROM events GROUP BY 1 HAVING COUNT(1) > 10 ORDER BY 1""".stripMargin,

    "q11_sort_limit" ->
      """SELECT l_extendedprice, l_orderkey, l_linenumber FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin,

    "q12_week_key" ->
      """SELECT DISTINCT CAST(ts AS DATE) AS mdate,
        |       strftime(CAST(ts AS DATE), '%Y-%W') AS year_week
        |FROM events ORDER BY 1""".stripMargin
  )
}
