package graft

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pts = Seq(
    ("u1", 1L, 5L), ("u1", 2L, 15L), ("u1", 3L, 25L),
    ("u2", 4L, 5L), ("u1", 5L, -7L), ("u1", 6L, 0L)
  ).toDF("k", "pid", "p")

  private def ivs = Seq(
    ("u1", 10L, 0L, 10L),    // catches p=5, p=0
    ("u1", 11L, 14L, 30L),   // catches p=15, p=25
    ("u2", 12L, 0L, 10L),    // catches u2's p=5 only (key isolation)
    ("u1", 13L, -10L, -1L)   // negative range catches p=-7
  ).toDF("k", "iid", "s", "e")

  test("pointInInterval equals the naive inequality join, incl. negatives") {
    val naive = pts.as("p").join(ivs.as("i"),
        $"p.k" === $"i.k" && $"p" >= $"s" && $"p" <= $"e")
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val got = RangeJoin.pointInInterval(pts, ivs, Seq("k"), "p", "s", "e", w)
        .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"bucketWidth=$w diverged")
    }
  }

  test("pointInInterval emits each match exactly once (no dedup needed)") {
    // wide interval covering many buckets at small width: still one row
    // per (point, interval) match
    val out = RangeJoin.pointInInterval(pts, ivs, Seq("k"), "p", "s", "e", 2L)
      .groupBy("pid", "iid").count().where($"count" > 1)
    assert(out.isEmpty)
  }

  test("intervalOverlap equals the naive overlap join, exactly once per pair") {
    val a = ivs.select($"k", $"iid".as("ia"), $"s".as("sa"), $"e".as("ea"))
    val b = ivs.select($"k", $"iid".as("ib"), $"s".as("sb"), $"e".as("eb"))
    val naive = a.as("a").join(b.as("b"),
        $"a.k" === $"b.k" && $"sa" <= $"eb" && $"sb" <= $"ea" && $"ia" < $"ib")
      .select($"ia", $"ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 5L, 50L)) {
      val outDf = RangeJoin.intervalOverlap(a, b, Seq("k"),
          "sa", "ea", "sb", "eb", w).where($"ia" < $"ib")
      val rows = outDf.select($"ia", $"ib").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSet == naive, s"bucketWidth=$w diverged")
      assert(rows.length == rows.toSet.size, s"bucketWidth=$w emitted duplicates")
    }
  }

  test("plan is an equi hash join, not BroadcastNestedLoop/cartesian") {
    val plan = RangeJoin.pointInInterval(pts, ivs, Seq("k"), "p", "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("range join is expressible from pure SQL via range_bucket/range_buckets") {
    GraftExtensions.register(spark)
    pts.createOrReplaceTempView("rj_pts")
    ivs.createOrReplaceTempView("rj_ivs")
    // the documented SQL recipe: explode the interval side's covering
    // buckets, equi-join the point's bucket, re-check the predicate —
    // the exact plan family pointInInterval builds in Scala
    val sql = spark.sql(
      """SELECT pid, iid
        |FROM (SELECT k, pid, p, range_bucket(p, 7) AS b FROM rj_pts) p
        |JOIN (SELECT k, iid, s, e, explode(range_buckets(s, e, 7)) AS b
        |      FROM rj_ivs) i
        |USING (k, b)
        |WHERE p >= s AND p <= e""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val scala_ = RangeJoin.pointInInterval(pts, ivs, Seq("k"), "p", "s", "e", 7L)
      .select($"pid", $"iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sql == scala_)
    // and the SQL plan is the same nested-loop-free shape
    val plan = spark.sql(
      """SELECT count(1) FROM
        |(SELECT k, pid, p, range_bucket(p, 7) AS b FROM rj_pts) p
        |JOIN (SELECT k, iid, s, e, explode(range_buckets(s, e, 7)) AS b
        |      FROM rj_ivs) i USING (k, b)
        |WHERE p >= s AND p <= e""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("BucketedRangeJoin rule rewrites a plain BETWEEN join to the bucketed plan") {
    GraftExtensions.register(spark)
    pts.createOrReplaceTempView("rj_pts")
    ivs.createOrReplaceTempView("rj_ivs")
    // RANGE-ONLY join (no equi conjunct): Spark's native plan is the
    // quadratic nested loop — the rewrite's primary target
    val rangeOnly =
      """SELECT pid, iid FROM rj_pts p JOIN rj_ivs i
        |ON p.p >= i.s AND p.p <= i.e""".stripMargin
    // keyed variant: natively a hash join on k with the range pair as
    // residual — per-key products still blow up on skewed keys, so the
    // rewrite must ADD the bucket to the hash key
    val keyed =
      """SELECT pid, iid FROM rj_pts p JOIN rj_ivs i
        |ON p.k = i.k AND p.p >= i.s AND p.p <= i.e""".stripMargin
    spark.conf.unset(graft.rules.BucketedRangeJoin.WidthConf)
    val naivePlan = spark.sql(rangeOnly).queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoop") ||
      naivePlan.contains("CartesianProduct"), naivePlan)
    val wantRange = spark.sql(rangeOnly).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantKeyed = spark.sql(keyed).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      spark.conf.set(graft.rules.BucketedRangeJoin.WidthConf, "7")
      val got = spark.sql(rangeOnly)
      val plan = got.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoop") &&
        !plan.contains("CartesianProduct"),
        s"rule did not rewrite the range-only join:\n$plan")
      assert(plan.contains("Generate"), plan)
      assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        == wantRange)
      // exactly-once per match: no dedup artifact rows
      assert(spark.sql(rangeOnly).groupBy("pid", "iid").count()
        .where($"count" > 1).isEmpty)
      // idempotent under the fixed-point batch: the marker blocks
      // re-rewriting, so exactly one Generate appears
      assert("Generate".r.findAllIn(plan).length == 1, plan)
      // keyed variant: results preserved and the bucket joins k in the
      // hash keys (left-of-comma key lists both)
      val kq = spark.sql(keyed)
      val kPlan = kq.queryExecution.executedPlan.toString
      assert(kPlan.contains("Generate"), kPlan)
      assert(kPlan.contains("__graft_rb"), kPlan)
      assert(kq.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        == wantKeyed)
    } finally spark.conf.unset(graft.rules.BucketedRangeJoin.WidthConf)
  }

  test("BucketedRangeJoin rewrites interval-overlap joins with exactly-once emit") {
    GraftExtensions.register(spark)
    ivs.createOrReplaceTempView("rj_ivs")
    // k-keyed self-overlap (the q53 shape) plus an unkeyed variant
    val keyed =
      """SELECT a.iid AS ia, b.iid AS ib FROM rj_ivs a JOIN rj_ivs b
        |ON a.k = b.k AND a.s <= b.e AND b.s <= a.e AND a.iid < b.iid""".stripMargin
    val unkeyed =
      """SELECT a.iid AS ia, b.iid AS ib FROM rj_ivs a JOIN rj_ivs b
        |ON a.s <= b.e AND b.s <= a.e AND a.iid < b.iid""".stripMargin
    spark.conf.unset(graft.rules.BucketedRangeJoin.WidthConf)
    assert(spark.sql(unkeyed).queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoop"))
    val wantK = spark.sql(keyed).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantU = spark.sql(unkeyed).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      spark.conf.set(graft.rules.BucketedRangeJoin.WidthConf, "7")
      for ((sql, want) <- Seq((keyed, wantK), (unkeyed, wantU))) {
        val got = spark.sql(sql)
        val plan = got.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoop") &&
          !plan.contains("CartesianProduct"), plan)
        assert("Generate".r.findAllIn(plan).length == 2, plan)
        val rows = got.collect().map(r => (r.getLong(0), r.getLong(1)))
        assert(rows.toSet == want, "overlap rewrite changed results")
        assert(rows.length == rows.toSet.size,
          "overlap pair emitted more than once")
      }
    } finally spark.conf.unset(graft.rules.BucketedRangeJoin.WidthConf)
  }

  test("PROPERTY: rule-on ≡ rule-off across random datasets and widths") {
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val pts2 = (1 to 120).map { i =>
        (s"k${rnd.nextInt(4)}", i.toLong, rnd.nextLong() % 1000L) }
        .toDF("k", "pid", "p")
      val ivs2 = (1 to 60).map { i =>
        val s = rnd.nextLong() % 1000L
        // include degenerate (hi < lo) intervals on ~1/6 of rows
        val e = if (rnd.nextInt(6) == 0) s - rnd.nextInt(50)
                else s + rnd.nextInt(200)
        (s"k${rnd.nextInt(4)}", i.toLong, s, e) }
        .toDF("k", "iid", "s", "e")
      pts2.createOrReplaceTempView("prop_pts")
      ivs2.createOrReplaceTempView("prop_ivs")
      val between =
        """SELECT pid, iid FROM prop_pts p JOIN prop_ivs i
          |ON p.k = i.k AND p.p >= i.s AND p.p <= i.e""".stripMargin
      val overlap =
        """SELECT a.iid AS ia, b.iid AS ib FROM prop_ivs a JOIN prop_ivs b
          |ON a.k = b.k AND a.s <= b.e AND b.s <= a.e AND a.iid < b.iid""".stripMargin
      spark.conf.unset(graft.rules.BucketedRangeJoin.WidthConf)
      val wantB = spark.sql(between).collect().map(_.toSeq).toSet
      val wantO = spark.sql(overlap).collect().map(_.toSeq).toSet
      try {
        for (w <- Seq(1L, 13L, 97L, 5000L)) {
          spark.conf.set(graft.rules.BucketedRangeJoin.WidthConf, w.toString)
          val gotB = spark.sql(between).collect().map(_.toSeq)
          val gotO = spark.sql(overlap).collect().map(_.toSeq)
          assert(gotB.toSet == wantB && gotB.length == wantB.size,
            s"trial $trial width $w: point-in-interval diverged")
          assert(gotO.toSet == wantO && gotO.length == wantO.size,
            s"trial $trial width $w: overlap diverged")
        }
      } finally spark.conf.unset(graft.rules.BucketedRangeJoin.WidthConf)
    }
  }

  test("BucketedRangeJoin leaves non-eligible joins alone") {
    GraftExtensions.register(spark)
    pts.createOrReplaceTempView("rj_pts")
    ivs.createOrReplaceTempView("rj_ivs")
    try {
      spark.conf.set(graft.rules.BucketedRangeJoin.WidthConf, "7")
      // equi-only join: untouched (no Generate)
      val equi = spark.sql(
        "SELECT pid, iid FROM rj_pts p JOIN rj_ivs i ON p.k = i.k")
      assert(!equi.queryExecution.optimizedPlan.toString.contains("Generate"))
      assert(equi.count() == 5 * 3 + 1 * 1)
      // one-sided inequality (no finite interval): untouched
      val half = spark.sql(
        """SELECT pid, iid FROM rj_pts p JOIN rj_ivs i
          |ON p.k = i.k AND p.p >= i.s""".stripMargin)
      assert(!half.queryExecution.optimizedPlan.toString.contains("Generate"))
      // LEFT join: the rewrite only covers inner semantics
      // LEFT join: the rewrite only covers inner semantics — a
      // no-match probe row must still survive with nulls, which the
      // inner-shaped bucket join cannot produce
      val outer = spark.sql(
        """SELECT pid, iid FROM rj_pts p LEFT JOIN rj_ivs i
          |ON p.k = i.k AND p.p >= i.s AND p.p <= i.e AND i.e < 0""".stripMargin)
      assert(!outer.queryExecution.optimizedPlan.toString.contains("Generate"))
      assert(outer.where($"iid".isNull).count() > 0)
    } finally spark.conf.unset(graft.rules.BucketedRangeJoin.WidthConf)
  }

  test("overlap candidate ranking: a dedup inequality written FIRST is not paired as a bound") {
    GraftExtensions.register(spark)
    ivs.createOrReplaceTempView("rj_ivs")
    // the adversarial conjunct order: `a.iid < b.iid` precedes the
    // range pair — naive first-match pairing would explode a side onto
    // sequence(bucket(iid), bucket(e)), spans of unrelated magnitudes
    val dedupFirst =
      """SELECT a.iid AS ia, b.iid AS ib FROM rj_ivs a JOIN rj_ivs b
        |ON a.iid < b.iid AND a.s <= b.e AND b.s <= a.e AND a.k = b.k""".stripMargin
    spark.conf.unset(graft.rules.BucketedRangeJoin.WidthConf)
    val want = spark.sql(dedupFirst).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      spark.conf.set(graft.rules.BucketedRangeJoin.WidthConf, "7")
      val got = spark.sql(dedupFirst)
      val gens = got.queryExecution.optimizedPlan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }
      assert(gens.size == 2, "overlap rewrite should explode both sides")
      // the family ranking must pick (s, e) as the interval bounds on
      // BOTH sides — iid never feeds a bucket sequence
      gens.foreach { g =>
        val refs = g.generator.references.map(_.name).toSet
        assert(refs == Set("s", "e"),
          s"bucket sequence built over $refs — dedup conjunct was paired as a bound")
      }
      val rows = got.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSet == want && rows.length == want.size)
    } finally spark.conf.unset(graft.rules.BucketedRangeJoin.WidthConf)
  }

  test("point candidate ranking: a same-column dedup inequality is not paired as a bound") {
    GraftExtensions.register(spark)
    import spark.implicits._
    // self-join shape: each row carries a point t and an interval
    // [lo, hi]; the non-strict dedup conjunct `a.t <= b.t` written
    // BEFORE the upper bound is a valid asUpper match over the same
    // point — naive pairing would explode sequence(bucket(lo),
    // bucket(t)) with t on an unrelated magnitude
    Seq((1L, 5L, 0L, 10L), (2L, 15L, 10L, 20L), (3L, 900000L, 0L, 5L))
      .toDF("id", "t", "lo", "hi").createOrReplaceTempView("pr_tb")
    val sql =
      """SELECT a.id AS ia, b.id AS ib FROM pr_tb a JOIN pr_tb b
        |ON a.t >= b.lo AND a.t <= b.t AND a.t <= b.hi""".stripMargin
    spark.conf.unset(graft.rules.BucketedRangeJoin.WidthConf)
    val want = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      spark.conf.set(graft.rules.BucketedRangeJoin.WidthConf, "7")
      val got = spark.sql(sql)
      val gens = got.queryExecution.optimizedPlan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }
      assert(gens.size == 1, "point rewrite should explode the interval side once")
      val refs = gens.head.generator.references.map(_.name).toSet
      assert(refs == Set("lo", "hi"),
        s"bucket sequence built over $refs — dedup conjunct was paired as a bound")
      val rows = got.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSet == want && rows.length == want.size)
    } finally spark.conf.unset(graft.rules.BucketedRangeJoin.WidthConf)
  }

  test("rule robustness: NULL bounds, bad/negative width conf, empty build side, under outer join") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("iid", LongType), StructField("s", LongType),
      StructField("e", LongType)))
    // intervals with NULL bounds: the inequality is null-rejecting, so
    // those rows must match nothing under the rule too (explode of a
    // null sequence emits no buckets — same result set)
    val nullIvs = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("u1", 10L, 0L, 10L),
        org.apache.spark.sql.Row("u1", 11L, null, 10L),
        org.apache.spark.sql.Row("u1", 12L, 0L, null),
        org.apache.spark.sql.Row("u1", 13L, null, null)),
      schema)
    pts.createOrReplaceTempView("rb_pts")
    nullIvs.createOrReplaceTempView("rb_ivs")
    val q =
      """SELECT pid, iid FROM rb_pts p JOIN rb_ivs i
        |ON p.p >= i.s AND p.p <= i.e""".stripMargin
    spark.conf.unset(graft.rules.BucketedRangeJoin.WidthConf)
    val want = spark.sql(q).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      spark.conf.set(graft.rules.BucketedRangeJoin.WidthConf, "7")
      val got = spark.sql(q)
      assert(got.queryExecution.optimizedPlan.toString.contains("Generate"))
      assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == want)

      // empty build side: rewrite still plans and returns zero rows
      spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
        .createOrReplaceTempView("rb_empty")
      assert(spark.sql(
        """SELECT pid, iid FROM rb_pts p JOIN rb_empty i
          |ON p.p >= i.s AND p.p <= i.e""".stripMargin).isEmpty)

      // inner range join sitting UNDER a left outer join: the inner is
      // rewritten, the outer's semantics survive (null-extended probe
      // rows intact)
      ivs.createOrReplaceTempView("rj_ivs")
      val under = spark.sql(
        """SELECT pi.pid, pi.iid, o.iid AS oid
          |FROM (SELECT p.k AS pk, p.pid, i.iid FROM rb_pts p JOIN rj_ivs i
          |      ON p.p >= i.s AND p.p <= i.e) pi
          |LEFT JOIN rj_ivs o ON o.k = pi.pk AND o.e < -100""".stripMargin)
      assert(under.queryExecution.optimizedPlan.toString.contains("Generate"))
      assert(under.where($"oid".isNotNull).count() == 0 && under.count() > 0)

      // unparsable width: the rule must turn itself off, not throw
      // during optimization of every query in the session
      spark.conf.set(graft.rules.BucketedRangeJoin.WidthConf, "banana")
      val offBad = spark.sql(q)
      assert(!offBad.queryExecution.optimizedPlan.toString.contains("Generate"))
      assert(offBad.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == want)
      // negative width: rule off as well
      spark.conf.set(graft.rules.BucketedRangeJoin.WidthConf, "-5")
      assert(!spark.sql(q).queryExecution.optimizedPlan.toString
        .contains("Generate"))
    } finally spark.conf.unset(graft.rules.BucketedRangeJoin.WidthConf)
  }

  test("decayed sum is expressible from pure SQL via half_life_weight") {
    GraftExtensions.register(spark)
    val df = Seq(
      ("a", 0.0, 1.0), ("a", 3600.0, 2.0), ("a", 7200.0, 4.0),
      ("b", 7200.0, 10.0))
      .toDF("k", "t", "v")
    df.createOrReplaceTempView("hl_rows")
    val sql = spark.sql(
      """SELECT k, COUNT(1) AS n,
        |  ROUND(SUM(v * half_life_weight(t, tref, 3600.0)), 6) AS decayed
        |FROM hl_rows CROSS JOIN (SELECT MAX(t) AS tref FROM hl_rows)
        |GROUP BY k""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val scala_ = graft.ops.TimeSeries.decayedSum(df, "k", "t", "v", 3600.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(sql == scala_)
    // spot value: at half-life 3600s, weights are 0.25/0.5/1.0
    assert(sql.contains(("a", 3L, 1.0 * 0.25 + 2.0 * 0.5 + 4.0)))
  }
}
