package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{Cohorts, Funnel, Sampling}

class FunnelCohortSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnelCounts chains steps strictly in event-time order") {
    val events = Seq(
      // u1 completes the funnel in order
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // u2: purchase BEFORE click -> reaches step 2 only
      (2L, ts("2024-01-02 10:00:00"), "signup"),
      (2L, ts("2024-01-02 10:30:00"), "purchase"),
      (2L, ts("2024-01-02 11:00:00"), "click"),
      // u3: click at the SAME instant as signup does not count (strict >),
      // but a later click does; no purchase
      (3L, ts("2024-01-03 09:00:00"), "signup"),
      (3L, ts("2024-01-03 09:00:00"), "click"),
      (3L, ts("2024-01-03 09:05:00"), "click"),
      // u4: never signs up -> reaches nothing
      (4L, ts("2024-01-04 09:00:00"), "click"),
      (4L, ts("2024-01-04 10:00:00"), "purchase"),
      // u5: signup only
      (5L, ts("2024-01-05 09:00:00"), "signup")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.funnelCounts(events, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"))
      .orderBy("step")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, "signup", 4L),   // u1 u2 u3 u5
      (2L, "click", 3L),    // u1 u3, and u2 (its click follows its purchase
                            //        but still follows signup -> step 2 yes)
      (3L, "purchase", 1L)  // u1 only
    ))
  }

  test("funnelCounts strict-same-ts edge: same-instant next step is not reached") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 10:00:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.funnelCounts(events, "user_id", "ts", "event_type",
        Seq("signup", "click")).orderBy("step")
      .collect().map(_.getLong(2)).toSeq
    assert(got == Seq(1L, 0L))
  }

  test("lastTouch attributes conversions to the latest preceding touch") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 11:00:00"), 2L, "click"),
      (1L, ts("2024-01-01 12:00:00"), 3L, "purchase"), // <- click
      (1L, ts("2024-01-01 13:00:00"), 4L, "purchase"), // still click (a
                                                       //   purchase is not a touch)
      (2L, ts("2024-01-02 09:00:00"), 5L, "purchase"), // no prior touch -> null
      (2L, ts("2024-01-02 10:00:00"), 6L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.ops.Funnel.lastTouch(events, "user_id",
        Seq("ts", "event_id"), "event_type", "purchase")
      .orderBy("event_id")
      .collect().map(r => (r.getLong(2), Option(r.getAs[String]("last_touch"))))
    assert(got.toSeq == Seq(
      (3L, Some("click")), (4L, Some("click")), (5L, None)))
  }

  test("retention counts cohort users by week offset") {
    val events = Seq(
      // u1 first active week of Jan 1 (Monday), returns weeks 0, 1, 3
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-05 10:00:00")),
      (1L, ts("2024-01-10 10:00:00")),
      (1L, ts("2024-01-22 10:00:00")),
      // u2 first active week of Jan 8, returns week 1
      (2L, ts("2024-01-08 09:00:00")),
      (2L, ts("2024-01-19 09:00:00"))
    ).toDF("user_id", "ts")
    val got = Cohorts.retention(events, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L), ("2024-01-01", 3L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L)))
  }

  test("temperatureResample keeps all of the rarest group, downsamples the rest") {
    val rows = (1 to 900).map(i => (i.toLong, "big")) ++
      (901 to 1000).map(i => (i.toLong, "small"))
    val df = rows.toDF("id", "src")
    val out = Sampling.temperatureResample(df, "src", "id", 2.0, "s1")
    val stats = out.groupBy("src")
      .agg(max("keep_prob").as("p"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    // rarest group: keep_prob exactly 1, all rows survive
    assert(stats("small") == ((1.0, 100L)))
    // big group: keep_prob = sqrt(100/900) = 1/3, kept count near 300
    assert(math.abs(stats("big")._1 - 0.333333) < 1e-9)
    assert(stats("big")._2 > 240 && stats("big")._2 < 360, stats("big"))
    // deterministic: a reshuffled input yields the identical kept set
    val again = Sampling.temperatureResample(
      df.repartition(7), "src", "id", 2.0, "s1")
    assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq
      == again.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("kaplanMeier matches the textbook product-limit hand case") {
    import spark.implicits._
    // subjects: d=1 event, d=2 censored, d=3 event, d=4 event
    // S(1) = 3/4; S(3) = 3/4 * 1/2 = 0.375; S(4) = 0 (all at risk die)
    val subj = Seq((1L, false), (2L, true), (3L, false), (4L, false))
      .toDF("duration", "censored")
    val out = Cohorts.kaplanMeier(subj, "duration", "censored")
      .orderBy("duration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 4L, 1L, 0.75), (3L, 2L, 1L, 0.375),
      (4L, 1L, 1L, 0.0)))
  }

  test("kaplanMeierCi: Greenwood bands match hand values; d=n point has NULL band") {
    import spark.implicits._
    val subj = Seq((1L, false), (2L, true), (3L, false), (4L, false))
      .toDF("duration", "censored")
    val out = Cohorts.kaplanMeierCi(subj, "duration", "censored")
      .orderBy("duration").collect()
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // t=1: S=0.75, gw=1/12
    val se1 = 0.75 * math.sqrt(1.0 / 12)
    assert(out(0).getDouble(4) == r6(se1))
    assert(out(0).getDouble(5) == r6(0.75 - 1.96 * se1))
    assert(out(0).getDouble(6) == 1.0) // clamped
    // t=3: S=0.375, gw=1/12 + 1/2
    val se3 = 0.375 * math.sqrt(1.0 / 12 + 0.5)
    assert(out(1).getDouble(4) == r6(se3))
    assert(out(1).getDouble(5) == 0.0) // clamped at 0
    assert(out(1).getDouble(6) == r6(0.375 + 1.96 * se3))
    // t=4: everyone at risk dies -> S=0, Greenwood undefined
    assert(out(2).getDouble(3) == 0.0 && out(2).isNullAt(4)
      && out(2).isNullAt(5) && out(2).isNullAt(6))
  }

  test("logRank matches the hand-worked two-cohort case") {
    import spark.implicits._
    // A: events at t=1 and t=3; B: event at t=2, censored at t=3
    // t=1: n=4 n_a=2 d=1 d_a=1 -> E=0.5,   V=0.25
    // t=2: n=3 n_a=1 d=1 d_a=0 -> E=1/3,   V=2/9
    // t=3: n=2 n_a=1 d=1 d_a=1 -> E=0.5,   V=0.25
    val subj = Seq(("A", 1L, false), ("A", 3L, false),
      ("B", 2L, false), ("B", 3L, true))
      .toDF("cohort", "duration", "censored")
    val r = Cohorts.logRank(subj, "duration", "censored", "cohort", "A")
      .head()
    assert(r.getDouble(0) == 2.0)
    assert(r.getDouble(1) == 1.333333) // 0.5 + 1/3 + 0.5 rounded
    assert(r.getDouble(2) == 0.722222) // 0.25 + 2/9 + 0.25 rounded
    val expChi = BigDecimal((2.0 - 1.333333) * (2.0 - 1.333333) / 0.722222)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) == expChi && !r.getBoolean(4))
  }

  test("timeToEvent censors subjects that never hit the event") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01", "view"), (1L, "2024-01-05", "buy"),
      (1L, "2024-01-09", "view"),
      (2L, "2024-01-02", "view"), (2L, "2024-01-08", "view"))
      .toDF("u", "d", "et").withColumn("ts", col("d").cast("timestamp"))
    val out = Cohorts.timeToEvent(ev, "u", "ts", col("et") === "buy")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out == Map(1L -> ((4L, false)), 2L -> ((6L, true))))
  }

  test("eventPaths: first-3 path per session, gap splits sessions") {
    import spark.implicits._
    // user 1: one session a,b,c,d -> path a>b>c; then after a 2h gap
    // a second session b,a -> path b>a; user 2: session a,b,c
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "a"), (1L, "2024-01-01 10:01:00", 2L, "b"),
      (1L, "2024-01-01 10:02:00", 3L, "c"), (1L, "2024-01-01 10:03:00", 4L, "d"),
      (1L, "2024-01-01 13:00:00", 5L, "b"), (1L, "2024-01-01 13:01:00", 6L, "a"),
      (2L, "2024-01-01 09:00:00", 7L, "a"), (2L, "2024-01-01 09:05:00", 8L, "b"),
      (2L, "2024-01-01 09:06:00", 9L, "c"))
      .toDF("u", "s", "eid", "et").withColumn("ts", col("s").cast("timestamp"))
    val out = Funnel.eventPaths(ev, "u", "ts", "et", "eid", 1800)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a>b>c", 2L, 1L), ("b>a", 1L, 2L)))
  }

  test("growthAccounting: the ledger identity holds, gap weeks carry churn") {
    import spark.implicits._
    // A active w1,w2,w4; B active w2 only. Weeks (Mondays): 1/1, 1/8,
    // 1/15 (nobody), 1/22.
    val ev = Seq(
      ("2024-01-01", 1L), ("2024-01-08", 1L), ("2024-01-22", 1L),
      ("2024-01-09", 2L))
      .toDF("d", "u").withColumn("ts", col("d").cast("timestamp"))
    val out = Cohorts.growthAccounting(ev, "u", "ts")
      .orderBy("wk").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 1L, 0L, 0L, 0L),  // A new
      ("2024-01-08", 1L, 1L, 0L, 0L),  // B new, A retained
      ("2024-01-15", 0L, 0L, 0L, 2L),  // both silent -> churn-only week
      ("2024-01-22", 0L, 0L, 1L, 0L))) // A resurrected
  }

  test("cohortLtv: cumulative per-user revenue divides by COHORT size") {
    import spark.implicits._
    // cohort 2024-01-01: A (10 in w0, 5 in w1) + B (2 in w0, silent
    // after) -> offset 0: 12/2 = 6.0; offset 1: 17/2 = 8.5 (B still
    // counts in the denominator — that IS the LTV curve)
    val ev = Seq(
      (1L, "2024-01-02", 10.0), (1L, "2024-01-09", 5.0),
      (2L, "2024-01-03", 2.0))
      .toDF("u", "d", "v").withColumn("ts", col("d").cast("timestamp"))
    val out = Cohorts.cohortLtv(ev, "u", "ts", "v")
      .orderBy("week_offset").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((0L, 2L, 6.0), (1L, 2L, 8.5)))
  }

  test("rfm: the best customer lands in 555, the worst in 111") {
    import spark.implicits._
    // 10 users; user u has u events on day u with value u*10 each:
    // user 10 is most recent (recency 0), most frequent, highest
    // spend -> every score 5; user 1 the opposite -> every score 1
    val ev = (1 to 10).flatMap(u => (1 to u).map(i =>
        (u.toLong, f"2024-01-$u%02d 00:00:$i%02d", u * 10.0)))
      .toDF("u", "s", "v").withColumn("ts", col("s").cast("timestamp"))
    val segs = Cohorts.rfm(ev, "u", "ts", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(segs.values.sum == 10L)
    assert(segs.getOrElse(555L, 0L) >= 1L, segs.toString)
    assert(segs.getOrElse(111L, 0L) >= 1L, segs.toString)
    // mean monetary of the 555 segment includes user 10: 100.0 each
    val top = Cohorts.rfm(ev, "u", "ts", "v")
      .where(col("segment") === 555).head()
    assert(top.getDouble(2) >= 90.0)
  }
}
