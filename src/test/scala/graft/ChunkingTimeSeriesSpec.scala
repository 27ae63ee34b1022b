package graft

import org.apache.spark.sql.functions._

import graft.ops.{Chunking, Quality, TimeSeries}

class ChunkingTimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  // ---- Chunking ----

  private def doc(n: Int): String = (1 to n).map(i => s"t$i").mkString(" ")

  test("chunkByTokens covers every token, respects width/stride, skips redundant tails") {
    val df = Seq((1L, doc(5)), (2L, doc(50)), (3L, doc(51)), (4L, doc(130)))
      .toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(df, "doc_id", "text", width = 50, stride = 40)
      .orderBy("doc_id", "chunk_id")
      .collect()
    val byDoc = out.groupBy(_.getLong(0)).view.mapValues(_.toSeq).toMap
    // shorter than width -> exactly one chunk with all tokens
    assert(byDoc(1L).map(r => (r.getLong(1), r.getLong(2))) == Seq((0L, 5L)))
    assert(byDoc(1L).head.getString(3) == doc(5))
    // exactly width -> one chunk
    assert(byDoc(2L).map(_.getLong(1)) == Seq(0L))
    // width+1 -> second chunk starts at stride, carries the overlap
    assert(byDoc(3L).map(r => (r.getLong(1), r.getLong(2))) ==
      Seq((0L, 50L), (1L, 11L)))
    assert(byDoc(3L)(1).getString(3).startsWith("t41 "))
    // 130 tokens: chunks at 0, 40, 80 cover 1..130; no 4th chunk
    assert(byDoc(4L).map(r => (r.getLong(1), r.getLong(2))) ==
      Seq((0L, 50L), (1L, 50L), (2L, 50L)))
    // every token of every doc appears in at least one of its chunks
    for ((id, rows) <- byDoc) {
      val n = Map(1L -> 5, 2L -> 50, 3L -> 51, 4L -> 130)(id)
      val covered = rows.flatMap(_.getString(3).split(" ")).toSet
      assert((1 to n).map(i => s"t$i").toSet == covered, s"doc $id coverage")
    }
  }

  test("chunkByTokens is narrow: no shuffle exchange in the plan") {
    val df = Seq((1L, doc(130))).toDF("doc_id", "text")
    val plan = Chunking.chunkByTokens(df, "doc_id", "text", 50, 40)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // ---- EWMA ----

  private def refEwma(xs: Seq[Double], alpha: Double, window: Int): Seq[Double] =
    xs.indices.map { t =>
      val lo = math.max(0, t - window + 1)
      val frame = xs.slice(lo, t + 1)
      val ws = frame.indices.map(i => math.pow(1 - alpha, frame.size - 1 - i))
      frame.zip(ws).map { case (x, w) => x * w }.sum / ws.sum
    }

  test("ewma matches the brute-force weighted mean per key") {
    val a = Seq(1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 4.0)
    val b = Seq(10.0, 20.0, 30.0)
    val rows = a.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) } ++
      b.zipWithIndex.map { case (v, i) => ("b", i.toLong, v) }
    val df = rows.toDF("k", "seq", "v")
    val got = TimeSeries.ewma(df, "k", Seq("seq"), "v", alpha = 0.3, window = 3)
      .orderBy("k", "seq").select("k", "ewma").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val exp = refEwma(a, 0.3, 3).map(("a", _)) ++ refEwma(b, 0.3, 3).map(("b", _))
    got.zip(exp).foreach { case ((gk, gv), (ek, ev)) =>
      assert(gk == ek && math.abs(gv - ev) < 1e-12, s"$gk $gv vs $ev")
    }
  }

  test("ewma with window 1 is the identity; full window equals pandas-adjust form") {
    val xs = Seq(3.0, 1.0, 4.0, 1.0, 5.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("k", "seq", "v")
    val id = TimeSeries.ewma(df, "k", Seq("seq"), "v", 0.5, 1)
      .orderBy("seq").select("ewma").as[Double].collect()
    assert(id.toSeq == xs)
    // window >= series length: the classic adjusted EWMA over all history
    val full = TimeSeries.ewma(df, "k", Seq("seq"), "v", 0.5, 100)
      .orderBy("seq").select("ewma").as[Double].collect()
    val exp = refEwma(xs, 0.5, 100)
    full.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
  }

  // ---- rolling z ----

  test("rollingZ flags a planted spike and nothing on flat prefixes") {
    // 15 in-band rows, then a spike: with a trailing frame of n rows
    // the spike's own z is bounded by (n−1)/√n (it inflates its own
    // frame's stddev), so the prefix must be long enough for z > 3
    val vals = Seq.tabulate(15)(i => 10.0 + (i % 3) - 1) ++ Seq(100.0, 10.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("u", i.toLong, v) }
      .toDF("k", "seq", "v")
    val out = graft.ops.TimeSeries.rollingZ(df, "k", Seq("seq"), "v",
        window = 20, z = 3.0)
      .orderBy("seq").collect()
    // first row: stddev of one sample is null -> no flag, null z
    assert(out(0).isNullAt(out(0).fieldIndex("zscore")))
    assert(!out(0).getBoolean(out(0).fieldIndex("is_anomaly")))
    // only the spike is flagged
    val flagged = out.zipWithIndex.filter(_._1.getBoolean(
      out(0).fieldIndex("is_anomaly"))).map(_._2)
    assert(flagged.toSeq == Seq(15))
  }

  test("q110 gap-fill spine carries the last observation across missing hours") {
    // drive the full contract query on the fixture dir and check the
    // invariants on real data: spine is dense hourly per user, filled
    // is never null after the first observation, observed rows equal
    // the hourly aggregate count
    val df = SparkEntry.queries("q110_gap_fill")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(df.nonEmpty)
    val byUser = df.groupBy(_.getLong(0))
    for ((_, rows) <- byUser) {
      val hours = rows.map(_.getTimestamp(1).getTime)
      // dense: consecutive spine points are exactly one hour apart
      assert(hours.sliding(2).forall {
        case Array(a, b) => b - a == 3600000L
        case _ => true
      })
      // forward fill: after the first row every filled value is present
      assert(rows.forall(r => !r.isNullAt(2)))
    }
    // at least one gap actually exercised the fill
    assert(df.exists(r => !r.getBoolean(3)))
  }

  test("ohlcBars picks time-ordered endpoints per epoch-aligned bucket") {
    val ts0 = 1_700_006_400L // multiple of 21600 -> bar boundary
    def t(off: Long) = new java.sql.Timestamp((ts0 + off) * 1000)
    val rows = Seq(
      ("u", t(10), 5.0), ("u", t(20), 9.0), ("u", t(30), 1.0),
      ("u", t(40), 7.0),               // bar 1: open 5, high 9, low 1, close 7
      ("u", t(21600 + 5), 2.0),        // bar 2: singleton
      ("v", t(15), 4.0))
    val df = rows.toDF("k", "ts", "v")
    val got = graft.ops.TimeSeries.ohlcBars(df, "k", "ts", "v", 21600L)
      .orderBy("k", "bar_start").collect()
      .map(r => (r.getString(0), r.getLong(1) - ts0, r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      ("u", 0L, 5.0, 9.0, 1.0, 7.0, 4L),
      ("u", 21600L, 2.0, 2.0, 2.0, 2.0, 1L),
      ("v", 0L, 4.0, 4.0, 4.0, 4.0, 1L)))
  }

  test("rollingDistinctMedian matches hand-computed frames, odd and even") {
    val rows = Seq(
      ("u", 1L, "a", 10.0), ("u", 2L, "b", 30.0), ("u", 3L, "a", 20.0),
      ("u", 4L, "c", 40.0))
    val df = rows.toDF("k", "seq", "t", "v")
    val got = graft.ops.TimeSeries.rollingDistinctMedian(df, "k",
        Seq("seq"), "t", "v", window = 3)
      .orderBy("seq")
      .select("n_distinct", "rolling_median").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq(
      (1L, 10.0),   // [10]
      (2L, 20.0),   // [10,30] even -> interpolated midpoint
      (2L, 20.0),   // [10,30,20] odd -> 20
      (3L, 30.0)))  // frame slides to [30,20,40] -> types {b,a,c}
  }

  // ---- Markov transitions ----

  test("transitions counts consecutive pairs per key and row-normalizes") {
    val events = Seq(
      ("u1", 1L, "a"), ("u1", 2L, "b"), ("u1", 3L, "a"), ("u1", 4L, "b"),
      ("u2", 1L, "a"), ("u2", 2L, "c")
    ).toDF("user_id", "seq", "t")
    val got = graft.ops.Markov.transitions(events, "user_id", Seq("seq"), "t")
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // a->b twice, a->c once (from a: 2/3, 1/3), b->a once (1.0);
    // u2's boundary does NOT chain into u1
    assert(got.toSeq == Seq(
      ("a", "b", 2L, 0.666667), ("a", "c", 1L, 0.333333),
      ("b", "a", 1L, 1.0)))
  }

  // ---- robust outliers ----

  test("robustOutliers finds planted outliers and ignores MAD-zero groups") {
    // group g: symmetric values around 10 with two gross outliers
    val g = Seq(8.0, 9.0, 10.0, 11.0, 12.0, 9.5, 10.5, 1000.0, -1000.0)
    // group z: constant (MAD = 0) -> nothing flagged
    val z = Seq.fill(6)(7.0)
    val df = (g.map(("g", _)) ++ z.map(("z", _))).toDF("grp", "v")
    val out = Quality.robustOutliers(df, "grp", "v", z = 3.0)
      .orderBy("grp").collect()
    val gRow = out(0)
    assert(gRow.getString(0) == "g" && gRow.getLong(1) == 9)
    assert(gRow.getDouble(2) == 10.0)   // median
    assert(gRow.getDouble(3) == 1.0)    // MAD: |v-10| = 0.5..2, 990, 1010 -> median 1
    assert(gRow.getLong(4) == 2)        // the two planted outliers
    val zRow = out(1)
    assert(zRow.getString(0) == "z" && zRow.getDouble(3) == 0.0
      && zRow.getLong(4) == 0)
  }

  test("decayedSum: latest row weighs 1, one half-life halves, sums per key") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-08 00:00:00") // = tref
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00") // 1 half-life
    val t2 = java.sql.Timestamp.valueOf("2023-12-25 00:00:00") // 2 half-lives
    val df = Seq(
      ("u1", t0, 10.0), ("u1", t1, 8.0), ("u1", t2, 4.0),
      ("u2", t1, 100.0)).toDF("user", "ts", "v")
    val got = TimeSeries.decayedSum(df, "user", "ts", "v",
        halfLifeSeconds = 7 * 86400.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // u1: 10*1 + 8*0.5 + 4*0.25 = 15; u2: 100*0.5 = 50
    assert(got("u1") == ((3L, 15.0)))
    assert(got("u2") == ((1L, 50.0)))
  }

  test("cusum drawup identity matches the hand recursion") {
    import org.apache.spark.sql.functions.{col, lit}
    // x=[1,5,1], k=1 -> S=[0,4,4], s=S-minS=[0,4,4]; h=2 -> 2 alarms,
    // first at seq 2, max 4. Flat series u2 never alarms.
    val df = Seq(("u1", 1L, 1.0), ("u1", 2L, 5.0), ("u1", 3L, 1.0),
      ("u2", 1L, 1.0), ("u2", 2L, 1.0)).toDF("k", "seq", "v")
    val out = TimeSeries.cusum(df, "k", Seq("seq"), "v", lit(1.0), lit(2.0))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getStruct(4).getLong(0)))))
      .toMap
    assert(out("u1") == ((3L, 4.0, 2L, Some(2L))))
    assert(out("u2") == ((2L, 0.0, 0L, None)))
    // the drawup form also RESETS: x=[5,-5,5], k=0 -> S=[5,0,5],
    // s=[5,0,5] (recursion: 5, max(0,0)=0, 5) — identical
    val reset = TimeSeries.cusum(
        Seq(("r", 1L, 5.0), ("r", 2L, -5.0), ("r", 3L, 5.0))
          .toDF("k", "seq", "v"),
        "k", Seq("seq"), "v", lit(0.0), lit(4.0)).head()
    assert(reset.getDouble(2) == 5.0 && reset.getLong(3) == 2L)
  }

  test("dailyAutocorr matches the alternating-series hand case") {
    // counts 1,2,1,2,1,2 on six consecutive days: mu=1.5, ss=1.5
    // lag1: five (-0.25) products -> -1.25/1.5; lag2: four 0.25 -> 1/1.5
    val ev = (1 to 6).flatMap { d =>
      val n = if (d % 2 == 0) 2 else 1
      (1 to n).map(i => ("g", s"2024-01-0$d 00:00:0$i"))
    }.toDF("t", "s").withColumn("ts", col("s").cast("timestamp"))
    val out = TimeSeries.dailyAutocorr(ev, "t", "ts", maxLag = 2)
      .orderBy("lag").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1, 5L, -0.833333), (2, 4L, 0.666667)))
  }

  test("dailyAutocorr pairs only days that exist; constant series is NULL") {
    // counts 1,2,1 on days 1,2,4 (day 3 missing): each lag pairs once
    val ev = Seq(("g", "2024-01-01 00:00:01"), ("g", "2024-01-02 00:00:01"),
      ("g", "2024-01-02 00:00:02"), ("g", "2024-01-04 00:00:01"))
      .toDF("t", "s").withColumn("ts", col("s").cast("timestamp"))
    val out = TimeSeries.dailyAutocorr(ev, "t", "ts", maxLag = 3)
      .collect().map(r => r.getInt(1) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // mu=4/3, ss=2/3; lag1 (1,2): -2/9; lag2 (2,1): -2/9; lag3 (1,1): 1/9
    assert(out == Map(1 -> ((1L, -0.333333)), 2 -> ((1L, -0.333333)),
      3 -> ((1L, 0.166667))))
    // all-equal counts: zero variance -> NULL acf, not an error
    val const = Seq(("g", "2024-01-01"), ("g", "2024-01-02"))
      .toDF("t", "s").withColumn("ts", col("s").cast("timestamp"))
    val c = TimeSeries.dailyAutocorr(const, "t", "ts", maxLag = 1).collect()
    assert(c.length == 1 && c(0).isNullAt(3))
  }

  test("seasonalZ: a weekly-patterned series is flat after adjustment; a true spike flags") {
    // two full weeks: Mondays always 4x the other days -> the raw
    // pattern is seasonal, adjusted series constant -> z NULL rows;
    // then a genuine 10x Tuesday spike in week 3 must flag
    val base = for {
      w <- 0 to 2; dow <- 0 to 6
      day = 1 + w * 7 + dow
      n = if (w == 2 && dow == 1) 40 else if (dow == 0) 4 else 1
      i <- 1 to n
    } yield ("g", f"2024-01-$day%02d 00:00:${i % 60}%02d.${i}%03d")
    val ev = base.toDF("t", "s").withColumn("ts", col("s").cast("timestamp"))
    val out = TimeSeries.seasonalZ(ev, "t", "ts").collect()
      .map(r => r.getDate(1).toString -> r.getBoolean(4)).toMap
    assert(out("2024-01-16")) // the week-3 Tuesday spike
    assert(out.count(_._2) == 1, s"only the spike flags: $out")
  }

  test("decompose: a pure weekly pattern is all seasonal, zero residual") {
    // 3 full weeks, Mondays 8 events, other days 1: trend = 2
    // everywhere the window is full, seasonal = +6 Monday / -1 rest,
    // residual identically 0
    val ev = (for {
      day <- 1 to 21
      date = java.time.LocalDate.of(2024, 1, day) // Jan 1 2024 is a Monday
      n = if (date.getDayOfWeek.getValue == 1) 8 else 1
      i <- 1 to n
    } yield ("g", f"2024-01-$day%02d 00:00:${i % 60}%02d"))
      .toDF("t", "s").withColumn("ts", col("s").cast("timestamp"))
    val out = TimeSeries.decompose(ev, "t", "ts").collect()
    assert(out.length == 15) // days 4..18 have a full centered window
    out.foreach { r =>
      assert(r.getDouble(3) == 2.0, s"trend: $r")
      assert(r.getDouble(5) == 0.0, s"residual: $r")
      assert(r.getDouble(4) == (if (r.getLong(2) == 8L) 6.0 else -1.0),
        s"seasonal: $r")
    }
  }

  test("holt: pure linear trend is tracked exactly; forecast extrapolates") {
    // daily counts 1,2,3 (i copies on day i): l=3, b=1, forecast=3+7=10
    val ev = (1 to 3).flatMap(day => (1 to day).map(i =>
        ("g", f"2024-02-0$day%01d 00:00:${i % 60}%02d")))
      .toDF("t", "s").withColumn("ts", col("s").cast("timestamp"))
    val r = TimeSeries.holt(ev, "t", "ts").head()
    assert(r.getInt(1) == 3)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 1.0
      && r.getDouble(4) == 10.0, r.toString)
    // a single-day group yields no row (no trend estimable)
    val one = Seq(("h", "2024-02-01 00:00:00")).toDF("t", "s")
      .withColumn("ts", col("s").cast("timestamp"))
    assert(TimeSeries.holt(one, "t", "ts").count() == 0)
  }

  test("entropyRate: 0 for a deterministic chain, ln 2 for a fair binary fork") {
    import graft.ops.Markov
    val det = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "B"))
      .toDF("k", "seq", "et")
    val h0 = Markov.entropyRate(det, "k", Seq("seq"), "et").head()
    assert(h0.getDouble(0) == 0.0 && h0.getLong(1) == 3L && h0.getLong(2) == 2L)
    val fork = Seq((1L, 1L, "A"), (1L, 2L, "B"), (2L, 1L, "A"), (2L, 2L, "C"))
      .toDF("k", "seq", "et")
    val h1 = Markov.entropyRate(fork, "k", Seq("seq"), "et").head()
    assert(h1.getDouble(0) == 0.693147 && h1.getLong(1) == 2L
      && h1.getLong(2) == 1L)
  }
}
