package graft

import org.apache.spark.sql.functions._

import graft.ops.{Approx, Sampling}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "documents")

  test("deterministicSample: stable across runs/partitionings, ~fraction sized") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs.repartition(7), "doc_id", 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "same keys must make the same decision")
    val n = docs.count().toDouble
    assert(a.size > n * 0.25 && a.size < n * 0.55, s"got ${a.size} of $n")
    // monotone: a smaller fraction selects a subset
    val c = Sampling.deterministicSample(docs, "doc_id", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(c.subsetOf(a))
    assert(Sampling.deterministicSample(docs, "doc_id", 0.0).count() == 0)
    assert(Sampling.deterministicSample(docs, "doc_id", 1.0).count() == n)
  }

  test("capPerStratum balances a skewed corpus deterministically") {
    val ev = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "events")
    val capped = Sampling.capPerStratum(ev, "event_type", 50, "event_id")
    val sizes = capped.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.values.forall(_ <= 50))
    // strata smaller than the cap pass through whole
    val orig = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    orig.foreach { case (k, n) => assert(sizes(k) == math.min(n, 50L)) }
    // deterministic under repartitioning
    val again = Sampling.capPerStratum(ev.repartition(5), "event_type", 50, "event_id")
    assert(capped.select("event_id").except(again.select("event_id")).isEmpty)
  }

  test("capPerStratumSeeded: portable md5 order, cap holds, seed changes the pick") {
    val capped = Sampling.capPerStratumSeeded(docs, "source", 5, "doc_id", "v1")
    val bySource = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource.values.forall(_ <= 5))
    // brute-force replica of the portable hash order in plain Scala
    def hk(seed: String, key: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$key".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val rows = docs.select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = rows.groupBy(_._2).values.flatMap(
      _.sortBy { case (id, _) => (hk("v1", id), id) }.take(5)).map(_._1).toSet
    val got = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    // a different seed keeps a different set (same sizes)
    val other = Sampling.capPerStratumSeeded(docs, "source", 5, "doc_id", "v2")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(other != got)
    assert(other.size == got.size)
  }

  test("hashSplit: disjoint-exhaustive, ~fractions, stable, narrow") {
    val split = Sampling.hashSplit(docs, "doc_id", 0.1, 0.2, seed = "s1")
    val sizes = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(sizes.values.sum == n.toLong) // every row in exactly one split
    assert(math.abs(sizes.getOrElse("val", 0L) / n - 0.1) < 0.06)
    assert(math.abs(sizes.getOrElse("test", 0L) / n - 0.2) < 0.06)
    // stable across partitionings; seed changes reassign some rows
    val again = Sampling.hashSplit(docs.repartition(9), "doc_id", 0.1, 0.2, "s1")
    assert(split.select("doc_id", "split")
      .except(again.select("doc_id", "split")).isEmpty)
    val other = Sampling.hashSplit(docs, "doc_id", 0.1, 0.2, "s2")
    assert(split.select("doc_id", "split")
      .except(other.select("doc_id", "split")).count() > 0)
    // the split is a narrow filter: no Exchange in a single-side plan
    val trainPlan = split.where($"split" === "train")
      .queryExecution.executedPlan.toString
    assert(!trainPlan.contains("Exchange"), s"split side plan shuffles:\n$trainPlan")
  }

  test("deterministicShuffle: seeded order is reproducible and seed-sensitive") {
    val s1 = Sampling.deterministicShuffle(docs.select("doc_id"), "doc_id", "a")
      .collect().map(_.getLong(0)).toSeq
    val s1again = Sampling.deterministicShuffle(
        docs.select("doc_id").repartition(5), "doc_id", "a")
      .collect().map(_.getLong(0)).toSeq
    assert(s1 == s1again, "same seed must give the same global order")
    val s2 = Sampling.deterministicShuffle(docs.select("doc_id"), "doc_id", "b")
      .collect().map(_.getLong(0)).toSeq
    assert(s1 != s2, "different seeds must reorder")
    assert(s1.sorted == s2.sorted, "shuffle permutes, never drops")
  }

  test("epochPositions: two-phase ranks equal the global shuffle order") {
    val ids = docs.select("doc_id")
    val out = Sampling.epochPositions(ids, "doc_id", "a", 100L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val n = out.length
    // pos is a bijection onto [0, n)
    assert(out.map(_._2).sorted.toSeq == (0L until n).toSeq)
    // batch = pos div 100
    assert(out.forall { case (_, p, b) => b == p / 100 })
    // sorting by pos reproduces deterministicShuffle's order exactly
    val byPos = out.sortBy(_._2).map(_._1).toSeq
    val global = Sampling.deterministicShuffle(ids, "doc_id", "a")
      .collect().map(_.getLong(0)).toSeq
    assert(byPos == global, "block-offset ranks must equal the global sort")
    // partitioning-independent; a different seed permutes
    val again = Sampling.epochPositions(ids.repartition(7), "doc_id", "a", 100L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(again.toSeq == out.map(t => (t._1, t._2)).sortBy(_._1).toSeq)
    val other = Sampling.epochPositions(ids, "doc_id", "b", 100L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(other.map(_._2).toSeq != out.sortBy(_._1).map(_._2).toSeq)
  }

  test("exactSplit hits floor-exact per-stratum counts, deterministically") {
    val split = Sampling.exactSplit(docs.select("doc_id", "source"),
      "source", "doc_id", 0.1, 0.2, "s1")
    val counts = split.groupBy("source", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.foreach { case (src, n) =>
      val v = counts.getOrElse((src, "val"), 0L)
      val t = counts.getOrElse((src, "test"), 0L)
      assert(v == math.floor(n * 0.1).toLong, s"$src val $v of $n")
      assert(t == math.floor(n * 0.2).toLong, s"$src test $t of $n")
      assert(counts.getOrElse((src, "train"), 0L) == n - v - t)
    }
    // stable under repartitioning; a row's split depends only on
    // (seed, stratum membership)
    val again = Sampling.exactSplit(
        docs.select("doc_id", "source").repartition(7),
        "source", "doc_id", 0.1, 0.2, "s1")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = split.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(first == again)
  }

  test("weightedSamplePerStratum caps each stratum and favors weight") {
    val out = Sampling.weightedSamplePerStratum(
      docs.select("doc_id", "source", "n_chars"),
      "source", "doc_id", "n_chars", 5, "t1")
    val sizes = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(sizes.forall(_._2 <= 5))
    // deterministic across partitioning
    val again = Sampling.weightedSamplePerStratum(
        docs.select("doc_id", "source", "n_chars").repartition(7),
        "source", "doc_id", "n_chars", 5, "t1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
    // weight preference: with one giant weight, that row is (almost)
    // always kept — make it deterministic with weight >> others
    import spark.implicits._
    val skew = ((1L to 50L).map(i => (i, "s", 1L)) :+ ((99L, "s", 100000L)))
      .toDF("id", "s", "w")
    val kept = Sampling.weightedSamplePerStratum(skew, "s", "id", "w",
      3, "t1").select("id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(99L), s"heavy row must survive, kept=$kept")
  }

  test("Misra-Gries sketch finds planted heavy hitters within the error bound") {
    // 10k tail tokens + two heavy items at 8% and 4%
    val n = 10000
    val rows = (0 until n).map { i =>
      if (i % 12 == 0) "HOT_A" else if (i % 25 == 0) "HOT_B" else s"tail_${i % 997}"
    }
    val df = rows.toDF("text")
    val k = 64
    val hh = Approx.frequentTokens(df, "text", k)
      .head().getMap[String, Long](0)
    val trueA = rows.count(_ == "HOT_A")
    val trueB = rows.count(_ == "HOT_B")
    // freq > n/(k+1) = 154 -> both guaranteed present
    assert(hh.contains("HOT_A") && hh.contains("HOT_B"))
    // MG undercounts by at most n/(k+1)
    assert(hh("HOT_A") <= trueA && hh("HOT_A") >= trueA - n / (k + 1))
    assert(hh("HOT_B") <= trueB && hh("HOT_B") >= trueB - n / (k + 1))
    // bounded state: at most k counters survive
    assert(hh.size <= k)
  }

  test("Count-Min sketch never undercounts, bounds overcount, merges partition-independently") {
    import graft.ops.Approx
    // 2 hot tokens + a long tail, known exact counts
    val rows = (Seq.fill(400)("HOT_A") ++ Seq.fill(250)("HOT_B")
      ++ (1 to 350).map(i => s"tail_${i % 120}")).map(Tuple1(_))
    val df = rows.toDF("text") // single-token docs -> tokens() = identity
    val (w, d) = (256, 4)
    val sketch = Approx.cmsTokens(df, "text", w, d)
    val n = rows.size
    val exact = rows.groupBy(_._1).map { case (k, xs) => k -> xs.size.toLong }
    for ((k, c) <- exact) {
      val est = Approx.cmsEstimate(sketch, w, d, k)
      assert(est >= c, s"$k undercounted: $est < $c")
      // ε = e/w bound (holds deterministically on this fixed data)
      assert(est <= c + (math.E / w * n).ceil.toLong,
        s"$k overcounted: $est vs $c")
    }
    // absent key estimates stay within the same bound of zero
    assert(Approx.cmsEstimate(sketch, w, d, "never_seen")
      <= (math.E / w * n).ceil.toLong)
    // counter addition commutes: repartitioned build = identical sketch
    val again = Approx.cmsTokens(df.repartition(13), "text", w, d)
    assert(sketch.toSeq == again.toSeq)
  }

  test("weightedSample is deterministic, partition-independent, and weight-biased") {
    val rows = (1L to 2000L).map(i => (i, if (i <= 1000) 1.0 else 10.0))
    val df = rows.toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", "w", 200, "s1")
      .select("id").as[Long].collect().toSet
    // identical sample from a differently-partitioned input
    val b = Sampling.weightedSample(df.repartition(13), "id", "w", 200, "s1")
      .select("id").as[Long].collect().toSet
    assert(a == b && a.size == 200)
    // 10x-weighted half dominates the sample (expected share ~91%)
    val heavy = a.count(_ > 1000L)
    assert(heavy > 150, s"heavy=$heavy of 200")
    // changing the seed changes the sample
    val c = Sampling.weightedSample(df, "id", "w", 200, "s2")
      .select("id").as[Long].collect().toSet
    assert(a != c)
  }

  test("weightedSample excludes null and non-positive weights") {
    // negative weights would otherwise ALWAYS win (ln(u)/w flips
    // positive); zero is -inf; null silently drops in the sort.
    val df = Seq[(Long, java.lang.Double)](
      (1L, 1.0), (2L, 2.0), (3L, -5.0), (4L, 0.0), (5L, null),
      (6L, 3.0), (7L, 1.0), (8L, 2.0))
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", 8, "s1")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 6L, 7L, 8L),
      s"sample must contain exactly the positive-weight rows, got $got")
  }

  test("mixtureSample: binding source keeps all, shares track targets, whitelist enforced") {
    // 1000/2000/4000 rows over three sources + one untargeted source
    val rows = (1L to 7500L).map { i =>
      val src = if (i <= 1000) "a" else if (i <= 3000) "b"
        else if (i <= 7000) "c" else "other"
      (i, src)
    }
    val df = rows.toDF("id", "source")
    // targets 0.5/0.3/0.2 -> M = min(1000/.5, 2000/.3, 4000/.2) = 2000
    // rates: a = 1.0 (binding), b = 0.3, c = 0.1
    val out = Sampling.mixtureSample(df, "source", "id",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2), "s1").cache()
    val bySrc = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("other"), "untargeted source must drop")
    assert(bySrc("a") == 1000L, "binding source keeps every row")
    // hash-binomial tolerance ~4 sigma
    assert(math.abs(bySrc("b") - 600.0) < 80, s"b kept ${bySrc("b")}")
    assert(math.abs(bySrc("c") - 400.0) < 80, s"c kept ${bySrc("c")}")
    // deterministic and partition-independent
    val again = Sampling.mixtureSample(df.repartition(13), "source", "id",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2), "s1")
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
    // unnormalized targets give the same mixture (shares normalize)
    val scaled = Sampling.mixtureSample(df, "source", "id",
      Map("a" -> 5.0, "b" -> 3.0, "c" -> 2.0), "s1")
      .select("id").as[Long].collect().toSet
    assert(scaled == out.select("id").as[Long].collect().toSet)
  }

  test("importanceWeights matches the hand-computed DSIR formula") {
    val df = Seq((1L, "a a b"), (2L, "c c")).toDF("id", "text")
    val out = Sampling.importanceWeights(df, "id", "text", $"id" === 1L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // raw: a=2 b=1 c=2 (V=3, Nr=5); target: a=2 b=1 (Nt=3)
    def lr(ct: Long, cr: Long) =
      math.log((ct + 1.0) / (3 + 3)) - math.log((cr + 1.0) / (5 + 3))
    val w1 = BigDecimal(2 * lr(2, 2) + 1 * lr(1, 1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w2 = BigDecimal(2 * lr(0, 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L)._1 == 3L && math.abs(out(1L)._2 - w1) < 2e-6)
    assert(out(2L)._1 == 2L && math.abs(out(2L)._2 - w2) < 2e-6)
    // target-like doc scores strictly higher than the off-target doc
    assert(out(1L)._2 > out(2L)._2)
  }

  test("importanceWeights is row-preserving; empty docs score 0") {
    val df = Seq((1L, "x y"), (2L, ""), (3L, "   ")).toDF("id", "text")
    val out = Sampling.importanceWeights(df, "id", "text", $"id" === 1L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out.size == 3)
    assert(out(2L) == ((0L, 0.0)) && out(3L) == ((0L, 0.0)))
  }
}
