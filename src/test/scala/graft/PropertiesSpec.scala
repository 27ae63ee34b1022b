package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.functions.DateTimeFunctions.yearWeek
import graft.functions.ReturnFunctions.compoundReturn

/** Property-based checks (SURVEY §5): generator-driven inputs, each
  * property evaluated as ONE Spark job over a generated frame. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    Iterator.iterate(rng.Seed(seed))(_.next)
      .map(s => g.apply(Gen.Parameters.default, s))
      .collect { case Some(v) => v }.take(n).toSeq

  test("property: joinAsOf (all directions, tolerance) equals brute force on random data") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)
    val tradeGen = for {
      sym <- Gen.oneOf("A", "B"); t <- Gen.choose(0L, 100L)
    } yield (sym, t)
    val rateGen = for {
      sym <- Gen.oneOf("A", "B"); t <- Gen.choose(0L, 100L)
      v <- Gen.choose(1, 999)
    } yield (sym, t, v.toDouble)

    for (seed <- 1L to 5L) {
      val trades = sample(tradeGen, 40, seed).zipWithIndex
        .map { case ((sym, t), i) => (i.toLong, sym, t) }
      // seq = index -> unique tie-break; duplicates in (sym, t) are common
      val rates = sample(rateGen, 25, seed + 1000).zipWithIndex
        .map { case ((sym, t, v), i) => (sym, t, i.toLong, v) }
      val tradesDf = trades.map { case (id, sym, t) => (id, sym, ts(t)) }
        .toDF("trade_id", "sym", "t")
      val ratesDf = rates.map { case (sym, t, seq, v) => (sym, ts(t), seq, v) }
        .toDF("sym", "rt", "seq", "rate")

      // brute force: among eligible rates pick by direction, tie ->
      // greatest seq (matching rightTieBreak semantics)
      def brute(dir: String, tol: Option[Long]): Map[Long, Option[Double]] =
        trades.map { case (id, sym, t) =>
          val cands = rates.filter(_._1 == sym)
          val eligible = dir match {
            case "backward" => cands.filter(_._2 <= t)
              .filter(r => tol.forall(tl => t - r._2 <= tl))
            case "forward" => cands.filter(_._2 >= t)
              .filter(r => tol.forall(tl => r._2 - t <= tl))
            case "nearest" => cands
              .filter(r => tol.forall(tl => math.abs(r._2 - t) <= tl))
          }
          val pick = dir match {
            case "backward" => eligible.sortBy(r => (r._2, r._3)).lastOption
            case "forward" => eligible.sortBy(r => (-r._2, r._3)).lastOption
            case "nearest" =>
              val backs = eligible.filter(_._2 <= t)
              val fwds = eligible.filter(_._2 > t)
              val bb = backs.sortBy(r => (r._2, r._3)).lastOption
              val ff = fwds.sortBy(r => (-r._2, r._3)).lastOption
              (bb, ff) match {
                case (Some(b), Some(f)) =>
                  if (t - b._2 <= f._2 - t) Some(b) else Some(f)
                case (b, f) => b.orElse(f)
              }
          }
          id -> pick.map(_._4)
        }.toMap

      for (dir <- Seq("backward", "forward", "nearest");
           tol <- Seq(None, Some(10L))) {
        val got = graft.ops.AsOf.joinAsOf(tradesDf, ratesDf, Seq("sym"),
            "t", "rt", Seq("rate"), direction = dir,
            tolerance = tol.map(s => expr(s"INTERVAL $s SECONDS")),
            rightTieBreak = Some("seq"))
          .select("trade_id", "rate").collect()
          .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
          .toMap
        assert(got == brute(dir, tol),
          s"seed=$seed dir=$dir tol=$tol diverged from brute force")
      }
    }
  }

  test("property: compound return is permutation-invariant per group") {
    val groupGen = Gen.nonEmptyListOf(Gen.choose(-0.5, 0.5))
    val groups = sample(groupGen, 40, 7L).zipWithIndex
    val rows = groups.flatMap { case (rs, g) =>
      val fwd = rs.map(r => (g, "fwd", r))
      val rev = rs.reverse.map(r => (g, "rev", r))
      val rot = (rs.drop(1) ++ rs.take(1)).map(r => (g, "rot", r))
      fwd ++ rev ++ rot
    }
    val agg = rows.toDF("g", "perm", "r")
      .groupBy("g", "perm").agg(compoundReturn($"r").as("c"))
      .groupBy("g").agg((max($"c") - min($"c")).as("spread"))
    val maxSpread = agg.agg(max($"spread")).head().getDouble(0)
    assert(maxSpread < 1e-9, s"permutation changed compound by $maxSpread")
  }

  test("property: compound of n zeros is zero; sign follows single returns") {
    val ns = sample(Gen.choose(1, 20), 20, 11L).zipWithIndex
    val zeros = ns.flatMap { case (n, g) => Seq.fill(n)((g, 0.0)) }
    val res = zeros.toDF("g", "r").groupBy("g")
      .agg(abs(compoundReturn($"r")).as("c"))
      .agg(max($"c")).head().getDouble(0)
    assert(res < 1e-12)
  }

  test("property: yearWeek is well-formed and rolls only on Mon/Jan 1") {
    val dates = sample(Gen.choose(0L, 58000L), 400, 13L).distinct
    val df = dates.toDF("off")
      .select(date_add(lit("1900-01-01").cast("date"), $"off".cast("int")).as("d"))
      .select($"d",
        yearWeek($"d").as("yw"),
        yearWeek(date_sub($"d", 1)).as("yw_prev"),
        date_format($"d", "EEEE").as("dow"),
        dayofyear($"d").as("doy"))
    val bad = df.where(
      // format YYYY-NN with NN in 00..53 and matching year
      !($"yw".rlike("^\\d{4}-[0-5]\\d$")) ||
        substring($"yw", 1, 4) =!= year($"d").cast("string") ||
        // the week key changes from yesterday iff Monday or Jan 1
        (($"yw" =!= $"yw_prev") =!= ($"dow" === "Monday" || $"doy" === 1)))
      .count()
    assert(bad == 0L)
  }

  test("property: jaccard pairs are bounded in (0,1] and symmetric-free (a<b)") {
    val wordGen = Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")
    val docGen = Gen.listOfN(30, wordGen).map(_.mkString(" "))
    val docs = sample(docGen, 60, 17L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val pairs = graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text",
      n = 2, threshold = 0.0)
    val bad = pairs.where($"jaccard" <= 0.0 || $"jaccard" > 1.0 ||
      $"doc_a" >= $"doc_b").count()
    assert(bad == 0L)
    // jaccard 1.0 appears iff two docs share their full shingle set
  }

  test("property: minhash signature values lie in [0, M)") {
    val docGen = Gen.listOfN(20, Gen.oneOf("x", "y", "z", "w", "v"))
      .map(_.mkString(" "))
    val docs = sample(docGen, 50, 19L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val sig = graft.ops.Dedup.minhashSignatures(docs, "doc_id", "text", n = 2)
    val conds = (0 until 8).map(i =>
      col(s"mh$i") < 0 || col(s"mh$i") >= graft.functions.TextFunctions.MinhashMod)
    assert(sig.where(conds.reduce(_ || _)).count() == 0L)
  }

  test("property: interleaveBySource is a bijective total order, sources cycle") {
    // random UNEQUAL source sizes, random seeds
    for (seed <- Seq("a", "b")) {
      val sizes = sample(Gen.chooseNum(1, 40), 5, 7L)
      val rows = sizes.zipWithIndex.flatMap { case (n, s) =>
        (1 to n).map(i => (s * 1000L + i, s"src$s"))
      }
      val got = graft.ops.Sampling
        .interleaveBySource(rows.toDF("id", "source"), "source", "id", seed)
        .select("id", "source", "rn", "pos").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // pos is unique (a total order), and equals (rn-1)*K + sourceIdx
      assert(got.map(_._4).distinct.length == got.length)
      val k = sizes.length
      val srcIdx = got.map(_._2).distinct.sorted.zipWithIndex.toMap
      assert(got.forall { case (_, s, rn, pos) =>
        pos == (rn - 1) * k + srcIdx(s) })
      // within each source, rn is a 1..n permutation (no gaps, no dups)
      got.groupBy(_._2).foreach { case (_, xs) =>
        assert(xs.map(_._3).sorted.toSeq == (1L to xs.length))
      }
    }
  }

  test("property: winsorize output always lies within the group's observed range") {
    val vals = sample(Gen.chooseNum(-1e6, 1e6), 300, 23L)
    val df = vals.zipWithIndex
      .map { case (v, i) => (s"g${i % 3}", v) }.toDF("grp", "v")
    val out = graft.ops.Binning.winsorize(df, "grp", "v", 0.1, 0.9)
    // clamped values are bounded by the group's own min/max, order-stats
    // monotone: v_w <= v when v above the band, >= when below
    val joined = out.join(
      df.groupBy("grp").agg(min($"v").as("lo"), max($"v").as("hi")), "grp")
    assert(joined.where($"v_w" < $"lo" || $"v_w" > $"hi").count() == 0)
    assert(out.count() == df.count())
    // only the tails move: at most ~(lo + 1-hi) of each group changes
    // (continuous values, ties negligible at this sample size)
    val moved = out.where(abs($"v_w" - $"v") > 0).count().toDouble
    assert(moved / df.count() <= 0.25, s"moved fraction ${moved / df.count()}")
    // and both tails DID clamp something (the property isn't vacuous)
    assert(moved > 0)
  }

  test("property: string-similarity metric laws on random pairs/triples") {
    import graft.expressions.StringSimilarity
    val strGen = for {
      n <- Gen.choose(0, 12)
      cs <- Gen.listOfN(n, Gen.oneOf(('a' to 'e') ++ Seq(' ', 'X')))
    } yield cs.mkString
    val tripleGen = for {
      a <- strGen; b <- strGen; c <- strGen
    } yield (a, b, c)
    val triples = sample(tripleGen, 400, 77L)
    val df = triples.toDF("a", "b", "c")
    def jw(x: String, y: String) = StringSimilarity.jaroWinkler(col(x), col(y))
    def dl(x: String, y: String) =
      StringSimilarity.damerauLevenshtein(col(x), col(y))
    val checked = df.select(
      // bounds + identity-of-indiscernibles
      (jw("a", "b") >= 0 && jw("a", "b") <= 1).as("jw_bounds"),
      ((col("a") =!= col("b")) || jw("a", "b") === 1.0).as("jw_eq1"),
      ((dl("a", "b") === 0) === (col("a") === col("b"))).as("dl_zero_iff"),
      // symmetry
      (jw("a", "b") === jw("b", "a")).as("jw_sym"),
      (dl("a", "b") === dl("b", "a")).as("dl_sym"),
      // DL lower/upper bounds: |len diff| <= d <= max(len)
      (dl("a", "b") >= abs(length(col("a")) - length(col("b")))
        && dl("a", "b") <= greatest(length(col("a")), length(col("b"))))
        .as("dl_len_bounds"),
      // triangle inequality (full DL is a true metric)
      (dl("a", "c") <= dl("a", "b") + dl("b", "c")).as("dl_triangle"))
    val bad = checked.where(checked.columns.map(c => !col(c)).reduce(_ || _))
    assert(bad.count() == 0, bad.collect().take(3).mkString("; "))
  }
}
