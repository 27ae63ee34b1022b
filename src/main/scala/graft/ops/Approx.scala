package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates for 100 TB interactive profiling — the
  * sketch-based forms of the exact aggregates used elsewhere. No DuckDB
  * oracle entries (sketch implementations are engine-specific); specs
  * bound the error against the exact answers instead.
  *
  * - distinct counts: HyperLogLog++ (`approx_count_distinct`), mergeable
  *   across partitions, fixed memory per group.
  * - quantiles: Greenwald-Khanna (`percentile_approx`), tunable
  *   accuracy/memory via the relative-error parameter.
  */
object Approx {

  /** HLL++ distinct count with the given relative standard deviation. */
  def distinctCount(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** GK-sketch quantile; `accuracy` ~ 1/relative-error (Spark default
    * 10000 = ~0.01%). */
  def quantile(c: Column, p: Double, accuracy: Int = 10000): Column =
    percentile_approx(c, lit(p), lit(accuracy))

  /** Per-group cardinality + quantile profile of a column — the shape
    * of a data-profiling pass over a huge fact table. */
  def profile(df: DataFrame, keys: Seq[String], value: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        distinctCount(col(value), rsd).as("approx_distinct"),
        quantile(col(value), 0.5).as("approx_p50"),
        quantile(col(value), 0.99).as("approx_p99"))

  /** Mergeable Misra-Gries heavy-hitters sketch (bounded memory: at
    * most `k` counters per partition buffer). Guarantees: every item
    * with true frequency > n/(k+1) survives; reported counts
    * undercount by at most n/(k+1). The single-pass hot-token /
    * hot-key detector for 100 TB streams — where an exact groupBy
    * would shuffle the full key universe. */
  class FrequentItems(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Map[String, Long], Map[String, Long]] {
    require(k > 0, "need at least one counter")

    override def zero: Map[String, Long] = Map.empty

    private def addOne(b: Map[String, Long], a: String): Map[String, Long] =
      if (b.contains(a)) b.updated(a, b(a) + 1)
      else if (b.size < k) b.updated(a, 1L)
      else b.view.mapValues(_ - 1).filter(_._2 > 0).toMap

    override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      addOne(b, a)

    override def merge(b1: Map[String, Long],
        b2: Map[String, Long]): Map[String, Long] = {
      val summed = b2.foldLeft(b1) { case (acc, (key, c)) =>
        acc.updated(key, acc.getOrElse(key, 0L) + c)
      }
      if (summed.size <= k) summed
      else {
        // subtract the (k+1)-th largest count from all, drop <= 0 —
        // the standard MG merge that preserves the error bound
        val cut = summed.values.toSeq.sorted(Ordering.Long.reverse)(k)
        summed.view.mapValues(_ - cut).filter(_._2 > 0).toMap
      }
    }

    override def finish(b: Map[String, Long]): Map[String, Long] = b

    override def bufferEncoder =
      org.apache.spark.sql.Encoders.kryo[Map[String, Long]]
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Heavy-hitter tokens of a text column: explode -> MG sketch,
    * one pass, bounded state. */
  def frequentTokens(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val fi = udaf(new FrequentItems(k), org.apache.spark.sql.Encoders.STRING)
    df.select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("tok"))
      .agg(fi(col("tok")).as("heavy_hitters"))
  }

  /** Mergeable Count-Min sketch over a string column: `d` hash rows ×
    * `w` counters of longs (fixed w·d·8 bytes regardless of key
    * cardinality). Point estimate = min over rows — NEVER undercounts;
    * overcounts by ≤ ε·N with probability 1−δ for w = ⌈e/ε⌉,
    * d = ⌈ln(1/δ)⌉. The dual of [[FrequentItems]]: MG keeps only the
    * top keys, CMS answers a count estimate for ANY key after the
    * fact (the "how often did THIS n-gram appear corpus-wide"
    * follow-up) — and sketches from disjoint shards merge by
    * element-wise addition, so per-day sketches roll up to per-month
    * for free. Counter updates commute, so the result is independent
    * of partitioning and merge order (asserted in the spec). */
  class CountMin(w: Int, d: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Array[Long], Array[Long]] {
    require(w > 0 && d > 0, "w and d must be positive")

    override def zero: Array[Long] = new Array[Long](w * d)

    override def reduce(b: Array[Long], a: String): Array[Long] = {
      var r = 0
      while (r < d) {
        b(r * w + java.lang.Math.floorMod(
          scala.util.hashing.MurmurHash3.stringHash(a, r), w)) += 1L
        r += 1
      }
      b
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

    override def finish(b: Array[Long]): Array[Long] = b

    override def bufferEncoder =
      org.apache.spark.sql.Encoders.kryo[Array[Long]]
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Build a CMS over the tokens of a text column: one pass, bounded
    * state; the returned array IS the sketch (w·d longs — the same
    * bounded-result collect as [[bloomBuild]]). */
  def cmsTokens(df: DataFrame, textCol: String, w: Int, d: Int): Array[Long] = {
    val cms = udaf(new CountMin(w, d), org.apache.spark.sql.Encoders.STRING)
    df.select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("tok"))
      .agg(cms(col("tok")).as("sketch"))
      .head().getSeq[Long](0).toArray
  }

  /** Point estimate from a built sketch: min over the d rows. */
  def cmsEstimate(sketch: Array[Long], w: Int, d: Int, key: String): Long = {
    require(sketch.length == w * d, "sketch size mismatch")
    (0 until d).map(r => sketch(r * w + java.lang.Math.floorMod(
      scala.util.hashing.MurmurHash3.stringHash(key, r), w))).min
  }

  // ---- Bloom-filter semi-join ----
  //
  // The shuffle-avoidance primitive for selective semi-joins: when the
  // probe side is huge and the build side's KEY SET fits a few MB of
  // bits, a Bloom filter broadcast as a plain literal turns the
  // semi-join into a NARROW filter (no probe-side shuffle at all), at
  // the price of a bounded false-positive rate. Use it as a pre-filter
  // in front of an exact join (false positives then cost only wasted
  // shuffle rows, never wrong results) or stand-alone where the FPR is
  // acceptable. No false negatives ever. Everything below is
  // codegen'd built-in expressions — no UDF on either path.

  /** Hash h_i of a key, Kirsch–Mitzenmacher double hashing:
    * position_i = (h1 + i·h2) mod m with two independent xxhash64
    * draws — k positions for TWO hash evaluations per key instead of
    * k (the scheme Guava and Spark's runtime BloomFilterImpl use;
    * Kirsch & Mitzenmacher 2006 prove the FPR bound is preserved).
    * The k conjuncts share the identical h1/h2 subtrees, so codegen
    * subexpression elimination evaluates them once per probe row —
    * on a 60M-row probe the hash work is the screen's dominant cost.
    * Both draws are pmod-bounded to [0, m) BEFORE combining so
    * h1 + i·h2 ≤ (k+1)·m stays far from long overflow (ANSI mode
    * throws on wraparound). */
  private def bloomPos(key: Column, i: Int, numBits: Int): Column = {
    val m = lit(numBits.toLong)
    val h1 = pmod(xxhash64(key), m)
    val h2 = pmod(xxhash64(lit(0x9e3779b97f4a7c15L), key), m)
    pmod(h1 + lit(i.toLong) * h2, m)
  }

  /** Build the filter: distributed OR-fold of the k hash positions
    * into a word array. The shuffle carries ≤ numBits/64 (word,
    * bits) partial rows; the driver collect is the FILTER ITSELF
    * (numBits/8 bytes — the same bounded-metadata collect as the IVF
    * probe list), which then travels to probes as a literal. */
  def bloomBuild(df: DataFrame, keyCol: String, numBits: Int,
      numHashes: Int): Array[Long] = {
    require(numBits > 0 && numBits % 64 == 0, "numBits must be a multiple of 64")
    require(numHashes > 0, "numHashes must be positive")
    val pos = explode(array((0 until numHashes).map(i =>
      bloomPos(col(keyCol), i, numBits)): _*))
    val words = df.select(pos.as("p"))
      .select((col("p") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("p") % 64).cast("int")).as("b"))
      .groupBy("w").agg(bit_or(col("b")).as("bits"))
      .collect()
    val arr = new Array[Long](numBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership-test column against a built filter (pure built-in
    * expressions: element_at + bit math — stays in whole-stage
    * codegen). */
  def bloomMightContain(key: Column, filter: Array[Long],
      numHashes: Int): Column = {
    val numBits = filter.length * 64
    val bits = lit(filter)
    (0 until numHashes).map { i =>
      val p = bloomPos(key, i, numBits)
      (element_at(bits, (p / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), (p % 64).cast("int")))) =!= 0L
    }.reduce(_ && _)
  }

  /** Approximate semi-join: rows of `probe` whose `probeKey` might be
    * in `build`'s `buildKey` set. Superset of the exact semi-join
    * (never drops a matching row); FPR ≈ (1 − e^(−kn/m))^k. */
  def bloomSemiJoin(probe: DataFrame, probeKey: String, build: DataFrame,
      buildKey: String, numBits: Int, numHashes: Int): DataFrame = {
    val filter = bloomBuild(build, buildKey, numBits, numHashes)
    probe.where(bloomMightContain(col(probeKey), filter, numHashes))
  }

  /** EXACT semi-join with a Bloom pre-filter — the semi-join-reduction
    * pattern for large-large joins where the build side's key set is
    * too big to broadcast-HASH-join cheaply but its BITS fit a few MB:
    * the narrow bloom screen drops most non-matching probe rows BEFORE
    * the join shuffle (only survivors' bytes cross the wire), and the
    * exact LEFT SEMI join then removes the bounded false positives.
    * Result ≡ the plain semi-join, always; the bloom changes only the
    * shuffled volume. (Spark's own runtime bloom filter —
    * `spark.sql.optimizer.runtime.bloomFilter.enabled` — applies the
    * same idea inside AQE; this is the explicit, plan-visible form
    * with the filter built over an arbitrary derived build frame.)
    *
    * Unlike [[bloomSemiJoin]]'s standing-filter form, the words here
    * never touch the driver: they ride a ONE-ROW broadcast stat frame
    * as the DENSE word array (the distributed bit_or fold's sparse
    * non-zero words scattered once by
    * [[graft.expressions.DenseBits]] — numBits/8 bytes, the same
    * few-MB bound as the literal), so build, screen, and exact join
    * are a SINGLE plan with no serialized build action ahead of the
    * probe. Dense matters: `element_at` is O(1) on an array but a
    * linear scan on a Spark map, and a sparse-map variant measured
    * 28 s vs the plain join's 3.6 s at the 100× decade — every probe
    * row paid O(set words) per hash. An empty build side scatters to
    * the all-zero array, and the probe conjunction drops every row,
    * matching the literal form. */
  def bloomReducedSemiJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String, numBits: Int,
      numHashes: Int): DataFrame = {
    require(numBits > 0 && numBits % 64 == 0, "numBits must be a multiple of 64")
    require(numHashes > 0, "numHashes must be positive")
    val pos = explode(array((0 until numHashes).map(i =>
      bloomPos(col(buildKey), i, numBits)): _*))
    val words = build.select(pos.as("p"))
      .select((col("p") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("p") % 64).cast("int")).as("b"))
      .groupBy("w").agg(bit_or(col("b")).as("bits"))
      .agg(collect_list(struct(col("w"), col("bits"))).as("__wb"))
      .select(graft.expressions.DenseBits(col("__wb"), numBits / 64)
        .as("__bloom"))
    val might = (0 until numHashes).map { i =>
      val p = bloomPos(col(probeKey), i, numBits)
      (element_at(col("__bloom"), (p / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (p % 64).cast("int")))) =!= 0L
    }.reduce(_ && _)
    probe.crossJoin(broadcast(words))
      .where(might)
      .drop("__bloom")
      .join(build.select(col(buildKey)),
        col(probeKey) === col(buildKey), "left_semi")
  }
}
