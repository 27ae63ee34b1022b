package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling/balancing operators for training-data curation.
  *
  * All deterministic: sampling decisions derive from content hashes,
  * not RNG state, so a retried task or a re-run pipeline produces the
  * same corpus (the property that matters when a 100 TB job partially
  * fails and re-executes).
  */
object Sampling {

  /** Deterministic Bernoulli sample: keep a row iff its key's 64-bit
    * hash, reduced mod 1e6, lands below `fraction` x 1e6. Same key ->
    * same decision, across runs, partitionings, and retries (fraction
    * granularity 1e-6 — plenty for corpus downsampling). */
  def deterministicSample(df: DataFrame, keyCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction not in [0,1]")
    df.where(pmod(xxhash64(col(keyCol)), lit(1000000L))
      < lit((fraction * 1000000L).toLong))
  }

  /** Cap each stratum at `n` rows, chosen deterministically by content
    * hash (a hash-ordered top-n per class): the standard class-balance
    * step for a skewed training corpus. One shuffle on the stratum
    * key. */
  def capPerStratum(df: DataFrame, strataCol: String, n: Int,
      keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(xxhash64(col(keyCol)), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /** [[capPerStratum]] with the ENGINE-PORTABLE seeded hash order
    * ([[shuffleKey]] — md5-derived) instead of xxhash64: the same cap
    * decision reproduces in any engine with md5, so the operator is
    * oracle-gatable bit-for-bit (q73). Same plan shape: one shuffle on
    * the stratum key. */
  def capPerStratumSeeded(df: DataFrame, strataCol: String, n: Int,
      keyCol: String, seed: String): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(shuffleKey(col(keyCol), seed), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /** Per-stratum fractions (df.stat.sampleBy parity, seeded). */
  def stratifiedSample(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Portable seeded 32-bit key hash: the first 8 hex digits of
    * `md5("<seed>:<key>")` — identical in ANY engine with md5 (the
    * xxhash64 ops above are Spark-fast but Spark-only). The shuffle /
    * split primitive: sorting by it is a deterministic corpus shuffle,
    * reducing it mod 10k cuts split fractions. */
  def shuffleKey(keyCol: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed), lit(":"), keyCol.cast("string"))),
      1, 8), 16, 10).cast("long")

  /** Deterministic seeded corpus shuffle: global sort by the portable
    * hash (ties broken by the key itself). Spark executes a global sort
    * as a range-partitioned distributed sort — unlike a global-order
    * WINDOW this scales; downstream writers get shuffled-order shards
    * that reproduce across runs and retries. */
  def deterministicShuffle(df: DataFrame, keyCol: String,
      seed: String): DataFrame =
    df.orderBy(shuffleKey(col(keyCol), seed), col(keyCol))

  /** [[deterministicShuffle]] with EXPLICIT global positions and
    * training-batch ids: `pos` = the row's 0-based rank in the seeded
    * shuffle order, `batch` = `pos div batchSize` — the epoch
    * manifest a data loader consumes (resume from batch b = filter,
    * a narrow scan; next epoch = next seed). NO global-order window:
    * the 32-bit [[shuffleKey]]'s top 8 bits are a block id MONOTONE
    * in the shuffle order, so rank = per-block `row_number` (a
    * partitioned window) + the block's exclusive offset (a cumsum
    * over the 256-row block-count frame, broadcast back) — the
    * [[graft.ops.Packing.packByBudget]] two-phase shape. Output:
    * input columns + (shuffle_key, pos, batch). */
  def epochPositions(df: DataFrame, keyCol: String, seed: String,
      batchSize: Long): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val keyed = df.withColumn("shuffle_key", shuffleKey(col(keyCol), seed))
      .withColumn("__blk", shiftright(col("shuffle_key"), 24))
    val wLocal = Window.partitionBy(col("__blk"))
      .orderBy(col("shuffle_key"), col(keyCol))
    val local = keyed.withColumn("__local",
      row_number().over(wLocal).cast("long"))
    // block offsets: exclusive cumsum over the <=256-row count frame
    val wBlocks = Window.orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("__blk"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wBlocks), lit(0L)))
      .select(col("__blk"), col("__off"))
    local.join(broadcast(offsets), "__blk")
      .withColumn("pos", col("__off") + col("__local") - 1)
      .withColumn("batch", expr(s"pos div ${batchSize}L"))
      .drop("__blk", "__local", "__off")
  }

  /** Deterministic train/val/test split by portable hash: bucket =
    * hash mod 10_000; `[0, val)` -> "val", `[val, val+test)` -> "test",
    * rest "train" (granularity 1e-4). A row's assignment depends only
    * on (seed, key) — never on partitioning, other rows, or RNG state —
    * so the split is a NARROW per-side filter at 100 TB (no shuffle)
    * and is stable under retries and corpus growth. */
  def hashSplit(df: DataFrame, keyCol: String, valFrac: Double,
      testFrac: Double, seed: String): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac <= 1,
      s"fractions val=$valFrac test=$testFrac invalid")
    val b = pmod(shuffleKey(col(keyCol), seed), lit(10000L))
    val valCut = math.round(valFrac * 10000)
    val testCut = valCut + math.round(testFrac * 10000)
    df.withColumn("split",
      when(b < valCut, "val").when(b < testCut, "test").otherwise("train"))
  }

  /** EXACT-count stratified split: within each stratum, rank rows by
    * the portable seeded hash and cut at `floor(n·valFrac)` /
    * `floor(n·valFrac) + floor(n·testFrac)` — every stratum lands
    * within one row of its target proportions, where [[hashSplit]]
    * only hits them in expectation (a 30-row stratum can easily come
    * out 40/60 there). The price: one shuffle on the stratum key (two
    * partitioned windows share it); hashSplit stays the narrow
    * no-shuffle default for corpus-scale strata. floor(n·frac) is
    * plain IEEE double math — identical in any engine, so the split
    * is oracle-gatable row-for-row. */
  def exactSplit(df: DataFrame, strataCol: String, keyCol: String,
      valFrac: Double, testFrac: Double, seed: String): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac <= 1,
      s"fractions val=$valFrac test=$testFrac invalid")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(shuffleKey(col(keyCol), seed), col(keyCol))
    val wc = Window.partitionBy(col(strataCol))
    val nVal = floor(col("__n") * valFrac)
    val nTest = floor(col("__n") * testFrac)
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wc))
      .withColumn("split",
        when(col("__rn") <= nVal, "val")
          .when(col("__rn") <= nVal + nTest, "test")
          .otherwise("train"))
      .drop("__rn", "__n")
  }

  /** Deterministic round-robin source interleave — the data-mixing
    * ORDER operator: training reads the corpus as source1[0],
    * source2[0], ..., sourceK[0], source1[1], ... so no long
    * single-source run ever reaches the trainer (the usual fix of
    * "global shuffle then hope" gives no per-batch mixing guarantee).
    * Within each source, rows order by the portable seeded hash
    * ([[shuffleKey]]) — a deterministic per-source shuffle.
    *
    * The emitted `pos = (rn − 1) · K + sourceIdx` is a total order:
    * sorting by it yields the interleave. With unequal source sizes
    * the positions of exhausted sources are simply absent (gaps don't
    * disturb the order). NO global window is involved: rn is a
    * per-source window (one shuffle on source), and the source
    * registry (idx, K) is a bounded frame window joined back as a
    * broadcast — the [[temperatureResample]] shape. A NULL source is
    * its own source (sorted first in the registry) — a mixing ORDER
    * must never silently lose part of the corpus, so the internal
    * join key is null-coalesced rather than dropping null-source rows
    * on the equi-join. Output: input columns + rn + pos. */
  def interleaveBySource(df: DataFrame, sourceCol: String, keyCol: String,
      seed: String): DataFrame = {
    // internal null-safe source key: "0" for NULL, "1"+string form
    // otherwise — the prefix disambiguates NULL from every real value
    // (including the empty string) and sorts the NULL source first;
    // the original source column passes through untouched
    val srcKey = when(col(sourceCol).isNull, lit("0"))
      .otherwise(concat(lit("1"), col(sourceCol).cast("string")))
    val withKey = df.withColumn("__src", srcKey)
    val rn = row_number().over(Window.partitionBy(col("__src"))
      .orderBy(shuffleKey(col(keyCol), seed), col(keyCol))).cast("long")
    // bounded source registry: idx by source-key order + source count K
    val reg = withKey.groupBy(col("__src")).agg(count(lit(1)).as("__cnt"))
      .select(col("__src"),
        (row_number().over(Window.partitionBy(lit(1))
          .orderBy(col("__src"))) - 1).cast("long").as("__sidx"),
        count(lit(1)).over(Window.partitionBy(lit(1))).cast("long")
          .as("__k"))
    withKey.withColumn("rn", rn)
      .join(broadcast(reg), "__src")
      .withColumn("pos", (col("rn") - 1) * col("__k") + col("__sidx"))
      .drop("__src", "__sidx", "__k")
  }

  /** Temperature-based mixture rebalancing (the multilingual /
    * multi-source data-mixing rule, e.g. mC4/XLM-R): target share of
    * group g ∝ p_g^(1/T), flattening the source distribution as T
    * grows. Realized by deterministic downsampling — each group keeps
    * rows with probability
    *
    *   r_g = p_g^(1/T − 1) / max_h p_h^(1/T − 1)
    *
    * (the rarest group keeps everything at T > 1; corpus sizes N
    * cancel, so r depends only on group counts). The keep decision is
    * the portable [[shuffleKey]] Bernoulli gate on the row key —
    * retry-stable and engine-portable (oracle-gated bit-for-bit,
    * q90). Keep probabilities are rounded to the 1e-6 gate grid.
    *
    * Shape: one bounded group-count aggregation; the max-weight
    * normalizer is a window over THAT bounded frame (group
    * cardinality, not data); probabilities broadcast back; the gate
    * itself is a narrow filter. The corpus is scanned once and never
    * shuffled. Output: input columns + n_before + keep_prob. */
  def temperatureResample(df: DataFrame, groupCol: String, keyCol: String,
      temperature: Double, seed: String): DataFrame = {
    require(temperature > 0, "temperature must be positive")
    val a = 1.0 / temperature - 1.0
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_before"))
      .withColumn("__w", pow(col("n_before").cast("double"), lit(a)))
    val probs = counts
      .withColumn("keep_prob",
        round(col("__w") / max(col("__w")).over(Window.partitionBy(lit(1))), 6))
      .drop("__w")
    df.join(broadcast(probs), groupCol)
      .where(pmod(shuffleKey(col(keyCol), seed), lit(1000000L))
        < round(col("keep_prob") * 1000000L).cast("long"))
  }

  /** Deterministic weighted sampling WITHOUT replacement
    * (Efraimidis–Spirakis 2006): each row draws u ∈ (0,1) from the
    * portable seeded hash of its key and scores key = ln(u)/w; the
    * top-n scores ARE a weighted sample without replacement (row i
    * wins proportionally to w_i at every selection step). Content-
    * derived u ⇒ the sample reproduces across runs, retries, and
    * engines (oracle-gated bit-for-bit); scores round to 9 digits
    * (ln differs in the last ulp across libms) with the key as
    * tie-break.
    *
    * Shape: a narrow per-row projection + global top-n
    * (TakeOrdered — no full sort). Output: input + `es_key`.
    *
    * Rows with NULL or non-positive weight are excluded up front: the
    * Efraimidis–Spirakis keying requires w > 0 (w < 0 flips ln(u)/w
    * positive and would always win; w = 0 is −∞; NULL would silently
    * drop rows inside the sort) — filtering them is the documented
    * semantics "weight 0 ⇒ never sampled". */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      n: Int, seed: String): DataFrame = {
    require(n > 0, "n must be positive")
    val u = (pmod(shuffleKey(col(keyCol), seed), lit(1000000L))
      .cast("double") + 0.5) / 1000000.0
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("es_key", round(log(u) / col(weightCol), 9))
      .orderBy(col("es_key").desc, col(keyCol))
      .limit(n)
  }

  /** [[weightedSample]] PER STRATUM: the class-balancing cap
    * ([[capPerStratumSeeded]]) upgraded to weighted inclusion
    * probabilities — each stratum keeps its top `n` by the
    * Efraimidis–Spirakis key, so within a class, heavier rows (longer
    * docs, higher-engagement users) are proportionally likelier to
    * survive, deterministically. One shuffle on the stratum key
    * (a partitioned rank window — never a global sort + limit like
    * the global form). Adds (es_key, rn). */
  def weightedSamplePerStratum(df: DataFrame, strataCol: String,
      keyCol: String, weightCol: String, n: Int, seed: String): DataFrame = {
    require(n > 0, "n must be positive")
    val u = (pmod(shuffleKey(col(keyCol), seed), lit(1000000L))
      .cast("double") + 0.5) / 1000000.0
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("es_key").desc, col(keyCol))
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("es_key", round(log(u) / col(weightCol), 9))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= n)
  }

  /** Deterministic mixture resampling: downsample each source so the
    * kept corpus approaches the TARGET mixture proportions, without
    * ever duplicating a row (downsample-only — upsampling is a
    * training-loader concern). The kept total is the largest M
    * feasible under the targets: M = min over targeted non-empty
    * sources of n_s / t_s, and each source keeps
    * rate_s = t_s · M / n_s (the binding source keeps 100%). Rows
    * pass/fail by the portable seeded hash gate
    * (`shuffleKey mod 10⁶ < rate·10⁶` — the [[hashSplit]] gate), so
    * the kept set is reproducible across engines, partitionings, and
    * retries; kept shares match the targets in expectation (hash
    * binomial, not exact quotas). Sources absent from `targets` (or
    * with target 0) are DROPPED — a mixture is a whitelist.
    *
    * Scale shape: the source registry is a bounded hash agg; the
    * feasible-M reduction runs on that bounded frame and the per-source
    * rates broadcast back onto the corpus — one narrow gate per row,
    * no corpus shuffle. Output: input rows that pass, plus their
    * `keep_rate`. */
  def mixtureSample(df: DataFrame, sourceCol: String, keyCol: String,
      targets: Map[String, Double], seed: String): DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.values.forall(_ >= 0), "target shares must be >= 0")
    val total = targets.values.sum
    require(total > 0, "target shares must sum > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val tgt = targets.toSeq.map { case (s, w) => (s, w / total) }
      .toDF(sourceCol, "__t")
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).cast("double").as("__n"))
      .join(broadcast(tgt), Seq(sourceCol))
      .where(col("__t") > 0)
    // feasible kept total: bounded frame -> 1-row broadcast
    val feasible = counts.agg(min(col("__n") / col("__t")).as("__m"))
    val rates = counts.crossJoin(broadcast(feasible))
      .select(col(sourceCol),
        least(lit(1.0), round(col("__t") * col("__m") / col("__n"), 9))
          .as("keep_rate"))
    df.join(broadcast(rates), Seq(sourceCol))
      .where(pmod(shuffleKey(col(keyCol), seed), lit(1000000L))
        < (col("keep_rate") * 1000000.0).cast("long"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how target-like its unigram distribution is —
    * log w(d) = Σ_tok count_d(tok) · [ln p̂_target(tok) − ln p̂_raw(tok)]
    * with add-one smoothing over the raw vocabulary. Feed `log_weight`
    * (exponentiated, or rank-thresholded) into [[weightedSample]] to
    * resample a raw crawl toward a high-quality target domain.
    *
    * Scale shape: documents collapse to per-doc token COUNTS first
    * (one hash agg), the two unigram models are token-keyed aggs, the
    * corpus totals attach as a broadcast 1-row scalar, and the
    * log-ratio table joins back per token — equi-joins and partial
    * aggs only; the corpus text is read once and never shuffled as
    * strings. Tokens absent from the target model still contribute
    * (smoothed) so off-target docs score genuinely low, not NULL.
    *
    * Output: one row per input document — idCol, `n_tokens` (long),
    * `log_weight` (rounded 6). Empty/whitespace-only docs get
    * n_tokens = 0 and log_weight = 0.0. */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val docTok = df
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val raw = docTok.groupBy(col("tok")).agg(sum(col("cnt")).as("cr"))
    val tgt = df.where(targetPred)
      .select(explode(tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("ct"))
    // corpus totals: raw/target token mass + raw vocabulary size —
    // one 1-row frame, broadcast onto the per-token ratio table
    val scalars = raw.agg(sum(col("cr")).as("nr"),
        count(lit(1)).as("v"))
      .crossJoin(tgt.agg(coalesce(sum(col("ct")), lit(0L)).as("nt")))
    val ratio = raw.join(tgt, Seq("tok"), "left")
      .crossJoin(broadcast(scalars))
      .select(col("tok"),
        (log((coalesce(col("ct"), lit(0L)) + lit(1)).cast("double")
            / (col("nt") + col("v")).cast("double"))
          - log((col("cr") + lit(1)).cast("double")
            / (col("nr") + col("v")).cast("double"))).as("lr"))
    val perDoc = docTok.join(ratio, Seq("tok"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_tokens"),
        round(sum(col("cnt").cast("double") * col("lr")), 6)
          .as("log_weight"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("log_weight"), lit(0.0)).as("log_weight"))
  }
}
