package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.etl.Checkpoints

/** Record linkage: blocked candidate generation + edit-distance
  * verification + transitive entity resolution — the metadata-side
  * dedup of a training-data pipeline (author/source/title
  * canonicalization, near-identical record collapse) where the
  * token-level sketches in [[Dedup]] are the wrong grain.
  *
  * Classic two-phase shape (Fellegi–Sunter lineage):
  *
  *   1. BLOCKING — multi-pass cheap keys (here: normalized key prefix
  *      and suffix) partition records so candidate pairs only form
  *      inside a block; the union of passes recovers pairs any single
  *      pass would miss. Never all-pairs: each pass is an equi-join on
  *      its block key.
  *   2. VERIFY — exact Levenshtein distance on the normalized key,
  *      kept when within `maxDist`. Spark's codegen'd `levenshtein`
  *      (classic unit-cost edit distance) matches the oracle engine's
  *      definition exactly, so the gate is engine-exact.
  *
  * Scale shape: blocking keys are narrow projections; each pass
  * shuffles on its block key, and block cardinality is CAPPED
  * (`blockCap`) — a hot block (shared boilerplate prefix, empty-ish
  * keys) would otherwise make the within-block self-join quadratic,
  * the classic blocking failure at corpus scale. Over-cap blocks are
  * dropped from pairing, exactly like [[Winnow.matchPairs]]' dfCap
  * drops boilerplate fingerprints: a block that big carries no
  * discriminating signal, and the standard remedy is a sharper
  * blocking key, not an O(cap²)+ join. [[overCapBlocks]] is the
  * audit surface — run it to LOG which blocks a cap dropped before
  * trusting a linkage pass. The verify filter runs inside the join
  * stage, and the transitive closure reuses
  * [[Dedup.nearDupComponents]]'s O(log n)-round checkpointed label
  * propagation.
  */
object Linkage {

  /** Verified linked pairs: (id_a, id_b, dist), id_a < id_b, over the
    * normalized comparison key `lower(substr(strCol, 1, keyWidth))`.
    * Two blocking passes (first / last `blockWidth` characters of the
    * key); records shorter than `2·blockWidth` characters are dropped
    * (no stable block key — a degenerate record, not a linkable one).
    * Blocks holding more than `blockCap` records are dropped from
    * pairing (see object doc; audit with [[overCapBlocks]]).
    *
    * `carry` names extra input columns to ride THROUGH the block join
    * and surface per side as `<col>_a` / `<col>_b` — the one-pass way
    * to hand downstream scorers (e.g. [[fellegiSunter]]'s comparison
    * fields) record attributes: two post-hoc join-backs against the
    * source table would re-shuffle the full pair frame twice, where
    * carrying costs only a few extra bytes on the block exchange. */
  def linkPairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, keyWidth: Int = 64, blockWidth: Int = 8,
      blockCap: Int = 1000, carry: Seq[String] = Nil): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    require(blockWidth >= 1 && keyWidth >= 2 * blockWidth,
      s"need keyWidth >= 2*blockWidth, got $keyWidth/$blockWidth")
    require(blockCap >= 2, s"blockCap below 2 can never pair, got $blockCap")
    requireCarry(carry, idCol, strCol)
    // cap: count per block key via a window, keep blocks within the
    // cap — bounds every block's pair fan-out at blockCap^2 regardless
    // of skew. The window is chosen deliberately over a separate
    // count-aggregate + anti-join: it clusters AND sorts the block
    // table by __blk, exactly the distribution the verification
    // self-join needs, so the whole pipeline runs off ONE exchange
    // (both join sides are ReusedExchange) instead of three.
    // materialized ONCE: both sides of the verification self-join read
    // the capped block table, and without the truncation each side
    // replays the scan + key derivation + count window (the executed
    // plan showed the whole subtree duplicated — AQE's broadcast
    // conversion defeats ReusedExchange here). The frame is narrow
    // (ids + 64-char keys), the alignedSpans pattern.
    val blocks = Checkpoints.truncate(
      blockTable(df, idCol, strCol, keyWidth, blockWidth, carry)
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__blk"))))
        .where(col("__n") <= blockCap).drop("__n"))
    verifyBlockedPairs(blocks, maxDist, carry)
  }

  private def requireCarry(carry: Seq[String], idCol: String,
      strCol: String): Unit = {
    require(carry.distinct == carry, s"duplicate carry columns: $carry")
    require(!carry.exists(c => c == idCol || c == strCol || c == "dist"),
      s"carry columns clash with id/key/dist: $carry")
  }

  /** The shared VERIFY tail of every key-blocking pass: within-block
    * self-join, exact Levenshtein within `maxDist`, then per-pair
    * dedup (a pair found by several passes links once). The distance
    * filter runs BEFORE the distinct on purpose: Levenshtein is a
    * cheap narrow computation, and a block pair surviving `maxDist`
    * is rare — so the dedup exchange carries only survivors instead
    * of the full candidate fan-out (duplicate candidates re-verify,
    * deterministically, which costs less than shuffling everything).
    * Carried attribute columns are functionally dependent on the ids,
    * so including them in the dedup changes nothing about which pairs
    * survive. */
  private def verifyBlockedPairs(blocks: DataFrame, maxDist: Int,
      carry: Seq[String] = Nil): DataFrame = {
    val a = blocks.select(col("__blk") +: col("__id").as("id_a") +:
      col("__name").as("__na") +:
      carry.map(c => col(c).as(s"${c}_a")): _*)
    val b = blocks.select(col("__blk") +: col("__id").as("id_b") +:
      col("__name").as("__nb") +:
      carry.map(c => col(c).as(s"${c}_b")): _*)
    val carried = carry.flatMap(c => Seq(col(s"${c}_a"), col(s"${c}_b")))
    // thresholded levenshtein: the banded O(maxDist·n) algorithm with
    // early abandon (returns -1 over the bound) — block pairs are
    // overwhelmingly non-matches, so the full O(n²) DP per pair is
    // where a naive verify spends its time. dist >= 0 ≡ dist <= maxDist,
    // and survivors carry their TRUE distance either way.
    a.join(b, Seq("__blk"))
      .where(col("id_a") < col("id_b"))
      .select(Seq(col("id_a"), col("id_b"),
        levenshtein(col("__na"), col("__nb"), maxDist).cast("long").as("dist"))
        ++ carried: _*)
      .where(col("dist") >= 0)
      .distinct()
  }

  /** The blocks a given `blockCap` would DROP: (__blk, n) per over-cap
    * block key — the audit/logging companion of [[linkPairs]]. A
    * non-empty result is the signal to inspect those keys and sharpen
    * the blocker (longer `blockWidth`, a different key column), since
    * records in dropped blocks cannot link through that pass. */
  def overCapBlocks(df: DataFrame, idCol: String, strCol: String,
      keyWidth: Int = 64, blockWidth: Int = 8,
      blockCap: Int = 1000): DataFrame =
    blockTable(df, idCol, strCol, keyWidth, blockWidth)
      .groupBy(col("__blk")).agg(count(lit(1)).as("n"))
      .where(col("n") > blockCap)

  /** The tagged two-pass block table: (__blk, __id, __name[, carry…])
    * — prefix pass rows under `p:`, suffix pass under `s:`, so the two
    * passes' blocks never collide. Both passes come out of ONE scan
    * (explode of the two keys): a self-union of the projection would
    * physically decode the full source text column twice — at corpus
    * scale the scan, not the key derivation, is the cost. */
  private def blockTable(df: DataFrame, idCol: String, strCol: String,
      keyWidth: Int, blockWidth: Int, carry: Seq[String] = Nil): DataFrame =
    df.where(length(col(strCol)) >= 2 * blockWidth)
      .select(col(idCol).as("__id") +:
        lower(substring(col(strCol), 1, keyWidth)).as("__name") +:
        carry.map(col): _*)
      .select(col("*"), explode(array(
        concat(lit("p:"), substring(col("__name"), 1, blockWidth)),
        concat(lit("s:"), substring(col("__name"), -blockWidth, blockWidth))))
        .as("__blk"))

  /** [[linkPairs]] with SUB-BLOCKING instead of dropping: a level-1
    * block over `blockCap` re-blocks its records under a key twice as
    * wide (`2·blockWidth` prefix/suffix), and only blocks still over
    * the cap at level 2 drop out. The recall trade of the plain cap
    * softens — records in a hot block can still link when they share
    * the sharper key — while the fan-out bound (cap² per block) holds
    * at every level. The standard blocking-refinement move when
    * [[overCapBlocks]] reports hot keys. */
  def linkPairsSubBlocked(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, keyWidth: Int = 64, blockWidth: Int = 8,
      blockCap: Int = 1000, carry: Seq[String] = Nil): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    require(blockWidth >= 1 && keyWidth >= 2 * blockWidth,
      s"need keyWidth >= 2*blockWidth, got $keyWidth/$blockWidth")
    require(blockCap >= 2, s"blockCap below 2 can never pair, got $blockCap")
    requireCarry(carry, idCol, strCol)
    val kept = Seq("__blk", "__id", "__name") ++ carry
    // hot keys per level via partial-aggregated counts + broadcast
    // (anti-)joins — same cap semantics as the per-row count window
    // this replaces, without shuffling and sorting the block table
    def hotKeys(t: DataFrame): DataFrame =
      t.groupBy(col("__blk")).agg(count(lit(1)).as("__n"))
        .where(col("__n") > blockCap).select(col("__blk"))
    // checkpointed: hot-key counting, the kept side, and re-blocking
    // all read the level-1 block table
    val lvl1 = Checkpoints.truncate(
      blockTable(df, idCol, strCol, keyWidth, blockWidth, carry))
    val hot1 = hotKeys(lvl1)
    val ok1 = lvl1.join(broadcast(hot1), Seq("__blk"), "left_anti")
      .select(kept.map(col): _*)
    // over-cap rows re-block under the doubled key, tagged P:/S: so
    // level-2 blocks never collide with level-1 ones
    val reblocked = lvl1.join(broadcast(hot1), Seq("__blk"), "left_semi")
      .withColumn("__blk",
        when(col("__blk").startsWith("p:"),
          concat(lit("P:"), substring(col("__name"), 1, 2 * blockWidth)))
        .otherwise(concat(lit("S:"),
          substring(col("__name"), -2 * blockWidth, 2 * blockWidth))))
    val lvl2 = reblocked
      .join(broadcast(hotKeys(reblocked)), Seq("__blk"), "left_anti")
      .select(kept.map(col): _*)
    // one materialization feeds both self-join sides (see linkPairs)
    verifyBlockedPairs(
      Checkpoints.truncate(ok1.unionByName(lvl2)), maxDist, carry)
  }

  /** SORTED-NEIGHBORHOOD linkage (Hernández & Stolfo 1995) — the
    * other classic blocking family: sort every record by the
    * normalized key and pair records within `windowSize` ranks. Where
    * key blocking needs a shared exact prefix/suffix, the sort window
    * links records that are merely CLOSE in sort order (shared long
    * prefixes, small tail edits), with a hard O(n·w) candidate bound
    * that no key skew can break.
    *
    * Scale shape: the global rank is NOT a single-partition window —
    * records range-partition by key (each partition a contiguous key
    * range), rank locally, and add per-partition offsets (one count
    * per partition, bounded driver metadata). Candidates form by an
    * EQUI-join on rank buckets of width `windowSize` (a pair within
    * the window shares a bucket or sits in adjacent ones), so fan-out
    * is ≤ 2·windowSize per record, then exact Levenshtein verifies.
    * Output: (id_a, id_b, dist), id_a < id_b. */
  def sortedNeighborPairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, keyWidth: Int = 64, windowSize: Int = 10): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    require(windowSize >= 1, s"windowSize must be positive, got $windowSize")
    // null keys are dropped EXPLICITLY: engines disagree on null sort
    // placement (Spark nulls-first vs DuckDB nulls-last), so a null
    // surviving into the rank would silently shift every neighbor
    val recs = df.where(col(strCol).isNotNull)
      .select(col(idCol).as("__id"),
        lower(substring(col(strCol), 1, keyWidth)).as("__name"))
    val ranked = withGlobalRank(recs, "__rk", Seq("__name", "__id"))
      .withColumn("__bkt", floor((col("__rk") - lit(1)) / lit(windowSize)))
    val a = ranked.select(col("__id").as("id_a"), col("__name").as("__na"),
      col("__rk").as("__ra"), col("__bkt"))
    val bSide = ranked.select(col("__id").as("id_b"),
      col("__name").as("__nb"), col("__rk").as("__rb"), col("__bkt"))
    // b joins its own bucket and the PREVIOUS one, so every rank pair
    // within windowSize meets exactly once (ranks are unique)
    val b = bSide.unionByName(bSide.withColumn("__bkt", col("__bkt") - 1))
    a.join(b, Seq("__bkt"))
      .where(col("__rb") > col("__ra")
        && col("__rb") <= col("__ra") + windowSize)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        // banded threshold form — see verifyBlockedPairs
        levenshtein(col("__na"), col("__nb"), maxDist).cast("long").as("dist"))
      .where(col("dist") >= 0)
  }

  /** Exact global rank without a single-partition window: range
    * partition by the sort key (contiguous key ranges per partition),
    * rank within each partition, then add per-partition offsets. The
    * partition→count collect is bounded metadata (one row per
    * partition); the partitioned frame is checkpointed once so the
    * offset pass and the rank pass see the SAME physical partitioning
    * (a re-sampled range exchange between the two jobs would
    * misalign them). */
  private def withGlobalRank(df: DataFrame, out: String,
      sortCols: Seq[String]): DataFrame = {
    val cols = sortCols.map(col)
    val parted = Checkpoints.truncate(df.repartitionByRange(cols: _*)
      .withColumn("__pid", spark_partition_id()))
    val counts = parted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__pid"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // offsets: partition p -> rows in partitions before p
    val offMap = counts.map(_._1).zip(
      counts.map(_._2).scanLeft(0L)(_ + _).init).toMap
    val offDf = parted.sparkSession
      .createDataFrame(offMap.toSeq).toDF("__pid", "__off")
    parted
      .withColumn("__rkl", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(cols: _*)))
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn(out, col("__rkl") + col("__off"))
      .drop("__pid", "__rkl", "__off")
  }

  /** One comparison field of the Fellegi–Sunter model: `agree` is the
    * field-agreement predicate over a candidate-pair frame, `m` the
    * probability the field agrees on a TRUE match, `u` on a true
    * non-match (supplied — estimated offline by EM or clerical
    * review; this operator is the deterministic scoring pass). */
  final case class FsField(name: String, agree: Column, m: Double, u: Double)

  /** Fellegi–Sunter probabilistic match scoring (Fellegi & Sunter,
    * JASA 1969) over blocked candidate pairs: each field contributes
    * `log2(m/u)` on agreement and `log2((1−m)/(1−u))` on
    * disagreement (a NULL comparison counts as disagreement, the
    * conservative convention); the summed weight classifies the pair
    * against the two thresholds into `match` / `possible` /
    * `non_match` — the decision-theoretic frame the [[linkPairs]]
    * family's hard edit-distance cut approximates. Weight is rounded
    * to 6 digits BEFORE classification so the decision is
    * reproducible across engines (log2 tails differ ~1e-12 between
    * libm implementations).
    *
    * Scale shape: a pure per-row projection over the already-bounded
    * candidate-pair frame — the expensive part of linkage stays the
    * blocking, exactly where [[linkPairs]]' caps bound it. Output:
    * input columns + (weight, decision). */
  def fellegiSunter(pairs: DataFrame, fields: Seq[FsField],
      upper: Double, lower: Double): DataFrame = {
    require(fields.nonEmpty, "need at least one comparison field")
    requireFreeColumns(pairs)
    require(upper >= lower, s"need upper >= lower, got $upper < $lower")
    fields.foreach { f =>
      require(f.m > 0 && f.m < 1 && f.u > 0 && f.u < 1 && f.m > f.u,
        s"field ${f.name}: need 0 < u < m < 1, got m=${f.m} u=${f.u}")
    }
    val w = fields.map { f =>
      when(f.agree, log2(lit(f.m / f.u)))
        .otherwise(log2(lit((1 - f.m) / (1 - f.u))))
    }.reduce(_ + _)
    pairs.withColumn("weight", round(w, 6))
      .withColumn("decision",
        when(col("weight") >= upper, lit("match"))
          .when(col("weight") <= lower, lit("non_match"))
          .otherwise(lit("possible")))
  }

  /** UNSUPERVISED Fellegi–Sunter: estimate the model parameters
    * `(p, m_i, u_i)` by EM (Winkler's formulation) and score in one
    * call — the estimation step [[fellegiSunter]] assumes done
    * offline. The trick that makes EM scale-correct: the likelihood
    * depends on candidate pairs ONLY through their agreement-pattern
    * counts — `2^k` integers for `k` fields — so one aggregation
    * reduces the pair frame to a bounded sufficient statistic and the
    * EM loop runs driver-side on 8 numbers, identically at 1 GB or
    * 100 TB. NULL comparisons count as disagreement, as in
    * [[fellegiSunter]].
    *
    * Determinism/oracle contract: the iteration arithmetic is written
    * in a FIXED operation order (patterns ascending, fields
    * ascending, left-associated sums) and parameters are clamped to
    * `(1e-6, 1−1e-6)` — the q176 oracle replays the identical
    * recurrence in a recursive CTE, so the learned parameters (and
    * therefore every weight) are bit-reproducible across engines up
    * to the final 6-digit weight rounding.
    *
    * Output: input columns + (weight, decision) — weights
    * `log2(m_i/u_i)` / `log2((1−m_i)/(1−u_i))` under the LEARNED
    * parameters, classified against the thresholds on the rounded
    * weight. No `m > u` precondition: a field EM finds uninformative
    * simply contributes a near-zero weight. */
  def fellegiSunterEm(pairs: DataFrame, fields: Seq[(String, Column)],
      iters: Int = 20, upper: Double = 4.0, lower: Double = 0.0,
      initP: Double = 0.1, initM: Double = 0.8,
      initU: Double = 0.1): DataFrame = {
    val k = fields.size
    require(k >= 1 && k <= 16, s"need 1..16 comparison fields, got $k")
    require(iters >= 1, s"need at least one EM iteration, got $iters")
    requireFreeColumns(pairs)
    val flagCols = fields.zipWithIndex.map { case ((_, c), i) =>
      coalesce(c, lit(false)).as(s"__g$i")
    }
    // materialized once: both the pattern aggregation (EM's sufficient
    // statistic) and the final scoring read this frame — without the
    // truncation the whole upstream candidate pipeline (blocking +
    // verification) would execute twice
    val flagged = Checkpoints.truncate(
      pairs.select(pairs.columns.map(col) ++ flagCols: _*))
    // the bounded sufficient statistic: one count per agreement pattern
    val counts = new Array[Long](1 << k)
    flagged.groupBy((0 until k).map(i => col(s"__g$i")): _*).count()
      .collect().foreach { r =>
        val mask = (0 until k).foldLeft(0) { (acc, i) =>
          acc | (if (r.getBoolean(i)) 1 << i else 0)
        }
        counts(mask) = r.getLong(k)
      }
    // EM on the pattern counts — fixed operation order (see doc)
    def clamp(x: Double): Double =
      math.max(math.min(x, 1 - 0.000001), 0.000001)
    var p = initP
    val m = Array.fill(k)(initM)
    val u = Array.fill(k)(initU)
    val nn = {
      var s = 0.0
      var g = 0
      while (g < (1 << k)) { s += counts(g).toDouble; g += 1 }
      s
    }
    // an empty candidate frame would drive sw/nn to 0/0 — leave the
    // init parameters untouched (the scored output is empty anyway,
    // but NaN model parameters must never escape into the literals)
    for (_ <- 0 until iters if nn > 0) {
      val w = new Array[Double](1 << k)
      var g = 0
      while (g < (1 << k)) {
        var pm = p
        var pu = 1 - p
        var i = 0
        while (i < k) {
          if (((g >> i) & 1) == 1) { pm *= m(i); pu *= u(i) }
          else { pm *= (1 - m(i)); pu *= (1 - u(i)) }
          i += 1
        }
        w(g) = pm / (pm + pu)
        g += 1
      }
      var sw = 0.0
      g = 0
      while (g < (1 << k)) { sw += counts(g) * w(g); g += 1 }
      var i = 0
      while (i < k) {
        var nm = 0.0
        var nu = 0.0
        g = 0
        while (g < (1 << k)) {
          if (((g >> i) & 1) == 1) {
            nm += counts(g) * w(g)
            nu += counts(g) * (1 - w(g))
          }
          g += 1
        }
        m(i) = clamp(nm / sw)
        u(i) = clamp(nu / (nn - sw))
        i += 1
      }
      p = clamp(sw / nn)
    }
    // score under the learned parameters
    def lg2(x: Double): Double = math.log(x) / math.log(2.0)
    val wCol = fields.zipWithIndex.map { case (_, i) =>
      when(col(s"__g$i"), lit(lg2(m(i) / u(i))))
        .otherwise(lit(lg2((1 - m(i)) / (1 - u(i)))))
    }.reduce(_ + _)
    flagged.withColumn("weight", round(wCol, 6))
      .withColumn("decision",
        when(col("weight") >= upper, lit("match"))
          .when(col("weight") <= lower, lit("non_match"))
          .otherwise(lit("possible")))
      .drop((0 until k).map(i => s"__g$i"): _*)
  }

  /** The FS scorers APPEND `weight`/`decision` (and EM internally uses
    * `__g<i>` flags): a caller's same-named input columns would be
    * silently shadowed/overwritten — refuse loudly instead. */
  private def requireFreeColumns(pairs: DataFrame): Unit = {
    val clash = pairs.columns.filter(c =>
      c == "weight" || c == "decision" || c.matches("__g\\d+"))
    require(clash.isEmpty,
      s"input pair frame already has reserved column(s) ${clash.mkString(", ")} " +
        "(weight/decision/__g<i> are produced by the Fellegi-Sunter scorers); " +
        "rename them first")
  }

  /** End-to-end entity resolution: linked pairs → transitive
    * connected components → entity id (the minimum member id — the
    * canonical survivor). Every record that enters blocking gets a
    * row; unlinked records are their own entity. `maxIter` bounds the
    * label-propagation rounds (component DIAMETER halves each round —
    * the default covers diameters to ~2^10; deep gradually-mutating
    * key chains that need the oracle's exact closure pass more).
    * Output: (idCol, entity_id, n_members). */
  def resolveEntities(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, keyWidth: Int = 64, blockWidth: Int = 8,
      blockCap: Int = 1000, maxIter: Int = 10): DataFrame = {
    val pairs = linkPairs(df, idCol, strCol, maxDist, keyWidth, blockWidth,
        blockCap)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val comps = Dedup.nearDupComponents(pairs, maxIter)
      .withColumnRenamed("id", idCol)
    df.where(length(col(strCol)) >= 2 * blockWidth)
      .select(col(idCol))
      .join(comps, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("entity_id"))
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy(col("entity_id"))))
  }

  /** Every within-block candidate pair scored with BOTH native
    * string-similarity expressions ([[graft.expressions.JaroWinkler]]
    * + [[graft.expressions.DamerauLevenshtein]]) — the verify stage
    * laid bare, for callers that bring their own blocking key (the
    * principled key generators live in [[linkPairs]]/
    * [[sortedNeighborhood]]). One equi-shuffle on the block key, then
    * a codegen'd scoring pass; the half-matrix via `id_a < id_b`.
    * SCALE CONTRACT: the block key's cardinality must grow with the
    * data — a constant-cardinality key makes each block quadratic
    * (use the capped generators above when keys can run hot). */
  def fuzzyScoredPairs(df: DataFrame, blockCol: String, idCol: String,
      strCol: String): DataFrame = {
    val a = df.select(col(blockCol).as("block"), col(idCol).as("id_a"),
      col(strCol).as("__sa"))
    val b = df.select(col(blockCol).as("block"), col(idCol).as("id_b"),
      col(strCol).as("__sb"))
    a.join(b, Seq("block"))
      .where(col("id_a") < col("id_b"))
      .select(col("block"), col("id_a"), col("id_b"),
        graft.expressions.StringSimilarity
          .jaroWinkler(col("__sa"), col("__sb")).as("jw"),
        graft.expressions.StringSimilarity
          .damerauLevenshtein(col("__sa"), col("__sb")).as("dl"))
  }
}
