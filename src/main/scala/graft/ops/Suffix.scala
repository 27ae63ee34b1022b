package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.Checkpoints

/** Distributed suffix-array construction by prefix doubling (Manber &
  * Myers 1990) — the index under exact longest-repeated-substring and
  * substring-dedup analyses (the gram-hash spans of [[Dedup]] q127 are
  * the probabilistic cousin; this is the exact structure).
  *
  * Every suffix (doc, pos) receives its DENSE rank in the global
  * lexicographic order of suffix STRINGS (identical suffixes — same
  * text in different docs — share a rank; a proper prefix sorts before
  * its extensions). No suffix string is ever materialized beyond
  * single characters: round k orders by the pair
  * (rank of first 2^(k-1) chars, rank of next 2^(k-1) chars), so
  * ceil(log2 maxLen) rounds of joins + rank reassignments over the
  * (corpus-chars)-sized frame build the full order — the classic
  * O(n log n) schedule, expressed as Spark shuffles.
  *
  * Rank reassignment never uses a global-order window: distinct
  * (r, r2) pairs bucket by `r·256/(n+1)` (monotone in the pair order),
  * rank = per-bucket `row_number` + broadcast bucket offsets (the
  * two-phase [[Sampling.epochPositions]] shape); the only
  * order-without-partition windows run over the ≤256-row offset frame
  * and the alphabet-sized round-0 character frame. Driver state: two
  * bounded scalars (total suffix count, max doc length) + one
  * convergence count per round.
  */
object Suffix {

  private def fresh(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(c).as(c)).toIndexedSeq: _*)

  /** (id, pos, rank): 1-based char positions, dense 1-based global
    * ranks over suffix strings. Empty/NULL texts contribute nothing. */
  def suffixRanks(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val txt = docs
      .where(col(textCol).isNotNull && length(col(textCol)) >= 1)
      .select(col(idCol).as("id"), col(textCol).as("t"))
    // seed with 8-char prefix ranks (vs single chars): string order
    // on the k0-prefix IS the suffix order at k0 granularity (a
    // shorter remainder compares before its extensions), and it cuts
    // three doubling rounds off the schedule
    val k0 = 8L
    val base = Checkpoints.truncate(txt
      .withColumn("pos", explode(sequence(lit(1), length(col("t")))))
      .select(col("id"), col("pos"),
        expr(s"substring(t, pos, $k0)").as("c")))
    // bounded driver statistics: corpus char count + longest doc
    val stats = txt.agg(sum(length(col("t"))).as("n"),
      max(length(col("t"))).as("m")).head()
    val n = stats.getLong(0)
    val maxLen = stats.getInt(1)
    // round 0: dense k0-gram ranks, two-phase (first char = the
    // monotone block; offsets over the alphabet-sized count frame)
    val keys = base.select("c").distinct()
      .withColumn("__b", substring(col("c"), 1, 1))
    val wKey = Window.partitionBy(col("__b")).orderBy(col("c"))
    val loc0 = keys.withColumn("__rn", row_number().over(wKey).cast("long"))
    val off0 = loc0.groupBy("__b").agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(
        Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__b", "__off")
    val keyRanks = loc0.join(broadcast(off0), "__b")
      .select(col("c"), (col("__off") + col("__rn")).as("r"))
    var s = Checkpoints.truncate(
      base.join(keyRanks, "c").select("id", "pos", "r"))
    var h = k0
    var distinctRanks = 0L
    while (h < maxLen && distinctRanks < n) {
      // partner rank: the suffix at pos+h (0 past the end — shorter
      // sorts first, matching string order on a proper prefix)
      val partner = fresh(s).select(col("id"),
        (col("pos") - h).as("pos"), col("r").as("r2"))
      val paired = s.join(partner, Seq("id", "pos"), "left")
        .withColumn("r2", coalesce(col("r2"), lit(0L)))
      // dense rank of the distinct (r, r2) pairs, two-phase
      val pairs = paired.select("r", "r2").distinct()
        .withColumn("__b", (col("r") * 256L / (n + 1L)).cast("long"))
      val wLoc = Window.partitionBy(col("__b"))
        .orderBy(col("r"), col("r2"))
      val loc = pairs
        .withColumn("__rn", row_number().over(wLoc).cast("long"))
      val offs = loc.groupBy("__b").agg(count(lit(1)).as("__c"))
        .withColumn("__off", coalesce(sum(col("__c")).over(
          Window.orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("__b", "__off")
      val ranked = loc.join(broadcast(offs), "__b")
        .select(col("r"), col("r2"), (col("__off") + col("__rn")).as("nr"))
      val next = Checkpoints.truncate(
        paired.join(ranked, Seq("r", "r2"))
          .select(col("id"), col("pos"), col("nr").as("r")))
      Checkpoints.free(s)
      s = next
      // dense ranks: max rank == number of distinct ranks (bounded
      // scalar per round, read from the just-materialized frame)
      distinctRanks = s.agg(max(col("r"))).head().getLong(0)
      h *= 2
    }
    Checkpoints.free(base)
    s.withColumnRenamed("r", "rank")
  }

  /** Longest repeated substring(s): the maximal LCP over rank-adjacent
    * suffix pairs (a classic suffix-array corollary — every repeated
    * substring is a prefix of two rank-adjacent suffixes). Each rank
    * keeps one representative (equal-rank suffixes are IDENTICAL
    * strings, so any member yields the same LCP — a duplicated rank is
    * itself a full-suffix repeat). Per adjacent pair, lcp =
    * [[graft.expressions.CommonPrefixLen]] of the two (maxProbe-capped)
    * suffix prefixes — a codegen'd primitive loop; suffix strings are
    * materialized only to the cap, never whole. Output: top `k` by
    * (lcp desc, substring) as (lcp, repeat, id, pos, nid, npos). */
  def longestRepeats(docs: DataFrame, idCol: String, textCol: String,
      k: Int, maxProbe: Int = 200): DataFrame = {
    val ranks = suffixRanks(docs, idCol, textCol)
    val txt = docs.select(col(idCol).as("id"), col(textCol).as("t"))
    val reps = ranks.groupBy(col("rank"))
      .agg(min(struct(col("id"), col("pos"))).as("__rep"),
        count(lit(1)).as("__dup"))
      .select(col("rank"), col("__rep.id").as("id"),
        col("__rep.pos").as("pos"), col("__dup"))
    val nxt = fresh(reps).select((col("rank") - 1).as("rank"),
      col("id").as("nid"), col("pos").as("npos"))
    val prefA = substring(expr("substring(t, pos)"), 1, maxProbe)
    val prefB = substring(expr("substring(nt, npos)"), 1, maxProbe)
    val adjacent = reps.join(nxt, Seq("rank"))
      .join(txt, Seq("id"))
      .join(fresh(txt).select(col("id").as("nid"), col("t").as("nt")),
        Seq("nid"))
      .withColumn("__a", prefA)
      .withColumn("lcp",
        graft.expressions.CommonPrefixLen(col("__a"), prefB))
    // a duplicated rank is a repeat of the WHOLE suffix (capped)
    val selfDup = reps.where(col("__dup") >= 2)
      .join(txt, Seq("id"))
      .withColumn("__a", prefA)
      .withColumn("lcp", length(col("__a")).cast("long"))
      .withColumn("nid", col("id")).withColumn("npos", col("pos"))
    adjacent.select(col("lcp"), col("__a"), col("id"), col("pos"),
        col("nid"), col("npos"))
      .unionByName(selfDup.select(col("lcp"), col("__a"), col("id"),
        col("pos"), col("nid"), col("npos")))
      .where(col("lcp") >= 1)
      .withColumn("repeat", substring(col("__a"), 1, maxProbe)
        .substr(lit(1), col("lcp").cast("int")))
      .select("lcp", "repeat", "id", "pos", "nid", "npos")
      .orderBy(col("lcp").desc, col("repeat"), col("id"), col("pos"))
      .limit(k)
  }
}
