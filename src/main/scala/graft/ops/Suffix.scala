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
  * its extensions). A round at span h orders tied suffixes by the pair
  * (rank of first h chars, rank of next h chars) — the doubling
  * invariant — but refinement is TIE-ONLY (Larsson & Sadakane 1999):
  * head ranks give each tied group the closed band [r, r+g−1], so a
  * round touches only still-tied positions, a frame that collapses
  * geometrically for natural text, never the whole corpus.
  *
  * No global-order window anywhere: the seed ranks k0-prefixes with
  * per-(2-char-bucket) windows + broadcast bucket offsets (the
  * two-phase [[Sampling.epochPositions]] shape), in-loop refinement
  * partitions by the (small) tied group, and the final dense
  * compression buckets distinct head ranks by `r·256/(n+1)`. The only
  * order-without-partition windows run over the bounded bucket-offset
  * frames. Driver state: two bounded scalars (total suffix count, max
  * doc length) + one active/changed count per round.
  */
object Suffix {

  private def fresh(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(c).as(c)).toIndexedSeq: _*)

  /** (id, pos, rank): 1-based char positions, dense 1-based global
    * ranks over suffix strings. Empty/NULL texts contribute nothing.
    *
    * `finishBudgetChars` caps the one-shot finishing pass (below):
    * once the still-tied set could materialize at most that many
    * suffix characters (active × longest doc — an upper bound), the
    * remaining groups are ranked directly by their full suffix
    * strings in one partitioned, spill-safe sort instead of further
    * doubling rounds. The default (16 Gi chars) keeps the pass a
    * bounded fraction of any corpus big enough to exceed it; at true
    * 100 TB scale the active set after the seed is far larger, and
    * the doubling loop below (whose per-round cost is two
    * corpus-frame joins + a tied-frame window) is the path that
    * runs — set the budget to 0 to force it.
    *
    * Refinement schedule (Larsson & Sadakane 1999, "Faster suffix
    * sorting"): the iterating rank is the HEAD rank (1 + count of
    * strictly-smaller suffixes), so a tied group of size g owns the
    * closed band [r, r+g-1] and can be refined IN PLACE — new rank =
    * r + (within-group rank by partner rank) − 1 — without touching
    * any other group. Each round therefore processes ONLY the
    * still-tied positions (a frame that collapses geometrically for
    * natural text), not the whole corpus; the full frame is updated
    * by a join against the (small, AQE-broadcast) changed set. The
    * loop exits as soon as a round changes nothing: if no group
    * splits at span h, the h-prefix partition is closed under
    * h-shift refinement and, by induction, under every longer span —
    * so rounds are bounded by log(longest repeated substring), not
    * log(longest document). Dense ranks are produced by one final
    * two-phase compression of the distinct head ranks (bucket by
    * `r·256/(n+1)`, monotone in r; per-bucket `row_number` +
    * broadcast bucket offsets — never a global-order window). */
  def suffixRanks(docs: DataFrame, idCol: String, textCol: String,
      finishBudgetChars: Long = 16L << 30): DataFrame = {
    val txt = docs
      .where(col(textCol).isNotNull && length(col(textCol)) >= 1)
      .select(col(idCol).as("id"), col(textCol).as("t"))
    // seed span: string order on the k0-prefix IS the suffix order
    // at k0 granularity (a shorter remainder compares before its
    // extensions). 32 chars resolves all but genuinely-repeated
    // spans in one pass for natural text (an 8-char seed leaves a
    // small-vocabulary corpus ~100% tied — word-level repetition
    // dominates below a few words); the cost is a one-round k0×
    // string amplification, linear and local to the seed.
    val k0 = 32L
    // bounded driver statistics: corpus char count + longest doc
    val stats = txt.agg(sum(length(col("t"))).as("n"),
      max(length(col("t"))).as("m")).head()
    val n = stats.getLong(0)
    val maxLen = stats.getInt(1)
    // round 0: HEAD rank of each position's k0-prefix, computed
    // DIRECTLY on the position frame (no distinct + join-back):
    // bucket by the first two chars (a prefix of the sort key, so
    // bucket order is consistent), rank() within bucket (+ peer
    // count from the same window spec — one sort pass), broadcast
    // bucket offsets. rank() keeps equal prefixes tied and yields
    // the head rank: 1 + count of strictly smaller.
    // read by both the window branch and the offsets branch — NOT
    // persisted: recomputing the prefix explode is linear and
    // memory-free, while unrolling a corpus-positions cache block is
    // exactly what dies first on a bounded executor heap at 100×.
    // [[graft.expressions.SuffixPrefixes]] materializes every
    // position's k0-prefix in ONE byte walk per document — the
    // composed explode(sequence)+substring(t, pos, k0) form re-walked
    // the string from byte zero per row to locate char offset `pos`
    // (O(L²) char steps/doc; ~2 s of the sf0.1 seed, paid twice).
    val base = txt
      .select(col("id"), posexplode(
        graft.expressions.SuffixPrefixes(col("t"), k0.toInt)))
      .select(col("id"), (col("pos") + 1).as("pos"), col("col").as("c"))
      .withColumn("__b", substring(col("c"), 1, 2))
    val wSeed = Window.partitionBy(col("__b")).orderBy(col("c"))
    // offsets need only the 2-char bucket of each position — a
    // dedicated slim explode of 2-char prefixes, NOT a reuse of
    // `base`: recomputing the k0-char prefix for a count is a k0/2×
    // wider materialization than the count needs
    val offs0 = txt
      .select(explode(
        graft.expressions.SuffixPrefixes(col("t"), 2)).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(
        Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__b", "__off")
    val seeded = Checkpoints.truncate(base
      .withColumn("__rk", rank().over(wSeed).cast("long"))
      .withColumn("__g", count(lit(1)).over(
        wSeed.rangeBetween(Window.currentRow, Window.currentRow)))
      .join(broadcast(offs0), "__b")
      .select(col("id"), col("pos"), (col("__off") + col("__rk")).as("r"),
        col("__g")))
    var s = seeded.select("id", "pos", "r")
    // active set: members of groups still tied after the seed round
    var tied = Checkpoints.truncate(
      seeded.where(col("__g") >= 2).select("id", "pos", "r"))
    var h = k0
    var active = tied.count()
    // One-shot finish: once the active set is small enough that its
    // FULL suffix strings fit the char budget (active × longest
    // doc, an upper bound), rank each surviving group directly by
    // its materialized suffixes — exact (no cap: docs bound suffix
    // length), and it replaces every remaining doubling round with
    // one partitioned sort. At 100 TB the doubling loop below is the
    // guard: it runs only while the active set is genuinely huge.
    while (h < maxLen && active > 0) {
      // division, not multiplication: `active * maxLen` overflows Long
      // at extreme corpus sizes (1e12 positions x 1e7 chars) and a
      // negative product would wrongly take the one-shot finish path
      // this budget exists to prevent (maxLen >= 1: length filter above)
      if (active <= finishBudgetChars / maxLen) {
        // only the active docs' texts travel (broadcast-semi prune:
        // the full corpus is scanned, never shuffled)
        val docsNeeded = txt.join(broadcast(tied.select("id").distinct()),
          Seq("id"), "left_semi")
        val paired = tied.hint("merge").join(docsNeeded, Seq("id"))
          .select(col("id"), col("pos"), col("r"),
            expr("substring(t, pos)").as("__suf"))
        val wGrp = Window.partitionBy(col("r")).orderBy(col("__suf"))
        val refined = Checkpoints.truncate(paired
          .withColumn("nr", col("r") + rank().over(wGrp).cast("long") - 1L)
          .select("id", "pos", "nr"))
        val next = Checkpoints.truncate(
          s.hint("merge").join(refined, Seq("id", "pos"), "left")
            .select(col("id"), col("pos"),
              coalesce(col("nr"), col("r")).as("r")))
        Checkpoints.free(s); Checkpoints.free(tied); Checkpoints.free(refined)
        s = next
        active = 0
      } else {
        // partner rank: the suffix at pos+h (0 past the end — shorter
        // sorts first, matching string order on a proper prefix);
        // looked up in the FULL frame, but only for active positions
        val partner = fresh(s).select(col("id"),
          (col("pos") - h).as("pos"), col("r").as("r2"))
        val paired = tied.hint("merge")
          .join(partner, Seq("id", "pos"), "left")
          .withColumn("r2", coalesce(col("r2"), lit(0L)))
        // in-band refinement: groups (sharing r) are small — the
        // duplicates of one h-prefix — so the partitioned window is
        // safe; rank() keeps equal partners tied
        val wGrp = Window.partitionBy(col("r")).orderBy(col("r2"))
        val refined = Checkpoints.truncate(paired
          .withColumn("nr", col("r") + rank().over(wGrp).cast("long") - 1L)
          // peer count from the SAME window spec — one sort pass, no
          // second shuffle on (r, r2)
          .withColumn("__g", count(lit(1)).over(
            wGrp.rangeBetween(Window.currentRow, Window.currentRow))))
        val changed = refined.where(col("nr") =!= col("r")).count()
        if (changed == 0) {
          // closure: no split at span h ⇒ none at any longer span
          Checkpoints.free(refined)
          active = 0
        } else {
          val next = Checkpoints.truncate(
            s.hint("merge")
              .join(refined.select(col("id"), col("pos"), col("nr")),
                Seq("id", "pos"), "left")
              .select(col("id"), col("pos"),
                coalesce(col("nr"), col("r")).as("r")))
          val nextTied = Checkpoints.truncate(
            refined.where(col("__g") >= 2)
              .select(col("id"), col("pos"), col("nr").as("r")))
          Checkpoints.free(s); Checkpoints.free(tied); Checkpoints.free(refined)
          s = next
          tied = nextTied
          active = tied.count()
          h *= 2
        }
      }
    }
    // dense compression of the surviving head ranks, two-phase and
    // FUSED onto the rank frame itself: dense_rank within the
    // (monotone-in-r) bucket + broadcast per-bucket distinct-count
    // offsets — one window sort of the frame, no distinct
    // intermediate and no join-back (the former distinct + merge
    // join paid a second corpus-frame sort for nothing)
    val s2 = s.withColumn("__b", (col("r") * 256L / (n + 1L)).cast("long"))
    val wLoc = Window.partitionBy(col("__b")).orderBy(col("r"))
    val offs = s2.groupBy("__b")
      .agg(countDistinct(col("r")).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(
        Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__b", "__off")
    s2.withColumn("__dr", dense_rank().over(wLoc).cast("long"))
      .join(broadcast(offs), "__b")
      .select(col("id"), col("pos"), (col("__off") + col("__dr")).as("rank"))
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
