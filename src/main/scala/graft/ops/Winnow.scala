package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.etl.Checkpoints

import graft.functions.TextFunctions.h32

/** Winnowing document fingerprints — the local fingerprint-selection
  * algorithm of Schleimer, Wilkerson & Aiken, "Winnowing: Local
  * Algorithms for Document Fingerprinting" (SIGMOD 2003; the MOSS
  * plagiarism detector). Complements the global MinHash/SimHash
  * sketches in [[Dedup]]: winnowing selects POSITIONED fingerprints
  * with a coverage guarantee — any substring match of length at least
  * `w + k − 1` characters is caught by at least one shared selected
  * hash — which whole-document sketches cannot promise.
  *
  * Selection rule (the RIGHTMOST-MIN winnowing variant): hash every
  * character k-gram, slide a window of `w` consecutive hashes, and in
  * each window select the minimum hash, breaking ties by RIGHTMOST
  * position; the distinct selected (position, hash) set is the
  * document's fingerprint, with expected density 2/(w+1). (The
  * paper's "robust winnowing" refinement re-selects the PREVIOUS
  * window's selection among ties before falling back to rightmost,
  * emitting strictly fewer fingerprints on repetitive text —
  * available as [[selectedFingerprintsRobust]]; the default
  * rightmost rule keeps the identical coverage guarantee and is the
  * matching grain for [[matchPairs]]' oracle-shared posting keys.)
  *
  * Engine-portable construction: the k-gram hash is the md5-derived
  * [[graft.functions.TextFunctions.h32]] (identical in any engine,
  * unlike engine-private hash functions), and the rightmost-min tie
  * rule is encoded arithmetically — each position packs into the key
  * `h·P − i` (P = 1e6 > any in-document position, ENFORCED — an
  * over-length document raises rather than silently corrupting the
  * packing), so the plain MIN of a key window is the smallest hash
  * with the LARGEST position among ties, and `pos = (−key) mod P`
  * unpacks exactly in 64-bit integer arithmetic on both sides of the
  * oracle gate.
  *
  * Scale shape: selection is ONE narrow per-row projection — the
  * single-traversal [[graft.expressions.WinnowFingerprints]]
  * expression (one byte-copy of the document, primitive `long[]`
  * state, O(N) monotonic-deque window min) — no shuffle; at 100 TB it
  * runs at scan speed. [[selectedFingerprintsFold]] keeps the
  * composed-built-ins reference form (O(N·w) slice-min), asserted
  * bit-equal in WinnowSpec and mirrored by the DuckDB oracle.
  */
object Winnow {

  /** Positions must stay below this modulus for the key packing
    * `h·P − i` to be collision-free; both selection forms RAISE on a
    * document with `length ≥ PosMod + k − 1` (the fold form through a
    * plan-level `raise_error`, the expression directly). For
    * book-length inputs raise P — h < 2^32 keeps `h·P` inside a Long
    * up to P = 2^31. */
  val PosMod = 1000000L

  /** One row per selected fingerprint: (idCol, pos, fp) where `pos` is
    * the 1-based character offset of the selected k-gram and `fp` its
    * 32-bit content hash (position-independent, so equal text spans
    * produce equal `fp` across documents — the match key). Documents
    * shorter than `k + w − 1` characters have no full window and are
    * dropped (winnowing is undefined below one window). */
  def selectedFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame =
    df.select(col(idCol),
        explode(graft.expressions.WinnowFingerprints(
          col(textCol), k, w, PosMod)).as("__s"))
      .select(col(idCol), col("__s.pos").as("pos"), col("__s.fp").as("fp"))

  /** [[selectedFingerprints]] under the paper's ROBUST selection rule
    * (Schleimer et al. §4): ties among minimal hashes prefer the
    * previous window's selection while it remains in the window,
    * falling back to rightmost — strictly fewer selected fingerprints
    * on repetitive text (density still ≥ 1/w), identical coverage
    * guarantee. The cross-window state makes this inexpressible as a
    * composed per-window projection; it lives only in the single-eval
    * expression, and its oracle mirrors the recurrence with a
    * per-document recursive CTE. */
  def selectedFingerprintsRobust(df: DataFrame, idCol: String,
      textCol: String, k: Int = 8, w: Int = 4): DataFrame =
    df.select(col(idCol),
        explode(graft.expressions.WinnowFingerprints.robust(
          col(textCol), k, w, PosMod)).as("__s"))
      .select(col(idCol), col("__s.pos").as("pos"), col("__s.fp").as("fp"))

  /** The composed-built-ins reference form of [[selectedFingerprints]]
    * — the same packed-key construction out of `sequence`/`transform`/
    * `slice`/`array_min`, kept as the spec-asserted mirror of the
    * single-eval expression and of the DuckDB oracle SQL. */
  def selectedFingerprintsFold(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    require(k >= 2, s"k-gram size must be at least 2, got $k")
    require(w >= 1, s"window must be at least 1, got $w")
    val text = col(textCol)
    // enforced packing bound: positions reach length-k+1, which must
    // stay < PosMod — raise in-plan rather than corrupt packed keys
    val nGrams = when(length(text) >= lit(PosMod + k - 1),
        raise_error(concat(lit("winnow: document of "),
          length(text).cast("string"),
          lit(s" chars breaks the h*P-i key packing (P=$PosMod); " +
            "raise posMod"))).cast("int"))
      .otherwise(length(text) - lit(k - 1))
    // pack: smallest hash wins, rightmost position breaks ties
    val keys = transform(sequence(lit(1), nGrams),
      i => h32(text.substr(i, lit(k))) * lit(PosMod) - i)
    val mins = array_distinct(transform(
      sequence(lit(1), size(col("__keys")) - lit(w - 1)),
      s => array_min(slice(col("__keys"), s, lit(w)))))
    val pos = pmod(lit(0L) - col("__m"), lit(PosMod))
    df.where(length(text) >= k + w - 1)
      .select(col(idCol), text.as("__t"), keys.as("__keys"))
      .select(col(idCol), col("__t"), explode(mins).as("__m"))
      .select(col(idCol), pos.as("pos"),
        h32(col("__t").substr(pos.cast("int"), lit(k))).as("fp"))
  }

  /** Candidate duplicate pairs by shared winnowed fingerprints —
    * MOSS-style matching: documents sharing at least `minShared`
    * distinct selected hashes (each capped at document frequency
    * `dfCap`, dropping boilerplate k-grams that would otherwise
    * explode a posting bucket into O(df²) pairs). Output:
    * (doc_a, doc_b, n_shared), doc_a < doc_b.
    *
    * Scale shape: a banded posting join keyed on the fingerprint hash
    * — never all-pairs; the df cap bounds every bucket's pair fan-out,
    * the same skew guard as [[Dedup]]'s boilerplate strip. */
  def matchPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4, dfCap: Int = 20,
      minShared: Int = 15): DataFrame =
    pairsFromFps(selectedFingerprints(df, idCol, textCol, k, w), idCol,
      dfCap, minShared)

  /** [[matchPairs]] over a PRECOMPUTED fingerprint frame
    * ((idCol, pos, fp) rows) — lets [[alignedSpans]] reuse one
    * materialized selection pass for pairing AND position lookup. */
  private def pairsFromFps(fps: DataFrame, idCol: String, dfCap: Int,
      minShared: Int): DataFrame = {
    require(dfCap >= 2, s"dfCap below 2 can never pair, got $dfCap")
    require(minShared >= 1, s"minShared must be positive, got $minShared")
    val capped = fps.select(col(idCol), col("fp")).distinct()
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("fp"))))
      .where(col("__df") <= dfCap).drop("__df")
    capped.select(col(idCol).as("doc_a"), col("fp"))
      .join(capped.select(col(idCol).as("doc_b"), col("fp")), Seq("fp"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** [[matchPairs]] made BIPARTITE — MOSS matching BETWEEN two
    * document sets (a recrawl delta against the standing corpus, a
    * submission batch against the archive): pairs sharing at least
    * `minShared` distinct selected fingerprints, where document
    * frequency is counted ACROSS BOTH SIDES (a hash hot anywhere is
    * boilerplate) and capped at `dfCap`. Left and right never
    * self-join, so intra-side duplicates cost nothing — the
    * [[Dedup.fuzzyJoin]] shape at the winnowing grain, with its
    * positioned-substring coverage guarantee instead of the global
    * Jaccard sketch. Identical ids on the two sides are NOT excluded
    * (the sides are different tables). Output:
    * (left_id, right_id, n_shared). */
  def matchAcross(left: DataFrame, leftId: String, leftText: String,
      right: DataFrame, rightId: String, rightText: String,
      k: Int = 8, w: Int = 4, dfCap: Int = 20,
      minShared: Int = 15): DataFrame = {
    require(dfCap >= 2, s"dfCap below 2 can never pair, got $dfCap")
    require(minShared >= 1, s"minShared must be positive, got $minShared")
    val lf = selectedFingerprints(left, leftId, leftText, k, w)
      .select(col(leftId).as("left_id"), col("fp")).distinct()
    val rf = selectedFingerprints(right, rightId, rightText, k, w)
      .select(col(rightId).as("right_id"), col("fp")).distinct()
    val rare = lf.select(col("fp")).unionByName(rf.select(col("fp")))
      .groupBy(col("fp")).agg(count(lit(1)).as("__df"))
      .where(col("__df") <= dfCap).select(col("fp"))
    lf.join(rare, Seq("fp")).join(rf, Seq("fp"))
      .groupBy(col("left_id"), col("right_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** MOSS-style ALIGNED MATCH SPANS — the report surface behind
    * [[matchPairs]]: for each matched pair, the shared selected
    * fingerprints are grouped by alignment offset (`pos_a − pos_b` —
    * a constant displacement means the same text at a fixed shift in
    * both documents) and split into RUNS wherever consecutive marks
    * sit more than `maxGap` characters apart (winnowing guarantees a
    * selected mark at least every `w` positions inside an intact
    * shared region, so a gap beyond that is a real break — an edit or
    * an unshared stretch). Each output row is a reviewable match:
    * where it starts and ends in doc_a, its displacement in doc_b,
    * and how many selected marks support it; runs with fewer than
    * `minMarks` marks are noise (a lone shared hash) and dropped.
    * Output: (doc_a, doc_b, a_offset, a_start, a_end, n_marks) with
    * `a_end` covering the last k-gram's extent.
    *
    * Scale shape: the pair surface is already bounded by
    * [[matchPairs]]' df cap and position lists join through the same
    * capped posting keys; the run split is two window passes
    * partitioned by (pair, offset) — nothing quadratic beyond the
    * capped join. */
  def alignedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4, dfCap: Int = 20,
      minShared: Int = 15, minMarks: Int = 2, maxGap: Int = 50): DataFrame = {
    require(minMarks >= 1, s"minMarks must be positive, got $minMarks")
    require(maxGap >= 1, s"maxGap must be positive, got $maxGap")
    // ONE selection pass, materialized: pairing and position lookup
    // both read it, instead of re-running the fingerprint expression
    // once per plan branch (the checkpoint is the same bounded frame
    // the posting join shuffles anyway)
    val fps = Checkpoints.truncate(
      selectedFingerprints(df, idCol, textCol, k, w))
    val pairs = pairsFromFps(fps, idCol, dfCap, minShared)
      .select("doc_a", "doc_b")
    // shared (df-capped) fingerprints of qualifying pairs, one row per
    // (pos_a, pos_b) combination — the mark set spans aggregate over
    val rare = fps.select(col(idCol), col("fp")).distinct()
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("fp"))))
      .where(col("__df") <= dfCap)
      .select(col("fp")).distinct()
    val posA = fps.join(rare, Seq("fp"))
      .select(col(idCol).as("doc_a"), col("fp"), col("pos").as("pos_a"))
    val posB = fps.join(rare, Seq("fp"))
      .select(col(idCol).as("doc_b"), col("fp"), col("pos").as("pos_b"))
    val wOff = Window.partitionBy(col("doc_a"), col("doc_b"),
      col("a_offset")).orderBy(col("pos_a"))
    pairs.join(posA, Seq("doc_a")).join(posB, Seq("doc_b", "fp"))
      .select(col("doc_a"), col("doc_b"),
        (col("pos_a") - col("pos_b")).as("a_offset"), col("pos_a"))
      .withColumn("__brk",
        when(col("pos_a") - lag(col("pos_a"), 1).over(wOff) > maxGap, 1)
          .otherwise(0))
      .withColumn("__run", sum(col("__brk")).over(
        wOff.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_a"), col("doc_b"), col("a_offset"), col("__run"))
      .agg(min(col("pos_a")).as("a_start"),
        (max(col("pos_a")) + lit(k - 1)).as("a_end"),
        count(lit(1)).as("n_marks"))
      .where(col("n_marks") >= minMarks)
      .drop("__run")
  }
}
