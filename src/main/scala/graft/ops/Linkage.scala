package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    * pairing (see object doc; audit with [[overCapBlocks]]). */
  def linkPairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, keyWidth: Int = 64, blockWidth: Int = 8,
      blockCap: Int = 1000): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    require(blockWidth >= 1 && keyWidth >= 2 * blockWidth,
      s"need keyWidth >= 2*blockWidth, got $keyWidth/$blockWidth")
    require(blockCap >= 2, s"blockCap below 2 can never pair, got $blockCap")
    // cap: count per block key, keep blocks within the cap — bounds
    // every block's pair fan-out at blockCap^2 regardless of skew
    val blocks = blockTable(df, idCol, strCol, keyWidth, blockWidth)
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__blk"))))
      .where(col("__n") <= blockCap).drop("__n")
    val a = blocks.select(col("__blk"), col("__id").as("id_a"),
      col("__name").as("__na"))
    val b = blocks.select(col("__blk"), col("__id").as("id_b"),
      col("__name").as("__nb"))
    a.join(b, Seq("__blk"))
      .where(col("id_a") < col("id_b"))
      // a pair found by both passes must link once, not twice
      .select(col("id_a"), col("id_b"), col("__na"), col("__nb"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__na"), col("__nb")).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
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

  /** The tagged two-pass block table: (__blk, __id, __name) — prefix
    * pass rows under `p:`, suffix pass under `s:`, so the two passes'
    * blocks never collide. */
  private def blockTable(df: DataFrame, idCol: String, strCol: String,
      keyWidth: Int, blockWidth: Int): DataFrame = {
    val recs = df.where(length(col(strCol)) >= 2 * blockWidth)
      .select(col(idCol).as("__id"),
        lower(substring(col(strCol), 1, keyWidth)).as("__name"))
    recs.withColumn("__blk",
        concat(lit("p:"), substring(col("__name"), 1, blockWidth)))
      .unionByName(recs.withColumn("__blk",
        concat(lit("s:"), substring(col("__name"), -blockWidth, blockWidth))))
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
}
