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
  * shuffles on its block key (bounded buckets for any reasonable key
  * distribution — a degenerate constant prefix is the caller's signal
  * to pick a sharper blocker, the standard record-linkage contract).
  * The verify filter runs inside the join stage, and the transitive
  * closure reuses [[Dedup.nearDupComponents]]'s O(log n)-round
  * checkpointed label propagation.
  */
object Linkage {

  /** Verified linked pairs: (id_a, id_b, dist), id_a < id_b, over the
    * normalized comparison key `lower(substr(strCol, 1, keyWidth))`.
    * Two blocking passes (first / last `blockWidth` characters of the
    * key); records shorter than `2·blockWidth` characters are dropped
    * (no stable block key — a degenerate record, not a linkable one). */
  def linkPairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, keyWidth: Int = 64, blockWidth: Int = 8): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    require(blockWidth >= 1 && keyWidth >= 2 * blockWidth,
      s"need keyWidth >= 2*blockWidth, got $keyWidth/$blockWidth")
    val recs = df.where(length(col(strCol)) >= 2 * blockWidth)
      .select(col(idCol).as("__id"),
        lower(substring(col(strCol), 1, keyWidth)).as("__name"))
    // multi-pass blocking: prefix pass + suffix pass, tagged so the
    // two passes' blocks never collide
    val blocks = recs
      .withColumn("__blk",
        concat(lit("p:"), substring(col("__name"), 1, blockWidth)))
      .unionByName(recs.withColumn("__blk",
        concat(lit("s:"), substring(col("__name"), -blockWidth, blockWidth))))
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

  /** End-to-end entity resolution: linked pairs → transitive
    * connected components → entity id (the minimum member id — the
    * canonical survivor). Every record that enters blocking gets a
    * row; unlinked records are their own entity. Output:
    * (idCol, entity_id, n_members). */
  def resolveEntities(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, keyWidth: Int = 64, blockWidth: Int = 8): DataFrame = {
    val pairs = linkPairs(df, idCol, strCol, maxDist, keyWidth, blockWidth)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val comps = Dedup.nearDupComponents(pairs)
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
