package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Distributed k-means (Lloyd's algorithm) over an embedding column —
  * the clustering primitive behind corpus curation (topic bucketing,
  * SemDeDup cell refinement, per-cluster sampling quotas).
  *
  * Scale shape, per iteration:
  *  - ASSIGN: the centroid table collapses to one broadcast row and
  *    each corpus vector folds over it in place
  *    ([[Similarity.assignTo]]) — the corpus is never shuffled and no
  *    corpus×centroids row set ever exists.
  *  - UPDATE: per-cell per-dimension means via `posexplode` +
  *    two-level aggregation. The explode is narrow and partial (map
  *    side) aggregation combines within each partition first, so the
  *    shuffle carries only |partitions| × k × dim partial sums — NOT
  *    |corpus| × dim rows. At 100 TB the corpus is scanned once per
  *    iteration and the shuffled bytes stay O(k·dim) per partition.
  *
  * Determinism (the cross-engine gate contract): initial centroids are
  * a deterministic stride sample; distances are rounded to 9 digits
  * before the argmin with cent_id as tie-break (strict `<` over a
  * cent_id-sorted fold); recomputed means are rounded to 6 digits
  * before the next assignment. A cell that loses all members simply
  * drops out (standard Lloyd behavior), which both engines reproduce.
  */
object Cluster {

  /** Per-cell mean vectors of an assignment (`target_id, tv, st,
    * cent_id` as produced by [[Similarity.assignTo]]), rounded to 6
    * digits, with the self-dot precomputed: the next iteration's
    * centroid table `(cent_id, cv, sc)`. */
  private def meanCentroids(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cent_id"), posexplode(col("tv")).as(Seq("pos", "v")))
      .groupBy("cent_id", "pos")
      .agg(round(sum(col("v").cast("double")) / count(lit(1)), 6).as("m"))
      .groupBy("cent_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cent_id"), transform(col("pm"), x => x.getField("m")).as("cv"))
      .withColumn("sc", dot(col("cv"), col("cv")))

  /** `iters` Lloyd updates from a stride-sampled start; returns the
    * final assignment `(id, cent_id, dist)` under the last recomputed
    * centroids (dist = squared L2, rounded to 6 for output). The
    * centroid table is tiny (k rows) and is cached each iteration so
    * the lineage through `iters` plans re-reads the corpus, not the
    * whole prior iteration chain. */
  def kmeans(emb: DataFrame, idCol: String, vecCol: String,
      centroidStride: Int = 32, iters: Int = 2): DataFrame = {
    var cents = Similarity.ivfCentroids(emb, idCol, vecCol, centroidStride)
    for (_ <- 1 to iters) {
      val assigned = Similarity.assignTo(emb, idCol, vecCol, cents)
      cents = meanCentroids(assigned).cache()
    }
    Similarity.assignTo(emb, idCol, vecCol, cents)
      .select(col("target_id").as(idCol), col("cent_id"),
        round(col("cdist"), 6).as("dist"))
  }

  /** Cluster sizes and mean within-cluster distance of an assignment —
    * the convergence/balance diagnostic. */
  def clusterStats(assignment: DataFrame): DataFrame =
    assignment.groupBy("cent_id")
      .agg(count(lit(1)).as("n"), round(avg(col("dist")), 6).as("mean_dist"))

  /** Simplified silhouette per cluster (Hruschka et al.'s
    * centroid-based variant of Rousseeuw 1987): for each point,
    * a = distance to its own centroid, b = distance to the nearest
    * OTHER centroid, s = (b − a) / max(a, b); since a ≤ b by
    * construction this is (b − a) / b, with s = 0 when both are 0.
    * The standard cluster-quality check after [[kmeans]] /
    * [[prototypicalityPrune]] — full silhouette needs all pairwise
    * point distances (quadratic, impossible at 100 TB); the
    * simplified form needs only point×centroid distances.
    *
    * Scale shape: ONE broadcast fold over the sorted centroid array
    * tracking the two smallest rounded distances (the [[Similarity]]
    * assignment posture — the corpus never shuffles for scoring, and
    * no corpus×centroids frame ever exists); the only shuffle is the
    * final k-row aggregation. Distances round at 9 before comparison,
    * ties to the smaller cent_id; s rounds at 6 before averaging.
    * The cluster mean is then computed in integer MICRO-UNITS with
    * explicit half-away-from-zero rounding — `ROUND(AVG(s), 6)` is
    * nondeterministic across engines whenever the exact mean of the
    * 6-decimal s values lands on a digit-7 half (float sum order
    * decides the side); integer arithmetic cannot straddle.
    * Output: cent_id, n, mean_silhouette (6 decimals, bit-exact). */
  def silhouette(emb: DataFrame, idCol: String, vecCol: String,
      centroidStride: Int = 32): DataFrame = {
    val centsArr = Similarity.ivfCentroids(emb, idCol, vecCol, centroidStride)
      .agg(array_sort(collect_list(struct(col("cent_id"), col("cv"),
        col("sc")))).as("__cents"))
    val init = struct(lit(Double.MaxValue).as("d1"),
      lit(null).cast("bigint").as("cent_id"),
      lit(Double.MaxValue).as("d2"))
    val best2 = aggregate(col("__cents"), init, (acc, c) => {
      val d = round(col("st") - lit(2.0) * dot(col("tv"), c.getField("cv"))
        + c.getField("sc"), 9)
      when(d < acc.getField("d1"),
        struct(d.as("d1"),
          c.getField("cent_id").cast("bigint").as("cent_id"),
          acc.getField("d1").as("d2")))
        .when(d < acc.getField("d2"),
          struct(acc.getField("d1").as("d1"), acc.getField("cent_id")
            .as("cent_id"), d.as("d2")))
        .otherwise(acc)
    })
    // alias the fold ONCE before extracting fields — extracting three
    // fields from the raw expression re-evaluates the whole centroid
    // fold three times per row (CollapseProject inlines cheap aliases
    // but keeps a multi-referenced non-cheap one like this aggregate)
    val scored = emb.select(col(idCol).as("target_id"), col(vecCol).as("tv"))
      .withColumn("st", dot(col("tv"), col("tv")))
      .join(broadcast(centsArr), lit(true)) // 1-row nested-loop broadcast
      .select(col("target_id"), best2.as("__best"))
      .select(col("target_id"), col("__best.cent_id").as("cent_id"),
        sqrt(col("__best.d1")).as("a"), sqrt(col("__best.d2")).as("b"))
      .select(col("target_id"), col("cent_id"),
        when(col("b") === 0, lit(0.0))
          .otherwise(round((col("b") - col("a")) / col("b"), 6)).as("s"))
    scored.groupBy("cent_id")
      .agg(count(lit(1)).as("n"),
        sum(round(col("s") * 1e6).cast("long")).as("__sm"))
      .select(col("cent_id"), col("n"),
        (signum(col("__sm"))
          * floor((lit(10L) * abs(col("__sm")) + lit(5L) * col("n"))
            / (lit(10L) * col("n"))) / lit(1e6)).as("mean_silhouette"))
  }

  /** D4-style prototypicality pruning (Tirumala et al. 2023, "D4:
    * Improving LLM Pretraining via Document De-Duplication and
    * Diversification"): within each cluster, DROP the
    * floor(n · dropFrac) members CLOSEST to the centroid — the most
    * prototypical, least informative examples — and keep the diverse
    * tail. Runs on the stride-deterministic centroids (the
    * [[Similarity.ivfCentroids]] posture), distances rounded to 9
    * before ranking, ties to the smaller id, so the kept set is
    * engine-reproducible.
    *
    * Scale shape: one broadcast-fold assignment pass (corpus never
    * shuffles for assignment) + one window per cluster keyed by
    * cent_id (partition ≈ n/k rows; for pathological cluster sizes
    * swap the rank for a distance-percentile threshold — same
    * contract). Output: idCol, cent_id, cdist, rn (1 = closest
    * survivor after the drop). */
  def prototypicalityPrune(emb: DataFrame, idCol: String, vecCol: String,
      centroidStride: Int = 32, dropFrac: Double = 0.25): DataFrame = {
    require(dropFrac >= 0 && dropFrac < 1,
      s"dropFrac must be in [0, 1), got $dropFrac")
    val assigned = Similarity.assignTo(emb, idCol, vecCol,
      Similarity.ivfCentroids(emb, idCol, vecCol, centroidStride))
    val w = Window.partitionBy(col("cent_id"))
      .orderBy(col("cdist"), col("target_id"))
    assigned
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("cent_id"))))
      .where(col("__rn") > floor(col("__n") * dropFrac))
      .select(col("target_id").as(idCol), col("cent_id"), col("cdist"),
        (col("__rn") - floor(col("__n") * dropFrac)).cast("long").as("rn"))
  }
}
