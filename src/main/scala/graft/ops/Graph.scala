package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.etl.Checkpoints

/** Iterative graph analytics over edge lists — PageRank as the
  * representative fixed-point computation (the connected-components
  * family lives in [[Dedup]]).
  *
  * Scale shape: the heavy work at 100 TB is DERIVING the edge list
  * (fact-table joins + aggregation — each a single shuffle on its
  * key); the rank iteration then touches only |nodes| + |edges| rows.
  * Per iteration: one join of the rank table to the (out-weighted)
  * edge list on `src`, one `groupBy(dst)` partial-aggregated shuffle,
  * one left join back to the node set. The edge list is computed once
  * and cached; each iteration's rank table is EAGERLY
  * localCheckpoint'ed — an iterative DataFrame loop otherwise
  * accumulates an ever-deeper logical plan whose analysis cost grows
  * superlinearly with the iteration count (the same lesson as
  * [[Dedup.connectedComponentsStar]]).
  *
  * Determinism: ranks are rounded to 9 digits each iteration, so
  * per-engine float summation order cannot drift across iterations.
  * Dangling nodes (no out-edges) keep their share of the teleport term
  * but do not redistribute their mass — the standard simplification,
  * mirrored exactly by the oracle.
  */
object Graph {

  /** Weighted PageRank. `nodes`: one column `node`; `edges`:
    * `src, dst, w` (w > 0). Returns `(node, pr)` after `iters`
    * iterations of  pr'(v) = (1-d)/N + d * Σ_{u→v} pr(u) * w_uv / W_u.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame,
      iters: Int = 5, damping: Double = 0.85,
      checkpointEvery: Int = 2): DataFrame = {
    require(checkpointEvery > 0, "checkpointEvery must be positive")
    // N as a broadcast 1-row aggregate, not a driver-side count()
    val n = nodes.agg(count(lit(1)).cast("double").as("__n"))
    val outw = edges.groupBy("src").agg(sum(col("w").cast("double")).as("ow"))
    val e = edges.join(outw, "src")
      .select(col("src"), col("dst"), col("w").cast("double").as("w"), col("ow"))
      .cache()
    var ranks = nodes.join(broadcast(n), lit(true))
      .select(col("node"), (lit(1.0) / col("__n")).as("pr"))
    var prevCkpt: Option[DataFrame] = None
    for (i <- 1 to iters) {
      val contrib = e.join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy("dst").agg(sum(col("pr") * col("w") / col("ow")).as("c"))
        .withColumnRenamed("dst", "node")
      ranks = nodes.join(broadcast(n), lit(true))
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          round((lit(1.0) - lit(damping)) / col("__n")
            + lit(damping) * coalesce(col("c"), lit(0.0)), 9).as("pr"))
      // truncate the iterative lineage every `checkpointEvery` rounds:
      // every round costs an extra eager job; a small bounded plan-depth
      // window between truncations keeps analysis cost flat at half the
      // materializations. The superseded round's blocks are freed as
      // soon as its successor is materialized — only the FINAL
      // checkpoint (what the caller reads) stays pinned.
      if (i % checkpointEvery == 0 || i == iters) {
        ranks = Checkpoints.truncate(ranks)
        prevCkpt.foreach(Checkpoints.free)
        prevCkpt = Some(ranks)
      }
    }
    e.unpersist(false) // final ranks are materialized; edges are dead
    ranks
  }

  /** The nation-level trade graph: an edge supplier-nation →
    * customer-nation per lineitem, aggregated to weights. The 100 TB
    * part of PageRank-over-TPC-H: three fact/dim joins and one
    * aggregation collapse the fact table to a |nations|² edge list.
    * customer/supplier scale WITH the fact table in TPC-H, so their
    * join strategy is left to Catalyst/AQE (broadcast when they fit,
    * shuffled-hash when they don't) rather than forced. */
  def tradeEdges(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame): DataFrame =
    lineitem.select("l_orderkey", "l_suppkey")
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))

  /** Per-node triangle counts over the undirected simple graph induced
    * by `edges` (`src`, `dst`; self-loops dropped, multi-edges and
    * directions collapsed). Output: (node, n_triangles) for nodes in
    * at least one triangle.
    *
    * Degree-oriented node-iterator (the MapReduce-era standard, e.g.
    * Suri & Vassilvitskii 2011): orient every edge from its
    * lower-(degree, id) endpoint to the higher one — a DAG in which
    * each triangle appears as exactly one wedge u→v, u→w plus closing
    * edge v→w. Out-degrees under this orientation are O(√m), so wedge
    * volume is Σ outdeg² ≤ m^1.5 instead of the Σ deg² a hub explodes
    * under the naive orientation — the skew guard that makes the join
    * survive power-law graphs. Three shuffle-on-key joins, one
    * aggregation; per-node counts are orientation-independent (each
    * triangle credits all three corners). */
  def triangles(edges: DataFrame): DataFrame = {
    val und = edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val lower = col("da") < col("db") || (col("da") === col("db")
      && col("a") < col("b"))
    val oriented = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(when(lower, col("a")).otherwise(col("b")).as("u"),
        when(lower, col("b")).otherwise(col("a")).as("v"))
    val wedges = oriented
      .join(oriented.select(col("u").as("v"), col("v").as("w")), "v")
    val tri = wedges.join(oriented.select(col("u"), col("v").as("w")),
      Seq("u", "w"))
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** BFS hop levels from `source` over the directed edge list:
    * (node, lvl) with lvl = the minimum hop count, nodes unreachable
    * within `maxHops` absent. Iterative frontier expansion — each hop
    * is one join of the CURRENT FRONTIER (not the visited set) against
    * the edges plus an anti-join against the visited set; O(diameter)
    * rounds, each checkpoint-truncated (the CC/PageRank lesson). The
    * per-hop emptiness probe is a bounded driver action on the
    * frontier — the loop-control edge, not a data collect. */
  def bfsLevels(edges: DataFrame, source: Long, maxHops: Int): DataFrame = {
    import edges.sparkSession.implicits._
    require(maxHops >= 0, "maxHops must be non-negative")
    var levels = Checkpoints.truncate(Seq((source, 0L)).toDF("node", "lvl"))
    var frontier = levels
    var hop = 1L
    var done = maxHops == 0
    while (!done) {
      val next = Checkpoints.truncate(frontier
        .join(edges, frontier("node") === edges("src"))
        .select(col("dst").as("node")).distinct()
        .join(levels, Seq("node"), "left_anti")
        .withColumn("lvl", lit(hop)))
      if (next.isEmpty) { Checkpoints.free(next); done = true }
      else {
        val grown = Checkpoints.truncate(levels.union(next))
        // grown is materialized: the pre-union levels and the consumed
        // frontier (distinct from levels after round 1) are both dead
        Checkpoints.free(levels)
        if (frontier ne levels) Checkpoints.free(frontier)
        levels = grown
        frontier = next
        hop += 1
        if (hop > maxHops) done = true
      }
    }
    if (frontier ne levels) Checkpoints.free(frontier)
    levels
  }

  /** Hop-bounded single-source shortest paths (non-negative weights):
    * (node, d) with d = the minimum total `w` over directed paths of
    * AT MOST `maxRounds` hops from `source`; nodes unreachable within
    * the bound absent. The hop bound is part of the SEMANTICS
    * (itinerary-style "cheapest route with ≤H legs"), not just a
    * safety valve — and unbounded SSSP is the fixed point (raise
    * `maxRounds` past the graph's hop-diameter and the loop exits
    * early on an empty frontier).
    *
    * Frontier Bellman-Ford: per round, one join of the IMPROVED-last-
    * round set (not the whole dist table) against the edges, one
    * min-reduce partial-agg shuffle on `dst`, one union+min with the
    * standing dist table; each round's table checkpoint-truncated and
    * the superseded one freed (the CC/PageRank lesson). Frontier-only
    * relaxation preserves the Bellman-Ford round invariant (dist
    * after round h = exact ≤h-hop minimum), which is what the
    * recursive-CTE oracle enumerates.
    *
    * Determinism: every path's cost is the same left-fold of adds in
    * any engine, and min over identical value sets is exact — no
    * rounding needed. */
  def ssspBounded(edges: DataFrame, source: Long,
      maxRounds: Int): DataFrame = {
    import edges.sparkSession.implicits._
    require(maxRounds >= 0, "maxRounds must be non-negative")
    var dist = Checkpoints.truncate(Seq((source, 0.0)).toDF("node", "d"))
    var frontier = dist
    var round = 0
    var done = maxRounds == 0
    while (!done) {
      val cand = frontier
        .join(edges, frontier("node") === edges("src"))
        .select(col("dst").as("node"),
          (frontier("d") + edges("w").cast("double")).as("c"))
        .groupBy("node").agg(min(col("c")).as("c"))
      val improved = Checkpoints.truncate(
        cand.join(dist.select(col("node"), col("d").as("__old")),
            Seq("node"), "left")
          .where(col("__old").isNull || col("c") < col("__old"))
          .select(col("node"), col("c").as("d")))
      if (improved.isEmpty) { Checkpoints.free(improved); done = true }
      else {
        val grown = Checkpoints.truncate(
          dist.unionByName(improved)
            .groupBy("node").agg(min(col("d")).as("d")))
        Checkpoints.free(dist)
        if (frontier ne dist) Checkpoints.free(frontier)
        dist = grown
        frontier = improved
        round += 1
        if (round >= maxRounds) done = true
      }
    }
    if (frontier ne dist) Checkpoints.free(frontier)
    dist
  }
}
