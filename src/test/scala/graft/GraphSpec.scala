package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank on a symmetric cycle stays uniform at 1/N") {
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val pr = Graph.pageRank(nodes, edges, iters = 4).collect()
    assert(pr.length == 3)
    pr.foreach(r => assert(math.abs(r.getDouble(1) - 1.0 / 3) < 1e-8))
  }

  test("pageRank concentrates mass on the sink of a star") {
    // 1,2,3 all point at 4; 4 points back at 1. The 1↔4 exchange
    // oscillates from a uniform start (period 2, amplitude ~0.7225^k),
    // so compare NEAR CONVERGENCE: 25 iterations shrink the oscillation
    // well below the steady-state gap (r4 ≈ 0.480 vs r1 ≈ 0.445).
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    val edges = Seq((1L, 4L, 1L), (2L, 4L, 1L), (3L, 4L, 1L), (4L, 1L, 1L))
      .toDF("src", "dst", "w")
    val pr = Graph.pageRank(nodes, edges, iters = 25)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(4L) > pr(1L) && pr(1L) > pr(2L))
    assert(math.abs(pr(2L) - pr(3L)) < 1e-12) // symmetric spokes tie
    assert(math.abs(pr.values.sum - 1.0) < 1e-6) // no dangling loss here
  }

  test("one iteration matches the hand-computed update") {
    // 1 -> 2 (w 3), 1 -> 3 (w 1): r1(2) = 0.15/3 + 0.85 * (1/3 * 3/4)
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val pr = Graph.pageRank(nodes, edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr(1L) - 0.05) < 1e-9) // teleport only (no in-edges)
    assert(math.abs(pr(2L) - (0.05 + 0.85 * (1.0 / 3) * 0.75)) < 1e-9)
    assert(math.abs(pr(3L) - (0.05 + 0.85 * (1.0 / 3) * 0.25)) < 1e-9)
  }

  test("tradeEdges derives a weighted nation graph from the fact tables") {
    val dir = "/root/testdata/sf0.001"
    def t(n: String) = graft.etl.Tables.table(spark, dir, n)
    val e = Graph.tradeEdges(t("lineitem"), t("orders"), t("customer"),
      t("supplier"))
    val keys = t("nation").select("n_nationkey").collect()
      .map(_.getAs[Number](0).longValue()).toSet
    val rows = e.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(2) > 0))
    assert(rows.forall(r => keys(r.getAs[Number](0).longValue())
      && keys(r.getAs[Number](1).longValue())))
    // total edge weight = number of lineitems (every lineitem is one trade)
    assert(rows.map(_.getLong(2)).sum == t("lineitem").count())
  }

  test("triangles counts each triangle once per corner on planted graphs") {
    // K4 on 1..4 plus a pendant 5: every K4 node is in C(3,2)=3
    // triangles, the pendant in none
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (k4 :+ ((4L, 5L))).toDF("src", "dst")
    val got = Graph.triangles(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // direction, duplicates and self-loops collapse to the same graph
    val messy = edges
      .union(Seq((2L, 1L), (3L, 1L), (1L, 1L), (2L, 3L)).toDF("src", "dst"))
    val got2 = Graph.triangles(messy).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == got)
    // a pure star has no triangles
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    assert(Graph.triangles(star).isEmpty)
  }

  test("triangles handles non-numeric ids and keeps the input id type") {
    // string ids: the long-keyed driver fast path must stand aside
    // (the distributed node-iterator is type-generic)
    val k3s = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("src", "dst")
    val gotS = Graph.triangles(k3s).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotS == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
    // int ids: the output schema must be the INPUT id type on both
    // sides of the size switch, not flip to Long under the fast path
    val k3i = Seq((1, 2), (2, 3), (1, 3)).toDF("src", "dst")
    val small = Graph.triangles(k3i)
    assert(small.schema("node").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val forced = { // distributed path on the same graph
      spark.conf.set("spark.graft.graph.smallBound", "0")
      try Graph.triangles(k3i)
      finally spark.conf.unset("spark.graft.graph.smallBound")
    }
    assert(forced.schema("node").dataType == small.schema("node").dataType)
    assert(small.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap ==
      Map(1 -> 1L, 2 -> 1L, 3 -> 1L))
  }

  test("bfsLevels assigns minimum hop counts and respects maxHops") {
    // chain 1->2->3->4 plus shortcut 1->3; 9 isolated
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L))
      .toDF("src", "dst")
    val got = Graph.bfsLevels(edges, source = 1L, maxHops = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3 is reached at hop 1 via the shortcut, NOT hop 2
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    // hop budget cuts the frontier
    val capped = Graph.bfsLevels(edges, 1L, maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
    // cycles terminate (no infinite loop): 1->2->1
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    assert(Graph.bfsLevels(cyc, 1L, 10).count() == 2)
  }

  test("quantileBins assigns by exact quantile thresholds, ties to the lower band") {
    val df = (1 to 100).map(_.toLong).toDF("v")
    val out = graft.ops.Binning.quantileBins(df, "v", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cuts at 25.75, 50.5, 75.25 -> quartile bands of size 25
    assert((1 to 25).forall(i => out(i.toLong) == 0L))
    assert((26 to 50).forall(i => out(i.toLong) == 1L))
    assert((51 to 75).forall(i => out(i.toLong) == 2L))
    assert((76 to 100).forall(i => out(i.toLong) == 3L))
    // a value equal to a cut point stays in the lower band
    val tie = Seq(1L, 2L, 3L).toDF("v") // median cut = 2
    val tb = graft.ops.Binning.quantileBins(tie, "v", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tb == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("percentileRanks equals the cume_dist window, without a global row sort") {
    val df = Seq(10L, 20L, 20L, 30L, 40L).toDF("v")
    val got = graft.ops.Binning.percentileRanks(df, "v")
      .select("v", "cume_dist").distinct().collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(10L -> 0.2, 20L -> 0.6, 30L -> 0.8, 40L -> 1.0))
    // the full-frame window formulation agrees
    val w = org.apache.spark.sql.expressions.Window.orderBy("v")
    val ref = df.withColumn("cd", round(cume_dist().over(w), 9))
      .distinct().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == ref)
    // quantize-first path: distinct values land in distinct bands, so
    // the banded ranks reproduce the exact ones — while the cumulative
    // window frame is bounded at nBuckets rows
    val quant = graft.ops.Binning.percentileRanks(df, "v", Some(100))
      .select("v", "cume_dist").distinct().collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(quant == got)
  }

  test("histogram bands cover [min,max], max in last band, degenerate collapses") {
    val df = (0 to 100).map(_.toDouble).toDF("v")
    val h = graft.ops.Binning.histogram(df, "v", 10)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(h.length == 10)
    assert(h.head == ((0L, 0.0, 10.0, 10L)))      // 0..9
    assert(h.last == ((9L, 90.0, 100.0, 11L)))    // 90..100 incl. max
    assert(h.map(_._4).sum == 101)
    val flat = Seq(5.0, 5.0, 5.0).toDF("v")
    val hf = graft.ops.Binning.histogram(flat, "v", 10).collect()
    assert(hf.length == 1 && hf.head.getLong(3) == 3)
  }

  test("ssspBounded: detour beats direct edge; hop bound is semantic") {
    // 0 -> 2 direct costs 10; 0 -> 1 -> 2 costs 3; 0 -> 1 -> 2 -> 3
    val e = Seq((0L, 2L, 10.0), (0L, 1L, 1.0), (1L, 2L, 2.0),
      (2L, 3L, 1.0)).toDF("src", "dst", "w")
    def run(h: Int) = graft.ops.Graph.ssspBounded(e, 0L, h)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(run(1) == Map(0L -> 0.0, 1L -> 1.0, 2L -> 10.0))
    assert(run(2) == Map(0L -> 0.0, 1L -> 1.0, 2L -> 3.0, 3L -> 11.0))
    assert(run(3) == Map(0L -> 0.0, 1L -> 1.0, 2L -> 3.0, 3L -> 4.0))
    // past the diameter the fixed point holds (early exit, same answer)
    assert(run(10) == run(3))
  }

  test("ssspBounded equals brute-force path enumeration on a random graph") {
    val rnd = new scala.util.Random(7)
    val n = 9
    val edges = (for {
      s0 <- 0 until n; d0 <- 0 until n
      if s0 != d0 && rnd.nextDouble() < 0.35
    } yield (s0.toLong, d0.toLong, rnd.nextInt(20) + 1.0)).toSeq
    val e = edges.toDF("src", "dst", "w")
    val h = 4
    val got = graft.ops.Graph.ssspBounded(e, 0L, h)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // brute force: all paths from 0 of length <= h
    val adj = edges.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toMap
    var best = Map(0L -> 0.0)
    var frontier = Map(0L -> 0.0)
    for (_ <- 1 to h) {
      val next = scala.collection.mutable.Map.empty[Long, Double]
      frontier.foreach { case (u, du) =>
        adj.getOrElse(u, Nil).foreach { case (v, w) =>
          val c = du + w
          if (c < next.getOrElse(v, Double.MaxValue)) next(v) = c
        }
      }
      frontier = next.toMap
      next.foreach { case (v, c) =>
        if (c < best.getOrElse(v, Double.MaxValue)) best += v -> c }
    }
    assert(got == best, s"got $got\nexp $best")
  }
}
