package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Graph}

/** The bounded driver fast paths (Graph pageRank/bfs/sssp/triangles,
  * Dedup connected components) must agree ROW-FOR-ROW with the
  * distributed loops they shortcut — asserted by running each operator
  * twice on the same fixture, once under the default bound (fast path)
  * and once with the bound forced to 0 (distributed loop). */
class SmallGraphParitySpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def bothPaths(run: => org.apache.spark.sql.DataFrame)
      : (Set[String], Set[String]) = {
    spark.conf.unset("spark.graft.graph.smallBound")
    spark.conf.unset("spark.graft.cc.smallBound")
    val fast = rows(run)
    spark.conf.set("spark.graft.graph.smallBound", "0")
    spark.conf.set("spark.graft.cc.smallBound", "0")
    try { (fast, rows(run)) } finally {
      spark.conf.unset("spark.graft.graph.smallBound")
      spark.conf.unset("spark.graft.cc.smallBound")
    }
  }

  // weighted digraph with a dangling node (4), a cycle, parallel mass
  private val edges = Seq(
    (0L, 1L, 2.0), (0L, 2L, 1.0), (1L, 2L, 3.0), (2L, 0L, 1.0),
    (2L, 3L, 2.0), (3L, 0L, 1.0), (5L, 0L, 4.0), (1L, 3L, 1.0)
  ).toDF("src", "dst", "w")
  private val nodes = (0L to 5L).toDF("node")

  test("pageRank fast path equals the distributed loop") {
    val (fast, loop) = bothPaths(
      Graph.pageRank(nodes, edges, iters = 5, damping = 0.85))
    assert(fast == loop && fast.size == 6)
  }

  test("bfsLevels fast path equals the distributed loop") {
    for (hops <- Seq(1, 2, 5)) {
      val (fast, loop) = bothPaths(
        Graph.bfsLevels(edges.select("src", "dst"), source = 0L,
          maxHops = hops))
      assert(fast == loop, s"maxHops=$hops")
    }
  }

  test("ssspBounded fast path equals the distributed loop (hop bound held)") {
    for (r <- Seq(1, 2, 3, 6)) {
      val (fast, loop) = bothPaths(
        Graph.ssspBounded(edges, source = 0L, maxRounds = r))
      assert(fast == loop, s"maxRounds=$r")
    }
  }

  test("triangles fast path equals the distributed joins") {
    // k4 plus a pendant and a disconnected edge
    val tEdges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (8L, 9L), (2L, 1L) /* dup reversed */)
      .toDF("src", "dst")
    val (fast, loop) = bothPaths(Graph.triangles(tEdges))
    assert(fast == loop && fast.nonEmpty)
  }

  test("nearDupComponents / connectedComponentsStar fast path equals loops") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L), (4L, 4L), (10L, 3L))
      .toDF("doc_a", "doc_b")
    val (fastA, loopA) = bothPaths(Dedup.nearDupComponents(pairs))
    assert(fastA == loopA && fastA.nonEmpty)
    val (fastB, loopB) = bothPaths(Dedup.connectedComponentsStar(pairs))
    assert(fastB == loopB)
  }

  test("string-typed ids survive the union-find fast path") {
    val pairs = Seq(("b", "a"), ("c", "b"), ("x", "y"))
      .toDF("doc_a", "doc_b")
    val got = Dedup.nearDupComponents(pairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x"))
  }
}
