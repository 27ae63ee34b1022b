package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.ops.Cluster

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.etl.Tables.table(spark, "/root/testdata/sf0.001",
    "embeddings")

  test("kmeans assigns every vector to its nearest final centroid") {
    val asg = Cluster.kmeans(emb, "vec_id", "embedding",
      centroidStride = 16, iters = 2)
    val n = emb.count()
    assert(asg.count() == n)
    assert(asg.select("vec_id").distinct().count() == n)
    // every distance is a valid squared L2 (>= 0); exactness of the
    // argmin itself is carried by the cross-engine oracle gate (q79)
    assert(asg.where($"dist" < 0).isEmpty)
  }

  test("more Lloyd iterations never increase total within-cluster distance") {
    val d1 = Cluster.kmeans(emb, "vec_id", "embedding", 16, iters = 1)
      .agg(sum("dist")).head().getDouble(0)
    val d3 = Cluster.kmeans(emb, "vec_id", "embedding", 16, iters = 3)
      .agg(sum("dist")).head().getDouble(0)
    // Lloyd's objective is monotone non-increasing per half-step; the
    // slack absorbs the 6-digit centroid rounding between iterations
    assert(d3 <= d1 + 1e-3, s"iters=3 total $d3 > iters=1 total $d1")
  }

  test("kmeans is deterministic across runs") {
    val a = Cluster.kmeans(emb, "vec_id", "embedding", 32, iters = 2)
    val b = Cluster.kmeans(emb, "vec_id", "embedding", 32, iters = 2)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("clusterStats reports sizes that sum to the corpus") {
    val asg = Cluster.kmeans(emb, "vec_id", "embedding", 32, iters = 2)
    val stats = Cluster.clusterStats(asg)
    assert(stats.agg(sum("n")).head().getLong(0) == emb.count())
    assert(stats.where($"mean_dist" < 0).isEmpty)
  }
}
