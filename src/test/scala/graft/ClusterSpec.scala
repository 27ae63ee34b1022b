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

  test("silhouette: separated clusters score near 1, degenerate data scores 0") {
    // stride 4 over ids 0..7 -> centroids are vec 0 (~origin) and
    // vec 4 (~[10,0]); two tight, well-separated blobs
    val pts = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.2f, 0.1f)),
      (2L, Array(-0.1f, 0.2f)), (3L, Array(0.1f, -0.2f)),
      (4L, Array(10.0f, 0.0f)), (5L, Array(10.2f, 0.1f)),
      (6L, Array(9.9f, 0.2f)), (7L, Array(10.1f, -0.1f)))
      .toDF("vec_id", "embedding")
    val sil = Cluster.silhouette(pts, "vec_id", "embedding",
      centroidStride = 4).collect()
    assert(sil.map(_.getAs[Long]("n")).sum == 8L)
    assert(sil.forall(_.getAs[Double]("mean_silhouette") > 0.8),
      sil.mkString(", "))
    // coincident points: a = b = 0 everywhere -> silhouette exactly 0
    val same = Seq.tabulate(8)(i => (i.toLong, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val degenerate = Cluster.silhouette(same, "vec_id", "embedding",
      centroidStride = 4).collect()
    assert(degenerate.map(_.getAs[Long]("n")).sum == 8L)
    assert(degenerate.forall(_.getAs[Double]("mean_silhouette") == 0.0))
  }

  test("silhouette evaluates the centroid fold once, not per extracted field") {
    val plan = Cluster.silhouette(emb, "vec_id", "embedding",
      centroidStride = 16).queryExecution.optimizedPlan.toString
    val folds = "aggregate\\(".r.findAllMatchIn(plan).size
    assert(folds == 1, s"centroid fold duplicated $folds times in plan")
  }

  test("prototypicalityPrune drops exactly the closest floor(n*frac) per cluster") {
    val full = Cluster.prototypicalityPrune(emb, "vec_id", "embedding",
      centroidStride = 16, dropFrac = 0.0)
    val pruned = Cluster.prototypicalityPrune(emb, "vec_id", "embedding",
      centroidStride = 16, dropFrac = 0.25).cache()
    // per cluster: survivors = n - floor(n/4), and the dropped members
    // are precisely the closest-ranked quarter of the full assignment
    val fullSizes = full.groupBy("cent_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prunedSizes = pruned.groupBy("cent_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fullSizes.foreach { case (c, n) =>
      assert(prunedSizes.getOrElse(c, 0L) == n - n / 4,
        s"cluster $c: ${prunedSizes.getOrElse(c, 0L)} of $n kept")
    }
    // every survivor's distance >= every dropped member's distance
    // within its cluster (the drop takes the prototypical head)
    val dropped = full.select($"vec_id", $"cent_id", $"cdist")
      .join(pruned.select($"vec_id"), Seq("vec_id"), "left_anti")
    val maxDropped = dropped.groupBy("cent_id")
      .agg(max($"cdist").as("maxd"))
    val minKept = pruned.groupBy("cent_id").agg(min($"cdist").as("mind"))
    val bad = maxDropped.join(minKept, Seq("cent_id"))
      .where($"maxd" > $"mind").count()
    assert(bad == 0, "a dropped member was farther than a kept one")
  }
}
