package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.ops.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("vector primitives: dot, norm, cosine on known values") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 0.0f, 0.0f)))
      .toDF("a", "b")
    val r = df.select(
      dot($"a", $"b").as("d"), l2Norm($"a").as("na"),
      cosine($"a", $"b").as("c"), sqDist($"a", $"b").as("sq")).head()
    assert(math.abs(r.getDouble(0) - 2.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 3.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 2.0 / (3.0 * 2.0)) < 1e-12)
    assert(math.abs(r.getDouble(3) - (1 + 4 + 4)) < 1e-12)
  }

  test("codegen DotProduct expression equals the higher-order-function fold") {
    val emb = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val both = emb.limit(100).select(
      dot($"embedding", $"embedding").as("fast"),
      dotFold($"embedding", $"embedding").as("ref"))
    // bit-identical: same ops, same order, both double accumulation
    assert(both.where($"fast" =!= $"ref").isEmpty)
    // interpreted path (eval) agrees too
    val row = Seq((Array(1.5f, -2.0f), Array(2.0f, 4.0f))).toDF("a", "b")
      .select(dot($"a", $"b")).head()
    assert(row.getDouble(0) == 1.5 * 2.0 + -2.0 * 4.0)
  }

  test("hardNegatives returns top-k different-label neighbors only") {
    val emb = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .where($"vec_id" < 60).cache()
    val hn = Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
      $"vec_id" < 4, k = 3).collect()
    val labels = emb.select($"vec_id", $"label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every mined negative carries a label different from its anchor's
    assert(hn.forall(r =>
      labels(r.getAs[Long]("neg_id")) != labels(r.getAs[Long]("anchor_id"))))
    // ranks are contiguous 1..3 per anchor
    hn.groupBy(_.getAs[Long]("anchor_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L))
    }
    // brute-force check: the rank-1 negative really is the closest
    // different-label vector (rounded cosine, id tie-break)
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def d(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (u, v) => u.toDouble * v.toDouble }.sum
      BigDecimal(d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    hn.filter(_.getAs[Long]("rank") == 1L).foreach { r =>
      val aId = r.getAs[Long]("anchor_id")
      val best = vecs.keys
        .filter(id => id != aId && labels(id) != labels(aId))
        .map(id => (-cos(vecs(aId), vecs(id)), id)).min._2
      assert(r.getAs[Long]("neg_id") == best,
        s"anchor $aId: expected $best, got ${r.getAs[Long]("neg_id")}")
    }
    emb.unpersist()
  }

  test("signRandomProjection preserves pairwise distance structure") {
    val emb = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .where($"vec_id" < 15)
    val proj = Similarity.signRandomProjection(emb, "vec_id", "embedding",
      dim = 64, outDim = 16)
    // shape: one row per (vector, output dim)
    assert(proj.count() == 15 * 16)
    // deterministic across runs
    val again = Similarity.signRandomProjection(emb, "vec_id", "embedding",
      dim = 64, outDim = 16)
    assert(proj.except(again).isEmpty && again.except(proj).isEmpty)
    // JL property: E[||proj(v)||^2] = ||v||^2 under a ±1/sqrt(k)
    // matrix — per-vector ratios spread (chi-sq_16/16) but stay in a
    // wide band, and their mean concentrates near 1
    val orig = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val pr = proj.collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).map(_.getDouble(2)).toArray }
    val ratios = orig.collect { case (id, v) if v.map(x => x * x).sum > 0 =>
      pr(id).map(x => x * x).sum / v.map(x => x * x).sum }.toSeq
    assert(ratios.forall(r => r > 0.1 && r < 4.0),
      s"a norm ratio escaped the JL band: ${ratios.min} .. ${ratios.max}")
    val meanRatio = ratios.sum / ratios.size
    assert(meanRatio > 0.7 && meanRatio < 1.3,
      s"mean norm ratio $meanRatio not near 1")
  }

  test("mmrRerank trades relevance for diversity after the first pick") {
    // query [1,0]; two EXACT-duplicate high-relevance candidates and
    // one diverse lower-relevance candidate: greedy MMR must take dup1,
    // then the diverse vector, and only then the second duplicate
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.99f, 0.1f)),
      (2L, Array(0.99f, 0.1f)), (3L, Array(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val sel = Similarity.mmrRerank(emb, "vec_id", "embedding",
        $"vec_id" === 0L, poolSize = 3, k = 3, lambda = 0.3)
      .orderBy("sel_rank").collect()
    assert(sel.map(_.getAs[Long]("target_id")).toSeq == Seq(1L, 3L, 2L))
    assert(sel.map(_.getAs[Long]("sel_rank")).toSeq == Seq(1L, 2L, 3L))
    // mmr scores are non-increasing only within what greedy guarantees:
    // each step's winner beat its own step's alternatives; spot-check
    // step 2 penalized the exact duplicate below the diverse pick
    assert(sel(1).getAs[Double]("mmr") > 0.3 * 0.994937 - 0.7 * 1.0 + 1e-9)
  }

  test("grouped-local mmrRerank ≡ the step-synchronized distributed form") {
    // the executor-local greedy must reproduce the window-argmax
    // variant BIT-exactly (same roundings, same tie-breaks) on real
    // embeddings — including the negative-similarity msim seeding and
    // score ties
    val emb = graft.etl.Tables.table(spark, "/root/testdata/sf0.001",
      "embeddings")
    val fast = Similarity.mmrRerank(emb, "vec_id", "embedding",
        $"vec_id" < 4, poolSize = 25, k = 10, lambda = 0.75)
      .select($"query_id", $"target_id", $"sel_rank", $"mmr")
    val slow = Similarity.mmrRerankIterative(emb, "vec_id", "embedding",
        $"vec_id" < 4, poolSize = 25, k = 10, lambda = 0.75)
      .select($"query_id", $"target_id", $"sel_rank", $"mmr")
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
      "local and distributed MMR diverged")
    assert(fast.count() == 40)
  }

  test("mmrRerank first pick is the pure-relevance argmax per query") {
    val emb = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val sel = Similarity.mmrRerank(emb, "vec_id", "embedding",
        $"vec_id" < 3, poolSize = 10, k = 4, lambda = 0.7)
    val first = sel.where($"sel_rank" === 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val top1 = Similarity.cosineTopK(emb, "vec_id", "embedding",
        $"vec_id" < 3, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(first == top1)
    // k selections per query, ranks contiguous, no repeats
    sel.collect().groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("sel_rank")).sorted.toSeq ==
        (1L to 4L).toSeq)
      assert(rs.map(_.getLong(1)).distinct.length == 4)
    }
  }

  test("cosineTopK returns k ranked neighbors per query, self excluded") {
    val emb = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val top = Similarity.cosineTopK(emb, "vec_id", "embedding", $"vec_id" < 3, 4)
    val rows = top.collect()
    assert(rows.length == 12)
    assert(!rows.exists(r => r.getLong(0) == r.getLong(1)))
    // ranks are 1..4 per query and cosine non-increasing within a query
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == Seq(1, 2, 3, 4))
      val cs = sorted.map(_.getDouble(2))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
    }
  }

  test("ivfTopK achieves reasonable recall vs brute force") {
    val emb = graft.etl.Tables.table(spark, "/root/testdata/sf0.01", "embeddings")
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", $"vec_id" < 10, 5)
      .select("query_id", "target_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(emb, "vec_id", "embedding", $"vec_id" < 10,
        5, centroidStride = 32, nprobe = 4)
      .select("query_id", "target_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // random 64-dim embeddings are a worst case for IVF; still expect
    // far better than the 4/16-cell scan fraction alone would give
    assert(recall >= 0.3, s"IVF recall $recall too low")
    assert(approx.size == exact.size)
  }

  test("int8 quantization: schema shrinks to tinyint, recall@5 stays high") {
    val emb = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding")
    // storage type is actually int8
    val qType = q.schema("q").dataType.asInstanceOf[
      org.apache.spark.sql.types.ArrayType].elementType
    assert(qType == org.apache.spark.sql.types.ByteType)
    // max |dequantized - original| component error <= scale/2 (+eps)
    val err = Similarity.dequantize(q, "vec_id")
      .withColumnRenamed("embedding", "dq")
      .join(emb.select($"vec_id", $"embedding"), "vec_id")
      .join(q.select($"vec_id", $"scale"), "vec_id")
      .select(max(array_max(zip_with($"dq", $"embedding",
        (a, b) => abs(a - b))).cast("double") / $"scale").as("worst"))
      .head().getDouble(0)
    assert(err <= 0.5 + 1e-6, s"component error $err exceeds scale/2")
    // ANN recall of the quantized corpus vs full precision
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding",
        $"vec_id" < 10, k = 5)
      .select($"query_id", $"target_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.cosineTopKInt8(emb, "vec_id", "embedding",
        $"vec_id" < 10, k = 5)
      .select($"query_id", $"target_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 recall@5 = $recall")
  }

  test("persisted IVF index: identical results to inline IVF, partition-pruned scan") {
    val emb = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val path = java.nio.file.Files.createTempDirectory("ivf-index").toString
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", path, centroidStride = 32)
    val queries = emb.where($"vec_id" < 10)
    val indexed = Similarity.ivfTopKIndexed(spark, path, queries,
      "vec_id", "embedding", k = 5, nprobe = 4)
    val inline = Similarity.ivfTopK(emb, "vec_id", "embedding",
      $"vec_id" < 10, k = 5, centroidStride = 32, nprobe = 4)
    val a = indexed.select("query_id", "target_id", "cosine", "rank").collect().toSet
    val b = inline.select("query_id", "target_id", "cosine", "rank").collect().toSet
    assert(a == b, "indexed IVF diverged from inline IVF")
    // the corpus scan must carry the cell filter as a PARTITION filter
    // (only probed cell directories are read)
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cent_id"), plan)
  }

  test("cosine is symmetric, bounded, and 1.0 on self") {
    val emb = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(60).select($"vec_id", $"embedding")
    val a = emb.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("ib"), $"embedding".as("vb"))
    val pairs = a.join(b, $"ia" <= $"ib")
      .select($"ia", $"ib",
        cosine($"va", $"vb").as("ab"), cosine($"vb", $"va").as("ba"))
    assert(pairs.where(abs($"ab" - $"ba") > 1e-12).isEmpty)
    assert(pairs.where(abs($"ab") > 1.0 + 1e-9).isEmpty)
    assert(pairs.where($"ia" === $"ib" && abs($"ab" - 1.0) > 1e-9).isEmpty)
  }

  test("hyperplane LSH finds planted near-dups without an all-pairs join") {
    // plant near-identical 64-dim vectors in real data
    val base = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", $"embedding")
    val planted = base.where($"vec_id" < 3)
      .select(($"vec_id" + 10000).as("vec_id"),
        transform($"embedding", x => x + lit(0.001f)).as("embedding"))
    val corpus = base.unionByName(planted)
    val lsh = graft.ops.Similarity.lshNearDups(corpus, "vec_id", "embedding",
        threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((0L, 10000L), (1L, 10001L), (2L, 10002L)).subsetOf(lsh),
      s"planted pairs missing from $lsh")
    // agrees with exact all-pairs verification (LSH can only miss, and
    // at cosine ~1.0 all 4 bands collide with near certainty)
    val exact = graft.ops.Similarity.embeddingNearDups(corpus, "vec_id",
        "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    assert(exact == lsh)
  }

  test("embeddingNearDups finds planted near-identical vectors") {
    val base = Array.tabulate(8)(i => i.toFloat + 1)
    val near = base.clone(); near(0) += 0.01f
    val far = Array.tabulate(8)(i => if (i % 2 == 0) -1.0f else 1.0f)
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDups(df, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("semanticNearDups = all-pairs restricted to IVF cells, same cosines") {
    val emb = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val sem = Similarity.semanticNearDups(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(sem.nonEmpty, "corpus should contain within-cell near-dups")
    val all = Similarity.embeddingNearDups(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every semantic pair is an exact near-dup pair with the same cosine
    sem.foreach { case (k, c) =>
      assert(all.contains(k), s"pair $k not in exact all-pairs")
      assert(all(k) == c, s"cosine mismatch for $k")
    }
    // and the restriction is exactly same-cell membership
    val cells = Similarity.assignCells(emb, "vec_id", "embedding", 32)
      .select("target_id", "cent_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    all.keys.foreach { case (a, b) =>
      val sameCell = cells(a) == cells(b)
      assert(sem.contains((a, b)) == sameCell,
        s"pair ($a,$b) sameCell=$sameCell but sem=${sem.contains((a, b))}")
    }
  }

  test("semanticDedupLosers drops exactly docs with a smaller-id cell neighbor") {
    val emb = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val losers = Similarity.semanticDedupLosers(emb, "vec_id", "embedding", 0.4)
      .collect().map(_.getLong(0)).toSet
    val pairs = Similarity.semanticNearDups(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(losers == pairs.map(_._2).toSet)
    assert(pairs.forall { case (a, b) => a < b })
    // the smallest id among paired docs always survives
    assert(!losers.contains(pairs.map(_._1).min))
  }
}
