package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup of 1
    (4L, "completely different content with other words entirely"),
    (5L, "unrelated short text")
  ).toDF("doc_id", "text")

  test("exactGroups collapses identical content to the min id") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
    assert(g.count() == 4)
    val dup = g.where($"n_copies" === 2).head()
    assert(dup.getAs[Long]("keeper_id") == 1L)
  }

  test("dropExactDuplicates keeps one row per content, min id wins") {
    val kept = Dedup.dropExactDuplicates(docs, "doc_id", "text")
    assert(kept.count() == 4)
    assert(kept.where($"doc_id" === 2).isEmpty)
    assert(!kept.where($"doc_id" === 1).isEmpty)
  }

  test("jaccardPairs finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L)))  // exact: jaccard 1.0
    assert(keys.contains((1L, 3L)) && keys.contains((2L, 3L)))  // near
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L))
    val exact = pairs.find(p => (p._1, p._2) == (1L, 2L)).get
    assert(exact._3 == 1.0)
  }

  test("fuzzyJoin matches exact and mutated twins across two corpora, never within") {
    val left = docs
    val right = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"), // exact = doc 1/2
      (103L, "the quick brown fox jumps over the lazy cat and naps"), // near 3
      (105L, "totally fresh crawl content sharing nothing at all"),
      (106L, "completely different content with other words entirely") // exact = 4
    ).toDF("doc_id", "text")
    val m = Dedup.fuzzyJoin(left, "doc_id", "text", right, "doc_id", "text",
        n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // exact twins at jaccard 1.0, from BOTH duplicate left docs
    assert(m((1L, 101L)) == 1.0 && m((2L, 101L)) == 1.0)
    assert(m((4L, 106L)) == 1.0)
    // mutated twin above threshold but below 1
    assert(m.contains((3L, 103L)) && m((3L, 103L)) < 1.0)
    // the unrelated crawl doc matches nothing; no within-side pairs
    assert(!m.keys.exists(_._2 == 105L))
    assert(m.keys.forall { case (l, r) => l <= 5L && r >= 101L })
  }

  test("maxDocFreq cap drops hot shingles from pairing") {
    // every doc shares shingle "x y z" -> without cap all pairs appear
    val hot = Seq((1L, "x y z a b c"), (2L, "x y z d e f"), (3L, "x y z g h i"))
      .toDF("doc_id", "text")
    val without = Dedup.jaccardPairs(hot, "doc_id", "text", n = 3, threshold = 0.0)
    val withCap = Dedup.jaccardPairs(hot, "doc_id", "text", n = 3,
      threshold = 0.0, maxDocFreq = Some(2))
    assert(without.count() == 3 && withCap.count() == 0)
  }

  test("minhash LSH finds the same high-similarity pairs as exact jaccard") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("doc_a", "doc_b")
    val lsh = Dedup.minhashNearDups(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("doc_a", "doc_b")
    // LSH is a candidate filter + identical verification: it can only
    // miss (probabilistically), never add. On near-identical docs with
    // 8 perms it catches everything.
    assert(lsh.except(exact).isEmpty)
    assert(exact.except(lsh).isEmpty)
  }

  test("parametrized minhash: 128 perms / 32x4 bands keeps full recall on near-dups") {
    // wider signatures (the web-scale configuration) must still find
    // every pair the exact verifier accepts on this corpus, and the
    // band-bucket candidate filter must never ADD pairs
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("doc_a", "doc_b")
    val wide = Dedup.minhashNearDups(docs, "doc_id", "text", n = 3,
        threshold = 0.5, nPerms = 128, bands = 32, rowsPerBand = 4)
      .select("doc_a", "doc_b")
    assert(wide.except(exact).isEmpty)
    assert(exact.except(wide).isEmpty)
    // signature width actually honors nPerms
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, nPerms = 16)
    assert(sig.columns.count(_.startsWith("mh")) == 16)
  }

  test("production shape on the documents table: recall >= gate shape, sub-quadratic candidates") {
    // 128 perms / 32x4 bands (the web-scale dial, threshold curve
    // (1/32)^(1/4) ~= 0.42) over the REAL corpus: candidate volume must
    // stay a small multiple of corpus size — never all-pairs — and the
    // verified pairs must include everything the 8-perm gate shape finds.
    val real = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val nDocs = real.count()
    val cand = Dedup.lshCandidates(
      Dedup.minhashSignatures(real, "doc_id", "text", n = 3, nPerms = 128),
      "doc_id", bands = 32, rowsPerBand = 4).count()
    assert(cand < 10 * nDocs,
      s"candidate volume $cand not sub-quadratic for $nDocs docs " +
        s"(all-pairs would be ${nDocs * (nDocs - 1) / 2})")
    val gate = Dedup.minhashNearDups(real, "doc_id", "text", n = 3, threshold = 0.5)
      .select("doc_a", "doc_b")
    val prod = Dedup.minhashNearDups(real, "doc_id", "text", n = 3,
        threshold = 0.5, nPerms = 128, bands = 32, rowsPerBand = 4)
      .select("doc_a", "doc_b")
    assert(gate.except(prod).isEmpty,
      "production shape missed pairs the 8-perm gate shape finds")
  }

  test("benchmarkContamination scores planted eval-set overlap") {
    val bench = Seq((100L, "the capital of france is paris and it is large"))
      .toDF("doc_id", "text")
    val cands = Seq(
      // full copy of the benchmark sentence -> contamination 1.0
      (1L, "the capital of france is paris and it is large"),
      // half-overlapping: shares a 5-gram prefix, then diverges
      (2L, "the capital of france is paris but nobody told the pigeons about it"),
      // disjoint text -> 0.0
      (3L, "entirely unrelated words about gardening tools and winter compost heaps"))
      .toDF("doc_id", "text")
    val got = Dedup.benchmarkContamination(cands, bench, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Double]("contamination") == 1.0)
    val partial = got(2L).getAs[Double]("contamination")
    assert(partial > 0.0 && partial < 1.0, s"expected partial overlap, got $partial")
    assert(got(3L).getAs[Double]("contamination") == 0.0)
    // hit counts are DISTINCT-shingle counts, bounded by the doc's total
    assert(got.values.forall(r =>
      r.getAs[Long]("n_hit") <= r.getAs[Long]("n_shingles")))
  }

  test("identical docs share a signature; signatures are deterministic") {
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3)
    val s1 = sig.where($"doc_id" === 1).drop("doc_id").head()
    val s2 = sig.where($"doc_id" === 2).drop("doc_id").head()
    assert(s1 == s2)
    val again = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3)
      .where($"doc_id" === 1).drop("doc_id").head()
    assert(s1 == again)
  }

  test("single-pass Simhash32 expression equals the exploded reference form") {
    val real = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val fast = Dedup.simhash(real, "doc_id", "text")
    val ref = Dedup.simhashExploded(real, "doc_id", "text")
    assert(fast.except(ref).isEmpty && ref.except(fast).isEmpty)
    val fastW = Dedup.simhash(real, "doc_id", "text", weighted = true)
    val refW = Dedup.simhashExploded(real, "doc_id", "text", weighted = true)
    assert(fastW.except(refW).isEmpty && refW.except(fastW).isEmpty)
  }

  test("weighted simhash is at least as discriminating as distinct-token form") {
    val real = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val plain = Dedup.simhash(real, "doc_id", "text")
      .select("simhash").distinct().count()
    val weighted = Dedup.simhash(real, "doc_id", "text", weighted = true)
      .select("simhash").distinct().count()
    assert(weighted >= plain,
      s"weighted gave $weighted distinct signatures vs $plain")
  }

  test("nearDupComponents clusters transitively, min id is representative") {
    // chain 1-2-3 plus isolated pair 7-9: components {1,2,3} and {7,9}
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val comp = Dedup.nearDupComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
    val losers = Dedup.nearDupLosers(pairs).as[Long].collect().sorted.toSeq
    assert(losers == Seq(2L, 3L, 9L))
  }

  test("nearDupComponents converges on a long chain (label doubling)") {
    val chain = (0L until 20L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comp = Dedup.nearDupComponents(chain, maxIter = 30).collect()
    assert(comp.forall(_.getLong(1) == 0L))
  }

  test("persisted LSH index: batch-vs-corpus pairs equal the recomputed cross pairs") {
    val path = java.nio.file.Files.createTempDirectory("lsh-index").toString
    // corpus = the doc fixture; batch = near-dup copies of two corpus
    // docs (ids shifted) plus one novel doc
    val batch = docs.where($"doc_id".isin(1L, 3L))
      .select(($"doc_id" + 100L).as("doc_id"), $"text")
      .union(Seq((200L, "completely unrelated novel content here " * 5))
        .toDF("doc_id", "text"))
    Dedup.buildLshIndex(docs, "doc_id", "text", path)
    val got = Dedup.lshQueryIndex(spark, path, batch, "doc_id", "text",
        threshold = 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: full recompute over the union, restricted to
    // (corpus, batch) cross pairs
    val union = docs.union(batch)
    val want = Dedup.minhashNearDups(union, "doc_id", "text",
        n = 3, threshold = 0.5)
      .where($"doc_a" < 100L && $"doc_b" >= 100L)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)                               // the planted dups found
    assert(!got.exists(_._2 == 200L))                  // novel doc pairs with nothing
  }

  test("appendToLshIndex: query after append equals a fresh index on the union") {
    val appended = java.nio.file.Files.createTempDirectory("lsh-append").toString
    val fresh = java.nio.file.Files.createTempDirectory("lsh-fresh").toString
    // corpus A = docs; batch B = a near-dup of A's doc 1 + a novel doc
    val batchB = Seq(
      (101L, "the quick brown fox jumps over the lazy dogs"),
      (102L, "novel appended corpus content nothing like the rest " * 3))
      .toDF("doc_id", "text")
    // batch C probes both generations: a dup of A's doc 3, a dup of
    // B's doc 101, and a fresh doc
    val batchC = Seq(
      (201L, "the quick brown fox jumps over the lazy cat"),
      (202L, "the quick brown fox jumps over the lazy dogs"),
      (203L, "entirely fresh never seen before text payload"))
      .toDF("doc_id", "text")
    Dedup.buildLshIndex(docs, "doc_id", "text", appended)
    Dedup.appendToLshIndex(batchB, "doc_id", "text", appended)
    Dedup.buildLshIndex(docs.union(batchB), "doc_id", "text", fresh)
    def q(path: String) =
      Dedup.lshQueryIndex(spark, path, batchC, "doc_id", "text",
          threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = q(appended)
    assert(got == q(fresh))                            // append ≡ rebuild
    assert(got.exists(p => p._1 == 101L && p._2 == 202L)) // B admitted
    assert(got.exists(p => p._1 == 3L && p._2 == 201L))   // A still indexed
    assert(!got.exists(p => p._2 == 203L))             // novel doc clean
  }

  test("chunkTable: non-overlapping k-token windows in order, short tail kept") {
    val d = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val got = Dedup.chunkTable(d, "doc_id", "text", 4)
      .orderBy("pidx").collect()
      .map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(got == Seq((0, "a b c d"), (1, "e f g h"), (2, "i j")))
  }

  test("stripBoilerplate removes hot paragraphs, keeps order, empties all-boilerplate docs") {
    val bp = "subscribe to our newsletter for updates"
    val pdocs = Seq(
      (1L, s"unique opening one\n\n$bp\n\nunique closing one"),
      (2L, s"$bp\n\nsecond document body text"),
      (3L, s"third document body text\n\n$bp"),
      (4L, bp),                                  // only boilerplate
      (5L, "entirely original fifth document")
    ).toDF("doc_id", "text")
    val cleaned = Dedup.stripBoilerplate(pdocs, "doc_id", "text", maxDocFreq = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(cleaned(1L) == "unique opening one\n\nunique closing one") // order kept
    assert(cleaned(2L) == "second document body text")
    assert(cleaned(3L) == "third document body text")
    assert(cleaned(4L) == "")                    // fully boilerplate
    assert(cleaned(5L) == "entirely original fifth document")
    // the cap is strict: doc_freq 4 survives a cap of 4
    val keepAll = Dedup.stripBoilerplate(pdocs, "doc_id", "text", maxDocFreq = 4)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(keepAll.count(_.contains(bp)) == 4)
  }

  test("connectedComponentsStar equals min-label CC on mixed graph shapes") {
    // chain + triangle + isolated pair + singleton-free star, one frame
    val edges = (
      (0L until 12L).map(i => (i, i + 1)) ++           // 13-node chain
      Seq((20L, 21L), (21L, 22L), (22L, 20L)) ++       // triangle
      Seq((30L, 31L)) ++                               // pair
      Seq((40L, 41L), (40L, 42L), (40L, 43L))          // star
    ).toDF("doc_a", "doc_b")
    val star = Dedup.connectedComponentsStar(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val label = Dedup.nearDupComponents(edges, maxIter = 30).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == label)
  }

  test("connectedComponentsStar: long chain converges in O(log n) rounds") {
    // 64-node chain: min-label needs 63 rounds; star contraction must
    // finish well within 12 (2*log2(64)) — maxIter doubles as the proof
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponentsStar(chain, maxIter = 12).collect()
    assert(comp.length == 64)
    assert(comp.forall(_.getLong(1) == 0L))
  }

  test("simhash: identical docs equal; near-dups within small hamming distance") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
    val m = sh.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(m(1L), m(3L)) <= 8)   // 1 word of 9 differs
    assert(hamming(m(1L), m(4L)) > 8)    // unrelated content
    assert((m(1L) & 0xFFFFFFFFL) == m(1L)) // 32-bit range
  }

  test("containmentPairs scores asymmetric subsumption both ways") {
    import spark.implicits._
    // B = A plus a short suffix: sh(A) ⊂ sh(B), so contain(A in B) = 1
    // while contain(B in A) < 1 — the asymmetry Jaccard hides; C is
    // unrelated and must not pair above the threshold
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base + " x1 x2 x3"),
      (3L, (1 to 30).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text",
        n = 3, minContainment = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3)))).toMap
    assert(pairs.keySet == Set((1L, 2L)), s"got ${pairs.keySet}")
    val (ca, cb) = pairs((1L, 2L))
    assert(ca == 1.0, s"contain(A in B) should be exactly 1, got $ca")
    // |sh(A)| = 28, |sh(B)| = 31 -> contain(B in A) = 28/31
    assert(cb == BigDecimal(28.0 / 31.0).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble, s"got $cb")
  }

  test("containmentPairs recalls every brute-force containment pair on the real corpus") {
    // honesty check for the documented recall caveat: on the sf0.001
    // corpus (planted near-dups with similar lengths), the banded LSH
    // candidates must recall the SAME >=0.8-containment pairs as an
    // exact all-pairs pass — if the testdata ever grows a
    // fragment-in-document pair (high containment, low Jaccard) this
    // fails and the containment-complete index becomes due
    val real = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val ex = Dedup.shingleTable(real, "doc_id", "text", 3)
      .select(col("doc_id"), xxhash64(col("s")).as("sk"), col("n"))
    val a = ex.select(col("doc_id").as("doc_a"), col("sk"), col("n").as("na"))
    val b = ex.select(col("doc_id").as("doc_b"), col("sk"), col("n").as("nb"))
    val brute = a.join(b, "sk").where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"), max("na").as("na"), max("nb").as("nb"))
      .where(round(col("inter") / col("na"), 6) >= 0.8
        || round(col("inter") / col("nb"), 6) >= 0.8)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.containmentPairs(real, "doc_id", "text",
        n = 3, minContainment = 0.8)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "corpus should contain containment pairs")
    assert(lsh == brute,
      s"LSH candidates missed ${(brute -- lsh).take(5)} / extra ${(lsh -- brute).take(5)}")
  }

  test("containmentJoin finds the tiny-excerpt-in-huge-doc pair LSH misses") {
    import spark.implicits._
    // a 28-word excerpt of a 1500-word document: containment 1.0 but
    // Jaccard ~0.017 — the documented LSH recall gap, now closed
    val words = (1 to 1500).map(i => s"tok${i}w").mkString(" ")
    val excerpt = words.split(" ").slice(200, 228).mkString(" ")
    val corpus = Seq((1L, words),
      (2L, (1 to 80).map(i => s"other${i}q").mkString(" ")))
      .toDF("doc_id", "text")
    val small = Seq((10L, excerpt)).toDF("doc_id", "text")
    // the Jaccard-tuned banded index does NOT surface the pair
    val lshCand = Dedup.lshCandidates(
        Dedup.minhashSignatures(corpus.unionByName(small),
          "doc_id", "text", 3, 8), "doc_id", 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!lshCand.contains((1L, 10L)),
      s"premise broken: LSH recalled the excerpt pair ($lshCand)")
    // the pigeonhole path must, with exact containment
    val got = Dedup.containmentJoin(small, "doc_id", "text",
        corpus, "doc_id", "text", n = 3, minContainment = 0.8,
        candDfCap = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((10L, 1L, 1.0)),
      s"excerpt pair missing or wrong: ${got.toSeq}")
  }

  test("containmentJoin prefix filtering equals the full posting join") {
    // completeness on the real corpus: pigeonhole candidates must
    // reproduce EXACTLY the pairs of an unfiltered posting join, for
    // a small side of derived excerpts at several thresholds
    val real = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val excerpts = real.where(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 900000L).as("doc_id"),
        substring(col("text"), 30, 150).as("text"))
      .where(length(col("text")) >= 30)
    def full(tau: Double) = {
      val s = Dedup.shingleTable(excerpts, "doc_id", "text", 3)
        .select(col("doc_id").as("small_id"), xxhash64(col("s")).as("sk"),
          col("n").as("na"))
      val c = Dedup.shingleTable(real, "doc_id", "text", 3)
        .select(col("doc_id").as("corpus_id"), xxhash64(col("s")).as("sk"))
      s.join(c, "sk").groupBy("small_id", "corpus_id")
        .agg(count(lit(1)).as("inter"), max("na").as("na"))
        .select(col("small_id"), col("corpus_id"),
          round(col("inter") / col("na"), 6).as("containment"))
        .where(col("containment") >= tau)
    }
    for (tau <- Seq(0.5, 0.8, 1.0)) {
      val exact = full(tau)
      val got = Dedup.containmentJoin(excerpts, "doc_id", "text",
        real, "doc_id", "text", n = 3, minContainment = tau,
        candDfCap = 0)
      assert(got.exceptAll(exact).isEmpty && exact.exceptAll(got).isEmpty,
        s"pigeonhole path diverged from the full join at tau=$tau")
      assert(exact.count() > 0, s"no containment pairs at tau=$tau")
    }
  }

  test("corpusDiff labels added/removed/changed/unchanged; changedDocs is the work-list") {
    import spark.implicits._
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val nw = Seq((1L, "alpha"), (2L, "beta v2"), (4L, "delta"))
      .toDF("doc_id", "text")
    val d = graft.ops.Snapshots.corpusDiff(old, nw, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    val wl = graft.ops.Snapshots.changedDocs(old, nw, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(wl == Map(2L -> "beta v2", 4L -> "delta"))
  }

  test("jaccardPairsPrefix equals the full self-join on fixture and real corpus") {
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_a"), col("doc_b"), round(col("jaccard"), 9).as("j"))
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val full = norm(Dedup.jaccardPairs(docs, "doc_id", "text", 3, t))
      val pref = norm(Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, t))
      assert(pref.except(full).isEmpty && full.except(pref).isEmpty,
        s"prefix-filtered result diverged at threshold $t")
    }
    val real = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val full = norm(Dedup.jaccardPairs(real, "doc_id", "text", 3, 0.5))
    val pref = norm(Dedup.jaccardPairsPrefix(real, "doc_id", "text", 3, 0.5))
    assert(pref.except(full).isEmpty && full.except(pref).isEmpty)
    assert(full.count() > 0, "real corpus should contain near-dups")
  }

  test("lineDedup keeps only the first occurrence; short lines exempt") {
    import spark.implicits._
    val boiler = "All rights reserved by the publisher."
    val docs = Seq(
      (1L, s"unique opening line one\n$boiler\nEnd."),
      (2L, s"$boiler\nsecond doc body line here\nEnd."),
      (3L, s"unique opening line one\nthird doc body line here\n$boiler"))
      .toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, "doc_id", "text", minDupChars = 15)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // boiler survives only in doc 1; "unique opening line one" (23
    // chars, duplicated in doc 3) survives only in doc 1; "End." (4
    // chars < 15) survives everywhere it appears
    assert(got(1L) == ((s"unique opening line one\n$boiler\nEnd.", 3L, 0L)))
    assert(got(2L) == (("second doc body line here\nEnd.", 2L, 1L)))
    assert(got(3L) == (("third doc body line here", 1L, 2L)))
  }

  test("lineDedup: intra-document repeats collapse to the earliest line") {
    import spark.implicits._
    val docs = Seq((5L,
      "repeated chorus line text\nbridge verse\nrepeated chorus line text"))
      .toDF("doc_id", "text")
    val r = Dedup.lineDedup(docs, "doc_id", "text").collect().head
    assert(r.getString(1) == "repeated chorus line text\nbridge verse")
    assert(r.getLong(2) == 2L && r.getLong(3) == 1L)
  }

  test("lineDedup: a doc whose every line is a later duplicate empties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the one and only long line"),
      (2L, "the one and only long line")).toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "the one and only long line" && got(2L) == "")
  }
}
