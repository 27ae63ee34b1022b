package graft

import org.apache.spark.sql.functions._

import graft.ops.{CorpusClean, Skew}

class CorpusCleanSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over the lazy dog and then the dog " +
    "sleeps in a field of tall grass while the fox runs away to find food"

  test("clean removes exact dups, gated docs, and near-dups") {
    val docs = Seq(
      (1L, good),
      (2L, good),                                   // exact dup -> dropped
      (3L, good.replace("brown", "red")),           // near dup -> dropped
      (4L, "too short"),                            // length gate
      (5L, "zz qq ww " * 10),                       // stopword gate (no en words)
      (6L, "the sun rises over a quiet mountain village and the people " +
        "wake up to begin a long day of work in the green valley below them")
    ).toDF("doc_id", "text")
    // one word changed in ~27 -> 3-gram jaccard ~0.79; gate at 0.7
    val kept = CorpusClean.clean(docs, "doc_id", "text",
        CorpusClean.Config(nearDupThreshold = 0.7))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 6L))
    // the O(log n) star-contraction clustering keeps the same corpus
    val keptStar = CorpusClean.clean(docs, "doc_id", "text",
        CorpusClean.Config(nearDupThreshold = 0.7, starComponents = true))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptStar == kept)
  }

  test("incrementalAppend adds only novel clean docs, never re-cleans corpus") {
    val corpus = Seq((1L, good)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, good),            // content already in corpus -> dropped
      (11L, "too short"),     // fails the quality gate -> dropped
      (12L, "the sun rises over a quiet mountain village and the people " +
        "wake up to begin a long day of work in the green valley below them")
    ).toDF("doc_id", "text")
    val grown = CorpusClean.incrementalAppend(corpus, batch, "doc_id", "text",
      CorpusClean.Config(nearDupThreshold = 0.7))
    val ids = grown.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 12L))
    // idempotent: replaying the same batch grows nothing
    val again = CorpusClean.incrementalAppend(grown, batch, "doc_id", "text",
      CorpusClean.Config(nearDupThreshold = 0.7))
    assert(again.count() == grown.count())
  }

  test("report counts stages") {
    val docs = Seq((1L, good), (2L, good), (3L, "x")).toDF("doc_id", "text")
    val r = CorpusClean.report(docs, "doc_id", "text")
    assert(r("input") == 3 && r("after_exact_dedup") == 2 && r("after_all") == 1)
  }

  test("saltedAgg equals plain aggregation") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i.toDouble))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum($"v").as("s"), count(lit(1)).as("n"))
    val salted = Skew.saltedAgg(df, Seq("k"), $"v", buckets = 8,
      Map("s" -> ((c: org.apache.spark.sql.Column) => sum(c),
                  (c: org.apache.spark.sql.Column) => sum(c)),
          "n" -> ((c: org.apache.spark.sql.Column) => count(c),
                  (c: org.apache.spark.sql.Column) => sum(c))),
      "v")
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("saltedJoin equals plain join") {
    val fact = (1 to 500).map(i => (i % 5, i.toDouble)).toDF("k", "v")
    val dim = Seq((0, "a"), (1, "b"), (2, "c"), (3, "d"), (4, "e")).toDF("k", "name")
    val plain = fact.join(dim, "k").select("k", "v", "name")
    val salted = Skew.saltedJoin(fact, dim, "k", buckets = 4, saltOn = $"v")
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("graft functions are callable from pure SQL once registered") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
      "word_shingles(array('a','b','c'), 2) AS sh")
      .head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getSeq[String](1) == Seq("a b", "b c"))
    val r2 = spark.sql(
      "SELECT simhash32(array('x','y')) AS sh, " +
      "year_week(DATE '2025-01-06') AS yw, " +
      "fingerprint('hello world') AS fp, " +
      "z_order2(3, 5) AS z").head()
    // same values as the Column-API forms
    assert(r2.getLong(0) ==
      graft.ops.Dedup.simhash(
        Seq((1L, "x y")).toDF("id", "t"), "id", "t").head().getLong(1))
    assert(r2.getString(1) == "2025-01")
    assert(r2.getLong(2) > 0)
    assert(r2.getLong(3) == 39L)
  }

  test("HammingZeroToEquality rewrites bit_count(xor)<=0 to equality, same rows") {
    GraftExtensions.register(spark)
    val df = Seq((1L, 5L), (2L, 5L), (3L, 7L), (4L, 5L))
      .toDF("id", "sig")
    val a = df.select($"id".as("ida"), $"sig".as("sa"))
    val b = df.select($"id".as("idb"), $"sig".as("sb"))
    val q = a.join(b, $"ida" < $"idb"
      && bit_count($"sa".bitwiseXOR($"sb")).cast("long") <= 0)
    // the rule turns the hamming test into sa = sb, which lets the
    // planner use an EQUI join instead of a nested loop
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("(sa#") && !optimized.toLowerCase.contains("bit_count"),
      optimized)
    val rows = q.select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(q.queryExecution.executedPlan.toString.contains("HashJoin"),
      "equality should plan a hash join")
  }

  test("canonicalize keeps the highest-quality member per near-dup cluster") {
    // 1 and 2 near-identical (2 longer); 3 unrelated singleton
    val base = (1 to 40).map(i => s"tok$i common words the a of and to in is").mkString(" ")
    val docs = Seq(
      (1L, base, base.length.toLong),
      (2L, base + " extra tail words", base.length.toLong + 17),
      (3L, (1 to 40).map(i => s"zz$i qq$i").mkString(" "), 100L)
    ).toDF("doc_id", "text", "n_chars")
    val out = graft.ops.CorpusClean.canonicalize(docs, "doc_id", "text",
        "n_chars", n = 3, threshold = 0.5)
      .orderBy("component").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 2L, 2L),   // cluster {1,2}: longer doc 2 survives, NOT min-id 1
      (3L, 3L, 1L)))  // singleton keeps itself
    // tie on score -> min id survives
    val tied = Seq(
      (5L, base, 10L), (4L, base, 10L)).toDF("doc_id", "text", "n_chars")
    val t2 = graft.ops.CorpusClean.canonicalize(tied, "doc_id", "text",
        "n_chars", 3, 0.5).collect()
    assert(t2.length == 1 && t2.head.getLong(1) == 4L)
  }

  test("filterLines applies the C4 line rules, preserves order, empties hopeless docs") {
    val docs = Seq(
      (1L, "Good first sentence here.\nno punct line here\nok\n" +
        "A second keeper, yes!\nbad brace { line here.\n" +
        "our COOKIE Policy applies today."),
      (2L, "everything fails\nshort\n{ }")).toDF("doc_id", "text")
    val out = graft.ops.CorpusClean.filterLines(docs, "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "Good first sentence here.\nA second keeper, yes!")
    assert(out(2L) == "")
    // row-preserving and idempotent
    val once = graft.ops.CorpusClean.filterLines(docs, "text")
    val twice = graft.ops.CorpusClean.filterLines(once, "text")
    assert(once.collect().map(_.getString(1)).toSeq ==
      twice.collect().map(_.getString(1)).toSeq)
    // optional knobs: punctuation requirement off keeps bare lines
    val lax = graft.ops.CorpusClean.filterLines(docs, "text",
      minWords = 2, requireTerminalPunct = false)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lax(1L).contains("no punct line here"))
  }
}
