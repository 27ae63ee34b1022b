package graft

import org.apache.spark.sql.functions._

import graft.ops.LangModel

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("bigramModel counts match hand-computed values") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("id", "text")
    // bigrams: d1: (a,b),(b,a),(a,b); d2: (a,b),(b,c)
    val m = LangModel.bigramModel(docs, "id", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(m(("a", "b")) == ((3L, 3L))) // c12=3, context a appears 3x
    assert(m(("b", "a")) == ((1L, 2L))) // context b appears 2x
    assert(m(("b", "c")) == ((1L, 2L)))
  }

  test("perplexity matches a hand-computed add-k estimate") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("id", "text")
    // V = 2 contexts (a, b); k = 0.5
    // d2 bigrams: (a,b): (3+0.5)/(3+1)=0.875 ; (b,c): (1+0.5)/(2+1)=0.5
    val logp = (math.log(0.875) + math.log(0.5)) / 2
    val expPpl = math.exp(-logp)
    val r = LangModel.perplexity(docs, "id", "text", k = 0.5)
      .where($"id" === 2L).head()
    assert(r.getAs[Long]("n_bigrams") == 2L)
    assert(math.abs(r.getAs[Double]("avg_logp") - logp) < 1e-6)
    assert(math.abs(r.getAs[Double]("ppl") - expPpl) < 1e-5)
  }

  test("predictable text scores lower perplexity than shuffled text") {
    val repetitive = ("the cat sat on the mat " * 20).trim
    // same token multiset, scrambled order (deterministic shuffle)
    val scrambled = new scala.util.Random(7)
      .shuffle(repetitive.split(" ").toList).mkString(" ")
    val filler = Seq.tabulate(20)(i => (100L + i,
      s"background text variant $i with some shared phrasing and word salad $i"))
    val docs = ((1L, repetitive) +: (2L, scrambled) +: filler).toDF("id", "text")
    val ppl = LangModel.perplexity(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("ppl")).toMap
    assert(ppl(1L) < ppl(2L),
      s"repetitive ${ppl(1L)} should beat scrambled ${ppl(2L)}")
  }

  test("persisted-model scoring equals the self-scored plan") {
    val docs = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .limit(100)
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toString
    LangModel.bigramModel(docs, "doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/model")
    val model = spark.read.parquet(s"$dir/model")
    val vocab = model.agg(countDistinct(col("w1")).as("__v"))
    val indexed = LangModel.perplexityWithModel(docs, "doc_id", "text",
      model, vocab)
    val inline = LangModel.perplexity(docs, "doc_id", "text")
    assert(indexed.except(inline).isEmpty && inline.except(indexed).isEmpty)
  }

  test("Kneser-Ney matches hand-computed discounted probabilities") {
    import spark.implicits._
    // corpus: doc1 "a b a b", doc2 "a c"
    // types: (a,b) c12=2; (b,a) 1; (a,c) 1 -> c1(a)=3, c1(b)=1
    // N1+(a.)=2, N1+(b.)=1; N1+(.b)=N1+(.a)=N1+(.c)=1; T=3, V=3
    // Pcont = 1.5/5 = 0.3 for all three continuations; d=0.75:
    //   P(b|a) = 1.25/3 + (0.75*2/3)*0.3
    //   P(a|b) = 0.25/1 + (0.75*1/1)*0.3
    //   P(c|a) = 0.25/3 + (0.75*2/3)*0.3
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = LangModel.knPerplexity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    val pBA = 1.25 / 3 + (0.75 * 2 / 3) * 0.3
    val pAB = 0.25 + 0.75 * 0.3
    val pCA = 0.25 / 3 + (0.75 * 2 / 3) * 0.3
    val d1 = (2 * math.log(pBA) + math.log(pAB)) / 3
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2 - d1) < 1e-6, s"got ${out(1L)._2} want $d1")
    assert(out(2L)._1 == 1L)
    assert(math.abs(out(2L)._2 - math.log(pCA)) < 1e-6)
    // discounted mass conservation (unsmoothed Pcont sums to 1 over
    // the three continuations, so sum over seen+backoff stays < 1
    // only through the +0.5 smoothing): all probabilities in (0,1)
    assert(Seq(pBA, pAB, pCA).forall(p => p > 0 && p < 1))
  }
}
