package graft

import org.apache.spark.sql.functions._

/** [[graft.expressions.SuffixPrefixes]] must agree cell-for-cell with
  * the composed `explode(sequence(1, length(t)))` +
  * `substring(t, pos, k)` form it replaced in the q208 seed — for
  * ASCII, multibyte, tail-shorter-than-k, and single-char inputs. */
class SuffixPrefixesSpec extends SparkSpec {

  private def composed(texts: Seq[String], k: Int) = {
    import spark.implicits._
    texts.toDF("t")
      .withColumn("pos", explode(sequence(lit(1), length(col("t")))))
      .select(col("t"), col("pos"),
        expr(s"substring(t, pos, $k)").as("c"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSet
  }

  private def viaExpr(texts: Seq[String], k: Int) = {
    import spark.implicits._
    texts.toDF("t")
      .select(col("t"), posexplode(
        graft.expressions.SuffixPrefixes(col("t"), k)))
      .select(col("t"), (col("pos") + 1).as("pos"), col("col").as("c"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSet
  }

  private val corpus = Seq(
    "the quick brown fox jumps over the lazy dog",
    "aaaaaaaa",
    "x",
    "ab",
    "näïve café — déjà vu über straße", // 2-byte chars + punctuation
    "日本語のテキストです",                // 3-byte chars
    "mixed ascii と 日本語 and lätin")

  test("matches composed substring form for k=32 (the seed shape)") {
    assert(viaExpr(corpus, 32) == composed(corpus, 32))
  }

  test("matches composed substring form for k=2 (the bucket shape)") {
    assert(viaExpr(corpus, 2) == composed(corpus, 2))
  }

  test("matches composed substring form for k=1 and k > longest doc") {
    assert(viaExpr(corpus, 1) == composed(corpus, 1))
    assert(viaExpr(corpus, 500) == composed(corpus, 500))
  }

  test("empty string yields an empty array; NULL stays NULL") {
    import spark.implicits._
    val df = Seq(Some(""), None, Some("ok")).toDF("t")
      .select(col("t"),
        graft.expressions.SuffixPrefixes(col("t"), 4).as("a"))
      .orderBy(col("t"))
    val rows = df.collect()
    // NULL first under default ordering
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).getString(0) == "" && rows(1).getSeq[String](1).isEmpty)
    assert(rows(2).getSeq[String](1) == Seq("ok", "k"))
  }
}
