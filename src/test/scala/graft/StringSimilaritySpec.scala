package graft

import org.apache.spark.sql.functions._

import graft.expressions.StringSimilarity

class StringSimilaritySpec extends SparkSpec {

  // Golden values obtained from DuckDB 1.x jaro_winkler_similarity /
  // damerau_levenshtein (tools/oracle_check.py's engine) — classic
  // textbook cases (martha/marhta, DWAYNE/DUANE, DIXON/DICKSONX) plus
  // a seeded random sweep across lengths 1..14.
  private val golden = Seq(
    ("martha", "marhta", 0.9611111111111111, 1L),
    ("DWAYNE", "DUANE", 0.8400000000000001, 2L),
    ("DIXON", "DICKSONX", 0.8133333333333332, 4L),
    ("a", "a", 1.0, 0L),
    ("ab", "ba", 0.0, 1L),
    ("CRATE", "TRACE", 0.7333333333333334, 2L),
    ("CA", "ABC", 0.0, 2L), // full-DL 2 (OSA would say 3)
    ("aaaaaaaaaa", "aaaaaaaaab", 0.96, 1L),
    ("prefixzzzz", "prefixyyyy", 0.8400000000000001, 4L),
    ("ab", "abcdefgh", 0.8, 6L),
    ("abcdef", "abdcfe", 0.9111111111111111, 2L),
    ("Supplier#000000001", "Supplier#000000012", 0.9777777777777777, 2L),
    ("cg ab2", "bfZa3Ydab", 0.4259259259259259, 8L),
    ("gbdbYga", "Zbd  ZaZZgadaY", 0.5357142857142857, 10L),
    ("cegcYbZeY2 cbZ", " dfbY0bZaZ", 0.48571428571428577, 11L),
    ("X Yg", "fXZ3Xfed1c01d", 0.4423076923076923, 12L),
    ("Ze", "X3f0XeZbb", 0.0, 8L),
    ("gc1fc3Xga", "b1YZ132ff0f", 0.42424242424242414, 10L),
    ("XZ1Xb2beX0", "ba00e Z 2Xe", 0.5045454545454545, 10L),
    ("g3 faXfcZbXa", "1ec0", 0.4444444444444444, 11L),
    ("gg32", "bcXgYe3c", 0.4583333333333333, 6L),
    ("g2Ye0gf 3gdcbc", "d d", 0.4682539682539682, 12L),
    ("X", "ZceeacgYfZZfc0", 0.0, 14L),
    ("YZ  0aX3212 1Y", "gggbX g", 0.30952380952380953, 12L),
    ("d", "dX", 0.8500000000000001, 1L),
    ("bfZ", "b", 0.7999999999999999, 2L),
    ("Z", "Ybf", 0.0, 3L),
    ("ab2dZgc ef", "fXbb2XXXXe", 0.5333333333333333, 9L),
    ("cb", "f0eX20cYadYf", 0.0, 11L),
    ("0Y3", "1", 0.0, 3L))

  test("jaro_winkler and damerau_levenshtein match the DuckDB golden set") {
    import spark.implicits._
    val df = golden.map(g => (g._1, g._2)).toDF("a", "b")
    val out = df.select(
        StringSimilarity.jaroWinkler(col("a"), col("b")).as("jw"),
        StringSimilarity.damerauLevenshtein(col("a"), col("b")).as("dl"))
      .collect()
    golden.zip(out).foreach { case ((a, b, jw, dl), row) =>
      assert(row.getDouble(0) == jw, s"jw($a, $b)")
      assert(row.getLong(1) == dl, s"dl($a, $b)")
    }
  }

  test("both are symmetric, null-safe, and SQL-registered") {
    import spark.implicits._
    val df = golden.map(g => (g._1, g._2)).toDF("a", "b")
    val sym = df.select(
        (StringSimilarity.jaroWinkler(col("a"), col("b")) ===
          StringSimilarity.jaroWinkler(col("b"), col("a"))).as("js"),
        (StringSimilarity.damerauLevenshtein(col("a"), col("b")) ===
          StringSimilarity.damerauLevenshtein(col("b"), col("a"))).as("ds"))
      .collect()
    assert(sym.forall(r => r.getBoolean(0) && r.getBoolean(1)))
    val nulls = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(StringSimilarity.jaroWinkler(col("a"), col("b")).as("jw"),
        StringSimilarity.damerauLevenshtein(col("a"), col("b")).as("dl"))
      .head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS jw, " +
        "damerau_levenshtein('CA', 'ABC') AS dl").head()
    assert(viaSql.getDouble(0) == 0.9611111111111111 && viaSql.getLong(1) == 2L)
  }

  test("empty strings score 0 similarity and full-length distance") {
    import spark.implicits._
    val r = Seq(("", ""), ("abc", ""), ("", "xy")).toDF("a", "b")
      .select(StringSimilarity.jaroWinkler(col("a"), col("b")).as("jw"),
        StringSimilarity.damerauLevenshtein(col("a"), col("b")).as("dl"))
      .collect()
    assert(r.map(x => (x.getDouble(0), x.getLong(1))).toSeq ==
      Seq((0.0, 0L), (0.0, 3L), (0.0, 2L)))
  }
}
