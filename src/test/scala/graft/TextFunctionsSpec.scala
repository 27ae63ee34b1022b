package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.head().get(0).asInstanceOf[T]

  test("tokens splits on runs of whitespace and trims") {
    val t = Seq("  the quick\t brown   fox ").toDF("s")
      .select(tokens($"s")).as[Seq[String]].head()
    assert(t == Seq("the", "quick", "brown", "fox"))
  }

  test("wordShingles produces distinct n-grams; short docs give empty") {
    val df = Seq("a b c d").toDF("s").select(wordShingles(tokens($"s"), 3))
    assert(df.as[Seq[String]].head() == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("s").select(wordShingles(tokens($"s"), 3))
    assert(short.as[Seq[String]].head().isEmpty)
  }

  test("custom WordShingles expression equals the composed-builtin fold") {
    val docs = graft.etl.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(tokens($"text").as("w"))
    val diff = docs.select(
        wordShingles($"w", 3).as("fast"), wordShinglesFold($"w", 3).as("ref"))
      .where($"fast" =!= $"ref")
    assert(diff.isEmpty)
    // dedup keeps first occurrence, matching array_distinct
    val rep = Seq("x y x y x y").toDF("s")
      .select(wordShingles(tokens($"s"), 2)).as[Seq[String]].head()
    assert(rep == Seq("x y", "y x"))
  }

  test("h32 matches an independently computed md5 prefix") {
    // md5("abc") = 900150983cd24fb0...; first 8 hex = 0x90015098
    val h = one[Long](Seq("abc").toDF("s").select(h32($"s")))
    assert(h == java.lang.Long.parseLong("90015098", 16))
  }

  test("bpeTokenEstimate sums ceil(len/4) per word") {
    // "hello"(2) + "hi"(1) + "abcdefgh"(2) = 5
    val e = one[Long](Seq("hello hi abcdefgh").toDF("s")
      .select(bpeTokenEstimate(tokens($"s"))))
    assert(e == 5L)
  }

  test("stopword and punct ratios") {
    val df = Seq("the cat, and dog!").toDF("s")
    val sw = one[Double](df.select(stopwordRatio(tokens($"s"))))
    assert(math.abs(sw - 2.0 / 4.0) < 1e-12)  // the, and of 4 tokens
    val pr = one[Double](df.select(punctRatio($"s")))
    assert(math.abs(pr - 2.0 / 17.0) < 1e-12) // ',' and '!'
  }

  test("langId picks the dominant stopword panel, unk when none") {
    val cases = Seq(
      ("the cat and the dog", "en"),
      ("el gato y la casa de que", "es"),
      ("les chats et des chiens", "fr"),
      ("zzz qqq www", "unk"))
    cases.foreach { case (txt, want) =>
      val got = one[String](Seq(txt).toDF("s").select(langId(tokens($"s"))))
      assert(got == want, s"'$txt' -> $got, want $want")
    }
  }

  test("fingerprint is stable and shifts only with content") {
    val f1 = one[Long](Seq("hello world this is a doc").toDF("s")
      .select(fingerprint($"s")))
    val f1b = one[Long](Seq("hello world this is a doc").toDF("s")
      .select(fingerprint($"s")))
    val f2 = one[Long](Seq("hello world this is another doc").toDF("s")
      .select(fingerprint($"s")))
    assert(f1 == f1b)
    // shared 5-gram minimum may coincide, but values must be in u32 range
    assert(f1 >= 0 && f1 <= 0xFFFFFFFFL && f2 >= 0)
  }

  test("charEntropy matches hand-computed values") {
    // "aaaa": one symbol -> 0. "ab": two equiprobable -> ln 2.
    assert(one[Double](Seq("aaaa").toDF("s").select(charEntropy($"s"))) == 0.0)
    val h2 = one[Double](Seq("ab").toDF("s").select(charEntropy($"s")))
    assert(math.abs(h2 - math.log(2)) < 1e-12)
    // "aab": p=2/3,1/3
    val h3 = one[Double](Seq("aab").toDF("s").select(charEntropy($"s")))
    val want = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(h3 - want) < 1e-12)
    assert(one[Double](Seq("").toDF("s").select(charEntropy($"s"))) == 0.0)
  }

  test("charEntropy expression equals the composed fold on corpus text") {
    val docs = graft.etl.Tables.table(spark, "/root/testdata/sf0.001",
      "documents")
    val both = docs.select(
      round(charEntropy($"text"), 9).as("fast"),
      round(charEntropyFold($"text"), 9).as("ref"))
    assert(both.where($"fast" =!= $"ref").isEmpty)
  }

  test("charEntropy counts astral-plane characters as single code points") {
    // U+1F600 (😀) is a surrogate pair in UTF-16; "😀😀" has ONE symbol
    val h = one[Double](Seq("😀😀").toDF("s")
      .select(charEntropy($"s")))
    assert(h == 0.0)
  }

  test("char_entropy is callable from SQL via GraftExtensions") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT char_entropy('ab') AS h").head().getDouble(0)
    assert(math.abs(r - math.log(2)) < 1e-12)
  }

  test("winnow_fingerprints is callable from SQL and matches the Column form") {
    GraftExtensions.register(spark)
    val txt = "the quick brown fox jumps over the lazy dog again"
    val viaSql = spark.sql(
        s"SELECT explode(winnow_fingerprints('$txt', 8, 4)) AS s")
      .select("s.pos", "s.fp")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaCol = graft.ops.Winnow.selectedFingerprints(
        Seq((1L, txt)).toDF("doc_id", "text"), "doc_id", "text")
      .select("pos", "fp")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSql == viaCol && viaSql.nonEmpty)
  }

  test("the full pipeline function surface is callable from pure SQL") {
    GraftExtensions.register(spark)
    def one(sql: String): Any = spark.sql(sql).head().get(0)
    // each row: (SQL invocation, expected value) — every registered
    // function reachable without a line of Scala
    assert(one("SELECT pre_tokens('it''s done')") ==
      Seq("it", "'s", " done"))
    assert(one("SELECT strip_markup('<p>hi &amp; bye</p>')") == "hi & bye")
    assert(one("SELECT normalize_unicode('café', 'NFC')") == "café")
    assert(one("SELECT normalize_unicode('Ａ', 'NFKC')") == "A")
    val q = one("SELECT quality_score('the cat sat on the mat')")
      .asInstanceOf[Double]
    assert(q > 0.0 && q <= 1.0)
    assert(one("SELECT stopword_ratio('the cat')") == 0.5)
    val pr = one("SELECT punct_ratio('ab!')").asInstanceOf[Double]
    assert(math.abs(pr - 1.0 / 3) < 1e-12)
    assert(one("SELECT lang_id('the cat and the dog')") == "en")
    assert(one("SELECT bpe_token_estimate('hello hi abcdefgh')") == 5L)
    assert(one("SELECT h32('abc')") ==
      java.lang.Long.parseLong("90015098", 16))
    assert(one("SELECT year_week(DATE'2024-01-01')") == "2024-01")
    assert(one("SELECT simhash32(array('a','b'))") != null)
    assert(one("SELECT fingerprint('hello world')") != null)
    assert(one("SELECT z_order2(1L, 2L)") != null)
    assert(one("SELECT word_shingles(array('a','b','c'), 2)") ==
      Seq("a b", "b c"))
    assert(one("SELECT dot_product(array(1.0F,2.0F), array(3.0F,4.0F))") ==
      11.0)
    assert(one("SELECT common_prefix_len('abcdef', 'abcxyz')") == 3L)
    assert(one("SELECT redact_pii('mail bob@ex.io now')") ==
      "mail [EMAIL] now")
    assert(one("SELECT redact_pii_full('ssn 219-09-9999 ok')") ==
      "ssn [SSN] ok")
    assert(one("SELECT canonical_url('HTTP://Ex.ORG:80/a?utm_source=x&b=1#f')")
      == "http://ex.org/a?b=1")
    assert(one("SELECT url_host('https://WWW.Ex.org/x')") == "www.ex.org")
    assert(one("SELECT registrable_domain('a.b.example.com')") ==
      "example.com")
  }

  test("preTokens splits like a GPT-2-style pre-tokenizer; pieces rebuild the text") {
    import graft.functions.TextFunctions.preTokens
    val cases = Seq(
      "hello world" -> Seq("hello", " world"),
      "it's done" -> Seq("it", "'s", " done"),
      "a1b2" -> Seq("a", "1", "b", "2"),
      // no lookahead in the RE2-compatible subset: a multi-space run
      // stays one whitespace piece (GPT-2's \s+(?!\S) would split it)
      "x  y" -> Seq("x", "  ", "y"),
      "end." -> Seq("end", "."),
      "price: $5.99!" -> Seq("price", ":", " $", "5", ".", "99", "!"))
    val got = cases.map(_._1).toDF("s")
      .select(preTokens($"s").as("p")).as[Seq[String]].collect()
    cases.zip(got).foreach { case ((in, want), gotP) =>
      assert(gotP == want, s"'$in' -> $gotP, want $want")
      // lossless: concatenating pieces rebuilds the input
      assert(gotP.mkString == in)
    }
  }

  test("lshTune picks the production shapes; S-curve behaves") {
    import graft.ops.Dedup
    // 128 perms at t=0.5 -> the q65 production 32x4 shape
    val (b1, r1, mid1) = Dedup.lshTune(128, 0.5)
    assert((b1, r1) == ((32, 4)), s"got ($b1, $r1)")
    assert(math.abs(mid1 - math.pow(1.0 / 32, 0.25)) < 1e-12)
    // higher threshold -> fewer, wider bands
    val (b2, r2, _) = Dedup.lshTune(128, 0.8)
    assert(b2 < b1 && r2 > r1)
    // curve: near-certain above the midpoint, steep falloff below
    assert(Dedup.lshCandidateProb(b1, r1, 0.8) > 0.95)
    assert(Dedup.lshCandidateProb(b1, r1, 0.2) < 0.2)
    // bands * rows always equals the permutation budget
    for (t <- Seq(0.3, 0.5, 0.7, 0.9); n <- Seq(8, 64, 128)) {
      val (b, r, _) = Dedup.lshTune(n, t)
      assert(b * r == n)
    }
  }

  test("stripMarkup drops tags, script/style bodies, comments") {
    def strip(s: String): String =
      one[String](Seq(s).toDF("s").select(stripMarkup($"s")))
    assert(strip("<p>hello <b>world</b></p>") == "hello world")
    // script/style BODIES go; tag-only removal would leave the code
    assert(strip("a<script>var x = 1 < 2;</script>b") == "a b")
    assert(strip("a<style>p { color: red }</style>b") == "a b")
    assert(strip("a<!-- secret\nnote -->b") == "a b")
    // tags are word boundaries, then whitespace collapses
    assert(strip("one<br>two<br/>three") == "one two three")
    // attributes, uppercase tags, multiline tags
    assert(strip("<A HREF=\"x\">link</A>") == "link")
    // a bare '<' that never closes is NOT a tag - stays
    assert(strip("1 < 2 and 3 > 2") == "1 < 2 and 3 > 2")
  }

  test("stripMarkup decodes entities one level, &amp; last") {
    def strip(s: String): String =
      one[String](Seq(s).toDF("s").select(stripMarkup($"s")))
    assert(strip("Tom &amp; Jerry") == "Tom & Jerry")
    assert(strip("&lt;tag&gt; &quot;q&quot; &#39;a&#39;") == "<tag> \"q\" 'a'")
    assert(strip("a&nbsp;b") == "a b")
    // double-escaped decodes exactly ONE level (&amp; runs last)
    assert(strip("&amp;lt;") == "&lt;")
  }

  test("stripMarkup removes zero-width characters") {
    def strip(s: String): String =
      one[String](Seq(s).toDF("s").select(stripMarkup($"s")))
    assert(strip("a​b‌c‍d﻿e") == "abcde")
    // so invisible-char variants of the same text hash identically
    assert(strip("dup​ text") == strip("dup text"))
  }

  test("normalizeNfc composes; normalizeNfkc also folds compatibility") {
    def nfc(s: String): String =
      one[String](Seq(s).toDF("s").select(normalizeNfc($"s")))
    def nfkc(s: String): String =
      one[String](Seq(s).toDF("s").select(normalizeNfkc($"s")))
    // e + combining acute (2 code points) -> precomposed é (1)
    assert(nfc("café") == "café")
    assert(nfc("café") == "café") // already-normalized fast path
    // NFC preserves compatibility characters; NFKC folds them
    assert(nfc("Ａﬁ") == "Ａﬁ") // fullwidth A, fi ligature
    assert(nfkc("Ａﬁ") == "Afi")
    assert(nfkc("café") == "café")
    // NULL passes through
    val n = Seq(Option.empty[String]).toDF("s").select(normalizeNfkc($"s"))
    assert(n.head().isNullAt(0))
  }

  test("normalizeText wires strip+NFKC ahead of the corpus gates") {
    import graft.ops.CorpusClean
    val cfg = CorpusClean.Config(stripMarkup = true,
      normalizeForm = Some("NFKC"))
    val docs = Seq(
      (1L, "<p>café &amp; Ａ</p>"),
      (2L, "café & A")).toDF("doc_id", "text")
    val out = CorpusClean.normalizeText(docs, "text", cfg)
      .select($"text").as[String].collect()
    assert(out(0) == out(1)) // variants converge -> exact dedup catches them
    assert(out(0) == "café & A")
  }
}
