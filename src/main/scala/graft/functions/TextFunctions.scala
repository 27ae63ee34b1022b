package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data
  * pipelines: tokenization, shingling, deterministic 32-bit content
  * hashing, token-count estimation, stopword/quality heuristics.
  *
  * Everything is composed from Spark built-ins (codegen'd, no UDFs) and
  * is bit-reproducible against an independent SQL engine: hashes derive
  * from md5 hex (identical everywhere) rather than engine-private hash
  * functions.
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** GPT-2-style regex pre-tokenization pattern, simplified to the
    * RE2-compatible subset (no lookahead, ASCII classes) so the SAME
    * pattern runs bit-identically in Spark (java.util.regex) and the
    * DuckDB oracle (RE2): contraction suffixes, space-prefixed
    * letter/digit/symbol runs, whitespace runs. The piece boundaries
    * a subword tokenizer (BPE) never merges across. */
  val PreTokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"

  /** Pre-tokenizer pieces of `text` (array of strings, in order) —
    * the tokenizer-fidelity view of a document, vs the whitespace
    * [[tokens]] used for shingles/stats. */
  def preTokens(text: Column): Column =
    regexp_extract_all(text, lit(PreTokenPattern), lit(0))

  /** Distinct word n-gram shingles, joined with single spaces. Empty
    * array when the document has fewer than n tokens. Evaluated by the
    * flat-loop custom expression (see
    * [[graft.expressions.WordShingles]]); [[wordShinglesFold]] is the
    * composed-built-ins reference form, asserted equal in specs. */
  def wordShingles(toks: Column, n: Int): Column =
    graft.expressions.WordShingles(toks, n)

  def wordShinglesFold(toks: Column, n: Int): Column = {
    val sh = transform(sequence(lit(1), size(toks) - lit(n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*))
    when(size(toks) >= n, array_distinct(sh))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct character n-gram shingles. */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) >= n,
      array_distinct(transform(sequence(lit(1), length(text) - lit(n - 1)),
        i => text.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Deterministic unsigned 32-bit hash: the first 8 hex digits of
    * md5. Engine-portable (DuckDB: `('0x'||substr(md5(s),1,8))::BIGINT`)
    * unlike Spark's Murmur `hash()`. */
  def h32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** LCG permutations for MinHash: h -> (a*h + b) mod M. Constants are
    * classic LCG multipliers; M = 2^31-1 keeps a*h inside a 64-bit long
    * for 32-bit h in every engine. */
  val MinhashMod = 2147483647L
  val MinhashPerms: Seq[(Long, Long)] = Seq(
    (1664525L, 1013904223L), (22695477L, 1L), (1103515245L, 12345L),
    (134775813L, 1L), (214013L, 2531011L), (69069L, 7L),
    (48271L, 11L), (16807L, 3L))

  def minhashPerm(h: Column, a: Long, b: Long): Column =
    (lit(a) * h + lit(b)) % lit(MinhashMod)

  /** First `n` MinHash permutations: the classic 8-entry table first
    * (the oracle-gated defaults), then md5-derived constants — fully
    * deterministic, no RNG state. Multipliers stay below 2^30 so
    * a*h fits a 64-bit long for 32-bit h. */
  def minhashPermsFor(n: Int): Seq[(Long, Long)] = {
    require(n > 0, "need at least one MinHash permutation")
    def h56(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.take(7).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    MinhashPerms.take(n) ++ (MinhashPerms.length until n).map { i =>
      val a = (h56(s"minhash:a:$i") % ((1L << 30) - 1)) + 1
      val b = h56(s"minhash:b:$i") % MinhashMod
      (a, b)
    }
  }

  /** HTML/markup stripping — the raw-web-corpus entry gate that runs
    * BEFORE tokenization and quality rules (tags inflate punctuation
    * ratios and script bodies pollute the token stream). The chain is
    * built only from `regexp_replace`/`replace` with RE2-compatible
    * patterns (inline `(?s)`, lazy quantifiers, `\x{...}` classes — no
    * lookahead, no backreferences) so the IDENTICAL patterns run in the
    * DuckDB oracle:
    *
    *   1. `<script>`/`<style>` elements drop with their BODY (code and
    *      CSS are not prose),
    *   2. comments `<!-- -->` and remaining tags become a space (tags
    *      are word boundaries: `a<br>b` is two words),
    *   3. a fixed entity table decodes literally — `&amp;` LAST so
    *      double-escaped text (`&amp;lt;`) decodes one level per pass,
    *      the HTML5 semantics,
    *   4. zero-width characters (ZWSP/ZWNJ/ZWJ/BOM) vanish — invisible
    *      codepoints that break exact dedup and fingerprinting,
    *   5. whitespace collapses to single spaces, trimmed.
    *
    * Everything is a narrow per-row projection (one codegen'd stage, no
    * shuffle) — at 100 TB this runs at scan speed. */
  def stripMarkup(text: Column): Column = {
    val noScript = regexp_replace(text,
      "(?s)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?s)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTag = regexp_replace(noComment, "</?[A-Za-z][^>]*>", " ")
    val entities = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTag) { case (c, (e, ch)) =>
      replace(c, lit(e), lit(ch))
    }
    val noZw = regexp_replace(decoded,
      "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]", "")
    trim(regexp_replace(noZw, "\\s+", " "))
  }

  /** Unicode NFC normalization (canonical compose: "e"+combining-acute
    * → "é") — the form DuckDB's `nfc_normalize` implements, used by the
    * oracle gate. See [[graft.expressions.NormalizeUnicode]]. */
  def normalizeNfc(text: Column): Column =
    graft.expressions.NormalizeUnicode(text, "NFC")

  /** Unicode NFKC normalization (compatibility compose: fullwidth
    * "Ａ" → "A", ligature "ﬁ" → "fi", plus everything NFC does) — the
    * training-pipeline convention (GPT-2/SentencePiece lineage): without
    * it visually-identical strings hash differently, so exact dedup
    * misses duplicates and the tokenizer vocabulary fragments. */
  def normalizeNfkc(text: Column): Column =
    graft.expressions.NormalizeUnicode(text, "NFKC")

  /** Number of whitespace tokens. */
  def tokenCount(toks: Column): Column = size(toks)

  /** BPE-ish subword token estimate: sum over words of ceil(len/4) —
    * the usual ~4-chars-per-token heuristic, exact on word boundaries. */
  def bpeTokenEstimate(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, w) => acc + ceil(length(w) / lit(4.0)))

  /** Default English stopword sample used by ratio/lang-id heuristics. */
  val EnStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val EsStopwords: Seq[String] = Seq("el", "la", "de", "que", "y", "en", "un")
  val FrStopwords: Seq[String] = Seq("le", "la", "de", "et", "un", "les", "des")

  /** Number of tokens contained in `words`. */
  def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Fraction of tokens that are stopwords of the given list. */
  def stopwordRatio(toks: Column, words: Seq[String] = EnStopwords): Column =
    hitCount(toks, words) / size(toks).cast("double")

  /** Fraction of characters that are punctuation (non-alnum, non-space). */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))) /
      length(text).cast("double")

  /** Composite document quality score in [0,1]: length saturation,
    * low punctuation, presence of function words. Heuristic weights in
    * the spirit of C4/Gopher-style quality filters. */
  def qualityScore(text: Column, toks: Column): Column =
    lit(0.5) * least(lit(1.0), size(toks) / lit(100.0)) +
      lit(0.3) * (lit(1.0) - punctRatio(text)) +
      lit(0.2) * least(lit(1.0), stopwordRatio(toks) * lit(5.0))

  /** N-gram-heuristic language ID over a fixed 3-language panel:
    * argmax of stopword hits, 'unk' when no list hits. Ties break
    * en > es > fr (deterministic). */
  def langId(toks: Column): Column = {
    val en = hitCount(toks, EnStopwords)
    val es = hitCount(toks, EsStopwords)
    val fr = hitCount(toks, FrStopwords)
    when(greatest(en, es, fr) === 0, lit("unk"))
      .when(en >= es && en >= fr, lit("en"))
      .when(es >= fr, lit("es"))
      .otherwise(lit("fr"))
  }

  /** Document fingerprint: minimum 32-bit hash over character 5-gram
    * shingles (a 1-permutation MinHash — the winnowing-style rolling
    * fingerprint collapsed to document grain). */
  def fingerprint(text: Column, n: Int = 5): Column =
    array_min(transform(charShingles(text, n), s => h32(s)))

  /** Shannon entropy (nats) over the string's code points: a
    * single-pass custom expression (the composed form would explode
    * one row PER CHARACTER through two aggregations — see
    * [[graft.expressions.CharEntropy]]). */
  def charEntropy(text: Column): Column =
    graft.expressions.CharEntropy(text)

  /** The composed-built-ins reference form of [[charEntropy]] (split →
    * per-char histogram inside aggregate() — asserted equal in
    * TextFunctionsSpec; kept as the semantic cross-check, not for the
    * hot path). */
  def charEntropyFold(text: Column): Column = {
    val chars = split(text, "") // per code point, like DuckDB's ''-split
    val n = size(chars).cast("double")
    val hist = aggregate(
      array_distinct(chars), lit(0.0),
      (acc, c) => {
        val k = size(filter(chars, x => x === c)).cast("double")
        acc - (k / n) * log(k / n)
      })
    when(length(text) === 0, lit(0.0)).otherwise(hist)
  }
}
