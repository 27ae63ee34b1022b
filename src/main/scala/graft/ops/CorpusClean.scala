package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Composite training-corpus cleaning pipeline — the end-to-end shape a
  * 100 TB text-data preparation job takes, assembled from the graft
  * primitives:
  *
  *   1. exact dedup (content hash, min-id keeper)          — one shuffle
  *   2. quality gate (length / stopword / punctuation)     — narrow, no shuffle
  *   3. language gate                                      — narrow, no shuffle
  *   4. near-dedup via MinHash+LSH: of every verified
  *      near-dup pair, the larger id is dropped            — bounded pair join
  *
  * Stage order is deliberate: narrow filters run before the expensive
  * near-dup stage so LSH sees only surviving documents.
  */
object CorpusClean {

  final case class Config(
    minTokens: Int = 20,
    maxTokens: Int = 100000,
    minStopwordRatio: Double = 0.01,
    maxPunctRatio: Double = 0.3,
    langs: Set[String] = Set("en"),
    shingleSize: Int = 3,
    nearDupThreshold: Double = 0.8,
    /** Use large-star/small-star CC (O(log n) rounds) for the
      * transitive near-dup clusters instead of min-label propagation —
      * the web-scale switch when chains can run long. */
    starComponents: Boolean = false,
    /** Strip HTML/markup (tags, script/style bodies, entities,
      * zero-width chars) from the text column BEFORE the quality
      * gates — the raw-web-corpus entry path. Off by default: curated
      * inputs (the gated q105/q120 corpora) are already plain text. */
    stripMarkup: Boolean = false,
    /** Unicode-normalize the text column (NFC/NFKC/NFD/NFKD) before
      * the gates, after markup stripping. NFKC is the training-data
      * convention; None skips. */
    normalizeForm: Option[String] = None)

  /** The raw-text entry transform of the pipeline: markup stripping
    * then Unicode normalization, per [[Config]]. Rewrites `textCol` in
    * place (downstream stages see the cleaned text). Both legs are
    * narrow per-row projections — no shuffle, scan-speed at 100 TB. */
  def normalizeText(docs: DataFrame, textCol: String,
      cfg: Config): DataFrame = {
    val stripped =
      if (cfg.stripMarkup)
        docs.withColumn(textCol, stripMarkup(col(textCol)))
      else docs
    cfg.normalizeForm.fold(stripped) { form =>
      stripped.withColumn(textCol,
        graft.expressions.NormalizeUnicode(col(textCol), form))
    }
  }

  /** C4-style LINE-level cleaning (Raffel et al. 2020 §2.2's rules at
    * line granularity): keep only lines that have at least `minWords`
    * tokens, end in terminal punctuation (when required), contain no
    * curly brace (code/markup tell), and contain none of the
    * lowercased `blockPhrases` (boilerplate tells like "lorem ipsum").
    * Survivors reassemble in order, newline-joined; a doc whose every
    * line fails becomes the empty string. Row-preserving: output =
    * input with `textCol` rewritten.
    *
    * Scale shape: one higher-order `filter` over the split-line array
    * per row — a pure narrow projection, NO explode/groupBy
    * round-trip and no shuffle; the lambda touches only its line
    * argument (an outer-capture lambda would fall off the fast path,
    * the q127 lesson). */
  def filterLines(docs: DataFrame, textCol: String, minWords: Int = 3,
      requireTerminalPunct: Boolean = true,
      blockPhrases: Seq[String] =
        Seq("lorem ipsum", "cookie policy", "terms of use")): DataFrame = {
    require(minWords >= 0, "minWords must be >= 0")
    val kept = filter(split(col(textCol), "\n"), l => {
      val t = trim(l)
      val wordsOk = size(split(t, "\\s+")) >= minWords
      val punctOk =
        if (requireTerminalPunct) t.rlike("[.!?]$") else lit(true)
      val braceOk = !t.contains("{") && !t.contains("}")
      val phraseOk = blockPhrases.map(_.toLowerCase)
        .foldLeft(lit(true))((acc, p) => acc && !lower(t).contains(p))
      wordsOk && punctOk && braceOk && phraseOk
    })
    docs.withColumn(textCol, array_join(kept, "\n"))
  }

  /** The narrow quality/language gates of [[clean]] alone (no dedup):
    * length band, stopword floor, punctuation ceiling, language
    * allowlist — all per-row projections, no shuffle. Exposed so
    * composite pipelines (e.g. the q120 training-prep gate) can reuse
    * the exact gate the cleaner applies. */
  def gate(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame =
    normalizeText(docs, textCol, cfg)
      .withColumn("__w", tokens(col(textCol)))
      .where(size(col("__w")).between(cfg.minTokens, cfg.maxTokens))
      .where(stopwordRatio(col("__w")) >= cfg.minStopwordRatio)
      .where(punctRatio(col(textCol)) <= cfg.maxPunctRatio)
      .where(langId(col("__w")).isInCollection(cfg.langs))
      .drop("__w")

  /** Returns the cleaned corpus (same schema as input, text rewritten
    * by the normalize leg when enabled). Normalization runs ONCE and
    * FIRST — before exact dedup, so markup-only and encoding-only
    * variants hash identically (the reason the normalize leg exists) —
    * and is disabled inside the gate call because entity decoding is
    * not idempotent (`&amp;lt;` must decode exactly one level). */
  def clean(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val normalized = normalizeText(docs, textCol, cfg)
    val deduped = Dedup.dropExactDuplicates(normalized, idCol, textCol)

    // gated feeds the LSH pipeline (three scans: signatures + both
    // verification sides) AND the final survivor anti-join — truncate
    // so normalize + the exact-dedup window + the quality gates run
    // once, not once per consumer (blocks freed by the caller's sweep)
    val gated = graft.etl.Checkpoints.truncate(
      gate(deduped, idCol, textCol,
        cfg.copy(stripMarkup = false, normalizeForm = None)))

    // transitive clustering: one survivor per chained near-dup group
    val pairs = Dedup.minhashNearDups(gated, idCol, textCol,
      cfg.shingleSize, cfg.nearDupThreshold)
    val components =
      if (cfg.starComponents) Dedup.connectedComponentsStar(pairs)
      else Dedup.nearDupComponents(pairs)
    val losers = components.where(col("id") =!= col("component"))
      .select(col("id")).withColumnRenamed("id", idCol)

    gated.join(losers, Seq(idCol), "left_anti")
  }

  /** Incremental corpus growth: clean `batch` in isolation, then drop
    * batch docs whose CONTENT already exists in the corpus (hash
    * anti-join — one shuffle on the 16-byte hash, never on text) and
    * append the survivors. The continuous-ingest shape: the standing
    * corpus is never re-cleaned, each arriving batch pays only its own
    * cleaning plus one anti-join against corpus hashes. */
  def incrementalAppend(corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, cfg: Config = Config()): DataFrame = {
    val cleanedBatch = clean(batch, idCol, textCol, cfg)
    val corpusHashes = corpus.select(md5(col(textCol)).as("__h")).distinct()
    val novel = cleanedBatch
      .withColumn("__h", md5(col(textCol)))
      .join(corpusHashes, Seq("__h"), "left_anti")
      .drop("__h")
    corpus.unionByName(novel)
  }

  /** Near-dup survivorship with a QUALITY policy (entity-resolution
    * canonicalization): cluster documents by transitive LSH near-dup
    * pairs, then keep, per cluster, the document maximizing
    * `scoreCol` (ties → minimum id) — the "best copy wins" rule a
    * curation pipeline wants where [[clean]]'s min-id rule is
    * arbitrary. Documents in no pair are their own singleton
    * clusters. One max_by aggregation per cluster — no per-cluster
    * sort. Output: (component, survivor_id, n_members). */
  def canonicalize(docs: DataFrame, idCol: String, textCol: String,
      scoreCol: String, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val pairs = Dedup.minhashNearDups(docs, idCol, textCol, n, threshold)
    val comps = Dedup.nearDupComponents(pairs)
    val membership = docs.select(col(idCol).as("id"), col(scoreCol))
      .join(comps, Seq("id"), "left")
      .withColumn("component", coalesce(col("component"), col("id")))
    membership.groupBy(col("component"))
      .agg(max_by(col("id"),
          struct(col(scoreCol), (-col("id")).as("__neg"))).as("survivor_id"),
        count(lit(1)).as("n_members"))
  }

  /** Per-stage survival counts (diagnostic; triggers jobs). */
  def report(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): Map[String, Long] = {
    val deduped = Dedup.dropExactDuplicates(docs, idCol, textCol)
    val cleaned = clean(docs, idCol, textCol, cfg)
    Map(
      "input" -> docs.count(),
      "after_exact_dedup" -> deduped.count(),
      "after_all" -> cleaned.count())
  }
}
