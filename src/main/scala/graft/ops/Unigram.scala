package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.Checkpoints
import graft.functions.TextFunctions

/** Unigram language-model tokenizer (SentencePiece's model family —
  * Kudo 2018), the other half of the subword-tokenizer world next to
  * BPE ([[Vocab]]): pieces carry independent probabilities and a word's
  * tokenization is the MINIMUM-COST segmentation (cost = Σ −ln p) over
  * a piece lattice, trained by (hard/Viterbi) EM from a
  * substring-count seed.
  *
  * Spark-first shapes, all vocabulary-scale after the first pass:
  *  - the corpus is touched ONCE (token counts); everything downstream
  *    runs on the DISTINCT-WORD frame (Heaps-law scale, not corpus
  *    scale) weighted by word counts — the property that keeps
  *    training viable at 100 TB;
  *  - segmentation is a ROW-LOCAL codegen-stage DP
  *    ([[graft.expressions.UnigramSegment]]): the vocabulary is
  *    bounded by contract (top-V + alphabet — model parameters), so
  *    it ships with the task like any broadcast, and each word's
  *    lattice is O(len × maxPieceLen) local lookups with no
  *    cross-row dependency. The former formulation — one bounded
  *    join per position, `maxWordLen` Spark jobs — computed the
  *    identical recurrence but paid pure fixed scheduling cost per
  *    round at ANY corpus size (the iterated frame was already
  *    distinct-words, not corpus-scale);
  *  - the piece vocabulary collect is the SAME bounded set (one
  *    driver copy of the model, exactly like a tokenizer file).
  *
  * Ties between equal-cost segmentations break deterministically
  * toward the LONGEST LAST piece, recursively (backward recovery picks
  * the smallest split point whose prefix cost is exactly optimal).
  */
object Unigram {

  /** Distinct words + corpus counts (the one corpus-scale pass).
    * Words longer than `maxWordLen` are dropped — the documented
    * domain bound that caps every DP below (raise it for long-word
    * languages; cost grows linearly). */
  def wordCounts(docs: DataFrame, textCol: String,
      maxWordLen: Int): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .where(col("word") =!= "" && length(col("word")) <= maxWordLen)
      .groupBy("word").agg(count(lit(1)).as("wcnt"))

  /** Seed piece vocabulary: every substring of length ≤ `maxPieceLen`
    * of every word, weighted by word count; keep the top `topV` by
    * (count desc, piece asc) among multi-char pieces PLUS every single
    * character (full coverage — any word stays segmentable). Cost
    * score = −ln(cnt / total) with `total` summed over the KEPT
    * vocabulary. Output: (piece, cnt, score). */
  def seedVocab(words: DataFrame, maxPieceLen: Int, topV: Int): DataFrame = {
    require(maxPieceLen >= 1 && topV >= 1, "bounds must be positive")
    val subs = words
      .withColumn("i", explode(sequence(lit(1), length(col("word")))))
      .withColumn("l", explode(sequence(lit(1),
        least(lit(maxPieceLen), length(col("word")) - col("i") + 1))))
      .select(expr("substring(word, i, l)").as("piece"), col("wcnt"))
      .groupBy("piece").agg(sum(col("wcnt")).as("cnt"))
    val multi = subs.where(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(topV)
    val kept = multi.unionByName(subs.where(length(col("piece")) === 1))
    rescore(kept)
  }


  /** (piece, cnt) → (piece, cnt, score) with score = −ln(cnt/Σcnt). */
  private def rescore(counts: DataFrame): DataFrame = {
    val tot = counts.agg(sum(col("cnt")).cast("double").as("__tot"))
    counts.crossJoin(broadcast(tot))
      .withColumn("score", -log(col("cnt") / col("__tot")))
      .drop("__tot")
  }

  /** The bounded vocabulary as driver-side model parameters —
    * `seedVocab`'s top-V + alphabet contract is what makes this a
    * metadata collect (a tokenizer model file, not data). */
  private def collectVocab(vocab: DataFrame): (Seq[String], Seq[Double]) = {
    val rows = vocab.select(col("piece"), col("score")).collect()
    (rows.map(_.getString(0)).toSeq, rows.map(_.getDouble(1)).toSeq)
  }

  /** Word + its minimum-cost segmentation struct (NULL = uncoverable
    * word, dropped — mirroring the absent-row semantics of the old
    * positional DP). */
  private def segmented(words: DataFrame, vocab: DataFrame,
      maxPieceLen: Int, maxWordLen: Int): DataFrame = {
    val (ps, ws) = collectVocab(vocab)
    // materialization barrier BEFORE attaching the DP: `word` is a
    // grouping column of the distinct-word aggregate, so Catalyst
    // would otherwise push the isnotnull(DP) filter through the
    // aggregate onto the corpus-scale exploded-token frame —
    // re-running the per-word DP once per TOKEN instead of once per
    // distinct word (measured 40 s vs 17 s at the 100× corpus). The
    // checkpointed frame is Heaps-scale by design.
    val w = Checkpoints.truncate(
      words.where(length(col("word")) <= maxWordLen))
    w.withColumn("__seg", graft.expressions.UnigramSegment(
        col("word"), ps, ws, maxPieceLen))
      .where(col("__seg").isNotNull)
  }

  /** Per-word minimal segmentation cost: (word, cost). */
  def segmentCosts(words: DataFrame, vocab: DataFrame, maxPieceLen: Int,
      maxWordLen: Int): DataFrame =
    segmented(words, vocab, maxPieceLen, maxWordLen)
      .select(col("word"), col("__seg.cost").as("cost"))

  /** Viterbi segmentation: (word, pieces array<string>, cost). Among
    * equal-cost segmentations the recovery picks, at each cut from
    * the end, the span with the SMALLEST split point whose prefix
    * cost is exactly optimal — the longest-last-piece deterministic
    * tie-break ([[graft.expressions.UnigramSegment]]). */
  def viterbiSegments(words: DataFrame, vocab: DataFrame, maxPieceLen: Int,
      maxWordLen: Int): DataFrame =
    segmented(words, vocab, maxPieceLen, maxWordLen)
      .select(col("word"), col("__seg.pieces").as("pieces"),
        col("__seg.cost").as("cost"))

  /** One hard-EM step: re-count pieces over every word's Viterbi
    * segmentation (weighted by word count) and re-score. Pieces that
    * vanish from every best segmentation are dropped — except single
    * characters, retained with a 0.5 pseudo-count so coverage never
    * breaks. */
  def emStep(words: DataFrame, vocab: DataFrame, maxPieceLen: Int,
      maxWordLen: Int): DataFrame = {
    val segs = viterbiSegments(words, vocab, maxPieceLen, maxWordLen)
    val used = segs.join(words, "word")
      .select(explode(col("pieces")).as("piece"), col("wcnt"))
      .groupBy("piece").agg(sum(col("wcnt")).cast("double").as("cnt"))
    val chars = vocab.where(length(col("piece")) === 1).select("piece")
    val kept = used
      .unionByName(chars.join(used, Seq("piece"), "left_anti")
        .withColumn("cnt", lit(0.5)))
    rescore(kept)
  }

  /** Train: substring-count seed, then `iters` hard-EM rounds.
    * Output: (piece, cnt, score). */
  def train(docs: DataFrame, textCol: String, maxPieceLen: Int, topV: Int,
      iters: Int, maxWordLen: Int = 24): DataFrame = {
    val words = Checkpoints.truncate(wordCounts(docs, textCol, maxWordLen))
    var vocab = Checkpoints.truncate(seedVocab(words, maxPieceLen, topV))
    var i = 0
    while (i < iters) {
      val next = Checkpoints.truncate(
        emStep(words, vocab, maxPieceLen, maxWordLen))
      Checkpoints.free(vocab)
      vocab = next
      i += 1
    }
    Checkpoints.free(words)
    vocab
  }

  /** Encode: per document, the concatenated piece streams of its words
    * in order — (id, pieces, n_pieces, cost). Per-word segmentations
    * are computed ONCE on the distinct-word frame and joined back
    * (the 100 TB shape: corpus rows never enter the DP). Words longer
    * than `maxWordLen` are passed through as single opaque pieces with
    * NULL-contributing cost 0 (flagged by `n_overlong`). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, maxPieceLen: Int,
      maxWordLen: Int = 24): DataFrame = {
    val tokens = docs.select(col(idCol),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("__i", "word")))
      .where(col("word") =!= "")
    val words = tokens.where(length(col("word")) <= maxWordLen)
      .select("word").distinct()
    val segs = viterbiSegments(words, vocab, maxPieceLen, maxWordLen)
    tokens.join(segs, Seq("word"), "left")
      .withColumn("__pieces",
        coalesce(col("pieces"), array(col("word"))))
      .withColumn("__cost", coalesce(col("cost"), lit(0.0)))
      .withColumn("__over",
        when(length(col("word")) > maxWordLen, 1L).otherwise(0L))
      .groupBy(col(idCol))
      .agg(flatten(sort_array(collect_list(
          struct(col("__i"), col("__pieces"))))("__pieces")).as("pieces"),
        sum(col("__cost")).as("cost"),
        sum(col("__over")).as("n_overlong"))
      .withColumn("n_pieces", size(col("pieces")).cast("long"))
  }
}
