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
  *  - segmentation is a distributed DP over (word, position) frames —
  *    `maxWordLen` rounds of bounded joins, NEVER a per-row recursive
  *    UDF — with [[Checkpoints]] lineage truncation like every other
  *    iterative op (PageRank, BFS, BPE);
  *  - the piece vocabulary broadcasts (top-V by contract).
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

  /** Fresh output exprIds — the self-join disambiguation every reuse
    * of a shared-lineage frame needs (same trick as
    * [[AsOf.joinAsOfNative]]'s right-side dedup). */
  private def fresh(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(c).as(c)).toIndexedSeq: _*)

  /** (piece, cnt) → (piece, cnt, score) with score = −ln(cnt/Σcnt). */
  private def rescore(counts: DataFrame): DataFrame = {
    val tot = counts.agg(sum(col("cnt")).cast("double").as("__tot"))
    counts.crossJoin(broadcast(tot))
      .withColumn("score", -log(col("cnt") / col("__tot")))
      .drop("__tot")
  }

  /** The segmentation lattice: one row per (word, s, e, piece, w) span
    * whose substring is in the vocabulary. s/e are 0-based cut
    * points (piece = chars (s, e]). */
  private def lattice(words: DataFrame, vocab: DataFrame,
      maxPieceLen: Int): DataFrame =
    words
      .withColumn("i", explode(sequence(lit(1), length(col("word")))))
      .withColumn("l", explode(sequence(lit(1),
        least(lit(maxPieceLen), length(col("word")) - col("i") + 1))))
      .select(col("word"), (col("i") - 1).as("s"), (col("i") - 1 + col("l")).as("e"),
        expr("substring(word, i, l)").as("piece"))
      .join(broadcast(vocab.select(col("piece"), col("score").as("w"))),
        "piece")

  /** Full DP table (word, pos, cost): minimum cost to segment the
    * first `pos` chars. `maxWordLen` rounds of bounded joins over the
    * distinct-word frame. Unreachable positions are absent (cannot
    * happen when vocab kept all single chars). */
  def dpTable(words: DataFrame, vocab: DataFrame, maxPieceLen: Int,
      maxWordLen: Int): DataFrame = {
    val edges = Checkpoints.truncate(lattice(words, vocab, maxPieceLen))
    var d = words.select(col("word"), lit(0).as("pos"), lit(0.0).as("cost"))
    var lastCkpt: DataFrame = null
    var p = 1
    while (p <= maxWordLen) {
      val np = edges.where(col("e") === p)
        .join(fresh(d).select(col("word"), col("pos").as("s"),
          col("cost").as("__pc")), Seq("word", "s"))
        .groupBy("word")
        .agg(min(col("__pc") + col("w")).as("cost"))
        .withColumn("pos", lit(p))
        .select("word", "pos", "cost")
      val grown = d.unionByName(np)
      // truncate every few rounds; the superseded checkpoint's blocks
      // are dead the moment the new one is materialized
      if (p % 4 == 0 || p == maxWordLen) {
        d = Checkpoints.truncate(grown)
        if (lastCkpt != null) Checkpoints.free(lastCkpt)
        lastCkpt = d
      } else d = grown
      p += 1
    }
    Checkpoints.free(edges)
    d
  }

  /** Per-word minimal segmentation cost: (word, cost). */
  def segmentCosts(words: DataFrame, vocab: DataFrame, maxPieceLen: Int,
      maxWordLen: Int): DataFrame =
    dpTable(words, vocab, maxPieceLen, maxWordLen)
      .join(fresh(words)
        .select(col("word"), length(col("word")).as("__len")), "word")
      .where(col("pos") === col("__len"))
      .select("word", "cost")

  /** Viterbi segmentation by backward recovery over the DP table:
    * (word, pieces array<string>, cost). At each step pick, among
    * spans (s, pos] with d(s) + w(piece) exactly equal to d(pos), the
    * SMALLEST s — the longest-last-piece deterministic tie-break. */
  def viterbiSegments(words: DataFrame, vocab: DataFrame, maxPieceLen: Int,
      maxWordLen: Int): DataFrame = {
    val d = dpTable(words, vocab, maxPieceLen, maxWordLen)
    val edges = Checkpoints.truncate(
      lattice(words, vocab, maxPieceLen)
        .join(fresh(d).select(col("word"), col("pos").as("s"),
          col("cost").as("__sc")), Seq("word", "s")))
    val start = fresh(d)
      .join(fresh(words).select(col("word"),
        length(col("word")).as("__len")), "word")
      .where(col("pos") === col("__len"))
      .select(col("word"), col("pos"), col("cost"),
        array().cast("array<string>").as("pieces"))
    var cur = Checkpoints.truncate(start)
    var done = cur.where(col("pos") > 0).limit(1).isEmpty
    var rounds = 0
    while (!done && rounds < maxWordLen) {
      val open = cur.where(col("pos") > 0)
      val closed = cur.where(col("pos") === 0)
      // candidate spans whose prefix cost is EXACTLY optimal for the
      // current cut; smallest s wins (longest last piece)
      val stepped = open
        .join(edges.withColumnRenamed("e", "pos"), Seq("word", "pos"))
        .where(col("__sc") + col("w") === col("cost"))
        .groupBy(col("word"), col("pos"), col("cost"), col("pieces"))
        .agg(min_by(struct(col("s"), col("piece"), col("__sc")),
          col("s")).as("__pick"))
        .select(col("word"), col("__pick.s").as("pos"),
          col("__pick.__sc").as("cost"),
          concat(array(col("__pick.piece")), col("pieces")).as("pieces"))
      val next = Checkpoints.truncate(closed.unionByName(stepped))
      Checkpoints.free(cur)
      cur = next
      rounds += 1
      done = cur.where(col("pos") > 0).limit(1).isEmpty
    }
    val out = cur.where(col("pos") === 0)
      .join(dpFinal(d, words), "word")
      .select(col("word"), col("pieces"), col("fcost").as("cost"))
    Checkpoints.free(edges)
    out
  }

  private def dpFinal(d: DataFrame, words: DataFrame): DataFrame =
    fresh(d)
      .join(fresh(words)
        .select(col("word"), length(col("word")).as("__len")), "word")
      .where(col("pos") === col("__len"))
      .select(col("word"), col("cost").as("fcost"))

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
