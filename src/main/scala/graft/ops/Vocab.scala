package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.etl.Checkpoints

import graft.functions.TextFunctions.tokens

/** Corpus vocabulary statistics — the tokenizer-training and
  * index-building passes of a training-data pipeline.
  *
  * Scale shape: every operator here is explode → hash-aggregate with
  * map-side partial aggregation, so the shuffle carries per-partition
  * partial counts (bounded by vocabulary size), never the exploded
  * token stream. The only global sorts are over the ALREADY-REDUCED
  * frames (vocab-sized), and top-N selection is TakeOrdered (no full
  * sort); the final rank window runs on the N surviving rows only.
  */
object Vocab {

  /** Token frame: (doc, token) — one row per occurrence. */
  private def tokenFrame(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
      explode(tokens(col(textCol))).as("token"))

  /** Top-N vocabulary by total occurrences: (token, n, df, rank).
    * rank is dense over (n desc, token asc) — a deterministic total
    * order. The rank window is single-partition BY CONSTRUCTION on the
    * already-limited N rows (bounded), not on the corpus. */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String,
      topN: Int): DataFrame = {
    val counts = tokenFrame(docs, idCol, textCol)
      .groupBy("token")
      .agg(count(lit(1)).as("n"), countDistinct(col("doc")).as("df"))
      .orderBy(col("n").desc, col("token")).limit(topN)
    counts.withColumn("rank",
      row_number().over(Window.orderBy(col("n").desc, col("token")))
        .cast("long"))
  }

  /** Adjacent-token-pair frequencies — the BPE merge-candidate scoring
    * pass (each top pair is a merge candidate; iterating this with a
    * merged vocabulary is BPE training). Pairs come from
    * [[LangModel.docBigrams]]'s lead() window (one shuffle by doc id,
    * no position self-join). Output: (w1, w2, n, rank), top-N. */
  def pairCounts(docs: DataFrame, idCol: String, textCol: String,
      topN: Int): DataFrame = {
    val counts = LangModel.docBigrams(docs, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w1"), col("w2")).limit(topN)
    counts.withColumn("rank",
      row_number().over(Window.orderBy(col("n").desc, col("w1"), col("w2")))
        .cast("long"))
  }

  /** Inverted index: per term its document frequency, total term
    * frequency, and the top-k posting list (doc ids by tf desc, id
    * asc, comma-joined — a portable representation). The top-k side
    * uses the bounded-heap [[TopK]] aggregator: no per-term group
    * sort, O(k) state per term — and it rides in the SAME per-token
    * aggregate as df/tf_total (the aggregator is just one more agg
    * column), so the index is two hash aggregations end to end, no
    * stats⋈tops join. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    tokenFrame(docs, idCol, textCol)
      .groupBy(col("token"), col("doc")).agg(count(lit(1)).as("tf"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"),
        TopK.topKAgg(col("tf"), col("doc"), k).as("__top"))
      .select(col("token"), col("df"), col("tf_total"),
        // the heap's finish order IS (tf desc, doc asc) — the rank order
        concat_ws(",",
          transform(col("__top"), x => x.getField("_2").cast("string")))
          .as("top_docs"))

  /** Windowed PMI co-occurrence: pointwise mutual information of
    * unordered token pairs co-occurring within `window` positions in
    * a document (the word2vec/GloVe statistic, and the collocation
    * detector of a corpus-analysis pass):
    *
    *   pmi(a,b) = ln( (n_ab / P) / ((n_a / T) · (n_b / T)) )
    *
    * with n_ab = windowed pair occurrences, P = total pairs, n_x =
    * token occurrences, T = total tokens.
    *
    * Shape: pair generation is `window` EQUI-joins of the position
    * frame against itself (join key (doc, pos+off) — never a range
    * self-join), pairs reduce by hash aggregation with map-side
    * combine, token counts reduce the same way, and the two 1-row
    * totals attach by broadcast. The rank window runs on the
    * (`minPairCount`-filtered, vocabulary²-bounded) pair frame only.
    * PMI rounds to 6 before ranking; ties break on the pair.
    * Output: (tok_a ≤ tok_b, n_ab, pmi, rank) — top `k`. */
  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 2, minPairCount: Long = 5, k: Int = 50): DataFrame = {
    require(window > 0 && k > 0, "window and k must be positive")
    val toks = docs
      .select(col(idCol).as("doc"), posexplode(tokens(col(textCol))))
      .toDF("doc", "pos", "token")
    val left = toks
      .withColumn("__off",
        explode(sequence(lit(1), lit(window))))
      .select(col("doc"), (col("pos") + col("__off")).as("pos_b"),
        col("token").as("__ta"))
    val pairs = left
      .join(toks.select(col("doc"), col("pos").as("pos_b"),
        col("token").as("__tb")), Seq("doc", "pos_b"))
      .select(least(col("__ta"), col("__tb")).as("tok_a"),
        greatest(col("__ta"), col("__tb")).as("tok_b"))
      .groupBy(col("tok_a"), col("tok_b"))
      .agg(count(lit(1)).as("n_ab"))
    val tokCounts = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
    val totals = toks.agg(count(lit(1)).as("__t"))
    val pairTotal = pairs.agg(sum(col("n_ab")).as("__p"))
    val scored = pairs.where(col("n_ab") >= minPairCount)
      .join(tokCounts.select(col("token").as("tok_a"), col("n").as("__na")),
        "tok_a")
      .join(tokCounts.select(col("token").as("tok_b"), col("n").as("__nb")),
        "tok_b")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(pairTotal))
      .withColumn("pmi", round(
        log((col("n_ab") / col("__p"))
          / ((col("__na") / col("__t")) * (col("__nb") / col("__t")))), 6))
    // top-k via TakeOrdered (no full sort); the rank window then runs
    // on the k surviving rows only — the [[vocabulary]] pattern
    scored
      .orderBy(col("pmi").desc, col("tok_a"), col("tok_b")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("pmi").desc, col("tok_a"), col("tok_b")))
        .cast("long"))
      .select(col("tok_a"), col("tok_b"), col("n_ab"), col("pmi"),
        col("rank"))
  }

  /** Greedy left-to-right merge of one adjacent symbol pair
    * (`a`,`b`) → `a+b` inside a symbol array — the BPE merge-apply
    * step, as a pure fold expression (leftmost-first,
    * non-overlapping: merging "a a" over "a a a" yields ["aa","a"]). */
  private def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Full BPE merge training (Sennrich et al. 2016): learn `nMerges`
    * merge rules over the corpus. Output: (rank, left, right, n) — the
    * merge table in training order, n = the pair's weighted frequency
    * when it was chosen (ties broken by (left, right) — fully
    * deterministic).
    *
    * Scale shape: the corpus collapses ONCE to the distinct-word
    * frequency table (one explode + hash agg — the only pass over the
    * corpus); every merge ROUND then runs on that bounded vocabulary
    * frame: adjacent-pair weighted counts (zip_with — no per-symbol
    * explode of positions), one bounded top-`batch·4` collect
    * (metadata-scale, the IVF-probe-list pattern), and one narrow fold
    * applying every merge the round proved safe. The frame is eagerly
    * localCheckpoint'ed per round to stop plan growth (CC/PageRank
    * lesson).
    *
    * Safe batching (the driver-round-trip killer): after choosing the
    * argmax pair, later candidates from the SAME count collection are
    * applied in order as long as the sequential trainer would provably
    * have chosen them too. Candidate i survives iff
    *  (1) it shares no symbol with an earlier merge of this round
    *      (old-pair counts only DECREASE under a disjoint merge, so
    *      its count is still exact),
    *  (2) its count strictly beats the collection horizon (every pair
    *      outside the collected top could tie it otherwise), and
    *  (3) no collected pair of EQUAL count shares a symbol with this
    *      round's merges (a new pair (x, a+b) born from merge (a,b)
    *      is bounded by count(x,a); any such donor pair with count
    *      ≥ n_i is in the collection, so a tie that could out-sort
    *      candidate i is always visible — absent donors mean the new
    *      pair counts strictly less),
    * and the round also stops after any merge whose concatenation was
    * ALREADY a live symbol (tracked exactly on the driver: created =
    * prior merges; single chars can never equal a len ≥ 2 concat),
    * because such a merge can INCREASE existing pairs' counts. Worst
    * case every round degenerates to one merge (the sequential
    * trainer); in practice early rounds batch tens of merges.
    * Equivalence with batch = 1 is spec-gated. */
  def bpeTrain(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int, batch: Int = 32): DataFrame = {
    import docs.sparkSession.implicits._
    require(nMerges > 0, "nMerges must be positive")
    require(batch > 0, "batch must be positive")
    var words = Checkpoints.truncate(
      docs.select(explode(tokens(col(textCol))).as("word"))
        .where(length(col("word")) > 0)
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .select(split(col("word"), "").as("syms"), col("freq")))
    val merges = scala.collection.mutable.Buffer.empty[(Long, String, String, Long)]
    val created = scala.collection.mutable.Set.empty[String]
    var exhausted = false
    while (merges.size < nMerges && !exhausted) {
      val horizon = math.max(batch * 4, 8)
      val top = words
        .select(col("freq"), explode(zip_with(
          col("syms"), slice(col("syms"), lit(2), size(col("syms"))),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .where(col("p.b").isNotNull)
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(horizon).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) exhausted = true
      else {
        // the collection is complete when it undershot the limit —
        // then no pair outside it exists and guard (2) is vacuous
        val complete = top.length < horizon
        val nLast = top.last._3
        val touched = scala.collection.mutable.Set.empty[String]
        val chosen = scala.collection.mutable.Buffer.empty[(String, String, Long)]
        var stop = false
        var i = 0
        while (!stop && i < top.length && merges.size + chosen.size < nMerges) {
          val (a, b, n) = top(i)
          val safe = chosen.isEmpty ||
            (!touched(a) && !touched(b) &&
              (complete || n > nLast) &&
              !top.drop(i + 1).exists { case (oa, ob, on) =>
                on == n && (touched(oa) || touched(ob)) })
          if (!safe) stop = true
          else {
            chosen += ((a, b, n))
            touched += a; touched += b
            // a merge whose product was already a live symbol can grow
            // other pairs' counts — close the round after applying it
            if (created(a + b)) stop = true
            created += (a + b)
          }
          i += 1
        }
        chosen.foreach { case (a, b, n) =>
          merges += ((merges.size + 1L, a, b, n)) }
        val prev = words
        words = Checkpoints.truncate(words
          .select(chosen.foldLeft(col("syms")) { case (c, (a, b, _)) =>
            mergePair(c, a, b) }.as("syms"), col("freq")))
        Checkpoints.free(prev) // superseded round's vocabulary blocks
      }
    }
    // the merge table lives on the driver; the final vocabulary frame
    // has no consumer
    Checkpoints.free(words)
    merges.toSeq.toDF("rank", "left", "right", "n")
  }

  /** Framing separator for the portable merge-apply representation:
    * each symbol rides as U+001F‹sym›U+001F, words separated by a raw
    * space, so a merge (a,b)→ab is the literal string replacement
    * ␟a␟␟b␟ → ␟ab␟ — leftmost-first non-overlapping in every engine's
    * replace(), and unable to match inside a symbol or across a word
    * boundary. Precondition: text contains no U+001F (a C0 control no
    * real corpus carries; strip in the normalize leg if in doubt). */
  val BpeSep = "\u001F"

  /** Collect a [[bpeTrain]] output (or any (rank,left,right) frame)
    * into an in-order merge table. The table is a bounded trained
    * artifact (metadata-scale — the IVF-probe-list collect pattern),
    * pinned and shipped with the plan. */
  def bpeMergeTable(merges: DataFrame): Seq[(String, String)] =
    merges.orderBy(col("rank")).select(col("left"), col("right"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))

  /** BPE-encode the corpus with a trained merge table: one narrow
    * expression pass (see [[graft.expressions.BpePieces]] — per-word
    * memo gives the distinct-word-once economy without a join-back).
    * Output: (idCol, pieces array<string>, n_tokens) — REAL subword
    * token counts, the unit a token-budget shard pack should use.
    * No shuffle: at 100 TB this is scan-speed. */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    docs.select(col(idCol),
      graft.expressions.BpePieces(col(textCol), merges).as("pieces"))
      .withColumn("n_tokens", size(col("pieces")).cast("long"))

  /** The composed-built-ins reference form of [[bpeEncode]]: frame
    * every non-space char as ␟c␟, fold the merge table as literal
    * replace()s (rank order ≡ Sennrich application order), then read
    * pieces back (within-word ␟␟ boundaries → space, word-edge ␟
    * dropped). Mirrored verbatim by the DuckDB oracle (q126); asserted
    * equal to the expression in VocabSpec. Plan size grows with the
    * merge table, so this form is for oracle parity and bounded
    * tables — the expression is the production path. */
  def bpeEncodeFold(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val norm = trim(regexp_replace(col(textCol), "\\s+", " "))
    val framed = regexp_replace(norm, "(\\S)", BpeSep + "$1" + BpeSep)
    val merged = merges.foldLeft(framed) { case (c, (a, b)) =>
      replace(c, lit(s"$BpeSep$a$BpeSep$BpeSep$b$BpeSep"),
        lit(s"$BpeSep$a$b$BpeSep"))
    }
    val piecesStr =
      replace(replace(merged, lit(BpeSep + BpeSep), lit(" ")),
        lit(BpeSep), lit(""))
    docs.select(col(idCol),
      when(length(piecesStr) === 0, array().cast("array<string>"))
        .otherwise(split(piecesStr, " ")).as("pieces"))
      .withColumn("n_tokens", size(col("pieces")).cast("long"))
  }

  /** Zipf's-law fit over the top-N vocabulary: least-squares slope /
    * intercept of ln(freq) on ln(rank) — the corpus-health check
    * (natural text sits near slope −1; a slope collapsing toward 0
    * means boilerplate/template flooding, a cliff means truncation).
    * Closed-form normal equations on the N-row [[vocabulary]] frame;
    * one row out: (n_tokens, slope, intercept), rounded at 6. */
  def zipfFit(docs: DataFrame, idCol: String, textCol: String,
      topN: Int): DataFrame =
    loglogFit(vocabulary(docs, idCol, textCol, topN)
      .select(log(col("rank").cast("double")).as("__x"),
        log(col("n").cast("double")).as("__y")), "n_tokens")

  /** Closed-form least squares of `__y` on `__x` over a (bounded)
    * point frame: one row (countName, slope, intercept), rounded
    * at 6. Shared by [[zipfFit]] and [[heapsFit]]. */
  private def loglogFit(pts: DataFrame, countName: String): DataFrame = {
    val m = count(lit(1)).cast("double")
    val slope = (m * sum(col("__x") * col("__y"))
        - sum(col("__x")) * sum(col("__y"))) /
      (m * sum(col("__x") * col("__x")) - sum(col("__x")) * sum(col("__x")))
    pts.agg(count(lit(1)).as(countName),
      round(slope, 6).as("slope"),
      round((sum(col("__y")) - slope * sum(col("__x"))) / m, 6)
        .as("intercept"))
  }

  /** Heaps'-law fit V(n) = K·n^β — vocabulary growth against corpus
    * size (Heaps 1978), [[zipfFit]]'s companion curve (β collapsing
    * toward 0 means the crawl stopped finding new language; β near 1
    * means id/hash soup). ln V is regressed on ln n at checkpoint
    * sizes n ∈ {powers of two ≥ `minN`} ∪ {N} — integer-exact on any
    * engine, log-spaced as the fit wants.
    *
    * Scale shape: global token positions come from per-doc positions
    * plus a TWO-PHASE doc-offset cumsum (local window inside each
    * doc-id block, then a block-offset frame — [[Packing]]'s
    * pattern), never a global row window; vocabulary-at-checkpoint is
    * ONE conditional aggregation over the first-occurrence frame
    * (bounded by |vocab|), one sum column per checkpoint. The only
    * driver value is the scalar token total (one-row action). */
  def heapsFit(docs: DataFrame, idCol: String, textCol: String,
      minN: Long = 64L): DataFrame = {
    val lens = docs.select(col(idCol).as("doc"),
      size(tokens(col(textCol))).cast("long").as("len"))
    val withBlock = lens.withColumn("__block", (col("doc") / 256).cast("long"))
    val wLocal = Window.partitionBy(col("__block")).orderBy(col("doc"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = withBlock
      .withColumn("__local", coalesce(sum(col("len")).over(wLocal), lit(0L)))
    // one row per block — the only order-without-partition window
    // runs over THIS frame, never the docs
    val wBlocks = Window.orderBy(col("__block"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withBlock.groupBy(col("__block"))
      .agg(sum(col("len")).as("__btot"))
      .withColumn("__boff", coalesce(sum(col("__btot")).over(wBlocks), lit(0L)))
      .select(col("__block"), col("__boff"))
    val docOff = local.join(broadcast(offsets), "__block")
      .select(col("doc"), (col("__local") + col("__boff")).as("__off"))
    val firstPos = docs
      .select(col(idCol).as("doc"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
      .join(docOff, "doc")
      .groupBy(col("token"))
      .agg(min(col("__off") + col("pos") + 1).as("first_pos"))
    val nTotal = lens.agg(sum(col("len"))).head().getLong(0)
    val cps = (0 to 62).map(1L << _)
      .filter(p => p >= minN && p < nTotal) :+ nTotal
    val vExprs = cps.map(c =>
      sum(when(col("first_pos") <= c, 1L)).as(s"__v$c"))
    val vAtCp = firstPos.agg(vExprs.head, vExprs.tail: _*)
    val pts = vAtCp.select(explode(array(cps.map(c =>
        struct(lit(c).as("n_tok"), col(s"__v$c").as("v"))): _*)).as("p"))
      .select(log(col("p.n_tok").cast("double")).as("__x"),
        log(col("p.v").cast("double")).as("__y"))
    loglogFit(pts, "n_points")
  }
}
