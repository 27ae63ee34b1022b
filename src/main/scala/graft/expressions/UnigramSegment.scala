package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Minimum-cost unigram-LM segmentation of one word (Kudo 2018 /
  * SentencePiece family) as a ROW-LOCAL expression: the Viterbi DP
  * over the word's ≤`maxPieceLen`-char spans against a FIXED piece
  * vocabulary, returning `struct<cost:double, pieces:array<string>>`
  * — NULL when the word cannot be covered by the vocabulary.
  *
  * Why row-local is the scale shape here: the vocabulary is bounded
  * by contract (top-V + alphabet — [[graft.ops.Unigram.seedVocab]]),
  * i.e. MODEL PARAMETERS, which ship with the task like any
  * broadcast; each word's DP is O(len × maxPieceLen) lookups with no
  * cross-row dependency. The former round-based formulation (one
  * bounded join per position over the distinct-word frame) computed
  * the identical recurrence in `maxWordLen` Spark jobs — pure fixed
  * scheduling cost at any corpus size, since the frame it iterated
  * was already Heaps-law (distinct words), not corpus-scale.
  *
  * Exact parity with the frame DP (the q203 oracle hash-matches on
  * doubles): dp(p) = min over spans (s, p] in vocab of dp(s) + w —
  * `min` over doubles is exact, and each candidate is one addition
  * of the same two values the frame form added, so the costs are
  * bit-identical. Tie-break in recovery: from the end, take the
  * SMALLEST split s whose prefix cost is exactly optimal
  * (dp(s) + w == dp(p)) — the longest-last-piece rule. Character
  * semantics are code points (UTF-8 start-byte boundaries), matching
  * Spark's `substring`/`length` exactly. */
case class UnigramSegment(child: Expression, pieces: Seq[String],
    scores: Seq[Double], maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback {

  require(pieces.length == scores.length,
    s"${pieces.length} pieces vs ${scores.length} scores")
  require(maxPieceLen >= 1, s"maxPieceLen must be positive, got $maxPieceLen")

  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("cost", DoubleType, nullable = false),
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false)))
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"argument must be string, got ${child.dataType.catalogString}")

  // values as boxed java.lang.Double: a scala-Double-typed get would
  // silently unbox a missing key's null to 0.0 — a free piece
  @transient private lazy val vocab
      : java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](
      pieces.length * 2)
    pieces.iterator.zip(scores.iterator).foreach { case (p, s) =>
      m.put(UTF8String.fromString(p), java.lang.Double.valueOf(s))
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes // one copy
    val nb = bytes.length
    // char-start byte offsets (code-point semantics, one walk)
    var numChars = 0
    var i = 0
    while (i < nb) {
      i += UTF8String.numBytesForFirstByte(bytes(i)); numChars += 1
    }
    if (numChars == 0) return null
    val offs = new Array[Int](numChars + 1)
    var c = 0
    i = 0
    while (i < nb) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i)); c += 1
    }
    offs(numChars) = nb
    def pieceAt(s: Int, e: Int): UTF8String =
      UTF8String.fromBytes(bytes, offs(s), offs(e) - offs(s))
    // forward DP
    val dp = new Array[Double](numChars + 1)
    java.util.Arrays.fill(dp, Double.PositiveInfinity)
    dp(0) = 0.0
    var p = 1
    while (p <= numChars) {
      var s = math.max(0, p - maxPieceLen)
      while (s < p) {
        if (dp(s) != Double.PositiveInfinity) {
          val w: java.lang.Double = vocab.get(pieceAt(s, p))
          if (w ne null) {
            val cand = dp(s) + w.doubleValue()
            if (cand < dp(p)) dp(p) = cand
          }
        }
        s += 1
      }
      p += 1
    }
    if (dp(numChars) == Double.PositiveInfinity) return null
    // backward recovery: smallest exactly-optimal split (longest
    // last piece), recursively
    val out = new java.util.ArrayDeque[AnyRef]()
    var cur = numChars
    while (cur > 0) {
      var s = math.max(0, cur - maxPieceLen)
      var stepped = false
      while (!stepped && s < cur) {
        if (dp(s) != Double.PositiveInfinity) {
          val piece = pieceAt(s, cur)
          val w: java.lang.Double = vocab.get(piece)
          if ((w ne null) && dp(s) + w.doubleValue() == dp(cur)) {
            out.addFirst(piece)
            cur = s
            stepped = true
          }
        }
        s += 1
      }
      // unconditional throw, not assert: with -da (the JVM default) a
      // broken invariant here would spin the task forever, not fail it
      if (!stepped) throw new IllegalStateException(
        "finite dp cell with no optimal incoming span")
    }
    InternalRow(dp(numChars),
      new GenericArrayData(out.toArray(new Array[AnyRef](out.size()))))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : UnigramSegment = copy(child = newChild)
}

object UnigramSegment {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(word: Column, pieces: Seq[String], scores: Seq[Double],
      maxPieceLen: Int): Column =
    Bridge.column(
      UnigramSegment(Bridge.expression(word), pieces, scores, maxPieceLen))
}
