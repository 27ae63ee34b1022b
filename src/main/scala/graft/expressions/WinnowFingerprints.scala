package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The full winnowing fingerprint selection of a document in ONE
  * traversal — the single-eval replacement for the composed
  * `transform(sequence…, substr+md5)` → `transform(…, array_min(
  * slice(…)))` chain in [[graft.ops.Winnow]] (kept there as
  * `selectedFingerprintsFold`, asserted bit-equal in WinnowSpec).
  *
  * Per row: hash every character k-gram (md5-prefix unsigned-32-bit,
  * the same engine-portable h32 as everywhere else), pack each into
  * the rightmost-min key `h·P − i`, take the minimum of every
  * w-window with an O(N) monotonic deque, and emit the distinct
  * selected set in first-window order as
  * `array<struct<pos:long, fp:long>>` (pos = 1-based character
  * offset, fp = the k-gram's content hash).
  *
  * Why this wins over the composed form (the `WordShingles` /
  * `MinhashSig` precedent): the k-gram bytes are md5-digested straight
  * out of ONE byte copy of the document (no per-position UTF8String
  * substring allocation), the key/selection arrays live as primitive
  * `long[]` instead of Catalyst array values, and the windowed min is
  * O(N) instead of the O(N·w) slice-min — all inside a single narrow
  * projection with no shuffle.
  *
  * Character semantics match Spark's `substring`/`length` exactly
  * (code points via UTF-8 start-byte boundaries), so multibyte text
  * selects identical (pos, fp) in both forms.
  *
  * `robust = true` switches to the paper's exact ROBUST winnowing
  * (Schleimer et al. §4): among tied minimal hashes, re-select the
  * PREVIOUS window's selection when it is still in the window, falling
  * back to rightmost-min — strictly fewer fingerprints on repetitive
  * text, same coverage guarantee. The rule carries one piece of state
  * across windows (the previous selection), which a per-window
  * composed expression cannot express — the variant exists ONLY here
  * (its oracle mirrors the recurrence with a recursive CTE).
  *
  * The documented PosMod packing bound is ENFORCED here: a document
  * with `numChars ≥ P + k − 1` would push positions to `≥ P`,
  * silently corrupting both the min ordering and the `(−key) mod P`
  * unpack — so it throws instead (the fold form raises the same error
  * through `raise_error`). Returns an empty array below one full
  * window (`numChars < k + w − 1`); null input stays null.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int, posMod: Long,
    robust: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  require(k >= 2, s"k-gram size must be at least 2, got $k")
  require(w >= 1, s"window must be at least 1, got $w")
  require(posMod > 1 && posMod <= (1L << 31),
    s"posMod must keep h*posMod inside a Long for 32-bit h, got $posMod")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", LongType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fingerprints needs string, got $t")
    }

  // MessageDigest is stateful — a per-instance val would corrupt
  // hashes if one expression tree were ever evaluated from two threads
  // (e.g. driver-side constant folding + a local-mode task). ThreadLocal
  // keeps the no-allocation-per-row economy with per-thread state.
  @transient private lazy val md: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val md = this.md.get()
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // character start offsets (UTF-8 non-continuation bytes) + sentinel:
    // Spark's length/substr count code points, so k-grams span
    // offsets(i) until offsets(i+k)
    var numChars = 0
    var b = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xC0) != 0x80) numChars += 1
      b += 1
    }
    if (numChars >= posMod + k - 1)
      throw new IllegalArgumentException(
        s"winnow: document of $numChars chars breaks the h*P-i key " +
          s"packing (P=$posMod); raise posMod")
    if (numChars < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val offsets = new Array[Int](numChars + 1)
    var c = 0
    b = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xC0) != 0x80) { offsets(c) = b; c += 1 }
      b += 1
    }
    offsets(numChars) = bytes.length

    val nGrams = numChars - k + 1
    val keys = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      md.update(bytes, offsets(i), offsets(i + k) - offsets(i))
      val d = md.digest()
      // first 4 digest bytes = first 8 hex chars, as unsigned 32-bit
      val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      // smallest hash wins, rightmost position breaks ties; keys are
      // distinct within a document (i < P), so min order is total
      keys(i) = h * posMod - (i + 1)
      i += 1
    }

    // O(N) sliding-window minimum: deque of indices with increasing keys
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.HashSet[Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Any](
      2 * nGrams / (w + 1) + 4)
    // robust mode: the previously selected 0-based index, carried
    // across windows — the ONE piece of cross-window state the
    // paper's rule needs (and the reason this variant cannot be a
    // per-window composed expression)
    var prevSel = -1
    i = 0
    while (i < nGrams) {
      while (tail > head && keys(deque(tail - 1)) > keys(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        // the packed min is the rightmost minimal hash of the window
        val m = keys(deque(head))
        val minIdx = (Math.floorMod(-m, posMod) - 1).toInt
        val hMin = (m + minIdx + 1) / posMod
        // robust rule (Schleimer et al. §4): re-select the previous
        // window's hash when it is still in the window AND still a
        // minimal hash; otherwise fall back to rightmost-min
        val selIdx =
          if (robust && prevSel >= i - w + 1 &&
              (keys(prevSel) + prevSel + 1) / posMod == hMin) prevSel
          else minIdx
        prevSel = selIdx
        if (seen.add(keys(selIdx))) {
          out += InternalRow((selIdx + 1).toLong,
            (keys(selIdx) + selIdx + 1) / posMod)
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(text: Column, k: Int, w: Int, posMod: Long): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(text), k, w, posMod))

  /** The paper's ROBUST selection rule (stateful tie-break across
    * windows — see the case-class doc). */
  def robust(text: Column, k: Int, w: Int, posMod: Long): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(text), k, w, posMod,
      robust = true))
}
