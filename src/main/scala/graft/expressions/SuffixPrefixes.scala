package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All k-char suffix prefixes of a document in ONE byte traversal:
  * element `i` (0-based) equals `substring(text, i+1, k)` — the seed
  * frame of the prefix-doubling suffix sort ([[graft.ops.Suffix]]).
  *
  * Why this exists: the composed form
  * `explode(sequence(1, length(t)))` + `substring(t, pos, k)` walks
  * the string FROM BYTE ZERO on every row to find char offset `pos`
  * (UTF-8 chars are variable-width), so materializing every
  * position's prefix costs O(L²) character steps per document —
  * measured as ~2 s of the q208 seed at sf0.1, paid TWICE (rank
  * branch + bucket-count branch). Here the char-start byte offsets
  * are computed once (one O(L) walk), and each element is a
  * zero-copy `UTF8String` view over the document's single byte copy
  * — O(L) total, per-element cost O(1).
  *
  * Character semantics match Spark's `substring`/`length` exactly
  * (code points via UTF-8 start-byte boundaries, shorter tail
  * prefixes for the last k−1 positions — a proper prefix that sorts
  * before its extensions, which is what the seed rank relies on).
  * NULL input stays NULL; an empty string yields an EMPTY array — a
  * deliberate divergence from the composed form, whose
  * `sequence(1, length(t))` evaluates to `[1, 0]` (Spark sequences
  * step backwards when stop < start) and so emits two spurious
  * empty-prefix rows per empty document. DuckDB's
  * `range(1, len+1)` is empty for an empty doc, and the q208 oracle
  * additionally filters `len(text) >= 1`, so the empty-array
  * semantics here are the ones that agree with the oracle.
  * Pair with `posexplode` (codegen-supported) — the generator side
  * stays whole-stage compiled, unlike a custom Generator. */
case class SuffixPrefixes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"prefix length must be at least 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"argument must be string, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes // one copy
    val nb = bytes.length
    // char-start byte offsets (one walk); offs(numChars) == nb
    var numChars = 0
    var i = 0
    while (i < nb) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      numChars += 1
    }
    val offs = new Array[Int](numChars + 1)
    var c = 0
    i = 0
    while (i < nb) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(numChars) = nb
    val out = new Array[AnyRef](numChars)
    var p = 0
    while (p < numChars) {
      val end = offs(math.min(p + k, numChars))
      out(p) = UTF8String.fromBytes(bytes, offs(p), end - offs(p))
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SuffixPrefixes = copy(child = newChild)
}

object SuffixPrefixes {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(text: Column, k: Int): Column =
    Bridge.column(SuffixPrefixes(Bridge.expression(text), k))
}
