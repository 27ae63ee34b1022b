package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 32-bit SimHash of a token array in a single evaluation — equivalent
  * to the exploded formulation (md5-prefix 32-bit hash per token, ±1
  * vote per array element per bit, bit set iff votes > 0) but without
  * materializing |tokens| x 32 vote rows through two aggregations.
  *
  * Integer-only arithmetic with the same md5-derived hash, so results
  * are bit-identical to the exploded form (asserted in DedupSpec) and
  * to the DuckDB oracle. Pass distinct tokens for the classic form or
  * the raw token array for per-occurrence (Charikar) weighting.
  */
case class Simhash32(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash32 needs array<string>, got $t")
    }

  // MessageDigest is stateful; ThreadLocal guards against any
  // concurrent evaluation of one expression instance (the
  // WinnowFingerprints convention).
  @transient private lazy val md: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val md = this.md.get()
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](32)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        // first 4 digest bytes = first 8 hex chars, as unsigned 32-bit
        val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        var j = 0
        while (j < 32) {
          if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash32 =
    copy(child = newChild)
}

object Simhash32 {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(toks: Column): Column =
    Bridge.column(Simhash32(Bridge.expression(toks)))
}
