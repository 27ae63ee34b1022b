package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The full MinHash signature of a shingle array in ONE traversal:
  * per shingle, the md5-prefix unsigned-32-bit hash is computed once
  * and folded into all `nPerms` running minima of the LCG permutations
  * `(a_j·h + b_j) mod M` — so signature computation is a narrow
  * per-row projection with a single long[] of state.
  *
  * Both composed alternatives lose at scale: the explode + groupBy
  * (nPerms min-aggs) form shuffles every shingle row and keeps
  * nPerms partial-agg columns; the `array_min(transform(...))` form
  * re-walks the hash array once per permutation through interpreted
  * higher-order lambdas (HOFs are CodegenFallback) and allocates a
  * fresh array per permutation. This expression walks the shingles
  * once, allocates once, and hashes each shingle once.
  *
  * Bit-identical to the composed forms (same md5-derived h32, same
  * integer LCG — asserted in DedupSpec) and to the DuckDB oracle.
  * Returns null for an empty (or all-null) shingle array, matching
  * the aggregation form that simply had no rows for such documents.
  */
case class MinhashSig(child: Expression, a: Seq[Long], b: Seq[Long], mod: Long)
    extends UnaryExpression with CodegenFallback {

  require(a.length == b.length && a.nonEmpty, "need matching a/b constants")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs array<string>, got $t")
    }

  // MessageDigest is stateful; ThreadLocal guards against any
  // concurrent evaluation of one expression instance (the
  // WinnowFingerprints convention).
  @transient private lazy val md: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray

  override def nullSafeEval(input: Any): Any = {
    val md = this.md.get()
    val arr = input.asInstanceOf[ArrayData]
    val nPerms = aArr.length
    val minima = Array.fill(nPerms)(Long.MaxValue)
    var any = false
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        // first 4 digest bytes = first 8 hex chars, as unsigned 32-bit
        val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        var j = 0
        while (j < nPerms) {
          val v = (aArr(j) * h + bArr(j)) % mod
          if (v < minima(j)) minima(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(minima)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(shingles: Column, perms: Seq[(Long, Long)], mod: Long): Column =
    Bridge.column(MinhashSig(Bridge.expression(shingles),
      perms.map(_._1), perms.map(_._2), mod))
}
