package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, space-joined —
  * equivalent to
  * `array_distinct(transform(sequence(1, size(w)-n+1), i ->
  *    concat_ws(" ", element_at(w,i), ..., element_at(w,i+n-1))))`
  * but evaluated as one flat JVM loop.
  *
  * Why a custom Expression: the composed higher-order form dispatches
  * an interpreted lambda per shingle (boxing every element access), and
  * Catalyst's generate-filter inference re-evaluates the whole
  * composition per row; on a dedup corpus the shingling dominated the
  * entire MinHash pipeline (~40 us/shingle interpreted vs ~0.5 us
  * here). CodegenFallback is fine: one call per document row, with all
  * per-shingle work inside this eval.
  *
  * Order/dedup semantics match `array_distinct` (first occurrence
  * wins), so results are bit-identical to the composed form — asserted
  * in TextFunctionsSpec.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles needs array<string>, got $t")
    }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]((len - n + 1) * 2)
    var i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](2 * n - 1)
      var k = 0
      while (k < n) {
        val tok = if (arr.isNullAt(i + k)) UTF8String.EMPTY_UTF8
          else arr.getUTF8String(i + k)
        parts(2 * k) = tok
        if (k < n - 1) parts(2 * k + 1) = space
        k += 1
      }
      seen.add(UTF8String.concat(parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(toks: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(toks), n))
}
