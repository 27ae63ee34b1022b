package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The per-document posting entries `array<struct<token,tf>>` of
  * whitespace tokenization, in ONE pass over the text — the row-local
  * core of [[graft.ops.Bm25.postings]].
  *
  * Token semantics are EXACTLY `split(trim(text), '\\s+')` (the
  * [[graft.functions.TextFunctions.tokens]] contract shared with the
  * DuckDB oracle): `trim` strips only SPACE characters, and Java
  * `split(regex, -1)` over the remainder yields an empty first/last
  * field when the trimmed text begins/ends with non-space whitespace
  * (tab, newline, …) — both reproduced here, including the
  * one-empty-token array for an all-space document. tf counts
  * duplicate fields; entry order is insertion order (downstream
  * consumers aggregate, never index).
  *
  * Why an expression: the composed form (tokenize → array_sort →
  * run-boundary filter over a sequence → transform with try_element_at
  * → explode) allocates four intermediate arrays per document and was
  * measured at ~2× the tokenization cost alone on the 50k-doc corpus;
  * the former explode → groupBy(id, token) form shuffled every corpus
  * token to aggregate a per-row quantity. One hash map per document,
  * no shuffle, no intermediate arrays. */
case class PostingEntries(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"argument must be string, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // trim: SPACE only (Spark's trim), not the full whitespace class
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    val counts = new java.util.LinkedHashMap[String, Long]()
    if (lo >= hi) {
      counts.put("", 1L) // split("", -1) == [""]
    } else {
      // the exact reference semantics by construction: Java
      // Pattern.split(limit = -1) keeps the empty first/last field a
      // leading/trailing whitespace run produces
      val fields = PostingEntries.Ws.split(s.subSequence(lo, hi), -1)
      var i = 0
      while (i < fields.length) {
        counts.merge(fields(i), 1L, (a, b) => a + b); i += 1
      }
    }
    val out = new Array[Any](counts.size())
    var j = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(UTF8String.fromString(e.getKey), e.getValue)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : PostingEntries = copy(child = newChild)
}

object PostingEntries {
  import org.apache.spark.sql.graftbridge.Bridge

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def apply(text: Column): Column =
    Bridge.column(PostingEntries(Bridge.expression(text)))
}
