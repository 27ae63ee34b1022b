package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (nats) over the Unicode code points of a string, in
  * one pass — the character-distribution quality signal (gibberish and
  * binary-junk documents sit at the entropy extremes; see the Gopher /
  * C4 filtering lineage).
  *
  * Single evaluation per row versus the composed form (explode to one
  * row per character + two aggregations), which would shuffle
  * |corpus total chars| rows: at 100 TB that explode IS the job. Here
  * the histogram lives in a per-row hash map and never leaves the
  * task.
  *
  * Unicode semantics: code points (so astral-plane characters count
  * once), matching DuckDB's `string_split(text, '')`. Empty string →
  * 0.0. Summation is over the histogram in insertion order — callers
  * gate on the 6-digit ROUND like every other cross-engine float.
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_entropy needs string, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.isEmpty) return 0.0
    val hist = new java.util.HashMap[Integer, Int]()
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      hist.merge(cp, 1, Integer.sum _)
      i += Character.charCount(cp)
      n += 1
    }
    var h = 0.0
    val it = hist.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      h -= p * math.log(p)
    }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(text: Column): Column =
    Bridge.column(CharEntropy(Bridge.expression(text)))
}
