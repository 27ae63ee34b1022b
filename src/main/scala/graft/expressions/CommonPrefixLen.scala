package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Length (in Unicode code points) of the longest common prefix of two
  * strings — the LCP primitive of the suffix-array analyses
  * ([[graft.ops.Suffix]]). A tight primitive loop under whole-stage
  * codegen; the composable alternatives are all interpreted
  * (higher-order `aggregate` over positions) or quadratic
  * (`startsWith` probes per candidate length). NULL in → NULL out. */
case class CommonPrefixLen(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"common_prefix_len needs strings, got ${left.dataType}/${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any =
    CommonPrefixLen.lcp(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.expressions.CommonPrefixLen.lcp($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CommonPrefixLen =
    copy(left = newLeft, right = newRight)
}

object CommonPrefixLen {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(a: Column, b: Column): Column =
    Bridge.column(CommonPrefixLen(Bridge.expression(a), Bridge.expression(b)))

  /** Code-point LCP over the UTF-8 bytes: find the matching byte
    * prefix, then walk it char by char — a multi-byte char counts
    * only if ALL its bytes matched. Static so generated code can call
    * it directly. */
  def lcp(a: UTF8String, b: UTF8String): Long = {
    val n = math.min(a.numBytes(), b.numBytes())
    val ba = a.getBytes
    val bb = b.getBytes
    var i = 0
    while (i < n && ba(i) == bb(i)) i += 1
    var cp = 0L
    var j = 0
    while (j < i) {
      val lead = ba(j) & 0xFF
      val cl = if (lead < 0x80) 1 else if (lead < 0xE0) 2
        else if (lead < 0xF0) 3 else 4
      if (j + cl <= i) { cp += 1; j += cl }
      else j = i // partial char at the mismatch boundary: not counted
    }
    cp
  }
}
