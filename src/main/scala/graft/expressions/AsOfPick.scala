package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  BinaryExpression, Expression, RowOrdering}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Binary search over a per-key SORTED history array: returns the LAST
  * element whose first struct field (the "as-of time") is `<=` the
  * probe value, or NULL when none qualifies — the per-row half of the
  * broadcast as-of join ([[graft.ops.AsOf.joinAsOfBroadcast]]): the
  * small side packs into `sort_array(collect_list(struct(ts, ...)))`
  * per key, broadcasts, and each fact row resolves its match with this
  * O(log n) probe inside WholeStageCodegen — the fact table itself is
  * never shuffled or sorted.
  *
  * Why a custom Expression (SURVEY §7.3 preference order): the
  * composable form `element_at(filter(hist, x -> x.t <= ts), -1)` is a
  * higher-order lambda — interpreted, per-element closure dispatch,
  * O(n) per row, and it breaks whole-stage codegen. This compiles to a
  * tight primitive binary-search loop.
  *
  * Contract: the array is sorted ascending on the first field
  * (`sort_array` order); elements or first fields that are NULL sort
  * first and are never returned. A NULL array or probe returns NULL.
  */
case class AsOfPick(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemStruct: StructType =
    left.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  private def tsType: DataType = elemStruct.fields(0).dataType

  override def dataType: DataType = elemStruct
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(s: StructType, _) if s.nonEmpty =>
      val t = s.fields(0).dataType
      if (!RowOrdering.isOrderable(t))
        TypeCheckResult.TypeCheckFailure(
          s"as_of_pick history field 0 must be orderable, got $t")
      else if (right.dataType != t)
        TypeCheckResult.TypeCheckFailure(
          s"as_of_pick probe type ${right.dataType} != history time type $t")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"as_of_pick needs array<struct<...>>, got $other")
  }

  @transient private lazy val ord =
    TypeUtils.getInterpretedOrdering(tsType)

  override def nullSafeEval(h: Any, ts: Any): Any = {
    val arr = h.asInstanceOf[ArrayData]
    val nf = elemStruct.length
    var lo = 0
    var hi = arr.numElements() - 1
    var found = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val eNull = arr.isNullAt(mid) || {
        val e = arr.getStruct(mid, nf); e.isNullAt(0)
      }
      // nulls sort first: inside the null prefix keep moving right
      // without recording a match
      val goRight = eNull ||
        ord.compare(arr.getStruct(mid, nf).get(0, tsType), ts) <= 0
      if (goRight) { if (!eNull) found = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (found < 0) null else arr.getStruct(found, elemStruct.length)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nf = elemStruct.length
    val tsJava = CodeGenerator.javaType(tsType)
    nullSafeCodeGen(ctx, ev, (h, ts) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val found = ctx.freshName("found")
      val e = ctx.freshName("e")
      val t = ctx.freshName("t")
      val eNull = ctx.freshName("eNull")
      s"""
         |int $lo = 0;
         |int $hi = $h.numElements() - 1;
         |int $found = -1;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  boolean $eNull = $h.isNullAt($mid) ||
         |    $h.getStruct($mid, $nf).isNullAt(0);
         |  boolean goRight;
         |  if ($eNull) {
         |    goRight = true;
         |  } else {
         |    org.apache.spark.sql.catalyst.InternalRow $e =
         |      $h.getStruct($mid, $nf);
         |    $tsJava $t = ${CodeGenerator.getValue(e, tsType, "0")};
         |    goRight = ${ctx.genComp(tsType, t, ts)} <= 0;
         |  }
         |  if (goRight) { if (!$eNull) $found = $mid; $lo = $mid + 1; }
         |  else $hi = $mid - 1;
         |}
         |if ($found < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $h.getStruct($found, $nf);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AsOfPick =
    copy(left = newLeft, right = newRight)
}

object AsOfPick {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(hist: Column, ts: Column): Column =
    Bridge.column(AsOfPick(Bridge.expression(hist), Bridge.expression(ts)))
}
