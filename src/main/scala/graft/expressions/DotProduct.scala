package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over two numeric array columns, accumulating
  * in DOUBLE left-to-right (identical arithmetic to the
  * `aggregate(zip_with(...))` fold it replaces, so oracle-verified
  * results are unchanged).
  *
  * Why a custom Expression: Spark's higher-order functions
  * (`zip_with`/`aggregate`) evaluate their lambdas interpreted — per
  * element they box, dispatch a closure, and break whole-stage codegen.
  * For pairwise similarity (|pairs| x dim evaluations) that interpreter
  * overhead dominates the entire query. This expression compiles to a
  * tight primitive loop inside WholeStageCodegen (SURVEY §7.3
  * preference order: custom Expression over UDF).
  *
  * Semantics: result is NULL iff an input array is NULL. NULL elements
  * contribute 0. Length mismatch: the common prefix is used.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(_: NumericType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product needs numeric arrays, got ${left.dataType} / ${right.dataType}")
  }

  private def getDouble(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case ShortType => a.getShort(i).toDouble
    case ByteType => a.getByte(i).toDouble
    case _ => throw new IllegalStateException(s"unsupported element type $t")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        acc += getDouble(a, ta, i) * getDouble(b, tb, i)
      i += 1
    }
    acc
  }

  private def getter(t: DataType): String = t match {
    case FloatType => "getFloat"
    case DoubleType => "getDouble"
    case IntegerType => "getInt"
    case LongType => "getLong"
    case ShortType => "getShort"
    case ByteType => "getByte"
    case _ => throw new IllegalStateException(s"unsupported element type $t")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ga, gb) = (getter(elemType(left)), getter(elemType(right)))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |double $acc = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ((double) $a.$ga($i)) * ((double) $b.$gb($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
