package graft.rules

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: a Hamming-distance-zero test
  * `bit_count(a ^ b) <= 0` (or `= 0`) is exactly `a = b` — rewrite it
  * so the join/filter becomes a plain equality the rest of the
  * optimizer can work with (equality predicates feed hash joins,
  * constraint propagation, and scan pushdown; a bit_count expression
  * feeds none of them). Fires on the hamming-0 configuration of the
  * SimHash/dHash near-dup operators.
  *
  * Null semantics are preserved: `a ^ b`, `bit_count`, and the
  * comparison all propagate null, exactly like `a = b`.
  *
  * Register per session via `spark.experimental.extraOptimizations`
  * or through `GraftExtensions` (injectOptimizerRule).
  */
object HammingZeroToEquality extends Rule[LogicalPlan] {

  /** Strips casts down to `BitCount(BitwiseXor(a, b))`. */
  private def asHamming(e: Expression): Option[(Expression, Expression)] =
    e match {
      case Cast(inner, _, _, _) => asHamming(inner)
      case BitwiseCount(BitwiseXor(a, b)) => Some((a, b))
      case _ => None
    }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0, _) => true
    case Literal(0L, _) => true
    case Cast(inner, _, _, _) => isZero(inner)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(h, z) if isZero(z) && asHamming(h).isDefined =>
        val (a, b) = asHamming(h).get
        EqualTo(a, b)
      case EqualTo(h, z) if isZero(z) && asHamming(h).isDefined =>
        val (a, b) = asHamming(h).get
        EqualTo(a, b)
      case GreaterThanOrEqual(z, h) if isZero(z) && asHamming(h).isDefined =>
        val (a, b) = asHamming(h).get
        EqualTo(a, b)
    }
}
