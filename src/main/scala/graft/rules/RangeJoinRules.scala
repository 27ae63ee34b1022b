package graft.rules

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a point-in-interval inequality join into the
  * bucketed equi-join of [[graft.ops.RangeJoin.pointInInterval]] —
  * automatically, so a user who writes the natural SQL
  *
  *   SELECT ... FROM pts p JOIN ivs i
  *   ON p.k = i.k AND p.x >= i.lo AND p.x <= i.hi
  *
  * gets the linear bucket join instead of the BroadcastNestedLoop (or
  * cartesian) plan Spark produces for any join whose condition has no
  * equi conjunct it can hash on — quadratic work, THE classic 100 TB
  * range-join trap. The rewrite:
  *
  *   Join(cond = equi ∧ lo <= x <= hi ∧ rest)
  *   ⇒ Project(original output,
  *       Filter(lo <= x <= hi ∧ rest,
  *         Join(point side + bucket(x) = interval side × explode(
  *              buckets(lo, hi)), cond = equi ∧ bucket-equality)))
  *
  * Each point falls in exactly ONE bucket and every covering bucket of
  * the interval is generated, so each true match meets exactly once —
  * no dedup; null range bounds generate no buckets and a null point
  * bucket never equals, preserving the inequality's null-rejecting
  * semantics. Intervals explode onto (length/width + 1) buckets; pick
  * the width ≈ the median interval length via
  * `spark.graft.rangeJoin.bucketWidth` (same dial as the Scala
  * operator). The rule only fires when that conf is a positive long —
  * OFF by default, because a profitable width is data-dependent.
  *
  * Scope guards: INNER joins; point/bound expressions LongType and
  * deterministic, the point computable from one side and both bounds
  * from the other; re-entry is cut by the `__graft_rb` marker the
  * rewrite introduces (the residual range predicate survives in the
  * Filter, which predicate-pushdown may fold back into the join
  * condition — the marker keeps the fixed-point batch from rewriting
  * its own output).
  */
object BucketedRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"
  private val Marker = "__graft_rb"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // unparsable width ⇒ rule off (a bad conf value must not break
    // optimization of every query in the session)
    val w = conf.getConfString(WidthConf, "0").toLongOption.getOrElse(0L)
    if (w <= 0) plan
    else plan.transform {
      case j @ Join(_, _, Inner, Some(cond), _)
          if j.resolved && cond.deterministic && !hasMarker(cond) =>
        rewrite(j, w).getOrElse(j)
    }
  }

  private def hasMarker(cond: Expression): Boolean =
    cond.references.exists(_.name.startsWith(Marker))

  /** `x - pmod(x, w)` is exactly divisible by `w`, so truncating
    * division IS floor division — correct for negative coordinates
    * (plain `div` would straddle bucket 0). */
  private def bucket(x: Expression, w: Long): Expression =
    IntegralDivide(Subtract(x, Pmod(x, Literal(w))), Literal(w))

  /** The conjunct shapes meaning `point >= bound` / `point <= bound`. */
  private def asLower(e: Expression): Option[(Expression, Expression)] =
    e match {
      case GreaterThanOrEqual(p, s) => Some((p, s))
      case LessThanOrEqual(s, p)    => Some((p, s))
      case _                        => None
    }
  private def asUpper(e: Expression): Option[(Expression, Expression)] =
    e match {
      case LessThanOrEqual(p, h)    => Some((p, h))
      case GreaterThanOrEqual(h, p) => Some((p, h))
      case _                        => None
    }

  private def rewrite(j: Join, w: Long): Option[LogicalPlan] =
    rewritePoint(j, w).orElse(rewriteOverlap(j, w))

  private def fromOnly(e: Expression, side: LogicalPlan): Boolean =
    e.deterministic && e.dataType == LongType && e.references.nonEmpty &&
      e.references.subsetOf(side.outputSet)

  private def rewritePoint(j: Join, w: Long): Option[LogicalPlan] = {
    val Join(left, right, _, Some(cond), hint) = j: @unchecked
    val conjuncts = splitConjunctivePredicates(cond)

    // find one (lower, upper) conjunct pair over the same point
    // expression, point from one side, both bounds from the other
    val candidates = for {
      lc <- conjuncts; (p1, lo) <- asLower(lc).toSeq
      uc <- conjuncts; if uc ne lc
      (p2, hi) <- asUpper(uc).toSeq
      if p1.semanticEquals(p2)
      (ptSide, ivSide, pointOnLeft) <-
        (if (fromOnly(p1, left) && fromOnly(lo, right) && fromOnly(hi, right))
          Seq((left, right, true))
        else if (fromOnly(p1, right) && fromOnly(lo, left) && fromOnly(hi, left))
          Seq((right, left, false))
        else Seq.empty)
    } yield (lc, uc, p1, lo, hi, ptSide, ivSide, pointOnLeft)

    // Same candidate-ranking concern as rewriteOverlap: a non-strict
    // cross-side dedup conjunct over the SAME column family as the
    // point (`a.x <= b.x`) can masquerade as a bound, exploding
    // sequence(bucket(lo), bucket(x)) over an unrelated magnitude.
    // A true interval bound is a DIFFERENT column from the point
    // (lo/hi vs x), so penalize bound expressions that share the
    // point's family; sortBy is stable so ties keep written order.
    val ranked = candidates.sortBy { case (_, _, p, lo, hi, _, _, _) =>
      -(if (family(lo) != family(p)) 1 else 0) -
        (if (family(hi) != family(p)) 1 else 0)
    }
    ranked.headOption.map {
      case (lc, uc, p, lo, hi, ptSide, ivSide, pointOnLeft) =>
        val ptBucket = Alias(bucket(p, w), Marker + "_p")()
        val ptPlan = Project(ptSide.output :+ ptBucket, ptSide)
        val ivBucket = AttributeReference(Marker + "_i", LongType)()
        // Sequence is TimeZoneAware: it stays UNRESOLVED until a zone
        // is pinned, even for integral sequences where it's irrelevant
        val ivPlan = Generate(
          Explode(new Sequence(bucket(lo, w), bucket(hi, w))
            .withTimeZone(conf.sessionLocalTimeZone)),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(ivBucket), child = ivSide)
        val others = conjuncts.filterNot(c => (c eq lc) || (c eq uc))
        // equi conjuncts stay in the join (they feed the hash key);
        // everything non-equi joins the range residual in the Filter
        val (equi, residual) = others.partition {
          case EqualTo(a, b) =>
            (a.references.subsetOf(left.outputSet) &&
              b.references.subsetOf(right.outputSet)) ||
            (a.references.subsetOf(right.outputSet) &&
              b.references.subsetOf(left.outputSet))
          case _ => false
        }
        val bucketEq = EqualTo(ptBucket.toAttribute, ivBucket)
        val newCond = (bucketEq +: equi).reduce[Expression](And)
        val joined =
          if (pointOnLeft) Join(ptPlan, ivPlan, Inner, Some(newCond), hint)
          else Join(ivPlan, ptPlan, Inner, Some(newCond), hint)
        val filtered =
          Filter((Seq(lc, uc) ++ residual).reduce[Expression](And), joined)
        Project(left.output ++ right.output, filtered)
    }
  }

  /** `a ≤ b` / `a < b` conjuncts in either written orientation,
    * normalized to (smaller, larger). */
  private def asCross(e: Expression): Option[(Expression, Expression)] =
    e match {
      case LessThanOrEqual(a, b)    => Some((a, b))
      case LessThan(a, b)           => Some((a, b))
      case GreaterThanOrEqual(b, a) => Some((a, b))
      case GreaterThan(b, a)        => Some((a, b))
      case _                        => None
    }

  /** The interval-OVERLAP pattern (`ls ⪅ re ∧ rs ⪅ le`, both interval
    * ends on their own side): both sides explode onto covering
    * buckets, and a matching pair — which may share many buckets — is
    * emitted only from the bucket of the LATER start
    * (`greatest(bucket(ls), bucket(rs))`), a bucket both sides cover
    * whenever they overlap, so every true pair appears exactly once
    * with no dedup shuffle (the [[graft.ops.RangeJoin.intervalOverlap]]
    * trick, applied automatically). The argument needs only endpoint
    * membership and monotonicity of the bucket map, so it holds for
    * strict or non-strict comparisons and even degenerate intervals. */
  /** Structural form of an expression with attribute identities erased
    * down to their NAMES — the "attribute family" signal used to rank
    * overlap candidates: in the overwhelmingly common overlap join
    * (self-join, or two tables with conventionally matching column
    * names) the true start bounds share a name (`a.s` / `b.s`) and so
    * do the end bounds, while an unrelated cross-side inequality such
    * as a dedup tie-break `a.id < b.id` pairs a start with an id. */
  private def family(e: Expression): String =
    e.transformUp {
      case a: AttributeReference =>
        Literal(org.apache.spark.unsafe.types.UTF8String.fromString(a.name),
          org.apache.spark.sql.types.StringType)
    }.toString

  private def rewriteOverlap(j: Join, w: Long): Option[LogicalPlan] = {
    val Join(left, right, _, Some(cond), hint) = j: @unchecked
    val conjuncts = splitConjunctivePredicates(cond)
    val candidates = for {
      c1 <- conjuncts; (ls, re) <- asCross(c1).toSeq
      if fromOnly(ls, left) && fromOnly(re, right)
      c2 <- conjuncts; if c2 ne c1
      (rs, le) <- asCross(c2).toSeq
      if fromOnly(rs, right) && fromOnly(le, left)
    } yield (c1, c2, ls, le, rs, re)
    // Rank candidates instead of taking the first in written order: an
    // unrelated cross-side inequality written BEFORE the range
    // conjuncts (e.g. `a.id < b.id`) would otherwise be paired as an
    // interval bound, exploding a side onto sequence(bucket(id),
    // bucket(e)) — spans of millions of buckets per row. Prefer the
    // pair whose four expressions form two per-side intervals over the
    // same attribute family (start names match, end names match);
    // sortBy is stable, so ties keep written order (which therefore
    // still matters for exotically-named bounds — documented dial).
    val ranked = candidates.sortBy { case (_, _, ls, le, rs, re) =>
      -(if (family(ls) == family(rs)) 1 else 0) -
        (if (family(le) == family(re)) 1 else 0)
    }
    ranked.headOption.map { case (c1, c2, ls, le, rs, re) =>
      def explodeBuckets(side: LogicalPlan, lo: Expression, hi: Expression,
          attr: AttributeReference): Generate =
        Generate(
          Explode(new Sequence(bucket(lo, w), bucket(hi, w))
            .withTimeZone(conf.sessionLocalTimeZone)),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(attr), child = side)
      val lAttr = AttributeReference(Marker + "_l", LongType)()
      val rAttr = AttributeReference(Marker + "_r", LongType)()
      val lPlan = explodeBuckets(left, ls, le, lAttr)
      val rPlan = explodeBuckets(right, rs, re, rAttr)
      val others = conjuncts.filterNot(c => (c eq c1) || (c eq c2))
      val (equi, residual) = others.partition {
        case EqualTo(a, b) =>
          (a.references.subsetOf(left.outputSet) &&
            b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) &&
            b.references.subsetOf(left.outputSet))
        case _ => false
      }
      val newCond = (EqualTo(lAttr, rAttr) +: equi).reduce[Expression](And)
      val emitOnce = EqualTo(lAttr,
        Greatest(Seq(bucket(ls, w), bucket(rs, w))))
      val filtered = Filter(
        (Seq(c1, c2, emitOnce) ++ residual).reduce[Expression](And),
        Join(lPlan, rPlan, Inner, Some(newCond), hint))
      Project(left.output ++ right.output, filtered)
    }
  }
}
