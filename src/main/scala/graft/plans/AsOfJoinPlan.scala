package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native sort-merge AS-OF join — the whole-operator extension rung of
  * SURVEY §7.3's ladder (custom `LogicalPlan` + `Strategy` +
  * `SparkPlan`), built where the composed form's cost model finally
  * justifies it: [[graft.ops.AsOf.joinAsOf]] unions both sides through
  * ONE window pass (right payload rows ride the left table's shuffle
  * and sort as carried structs), which is optimal until the right side
  * is wide or the union's sort dominates. This operator instead
  * shuffles each side ONCE on its own keys, sorts each side by
  * (keys, ts) — both handled by Spark's own `EnsureRequirements`, so
  * AQE, reused exchanges, and bucketed inputs (which satisfy the
  * distribution for free) all compose — and then streams the two
  * sorted partitions through a merge scan with O(1) state per key: the
  * single currently-effective right row. No union row inflation, no
  * carried-struct memory in the sort, no window buffering.
  *
  * Semantics (matching the composed op's backward direction, both
  * bounds inclusive, LEFT-outer): for each left row, the right row
  * with the greatest `rightTs <= leftTs` within equal keys; among
  * equal-ts right rows the LAST in (keys, ts, tieBreak) sort order
  * wins. Key groups follow sort-order grouping (null keys group
  * together, like the window form's partitionBy). */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    rightTieBreak: Seq[Expression],
    payload: Seq[Attribute]) extends BinaryNode {

  require(leftKeys.length == rightKeys.length &&
    leftKeys.zip(rightKeys).forall { case (l, r) => l.dataType == r.dataType },
    "as-of join keys must pair up with identical types")
  require(leftTs.dataType == rightTs.dataType,
    "as-of timestamps must share a type")

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] as [[SortMergeAsOfJoinExec]]. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy`
  * ([[graft.GraftExtensions]]). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      SortMergeAsOfJoinExec(j.leftKeys, j.rightKeys, j.leftTs, j.rightTs,
        j.rightTieBreak, j.payload,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of join over co-partitioned, co-sorted
  * children. Per partition: one forward merge scan; retained state is
  * ONE copied right payload row (+ its key) — constant memory however
  * large the key's history is. */
case class SortMergeAsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    rightTieBreak: Seq[Expression],
    payload: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  // Both children cluster on their join keys; EnsureRequirements
  // shuffles them into compatible hash partitionings (or accepts
  // bucketed/reused exchanges that already satisfy them).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // Each child sorted by (keys, ts [, tieBreak on the right]) — the
  // right's equal-ts tie order makes "last wins" = greatest-tie-wins,
  // mirroring the composed op's window order.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTs +: rightTieBreak)).map(SortOrder(_, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val payloadAttrs = payload
    val leftOut = left.output
    val rightOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTsB = leftTs
    val rTsB = rightTs
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      if (!lIter.hasNext) Iterator.empty
      else {
        val lKeyProj = UnsafeProjection.create(lKeysB, leftOut)
        val rKeyProj = UnsafeProjection.create(rKeysB, rightOut)
        val lTsProj = UnsafeProjection.create(Seq(lTsB), leftOut)
        val rTsProj = UnsafeProjection.create(Seq(rTsB), rightOut)
        val payloadProj = UnsafeProjection.create(payloadAttrs, rightOut)
        // bind the joined-row side as NULLABLE: unmatched left rows
        // read the all-null payload row, and a non-nullable bound
        // reference would skip the null check and read garbage zeros
        val resultProj = UnsafeProjection.create(
          outAttrs, leftOut ++ payloadAttrs.map(_.withNullability(true)))
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
        val nullPayload = new GenericInternalRow(payloadAttrs.length)
        val joined = new JoinedRow

        new Iterator[InternalRow] {
          // lookahead right row (copied — iterators reuse buffers)
          private var rRow: UnsafeRow = _
          private var rKey: UnsafeRow = _
          private var rTs: UnsafeRow = _
          private def advanceRight(): Unit =
            if (rIter.hasNext) {
              val r = rIter.next()
              rRow = r.asInstanceOf[UnsafeRow].copy()
              rKey = rKeyProj(rRow).copy()
              rTs = rTsProj(rRow).copy()
            } else { rRow = null; rKey = null; rTs = null }
          advanceRight()

          // the currently-effective right row's key + payload (copies)
          private var heldKey: UnsafeRow = _
          private var heldPayload: UnsafeRow = _

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val lk = lKeyProj(l)
            val lt = lTsProj(l)
            // consume every right row at or before (lk, lt): later
            // candidates overwrite earlier ones, so the held row ends
            // as the greatest (ts, tie) within the key — "last wins"
            while (rRow != null && {
              val c = keyOrd.compare(rKey, lk)
              c < 0 || (c == 0 && tsOrd.compare(rTs, lt) <= 0)
            }) {
              if (keyOrd.compare(rKey, lk) == 0) {
                heldKey = rKey
                heldPayload = payloadProj(rRow).copy()
              }
              advanceRight()
            }
            val matched = heldKey != null && keyOrd.compare(heldKey, lk) == 0
            resultProj(joined(l, if (matched) heldPayload else nullPayload))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SortMergeAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
