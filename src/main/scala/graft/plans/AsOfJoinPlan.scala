package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Whole-operator as-of join (SURVEY B13, §4 "merge-based as-of join
  * SparkStrategy" — the custom LogicalPlan + Strategy + SparkPlan tier).
  *
  * Semantics: for each left row, the newest right row with equal keys and
  * `rightTs <= leftTs` (left outer; right columns nullable).
  *
  * Physical plan: both children hash-partitioned on the keys and sorted
  * by (keys, ts) — EnsureRequirements inserts the exchanges/sorts exactly
  * as for a sort-merge join — then a single forward MERGE per partition:
  * O(n+m) per partition, state = ONE buffered right row. Unlike the
  * union+window formulation there is no carried last-non-null column and
  * no window buffering; unlike an inequality join there is no nested
  * loop. This is the shape that survives 100 TB.
  *
  * Right rows must be unique per (keys, ts) for determinism (same
  * contract as [[graft.operators.AsOf.asofJoin]]).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts) =>
      AsOfJoinMergeExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinMergeExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val keyTypes = leftKeys.map(_.dataType)
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), leftOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.size)

      var rCurr: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastMatch: InternalRow = null
      var lastMatchKey: UnsafeRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTsRow = lTsProj(lRow)
        val lTsNull = lTsRow.isNullAt(0)
        val lTsVal = if (lTsNull) 0L else lTsRow.getLong(0)
        var advance = !lTsNull
        while (advance && rCurr != null) {
          val rKey = rKeyProj(rCurr)
          val c = keyOrd.compare(rKey, lKey)
          if (c < 0) {
            // right is on an earlier key: its matches can never be asked
            // for again (left is key-sorted) — discard
            rCurr = if (rIter.hasNext) rIter.next() else null
          } else if (c == 0) {
            val rTsRow = rTsProj(rCurr)
            if (!rTsRow.isNullAt(0) && rTsRow.getLong(0) <= lTsVal) {
              lastMatch = rCurr.copy()
              lastMatchKey = lKey.copy()
              rCurr = if (rIter.hasNext) rIter.next() else null
            } else advance = false
          } else advance = false
        }
        val m =
          if (!lTsNull && lastMatch != null && lastMatchKey != null &&
              keyOrd.compare(lastMatchKey, lKey) == 0) lastMatch
          else nullRight
        resultProj(joined(lRow, m))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinMergeExec =
    copy(left = newLeft, right = newRight)
}
