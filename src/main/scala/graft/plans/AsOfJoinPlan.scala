package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native backward as-of join — the whole-operator Catalyst extension route
  * (logical node → planner strategy → physical operator), registered via
  * `SparkSessionExtensions.injectPlannerStrategy` /
  * `experimental.extraStrategies`.
  *
  * Where [[graft.operators.AsOfJoin.asOfBackward]] COMPOSES the semantics
  * from union + running-`last` window (two exchanges, right side pre-agg),
  * this operator owns them: each child is hash-clustered on the key and
  * sorted by (key, ts) — one exchange per side, the same requirement a
  * sort-merge join declares — and a single forward merge pass emits every
  * left row joined to the latest right row with `right.ts <= left.ts`.
  * State per partition is ONE held payload row, independent of key group
  * size; neither side is ever buffered. That constant-memory streaming merge
  * is what the window composition cannot promise (a window must at least
  * buffer its running frame per key) and is the reason to drop to a custom
  * operator at 100 TB.
  *
  * Determinism contract: the right child is sorted by (key, ts, payload…),
  * so among equal (key, ts) rows the lexicographically-largest payload wins
  * — identical to the composition's max-struct reduction and to a DuckDB
  * `ASOF JOIN` over a (key, ts)-deduplicated right side (the shared oracle).
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    payload: Seq[Attribute], asofOutput: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ asofOutput
  override def producedAttributes: AttributeSet = AttributeSet(asofOutput)
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKeys, n.rightKeys, n.leftTs, n.rightTs, n.payload,
        n.asofOutput, planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    payload: Seq[Attribute], asofOutput: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ asofOutput

  // same child contract as a shuffled join: co-clustered on the keys (the
  // planner aligns both sides' partitioning), per-partition sort on
  // (key, ts [, payload for the deterministic last-wins tie-break])
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTs, Ascending) +: payload.map(SortOrder(_, Ascending))))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    val payloadWithTs = rightTs +: payload
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val lTsAttr = leftTs
    val rTsAttr = rightTs
    val outAttrs = output

    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) { (li, ri) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj  = UnsafeProjection.create(Seq(lTsAttr), lOut)
      val rTsProj  = UnsafeProjection.create(Seq(rTsAttr), rOut)
      val rPayProj = UnsafeProjection.create(payloadWithTs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd  = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val nullPay: InternalRow = new GenericInternalRow(payloadWithTs.length)
      val joined = new JoinedRow
      // physical-operator row contract: downstream consumers (collect, sort,
      // shuffle) cast to UnsafeRow, so the JoinedRow must be re-materialized
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)

      var rRow: InternalRow = if (ri.hasNext) ri.next() else null
      var heldKey: UnsafeRow = null
      var heldPay: UnsafeRow = null

      li.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTsRow = lTsProj(lRow)
        var advancing = rRow != null
        while (advancing) {
          val rKey = rKeyProj(rRow)
          val c = keyOrd.compare(rKey, lKey)
          if (c < 0) {
            // right row belongs to an already-passed key group: discard held
            heldKey = null; heldPay = null
            rRow = if (ri.hasNext) ri.next() else null
            advancing = rRow != null
          } else if (c == 0 && rTsProj(rRow).isNullAt(0)) {
            // a null ordering value is never a valid as-of candidate (nulls
            // sort first, so the <= test would otherwise hold it); SQL ASOF
            // and the composed variant both ignore such rows
            rRow = if (ri.hasNext) ri.next() else null
            advancing = rRow != null
          } else if (c == 0 && tsOrd.compare(rTsProj(rRow), lTsRow) <= 0) {
            // candidate at or before the left timestamp: hold it (later rows
            // in sort order overwrite — latest ts / largest payload wins)
            heldKey = rKey.copy(); heldPay = rPayProj(rRow).copy()
            rRow = if (ri.hasNext) ri.next() else null
            advancing = rRow != null
          } else {
            advancing = false // right is ahead of this left row
          }
        }
        // a null LEFT ordering value can never satisfy right.ts <= left.ts
        // either (nulls-first sort puts such rows before any candidate)
        val hit = !lTsRow.isNullAt(0) &&
          heldKey != null && keyOrd.compare(heldKey, lKey) == 0
        outProj(joined(lRow, if (hit) heldPay else nullPay))
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}
