package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native as-of join — the SURVEY §2 custom-operator demonstration at the
  * WHOLE-OPERATOR extension level (custom LogicalPlan + SparkStrategy +
  * SparkPlan via SparkSessionExtensions), complementing the expression-level
  * (graft.expressions.*) and optimizer-rule-level (PushableTruncRange,
  * FuzzyJoinRewrite) extensions.
  *
  * Semantics (identical to [[graft.ops.TimeSeriesOps.asofJoin]], which is
  * the union+window FORMULATION of the same operator): for each left row,
  * the latest right row with `right.time <= left.time` in the same key
  * group; right value columns surface as `asof_<col>`, NULL when no prior
  * right row exists; among right rows tied on (key, time) the one sorting
  * LAST under `rightTiebreak` wins (pass value columns for the
  * deterministic max-tuple rule the window form applies via its struct
  * ordering).
  *
  * Why a physical operator when the window form already costs one
  * shuffle + one sort per side? The merge here is STREAMING per partition:
  * one forward pass over both sorted children holding ONE buffered right
  * row — no window buffer, no unioned wide schema (the window form pads
  * every row to left ∪ right width before sorting), no second filter pass
  * to drop the right-side carrier rows. Same exchange count, strictly less
  * memory and movement per row.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    keys: Seq[String],
    timeCol: String,
    rightTiebreak: Seq[String],
    outputAttrs: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = outputAttrs
  // the renamed asof_* attributes are INTRODUCED here, not consumed from
  // children — declare them produced or CheckAnalysis reports them missing
  override def producedAttributes: AttributeSet =
    AttributeSet(outputAttrs.drop(left.output.size))
  // the node consumes EVERY child column (keys/time by name, right values
  // through the rename): without declaring so, ColumnPruning sees that the
  // fresh asof_* exprIds reference nothing and prunes the right child to
  // zero columns
  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]. Injected via
  * [[GraftExtensions]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.keys, p.timeCol, p.rightTiebreak, p.outputAttrs,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join: requires both children clustered by `keys` (the
  * standard co-partitioning contract EnsureRequirements satisfies with one
  * hash exchange per side) and sorted by (keys, time[, tiebreak]); executes
  * as a zipPartitions merge that buffers exactly one right row. Time
  * columns must be LongType (the engine's epoch-ns domain) and non-null. */
case class AsOfJoinExec(
    keys: Seq[String],
    timeCol: String,
    rightTiebreak: Seq[String],
    outputAttrs: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  private def attr(out: Seq[Attribute], name: String): Attribute =
    out.find(_.name == name).getOrElse(throw new IllegalArgumentException(
      s"as-of join: column '$name' not found in ${out.map(_.name).mkString(", ")}"))

  private def leftKeys: Seq[Attribute] = keys.map(attr(left.output, _))
  private def rightKeys: Seq[Attribute] = keys.map(attr(right.output, _))
  private def rightValues: Seq[Attribute] =
    right.output.filterNot(a => keys.contains(a.name) || a.name == timeCol)

  override def output: Seq[Attribute] = outputAttrs

  // the asof_* columns are introduced by this node (same contract as the
  // logical side) — without this the planner flags the node `!`-invalid
  override def producedAttributes: AttributeSet =
    AttributeSet(outputAttrs.drop(left.output.size))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ attr(left.output, timeCol)).map(SortOrder(_, Ascending)),
    (rightKeys :+ attr(right.output, timeCol)) ++: rightTiebreak.map(attr(right.output, _))
      map (SortOrder(_, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    require(attr(lOut, timeCol).dataType == LongType
      && attr(rOut, timeCol).dataType == LongType,
      s"as-of join: '$timeCol' must be LongType (epoch-ns domain) on both sides")
    val lKeys = leftKeys
    val rKeys = rightKeys
    // mismatched key types (e.g. IntegerType vs LongType) hash-partition
    // differently AND compare through the single left-typed natural
    // ordering below — either alone silently drops matches, so reject
    // instead of coercing (the union+window form coerces; callers who want
    // that behavior should cast explicitly)
    require(lKeys.map(_.dataType) == rKeys.map(_.dataType),
      s"as-of join: key column types must match exactly between sides, " +
        s"got left=${lKeys.map(_.dataType.simpleString).mkString(",")} " +
        s"right=${rKeys.map(_.dataType.simpleString).mkString(",")}")
    val rVals = rightValues
    val lTimeIdx = lOut.indexWhere(_.name == timeCol)
    val rTimeIdx = rOut.indexWhere(_.name == timeCol)
    val keyTypes = lKeys.map(_.dataType)
    val rWidth = rOut.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val keyOrdering = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // output projection: left row as-is, then the right VALUE columns in
      // the order the logical node renamed them. The rename forces
      // nullable=true (a keyless left row yields NULL asof columns), so the
      // bound references must too — a non-null child attribute would bind
      // null-check-free and read raw zeros off the all-null placeholder row
      val outProj = UnsafeProjection.create(
        lOut ++ rVals, lOut ++ rOut.map(_.withNullability(true)))
      val nullRight: InternalRow = new GenericInternalRow(rWidth)
      val joiner = new JoinedRow
      new Iterator[InternalRow] {
        private var curKey: UnsafeRow = null
        private var lastRight: InternalRow = null
        // the buffered right head, its key PROJECTED ONCE when the row is
        // pulled — the first formulation re-projected the same head once
        // per LEFT row (rKeyProj per output row), which is where the
        // interpreted merge lost 2× to the codegen'd window form at 400k
        // rows/side (round-16 task 5); with the memo the right side pays
        // one projection + one copy per RIGHT row, period
        private var rHead: InternalRow = null
        private var rHeadKey: UnsafeRow = null
        // cached key comparison of rHead vs curKey: recomputed only when
        // either side advances, not per left row
        private var rHeadCmp: Int = 0
        private def advanceRight(): Unit = {
          if (rIter.hasNext) {
            rHead = rIter.next()
            rHeadKey = rKeyProj(rHead).copy()
            if (curKey != null)
              rHeadCmp = keyOrdering.compare(rHeadKey, curKey)
          } else { rHead = null; rHeadKey = null }
        }
        advanceRight()
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          if (curKey == null || keyOrdering.compare(lk, curKey) != 0) {
            curKey = lk.copy()
            lastRight = null
            if (rHead != null)
              rHeadCmp = keyOrdering.compare(rHeadKey, curKey)
          }
          // NULL times: Spark sorts nulls FIRST under Ascending, so the
          // window form treats a null-time right row as "earliest" (always
          // eligible) and a null-time left row as seeing only other
          // null-time rights. Mirror that instead of letting getLong read
          // a null slot as raw 0 and silently mis-join.
          val ltNull = l.isNullAt(lTimeIdx)
          val lt = if (ltNull) Long.MinValue else l.getLong(lTimeIdx)
          var advancing = true
          while (advancing && rHead != null) {
            if (rHeadCmp < 0) advanceRight() // keys already passed
            else if (rHeadCmp == 0 && (rHead.isNullAt(rTimeIdx)
              || (!ltNull && rHead.getLong(rTimeIdx) <= lt))) {
              lastRight = rHead.copy()
              advanceRight()
            } else advancing = false
          }
          outProj(joiner(l, if (lastRight == null) nullRight else lastRight))
        }
      }
    }
  }
}
