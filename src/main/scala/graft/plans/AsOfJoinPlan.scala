package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._

/** Native as-of join as a first-class Catalyst operator: a custom
  * `LogicalPlan` node, a planner `Strategy`, and a physical sort-merge
  * exec — the (c) tier of the custom-operator ladder, for the one
  * whole-operator semantic Spark's built-ins can't express directly
  * (SURVEY.md §7.3; the reference's merge_asof, utils.py:101-241).
  *
  * Why a physical operator when `AsOfJoin.mergeAsOf` already composes
  * it: the union-tag composition costs a union of BOTH tables through
  * one exchange plus a whole-table window; this exec asks Catalyst for
  * co-partitioned (`ClusteredDistribution` on the `by` keys) and
  * per-partition-sorted (`by`, `on`) children — the same contract as
  * SortMergeJoin, planned with the same exchange/sort reuse — and then
  * streams BOTH sides once with O(1) state (one candidate row), never
  * materializing a window buffer or a unioned table. At 100 TB that is
  * one shuffle per side (elided entirely when the data is already
  * bucketed by the entity key) and zero extra materialization.
  *
  * Semantics match `AsOfJoin.mergeAsOf` exactly (backward: greatest
  * right `on` ≤ left `on` per `by` group, ties to the LAST right row
  * in sort order; forward: smallest right `on` ≥ left `on`, ties to
  * the FIRST; tolerance nulls matches farther than `tolerance` native
  * units). Right rows with null `on` never match; left rows with null
  * `on` get null values — the window implementation's ignoreNulls
  * behavior. Both guaranteed by the cross-implementation parity spec.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftBy: Seq[Expression],
    rightBy: Seq[Expression],
    leftOn: Expression,
    rightOn: Expression,
    rightValues: Seq[Attribute],
    direction: String,
    tolerance: Option[Long]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] into [[AsOfJoinExec]]. Registered either via
  * `GraftExtensions` (spark.sql.extensions) or lazily through
  * [[AsOfJoinPlan.register]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftBy, n.rightBy, n.leftOn, n.rightOn, n.rightValues,
        n.direction, n.tolerance, planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** Column pruning THROUGH the custom node: Catalyst's ColumnPruning
  * doesn't know [[AsOfJoinNode]], so without this rule a Project above
  * the as-of join never shrinks the right side — every right value
  * column rides the exchange and the scan reads it. When a Project
  * references only a subset of the right values, shrink `rightValues`
  * AND insert the matching Project over the right child, so physical
  * planning (PhysicalOperation over the file relation) prunes the scan
  * even when this rule runs in the late user-rule batch. A
  * strictly-shrinking guard keeps the rule a fixed point. */
object PruneAsOfJoinValues
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}

  private def prune(a: AsOfJoinNode, refs: AttributeSet): AsOfJoinNode = {
    val keep = a.rightValues.filter(refs.contains)
    val neededRefs = (a.rightBy ++ Seq(a.rightOn)).flatMap(_.references)
    val needed = a.right.output.filter(attr =>
      neededRefs.exists(_.exprId == attr.exprId) ||
        keep.exists(_.exprId == attr.exprId))
    a.copy(right = Project(needed, a.right), rightValues = keep)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(_, a: AsOfJoinNode)
        if a.rightValues.exists(v => !p.references.contains(v)) =>
      p.copy(child = prune(a, p.references))
    // A Filter between the Project and the as-of node (the common
    // `asOf(...).filter(...).select(...)` shape) must not defeat
    // pruning: keep what either the projection or the predicate reads.
    case p @ Project(_, f @ Filter(cond, a: AsOfJoinNode))
        if a.rightValues.exists(v =>
          !p.references.contains(v) && !cond.references.contains(v)) =>
      p.copy(child = f.copy(child =
        prune(a, p.references ++ cond.references)))
  }
}

object AsOfJoinPlan {
  /** Idempotently add the strategy + optimizer rule to a session (for
    * sessions built without
    * `spark.sql.extensions=graft.GraftExtensions`). */
  def register(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(PruneAsOfJoinValues))
      spark.experimental.extraOptimizations = opts :+ PruneAsOfJoinValues
  }
}

/** Per-partition merge scan over co-partitioned, co-sorted children.
  *
  * Requires `ClusteredDistribution` on the `by` keys for both children
  * (Catalyst's EnsureRequirements inserts compatible hash exchanges —
  * or none, if the data is already clustered) and ascending
  * per-partition order on (`by`, `on`) (satisfied by existing sort
  * orders or fulfilled with a per-partition sort, never a global one).
  * The scan itself holds ONE candidate row of state — no window
  * buffer, no hash table — so executor memory is independent of group
  * size, and output preserves the left child's partitioning and order.
  */
/** Serializable factories the generated whole-stage code calls once
  * per partition to build its non-serializable kernels (the generated
  * projections/orderings compile lazily on the executor, hitting the
  * codegen cache) — generated UnsafeProjection instances themselves
  * can't ride the `references` array. */
case class AsOfProjFactory(exprs: Seq[Expression]) {
  def create(): UnsafeProjection = UnsafeProjection.create(exprs)
}
case class AsOfOrdFactory(types: Seq[DataType]) {
  def create(): BaseOrdering =
    RowOrdering.createNaturalAscendingOrdering(types)
}

case class AsOfJoinExec(
    leftBy: Seq[Expression],
    rightBy: Seq[Expression],
    leftOn: Expression,
    rightOn: Expression,
    rightValues: Seq[Attribute],
    direction: String,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan)
  extends SparkPlan with BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    if (leftBy.isEmpty) AllTuples :: AllTuples :: Nil
    else ClusteredDistribution(leftBy) :: ClusteredDistribution(rightBy) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftBy :+ leftOn).map(SortOrder(_, Ascending)),
    (rightBy :+ rightOn).map(SortOrder(_, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val backward = direction == "backward"
    val byTypes = leftBy.map(_.dataType)
    val onType = leftOn.dataType
    val tol = tolerance
    val lOut = left.output
    val rOut = right.output
    val lByE = leftBy; val rByE = rightBy
    val lOnExpr = leftOn; val rOnExpr = rightOn
    val rValE: Seq[Expression] = rightValues

    left.execute().zipPartitions(right.execute()) { (lIter, rIter0) =>
      // ONE fused (by..., on) projection per side per row: the
      // generated by-ordering only touches ordinals 0..|by|-1, so it
      // compares the fused rows' prefix directly, and the on value
      // reads at ordinal |by|
      val nBy = lByE.length
      val lKeyProj = UnsafeProjection.create(lByE :+ lOnExpr, lOut)
      val rKeyProj = UnsafeProjection.create(rByE :+ rOnExpr, rOut)
      val valProj = UnsafeProjection.create(rValE, rOut)
      val byOrd = RowOrdering.createNaturalAscendingOrdering(byTypes)
      def onVal(r: InternalRow): Long = onType match {
        case DateType | IntegerType => r.getInt(nBy).toLong
        case _ => r.getLong(nBy) // Timestamp(NTZ) / LongType
      }
      val rBuf = rIter0.buffered
      val tolMax = tol.getOrElse(Long.MaxValue)
      // Output assembly: bytewise UnsafeRow concatenation (two memcpys
      // + bitmap merge via GenerateUnsafeRowJoiner) instead of a
      // field-by-field null-checked reprojection of all output columns
      // — the per-row cost is independent of column COUNT, only bytes.
      // Children hand us UnsafeRows (every exec's output contract via
      // UnsafeProjection/sort); the match arm re-projects defensively
      // if an interpreted parent ever feeds a non-unsafe row.
      val joinerSchemaL = StructType(lOut.map(a =>
        StructField(a.name, a.dataType, a.nullable)))
      val joinerSchemaR = StructType(rValE.map(e =>
        StructField("v", e.dataType, nullable = true)))
      val joiner = org.apache.spark.sql.catalyst.expressions.codegen
        .GenerateUnsafeRowJoiner.create(joinerSchemaL, joinerSchemaR)
      val toUnsafeL = UnsafeProjection.create(lOut, lOut)
      val nullRight = UnsafeProjection.create(
          rValE.map(e => Literal.create(null, e.dataType)): Seq[Expression])
        .apply(InternalRow.empty).copy()

      // Amortized per-row state. The right head's projections stay
      // valid until the NEXT rByProj/rOnProj call (only on head
      // advance), and its by-compare against the CURRENT left group is
      // cached — so in steady state a left row pays one group-boundary
      // compare and its own projections, nothing else.
      var headValid = false
      var hKey: UnsafeRow = null
      var hOnNull = false
      var hOnV = 0L
      var headCmp = 0 // byOrd.compare(hKey, current left group)
      var headCmpValid = false
      def loadHead(): Unit = {
        hKey = rKeyProj(rBuf.head)
        hOnNull = hKey.isNullAt(nBy)
        hOnV = if (hOnNull) 0L else onVal(hKey)
        headValid = true
        headCmpValid = false
      }
      def popHead(): Unit = { rBuf.next(); headValid = false }
      var prevLKey: UnsafeRow = null // copy; marks the current left group

      if (backward) {
        // one-candidate state: the latest right row at (by, on) ≤ left
        var candOn = 0L
        var candVal: UnsafeRow = null
        var groupCand = false // candidate belongs to the current group
        lIter.map { lRow =>
          val lKey = lKeyProj(lRow)
          if (prevLKey == null || byOrd.compare(prevLKey, lKey) != 0) {
            prevLKey = lKey.copy(); groupCand = false; headCmpValid = false
          }
          var matched: UnsafeRow = nullRight
          if (!lKey.isNullAt(nBy)) {
            val lOnV = onVal(lKey)
            var advance = true
            while (advance && rBuf.hasNext) {
              if (!headValid) loadHead()
              if (!headCmpValid) {
                headCmp = byOrd.compare(hKey, lKey); headCmpValid = true
              }
              if (headCmp < 0) popHead() // stale group — discard
              else if (headCmp == 0) {
                if (hOnNull) popHead() // null on never matches
                else if (hOnV <= lOnV) {
                  candOn = hOnV; candVal = valProj(rBuf.head).copy()
                  groupCand = true
                  popHead()
                } else advance = false // in group, ahead in time
              } else advance = false // head past group: cmp stays cached
            }
            if (groupCand && lOnV - candOn <= tolMax)
              matched = candVal
          }
          joiner.join(lRow match {
            case u: UnsafeRow => u
            case r => toUnsafeL(r)
          }, matched)
        }
      } else {
        // forward: the match is the right HEAD once strictly-behind
        // rows are discarded — peek, never consume a potential match
        lIter.map { lRow =>
          val lKey = lKeyProj(lRow)
          if (prevLKey == null || byOrd.compare(prevLKey, lKey) != 0) {
            prevLKey = lKey.copy(); headCmpValid = false
          }
          var matched: UnsafeRow = nullRight
          if (!lKey.isNullAt(nBy)) {
            val lOnV = onVal(lKey)
            var advance = true
            while (advance && rBuf.hasNext) {
              if (!headValid) loadHead()
              if (!headCmpValid) {
                headCmp = byOrd.compare(hKey, lKey); headCmpValid = true
              }
              if (headCmp < 0) popHead()
              else if (headCmp == 0 && (hOnNull || hOnV < lOnV)) popHead()
              else advance = false
            }
            if (rBuf.hasNext && headCmp == 0 && !hOnNull &&
                hOnV - lOnV <= tolMax)
              matched = valProj(rBuf.head)
          }
          joiner.join(lRow match {
            case u: UnsafeRow => u
            case r => toUnsafeL(r)
          }, matched)
        }
      }
    }
  }

  // ---------------------------------------------------------------- codegen
  //
  // Whole-stage codegen in the SortMergeJoinExec shape: this node is a
  // PRODUCE root — it does not fuse its children (they feed through the
  // stage's two input iterators, exactly like SMJ's streamed/buffered
  // sides) but generates the merge loop itself and hands its output
  // VARIABLES to consume(), so every parent project/filter in the stage
  // reads columns directly — no JoinedRow, no result projection, no
  // per-row iterator dispatch between this operator and its parents.

  /** CollapseCodegenStages only gives SMJ/SHJ children their own
    * codegen stages (it inserts InputAdapter for exactly those nodes);
    * any other produce-root's codegen-capable children are left inside
    * the stage but never actually produce — they'd execute through
    * their un-fused iterator paths (for the default harness shape that
    * is BOTH per-side sort + two-phase hash-aggregate chains losing
    * whole-stage compilation). Restore the SMJ shape at runtime: wrap
    * each codegen-capable child in its own WholeStageCodegenExec before
    * executing it. Invisible to plan-shape checks (no plan rewrite) and
    * falls back to interpreted execution on codegen failure exactly
    * like Spark's own stages. */
  private def ownStage(child: SparkPlan): SparkPlan = child match {
    case _: org.apache.spark.sql.execution.InputAdapter => child
    case c: CodegenSupport if c.supportCodegen =>
      org.apache.spark.sql.execution.WholeStageCodegenExec(c)(
        codegenStageId = 0)
    case _ => child
  }

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    ownStage(left).execute() :: ownStage(right).execute() :: Nil

  // exactly one output row per left row, emitted then immediately
  // consumed (shouldStop checked per iteration) — no buffer sharing
  // across emitted rows, so parents need not copy
  override def needCopyResult: Boolean = false

  protected override def doProduce(ctx: CodegenContext): String = {
    val nBy = leftBy.length
    val backward = direction == "backward"
    val tolMax = tolerance.getOrElse(Long.MaxValue)
    val onIsInt = leftOn.dataType match {
      case DateType | IntegerType => true
      case _ => false // Timestamp(NTZ) / LongType
    }
    def onGet(row: String): String =
      if (onIsInt) s"(long) $row.getInt($nBy)" else s"$row.getLong($nBy)"

    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "asofLeftInput", v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator",
      "asofRightInput", v => s"$v = inputs[1];")

    val projCls = classOf[UnsafeProjection].getName
    val ordCls = classOf[BaseOrdering].getName
    val rowCls = classOf[InternalRow].getName
    val uRowCls = classOf[UnsafeRow].getName

    val lKeyFac = ctx.addReferenceObj("lKeyFactory",
      AsOfProjFactory(BindReferences.bindReferences(
        leftBy :+ leftOn, left.output)),
      classOf[AsOfProjFactory].getName)
    val rKeyFac = ctx.addReferenceObj("rKeyFactory",
      AsOfProjFactory(BindReferences.bindReferences(
        rightBy :+ rightOn, right.output)),
      classOf[AsOfProjFactory].getName)
    val valFac = ctx.addReferenceObj("valFactory",
      AsOfProjFactory(BindReferences.bindReferences(
        rightValues: Seq[Expression], right.output)),
      classOf[AsOfProjFactory].getName)
    val ordFac = ctx.addReferenceObj("ordFactory",
      AsOfOrdFactory(leftBy.map(_.dataType)), classOf[AsOfOrdFactory].getName)

    val lKeyProj = ctx.addMutableState(projCls, "asofLKeyProj",
      v => s"$v = $lKeyFac.create();")
    val rKeyProj = ctx.addMutableState(projCls, "asofRKeyProj",
      v => s"$v = $rKeyFac.create();")
    val valProj = ctx.addMutableState(projCls, "asofValProj",
      v => s"$v = $valFac.create();")
    val byOrd = ctx.addMutableState(ordCls, "asofByOrd",
      v => s"$v = $ordFac.create();")

    // amortized right-head state (mirrors doExecute: projections happen
    // only on head advance, the by-compare is cached per left group)
    val rHead = ctx.addMutableState(rowCls, "asofRHead")
    val rHeadKey = ctx.addMutableState(uRowCls, "asofRHeadKey")
    val rHeadOnNull = ctx.addMutableState("boolean", "asofRHeadOnNull")
    val rHeadOnV = ctx.addMutableState("long", "asofRHeadOnV")
    val headCmp = ctx.addMutableState("int", "asofHeadCmp")
    val headCmpValid = ctx.addMutableState("boolean", "asofHeadCmpValid")
    val prevLKey = ctx.addMutableState(uRowCls, "asofPrevLKey")
    val candOn = ctx.addMutableState("long", "asofCandOn")
    val candVal = ctx.addMutableState(uRowCls, "asofCandVal")
    val groupCand = ctx.addMutableState("boolean", "asofGroupCand")

    val leftRow = ctx.freshName("asofLeftRow")
    val lKey = ctx.freshName("asofLKey")
    val lOnV = ctx.freshName("asofLOnV")
    val advance = ctx.freshName("asofAdvance")
    val matched = ctx.freshName("asofMatched")
    val rv = ctx.freshName("asofRV")

    val loadHead =
      s"""if ($rHead == null) {
         |  $rHead = ($rowCls) $rightInput.next();
         |  $rHeadKey = $rKeyProj.apply($rHead);
         |  $rHeadOnNull = $rHeadKey.isNullAt($nBy);
         |  $rHeadOnV = $rHeadOnNull ? 0L : ${onGet(rHeadKey)};
         |  $headCmpValid = false;
         |}
         |if (!$headCmpValid) {
         |  $headCmp = $byOrd.compare($rHeadKey, $lKey);
         |  $headCmpValid = true;
         |}""".stripMargin

    val matchBlock = if (backward) {
      s"""if (!$lKey.isNullAt($nBy)) {
         |  long $lOnV = ${onGet(lKey)};
         |  boolean $advance = true;
         |  while ($advance && ($rHead != null || $rightInput.hasNext())) {
         |    $loadHead
         |    if ($headCmp < 0) { $rHead = null; }
         |    else if ($headCmp == 0) {
         |      if ($rHeadOnNull) { $rHead = null; }
         |      else if ($rHeadOnV <= $lOnV) {
         |        $candOn = $rHeadOnV;
         |        $candVal = $valProj.apply($rHead).copy();
         |        $groupCand = true;
         |        $rHead = null;
         |      } else { $advance = false; }
         |    } else { $advance = false; }
         |  }
         |  if ($groupCand && $lOnV - $candOn <= ${tolMax}L) {
         |    $matched = true;
         |  }
         |}
         |$uRowCls $rv = $matched ? $candVal : null;""".stripMargin
    } else {
      s"""if (!$lKey.isNullAt($nBy)) {
         |  long $lOnV = ${onGet(lKey)};
         |  boolean $advance = true;
         |  while ($advance && ($rHead != null || $rightInput.hasNext())) {
         |    $loadHead
         |    if ($headCmp < 0) { $rHead = null; }
         |    else if ($headCmp == 0 && ($rHeadOnNull || $rHeadOnV < $lOnV)) {
         |      $rHead = null;
         |    } else { $advance = false; }
         |  }
         |  if ($rHead != null && $headCmp == 0 && !$rHeadOnNull &&
         |      $rHeadOnV - $lOnV <= ${tolMax}L) {
         |    $matched = true;
         |  }
         |}
         |$uRowCls $rv = $matched ? $valProj.apply($rHead) : null;""".stripMargin
    }

    // output variables: left columns read straight off the left row,
    // right values off the (possibly null) matched values row
    ctx.INPUT_ROW = leftRow
    ctx.currentVars = null
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val rightVars = rightValues.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("asofIsNull")
      val value = ctx.freshName("asofValue")
      val jt = CodeGenerator.javaType(a.dataType)
      val dv = CodeGenerator.defaultValue(a.dataType)
      val getV = CodeGenerator.getValue(rv, a.dataType, i.toString)
      val decl =
        s"boolean $isNull = ($rv == null) || $rv.isNullAt($i);\n" +
          s"$jt $value = $isNull ? $dv : ($getV);"
      ExprCode(code"$decl",
        JavaCode.isNullVariable(isNull),
        JavaCode.variable(value, a.dataType))
    }

    s"""while ($leftInput.hasNext()) {
       |  $rowCls $leftRow = ($rowCls) $leftInput.next();
       |  $uRowCls $lKey = $lKeyProj.apply($leftRow);
       |  if ($prevLKey == null || $byOrd.compare($prevLKey, $lKey) != 0) {
       |    $prevLKey = $lKey.copy();
       |    $groupCand = false;
       |    $headCmpValid = false;
       |  }
       |  boolean $matched = false;
       |  $matchBlock
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}""".stripMargin
  }
}
