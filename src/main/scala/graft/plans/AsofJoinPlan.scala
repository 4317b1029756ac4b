package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join as a first-class Catalyst plan — the (c)
  * rung of the extension ladder (SURVEY.md §4.3): a custom
  * `LogicalPlan` node, a `SparkStrategy` that plans it, and a
  * `SparkPlan` with real distribution/ordering contracts, injected via
  * `SparkSessionExtensions.injectPlannerStrategy`.
  *
  * Semantics (matches [[graft.operators.AsofJoin.asof]] and DuckDB's
  * `ASOF LEFT JOIN`): for every right row, the LAST left row in
  * (key, ts, tie) order with equal key and left.ts <= right.ts; right
  * rows with no such left row emit null-padded left columns.
  *
  * Why a physical operator instead of the union+window composition:
  * the exec declares `requiredChildDistribution` (clustered on key)
  * and `requiredChildOrdering` ((key, ts, tie) ascending), so
  * EnsureRequirements plans ONE exchange + sort per side — the same
  * cost as the composed form — but the probe itself is a zero-copy
  * streaming merge with O(1) state (the current match candidate) per
  * partition: no union row blowup, no window buffer, no null-carry
  * columns. If either side is already bucketed+sorted by (key, ts)
  * the exchange/sort drop out entirely, which the composed windowed
  * form can never express.
  */
case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    leftTie: Expression, rightTie: Expression) extends BinaryNode {

  /** Right columns first (one output row per right row), left columns
    * nullable (unmatched rights pad with null). */
  override def output: Seq[Attribute] =
    right.output ++ left.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Merge-scan executor. Key and ts expressions must be long-backed
  * types (integral or timestamp — both store as long internally),
  * which keeps the per-row comparisons primitive; the corpus keys
  * (user_id bigint, ts timestamp) satisfy this, and the API wrapper
  * enforces it at construction. */
case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    leftTie: Expression, rightTie: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    right.output ++ left.output.map(_.withNullability(true))

  /** Both sides clustered on the join key — the same contract
    * SortMergeJoinExec declares, so EnsureRequirements co-partitions
    * the sides (or reuses an existing bucketed layout). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Within each partition: (key, ts, tie) ascending on both sides —
    * what makes the single-pass merge correct and deterministic. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending),
      SortOrder(leftTie, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTie, Ascending)))

  /** One output row per right row, partitioned as the right side. */
  override def outputPartitioning: Partitioning = right.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lk = leftKey
    val lt = leftTs
    val rk = rightKey
    val rt = rightTs
    val out = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      // (key, ts) extractors; UnsafeProjection output is reused per
      // call, so longs are read out immediately
      val lProj = UnsafeProjection.create(Seq(lk, lt), leftOut)
      val rProj = UnsafeProjection.create(Seq(rk, rt), rightOut)
      // left attrs bound NULLABLE: unmatched rights read the null-pad
      // row, and a non-nullable BoundReference would skip the null
      // check and read garbage zeros
      val outProj = UnsafeProjection.create(out,
        rightOut ++ leftOut.map(_.withNullability(true)))
      val nullLeft = new GenericInternalRow(leftOut.size)
      val joined = new JoinedRow
      val lBuf = lIt.buffered
      var matchRow: InternalRow = null
      var matchKey = 0L
      rIt.map { rRow =>
        val rkv = rProj(rRow)
        val rKeyV = rkv.getLong(0)
        val rTsV = rkv.getLong(1)
        var advance = true
        while (advance && lBuf.hasNext) {
          val lkv = lProj(lBuf.head)
          val lKeyV = lkv.getLong(0)
          val lTsV = lkv.getLong(1)
          if (lKeyV < rKeyV || (lKeyV == rKeyV && lTsV <= rTsV)) {
            val consumed = lBuf.next()
            if (lKeyV == rKeyV) {
              // copy: the scan/sort iterator reuses its row buffer
              matchRow = consumed.copy()
              matchKey = lKeyV
            }
            // rows with lKeyV < rKeyV can never match a later right
            // row either (right keys are ascending) — drop them
          } else advance = false
        }
        if (matchRow != null && matchKey == rKeyV)
          outProj(joined(rRow, matchRow))
        else outProj(joined(rRow, nullLeft))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one physical candidate per [[AsofJoinNode]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lts, rts, ltie, rtie) =>
      AsofJoinExec(planLater(l), planLater(r),
        lk, rk, lts, rts, ltie, rtie) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule: push right-side predicates through [[AsofJoinNode]].
  *
  * Catalyst's PushDownPredicates stops at nodes it doesn't know, so
  * without this rule a `WHERE` over the as-of output re-reads the
  * whole fact table and filters after the merge. Pushing is SOUND for
  * right-referencing conjuncts only: output rows are 1:1 with right
  * rows and a right row's match depends on the left side alone, so
  * dropping right rows early changes nothing else. LEFT-side
  * predicates must NOT be pushed — removing a left row can change
  * which row a surviving right row matches. Once the conjunct sits on
  * the right child, Catalyst's own pushdown carries it the rest of
  * the way into the scan (`PushedFilters`). */
object AsofJoinPushDown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, a: AsofJoinNode) =>
      val rightSet = AttributeSet(a.right.output)
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.references.subsetOf(rightSet) && p.deterministic)
      if (push.isEmpty) f
      else {
        val pushed = a.copy(right = Filter(push.reduce(And), a.right))
        keep.reduceOption(And)
          .map(Filter(_, pushed): LogicalPlan).getOrElse(pushed)
      }
  }
}
