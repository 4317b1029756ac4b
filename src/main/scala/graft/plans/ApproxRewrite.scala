package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Count, HyperLogLogPlusPlus, Percentile}
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Opt-in approximate-query mode for distinct counts — the BlinkDB /
  * "approximation knob" idea (Agarwal et al., EuroSys 2013) applied at
  * the OPTIMIZER layer rather than the API: with
  * `spark.graft.approx.countDistinct=true`, every `count(DISTINCT x)`
  * in a logical Aggregate is rewritten to the mergeable HyperLogLog++
  * estimator (Heule et al. 2013 — Spark's own `approx_count_distinct`
  * function) before physical planning.
  *
  * Why this is a 100 TB lever: an exact distinct count must shuffle
  * every distinct VALUE (the expand + two-phase distinct-agg plan —
  * O(ndv) exchange bytes and a skew hazard when one group dominates),
  * while HLL++ shuffles a fixed few-KB register blob per group
  * regardless of cardinality — the same fixed-state contract as the
  * [[graft.analytics.Sketches]] gates, here reached without changing
  * a line of query code. Dashboards and data-profiling sweeps opt in
  * per session; money paths simply leave the flag off (default).
  *
  * Mechanics: only the aggregate FUNCTION is swapped
  * (`Count(child), isDistinct=true` → `HyperLogLogPlusPlus(child)`);
  * the enclosing Alias keeps its exprId and the result type is
  * LongType either way, so downstream operators and column names are
  * untouched. Multi-argument `count(DISTINCT a, b)` and filtered
  * variants keep their filter/argument shape or are left exact —
  * fire only when provably drop-in (the [[MvRewrite]] discipline).
  * The rewrite output contains no distinct Count, so the rule is a
  * fixed-point no-op on its own output.
  */
object ApproxRewrite extends Rule[LogicalPlan] {

  val Flag = "spark.graft.approx.countDistinct"
  val RsdKey = "spark.graft.approx.rsd"

  /** Second rewrite under its OWN flag: exact `percentile(x, p)` →
    * `approx_percentile` (Greenwald–Khanna quantile summaries). The
    * exact form buffers EVERY value per group (O(rows) aggregation
    * state — the one built-in aggregate that cannot stream at 100 TB);
    * the summary is fixed-size and mergeable. The child is cast to
    * double so the approx result type matches exact percentile's
    * DOUBLE (resp. array) exactly — drop-in at the schema level.
    * Fires only for numeric children with the default frequency of 1
    * (weighted percentiles have no approx twin). Separate key so a
    * session opting in to approximate distinct counts does not
    * silently also get approximate percentiles — each flag's name
    * matches its blast radius exactly. */
  val PercentileFlag = "spark.graft.approx.percentile"
  val AccuracyKey = "spark.graft.approx.percentileAccuracy"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val doDistinct = conf.getConfString(Flag, "false").toBoolean
    val doPct = conf.getConfString(PercentileFlag, "false").toBoolean
    if (!doDistinct && !doPct) plan
    else {
      val rsd = conf.getConfString(RsdKey, "0.05").toDouble
      val acc = conf.getConfString(AccuracyKey, "10000").toInt
      plan.transform {
        case agg: Aggregate =>
          agg.copy(aggregateExpressions = agg.aggregateExpressions
            .map(rewriteNamed(_, doDistinct, doPct, rsd, acc)))
      }
    }
  }

  private def rewriteNamed(e: NamedExpression, doDistinct: Boolean,
      doPct: Boolean, rsd: Double, acc: Int): NamedExpression =
    e.transformUp {
      case ae @ AggregateExpression(Count(Seq(child)), mode, true, filter, _)
          if doDistinct && child.deterministic =>
        AggregateExpression(HyperLogLogPlusPlus(child, rsd), mode,
          isDistinct = false, filter, NamedExpression.newExprId)
      case ae @ AggregateExpression(p: Percentile, mode, false, filter, _)
          if doPct
            && p.child.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
            && p.frequencyExpression == Literal(1L)
            && !p.reverse && p.child.deterministic =>
        AggregateExpression(
          ApproximatePercentile(Cast(p.child, DoubleType),
            p.percentageExpression, Literal(acc, IntegerType), 0, 0),
          mode, isDistinct = false, filter, NamedExpression.newExprId)
    }.asInstanceOf[NamedExpression]
}
