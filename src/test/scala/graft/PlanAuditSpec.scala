package graft

import org.scalatest.funsuite.AnyFunSuite

/** Surface-wide physical-plan audit: every gate query in
  * [[SparkEntry.queries]] must plan without a nested-loop or cartesian
  * operator. Local plan-shape asserts exist where a query was built
  * specifically to avoid one (RangeJoinSpec, SimilaritySpec,
  * BucketingSpec); this spec closes the gap for everything else, so an
  * accidental BNLJ from a refactored non-equi condition can't land
  * silently anywhere on the surface.
  *
  * `executedPlan` (post-EnsureRequirements, pre-execution for AQE
  * plans) is the right level: it shows what Spark would actually run,
  * including the join strategy, without needing to execute anything
  * beyond what the query constructor itself runs.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Queries allowed to contain a nested-loop/cartesian operator.
    * Currently empty — additions require a justifying comment. */
  private val allow: Set[String] = Set.empty

  private val banned = Seq("BroadcastNestedLoopJoin", "CartesianProduct")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
       if !allow.contains(name)) {
    test(s"$name plans without nested-loop or cartesian operators") {
      val plan = fn(spark, SparkTestSession.sf)
        .queryExecution.executedPlan.toString
      for (op <- banned)
        assert(!plan.contains(op), s"$name plan contains $op:\n$plan")
    }
  }
}
