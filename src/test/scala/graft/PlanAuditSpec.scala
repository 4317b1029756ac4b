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
    * Additions require a justifying comment.
    *
    * embed_norm_outliers: attaches a corpus-global scalar (mean norm)
    * to every row. The build side is ONE aggregate row, so the
    * "nested loop" is a single broadcast lookup per row — O(n), the
    * canonical scalar-attach plan (Spark plans uncorrelated scalar
    * subqueries the same way). The code even constructs a constant-key
    * equi-join, but Catalyst constant-folds the key away and plans the
    * BNLJ regardless; banning it would just force a worse shape
    * (corpus-wide single-partition window). */
  private val allow: Set[String] = Set("embed_norm_outliers")

  private val banned = Seq("BroadcastNestedLoopJoin", "CartesianProduct")

  /** Gates whose optimized plan contains a GLOBAL (empty-partition)
    * window — legal ONLY when the window's input is provably bounded
    * (value-domain histograms, calendar days, ≤2k sketch members, LSH
    * bands; each call site built via `Tables.boundedGlobalWindow` or
    * `Window.partitionBy()` carries its bound in a comment). Spark 4's
    * optimizer folds constant partition keys back out, so the runtime
    * warning can't distinguish intended from accidental — this
    * whitelist can, and a refactor that grows a corpus-scale global
    * window on any OTHER gate fails here instead of flooding logs.
    * Additions require the same justifying comment as `allow`. */
  private val boundedGlobalWindow: Set[String] = Set(
    // value-domain histograms (≤ distinct cents / gap bands / buckets)
    "agg_gini", "agg_lorenz", "agg_percentile_banded", "stats_mannwhitney",
    "behavior_time_to_convert", "curate_dsir", "curate_quality_gate",
    "train_dsir", "train_token_budget", "train_upsample",
    // calendar-bounded frames (≤ corpus days)
    "behavior_cohort_retention", "behavior_user_growth", "ts_concurrency",
    // sketch/contingency frames (≤ 2k members / |types|×7 cells / d·w grid)
    "agg_kmv_setops", "stats_chi2", "stats_join_size",
    // alphabet-bounded LM normalizer (≤ vocabulary rows)
    "text_lm_score")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
       if !allow.contains(name)) {
    test(s"$name plans without nested-loop or cartesian operators") {
      val qe = fn(spark, SparkTestSession.sf).queryExecution
      val plan = qe.executedPlan.toString
      for (op <- banned)
        assert(!plan.contains(op), s"$name plan contains $op:\n$plan")
      // global-window audit on the OPTIMIZED logical plan — after the
      // constant-partition fold, i.e. exactly what warns at runtime
      val global = qe.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      if (global.nonEmpty)
        assert(boundedGlobalWindow.contains(name),
          s"$name grew an unaudited GLOBAL window (bounded? add to " +
            s"whitelist with its bound):\n${global.head}")
      else
        assert(!boundedGlobalWindow.contains(name),
          s"$name no longer has a global window; remove it from the " +
            "whitelist so the audit stays tight")
    }
  }
}
