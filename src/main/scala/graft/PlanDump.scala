package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump formatted physical plans for a curated set of gate
  * queries to `PLANS.md` — the in-repo record of the plan-quality
  * claims in SCALE.md (pushdown reaching scans, broadcast vs shuffle
  * joins, WholeStageCodegen spans, no nested-loop operators). Batch
  * queries only: streaming gates execute via memory sinks, so their
  * returned frame's plan is the snapshot read, not the streaming plan
  * (StreamingSpec pins those shapes instead).
  */
object PlanDump {

  /** Queries whose plans carry the main scale arguments: the most
    * expensive valid bench entries plus one representative per
    * plan-shape family (pushdown, broadcast star, bucketed join,
    * salted skew join, native as-of plan, LSH banding, IVF probe). */
  val picks: Seq[String] = Seq(
    "core_retention_filter", // pushed-down time predicate on the scan
    "join_agg",              // broadcast dim + shuffled fact-fact
    "join_bucketed",         // exchange-free bucketed join
    "skew_salted_join",      // salt-exploded skew join
    "asof_join_native",      // custom LogicalPlan + SparkStrategy
    "yearly_revenue",        // decimal-exact aggregation
    "window_running_sum",    // keyed window, no global sort
    "ts_holt",               // truncated-recursion smoothing as lags
    "ts_seasonal",           // bounded-frame marginal windows
    "behavior_rfm",          // percentile-edge buckets, no sort/window
    "agg_approx_percentile", // sketch vs exact percentile
    "stats_analyze",         // melt profile: Expand-free multi-NDV
    "stats_cuped",           // per-user agg + scalar-literal readout
    "dedup_minhash_bands",   // shuffle-free shingles -> band buckets
    "dedup_simhash_pairs",   // broadcast bucket stats + map-side pairs
    "dedup_setsim",          // PPJoin prefix filter + merge verify
    "knn_ivf",               // cell-probed ANN
    "text_tfidf",            // tf/df aggregation + broadcast join
    "train_pipeline",        // curation capstone
    "train_token_budget",    // two-level banded prefix sum
    "behavior_attribution_linear", // banded x2 interval join
    "ts_interpolate",        // bounded-frame neighbor windows
    "train_upsample",        // map-side sequence/explode schedule
    "agg_percentile_banded", // domain-bounded exact quantiles
    "stats_mannwhitney",     // rank-free rank-sum over value cells
    "funnel_sessionized",    // one-exchange session windows chain
    "sql_lateral",           // decorrelated LIMIT -> WindowGroupLimit
    "join_null_aware_anti",  // single-key NAAJ, no nested loop
    "join_incremental",      // delta-join quadrant union
    "curate_joint",          // cross-modal join + bounded stats
    "dedup_rewrite",         // block window + ordered reassembly
    "ts_concurrency",        // chunked sweep-line prefix sum
    "join_point_in_time",    // SCD2 interval residual on one exchange
    "graph_link_predict",    // degree-capped wedge join + anti-join
    "ts_rolling_slope",      // five integer moments, one window pass
    "behavior_seq_support",  // min-ts pre-agg before alphabet fan-out
    "asof_join_nearest",     // two merge scans + row-wise argmin
    "graph_pagerank",        // edge build + unrolled iteration (edges
                             // checkpointed at runtime, lazy in audit)
    "multimodal_phash_pairs", // real aHash + 16-bit band equi-join
    "stats_bcast_decision",  // engine-profile broadcast decision
    "stats_spearman",        // ranks from bounded dictionaries, no sort
    "train_eval",            // margin-dictionary confusion + AUC
                             // (perceptron round joins now visible:
                             // lazyPlans threads the training loop)
    "dedup_canonical_incremental", // staged-index delta fold: prefix
                             // join + verify + contracted star solve
    "sketch_hll_distinct",   // register build: one partial-agg shuffle
    "sketch_kmv_union",      // flagged min-k via TakeOrderedAndProject
    "aqp_uniform_sum",       // one-scan HT estimate + truth eval
    "agg_q1_pricing",        // the canon: pushed scan + one hash agg
    "join_q5_volume",        // 6-table: one fact shuffle, dims broadcast
    "agg_q6_forecast",       // all three predicates in PushedFilters
    "join_q19_disjunctive",  // branch-union prefilters push per side
    "dp_sum_clipped",        // DP release: noise on group rows only
    "ts_twa")                // one lead() window pass per type

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(Conf.master(cpus))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of headline gate queries\n\n")
    sb.append(s"Generated by `graft.PlanDump` at `$sfDir`. Regenerate: ")
    sb.append("`sbt \"runMain graft.PlanDump\"`.\n")
    sb.append("Read together with SCALE.md; PlanAuditSpec enforces the ")
    sb.append("no-nested-loop invariant over the WHOLE surface, this file ")
    sb.append("records what the interesting plans actually look like.\n")
    for (name <- picks; fn <- SparkEntry.queries.get(name)) {
      // lazyPlans: checkpoint-then-release gates otherwise dump as an
      // opaque `Scan ExistingRDD` AND execute their full workload here
      val plan =
        try Conf.withConf(spark, "spark.graft.internal.lazyPlans", "true") {
          fn(spark, sfDir).queryExecution.explainString(
            ExplainMode.fromString("formatted"))
        }
        catch { case e: Throwable => s"(failed: ${e.getMessage})" }
        finally spark.catalog.clearCache() // lazyPlans skips the gates' own release
      // full plans for the heavies run to thousands of lines of
      // per-column detail; the operator tree + first detail blocks
      // carry the plan shape
      val lines = plan.linesIterator.toSeq
      val shown = if (lines.length > 150) lines.take(150) :+
        s"... (${lines.length - 150} more lines)" else lines
      sb.append(s"\n## $name\n\n```\n${shown.mkString("\n")}\n```\n")
      spark.catalog.clearCache()
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    spark.stop()
  }
}
