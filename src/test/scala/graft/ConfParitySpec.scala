package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Execution-conf parity: gate results must be BITWISE invariant to
  * how the engine schedules them — shuffle partition count, adaptive
  * execution, and join-strategy selection. This is the local proof of
  * the 1000-executor claim: on a real cluster AQE re-plans stages at
  * runtime, speculative retries re-execute partitions, and ops teams
  * retune `spark.sql.shuffle.partitions` per deployment; none of that
  * may change a query's rows. The engine's design rules that make this
  * hold (decimal-exact money math, struct-max instead of bare argmax,
  * explicit smallest-label tie rules, integer fixed-point quotients)
  * are each documented at their call sites — this spec sweeps the
  * heaviest shuffle/iteration gates end-to-end so a future change that
  * sneaks in a partition-order dependency (float accumulation, first()
  * without order, zipWithIndex) fails here instead of flaking at the
  * oracle once per corpus.
  *
  * Conf axes swept (vs the suite baseline of 4 partitions + AQE on):
  *  - `spark.sql.shuffle.partitions` 4 -> 9 -> 17: different hash
  *    partition boundaries, different per-task row groupings, different
  *    merge orders in every aggregation.
  *  - `spark.sql.adaptive.enabled` on/off: with AQE off, no runtime
  *    coalescing/skew-splitting — the static plan must agree with the
  *    re-planned one.
  *  - `spark.sql.autoBroadcastJoinThreshold` -1: every non-hinted join
  *    falls back from broadcast-hash to shuffle/sort-merge — strategy
  *    choice must be output-invariant (explicit `broadcast()` hints
  *    still apply, which is fine: the hint is part of the plan, the
  *    threshold is not).
  */
class ConfParitySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  /** Canonical row multiset: every value rendered to string, rows
    * sorted. Gates emit deterministic longs/decimals/strings/dates by
    * design (floats are banned from gate outputs), so string equality
    * is exact equality. */
  private def canon(df: DataFrame): Seq[String] =
    df.collect().toSeq
      .map(_.toSeq.map(String.valueOf).mkString("\u0001"))
      .sorted

  private def withConfs[T](kvs: (String, String)*)(body: => T): T =
    kvs.foldRight(() => body) { case ((k, v), inner) =>
      () => Conf.withConf(spark, k, v)(inner())
    }()

  /** Shuffle/iteration-heavy representatives, one per plan family:
    * iterative star CC, LSH + 4-round LPA + tagging, PPJoin, Lloyd's
    * k-means, banded prefix sum, chunked running sum, salted skew
    * join, dictionary-rank Spearman, any-gap sequence mining. */
  private val sample = Seq(
    "dedup_clusters", "graph_modularity", "dedup_setsim",
    "embed_clusters", "train_token_budget", "window_running_sum_chunked",
    "skew_salted_join", "stats_spearman", "behavior_seq_support",
    "sketch_kmv_union", "sketch_hll_distinct",
    "agg_q1_pricing", "join_q10_returns", "join_q18_big_orders",
    // r7 widening: the newest, most arithmetic-sensitive families —
    // AQP (HT totals over LCG buckets: any partition-order leak in the
    // decimal sums drifts var/coverage), the remaining sketches (KMV
    // k-th order statistic, HLL register merge, equi-depth cut points),
    // eval stats (ANOVA F quotient, replicate agreement), and the
    // remaining TPC-H canons (Q1 covered above; Q5 6-table chain).
    "aqp_uniform_sum", "aqp_stratified_sum", "aqp_groupby_ci",
    "aqp_replicate_spread",
    "sketch_kmv_distinct", "sketch_hll_union", "sketch_hist_quantiles",
    "stats_anova", "dedup_method_agreement", "ts_backtest",
    "join_q5_volume", "agg_cube", "text_tfidf",
    // r7 families: DP noise (trailing-zero sampler must not see
    // partition order), the new canons (top-k tiebreak cut, disjunctive
    // survivor set), and the TWA window pass
    "dp_randomized_response", "dp_sum_clipped",
    "join_q3_shipping", "agg_q6_forecast", "join_q19_disjunctive",
    "ts_twa",
    // r9: the canonical dedup's adaptive component solve (driver
    // union-find under the edge cap) plus its min-id tie rules must
    // hold under every scheduling variant
    "dedup_setsim_canonical")

  private val variants: Seq[(String, Seq[(String, String)])] = Seq(
    "p9-noAQE" -> Seq(
      "spark.sql.shuffle.partitions" -> "9",
      "spark.sql.adaptive.enabled" -> "false"),
    "p17-noBroadcast" -> Seq(
      "spark.sql.shuffle.partitions" -> "17",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"))

  for (gate <- sample) {
    test(s"$gate is invariant to shuffle partitioning, AQE, and join strategy") {
      val q = SparkEntry.queries(gate)
      val baseline = canon(q(spark, sf))
      assert(baseline.nonEmpty, s"$gate returned no rows at sf0.001")
      for ((name, kvs) <- variants) {
        // collect INSIDE the conf scope: a lazily-returned frame would
        // plan under the restored conf (Conf.withConf contract).
        val got = withConfs(kvs: _*)(canon(q(spark, sf)))
        assert(got == baseline, s"$gate drifted under $name")
      }
    }
  }
}
