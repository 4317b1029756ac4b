package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The opt-in count(DISTINCT) → HyperLogLog++ optimizer rewrite
  * ([[graft.plans.ApproxRewrite]], injected via GraftExtensions). */
class ApproxRewriteSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def q() = Tables.load(spark, sf, "orders")
    .groupBy("o_orderpriority")
    .agg(countDistinct(col("o_custkey")).as("ndv"),
      count(lit(1)).as("n"))

  test("flag off (default): plan stays exact — no HLL++ anywhere") {
    val plan = q().queryExecution.optimizedPlan.toString
    assert(!plan.contains("approx_count_distinct") && !plan.contains("hll"),
      s"unexpected approx rewrite in:\n$plan")
  }

  test("flag on: distinct count plans as HLL++ and estimates within rsd") {
    val exact = q().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Conf.withConf(spark, graft.plans.ApproxRewrite.Flag, "true") {
      val df = q()
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"),
        s"rewrite did not fire:\n$plan")
      // no Expand: the expensive exact-distinct plan shape is gone
      assert(!df.queryExecution.executedPlan.toString.contains("Expand"))
      val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.keySet == exact.keySet)
      for ((k, est) <- got) {
        val e = exact(k).toDouble
        assert(math.abs(est - e) <= 0.15 * e,
          s"$k: est $est vs exact $e beyond 3×rsd")
      }
    }
  }

  test("plain count / filtered count / multi-arg distinct stay exact") {
    Conf.withConf(spark, graft.plans.ApproxRewrite.Flag, "true") {
      // plain count is untouched by the rewrite: values must be exact
      val n = q().agg(sum(col("n"))).collect()(0).getLong(0)
      assert(n == Tables.load(spark, sf, "orders").count())
      // multi-argument count(DISTINCT a, b) has no single-expression
      // HLL++ drop-in — the rule must leave it exact
      val multi = Tables.load(spark, sf, "orders")
        .agg(countDistinct(col("o_orderstatus"), col("o_orderpriority"))
          .as("ndv2"))
      assert(!multi.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
      assert(multi.collect()(0).getLong(0) == 15) // 3 statuses × 5 priorities
    }
  }
}
