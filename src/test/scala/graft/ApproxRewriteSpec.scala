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

  test("flag on: exact percentile plans as the GK summary, close values") {
    def pq() = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("med"),
        expr("percentile(l_quantity, array(0.25, 0.75))").as("iqr"))
    val exact = pq().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // scope separation: the countDistinct flag alone must NOT touch
    // percentiles — each flag's name matches its blast radius
    Conf.withConf(spark, graft.plans.ApproxRewrite.Flag, "true") {
      val plan = pq().queryExecution.optimizedPlan.toString
      assert(!plan.contains("percentile_approx")
        && !plan.contains("approx_percentile"),
        s"countDistinct flag must not rewrite percentiles:\n$plan")
    }
    Conf.withConf(spark, graft.plans.ApproxRewrite.PercentileFlag, "true") {
      val df = pq()
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("percentile_approx")
        || plan.contains("approx_percentile"), s"no rewrite:\n$plan")
      df.collect().foreach { r =>
        // l_quantity is integral 1..50; at accuracy 10k on a few
        // thousand rows the GK summary is exact or off by ≤1
        assert(math.abs(r.getDouble(1) - exact(r.getString(0))) <= 1.0)
        val iqr = r.getSeq[Double](2)
        assert(iqr.length == 2 && iqr(0) <= iqr(1))
      }
    }
  }

  test("weighted percentile (frequency != 1) is NOT rewritten") {
    Conf.withConf(spark, graft.plans.ApproxRewrite.PercentileFlag, "true") {
      val df = Tables.load(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5, l_linenumber)").as("wmed"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("approx_percentile")
        && !plan.contains("percentile_approx"),
        s"weighted percentile must stay exact:\n$plan")
      assert(df.collect().length == 3)
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
