package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed range join equals the naive interval join") {
    import spark.implicits._
    val naive = Tables.load(spark, SparkTestSession.sf, "orders")
      .join(RangeJoin.bands.toDF("band", "lo", "hi"),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_orders"),
        Tables.dsum(col("o_totalprice")).as("price_sum"))
    val bucketed = RangeJoin.rangeJoinBucketed(spark, SparkTestSession.sf)
    assert(naive.exceptAll(bucketed).isEmpty
      && bucketed.exceptAll(naive).isEmpty)
  }

  test("eventsFrom pushes the time predicate into the parquet scan") {
    // SCALE.md claims pushed-down retention scans; pin it. The filter
    // must reach the scan as a PushedFilter on the RAW stored column —
    // ns bigint or timestamp, whichever the corpus ships (filtering
    // after Tables.tsNormalizer would defeat pushdown either way).
    val plan = Tables.eventsFrom(spark, SparkTestSession.sf,
        "2024-01-15 00:00:00")
      .queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("PushedFilters")).getOrElse("")
    assert(scanLine.contains("GreaterThanOrEqual(ts"), s"no pushdown:\n$plan")
  }

  test("bucketed form plans as an equi-join, not a nested loop") {
    val plan = RangeJoin.rangeJoinBucketed(spark, SparkTestSession.sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }
}
