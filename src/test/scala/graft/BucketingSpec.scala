package graft

import graft.store.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed fact-fact join runs with no join-side shuffle") {
    val (liT, oT) = Bucketing.bootstrap(spark, SparkTestSession.sf)
    // force a sort-merge join (at test scale the optimizer would
    // rightly broadcast; the bucketing win is the SMJ shape at scale)
    val joined = spark.table(liT).hint("merge")
      .join(spark.table(oT).hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    joined.collect()
    // AQE's toString appends the pre-adaptive "Initial Plan" — audit
    // only the final plan section
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("SortMergeJoin"), plan)
    val shuffles = plan.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("BroadcastExchange")
        && !l.contains("ReusedExchange"))
    // only the post-aggregation exchange remains; both join inputs are
    // bucket-partitioned already
    assert(shuffles == 1, s"expected 1 shuffle (post-agg), got $shuffles:\n$plan")
  }

  test("bucketed join result equals the plain parquet join") {
    val bucketed = Bucketing.bucketedJoin(spark, SparkTestSession.sf)
    val li = Tables.load(spark, SparkTestSession.sf, "lineitem")
    val o = Tables.load(spark, SparkTestSession.sf, "orders")
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(sum(Tables.dec(col("l_extendedprice"))
        * Tables.dec(lit(1) - col("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
  }
}
