package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bloom-pruned semi join equals the plain semi join") {
    val li = Tables.load(spark, SparkTestSession.sf, "lineitem")
    val urgent = Tables.load(spark, SparkTestSession.sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val plain = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"),
        "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"))
    val bloomed = BloomJoin.bloomSemiJoin(spark, SparkTestSession.sf)
      .select("l_returnflag", "n_items")
    assert(plain.exceptAll(bloomed).isEmpty
      && bloomed.exceptAll(plain).isEmpty)
  }

  test("bloom probe is a native predicate in the executed plan") {
    val plan = BloomJoin.bloomSemiJoin(spark, SparkTestSession.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
  }

  test("bloom prunes non-matching fact rows before the join") {
    val li = Tables.load(spark, SparkTestSession.sf, "lineitem")
    val urgent = Tables.load(spark, SparkTestSession.sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val total = li.count()
    val matching = li.join(urgent,
      li("l_orderkey") === urgent("o_orderkey"), "left_semi").count()
    val survivors = BloomJoin.bloomReduce(li, col("l_orderkey"), urgent,
      math.max(1024L, urgent.count())).count()
    // no false negatives: every matching row survives the bloom
    assert(survivors >= matching)
    // the filter actually reduces shuffle volume: survivors must sit
    // well below the full fact count (fpp=1% over the ~80% non-matching
    // bulk leaves survivors ~ matching + 0.01 * (total - matching))
    assert(survivors < matching + (total - matching) / 4,
      s"total=$total matching=$matching survivors=$survivors")
  }
}
