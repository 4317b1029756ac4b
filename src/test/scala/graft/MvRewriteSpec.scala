package graft

import graft.plans.MvCatalog
import graft.store.MaterializedView
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

class MvRewriteSpec extends AnyFunSuite with BeforeAndAfterEach {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  override def afterEach(): Unit = MvCatalog.clear()

  /** Root paths of every file scan in the executed plan (descending
    * into the AQE wrapper, which `collect` does not traverse). */
  private def scanPaths(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val paths = plan.collect {
      case s: FileSourceScanExec =>
        s.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(paths.nonEmpty, s"no file scans found in:\n$plan")
    paths
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("aggregate over the base table is answered from the MV") {
    val df = MaterializedView.mvRewriteGate(spark, sf)
    val paths = scanPaths(df)
    assert(paths.nonEmpty && paths.forall(_.contains("/mv/")),
      s"expected only MV scans, got $paths")
    assert(df.count() == 3)
  }

  test("rewritten result equals the un-rewritten base-table result") {
    MaterializedView.ensureLineitemMv(spark, sf)
    val rewritten = sortedRows(MaterializedView.pricingSummary(spark, sf))
    MvCatalog.clear()
    val base = MaterializedView.pricingSummary(spark, sf)
    assert(scanPaths(base).forall(_.contains("lineitem.parquet")))
    assert(sortedRows(base) == rewritten)
  }

  test("coarser rollup and exact-grouping queries both rewrite") {
    MaterializedView.ensureLineitemMv(spark, sf)
    val exact = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"))
    val coarse = Tables.load(spark, sf, "lineitem")
      .groupBy("l_linestatus")
      .agg(max(col("l_quantity")).as("mx"))
    assert(scanPaths(exact).forall(_.contains("/mv/")))
    assert(scanPaths(coarse).forall(_.contains("/mv/")))
  }

  test("a filter blocks the rewrite (residual predicate splits groups)") {
    MaterializedView.ensureLineitemMv(spark, sf)
    val df = Tables.load(spark, sf, "lineitem")
      .filter(col("l_quantity") > 10)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"))
    assert(scanPaths(df).forall(_.contains("lineitem.parquet")))
  }

  test("an unregistered measure or group column blocks the rewrite") {
    MaterializedView.ensureLineitemMv(spark, sf)
    val badMeasure = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(Tables.dsum(col("l_discount")).as("s"))
    val badGroup = Tables.load(spark, sf, "lineitem")
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("cnt"))
    val distinctAgg = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_linestatus")).as("d"))
    assert(scanPaths(badMeasure).forall(_.contains("lineitem.parquet")))
    assert(scanPaths(badGroup).forall(_.contains("lineitem.parquet")))
    assert(scanPaths(distinctAgg).forall(_.contains("lineitem.parquet")))
  }

  test("avg (unsupported merge) leaves the plan on the base table") {
    MaterializedView.ensureLineitemMv(spark, sf)
    val df = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(avg(col("l_quantity")).as("a"))
    assert(scanPaths(df).forall(_.contains("lineitem.parquet")))
  }
}
