package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based optimization driven by CATALOG statistics — the other
  * half of the stats story next to `stats_analyze` (which computes
  * profile numbers as a query): ANALYZE TABLE persists row/column
  * stats into the catalog, and the planner consumes them. The spec
  * proves the full loop: stats land (rowCount visible on the
  * optimized plan), and a dim⋈fact join picks BroadcastHashJoin from
  * the DIM'S SIZE STATS ALONE — no broadcast() hint, no file-size
  * heuristic (the threshold check runs against catalog stats, which
  * is how a 100 TB warehouse gets correct join strategies for views
  * and tables whose file listing is too expensive to size). */
class CboSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("analyze-table stats reach the optimizer and pick the broadcast side") {
   Conf.withConf(spark, "spark.sql.cbo.enabled", "true") {
    val wh = store.Catalog.warehouse
    spark.sql("DROP TABLE IF EXISTS cbo_dim")
    spark.sql("DROP TABLE IF EXISTS cbo_fact")
    spark.sql(s"""CREATE TABLE cbo_dim (k BIGINT, name STRING)
      USING PARQUET LOCATION '$wh/cbo_dim'""")
    spark.sql(s"""CREATE TABLE cbo_fact (k BIGINT, v DOUBLE)
      USING PARQUET LOCATION '$wh/cbo_fact'""")
    import spark.implicits._
    (0L until 50L).map(i => (i, s"n$i")).toDF("k", "name")
      .write.mode("overwrite").insertInto("cbo_dim")
    Tables.load(spark, SparkTestSession.sf, "events")
      .select((col("user_id") % 50).as("k"), col("value").as("v"))
      .write.mode("overwrite").insertInto("cbo_fact")
    spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.sql("ANALYZE TABLE cbo_fact COMPUTE STATISTICS")
    // 1) stats are in the catalog and visible to the optimizer
    val dimStats = spark.table("cbo_dim")
      .queryExecution.optimizedPlan.stats
    assert(dimStats.rowCount.contains(BigInt(50)),
      s"dim rowCount stat missing: $dimStats")
    // 2) the join broadcasts the small side with NO hint
    val joined = spark.table("cbo_fact")
      .join(spark.table("cbo_dim"), "k")
      .groupBy("name").agg(sum("v"))
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"),
      s"expected stats-driven broadcast, got:\n$physical")
   }
  }
}
