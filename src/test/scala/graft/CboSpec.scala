package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based optimization driven by CATALOG statistics — the other
  * half of the stats story next to `stats_analyze` (which computes
  * profile numbers as a query): ANALYZE TABLE persists row/column
  * stats into the catalog, and the planner consumes them. The spec
  * proves the loop lands: ANALYZE persists stats and the optimizer
  * SURFACES them (rowCount on the optimized plan under CBO — the
  * assert that actually pins catalog-stats consumption), and the
  * hint-free dim⋈fact join broadcasts the small side. Honest caveat
  * on the second assert: a kilobyte dim would broadcast from file
  * size alone too, so the broadcast check is a sanity pin, not an
  * isolation of the catalog path — the rowCount assert is the
  * catalog-specific one. */
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
