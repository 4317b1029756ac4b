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

  test("column stats ALONE flip the join strategy on identical files") {
   Conf.withConf(spark, "spark.sql.cbo.enabled", "true") {
   Conf.withConf(spark, "spark.sql.autoBroadcastJoinThreshold", "16384") {
    // isolation of the stats path the first test can't give: the SAME
    // megabyte-scale dim files, the same selective filter (bucket = 7,
    // 1/1000 of rows), planned twice. Without column stats the filter
    // output is estimated at the full scan size (> threshold -> sort
    // merge); with ANALYZE ... FOR ALL COLUMNS the optimizer's
    // selectivity estimate shrinks it under the threshold and the
    // planner flips to broadcast. Files never change — only the
    // catalog stats do — so the strategy change is provably
    // stats-driven, not file-driven.
    val wh = store.Catalog.warehouse
    spark.sql("DROP TABLE IF EXISTS cbo_flip_dim")
    spark.sql("DROP TABLE IF EXISTS cbo_flip_fact")
    spark.sql(s"""CREATE TABLE cbo_flip_dim (k BIGINT, bucket BIGINT,
      name STRING) USING PARQUET LOCATION '$wh/cbo_flip_dim'""")
    spark.sql(s"""CREATE TABLE cbo_flip_fact (k BIGINT, v DOUBLE)
      USING PARQUET LOCATION '$wh/cbo_flip_fact'""")
    spark.range(200000)
      .select(col("id").as("k"), (col("id") % 1000).as("bucket"),
        concat(lit("name_"), col("id")).as("name"))
      .write.mode("overwrite").insertInto("cbo_flip_dim")
    Tables.load(spark, SparkTestSession.sf, "events")
      .select((col("user_id") % 200000).as("k"), col("value").as("v"))
      .write.mode("overwrite").insertInto("cbo_flip_fact")
    // pin the fact side's estimate too, so only the dim filter varies
    spark.sql("ANALYZE TABLE cbo_flip_fact COMPUTE STATISTICS")
    def plan(): String = {
      spark.sql("REFRESH TABLE cbo_flip_dim") // drop cached relation stats
      spark.table("cbo_flip_fact")
        .join(spark.table("cbo_flip_dim").filter(col("bucket") === 7), "k")
        .groupBy("name").agg(sum("v"))
        .queryExecution.executedPlan.toString
    }
    val before = plan()
    assert(before.contains("SortMergeJoin") &&
      !before.contains("BroadcastHashJoin"),
      s"without column stats the filtered dim must not broadcast:\n$before")
    spark.sql("ANALYZE TABLE cbo_flip_dim COMPUTE STATISTICS FOR ALL COLUMNS")
    val after = plan()
    assert(after.contains("BroadcastHashJoin"),
      s"selectivity stats must flip the filtered dim to broadcast:\n$after")
   }
   }
  }

  test("catalog stats drive a three-table join REORDER") {
   Conf.withConf(spark, "spark.sql.cbo.enabled", "true") {
   Conf.withConf(spark, "spark.sql.cbo.joinReorder.enabled", "true") {
    // the syntactic order is adversarial: fact joins the BIG dim
    // first, leaving the selective dim (bucket = 7, 1/1000 rows) last,
    // so the intermediate is fact-sized. The DP reorderer can only fix
    // this if it KNOWS the filtered dim is tiny — i.e. from column
    // stats. Same isolation discipline as the flip test: identical
    // files, the only variable is ANALYZE.
    val wh = store.Catalog.warehouse
    for (t <- Seq("cbo_ro_fact", "cbo_ro_big", "cbo_ro_small"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE cbo_ro_fact (k1 BIGINT, k2 BIGINT,
      v DOUBLE) USING PARQUET LOCATION '$wh/cbo_ro_fact'""")
    spark.sql(s"""CREATE TABLE cbo_ro_big (k1 BIGINT, pad STRING)
      USING PARQUET LOCATION '$wh/cbo_ro_big'""")
    spark.sql(s"""CREATE TABLE cbo_ro_small (k2 BIGINT, bucket BIGINT,
      tag STRING) USING PARQUET LOCATION '$wh/cbo_ro_small'""")
    Tables.load(spark, SparkTestSession.sf, "events")
      .select((col("user_id") % 100000).as("k1"),
        (col("event_id") % 100000).as("k2"), col("value").as("v"))
      .write.mode("overwrite").insertInto("cbo_ro_fact")
    spark.range(100000)
      .select(col("id").as("k1"), concat(lit("pad_"), col("id")).as("pad"))
      .write.mode("overwrite").insertInto("cbo_ro_big")
    spark.range(100000)
      .select(col("id").as("k2"), (col("id") % 1000).as("bucket"),
        concat(lit("tag_"), col("id")).as("tag"))
      .write.mode("overwrite").insertInto("cbo_ro_small")
    def joinOrder(): (Int, Int) = {
      for (t <- Seq("cbo_ro_fact", "cbo_ro_big", "cbo_ro_small"))
        spark.sql(s"REFRESH TABLE $t") // drop cached relation stats
      val q = spark.table("cbo_ro_fact")
        .join(spark.table("cbo_ro_big"), "k1")
        .join(spark.table("cbo_ro_small").filter(col("bucket") === 7),
          "k2")
        .groupBy("tag").agg(sum("v"))
      val s = q.queryExecution.optimizedPlan.toString
      (s.indexOf("cbo_ro_big"), s.indexOf("cbo_ro_small"))
    }
    val (big0, small0) = joinOrder()
    assert(big0 >= 0 && small0 >= 0)
    assert(big0 < small0,
      s"without stats the syntactic order must hold (big at $big0, " +
        s"small at $small0)")
    for (t <- Seq("cbo_ro_fact", "cbo_ro_big", "cbo_ro_small"))
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
    val (big1, small1) = joinOrder()
    assert(small1 < big1,
      s"stats + DP reorder must join the selective dim first " +
        s"(big at $big1, small at $small1)")
   }
   }
  }

  test("statsAwareJoin consumes the engine's own profile for the decision") {
    import spark.implicits._
    val dim = (0L until 2000L).map(i => (i, s"name_$i")).toDF("k", "name")
    val fact = Tables.load(spark, SparkTestSession.sf, "events")
      .select((col("user_id") % 2000).as("k"), col("value").as("v"))
    val prof = analytics.StatsQueries.profile(dim, Seq("k", "name"))
      .collect()
    val est = analytics.StatsQueries.estimateBytes(prof)
    // ~2000 rows x ~25B/row: comfortably between the 10KB flip
    // threshold below and the session's default 10MB threshold
    assert(est > 20L * 1024 && est < 1024L * 1024,
      s"2000-row dim estimate out of expected band: $est bytes")
    // small profile under the default threshold -> explicit broadcast
    val small = analytics.StatsQueries
      .statsAwareJoin(spark, fact, dim, Seq("k"), prof)
      .queryExecution.executedPlan.toString
    assert(small.contains("BroadcastHashJoin"))
    // same frames, threshold (1 byte) below the estimate: the planner
    // can't auto-broadcast ANY side at that threshold, so a
    // BroadcastHashJoin could only come from statsAwareJoin's hint —
    // its absence proves the operator declined on est > threshold
    Conf.withConf(spark, "spark.sql.autoBroadcastJoinThreshold", "1") {
      val flip = analytics.StatsQueries
        .statsAwareJoin(spark, fact, dim, Seq("k"), prof)
        .queryExecution.executedPlan.toString
      assert(!flip.contains("BroadcastHashJoin"),
        s"estimate above threshold must not broadcast, got:\n$flip")
    }
  }
}
