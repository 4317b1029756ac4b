package graft.analytics

import graft.Tables
import graft.Tables.{dec, dsum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OLAP-surface extensions beyond the reference's declared queries:
  * rollup (multi-level totals), pivot (conditional aggregation),
  * exact percentiles, and sketch-based approximate distinct counts.
  * All algebraic or single-pass; rollup/pivot stay partial-agg
  * friendly, percentiles use Spark's single-shuffle exact `percentile`
  * (at 100 TB the approx_percentile sketch is the drop-in), and HLL
  * (approx_count_distinct) is the designated cardinality sketch from
  * SURVEY.md §2.4. */
object OlapQueries {

  /** ROLLUP: revenue at (flag, status), (flag), and grand-total levels.
    * Grouping-set nulls are coalesced to 'ALL' to keep the hash
    * comparison unambiguous. */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_extendedprice"))).cast("double").as("revenue"),
        count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("revenue"), col("cnt"))

  /** PIVOT: per-priority order counts spread across status columns
    * (expressed as conditional aggregation for the oracle). */
  def pivotStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_orderpriority"),
        col("F").as("n_f"), col("O").as("n_o"), col("P").as("n_p"))

  /** Exact median + p90 of order value per priority. Values are money
    * doubles; both engines interpolate linearly over the same sorted
    * doubles. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"))

  /** HLL sketch cardinality vs exact — the scale path for distinct
    * counts (no exact-distinct shuffle). Approximate: rows-only gate;
    * the spec asserts the error bound. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_rollup" -> rollupRevenue _,
    "agg_pivot" -> pivotStatus _,
    "agg_percentiles" -> percentiles _,
    "agg_approx_distinct" -> approxDistinct _)

  val oracles: Map[String, String] = Map(
    "agg_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS cnt
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "agg_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "agg_percentiles" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.9) AS p90
        |FROM orders GROUP BY o_orderpriority""".stripMargin)
    // agg_approx_distinct: sketch-based — rows-only.
}
