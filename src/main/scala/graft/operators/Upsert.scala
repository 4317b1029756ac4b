package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed upsert (K1) — the reference's `INSERT ... ON CONFLICT (symbol,
  * timestamp) DO UPDATE` (behavior at reference/scripts/
  * fetch_stock_data.py:80-126), re-expressed as a distributed merge:
  *
  *  - last-writer-wins per key: an incoming batch row replaces the
  *    current row's *update* columns;
  *  - *preserve* columns (the reference keeps `time_zone` and
  *    `created_at` from the first insert) retain the oldest value for
  *    the key;
  *  - keys only in the batch are inserted as-is.
  *
  * Implementation is one shuffle on the merge keys: union both sides
  * tagged with a writer rank, then a single window pass takes the newest
  * row per key while `first(preserve)` over the ascending order pins the
  * original insert's values. At 100 TB the table side would be a
  * partitioned lakehouse table and this same plan runs per affected
  * partition (dynamic partition overwrite prunes untouched partitions);
  * the merge itself stays a single hash-partitioned exchange either way.
  */
object Upsert {

  /** Merge `batch` into `current`. Both must share a schema.
    * @param keys      conflict key columns
    * @param preserve  columns that keep the first-inserted value
    */
  def upsert(current: DataFrame, batch: DataFrame, keys: Seq[String],
      preserve: Seq[String] = Nil): DataFrame = {
    val cols = current.columns.toSeq
    val updateCols = cols.filterNot(c => keys.contains(c) || preserve.contains(c))
    val tagged = current.withColumn("_writer", lit(0))
      .unionByName(batch.select(cols.map(col): _*).withColumn("_writer", lit(1)))
    // One hash aggregation, no sort: the newest writer's update columns
    // via max_by over a struct, the first writer's preserve columns via
    // min_by. Partial aggregation collapses duplicate keys map-side, so
    // the shuffle carries at most one row per (partition, key) — the
    // cheapest possible merge shape.
    val aggs =
      max_by(struct(updateCols.map(col): _*), col("_writer")).as("_u") +:
        preserve.map(c => min_by(col(c), col("_writer")).as(c))
    tagged.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(cols.map {
        case c if updateCols.contains(c) => col(s"_u.$c").as(c)
        case c => col(c)
      }: _*)
  }

  /** Write the merged table as date-partitioned parquet with dynamic
    * partition overwrite — only partitions containing merged keys are
    * rewritten (the 100 TB path; local tests use a temp dir). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Dynamic partition overwrite into a partitioned catalog table:
    * only partitions present in `df` are replaced; every other
    * partition's files are untouched. Stages through a temp directory
    * because the rewritten rows are read from the same table (Spark
    * refuses an in-place overwrite of a path being scanned). The
    * staging volume is the touched partitions only, never the table. */
  def overwritePartitionsInto(spark: SparkSession, df: DataFrame,
      table: String): Unit = {
    val staging = java.nio.file.Files
      .createTempDirectory(s"graft_dynovr_$table").toString
    df.write.mode("overwrite").parquet(staging)
    // the writer option form of partitionOverwriteMode is only honored
    // on path-based writes, not insertInto — set the session conf for
    // the duration of the insert instead
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try spark.read.parquet(staging).write.mode("overwrite").insertInto(table)
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Gate query: upsert an update+insert batch derived from `orders`
    * onto `orders` itself; deterministic, oracle-expressible.
    * `created_at` (mapped from o_orderdate) must survive updates. */
  def upsertLww(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val current = orders.select(
      col("o_orderkey"),
      col("o_totalprice").as("price"),
      col("o_orderstatus").as("status"),
      col("o_orderdate").as("created_at"))
    val updates = orders.filter(col("o_orderkey") % 3 === 0).select(
      col("o_orderkey"),
      (col("o_totalprice") + lit(1000.0)).as("price"),
      lit("U").as("status"),
      lit("2030-01-01 00:00:00").cast("timestamp").as("created_at"))
    val inserts = orders.filter(col("o_orderkey") < 5).select(
      (col("o_orderkey") + lit(10000000L)).as("o_orderkey"),
      col("o_totalprice").as("price"),
      lit("N").as("status"),
      lit("2030-01-01 00:00:00").cast("timestamp").as("created_at"))
    upsert(current, updates.unionByName(inserts),
      keys = Seq("o_orderkey"), preserve = Seq("created_at"))
  }

  /** Idempotence probe: applying the same batch twice equals once —
    * the reference's re-fetch overlap behavior (M3). Returns per-status
    * counts of upsert(upsert(s,b),b), which the oracle reproduces. */
  def upsertIdempotent(spark: SparkSession, dir: String): DataFrame = {
    val once = upsertLww(spark, dir)
    val batch = once.filter(col("status") === "U")
    upsert(once, batch, Seq("o_orderkey"), Seq("created_at"))
      .groupBy("status")
      .agg(count(lit(1)).as("cnt"), Tables.dsum(col("price")).as("price_sum"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "upsert_lww" -> upsertLww _,
    "upsert_idempotent" -> upsertIdempotent _)

  private val mergedSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0
      |       ELSE o_totalprice END AS price,
      |  CASE WHEN o_orderkey % 3 = 0 THEN 'U' ELSE o_orderstatus END AS status,
      |  o_orderdate AS created_at
      |FROM orders
      |UNION ALL
      |SELECT o_orderkey + 10000000 AS o_orderkey, o_totalprice AS price,
      |  'N' AS status, TIMESTAMP '2030-01-01 00:00:00' AS created_at
      |FROM orders WHERE o_orderkey < 5""".stripMargin

  val oracles: Map[String, String] = Map(
    "upsert_lww" -> mergedSql,
    "upsert_idempotent" ->
      s"""SELECT status, count(*) AS cnt,
         |  CAST(SUM(CAST(price AS DECIMAL(18,4))) AS DOUBLE) AS price_sum
         |FROM ($mergedSql) GROUP BY status""".stripMargin)
}
