package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table access + shared helpers.
  *
  * Loads the driver-generated TPC-H-ish corpus (`/root/repo/TESTDATA.md`):
  * one parquet file per table under the scale-factor directory. Reads are
  * plain parquet scans so Catalyst pushes filters/pruning into the scan
  * (verified via .explain: PushedFilters / ReadSchema).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is nanosecond parquet, which Spark rejects (or reads as
    // Long with the legacy flag). Read ns as Long and convert to a
    // microsecond timestamp; truncation cannot move a value across the
    // whole-second boundaries all downstream logic uses, so results
    // stay oracle-equivalent (DuckDB keeps full ns).
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Events with a time filter applied on the RAW nanosecond column,
    * before the micros conversion. Filtering after the conversion
    * defeats parquet predicate pushdown (the converted column is an
    * expression, not a scan column); this form pushes a plain
    * `ts >= <ns>` range onto the bigint column, so row groups outside
    * the window are skipped at the scan — the difference between
    * reading a retention window and reading 100 TB. Semantically
    * identical to filtering on the full-precision ns value (which is
    * exactly what the DuckDB oracle does). */
  def eventsFrom(spark: SparkSession, dir: String, cutoffUtc: String): DataFrame = {
    val i = java.time.LocalDateTime.parse(cutoffUtc.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC)
    val cutoffNs = i.getEpochSecond * 1000000000L + i.getNano
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .filter(col("ts") >= lit(cutoffNs))
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }

  /** Register every table as a temp view so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    register(spark, dir, names: _*)

  /** Register only the named tables (a view registration reads parquet
    * footers, so SQL-path queries register just what they touch). */
  def register(spark: SparkSession, dir: String, tables: String*): Unit =
    tables.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  // ---------------------------------------------------------------------
  // Deterministic aggregation helpers.
  //
  // The correctness gate hash-compares Spark output against a DuckDB
  // oracle. Floating-point SUM is order-dependent, and both engines
  // parallelize aggregation, so `sum(double)` is not reproducible
  // bit-for-bit. All money-like columns in the corpus carry <=2 decimal
  // digits, so we cast to exact DECIMAL *before* arithmetic: decimal
  // addition is associative, making the aggregate order-independent and
  // identical across engines. The final cast back to double is exact
  // enough (single rounding) and matches the oracle SQL, which applies
  // the same casts. At 100 TB this costs one extra cast per row inside
  // whole-stage codegen -- negligible vs. the shuffle it feeds.
  // ---------------------------------------------------------------------

  /** Exact decimal for money-ish doubles (2-dec inputs, 4-dec headroom). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Order-independent sum of a money-like double column. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Order-independent average of a money-like double column. */
  def davg(c: Column): Column =
    (sum(dec(c)) / count(c)).cast("double")
}
