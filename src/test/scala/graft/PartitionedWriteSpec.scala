package graft

import graft.operators.Upsert
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB storage path: date-partitioned parquet + partition-pruned
  * reads. Asserts the layout writes real partition directories and
  * that a date predicate prunes at planning time (PartitionFilters in
  * the scan, only matching directories touched). */
class PartitionedWriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("dynamic date-partitioned write + partition-pruned scan") {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = Tables.load(spark, SparkTestSession.sf, "orders")
      .withColumn("order_date", col("o_orderdate").cast("date"))
      .withColumn("order_year", year(col("o_orderdate")))
    Upsert.writePartitioned(df, out, "order_year")

    val dirs = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("order_year=")).sorted
    assert(dirs.length >= 3, s"expected year partitions, got ${dirs.toSeq}")

    val read = spark.read.parquet(out).filter(col("order_year") === 1996)
    read.collect()
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_year"),
      s"partition filter not applied:\n$plan")
    // pruned scan reads exactly the one matching directory
    val scanned = read.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(!scanned.contains("order_year=1995"))
  }

  test("dynamic overwrite replaces only touched partitions") {
    val out = java.nio.file.Files.createTempDirectory("graft_dyn").toString
    import spark.implicits._
    val v1 = Seq((1L, "a", 2000), (2L, "b", 2001)).toDF("k", "v", "y")
    Upsert.writePartitioned(v1, out, "y")
    // overwrite only partition y=2001
    val v2 = Seq((3L, "c", 2001)).toDF("k", "v", "y")
    Upsert.writePartitioned(v2, out, "y")
    val back = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(back == Set((1L, "a", 2000), (3L, "c", 2001)),
      s"partition 2000 must survive, 2001 replaced: $back")
  }
}
