package graft

import graft.operators.TableDiff
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TableDiffSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("diff classifies insert/delete/update/unchanged incl. null values") {
    val before = Seq(
      (1L, Some("a"), Some(10.0)), // unchanged
      (2L, Some("b"), Some(20.0)), // update (value change)
      (3L, Some("c"), Some(30.0)), // delete
      (5L, None: Option[String], Some(50.0)), // unchanged with null column
      (6L, Some("f"), None: Option[Double]) // update: null -> value
    ).toDF("k", "s", "v")
    val after = Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("b"), Some(21.0)),
      (4L, Some("d"), Some(40.0)), // insert
      (5L, None: Option[String], Some(50.0)),
      (6L, Some("f"), Some(60.0))
    ).toDF("k", "s", "v")
    val got = TableDiff.diff(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "update", 3L -> "delete",
      4L -> "insert", 5L -> "unchanged", 6L -> "update"))
  }

  test("gate snapshots cover all four classes with exact counts") {
    val out = TableDiff.diffQuery(spark, SparkTestSession.sf)
    val orders = Tables.load(spark, SparkTestSession.sf, "orders")
    val byMod = orders.groupBy(pmod(col("o_orderkey"), lit(11)).as("m"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val counts = out.groupBy("op").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("insert") == byMod(3L))
    assert(counts("delete") == byMod(7L))
    assert(counts("update") == byMod(5L))
    assert(counts.values.sum == orders.count())
  }
}
