package graft

import graft.operators.Upsert
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UpsertSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def cur = Seq(
    (1L, 10.0, "A", "2020-01-01"),
    (2L, 20.0, "B", "2020-01-02")
  ).toDF("k", "price", "status", "created")

  def batch = Seq(
    (2L, 99.0, "U", "2030-01-01"), // update: created must be preserved
    (3L, 30.0, "N", "2030-01-01")  // insert: created kept from batch
  ).toDF("k", "price", "status", "created")

  test("last-writer-wins on conflict; preserve column keeps first insert") {
    val out = Upsert.upsert(cur, batch, Seq("k"), Seq("created"))
      .orderBy("k").collect()
    assert(out.length == 3)
    val r2 = out(1)
    assert(r2.getDouble(1) == 99.0 && r2.getString(2) == "U")
    assert(r2.getString(3) == "2020-01-02") // preserved
    val r3 = out(2)
    assert(r3.getDouble(1) == 30.0 && r3.getString(3) == "2030-01-01")
  }

  test("upsert is idempotent: applying the same batch twice equals once") {
    val once = Upsert.upsert(cur, batch, Seq("k"), Seq("created"))
    val twice = Upsert.upsert(once, batch, Seq("k"), Seq("created"))
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("within-batch duplicates collapse to one surviving row per key") {
    val dup = batch.union(batch)
    val out = Upsert.upsert(cur, dup, Seq("k"), Seq("created"))
    assert(out.groupBy("k").count().filter($"count" > 1).isEmpty)
  }
}
