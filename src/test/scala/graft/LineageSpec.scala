package graft

import graft.plans.Lineage
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LineageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("lineage resolves through project/aggregate chains to leaves") {
    import spark.implicits._
    Seq((1L, 2.0, "x")).toDF("k", "v", "s").createOrReplaceTempView("lin_a")
    val df = spark.sql(
      """SELECT k2 AS grp, sum(v2) AS total, count(*) AS n FROM (
        |  SELECT k + 1 AS k2, v * 2 AS v2 FROM lin_a) GROUP BY k2""".stripMargin)
    val got = Lineage.of(df).toSet
    assert(got == Set(
      ("grp", "lin_a", "k"),
      ("total", "lin_a", "v")))  // count(*) has no value sources
  }

  test("lineage separates self-join arms by ExprId, not by name") {
    import spark.implicits._
    Seq((1L, 2L)).toDF("id", "parent").createOrReplaceTempView("lin_t")
    val df = spark.sql(
      """SELECT c.id AS child_id, p.parent AS grandparent
        |FROM lin_t c JOIN lin_t p ON c.parent = p.id""".stripMargin)
    val got = Lineage.of(df).toSet
    // both arms resolve to the same physical table but the OUTPUTS
    // must each trace to exactly one column, never cross-pollute
    assert(got == Set(
      ("child_id", "lin_t", "id"),
      ("grandparent", "lin_t", "parent")))
  }

  test("union lineage reports every branch's source column") {
    import spark.implicits._
    Seq((1L, "x")).toDF("a", "s").createOrReplaceTempView("lin_u1")
    Seq((2L, "y")).toDF("b", "t").createOrReplaceTempView("lin_u2")
    val df = spark.sql(
      "SELECT a AS v FROM lin_u1 UNION ALL SELECT b FROM lin_u2")
    val got = Lineage.of(df).toSet
    assert(got == Set(("v", "lin_u1", "a"), ("v", "lin_u2", "b")))
  }

  test("window expression lineage reaches the value column") {
    import spark.implicits._
    Seq((1L, 3.0)).toDF("g", "v").createOrReplaceTempView("lin_w")
    val df = spark.table("lin_w")
      .withColumn("r", sum(col("v")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
          .orderBy(col("v"))))
      .select(col("g"), col("r"))
    val got = Lineage.of(df).toSet
    assert(got.contains(("r", "lin_w", "v")))
  }
}
