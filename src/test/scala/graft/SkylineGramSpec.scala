package graft

import graft.analytics.Skyline
import graft.operators.GramMatrix
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkylineGramSpec extends AnyFunSuite {
  val spark = SparkTestSession.spark
  import spark.implicits._

  private def bruteSkyline(pts: Seq[(Long, Double, Long)])
      : Set[(Long, Double, Long)] =
    pts.filter { a =>
      !pts.exists(b => b._2 >= a._2 && b._3 >= a._3
        && (b._2 > a._2 || b._3 > a._3))
    }.toSet

  test("skyline equals the brute-force dominance filter") {
    val orders = Tables.load(spark, SparkTestSession.sf, "orders")
    val pts = orders.select(col("o_orderkey"), col("o_totalprice"),
        unix_timestamp(col("o_orderdate")).as("od"))
      .as[(Long, Double, Long)].collect().toSeq
    val expected = bruteSkyline(pts)
    val got = Skyline.skyline(orders).select(col("o_orderkey"),
        col("o_totalprice"), unix_timestamp(col("o_orderdate")))
      .as[(Long, Double, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("skyline is partition-invariant and keeps dominance ties") {
    // adversarial frame: duplicates of the maximal point, a dominated
    // chain, and incomparable corners, shuffled across partitions
    val pts = Seq(
      (1L, 10.0, 100L), (2L, 10.0, 100L), // identical maxima: both stay
      (3L, 10.0, 50L),                    // dominated in-group
      (4L, 5.0, 200L),                    // incomparable corner: stays
      (5L, 5.0, 199L), (6L, 1.0, 1L),     // dominated
      (7L, 12.0, 90L))                    // incomparable corner: stays
    val expected = bruteSkyline(pts)
    for (parts <- Seq(1, 3, 7)) {
      val df = pts.toDF("o_orderkey", "o_totalprice", "od")
        .repartition(parts)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("od").cast("timestamp").as("o_orderdate"))
      val got = Skyline.skyline(df).select(col("o_orderkey"),
          col("o_totalprice"), unix_timestamp(col("o_orderdate")))
        .as[(Long, Double, Long)].collect().toSet
      assert(got == expected, s"parts=$parts")
    }
  }

  test("gram matrix matches a sequential accumulation and is symmetric-complete") {
    val vecs = Tables.load(spark, SparkTestSession.sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    val q = vecs.map(_._2.map(x => math.round(x * GramMatrix.gridScale)))
    val d = q.head.length
    val got = GramMatrix.gram(spark, SparkTestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.size == d * (d + 1) / 2)
    for (i <- 0 until d; j <- i until d) {
      val ref = q.map(v => v(i) * v(j)).sum
      val (g, n) = got((i.toLong, j.toLong))
      assert(g == ref, s"cell ($i,$j)")
      assert(n == q.length.toLong)
    }
    // diagonal is a sum of squares: non-negative
    assert((0 until d).forall(i => got((i.toLong, i.toLong))._1 >= 0))
  }
}
