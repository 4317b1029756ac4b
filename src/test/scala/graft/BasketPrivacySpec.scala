package graft

import graft.analytics.{DataQuality, FunctionQueries, MarketBasket, Retrieval}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-4 late batch: market-basket rules, k-anonymity
  * suppression, unpivot, and RRF hybrid retrieval fusion. */
class BasketPrivacySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("basket rules match a sequential reference on the gate corpus") {
    val items = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byBasket = items.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted).toMap
    val itemCnt = items.groupBy(_._2).view.mapValues(_.length).toMap
    val nB = byBasket.size.toLong
    val pairCnt = scala.collection.mutable.Map
      .empty[(Long, Long), Int].withDefaultValue(0)
    for ((_, parts) <- byBasket; i <- parts.indices;
         j <- i + 1 until parts.length)
      pairCnt((parts(i), parts(j))) += 1
    val expect = pairCnt.iterator
      .filter(_._2 >= MarketBasket.minSupport)
      .map { case ((a, b), ab) =>
        val (ca, cb) = (itemCnt(a).toLong, itemCnt(b).toLong)
        (a, b, ab.toLong, ca, cb,
          10000L * ab / ca, 10000L * nB * ab / (ca * cb))
      }.toSet
    val got = MarketBasket.basketRules(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("lift exceeds 10000 exactly when co-occurrence beats independence") {
    val rows = MarketBasket.basketRules(spark, sf)
      .select("cnt_ab", "cnt_a", "cnt_b", "lift_q4").collect()
    val nB = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey").distinct().count()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ab, a, b, lift) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ab <= math.min(a, b))
      assert((lift > 10000) == (nB.toDouble * ab / (a.toDouble * b) > 1.0)
        || lift == 10000)
    }
  }

  test("k-anonymity: every released QI group has >= k members") {
    val out = DataQuality.kAnonymize(spark, sf)
    val total = Tables.load(spark, sf, "customer").count()
    assert(out.count() == total) // suppression drops no rows
    val released = out.filter(col("released"))
      .groupBy("nation_anon", "segment_anon").agg(count(lit(1)).as("n"))
      .collect()
    assert(released.forall(_.getLong(2) >= DataQuality.anonK))
    val suppressed = out.filter(!col("released")).collect()
    assert(suppressed.forall(r =>
      r.getLong(1) == -1L && r.getString(2) == "*"))
  }

  test("unpivot long form reconstructs the wide summary") {
    val long = FunctionQueries.unpivotFuncs(spark, sf)
    assert(long.select("metric").distinct().count() == 3)
    val wide = long.groupBy("l_returnflag")
      .pivot("metric", Seq("sum_qty", "sum_price", "sum_disc"))
      .agg(first(col("value")))
    val direct = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(Tables.dsum(col("l_quantity")).as("sum_qty"),
        Tables.dsum(col("l_extendedprice")).as("sum_price"),
        Tables.dsum(col("l_discount")).as("sum_disc"))
    assert(wide.collect().map(_.toString).sorted.toSeq ==
      direct.collect().map(_.toString).sorted.toSeq)
  }

  test("RRF fuses: both-list docs outrank single-list docs at same rank") {
    val out = Retrieval.hybridRrf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    // score formula check, sequentially
    out.foreach { case (_, _, _, tr, vr, score) =>
      val expect = (if (tr > 0) 1000000L / (60 + tr) else 0L) +
        (if (vr > 0) 1000000L / (60 + vr) else 0L)
      assert(score == expect)
    }
    // ranks are dense per query, ordered by score desc
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to rows.length).toSeq)
      assert(sorted.toSeq.sliding(2).forall {
        case Seq(hi, lo) => hi._6 > lo._6 ||
          (hi._6 == lo._6 && hi._3 < lo._3)
        case _ => true
      })
    }
  }
}
