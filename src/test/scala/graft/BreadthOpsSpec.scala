package graft

import graft.analytics.{BehaviorQueries, JoinQueries, OlapQueries, StatsQueries, TimeSeries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for bitmap distinct, chi-square contingency, autocorrelation,
  * interval-overlap join, and top session paths. */
class BreadthOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("banded percentiles equal the sorted-definition disc percentiles") {
    val cents = Tables.load(spark, sf, "orders")
      .selectExpr("CAST(round(o_totalprice * 100) AS BIGINT) AS c")
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toLong
    val out = OlapQueries.percentileBanded(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Seq(50L, 90L, 99L).map { q =>
      // percentile_disc: smallest value whose cumulative count reaches
      // ceil(q*n/100) — index ceil(q*n/100) - 1 in the sorted array
      val idx = ((q * n + 99) / 100 - 1).toInt
      (q, cents(idx), n)
    }.toSet
    assert(out == want)
  }

  test("recursive CTE walks each user's digit chain to the root exactly") {
    val rows = analytics.CoreQueries.sqlRecursive(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val users = Tables.load(spark, sf, "events")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == users)
    rows.foreach { case (u, chain, steps) =>
      val expected = if (u == 0) 0L else u.toString.length.toLong
      assert(chain == expected, s"user $u depth")
      assert(steps == chain + 1, s"user $u step count")
    }
  }

  test("lorenz deciles equal the sorted-prefix BigInt definition") {
    val cents = Tables.load(spark, sf, "orders")
      .selectExpr("CAST(round(o_totalprice * 100) AS BIGINT) AS c")
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toLong
    val t = cents.map(BigInt(_)).sum
    val out = analytics.OlapQueries.lorenzDeciles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.map(_._1).toSeq == (1L to 9L))
    // shares are monotone and reproduce the crossing-cell definition:
    // the decile's cell (last index with cum*10 >= d*n crossing) has
    // cumulative count = n_orders and prefix revenue share = q6
    out.foreach { case (d, nOrders, q) =>
      // n_orders = count through the value that completes the decile:
      // smallest prefix length whose count*10 >= d*n, extended through
      // ties of the crossing value
      val idx = cents.indices.find(i => (i + 1) * 10 >= d * n).get
      val v = cents(idx)
      val last = cents.lastIndexWhere(_ == v)
      assert(nOrders == last + 1, s"decile $d count")
      val share = BigInt(1000000) * cents.take(last + 1).map(BigInt(_)).sum / t
      assert(BigInt(q) == share, s"decile $d share")
    }
    assert(out.map(_._3).sliding(2).forall(p => p.head <= p.last))
  }

  test("banded gini equals the sorted-rank BigInt definition") {
    val cents = Tables.load(spark, sf, "orders")
      .selectExpr("CAST(round(o_totalprice * 100) AS BIGINT) AS c")
      .collect().map(_.getLong(0)).sorted
    val n = BigInt(cents.length)
    val t = cents.map(BigInt(_)).sum
    val s2 = cents.zipWithIndex
      .map { case (x, i) => BigInt(2) * (i + 1) * x }.sum
    val want = (BigInt(1000000) * (s2 - (n + 1) * t)) / (n * t)
    val row = analytics.OlapQueries.giniBanded(spark, sf).collect()(0)
    assert(row.getLong(0) == cents.length.toLong)
    assert(BigInt(row.getLong(1)) == t)
    assert(BigInt(row.getLong(2)) == want)
    // inequality readout is a genuine fraction of [0, 1e6)
    assert(row.getLong(2) > 0 && row.getLong(2) < 1000000L)
  }

  test("bitmap distinct equals exact countDistinct on every group") {
    val rows = OlapQueries.bitmapDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("bitmap_exact_match"),
        s"${r.getString(0)}: bitmap ${r.getAs[Long]("n_users_bitmap")} " +
          s"!= exact ${r.getAs[Long]("n_users_exact")}")
      // words never exceed the bitmap population (each word holds >= 1)
      assert(r.getAs[Long]("n_words") <= r.getAs[Long]("n_users_bitmap"))
    }
  }

  test("chi2 cells: marginals are consistent and stat matches a reference") {
    val rows = StatsQueries.chi2Contingency(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val n = rows.head._6
    assert(rows.map(_._3).sum == n)
    rows.groupBy(_._1).values.foreach(g => assert(g.map(_._3).sum == g.head._4))
    rows.groupBy(_._2).values.foreach(g => assert(g.map(_._3).sum == g.head._5))
    rows.foreach { case (_, _, o, r, c, nn, q6) =>
      val d = BigInt(o) * nn - BigInt(r) * c
      assert(q6 == (d * d * 1000000 / (BigInt(nn) * r * c)).toLong)
    }
  }

  test("acf sufficient stats match a sequential lag reference") {
    val hourly = Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    val got = TimeSeries.acf(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(8)))
      .toMap
    for ((et, series) <- hourly.groupBy(_._1); k <- 1 to TimeSeries.acfLags) {
      val xs = series.sortBy(_._2.getTime).map(_._3)
      val pairs = xs.drop(k).zip(xs.dropRight(k)) // (x_i, x_{i-k})
      if (pairs.nonEmpty) {
        val n = pairs.length.toLong
        val sx = pairs.map(_._1).sum
        val sy = pairs.map(_._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        assert(got((et, k.toLong)) == ((n, sx, sy, sxy, n * sxy - sx * sy)),
          s"$et lag $k")
      } else assert(!got.contains((et, k.toLong)))
    }
  }

  test("interval overlap join equals the brute-force overlap census") {
    val ev = Tables.load(spark, sf, "events")
      .filter(col("user_id") < 5)
      .select(col("event_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("es"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val a = ev.filter(_._2 == "purchase").map(e => (e._1, e._3, e._3 + 3600))
    val b = ev.filter(_._2 == "error").map(e => (e._1, e._3, e._3 + 1800))
    val expect = (for {
      (ai, as_, ae) <- a; (bi, bs, be) <- b
      if as_ < be && bs < ae
    } yield (ai, bi, math.min(ae, be) - math.max(as_, bs))).toSet
    val got = JoinQueries.intervalOverlapJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("top paths match a sequential journey census") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
        col("event_type"),
        (unix_timestamp(date_trunc("second", col("ts"))) * 100000000L +
          col("event_id")).as("k"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getLong(3)))
    val census = ev.groupBy(e => (e._1, e._2)).map { case (_, js) =>
      js.sortBy(_._4).take(3).map(_._3).mkString(">")
    }.groupBy(identity).map { case (p, l) => p -> l.size.toLong }
    val expect = census.toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
    val got = BehaviorQueries.topPaths(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect)
  }
}
