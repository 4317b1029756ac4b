package graft

import graft.operators.AsofJoin
import graft.analytics.OlapQueries
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class AsofOlapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("conditional aggregates agree with direct filtered queries") {
    val sf = SparkTestSession.sf
    val out = OlapQueries.conditionalAggs(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val li = Tables.load(spark, sf, "lineitem")
    out.foreach { case (flag, r) =>
      val grp = li.filter(org.apache.spark.sql.functions.col("l_returnflag") === flag)
      assert(r.getLong(1) == grp.filter("l_quantity > 25").count(), s"$flag n_big")
      assert(r.getBoolean(3) == grp.filter("l_tax > 0.07").count() > 0,
        s"$flag any_high_tax")
      assert(r.getBoolean(4) == (grp.filter("l_quantity <= 0").count() == 0),
        s"$flag all_pos_qty")
    }
  }

  test("grouping sets levels are complete and marker bits consistent") {
    val sf = SparkTestSession.sf
    val rows = OlapQueries.groupingSets(spark, sf).collect()
    val total = Tables.load(spark, sf, "lineitem").count()
    // grand total level: both markers set, both keys coalesced
    val grand = rows.filter(r => r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(grand.length == 1 && grand.head.getLong(4) == total)
    assert(grand.head.getString(0) == "ALL" && grand.head.getString(1) == "ALL")
    // each level's counts re-sum to the corpus total
    Seq((1L, 0L), (0L, 1L), (0L, 0L)).foreach { case (gf, gs) =>
      val lvl = rows.filter(r => r.getLong(2) == gf && r.getLong(3) == gs)
      assert(lvl.map(_.getLong(4)).sum == total, s"level ($gf,$gs)")
      // a marker bit of 1 always pairs with the coalesced 'ALL'
      lvl.foreach { r =>
        assert((r.getLong(2) == 1) == (gf == 1))
        if (gf == 1) assert(r.getString(0) == "ALL")
        if (gs == 1) assert(r.getString(1) == "ALL")
      }
    }
  }

  test("asof matches latest left row at or before each right ts") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val views = Seq(
      (1L, t("2024-01-01 10:00:00"), 100L),
      (1L, t("2024-01-01 11:00:00"), 101L),
      (2L, t("2024-01-01 12:00:00"), 200L))
      .toDF("user_id", "ts", "event_id")
    val purchases = Seq(
      (1L, t("2024-01-01 10:30:00"), 900L), // -> view 100
      (1L, t("2024-01-01 11:00:00"), 901L), // equal ts -> view 101
      (2L, t("2024-01-01 09:00:00"), 902L), // no prior view -> null
      (3L, t("2024-01-01 09:00:00"), 903L)) // user with no views -> null
      .toDF("user_id", "ts", "event_id")
    val out = AsofJoin.asof(views, purchases, "user_id", Seq("ts", "event_id"))
      .selectExpr("event_id", "_match.event_id AS view_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(900L -> 100L, 901L -> 101L, 902L -> -1L, 903L -> -1L))
  }

  test("forward asof matches earliest left row at or after each right ts") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val views = Seq(
      (1L, t("2024-01-01 10:00:00"), 100L),
      (1L, t("2024-01-01 11:00:00"), 101L),
      (2L, t("2024-01-01 12:00:00"), 200L))
      .toDF("user_id", "ts", "event_id")
    val purchases = Seq(
      (1L, t("2024-01-01 10:30:00"), 900L), // -> next view 101
      (1L, t("2024-01-01 11:00:00"), 901L), // equal ts -> view 101
      (1L, t("2024-01-01 12:30:00"), 902L), // no later view -> null
      (2L, t("2024-01-01 09:00:00"), 903L)) // -> view 200
      .toDF("user_id", "ts", "event_id")
    val out = AsofJoin.asof(views, purchases, "user_id",
        Seq("ts", "event_id"), forward = true)
      .selectExpr("event_id", "_match.event_id AS view_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(900L -> 101L, 901L -> 101L, 902L -> -1L, 903L -> 200L))
  }

  test("nearest asof picks the smaller gap of backward/forward, ties backward") {
    val sf = SparkTestSession.sf
    def gaps(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3)))))
      .toMap
    val back = gaps(AsofJoin.purchaseToView(spark, sf))
    val fwd = gaps(AsofJoin.purchaseToNextView(spark, sf))
    val got = gaps(AsofJoin.purchaseToNearestView(spark, sf))
    assert(got.keySet == back.keySet)
    got.foreach { case (pid, pick) =>
      val expected = (back(pid), fwd(pid)) match {
        case (Some((bi, bg)), Some((_, fg))) if bg <= fg => Some((bi, bg))
        case (_, Some((fi, fg))) => Some((fi, fg))
        case (b, None) => b
      }
      assert(pick == expected, s"purchase $pid: $pick vs $expected")
    }
    // the corpus exercises all three branches
    assert(got.exists { case (p, v) => v == back(p) && v != fwd(p) })
    assert(got.exists { case (p, v) => v == fwd(p) && v != back(p) })
  }

  test("approx_count_distinct stays within the configured error bound") {
    val rows = OlapQueries.approxDistinct(spark, SparkTestSession.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2),
        s"${r.getString(0)}: sketch outside 5% of exact=${r.getLong(1)}")
    }
  }

  test("rollup emits leaf, subtotal, and grand-total levels") {
    val out = OlapQueries.rollupRevenue(spark, SparkTestSession.sf).collect()
    assert(out.count(r => r.getString(0) == "ALL" && r.getString(1) == "ALL") == 1)
    val leafCnt = out.filter(r =>
      r.getString(0) != "ALL" && r.getString(1) != "ALL").map(_.getLong(3)).sum
    val total = out.find(r =>
      r.getString(0) == "ALL" && r.getString(1) == "ALL").get.getLong(3)
    assert(leafCnt == total)
  }

  test("integer-exact 3-sigma outliers agree with a double reference") {
    val got = OlapQueries.outliers(spark, SparkTestSession.sf)
      .collect().map(_.getLong(0)).toSet
    // double-precision reference on the driver (tolerant of ulps by
    // construction: the gate's integer boundary can only differ from
    // the double one on exact ties, which the cent grid avoids)
    val rows = Tables.load(spark, SparkTestSession.sf, "events")
      .selectExpr("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byType = rows.groupBy(_._2)
    val expected = byType.values.flatMap { g =>
      val n = g.length
      val mean = g.map(_._3).sum / n
      val varp = g.map(v => (v._3 - mean) * (v._3 - mean)).sum / n
      g.filter(v => (v._3 - mean) * (v._3 - mean) > 9 * varp).map(_._1)
    }.toSet
    assert(got == expected)
  }

  test("approx_percentile stays within the configured bound") {
    val rows = OlapQueries.approxPercentile(spark, SparkTestSession.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(2), r.getString(0)))
  }

  test("mad outliers equal a driver-side median/MAD computation") {
    import org.apache.spark.sql.functions.col
    val vals = Tables.load(spark, SparkTestSession.sf, "events")
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def median(xs: Array[Double]): Double = {
      val n = xs.length
      if (n % 2 == 1) xs(n / 2) else (xs(n / 2 - 1) + xs(n / 2)) / 2
    }
    val got = OlapQueries.madOutliers(spark, SparkTestSession.sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.keySet == vals.keySet)
    vals.foreach { case (et, xs) =>
      val med = median(xs)
      val mad = median(xs.map(x => math.abs(x - med)).sorted)
      val nOut = xs.count(x => math.abs(x - med) > 3 * mad)
      assert(got(et) == ((med, mad, nOut.toLong, xs.length.toLong)), et)
    }
  }

  test("fixed-point regression equals a BigInt reference; slope is sane") {
    val rows = Tables.load(spark, SparkTestSession.sf, "lineitem")
      .select("l_returnflag", "l_quantity", "l_extendedprice")
      .collect()
      .map(r => (r.getString(0),
        BigInt(math.round(r.getDouble(1) * 100)),
        BigInt(math.round(r.getDouble(2) * 100))))
    val got = OlapQueries.regression(spark, SparkTestSession.sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    rows.groupBy(_._1).foreach { case (flag, xs) =>
      val n = BigInt(xs.length)
      val sx = xs.map(_._2).sum
      val sy = xs.map(_._3).sum
      val sxx = xs.map(t => t._2 * t._2).sum
      val sxy = xs.map(t => t._2 * t._3).sum
      // BigInt / truncates toward zero, matching Spark div / DuckDB //
      val slope = (n * sxy - sx * sy) * 1000000 / (n * sxx - sx * sx)
      val icept = (sy * 1000000 - slope * sx) / n
      assert(got(flag) == ((xs.length.toLong, slope.toLong, icept.toLong)), flag)
      // synthetic price/quantity can anticorrelate — negative slopes are
      // the case that PINS trunc-toward-zero agreement across engines
    }
  }

  test("equi-depth histogram: 10 bins, depths within one of n/10, ordered ranges") {
    val out = OlapQueries.equidepthHistogram(spark, SparkTestSession.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val n = Tables.load(spark, SparkTestSession.sf, "orders").count()
    assert(out.map(_._1).toSeq == (0L to 9L))
    assert(out.map(_._2).sum == n)
    // exact quantile interpolation puts each decile within 1 row of n/10
    out.foreach { case (b, cnt, _, _) =>
      assert(math.abs(cnt - n / 10.0) <= 1.0, s"bin $b depth $cnt vs ${n / 10.0}")
    }
    // bins tile the value range in order: each bin's hi <= next bin's lo
    out.sliding(2).foreach { case Array(a, b2) =>
      assert(a._4 <= b2._3, s"bins ${a._1},${b2._1} overlap")
      assert(a._3 <= a._4)
    }
  }

  test("corr sufficient stats agree with a double reference") {
    val rows = Tables.load(spark, SparkTestSession.sf, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val got = analytics.OlapQueries.corrStats(spark, SparkTestSession.sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), BigInt(r.getString(5)), r.getBoolean(6))).toMap
    rows.groupBy(_._1).foreach { case (flag, xs) =>
      val x = xs.map(_._2.toLong)
      val y = xs.map(t => BigDecimal(t._3).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact)
      val (n, sx, sy) = (xs.length.toLong, x.sum, y.sum)
      val sxy = x.zip(y).map { case (a, b) => a * b }.sum
      val cov = BigInt(n) * sxy - BigInt(sx) * sy
      val (gn, gsx, gsy, gsxy, gcov, gpos) = got(flag)
      assert((gn, gsx, gsy, gsxy) == (n, sx, sy, sxy))
      assert(gcov == cov && gpos == (cov > 0))
      // the exact integer sign agrees with the float covariance sign
      val mx = sx.toDouble / n; val my = sy.toDouble / n
      val covD = x.zip(y).map { case (a, b) =>
        (a - mx) * (b - my) }.sum / n
      assert((covD > 0) == gpos, s"flag=$flag covD=$covD")
    }
  }

  test("kmv estimate is deterministic and within 2/sqrt(k) of exact") {
    val got = analytics.OlapQueries.kmvDistinct(spark, SparkTestSession.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    for ((flag, exact, est) <- got) {
      if (exact < analytics.OlapQueries.kmvK)
        assert(est == exact, s"small group $flag must report exactly")
      else {
        val rel = math.abs(est - exact).toDouble / exact
        val bound = 2.0 / math.sqrt(analytics.OlapQueries.kmvK.toDouble)
        assert(rel <= bound, s"flag=$flag exact=$exact est=$est rel=$rel")
      }
    }
    // sketch reference: kth-smallest distinct LCG hash reproduces est
    val rows = Tables.load(spark, SparkTestSession.sf, "lineitem")
      .select(col("l_returnflag"), col("l_partkey")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    rows.groupBy(_._1).foreach { case (flag, xs) =>
      val hs = xs.map(t => (t._2 * 1103515245L + 12345L) % 2147483648L)
        .distinct.sorted
      val k = analytics.OlapQueries.kmvK
      val exp =
        if (hs.length < k) hs.length.toLong
        else (k - 1).toLong * 2147483648L / hs(k - 1)
      assert(got.find(_._1 == flag).get._3 == exp, s"flag=$flag")
    }
  }
}
