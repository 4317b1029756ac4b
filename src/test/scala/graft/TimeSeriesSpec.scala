package graft

import graft.analytics.TimeSeries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("rolling slope matches a sequential least-squares per series") {
    val sf = SparkTestSession.sf
    import graft.analytics.TimeSeries
    val hourly = Tables.load(spark, sf, "events")
      .selectExpr("event_type",
        s"(unix_timestamp(date_trunc('hour', ts)) - ${TimeSeries.slopeEpoch0})" +
          " DIV 3600 AS x",
        "CAST(round(value * 100) AS BIGINT) AS c")
      .groupBy("event_type", "x")
      .agg(org.apache.spark.sql.functions.sum("c").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (t, rs) =>
        t -> rs.map(r => (r._2, r._3)).sortBy(_._1)
      }
    val got = TimeSeries.rollingSlope(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .toMap
    val win = TimeSeries.slopeWin
    var checked = 0
    hourly.foreach { case (t, series) =>
      series.indices.drop(win - 1).foreach { i =>
        val fr = series.slice(i - win + 1, i + 1)
        val n = fr.length.toDouble
        val (sx, sy) = (fr.map(_._1).sum.toDouble, fr.map(_._2).sum.toDouble)
        val sxy = fr.map(p => p._1.toDouble * p._2).sum
        val sxx = fr.map(p => p._1.toDouble * p._1).sum
        val syy = fr.map(p => p._2.toDouble * p._2).sum
        val num = n * sxy - sx * sy
        val den = n * sxx - sx * sx
        val deny = n * syy - sy * sy
        val (slopeQ6, r2) = got((t, fr.last._1))
        assert(math.abs(slopeQ6 / 1e6 - num / den) < 1e-3,
          s"$t@${fr.last._1} slope")
        if (deny != 0)
          assert(math.abs(r2.get / 1e6 - num * num / (den * deny)) < 1e-3,
            s"$t@${fr.last._1} r2")
        checked += 1
      }
    }
    assert(checked > 0 && got.size == checked,
      s"row census: got ${got.size}, reference $checked")
    // r2 is a proportion
    got.values.foreach { case (_, r2) =>
      r2.foreach(v => assert(v >= 0L && v <= 1000000L))
    }
  }

  test("bollinger z-squared matches a sequential reference; flag consistent") {
    val sf = SparkTestSession.sf
    import graft.analytics.TimeSeries
    val hourly = Tables.load(spark, sf, "events")
      .selectExpr("event_type",
        s"(unix_timestamp(date_trunc('hour', ts)) - ${TimeSeries.slopeEpoch0})" +
          " DIV 3600 AS x",
        "CAST(round(value * 100) AS BIGINT) AS c")
      .groupBy("event_type", "x")
      .agg(org.apache.spark.sql.functions.sum("c").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (t, rs) =>
        t -> rs.map(r => (r._2, r._3)).sortBy(_._1)
      }
    val got = TimeSeries.bollinger(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((if (r.isNullAt(5)) None else Some(r.getLong(5))), r.getBoolean(6)))
      .toMap
    val win = TimeSeries.slopeWin
    var breaches = 0
    hourly.foreach { case (t, series) =>
      series.indices.drop(win - 1).foreach { i =>
        val fr = series.slice(i - win + 1, i + 1)
        val ys = fr.map(_._2.toDouble)
        val m = ys.sum / ys.length
        val v = ys.map(yy => (yy - m) * (yy - m)).sum / (ys.length - 1)
        val (z2, breach) = got((t, fr.last._1))
        if (v == 0.0) assert(z2.isEmpty && !breach)
        else {
          val ref = (ys.last - m) * (ys.last - m) / v
          assert(math.abs(z2.get / 1e6 - ref) < 1e-3, s"$t@${fr.last._1}")
          assert(breach == z2.get > TimeSeries.bollK2 * 1000000L)
          if (breach) breaches += 1
        }
      }
    }
    // the envelope is meaningful: some windows breach, most do not
    val n = got.size
    assert(breaches > 0 && breaches < n / 2, s"$breaches of $n breach")
  }

  test("sweep-line concurrency equals a naive global running sum") {
    import org.apache.spark.sql.expressions.Window
    val sf = SparkTestSession.sf
    val got = graft.analytics.TimeSeries.concurrency(spark, sf).collect()
      .map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2))).toMap
    // naive reference: one unchunked global window over all boundaries
    val ev = graft.Tables.load(spark, sf, "events")
      .select(date_trunc("second", col("ts")).as("s"))
    val deltas = ev.select(col("s").as("t"), lit(1L).as("d"))
      .union(ev.select((col("s") + expr("interval 1800 seconds")).as("t"),
        lit(-1L).as("d")))
      .groupBy("t").agg(sum("d").as("net"))
    val wg = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = deltas.withColumn("conc", sum("net").over(wg))
      .groupBy(date_trunc("day", col("t")).as("day"))
      .agg(max("conc").as("mc"), count(lit(1)).as("nb"))
      .collect().map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == want)
    // sweep must observe real overlap somewhere (intervals are 30 min)
    assert(got.values.exists(_._1 > 1))
  }

  test("gap fill densifies each type's span and zero-fills empty buckets") {
    val sf = SparkTestSession.sf
    val out = TimeSeries.gapFill(spark, sf).cache()
    // per type: rows == hours in [min, max] span, no duplicates
    val spans = out.groupBy("event_type")
      .agg(count(lit(1)).as("rows"),
        min("hour_start").as("h0"), max("hour_start").as("h1"),
        countDistinct("hour_start").as("distinct_hours"))
      .collect()
    spans.foreach { r =>
      val hours = (r.getTimestamp(3).getTime - r.getTimestamp(2).getTime) /
        3600000L + 1
      assert(r.getLong(1) == hours, s"${r.getString(0)} grid density")
      assert(r.getLong(4) == hours, s"${r.getString(0)} duplicate buckets")
    }
    // filled buckets are explicit zeros and agree with the sparse agg
    val zeros = out.filter(col("cnt") === 0)
    assert(zeros.count() > 0, "corpus has no hourly gaps — gate is vacuous")
    assert(zeros.filter(col("val_sum") =!= 0.0).count() == 0)
    val observed = Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_start"))
      .agg(count(lit(1)).as("cnt"))
    assert(out.filter(col("cnt") > 0).select("event_type", "hour_start", "cnt")
      .exceptAll(observed).isEmpty)
  }

  test("linear interpolation matches a local recomputation of every series") {
    val sf = SparkTestSession.sf
    val out = TimeSeries.interpolate(spark, sf).cache()
    assert(out.filter(col("interp_q6").isNull).count() == 0,
      "grid spans observed range — no row may lack neighbors")
    val gaps = out.filter(!col("observed")).count()
    assert(gaps > 0, "corpus has no hourly gaps — interp branch is vacuous")
    // driver-side reference: grid frame is bounded (|types| x hours)
    val rows = out.select("event_type", "hour_start", "observed", "interp_q6")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getBoolean(2), r.getLong(3)))
      .groupBy(_._1)
    rows.foreach { case (_, series) =>
      val s = series.sortBy(_._2)
      val obs = s.zipWithIndex.filter(_._1._3)
      s.zipWithIndex.filter(!_._1._3).foreach { case ((_, _, _, got), i) =>
        val (pv, pi) = { val (t, j) = obs.takeWhile(_._2 < i).last; (t._4, j) }
        val (nv, ni) = { val (t, j) = obs.dropWhile(_._2 < i).head; (t._4, j) }
        // observed rows publish cents * 1e6, so the line is in q6 units
        val want = (pv * (ni - i) + nv * (i - pi)) / (ni - pi)
        assert(got == want, s"gap at index $i")
      }
    }
  }

  test("week-over-week growth matches a driver-side lag over weekly sums") {
    val sf = SparkTestSession.sf
    val out = TimeSeries.wowGrowth(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val weekly = Tables.load(spark, sf, "events")
      .selectExpr("event_type",
        "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)" +
          " DIV 7 AS week",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2))
      .map { case (k, g) => k -> (g.length.toLong, g.map(_._3).sum) }
    // lag(1) pairs each week with the previous OBSERVED week, so the
    // reference walks the sorted observed sequence per type
    val want = weekly.keys.groupBy(_._1).flatMap { case (ty, ks) =>
      val wks = ks.map(_._2).toSeq.sorted
      wks.zip(wks.drop(1)).map { case (pw, wk) =>
        val (cnt, cents) = weekly((ty, wk))
        val (pc, pcents) = weekly((ty, pw))
        (ty, wk) -> (cnt, cents, 1000000L * cnt / pc, 1000000L * cents / pcents)
      }
    }
    assert(out == want)
    assert(out.nonEmpty)
  }

  test("ohlc bars are internally consistent and volumes sum to the corpus") {
    val sf = SparkTestSession.sf
    val bars = TimeSeries.ohlcResample(spark, sf).cache()
    assert(bars.filter(col("high") < col("low")).count() == 0)
    assert(bars.filter(col("open") > col("high")
      || col("open") < col("low")).count() == 0)
    assert(bars.filter(col("close") > col("high")
      || col("close") < col("low")).count() == 0)
    val total = bars.agg(sum("volume")).collect()(0).getLong(0)
    assert(total == Tables.load(spark, sf, "events").count())
    // single-event buckets have open == close
    assert(bars.filter(col("volume") === 1
      && col("open") =!= col("close")).count() == 0)
  }

  test("volume anomaly flag equals the float formulation on this corpus") {
    val sf = SparkTestSession.sf
    val out = TimeSeries.volumeAnomaly(spark, sf)
    // cross-multiplied integer test == cnt > 2 * mean(trailing)
    val mismatches = out.filter(
      col("anomaly") =!= (col("cnt").cast("double") >
        col("trail_sum").cast("double") / col("trail_n").cast("double") * 2.0))
      .count()
    assert(mismatches == 0)
    assert(out.filter(col("trail_n") === 0).count() == 0)
  }

  test("forward fill carries the last purchase value per user") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // planted: null before first purchase, carried across views, reset
    // by the next purchase
    val sf = SparkTestSession.sf
    val out = TimeSeries.fillForward(spark, sf)
    val ev = Tables.load(spark, sf, "events")
    // reference: per user, walk events in (ts, event_id) order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val check = ev
      .withColumn("sparse", when(col("event_type") === "purchase", col("value")))
      .withColumn("expected", last(col("sparse"), ignoreNulls = true)
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(col("event_id"), col("expected"))
    val joined = out.join(check, "event_id")
    assert(joined.filter(
      !(col("last_purchase") <=> col("expected"))).count() == 0)
    // nulls exist (users before their first purchase) and values exist
    assert(out.filter(col("last_purchase").isNull).count() > 0)
    assert(out.filter(col("last_purchase").isNotNull).count() > 0)
  }

  test("truncated ewma equals a sequential reference fold per series") {
    val sf = SparkTestSession.sf
    val out = TimeSeries.ewma(spark, sf)
      .collect()
      .map(r => ((r.getString(0), r.getTimestamp(1)), (r.getDouble(2), r.getDouble(3))))
      .toMap
    // reference: per event_type, walk the hourly series in order and
    // compute sum_{j<K} 2^-j * x_{i-j} with exact BigDecimal terms
    val series = out.toSeq
      .map { case ((et, h), (x, _)) => (et, h, x) }
      .groupBy(_._1)
    series.foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._2.getTime)
      val xs = ordered.map(r => new java.math.BigDecimal(r._3.toString))
      xs.indices.foreach { i =>
        val expect = (0 until TimeSeries.ewmaK).map { j =>
          if (i - j < 0) java.math.BigDecimal.ZERO
          else xs(i - j).divide(java.math.BigDecimal.valueOf(1L << j))
        }.reduce(_ add _).doubleValue()
        val got = out((ordered(i)._1, ordered(i)._2))._2
        assert(math.abs(got - expect) < 1e-9,
          s"ewma mismatch at ${ordered(i)._2}: $got vs $expect")
      }
    }
    // a series exists whose smoothed head differs from its raw value
    assert(out.exists { case (_, (x, e)) => math.abs(x - e) > 1e-6 })
  }

  test("holt weights are the exact recursion impulse response; gate matches the filter") {
    // first rounds by hand: l = 1/2, 3/8, 7/32; b = 1/4, 1/16, -3/64
    val (lw, bw) = TimeSeries.holtWeights
    def f(n: Long, d: Long) =
      new java.math.BigDecimal(n).divide(new java.math.BigDecimal(d))
    assert(lw.take(3).map(_.stripTrailingZeros) ==
      Seq(f(1, 2), f(3, 8), f(7, 32)).map(_.stripTrailingZeros))
    assert(bw.take(3).map(_.stripTrailingZeros) ==
      Seq(f(1, 4), f(1, 16), f(-3, 64)).map(_.stripTrailingZeros))
    // gate output equals the truncated filter applied sequentially
    val rows = TimeSeries.holt(spark, SparkTestSession.sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val m6 = new java.math.BigDecimal(1000000)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_._2.getTime)
      val xs = ordered.map(r => new java.math.BigDecimal(r._3.toString))
      ordered.indices.foreach { i =>
        def filt(ws: Seq[java.math.BigDecimal]) = ws.zipWithIndex.map {
          case (wt, j) =>
            if (i - j < 0) java.math.BigDecimal.ZERO else xs(i - j).multiply(wt)
        }.reduce(_ add _)
        val (l, b) = (filt(lw), filt(bw))
        def q6(v: java.math.BigDecimal) =
          v.multiply(m6).toBigInteger.longValueExact
        assert(ordered(i)._4 == q6(l), s"level at ${ordered(i)._2}")
        assert(ordered(i)._5 == q6(b), s"trend at ${ordered(i)._2}")
        assert(ordered(i)._6 == q6(l.add(b)), s"forecast at ${ordered(i)._2}")
      }
    }
    // trend is genuinely informative somewhere (non-zero on real data)
    assert(rows.exists(_._5 != 0L))
  }

  test("backtest scores equal a BigInt recompute from the published forecasts") {
    val holt = TimeSeries.holt(spark, SparkTestSession.sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2),
        r.getLong(5))) // (type, hour, actual, forecast_q6)
    val bt = TimeSeries.backtest(spark, SparkTestSession.sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(bt.nonEmpty)
    holt.groupBy(_._1).foreach { case (tpe, rs) =>
      val o = rs.sortBy(_._2.getTime)
      // hourly actuals have <=4 decimals, so *1e6 rounds exactly
      def a6(v: Double): BigInt = BigInt(math.round(v * 1e6))
      val pts = o.init.zip(o.tail)
      val sae = pts.map { case (p, nx) => (a6(nx._3) - p._4).abs }.sum
      val saeN = pts.map { case (p, nx) => (a6(nx._3) - a6(p._3)).abs }.sum
      val sa = pts.map { case (_, nx) => a6(nx._3) }.sum
      val (n, mae, wape, mase) = bt(tpe)
      assert(n == pts.length)
      assert(BigInt(mae) == sae / pts.length)
      assert(BigInt(wape) == BigInt(1000000) * sae / sa)
      assert(BigInt(mase) == BigInt(1000) * sae / saeN)
      // holt tracks the series at all (WAPE finite and positive)
      assert(wape > 0)
    }
  }

  test("seasonal indexes match a BigInt reference and average to ~1 per type") {
    val rows = TimeSeries.seasonal(spark, SparkTestSession.sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_._1)
    byType.foreach { case (_, rs) =>
      val oNum = BigInt(rs.map(_._3).sum); val oDen = BigInt(rs.size)
      rs.groupBy(_._2).foreach { case (_, hs) =>
        val sNum = BigInt(hs.map(_._3).sum); val sDen = BigInt(hs.size)
        val wantIdx = (BigInt(1000000) * sNum * oDen) / (sDen * oNum)
        hs.foreach { case (_, _, cnt, idx, des) =>
          assert(idx == wantIdx.toLong)
          assert(des == (BigInt(1000000) * BigInt(cnt) * sDen / sNum).toLong)
        }
      }
      // bucket-weighted mean of the seasonal index is 1 by construction
      // (up to quantization): sum over buckets of s_num/s_den equals
      // o_num scaled by o_den
      val meanIdx = rs.map(_._4).sum / rs.size
      assert(math.abs(meanIdx - 1000000L) < 20000L,
        s"mean seasonal index $meanIdx far from 1e6")
    }
  }

  test("time-weighted average matches a sequential sweep per type") {
    val sf = SparkTestSession.sf
    val rows = Tables.load(spark, sf, "events")
      .selectExpr("event_type", "event_id",
        "unix_timestamp(date_trunc('second', ts)) AS es",
        "CAST(round(value * 100) AS BIGINT) AS v")
      .collect() // sf0.001 — test-only
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = TimeSeries.twa(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    for ((t, rs) <- rows.groupBy(_._1)) {
      val sorted = rs.sortBy(r => (r._3, r._2))
      val steps = sorted.zip(sorted.tail)
        .map { case (a, b) => (a._4, b._3 - a._3) } // (value, dt)
      val span = steps.map(_._2).sum
      val vt = steps.map { case (v, dt) => BigInt(v) * dt }.sum
      val r = got(t)
      assert(r.getAs[Long]("n_intervals") == steps.length.toLong)
      assert(r.getAs[Long]("span_s") == span)
      assert(BigInt(r.getAs[Long]("twa_cents")) == vt / span)
      assert(r.getAs[Long]("mean_cents")
        == steps.map(_._1).sum / steps.length)
      // TWA is bracketed by the observed value range
      val (lo, hi) = (steps.map(_._1).min, steps.map(_._1).max)
      assert(r.getAs[Long]("twa_cents") >= lo
        && r.getAs[Long]("twa_cents") <= hi)
    }
  }

  test("negative-slope staged signed DIV truncates toward zero (pinned)") {
    // r7 verdict #3: the slope_q6/r2_q6 staging relies on Spark DIV and
    // DuckDB // both truncating toward zero on NEGATIVE operands — this
    // drives the real pipeline over a synthetic decreasing series with
    // inexact quotients (the DuckDB twin lives in tools/selfcheck.py;
    // both fixtures use the identical series and window).
    import spark.implicits._
    val win = TimeSeries.slopeWin
    val nPts = win + 2
    val cents = (0 until nPts).map(x => 100000L - 1370L * x + (x * 37) % 11)
    val events = (0 until nPts).map { x =>
      ("neg",
        new java.sql.Timestamp((TimeSeries.slopeEpoch0 + x * 3600L) * 1000L),
        cents(x) / 100.0)
    }.toDF("event_type", "ts", "value")
    val got = TimeSeries.rollingSlopeFrom(events).orderBy("x").collect()
    assert(got.length == nPts - win + 1)
    var sawInexact = false
    got.foreach { r =>
      val xEnd = r.getLong(1)
      val fr = (xEnd - win + 1 to xEnd)
        .map(x => (BigInt(x), BigInt(cents(x.toInt))))
      val n = BigInt(win)
      val sx = fr.map(_._1).sum; val sy = fr.map(_._2).sum
      val sxy = fr.map(p => p._1 * p._2).sum
      val sxx = fr.map(p => p._1 * p._1).sum
      val syy = fr.map(p => p._2 * p._2).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val deny = n * syy - sy * sy
      assert(num < 0, "fixture must exercise a negative numerator")
      // BigInt '/' truncates toward zero — the independent reference
      val q1 = (BigInt(1000000) * num) / den
      if ((BigInt(1000000) * num) % den != 0) sawInexact = true
      assert(r.getLong(4) == q1.toLong, s"slope_q6 at x=$xEnd")
      assert(r.getLong(5) == ((q1 * num) / deny).toLong, s"r2_q6 at x=$xEnd")
    }
    assert(sawInexact,
      "fixture must hit an inexact signed quotient or it pins nothing")
  }
}
