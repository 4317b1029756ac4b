package graft

import graft.analytics.StatsQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatsQueriesSpec extends AnyFunSuite {
  val spark = SparkTestSession.spark

  test("mann-whitney 2U equals the brute-force pairwise comparison count") {
    val sf = SparkTestSession.sf
    val vals = Tables.load(spark, sf, "events")
      .filter(col("event_type").isin("purchase", "view"))
      .selectExpr("event_type = 'purchase' AS a",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    val as = vals.filter(_._1).map(_._2)
    val bs = vals.filterNot(_._1).map(_._2)
    // 2U_A = #{(a,b): a > b}*2 + #{a = b} — the rank-sum definition
    var u2 = 0L
    for (a <- as; b <- bs)
      u2 += (if (a > b) 2L else if (a == b) 1L else 0L)
    val row = StatsQueries.mannWhitney(spark, sf).collect()(0)
    assert(row.getLong(0) == as.length.toLong
      && row.getLong(1) == bs.length.toLong)
    assert(row.getLong(2) == u2, "2U_A mismatch vs brute force")
    assert(row.getLong(2) + row.getLong(3) ==
      2L * as.length * bs.length, "U_A + U_B identity")
    assert(row.getLong(4) == 1000000L * u2 / (2L * as.length * bs.length))
  }

  test("welch t2 and dof track a double-precision reference") {
    val sf = SparkTestSession.sf
    val obs = Tables.load(spark, sf, "events")
      .selectExpr("event_type",
        "(((user_id % 2000000011) * 1103515245 + 12345) % 2000000011) % 2 AS arm",
        "CAST(round(value * 100) AS BIGINT) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = StatsQueries.welchT(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (et, n0, n1) = (r.getString(0), r.getLong(1), r.getLong(2))
      val g0 = obs.filter(o => o._1 == et && o._2 == 0L).map(_._3.toDouble)
      val g1 = obs.filter(o => o._1 == et && o._2 == 1L).map(_._3.toDouble)
      assert(n0 == g0.length.toLong && n1 == g1.length.toLong, s"$et n")
      def mv(g: Array[Double]) = {
        val m = g.sum / g.length
        (m, g.map(x => (x - m) * (x - m)).sum / (g.length - 1))
      }
      val (m0, v0) = mv(g0); val (m1, v1) = mv(g1)
      assert(math.abs(r.getLong(3) / 1e6 - m0) < 1e-3, s"$et mean0")
      assert(math.abs(r.getLong(4) / 1e6 - m1) < 1e-3, s"$et mean1")
      val w0 = v0 / g0.length; val w1 = v1 / g1.length
      val t2 = (m0 - m1) * (m0 - m1) / (w0 + w1)
      val nu = (w0 + w1) * (w0 + w1) /
        (w0 * w0 / (g0.length - 1) + w1 * w1 / (g1.length - 1))
      // staged integer DIVs truncate, so allow a relative tolerance
      assert(math.abs(r.getLong(5) / 1e6 - t2) <= 0.01 * t2 + 0.01,
        s"$et t2: ${r.getLong(5) / 1e6} vs $t2")
      assert(math.abs(r.getLong(6) / 1e3 - nu) <= 0.01 * nu + 0.01,
        s"$et nu: ${r.getLong(6) / 1e3} vs $nu")
      // Welch dof is bracketed by min-arm dof and pooled dof
      assert(r.getLong(6) / 1e3 >= (math.min(n0, n1) - 1) - 0.01)
      assert(r.getLong(6) / 1e3 <= (n0 + n1 - 2) + 0.01)
    }
  }

  test("analyze profile matches per-column reference aggregates") {
    val li = Tables.load(spark, SparkTestSession.sf, "lineitem")
    val n = li.count()
    val got = StatsQueries.analyzeTable(spark, SparkTestSession.sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(got.keySet == StatsQueries.analyzeCols.toSet)
    for (c <- StatsQueries.analyzeCols) {
      val ref = li.agg(count(col(c)), countDistinct(col(c)),
        min(col(c).cast("string")), max(col(c).cast("string"))).collect()(0)
      val (gn, gnull, gndv, gmin, gmax) = got(c)
      assert(gn == n)
      assert(gnull == n - ref.getLong(0))
      assert(gndv == ref.getLong(1))
      assert(gmin == ref.getString(2) && gmax == ref.getString(3))
    }
  }

  test("analyze is one scan and avoids the n-distinct Expand rewrite") {
    val plan = StatsQueries.analyzeTable(spark, SparkTestSession.sf)
      .queryExecution.executedPlan.toString
    // the per-column output rows must come from ONE melted scan, not
    // one FileScan per column; and the melt must not regress to the
    // multi-countDistinct plan, whose Expand pushes |cols|+1 copies
    // of every row through the shuffle
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly 1 scan, got $scans")
    assert(!plan.contains("Expand"), "melt profile must not plan an Expand")
  }

  test("cms join-size estimate: per-row overestimates, min row tightest") {
    val rows = StatsQueries.joinSizeEstimate(spark, SparkTestSession.sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.length == analytics.OlapQueries.cmsDepth)
    val exact = rows.head._4
    assert(rows.forall(_._4 == exact))
    // the one-sided guarantee, the reason a CBO can trust the sketch
    assert(rows.forall(r => r._2 >= exact && r._5))
    assert(rows.forall(r => r._3 == rows.map(_._2).min))
    // reference: exact inner product computed sequentially
    val fa = Tables.load(spark, SparkTestSession.sf, "events")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fb = Tables.load(spark, SparkTestSession.sf, "orders")
      .groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = fa.keySet.intersect(fb.keySet).toSeq
      .map(k => fa(k) * fb(k)).sum
    assert(exact == ref)
  }

  test("anova F tracks a double-precision reference within the q3 grid") {
    val sf = SparkTestSession.sf
    val rows = StatsQueries.anovaF(spark, sf).collect()
    assert(rows.length > 1)
    // double-precision one-way ANOVA from the raw cents
    val cents = Tables.load(spark, sf, "events")
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT) AS c")
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble)
    val groups = cents.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val all = cents.map(_._2)
    val grand = all.sum / all.length
    val ssb = groups.values.map(g =>
      g.length * math.pow(g.sum / g.length - grand, 2)).sum
    val ssw = groups.values.map(g =>
      g.map(x => math.pow(x - g.sum / g.length, 2)).sum).sum
    val k = groups.size
    val fRef = (ssb / (k - 1)) / (ssw / (all.length - k))
    val fGot = rows.head.getLong(5) / 1e6
    // q3-truncated means perturb F by O(1e-3) relative on this corpus
    assert(math.abs(fGot - fRef) <= 0.01 * math.max(1.0, fRef),
      s"f_q6=$fGot vs reference $fRef")
    // per-group means agree with the reference at the q3 grid
    rows.foreach { r =>
      val mRef = groups(r.getString(0)).sum / groups(r.getString(0)).length
      assert(math.abs(r.getLong(2) / 1000.0 - mRef) <= 0.002 * math.max(1.0, mRef))
    }
    // degrees of freedom are exact
    assert(rows.forall(r => r.getLong(3) == k - 1 &&
      r.getLong(4) == all.length - k))
  }

  test("spearman tracks a double-precision rank reference within q3") {
    val sf = SparkTestSession.sf
    val rows = StatsQueries.spearman(spark, sf).collect()
    assert(rows.length > 1)
    val raw = Tables.load(spark, sf, "events")
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT) AS xc",
        "CAST(hour(ts) AS BIGINT) AS hod")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // tie-averaged ranks per type, double precision
    def ranks(xs: Seq[Long]): Map[Long, Double] = {
      val sorted = xs.sorted
      xs.distinct.map { v =>
        val below = sorted.indexOf(v)
        val freq = sorted.count(_ == v)
        v -> (below + (freq + 1) / 2.0)
      }.toMap
    }
    rows.foreach { r =>
      val g = raw.filter(_._1 == r.getString(0))
      val n = g.length
      // published invariant: Σ(2·avgRank) = n(n+1)
      assert(r.getLong(1) == n && r.getLong(2) == n.toLong * (n + 1))
      val rx = ranks(g.map(_._2)); val ry = ranks(g.map(_._3))
      val xs = g.map(p => rx(p._2)); val ys = g.map(p => ry(p._3))
      val sx = xs.sum; val sy = ys.sum
      val num = n * xs.zip(ys).map(p => p._1 * p._2).sum - sx * sy
      val dx = n * xs.map(x => x * x).sum - sx * sx
      val dy = n * ys.map(y => y * y).sum - sy * sy
      val rhoRef = num / math.sqrt(dx * dy)
      val got = (if (r.getInt(4) < 0) -1 else 1) *
        math.sqrt(r.getLong(3) / 1e6)
      // two q3 DIV stages perturb ρ² by O(1e-3); compare on ρ
      assert(math.abs(got - rhoRef) <= 0.005,
        s"${r.getString(0)}: rho=$got vs reference $rhoRef")
      assert(r.getInt(4) == math.signum(num).toInt)
    }
  }

  test("cuped: theta matches a sequential recompute and reduces variance") {
    import org.apache.spark.sql.functions._
    val split = java.sql.Timestamp.valueOf(StatsQueries.cupedSplit)
    // independent per-user recompute (plain Scala, no shared code path)
    val users = Tables.load(spark, SparkTestSession.sf, "events")
      .select(col("user_id"), col("ts"), col("value")).collect()
      .groupBy(_.getLong(0)).map { case (uid, rows) =>
        val cents = rows.map(r =>
          (r.getTimestamp(1).before(split), math.round(r.getDouble(2) * 100)))
        (uid,
          cents.collect { case (true, c) => c }.sum,
          cents.collect { case (false, c) => c }.sum)
      }.toSeq
    val n = users.size.toDouble
    val (mx, my) = (users.map(_._2).sum / n, users.map(_._3).sum / n)
    val cov = users.map(u => (u._2 - mx) * (u._3 - my)).sum / n
    val varx = users.map(u => (u._2 - mx) * (u._2 - mx)).sum / n
    val thetaRef = cov / varx
    val got = StatsQueries.cupedAb(spark, SparkTestSession.sf).collect()
    assert(got.length == 2)
    val thetaGot = got.head.getLong(5) / 1e6
    assert(math.abs(thetaGot - thetaRef) < 1e-3,
      s"theta $thetaGot vs reference $thetaRef")
    // the point of CUPED: adjusted per-user metric has lower variance
    val vary = users.map(u => (u._3 - my) * (u._3 - my)).sum / n
    val varAdj = users.map(u =>
      (u._3 - thetaRef * u._2) - (my - thetaRef * mx)).map(d => d * d).sum / n
    assert(varAdj < vary, s"adjusted variance $varAdj !< raw $vary")
  }

  test("A/B arm is uncorrelated with user_id parity (confound regression)") {
    // An even LCG reduction modulus preserves user_id's low bit, so a
    // mod-2^31 reduction before "% 2" made the arm ~93% determined by
    // id parity — confounding the CUPED/Welch readouts with any
    // id-interleaved assignment. Measure the fixed formula directly:
    // within each id-parity class the arm split must be near-even.
    val ids = Tables.load(spark, SparkTestSession.sf, "events")
      .select("user_id").distinct()
      .collect().map(_.getLong(0)) // sf0.001: ~hundreds of users
    assert(ids.nonEmpty)
    def arm(id: Long): Long = ((id % 2000000011L) * 1103515245L + 12345L) %
      2000000011L % 2
    for (parity <- Seq(0L, 1L)) {
      val cls = ids.filter(id => (id & 1L) == parity)
      if (cls.length >= 50) {
        val a1 = cls.count(arm(_) == 1L).toDouble / cls.length
        assert(math.abs(a1 - 0.5) < 0.25,
          s"parity-$parity ids: arm-1 share $a1 — assignment confounded")
      }
    }
    // and the engine-side arm matches this reference formula
    val gotArms = Tables.load(spark, SparkTestSession.sf, "events")
      .selectExpr("user_id",
        "(((user_id % 2000000011) * 1103515245 + 12345) % 2000000011) % 2 AS a")
      .distinct().collect()
    gotArms.foreach(r => assert(r.getLong(1) == arm(r.getLong(0))))
  }
}
