package graft

import org.scalatest.funsuite.AnyFunSuite

/** From-scratch recomputes of the DP mechanisms in
  * [[graft.analytics.Privacy]] — the sampler (3-stage hash, trailing
  * zeros), the randomized-response debias algebra, and the discrete-
  * Laplace construction are all re-derived here in plain Scala. */
class PrivacySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  private val M = 2147483648L
  private val (a, c) = (1103515245L, 12345L)

  private def h3(key: Long): Long = {
    val h1 = (key % M * a + c) % M
    val h2 = (h1 * a + c) % M
    ((h2 ^ (h2 >> 15)) * a + c) % M
  }
  private def tz(u: Long): Long =
    if (u == 0) 31L else java.lang.Long.numberOfTrailingZeros(u).toLong

  private def orders() = Tables.load(spark, sf, "orders")
    .select("o_orderkey", "o_orderpriority", "o_orderstatus")
    .collect() // sf0.001: 1.5k rows — test-only
    .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("randomized response matches a row-by-row recompute and debiases") {
    val rows = orders()
    val got = analytics.Privacy.randomizedResponse(spark, sf).collect()
      .map(r => r.getAs[String]("priority") -> r).toMap
    assert(got.keySet == rows.map(_._2).toSet)
    for ((p, rs) <- rows.groupBy(_._2)) {
      val n = rs.length.toLong
      val trueF = rs.count(_._3 == "F").toLong
      val reported = rs.map { case (k, _, s) =>
        val b = if (s == "F") 1L else 0L
        if (h3(k) % 4 == 0) 1L - b else b
      }.sum
      val r = got(p)
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("eval_true_f") == trueF)
      assert(r.getAs[Long]("reported_f") == reported)
      assert(r.getAs[Long]("est_x2") == 4 * reported - n)
      assert(r.getAs[Long]("abs_gap_x2")
        == math.abs((4 * reported - n) - 2 * trueF))
    }
  }

  test("the flip bucket hits ~1/4 of rows (sampler uniformity smoke)") {
    val rows = orders()
    val flips = rows.count { case (k, _, _) => h3(k) % 4 == 0 }
    val share = flips.toDouble / rows.length
    assert(share > 0.20 && share < 0.30, s"flip share $share drifted from 1/4")
  }

  test("discrete-Laplace counts match the trailing-zero construction") {
    val rows = orders()
    val got = analytics.Privacy.laplaceCounts(spark, sf).collect()
      .map(r => r.getAs[String]("priority") -> r).toMap
    for ((p, rs) <- rows.groupBy(_._2)) {
      val seed = rs.map(_._1).min
      val (g1, g2) = (tz(h3(seed)), tz(h3(seed + 1)))
      val r = got(p)
      assert(r.getAs[Long]("eval_n_true") == rs.length.toLong)
      assert(r.getAs[Long]("g1") == g1 && r.getAs[Long]("g2") == g2)
      assert(r.getAs[Long]("noise") == g1 - g2)
      assert(r.getAs[Long]("n_noisy") == rs.length + g1 - g2)
    }
  }

  test("clipped DP sum: clip, lattice quantize, and noise all recompute") {
    val C = analytics.Privacy.ClipC
    val rows = Tables.load(spark, sf, "orders")
      .selectExpr("o_orderkey", "o_orderpriority",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val got = analytics.Privacy.sumClipped(spark, sf).collect()
      .map(r => r.getAs[String]("priority") -> r).toMap
    for ((p, rs) <- rows.groupBy(_._2)) {
      val trueSum = rs.map(_._3).sum
      val clipped = rs.map(r => math.min(r._3, C)).sum
      val q = (clipped + C / 2) / C
      val seed = rs.map(_._1).min
      val noise = tz(h3(seed + 2)) - tz(h3(seed + 3))
      val r = got(p)
      assert(r.getAs[Long]("eval_true_sum_c") == trueSum)
      assert(r.getAs[Long]("eval_clipped_sum_c") == clipped)
      assert(r.getAs[Long]("q_true") == q)
      assert(r.getAs[Long]("noise") == noise)
      assert(r.getAs[Long]("released_c") == (q + noise) * C)
      // clipping only ever reduces: the clipped sum is a lower bound
      assert(clipped <= trueSum)
    }
  }

  test("trailing zeros of the hash are Geometric(1/2): empirical mean ~1") {
    // E[tz] = Σ k·2^-(k+1) = 1 for a uniform draw; a heavily biased
    // sampler (e.g. a raw LCG's alternating low bit → mean 0.5 or 2)
    // fails this wide gate.
    val mean = (1L to 4000L).map(k => tz(h3(k))).sum.toDouble / 4000
    assert(mean > 0.85 && mean < 1.15, s"tz mean $mean drifted from 1.0")
  }
}
