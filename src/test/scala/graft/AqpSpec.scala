package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-checks for [[graft.analytics.Aqp]] that the DuckDB oracle
  * cannot express: a from-scratch Scala recompute of the sample
  * membership + estimate, and the ALGEBRAIC unbiasedness identity
  * (the 100 disjoint bucket estimates average exactly to the truth —
  * Σ_b 100·S_b = 100·Σy, so a bug in bucketing or scaling breaks an
  * exact integer equality, not a tolerance). */
class AqpSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private val A = 1103515245L
  private val C = 12345L
  private val P = 2000000011L

  /** Independent Scala reimplementation of the gate's row arithmetic. */
  private def rows(): Seq[(Long, Long)] = {
    val df = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .collect() // sf0.001: 6k rows — test-only
    df.toSeq.map { r =>
      val key = r.getLong(0) * 8 + r.getInt(1)
      val bucket = ((key % P) * A + C) % P % 100
      val cents = math.round(r.getDouble(2) * 100)
      (bucket, cents)
    }
  }

  test("uniform HT estimate matches a from-scratch recompute") {
    val rs = rows()
    val got = analytics.Aqp.uniformSum(spark, sf).collect().head
    assert(got.getAs[Long]("n_total") == rs.size)
    val sample = rs.filter(_._1 == 0L)
    assert(got.getAs[Long]("n_sample") == sample.size)
    assert(sample.nonEmpty, "bucket 0 empty at sf0.001 — key arithmetic drifted")
    assert(got.getAs[Long]("true_cents") == rs.map(_._2).sum)
    assert(got.getAs[Long]("est_cents") == 100L * sample.map(_._2).sum)
    val sq = sample.map(v => BigInt(v._2) * v._2).sum
    assert(BigInt(got.getAs[Long]("var_ht_q6")) == (sq * 9900) / 1000000)
  }

  test("the 100 disjoint bucket estimates average exactly to the truth") {
    val rs = rows()
    val truth = rs.map(_._2).sum
    val byBucket = rs.groupBy(_._1).view.mapValues(_.map(_._2).sum)
    // Horvitz–Thompson unbiasedness, algebraically: the buckets
    // PARTITION the corpus, so Σ_b est_b = 100 · truth, exactly.
    assert(byBucket.values.map(s => 100L * s).sum == 100L * truth)
    assert(byBucket.size == 100, "some bucket empty — weakens the replicate gate")
  }

  test("stratified estimates cover every stratum with within-stratum truth") {
    val got = analytics.Aqp.stratifiedSum(spark, sf).collect()
      .map(r => r.getAs[String]("stratum") -> r).toMap
    assert(got.keySet == Set("A", "N", "R"))
    got.values.foreach { r =>
      assert(r.getAs[Long]("n_sample") > 0)
      assert(r.getAs[Long]("n_sample") < r.getAs[Long]("n_total"))
      assert(r.getAs[Long]("abs_err_q6") >= 0)
    }
  }

  test("group-by CI: coverage bit equals the squared-form check, recomputed") {
    val rows = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .collect() // sf0.001: 1.5k rows — test-only
      .map { r =>
        val bucket = (r.getLong(0) % P * A + C) % P % 100
        (r.getString(1), bucket, math.round(r.getDouble(2) * 100))
      }.toSeq
    val got = analytics.Aqp.groupbyCi(spark, sf).collect()
      .map(r => r.getAs[String]("priority") -> r).toMap
    assert(got.keySet == rows.map(_._1).toSet)
    for ((p, rs) <- rows.groupBy(_._1)) {
      val truth = rs.map(_._3).sum
      val samp = rs.filter(_._2 == 0L).map(_._3)
      val est = 100L * samp.sum
      val varHt = samp.map(v => BigInt(v) * v).sum * 9900
      val r = got(p)
      assert(r.getAs[Long]("true_cents") == truth)
      assert(r.getAs[Long]("est_cents") == est)
      val covered = BigInt(est - truth) * BigInt(est - truth) <= 4 * varHt
      assert(r.getAs[Long]("covered") == (if (covered) 1L else 0L))
    }
  }

  test("replicate spread brackets its own summary stats") {
    val r = analytics.Aqp.replicateSpread(spark, sf).collect().head
    assert(r.getAs[Long]("n_reps") == 20)
    val (lo, av, hi) = (r.getAs[Long]("min_est"), r.getAs[Long]("avg_est"),
      r.getAs[Long]("max_est"))
    assert(lo <= av && av <= hi)
    val truth = r.getAs[Long]("true_cents")
    // the worst replicate error must be attained by an extreme estimate
    val worst = math.max((truth - lo).abs, (hi - truth).abs)
    assert(r.getAs[Long]("max_abs_err_q6")
      == BigInt(1000000) * worst / truth)
    assert(r.getAs[Long]("n_within_2pct") <= 20)
  }

  test("sample buckets are parity-balanced (the frame-bias regression)") {
    // The LCG reduced mod an EVEN modulus preserves the key's parity,
    // so a 2^31 reduction before % 100 makes bucket 0 ~pure in key
    // parity (a prior revision measured 93% odd-key rows). This test
    // measures the fixed formula: every bucket must hold BOTH
    // parities at a near-even split — an independent check the
    // shared-formula DuckDB oracle structurally cannot provide.
    val byBucketParity = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber")
      .collect().toSeq // sf0.001: 6k rows — test-only
      .map { r =>
        val key = r.getLong(0) * 8 + r.getInt(1)
        (((key % P) * A + C) % P % 100, key & 1L)
      }
      .groupBy(identity).view.mapValues(_.size).toMap
    // the corpus's own parity split is NOT 50/50 (key parity is
    // l_linenumber parity, and low linenumbers dominate in TPC-H):
    // the unbiased-frame invariant is that EVERY bucket reproduces
    // the corpus split, whatever it is — the broken formula put each
    // bucket at 0% or 100%.
    val oddAll = byBucketParity.collect { case ((_, 1L), c) => c }.sum
    val nAll = byBucketParity.values.sum
    val corpusOdd = oddAll.toDouble / nAll
    assert(corpusOdd > 0.2 && corpusOdd < 0.8, s"degenerate corpus $corpusOdd")
    for (b <- 0L until 100L) {
      val odd = byBucketParity.getOrElse((b, 1L), 0).toDouble
      val even = byBucketParity.getOrElse((b, 0L), 0).toDouble
      val n = odd + even
      assert(n > 0, s"bucket $b empty")
      // sf0.001 buckets hold ~60 rows; 4-sigma binomial band ≈ ±0.26
      assert(math.abs(odd / n - corpusOdd) < 0.27,
        s"bucket $b parity split ${odd / n} vs corpus $corpusOdd — " +
          "sampling frame biased")
    }
  }
}
