package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for [[graft.analytics.Sketches]] the DuckDB oracle cannot
  * state: MERGEABILITY (the property that makes a sketch distributed —
  * building per-shard and merging must equal building over the whole),
  * hash BIJECTIVITY (the LCG permutation claim behind "distinct hashes
  * = distinct keys"), and a from-scratch Scala recompute of both
  * estimators from raw collected rows. */
class SketchSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private val M = 2147483648L
  private val k = 256

  /** Raw (key, hash) pairs recomputed independently in Scala. */
  private def keyed(): Seq[(Long, Long)] = {
    val keys = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey").collect().map(_.getLong(0)).toSeq // sf0.001: 6k rows, test-only
    keys.map { key =>
      val r1 = (key % M * 1103515245L + 12345L) % M
      val r2 = (r1 * 1103515245L + 12345L) % M
      val h3 = r2 ^ (r2 >> 15)
      (key, (h3 * 1103515245L + 12345L) % M)
    }
  }

  test("the LCG composition is collision-free on the key domain (bijection)") {
    val ks = keyed()
    assert(ks.map(_._1).distinct.size == ks.map(_._2).distinct.size)
    assert(ks.map(_._1).max < M, "keys outgrew 2^31 — bijectivity claim void")
  }

  test("KMV gate matches a from-scratch recompute, including the estimate") {
    val hs = keyed().map(_._2).distinct.sorted
    val mins = hs.take(k)
    val kth = mins.last
    val got = analytics.Sketches.kmvDistinct(spark, sf).collect().head
    assert(got.getAs[Long]("n_k") == mins.size)
    assert(got.getAs[Long]("kth_hash") == kth)
    assert(got.getAs[Long]("true_ndv") == hs.size)
    assert(got.getAs[Long]("est_ndv") == (mins.size - 1) * M / kth)
  }

  test("KMV sketches MERGE: k-mins of shard sketches == k-mins of the whole") {
    // Shard by line number parity — an arbitrary horizontal split.
    val base = Tables.load(spark, sf, "lineitem")
      .select(analytics.Sketches.hash31(col("l_orderkey")).as("hv"),
        (col("l_linenumber") % 2).as("shard"))
    def sketch(shard: Int): Seq[Long] =
      base.filter(col("shard") === shard).select("hv").distinct()
        .orderBy("hv").limit(k).collect().map(_.getLong(0)).toSeq
    val merged = (sketch(0) ++ sketch(1)).distinct.sorted.take(k)
    val whole = base.select("hv").distinct()
      .orderBy("hv").limit(k).collect().map(_.getLong(0)).toSeq
    assert(merged == whole)
  }

  test("HLL registers MERGE: elementwise max of shard registers == whole") {
    val base = Tables.load(spark, sf, "lineitem")
      .select(analytics.Sketches.hash31(col("l_orderkey")).as("hv"),
        (col("l_linenumber") % 2).as("shard"))
      .selectExpr("shard", "hv DIV 8388608 AS bucket", "hv % 8388608 AS rest")
      .selectExpr("shard", "bucket",
        "CASE WHEN rest = 0 THEN 24 ELSE 24 - length(bin(rest)) END AS rho")
    def regs(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.groupBy("bucket").agg(max("rho").as("reg")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val r0 = regs(base.filter(col("shard") === 0))
    val r1 = regs(base.filter(col("shard") === 1))
    val merged = (r0.keySet ++ r1.keySet).map(b =>
      b -> math.max(r0.getOrElse(b, 0), r1.getOrElse(b, 0))).toMap
    assert(merged == regs(base))
  }

  test("HLL gate matches a from-scratch recompute of registers and estimate") {
    val hs = keyed().map(_._2).distinct
    val regs = hs.groupBy(_ / 8388608L).map { case (_, vs) =>
      vs.map { h =>
        val rest = h % 8388608L
        if (rest == 0) 24 else 24 - java.lang.Long.toBinaryString(rest).length
      }.max
    }.toSeq
    val sFilled = regs.map(r => 1L << (24 - r)).sum
    val sTotal = sFilled + (256L - regs.size) * 16777216L
    val est = 718272L * 65536L * 16777216L / (1000000L * sTotal)
    val got = analytics.Sketches.hllDistinct(spark, sf).collect().head
    assert(got.getAs[Long]("nz_regs") == regs.size)
    assert(got.getAs[Long]("s_total") == sTotal)
    assert(got.getAs[Long]("est_ndv") == est)
    assert(got.getAs[Long]("true_ndv") == hs.size)
  }

  test("HLL union gate matches a from-scratch recompute of all three register sets") {
    val flagged = Tables.load(spark, sf, "lineitem")
      .filter(col("l_returnflag").isin("A", "N"))
      .select("l_orderkey", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    def hv(key: Long): Long = {
      val r1 = (key % M * 1103515245L + 12345L) % M
      val r2 = (r1 * 1103515245L + 12345L) % M
      val h3 = r2 ^ (r2 >> 15)
      (h3 * 1103515245L + 12345L) % M
    }
    val a = flagged.filter(_._2 == "A").map(t => hv(t._1)).toSet
    val b = flagged.filter(_._2 == "N").map(t => hv(t._1)).toSet
    def est(hs: Set[Long]): Long = {
      val regs = hs.groupBy(_ / 8388608L).map { case (_, vs) =>
        vs.map { h =>
          val rest = h % 8388608L
          if (rest == 0) 24
          else 24 - java.lang.Long.toBinaryString(rest).length
        }.max
      }
      val s = regs.map(r => 1L << (24 - r)).sum +
        (256L - regs.size) * 16777216L
      718272L * 65536L * 16777216L / (1000000L * s)
    }
    val got = analytics.Sketches.hllUnion(spark, sf).collect().head
    assert(got.getAs[Long]("est_a") == est(a))
    assert(got.getAs[Long]("est_b") == est(b))
    assert(got.getAs[Long]("est_union") == est(a ++ b))
    assert(got.getAs[Long]("true_a") == a.size)
    assert(got.getAs[Long]("true_b") == b.size)
    assert(got.getAs[Long]("true_union") == (a ++ b).size)
    assert(got.getAs[Long]("true_inter") == (a & b).size)
    assert(got.getAs[Long]("est_inter")
      == est(a) + est(b) - est(a ++ b))
  }

  test("histogram quantile brackets are sound and within the 1/16 width bound") {
    val rows = analytics.Sketches.histQuantiles(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("q")).sorted.toSeq == Seq(50L, 90L, 99L))
    rows.foreach { r =>
      // soundness law: the crossing cell MUST contain the exact value
      assert(r.getAs[Long]("within") == 1L, s"bracket missed truth: $r")
      assert(r.getAs[Long]("rel_width_q6") <= 62500L)
      assert(r.getAs[Long]("cell_lo") <= r.getAs[Long]("cell_hi"))
    }
  }

  test("histogram cells MERGE by addition: shard histograms sum to the whole") {
    val base = Tables.load(spark, sf, "orders")
      .selectExpr("CAST(round(o_totalprice * 100) AS BIGINT) AS v",
        "o_orderkey % 2 AS shard")
      .selectExpr("shard",
        "CASE WHEN v < 16 THEN v ELSE shiftleft(shiftright(v," +
          " length(bin(v)) - 5), length(bin(v)) - 5) END AS lo")
    def hist(f: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      f.groupBy("lo").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h0 = hist(base.filter(col("shard") === 0))
    val h1 = hist(base.filter(col("shard") === 1))
    val merged = (h0.keySet ++ h1.keySet).map(k =>
      k -> (h0.getOrElse(k, 0L) + h1.getOrElse(k, 0L))).toMap
    assert(merged == hist(base))
  }

  test("streaming HLL equals the batch HLL gate bit-for-bit") {
    val batch = analytics.Sketches.hllDistinct(spark, sf).collect().toSeq
    val stream = streaming.StreamSketch.streamHllDistinct(spark, sf)
      .collect().toSeq
    assert(stream == batch)
  }

  test("union gate: flags partition correctly and estimators bracket truth loosely") {
    val r = analytics.Sketches.kmvUnion(spark, sf).collect().head
    assert(r.getAs[Long]("m_both") <= r.getAs[Long]("k_eff"))
    assert(r.getAs[Long]("true_inter") <= r.getAs[Long]("true_union"))
    assert(r.getAs[Long]("jacc_q6_est") <= 1000000L)
    // the A/N split genuinely overlaps partially on this corpus
    assert(r.getAs[Long]("true_inter") > 0)
    assert(r.getAs[Long]("true_inter") < r.getAs[Long]("true_union"))
  }
}
