package graft.analytics

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimizer-grade table statistics — the ANALYZE TABLE side of the
  * engine. A cost-based optimizer (join reorder, broadcast decisions,
  * skew detection) runs on exactly these numbers: row counts, per-column
  * null counts, distinct counts, min/max. At 100 TB the stats job IS a
  * query — it must be one scan, not one scan per column.
  */
object StatsQueries {

  /** Columns profiled by [[analyzeTable]]. */
  val analyzeCols = Seq("l_returnflag", "l_linestatus", "l_suppkey",
    "l_shipdate")

  /** One-scan multi-column profile of `lineitem`, one output row per
    * column: rows, nulls, exact ndv, lexicographic min/max (values as
    * strings so heterogeneous column types share one schema — the
    * catalog-stats storage shape). The exact `countDistinct`s make the
    * gate oracle-checkable; Spark plans the n-distinct aggregate via
    * one Expand (×|cols| row multiplication) — the documented cost of
    * exactness. The production variant swaps `approx_count_distinct`
    * (HLL, no Expand, one true pass) with identical dataflow; the HLL
    * error-bound pattern is gated separately (`agg_approx_distinct`).
    * Min/max/null-count are always algebraic single-pass. */
  def analyzeTable(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val aggs = analyzeCols.flatMap { c =>
      Seq(count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"ndv_$c"),
        min(col(c).cast("string")).as(s"min_$c"),
        max(col(c).cast("string")).as(s"max_$c"))
    }
    val wide = li.agg(count(lit(1)).as("n_rows"), aggs: _*)
    // stack by exploding structs over the ONE aggregated row — a
    // union of per-column selects would re-plan the scan per column
    wide.select(explode(array(analyzeCols.map(c =>
        struct(lit(c).as("column_name"), col("n_rows"),
          (col("n_rows") - col(s"cnt_$c")).as("n_nulls"),
          col(s"ndv_$c").as("ndv"),
          col(s"min_$c").as("min_s"),
          col(s"max_$c").as("max_s"))): _*)).as("s"))
      .select(col("s.*"))
  }

  /** AMS/CMS join-size estimation (Alon-Matias-Szegedy moments;
    * Cormode-Muthukrishnan inner products) — the sketch a CBO consults
    * before picking a join strategy: |A ⋈ B| on key k is the inner
    * product Σ_k f_A(k)·f_B(k), and the CMS row-wise inner product
    * Σ_j cA[r][j]·cB[r][j] OVERESTIMATES it for every hash row r
    * (colliding keys only add cross terms), so min over rows is a
    * one-sided estimate — same guarantee family as `agg_cms`. Both
    * sketches build in one map-side pass each (d literal-hash rows per
    * input row, hash-agg to ≤ d·w cells), merge by cell-wise addition
    * across any partitioning, and the estimate itself joins two d·w
    * grids — the whole decision costs sketch-size work, never a real
    * join. The gate estimates |events ⋈ orders| on user/customer key
    * and emits per-row estimates, their min, the exact join size, and
    * the guarantee bit; everything is integer-exact LCG arithmetic, so
    * DuckDB rebuilds the identical grids. */
  def joinSizeEstimate(spark: SparkSession, dir: String): DataFrame = {
    import OlapQueries.{cmsA, cmsB, cmsDepth, cmsP, cmsWidth}
    def bucket(i: Int, c: Column): Column =
      pmod(pmod(lit(cmsA(i)) * c + lit(cmsB(i)), lit(cmsP)), lit(cmsWidth))
    def sketch(keyed: DataFrame, k: String): DataFrame = keyed
      .select(explode(array((0 until cmsDepth).map(i =>
        struct(lit(i).as("r"), bucket(i, col(k)).as("b"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))
    val ev = Tables.load(spark, dir, "events").select(col("user_id"))
    val od = Tables.load(spark, dir, "orders").select(col("o_custkey"))
    val est = sketch(ev, "user_id").as("a")
      .join(sketch(od, "o_custkey").withColumnRenamed("c", "c2").as("bb"),
        Seq("r", "b"))
      .groupBy("r").agg(sum(col("c") * col("c2")).as("est_r"))
    // exact inner product from the two per-key frequency maps — a
    // grouped join, never the materialized join itself; ONE long
    // reaches the driver (the Zorder scalar pattern — a 1-row
    // crossJoin(broadcast) would plan as the banned BNLJ)
    val exactJoin: Long = ev.groupBy("user_id").agg(count(lit(1)).as("fa"))
      .join(od.groupBy("o_custkey").agg(count(lit(1)).as("fb")),
        col("user_id") === col("o_custkey"))
      .agg(coalesce(sum(col("fa") * col("fb")), lit(0L)).as("exact_join"))
      .collect()(0).getLong(0)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    est.withColumn("est_min", min(col("est_r")).over(wAll))
      .select(col("r"), col("est_r"), col("est_min"),
        lit(exactJoin).as("exact_join"))
      .withColumn("overest_ok", col("est_r") >= col("exact_join"))
  }

  /** Chi-square contingency statistic — the independence test behind
    * every A/B readout and feature-selection pass, here over the
    * (event_type × ISO day-of-week) contingency table: is activity mix
    * independent of weekday? Per-cell contribution (O−E)²/E is emitted
    * as the EXACT integer `1e6·(O·n − R·C)² DIV (n·R·C)` — the classic
    * statistic times n, cross-multiplied so no float division ever
    * happens; squares run in DECIMAL(38,0) (HUGEINT in the oracle), so
    * a 100 TB corpus (n ~ 10^12) still fits with 14 digits to spare.
    * Plan: one scan → bounded |types|×7 cell agg; marginals are
    * windows over that bounded frame (the stats_join_size pattern), so
    * nothing after the first agg scales with data. The day-of-week is
    * epoch-day arithmetic ((d+3) mod 7: 0=Mon), not an engine DOW
    * convention. */
  def chi2Contingency(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.load(spark, dir, "events")
      .select(col("event_type"),
        expr("pmod(unix_timestamp(date_trunc('DAY', ts)) DIV 86400 + 3, 7)")
          .as("dow"))
      .groupBy("event_type", "dow").agg(count(lit(1)).as("o"))
    val wR = Window.partitionBy("event_type")
    val wC = Window.partitionBy("dow")
    val wN = Window.partitionBy()
    cells
      .withColumn("r_tot", sum(col("o")).over(wR))
      .withColumn("c_tot", sum(col("o")).over(wC))
      .withColumn("n", sum(col("o")).over(wN))
      .withColumn("d", (col("o") * col("n") - col("r_tot") * col("c_tot"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
      .select(col("event_type"), col("dow"), col("o"), col("r_tot"),
        col("c_tot"), col("n"),
        expr("CAST(d * d * 1000000 DIV " +
          "(CAST(n AS DECIMAL(38,0)) * r_tot * c_tot) AS BIGINT)")
          .as("chi2_cell_q6"))
  }

  /** Pre/post split for [[cupedAb]] — mid-corpus so both periods carry
    * real mass at every SF. */
  val cupedSplit = "2024-01-16 00:00:00"

  /** CUPED variance-reduced A/B readout (Deng et al., WSDM'13:
    * "Improving the Sensitivity of Online Controlled Experiments by
    * Utilizing Pre-Experiment Data") — the experimentation query every
    * metrics platform runs: per-user post-period metric Y adjusted by
    * the pre-period covariate X via theta = cov(X,Y)/var(X), which
    * shrinks arm-mean variance by the squared correlation without
    * biasing the treatment delta (theta is computed pooled, applied
    * identically to both arms).
    *
    * Determinism discipline (the chi2/outliers pattern): money values
    * become cents (exact longs), all moments are DECIMAL(38,0) sums —
    * order-independent, partitioning-independent — and every published
    * number is an integer cross-multiplication quantized by a final
    * `1e6·num DIV den` (both engines truncate toward zero), so no
    * float ever enters a comparison. The adjusted mean is published
    * from the identity
    *   mean_adj = [sya·td·n − tn·(sxa·n − sx·na)] / (na·n·td)
    * with tn = n·sxy − sx·sy, td = n·sxx − sx² — pure integers.
    * Headroom: cents ≤ ~1e6 per user-period keeps every product under
    * 10^32 even at 10^7 users; beyond that a production job rescales
    * the covariate unit (dataflow unchanged).
    *
    * Plan: one events scan → per-user conditional-sum agg (the only
    * corpus-scale shuffle) → cached user frame feeds one global and
    * one per-arm aggregate; the five pooled scalars reach the driver
    * as ONE row (the Zorder scalar pattern — a 1-row crossJoin would
    * plan as the banned BNLJ). Arm assignment is the LCG parity of
    * user_id — engine-portable, balanced, and stable under resharding. */
  def cupedAb(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val pre = col("ts") < to_timestamp(lit(cupedSplit))
    val cents = round(col("value") * 100).cast("long")
    val users = Tables.load(spark, dir, "events")
      .select(col("user_id"), pre.as("pre"), cents.as("c"))
      .groupBy("user_id")
      .agg(
        coalesce(sum(when(col("pre"), col("c"))), lit(0L)).as("x"),
        coalesce(sum(when(!col("pre"), col("c"))), lit(0L)).as("y"))
      .withColumn("arm",
        pmod(col("user_id") * lit(1103515245L) + lit(12345L),
          lit(2147483648L)) % 2)
      .cache() // one row per user — bounded, feeds both aggregates
    val g = users.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(d38)).as("sx"),
      sum(col("y").cast(d38)).as("sy"),
      sum((col("x") * col("x")).cast(d38)).as("sxx"),
      sum((col("x") * col("y")).cast(d38)).as("sxy"))
      .head() // ONE row of pooled scalars
    val (n, sx, sy, sxx, sxy) = (g.getLong(0), g.getDecimal(1),
      g.getDecimal(2), g.getDecimal(3), g.getDecimal(4))
    val nB = java.math.BigDecimal.valueOf(n)
    val tn = sxy.multiply(nB).subtract(sx.multiply(sy))
    val td = sxx.multiply(nB).subtract(sx.multiply(sx))
    require(td.signum != 0, "CUPED: degenerate covariate (var(X) = 0)")
    // quantization uses SQL DIV, not a decimal cast: Spark's
    // decimal→decimal(38,0) cast ROUNDS half-up while DuckDB `//`
    // truncates toward zero — DIV truncates in both engines (the
    // stats_chi2 pattern). Pooled scalars are spliced in as decimal
    // literals; all arithmetic stays DECIMAL(38,0), scale 0.
    def d(v: java.math.BigDecimal): String =
      s"CAST('${v.toPlainString}' AS DECIMAL(38,0))"
    val (tnS, tdS, sxS) = (d(tn), d(td), d(sx))
    users.groupBy("arm")
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("y")).as("sum_post_cents"),
        sum(col("x").cast(d38)).as("sxa"),
        sum(col("y").cast(d38)).as("sya"))
      .selectExpr(
        "arm", "n_users", "sum_post_cents",
        "CAST((1000000 * sya) DIV CAST(n_users AS DECIMAL(38,0)) AS BIGINT)" +
          " AS mean_post_q6",
        s"""CAST((1000000 * (sya * $tdS * $n
           |  - $tnS * (sxa * $n - $sxS * CAST(n_users AS DECIMAL(38,0)))))
           |  DIV (CAST(n_users AS DECIMAL(38,0)) * $n * $tdS)
           |  AS BIGINT) AS mean_adj_q6""".stripMargin,
        s"CAST((1000000 * $tnS) DIV $tdS AS BIGINT) AS theta_q6")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_cuped" -> cupedAb _,
    "stats_analyze" -> analyzeTable _,
    "stats_chi2" -> chi2Contingency _,
    "stats_join_size" -> joinSizeEstimate _)

  val oracles: Map[String, String] = Map(
    "stats_cuped" ->
      s"""WITH u AS (SELECT user_id,
         |    CAST(coalesce(sum(CASE WHEN ts < TIMESTAMP '$cupedSplit'
         |      THEN CAST(round(value * 100) AS BIGINT) END), 0)
         |      AS BIGINT) AS x,
         |    CAST(coalesce(sum(CASE WHEN ts >= TIMESTAMP '$cupedSplit'
         |      THEN CAST(round(value * 100) AS BIGINT) END), 0)
         |      AS BIGINT) AS y,
         |    ((user_id * 1103515245 + 12345) % 2147483648) % 2 AS arm
         |  FROM events GROUP BY user_id),
         |g AS (SELECT CAST(count(*) AS HUGEINT) AS n,
         |    CAST(sum(x) AS HUGEINT) AS sx,
         |    CAST(sum(y) AS HUGEINT) AS sy,
         |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
         |  FROM u),
         |t AS (SELECT n, sx, n * sxy - sx * sy AS tn,
         |    n * sxx - sx * sx AS td FROM g),
         |a AS (SELECT arm, CAST(count(*) AS HUGEINT) AS na,
         |    CAST(sum(y) AS BIGINT) AS sum_post_cents,
         |    CAST(sum(x) AS HUGEINT) AS sxa,
         |    CAST(sum(y) AS HUGEINT) AS sya
         |  FROM u GROUP BY arm)
         |SELECT arm, CAST(na AS BIGINT) AS n_users, sum_post_cents,
         |  CAST((1000000 * sya) // na AS BIGINT) AS mean_post_q6,
         |  CAST((1000000 * (sya * td * n - tn * (sxa * n - sx * na)))
         |    // (na * n * td) AS BIGINT) AS mean_adj_q6,
         |  CAST((1000000 * tn) // td AS BIGINT) AS theta_q6
         |FROM a CROSS JOIN t""".stripMargin,
    "stats_chi2" ->
      """WITH c AS (SELECT event_type,
        |    (CAST(epoch(date_trunc('day', CAST(ts AS TIMESTAMP)))
        |      AS BIGINT) // 86400 + 3) % 7 AS dow,
        |    count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, dow, o,
        |    CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS r_tot,
        |    CAST(sum(o) OVER (PARTITION BY dow) AS BIGINT) AS c_tot,
        |    CAST(sum(o) OVER () AS BIGINT) AS n
        |  FROM c),
        |d AS (SELECT *, CAST(o * n - r_tot * c_tot AS HUGEINT) AS dd
        |  FROM m)
        |SELECT event_type, dow, o, r_tot, c_tot, n,
        |  CAST(dd * dd * 1000000 //
        |    (CAST(n AS HUGEINT) * r_tot * c_tot) AS BIGINT)
        |    AS chi2_cell_q6
        |FROM d""".stripMargin,
    "stats_analyze" -> {
      val selects = analyzeCols.map { c =>
        s"""SELECT '$c' AS column_name,
           |  (SELECT count(*) FROM lineitem) AS n_rows,
           |  count(*) FILTER (WHERE $c IS NULL) AS n_nulls,
           |  count(DISTINCT $c) AS ndv,
           |  min(CAST($c AS VARCHAR)) AS min_s,
           |  max(CAST($c AS VARCHAR)) AS max_s
           |FROM lineitem""".stripMargin
      }
      selects.mkString("\nUNION ALL\n")
    },
    "stats_join_size" -> {
      import OlapQueries.{cmsA, cmsB, cmsDepth, cmsP, cmsWidth}
      def grid(src: String, k: String) = (0 until cmsDepth).map { i =>
        s"""SELECT $i AS r,
           |  ((${cmsA(i)} * $k + ${cmsB(i)}) % $cmsP) % $cmsWidth AS b,
           |  count(*) AS c
           |FROM $src GROUP BY 1, 2""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ga AS (${grid("events", "user_id")}),
         |gb AS (${grid("orders", "o_custkey")}),
         |est AS (SELECT ga.r, CAST(sum(ga.c * gb.c) AS BIGINT) AS est_r
         |  FROM ga JOIN gb ON ga.r = gb.r AND ga.b = gb.b GROUP BY 1),
         |ex AS (SELECT coalesce(CAST(sum(fa.c * fb.c) AS BIGINT), 0)
         |    AS exact_join
         |  FROM (SELECT user_id, count(*) AS c FROM events GROUP BY 1) fa
         |  JOIN (SELECT o_custkey, count(*) AS c FROM orders GROUP BY 1) fb
         |    ON fa.user_id = fb.o_custkey)
         |SELECT est.r, est.est_r,
         |  min(est.est_r) OVER () AS est_min,
         |  ex.exact_join,
         |  est.est_r >= ex.exact_join AS overest_ok
         |FROM est CROSS JOIN ex""".stripMargin
    })
}
