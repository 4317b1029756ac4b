package graft

import graft.operators.AsofJoin
import graft.plans.{AsofJoinNode, AsofJoinStrategy}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsofPlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("native as-of join equals the composed union+window form on the corpus") {
    val composed = AsofJoin.purchaseToView(spark, SparkTestSession.sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toSet
    val native = AsofJoin.purchaseToViewNative(spark, SparkTestSession.sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toSet
    assert(native.nonEmpty)
    assert(native == composed)
  }

  test("native as-of plans as AsofJoinExec with one exchange + sort per side") {
    val plan = AsofJoin.purchaseToViewNative(spark, SparkTestSession.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$plan")
    val sorts = "Sort \\[".r.findAllIn(plan).size
    assert(sorts == 2, s"expected 2 sorts, got $sorts:\n$plan")
  }

  test("merge semantics on a constructed fixture: ties, unmatched, key boundaries") {
    import spark.implicits._
    // left (views): (key, ts, id); right (purchases): (key, ts, id)
    // covers: equal-ts match (<=), multiple lefts same ts (last-in-order
    // wins), unmatched right (before any left / key with no lefts),
    // key boundary where previous key's lefts must not leak
    val left = Seq(
      (1L, 10L, 100L), (1L, 10L, 101L), (1L, 20L, 102L),
      (2L, 5L, 200L),
      (4L, 50L, 400L))
      .toDF("k", "t", "lid")
      .select(col("k").as("v_user"),
        col("t").cast("timestamp").as("v_ts"), col("lid").as("view_id"))
    val right = Seq(
      (1L, 10L, 900L),  // equal ts -> matches lid 101 (last of the ties)
      (1L, 15L, 901L),  // between -> lid 101
      (1L, 25L, 902L),  // after all -> lid 102
      (2L, 4L, 903L),   // before any left of key 2 -> null
      (3L, 30L, 904L),  // key with no lefts -> null
      (4L, 60L, 905L))  // normal -> 400
      .toDF("k", "t", "rid")
      .select(col("k").as("user_id"),
        col("t").cast("timestamp").as("ts"), col("rid").as("purchase_id"))
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    val lp = GraftBridge.analyzed(left)
    val rp = GraftBridge.analyzed(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).get
    val node = AsofJoinNode(lp, rp,
      attr(lp, "v_user"), attr(rp, "user_id"),
      attr(lp, "v_ts"), attr(rp, "ts"),
      attr(lp, "view_id"), attr(rp, "purchase_id"))
    val got = GraftBridge.ofRows(spark, node)
      .select(col("purchase_id"),
        when(col("view_id").isNull, -1L).otherwise(col("view_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(900L -> 101L, 901L -> 101L, 902L -> 102L,
      903L -> -1L, 904L -> -1L, 905L -> 400L))
  }

  test("bucketed+sorted inputs: native as-of plans with no exchange and no sort") {
    // The exec's distribution/ordering CONTRACT is what lets a
    // bucketed layout elide the per-query exchange+sort entirely —
    // the whole point of a physical operator over the union+window
    // composition. 8 buckets on user_id, sorted (user_id, ts,
    // event_id), one file per bucket so the scan reports ordering.
    import org.apache.spark.sql.DataFrame
    val sf = SparkTestSession.sf
    val tag = sf.replaceAll("[^A-Za-z0-9]", "_")
    val events = Tables.load(spark, sf, "events")
    def save(name: String, df: DataFrame): Unit =
      if (!spark.catalog.tableExists(name)) {
        // the in-memory catalog forgets tables between JVMs but the
        // warehouse directory survives — clear stale locations
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(new java.io.File(s"spark-warehouse/$name"))
        df.repartition(8, col("user_id"))
          .write.bucketBy(8, "user_id").sortBy("user_id", "ts", "event_id")
          .mode("overwrite").saveAsTable(name)
      }
    save(s"asof_views_b_$tag", events.filter(col("event_type") === "view")
      .select("user_id", "ts", "event_id"))
    save(s"asof_purch_b_$tag", events.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id"))
    val left = spark.table(s"asof_views_b_$tag")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val right = spark.table(s"asof_purch_b_$tag")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    def build() = {
      val lp = GraftBridge.analyzed(left)
      val rp = GraftBridge.analyzed(right)
      def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
          n: String) = p.output.find(_.name == n).get
      GraftBridge.ofRows(spark, graft.plans.AsofJoinNode(lp, rp,
        attr(lp, "v_user"), attr(rp, "user_id"),
        attr(lp, "v_ts"), attr(rp, "ts"),
        attr(lp, "view_id"), attr(rp, "purchase_id")))
    }
    val df = build()
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("AsofJoin"), plan)
    // bucketing satisfies the exec's ClusteredDistribution: NO
    // exchange on either side. Per-partition sorts remain because
    // Spark 3+ only reports bucket SORTED BY order from the scan
    // under the legacy conf (checked next) — those are pipelined
    // in-memory sorts, not shuffles.
    assert(!plan.linesIterator.exists(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange")
        && !l.contains("ReusedExchange")), s"unexpected exchange:\n$plan")
    // with the scan allowed to report its SORTED BY order, the sorts
    // disappear too: a fully exchange-free, sort-free streaming merge
    graft.Conf.withConf(spark,
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true") {
      val df2 = build()
      df2.collect()
      val plan2 = df2.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!plan2.contains("Sort ["), s"unexpected sort:\n$plan2")
    }
    // and the bucketed-path result equals the plain native form
    val plain = AsofJoin.purchaseToViewNative(spark, sf)
      .select("purchase_id", "view_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    val bucketed = df
      .select(col("purchase_id"),
        when(col("view_id").isNull, -1L).otherwise(col("view_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == plain)
  }

  test("right-side predicates push through the as-of node into the scan") {
    val base = AsofJoin.purchaseToViewNative(spark, SparkTestSession.sf)
    val filtered = base.filter(col("purchase_id") % 2 === 0)
    val opt = filtered.queryExecution.optimizedPlan
    // no Filter remains above the custom node ...
    val above = opt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.child.isInstanceOf[AsofJoinNode] => f
    }
    assert(above.isEmpty, s"filter not pushed:\n$opt")
    // ... the predicate sits in the node's RIGHT subtree ...
    val node = opt.collect { case a: AsofJoinNode => a }
    assert(node.nonEmpty, s"node missing:\n$opt")
    assert(node.head.right.toString.contains("% 2"),
      s"right subtree lacks the pushed predicate:\n${node.head.right}")
    // ... the left subtree is untouched (pushing there is unsound) ...
    assert(!node.head.left.toString.contains("% 2"))
    // ... and results equal filter-after-join
    val expected = AsofJoin.purchaseToView(spark, SparkTestSession.sf)
      .filter(col("purchase_id") % 2 === 0)
      .collect().map(_.getLong(0)).sorted.toSeq
    val got = filtered.collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("native as-of equals a sequential reference on randomized data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val lefts = (0 until 300).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, i.toLong))
    val rights = (0 until 300).map(i =>
      (rnd.nextInt(25).toLong, rnd.nextInt(50).toLong, (1000 + i).toLong))
    val expected = rights.map { case (rk, rt, rid) =>
      val cand = lefts.filter(l => l._1 == rk && l._2 <= rt)
      // last in (ts, tie) order
      rid -> (if (cand.isEmpty) -1L
              else cand.maxBy(l => (l._2, l._3))._3)
    }.toMap
    val left = lefts.toDF("k", "t", "lid")
      .select(col("k").as("v_user"),
        col("t").cast("timestamp").as("v_ts"), col("lid").as("view_id"))
    val right = rights.toDF("k", "t", "rid")
      .select(col("k").as("user_id"),
        col("t").cast("timestamp").as("ts"), col("rid").as("purchase_id"))
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    val lp = GraftBridge.analyzed(left)
    val rp = GraftBridge.analyzed(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).get
    val node = AsofJoinNode(lp, rp,
      attr(lp, "v_user"), attr(rp, "user_id"),
      attr(lp, "v_ts"), attr(rp, "ts"),
      attr(lp, "view_id"), attr(rp, "purchase_id"))
    val got = GraftBridge.ofRows(spark, node)
      .select(col("purchase_id"),
        when(col("view_id").isNull, -1L).otherwise(col("view_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}
