package graft

import graft.analytics.{CoreQueries, FunctionQueries, JoinQueries}
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the lateral-subquery, null-aware anti join, and window
  * navigation-function gates. */
class SqlBreadthSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("lateral subquery equals per-customer top-2 and never nested-loops") {
    val out = SparkEntry.queries("sql_lateral")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: top-2 recent orders per BUILDING customer, driver-side
    val custs = Tables.load(spark, sf, "customer")
      .filter("c_mktsegment = 'BUILDING'")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val byCust = Tables.load(spark, sf, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString))
      .filter(r => custs.contains(r._1)).groupBy(_._1)
    val want = byCust.toSeq.flatMap { case (c, rows) =>
      rows.sortBy(r => (r._3, r._2))(
        Ordering.Tuple2(Ordering.String.reverse, Ordering.Long))
        .take(2).map(r => (c, r._2)).toSeq
    }.toSet
    assert(out == want)
    val plan = SparkEntry.queries("sql_lateral")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "decorrelation failed")
    assert(plan.contains("WindowGroupLimit"), "top-k pushdown missing")
  }

  test("NOT IN is null-aware: null probes drop, and the corpus has some") {
    val orders = Tables.load(spark, sf, "orders")
      .select("o_orderstatus", "o_custkey").collect()
      .map(r => (r.getString(0), r.getLong(1) % 997))
    val machinery = Tables.load(spark, sf, "customer")
      .filter("c_mktsegment = 'MACHINERY'")
      .select("c_custkey").collect().map(_.getLong(0) % 1000).toSet
    // reference: NULL probe (o_custkey % 997 == 0) never passes NOT IN
    val want = orders.filter(r => r._2 != 0 && !machinery.contains(r._2))
      .groupBy(_._1).map { case (s, v) => (s, v.length.toLong) }
    val out = JoinQueries.nullAwareAnti(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == want)
    // the semantics are actually exercised: a null-blind anti join
    // would have kept these rows
    assert(orders.count(_._2 == 0) > 0, "no null probes in corpus slice")
  }

  test("navigation windows match a sequential per-partition walk") {
    val rows = FunctionQueries.windowNav(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    val base = Tables.load(spark, sf, "orders")
      .filter("o_orderkey < 4000")
      .selectExpr("o_orderkey", "o_orderpriority", "o_orderdate",
        "NULLIF(o_custkey % 7, 0) AS probe").collect()
      .map(r => (r.getLong(0), r.getString(1), r.get(2).toString,
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    base.groupBy(_._2).foreach { case (prio, part) =>
      val ordered = part.sortBy(r => (r._3, r._1))
      val nn = ordered.flatMap(_._4)
      val firstNn = nn.headOption
      val lastNn = nn.lastOption
      val nth2Nn = nn.drop(1).headOption
      val nth2Rn = ordered.drop(1).headOption.flatMap(_._4)
      rows.filter(_._2 == prio).foreach { r =>
        assert(r._4 == firstNn && r._5 == lastNn &&
          r._6 == nth2Nn && r._7 == nth2Rn, s"prio $prio key ${r._1}")
      }
    }
  }
}
