package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke over the whole driver contract: every declared query runs on
  * sf0.001 and returns rows; oracle keys are a subset of query keys;
  * streaming equals its batch twin. */
class EntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query executes and returns rows on sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, SparkTestSession.sf).count()
        if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with zero rows: $empty")
  }

  test("streaming tumbling window equals batch tumbling window") {
    val s = streaming.EventStream.streamTumbling(spark, SparkTestSession.sf)
    val b = analytics.JoinQueries.tumblingWindow(spark, SparkTestSession.sf)
    assert(s.exceptAll(b).isEmpty && b.exceptAll(s).isEmpty)
  }
}
