package graft

import graft.analytics.{BehaviorQueries, DataQuality, OlapQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for KMV set algebra, rolling median, last-touch attribution,
  * and the skew profiler. */
class SketchProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("KMV set ops: exact branch fires below k and obeys set algebra") {
    val rows = OlapQueries.kmvSetOps(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("a", "b", "union", "intersect"))
    // sf0.001 has ~15 users per segment — under k=64 the sketches ARE
    // the sets, so every estimate must equal its exact value
    rows.values.foreach { case (exact, est) => assert(est == exact) }
    val (a, b) = (rows("a")._1, rows("b")._1)
    val (u, i) = (rows("union")._1, rows("intersect")._1)
    assert(u == a + b - i && i <= math.min(a, b) && u >= math.max(a, b))
  }

  test("rolling median matches a per-row sorted reference") {
    val rows = OlapQueries.rollingMedian(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { part =>
      val ordered = part.sortBy(_._2)
      ordered.indices.foreach { i =>
        val frame = ordered.slice(math.max(0, i - 10), i + 1)
          .map(_._3).sorted
        val n = frame.length
        val med2 =
          if (n % 2 == 1) frame(n / 2) * 2
          else frame(n / 2 - 1) + frame(n / 2)
        assert(ordered(i)._4 == med2,
          s"row $i: got ${ordered(i)._4}, want $med2")
      }
    }
  }

  test("attribution matches a sequential reference") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_timestamp(date_trunc("second", col("ts")))
          .as("es"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))
    val byUser = ev.groupBy(_._1)
    val expect = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    for ((_, evs) <- byUser; p <- evs if p._3 == "purchase") {
      val k = p._5 * 100000000L + p._2
      val touches = evs.filter(e => e._3 != "purchase" && {
        val ek = e._5 * 100000000L + e._2
        ek <= k && ek >= k - 3600L * 100000000L
      })
      val who = if (touches.isEmpty) "direct"
        else touches.maxBy(e => e._5 * 100000000L + e._2)._3
      expect(who) += 1
    }
    val got = BehaviorQueries.attribution(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect.toMap && got.values.sum ==
      ev.count(_._3 == "purchase"))
  }

  test("skew profile rows agree with collected key counts") {
    val counts = Tables.load(spark, sf, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val total = counts.map(_._2).sum
    val nKeys = counts.length.toLong
    val top = counts.sortBy(c => (-c._2, c._1)).take(5)
    val expect = top.map { case (u, n) =>
      (u, n, 10000L * n / total, 10000L * n * nKeys / total) }.toSeq
    val got = DataQuality.skewProfile(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.sortBy(c => (-c._2, c._1)) == expect)
  }
}
