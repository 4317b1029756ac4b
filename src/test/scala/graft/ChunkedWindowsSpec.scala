package graft

import graft.analytics.JoinQueries
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Time-bucketed chunking of per-key windows: a planted hot key (one
  * user owning almost all events) must produce output identical to the
  * naive single-partition-per-user window. */
class ChunkedWindowsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("chunked running sum equals the naive prefix sum with a hot key") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 22:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // user 1 spans four day-buckets with 8k events; ties on ts exercise
    // the event_id ordering; user 2 is a normal key
    val rows = (0 until 8000).map(i =>
      (1L, ts(i / 2), 100L + i, (i % 7 + 1) * 0.25)) ++
      Seq((2L, ts(0), 1L, 1.5), (2L, ts(3000), 2L, 2.25))
    val ev = rows.toDF("user_id", "ts", "event_id", "value")
    val naiveW = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = ev.withColumn("run_total",
        sum(Tables.dec(col("value"))).over(naiveW).cast("double"))
      .select("event_id", "user_id", "run_total")
    val chunked = JoinQueries.runningSumChunkedDf(ev)
    assert(naive.exceptAll(chunked).isEmpty && chunked.exceptAll(naive).isEmpty)
  }
}
