package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operator-metrics check for the streaming scale story: keyed-dedup
  * STATE grows with distinct keys, never with replay volume — the
  * property that makes continuous dedup viable at 10^9 events/day.
  * Asserted from StreamingQueryProgress.stateOperators, the same
  * metrics a production monitor would alert on. */
class StreamingStateSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  test("dedup state is bounded by distinct keys, not replay volume") {
    import spark.implicits._
    // 200 rows, 50 distinct event_ids, replayed as two files -> 400
    // input rows total across micro-batches
    val events = (0L until 200L)
      .map(i => (i % 50, new java.sql.Timestamp(1700000000000L + i * 1000)))
      .toDF("event_id", "ts")
    val staging = EventStream.stageReplay(Seq(events, events))
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(staging)
      .withWatermark("ts", "90 days")
      .dropDuplicatesWithinWatermark("event_id")
    val name = "graft_state_metrics"
    val q = stream.writeStream
      .outputMode("append").format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() == 50L)
      val stateRows = q.recentProgress.toSeq
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsTotal)
      assert(stateRows.nonEmpty)
      assert(stateRows.max == 50L,
        s"state rows ${stateRows.max} != 50 distinct keys " +
          s"(state must not scale with the 400 replayed rows)")
    } finally q.stop()
  }

  test("streaming as-of state is one row per user, not per event") {
    val sf = graft.SparkTestSession.sf
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    // capture progress for the query StreamAsof runs internally
    val stateRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        Option(e.progress.stateOperators).toSeq.flatten
          .foreach(s => stateRows += s.numRowsTotal)
    }
    spark.streams.addListener(listener)
    try {
      StreamAsof.streamAsof(spark, sf)
      val users = graft.Tables.load(spark, sf, "events")
        .filter(col("event_type").isin("view", "purchase"))
        .select("user_id").distinct().count()
      assert(stateRows.nonEmpty)
      assert(stateRows.max <= users,
        s"as-of state ${stateRows.max} rows exceeds $users users — " +
          "the O(1)-per-user story is broken")
    } finally spark.streams.removeListener(listener)
  }
}
