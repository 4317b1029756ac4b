package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The watermark-eviction contract behind the streaming 100 TB story
  * (r8 verdict #6): once the watermark starts moving, windowed-agg
  * state must PLATEAU — each trigger both adds new windows and evicts
  * expired ones — rather than accumulate with stream length. Asserted
  * from StreamingQueryProgress.stateOperators across >= 3
  * post-watermark triggers: without eviction, state rows would grow
  * by (keys x windows-per-batch) every trigger; with it, the
  * steady-state footprint is bounded by (keys x open windows),
  * independent of how long the stream has been running. */
class StreamStateBoundSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  test("windowed-agg state plateaus across post-watermark triggers") {
    import spark.implicits._
    // 6 micro-batches; batch i covers event time [i*60s, i*60s+50s)
    // over 10 keys in 10s tumbling windows -> <= 50 (key, window)
    // groups per batch. Watermark 30s: by batch 2 every window from
    // batch 0 is expired, so each subsequent trigger evicts as much
    // as it adds.
    val t0 = 1700000000000L
    def batch(i: Int) = (0 until 500)
      .map { j =>
        (j % 10L, new java.sql.Timestamp(t0 + i * 60000L + (j % 50) * 1000L))
      }
      .toDF("k", "ts")
    val staging = EventStream.stageReplay((0 until 6).map(batch))
    val stream = spark.readStream.schema(batch(0).schema)
      .option("maxFilesPerTrigger", "1").parquet(staging)
      .withWatermark("ts", "30 seconds")
      .groupBy(col("k"), window(col("ts"), "10 seconds"))
      .agg(count(lit(1)).as("n"))
    val name = "graft_state_plateau"
    val q = stream.writeStream
      .outputMode("append").format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      val stateRows = q.recentProgress.toSeq
        .filter(_.numInputRows > 0) // drop the empty tail-probe batches
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsTotal)
      assert(stateRows.size >= 5, s"expected >=5 data triggers: $stateRows")
      // post-watermark regime = trigger 2 onward (>= 3 triggers):
      // state must never exceed the high-water mark set by trigger 1,
      // i.e. zero net growth once eviction is active
      val preMax = stateRows.take(2).max
      val post = stateRows.drop(2)
      assert(post.size >= 3)
      post.foreach { s =>
        assert(s <= preMax,
          s"state grew post-watermark: $s > $preMax (series $stateRows) — " +
            "eviction is not keeping up with arrivals")
      }
      // and eviction actually ran: rows were removed at some trigger
      val removed = q.recentProgress.toSeq
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsRemoved).sum
      assert(removed > 0L, "watermark never evicted any state rows")
    } finally q.stop()
  }

  test("watermarked dedup evicts state and still emits the exact distinct corpus") {
    val sf = graft.SparkTestSession.sf
    StreamMetrics.clear()
    StreamMetrics.enabled = true
    try {
      val out = EventStream.streamDedupWatermarked(spark, sf)
      val n = graft.Tables.load(spark, sf, "events").count()
      // exactness: every duplicate dropped, nothing else — the oracle
      // gate hashes this; here we pin counts + key-distinctness
      assert(out.count() == n, "output must be the distinct corpus")
      assert(out.select("event_id").distinct().count() == n)
      // eviction: the TTL bound means peak state is rate × horizon
      // (~4 of 30 days), NOT keys-ever — stream_dedup's un-TTL'd form
      // holds all n keys at peak (STREAMSCALE state_growth 10.0)
      val st = StreamMetrics.snapshot.values
        .find(_.query == "graft_stream_dedup_wm")
      assert(st.nonEmpty, "state metrics not recorded")
      assert(st.get.stateRowsPeak > 0)
      assert(st.get.stateRowsPeak < n / 2,
        s"peak state ${st.get.stateRowsPeak} of $n keys — watermark " +
          "eviction is not bounding dedup state")
      assert(st.get.stateRows <= st.get.stateRowsPeak)
    } finally {
      StreamMetrics.enabled = false
      StreamMetrics.clear()
      EventStream.purgeStaging()
      spark.catalog.clearCache()
    }
  }
}
