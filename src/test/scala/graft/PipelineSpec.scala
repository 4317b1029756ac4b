package graft

import graft.pipeline.{Scheduler, StockPipeline}
import graft.sources.AlphaVantageClient
import graft.store.Catalog
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def freshPipeline = new StockPipeline(spark, StockPipeline.fixtureFetch)

  test("full run: partial success accounting matches fixtures") {
    val out = StockPipeline.pipelineRun(spark, SparkTestSession.sf)
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
    assert(out.toSeq == Seq(("AAPL", true, 2L), ("ERR", false, 0L),
      ("MSFT", true, 1L), ("RL", false, 0L)))
  }

  test("re-running the pipeline does not grow stock_data (upsert idempotence)") {
    StockPipeline.pipelineRun(spark, SparkTestSession.sf)
    val n1 = spark.table("stock_data").count()
    StockPipeline.pipelineRun(spark, SparkTestSession.sf)
    val n2 = spark.table("stock_data").count()
    assert(n1 == n2 && n1 == 3)
  }

  test("pipeline_logs and stock_metadata receive rows per run") {
    val logs0 = spark.table("pipeline_logs").count()
    val meta0 = spark.table("stock_metadata").count()
    StockPipeline.pipelineRun(spark, SparkTestSession.sf)
    assert(spark.table("pipeline_logs").count() == logs0 + 3)
    assert(spark.table("stock_metadata").count() == meta0 + 4)
  }

  test("quality gate flags inverted high/low") {
    import spark.implicits._
    val bad = Seq(("A", java.sql.Timestamp.valueOf("2025-01-01 00:00:00"),
      1.0, 1.0, 2.0, 1.0, 1L,
      java.sql.Timestamp.valueOf("2025-01-01 00:00:00"), "UTC"))
      .toDF("symbol", "timestamp", "open_price", "high_price", "low_price",
        "close_price", "volume", "last_refreshed", "time_zone")
    val checks = freshPipeline.qualityChecks(bad).toMap
    assert(!checks("high_gte_low") && checks("keys_complete"))
  }

  test("retention deletes only expired rows") {
    Catalog.bootstrap(spark)
    import spark.implicits._
    val now = java.sql.Timestamp.valueOf("2025-06-01 00:00:00")
    val old = java.sql.Timestamp.valueOf("2023-01-01 00:00:00")
    val rows = Seq(
      ("OLD", old, BigDecimal(1), BigDecimal(1), BigDecimal(1), BigDecimal(1),
        1L, old, "UTC", old)).toDF(
      "symbol", "timestamp", "open_price", "high_price", "low_price",
      "close_price", "volume", "last_refreshed", "time_zone", "created_at")
    rows.selectExpr("symbol", "timestamp",
      "cast(open_price as decimal(15,4)) open_price",
      "cast(high_price as decimal(15,4)) high_price",
      "cast(low_price as decimal(15,4)) low_price",
      "cast(close_price as decimal(15,4)) close_price",
      "volume", "last_refreshed", "time_zone", "created_at",
      "cast(timestamp as date) trade_date")
      .write.mode("append").insertInto("stock_data")
    val deleted = Catalog.applyRetention(spark, now)
    assert(deleted("stock_data") >= 1)
    assert(spark.table("stock_data").filter("symbol = 'OLD'").count() == 0)
  }

  test("client throttles between requests and health-checks the probe") {
    val waits = scala.collection.mutable.ArrayBuffer.empty[Long]
    val client = new AlphaVantageClient("k",
      transport = url =>
        if (url.contains("GLOBAL_QUOTE")) """{"Global Quote": {}}""" else "{}",
      interRequestDelayMs = 50L,
      sleeper = waits += _)
    assert(client.healthCheck())
    client.fetchIntraday("AAPL")
    client.fetchIntraday("MSFT")
    assert(waits.nonEmpty && waits.forall(_ <= 50L))
  }

  test("retry backs off exponentially between attempts") {
    val waits = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val p = new StockPipeline(spark, _ => None, retries = 4,
      retryDelayMs = 100L, sleeper = waits += _)
    val out = p.retry(4) { calls += 1; None }
    assert(out.isEmpty && calls == 4)
    assert(waits.toSeq == Seq(100L, 200L, 400L)) // doubling, none after last
  }

  test("scheduler runs fixed-rate and notifies durably on failure") {
    val waits = scala.collection.mutable.ArrayBuffer.empty[Long]
    var clock = 0L
    // each now() call advances 1s, so every "run" appears to take time
    def now(): Long = { clock += 1000L; clock }
    val boom = new StockPipeline(spark,
      _ => throw new RuntimeException("transport down"))
    val sched = new Scheduler(spark, boom, intervalMs = 60000L,
      now = now _, sleeper = waits += _)
    val logs0 = spark.table("pipeline_logs")
      .filter("task_id = 'notify_failure'").count()
    val results = sched.run(Seq("AAPL"), runs = 2)
    assert(results == Seq(false, false))
    // fixed-rate: sleep = interval - elapsed, elapsed > 0 via fake clock
    assert(waits.size == 2 && waits.forall(w => w > 0 && w < 60000L))
    val notes = spark.table("pipeline_logs")
      .filter("task_id = 'notify_failure'")
    assert(notes.count() == logs0 + 2)
    assert(notes.filter("error_message LIKE '%transport down%'").count() >= 2)
  }

  test("failed transport returns None after retries; run continues") {
    val p = new StockPipeline(spark, _ => None, retries = 3)
    val (bars, results) = p.ingest(Seq("ZZZ"))
    assert(bars.isEmpty && results == Seq(StockPipeline.SymbolResult("ZZZ", false, 0L)))
  }
}
