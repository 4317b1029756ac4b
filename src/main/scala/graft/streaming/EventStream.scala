package graft.streaming

import graft.Tables
import graft.Tables.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY.md §2.8): the reference's
  * scheduled micro-batch dataflow expressed as a real streaming query.
  *
  * The gate query replays the `events` parquet through a file streaming
  * source into a tumbling 1-hour event-time aggregation and returns the
  * final (complete-mode) result — which must equal the batch
  * `window_tumbling` query bit-for-bit; the DuckDB oracle is shared.
  * On a cluster the same plan runs continuously with
  * `withWatermark("ts", ...)` + append mode and a real sink; complete
  * mode + memory sink is the deterministic offline harness form.
  */
object EventStream {

  def streamTumbling(spark: SparkSession, dir: String): DataFrame = {
    // ns-timestamp parquet: stream reads ts as Long (legacy flag), then
    // converts to a microsecond timestamp — same convention as Tables.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("val_sum"))
    val name = "graft_stream_tumbling"
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
      // materialize the final snapshot before stopping the query
      val out = spark.table(name).cache()
      out.count()
      out
    } finally q.stop()
  }

  /** Append-mode + watermark variant of the tumbling aggregation — the
    * production streaming shape (complete mode re-emits everything each
    * trigger; append emits each window exactly once, when the watermark
    * passes its end, which is what a sink at scale needs).
    *
    * Determinism harness: the events are replayed as ONE file, followed
    * by two far-future sentinel files (ascending mtimes +
    * maxFilesPerTrigger=1 force three ordered micro-batches, since the
    * file source processes oldest-mtime first). The watermark after the
    * first sentinel batch passes every real window's end, so the second
    * sentinel batch flushes them all in append mode; sentinel windows
    * themselves are never flushed (no fourth batch) and are filtered by
    * the far-future cutoff anyway. Output therefore equals the batch
    * tumbling aggregation — the oracle is shared. */
  def streamTumblingAppend(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, StandardCopyOption}
    val batch = Tables.load(spark, dir, "events")
      .select(col("ts"), col("event_type"), col("value"))
    val work = Files.createTempDirectory("graft_stream_append")
    val staging = work.resolve("input")
    Files.createDirectories(staging)
    def writeOne(df: DataFrame, sub: String, name: String, mtime: Long): Unit = {
      val tmp = work.resolve(sub).toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-")
          && f.getName.endsWith(".parquet")).get
      val dest = staging.resolve(name)
      Files.move(part.toPath, dest, StandardCopyOption.REPLACE_EXISTING)
      dest.toFile.setLastModified(mtime)
    }
    import spark.implicits._
    val t0 = System.currentTimeMillis() - 600000L
    writeOne(batch, "w0", "a_events.parquet", t0)
    writeOne(
      Seq((java.sql.Timestamp.valueOf("2200-01-01 00:00:00"), "sentinel", 0.0))
        .toDF("ts", "event_type", "value"),
      "w1", "b_sentinel1.parquet", t0 + 60000L)
    writeOne(
      Seq((java.sql.Timestamp.valueOf("2200-01-02 00:00:00"), "sentinel", 0.0))
        .toDF("ts", "event_type", "value"),
      "w2", "c_sentinel2.parquet", t0 + 120000L)
    val stream = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staging.toString)
      .withWatermark("ts", "1 second")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("val_sum"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("cnt"), col("val_sum"))
    val name = "graft_stream_append"
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
      val out = spark.table(name)
        .filter(col("hour_start") < lit("2100-01-01").cast("timestamp"))
        .cache()
      out.count()
      out
    } finally q.stop()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling" -> streamTumbling _,
    "stream_tumbling_append" -> streamTumblingAppend _)

  private val tumblingSql =
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
      |  event_type, count(*) AS cnt,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS val_sum
      |FROM events GROUP BY 1, 2""".stripMargin

  val oracles: Map[String, String] = Map(
    "stream_tumbling" -> tumblingSql,
    // append mode flushes every real window (see harness above), so the
    // oracle is the same batch aggregation
    "stream_tumbling_append" -> tumblingSql)
}
