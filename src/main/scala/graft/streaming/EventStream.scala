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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling" -> streamTumbling _)

  val oracles: Map[String, String] = Map(
    "stream_tumbling" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
        |  event_type, count(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS val_sum
        |FROM events GROUP BY 1, 2""".stripMargin)
}
