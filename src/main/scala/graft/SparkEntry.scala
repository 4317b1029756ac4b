package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the full operator inventory: core declared-SQL surface
  * (analytics.CoreQueries), join/window/set-op surface
  * (analytics.JoinQueries), ingest parse (sources.AlphaVantage), keyed
  * upsert (operators.Upsert), dedup + similarity + multimodal extensions
  * (operators.*), text analysis (functions.TextAnalysis) and streaming
  * (streaming.EventStream). Every SQL-expressible query has a DuckDB
  * oracle with identical column aliases.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    analytics.JoinQueries.joinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    analytics.CoreQueries.queries ++
      analytics.JoinQueries.queries ++
      sources.AlphaVantage.queries ++
      operators.Upsert.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.Multimodal.queries ++
      functions.TextAnalysis.queries ++
      streaming.EventStream.queries ++
      store.Catalog.queries ++
      pipeline.StockPipeline.queries ++
      streaming.Sessionize.queries ++
      operators.SkewJoin.queries ++
      operators.AsofJoin.queries ++
      operators.RangeJoin.queries ++
      analytics.OlapQueries.queries ++
      analytics.FunctionQueries.queries ++
      functions.TopK.queries ++
      store.Bucketing.queries ++
      operators.TrainPrep.queries ++
      operators.Decontaminate.queries ++
      operators.Incremental.queries ++
      streaming.StreamJoin.queries ++
      analytics.TimeSeries.queries ++
      operators.BloomJoin.queries ++
      operators.Scd.queries ++
      store.Zorder.queries ++
      streaming.ForeachBatchSink.queries ++
      operators.TableDiff.queries ++
      analytics.BehaviorQueries.queries ++
      analytics.DataQuality.queries ++
      store.Partitioned.queries ++
      store.Compaction.queries ++
      store.ZoneMap.queries ++
      analytics.Retrieval.queries ++
      analytics.StatsQueries.queries ++
      analytics.Skyline.queries ++
      operators.GramMatrix.queries ++
      store.MaterializedView.queries ++
      analytics.MarketBasket.queries ++
      store.BloomIndex.queries ++
      streaming.StreamEwma.queries ++
      streaming.StreamDrift.queries ++
      streaming.StreamPattern.queries ++
      streaming.StreamCheckpoint.queries ++
      store.Backfill.queries ++
      store.TimeTravel.queries ++
      streaming.StreamAsof.queries ++
      plans.Lineage.queries ++
      analytics.Aqp.queries ++
      analytics.Sketches.queries ++
      analytics.Privacy.queries ++
      streaming.StreamSketch.queries ++
      plans.ApproxRewrite.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    analytics.CoreQueries.oracles ++
      analytics.JoinQueries.oracles ++
      sources.AlphaVantage.oracles ++
      operators.Upsert.oracles ++
      operators.Dedup.oracles ++
      operators.Similarity.oracles ++
      operators.Multimodal.oracles ++
      functions.TextAnalysis.oracles ++
      streaming.EventStream.oracles ++
      store.Catalog.oracles ++
      pipeline.StockPipeline.oracles ++
      streaming.Sessionize.oracles ++
      operators.SkewJoin.oracles ++
      operators.AsofJoin.oracles ++
      operators.RangeJoin.oracles ++
      analytics.OlapQueries.oracles ++
      analytics.FunctionQueries.oracles ++
      functions.TopK.oracles ++
      store.Bucketing.oracles ++
      operators.TrainPrep.oracles ++
      operators.Decontaminate.oracles ++
      operators.Incremental.oracles ++
      streaming.StreamJoin.oracles ++
      analytics.TimeSeries.oracles ++
      operators.BloomJoin.oracles ++
      operators.Scd.oracles ++
      store.Zorder.oracles ++
      streaming.ForeachBatchSink.oracles ++
      operators.TableDiff.oracles ++
      analytics.BehaviorQueries.oracles ++
      analytics.DataQuality.oracles ++
      store.Partitioned.oracles ++
      store.Compaction.oracles ++
      store.ZoneMap.oracles ++
      analytics.Retrieval.oracles ++
      analytics.StatsQueries.oracles ++
      analytics.Skyline.oracles ++
      operators.GramMatrix.oracles ++
      store.MaterializedView.oracles ++
      analytics.MarketBasket.oracles ++
      store.BloomIndex.oracles ++
      streaming.StreamEwma.oracles ++
      streaming.StreamDrift.oracles ++
      streaming.StreamPattern.oracles ++
      streaming.StreamCheckpoint.oracles ++
      store.Backfill.oracles ++
      store.TimeTravel.oracles ++
      streaming.StreamAsof.oracles ++
      plans.Lineage.oracles ++
      analytics.Aqp.oracles ++
      analytics.Sketches.oracles ++
      analytics.Privacy.oracles ++
      streaming.StreamSketch.oracles ++
      plans.ApproxRewrite.oracles
}
