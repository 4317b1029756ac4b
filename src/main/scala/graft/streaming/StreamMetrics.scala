package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery
import scala.collection.concurrent.TrieMap

/** Opt-in capture of Structured Streaming state-operator metrics.
  *
  * Every streaming gate drains with `processAllAvailable()` and stops
  * its query in a `finally`; that teardown calls [[record]], which (when
  * [[enabled]]) snapshots the query's progress history: total input
  * rows, batch count, and the LAST batch's state-store totals
  * (`numRowsTotal`, `memoryUsedBytes` summed over state operators).
  *
  * This exists to answer the 100 TB question the wall-clock bench
  * can't: is streaming STATE bounded by keys/windows inside the
  * watermark horizon (scales with key cardinality), or does it grow
  * with the events replayed (unbounded — a leak at scale)? The
  * [[graft.StreamScale]] main replays the stateful gates at two SFs
  * and publishes the measured input-vs-state growth in
  * STREAMSCALE.json. Default-off so gate timings never pay for it.
  */
object StreamMetrics {
  final case class StateStats(
      query: String,
      batches: Long,
      rowsIn: Long,
      stateRows: Long,
      stateBytes: Long,
      stateRowsPeak: Long,
      stateBytesPeak: Long)

  @volatile var enabled = false
  private val stats = TrieMap.empty[String, StateStats]

  def record(q: StreamingQuery): Unit = if (enabled) {
    val ps = q.recentProgress
    if (ps != null && ps.nonEmpty) {
      // recentProgress is a RING of the last numRecentProgressUpdates
      // entries (default 100): a run with more triggers would silently
      // drop its earliest batches from rowsIn/batches/peaks — the
      // exact numbers STREAMSCALE.json exists to get right. Truncation
      // must be LOUD, not a quietly understated in_growth. The
      // measuring harness (graft.StreamScale) raises the conf far
      // above any staged-replay trigger count, and Bench/Verify/test
      // sessions do too (defense in depth should metrics ever be
      // enabled there). `length == cap` alone is NOT proof of
      // truncation — a replay can legitimately run exactly `cap`
      // triggers — so only fail on the certain signal: a full ring
      // whose earliest retained entry is not the query's first batch.
      // (A checkpoint-resumed query starts at batchId > 0, but its
      // replays are far shorter than any configured cap.)
      val cap = q.sparkSession.conf
        .get("spark.sql.streaming.numRecentProgressUpdates", "100").toInt
      require(ps.length < cap || ps.head.batchId == 0L,
        s"progress history hit the $cap-entry retention cap with earliest " +
          s"retained batchId ${ps.head.batchId} — metrics are truncated; " +
          "raise spark.sql.streaming.numRecentProgressUpdates")
      val name = Option(q.name).getOrElse(q.id.toString)
      def rowsOf(p: org.apache.spark.sql.streaming.StreamingQueryProgress) =
        Option(p.stateOperators).fold(0L)(_.map(_.numRowsTotal).sum)
      def bytesOf(p: org.apache.spark.sql.streaming.StreamingQueryProgress) =
        Option(p.stateOperators).fold(0L)(_.map(_.memoryUsedBytes).sum)
      // END state (post-drain, after watermark purges) vs PEAK state
      // (the watermark-horizon bound a production deployment sizes for)
      stats.put(name, StateStats(
        name,
        ps.length.toLong,
        ps.map(_.numInputRows).sum,
        rowsOf(ps.last),
        bytesOf(ps.last),
        ps.map(rowsOf).max,
        ps.map(bytesOf).max))
    }
  }

  def snapshot: Map[String, StateStats] = stats.toMap
  def clear(): Unit = stats.clear()
}
