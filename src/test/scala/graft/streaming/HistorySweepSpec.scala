package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The STREAMSCALE `*_history` sweep must measure the SAME operators
  * the gates prove correct — so each [[HistorySweep]] variant, run on
  * the plain test corpus, must emit exactly its gate's output set
  * (the gates themselves are oracle-proven against DuckDB). A variant
  * that drifted — different watermark semantics, a lossy slicing, a
  * broken sentinel schedule — would make the sweep's flat-state
  * evidence vacuous.
  *
  * Also pins the 2-copy stretched form (the long-frame construction
  * StreamScale uses, shrunk to 2×) against the equivalent batch
  * computation, so the time-shifted-copy harness itself — id offsets,
  * 31-day shifts, slice alignment across join sides — is proven
  * output-preserving, not just state-bounded. */
class HistorySweepSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private lazy val dir = graft.SparkTestSession.sf

  private def events: DataFrame =
    graft.Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value"))

  /** 2-copy fixed-rate stretch: ids offset to stay unique, second copy
    * shifted +31 days — the StreamScale long-frame construction. */
  private def stretched: DataFrame = {
    val ev = events
    val mx = ev.agg(max("event_id")).head().getLong(0)
    ev.unionByName(ev.select(
      (col("event_id") + lit(mx + 1)).as("event_id"), col("user_id"),
      col("event_type"), (col("ts") + expr("interval 31 days")).as("ts"),
      col("value")))
  }

  private def assertSameSet(got: DataFrame, want: DataFrame,
      tag: String): Unit = {
    val extra = got.exceptAll(want).count()
    val missing = want.exceptAll(got).count()
    assert(extra == 0 && missing == 0,
      s"$tag: $extra extra / $missing missing rows vs reference")
  }

  test("sessionize history variant == the stream_sessionize gate") {
    assertSameSet(
      HistorySweep.sessionizeHistoryOn(spark, events),
      Sessionize.streamSessionize(spark, dir),
      "sessionize_history")
    EventStream.purgeStaging()
  }

  test("interval-join history variants == the stream_stream_* gates") {
    val inner = StreamJoin.streamStreamJoin(spark, dir)
      .select(col("click_id"), col("purchase_id"),
        col("user_id").as("uid"), col("gap_s"))
    assertSameSet(
      HistorySweep.streamStreamHistoryOn(spark, events, "inner"),
      inner, "ss_join_history")
    val left = StreamJoin.streamStreamLeftOuter(spark, dir)
      .select(col("click_id"), col("purchase_id"),
        col("user_id").as("uid"), col("gap_s"))
    assertSameSet(
      HistorySweep.streamStreamHistoryOn(spark, events, "leftOuter"),
      left, "ss_left_history")
    assertSameSet(
      HistorySweep.streamStreamHistoryOn(spark, events, "fullOuter"),
      StreamJoin.streamStreamFullOuter(spark, dir), "ss_full_history")
    EventStream.purgeStaging()
  }

  test("pattern/as-of history variants == their gates") {
    assertSameSet(
      HistorySweep.patternHistoryOn(spark, events),
      StreamPattern.streamPatternMatch(spark, dir), "pattern_history")
    assertSameSet(
      HistorySweep.asofHistoryOn(spark, events),
      StreamAsof.streamAsof(spark, dir), "asof_history")
    EventStream.purgeStaging()
  }

  test("2-copy stretched sessionize == batch sessions on the stretched frame") {
    val got = HistorySweep.sessionizeHistoryOn(spark, stretched)
    val want = Sessionize.sessionizeBatchDf(
        stretched.select(col("user_id"),
          date_trunc("second", col("ts")).as("ts"),
          col("event_id")))
      .select(col("user_id"), col("n_events"),
        col("session_start_s"))
    assertSameSet(got, want, "stretched_sessionize")
    EventStream.purgeStaging()
  }

  test("2-copy stretched interval join == the batch join on the stretched frame") {
    val ev = stretched
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("cts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("pts"))
    val gap = unix_timestamp(col("pts")) - unix_timestamp(col("cts"))
    val want = clicks.join(purchases,
        col("user_id") === col("p_user")
          && gap.between(1, 3600), "fullOuter")
      .select(col("click_id"), col("purchase_id"),
        coalesce(col("user_id"), col("p_user")).as("uid"),
        gap.as("gap_s"))
    assertSameSet(
      HistorySweep.streamStreamHistoryOn(spark, ev, "fullOuter"),
      want, "stretched_full_join")
    EventStream.purgeStaging()
  }
}
