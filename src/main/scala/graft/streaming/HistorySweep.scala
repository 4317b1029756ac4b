package graft.streaming

import graft.streaming.EventStream.{stageReplay, streamShufflePartitions, withConf}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Fixed-rate HISTORY variants of the watermark/keyed-state streaming
  * gates, for the STREAMSCALE `*_history` sweep (r11 verdict #2).
  *
  * The per-SF sweep scales RATE (10× events over the same 30-day
  * span), so every stateful gate correctly shows state ∝ rate — the
  * physics, not the claim the operators exist to make. These variants
  * replay a CALLER-OWNED events frame — the sweep feeds the base
  * corpus (short) and ten 31-day-shifted copies of it (long: same
  * events/day, same user population, 10× the span) — in fixed-width
  * event-time slices, one micro-batch per slice, so per-trigger load
  * is constant and the watermark advances slice by slice exactly as a
  * deployment's trigger pacing would. Bounded-horizon state must then
  * stay ≈flat at 10× history (growth ≤~1.2):
  *  - session_window + 1 s watermark: state = open sessions, evicted
  *    as each slice's watermark passes their end;
  *  - stream-stream interval joins (inner/left/full) + 1 s watermarks:
  *    per-side buffers hold only rows whose join window the watermark
  *    has not yet closed — ≤ ~2 slices in flight regardless of length
  *    (the gate forms' 90-day-delay inner join retains everything BY
  *    HARNESS CHOICE for exactness; this is the production delay);
  *  - pattern/as-of keyed automata: state is one record per USER —
  *    fixed population ⇒ flat, the "pattern progress, not events,
  *    persists" story measured rather than asserted.
  *
  * Slice width 16 days: the base 30-day corpus replays as 2 slices —
  * the same trigger count as the gate forms — and the 10× span as ~20,
  * so `batches` grows ~10× while per-trigger load and peak state hold.
  * Eviction-correctness mirrors the gate scaladocs: slices are
  * time-ordered and 16 d ≫ the 3601 s join interval / 1800 s session
  * gap, so a row is only ever evicted after every row that could have
  * matched or merged with it was processed (both join sides advance in
  * lockstep — one file per source per trigger over aligned slices).
  * HistorySweepSpec pins each variant's output equal to its gate's on
  * the same corpus, so the sweep measures the same operator, not a
  * convenient cousin. */
object HistorySweep {

  private val sliceDays = 16

  /** Fixed-width day-aligned event-time slicer covering `all`'s span.
    * Returned closure slices ANY same-span frame on `tsCol` with the
    * SAME boundaries — join sides must align so both sources advance
    * in lockstep (empty slices still stage an empty file, preserving
    * the one-file-per-source-per-trigger pairing). Day alignment keeps
    * slice cuts second-aligned, the replay-order invariant the
    * pattern/as-of k-encodings rest on. */
  private def slicerOf(all: DataFrame, tsCol: String)
      : (DataFrame, String) => Seq[DataFrame] = {
    val span = all.agg(min(to_date(col(tsCol))), max(to_date(col(tsCol))))
      .head() // 1-row bounded agg
    val d0 = span.getDate(0)
    val nDays = java.time.temporal.ChronoUnit.DAYS
      .between(d0.toLocalDate, span.getDate(1).toLocalDate).toInt + 1
    val n = (nDays + sliceDays - 1) / sliceDays
    (df: DataFrame, ts: String) => {
      // slice filters re-scan their input; pin its rows once so the
      // one-job union write reads blocks, not n re-computations
      val staged = df.localCheckpoint(true)
      (0 until n).map { i =>
        staged.filter(
          datediff(to_date(col(ts)), lit(d0)) >= i * sliceDays &&
            datediff(to_date(col(ts)), lit(d0)) < (i + 1) * sliceDays)
      }
    }
  }

  /** [[Sessionize.streamSessionize]] over a caller-owned events frame
    * (`user_id`, `ts`), sliced replay: state = open sessions only. */
  private[graft] def sessionizeHistoryOn(spark: SparkSession,
      events: DataFrame): DataFrame =
    withConf(spark, "spark.sql.shuffle.partitions", streamShufflePartitions) {
    import spark.implicits._
    val batch = events
      .select(col("user_id"), date_trunc("second", col("ts")).as("tss"))
    val slices = slicerOf(batch, "tss")(batch, "tss")
    val sentinel = Seq((-1L, java.sql.Timestamp.valueOf("2200-01-01 00:00:00")))
      .toDF("user_id", "tss")
    val staging = stageReplay(
      slices.init :+ slices.last.unionByName(sentinel))
    val stream = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staging)
      .withWatermark("tss", "1 second")
      .groupBy(session_window(col("tss"), "1800 seconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), min("tss").as("session_start_s"))
      .select(col("user_id"), col("n_events"), col("session_start_s"))
    runToSnapshot(spark, stream, "graft_hist_sessionize",
      _.filter(col("user_id") >= 0))
  }

  /** The [[StreamJoin]] interval join over a caller-owned events frame,
    * sliced replay on BOTH sides with 1 s watermarks — the production
    * delay, so per-side buffers evict slice by slice. `joinType`:
    * inner / leftOuter / fullOuter (sentinels ride in each side's last
    * data file; harmless for inner — user −1 matches nothing). */
  private[graft] def streamStreamHistoryOn(spark: SparkSession,
      events: DataFrame, joinType: String): DataFrame =
    withConf(spark, "spark.sql.shuffle.partitions", streamShufflePartitions) {
    import spark.implicits._
    val ev = events
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val slicer = slicerOf(ev, "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("cts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("pts"))
    val sentC = Seq((-1L, -1L, java.sql.Timestamp.valueOf("2200-01-01 00:00:00")))
      .toDF("click_id", "user_id", "cts")
    val sentP = Seq((-1L, -1L, java.sql.Timestamp.valueOf("2200-01-01 00:00:00")))
      .toDF("purchase_id", "p_user", "pts")
    val cSlices = slicer(clicks, "cts")
    val pSlices = slicer(purchases, "pts")
    val clickStaging = stageReplay(
      cSlices.init :+ cSlices.last.unionByName(sentC))
    val purchaseStaging = stageReplay(
      pSlices.init :+ pSlices.last.unionByName(sentP))
    val cs = spark.readStream.schema(clicks.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(clickStaging)
      .withWatermark("cts", "1 second")
    val ps = spark.readStream.schema(purchases.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(purchaseStaging)
      .withWatermark("pts", "1 second")
    val gap = unix_timestamp(col("pts")) - unix_timestamp(col("cts"))
    val joined = cs.join(ps,
        col("user_id") === col("p_user")
          && col("pts") >= col("cts")
          && col("pts") <= col("cts") + expr("interval 3601 seconds")
          && gap.between(1, 3600),
        joinType)
      .select(col("click_id"), col("purchase_id"),
        coalesce(col("user_id"), col("p_user")).as("uid"),
        gap.as("gap_s"))
    runToSnapshot(spark, joined, s"graft_hist_ss_$joinType",
      _.filter(col("uid") >= 0))
  }

  /** [[StreamPattern.streamPatternMatch]] over a caller-owned events
    * frame, sliced replay: state = one automaton record per user. */
  private[graft] def patternHistoryOn(spark: SparkSession,
      events: DataFrame): DataFrame =
    withConf(spark, "spark.sql.shuffle.partitions", streamShufflePartitions) {
    import spark.implicits._
    val keyScale = 100000000L
    val batch = events
      .select(col("user_id"),
        (unix_timestamp(date_trunc("second", col("ts"))) * keyScale +
          when(col("event_id") < keyScale, col("event_id"))
            .otherwise(raise_error(concat(lit("event_id >= 1e8 breaks the "
              + "k-encoding total order: "), col("event_id"))))).as("k"),
        substring(col("event_type"), 1, 1).as("c"),
        col("ts"))
    val slices = slicerOf(batch, "ts")(batch, "ts")
      .map(_.select("user_id", "k", "c"))
    val staging = stageReplay(slices)
    val stream = spark.readStream
      .schema(slices.head.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staging)
      .as[PatEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PatState, PatOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[PatEvent], state: GroupState[PatState]) =>
          var st = state.getOption.getOrElse(PatState(0L, 0L, false))
          rows.toSeq.sortBy(_.k).foreach(e => st = StreamPattern.step(st, e.c))
          state.update(st)
          Iterator.single(PatOut(uid, st.nEvents, st.nConv))
      }
    runToSnapshot(spark, stream.toDF(), "graft_hist_pattern",
      // final snapshot = latest update per user (n_events is monotone)
      _.groupBy("user_id")
        .agg(max(struct(col("n_events"), col("n_conversions"))).as("s"))
        .select(col("user_id"), col("s.n_events").as("n_events"),
          col("s.n_conversions").as("n_conversions")))
  }

  /** [[StreamAsof.streamAsof]] over a caller-owned events frame, sliced
    * replay: state = one (latest view) record per user. */
  private[graft] def asofHistoryOn(spark: SparkSession,
      events: DataFrame): DataFrame =
    withConf(spark, "spark.sql.shuffle.partitions", streamShufflePartitions) {
    import spark.implicits._
    val batch = events
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"),
        unix_micros(col("ts")).as("us"),
        when(col("event_type") === "view", 0).otherwise(1).as("side"),
        col("event_id"),
        unix_timestamp(col("ts")).as("sec"),
        col("ts"))
    val slices = slicerOf(batch, "ts")(batch, "ts").map(_.drop("ts"))
    val staging = stageReplay(slices)
    val stream = spark.readStream
      .schema(slices.head.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staging)
      .as[AsofEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofViewState, AsofMatch](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[AsofEvent],
            state: GroupState[AsofViewState]) =>
          val st = state.getOption.getOrElse(AsofViewState(-1L, -1L, -1L))
          val (next, out) = StreamAsof.fold(st,
            rows.toSeq.sortBy(e => (e.us, e.side, e.event_id)))
          state.update(next)
          out.iterator
      }
    runToSnapshot(spark, stream.toDF(), "graft_hist_asof", identity)
  }

  /** Shared sink harness: memory sink, drain, snapshot through the
    * caller's finisher with an eager localCheckpoint (no cacheManager
    * entry — the session-hygiene contract), metrics recorded. */
  private def runToSnapshot(spark: SparkSession, stream: DataFrame,
      name: String, finish: DataFrame => DataFrame): DataFrame = {
    val q = stream.writeStream
      .outputMode(if (name.contains("pattern") || name.contains("asof"))
        "update" else "append")
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
      finish(spark.table(name)).localCheckpoint(true)
    } finally { StreamMetrics.record(q); q.stop() }
  }
}
