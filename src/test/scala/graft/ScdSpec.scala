package graft

import graft.operators.Scd
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScdSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("scd2: one open version per user, chained intervals, no no-change rows") {
    val hist = Scd.scd2History(spark, SparkTestSession.sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        Option(r.getTimestamp(2)), Option(r.getTimestamp(3)),
        r.getBoolean(4), r.getLong(5)))
    assert(hist.nonEmpty)
    hist.groupBy(_._1).foreach { case (user, rows) =>
      val ordered = rows.sortBy(_._6)
      // versions are contiguous from 1
      assert(ordered.map(_._6).toSeq == (1L to ordered.length).toSeq)
      // exactly one current row, and it is the last version
      assert(rows.count(_._5) == 1 && ordered.last._5)
      // every closed version chains to the next one's start
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 == b._3, s"user $user: gap between versions")
          // consecutive versions carry different values (SCD2 collapse)
          assert(a._2 != b._2, s"user $user: no-change version")
        case _ =>
      }
      // only the current row is open-ended
      assert(ordered.dropRight(1).forall(_._4.isDefined))
      assert(ordered.last._4.isEmpty)
    }
  }

  test("incremental scd2Apply equals full recompute under out-of-order batches") {
    val purchases = Tables.load(spark, SparkTestSession.sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    // three arbitrary interleaved batches (mod-3 split: each batch's
    // rows land between the others' in event time)
    val state = (0L until 3L).foldLeft(purchases.limit(0)) { (st, i) =>
      Scd.scd2Apply(st, purchases.filter(col("event_id") % 3 === i))
    }
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0), r.getDouble(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4), r.getLong(5))
    }.toSet
    assert(key(Scd.deriveHistory(state))
      == key(Scd.scd2History(spark, SparkTestSession.sf)))
    // idempotence: re-applying an empty batch leaves the state fixed
    val again = Scd.scd2Apply(state, purchases.limit(0))
    assert(again.collect().toSet == state.collect().toSet)
  }

  test("scd2 point-in-time lookup equals the forward-fill answer") {
    // reconstruct "the user's purchase amount as of t" from history and
    // from the raw stream independently, for one mid-corpus instant
    val t = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val fromHist = Scd.scd2History(spark, SparkTestSession.sf)
      .filter(col("valid_from") <= lit(t)
        && (col("valid_to").isNull || col("valid_to") > lit(t)))
      .select(col("user_id"), col("value"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val raw = Tables.load(spark, SparkTestSession.sf, "events")
      .filter(col("event_type") === "purchase"
        && date_trunc("second", col("ts")) <= lit(t))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("value"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fromHist == raw)
  }

  test("point-in-time join: at most one version per click, value is as-of") {
    val sf = SparkTestSession.sf
    val out = Scd.pointInTimeJoin(spark, sf).cache()
    // half-open intervals partition the timeline: never two matches
    val dups = out.groupBy("event_id").count().filter(col("count") > 1).count()
    assert(dups == 0)
    // every matched value equals the last purchase at-or-before the click
    // (spot-check via the forward-fill reconstruction on a sample)
    val sample = out.orderBy("event_id").limit(20).collect()
    val ev = Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("second", col("ts")).as("pt"),
        col("ts"), col("event_id"), col("value")).collect()
    sample.foreach { r =>
      val (uid, at, v) = (r.getLong(1), r.getTimestamp(2), r.getDouble(4))
      val want = ev.filter(e => e.getLong(0) == uid
          && !e.getTimestamp(1).after(at))
        .maxBy(e => (e.getTimestamp(2).getTime, e.getLong(3)))
        .getDouble(4)
      assert(v == want, s"click ${r.getLong(0)} user $uid at $at")
    }
    out.unpersist()
    ()
  }
}
