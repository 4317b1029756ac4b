package graft

import graft.operators.Incremental
import graft.Tables.{dec, dsum}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("merged base+delta partials equal the full one-pass aggregation") {
    val sf = SparkTestSession.sf
    val merged = Incremental.incrementalMerge(spark, sf)
    val full = Tables.load(spark, sf, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("val_sum"),
        min(col("value")).as("val_min"), max(col("value")).as("val_max"))
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
    assert(merged.count() > 0)
  }

  test("merge is associative: re-splitting the delta changes nothing") {
    import spark.implicits._
    val ev = Seq(
      ("2024-01-01 10:00:00", "click", 1.25, 1L),
      ("2024-01-01 11:00:00", "click", 2.50, 2L),
      ("2024-01-01 12:00:00", "view", 0.75, 3L),
      ("2024-01-02 09:00:00", "click", 4.00, 4L),
      ("2024-01-02 10:00:00", "view", 3.25, 5L))
      .toDF("s", "event_type", "value", "event_id")
      .select(date_trunc("day", col("s").cast("timestamp")).as("day"),
        col("event_type"), col("value"), col("event_id"))
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("day", "event_type")
        .agg(count(lit(1)).as("cnt"), sum(dec(col("value"))).as("vsum"),
          min(col("value")).as("vmin"), max(col("value")).as("vmax"))
    def merge(parts: org.apache.spark.sql.DataFrame*) =
      parts.reduce(_ unionByName _)
        .groupBy("day", "event_type")
        .agg(sum(col("cnt")).as("cnt"),
          sum(col("vsum")).cast("double").as("val_sum"),
          min(col("vmin")).as("val_min"), max(col("vmax")).as("val_max"))
    // 2-way and 3-way splits must merge to identical results
    val two = merge(agg(ev.filter(col("event_id") <= 2)),
      agg(ev.filter(col("event_id") > 2)))
    val three = merge(agg(ev.filter(col("event_id") <= 1)),
      agg(ev.filter(col("event_id").between(2, 3))),
      agg(ev.filter(col("event_id") > 3)))
    assert(two.exceptAll(three).isEmpty && three.exceptAll(two).isEmpty)
  }

  test("delta-join quadrants are disjoint, all populated, and rebuild the join") {
    val sf = SparkTestSession.sf
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), (col("o_orderkey") % 7 === 0).as("oLate"))
    val l = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_linenumber") % 3 === 0).as("lLate"))
    // every joined pair lands in exactly one quadrant (rules partition
    // each side), and each quadrant is non-empty so the gate actually
    // exercises all three delta terms
    val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
    val quadCounts = pairs.groupBy("oLate", "lLate").count().collect()
      .map(r => ((r.getBoolean(0), r.getBoolean(1)), r.getLong(2))).toMap
    assert(quadCounts.size == 4 && quadCounts.values.forall(_ > 0))
    assert(quadCounts.values.sum == pairs.count())
    // incremental result equals the direct join aggregate
    val inc = Incremental.joinIncremental(spark, sf)
    val full = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_orderstatus")
      .join(Tables.load(spark, sf, "lineitem")
        .select(col("l_orderkey"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderstatus")
      .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("rev_cents"))
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
  }
}
