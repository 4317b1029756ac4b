package graft

import graft.analytics.Retrieval
import graft.store.ZoneMap
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class RetrievalZoneMapSpec extends AnyFunSuite {
  val spark = SparkTestSession.spark
  import spark.implicits._

  test("bm25 ranking matches a sequential reference scorer") {
    val docs = Tables.load(spark, SparkTestSession.sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val n = docs.length.toLong
    val t = docs.map(_._2.length.toLong).sum
    def flog2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val expected = Retrieval.bm25Queries.flatMap { case (qid, terms) =>
      val df = terms.map(tm => tm -> docs.count(_._2.contains(tm)).toLong)
        .filter(_._2 > 0).toMap
      val idf20 = df.map { case (tm, d) => tm -> flog2((n << 20) / d) }
      val scored = docs.flatMap { case (id, toks) =>
        val dl = toks.length.toLong
        val hits = terms.filter(tm => toks.contains(tm))
        if (hits.isEmpty) None
        else Some((id, hits.size.toLong, hits.map { tm =>
          val tf = toks.count(_ == tm).toLong
          (idf20(tm) * 22L * tf * t * 10000L) /
            (10L * t * tf + 3L * t + 9L * dl * n)
        }.sum))
      }
      scored.sortBy { case (id, _, s) => (-s, id) }
        .take(Retrieval.bm25K).zipWithIndex
        .map { case ((id, nh, s), i) => (qid, i + 1L, id, nh, s) }
    }.toSet
    val got = Retrieval.bm25TopK(spark, SparkTestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    // the rare term dominates: every doc containing `dup` outranks every
    // dup-free doc on query 0 (its idf20 exceeds the common terms')
    val dupDocs = docs.filter(_._2.contains("dup")).map(_._1).toSet
    val q0 = got.toSeq.filter(_._1 == 0L).sortBy(_._2)
    if (dupDocs.nonEmpty) assert(dupDocs.contains(q0.head._3))
  }

  test("zone map prunes files and the pruned scan matches the full scan") {
    val (kept, total) = ZoneMap.pruneCounts(spark, SparkTestSession.sf)
    assert(total >= 2 && total <= ZoneMap.nFiles)
    assert(kept < total, s"gate predicate must skip files ($kept/$total)")
    assert(kept > 0)
    val pruned = ZoneMap.prunedScan(spark, SparkTestSession.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // reference: same predicate over the ORIGINAL unsorted table
    val ev = Tables.load(spark, SparkTestSession.sf, "events")
    val (uMin, uMax) = {
      val r = ev.agg(org.apache.spark.sql.functions.min(col("user_id")),
        org.apache.spark.sql.functions.max(col("user_id"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val span = uMax - uMin
    val (lo, hi) = (uMin + span * 3 / 5, uMin + span * 4 / 5)
    val full = ev.filter(col("user_id").between(lo, hi))
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"),
        org.apache.spark.sql.functions.countDistinct(col("user_id"))
          .as("n_users"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(pruned == full)
  }

  test("zone map stats bracket every file's key range") {
    val path = ZoneMap.bootstrap(spark, SparkTestSession.sf)
    val zm = ZoneMap.stats(spark, path).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(zm.length >= 2 && zm.length <= ZoneMap.nFiles)
    // range-partitioned files: non-overlapping except at boundaries is
    // NOT guaranteed (boundary keys may straddle), but min <= max and
    // row counts must sum to the table
    assert(zm.forall(f => f._2 <= f._3))
    assert(zm.map(_._4).sum ==
      Tables.load(spark, SparkTestSession.sf, "events").count())
  }

  test("full outer join has unmatched rows on both sides") {
    val rows = analytics.JoinQueries
      .fullOuterJoin(spark, SparkTestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        Option(r.getString(3)), r.getString(4)))
    val sides = rows.groupBy(_._5).view.mapValues(_.length).toMap
    assert(sides.getOrElse("both", 0) > 0)
    assert(sides.getOrElse("left_only", 0) > 0)
    assert(sides.getOrElse("right_only", 0) > 0)
    assert(rows.filter(_._5 == "right_only").forall(r =>
      r._2 == 0L && r._3 == 0.0 && r._4.isDefined))
    assert(rows.filter(_._5 == "left_only").forall(r =>
      r._2 > 0L && r._4.isEmpty))
    // key set = union of the two inputs' key sets
    val custkeys = rows.map(_._1).toSet
    assert(custkeys.size == rows.length, "custkey must be unique")
  }
}
