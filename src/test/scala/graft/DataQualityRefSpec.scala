package graft

import graft.analytics.DataQuality
import graft.operators.TrainPrep
import org.scalatest.funsuite.AnyFunSuite

class DataQualityRefSpec extends AnyFunSuite {
  val spark = SparkTestSession.spark

  test("order violations match a driver-side per-user walk") {
    val sf = SparkTestSession.sf
    val out = DataQuality.orderViolations(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val ev = Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type",
        "unix_micros(ts) AS t")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val counts = scala.collection.mutable.Map
      .empty[String, (Long, Long)].withDefaultValue((0L, 0L))
    ev.groupBy(_._1).values.foreach { rows =>
      val s = rows.sortBy(_._2)
      s.zip(s.drop(1)).foreach { case ((_, _, _, pt), (_, _, ty, t)) =>
        val (p, b) = counts(ty)
        counts(ty) = (p + 1, b + (if (t < pt) 1 else 0))
      }
    }
    assert(out == counts.map { case (ty, (p, b)) =>
      ty -> (p, b, 1000000L * b / p)
    }.toMap)
    // total pairs = events - users (every non-first event forms a pair)
    val users = ev.map(_._1).distinct.length
    assert(out.values.map(_._1).sum == ev.length - users)
  }

  test("referential audit: declared edges are clean and fully counted") {
    val rows = DataQuality.referential(spark, SparkTestSession.sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toMap
    assert(rows.size == 3)
    val (liN, liOrph, _, liOk) = rows("lineitem.l_orderkey->orders")
    assert(liOk && liOrph == 0
      && liN == Tables.load(spark, SparkTestSession.sf, "lineitem").count())
    assert(rows.values.forall(_._4), "all declared edges must be clean")
  }

  test("audit edge counts planted orphans: rows, distinct keys, ok flag") {
    import spark.implicits._
    val child = Seq(1L, 1L, 2L, 3L, 9L, 9L, 9L).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = DataQuality.auditEdge("planted", child, "ck", parent, "pk")
      .collect()(0)
    assert(r.getString(0) == "planted")
    assert(r.getLong(1) == 7)  // child rows
    assert(r.getLong(2) == 3)  // orphan rows: the three 9s
    assert(r.getLong(3) == 1)  // orphan keys: {9}
    assert(!r.getBoolean(4))
  }

  test("corpus report: volumes consistent, percentiles ordered") {
    val rep = TrainPrep.corpusReport(spark, SparkTestSession.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getLong(6)))
    assert(rep.nonEmpty)
    val docs = Tables.load(spark, SparkTestSession.sf, "documents")
    assert(rep.map(_._2).sum == docs.count())
    for ((src, nDocs, nTok, p50, p90, tokMax, nLangs) <- rep) {
      assert(nDocs > 0 && nTok >= nDocs, s"$src volumes")
      assert(p50 <= p90 && p90 <= tokMax.toDouble, s"$src percentiles")
      assert(nLangs >= 1)
      assert(nTok.toDouble / nDocs >= p50 / 2, s"$src mean vs median sanity")
    }
  }
}
