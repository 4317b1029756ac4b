package graft

import graft.analytics.{BehaviorQueries, TimeSeries}
import graft.operators.TrainPrep
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the within-session funnel, the view→purchase
  * cross-correlation, and per-language perplexity bucketing. */
class SessionFunnelXcorrSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("sessionized funnel equals a sequential per-session walk") {
    val evs = Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime))
    // sequential reference: session assignment by second-truncated gap,
    // then nested first-stage times within each session
    var nSessions = 0L; var sView = 0L; var sClick = 0L; var sPurchase = 0L
    evs.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._2))
      var sessions = List.empty[List[(String, Long)]]
      var cur = List.empty[(String, Long)]
      var prev = Long.MinValue
      sorted.foreach { case (_, _, tpe, t) =>
        if (prev != Long.MinValue && t / 1000 - prev / 1000 > 1800L) {
          sessions ::= cur.reverse; cur = Nil
        }
        cur ::= (tpe, t); prev = t
      }
      if (cur.nonEmpty) sessions ::= cur.reverse
      sessions.foreach { s =>
        nSessions += 1
        val t0 = s.collectFirst { case ("view", t) => t }
        val t1 = t0.flatMap(v =>
          s.collect { case ("click", t) if t > v => t }.minOption)
        val t2 = t1.flatMap(c =>
          s.collect { case ("purchase", t) if t > c => t }.minOption)
        if (t0.isDefined) sView += 1
        if (t1.isDefined) sClick += 1
        if (t2.isDefined) sPurchase += 1
      }
    }
    val out = BehaviorQueries.funnelSessionized(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((nSessions, sView, sClick, sPurchase)))
    // funnel stages are nested, so counts must be monotone
    assert(sView >= sClick && sClick >= sPurchase)
    assert(nSessions >= sView && sPurchase >= 0L)
  }

  test("cross-correlation stats equal a sequential hourly-grid pairing") {
    val evs = Tables.load(spark, sf, "events")
      .selectExpr("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000L))
    val hours = evs.map(_._2).distinct // observed grid: any event type
    val views = evs.filter(_._1 == "view").groupBy(_._2)
      .map { case (h, v) => h -> v.length.toLong }
    val purchases = evs.filter(_._1 == "purchase").groupBy(_._2)
      .map { case (h, v) => h -> v.length.toLong }
    val want = (0L to TimeSeries.xcorrLags.toLong).map { lag =>
      val pairs = hours.filter(h => hours.contains(h + lag))
        .map(h => (views.getOrElse(h, 0L), purchases.getOrElse(h + lag, 0L)))
      val n = pairs.length.toLong
      (lag, (n, pairs.map(_._1).sum, pairs.map(_._2).sum,
        pairs.map(p => p._1 * p._2).sum,
        n * pairs.map(p => p._1 * p._2).sum -
          pairs.map(_._1).sum * pairs.map(_._2).sum))
    }.toMap
    val out = TimeSeries.crossCorr(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(7)))).toMap
    assert(out == want)
  }

  test("per-language ppl buckets: thresholds are per-language quartiles") {
    val out = TrainPrep.pplBucketsLang(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    // scoring identical to the global gate (same model, same docs)
    val globalBits = TrainPrep.pplBuckets(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.map(r => r._1 -> r._3).toMap == globalBits)
    // bucket assignment reproduces per-language interpolated quartiles
    def quantile(sorted: Array[Double], q: Double): Double = {
      val h = (sorted.length - 1) * q
      val lo = math.floor(h).toInt
      val hi = math.ceil(h).toInt
      sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo))
    }
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val sorted = rows.map(_._3).sorted
      val (q25, q75) = (quantile(sorted, 0.25), quantile(sorted, 0.75))
      rows.foreach { case (doc, _, bits, bucket) =>
        val want =
          if (bits <= q25) "head" else if (bits >= q75) "tail" else "middle"
        assert(bucket == want, s"doc $doc in $lang: $bits vs [$q25,$q75]")
      }
      // min <= q25 and max >= q75 always hold, so every language has a
      // head and a tail ("middle" may be empty in a small tied language)
      val buckets = rows.map(_._4).toSet
      assert(buckets.contains("head") && buckets.contains("tail"),
        s"lang $lang bucket coverage: $buckets")
    }
  }
}
