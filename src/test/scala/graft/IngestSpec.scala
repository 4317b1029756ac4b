package graft

import graft.sources.AlphaVantage
import org.scalatest.funsuite.AnyFunSuite

/** Pins the reference's coded ingest semantics (SURVEY.md §2.3):
  * error/rate-limit payload drop, symbol normalization, row-level
  * tolerance (bad value drops row, missing field defaults to 0),
  * metadata broadcast. */
class IngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val rows = AlphaVantage.ingestParse(spark, SparkTestSession.sf)
    .collect()

  test("error and rate-limit payloads are dropped whole; empty symbol skipped") {
    assert(rows.map(_.getString(0)).toSet == Set("AAPL", "MSFT"))
  }

  test("symbol is trimmed and uppercased") {
    assert(rows.exists(_.getString(0) == "AAPL")) // input was "aapl "
  }

  test("unparseable timestamp or price drops only that row") {
    // AAPL had 3 bars (one bad ts), MSFT 2 (one bad price)
    assert(rows.count(_.getString(0) == "AAPL") == 2)
    assert(rows.count(_.getString(0) == "MSFT") == 1)
  }

  test("missing volume defaults to 0, row kept") {
    val aapl15 = rows.find(r => r.getString(0) == "AAPL"
      && r.getTimestamp(1).toString.startsWith("2025-09-12 15")).get
    assert(aapl15.getLong(6) == 0L)
    assert(aapl15.getDouble(2) == 224.0)
  }

  test("volume is int-strict: non-integral string drops the row (reference int())") {
    import spark.implicits._
    val payload =
      """{"Meta Data": {"3. Last Refreshed": "2025-09-12 16:00:00",
        |  "5. Time Zone": "US/Eastern"},
        | "Time Series (60min)": {
        |  "2025-09-12 16:00:00": {"1. open": "1.0", "2. high": "2.0",
        |    "3. low": "0.5", "4. close": "1.5", "5. volume": "123.5"},
        |  "2025-09-12 15:00:00": {"1. open": "1.0", "2. high": "2.0",
        |    "3. low": "0.5", "4. close": "1.5", "5. volume": "124"}}}"""
        .stripMargin
    val out = AlphaVantage.parseBars(spark,
      Seq(("VOLT", payload)).toDF("symbol", "payload")).collect()
    // "123.5" would pass int-via-double truncation but must be dropped,
    // exactly like the reference's int("123.5") raising
    assert(out.length == 1 && out(0).getLong(6) == 124L)
  }

  test("payload metadata attached to every row; coded '5. Time Zone' key wins") {
    val aapl = rows.filter(_.getString(0) == "AAPL")
    assert(aapl.forall(_.getString(8) == "US/Eastern"))
    // MSFT fixture only has the live API's "6. Time Zone" -> null
    assert(rows.filter(_.getString(0) == "MSFT").forall(_.isNullAt(8)))
  }
}
