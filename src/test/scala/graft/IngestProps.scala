package graft

import graft.sources.AlphaVantage
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Parse-totality property (SURVEY.md §5): parseBars never throws on
  * arbitrary payloads — malformed input only reduces the row set. */
object IngestProps extends Properties("Ingest") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val junkGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.const("""{"unexpected": [1,2,3]}"""),
    Gen.const("""{"Meta Data": 42, "Time Series (60min)": "not-a-map"}"""),
    Gen.const(""),
    Gen.const("""{"Time Series (60min)": {"2025-01-01 00:00:00": {"1. open": null}}}"""),
    Gen.asciiPrintableStr)

  property("total on arbitrary payloads: never throws, only drops") =
    forAll(Gen.listOfN(4, junkGen)) { payloads =>
      val raw = payloads.zipWithIndex
        .map { case (p, i) => (s"S$i", p) }.toDF("symbol", "payload")
      val rows = AlphaVantage.parseBars(spark, raw).collect()
      // any surviving row must be fully well-formed
      rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1))
    }

  property("well-formed rows survive alongside junk") =
    forAll(junkGen) { junk =>
      val raw = Seq(("GOOD", AlphaVantage.fixtureHappy), ("BAD", junk))
        .toDF("symbol", "payload")
      AlphaVantage.parseBars(spark, raw)
        .filter("symbol = 'GOOD'").count() == 2
    }
}
