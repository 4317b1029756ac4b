package graft

import graft.operators.Decontaminate
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // doc ids that are multiples of 100 form the benchmark set
  private def run(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    Decontaminate.report(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
  }

  test("training doc sharing a 5-gram with a benchmark doc is flagged") {
    val bench = "alpha beta gamma delta epsilon zeta"
    val out = run(Seq(
      100L -> bench,                                  // benchmark member
      1L -> "alpha beta gamma delta epsilon other",   // shares one 5-gram
      2L -> "totally unrelated words go right here")) // clean
    assert(out(1L) == (1L, true))
    assert(out(2L) == (0L, false))
  }

  test("benchmark docs are not self-contaminated") {
    val out = run(Seq(
      100L -> "alpha beta gamma delta epsilon zeta",
      200L -> "one two three four five six seven"))
    assert(out(100L) == (0L, false) && out(200L) == (0L, false))
  }

  test("a 5-gram shared by two benchmark docs contaminates both") {
    val shared = "alpha beta gamma delta epsilon"
    val out = run(Seq(
      100L -> s"$shared zeta",
      200L -> s"intro $shared",
      3L -> s"$shared trailer"))
    assert(out(100L)._2 && out(200L)._2 && out(3L)._2)
  }

  test("short docs (< n tokens) and gram multiplicity behave") {
    val out = run(Seq(
      100L -> "alpha beta gamma delta epsilon",
      4L -> "tiny doc",                             // no 5-grams at all
      // duplicate occurrences of the same gram count once (distinct)
      5L -> "alpha beta gamma delta epsilon alpha beta gamma delta epsilon"))
    assert(out(4L) == (0L, false))
    assert(out(5L)._1 >= 1L && out(5L)._2)
  }

  test("broadcast knob is output-invariant (shuffled join, same report)") {
    val dflt = Decontaminate.decontaminate(spark, SparkTestSession.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    spark.conf.set(Conf.DecontaminateBroadcast, "0")
    try {
      val shuffled = Decontaminate.decontaminate(spark, SparkTestSession.sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(shuffled == dflt)
    } finally spark.conf.unset(Conf.DecontaminateBroadcast)
  }

  test("corpus report covers every document exactly once") {
    val docs = Tables.load(spark, SparkTestSession.sf, "documents")
    val out = Decontaminate.decontaminate(spark, SparkTestSession.sf)
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
  }
}
